package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import Catalog._

/** Source-format surface — SURVEY.md §2B "CSV scan with explicit schema" /
  * "JSON scan" plus the reference's S2 filename→column injection and S3/A4
  * latest-partition selection (`/root/reference/data-cleaner/cleaner.py:15-40`,
  * `data_populator/populator.py:13-29`).
  *
  * Each query materializes a CSV/JSON/partitioned-parquet mirror of a
  * testdata table under target/tmp (overwrite, deterministic), reads it
  * back through the format under test, and aggregates; the oracle runs the
  * same aggregate over the original parquet — so what's checked is that the
  * format round-trip is lossless, schema included.
  *
  * Scale notes: the mirrors are small dims (nation/region); the pattern —
  * explicit schema on read (never inferred, SURVEY §1.3), partition-pruned
  * latest-date selection instead of a full listing sort — is the part that
  * carries to 100 TB.
  */
object Sources extends QueryGroup {

  private def tmp(name: String): String = s"target/tmp/sources/$name"

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** CSV round-trip with explicit schema (S1): nation → csv → agg. */
  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("nation_csv")
    Tables.nation(s, d).write.mode("overwrite")
      .option("header", "true").csv(out)
    s.read.schema(nationSchema).option("header", "true").csv(out)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        sum($"n_nationkey").cast("long").as("sum_keys"),
        min($"n_name").as("first_name"))
      .orderBy($"n_regionkey")
  }

  /** JSON-lines round-trip (S4): supplier projection → json → agg. */
  private def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("supplier_json")
    Tables.supplier(s, d)
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType)))
    s.read.schema(schema).json(out)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_supp"), max($"s_name").as("last_name"))
      .orderBy($"s_nationkey")
  }

  /** Malformed-record resilience: a JSON-lines mirror where every 5th
    * record is deliberately broken; the PERMISSIVE read routes bad lines
    * into `_corrupt_record` instead of failing the job — at 100 TB some
    * input is ALWAYS malformed and a scan that dies on the first bad
    * byte never finishes. The oracle derives the same valid/corrupt
    * partition arithmetically from the source table. */
  private def jsonCorrupt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("supplier_json_corrupt")
    Tables.supplier(s, d)
      .select(
        when($"s_suppkey" % 5 === 0, concat(lit("{broken "), $"s_name"))
          .otherwise(to_json(struct($"s_suppkey", $"s_nationkey")))
          .as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_nationkey", IntegerType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .agg(count($"_corrupt_record").as("n_corrupt"),
        count($"s_suppkey").as("n_valid"),
        sum($"s_nationkey").cast("long").as("sum_nk"))
  }

  /** ORC round-trip: part → ORC → agg. Spark's other built-in columnar
    * format (predicate pushdown + column pruning apply as with parquet);
    * the oracle can't read ORC, so it pins CONTENT equality by running
    * the same aggregate over the source table the ORC mirror was written
    * from — which is exactly the roundtrip contract. */
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("part_orc")
    Tables.part(s, d).write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum($"p_size").cast("long").as("sum_size"),
        min($"p_name").as("first_name"))
      .orderBy($"p_brand")
  }

  /** S2: filename → column injection. The mirror is written partitioned
    * (hive-style `n_regionkey=K/` dirs); the read deliberately bypasses
    * partition inference (recursiveFileLookup) and re-derives the key from
    * input_file_name() — the reference's derive-from-object-key semantics
    * (`cleaner.py:10-14,27`, intended per bug B1). */
  private def filenameColumn(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("nation_by_region")
    Tables.nation(s, d).write.mode("overwrite")
      .partitionBy("n_regionkey")
      .option("header", "true").csv(out)
    val csvSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType)))
    s.read.schema(csvSchema).option("header", "true")
      .option("recursiveFileLookup", "true").csv(out)
      .withColumn("region_from_path",
        regexp_extract(input_file_name(), "n_regionkey=(\\d+)", 1).cast("int"))
      .groupBy($"region_from_path")
      .agg(count(lit(1)).as("n_nations"), sum($"n_nationkey").cast("long")
        .as("sum_keys"))
      .orderBy($"region_from_path")
  }

  /** S3/A4: latest-partition selection. Orders are laid out partitioned by
    * year; the query reads ONLY the max partition (static pruning via a
    * literal-resolvable filter), the idiomatic replacement for the
    * reference's list-sort-by-LastModified scan. */
  /** Cache key for a memoized mirror of `<d>/<table>.parquet`: sf dir
    * name + source length + full-resolution mtime + a CRC32 content
    * fingerprint of the file's first and last 64 KiB (the parquet footer
    * lives in the tail, so any regenerated drop changes it even at
    * identical length/mtime-second), so a driver rewrite between rounds
    * invalidates the fixture instead of silently serving stale rows
    * against a fresh oracle. O(128 KiB) read per session — negligible. */
  private def fixtureKey(d: String, table: String): String = {
    val src = new java.io.File(d, s"$table.parquet")
    // A Spark-written table is a DIRECTORY of part files (the scale-probe
    // corpora are laid out that way); a driver-written one is a single
    // file. Fingerprint the first part file in the directory case, and
    // fold every part's (name, length, mtime) into the CRC so adding or
    // rewriting ANY part invalidates, not just the sampled one.
    val crc = new java.util.zip.CRC32
    val dataFile =
      if (!src.isDirectory) src
      else {
        val parts = Option(src.listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .sortBy(_.getName)
        require(parts.nonEmpty, s"no part files under $src")
        parts.foreach { p =>
          crc.update(s"${p.getName}:${p.length}:${p.lastModified};"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        parts.head
      }
    val raf = new java.io.RandomAccessFile(dataFile, "r")
    try {
      val n = math.min(65536L, raf.length).toInt
      val head = new Array[Byte](n)
      raf.readFully(head); crc.update(head)
      if (raf.length > 65536L) {
        raf.seek(raf.length - 65536L)
        val tail = new Array[Byte](65536)
        raf.readFully(tail); crc.update(tail)
      }
    } finally raf.close()
    s"${new java.io.File(d).getName}_${dataFile.length}_${dataFile.lastModified}" +
      s"_${java.lang.Long.toHexString(crc.getValue)}"
  }

  /** Lay out (once per source snapshot) a derived input fixture at
    * `<prefix>_<key>` and return its path, pruning fixtures of
    * SUPERSEDED snapshots of the same sf dir — without this, one stale
    * dir per regenerated testdata drop accumulates for the life of
    * `target/tmp`. Fixtures for other sf dirs (smoke at sf0.001, verify
    * at sf0.01, bench at sf0.1 coexist in one checkout) are kept.
    * `sentinel` is the file whose existence marks a completed layout
    * (a plain parquet write leaves `_SUCCESS` at the root; a
    * multi-batch layout names its LAST batch's marker). */
  /** Serializes fixture layout + pruning: two concurrent first uses of
    * one fixture (ConcurrencySpec's self-race shape) would otherwise
    * both miss the sentinel and run overlapping overwrite writes to the
    * same path. One JVM writes these fixtures, so an object monitor
    * suffices. */
  private val mirrorLock = new Object

  private def memoFixture(d: String, prefix: String, table: String,
      sentinel: String = "_SUCCESS")(layout: String => Unit): String = {
    val out = tmp(s"${prefix}_${fixtureKey(d, table)}")
    val outDir = new java.io.File(out)
    val sfScope = s"${prefix}_${new java.io.File(d).getName}_"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(); ()
    }
    mirrorLock.synchronized {
      if (!new java.io.File(out, sentinel).exists()) {
        // Prune superseded snapshots of the same sf dir ONLY when about
        // to lay out their replacement — pruning on every call could
        // delete a fixture an in-flight plan (keyed to the old
        // fingerprint) is still reading mid-scan.
        Option(outDir.getParentFile.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => (f.getName.startsWith(sfScope) ||
            // pre-r17 fixed-path layout of the same fixture (no key
            // suffix) — never matched by sfScope, would linger forever
            f.getName == prefix) && f.getName != outDir.getName)
          .foreach(deleteRec)
        layout(out)
      }
    }
    out
  }

  private def ordersMirror(s: SparkSession, d: String, prefix: String): String = {
    import s.implicits._
    memoFixture(d, prefix, "orders") { out =>
      Tables.orders(s, d)
        .withColumn("yr", year($"o_orderdate"))
        .write.mode("overwrite").partitionBy("yr").parquet(out)
    }
  }

  private def latestPartition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Input fixture, laid out once per source snapshot (same rationale
    // as joinDpp's mirror below).
    val part = s.read.parquet(ordersMirror(s, d, "orders_by_year"))
    val maxYr = part.agg(max($"yr")).head.getInt(0)
    part.filter($"yr" === maxYr)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("sum_price"), lit(maxYr).as("yr"))
      .orderBy($"o_orderstatus")
  }

  /** Dynamic partition pruning — the runtime companion to
    * `q_latest_partition`'s static pruning: the years to read are NOT
    * literal-resolvable (they come from a filtered dim relation), so the
    * partitioned fact scan must receive its partition filter AT RUNTIME
    * from the broadcast dim (Spark plans a DynamicPruningExpression
    * subquery into the scan — PlanAuditSpec asserts it). At 100 TB this
    * is THE mechanism that keeps a fact-dim join from scanning every
    * date partition when the dim narrows to a handful; no driver
    * round-trip (contrast `latestPartition`'s `.head`), the pruning
    * value list rides the broadcast exchange. */
  private def joinDpp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The partitioned mirror is INPUT fixture, not the surface under
    // test (contrast the roundtrip queries, where the write IS the
    // operator) — lay it out once per source snapshot and reuse;
    // `sbt clean`, deleting target/tmp, or a regenerated testdata drop
    // (fingerprinted key) invalidates.
    val fact = s.read.parquet(ordersMirror(s, d, "orders_by_year_dpp"))
    val dim = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT" &&
        month($"o_orderdate") <= 2)
      .select(year($"o_orderdate").as("yr"))
      .distinct()
    fact.join(broadcast(dim), "yr")
      .groupBy($"yr", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
      .orderBy($"yr", $"o_orderstatus")
  }

  /** Schema evolution across parquet batches — the lakehouse reality
    * that a long-lived table's files do NOT share one schema: batch v1
    * wrote (c_custkey, c_acctbal); a later batch v2 added c_mktsegment.
    * `mergeSchema=true` unions the footers into one evolved schema and
    * fills the column with NULL for pre-evolution files, which the query
    * then buckets as 'UNKNOWN' — the standard backfill-free migration
    * read. The oracle reproduces the same semantics from the original
    * table, so what's checked is that old rows survive the evolution
    * losslessly. At scale, footer merging is a driver-side listing cost;
    * the data files are never rewritten. */
  private def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Input fixture, laid out once per source snapshot (r17; same
    // rationale as ordersMirror): the capability under test is the
    // mergeSchema READ over files with divergent footers — re-WRITING
    // the two batches on every run timed fixture setup, not the
    // operator (BASELINE.md r17 comparability note).
    val out = memoFixture(d, "customer_evolving", "customer",
      sentinel = "batch=v2/_SUCCESS") { o =>
      val c = Tables.customer(s, d)
      c.filter($"c_custkey" % 2 === 0)
        .select($"c_custkey", $"c_acctbal")
        .write.mode("overwrite").parquet(s"$o/batch=v1")
      c.filter($"c_custkey" % 2 =!= 0)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .write.mode("overwrite").parquet(s"$o/batch=v2")
    }
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"segment")
  }

  /** Nested-struct schema pruning: orders mirrored with a 3-field
    * `meta` struct, then aggregated touching only `meta.status` and
    * `meta.total`. Catalyst's nested-schema pruning must push the TWO
    * leaves into the parquet ReadSchema — `meta.priority` never leaves
    * disk (PlanAuditSpec gates this; at 100 TB deeply nested event
    * payloads are routinely 10x the queried leaves, so leaf-level
    * pruning is the difference between scanning the table and scanning
    * the question). The oracle computes the flat equivalent. */
  private def nestedPruning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Input fixture, laid out once per source snapshot (r17): the
    // capability is leaf-level ReadSchema pruning on the READ path.
    val out = memoFixture(d, "orders_nested", "orders") { o =>
      Tables.orders(s, d)
        .select($"o_orderkey",
          struct($"o_orderstatus".as("status"), $"o_totalprice".as("total"),
            $"o_orderpriority".as("priority")).as("meta"))
        .write.mode("overwrite").parquet(o)
    }
    s.read.parquet(out)
      .groupBy($"meta.status".as("status"))
      .agg(count(lit(1)).as("n_orders"), dsum($"meta.total").as("sum_total"))
      .orderBy($"status")
  }

  /** KV-connector round-trip through the [[graft.sources.kv.KvDataSource]]
    * DataSourceV2 surface (the reference's populate→DynamoDB→serve
    * boundary, `populator.py:47-58` → `index.py:16-25`, as a real Spark
    * connector): a deterministic orders slice is PUBLISHED through
    * `write.format("graftkv")` (per-task buffered log segments), then
    * read back through `read.format("graftkv")` with a key-PREFIX
    * predicate the source claims via filter pushdown — the point lookup
    * never materializes the full store into the query. The store
    * directory is wiped first: the log is append-only, and the oracle
    * pins exactly one published generation. */
  private def kvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("orders_kv")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(out))
    Tables.orders(s, d)
      .filter($"o_orderkey" % 100 === 0)
      .select(concat(lit("order:"), $"o_orderkey".cast("string")).as("key"),
        concat_ws(",", $"o_orderstatus", $"o_custkey".cast("string"))
          .as("value"))
      .write.format("graftkv").mode("append").save(out)
    s.read.format("graftkv").load(out)
      .filter($"key".startsWith("order:1"))
      .orderBy($"key")
  }

  /** Point lookups through the connector — the reference's GET-by-id
    * serving call (`index.py:16-25`) as a Spark read: an IN-list of keys
    * is claimed by the source's filter pushdown, so only those keys
    * survive log replay into the scan. Same published store derivation
    * as [[kvRoundtrip]], its own directory (catalog queries stay
    * self-contained). */
  private def kvLookup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = tmp("orders_kv_lookup")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(out))
    Tables.orders(s, d)
      .filter($"o_orderkey" % 100 === 0)
      .select(concat(lit("order:"), $"o_orderkey".cast("string")).as("key"),
        concat_ws(",", $"o_orderstatus", $"o_custkey".cast("string"))
          .as("value"))
      .write.format("graftkv").mode("append").save(out)
    val wanted = Seq(100L, 700L, 1300L, 2500L)
      .map(k => s"order:$k")
    s.read.format("graftkv").load(out)
      .filter($"key".isin(wanted: _*))
      .orderBy($"key")
  }

  val queries: Map[String, Q] = Map(
    "q_kv_lookup" -> kvLookup,
    "q_kv_roundtrip" -> kvRoundtrip,
    "q_csv_roundtrip" -> csvRoundtrip,
    "q_nested_pruning" -> nestedPruning,
    "q_schema_evolution" -> schemaEvolution,
    "q_json_roundtrip" -> jsonRoundtrip,
    "q_orc_roundtrip" -> orcRoundtrip,
    "q_json_corrupt" -> jsonCorrupt,
    "q_filename_column" -> filenameColumn,
    "q_latest_partition" -> latestPartition,
    "q_join_dpp" -> joinDpp,
  )

  val oracle: Map[String, String] = Map(
    "q_kv_lookup" ->
      """SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS key,
        |  o_orderstatus || ',' || CAST(o_custkey AS VARCHAR) AS value
        |FROM orders
        |WHERE o_orderkey % 100 = 0
        |  AND o_orderkey IN (100, 700, 1300, 2500)
        |ORDER BY key""".stripMargin,
    "q_kv_roundtrip" ->
      """SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS key,
        |  o_orderstatus || ',' || CAST(o_custkey AS VARCHAR) AS value
        |FROM orders
        |WHERE o_orderkey % 100 = 0
        |  AND CAST(o_orderkey AS VARCHAR) LIKE '1%'
        |ORDER BY key""".stripMargin,
    "q_schema_evolution" ->
      s"""SELECT CASE WHEN c_custkey % 2 <> 0 THEN c_mktsegment
         |            ELSE 'UNKNOWN' END AS segment,
         |  COUNT(*) AS n_customers, ${dsumSql("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin,
    "q_nested_pruning" ->
      s"""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_total
         |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_keys,
        |  MIN(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp, MAX(s_name) AS last_name
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_json_corrupt" ->
      """SELECT
        |  COUNT(*) FILTER (WHERE s_suppkey % 5 = 0) AS n_corrupt,
        |  COUNT(*) FILTER (WHERE s_suppkey % 5 <> 0) AS n_valid,
        |  CAST(SUM(s_nationkey) FILTER (WHERE s_suppkey % 5 <> 0) AS BIGINT)
        |    AS sum_nk
        |FROM supplier""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  CAST(SUM(p_size) AS BIGINT) AS sum_size,
        |  MIN(p_name) AS first_name
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_filename_column" ->
      """SELECT n_regionkey AS region_from_path, COUNT(*) AS n_nations,
        |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_keys
        |FROM nation GROUP BY n_regionkey ORDER BY region_from_path""".stripMargin,
    "q_latest_partition" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_price,
         |  CAST(year(o_orderdate) AS INT) AS yr
         |FROM orders
         |WHERE year(o_orderdate) =
         |  (SELECT MAX(year(o_orderdate)) FROM orders)
         |GROUP BY o_orderstatus, year(o_orderdate)
         |ORDER BY o_orderstatus""".stripMargin,
    "q_join_dpp" ->
      s"""WITH dim AS (
         |  SELECT DISTINCT year(o_orderdate) AS yr FROM orders
         |  WHERE o_orderpriority = '1-URGENT' AND month(o_orderdate) <= 2)
         |SELECT CAST(f.yr AS INT) AS yr, f.o_orderstatus,
         |  COUNT(*) AS n_orders, ${dsumSql("f.o_totalprice")} AS sum_price
         |FROM (SELECT *, year(o_orderdate) AS yr FROM orders) f
         |JOIN dim ON f.yr = dim.yr
         |GROUP BY f.yr, f.o_orderstatus
         |ORDER BY yr, o_orderstatus""".stripMargin,
  )
}
