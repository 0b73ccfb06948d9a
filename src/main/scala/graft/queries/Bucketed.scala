package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import Catalog._

/** Bucketed-table co-located join — the "pay the shuffle once at write
  * time" design for repeated joins at 100 TB.
  *
  * A fact-fact equi-join normally shuffles BOTH sides on the key every
  * time it runs. Bucketing (`bucketBy(n, key)` + `sortBy(key)` at write)
  * persists that partitioning into the table layout: every subsequent
  * join/aggregate on the key reads the buckets co-located and Spark's
  * `EnsureRequirements` inserts ZERO `ShuffleExchange`s under the
  * sort-merge join ([[graft.BucketedSpec]] pins this against the plain
  * parquet twin, which plans 2). At cluster scale this is the difference
  * between an O(data) network shuffle per query and none — the nightly
  * ETL writes bucketed, every downstream join rides it.
  *
  * The one-time table build is session-scoped (Spark's in-memory catalog
  * forgets tables across JVMs, so each JVM rebuilds once into the
  * warehouse dir — the cluster equivalent is a persistent metastore where
  * the build really is once). Bucket count is a `local[32]`-sized stand-in
  * for the judged-per-table choice a real deployment makes (buckets ≈
  * cluster cores, each bucket < executor memory).
  */
object Bucketed extends QueryGroup {

  private[queries] val NumBuckets = 8

  private def slug(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_")

  /** The in-memory catalog forgets tables across JVMs but their warehouse
    * directories persist; `saveAsTable` then refuses the orphaned
    * location (`LOCATION_ALREADY_EXISTS`). Clear it before rebuilding. */
  private def dropStaleLocation(s: SparkSession, tbl: String): Unit = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, tbl.toLowerCase)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** One-time (per JVM) bucketed write of orders + customer, both
    * bucketed and sorted on the customer key. `repartition(n, key)` first
    * so each bucket lands in one file. Note the join still plans local
    * per-bucket sorts (Spark ignores bucket sort order unless the legacy
    * outputOrdering flag is on) — what the layout eliminates is the
    * NETWORK exchange, which is the part that scales with the data. */
  private[queries] def ensureBucketed(s: SparkSession, d: String)
      : (String, String) = {
    val (ot, ct) = (s"graft_bkt_orders_${slug(d)}",
      s"graft_bkt_customer_${slug(d)}")
    if (!s.catalog.tableExists(ot)) {
      dropStaleLocation(s, ot)
      Tables.orders(s, d).repartition(NumBuckets, col("o_custkey"))
        .write.mode("overwrite")
        .bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ot)
    }
    if (!s.catalog.tableExists(ct)) {
      dropStaleLocation(s, ct)
      Tables.customer(s, d).repartition(NumBuckets, col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(ct)
    }
    (ot, ct)
  }

  /** Revenue by market segment over the bucketed join. The `merge` hints
    * keep the planner on the sort-merge path (a broadcast of the small
    * side would also avoid the shuffle here, but would stop demonstrating
    * — and stop testing — the bucketed layout the query exists for; at
    * the design scale neither side is broadcastable). */
  private def joinBucketed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (ot, ct) = ensureBucketed(s, d)
    s.table(ot).hint("merge")
      .join(s.table(ct).hint("merge"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(dsum($"o_totalprice").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment")
  }

  val queries: Map[String, Q] = Map(
    "q_join_bucketed" -> joinBucketed,
  )

  val oracle: Map[String, String] = Map(
    "q_join_bucketed" ->
      s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
