package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Tables
import Catalog._

/** Scalar / extension function surface — SURVEY.md §2B rows: string fns,
  * regex fns, date/time fns, math fns, conditionals, array fns, map fns,
  * JSON fns, scalar UDF, UDAF (Aggregator), UDTF (typed flatMap).
  *
  * Everything is a narrow projection over a parquet scan (plus one
  * aggregation per UDAF/UDTF query) — no scale hazards; the interesting
  * part is cross-engine determinism, handled the same way as
  * [[Catalog]]: exact integers, IEEE-pure double ops (floor/ceil/sqrt/
  * single divisions), and no decimal-string round-tripping.
  *
  * Reference grounding: these are the building blocks the clean stage uses
  * (`/root/reference/data-cleaner/cleaner.py:42-107` — regex, split, casts,
  * conditionals, map lookup) and the UDF/UDAF/UDTF shapes of SURVEY §2A
  * S7/S9 (flatMap extractors) and A2-A3 (custom aggregation).
  */
object Scalars extends QueryGroup {

  // ---- string functions -------------------------------------------------

  private def strFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .filter($"p_partkey" < 200)
      .select($"p_partkey",
        initcap($"p_name").as("name_title"),
        upper($"p_type").as("type_upper"),
        lower($"p_brand").as("brand_lower"),
        length($"p_name").as("name_len"),
        substring($"p_name", 1, 5).as("name_head"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        lpad($"p_size".cast("string"), 4, "0").as("size_padded"),
        translate($"p_name", "aeiou", "AEIOU").as("name_translated"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("name_trimmed"),
        $"p_name".startsWith("red").as("is_red"),
        $"p_name".endsWith("ring").as("is_ring"),
        $"p_name".contains("widget").as("has_widget"))
      .orderBy($"p_partkey")
  }

  // ---- regex functions --------------------------------------------------

  private def regexpFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .filter($"c_custkey" < 300)
      .select($"c_custkey",
        regexp_extract($"c_name", "Customer#(\\d+)", 1).cast("long")
          .as("name_number"),
        regexp_replace($"c_name", "0+", "0").as("name_squeezed"),
        $"c_name".rlike("\\d{9}$").as("ends_nine_digits"),
        regexp_extract($"c_mktsegment", "^([A-Z]+)", 1).as("segment_word"))
      .orderBy($"c_custkey")
  }

  // ---- date/time functions ----------------------------------------------

  private def dateFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderkey" < 100)
      .select($"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("q"),
        date_format($"o_orderdate", "dd-MM-yyyy").as("formatted"),
        date_add($"o_orderdate", 30).as("plus30"),
        datediff(to_date(lit("1999-01-01")), $"o_orderdate").as("days_to_99"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        last_day($"o_orderdate").as("month_end"))
      .orderBy($"o_orderkey")
  }

  // ---- math functions ---------------------------------------------------

  private def mathFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_orderkey" < 200)
      .select($"l_orderkey", $"l_linenumber",
        abs($"l_quantity" - 25.0).as("qty_dev"),
        floor($"l_extendedprice").as("price_floor"),
        ceil($"l_extendedprice").as("price_ceil"),
        ($"l_orderkey" % 7).as("okey_mod7"),
        pow(lit(2.0), $"l_linenumber").as("pow2_line"),
        sqrt($"l_quantity").as("qty_sqrt"),
        greatest($"l_quantity", $"l_tax" * 100).as("gr"),
        least($"l_quantity", $"l_discount" * 100).as("ls"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ---- conditionals -----------------------------------------------------

  private def condFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderkey" < 300)
      .select($"o_orderkey",
        when($"o_orderstatus" === "F", "final")
          .when($"o_orderstatus" === "O", "open")
          .otherwise("other").as("status_word"),
        coalesce(nullif($"o_orderpriority", lit("5-LOW")), lit("LOW"))
          .as("prio_or_low"),
        nvl(nullif($"o_orderstatus", lit("P")), lit("NOT_P")).as("nvl_demo"),
        (($"o_totalprice" > 100000.0) && ($"o_orderstatus" =!= "F"))
          .as("big_open"))
      .orderBy($"o_orderkey")
  }

  // ---- array functions --------------------------------------------------

  private def arrayFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val arr = split(lower($"text"), " ")
    Tables.documents(s, d)
      .select($"doc_id",
        size(arr).as("n_tok"),
        array_join(slice(arr, 1, 5), " ").as("head5"),
        array_contains(arr, "spark").as("has_spark"),
        array_join(slice(array_sort(array_distinct(arr)), 1, 3), ",")
          .as("sorted_head3"),
        element_at(arr, -1).as("last_tok"))
      .orderBy($"doc_id")
  }

  /** Generator / lateral-view shape: posexplode of the leading tokens. */
  private def arrayExplode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"doc_id" < 20)
      .select($"doc_id", posexplode(slice(split(lower($"text"), " "), 1, 3)))
      .toDF("doc_id", "pos", "token")
      .orderBy($"doc_id", $"pos")
  }

  // ---- map functions ----------------------------------------------------

  private val regionRates: Map[String, Double] = Map(
    "REGION_0" -> 1.0, "REGION_1" -> 0.5, "REGION_2" -> 1.25,
    "REGION_3" -> 2.0, "REGION_4" -> 0.125)

  private def mapFuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = typedLit(regionRates)
    Tables.region(s, d)
      .select($"r_regionkey", $"r_name",
        element_at(rates, $"r_name").as("rate"),
        size(map_keys(rates)).as("n_rates"),
        element_at(rates, lit("REGION_0")).as("base_rate"))
      .orderBy($"r_regionkey")
  }

  // ---- JSON functions ---------------------------------------------------

  private def jsonProps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k1"),
        from_json($"props", lit("k BIGINT")).getField("k").as("k2"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k1").as("sum_k"),
        sum($"k2").as("sum_k2"),
        (sum($"k1").cast("double") / count($"k1").cast("double"))
          .as("avg_k"))
      .orderBy($"event_type")
  }

  /** Spark 4 VARIANT surface: `parse_json` into the binary semi-
    * structured type, typed path extraction with `variant_get`, safe
    * extraction of an absent path with `try_variant_get` (NULL, never
    * an error), and `schema_of_variant` type introspection — the
    * open-schema ingestion path that replaces per-field
    * `get_json_object` string re-parsing (the variant parses ONCE into
    * a binary value; every extraction is a binary walk, which is the
    * at-scale argument). The oracle pins the extracted values and the
    * introspected type string against DuckDB's JSON operators. */
  private def jsonVariant(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", parse_json($"props").as("v"))
      .select($"event_type",
        variant_get($"v", "$.k", "bigint").as("k"),
        try_variant_get($"v", "$.missing", "bigint").as("m"),
        schema_of_variant($"v").as("vtype"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        count($"m").as("n_missing"),
        min($"vtype").as("vtype"),
        // The oracle hardcodes the introspected type string, which is only
        // sound while every props row parses to ONE variant shape; surface
        // the distinct-shape count (oracle: 1) so a heterogeneous props
        // column fails the gate loudly instead of hash-matching on
        // whichever schema string sorts first under min().
        countDistinct($"vtype").as("n_vtypes"))
      .orderBy($"event_type")
  }

  // ---- scalar UDF -------------------------------------------------------

  /** Slugify as a Scala UDF — the scalar-UDF surface row. Semantics mirror
    * lower + global regexp_replace so the oracle can reproduce it. */
  private val slugifyUdf = udf((sIn: String) =>
    if (sIn == null) null
    else sIn.toLowerCase.replaceAll("[^a-z0-9]+", "-"))

  private def udfScalar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Guarded like GraftFunctions.register: same semantics either way, and
    // re-registering per invocation spams registry warnings into the logs.
    if (!s.catalog.functionExists("slugify")) s.udf.register("slugify", slugifyUdf)
    Tables.part(s, d)
      .filter($"p_partkey" < 200)
      .select($"p_partkey",
        slugifyUdf(concat_ws(" ", $"p_brand", $"p_name")).as("slug"),
        call_udf("slugify", $"p_type").as("type_slug"))
      .orderBy($"p_partkey")
  }

  // ---- UDAF (typed Aggregator) ------------------------------------------

  /** Bounded top-3 aggregator: keeps the 3 largest doubles seen, sorted
    * descending — the partial-aggregating (map-side combining) alternative
    * to a window row_number for top-K-per-group at scale: each partition
    * reduces to <= K values before the shuffle. */
  private object TopK3Agg extends Aggregator[Double, Seq[Double], Seq[Double]] {
    private val K = 3
    private val desc = Ordering[Double].reverse
    def zero: Seq[Double] = Seq.empty
    def reduce(b: Seq[Double], a: Double): Seq[Double] =
      (a +: b).sorted(desc).take(K)
    def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
      (x ++ y).sorted(desc).take(K)
    def finish(r: Seq[Double]): Seq[Double] = r
    def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  private def udafTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val top3 = udaf(TopK3Agg, Encoders.scalaDouble)
    // The driver's comparator cannot sort LIST columns, so the top-3 array
    // is emitted as a joined string of integer cents: floor(x*100) is a
    // binary-pure double op identical in Spark and DuckDB, whereas raw
    // double→string formatting is engine-specific.
    Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(top3($"o_totalprice").as("raw_top3"),
        count(lit(1)).as("n_orders"))
      .select($"o_custkey",
        array_join(
          transform($"raw_top3",
            x => floor(x * 100).cast("long").cast("string")), ",")
          .as("top3_cents"),
        $"n_orders")
      .orderBy($"o_custkey")
  }

  // ---- UDTF (typed flatMap) ---------------------------------------------

  private def udtfBigrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigrams = Tables.documents(s, d)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, txt) =>
        txt.toLowerCase.split(' ').toSeq.sliding(2)
          .collect { case Seq(a, b) => (id, s"$a $b") }
      }
      .toDF("doc_id", "bigram")
    bigrams
      .groupBy($"bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"bigram")
      .limit(20)
  }

  // ---- SQL-registered native expressions (SparkSessionExtensions) -------

  /** The native graft expressions driven through their SQL names — the
    * surface a cluster user gets from
    * `--conf spark.sql.extensions=graft.GraftExtensions`. Same codegen'd
    * operators as the Column API ([[org.apache.spark.sql.graft
    * .GraftSqlFunctions]] registers identical builders); `poly_hash`'s
    * two-arg form exercises the literal-parameter path. `ensure` makes the
    * query self-contained in any session the harness hands it. */
  private def sqlExtensions(s: SparkSession, d: String): DataFrame = {
    org.apache.spark.sql.graft.GraftSqlFunctions.ensure(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_sqlext")
    s.sql("""
      SELECT doc_id,
        simhash60(split(lower(text), ' ')) AS sim,
        poly_hash(lower(text)) AS ph31,
        poly_hash(lower(text), 37) AS ph37
      FROM documents_sqlext ORDER BY doc_id""")
  }

  /** Spark 4 SQL pipe syntax (`|>`): the linear FROM → WHERE →
    * AGGREGATE → ORDER BY dataflow written in evaluation order — the
    * SAME logical plan as the nested SELECT (Catalyst parses pipes into
    * ordinary operators; zero runtime surface), pinned against the
    * classic-SQL oracle to prove the equivalence. */
  private def sqlPipe(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_pipe")
    s.sql(s"""
      FROM lineitem_pipe
      |> WHERE l_quantity >= 30
      |> AGGREGATE COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS rev
         GROUP BY l_returnflag, l_linestatus
      |> WHERE n > 0
      |> ORDER BY l_returnflag, l_linestatus""")
  }

  /** Spark 4 SQL-defined UDF (`CREATE FUNCTION ... RETURN expr`): the
    * body is SQL, so Catalyst INLINES it at analysis time — unlike a
    * JVM closure UDF it stays codegen-able and optimizer-visible
    * (pushdown through it works). The margin function is applied
    * per-row and aggregated exactly. */
  private def sqlUdf(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sqludf")
    // Guarded like slugify: CREATE OR REPLACE on every invocation spams a
    // registry "replaced" warning per bench/verify run.
    if (!s.catalog.functionExists("net_cents")) s.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DOUBLE, disc DOUBLE)
      RETURNS BIGINT
      RETURN CAST(CAST(p AS DECIMAL(18,2)) * 100 *
        (100 - CAST(CAST(disc AS DECIMAL(18,2)) * 100 AS INT)) AS BIGINT)""")
    s.sql("""
      SELECT l_returnflag,
        COUNT(*) AS n,
        SUM(net_cents(l_extendedprice, l_discount)) AS net_fp
      FROM lineitem_sqludf
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Spark 4 string collations: UTF8_LCASE groups case-insensitively at
    * the COMPARISON level — no lower() rewrite of the data reaches the
    * grouping — over a deterministically mixed-cased segment column.
    * The surviving group REPRESENTATIVE is whichever case variant a
    * partition saw first, so the output normalizes it with one final
    * lower(); the oracle reproduces the same semantics with explicit
    * lower() grouping. */
  private def strCollation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select(
        // mixed-case the segment deterministically: odd keys lowercase
        when($"c_custkey" % 2 === 1, lower($"c_mktsegment"))
          .otherwise($"c_mktsegment").as("seg_mixed"),
        $"c_custkey")
      .select(collate($"seg_mixed", "UTF8_LCASE").as("seg"), $"c_custkey")
      .groupBy($"seg")
      .agg(count(lit(1)).as("n"), sum($"c_custkey").as("sum_keys"))
      .select(lower($"seg").as("segment"), $"n", $"sum_keys")
      .orderBy($"segment")
  }

  val queries: Map[String, Q] = Map(
    "q_sql_pipe" -> sqlPipe,
    "q_sql_udf" -> sqlUdf,
    "q_str_collation" -> strCollation,
    "q_str_funs" -> strFuns,
    "q_regexp_funs" -> regexpFuns,
    "q_date_funs" -> dateFuns,
    "q_math_funs" -> mathFuns,
    "q_cond_funs" -> condFuns,
    "q_array_funs" -> arrayFuns,
    "q_array_explode" -> arrayExplode,
    "q_map_funs" -> mapFuns,
    "q_json_props" -> jsonProps,
    "q_json_variant" -> jsonVariant,
    "q_udf_scalar" -> udfScalar,
    "q_udaf_topk" -> udafTopK,
    "q_udtf_bigrams" -> udtfBigrams,
    "q_sql_extensions" -> sqlExtensions,
  )

  val oracle: Map[String, String] = Map(
    "q_str_funs" ->
      """SELECT p_partkey,
        |  array_to_string([upper(w[1]) || lower(w[2:])
        |    FOR w IN string_split(p_name, ' ')], ' ') AS name_title,
        |  upper(p_type) AS type_upper,
        |  lower(p_brand) AS brand_lower,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  p_name[1:5] AS name_head,
        |  p_brand || '|' || p_type AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  translate(p_name, 'aeiou', 'AEIOU') AS name_translated,
        |  trim('  ' || p_name || '  ') AS name_trimmed,
        |  starts_with(p_name, 'red') AS is_red,
        |  ends_with(p_name, 'ring') AS is_ring,
        |  contains(p_name, 'widget') AS has_widget
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin,
    "q_regexp_funs" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
        |    AS name_number,
        |  regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
        |  regexp_matches(c_name, '\d{9}$') AS ends_nine_digits,
        |  regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS segment_word
        |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin,
    "q_date_funs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  strftime(o_orderdate, '%d-%m-%Y') AS formatted,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    DATE '1999-01-01') AS INT) AS days_to_99,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "q_math_funs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  l_orderkey % 7 AS okey_mod7,
        |  pow(2.0, l_linenumber) AS pow2_line,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  greatest(l_quantity, l_tax * 100) AS gr,
        |  least(l_quantity, l_discount * 100) AS ls
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_cond_funs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'final'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'other' END AS status_word,
        |  COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'LOW') AS prio_or_low,
        |  IFNULL(NULLIF(o_orderstatus, 'P'), 'NOT_P') AS nvl_demo,
        |  (o_totalprice > 100000.0 AND o_orderstatus <> 'F') AS big_open
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,
    "q_array_funs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') arr FROM documents)
        |SELECT doc_id,
        |  CAST(len(arr) AS INT) AS n_tok,
        |  array_to_string(arr[1:5], ' ') AS head5,
        |  list_contains(arr, 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(arr))[1:3], ',')
        |    AS sorted_head3,
        |  arr[-1] AS last_tok
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_array_explode" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ')[1:3] arr
        |  FROM documents WHERE doc_id < 20)
        |SELECT * FROM (
        |  SELECT doc_id,
        |    unnest([{'pos': i - 1, 'token': arr[i]}
        |            FOR i IN range(1, len(arr) + 1)], recursive := true)
        |  FROM t) u
        |ORDER BY doc_id, pos""".stripMargin,
    "q_map_funs" ->
      """SELECT r_regionkey, r_name,
        |  (MAP {'REGION_0': 1.0, 'REGION_1': 0.5, 'REGION_2': 1.25,
        |        'REGION_3': 2.0, 'REGION_4': 0.125})[r_name][1] AS rate,
        |  CAST(5 AS INT) AS n_rates,
        |  CAST(1.0 AS DOUBLE) AS base_rate
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k2,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS DOUBLE)
        |    / CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS DOUBLE) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_json_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k,
        |  CAST(COUNT(CAST(json_extract_string(props, '$.missing')
        |       AS BIGINT)) AS BIGINT) AS n_missing,
        |  'OBJECT<k: BIGINT>' AS vtype,
        |  CAST(1 AS BIGINT) AS n_vtypes
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sql_pipe" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${dsumSql("l_extendedprice")} AS rev
         |FROM lineitem
         |WHERE l_quantity >= 30
         |GROUP BY l_returnflag, l_linestatus
         |HAVING COUNT(*) > 0
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_sql_udf" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS INT))
        |    AS BIGINT)) AS BIGINT) AS net_fp
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_str_collation" ->
      """SELECT lower(c_mktsegment) AS segment, COUNT(*) AS n,
        |  CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
        |FROM customer GROUP BY lower(c_mktsegment)
        |ORDER BY segment""".stripMargin,
    "q_udf_scalar" ->
      """SELECT p_partkey,
        |  regexp_replace(lower(p_brand || ' ' || p_name),
        |    '[^a-z0-9]+', '-', 'g') AS slug,
        |  regexp_replace(lower(p_type), '[^a-z0-9]+', '-', 'g') AS type_slug
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin,
    "q_udaf_topk" ->
      """SELECT o_custkey,
        |  array_to_string(
        |    [CAST(CAST(floor(x * 100) AS BIGINT) AS VARCHAR)
        |     FOR x IN (list(o_totalprice ORDER BY o_totalprice DESC))[1:3]],
        |    ',') AS top3_cents,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_udtf_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
        |), b AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
        |                         FOR i IN range(1, len(w))]) bigram
        |  FROM t)
        |SELECT bigram, COUNT(*) AS cnt FROM b
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    // Per-doc sim CTE shared with the q_dedup_simhash oracle; poly_hash
    // twins are the same char-fold Dedup.duckCharHash builds elsewhere.
    "q_sql_extensions" ->
      s"""${Dedup.simhashPerDocCte}
         |SELECT dd.doc_id, s.sim,
         |  ${Dedup.duckCharHash("lower(dd.text)", 31)} AS ph31,
         |  ${Dedup.duckCharHash("lower(dd.text)", 37)} AS ph37
         |FROM documents dd JOIN s USING (doc_id)
         |ORDER BY dd.doc_id""".stripMargin,
  )
}
