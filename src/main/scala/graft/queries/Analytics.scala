package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{tokens, SkillsDict}
import Catalog._

/** Typed-row shape for the Dataset[T] surface query (top level: Encoder
  * codegen requires public accessibility). */
case class Order(o_orderkey: Long, o_custkey: Long,
    o_orderstatus: String, o_totalprice: Double)

/** Behavioral / corpus analytics — the query shapes a production pipeline
  * layers on top of the event stream and document corpus: funnel
  * conversion, weekly retention, the typed Dataset[T] API surface, and
  * TF-IDF term weighting.
  *
  * Scale notes: funnel and retention are single groupBy(user) passes with
  * conditional aggregates (no self-joins, no windows over the full
  * stream); TF-IDF joins per-document term counts to a tiny broadcast
  * document-frequency table. */
object Analytics extends QueryGroup {

  /** Funnel: users whose FIRST view precedes their first click, which
    * precedes their first purchase (first-occurrence ordering semantics —
    * one conditional-min pass, no sequence state needed). */
  private def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val firsts = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("first_view"),
        min(when($"event_type" === "click", $"ts")).as("first_click"),
        min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
    firsts.agg(
      count(lit(1)).as("n_users"),
      count($"first_view").as("n_viewers"),
      sum(when($"first_view" < $"first_click", 1L).otherwise(0L))
        .as("view_then_click"),
      sum(when($"first_view" < $"first_click" &&
        $"first_click" < $"first_purchase", 1L).otherwise(0L))
        .as("full_funnel"))
  }

  /** Weekly retention: of the users active in the stream's first week,
    * how many return in each later week (exact date bucketing). */
  private def eventsRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id",
        floor(datediff($"ts".cast("date"), to_date(lit("2024-01-01"))) / 7)
          .cast("int").as("week"))
      .distinct()
    val week0 = ev.filter($"week" === 0).select($"user_id")
    ev.join(week0, Seq("user_id"), "left_semi")
      .groupBy($"week")
      .agg(countDistinct($"user_id").as("retained_users"))
      .orderBy($"week")
  }

  /** Rolling engagement: per-day DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio (milli-units, integer-exact) — EXACT
    * rolling distinct counts, which no window frame can express
    * (COUNT(DISTINCT) over a sliding frame isn't supported by either
    * engine; approximate sketches would break the oracle).
    *
    * Shape: dedup to (user, day) once — the stream collapses to at most
    * users×days rows — then each user-day CONTRIBUTES itself to the 7
    * window anchors it falls inside (explode of a 7-element date
    * sequence) and is deduped per anchor. At 100 TB the event payload is
    * dropped at the first projection; everything downstream is skinny
    * (user_id, date) pairs with a bounded 7× fan-out, map-side combined
    * into per-day counts. Days with zero events report no row (inner
    * join on observed days) — an explicit semantics choice shared with
    * the oracle. */
  private def eventsDau(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", $"ts".cast("date").as("day"))
      .distinct()
    val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select($"user_id",
        explode(sequence($"day", date_add($"day", 6))).as("day"))
      .distinct()
      .groupBy($"day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select($"day", $"dau", $"wau",
        floor(($"dau" * 1000).cast("double") / $"wau".cast("double"))
          .cast("long").as("stickiness_milli"))
      .orderBy($"day")
  }

  // Top-level visibility: Encoder-generated code cannot access a private
  // nested class.

  /** The typed Dataset[T] surface (SURVEY §1.4): case-class Encoder,
    * typed filter + map, back to a DataFrame. Typed lambdas are opaque to
    * Catalyst (no pushdown through the map) — the documented trade-off;
    * use columns when the optimizer matters. */
  private def typedDataset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .as[Order]
      .filter(o => o.o_totalprice > 400000.0 && o.o_orderstatus != "P")
      .map(o => (o.o_custkey, o.o_orderkey,
        math.floor(o.o_totalprice / 1000) * 1000))
      .toDF("o_custkey", "o_orderkey", "price_bucket")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** TF-IDF over the skills dictionary, rational idf variant
    * (tf * N / df — exact-integer ratio, single IEEE division) so the
    * oracle matches bit-for-bit; ln-based idf differs across libm
    * implementations in the last ulp. Top-3 weighted terms per doc for
    * the first 50 docs. */
  private def textTfidf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .filter($"term".isin(SkillsDict: _*))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"))
    // Corpus size as a lazy broadcast scalar (single-row cross join) —
    // a driver-side .count() here would launch a job at query-build time.
    val n = Tables.documents(s, d).agg(count(lit(1)).as("corpus_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        $"tf".cast("double") * $"corpus_n".cast("double")
          / $"df".cast("double"))
      .filter($"doc_id" < 50)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rnk")
  }

  /** Event-transition (first-order Markov) counts: per user, every
    * consecutive (prev_type → type) step in time order — one window
    * shuffle on user_id, then an agg on the tiny type-pair space. The
    * lag-window shape reuses the user partitioning a sessionizer would
    * already have; nothing touches the cross-user timeline. */
  private def eventsTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy($"prev_type", $"event_type")
  }

  /** Gaps-and-islands: per-user activity streaks over calendar days.
    * The classic trick — `day − row_number()` is constant within a run
    * of consecutive days, so one window plus one aggregation labels
    * every island; no self-joins, no recursive closure. Shape: the
    * (user, day) distinct, the rank window, and both aggregations all
    * key on user_id, so ONE logical partitioning serves the whole
    * query; per-user state is a row counter, never a buffered range. */
  private def eventsStreaks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day")
    Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .withColumn("anchor", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"anchor")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").cast("long").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max($"len").as("longest_streak"))
      .orderBy($"user_id")
  }

  /** Conversion-path regex — the leftmost-greedy pattern both engines'
    * regex kernels (java.util.regex / RE2) agree on: a view, any run of
    * click/signup/error activity, then a purchase. */
  private val ConvPattern = "v[cse]*p"

  /** MATCH_RECOGNIZE-lite: per-user event-sequence pattern matching.
    * Each user's history collapses to a compact symbol string (one char
    * per event, deterministic (ts, event_id) order — the five event
    * types have distinct initials), and conversions are counted as
    * non-overlapping regex matches over that string. This is the
    * sequence-pattern operator Spark lacks as SQL (MATCH_RECOGNIZE),
    * recovered compositionally: sorted collect + codegen'd regex, no
    * window functions, no per-event state machine.
    *
    * Scale: one groupBy(user_id) shuffle carrying (ts, event_id, char)
    * triples; per-user strings are bounded by events-per-user (the same
    * bound any sessionized operator carries), and the regex scan is
    * linear per user. At 100 TB this partitions by user exactly like
    * funnel/retention — no cross-user state. */
  private def eventsPattern(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val seq = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("c"))
      .groupBy($"user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"c"))),
          x => x.getField("c")),
        "").as("seq"))
    seq.select(
      $"user_id",
      length($"seq").as("seq_len"),
      size(regexp_extract_all($"seq", lit(ConvPattern), lit(0)))
        .as("n_conv"),
      length(regexp_extract($"seq", ConvPattern, 0)).as("first_conv_len"))
      .orderBy($"user_id")
  }

  val queries: Map[String, Q] = Map(
    "q_events_pattern" -> eventsPattern,
    "q_events_streaks" -> eventsStreaks,
    "q_events_transitions" -> eventsTransitions,
    "q_events_funnel" -> eventsFunnel,
    "q_events_retention" -> eventsRetention,
    "q_events_dau" -> eventsDau,
    "q_typed_dataset" -> typedDataset,
    "q_text_tfidf" -> textTfidf,
  )

  val oracle: Map[String, String] = Map(
    "q_events_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
        |      AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, length(seq) AS seq_len,
        |  len(regexp_extract_all(seq, 'v[cse]*p')) AS n_conv,
        |  length(regexp_extract(seq, 'v[cse]*p', 0)) AS first_conv_len
        |FROM s ORDER BY user_id""".stripMargin,
    "q_events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |i AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (
        |      PARTITION BY user_id ORDER BY day) AS INT) AS anchor
        |  FROM days),
        |g AS (SELECT user_id, anchor, COUNT(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  COUNT(*) AS n_streaks, MAX(len) AS longest_streak
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_events_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n_transitions
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,
    "q_events_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) first_view,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) first_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  COUNT(first_view) AS n_viewers,
        |  CAST(SUM(CASE WHEN first_view < first_click THEN 1 ELSE 0 END)
        |    AS BIGINT) AS view_then_click,
        |  CAST(SUM(CASE WHEN first_view < first_click
        |            AND first_click < first_purchase THEN 1 ELSE 0 END)
        |    AS BIGINT) AS full_funnel
        |FROM f""".stripMargin,
    "q_events_dau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
        |), wa AS (
        |  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
        |  FROM ud, UNNEST(range(0, 7)) AS r(i)
        |), wau AS (
        |  SELECT day, COUNT(*) AS wau FROM wa GROUP BY day
        |)
        |SELECT day, dau.dau, wau.wau,
        |  CAST(floor(CAST(dau.dau * 1000 AS DOUBLE)
        |    / CAST(wau.wau AS DOUBLE)) AS BIGINT) AS stickiness_milli
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    "q_events_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) / 7) AS INT) AS week
        |  FROM events),
        |w0 AS (SELECT user_id FROM ev WHERE week = 0)
        |SELECT week, COUNT(DISTINCT ev.user_id) AS retained_users
        |FROM ev SEMI JOIN w0 ON ev.user_id = w0.user_id
        |GROUP BY week ORDER BY week""".stripMargin,
    "q_typed_dataset" ->
      """SELECT o_custkey, o_orderkey,
        |  floor(o_totalprice / 1000) * 1000 AS price_bucket
        |FROM orders
        |WHERE o_totalprice > 400000.0 AND o_orderstatus <> 'P'
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_text_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |  WHERE term IN ${SkillsDict.map(x => s"'$x'").mkString("(", ", ", ")")}
         |  GROUP BY doc_id, term
         |), df AS (
         |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
         |), n AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT doc_id, rnk, term, tf, df, score FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE)
         |      / CAST(df.df AS DOUBLE) AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE)
         |               / CAST(df.df AS DOUBLE) DESC, tf.term) AS rnk
         |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
         |  WHERE tf.doc_id < 50) t
         |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
  )
}
