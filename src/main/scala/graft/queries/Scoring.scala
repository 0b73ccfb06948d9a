package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.MoneyDecimal.moneyDecimal

import graft.core.Tables
import graft.core.Checkpoints.MaterializeOps
import graft.functions.TextFunctions.tokens
import Catalog._

/** Behavioral + quality scoring — round-10 surface extensions over the
  * event stream and document corpus:
  *
  *  - `q_events_rfm`: RFM (recency/frequency/monetary) quartile
  *    segmentation with CDF-bucketed quartiles — no global window;
  *  - `q_events_attribution`: last-touch purchase attribution via a
  *    per-user carry-forward window;
  *  - `q_anomaly_seasonal`: hour-of-day seasonal anomaly flags from an
  *    integer-exact 2-sigma test (squared form — no float compare);
  *  - `q_agg_diversity`: Gini–Simpson diversity of each user's event-type
  *    mix (the log-free diversity index — libm entropy is banned on
  *    oracle paths, see [[Catalog]]);
  *  - `q_text_surprisal`: quantized unigram-LM surprisal scoring —
  *    floor-log2 self-information summed per document, an integer-exact
  *    stand-in for the perplexity filters LLM data pipelines run.
  *
  * Cross-engine determinism: every ranking/flagging decision here is made
  * in exact integer arithmetic (decimal-exact money, squared variance
  * tests, bit-length logs); the only doubles surfaced are single
  * correctly-rounded divide/sqrt chains written identically in the DuckDB
  * twins.
  */
object Scoring extends QueryGroup {

  /** Fixed RFM anchor "today" (events span 2024; testdata contract). */
  private val RfmAnchor = "2025-01-01"
  /** Attribution lookback: purchases credit a click ≤ 7 days prior. */
  private[graft] val AttribWindowUs = 7L * 86400L * 1000000L
  private[graft] val SurprisalTopK = 25

  // --- q_events_rfm ------------------------------------------------------

  /** RFM segmentation: per user, days since last event (vs the fixed
    * [[RfmAnchor]]), event count, and exact micro-unit monetary sum, each
    * mapped to its ascending CDF quartile and folded into the classic
    * 3-digit RFM code.
    *
    * Quartile of value v = 1 + #{q ∈ 1..3 : lt(v) ≥ ceil(q·n/4)} where
    * lt(v) = #users with a strictly smaller value — ties always share a
    * bucket (value-based CDF semantics, not NTILE's arbitrary tie split,
    * which no distributed plan can reproduce without the global sort the
    * plan audit bans).
    *
    * Scale shape: ONE groupBy(user) pass builds the skinny metric
    * relation; the three metrics then ride a single tagged union into ONE
    * per-(metric, value) histogram, so the non-equi cumulative self-join
    * runs on the BOUNDED value domain (recency: days, frequency: counts,
    * monetary: whole units — the dense-domain metric is pre-bucketed to
    * the CDF grid; the surfaced `m_micro` stays exact), never on users.
    * The finished value→quartile map is tiny: checkpointed once and
    * broadcast into three user-side joins. This is the [[Quantiles]]
    * two-phase-selection idea specialized to 3 fixed cuts × 3 metrics. */
  private def eventsRfm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        datediff(to_date(lit(RfmAnchor)), max($"ts").cast("date"))
          .cast("long").as("r_days"),
        count(lit(1)).as("f"),
        (sum(moneyDecimal($"value")) * 1000000)
          .cast("long").as("m_micro"))
      .materialized // skinny 4-col relation feeds histogram + output
    val metrics = u.select(lit("r").as("mt"), $"r_days".as("v"))
      .union(u.select(lit("f"), $"f"))
      .union(u.select(lit("m"), expr("m_micro div 1000000")))
    val h = metrics.groupBy($"mt", $"v").agg(count(lit(1)).as("cnt"))
    val lt = h.as("a")
      .join(broadcast(h.as("b")),
        $"a.mt" === $"b.mt" && $"b.v" < $"a.v", "left")
      .groupBy($"a.mt".as("mt"), $"a.v".as("v"))
      .agg(coalesce(sum($"b.cnt"), lit(0L)).as("lt"))
    val n = u.agg(count(lit(1)).as("n")) // one user count serves all three
    val qmap = lt.crossJoin(broadcast(n))
      .select($"mt", $"v",
        (lit(1) +
          ($"lt" >= expr("(1*n+3) div 4")).cast("int") +
          ($"lt" >= expr("(2*n+3) div 4")).cast("int") +
          ($"lt" >= expr("(3*n+3) div 4")).cast("int")).as("q"))
      .materialized // tiny; evaluated once, broadcast three times
    def q(mt: String) = broadcast(qmap.filter($"mt" === mt).drop("mt"))
    u.join(q("r"), $"r_days" === $"v").drop("v")
      .withColumnRenamed("q", "r_q")
      .join(q("f"), $"f" === $"v").drop("v")
      .withColumnRenamed("q", "f_q")
      .join(q("m"), expr("m_micro div 1000000") === $"v").drop("v")
      .withColumnRenamed("q", "m_q")
      .select($"user_id", $"r_days", $"f", $"m_micro",
        $"r_q", $"f_q", $"m_q",
        ($"r_q" * 100 + $"f_q" * 10 + $"m_q").as("rfm"))
      .orderBy($"user_id")
  }

  // --- q_events_attribution ----------------------------------------------

  /** Last-touch attribution: each purchase credits the user's most recent
    * click strictly before it, if that click is within [[AttribWindowUs]].
    * The carry-forward is ONE window partitioned by user (rows unbounded
    * preceding → 1 preceding, `last(..., ignoreNulls)`) — the sessionize
    * shape; no self-join, no as-of shuffle beyond the per-user sort.
    * Rolled up per user: purchases, attributed purchases, exact
    * micro-unit attributed revenue. Timestamps compare as exact int64
    * microseconds (`unix_micros` / DuckDB `epoch_us`). */
  private def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts", $"event_type",
        moneyDecimal($"value").as("val_d"))
      .withColumn("last_click_us",
        last(when($"event_type" === "click", unix_micros($"ts")),
          ignoreNulls = true).over(w))
    ev.filter($"event_type" === "purchase")
      .withColumn("attributed",
        $"last_click_us".isNotNull &&
          unix_micros($"ts") - $"last_click_us" <= AttribWindowUs)
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum($"attributed".cast("long")).as("n_attributed"),
        (sum(when($"attributed", $"val_d").otherwise(lit(0).cast(DecimalType(18, 6))))
          * 1000000).cast("long").as("attr_micro"))
      .orderBy($"user_id")
  }

  // --- q_anomaly_seasonal ------------------------------------------------

  /** Seasonal (hour-of-day) anomaly detection over hourly event volumes.
    *
    * Dense hourly grid first (distinct days × broadcast 24 hours, zeros
    * filled — absent cells are the baseline's business, not missing
    * data), then a per-hour-of-day baseline (n days, Σc, Σc²) and a
    * 2-sigma-population flag evaluated ENTIRELY in integers via the
    * squared form: flag ⇔ n·c − S > 0 ∧ (n·c − S)² > 4·(n·SS − S²) —
    * no float compare can tie-break differently cross-engine. The square
    * is carried in DECIMAL(38,0) ↔ HUGEINT (like `q_trend_ols`): with
    * hourly volumes ≥1e5 the deviation n·c−S reaches ~1e8·days and its
    * square exceeds 2^63; the UNSQUARED long moments hold to per-hour
    * counts ~3e9 (n·SS < 2^63), the documented residual bound. The
    * surfaced z-score is the one double: (n·c−S)/√(n·SS−S²), a
    * cast-mul-sqrt-divide chain of correctly-rounded IEEE ops (operands
    * ≪ 2^53 — counts are per-hour event volumes). Two aggregations plus
    * a broadcast of the 24-row baseline; scales with the calendar, not
    * the stream. */
  private def anomalySeasonal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"ts".cast("date").as("day"), hour($"ts").as("hr"))
    val counts = ev.groupBy($"day", $"hr").agg(count(lit(1)).as("c"))
    val hours = s.range(0, 24).select($"id".cast("int").as("hr"))
    val grid = ev.select($"day").distinct()
      .crossJoin(broadcast(hours))
      .join(counts, Seq("day", "hr"), "left")
      .select($"day", $"hr", coalesce($"c", lit(0L)).as("c"))
    val base = grid.groupBy($"hr")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum($"c" * $"c").as("ss"))
    grid.join(broadcast(base), Seq("hr"))
      .withColumn("num", $"n" * $"c" - $"s")
      .withColumn("den2", $"n" * $"ss" - $"s" * $"s")
      .filter {
        val d38 = DecimalType(38, 0)
        def dd(c: Column) = c.cast(d38)
        // den2 stays BIGINT: the z denominator needs the exact long→double
        // cast (a HUGEINT→DOUBLE cast double-rounds in the oracle engine).
        $"num" > 0 && dd($"num") * dd($"num") > lit(4).cast(d38) * dd($"den2")
      }
      .select($"day", $"hr", $"c".as("n_events"),
        ($"num".cast("double") / sqrt($"den2".cast("double"))).as("z"))
      .orderBy($"day", $"hr")
  }

  // --- q_agg_diversity ---------------------------------------------------

  /** Gini–Simpson diversity of each user's event-type mix:
    * 1 − Σ pᵢ² computed as the single correctly-rounded divide
    * (N² − Σcᵢ²) / N² over exact integer moments — the standard log-free
    * diversity index (libm `ln` entropy is banned on oracle paths).
    * Two cascaded aggregations, both map-side combinable; no joins. */
  private def aggDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(sum($"c").as("n_events"),
        count(lit(1)).as("n_types"),
        sum($"c" * $"c").as("sq"))
      .select($"user_id", $"n_events", $"n_types",
        (($"n_events" * $"n_events" - $"sq").cast("double") /
          ($"n_events" * $"n_events").cast("double")).as("gini"))
      .orderBy($"user_id")
  }

  // --- q_text_surprisal --------------------------------------------------

  /** Quantized unigram-LM surprisal: score each document by the summed
    * floor-log2 self-information of its tokens under the corpus unigram
    * model — bits(t) = ⌊log2(T ÷ cₜ)⌋, computed EXACTLY as
    * `length(bin(T div cₜ)) − 1` (bit length of an integer quotient;
    * libm log2 is banned on oracle paths). High bits-per-token marks the
    * out-of-distribution / noisy documents a perplexity filter would cut.
    *
    * Scale shape: one token-level count (map-side combined), T broadcast
    * as a scalar, one equi-join of doc-tokens to the vocab's bits table
    * on token (both sides hash-partition on token — the standard
    * token-frequency join), one per-doc aggregation into
    * TakeOrdered(25). Nothing driver-side, nothing all-pairs. */
  private def textSurprisal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tk = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
    val vc = tk.groupBy($"tok").agg(count(lit(1)).as("c"))
    val t  = vc.agg(sum($"c").as("t"))
    val bits = vc.crossJoin(broadcast(t))
      .select($"tok", (length(bin(expr("t div c"))) - 1).cast("long").as("bits"))
    tk.join(bits, Seq("tok"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"), sum($"bits").as("total_bits"))
      .select($"doc_id", $"n_tok", $"total_bits",
        expr("total_bits * 1000 div n_tok").as("bpt_fp"))
      .orderBy($"bpt_fp".desc, $"doc_id")
      .limit(SurprisalTopK)
  }

  // --- q_events_sessionize -----------------------------------------------

  /** Session idle gap: a ≥ 30-minute silence starts a new session. */
  private[graft] val SessionGapUs = 1800L * 1000000L

  /** Batch sessionization: split each user's event stream at
    * [[SessionGapUs]] idle gaps and emit one row per session (index,
    * size, exact microsecond duration, purchases). The batch twin of the
    * streaming `session_window` aggregation (`q_events_session`) — same
    * gap semantics, but with the full per-session detail a training
    * pipeline joins on.
    *
    * Shape: lag + running-sum windows share ONE per-user sort (same
    * partition spec and ordering → one exchange, one sort), then the
    * per-(user, session) rollup reuses the user partitioning. Timestamps
    * compare as exact int64 micros; session index is a running count of
    * gap flags — all integers, no RNG, no floats. */
  private def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"event_type")
      .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
      .withColumn("new_s",
        ($"prev_us".isNull || $"ts_us" - $"prev_us" >= SessionGapUs)
          .cast("long"))
      .withColumn("session_idx",
        sum($"new_s").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        (max($"ts_us") - min($"ts_us")).as("dur_us"),
        sum(($"event_type" === "purchase").cast("long")).as("n_purchases"))
      .orderBy($"user_id", $"session_idx")
  }

  // --- q_trend_ols -------------------------------------------------------

  /** Daily-revenue trend monitor: closed-form OLS of daily revenue (exact
    * cents) on the day index, per return flag — the slope IS the
    * revenue-per-day drift a pipeline alerts on.
    *
    * Two cascaded aggregations: lineitem collapses to ~2.5k (flag, day,
    * cents) rows (map-side combined — the only fact-table pass), then the
    * five moment sums reduce per flag. All moments are exact integers
    * (day index x ≤ ~3.6k, daily cents y ≤ ~7e8 at sf0.1); the OLS
    * numerators n·Sxy − Sx·Sy and Sy·Sxx − Sx·Sxy reach ~1e19, so they
    * are carried in DECIMAL(38,0) and converted to double through the
    * exact 2^32 hi/lo split ([[Mining]]'s q_agg_corr move — a direct
    * int128→double cast double-rounds in DuckDB; the split is exact for
    * |v| < 2^85, asserted by magnitude here; at larger scale add a
    * second split level, same plan). slope = num / den and
    * intercept = inum / den are then single correctly-rounded IEEE
    * divides written identically in the DuckDB twin. */
  private def trendOls(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val d38 = DecimalType(38, 0)
    def dd(c: Column) = c.cast(d38)
    // Exact int128→double via 2^32 hi/lo: both engines truncate integer
    // div/% toward zero, so v = q·2^32 + r holds with identical (q, r),
    // hi→double is exact (|q| < 2^53), the 2^32 multiply is an exponent
    // shift, and the final add is the one correctly-rounded op.
    def hilo(name: String): Column =
      expr(s"CAST($name div 4294967296 AS DOUBLE) * 4294967296.0D" +
        s" + CAST($name % 4294967296 AS DOUBLE)")
    val daily = Tables.lineitem(s, d)
      .select($"l_returnflag",
        datediff($"l_shipdate".cast("date"), to_date(lit("1992-01-01")))
          .cast("long").as("x"),
        (moneyDecimal($"l_extendedprice", 18, 2) * 100).cast("long")
          .as("cents"))
      .groupBy($"l_returnflag", $"x")
      .agg(sum($"cents").as("y"))
    val m = daily.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(dd($"x" * $"y")).as("sxy"),
        sum(dd($"x" * $"x")).as("sxx"))
      .withColumn("num", dd($"n") * $"sxy" - dd($"sx") * dd($"sy"))
      .withColumn("inum", dd($"sy") * $"sxx" - dd($"sx") * $"sxy")
      .withColumn("den", (dd($"n") * $"sxx" - dd($"sx") * dd($"sx"))
        .cast("long"))
    m.select($"l_returnflag", $"n".as("n_days"),
        (hilo("num") / $"den".cast("double")).as("slope_cents_per_day"),
        (hilo("inum") / $"den".cast("double")).as("intercept_cents"))
      .orderBy($"l_returnflag")
  }

  // --- q_events_bursts ---------------------------------------------------

  /** Burst window length in seconds (a trailing hour). */
  private val BurstWindowS = 3600L

  /** Burst detection: each user's maximum event count within ANY trailing
    * one-hour window — the rate-limiter / abuse-detection statistic. The
    * trailing count is ONE range-frame window over exact epoch seconds
    * (`RANGE [-3599, 0]` — every event anchors a candidate window, so the
    * max over anchors IS the max over all windows); the per-user rollup
    * reuses the window's partitioning. Integer seconds and counts
    * end to end. */
  private def eventsBursts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_s")
      .rangeBetween(-(BurstWindowS - 1), Window.currentRow)
    Tables.events(s, d)
      .select($"user_id", expr("unix_micros(ts) div 1000000").as("ts_s"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"burst").as("max_burst_1h"))
      .orderBy($"user_id")
  }

  // --- q_drift_cusum -----------------------------------------------------

  /** One-sided CUSUM change-point monitor over per-type daily event
    * volumes — the sequential drift detector that fires on a sustained
    * upward shift, complementing the two-sample tests (`q_drift_ks`,
    * `q_drift_chisq`) which need a fixed reference cut.
    *
    * The recursive statistic S_t = max(0, S_{t-1} + x_t) is NOT
    * window-expressible directly; it unrolls to the classic identity
    * S_t = P_t − min(0, min_{j≤t} P_j) over the prefix sums P — two
    * frames (running sum, running min) sharing ONE per-type sort. To
    * stay integer-exact the deviations are scaled by n: x̃_t = n·c_t − Σc
    * (mean-zero without a divide), and the 5σ alarm compares squares:
    * alarm ⇔ S̃_t > 0 ∧ S̃_t² > 25·(n·SS − S²) — no float threshold can
    * tie-break differently cross-engine. The squared comparison is
    * carried in DECIMAL(38,0) (Spark) ↔ HUGEINT (DuckDB) like
    * `q_trend_ols`: S̃ reaches ~n·Σc (≈1e11 at 1e5-event days over 3
    * years), so its square blows through 2^63 long before the inputs do.
    * Residual bound: the long-typed prefix sums/moments themselves
    * require n·Σc² < 2^63 — per-day counts below ~3e9·√(1/n·days²),
    * comfortably beyond any per-type daily volume. Dense day grid first
    * (a silent day IS evidence of downward drift and must enter the
    * sums). Everything shuffled is (type, day)-sized — the calendar, not
    * the stream. */
  private def driftCusum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_type", $"ts".cast("date").as("day"))
    val counts = ev.groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
    val grid = ev.select($"event_type").distinct()
      .crossJoin(broadcast(ev.select($"day").distinct()))
      .join(counts, Seq("event_type", "day"), "left")
      .select($"event_type", $"day", coalesce($"c", lit(0L)).as("c"))
    val stats = grid.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum($"c" * $"c").as("ss"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cu = grid.join(broadcast(stats), Seq("event_type"))
      .withColumn("x", $"n" * $"c" - $"s")
      .withColumn("p", sum($"x").over(w))
      .withColumn("cusum", $"p" - least(lit(0L), min($"p").over(w)))
      .withColumn("alarm", {
        val d38 = DecimalType(38, 0)
        def dd(c: Column) = c.cast(d38)
        $"cusum" > 0 &&
          dd($"cusum") * dd($"cusum") >
            lit(25).cast(d38) * (dd($"n") * dd($"ss") - dd($"s") * dd($"s"))
      })
    cu.groupBy($"event_type")
      .agg(max($"cusum").as("max_cusum"),
        sum($"alarm".cast("long")).as("n_alarms"),
        min(when($"alarm", $"day")).as("first_alarm_day"))
      .orderBy($"event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_events_bursts" -> eventsBursts,
    "q_drift_cusum" -> driftCusum,
    "q_events_rfm" -> eventsRfm,
    "q_events_sessionize" -> eventsSessionize,
    "q_trend_ols" -> trendOls,
    "q_events_attribution" -> eventsAttribution,
    "q_anomaly_seasonal" -> anomalySeasonal,
    "q_agg_diversity" -> aggDiversity,
    "q_text_surprisal" -> textSurprisal,
  )

  val oracle: Map[String, String] = Map(
    "q_events_bursts" ->
      s"""WITH ev AS (
         |  SELECT user_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
         |b AS (
         |  SELECT user_id,
         |    count(*) OVER (PARTITION BY user_id ORDER BY ts_s
         |      RANGE BETWEEN ${BurstWindowS - 1} PRECEDING AND CURRENT ROW)
         |      AS burst
         |  FROM ev)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(max(burst) AS BIGINT) AS max_burst_1h
         |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_drift_cusum" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (
        |  SELECT event_type, day, count(*) AS c
        |  FROM ev GROUP BY event_type, day),
        |grid AS (
        |  SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT event_type FROM ev) t
        |  CROSS JOIN (SELECT DISTINCT day FROM ev) d
        |  LEFT JOIN counts c
        |    ON c.event_type = t.event_type AND c.day = d.day),
        |stats AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c*c) AS BIGINT) AS ss
        |  FROM grid GROUP BY event_type),
        |cu AS (
        |  SELECT g.event_type, g.day, st.n, st.s, st.ss,
        |    CAST(sum(st.n * g.c - st.s) OVER w AS BIGINT) AS p
        |  FROM grid g JOIN stats st ON g.event_type = st.event_type
        |  WINDOW w AS (PARTITION BY g.event_type ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cs AS (
        |  SELECT event_type, day, n, s, ss,
        |    p - least(CAST(0 AS BIGINT), CAST(min(p) OVER w AS BIGINT))
        |      AS cusum
        |  FROM cu
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |al AS (
        |  SELECT event_type, day, cusum,
        |    (cusum > 0 AND
        |     CAST(cusum AS HUGEINT)*CAST(cusum AS HUGEINT) >
        |       25*(CAST(n AS HUGEINT)*ss - CAST(s AS HUGEINT)*s)) AS alarm
        |  FROM cs)
        |SELECT event_type,
        |  CAST(max(cusum) AS BIGINT) AS max_cusum,
        |  CAST(SUM(CAST(alarm AS BIGINT)) AS BIGINT) AS n_alarms,
        |  min(CASE WHEN alarm THEN day END) AS first_alarm_day
        |FROM al GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_events_sessionize" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         |    lag(epoch_us(ts)) OVER w AS prev_us
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |f AS (
         |  SELECT user_id, event_id, event_type, ts_us,
         |    CAST(prev_us IS NULL OR ts_us - prev_us >= $SessionGapUs
         |         AS BIGINT) AS new_s
         |  FROM ev),
         |sid AS (
         |  SELECT user_id, event_type, ts_us,
         |    CAST(sum(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS session_idx
         |  FROM f)
         |SELECT user_id, session_idx,
         |  count(*) AS n_events,
         |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us,
         |  CAST(SUM(CAST(event_type = 'purchase' AS BIGINT)) AS BIGINT)
         |    AS n_purchases
         |FROM sid GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    "q_trend_ols" ->
      """WITH daily AS (
        |  SELECT l_returnflag,
        |    date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |      AS x,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
        |         AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x*y AS HUGEINT)) AS sxy,
        |    sum(CAST(x*x AS HUGEINT)) AS sxx
        |  FROM daily GROUP BY 1),
        |k AS (
        |  SELECT l_returnflag, n,
        |    n*sxy - sx*CAST(sy AS HUGEINT) AS num,
        |    sy*sxx - sx*sxy AS inum,
        |    CAST(n*sxx - CAST(sx AS HUGEINT)*sx AS BIGINT) AS den
        |  FROM m)
        |SELECT l_returnflag, n AS n_days,
        |  (CAST(num // 4294967296 AS DOUBLE) * 4294967296.0
        |    + CAST(num % 4294967296 AS DOUBLE)) / CAST(den AS DOUBLE)
        |    AS slope_cents_per_day,
        |  (CAST(inum // 4294967296 AS DOUBLE) * 4294967296.0
        |    + CAST(inum % 4294967296 AS DOUBLE)) / CAST(den AS DOUBLE)
        |    AS intercept_cents
        |FROM k ORDER BY l_returnflag""".stripMargin,
    "q_events_rfm" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    date_diff('day', CAST(max(ts) AS DATE), DATE '$RfmAnchor')
         |      AS r_days,
         |    count(*) AS f,
         |    CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
         |      AS m_micro
         |  FROM events GROUP BY user_id),
         |n AS (SELECT count(*) AS n FROM u),
         |r AS (
         |  SELECT u.*,
         |    rank() OVER (ORDER BY r_days) - 1 AS lt_r,
         |    rank() OVER (ORDER BY f) - 1 AS lt_f,
         |    rank() OVER (ORDER BY m_micro // 1000000) - 1 AS lt_m
         |  FROM u),
         |q AS (
         |  SELECT user_id, r_days, f, m_micro,
         |    1 + CAST(lt_r >= (1*n+3)//4 AS INT)
         |      + CAST(lt_r >= (2*n+3)//4 AS INT)
         |      + CAST(lt_r >= (3*n+3)//4 AS INT) AS r_q,
         |    1 + CAST(lt_f >= (1*n+3)//4 AS INT)
         |      + CAST(lt_f >= (2*n+3)//4 AS INT)
         |      + CAST(lt_f >= (3*n+3)//4 AS INT) AS f_q,
         |    1 + CAST(lt_m >= (1*n+3)//4 AS INT)
         |      + CAST(lt_m >= (2*n+3)//4 AS INT)
         |      + CAST(lt_m >= (3*n+3)//4 AS INT) AS m_q
         |  FROM r, n)
         |SELECT user_id, r_days, f, m_micro, r_q, f_q, m_q,
         |  r_q*100 + f_q*10 + m_q AS rfm
         |FROM q ORDER BY user_id""".stripMargin,
    "q_events_attribution" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type,
         |    epoch_us(ts) AS ts_us,
         |    CAST(value AS DECIMAL(18,6)) AS val_d,
         |    last_value(CASE WHEN event_type = 'click'
         |                    THEN epoch_us(ts) END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS last_click_us
         |  FROM events),
         |p AS (
         |  SELECT user_id, val_d,
         |    (last_click_us IS NOT NULL AND
         |     ts_us - last_click_us <= $AttribWindowUs) AS attributed
         |  FROM ev WHERE event_type = 'purchase')
         |SELECT user_id,
         |  count(*) AS n_purchases,
         |  CAST(SUM(CAST(attributed AS BIGINT)) AS BIGINT) AS n_attributed,
         |  CAST(SUM(CASE WHEN attributed THEN val_d
         |                ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000
         |       AS BIGINT) AS attr_micro
         |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_anomaly_seasonal" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr FROM events),
        |counts AS (
        |  SELECT day, hr, count(*) AS c FROM ev GROUP BY day, hr),
        |grid AS (
        |  SELECT d.day, h.hr, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT day FROM ev) d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hr) h
        |  LEFT JOIN counts c ON c.day = d.day AND c.hr = h.hr),
        |base AS (
        |  SELECT hr, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c*c) AS BIGINT) AS ss
        |  FROM grid GROUP BY hr)
        |SELECT g.day, g.hr, g.c AS n_events,
        |  CAST(b.n*g.c - b.s AS DOUBLE)
        |    / sqrt(CAST(b.n*b.ss - b.s*b.s AS DOUBLE)) AS z
        |FROM grid g JOIN base b ON g.hr = b.hr
        |WHERE b.n*g.c - b.s > 0
        |  AND CAST(b.n*g.c - b.s AS HUGEINT)*CAST(b.n*g.c - b.s AS HUGEINT)
        |      > 4*CAST(b.n*b.ss - b.s*b.s AS HUGEINT)
        |ORDER BY g.day, g.hr""".stripMargin,
    "q_agg_diversity" ->
      """WITH tc AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  CAST(sum(c) AS BIGINT) AS n_events,
        |  count(*) AS n_types,
        |  CAST(sum(c)*sum(c) - sum(c*c) AS DOUBLE)
        |    / CAST(sum(c)*sum(c) AS DOUBLE) AS gini
        |FROM tc GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_text_surprisal" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |vc AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vc),
         |bits AS (
         |  SELECT tok, CAST(length(bin(t // c)) - 1 AS BIGINT) AS bits
         |  FROM vc, t),
         |d AS (
         |  SELECT doc_id, count(*) AS n_tok,
         |    CAST(sum(bits) AS BIGINT) AS total_bits
         |  FROM tk JOIN bits USING (tok) GROUP BY doc_id)
         |SELECT doc_id, n_tok, total_bits,
         |  total_bits * 1000 // n_tok AS bpt_fp
         |FROM d ORDER BY bpt_fp DESC, doc_id LIMIT $SurprisalTopK""".stripMargin,
  )
}
