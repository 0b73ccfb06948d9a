package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import Catalog._

/** Mergeable-sketch surface — SURVEY.md §2B "approximate distinct
  * (sketch cube)" and "approximate percentiles (rank-error gated)".
  *
  * The reference has no sketch layer (its `count(DISTINCT)`s are exact,
  * `data_populator/populator.py` A1-A5 scale), but a 100 TB pipeline
  * cannot re-scan raw data for every distinct-count rollup. The scale
  * pattern is the PRE-AGGREGATED SKETCH CUBE: build one tiny mergeable
  * sketch per fine-grained cell (here: per day), persist it, and answer
  * every coarser rollup (month / quarter / year / all-time) by MERGING
  * sketches — never touching raw rows again. Spark 3.5+ ships Apache
  * DataSketches HLL natively (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`), all codegen-friendly catalyst expressions.
  *
  * Oracle strategy: a sketch estimate is not SQL-reproducible in DuckDB,
  * but its ACCURACY CONTRACT is. Each query emits the exact answer plus
  * an `ok` flag asserting the sketch landed inside its published error
  * envelope (HLL lgK=12: ±1.6% at 3σ — gated at ±5%; KLL-style quantile
  * summaries at accuracy=10000: rank error ≤ 0.01% — gated at ±1.5%
  * rank). The DuckDB oracle emits the same exact values with `ok` as a
  * constant 1, so the hash gate FAILS if the sketch ever drifts outside
  * its envelope. Determinism: HLL register state is max-based, so
  * estimates are insertion- and merge-order independent; the quantile
  * gate only exposes `ok`, whose ±1.5% tolerance is 150× the summary's
  * worst-case rank error, far beyond any merge-order jitter.
  */
object Sketches extends QueryGroup {

  /** lgConfigK for the HLL sketches: 2^12 registers ≈ 1.6% RSE. */
  private val HllLgK = 12

  /** Relative error gate for the HLL estimate (3× the published RSE). */
  private val HllTol = 0.05

  /** Approximate-percentile targets and rank-error gate. */
  private val Pcts = Seq(50, 90, 99)
  private val QAccuracy = 10000
  private val QRankTol = 0.015

  /** Per-day HLL sketches of distinct customers, merged to months.
    *
    * The daily `sk` relation is the persistable cube: one ~4 KB binary
    * per (month, day) regardless of row count. The month rollup is a
    * sketch UNION (register-wise max) — the exact `countDistinct` branch
    * exists only to power the oracle's accuracy gate. */
  private def sketchHll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select(
      $"o_custkey",
      to_date(date_trunc("month", $"o_orderdate")).as("month"),
      to_date($"o_orderdate").as("day"))
    val daily = o.groupBy($"month", $"day")
      .agg(hll_sketch_agg($"o_custkey", lit(HllLgK)).as("sk"))
    val est = daily.groupBy($"month")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("nd_est"))
    val exact = o.groupBy($"month")
      .agg(countDistinct($"o_custkey").as("nd_exact"))
    est.join(exact, "month")
      .select($"month", $"nd_exact",
        when(abs($"nd_est" - $"nd_exact") <= $"nd_exact" * HllTol, lit(1))
          .otherwise(lit(0)).as("ok"))
      .orderBy($"month")
  }

  /** `percentile_approx` gated on its RANK-error contract (the value
    * error of a quantile sketch is unbounded on sparse regions; rank
    * error is what the summary actually guarantees). One aggregate pass
    * builds the summary; a second pass ranks the 3 returned cut points
    * against the data via a broadcast of the 1-row result — no global
    * sort anywhere. */
  private def quantileApprox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v = Tables.lineitem(s, d).select($"l_extendedprice".as("v"))
    val cuts = v
      .agg(
        percentile_approx($"v",
          array(Pcts.map(p => lit(p / 100.0)): _*), lit(QAccuracy))
          .as("avs"),
        count(lit(1)).as("n"))
      .select($"n", posexplode($"avs").as(Seq("i", "av")))
      .select(
        element_at(array(Pcts.map(lit): _*), $"i" + 1).as("pct"),
        $"n", $"av")
    v.crossJoin(broadcast(cuts))
      .groupBy($"pct", $"n")
      .agg(sum(when($"v" <= $"av", 1L).otherwise(0L)).as("r"))
      .select($"pct", $"n",
        (($"r" / $"n" >= $"pct" / 100.0 - QRankTol) &&
          ($"r" / $"n" <= $"pct" / 100.0 + QRankTol)).cast("int").as("ok"))
      .orderBy($"pct")
  }

  /** Incremental sketch-cube maintenance — the property that makes the
    * sketch cube OPERABLE at 100 TB: when a new batch of raw data lands,
    * yesterday's per-day sketches are NOT rebuilt; the batch's own
    * sketches are unioned in. HLL register state is a pointwise max, so
    * merge-of-parts is bit-identical to from-scratch — `ok_merge` pins
    * that exactly (not within tolerance: the two estimates must be THE
    * SAME double), and `ok_env` re-checks the accuracy envelope on the
    * merged result. The standing/batch split is a deterministic key
    * slice, mimicking an append-only ingest boundary. */
  private def sketchIncremental(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select(
      $"o_custkey",
      to_date(date_trunc("month", $"o_orderdate")).as("month"),
      to_date($"o_orderdate").as("day"),
      ($"o_orderkey" % 10 === 0).as("is_batch"))
    val daily = o.groupBy($"month", $"day", $"is_batch")
      .agg(hll_sketch_agg($"o_custkey", lit(HllLgK)).as("sk"))
    val incr = daily.groupBy($"month")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("nd_incr"))
    val full = o.groupBy($"month")
      .agg(hll_sketch_estimate(
        hll_sketch_agg($"o_custkey", lit(HllLgK))).as("nd_full"))
    val exact = o.groupBy($"month")
      .agg(countDistinct($"o_custkey").as("nd_exact"))
    incr.join(full, "month").join(exact, "month")
      .select($"month", $"nd_exact",
        ($"nd_incr" === $"nd_full").cast("int").as("ok_merge"),
        when(abs($"nd_incr" - $"nd_exact") <= $"nd_exact" * HllTol, lit(1))
          .otherwise(lit(0)).as("ok_env"))
      .orderBy($"month")
  }

  /** Count-min parameters: depth 3 (one polynomial hash per multiplier),
    * 64 counters per row. Width is deliberately SMALL at test scale so
    * collisions actually occur and the one-sided error is exercised —
    * production sizes w = ⌈e/ε⌉ for target overcount ε·N. */
  private val CmsMults = Seq(31L, 37L, 41L)
  private[queries] val CmsWidth = 64

  /** Count-min sketch as a RELATION — the frequency twin of the HLL
    * cube: the sketch is the (j, bucket, cnt) table of d×w counters,
    * built in one explode + map-side-combined agg, mergeable across
    * batches by summing counters (CmsSpec pins merge == from-scratch),
    * and broadcastable by construction (d×w rows regardless of input).
    * A point query min-folds one counter per hash row: here EVERY
    * distinct token is probed and compared against its exact count, so
    * the oracle gate pins both the counter table and the one-sided
    * error property (`ok_over`: an estimate is NEVER below the truth —
    * the defining CMS guarantee) hash-exactly in both engines. */
  private def sketchCms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.{charHash, tokens}
    def buckets(tok: org.apache.spark.sql.Column) = array(
      CmsMults.map(m => pmod(charHash(tok, m), lit(CmsWidth.toLong))): _*)
    val toks = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
    val sketch = toks
      .select(posexplode(buckets($"tok")).as(Seq("j", "bucket")))
      .groupBy($"j", $"bucket").agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
    exact
      .select($"tok", $"true_cnt",
        posexplode(buckets($"tok")).as(Seq("j", "bucket")))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy($"tok", $"true_cnt")
      .agg(min($"cnt").as("est_cnt"))
      .select($"tok", $"true_cnt", $"est_cnt",
        ($"est_cnt" >= $"true_cnt").cast("int").as("ok_over"))
      .orderBy($"tok")
  }

  /** Audience-overlap tolerance: the inclusion–exclusion estimate must
    * land within max(5, exact/5) of the exact intersection (HLL rsd ~5%
    * at default precision; subtraction amplifies relative error, hence
    * the 20% + absolute-floor contract). */
  private val IntersectTol = 5L

  /** Sketch-algebra audience overlap: |viewers ∩ buyers| estimated by
    * HLL inclusion–exclusion — est(A) + est(B) − est(A ∪ B) — the only
    * set operation HLL unions can answer (sketches union losslessly,
    * they never intersect), checked against the exact overlap from the
    * same pass.
    *
    * Shape: ONE groupBy(user) pass collapses the stream to per-user
    * (viewed, bought) flags; the final 1-row fold computes the three
    * exact counts AND the three `approx_count_distinct` sketches
    * side-by-side. The `ok` bit is the oracle contract (the DuckDB twin
    * pins the exact columns and `ok` must come back 1 — same gating as
    * `q_sketch_hll`): a sketch drifting out of tolerance fails the
    * correctness gate, not just a bench eyeball. */
  private def sketchIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val u = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        max(($"event_type" === "view").cast("long")).as("hv"),
        max(($"event_type" === "purchase").cast("long")).as("hp"))
    u.agg(
        sum($"hv").as("n_view"),
        sum($"hp").as("n_purchase"),
        sum($"hv" * $"hp").as("n_both"),
        approx_count_distinct(when($"hv" === 1, $"user_id")).as("ev"),
        approx_count_distinct(when($"hp" === 1, $"user_id")).as("ep"),
        approx_count_distinct(when($"hv" === 1 || $"hp" === 1, $"user_id"))
          .as("eu"))
      .select($"n_view", $"n_purchase", $"n_both",
        (abs($"ev" + $"ep" - $"eu" - $"n_both") <=
          greatest(lit(IntersectTol), expr("n_both div 5")))
          .cast("int").as("ok"))
  }

  val queries: Map[String, Q] = Map(
    "q_sketch_hll" -> sketchHll,
    "q_sketch_incremental" -> sketchIncremental,
    "q_sketch_cms" -> sketchCms,
    "q_sketch_intersect" -> sketchIntersect,
    "q_quantile_approx" -> quantileApprox,
  )

  val oracle: Map[String, String] = Map(
    "q_sketch_intersect" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
        |  FROM events GROUP BY user_id)
        |SELECT CAST(sum(hv) AS BIGINT) AS n_view,
        |  CAST(sum(hp) AS BIGINT) AS n_purchase,
        |  CAST(sum(hv * hp) AS BIGINT) AS n_both,
        |  1 AS ok
        |FROM u""".stripMargin,
    "q_sketch_cms" -> {
      def dh(mult: Long) = Dedup.duckCharHash("tok", mult.toInt)
      val rows = CmsMults.zipWithIndex.map { case (m, j) =>
        s"SELECT tok, $j AS j, (${dh(m)}) % $CmsWidth AS bucket FROM toks"
      }.mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents
         |), h AS (
         |  $rows
         |), sk AS (SELECT j, bucket, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
         |ex AS (SELECT tok, COUNT(*) AS true_cnt FROM toks GROUP BY 1),
         |m AS (SELECT DISTINCT tok, j, bucket FROM h),
         |pr AS (SELECT m.tok, MIN(sk.cnt) AS est_cnt
         |       FROM m JOIN sk USING (j, bucket) GROUP BY 1)
         |SELECT ex.tok, ex.true_cnt, pr.est_cnt,
         |  CAST(pr.est_cnt >= ex.true_cnt AS INTEGER) AS ok_over
         |FROM ex JOIN pr ON ex.tok = pr.tok ORDER BY ex.tok""".stripMargin
    },
    "q_sketch_hll" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       COUNT(DISTINCT o_custkey) AS nd_exact, 1 AS ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_approx" ->
      """SELECT pct, (SELECT COUNT(*) FROM lineitem) AS n, 1 AS ok
        |FROM (VALUES (50), (90), (99)) AS t(pct) ORDER BY pct""".stripMargin,
    "q_sketch_incremental" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       COUNT(DISTINCT o_custkey) AS nd_exact,
        |       1 AS ok_merge, 1 AS ok_env
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
