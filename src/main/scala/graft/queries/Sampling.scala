package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{charHash, tokens}
import Catalog._

/** Deterministic sampling operators — the training-data staples that must
  * be REPRODUCIBLE across reruns, engines, and cluster layouts, which
  * rules out `rand()`/`TABLESAMPLE` (both are partitioning-dependent).
  * Everything here derives its randomness from a salted content hash of a
  * stable key, the same trick as the split assigner in
  * [[TextAnalysis]] — identical selections in Spark and the DuckDB
  * oracle, at any parallelism.
  *
  * Scale notes:
  *  - `q_sample_hash` is a pure filter: scan → filter, ZERO shuffles
  *    beyond the output sort. The hash predicate can't become a parquet
  *    PushedFilter (it's a computed expression), but it runs fused into
  *    the scan's codegen stage — one pass, nothing materialized.
  *  - `q_sample_stratified` (fixed k per stratum) is a two-level salted
  *    tournament — the hash order makes "any k" into "a UNIFORM k", and
  *    no task ever sorts a whole stratum (strata are few; a plain
  *    per-stratum window would put 1/|strata| of the corpus in one task).
  */
object Sampling extends QueryGroup {

  private val SampleSalt = "gr-sample-1"
  private val SamplePct = 10 // keep hash-bucket < 10 of 100
  private val StratumK = 5   // fixed sample size per stratum
  private val TournamentSalts = 16 // level-1 fan-out of the stratified top-k
  private val MixtureHot = Seq("src0", "src1", "src2") // upweighted sources
  private val MixtureHotW = 3 // target weight of hot sources (others: 1)

  /** The salted per-row hash bucket in [0, 100). */
  private def bucket(key: org.apache.spark.sql.Column) =
    charHash(concat(lit(SampleSalt), key.cast("string"))) % 100

  private val duckBucket =
    s"${Dedup.duckCharHash(s"'$SampleSalt' || CAST(o_orderkey AS VARCHAR)", 31)} % 100"

  /** ~10% uniform deterministic sample of orders, summarized so the
    * result is stable and small (the sample MEMBERSHIP is what the
    * oracle pins — identical hash => identical rows chosen). */
  private def sampleHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter(bucket($"o_orderkey") < SamplePct)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_sampled"),
        dsum($"o_totalprice").as("sum_price"),
        min($"o_orderkey").as("first_key"))
      .orderBy($"o_orderstatus")
  }

  /** Fixed-size uniform sample per stratum: exactly [[StratumK]] customers
    * per market segment, chosen by salted-hash order (ties broken by key
    * so the selection is total).
    *
    * Two-level tournament, because strata are FEW: a single
    * window-per-stratum would sort each stratum in one task (at 100 TB,
    * one task per segment = a non-starter). Level 1 takes the top-k
    * within (stratum, salt) — [[TournamentSalts]]× the parallelism —
    * and level 2 re-ranks only the ≤ salts×k survivors. Any global
    * top-k row is necessarily in its salt bucket's top-k, so the result
    * is IDENTICAL to the single-window formulation (the oracle runs
    * exactly that single window). */
  private def sampleStratified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = charHash(concat(lit(SampleSalt), $"c_custkey".cast("string")))
    val w1 = Window.partitionBy($"c_mktsegment", $"salt")
      .orderBy($"h".asc, $"c_custkey".asc)
    val w2 = Window.partitionBy($"c_mktsegment")
      .orderBy($"h".asc, $"c_custkey".asc)
    Tables.customer(s, d)
      .withColumn("h", h)
      .withColumn("salt", pmod(xxhash64($"c_custkey"), lit(TournamentSalts)))
      .withColumn("rk1", row_number().over(w1))
      .filter($"rk1" <= StratumK)
      .withColumn("rk", row_number().over(w2))
      .filter($"rk" <= StratumK)
      .select($"c_mktsegment", $"rk".cast("long").as("rk"),
        $"c_custkey", $"c_name")
      .orderBy($"c_mktsegment", $"rk")
  }

  /** Importance (quality-weighted) sampling — the pretraining staple
    * "keep each document with probability ∝ its quality": accept when
    * the salted hash bucket falls below weight×100, here with lexical
    * diversity (distinct/total tokens) as the weight. Still a pure
    * narrow projection + filter per row (the acceptance test needs no
    * global state), aggregated per source for a stable summary. */
  private def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("keep", bucket($"doc_id").cast("double") <
        $"n_distinct".cast("double") / $"n_tok".cast("double") * 100.0)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"keep", 1)).as("n_kept"),
        sum(when($"keep", $"n_tok")).cast("long").as("sum_kept_tok"))
      .orderBy($"source")
  }

  /** Data-mixing resampler: re-weight the corpus so the KEPT sample's
    * composition follows the target mixture weights (the pretraining
    * "data mixture" knob — e.g. upsample curated sources, downsample
    * crawl). Sources [[MixtureHot]] carry weight [[MixtureHotW]], the
    * rest weight 1; the acceptance rate for source s is
    * `a_s = w_s * C / n_s` with `C = min_s(n_s / w_s)`, the largest
    * scale at which no source needs MORE rows than it has (rejection
    * sampling only — no row is ever duplicated). Acceptance is the
    * salted content hash, so the selection is reproducible anywhere.
    *
    * Scale shape: one tiny per-source count agg (|sources| rows) joined
    * back by broadcast; the acceptance test is then pure row-local
    * arithmetic fused into the scan — the corpus itself never shuffles
    * until the final per-source summary (a map-side-combined agg).
    * `xor_sig` pins the exact kept MEMBERSHIP, not just counts. */
  private def sampleMixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = when($"source".isin(MixtureHot: _*), lit(MixtureHotW))
      .otherwise(lit(1)).cast("double")
    val counts = Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).cast("double").as("n_src"))
      .withColumn("w", w)
    val cScale = counts.agg(min($"n_src" / $"w").as("c_scale"))
    val rated = counts.crossJoin(broadcast(cScale))
      .select($"source", ($"w" * $"c_scale" / $"n_src" * 100.0).as("rate"))
    Tables.documents(s, d)
      .join(broadcast(rated), "source")
      .withColumn("keep", bucket($"doc_id").cast("double") < $"rate")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"keep", 1)).as("n_kept"),
        expr("bit_xor(CASE WHEN keep THEN doc_id END)").as("xor_sig"))
      .orderBy($"source")
  }

  private val CurriculumRounds = 5 // rounds of the interleave to emit

  /** Curriculum / interleaved training order — the data-ordering knob
    * between "fully shuffled" (`q_shuffle_pack`) and "sorted by source":
    * within each source, docs rank easiest-first (ascending token count,
    * doc_id tiebreak — any difficulty proxy slots in here, e.g. the
    * classifier margin of `q_quality_classifier`); the epoch then
    * round-robins the sources so round r holds every source's r-th
    * easiest doc. Balanced source exposure per training step plus an
    * easy→hard ramp, and the order is totally deterministic — same
    * epoch on any engine, rerun, or cluster layout.
    *
    * Scale shape: the emitted prefix is round-bounded, so the per-source
    * rank uses the same two-level salted tournament as
    * `q_sample_stratified` (a plain per-source window would sort 1/|src|
    * of the corpus in ONE task; level 1 ranks within (source, salt) —
    * difficulty order, not hash order, but the argument is unchanged:
    * any per-source top-R row is in its salt bucket's top-R). A full-
    * epoch ordering (unbounded r) would instead reuse the two-phase
    * distributed prefix sum of `q_pack_shards`. */
  private def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val w1 = Window.partitionBy($"source", $"salt")
      .orderBy($"n_tok".asc, $"doc_id".asc)
    val w2 = Window.partitionBy($"source")
      .orderBy($"n_tok".asc, $"doc_id".asc)
    Tables.documents(s, d)
      .select($"doc_id", $"source", size(toks).cast("long").as("n_tok"))
      .withColumn("salt", pmod(xxhash64($"doc_id"), lit(TournamentSalts)))
      .withColumn("rk1", row_number().over(w1))
      .filter($"rk1" <= CurriculumRounds)
      .withColumn("round", row_number().over(w2).cast("long"))
      .filter($"round" <= CurriculumRounds)
      .select($"round", $"source", $"doc_id", $"n_tok")
      .orderBy($"round", $"source")
  }

  private val NegSalt = "gr-neg-1"
  private val NegAnchors = 8 // anchors: vec_id < 8
  private val NegK = 4       // negatives drawn per anchor

  /** Uniform negative sampling for contrastive training: for each anchor
    * vector, draw [[NegK]] reproducible uniform negatives from the
    * different-label population (word2vec/SimCLR-style random negatives;
    * the HARD-negative variant is `q_vector_topk` composed with the same
    * label exclusion). "Random" is the salted content hash of the
    * (anchor, candidate) PAIR — so each anchor draws an independent
    * sample, yet the draw is identical across engines, reruns, and
    * cluster layouts.
    *
    * Scale shape: anchors are few -> broadcast nested-loop against the
    * corpus scanned ONCE (the label inequality is the join predicate;
    * fanout is |anchors|, embeddings themselves are never read).
    * Per-anchor top-k uses the same two-level salted tournament as
    * `q_sample_stratified`, because |anchors| partitions would otherwise
    * put 1/|anchors| of the corpus in one window task. */
  private def sampleNegatives(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val anchors = Tables.embeddings(s, d)
      .filter($"vec_id" < NegAnchors)
      .select($"vec_id".as("anchor_id"), $"label".as("anchor_label"))
    val cands = Tables.embeddings(s, d)
      .select($"vec_id".as("neg_id"), $"label".as("neg_label"))
    val h = charHash(concat(lit(NegSalt), $"anchor_id".cast("string"),
      lit(":"), $"neg_id".cast("string")))
    val w1 = Window.partitionBy($"anchor_id", $"salt")
      .orderBy($"h".asc, $"neg_id".asc)
    val w2 = Window.partitionBy($"anchor_id")
      .orderBy($"h".asc, $"neg_id".asc)
    cands
      .join(broadcast(anchors), $"neg_label" =!= $"anchor_label")
      .withColumn("h", h)
      .withColumn("salt", pmod(xxhash64($"neg_id"), lit(TournamentSalts)))
      .withColumn("rk1", row_number().over(w1))
      .filter($"rk1" <= NegK)
      .withColumn("rk", row_number().over(w2))
      .filter($"rk" <= NegK)
      .select($"anchor_id", $"rk".cast("long").as("rk"),
        $"neg_id", $"neg_label")
      .orderBy($"anchor_id", $"rk")
  }

  val queries: Map[String, Q] = Map(
    "q_sample_hash" -> sampleHash,
    "q_sample_stratified" -> sampleStratified,
    "q_sample_weighted" -> sampleWeighted,
    "q_sample_mixture" -> sampleMixture,
    "q_sample_negatives" -> sampleNegatives,
    "q_curriculum_order" -> curriculumOrder,
  )

  private val duckCustHash =
    Dedup.duckCharHash(s"'$SampleSalt' || CAST(c_custkey AS VARCHAR)", 31)

  private val duckDocBucket =
    s"${Dedup.duckCharHash(s"'$SampleSalt' || CAST(doc_id AS VARCHAR)", 31)} % 100"

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_sampled,
         |  ${dsumSql("o_totalprice")} AS sum_price,
         |  MIN(o_orderkey) AS first_key
         |FROM orders WHERE $duckBucket < $SamplePct
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_sample_weighted" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(lower(text), ' ') w
         |  FROM documents
         |), k AS (
         |  SELECT source, CAST(len(w) AS BIGINT) AS n_tok,
         |    ($duckDocBucket) <
         |      CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 100.0
         |      AS keep
         |  FROM t
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(*) FILTER (keep) AS n_kept,
         |  CAST(SUM(n_tok) FILTER (keep) AS BIGINT) AS sum_kept_tok
         |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_mixture" -> {
      val hotList = MixtureHot.map(x => s"'$x'").mkString("(", ", ", ")")
      s"""WITH counts AS (
         |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_src,
         |    CAST(CASE WHEN source IN $hotList THEN $MixtureHotW ELSE 1 END
         |      AS DOUBLE) AS w
         |  FROM documents GROUP BY source),
         |c AS (SELECT MIN(n_src / w) AS c_scale FROM counts),
         |rated AS (
         |  SELECT source, w * c_scale / n_src * 100.0 AS rate
         |  FROM counts, c),
         |k AS (
         |  SELECT d.source, d.doc_id,
         |    ($duckDocBucket) < rate AS keep
         |  FROM documents d JOIN rated USING (source))
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(*) FILTER (keep) AS n_kept,
         |  bit_xor(CASE WHEN keep THEN doc_id END) AS xor_sig
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    },
    "q_sample_negatives" -> {
      val pairHash = Dedup.duckCharHash(
        s"'$NegSalt' || CAST(anchor_id AS VARCHAR) || ':' || " +
          "CAST(neg_id AS VARCHAR)", 31)
      // Single-window specification; the tournament is the implementation.
      s"""WITH a AS (
         |  SELECT vec_id AS anchor_id, label AS anchor_label
         |  FROM embeddings WHERE vec_id < $NegAnchors
         |), c AS (
         |  SELECT vec_id AS neg_id, label AS neg_label FROM embeddings
         |), p AS (
         |  SELECT anchor_id, neg_id, neg_label, $pairHash AS h
         |  FROM c JOIN a ON neg_label <> anchor_label
         |), r AS (
         |  SELECT anchor_id, neg_id, neg_label,
         |    CAST(row_number() OVER (PARTITION BY anchor_id
         |      ORDER BY h, neg_id) AS BIGINT) AS rk
         |  FROM p)
         |SELECT anchor_id, rk, neg_id, neg_label FROM r
         |WHERE rk <= $NegK ORDER BY anchor_id, rk""".stripMargin
    },
    // Single-window specification; the tournament is the implementation.
    "q_curriculum_order" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |), r AS (
         |  SELECT CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY n_tok, doc_id) AS BIGINT) AS round,
         |    source, doc_id, n_tok
         |  FROM t)
         |SELECT round, source, doc_id, n_tok FROM r
         |WHERE round <= $CurriculumRounds
         |ORDER BY round, source""".stripMargin,
    "q_sample_stratified" ->
      s"""WITH r AS (
         |  SELECT c_mktsegment, c_custkey, c_name,
         |    CAST(row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY $duckCustHash, c_custkey) AS BIGINT) AS rk
         |  FROM customer
         |)
         |SELECT c_mktsegment, rk, c_custkey, c_name FROM r
         |WHERE rk <= $StratumK
         |ORDER BY c_mktsegment, rk""".stripMargin,
  )
}
