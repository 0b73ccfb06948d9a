package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.functions.TextFunctions._
import Catalog._

/** Text-analysis surface over the `documents` corpus — SURVEY.md §2B rows
  * "Text analysis", plus the north-star language-ID / quality / token-count /
  * fingerprint operators.
  *
  * The flagship `q_text_top_skills` reproduces the reference's populate-stage
  * aggregation (`/root/reference/data_populator/populator.py:39-46`):
  * lowercase → whitespace-split → dictionary membership → per-group counts →
  * top-10 with deterministic `(count DESC, token ASC)` tie-break (declared
  * divergence from Counter's first-seen tie order, SURVEY.md §7.3).
  *
  * Scale notes (100 TB design point):
  *  - explode(tokens) fans out ~100x then immediately partial-aggregates:
  *    the map-side combine collapses per-partition (group, token) pairs
  *    before the single shuffle, so shuffle volume is bounded by
  *    |groups| x |dictionary|, not by token count.
  *  - The dictionary is a broadcast semi-join (a few hundred entries at
  *    most — `skills.json` has 68), never a shuffled join.
  *  - The top-10 window partitions by group; cardinality of each partition
  *    is already <= |dictionary| after aggregation, so the window sort is
  *    tiny regardless of corpus size.
  *  - Per-document features (quality, fingerprint, langid) are pure
  *    narrow projections — no shuffle at all until the final canonical
  *    ORDER BY (oracle-only; dropped in production).
  */
object TextAnalysis extends QueryGroup {

  private def skillsDictSql: String =
    SkillsDict.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Flagship: top-10 dictionary tokens per source (populator.py:39-46). */
  private def topSkills(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dict = broadcast(SkillsDict.toDF("skill"))
    val counts = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("token"))
      .join(dict, $"token" === $"skill", "left_semi")
      .groupBy($"source", $"token")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"source").orderBy($"cnt".desc, $"token")
    counts
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10)
      .select($"source", $"rnk", $"token", $"cnt")
      .orderBy($"source", $"rnk")
  }

  /** Language-ID heuristic: deterministic thresholds over exact-integer
    * features (stopword ratio, mean token length, lexical diversity). The
    * thresholds are declared behavior, not a trained model — the operator
    * shape (featurize → classify in one projection) is the point. */
  private def langId(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("long")
    // tokens ∩ stopwords keeping duplicates (filter, not set-intersect):
    // the stopword *ratio* needs every occurrence counted.
    val stopCnt = size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
    Tables.documents(s, d)
      .select($"doc_id", $"lang".as("labeled_lang"),
        nTok.as("n_tok"),
        stopCnt.as("stop_cnt"),
        (aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (acc, x) => acc + x).cast("double") / nTok.cast("double"))
          .as("avg_tok_len"),
        (size(array_distinct(toks)).cast("double") / nTok.cast("double"))
          .as("ttr"))
      .withColumn("predicted_lang",
        when($"stop_cnt".cast("double") / $"n_tok".cast("double") >= 0.08, "en")
          .when($"avg_tok_len" >= 4.7, "de")
          .when($"ttr" >= 0.55, "zh")
          .when($"n_tok" % 2 === 0, "es")
          .otherwise("fr"))
      .select($"doc_id", $"labeled_lang", $"predicted_lang", $"n_tok",
        $"stop_cnt", $"avg_tok_len", $"ttr")
      .orderBy($"doc_id")
  }

  /** Quality scoring: length / stopword-ratio / diversity gates (the usual
    * LLM-corpus heuristics), all from exact integer counts. */
  private def quality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, d)
      .select($"doc_id", $"n_chars",
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
          .as("n_stop"))
      .withColumn("stop_ratio",
        $"n_stop".cast("double") / $"n_tok".cast("double"))
      .withColumn("diversity",
        $"n_distinct".cast("double") / $"n_tok".cast("double"))
      .withColumn("quality_ok",
        $"n_tok" >= 20 && $"n_tok" <= 1000 && $"stop_ratio" < 0.2)
      .orderBy($"doc_id")
  }

  /** Corpus-cleaning attrition funnel — the per-stage survivor table
    * every dataset release publishes (C4 / RefinedWeb style): how many
    * documents and tokens survive each cleaning rule CUMULATIVELY, from
    * "all" through the length band, stopword-ratio and diversity gates
    * (the same declared heuristics as `q_text_quality`), ending with
    * exact-text dedup among the survivors.
    *
    * One narrow scan computes every per-doc flag; the dedup stage is a
    * window partitioned by md5(text) ordered (survivor-first, doc_id) so
    * a failing doc never consumes a survivor's first-occurrence slot;
    * then ONE map-side-combined global aggregate produces all 12 sums
    * and `stack()` pivots them to the 6-row report. Counts are exact
    * integers; the share column is ×1e6 fixed-point. At 100 TB the
    * md5 window shuffles once on a well-spread key — everything after
    * is a 1-row relation. */
  private def textFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val base = Tables.documents(s, d)
      .select($"doc_id", $"text",
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")
          .as("n_stop"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("s2", $"n_tok" >= 12)
      .withColumn("s3", $"s2" && $"n_tok" >= 20 && $"n_tok" <= 1000)
      .withColumn("s4", $"s3" && $"n_stop" * 20 < $"n_tok" * 3)
      .withColumn("s5", $"s4" && $"n_distinct" * 10 >= $"n_tok" * 3)
    val w = Window.partitionBy(md5(lower(trim($"text"))))
      .orderBy($"s5".desc, $"doc_id")
    base.withColumn("rn", row_number().over(w))
      .withColumn("s6", $"s5" && $"rn" === 1)
      .agg(
        count(lit(1)).as("d1"), sum($"n_tok").as("t1"),
        sum($"s2".cast("long")).as("d2"),
        sum(when($"s2", $"n_tok").otherwise(0L)).as("t2"),
        sum($"s3".cast("long")).as("d3"),
        sum(when($"s3", $"n_tok").otherwise(0L)).as("t3"),
        sum($"s4".cast("long")).as("d4"),
        sum(when($"s4", $"n_tok").otherwise(0L)).as("t4"),
        sum($"s5".cast("long")).as("d5"),
        sum(when($"s5", $"n_tok").otherwise(0L)).as("t5"),
        sum($"s6".cast("long")).as("d6"),
        sum(when($"s6", $"n_tok").otherwise(0L)).as("t6"))
      .select(expr(
        """stack(6,
          |  1, 'all', d1, t1,
          |  2, 'min_tokens', d2, t2,
          |  3, 'length_band', d3, t3,
          |  4, 'stopword_ratio', d4, t4,
          |  5, 'diversity', d5, t5,
          |  6, 'exact_dedup', d6, t6) AS (stage, rule, n_docs, n_tokens)
          |""".stripMargin), $"d1")
      .select($"stage", $"rule", $"n_docs", $"n_tokens",
        expr("n_docs * 1000000 div d1").as("share_fp"))
      .orderBy($"stage")
  }

  /** Token counting: whitespace tokens, regex (BPE-ish word/number/symbol)
    * tokens, and the chars/4 LLM-token estimate. */
  private def tokenCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        size(tokens($"text")).cast("long").as("ws_tokens"),
        regexp_count($"text", lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .cast("long").as("re_tokens"),
        ceil(length($"text").cast("double") / 4.0).cast("long")
          .as("est_bpe_tokens"))
      .orderBy($"doc_id")
  }

  /** Document fingerprint: rolling polynomial hash over per-token hashes —
    * an order-sensitive exact content signature (near-dup pre-filter). */
  private def fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    Tables.documents(s, d)
      .select($"doc_id",
        rollingFingerprint(transform(toks, charHash(_))).as("fingerprint"),
        size(toks).cast("long").as("n_tok"))
      .orderBy($"doc_id")
  }

  /** Exact heavy hitters via the two-pass Misra-Gries pattern
    * ([[graft.operators.MisraGries]]): pass 1 folds the token stream into
    * one c-entry mergeable summary (bounded state per partition, tiny
    * partial maps on the wire); pass 2 exact-counts ONLY the summary's
    * candidates through a broadcast membership filter and keeps those
    * above the n/(c+1) support threshold. The MG superset guarantee makes
    * the OUTPUT exact and partitioning-independent even though the sketch
    * itself is approximate — which is why a hash-match oracle is possible
    * at all. Shuffle volume is O(c), never O(distinct tokens): the shape
    * that survives a 100 TB vocabulary where the exact one-pass top-K
    * (q_text_vocab) must shuffle every distinct key.
    *
    * (This corpus's 31-token vocabulary fits inside capacity 40, so the
    * decrement path never fires here; MisraGriesSpec forces overflow and
    * adversarial merge orders on synthetic skewed streams to pin the
    * superset guarantee where it matters.) */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("tok"))
    val cands = tok
      .agg(graft.operators.MisraGries.udaf(HhCapacity)($"tok").as("mg"))
      .select(map_keys($"mg").as("cand_toks"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    tok.crossJoin(broadcast(cands))
      .filter(array_contains($"cand_toks", $"tok"))
      .groupBy($"tok")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter($"cnt" * (HhCapacity + 1) > $"n_total")
      .select($"tok", $"cnt", $"n_total")
      .orderBy(desc("cnt"), $"tok")
  }

  /** Corpus-frequency boilerplate detection (the CCNet/RefinedWeb move:
    * spans repeated across MANY documents are templates/navigation, not
    * content — remove or downweight them before training). A trigram is
    * "boilerplate" when it occurs in ≥ [[BoilerDf]] DISTINCT documents;
    * each document then reports how much of its trigram stream that
    * frequent set covers, and a ≥80% covered doc is flagged a template.
    *
    * Scale shape: the doc-frequency table is the same explode →
    * per-(gram, doc) distinct → map-side-combined count the prefix filter
    * and OOV queries use; the df ≥ K cut collapses it to the (small)
    * frequent set, which comes back as a LEFT SEMI join against the
    * occurrence stream — at 100 TB that's one shuffle keyed on the gram
    * (or a broadcast when the frequent set fits), never an all-pairs
    * anything, and the per-doc/per-source rollups are plain partial
    * aggs. Ratios are exact-integer milli counts; docs shorter than the
    * gram width have no trigram stream and are excluded corpus-wide
    * (both engines filter `len(tokens) >= 3`). */
  private def boilerplate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Trigram keys WITHOUT building gram strings: per-token codegen'd
    // PolyHash, then a per-doc lead window folds 3 consecutive token
    // hashes into one rolling gram hash. The obvious
    // `explode(shingles(...))` formulation runs the k-gram string build
    // inside an interpreted HOF (CodegenFallback) — measured 47 s at
    // sf0.1, ~30 µs/gram, the same trap the prefix filter's
    // ShingleHashSet kernel fixed; this window form keeps every stage in
    // whole-stage codegen (~20x cheaper) and shuffles only skinny
    // (doc, pos, hash) triples. The hash is the charHash/duckCharHash
    // twin pair, so DuckDB folds IDENTICAL gram keys — a (P ≈ 1e9)
    // collision merges the same grams in both engines, keeping the gate
    // exact (same hashed-key class as the sampling/split queries).
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val grams = Tables.documents(s, d)
      .select($"doc_id", $"source",
        posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .select($"doc_id", $"source", $"pos", charHash($"tok").as("h"))
      .select($"doc_id", $"source",
        ((($"h" * 131 + lead($"h", 1).over(w)) % HashP) * 131 +
          lead($"h", 2).over(w)) % HashP as "g")
      .filter($"g".isNotNull)
    val freq = grams.select($"g", $"doc_id").distinct()
      .groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df" >= BoilerDf)
      .select($"g", lit(1).as("boiler"))
    grams.join(freq, Seq("g"), "left")
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_starts"), count($"boiler").as("n_boiler"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_starts").cast("long").as("sum_starts"),
        sum($"n_boiler").cast("long").as("sum_boiler"),
        count(when($"n_boiler" * 5 >= $"n_starts" * 4, 1))
          .as("n_template"))
      .withColumn("boiler_milli",
        floor($"sum_boiler".cast("double") * 1000.0 /
          $"sum_starts".cast("double")).cast("long"))
      .orderBy($"source")
  }

  private val DupSpanK = 10 // duplicated-span granularity (tokens)

  /** Duplicated-span detection — the span-level exact dedup of the
    * "Deduplicating Training Data Makes Language Models Better" line of
    * work (ExactSubstr): find every [[DupSpanK]]-token gram that occurs
    * more than once in the corpus (cross-doc OR self-repetition), then
    * coalesce each document's duplicated positions into MAXIMAL disjoint
    * spans (a gaps-and-islands pass over gram start positions) and report
    * the per-doc duplicated-token mass — the "what would span-level
    * trimming remove" report that whole-doc dedup can't see.
    *
    * Suffix-array ExactSubstr is single-node; this is its k-gram-
    * granular Spark-declarative equivalent: the same lead-window rolling
    * gram hash as `q_text_boilerplate` (whole-stage codegen, no
    * interpreted HOF — that trap costs ~20x), so only skinny
    * (doc, pos, hash) triples ever shuffle, never text. The island pass
    * rides per-doc windows on the doc-partitioned gram stream. */
  private def dupSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val th = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .select($"doc_id", $"pos", charHash($"tok").as("h"))
    val gram = (1 until DupSpanK).foldLeft($"h": Column)((acc, i) =>
      (acc * 131 + lead($"h", i).over(w)) % HashP)
    val grams = th.select($"doc_id", $"pos", gram.as("g"))
      .filter($"g".isNotNull)
    val dup = grams.groupBy($"g").agg(count(lit(1)).as("occ"))
      .filter($"occ" >= 2).select($"g")
    val marked = grams.join(dup, Seq("g"), "left_semi")
    val prevEnd = max($"pos" + (DupSpanK - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = marked
      .withColumn("new_span",
        ($"pos" > coalesce(prevEnd, lit(-1))).cast("long"))
      .withColumn("span_id", sum($"new_span").over(w))
      .groupBy($"doc_id", $"span_id")
      .agg((max($"pos") + DupSpanK - min($"pos")).cast("long")
        .as("span_toks"))
    val nTok = Tables.documents(s, d)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tok"))
    spans.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum($"span_toks").cast("long").as("dup_tokens"))
      .join(nTok, Seq("doc_id"))
      .select($"doc_id", $"n_tok", $"n_spans", $"dup_tokens",
        ($"n_tok" - $"dup_tokens").as("kept_tokens"))
      .orderBy($"doc_id")
  }

  /** PII redaction (email / phone → placeholder tags). The corpus has no
    * PII, so the query PLANTS a deterministic address and number per doc
    * (both engines build the identical string from doc_id) and the oracle
    * then checks the regexes actually strip them — non-vacuous without
    * shipping PII in testdata. Pure narrow projection: redaction at 100 TB
    * is scan-shaped, no shuffle until the oracle-only ORDER BY. */
  private def redactPii(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val planted = concat($"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com or +1-555-"),
      lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
    Tables.documents(s, d)
      .select($"doc_id", planted.as("planted"))
      .select($"doc_id",
        (regexp_count($"planted", lit(emailRe)) +
          regexp_count($"planted", lit(phoneRe))).cast("long")
          .as("n_redactions"),
        regexp_replace(regexp_replace($"planted", emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("redacted"))
      .orderBy($"doc_id")
  }

  /** Reproducible train/val/test assignment: salted content-independent
    * hash of the stable doc key, mod 100 → 80/10/10. The salt prefix
    * decorrelates this split from every other hash use of doc_id; being
    * pure per-row arithmetic it assigns identically on any cluster at any
    * scale (no sampling, no RNG, no ordering dependence). */
  // Shared constants, referenced by BOTH the Spark queries and their
  // oracle SQL strings so a change can't drift them apart silently.
  private val SplitSalt = "split:"
  private[queries] val TrainCut = 80 // [0,80) train, [80,90) val, [90,100) test
  private[queries] val ValCut = 90
  private val ShardBudget = 4096L
  private val PackBlockSize = 100L
  private val RepThreshold = 0.2
  private val ContamPrefixLen = 20
  private val BoilerN = 3  // boilerplate gram width (word trigrams)
  private val BoilerDf = 3 // "boilerplate" = gram seen in >= 3 distinct docs
  private val HhCapacity = 40 // MG capacity: support threshold n/41 ≈ 2.4%

  /** The salted split hash, shared by q_split_assign and the
    * contamination check (identical assignment is the point). */
  private[queries] def splitOf(docId: Column): Column = splitCol(docId)

  private def splitCol(docId: Column): Column = {
    val h = charHash(concat(lit(SplitSalt), docId.cast("string"))) % 100
    when(h < TrainCut, "train").when(h < ValCut, "val").otherwise("test")
  }

  /** DuckDB twin of [[splitCol]]'s hash bucket. */
  private[queries] val duckSplitH =
    s"${Dedup.duckCharHash(s"'$SplitSalt' || CAST(doc_id AS VARCHAR)", 31)} % 100"

  private def splitAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val split = splitCol($"doc_id")
    Tables.documents(s, d)
      .select(split.as("split"), size(tokens($"text")).cast("long").as("n_tok"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").cast("long").as("n_tokens"))
      .orderBy($"split")
  }

  /** Token-budget shard packing via [[graft.operators.Packing]] — the
    * global running sum computed as a two-phase distributed prefix sum
    * (block totals → broadcast offsets → block-partitioned windows), NOT
    * the single-task global window the oracle uses. Budget 4096 tokens,
    * 100-id blocks at test scale. */
  private def packShards(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tok"))
    graft.operators.Packing
      .packShards(toks, "doc_id", "n_tok", ShardBudget, PackBlockSize)
      .orderBy($"doc_id")
  }

  /** Feature-hashing dimensionality (the "hashing trick" bucket count).
    * Small on purpose at test scale so bucket collisions are exercised;
    * production uses 2^18..2^22. */
  private val HashDim = 64

  /** Feature hashing (Weinberger et al. ICML'09 — the vowpal-wabbit
    * featurizer): each document's tokens are folded into a FIXED-width
    * count vector by token hash mod [[HashDim]], the unbounded-vocabulary
    * answer to one-hot features — no dictionary, no fit step, new tokens
    * land in existing buckets, so the featurizer is stateless and
    * streaming-safe. Entirely row-local (one codegen HOF pass per doc,
    * zero shuffles beyond the output sort); the vector is exact integers
    * and the bucket hash is the shared polynomial hash, so the full
    * feature matrix hash-matches the DuckDB twin. `nnz` (occupied
    * buckets) comes along as the density diagnostic a feature pipeline
    * monitors. Output is the LONG (sparse) form — (doc_id, bucket, cnt)
    * for occupied buckets — both because that's how a sparse feature
    * matrix ships and because the oracle comparator hashes flat
    * columns, not LIST cells.
    *
    * Shape: explode → one (doc, bucket) partial agg, map-side combined —
    * NOT a per-row HOF over all [[HashDim]] buckets, which does
    * O(dim × tokens) work per document and materializes a dim-wide array
    * (fatal at the production 2^18..2^22 dims); this form is O(tokens)
    * and indifferent to the bucket count. */
  private def featureHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .select($"doc_id",
        pmod(charHash($"tok"), lit(HashDim.toLong)).as("bucket"))
      .groupBy($"doc_id", $"bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"doc_id", $"bucket")
  }

  /** Tie-break modulus for the shuffled packing key: doc_id mod 2^22
    * appended below the hash keeps composite keys unique (and recoverable)
    * for corpora under ~4M docs per hash value — document-count-safe at
    * any real scale since it only has to break exact hash TIES. */
  private val ShuffleTieMod = 1L << 22

  /** Prefix-sum block width over the composite key space
    * (hash < 2^30 × 2^22 ≈ 2^52): 2^42 ⇒ ~1k driver-side blocks. */
  private val ShuffleBlock = 1L << 42

  /** Deterministic SHUFFLE-then-pack — the data-ordering step an LLM
    * pretraining run does before sequence packing: the corpus is
    * permuted by a salted content hash (so consecutive training shards
    * mix sources/domains instead of replaying ingest order), then packed
    * into fixed token-budget shards along that order. `q_pack_shards`
    * packs in doc_id (ingest) order; this is the production variant.
    *
    * Same two-phase distributed prefix sum ([[graft.operators.Packing]]),
    * driven by a composite key `hash * 2^22 + doc_id mod 2^22` — the
    * hash orders, the doc_id term breaks hash ties deterministically, and
    * block boundaries stay pure key arithmetic (no range sampling), so
    * the pack matches the oracle's single-window global sort bit-exactly
    * while never funneling the corpus through one task. */
  private def shufflePack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = charHash(concat(lit("shuffle:"), $"doc_id".cast("string")))
    val toks = Tables.documents(s, d)
      .select(
        (h * ShuffleTieMod + pmod($"doc_id", lit(ShuffleTieMod))).as("k"),
        size(tokens($"text")).cast("long").as("n_tok"))
    graft.operators.Packing
      .packShards(toks, "k", "n_tok", ShardBudget, ShuffleBlock)
      .select(pmod($"k", lit(ShuffleTieMod)).as("doc_id"), $"n_tok",
        $"tok_offset", $"shard")
      .orderBy($"doc_id")
  }

  /** Gopher-style repetition filter: fraction of bigram mass taken by the
    * single most-repeated bigram — boilerplate/spam detector. The counts
    * come from the fused per-row kernel
    * ([[org.apache.spark.sql.graft.BigramStats]]): the bigram bag never
    * leaves its row, so this is scan → project, ZERO data shuffles — the
    * relational shape (explode → groupBy(doc, bigram) → groupBy(doc))
    * paid two corpus-wide string shuffles for the same values (4.4 s at
    * sf0.1; kernel == relational pinned by RepetitionSpec). */
  private def repetition(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.BigramStats.bigramStats
    val toks = tokens($"text")
    Tables.documents(s, d)
      .filter(size(toks) >= 2)
      .select($"doc_id", bigramStats(toks).as("bs"))
      .select($"doc_id",
        shiftright($"bs", 32).as("top_cnt"),
        $"bs".bitwiseAND(lit(0xffffffffL)).as("n_bigrams"))
      .withColumn("rep_ratio",
        $"top_cnt".cast("double") / $"n_bigrams".cast("double"))
      .withColumn("repetitive", $"rep_ratio" > RepThreshold)
      .orderBy($"doc_id")
  }

  /** Eval-contamination check: near-dup pairs that STRADDLE split
    * boundaries (a test doc sharing its 20-token prefix fingerprint with
    * a train doc leaks eval data). Equi-join on the fingerprint — a
    * high-cardinality key, so the shuffle is a normal hash join, no
    * all-pairs; split labels come from the same salted hash as
    * q_split_assign. */
  private def contamination(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val prefixFp = rollingFingerprint(
      transform(slice(toks, 1, ContamPrefixLen), charHash(_)))
    val sigs = Tables.documents(s, d)
      .select($"doc_id", splitCol($"doc_id").as("split"),
        prefixFp.as("pfp"))
    val a = sigs.select($"doc_id".as("doc_a"), $"split".as("split_a"), $"pfp")
    val b = sigs.select($"doc_id".as("doc_b"), $"split".as("split_b"), $"pfp")
    a.join(b, "pfp")
      .filter($"doc_a" < $"doc_b" && $"split_a" =!= $"split_b")
      .select($"doc_a", $"split_a", $"doc_b", $"split_b")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Containment threshold for the asymmetric decontamination check. */
  private val ContainT = 0.8

  /** Asymmetric containment decontamination: eval docs whose shingle set
    * is ≥ 80% CONTAINED in some train doc (|A∩B| / |A| with A = eval).
    * This is the case the symmetric checks miss — an eval doc quoted
    * inside a much larger train doc has tiny jaccard (the union dilutes
    * it) and only matches q_split_contamination if the leading 20 tokens
    * survive verbatim; containment flags it regardless of the host
    * document's size.
    *
    * Candidate generation is the ASYMMETRIC prefix filter: if
    * |A∩B| ≥ ceil(t·|A|), then B shares one of A's |A| − ceil(t·|A|) + 1
    * rarest shingles (pigeonhole on A alone — only the PROBE side
    * prefixes; the train side indexes all its shingles). Shingles are
    * [[org.apache.spark.sql.graft.ShingleHashSet]] 64-bit keys (fused
    * codegen kernel; hashing only merges shingles so recall is
    * preserved), rarity is corpus document frequency, and the exact
    * verify recomputes containment on STRING shingle sets of the rare
    * candidate docs only (broadcast semi-join, [[Dedup.verifyJaccard]]'s
    * shape). At 100 TB: the train index is the materializable artifact,
    * eval prefixes are ~1/5 of each eval doc, and nothing is all-pairs. */
  private def containment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.ShingleHashSet.shingleHashes
    val k = Dedup.ShingleK
    val ex = Tables.documents(s, d)
      .select($"doc_id", splitCol($"doc_id").as("split"),
        shingleHashes(tokens($"text"), k).as("hs"))
      .filter($"hs".isNotNull)
      .select($"doc_id", $"split", size($"hs").as("sz"),
        explode($"hs").as("shingle"))
    val dfreq = ex.groupBy($"shingle").agg(count(lit(1)).as("dfreq"))
    val rarity = Window.partitionBy($"doc_id").orderBy($"dfreq", $"shingle")
    val evalPrefix = ex.filter($"split" =!= "train")
      .join(dfreq, "shingle")
      .withColumn("rn", row_number().over(rarity))
      .filter($"rn" <=
        $"sz" - floor(($"sz" * 4 + 4) / lit(5.0)).cast("int") + 1)
      .select($"doc_id".as("doc_eval"), $"split".as("split_eval"), $"shingle")
    val trainEx = ex.filter($"split" === "train")
      .select($"doc_id".as("doc_train"), $"shingle")
    val cand = evalPrefix.join(trainEx, "shingle")
      .select($"doc_eval", $"split_eval", $"doc_train")
      .dropDuplicates("doc_eval", "doc_train")
    // Exact verify on string shingle sets of candidate docs only — the
    // broadcast semi-join shape of Dedup.verifyJaccard (one corpus scan,
    // ReuseExchange collapses the two broadcasts, nothing pinned).
    val candIds = broadcast(cand
      .select(explode(array($"doc_eval", $"doc_train")).as("doc_id"))
      .distinct())
    val candSh = Tables.documents(s, d)
      .join(candIds, Seq("doc_id"), "left_semi")
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= k)
      .select($"doc_id", array_distinct(shingles($"toks", k)).as("sh"))
    cand
      .join(broadcast(candSh
        .select($"doc_id".as("doc_eval"), $"sh".as("sh_a"))), "doc_eval")
      .join(broadcast(candSh
        .select($"doc_id".as("doc_train"), $"sh".as("sh_b"))), "doc_train")
      .withColumn("containment",
        org.apache.spark.sql.graft.SetOverlap
          .setOverlap($"sh_a", $"sh_b").cast("double") /
          size($"sh_a").cast("double"))
      .filter($"containment" >= ContainT)
      .select($"doc_eval", $"split_eval", $"doc_train", $"containment")
      .orderBy($"doc_eval", $"doc_train")
  }

  private val ChunkSize = 50
  private val ChunkStride = 40

  /** Document chunking — the context-window prep step: overlapping
    * [[ChunkSize]]-token windows every [[ChunkStride]] tokens (the final
    * chunk may run short). Pure row-local explode: each document expands
    * to ceil(n/stride) skinny (doc, chunk) rows carrying a rolling
    * fingerprint instead of the text, so chunk manifests shuffle at
    * O(chunks), not O(corpus bytes); the payload slice itself would be
    * `slice(w, start+1, size)` in the writer stage. */
  private def textChunk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .withColumn("n", size($"w"))
      .filter($"n" > 0)
      .select($"doc_id", $"w", $"n",
        posexplode(sequence(lit(0), $"n" - 1, lit(ChunkStride))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start")
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        least(lit(ChunkSize), $"n" - $"start").cast("long").as("chunk_len"),
        rollingFingerprint(
          transform(slice($"w", $"start" + 1, lit(ChunkSize)), charHash(_)))
          .as("chunk_fp"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val VocabK = 50

  /** Corpus vocabulary induction: global top-[[VocabK]] tokens by
    * frequency (deterministic (count DESC, token ASC) tie order) — the
    * seed step of any tokenizer/vocab build. explode → map-side-combined
    * count, then `orderBy().limit()` plans as TakeOrderedAndProject:
    * each partition keeps only its own top-K and the driver merges K
    * per partition, never a global sort of the vocabulary. */
  private def textVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc)
      .limit(VocabK)
  }

  private[queries] val BpeMerges = 3
  /** Merge-budget clamp for the deep variant — the oracle unrolls to the
    * ceiling, so it stays a static SQL string while the budget itself is
    * data-derived (see [[bpeMergeBudget]]). */
  private[queries] val BpeBudgetFloor = 4
  private[queries] val BpeBudgetCap = 16
  /** DATA-DERIVED merge budget of the deep variant (`q_text_bpe_deep`):
    * smallest m ∈ [[[BpeBudgetFloor]], [[BpeBudgetCap]]] with
    * 2^m ≥ 4 · (distinct word types) — i.e. merges ≈ log₂(types) + 2, a
    * vocab budget that grows with the corpus's type diversity instead of
    * a fixed demo constant (r13 verdict item 7), the same
    * integer-find-from-count(*) shape as `Similarity.embBandBits`, and
    * inlined identically in the DuckDB oracle so both engines compute
    * the budget from their own COUNT(DISTINCT w). Each merge buys one
    * vocab entry; type diversity is the classic driver of how many
    * entries are worth buying (Sennrich et al. 2016 scale vocab size
    * with corpus size, not a constant). */
  private[queries] def bpeMergeBudget(nTypes: Long): Int =
    // 2^m ≥ 4·n written as 2^(m-2) ≥ n so a pathological n can't
    // overflow the multiply (m ≥ floor ≥ 4 keeps the shift nonnegative).
    (BpeBudgetFloor to BpeBudgetCap)
      .find(m => (1L << (m - 2)) >= nTypes).getOrElse(BpeBudgetCap)
  /** Vocab-budget stop rule: a merge whose best pair occurs fewer than
    * this many times buys no compression — the driver loop stops there
    * even with budget left. Max pair count is NON-INCREASING under BPE
    * merges (a new pair (l, rs) occurs at most as often as the (r, s) it
    * contains did), so "first step under the floor" = "every later step
    * under the floor" — which is what lets the oracle mirror the stop
    * rule as a plain `pair_cnt >= floor` filter over its unrolled
    * steps. */
  private[queries] val BpeMinPairSupport = 2L
  private val SymA = "\u0001" // symbol-start sentinel in the encoded form
  private val SymB = "\u0002" // symbol-end sentinel
  private val EndWord = "</w>" // classic BPE end-of-word marker

  /** BPE tokenizer TRAINING — [[BpeMerges]] merge steps of byte-pair
    * encoding (Sennrich et al. 2016) over the corpus, the step that
    * produces the vocab `q_text_token_count` would consume. Each step:
    * freq-weighted adjacent-symbol-pair counts over the WORD VOCAB (never
    * the corpus — the classic trick: identical words collapse to one row
    * with a frequency, so pair counting is Θ(vocab), not Θ(tokens)), a
    * deterministic argmax (count DESC, pair ASC), and a greedy
    * left-to-right non-overlapping merge application.
    *
    * The merge application is ONE literal `replace()` per word: symbols
    * are encoded as `\u0001 sym \u0002 …`, so the pattern
    * `\u0001 l \u0002 \u0001 r \u0002 → \u0001 lr \u0002` can neither match
    * inside a longer symbol nor chain into an overlapping match (the
    * replacement ends in the END sentinel, a match must start with the
    * START sentinel) — and both engines' replace() scans left-to-right
    * non-overlapping, which IS BPE's greedy application order.
    *
    * Shape (r13): a DRIVER-BOUNDED loop — each step collects its 1-row
    * argmax (count DESC, pair ASC), inlines the winning pair as string
    * LITERALS into the next step's row-local replace, and materializes
    * the re-encoded vocab ([[graft.core.Checkpoints]]), so step k+1 is
    * one pass over step k's blocks instead of a k-deep lazy
    * re-derivation (the r12 all-lazy form was Θ(N²) vocab passes at
    * merge depth N — fine at 3, wrong at a production vocab budget).
    * The loop STOPS at [[BpeMinPairSupport]] — the vocab-budget rule —
    * and `maxMerges` is the declared budget: [[BpeMerges]] for the
    * catalog query, the data-derived [[bpeMergeBudget]] for
    * `q_text_bpe_deep`, both oracle-gated.
    *
    * Scale: every relation after the first groupBy is vocab-sized
    * (~1e8 rows at 100 TB, skinny strings); each step is one
    * map-side-combined pair count + a 1-row driver argmax + a
    * row-local replace. Nothing iterates over the corpus again, and the
    * 1-row LIMIT sort runs over observed-pair counts, not tokens. */
  private[queries] def textBpeN(s: SparkSession, d: String,
      maxMerges: Int): DataFrame =
    textBpeNCounted(s, d, maxMerges)._1

  /** The BPE trainer loop, returning (merge table, driver ROUNDS run).
    *
    * r15 merge-round BATCHING: the r13 loop was strictly sequential —
    * one driver round-trip (pair-count job + argmax collect + replace +
    * materialize + token-count job) PER merge, which at a production
    * budget (~30k merges) is 30k driver round-trips. One round now
    * applies a PREFIX of the (cnt DESC, lhs, rhs)-ordered candidate
    * list whenever doing so provably reproduces the sequential result:
    *
    *  - accepted pairs are pairwise DISJOINT on the strings
    *    {lhs, rhs, lhs+rhs} — so no accepted merge consumes, produces,
    *    or renames a symbol another accepted pair matches on: each
    *    accepted pair's count and realized merge set are exactly its
    *    sequential values (old-pair adjacencies never increase, and a
    *    disjoint merge can neither create nor destroy them);
    *  - merging (a,b) can only ADD pairs involving the new symbol ab,
    *    and every such adjacency — at ANY intermediate sequential state
    *    of the round — maps injectively to a pre-round symbol triple
    *    (x,a,b) or (a,b,y), so max over those triple counts bounds the
    *    rank any created pair can reach. A candidate is accepted only
    *    while it STRICTLY outranks that bound (ties close the round:
    *    string tie-break against an unknown created pair is not worth
    *    reasoning about), which guarantees the sequential argmax at its
    *    turn is the candidate itself;
    *  - lhs == rhs pairs (overlapping-run merges, where greedy
    *    application makes realized merges < adjacency count) are only
    *    ever accepted as a round of their own;
    *  - candidates are never SKIPPED — acceptance stops at the first
    *    conflict, so the accepted set is always a prefix of the exact
    *    sequential order.
    *
    * Intermediate `n_tokens_after` values are derived by subtraction
    * (each disjoint lhs≠rhs merge removes exactly pair_cnt tokens) and
    * the round's final value is ASSERTED against a measured token
    * count — a violated batching assumption fails loudly instead of
    * shipping a wrong table. Per round the corpus-derived work is one
    * pair-count job, one (candidate-filtered) triple-bound job, one
    * chained-replace materialize, and one token-count job — ~4 jobs for
    * up to `maxBatch` merges vs 3 jobs per merge sequentially.
    * BpeSpec pins batched == sequential == the Sennrich reference. */
  private[graft] def textBpeNCounted(s: SparkSession, d: String,
      maxMerges: Int, maxBatch: Int = 16): (DataFrame, Int) = {
    import s.implicits._
    import graft.core.Checkpoints.MaterializeOps
    val pq = java.util.regex.Pattern.quote(SymB + SymA)
    val vocab = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    var enc = vocab.select($"freq",
      concat(
        array_join(transform(sequence(lit(1), length($"w")),
          i => concat(lit(SymA), $"w".substr(i, lit(1)), lit(SymB))), ""),
        lit(SymA + EndWord + SymB)).as("enc"))
      .materialized
    val symsOf = (c: Column) =>
      split(c.substr(lit(2), length(c) - 2), pq)
    def tokenCount(): Long = enc
      .agg(sum($"freq" * size(symsOf($"enc"))).as("n")).collect()(0).getLong(0)
    var nTokens = tokenCount()
    val merges =
      Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var stepsSoFar = 0
    var rounds = 0
    var stopped = false
    while (!stopped && stepsSoFar < maxMerges) {
      val m = math.min(math.max(1, maxBatch), maxMerges - stepsSoFar)
      val cand = enc.select($"freq", symsOf($"enc").as("sy"))
        .select($"freq",
          explode(zip_with(slice($"sy", lit(1), size($"sy") - 1),
            slice($"sy", lit(2), size($"sy") - 1),
            (x, y) => struct(x.as("lhs"), y.as("rhs")))).as("p"))
        .groupBy($"p.lhs".as("lhs"), $"p.rhs".as("rhs"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"lhs".asc, $"rhs".asc).limit(m)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .takeWhile(_._3 >= BpeMinPairSupport)
      if (cand.isEmpty) stopped = true
      else {
        // Upper bound, per candidate, on the count of any pair a merge
        // of that candidate could CREATE: max pre-round triple count
        // adjacent to the pair (suffix (x,lhs,rhs) or prefix
        // (lhs,rhs,y)). Only needed when a multi-merge round is
        // possible.
        // Greedy prefix acceptance under the safety rules above, with
        // the created-pair bound injectable: `enforce = false` is the
        // OPTIMISTIC pass that only measures how long the
        // string-disjoint prefix could be, so a round that can only
        // ever take one merge (the common case on small corpora, where
        // count gaps are narrow) skips the triple-bound job entirely.
        def acceptPrefix(maxNewOf: ((String, String)) => Long,
            enforce: Boolean): Seq[(String, String, Long)] = {
          val used = scala.collection.mutable.Set.empty[String]
          val acc =
            scala.collection.mutable.Buffer.empty[(String, String, Long)]
          var cap = -1L
          var open = true
          for (p @ (l, r, c) <- cand if open) {
            if (acc.isEmpty) {
              acc += p
              if (l == r) open = false
              else {
                used ++= Seq(l, r, l + r)
                cap = maxNewOf((l, r))
              }
            } else if (l != r && (!enforce || cap < c) &&
                !used(l) && !used(r) && !used(l + r)) {
              acc += p
              used ++= Seq(l, r, l + r)
              cap = math.max(cap, maxNewOf((l, r)))
            } else open = false
          }
          acc.toSeq
        }
        val optimistic = acceptPrefix(_ => 0L, enforce = false)
        // NUL separator: symbols are token substrings or merged
        // concatenations of them, so they can never contain it.
        val sep = "\u0000"
        val maxNew: Map[(String, String), Long] =
          if (optimistic.length <= 1) Map.empty
          else {
            val keys = cand.map(p => p._1 + sep + p._2).toSeq
            enc.select($"freq", symsOf($"enc").as("sy"))
              .filter(size($"sy") >= 3)
              .select($"freq", explode(transform(
                sequence(lit(1), size($"sy") - 2),
                i => struct(
                  element_at($"sy", i).as("s1"),
                  element_at($"sy", i + 1).as("s2"),
                  element_at($"sy", i + 2).as("s3")))).as("t"))
              .select($"freq",
                concat($"t.s1", lit(sep), $"t.s2").as("k12"),
                concat($"t.s2", lit(sep), $"t.s3").as("k23"),
                $"t.s1".as("s1"), $"t.s3".as("s3"))
              .filter($"k12".isInCollection(keys) ||
                $"k23".isInCollection(keys))
              .select($"freq", explode(filter(array(
                when($"k23".isInCollection(keys),
                  struct($"k23".as("ck"), $"s1".as("other"))),
                when($"k12".isInCollection(keys),
                  struct($"k12".as("ck"), $"s3".as("other")))),
                x => x.isNotNull)).as("c"))
              .groupBy($"c.ck".as("ck"), $"c.other".as("other"))
              .agg(sum($"freq").as("cnt"))
              .groupBy($"ck").agg(max($"cnt").as("max_new"))
              .collect()
              .map { r =>
                val Array(l, rr) = r.getString(0).split(sep, 2)
                (l, rr) -> r.getLong(1)
              }.toMap
          }
        val acc =
          if (optimistic.length <= 1) optimistic
          else acceptPrefix(maxNew.getOrElse(_, 0L), enforce = true)
        val newEnc = acc.foldLeft($"enc": Column) { case (col, (l, r, _)) =>
          replace(col, lit(SymA + l + SymB + SymA + r + SymB),
            lit(SymA + l + r + SymB))
        }
        enc = enc.select($"freq", newEnc.as("enc")).materialized
        val actual = tokenCount()
        if (acc.size == 1) {
          // Singleton round: lhs==rhs greedy application can realize
          // fewer merges than the adjacency count, so measure directly.
          val (l, r, c) = acc(0)
          merges += ((stepsSoFar + 1, l, r, l + r, c, actual))
        } else {
          var running = nTokens
          acc.zipWithIndex.foreach { case ((l, r, c), i) =>
            running -= c
            merges += ((stepsSoFar + i + 1, l, r, l + r, c, running))
          }
          require(running == actual,
            s"BPE batched round diverged from sequential semantics: " +
              s"derived token count $running vs measured $actual " +
              s"(accepted ${acc.toSeq})")
        }
        nTokens = actual
        stepsSoFar += acc.size
        rounds += 1
      }
    }
    val table = merges.result()
      .toDF("step", "lhs", "rhs", "merged", "pair_cnt", "n_tokens_after")
      .orderBy($"step")
    (table, rounds)
  }

  private def textBpe(s: SparkSession, d: String): DataFrame =
    textBpeN(s, d, BpeMerges)

  /** Deep variant: ONE cheap distinct-count over the word vocab derives
    * the merge budget (the geometry queries' count(*)-derivation
    * pattern), then the driver-bounded loop runs under it. */
  private def textBpeDeep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nTypes = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("w"))
      .filter(length($"w") > 0)
      .select($"w").distinct().count()
    textBpeN(s, d, bpeMergeBudget(nTypes))
  }

  private val OovVocabK = 100

  /** Tokenizer-vocabulary coverage / out-of-vocabulary rate per source —
    * the sanity metric run before committing a tokenizer or ingesting a
    * new feed: how much of each source's token mass falls outside the
    * top-[[OovVocabK]] corpus vocabulary. The induced vocabulary cut is
    * deterministic ((count DESC, token ASC) tie order, same rule as
    * `q_text_vocab`), coverage flags ride a broadcast left join (the
    * vocabulary is tiny by construction), and the per-source rollup is
    * one map-side-combined aggregation — integer counts plus one
    * floor-milli ratio, so the oracle matches exactly. */
  private def textOov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("token"))
    val vocab = tok.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token".asc)
      .limit(OovVocabK)
      .select($"token", lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
        count(when($"in_vocab".isNull, 1)).as("n_oov"))
      .select($"source", $"n_tokens", $"n_oov",
        floor(($"n_oov" * 1000).cast("double") / $"n_tokens".cast("double"))
          .cast("long").as("oov_milli"))
      .orderBy($"source")
  }

  val queries: Map[String, Q] = Map(
    "q_text_oov" -> textOov,
    "q_text_chunk" -> textChunk,
    "q_text_vocab" -> textVocab,
    "q_text_bpe" -> textBpe,
    "q_text_bpe_deep" -> textBpeDeep,
    "q_text_top_skills" -> topSkills,
    "q_text_langid" -> langId,
    "q_text_quality" -> quality,
    "q_text_funnel" -> textFunnel,
    "q_text_token_count" -> tokenCount,
    "q_text_fingerprint" -> fingerprint,
    "q_text_boilerplate" -> boilerplate,
    "q_text_dupspans" -> dupSpans,
    "q_text_heavyhitters" -> heavyHitters,
    "q_text_redact_pii" -> redactPii,
    "q_split_assign" -> splitAssign,
    "q_pack_shards" -> packShards,
    "q_shuffle_pack" -> shufflePack,
    "q_text_feature_hash" -> featureHash,
    "q_text_repetition" -> repetition,
    "q_split_contamination" -> contamination,
    "q_text_containment" -> containment,
  )

  /** BPE oracle at merge budget `n` — unrolled per step like the kmeans
    * oracle; the greedy merge application is the same sentinel-encoded
    * literal replace() chain (chr(1)/chr(2) = the Spark side's
    * SymA/SymB sentinels). The driver loop's [[BpeMinPairSupport]]
    * stop rule is mirrored as the final `pair_cnt >=` filter: max pair
    * count is non-increasing under merges, so the unrolled steps past
    * the stop point all fail the filter and the unconditional SQL
    * unrolling matches the early-stopped loop exactly.
    *
    * With `derived = true` (the deep variant) the SQL unrolls to the
    * static [[BpeBudgetCap]] ceiling and computes the SAME
    * [[bpeMergeBudget]] integer-find from its own COUNT(*) over the
    * word vocab (the `q_dedup_embedding` oracle's geometry pattern),
    * gating the output on `step <= budget` — so the string stays static
    * while the budget tracks the data. */
  private def bpeOracleSql(n: Int, derived: Boolean = false): String = {
    def sy(encExpr: String) =
      s"string_split(substr($encExpr, 2, len($encExpr) - 2), chr(2)||chr(1))"
    // e$i is referenced three times (sy/e/n of the next step): without
    // MATERIALIZED, DuckDB's CTE inlining re-expands the whole chain per
    // reference — 3^steps plan copies, which at the 16-step budget
    // ceiling exhausts file handles on the base scan before running.
    def step(i: Int): String =
      s"""sy$i AS (
         |  SELECT freq, ${sy("enc")} AS sy FROM e${i - 1}),
         |c$i AS (
         |  SELECT t.sy[r.i] AS lhs, t.sy[r.i+1] AS rhs,
         |    CAST(SUM(t.freq) AS BIGINT) AS cnt
         |  FROM sy$i t, UNNEST(range(1, len(t.sy))) AS r(i)
         |  GROUP BY 1, 2),
         |b$i AS (
         |  SELECT lhs, rhs, cnt FROM c$i
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |e$i AS MATERIALIZED (
         |  SELECT e.freq,
         |    replace(e.enc, chr(1)||b.lhs||chr(2)||chr(1)||b.rhs||chr(2),
         |      chr(1)||b.lhs||b.rhs||chr(2)) AS enc
         |  FROM e${i - 1} e, b$i b),
         |n$i AS (
         |  SELECT CAST(SUM(freq * len(${sy("enc")})) AS BIGINT)
         |    AS n_tokens_after
         |  FROM e$i),
         |s$i AS (
         |  SELECT $i AS step, b.lhs, b.rhs, b.lhs||b.rhs AS merged,
         |    b.cnt AS pair_cnt, n.n_tokens_after
         |  FROM b$i b, n$i n)"""
    val steps = if (derived) BpeBudgetCap else n
    val union = (1 to steps).map(i => s"SELECT * FROM s$i")
      .mkString("\n      UNION ALL ")
    val budCte = if (!derived) "" else
      s"""bud AS (
         |  SELECT CAST(COALESCE(MIN(CASE
         |      WHEN (CAST(1 AS BIGINT) << r.b) >= 4 * nn.c
         |      THEN r.b END), $BpeBudgetCap) AS INT) AS m
         |  FROM (SELECT unnest(range($BpeBudgetFloor, ${BpeBudgetCap + 1}))
         |          AS b) r,
         |       (SELECT COUNT(*) AS c FROM v) nn),
         |""".stripMargin
    val budGate =
      if (derived) " AND step <= (SELECT m FROM bud)" else ""
    s"""WITH v AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents) t
       |  WHERE len(w) > 0 GROUP BY w),
       |${budCte}e0 AS (
       |  SELECT freq,
       |    array_to_string([chr(1) || w[i] || chr(2)
       |      FOR i IN range(1, len(w) + 1)], '')
       |      || chr(1) || '</w>' || chr(2) AS enc
       |  FROM v),
       |${(1 to steps).map(step).mkString(",\n")}
       |SELECT step, lhs, rhs, merged, pair_cnt, n_tokens_after
       |FROM ($union) u
       |WHERE pair_cnt >= $BpeMinPairSupport$budGate
       |ORDER BY step""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // Brute-force specification: string-shingle containment across every
    // (eval, train) pair — the prefix filter is the implementation.
    "q_text_containment" -> {
      val k = Dedup.ShingleK
      val gram = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
         |), s AS (
         |  SELECT doc_id,
         |    CASE WHEN $duckSplitH < $TrainCut THEN 'train'
         |         WHEN $duckSplitH < $ValCut THEN 'val'
         |         ELSE 'test' END AS split,
         |    list_distinct([$gram
         |                   FOR i IN range(1, len(w) - ${k - 2})]) AS sh
         |  FROM t WHERE len(w) >= $k)
         |SELECT a.doc_id AS doc_eval, a.split AS split_eval,
         |  b.doc_id AS doc_train,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / CAST(len(a.sh) AS DOUBLE) AS containment
         |FROM s a JOIN s b ON a.split <> 'train' AND b.split = 'train'
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / CAST(len(a.sh) AS DOUBLE) >= $ContainT
         |ORDER BY doc_eval, doc_train""".stripMargin
    },
    // The window fold ((0*131+h0)*131+h1)... equals the prepend-0
    // list_reduce over the same 10 hashes; both engines then island the
    // identical position sets with identical integer window arithmetic.
    "q_text_dupspans" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |th AS (
         |  SELECT doc_id, [${Dedup.duckCharHash("t", 31)} FOR t IN toks] AS h,
         |    CAST(len(toks) AS BIGINT) AS n
         |  FROM tok),
         |p AS (
         |  SELECT doc_id, h,
         |    unnest(range(0, n - ${DupSpanK - 1})) AS pos
         |  FROM th WHERE n >= $DupSpanK),
         |fp AS (
         |  SELECT doc_id, pos,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_slice(h, CAST(pos + 1 AS INTEGER),
         |        CAST(pos + $DupSpanK AS INTEGER))),
         |      (a, b) -> (a * 131 + b) % $HashP) AS g
         |  FROM p),
         |dup AS (SELECT g FROM fp GROUP BY g HAVING COUNT(*) >= 2),
         |m AS (SELECT doc_id, pos FROM fp WHERE g IN (SELECT g FROM dup)),
         |i AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos > COALESCE(MAX(pos + ${DupSpanK - 1})
         |        OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |      THEN 1 ELSE 0 END AS new_span
         |  FROM m),
         |s2 AS (
         |  SELECT doc_id, pos,
         |    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS span_id
         |  FROM i),
         |sp AS (
         |  SELECT doc_id, span_id,
         |    CAST(MAX(pos) + $DupSpanK - MIN(pos) AS BIGINT) AS span_toks
         |  FROM s2 GROUP BY doc_id, span_id),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |    CAST(SUM(span_toks) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY doc_id),
         |nt AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
         |  FROM documents)
         |SELECT a.doc_id, n_tok, n_spans, dup_tokens,
         |  n_tok - dup_tokens AS kept_tokens
         |FROM agg a JOIN nt USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    "q_text_boilerplate" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    [${Dedup.duckCharHash("tok", 31)}
         |     FOR tok IN string_split(lower(text), ' ')] AS hs
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, source,
         |    ((hs[i] * 131 + hs[i + 1]) % 1000000007 * 131 + hs[i + 2])
         |      % 1000000007 AS g
         |  FROM t, UNNEST(range(1, len(hs) - ${BoilerN - 2})) AS s(i)
         |  WHERE len(hs) >= $BoilerN),
         |freq AS (
         |  SELECT g FROM (
         |    SELECT g, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY g)
         |  WHERE df >= $BoilerDf),
         |perdoc AS (
         |  SELECT doc_id, any_value(source) AS source,
         |    COUNT(*) AS n_starts,
         |    SUM(CASE WHEN g IN (SELECT g FROM freq) THEN 1 ELSE 0 END)
         |      AS n_boiler
         |  FROM g GROUP BY doc_id)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_starts) AS BIGINT) AS sum_starts,
         |  CAST(SUM(n_boiler) AS BIGINT) AS sum_boiler,
         |  COUNT(CASE WHEN n_boiler * 5 >= n_starts * 4 THEN 1 END)
         |    AS n_template,
         |  CAST(floor(CAST(SUM(n_boiler) * 1000 AS DOUBLE)
         |    / CAST(SUM(n_starts) AS DOUBLE)) AS BIGINT) AS boiler_milli
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "q_text_vocab" ->
      s"""SELECT token, COUNT(*) AS cnt
         |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
         |      FROM documents) t
         |GROUP BY token ORDER BY cnt DESC, token LIMIT $VocabK""".stripMargin,
    // Unrolled per merge step like the kmeans oracle; the greedy merge
    // application is the same sentinel-encoded literal replace() chain
    // (chr(1)/chr(2) = the Spark side's \u0001/\u0002 sentinels).
    "q_text_bpe" -> bpeOracleSql(BpeMerges),
    "q_text_bpe_deep" -> bpeOracleSql(BpeBudgetCap, derived = true),
    // Exact specification of the two-pass MG query's OUTPUT (tokens with
    // support > n/(c+1)) — the sketch is implementation detail; its
    // superset guarantee is what makes this hash-comparable.
    "q_text_heavyhitters" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |n AS (SELECT COUNT(*) AS n_total FROM tok),
         |c AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok)
         |SELECT tok, cnt, n_total FROM c, n
         |WHERE cnt * ${HhCapacity + 1} > n_total
         |ORDER BY cnt DESC, tok""".stripMargin,
    "q_text_oov" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split(lower(text), ' ')) AS token
         |  FROM documents),
         |vocab AS (
         |  SELECT token FROM (
         |    SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
         |    ORDER BY cnt DESC, token LIMIT $OovVocabK)),
         |f AS (
         |  SELECT source,
         |    CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END
         |      AS oov
         |  FROM tok)
         |SELECT source, COUNT(*) AS n_tokens,
         |  CAST(SUM(oov) AS BIGINT) AS n_oov,
         |  CAST(floor(CAST(SUM(oov) * 1000 AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS oov_milli
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q_text_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
         |)
         |SELECT doc_id, i // $ChunkStride AS chunk_idx,
         |  CAST(least($ChunkSize, len(w) - i) AS BIGINT) AS chunk_len,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      [${Dedup.duckCharHash("tk", 31)}
         |       FOR tk IN w[i + 1:i + $ChunkSize]]),
         |    (a, h) -> (a * 131 + h) % 1000000007) AS chunk_fp
         |FROM t, UNNEST(range(0, len(w), $ChunkStride)) AS s(i)
         |WHERE len(w) > 0
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_top_skills" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split(lower(text), ' ')) AS token
         |  FROM documents
         |), cnt AS (
         |  SELECT source, token, COUNT(*) AS cnt FROM tok
         |  WHERE token IN $skillsDictSql
         |  GROUP BY source, token
         |)
         |SELECT source, rnk, token, cnt FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY source ORDER BY cnt DESC, token) AS rnk
         |  FROM cnt) t
         |WHERE rnk <= 10
         |ORDER BY source, rnk""".stripMargin,
    "q_text_langid" ->
      """WITH f AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), feat AS (
        |  SELECT doc_id, labeled_lang,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(toks, t -> t IN ('a', 'the'))) AS BIGINT)
        |      AS stop_cnt,
        |    CAST(list_sum([CAST(len(t) AS BIGINT) FOR t IN toks]) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS avg_tok_len,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS ttr
        |  FROM f)
        |SELECT doc_id, labeled_lang,
        |  CASE
        |    WHEN CAST(stop_cnt AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 0.08
        |      THEN 'en'
        |    WHEN avg_tok_len >= 4.7 THEN 'de'
        |    WHEN ttr >= 0.55 THEN 'zh'
        |    WHEN n_tok % 2 = 0 THEN 'es'
        |    ELSE 'fr' END AS predicted_lang,
        |  n_tok, stop_cnt, avg_tok_len, ttr
        |FROM feat ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(toks, t -> t IN ('a', 'the'))) AS BIGINT)
        |      AS n_stop
        |  FROM f)
        |SELECT doc_id, n_chars, n_tok, n_distinct, n_stop,
        |  CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio,
        |  CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE) AS diversity,
        |  (n_tok >= 20 AND n_tok <= 1000
        |   AND CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) < 0.2)
        |    AS quality_ok
        |FROM c ORDER BY doc_id""".stripMargin,
    // Same flag cascade as q_text_quality's features; the dedup stage's
    // window orders survivor-first so both engines pick the same
    // representative; the 6-row pivot is a UNION ALL of the 1-row agg.
    "q_text_funnel" ->
      """WITH f AS (
        |  SELECT doc_id, text, string_split(lower(text), ' ') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, text,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(toks, t -> t IN ('a', 'the'))) AS BIGINT)
        |      AS n_stop,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        |  FROM f
        |), g AS (
        |  SELECT *,
        |    (n_tok >= 12) AS s2,
        |    (n_tok >= 12 AND n_tok >= 20 AND n_tok <= 1000) AS s3,
        |    (n_tok >= 12 AND n_tok >= 20 AND n_tok <= 1000
        |     AND n_stop * 20 < n_tok * 3) AS s4,
        |    (n_tok >= 12 AND n_tok >= 20 AND n_tok <= 1000
        |     AND n_stop * 20 < n_tok * 3
        |     AND n_distinct * 10 >= n_tok * 3) AS s5
        |  FROM c
        |), r AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY md5(lower(trim(text))) ORDER BY s5 DESC, doc_id) AS rn
        |  FROM g
        |), a AS (
        |  SELECT COUNT(*) AS d1, CAST(SUM(n_tok) AS BIGINT) AS t1,
        |    CAST(SUM(CAST(s2 AS BIGINT)) AS BIGINT) AS d2,
        |    CAST(SUM(CASE WHEN s2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
        |    CAST(SUM(CAST(s3 AS BIGINT)) AS BIGINT) AS d3,
        |    CAST(SUM(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
        |    CAST(SUM(CAST(s4 AS BIGINT)) AS BIGINT) AS d4,
        |    CAST(SUM(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4,
        |    CAST(SUM(CAST(s5 AS BIGINT)) AS BIGINT) AS d5,
        |    CAST(SUM(CASE WHEN s5 THEN n_tok ELSE 0 END) AS BIGINT) AS t5,
        |    CAST(SUM(CAST(s5 AND rn = 1 AS BIGINT)) AS BIGINT) AS d6,
        |    CAST(SUM(CASE WHEN s5 AND rn = 1 THEN n_tok ELSE 0 END)
        |      AS BIGINT) AS t6
        |  FROM r
        |), p AS (
        |  SELECT 1 AS stage, 'all' AS rule, d1 AS n_docs, t1 AS n_tokens,
        |    d1 AS dd FROM a
        |  UNION ALL SELECT 2, 'min_tokens', d2, t2, d1 FROM a
        |  UNION ALL SELECT 3, 'length_band', d3, t3, d1 FROM a
        |  UNION ALL SELECT 4, 'stopword_ratio', d4, t4, d1 FROM a
        |  UNION ALL SELECT 5, 'diversity', d5, t5, d1 FROM a
        |  UNION ALL SELECT 6, 'exact_dedup', d6, t6, d1 FROM a
        |)
        |SELECT stage, rule, n_docs, n_tokens,
        |  n_docs * 1000000 // dd AS share_fp
        |FROM p ORDER BY stage""".stripMargin,
    "q_text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |    AS BIGINT) AS re_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT)
        |    AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           [CAST(unicode(c) AS BIGINT)
        |            FOR c IN string_split(t, '')]),
        |         (a, b) -> (a * 31 + b) % 1000000007)
        |       FOR t IN toks]),
        |    (a, h) -> (a * 131 + h) % 1000000007) AS fingerprint,
        |  CAST(len(toks) AS BIGINT) AS n_tok
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_redact_pii" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or +1-555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS planted
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(planted,
        |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |     + len(regexp_extract_all(planted,
        |         '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT)
        |    AS n_redactions,
        |  regexp_replace(
        |    regexp_replace(planted,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_split_assign" ->
      s"""WITH a AS (
         |  SELECT $duckSplitH AS h,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
         |  FROM documents)
         |SELECT CASE WHEN h < $TrainCut THEN 'train'
         |            WHEN h < $ValCut THEN 'val'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM a GROUP BY 1 ORDER BY split""".stripMargin,
    // The oracle gets to use the single-node global window the Spark side
    // deliberately avoids — that asymmetry is the point of the check.
    "q_pack_shards" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_offset
        |  FROM d)
        |SELECT doc_id, n_tok, tok_offset, tok_offset // $ShardBudget AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_feature_hash" -> {
      val h = Dedup.duckCharHash("tok", 31)
      s"""WITH d AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents
         |)
         |SELECT doc_id, ($h) % $HashDim AS bucket,
         |  COUNT(*) AS cnt
         |FROM d GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin
    },
    // Single-window global-sort specification of the shuffled pack; the
    // two-phase distributed prefix sum is the implementation.
    "q_shuffle_pack" -> {
      val h = Dedup.duckCharHash("'shuffle:' || CAST(doc_id AS VARCHAR)", 31)
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
        |    ($h) * $ShuffleTieMod + doc_id % $ShuffleTieMod AS k
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_offset
        |  FROM d)
        |SELECT doc_id, n_tok, tok_offset, tok_offset // $ShardBudget AS shard
        |FROM c ORDER BY doc_id""".stripMargin
    },
    "q_text_repetition" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), b AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
        |                         FOR i IN range(1, len(w))]) AS bigram
        |  FROM t WHERE len(w) >= 2
        |), c AS (
        |  SELECT doc_id, bigram, COUNT(*) AS cnt FROM b GROUP BY 1, 2)
        |SELECT doc_id, MAX(cnt) AS top_cnt,
        |  CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS rep_ratio,
        |  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) > $RepThreshold
        |    AS repetitive
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_split_contamination" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
         |), sg AS (
         |  SELECT doc_id,
         |    CASE WHEN $duckSplitH < $TrainCut THEN 'train'
         |         WHEN $duckSplitH < $ValCut THEN 'val'
         |         ELSE 'test' END AS split,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        [list_reduce(
         |           list_prepend(CAST(0 AS BIGINT),
         |             [CAST(unicode(c) AS BIGINT)
         |              FOR c IN string_split(tk, '')]),
         |           (a, b) -> (a * 31 + b) % 1000000007)
         |         FOR tk IN w[1:$ContamPrefixLen]]),
         |      (a, h) -> (a * 131 + h) % 1000000007) AS pfp
         |  FROM t)
         |SELECT a.doc_id AS doc_a, a.split AS split_a,
         |  b.doc_id AS doc_b, b.split AS split_b
         |FROM sg a JOIN sg b
         |  ON a.pfp = b.pfp AND a.doc_id < b.doc_id AND a.split <> b.split
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
