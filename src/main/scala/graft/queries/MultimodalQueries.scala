package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal
import Catalog._

/** Catalog entries for the multimodal-column operators
  * ([[graft.operators.Multimodal]]). Payloads are UTF-8 text bytes
  * (deterministic stand-ins), so the DuckDB oracle can reproduce the
  * binary-side results exactly — including the stubbed decode's byte
  * histogram (ASCII text ⇒ bytes == codepoints). */
object MultimodalQueries extends QueryGroup {

  /** Binary metadata surface: payload length, digest, first byte. */
  private def meta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.mediaTable(Tables.documents(s, d))
      .select($"media_id", $"kind",
        $"meta.n_bytes".as("n_bytes"),
        md5($"payload").as("digest"),
        ascii(substring(decode($"payload", "UTF-8"), 1, 1)).as("first_byte"),
        $"meta.source".as("source"))
      .orderBy($"media_id")
  }

  /** The mapPartitions feature extraction (stubbed decode) — features are
    * exact-count ratios, reproducible in SQL. */
  private def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(
      Multimodal.mediaTable(Tables.documents(s, d)))
      .toDF()
      .select($"media_id", $"kind", $"n_bytes",
        element_at($"features", 1).as("f0"),
        element_at($"features", 2).as("f1"),
        element_at($"features", 3).as("f2"),
        element_at($"features", 8).as("f7"))
      .orderBy($"media_id")
  }

  /** Frame sampling: per-payload frame counts (flatMap fan-out shape). */
  private def frames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.sampleFrames(
      Multimodal.mediaTable(Tables.documents(s, d)))
      .toDF()
      .groupBy($"media_id")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(length($"frame")).cast("long").as("total_frame_bytes"))
      .orderBy($"media_id")
  }

  /** Resize stage: fixed-size NN-downsampled thumbnail per payload,
    * pinned by its polynomial signature. */
  private def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.resizeThumbs(
      Multimodal.mediaTable(Tables.documents(s, d)))
      .toDF()
      .orderBy($"media_id")
  }

  /** Hamming radius for "perceptually similar" — sits at the knee of the
    * observed pair-distance distribution (real near-dup families land at
    * 6-8 bits; unrelated docs start exploding from 9 up). */
  private[queries] val PhashMaxHamming = 8

  /** All 21-bit masks with popcount <= 2 (1 + 21 + C(21,2) = 232): the
    * variant-enumeration table for multi-index hashing. */
  private val phashMasks: Array[Long] = {
    val singles = (0 until 21).map(1L << _)
    val doubles = for (i <- 0 until 21; j <- (i + 1) until 21)
      yield (1L << i) | (1L << j)
    (0L +: singles) ++ doubles
  }.toArray

  /** Broadcast budget for the exact-chunk build side, sized in BYTES of
    * driver-built hash relation, not docs: each doc contributes 3
    * (media_id, ahash, chunk_idx, chunk_val) entries, and a
    * HashedRelation costs ~64 B per entry with map overhead — ~200 B per
    * doc. The r14 limit of 4M docs admitted a ~12M-entry build (~1.2 GB
    * on the driver), close enough to driver-memory/broadcast ceilings to
    * OOM right below the cutoff; 200 MB of budget (1M docs) keeps the
    * broadcast comfortably inside a default driver while still covering
    * every corpus this engine benches. Above it, the SHUFFLE_HASH hint
    * keeps the planner from sort-merge-joining — the variant stream is
    * never sorted. */
  private[queries] val PhashBroadcastMaxBytes = 200L * 1024 * 1024
  private[queries] val PhashBytesPerDoc = 200L
  private[queries] val PhashBroadcastDocLimit =
    PhashBroadcastMaxBytes / PhashBytesPerDoc

  /** documents-table row counts, cached per dataset dir: the broadcast
    * decision needs the corpus size at every phashDedup CONSTRUCTION,
    * and an uncached docs.count() re-ran a (cheap but real) Spark job
    * each time — a metadata-only parquet count, but still a job per
    * construction in bench warmup + every timed run. */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def docCount(s: SparkSession, d: String): Long =
    docCountCache.computeIfAbsent(d, _ => Tables.documents(s, d).count())

  /** Perceptual near-dup pairs via MULTI-INDEX HASHING (Norouzi et al.):
    * the 63-bit aHash splits into 3 chunks of 21 bits; hamming <= 8
    * overall pigeonholes to <= 2 errors in SOME chunk, so one side
    * enumerates every <= 2-flip variant of each chunk (232 masks — a
    * constant array literal XORed row-locally) and equi-joins the other
    * side's EXACT chunk values. Buckets live in a 2^21 space, so
    * candidates are docs genuinely within 2 bits on a chunk — unlike
    * plain narrow-chunk banding, whose 2^7 buckets collide
    * quadratically as the corpus grows (measured 4x slower at sf0.1).
    *
    * Scale shape (r14 — the ×100 sweep caught the old one): the
    * variant-exploded stream is Θ(n·3·232) rows and must be COMPUTE,
    * never sort or shuffle input (the r13 `q_dedup_embedding` lesson).
    * Three load-bearing choices:
    *  1. The hamming <= [[PhashMaxHamming]] verify sits IN the join
    *     condition, so a candidate pair that fails it is dropped at
    *     probe time and never materializes — only true near-dups
    *     (output-linear) reach the dedup exchange. The old shape
    *     dropDuplicates'd ALL candidates first: at ×100 the clustered
    *     text-stand-in hashes made that pair stream big enough to fill
    *     the disk ("No space left on device", sort-merge spill).
    *  2. The EXACT-chunk side (3 rows/doc) broadcasts below
    *     [[PhashBroadcastDocLimit]] — the exploded stream then never
    *     exchanges at all; above it, a SHUFFLE_HASH hint keeps the
    *     planner from sort-merge-joining (sorting the variant stream is
    *     the spill that killed the ×100 run).
    *  3. Variant enumeration stays a row-local XOR over a constant
    *     array literal. */
  private def phashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val sigs = Multimodal.perceptualHashes(
      Multimodal.mediaTable(docs)).toDF()
    val chunks = sigs.select($"media_id", $"ahash",
      posexplode(array((0 until 3).map(i =>
        shiftright($"ahash", i * 21) % (1 << 21)): _*)))
      .toDF("media_id", "ahash", "chunk_idx", "chunk_val")
    val expanded = chunks.select($"media_id", $"ahash", $"chunk_idx",
      explode(transform(typedLit(phashMasks),
        m => $"chunk_val".bitwiseXOR(m))).as("variant"))
    val build =
      if (docCount(s, d) <= PhashBroadcastDocLimit) broadcast(chunks.as("b"))
      else chunks.as("b").hint("SHUFFLE_HASH")
    expanded.as("a")
      .join(build,
        $"a.chunk_idx" === $"b.chunk_idx" &&
          $"a.variant" === $"b.chunk_val" &&
          $"a.media_id" < $"b.media_id" &&
          bit_count($"a.ahash".bitwiseXOR($"b.ahash")) <= PhashMaxHamming)
      .select($"a.media_id".as("media_a"), $"b.media_id".as("media_b"),
        bit_count($"a.ahash".bitwiseXOR($"b.ahash")).cast("long")
          .as("hamming"))
      .dropDuplicates("media_a", "media_b")
      .orderBy($"media_a", $"media_b")
  }

  /** Audio framing + energy/zero-crossing/VAD stats over the `audio`
    * slice — the [[graft.operators.Multimodal.WavCodec]] seam decodes
    * real 8-bit PCM WAVs (pinned in MultimodalSpec); the text stand-ins
    * take the raw-byte fallback the oracle reproduces. */
  private def audio(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.audioFeatures(
      Multimodal.mediaTable(Tables.documents(s, d)))
      .toDF()
      .orderBy($"media_id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_audio" -> audio,
    "q_multimodal_meta" -> meta,
    "q_multimodal_features" -> features,
    "q_multimodal_frames" -> frames,
    "q_multimodal_resize" -> resize,
    "q_multimodal_phash" -> phashDedup,
  )

  private val kindSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image'
      |     WHEN doc_id % 3 = 1 THEN 'audio'
      |     ELSE 'video' END""".stripMargin

  private val AF = Multimodal.AudioFrameLen
  private val AE = Multimodal.AudioActiveEnergy

  val oracle: Map[String, String] = Map(
    // Raw-byte fallback path: ASCII stand-ins => unicode(char) == byte;
    // samples center at 128 (all-ASCII text is all-negative, so zc = 0
    // here — the real-PCM crossings are pinned by MultimodalSpec).
    "q_multimodal_audio" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    [CAST(unicode(c) AS BIGINT) - 128
         |     FOR c IN string_split(text, '')] AS s
         |  FROM documents WHERE doc_id % 3 = 1),
         |fr AS (
         |  SELECT doc_id, unnest(range(0, len(s) // $AF)) AS f, s
         |  FROM b WHERE len(s) >= $AF),
         |st AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(
         |      list_slice(s, f*$AF + 1, f*$AF + $AF), x -> x*x)) AS energy,
         |    len(list_filter(range(2, $AF + 1),
         |      i -> (s[f*$AF + i] < 0) <> (s[f*$AF + i - 1] < 0))) AS zc
         |  FROM fr)
         |SELECT doc_id AS media_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(SUM(energy) AS BIGINT) AS total_energy,
         |  CAST(MAX(energy) AS BIGINT) AS max_energy,
         |  CAST(COUNT(*) FILTER (energy > $AE) AS BIGINT) AS n_active,
         |  CAST(SUM(zc) AS BIGINT) AS total_zc
         |FROM st GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // ASCII text => bytes == codepoints, so the byte-index NN downsample
    // is a char-index downsample in SQL (src = floor(i*n/t), 1-based).
    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(strlen(text) AS BIGINT) AS n FROM documents
        |), t AS (
        |  SELECT media_id, text, n, LEAST(32, n) AS tsize FROM m)
        |SELECT media_id, CAST(n AS INTEGER) AS n_bytes,
        |  CAST(tsize AS INTEGER) AS thumb_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(unicode(text[CAST((i*n)//tsize AS INTEGER)+1]) AS BIGINT)
        |     FOR i IN range(0, CAST(tsize AS INTEGER))]),
        |    (a, b) -> (a*31 + b) % 1000000007) AS thumb_sig
        |FROM t ORDER BY media_id""".stripMargin,
    "q_multimodal_meta" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
         |  CAST(strlen(text) AS INT) AS n_bytes,
         |  md5(text) AS digest,
         |  CAST(unicode(text[1]) AS INT) AS first_byte,
         |  source
         |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, $kindSql AS kind,
         |    [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]
         |      AS bytes
         |  FROM documents)
         |SELECT doc_id AS media_id, kind,
         |  CAST(len(bytes) AS INT) AS n_bytes,
         |  CAST(len(list_filter(bytes, x -> x % 8 = 0)) AS DOUBLE)
         |    / CAST(len(bytes) AS DOUBLE) AS f0,
         |  CAST(len(list_filter(bytes, x -> x % 8 = 1)) AS DOUBLE)
         |    / CAST(len(bytes) AS DOUBLE) AS f1,
         |  CAST(len(list_filter(bytes, x -> x % 8 = 2)) AS DOUBLE)
         |    / CAST(len(bytes) AS DOUBLE) AS f2,
         |  CAST(len(list_filter(bytes, x -> x % 8 = 7)) AS DOUBLE)
         |    / CAST(len(bytes) AS DOUBLE) AS f7
         |FROM b ORDER BY media_id""".stripMargin,
    // Brute-force all-pairs spec of the banded aHash path (byte samples:
    // ASCII stand-ins => unicode(char) == byte; 1-based text[...]).
    "q_multimodal_phash" ->
      s"""WITH v AS (
         |  SELECT doc_id,
         |    [CAST(unicode(text[CAST((i*strlen(text))//63 AS INTEGER)+1])
         |      AS BIGINT) FOR i IN range(0, 63)] AS vs
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, vs, CAST(list_sum(vs) AS BIGINT) AS total FROM v),
         |h AS (
         |  SELECT doc_id,
         |    CAST(list_sum([CASE WHEN 63*vs[i+1] > total
         |      THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END
         |      FOR i IN range(0, 63)]) AS BIGINT) AS ahash
         |  FROM s)
         |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
         |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= ${PhashMaxHamming}
         |ORDER BY media_a, media_b""".stripMargin,
    "q_multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id, strlen(text) AS n FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST((n - 16) // 64 + 1 AS BIGINT) AS n_frames,
        |  CAST(16 * ((n - 16) // 64 + 1) AS BIGINT) AS total_frame_bytes
        |FROM b
        |WHERE n >= 16
        |ORDER BY media_id""".stripMargin,
  )
}
