package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing column combinators shared by the text-analysis, dedup and
  * fingerprinting queries.
  *
  * Everything here is built from codegen-friendly builtins and higher-order
  * array functions — no UDFs — and sticks to exact integer arithmetic so the
  * DuckDB oracle can replicate results bit-for-bit (doubles only appear as
  * ratios of exact integers, which are single IEEE divisions and therefore
  * deterministic cross-engine).
  *
  * Reference grounding: tokenization + dictionary counting generalizes the
  * flagship skill-frequency aggregation at
  * `/root/reference/data_populator/populator.py:42-45` (lowercase,
  * whitespace-split, membership filter, Counter).
  */
object TextFunctions {

  /** Modulus for all polynomial hashes: the usual 1e9+7 prime. Keeps every
    * intermediate product below 2^63 (a*h <= ~1e9 * ~1e9 = 1e18) so the same
    * arithmetic runs overflow-free in Spark longs and DuckDB BIGINTs. */
  val HashP = 1000000007L

  /** Reference skills.json-style dictionary (`/root/reference/skills.json:2`
    * — 68 keyword entries consumed at `populator.py:44`), re-targeted at the
    * testdata `documents` vocabulary. */
  val SkillsDict: Seq[String] = Seq(
    "agg", "batch", "column", "customer", "filter", "group", "hash", "join",
    "key", "merge", "query", "row", "scan", "sort", "spark", "stream",
    "table", "value", "vector", "window")

  /** Stopword set for quality scoring / language-ID heuristics. */
  val Stopwords: Seq[String] = Seq("a", "the")

  /** Whitespace tokens of a lowercased text column (reference semantics:
    * `populator.py:44` does `job_description.lower().split()`). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Per-character polynomial rolling hash of a string:
    * fold(h = (h*mult + codepoint) mod P). Deterministic, exact, and
    * expressible in DuckDB as list_reduce over ord() of each char.
    * Backed by the codegen'd native expression
    * [[org.apache.spark.sql.graft.PolyHash]] (the equivalent HOF fold —
    * aggregate over transform/substr/ascii — evaluates interpreted,
    * ~2 µs per character at bench scale). */
  def charHash(s: Column, mult: Long = 31L): Column =
    org.apache.spark.sql.graft.PolyHash.polyHash(s, mult)

  /** 60-bit token hash: two independent polynomial hashes (multipliers 31
    * and 37) truncated to 30 bits each and packed — SimHash needs more sign
    * bits than one 30-bit hash provides. */
  def tokenHash60(t: Column): Column =
    (charHash(t, 31) % (1L << 30)) * (1L << 30) + charHash(t, 37) % (1L << 30)

  /** Rolling document fingerprint over an array of token hashes:
    * fold(h = (h*131 + tokHash) mod P). */
  def rollingFingerprint(tokenHashes: Column): Column =
    aggregate(tokenHashes, lit(0L), (acc, h) => (acc * 131L + h) % HashP)

  /** Word k-shingles ("n-gram Jaccard" unit): array of space-joined k-grams
    * of the token array; empty when the doc has fewer than k tokens.
    * (Guarded: Spark's `sequence(1, n)` turns DESCENDING for n < 1, so the
    * short-doc case must short-circuit to an empty array explicitly.) */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** One universal-family hash of a pre-hashed value: (a*h + b) mod P. */
  def affineHash(h: Column, a: Long, b: Long): Column = (h * a + b) % HashP

  /** Fast shingle hash for LSH banding: xxhash64 (whole-stage codegen'd,
    * one call per string) folded into [0, P). Candidate generation is an
    * implementation detail — the oracle checks the brute-force spec — so
    * this hash does NOT need a DuckDB twin, unlike [[charHash]], and is
    * ~75x cheaper than the per-character fold. */
  def fastShingleHash(s: Column): Column = pmod(xxhash64(s), lit(HashP))

  /** Fixed coefficients for the 18-permutation MinHash signature
    * (9 bands x 2 rows). Arbitrary but pinned: changing them changes every
    * signature, band key, and test expectation. */
  val MinHashCoeffs: Seq[(Long, Long)] = Seq(
    (472882049L, 291172369L), (741457133L, 870466889L),
    (152346463L, 611953517L), (930799021L, 148125287L),
    (390041077L, 720587887L), (267994057L, 82952267L),
    (559083377L, 354172847L), (684575221L, 913990211L),
    (87547013L, 476900359L), (318426869L, 662763349L),
    (825365507L, 200302919L), (573492767L, 39078347L),
    (216519157L, 784269619L), (962131541L, 528894013L),
    (110080051L, 337520689L), (638239819L, 95630827L),
    (415237819L, 850214029L), (779301637L, 253060231L))

  /** MinHash signature: array of array_min((a_i*h + b_i) mod P) over the
    * shingle-hash array — one element per (a,b) coefficient pair. */
  def minHashSignature(shingleHashes: Column): Column =
    array(MinHashCoeffs.map { case (a, b) =>
      array_min(transform(shingleHashes, h => affineHash(h, a, b)))
    }: _*)

  /** Exact Jaccard similarity of two pre-distinct string arrays, as a ratio
    * of exact intersection/union cardinalities (single IEEE division). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash of a (token, count) weighted bag, given parallel arrays of
    * token hashes and counts: bit i of the result is set iff
    * sum(count * (bit_i(tokHash) ? 1 : -1)) > 0. Exact integer math,
    * order-independent (sums commute), so the oracle's token order can
    * differ without changing the result. */
  def simHash(tokenHashes: Column, counts: Column, bits: Int): Column =
    (0 until bits).map { bit =>
      val contrib = aggregate(
        zip_with(tokenHashes, counts,
          (h, c) => when(shiftright(h, bit) % 2 === 1, c).otherwise(-c)),
        lit(0L), (acc, x) => acc + x)
      when(contrib > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
}
