package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._
import Catalog._

/** Corpus indexing + association statistics over `documents` — SURVEY.md
  * §2B "inverted index construction" and "bigram PMI".
  *
  * Both are staples of a training-data pipeline: the inverted index is
  * the retrieval/attribution artifact (token → document postings), PMI
  * the collocation signal used for phrase mining / tokenizer seeding.
  */
object Indexing extends QueryGroup {

  /** Postings are capped per token: an unbounded `collect_list` on a
    * stop-word token is a single-reducer OOM at corpus scale. The capped
    * head is the first shard; df/cf stay exact regardless. */
  private[queries] val PostingsCap = 64
  private[queries] val PmiMinPair = 5
  private[queries] val PmiTopK = 50

  /** Inverted index: token → (document frequency, collection frequency,
    * first [[PostingsCap]] postings in doc_id order). Classic two-level
    * build: per-(token, doc) term frequencies first (map-side combined —
    * the token×doc key is where the mass is), then a per-token merge
    * whose input is already one row per (token, doc). At 100 TB both
    * shuffles carry skinny (token, doc_id, count) triples, never text. */
  private def invertedIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val td = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"token", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    td.groupBy($"token")
      .agg(count(lit(1)).as("df"),
        sum($"tf").as("cf"),
        // comma-joined, not a list column: the oracle comparator hashes
        // flat values only (same reason q_udaf_topk serializes its arrays)
        array_join(slice(array_sort(collect_list($"doc_id")), 1, PostingsCap)
          .cast("array<string>"), ",").as("postings"))
      .orderBy($"token")
  }

  /** Top bigram collocations by pointwise-mutual-information-style lift:
    * score = c(x,y)·N / (c(x)·c(y)), reported as floor(1000·lift) so the
    * oracle comparison is integer-exact (the log in true PMI is monotone
    * — rankings agree — and libm log is banned on oracle paths).
    *
    * Determinism: c_xy·N·1000 ≤ ~3e12 and c_x·c_y ≤ ~3.6e11 are exact in
    * doubles (≪ 2^53); one correctly-rounded divide + floor is then
    * bit-identical cross-engine. Bigram formation is ROW-LOCAL
    * (zip_with of two token-array slices) — no shuffle, no window; the
    * only shuffles are the two count aggregations, and the unigram table
    * (vocabulary-sized) broadcasts into the scoring join. */
  private def bigramPmi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val uni = docs.select(explode(tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum($"c").as("n"))
    val w = tokens($"text")
    val bi = docs
      .filter(size(w) >= 2)
      .select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select($"p.x".as("x"), $"p.y".as("y"))
    bi.groupBy($"x", $"y").agg(count(lit(1)).as("c_xy"))
      .filter($"c_xy" >= PmiMinPair)
      .join(broadcast(uni.select($"token".as("x"), $"c".as("cx"))), "x")
      .join(broadcast(uni.select($"token".as("y"), $"c".as("cy"))), "y")
      .crossJoin(broadcast(total))
      .select($"x", $"y", $"c_xy",
        floor(($"c_xy" * $"n" * 1000).cast("double") /
          ($"cx" * $"cy").cast("double")).cast("long").as("pmi_milli"))
      .orderBy($"pmi_milli".desc, $"x", $"y")
      .limit(PmiTopK)
  }

  val queries: Map[String, Q] = Map(
    "q_index_inverted" -> invertedIndex,
    "q_text_pmi" -> bigramPmi,
  )

  val oracle: Map[String, String] = Map(
    "q_index_inverted" ->
      s"""WITH td AS (
         |  SELECT token, doc_id, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
         |        FROM documents) u
         |  GROUP BY token, doc_id
         |)
         |SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
         |  CAST(SUM(tf) AS BIGINT) AS cf,
         |  array_to_string(list_sort(list(doc_id))[1:$PostingsCap], ',')
         |    AS postings
         |FROM td GROUP BY token ORDER BY token""".stripMargin,
    "q_text_pmi" ->
      s"""WITH t AS (
         |  SELECT string_split(lower(text), ' ') AS w FROM documents
         |), uni AS (
         |  SELECT token, COUNT(*) AS c
         |  FROM (SELECT unnest(w) AS token FROM t) u GROUP BY token
         |), n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
         |bi AS (
         |  SELECT w[i] AS x, w[i+1] AS y
         |  FROM t, UNNEST(range(1, len(w))) AS r(i)
         |), cxy AS (
         |  SELECT x, y, COUNT(*) AS c_xy FROM bi GROUP BY x, y
         |  HAVING COUNT(*) >= $PmiMinPair
         |)
         |SELECT cxy.x, cxy.y, cxy.c_xy,
         |  CAST(floor(CAST(cxy.c_xy * n.n * 1000 AS DOUBLE)
         |    / CAST(ux.c * uy.c AS DOUBLE)) AS BIGINT) AS pmi_milli
         |FROM cxy
         |JOIN uni ux ON ux.token = cxy.x
         |JOIN uni uy ON uy.token = cxy.y
         |CROSS JOIN n
         |ORDER BY pmi_milli DESC, cxy.x, cxy.y LIMIT $PmiTopK""".stripMargin,
  )
}
