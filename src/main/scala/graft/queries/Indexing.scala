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

  /** The ranked-retrieval query terms (all in the corpus vocabulary). */
  private[queries] val Bm25Terms = Seq("spark", "merge", "window")
  private[queries] val Bm25TopK = 25

  /** BM25 ranked retrieval (Robertson-Spärck Jones, k1 = 1.2, b = 0.75) —
    * the retrieval scorer behind corpus search / RAG attribution, with one
    * declared deviation: the idf is the RATIONAL core
    * `(N - df + 0.5)/(df + 0.5)` without the usual `ln(1 + ·)` wrapper.
    * The log is strictly monotone, so per-term orderings agree, and libm
    * `log` rounding is implementation-defined across engines — banned on
    * oracle-checked paths (same rule as `q_text_pmi` / `q_text_tfidf`).
    *
    * Determinism: tf, df, dl, N are exact integers; idf and each per-term
    * addend are fixed chains of correctly-rounded IEEE ops written with
    * IDENTICAL literals and association in both engines, so the doubles
    * are bit-equal; the per-doc sum is [[Catalog.dsum]] (exact decimal,
    * order-independent); ranking sorts that sum with a doc_id tie-break.
    *
    * Scale shape: term postings are filtered BEFORE any shuffle (the
    * explode feeds a `term IN (...)` filter, so only query-term hits
    * survive the map side); df and the corpus stats are tiny broadcast
    * relations; the only real shuffle carries (doc, term) hits for the
    * query's terms — bounded by postings size, never corpus size. */
  private[queries] def bm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("dl"), $"toks")
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        ($"n_docs".cast("double") - $"df".cast("double") + 0.5) /
          ($"df".cast("double") + 0.5))
      .withColumn("addend",
        $"idf" * ($"tf".cast("double") * 2.2) /
          ($"tf".cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            ($"dl".cast("double") /
              ($"sum_dl".cast("double") / $"n_docs".cast("double"))))))
      .groupBy($"doc_id")
      .agg(dsum($"addend").as("bm25"),
        count(lit(1)).as("n_terms"),
        max($"dl").as("dl"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(Bm25TopK)
  }

  val queries: Map[String, Q] = Map(
    "q_index_inverted" -> invertedIndex,
    "q_text_pmi" -> bigramPmi,
    "q_text_bm25" -> bm25,
  )

  // Literals and association mirror the Spark column expressions
  // EXACTLY (idf * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*(dl/(sum/n))))) so
  // the per-addend doubles are bit-equal before the decimal-exact sum.
  // The CTE chain (ending in `scored`) is shared with the hybrid-retrieval
  // fusion oracle in [[Mining]], which re-ranks the same BM25 list.
  private[queries] val bm25ScoredCtes: String =
    s"""WITH dd AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |dl AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM dd),
         |stats AS (
         |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, dl, term, COUNT(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl) u
         |  WHERE term IN ${Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")}
         |  GROUP BY doc_id, dl, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |scored AS (
         |  SELECT tf.doc_id, tf.dl,
         |    (CAST(stats.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
         |      / (CAST(dfreq.df AS DOUBLE) + 0.5)
         |    * (CAST(tf.tf AS DOUBLE) * 2.2)
         |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         |        (CAST(tf.dl AS DOUBLE)
         |          / (CAST(stats.sum_dl AS DOUBLE)
         |            / CAST(stats.n_docs AS DOUBLE))))) AS addend
         |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_text_bm25" ->
      s"""$bm25ScoredCtes
         |SELECT doc_id, ${dsumSql("addend")} AS bm25,
         |  COUNT(*) AS n_terms, max(dl) AS dl
         |FROM scored GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK""".stripMargin,
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
