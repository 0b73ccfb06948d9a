package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{tokens, Stopwords}
import Catalog._

/** Model-INFERENCE operators: applying a trained model to the corpus at
  * scale — the missing half of the quality story. `q_text_quality`
  * (heuristic gates) and `q_sample_weighted` (acceptance sampling) filter
  * by hand-written rules; real pretraining pipelines (GPT-3's LR
  * quality classifier, CCNet, fastText language/quality filters) score
  * every document with a TRAINED linear model and threshold the margin.
  *
  * The model here is the exported artifact of such a training run: a
  * (feature-index, name, weight) relation plus a bias — data, not code.
  * Inference is the canonical Spark shape for batch scoring with a small
  * model: fold the weight relation into ONE ordered coefficient array,
  * broadcast it (a lazy 1-row crossJoin, the same move as tfidf's corpus
  * count), and compute the dot product row-locally with codegen'd
  * `zip_with`/`aggregate` — the corpus is scanned once, nothing shuffles
  * but the output sort, and swapping in a retrained model touches zero
  * query code. Integer weights on integer features keep the margin exact,
  * so the keep/drop decision is bit-identical in both engines — no
  * sigmoid needed (monotone in the margin; thresholding the margin IS
  * thresholding the probability).
  */
object Inference extends QueryGroup {

  /** Exported linear quality model: bias + (index, feature, weight) rows.
    * The index pins each weight to its position in the per-document
    * feature vector below. */
  private[queries] val ModelBias = 80L
  private[queries] val ModelWeights: Seq[(Int, String, Long)] = Seq(
    (0, "n_tok", 3L),       // reward substance ...
    (1, "n_stop", -40L),    // ... punish stopword stuffing
    (2, "n_distinct", 8L),  // reward lexical diversity
    (3, "n_chars", -1L))    // punish verbosity at equal token mass

  private def qualityClassifier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val model = ModelWeights.toDF("idx", "feature", "weight")
    // (idx, weight) rows -> one index-ordered coefficient array.
    val wvec = model.agg(
      transform(array_sort(collect_list(struct($"idx", $"weight"))),
        x => x.getField("weight")).as("w"))
    val toks = tokens($"text")
    val feats = Tables.documents(s, d)
      .select($"doc_id",
        array(
          size(toks).cast("long"),
          size(filter(toks, t => t.isin(Stopwords: _*))).cast("long"),
          size(array_distinct(toks)).cast("long"),
          $"n_chars").as("f"))
    feats.crossJoin(broadcast(wvec))
      .select($"doc_id",
        (lit(ModelBias) +
          aggregate(zip_with($"f", $"w", (f, wt) => f * wt),
            lit(0L), _ + _)).as("margin"))
      .withColumn("keep", $"margin" > 0)
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_quality_classifier" -> qualityClassifier,
  )

  val oracle: Map[String, String] = Map(
    "q_quality_classifier" -> {
      val stopList = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
      // Same model, weights inlined from the same ModelWeights constant.
      val wsum = ModelWeights
        .map { case (_, f, w) => s"($w)*$f" }.mkString(" + ")
      s"""WITH f AS (
         |  SELECT doc_id, n_chars, string_split(lower(text), ' ') toks
         |  FROM documents
         |), c AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(toks, t -> t IN $stopList)) AS BIGINT)
         |      AS n_stop,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |    n_chars
         |  FROM f
         |), m AS (
         |  SELECT doc_id, CAST($ModelBias + $wsum AS BIGINT) AS margin
         |  FROM c)
         |SELECT doc_id, margin, margin > 0 AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },
  )
}
