package graft.queries

import graft.SparkEntry
import graft.core.Tables

/** q_text_bpe against a from-scratch sequential BPE trainer: word
  * frequencies, freq-weighted pair counts, (count DESC, pair ASC)
  * argmax, and greedy left-to-right non-overlapping merge application,
  * all re-derived driver-side with plain Scala collections — the
  * Sennrich et al. reference algorithm, no Spark expression (and no
  * sentinel string encoding) anywhere in the loop. */
class BpeSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** One greedy left-to-right merge pass of (l, r) over a symbol seq. */
  private def applyMerge(sy: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sy.length) {
      if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sy(i); i += 1 }
    }
    out.result()
  }

  test("merge table equals the sequential reference trainer") {
    val words = Tables.documents(spark, Sf0001)
      .select($"text").as[String].collect().toSeq
      .flatMap(_.toLowerCase.split(" ", -1)) // trailing-empty semantics
      .filter(_.nonEmpty)
    var vocab: Map[Vector[String], Long] = words
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) =>
        (w.map(_.toString).toVector :+ "</w>", f)
      }
    assert(vocab.nonEmpty)

    val expected = (1 to TextAnalysis.BpeMerges).map { step =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      vocab.foreach { case (sy, f) =>
        sy.zip(sy.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.groupBy { case (sy, _) => applyMerge(sy, l, r) }
        .view.mapValues(_.values.sum).toMap
      val nTokens = vocab.map { case (sy, f) => sy.length * f }.sum
      (step, l, r, l + r, cnt, nTokens)
    }

    val got = SparkEntry.queries("q_text_bpe")(spark, Sf0001)
      .as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // corpus token count is strictly decreasing — each merge fires
    assert(got.map(_._6) == got.map(_._6).sorted.reverse)
    assert(got.map(_._6).distinct.size == got.size)
  }
}
