package graft

import graft.core.Tables

/** q_text_dupspans against a from-scratch sequential recompute: gram
  * hashing, duplicate detection, and the island coalescing are all
  * re-derived driver-side with none of the query's window machinery. */
class DupSpansSpec extends SparkTestBase {

  private val P = 1000000007L
  private val K = 10

  private def chash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c) % P)

  test("duplicated-span report equals the sequential recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("q_text_dupspans")(spark, Sf0001)
      .select($"doc_id", $"n_tok", $"n_spans", $"dup_tokens",
        $"kept_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    // Spark's split(lower(text), " ") keeps trailing empty tokens
    // (limit -1), matching DuckDB string_split — so must the recompute.
    val toks = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }

    val grams = toks.flatMap { case (id, ts) =>
      val h = ts.map(chash)
      (0 to ts.length - K).map { p =>
        val g = h.slice(p, p + K).foldLeft(0L)((a, x) => (a * 131 + x) % P)
        (id, p, g)
      }
    }
    val dup = grams.groupBy(_._3).collect { case (g, occ) if occ.size >= 2 => g }.toSet
    val expected = grams.filter(t => dup(t._3))
      .groupBy(_._1).toSeq.map { case (id, hits) =>
        // island coalescing: a sorted sequential sweep
        var spans = List.empty[(Int, Int)] // (start, end) inclusive
        hits.map(_._2).sorted.foreach { p =>
          spans match {
            case (s0, e0) :: rest if p <= e0 => // overlap/containment only
              spans = (s0, math.max(e0, p + K - 1)) :: rest
            case _ => spans = (p, p + K - 1) :: spans
          }
        }
        val nTok = toks.toMap.apply(id).size.toLong
        val dupToks = spans.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum
        (id, nTok, spans.size.toLong, dupToks, nTok - dupToks)
      }.sortBy(_._1)

    assert(got.nonEmpty, "corpus should contain duplicated spans")
    assert(got == expected)
    // span mass is bounded: at least one gram, never more than the doc
    got.foreach { case (_, nTok, nSpans, dupToks, kept) =>
      assert(nSpans >= 1 && dupToks >= K && dupToks <= nTok && kept >= 0)
    }
  }
}
