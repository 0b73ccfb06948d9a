package graft.queries

import graft.SparkEntry
import graft.core.Tables

/** q_text_funnel against a sequential recompute of the cleaning cascade
  * (flags re-derived driver-side from raw text with the documented
  * whitespace-token semantics, survivor-first dedup included) plus the
  * funnel's structural invariants. */
class FunnelSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("funnel equals the sequential recompute") {
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val stop = Set("a", "the")
    case class F(id: Long, text: String, nTok: Long, s2: Boolean,
        s3: Boolean, s4: Boolean, s5: Boolean)
    val fs = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val nTok = toks.size.toLong
      val nStop = toks.count(stop).toLong
      val nDist = toks.distinct.size.toLong
      val s2 = nTok >= 12
      val s3 = s2 && nTok >= 20 && nTok <= 1000
      val s4 = s3 && nStop * 20 < nTok * 3
      val s5 = s4 && nDist * 10 >= nTok * 3
      F(id, text, nTok, s2, s3, s4, s5)
    }
    // survivor-first first-occurrence per normalized text
    val firstId = fs.groupBy(f => f.text.toLowerCase.trim).values.map {
      g => g.sortBy(f => (!f.s5, f.id)).head.id
    }.toSet
    def row(stage: Int, rule: String, p: F => Boolean) = {
      val hit = fs.filter(p)
      (stage, rule, hit.size.toLong, hit.map(_.nTok).sum,
        hit.size.toLong * 1000000L / fs.size)
    }
    val expected = Seq(
      row(1, "all", _ => true),
      row(2, "min_tokens", _.s2),
      row(3, "length_band", _.s3),
      row(4, "stopword_ratio", _.s4),
      row(5, "diversity", _.s5),
      row(6, "exact_dedup", f => f.s5 && firstId(f.id)))
    val got = SparkEntry.queries("q_text_funnel")(spark, Sf0001)
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("funnel invariants: monotone attrition, share bounds") {
    val got = SparkEntry.queries("q_text_funnel")(spark, Sf0001)
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1 to 6))
    // cumulative stages can only lose docs and tokens
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
    assert(got.head._5 == 1000000L)
    got.foreach { case (_, _, d, t, sh) =>
      assert(d >= 0 && t >= 0 && sh >= 0 && sh <= 1000000L)
    }
    // the cascade discriminates: strictly fewer docs by the last gate
    assert(got.last._3 < got.head._3)
  }
}
