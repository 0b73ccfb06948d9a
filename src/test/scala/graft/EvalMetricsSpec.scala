package graft

import graft.core.Tables

/** The r12 ranking-metric trio (q_eval_auc / q_eval_calibration /
  * q_eval_ndcg) against from-scratch sequential recomputes: margin and
  * gold label re-derived driver-side from the raw documents (the
  * documented model formula, whitespace tokens with trailing-empty
  * semantics), AUC by brute-force enumeration of every (positive,
  * negative) pair — the O(n²) specification the distributed query
  * deliberately avoids — and NDCG from first principles over the
  * separately-gated BM25 list. */
class EvalMetricsSpec extends SparkTestBase {

  /** (margin, gold) per doc, sequentially, from the raw table. */
  private def labels(): Seq[(Long, Long, Boolean)] = {
    import spark.implicits._
    val stop = Set("a", "the")
    Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)].collect().toSeq
      .map { case (id, text, nChars) =>
        // Spark split() keeps trailing empties: String.split(re, -1).
        val toks = text.toLowerCase.split(" ", -1).toSeq
        val nTok = toks.size.toLong
        val nStop = toks.count(stop).toLong
        val nDist = toks.distinct.size.toLong
        val margin = 80L + 3L * nTok - 40L * nStop + 8L * nDist - nChars
        val gold = nTok >= 20 && nTok <= 1000 &&
          nStop.toDouble / nTok.toDouble < 0.2
        (id, margin, gold)
      }
  }

  test("AUC equals the brute-force pair enumeration") {
    import spark.implicits._
    val Seq((nPos, nNeg, pairs2, aucFp)) =
      SparkEntry.queries("q_eval_auc")(spark, Sf0001)
        .as[(Long, Long, Long, Long)].collect().toSeq
    val lbl = labels()
    val pos = lbl.filter(_._3).map(_._2)
    val neg = lbl.filterNot(_._3).map(_._2)
    assert(nPos == pos.size && nNeg == neg.size)
    val expected2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(pairs2 == expected2)
    assert(aucFp == expected2 * 1000000L / (2L * nPos * nNeg))
    assert(aucFp >= 0 && aucFp <= 1000000L)
  }

  test("calibration bins equal the sequential recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("q_eval_calibration")(spark, Sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expected = labels()
      .groupBy { case (_, m, _) => math.floor(m / 100.0).toLong }
      .toSeq.map { case (bin, docs) =>
        val n = docs.size.toLong
        val nGold = docs.count(_._3).toLong
        val sumM = docs.map(_._2).sum
        (bin, n, nGold, nGold * 1000000L / n, sumM * 1000000L / n)
      }.sortBy(_._1)
    assert(got.nonEmpty && got == expected)
    // the gate's own divisions truncate toward zero like both engines
    got.foreach { case (_, n, nGold, rate, _) =>
      assert(rate == nGold * 1000000L / n && rate >= 0 && rate <= 1000000L)
    }
  }

  test("NDCG@k equals first-principles DCG over the gated BM25 list") {
    import spark.implicits._
    val got = SparkEntry.queries("q_eval_ndcg")(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (1L to 10L))

    // positions from the independently hash-gated BM25 query (top-K=25
    // candidate list; only the first 10 positions can contribute to
    // NDCG@k for k ≤ 10)
    val ranked = SparkEntry.queries("q_text_bm25")(spark, Sf0001)
      .select($"doc_id").as[Long].collect().toSeq.take(10)
    assert(ranked.size == 10)
    val w = (1 to 10)
      .map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    def rel(m: Long): Long =
      if (m > 100) 3L else if (m > 0) 2L else if (m > -100) 1L else 0L
    val relOf = labels().map { case (id, m, _) => id -> rel(m) }.toMap
    val gains = ranked.zipWithIndex.map { case (id, i) => relOf(id) * w(i) }
    val ideal = relOf.values.toSeq.sortBy(-_).take(10)
      .zipWithIndex.map { case (r, i) => r * w(i) }
    got.foreach { case (k, dcg, idcg, ndcg) =>
      val ki = k.toInt
      assert(dcg == gains.take(ki).sum)
      assert(idcg == ideal.take(ki).sum)
      assert(ndcg == dcg * 1000000L / idcg)
      assert(ndcg >= 0 && ndcg <= 1000000L)
    }
    // IDCG is cumulative in k by construction
    assert(got.map(_._3) == got.map(_._3).sorted)
  }
}
