package graft.queries

import graft.SparkEntry

/** q_dedup_semantic against a sequential recompute of the SemDeDup
  * semantics: given the data-derived nearest-anchor cell assignment
  * (cells = semCellCount(n), the same integer formula the DuckDB oracle
  * computes from its own COUNT(*)), re-derive every within-cell pair
  * decision with BigInt arithmetic and the min-id keep policy
  * driver-side, then pin the policy's structural invariants. */
class DedupSemanticSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def verdicts(): Seq[(Long, Long, Long)] =
    SparkEntry.queries("q_dedup_semantic")(spark, Sf0001)
      .as[(Long, Long, Long)].collect().toSeq

  test("cell count derives from the corpus with clamped √n geometry") {
    // 500 sf0.001 vectors → smallest power of two whose square covers n.
    val n = graft.core.Tables.embeddings(spark, Sf0001).count()
    assert(Similarity.semCellCount(n) == 32)
    assert(Similarity.semCellCount(1) == 16)      // clamp floor
    assert(Similarity.semCellCount(256) == 16)    // boundary: 16² = 256
    assert(Similarity.semCellCount(257) == 32)
    assert(Similarity.semCellCount(200000) == 512)
    assert(Similarity.semCellCount(Long.MaxValue) == 4096) // clamp ceil
    assert(Similarity.embBandBits(n) == 6)        // test SFs keep 2⁶
    assert(Similarity.embBandBits(4096) == 6)     // boundary: 2⁶·64 = 4096
    assert(Similarity.embBandBits(4097) == 7)
    assert(Similarity.embBandBits(200000) == 12)  // 2¹²·64 = 262144 ≥ n
    assert(Similarity.embBandBits(Long.MaxValue) == 20) // clamp ceil
  }

  test("verdicts equal the sequential within-cell recompute") {
    val n = graft.core.Tables.embeddings(spark, Sf0001).count()
    val asg = Similarity
      .semAssignment(spark, Sf0001, Similarity.semCellCount(n))
      .as[(Long, Seq[Long], Long)].collect().toSeq
    val removed = scala.collection.mutable.Set.empty[Long]
    asg.groupBy(_._3).values.foreach { cell =>
      val vs = cell.sortBy(_._1)
      for {
        (ia, qa, _) <- vs
        (ib, qb, _) <- vs if ia < ib
      } {
        val dot = qa.zip(qb).map { case (x, y) => BigInt(x) * y }.sum
        val na = qa.map(x => BigInt(x) * x).sum
        val nb = qb.map(x => BigInt(x) * x).sum
        if (dot > 0 && dot * dot * 100 >= na * nb * 9) removed += ib
      }
    }
    val expected = asg
      .map { case (id, _, cell) =>
        (cell, id, if (removed(id)) 0L else 1L)
      }
      .sortBy(t => (t._1, t._2))
    assert(verdicts() == expected)
    assert(removed.nonEmpty, "testdata plants no semantic near-dups")
  }

  test("keep policy invariants: min id per cell survives, verdict total") {
    val got = verdicts()
    assert(got.map(_._3).toSet.subsetOf(Set(0L, 1L)))
    assert(got.count(_._3 == 1L) + got.count(_._3 == 0L) == got.size)
    got.groupBy(_._1).values.foreach { cell =>
      val minId = cell.map(_._2).min
      assert(cell.find(_._2 == minId).get._3 == 1L,
        s"min id $minId of a cell was removed — no smaller id exists")
    }
  }
}
