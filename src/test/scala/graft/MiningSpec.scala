package graft

import org.apache.spark.sql.Row

/** Semantics checks for the [[graft.queries.Mining]] group — each query's
  * result is re-derived by an independent brute-force formulation at
  * sf0.001 (the DuckDB oracle is the cross-engine authority; these pin
  * the Scala-side semantics without leaving sbt). */
class MiningSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("skyline equals the brute-force dominance frontier") {
    val got = q("q_skyline").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val parts = spark.read.parquet(s"$Sf0001/part.parquet")
      .selectExpr("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = parts.filter { case (_, sz, pr) =>
      !parts.exists { case (_, osz, opr) =>
        osz >= sz && opr <= pr && (osz > sz || opr < pr)
      }
    }.sortBy { case (k, sz, _) => (-sz, k) }
    assert(got.toSeq == brute.toSeq)
  }

  test("association rules carry exact recomputed counts and fixed-point scores") {
    val rules = q("q_assoc_rules").collect()
    assert(rules.nonEmpty)
    val baskets = spark.read.parquet(s"$Sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = baskets.map(_._1).distinct.size.toLong
    val itemCnt = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val byOrder = baskets.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    rules.foreach { r =>
      val (ant, cons, cAb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ant != cons)
      val expected = byOrder.count(b => b(ant) && b(cons)).toLong
      assert(cAb == expected, s"c_ab($ant,$cons)")
      assert(r.getLong(3) == 100000L * cAb / itemCnt(ant), "conf_fp")
      assert(r.getLong(4) ==
        1000000L * cAb * nBaskets / (itemCnt(ant) * itemCnt(cons)), "lift_fp")
    }
    // Directed output: the mirrored rule shares lift but not confidence.
    val keys = rules.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.size == rules.length)
  }

  test("group split is leakage-safe: every source lands in exactly one split") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val perSource = q("q_split_group").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // The per-split distinct-source counts must PARTITION the source
    // universe (sum equals the global distinct count — no source counted
    // in two splits, none dropped).
    val totalSources = docs.selectExpr("count(distinct source)").head.getLong(0)
    assert(perSource.values.sum == totalSources)
    val totalDocs = q("q_split_group").collect().map(_.getLong(1)).sum
    assert(totalDocs == docs.count())
  }

  test("corr aggregates cover all lineitem rows and stay in [-1, 1]") {
    val rows = q("q_agg_corr").collect()
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$Sf0001/lineitem.parquet").count())
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(!c.isNaN && math.abs(c) <= 1.0, s"corr ${r.getString(0)} = $c")
    }
  }

  test("rrf fusion scores are consistent with their member ranks") {
    val rows = q("q_search_rrf").collect()
    assert(rows.nonEmpty)
    def contrib(r: Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else 1000000L / (60L + r.getLong(i))
    rows.foreach { r =>
      assert(!(r.isNullAt(1) && r.isNullAt(2)), "doc in neither list")
      Seq(1, 2).filterNot(r.isNullAt).foreach { i =>
        assert(r.getLong(i) >= 1 && r.getLong(i) <= 25)
      }
      assert(r.getLong(3) == contrib(r, 1) + contrib(r, 2), "rrf_fp")
    }
    // Docs on both lists must outrank same-rank single-list docs: spot
    // the ordering is by the fused score, descending.
    val scores = rows.map(_.getLong(3))
    assert(scores.sameElements(scores.sortBy(-_)))
  }
}
