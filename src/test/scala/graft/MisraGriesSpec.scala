package graft

import org.apache.spark.sql.functions._

import graft.operators.MisraGries

/** Pins the Misra-Gries guarantee the catalog query's oracle silently
  * relies on: the summary is a SUPERSET of every item with frequency
  * > n/(capacity+1), under forced counter overflow (decrement path) and
  * arbitrary partitioning / merge orders — conditions the 31-token
  * corpus never triggers (its vocabulary fits inside the capacity). */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Skewed synthetic stream: token "hh0" 400×, "hh1" 250×, then 600
    * singletons — n = 1250. With capacity 4 the support threshold is
    * n/5 = 250, so {hh0} MUST survive (and hh1 sits exactly at the
    * boundary, legitimately either way); the 600 distinct singletons
    * force hundreds of decrement rounds. */
  private val stream: Seq[String] =
    Seq.fill(400)("hh0") ++ Seq.fill(250)("hh1") ++
      (0 until 600).map(i => s"rare$i")

  test("superset guarantee survives overflow at any partitioning") {
    for (parts <- Seq(1, 3, 17)) {
      // Deterministic but adversarial order: spread the heavy keys
      // through the stream instead of front-loading them.
      val shuffled = stream.zipWithIndex
        .sortBy { case (t, i) => (i * 2654435761L) % 1250 }
        .map(_._1)
      val got = shuffled.toDF("tok").repartition(parts)
        .agg(MisraGries.udaf(4)($"tok").as("mg"))
        .select(explode(map_keys($"mg")).as("k"))
        .collect().map(_.getString(0)).toSet
      assert(got.contains("hh0"),
        s"freq 400 > 250 = n/5 must survive capacity 4 (parts=$parts)")
      assert(got.size <= 4, s"summary exceeded capacity: $got")
    }
  }

  test("a uniform stream can legally empty the summary; topKeys is Nil") {
    // capacity c, then c+1 distinct singletons: the (c+1)-th triggers
    // decrement-all and every counter hits zero — the summary is EMPTY,
    // which is the correct "no heavy hitters" verdict (threshold
    // n/(c+1) = 1 and no key exceeds it). The r18 ×10 sweep hit this on
    // 1.5M near-singleton order keys and q_join_skew_hot crashed on the
    // empty hot list; the query now branches to a plain join. Pin both
    // the operator-level verdict and topKeys' empty return here so the
    // contract ("MAY RETURN FEWER THAN k, including NONE") stays load-
    // bearing.
    val mg = new MisraGries(2)
    val folded = Seq("a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(folded.isEmpty, s"expected empty summary, got $folded")
    // End-to-end through the Spark plan: one partition so the fold
    // order is the sequence above repeated — 3k distinct singletons
    // with capacity 2 end empty.
    val keys = (0 until 999).map(i => s"k$i")
    val got = graft.operators.MisraGries.topKeys(
      keys.toDF("tok").repartition(1), $"tok", k = 2, capacity = 2)
    assert(got.isEmpty, s"expected Nil from topKeys, got $got")
  }

  test("merge truncation keeps the additive error bound") {
    val mg = new MisraGries(2)
    val a = Map("x" -> 10L, "y" -> 4L)
    val b = Map("z" -> 6L, "w" -> 3L)
    val m = mg.merge(a, b)
    // Pointwise sum {x:10,y:4,z:6,w:3} truncated by the 3rd-largest (4):
    // {x:6, z:2} — y and w go non-positive and drop.
    assert(m === Map("x" -> 6L, "z" -> 2L))
  }

  test("two-pass catalog query returns the exact support set at sf0.001") {
    val got = SparkEntry.queries("q_text_heavyhitters")(spark, Sf0001)
      .select($"tok", $"cnt").collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.core.Tables.documents(spark, Sf0001)
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum($"cnt")).head.getLong(0)
    val want = exact.collect().map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * 41 > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "support threshold excluded the whole vocabulary")
  }
}
