package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.JaroWinkler

/** Pins the [[org.apache.spark.sql.graft.JaroWinkler]] kernel to the
  * DuckDB `jaro_winkler_similarity` semantics the Linkage oracle depends
  * on, and the binned interval join to its naive theta-join spec on
  * adversarial bin-boundary data.
  */
class LinkageSpec extends SparkTestBase {

  // Reference values from DuckDB 1.x jaro_winkler_similarity (the same
  // engine the driver's oracle runs) — including its jw("","") = 0
  // convention and the strict `sim > 0.7` boost gate where 2.1/3
  // evaluates to 0.700000…01 in doubles and therefore IS boosted.
  private val vectors = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("", "a", 0.0),
    ("", "", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0),
    ("abc", "xyz", 0.0),
    ("x", "xxxxxxxxxx", 0.7300000000000001),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("ab", "abcdefghij", 0.7866666666666667),
    // >64-byte inputs exercise the array kernel (not the mask kernel)
    ("a" * 70, "a" * 35 + "b" * 35, 0.6666666666666666),
    ("x" * 65, "x" * 65, 1.0),
    // non-ASCII: DuckDB scores UTF-8 BYTE sequences (|café| = 5 bytes) —
    // these pin the declared byte-level semantics
    ("café", "cafe", 0.8483333333333334),
    ("müller", "mueller", 0.8285714285714287))

  test("kernel matches the DuckDB reference vectors bit-for-bit") {
    for ((a, b, expect) <- vectors) {
      assert(JaroWinkler.similarity(a, b) == expect, s"jw($a, $b)")
      assert(JaroWinkler.similarity(b, a) == expect, s"jw($b, $a) symmetric")
    }
  }

  test("codegen and interpreted paths agree (and nulls propagate)") {
    import spark.implicits._
    val df = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val expr = JaroWinkler.jaroWinkler($"a", $"b").as("jw")
    val codegen = df.select(expr).as[Double].collect().toSeq
    val interpreted = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.codegen.wholeStage", "false")
      s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      import s2.implicits._
      vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
        .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw"))
        .as[Double].collect().toSeq
    }
    assert(codegen == vectors.map(_._3))
    assert(interpreted == codegen)
    val withNull = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b")).collect()
    assert(withNull.head.isNullAt(0), "null input must yield null")
  }

  test("binned interval join equals the naive theta join on bin boundaries") {
    import spark.implicits._
    val W = graft.queries.Relational2.IntervalBinDays.toLong
    // Adversarial intervals: exactly on bin edges, spanning a full bin,
    // zero-length, straddling, and disjoint-but-same-bin.
    val a = Seq(
      (1L, 0L, W - 1),       // fills bin 0 exactly
      (2L, W, W),            // zero-length on a bin edge
      (3L, W - 1, W),        // straddles the 0/1 edge
      (4L, 3 * W, 3 * W + 5) // isolated
    ).toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, W - 1, W - 1),    // touches a1 and a3 at the edge
      (11L, W, W + 2),        // touches a2, a3
      (12L, 2 * W, 2 * W + 1),// same bin as nothing overlapping
      (13L, 3 * W + 5, 4 * W) // touches a4 at its last day
    ).toDF("b_id", "b_start", "b_end")
    def binned(df: org.apache.spark.sql.DataFrame, st: String, en: String) =
      df.withColumn("bin", explode(sequence(floor(col(st) / W), floor(col(en) / W))))
    val viaBins = binned(a, "a_start", "a_end")
      .join(binned(b, "b_start", "b_end"), "bin")
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end" &&
        $"bin" === greatest(floor($"a_start" / W), floor($"b_start" / W)))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val naive = a.join(b, $"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(naive === Set((1L, 10L), (3L, 10L), (2L, 11L), (3L, 11L), (4L, 13L)))
    assert(viaBins === naive)
    // and exactly once each — no duplicate pairs from multi-bin overlap
    val withDups = binned(a, "a_start", "a_end")
      .join(binned(b, "b_start", "b_end"), "bin")
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end" &&
        $"bin" === greatest(floor($"a_start" / W), floor($"b_start" / W)))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(withDups.size == withDups.toSet.size)
  }

  test("blocked linkage recovers the corrupted record as the top match") {
    val out = SparkEntry.queries("q_link_jarowinkler")(spark, Sf0001)
      .collect()
    assert(out.nonEmpty)
    val top = out.filter(_.getInt(1) == 1)
    // rank-1 rows: the overwhelming majority must re-find their source
    // row (exact_hit) — the corruption only drops one character.
    val hitRate = top.count(_.getBoolean(4)).toDouble / top.length
    assert(hitRate >= 0.8, s"rank-1 exact-hit rate $hitRate")
    // the test SFs never hit the per-block cap: overflow must be 0
    // everywhere (committed hashes unchanged by the budget machinery)
    assert(out.forall(_.getLong(5) == 0L), "unexpected block overflow")
  }

  test("per-block pair budget caps an adversarial hot block, loudly") {
    import spark.implicits._
    val cap = 8
    // One hot block ("AAAAZ"): 50 comparison rows, far over the cap;
    // one cold block with 2 rows. Registry rows probe both.
    val parts = ((1L to 50L).map(i => (i, s"AAAA_part_$i Z", "AAAAZ")) ++
      Seq((100L, "BBBB_part_x Z", "BBBBZ"), (101L, "BBBB_part_y Z", "BBBBZ")))
      .toDF("p_partkey", "nm", "blk")
    val registry = Seq(
      (1000L, "AAAA_dirty_1 Z", "AAAAZ"),
      (1001L, "AAAA_dirty_2 Z", "AAAAZ"),
      (2000L, "BBBB_dirty Z", "BBBBZ"))
      .toDF("rid", "dirty", "blk")
    val out = graft.queries.Linkage.linkCore(registry, parts, cap)
      .collect()
    val hot = out.filter(_.getLong(0) < 2000L)
    val cold = out.filter(_.getLong(0) == 2000L)
    // truncation is visible: every hot-block row reports the 42 dropped
    // comparison rows; the cold block reports 0
    assert(hot.nonEmpty && hot.forall(_.getLong(5) == 50L - cap))
    assert(cold.nonEmpty && cold.forall(_.getLong(5) == 0L))
    // and enforced: the surviving comparison set is the cap-smallest
    // keys, so no match_key beyond the cap'th smallest appears
    assert(hot.forall(_.getLong(2) <= cap.toLong))
    // the budget bounds pair work per registry row at the cap
    val perRid = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perRid.values.forall(_ <= cap))
  }
}
