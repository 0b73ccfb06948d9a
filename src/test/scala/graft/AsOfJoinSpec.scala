package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.graft.{AsOfJoin, AsOfJoinExec}

/** Semantics + plan shape of the native as-of join operator
  * (`plans/AsOfJoin.scala`). The full-catalog equivalence with the
  * union+window rewrite is pinned by the shared DuckDB oracle
  * (q_join_asof and q_join_asof_native run the identical SQL); these
  * tests pin the operator's corner semantics on hand-built data and the
  * physical plan the strategy produces. */
class AsOfJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val quotes = Seq(
    // (key, time, quote)
    ("a", ts(1), 1.0),
    ("a", ts(5), 2.0),
    ("b", ts(3), 30.0))
    .toDF("k", "qts", "quote")

  private lazy val trades = Seq(
    // (key, time, trade id)
    ("a", ts(0), 100L), // before any quote -> nulls
    ("a", ts(1), 101L), // exact match is inclusive -> 1.0
    ("a", ts(4), 102L), // between quotes -> latest prior = 1.0
    ("a", ts(9), 103L), // after the last -> 2.0
    ("b", ts(2), 104L), // b's quote is later -> nulls
    ("b", ts(7), 105L), // -> 30.0
    ("c", ts(5), 106L)) // key with no quotes at all -> nulls
    .toDF("k", "ts", "trade")

  private lazy val result = AsOfJoin
    .asofJoin(trades, quotes, Seq("k"), Seq("k"), "ts", "qts")
    .select($"trade", $"quote")
    .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
      else Some(r.getDouble(1)))).toMap

  test("backward inclusive semantics with left-outer null padding") {
    assert(result === Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(1.0), 103L -> Some(2.0),
      104L -> None, 105L -> Some(30.0), 106L -> None))
  }

  test("the plan contains the native exec and equi-join-grade exchanges") {
    val df = AsOfJoin.asofJoin(trades, quotes, Seq("k"), Seq("k"), "ts", "qts")
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e
    }.size === 1)
  }

  test("matches the union+window rewrite on the real events table") {
    val native = SparkEntry.queries("q_join_asof_native")(spark, Sf0001)
      .collect().toSeq
    val rewrite = SparkEntry.queries("q_join_asof")(spark, Sf0001)
      .collect().toSeq
    assert(native.nonEmpty)
    assert(native === rewrite)
  }

  test("forward direction picks the earliest quote at or after the trade") {
    val r = AsOfJoin
      .asofJoin(trades, quotes, Seq("k"), Seq("k"), "ts", "qts",
        forward = true)
      .select($"trade", $"quote").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some(x.getDouble(1)))).toMap
    assert(r === Map(
      100L -> Some(1.0), // before any quote -> first upcoming
      101L -> Some(1.0), // exact ts is inclusive
      102L -> Some(2.0), // between quotes -> next
      103L -> None,      // after the last quote
      104L -> Some(30.0), 105L -> None, 106L -> None))
  }

  test("null times never match, null keys use null-safe equality") {
    val q = Seq(
      (Some("a"), None, 9.0),          // null time: must never match
      (Some("a"), Some(ts(2)), 5.0),
      (None, Some(ts(1)), 7.0))        // null key: matches null-key lefts
      .toDF("k", "qts", "quote")
    val t = Seq(
      (Some("a"), Some(ts(1)), 200L),  // only the null-time quote precedes
      (Some("a"), Some(ts(3)), 201L),  // real quote at ts(2) wins over null
      (Some("a"), None, 202L),         // null left time: null pad
      (None, Some(ts(4)), 203L))       // null-safe key match -> 7.0
      .toDF("k", "ts", "trade")
    val r = AsOfJoin.asofJoin(t, q, Seq("k"), Seq("k"), "ts", "qts")
      .select($"trade", $"quote").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some(x.getDouble(1)))).toMap
    assert(r === Map(200L -> None, 201L -> Some(5.0), 202L -> None,
      203L -> Some(7.0)))
  }

  test("matches an in-memory reference on generated data (long times)") {
    // Property check: random keys/times with heavy collision pressure,
    // nulls on both sides, non-timestamp (long) time columns. Right
    // (key, time) pairs are unique so the tie rule never fires and the
    // reference is total.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.chooseNum(0, 7)
    val timeGen = Gen.frequency(9 -> Gen.chooseNum(0L, 30L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
        Seed(seed + i)).toSeq)
    val rRows = sample(Gen.zip(keyGen, timeGen), 120, 17L).distinct
      .groupBy { case (k, t) => (k, t) }.keys.toSeq
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    val lRows = sample(Gen.zip(keyGen, timeGen), 150, 99L)
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val right = rRows.toDF("k", "rt", "rv")
    val left = lRows.toDF("k", "lt", "lid")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), Seq("k"), "lt", "rt")
      .select($"lid", $"rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    val expected = lRows.map { case (k, lt, lid) =>
      lid -> (lt match {
        case None => None
        case Some(t) =>
          val m = rRows.filter(r => r._1 == k && r._2.exists(_ <= t))
          if (m.isEmpty) None else Some(m.maxBy(_._2.get)._3)
      })
    }.toMap
    assert(got.size === lRows.size)
    assert(got === expected)
  }

  test("self as-of join resolves (both sides from one source)") {
    // Each trade looks up the latest EARLIER trade of the same key.
    val prior = trades.select($"k".as("pk"), $"ts".as("pts"),
      $"trade".as("prior_trade"))
    // Strictly-earlier needs exclusive compare; emulate by shifting the
    // right times forward by nothing — inclusive is the contract, so the
    // same-row match (ts <= ts) resolves to itself: pin THAT.
    val r = AsOfJoin.asofJoin(trades, prior, Seq("k"), Seq("pk"), "ts", "pts")
      .filter($"trade" === 102L).select($"prior_trade").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(102L))
  }
}
