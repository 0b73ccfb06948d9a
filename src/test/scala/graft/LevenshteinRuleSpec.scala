package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** [[graft.plans.LevenshteinThresholdRule]]: the rewrite must fire on
  * every bounded-comparison shape, must NOT fire on value uses, and must
  * be exactly value-equivalent to the unbounded form — including nulls
  * and the strict/reversed comparisons. */
class LevenshteinRuleSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Seq[(Option[String], Option[String])] = Seq(
    (Some("kitten"), Some("sitting")),   // distance 3
    (Some("abc"), Some("abc")),          // 0
    (Some("abc"), Some("abd")),          // 1
    (Some(""), Some("abc")),             // 3 (pure length gap)
    (Some("abcdefgh"), Some("")),        // 8
    (Some("日本語"), Some("日本")),        // 1, unicode
    (None, Some("abc")),                 // null
    (Some("abc"), None),                 // null
    (None, None))                        // null

  // RDD-backed, NOT a LocalRelation: ConvertToLocalRelation would
  // otherwise constant-fold the whole projection away and these tests
  // would inspect (and execute) nothing.
  private def df =
    spark.sparkContext.parallelize(rows, 2).toDF("a", "b")

  private def thresholdLevs(plan: org.apache.spark.sql.DataFrame) =
    plan.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l.threshold })

  test("bounded comparisons rewrite to the banded threshold form") {
    for (cond <- Seq(
        levenshtein($"a", $"b") <= 3,
        levenshtein($"a", $"b") < 4,
        lit(3) >= levenshtein($"a", $"b"),
        lit(4) > levenshtein($"a", $"b"),
        levenshtein($"a", $"b").cast("long") <= 3L)) {
      val ts = thresholdLevs(df.filter(cond))
      assert(ts.nonEmpty && ts.forall(_.isDefined),
        s"unbounded levenshtein survived optimization for $cond")
    }
  }

  test("value uses are left alone") {
    val ts = thresholdLevs(df.select(levenshtein($"a", $"b").as("d")))
    assert(ts.nonEmpty && ts.forall(_.isEmpty))
  }

  test("rewritten filters select exactly the rows the spec does") {
    def lev(x: String, y: String): Int = {
      val dp = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to x.length; j <- 1 to y.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      dp(x.length)(y.length)
    }
    for (k <- 0 to 4) {
      val got = df.filter(levenshtein($"a", $"b") <= k)
        .as[(Option[String], Option[String])].collect().toSet
      val expected = rows.filter {
        case (Some(x), Some(y)) => lev(x, y) <= k
        case _                  => false
      }.toSet
      assert(got == expected, s"k=$k")
    }
  }

  test("boolean projection values survive the rewrite (incl. null)") {
    val got = df.select((levenshtein($"a", $"b") <= 3).as("f"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    val expected = Array(Some(true), Some(true), Some(true), Some(true),
      Some(false), Some(true), None, None, None)
    assert(got.toSeq == expected.toSeq)
  }
}
