package graft

import org.apache.spark.sql.functions._

import graft.functions.JobFunctions._

/** Property-style tests for the clean-stage parsing grammars (SURVEY.md
  * §5.2): batches of seeded-random well-formed salary/size strings
  * round-trip through the Column combinators to the values a straight
  * Scala model computes. (Plain seeded sampling — the scalatest/scalacheck
  * bridge artifact isn't in the offline cache.) */
class GrammarSpec extends SparkTestBase {
  import spark.implicits._

  private val currencies = Seq("£" -> 0.72, "$" -> 1.0, "€" -> 0.85,
    "CA$" -> 1.25, "COP" -> 3900.0, "NOK" -> 8.6)

  test("salary range round-trips for every currency (200 random cases)") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      val (sym, rate) = currencies(rnd.nextInt(currencies.size))
      val lo = 1000L + rnd.nextLong(900000L)
      val hi = lo + rnd.nextLong(900000L)
      (s"$sym$lo - $sym$hi (Employer Est.)",
        math.round(lo / rate), math.round(hi / rate))
    }
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), parseSalaryUsd(col("s")).as("p"))
      .select(col("s"), col("p.min_usd"), col("p.max_usd"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    cases.foreach { case (s, mn, mx) =>
      assert(got(s) == ((mn, mx)), s"for '$s'")
    }
  }

  test("per-hour salaries annualize by 8h x 261d (50 random cases)") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 50).map(_ => 10L + rnd.nextLong(500L)).distinct
    val got = cases.map(h => s"$$$h Per Hour").toDF("s")
      .select(parseSalaryUsd(col("s")).as("p"))
      .select(col("p.min_usd"), col("p.max_usd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cases.zip(got).foreach { case (h, (mn, mx)) =>
      assert(mn == h * 8 * 261 && mx == h * 8 * 261, s"for $h/hr")
    }
  }

  test("commas and nbsp are stripped") {
    val r = Seq("COP 4,000,000 - 6,000,000").toDF("s")
      .select(parseSalaryUsd(col("s")).as("p"))
      .select(col("p.min_usd"), col("p.max_usd")).head()
    assert(r.getLong(0) == math.round(4000000 / 3900.0))
    assert(r.getLong(1) == math.round(6000000 / 3900.0))
  }

  test("digit-free salary sentinels degrade to null bounds (not a crash)") {
    // Real scraper sentinels: no digits survive the strip, so the bound
    // string is '' — try_cast must yield null under ANSI Spark 4 instead
    // of failing the whole job (reference cleaner's except-branch).
    val r = Seq("N/A", "Employer Provided Salary", "Unknown").toDF("s")
      .select(parseSalaryUsd(col("s")).as("p"))
      .select(col("p.min_usd"), col("p.max_usd"))
      .collect()
    assert(r.forall(row => row.isNullAt(0) && row.isNullAt(1)))
  }

  test("null salary yields null bounds") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(parseSalaryUsd(col("s")).as("p"))
      .select(col("p.min_usd"), col("p.max_usd")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("company size range and plus forms round-trip (100 random cases)") {
    val rnd = new scala.util.Random(11)
    val cases = (1 to 100).map { _ =>
      val lo = 1 + rnd.nextInt(5000); val hi = lo + rnd.nextInt(5000)
      (s"$lo to $hi Employees", lo, hi)
    }
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), parseCompanySize(col("s")).as("p"))
      .select(col("s"), col("p.size_min"), col("p.size_max"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    cases.foreach { case (s, lo, hi) => assert(got(s) == ((lo, hi))) }
    val plus = Seq("10000+ Employees").toDF("s")
      .select(parseCompanySize(col("s")).as("p"))
      .select(col("p.size_min"), col("p.size_max")).head()
    assert(plus.getInt(0) == 10000 && plus.getInt(1) == 10000)
  }

  test("rating suffix extraction and strip (P1/P2)") {
    val r = Seq("acme corp4.5★", "no rating ltd").toDF("name")
      .select(col("name"), extractRating(col("name")).as("rating"),
        stripRating(col("name")).as("base"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2)))
    assert(r.contains(("acme corp4.5★", "4.5", "acme corp")))
    assert(r.contains(("no rating ltd", null, "no rating ltd")))
  }
}
