package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the exact 2^32 hi/lo int→double split used by
  * `q_agg_corr` and `q_trend_ols` (and documented in [[graft.queries]]
  * Scaladoc): for any |v| < 2^85,
  * `CAST(v div 2^32 AS DOUBLE) * 2^32 + CAST(v % 2^32 AS DOUBLE)`
  * evaluated by Spark on a DECIMAL(38,0) equals the correctly-rounded
  * double of v — including NEGATIVE v, where the proof leans on both
  * engines truncating integer div/% toward zero (sign-matching
  * remainder). The reference value is `BigInteger.doubleValue`, which
  * the JDK specifies as correctly rounded. */
class HiLoSplitSpec extends SparkTestBase {

  private def sparkHilo(vs: Seq[BigInt]): Seq[Double] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    vs.map(_.toString).toDF("s")
      .select(col("s").cast(DecimalType(38, 0)).as("v"))
      .selectExpr(
        "CAST(v div 4294967296 AS DOUBLE) * 4294967296.0D" +
          " + CAST(v % 4294967296 AS DOUBLE) AS d")
      .collect().map(_.getDouble(0)).toSeq
  }

  test("hi/lo split is the correctly-rounded double for |v| < 2^85") {
    val lim = BigInt(1) << 85
    val gen = Gen.oneOf(
      // magnitude-stratified: every binary size hits the rounding path
      Gen.choose(0, 84).flatMap(b =>
        Gen.choose(Long.MinValue, Long.MaxValue).map(r =>
          (BigInt(1) << b) + (BigInt(r).abs % (BigInt(1) << b.max(1))))),
      Gen.choose(Long.MinValue, Long.MaxValue).map(BigInt(_)),
      Gen.const(BigInt(0)))
    val cases = (0 until 400).flatMap { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).map { m =>
        val v = if (i % 2 == 0) m else -m
        if (v.abs < lim) Some(v) else None
      }.flatten
    } ++ Seq(lim - 1, -(lim - 1), (BigInt(1) << 53) + 1, -(BigInt(1) << 53) - 1)
    val got = sparkHilo(cases)
    cases.zip(got).foreach { case (v, d) =>
      assert(d == v.bigInteger.doubleValue,
        s"hi/lo split mismatch for v=$v: got $d, want ${v.bigInteger.doubleValue}")
    }
  }
}
