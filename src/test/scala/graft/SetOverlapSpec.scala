package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SetOverlap.setOverlap

/** The codegen'd distinct-overlap kernel that replaced the
  * array_intersect + array_union pair in the exact-verify stages: must
  * agree with the builtin formulation on every input shape, including
  * duplicated elements on either side. */
class SetOverlapSpec extends SparkTestBase {
  import spark.implicits._

  private val cases = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq("a"), Seq("a")),
    (Seq("a", "b"), Seq("c", "d")),
    (Seq.empty[String], Seq("a")),
    (Seq.empty[String], Seq.empty[String]),
    // duplicates must count once (distinct-set semantics)
    (Seq("a", "a", "b"), Seq("a", "c", "a")),
    (Seq("x", "y", "x", "z"), Seq("z", "z", "y")),
    // asymmetric sizes exercise the small-side set build
    (Seq("k"), Seq("a", "b", "c", "d", "e", "k", "k")),
    (('a' to 'z').map(_.toString), Seq("m", "q", "zz")))

  test("set_overlap equals size(array_intersect) on distinct-set semantics") {
    val df = cases.toDF("a", "b")
      .select(
        setOverlap($"a", $"b").as("got"),
        size(array_intersect($"a", $"b")).as("want"))
    df.collect().zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch for $c")
    }
  }

  test("null array yields null; jaccard identity holds on distinct arrays") {
    val n = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b").select(setOverlap($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
    val jac = cases.filter(c => c._1.nonEmpty || c._2.nonEmpty)
    val got = jac.toDF("a", "b")
      .select($"a", $"b")
      .withColumn("ad", array_distinct($"a"))
      .withColumn("bd", array_distinct($"b"))
      .withColumn("ov", setOverlap($"ad", $"bd").cast("double"))
      .withColumn("viaOverlap", $"ov" / (size($"ad") + size($"bd") - $"ov"))
      .withColumn("viaBuiltin",
        size(array_intersect($"ad", $"bd")).cast("double") /
          size(array_union($"ad", $"bd")).cast("double"))
      .collect()
    got.foreach { r =>
      val a = r.getAs[Double]("viaOverlap"); val b = r.getAs[Double]("viaBuiltin")
      assert((a.isNaN && b.isNaN) || a == b, s"jaccard mismatch: $a vs $b")
    }
  }

  test("property: equals size(array_intersect) on generated arrays") {
    // Adversarial inputs the corpus never produces: empty strings,
    // unicode, heavy duplication, wildly asymmetric sizes. One Spark
    // round-trip evaluates both formulations on every case.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val el = Gen.oneOf("", "a", "b", "日本", "x y", "aa", "ζ", "tok", "a")
    val arr = Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, el))
    val pair = for { a <- arr; b <- arr } yield (a, b)
    val gen: Seq[(Seq[String], Seq[String])] = (0 until 300).map { i =>
      val (a, b) = pair(Gen.Parameters.default, Seed(i.toLong)).get
      (a.toSeq, b.toSeq)
    }
    val rows = gen.toDF("a", "b")
      .select(setOverlap($"a", $"b").as("got"),
        size(array_intersect($"a", $"b")).as("want"))
      .collect()
    rows.zip(gen).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch for $c")
    }
  }

  test("set_overlap is SQL-registered and codegen-callable") {
    org.apache.spark.sql.graft.GraftSqlFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT set_overlap(array('a','b','c'), array('b','x','c','c')) AS o")
      .head.getInt(0)
    assert(r == 2)
  }
}
