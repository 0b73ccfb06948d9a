package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MinHashShingleSigs.minhashSigs

import graft.core.Tables
import graft.functions.TextFunctions._

/** The fused MinHash kernel must be BIT-IDENTICAL to the relational
  * posexplode → window-lead → hash-agg formulation it replaced — same
  * shingle text, same fastShingleHash, same 18 affine mins — so
  * materialized band artifacts built by either formulation interoperate. */
class MinHashSigsSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 3

  /** The replaced relational formulation, kept here as the reference. */
  private def relationalSigs = {
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val leads = (1 until K).map(i => lead($"tok", i).over(w).as(s"t$i"))
    val hashed = Tables.documents(spark, Sf0001)
      .select($"doc_id", posexplode(tokens($"text")))
      .toDF("doc_id", "pos", "tok")
      .select(($"doc_id" +: $"tok" +: leads): _*)
      .filter(col(s"t${K - 1}").isNotNull)
      .select($"doc_id",
        fastShingleHash(concat_ws(" ",
          $"tok" +: (1 until K).map(i => col(s"t$i")): _*)).as("h"))
    hashed.groupBy($"doc_id").agg(
      min(affineHash($"h", MinHashCoeffs.head._1, MinHashCoeffs.head._2))
        .as("sig0"),
      MinHashCoeffs.tail.zipWithIndex.map { case ((a, b), i) =>
        min(affineHash($"h", a, b)).as(s"sig${i + 1}")
      }: _*)
  }

  test("kernel sigs equal the relational formulation on the whole corpus") {
    val fused = Tables.documents(spark, Sf0001)
      .select($"doc_id", minhashSigs(tokens($"text"), K).as("sigs"))
      .filter($"sigs".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val relational = relationalSigs
      .collect().map(r => r.getLong(0) ->
        (0 until MinHashCoeffs.length).map(i => r.getLong(i + 1)).toVector)
      .toMap
    assert(fused.keySet == relational.keySet)
    assert(fused.size > 0)
    fused.foreach { case (id, sigs) =>
      assert(sigs == relational(id), s"signature mismatch for doc $id")
    }
  }

  test("documents with fewer than k tokens yield NULL (no band rows)") {
    val out = Seq("one two", "one two three").toDF("text")
      .select(minhashSigs(tokens($"text"), K).as("sigs"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0) && out(1).getSeq[Long](0).length ==
      MinHashCoeffs.length)
  }

  test("null tokens are skipped like concat_ws") {
    // concat_ws(" ", "a", null, "b", "c") over a window of 3 starting at
    // "a" joins the non-null values with single spaces: "a b".
    val withNull = Seq(1).toDF("x")
      .select(minhashSigs(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")), K)
        .as("sigs"))
      .head.getSeq[Long](0)
    // Shingles: ("a", null, "b") -> "a b"; (null, "b", "c") -> "b c".
    val expected = Seq(1).toDF("x")
      .select(array(fastShingleHash(lit("a b")),
        fastShingleHash(lit("b c"))).as("hs"))
      .select(array(MinHashCoeffs.map { case (a, b) =>
        array_min(transform(col("hs"), h => affineHash(h, a, b)))
      }: _*))
      .head.getSeq[Long](0)
    assert(withNull == expected)
  }
}
