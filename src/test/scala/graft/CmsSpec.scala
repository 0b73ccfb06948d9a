package graft

import org.apache.spark.sql.functions._

/** Properties of the relational count-min sketch behind q_sketch_cms that
  * the oracle gate cannot see: counter-table MERGEABILITY (union + sum of
  * two batch sketches equals the from-scratch sketch — what makes the
  * relation a persistable incremental artifact) and the one-sided error
  * actually being exercised at the test width (some token must
  * overcount, or the width is too wide for the test to mean anything). */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val CmsWidth = 64L
  private val CmsMults = Seq(31L, 37L, 41L)

  private def buckets(tok: org.apache.spark.sql.Column) = array(
    CmsMults.map(m =>
      pmod(graft.functions.TextFunctions.charHash(tok, m), lit(CmsWidth))): _*)

  private def sketchOf(df: org.apache.spark.sql.DataFrame) = df
    .select(posexplode(buckets($"tok")).as(Seq("j", "bucket")))
    .groupBy($"j", $"bucket").agg(count(lit(1)).as("cnt"))

  private lazy val toks = graft.core.Tables.documents(spark, Sf0001)
    .select($"doc_id", explode(graft.functions.TextFunctions.tokens($"text"))
      .as("tok"))

  test("merging two batch sketches equals the from-scratch sketch") {
    val full = sketchOf(toks.select($"tok"))
    val merged = sketchOf(toks.filter($"doc_id" % 2 === 0).select($"tok"))
      .unionByName(sketchOf(toks.filter($"doc_id" % 2 =!= 0).select($"tok")))
      .groupBy($"j", $"bucket").agg(sum($"cnt").as("cnt"))
    val diff = full.unionByName(merged)
      .groupBy($"j", $"bucket").agg(sum($"cnt" * 0 + 1).as("sides"),
        count(lit(1)).as("n"), min($"cnt").as("a"), max($"cnt").as("b"))
      .filter($"a" =!= $"b" || $"n" =!= 2)
    assert(diff.count() === 0L)
  }

  test("the catalog query sees real collisions and never undercounts") {
    val r = SparkEntry.queries("q_sketch_cms")(spark, Sf0001)
      .select($"true_cnt", $"est_cnt", $"ok_over").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getInt(2) == 1), "CMS undercounted a token")
    assert(r.exists(x => x.getLong(1) > x.getLong(0)),
      "no collisions at this width - the error property is untested")
  }
}
