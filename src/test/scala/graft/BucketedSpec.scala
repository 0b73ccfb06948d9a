package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec


/** Pins the point of [[graft.queries.Bucketed]]: the bucketed layout
  * eliminates the per-query join shuffle that the identical query over
  * plain parquet pays. */
class BucketedSpec extends SparkTestBase {

  private lazy val planSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def smjShuffles(plan: SparkPlan): Seq[Int] =
    plan.collect { case j: SortMergeJoinExec =>
      j.collectLeaves() // force children traversal type-safety noop
      (j.left.collect { case _: ShuffleExchangeExec => 1 } ++
        j.right.collect { case _: ShuffleExchangeExec => 1 }).sum
    }

  test("bucketed join plans zero shuffles under the sort-merge join") {
    val df = SparkEntry.queries("q_join_bucketed")(planSession, Sf0001)
    val shuffles = smjShuffles(df.queryExecution.executedPlan)
    assert(shuffles.nonEmpty, "expected a sort-merge join in the plan")
    assert(shuffles.forall(_ == 0),
      s"bucketed join should need no exchange, saw $shuffles\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("the plain-parquet twin pays two shuffles for the same join") {
    import planSession.implicits._
    val o = graft.core.Tables.orders(planSession, Sf0001).hint("merge")
    val c = graft.core.Tables.customer(planSession, Sf0001).hint("merge")
    val df = o.join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").count()
    val shuffles = smjShuffles(df.queryExecution.executedPlan)
    assert(shuffles == Seq(2),
      s"plain join should shuffle both sides, saw $shuffles")
  }

  test("bucketed result matches the plain-parquet twin") {
    val bucketed = SparkEntry.queries("q_join_bucketed")(spark, Sf0001)
    import spark.implicits._
    val o = graft.core.Tables.orders(spark, Sf0001)
    val c = graft.core.Tables.customer(spark, Sf0001)
    val plain = o.join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(graft.queries.Catalog.dsum($"o_totalprice").as("revenue"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment")
    assert(bucketed.collect().toSeq == plain.collect().toSeq)
  }
}
