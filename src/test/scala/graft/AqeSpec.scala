package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.PartialReducerPartitionSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** Executed-plan pins for Adaptive Query Execution — the runtime
  * re-planning this engine leans on at scale (SURVEY §4.2): static plans
  * over-provision shuffle partitions for the worst case, and AQE is what
  * makes that safe (it coalesces tiny reducers and splits skewed ones at
  * runtime). PlanAuditSpec audits the STATIC plans with AQE off; this
  * suite runs queries to completion with AQE on and asserts the runtime
  * behaviors actually fired — a conf regression that silently disables
  * either fails here, not in a 100 TB incident. */
class AqeSpec extends SparkTestBase {

  /** Isolated session: AQE on with thresholds scaled so sf0.001 data
    * exercises the coalesce and skew paths. */
  private lazy val aqe = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    // force sort-merge joins: the skew-split path is an SMJ/SHJ feature
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  /** Every node of the FINAL adaptive plan, descending into materialized
    * query stages (plain `collect` stops at stage boundaries — the join
    * stages this suite asserts on live inside them). */
  private def deepNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect() // AQE finalizes only on execution
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case r: ReusedExchangeExec    => walk(r.child)
        case _                        => Seq.empty
      }
      p +: (here ++ p.children.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
  }

  test("AQE coalesces the 32 over-provisioned shuffle partitions") {
    import aqe.implicits._
    val reads = deepNodes(
      graft.core.Tables.lineitem(aqe, Sf0001)
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n")))
      .collect { case r: AQEShuffleReadExec => r }
    assert(reads.nonEmpty, "no AQEShuffleReadExec in the final plan")
    assert(reads.exists(_.partitionSpecs.length < 32),
      s"no coalescing: ${reads.map(_.partitionSpecs.length).mkString(",")}")
  }

  test("AQE splits the skewed join partition at runtime") {
    import aqe.implicits._
    // Manufacture skew: 200k rows over TWO join keys against a small
    // keyed dim — each hot reducer carries ~100k rows, far past the
    // scaled threshold, so OptimizeSkewedJoin must split them into
    // PartialReducerPartitionSpec slices. Two traps this test documents:
    //  1. the consumer must NOT require the join's hash partitioning (a
    //     grouped agg on k would: the split breaks the partitioning
    //     guarantee and the rule refuses to introduce an extra
    //     exchange) — so the consumer is a global fold;
    //  2. a skewed reducer can only be split at MAP-TASK boundaries
    //     (PartialReducerPartitionSpec is a (reducer, startMap, endMap)
    //     slice) — a single-mapper shuffle (e.g. one small parquet
    //     file) is structurally unsplittable, hence the 16-partition
    //     source. At 100 TB the mapper count is never the limit; on a
    //     laptop-sized test it silently is.
    val hot = aqe.range(0, 200000, 1, 16)
      .select(($"id" % 2).as("k"), ($"id" * 3).as("v"))
    val dim = aqe.range(0, 8).select($"id".as("k"), ($"id" * 10).as("w"))
    val df = hot.join(dim, "k").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val skewed = deepNodes(df).collect {
      case r: AQEShuffleReadExec if r.partitionSpecs.exists(
            _.isInstanceOf[PartialReducerPartitionSpec]) => r
    }
    assert(skewed.nonEmpty,
      "no PartialReducerPartitionSpec (skew split) in the final plan")
  }
}
