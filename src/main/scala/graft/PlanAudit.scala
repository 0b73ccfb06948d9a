package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints formatted physical plans for representative catalog queries —
  * the .explain audit loop: verify predicate pushdown reaches the parquet
  * scan, dims broadcast, codegen spans stay wide, and no plan hides a
  * global shuffle.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  *        runMain graft.PlanAudit --counts [sfDir]   # dump per-query
  *        shuffle-exchange counts as Scala map entries for PlanAuditSpec's
  *        audited baseline.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val countsMode = args.headOption.contains("--counts")
    val rest = if (countsMode) args.drop(1) else args
    val sfDir =
      if (rest.nonEmpty) rest(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (rest.length > 1) rest.drop(1).toSeq
      else if (countsMode) SparkEntry.queries.keys.toSeq.sorted
      else Seq("q_agg_filter_revenue", "q_join_star", "q_text_top_skills",
        "q_dedup_jaccard", "q_vector_topk", "q_events_session")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PLAN_AUDIT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (countsMode) {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      // AQE off so executedPlan is the fully-prepared static plan
      // (EnsureRequirements has inserted the exchanges) instead of an
      // opaque AdaptiveSparkPlanExec leaf.
      val audit = spark.newSession()
      audit.conf.set("spark.sql.adaptive.enabled", "false")
      names.foreach { n =>
        val plan =
          SparkEntry.queries(n)(audit, sfDir).queryExecution.executedPlan
        val c = plan.collectWithSubqueries {
          case e: ShuffleExchangeExec => e
        }.size
        println(s"""    "$n" -> $c,""")
      }
    } else {
      names.foreach { n =>
        println(s"\n================ $n ================")
        println(SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("formatted")))
      }
    }
    spark.stop()
  }
}
