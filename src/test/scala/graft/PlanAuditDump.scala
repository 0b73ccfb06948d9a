package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Maintenance tool for [[PlanAuditSpec]]'s shuffle budgets: prints every
  * catalog query whose OBSERVED static-plan exchange count sits below its
  * audited budget (candidates for tightening) or above it (regressions the
  * spec will fail). Run with `sbt "Test/runMain graft.PlanAuditDump"`. */
object PlanAuditDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .appName("plan-audit-dump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val budgets = PlanAuditSpec.baseline
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val observed = df.queryExecution.executedPlan
        .collectWithSubqueries { case e: ShuffleExchangeExec => e }.size
      val b = budgets.getOrElse(name, -1)
      if (observed != b) println(s"AUDIT $name observed=$observed budget=$b")
    }
    println("AUDIT done")
    spark.stop()
  }
}
