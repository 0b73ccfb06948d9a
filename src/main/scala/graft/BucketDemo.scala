package graft

import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** Bucketed co-located join demo — the 100 TB fact-fact join strategy:
  * write `orders` and `lineitem` bucketed by the join key, then join
  * WITHOUT a shuffle (both sides pre-hashed into the same bucket layout,
  * so the join plan has zero Exchange operators).
  *
  * This is the design the engine assumes for repeated fact-fact joins at
  * scale: pay the bucketing once at ingest, join shuffle-free forever
  * after. The main asserts the no-Exchange property from the physical
  * plan and prints it.
  *
  * Usage: runMain graft.BucketDemo [sfDir] [warehouseDir]
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val warehouse =
      if (args.length > 1) args(1) else "target/bucket_demo/warehouse"
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File("target/bucket_demo"))

    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // One-time ingest cost: both facts bucketed by the join key.
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, sfDir).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    println(plan)
    val shuffles = "Exchange".r.findAllIn(plan).count(_ => true)
    // The join itself must be shuffle-free; the only allowed Exchange is
    // the tiny post-aggregation one for the final groupBy on status.
    val joinPart = plan.split("HashAggregate").last
    val joinShuffles = "Exchange".r.findAllIn(joinPart).count(_ => true)
    println(s"EXCHANGES_TOTAL=$shuffles EXCHANGES_UNDER_JOIN=$joinShuffles")
    joined.show(false)
    assert(joinShuffles == 0, "bucketed join should not shuffle")
    spark.stop()
  }
}
