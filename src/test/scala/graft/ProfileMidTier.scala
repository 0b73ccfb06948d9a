package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch profiler for the r16 mid-tier perf items (q_agg_pricing,
  * q_agg_corr, q_agg_incremental): times sub-plans under the exact bench
  * session config so the cost can be attributed (scan vs decimal agg vs
  * shuffle) before touching the queries. Not a Spec; excluded from the
  * test surface. */
object ProfileMidTier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def consume(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col): _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    }
    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 2).foreach(_ => consume(mk)) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); consume(mk); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROF $name%-28s median=${ts(2)}%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    }

    val li = graft.core.Tables.lineitem(spark, sfDir)

    time("scan_count") { li.groupBy().count() }
    time("scan_filter_count") {
      li.filter($"l_shipdate" <= to_timestamp(lit("1998-09-01"))).groupBy().count()
    }
    time("agg_double_sums") {
      li.filter($"l_shipdate" <= to_timestamp(lit("1998-09-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("a"), sum($"l_extendedprice").as("b"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("c"),
          count(lit(1)).as("d"))
    }
    time("agg_decimal_sums") {
      li.filter($"l_shipdate" <= to_timestamp(lit("1998-09-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(18, 6))).as("a"),
          sum($"l_extendedprice".cast(DecimalType(18, 6))).as("b"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 6))).as("c"),
          count(lit(1)).as("d"))
    }
    time("q_agg_pricing") { SparkEntry.queries("q_agg_pricing")(spark, sfDir) }
    time("q_agg_pricing_nosort") {
      // same agg without the trailing orderBy
      graft.core.Tables.lineitem(spark, sfDir)
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-01")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(DecimalType(18, 6))).cast("double").as("sq"))
    }
    time("q_agg_corr") { SparkEntry.queries("q_agg_corr")(spark, sfDir) }
    time("corr_moments_only") {
      val d38 = DecimalType(38, 0)
      def dd(c: org.apache.spark.sql.Column) = c.cast(d38)
      li.select($"l_suppkey",
          $"l_quantity".cast("long").as("xi"),
          ($"l_extendedprice".cast(DecimalType(18, 2)) * 100).cast("long").as("yi"))
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n"), sum($"xi").as("sx"), sum($"yi").as("sy"),
          sum(dd($"xi" * $"yi")).as("sxy"), sum(dd($"xi" * $"xi")).as("sxx"),
          sum(dd($"yi" * $"yi")).as("syy"))
    }
    time("corr_moments_long") {
      li.select($"l_suppkey",
          $"l_quantity".cast("long").as("xi"),
          ($"l_extendedprice".cast(DecimalType(18, 2)) * 100).cast("long").as("yi"))
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n"), sum($"xi").as("sx"), sum($"yi").as("sy"),
          sum($"xi" * $"yi").as("sxy"), sum($"xi" * $"xi").as("sxx"),
          sum($"yi" * $"yi").as("syy"))
    }
    time("q_agg_incremental") { SparkEntry.queries("q_agg_incremental")(spark, sfDir) }

    println("=== q_agg_pricing plan ===")
    println(SparkEntry.queries("q_agg_pricing")(spark, sfDir)
      .queryExecution.executedPlan.treeString.take(4000))
    spark.stop()
  }
}
