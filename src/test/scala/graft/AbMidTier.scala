package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Drift-proof A/B for the r16 mid-tier fixes: times the PRE-r16
  * formulation and the shipped catalog query INTERLEAVED in one JVM
  * (A,B,A,B,… — box drift hits both arms equally), so the improvement
  * factor is box-independent in a way the round-over-round committed
  * artifacts (taken on a box that drifted 20–30% intra-day) are not.
  * Not a Spec; a measurement main like ProfileMidTier. */
object AbMidTier {
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

    // --- pricing: r15 formulation (plain Cast-based dsum) ---------------
    def dsumOld(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(18, 6))).cast("double")
    def pricingOld(): DataFrame = {
      val li = graft.core.Tables.lineitem(spark, sfDir)
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-01")))
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(dsumOld($"l_quantity").as("sum_qty"),
          dsumOld($"l_extendedprice").as("sum_base_price"),
          dsumOld($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("sum_disc_price"),
          (dsumOld($"l_quantity") / count($"l_quantity")).as("avg_qty"),
          (dsumOld($"l_extendedprice") / count($"l_extendedprice"))
            .as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }
    // --- corr: r15 formulation (single-stage dec38 moment sums) ---------
    def corrOld(): DataFrame = {
      val d38 = DecimalType(38, 0)
      def dd(c: org.apache.spark.sql.Column) = c.cast(d38)
      val li = graft.core.Tables.lineitem(spark, sfDir)
        .select($"l_suppkey", $"l_quantity".cast("long").as("xi"),
          ($"l_extendedprice".cast(DecimalType(18, 2)) * 100).cast("long")
            .as("yi"))
      val sup = graft.core.Tables.supplier(spark, sfDir)
        .select($"s_suppkey", $"s_nationkey")
      val nat = graft.core.Tables.nation(spark, sfDir)
        .select($"n_nationkey", $"n_name")
      li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n"), sum($"xi").as("sx"), sum($"yi").as("sy"),
          sum(dd($"xi" * $"yi")).as("sxy"), sum(dd($"xi" * $"xi")).as("sxx"),
          sum(dd($"yi" * $"yi")).as("syy"))
    }

    def q(name: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, sfDir)

    val pairs = Seq(
      ("pricing", () => pricingOld(), q("q_agg_pricing")),
      ("corr", () => corrOld(), q("q_agg_corr")))

    pairs.foreach { case (name, oldQ, newQ) =>
      (1 to 2).foreach { _ => consume(oldQ()); consume(newQ()) } // warm both
      val (oldTs, newTs) = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); consume(oldQ())
        val t1 = System.nanoTime(); consume(newQ())
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }.unzip
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"AB $name%-8s old=${med(oldTs)}%.3f new=${med(newTs)}%.3f " +
        f"ratio=${med(newTs) / med(oldTs)}%.2f")
    }
    spark.stop()
  }
}
