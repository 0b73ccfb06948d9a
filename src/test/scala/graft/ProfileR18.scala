package graft.queries

import graft.{GraftExtensions, SparkEntry}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 item-1 profiler: the q_search_rrf contradiction. The r17 warm-JVM
  * interleaved A/B measured the collect_list/posexplode rewrite at 0.87×
  * the r16 broadcast rank-count plan, but the committed ISOLATED artifact
  * (fresh child JVM, median of 3) worsened 14.6×→16.5× vs DuckDB. The
  * hypothesis to test: the new plan pays disproportionate COLD costs
  * (codegen/JIT of the collect/sort/posexplode stages) that a warm A/B
  * never sees and a median-of-3-in-fresh-JVM mostly does.
  *
  * Each invocation runs ONE component, cold, timing run1/run2/run3
  * separately (no warmup — run1 IS the measurement of the artifact's
  * regime). Drive each component in its own forked `sbt Test/runMain`
  * so every row starts from a pristine JVM. Not a Spec; excluded from
  * the test surface. */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val part = args.headOption.getOrElse("full")
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

    // The pieces of searchRrf, reconstructed against the same tables.
    def rankOf(list: DataFrame, id: String, score: String, rank: String) =
      list
        .agg(sort_array(collect_list(
          struct((-col(score)).as("ns"), col(id).as("id")))).as("xs"))
        .select(posexplode($"xs").as(Seq("i", "x")))
        .select($"x.id".as("doc_id"), ($"i" + 1).cast("long").as(rank))
    def bm25 = Indexing.bm25(spark, sfDir).select($"doc_id", $"bm25")
    def cosTop = {
      val vecs = graft.core.Tables.embeddings(spark, sfDir)
        .select($"vec_id", Similarity.quantize($"embedding").as("qv"))
      val q = broadcast(vecs.filter($"vec_id" === 0).select($"qv".as("q")))
      vecs.filter($"vec_id" =!= 0)
        .crossJoin(q)
        .select($"vec_id",
          org.apache.spark.sql.graft.DotProduct.dotLong($"qv", $"q").as("dot"))
        .orderBy($"dot".desc, $"vec_id")
        .limit(Mining.RrfListK)
    }

    val mk: () => DataFrame = part match {
      case "full"      => () => SparkEntry.queries("q_search_rrf")(spark, sfDir)
      case "bm25"      => () => bm25
      case "costop"    => () => cosTop
      case "rank_bm25" => () => rankOf(bm25, "doc_id", "bm25", "r_bm25")
      case "rank_cos"  => () => rankOf(cosTop, "vec_id", "dot", "r_cos")
      case other => sys.error(s"unknown part: $other")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); consume(mk()); val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFR18 $part%-12s run$i=$dt%.3f")
    }
    spark.stop()
  }
}
