package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives ×N corpora from an existing sf dir WITHOUT touching the
  * read-only testdata: each table becomes the union of N key-shifted
  * copies, written as parquet under the output base — the input for the
  * scale-stress runs recorded in `SCALE_PROBE.md` (one measured decade of
  * scaling per heavy family, complementing the plan-shape argument).
  *
  * Copy construction keeps the workload's CHARACTER at ×N rather than
  * merely duplicating rows, so the per-family work genuinely scales:
  *
  *  - All integer keys shift by `copy · 10^8`: copies join only within
  *    themselves (FKs preserved), node/user/doc counts grow ×N — the
  *    graph/dedup problem gets N× more entities, not N× multiplicity on
  *    the same entities.
  *  - `documents.text` is alphabet-rotated per copy (a 1:1 letter
  *    substitution): token/shingle statistics are preserved inside each
  *    copy but vocabularies are disjoint ACROSS copies, so near-dup
  *    candidate structure replicates ×N instead of exploding
  *    quadratically (10 verbatim copies would make every doc a 10-way
  *    cross-copy duplicate — a different, artificially adversarial
  *    problem).
  *  - `embeddings.embedding` rotates its components by `copy` positions:
  *    norms and within-copy geometry are preserved, cross-copy cosine is
  *    that of unrelated vectors.
  *  - Timestamps are NOT shifted: ×N volume over the same calendar, the
  *    realistic shape of growing traffic (the windows/day-grid queries
  *    see N× heavier cells, not a longer history).
  *  - Tiny dims (region/nation) copy verbatim; unshifted nation FKs stay
  *    valid.
  *
  * Usage: runMain graft.ScaleProbe [srcSfDir] [outBase] [factors]
  *        (defaults: /root/testdata/sf0.1 /tmp/graft_scale 2,5,10)
  * Then time a family with the normal bench harness, one factor at a
  * time: SPARK_GRAFT_SF_DIR=<outBase>/x<N> SPARK_GRAFT_BENCH_ONLY=...
  * runMain graft.Bench (subset mode never overwrites BENCH_DETAIL.json).
  */
object ScaleProbe {

  private val KeyOffset = 100000000L

  /** Per-copy alphabet rotation for document text — a 1:1 substitution
    * over lowercase, UPPERCASE, and digits (r11 advisory: lowercase-only
    * rotation left digit/uppercase-bearing tokens identical across
    * copies, weakening the disjoint-vocabulary rationale). Tokens map
    * 1:1, so within-copy dup/shingle structure is exactly preserved;
    * punctuation/whitespace (token separators) stay fixed — the residual
    * cross-copy overlap is punctuation-only grams, noted in
    * SCALE_PROBE.md. */
  private def rotAlphabet(i: Int): (String, String) = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val up = lo.toUpperCase(java.util.Locale.ROOT)
    val dg = "0123456789"
    def rot(s: String, k: Int) = s.drop(k) + s.take(k)
    (lo + up + dg, rot(lo, i % 26) + rot(up, i % 26) + rot(dg, i % 10))
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outBase = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val factors = (if (args.length > 2) args(2) else "2,5,10")
      .split(",").map(_.trim.toInt).toSeq

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** One copy of `df` with `keys` shifted and an optional per-copy
      * column rewrite. */
    def copies(df: DataFrame, keys: Seq[String], n: Int)(
        tweak: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map { i =>
        val shifted = keys.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * KeyOffset)))
        tweak(shifted, i)
      }.reduce(_.unionAll(_))

    val plain: (DataFrame, Int) => DataFrame = (d, _) => d

    factors.foreach { n =>
      val out = s"$outBase/x$n"
      def write(name: String, df: DataFrame): Unit = {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scaleprobe] wrote x$n/$name")
      }
      write("lineitem", copies(table("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"), n)(plain))
      write("orders", copies(table("orders"),
        Seq("o_orderkey", "o_custkey"), n)(plain))
      write("customer", copies(table("customer"), Seq("c_custkey"), n)(plain))
      write("part", copies(table("part"), Seq("p_partkey"), n)(plain))
      write("supplier", copies(table("supplier"), Seq("s_suppkey"), n)(plain))
      write("events", copies(table("events"),
        Seq("event_id", "user_id"), n)(plain))
      write("documents", copies(table("documents"), Seq("doc_id"), n) {
        (d, i) =>
          val (from, to) = rotAlphabet(i)
          d.withColumn("text", translate(col("text"), from, to))
      })
      write("embeddings", copies(table("embeddings"), Seq("vec_id"), n) {
        (d, i) =>
          if (i == 0) d
          else d.withColumn("embedding", concat(
            slice(col("embedding"), i + 1, 100000),
            slice(col("embedding"), 1, i)))
      })
      Seq("region", "nation").foreach(t => write(t, table(t)))
    }
    spark.stop()
  }
}
