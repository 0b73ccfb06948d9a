package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomBucketProbe
import org.apache.spark.util.sketch.BloomFilter

/** Direct contract tests for the broadcast-carried partitioned-bloom
  * probe (GraphSpec exercises it end-to-end inside the triangle plan;
  * this pins the expression itself).
  *
  *  - NO FALSE NEGATIVES: every value inserted into its pmod-selected
  *    bucket at build time must probe true — a plan is allowed to use
  *    the expression strictly as a prune, so a miss here is a wrong
  *    query result, not a performance detail.
  *  - Bucket selection must be the SAME pmod the build side groups by,
  *    including negative hashes (pmod semantics, not Scala %).
  *  - Codegen and interpreted eval must agree.
  *  - An empty bucket's bloom probes false (exactness of the empty
  *    case the triangle plan relies on).
  */
class BloomBucketProbeSpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  /** Build per-bucket blooms exactly as a build side would: group by
    * pmod(h, n), insert each bucket's values into its own filter. */
  private def buildBlooms(values: Seq[Long]): Array[BloomFilter] = {
    val buckets = values.groupBy(h => (((h % NBuckets) + NBuckets) % NBuckets).toInt)
    (0 until NBuckets).map { b =>
      val vs = buckets.getOrElse(b, Seq.empty)
      val bf = BloomFilter.create(math.max(1L, vs.size.toLong), 0.01)
      vs.foreach(bf.putLong)
      bf
    }.toArray
  }

  // Mixed-sign hashes: xxhash64 output is uniform over the full Long
  // range, so negative values are the common case, not an edge case.
  private val inserted: Seq[Long] =
    (1 to 200).map(i => i * 2654435761L * (if (i % 2 == 0) -1 else 1))
  private val absent: Seq[Long] = (1 to 200).map(i => i * 40503L + 7)

  test("no false negatives on any execution path") {
    val blooms = spark.sparkContext.broadcast(buildBlooms(inserted))
    def run(s: org.apache.spark.sql.SparkSession): Long = {
      import s.implicits._
      inserted.toDF("h")
        .where(BloomBucketProbe.probe(col("h"), blooms))
        .count()
    }
    assert(run(spark) == inserted.size.toLong)
    val codegenOff = spark.newSession()
    codegenOff.conf.set("spark.sql.codegen.wholeStage", "false")
    codegenOff.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    assert(run(codegenOff) == inserted.size.toLong)
  }

  test("probe consults the pmod-selected bucket, not any other") {
    // Insert each value ONLY into its own bucket; probing a value whose
    // bucket never saw it must (with the 1% FPP sized for 200 items)
    // reject nearly everything — and, decisively, a probe against
    // blooms built from a DISJOINT value set keeps recall zero-ish
    // while the matching set keeps recall exactly 1. If bucket
    // selection disagreed between build and probe, the first assertion
    // in the test above would already have failed; here we pin the
    // discrimination side.
    val blooms = spark.sparkContext.broadcast(buildBlooms(inserted))
    val falsePos = absent.toDF("h")
      .where(BloomBucketProbe.probe(col("h"), blooms))
      .count()
    assert(falsePos <= absent.size / 10,
      s"FP rate implausibly high ($falsePos/${absent.size}) — " +
        "probe is not consulting the built buckets")
  }

  test("an empty bucket probes false") {
    // Values confined to bucket 0; any probe landing in buckets 1-3
    // hits an empty bloom and must return false.
    val onlyBucket0 = inserted.map(h => h - (((h % NBuckets) + NBuckets) % NBuckets))
    assert(onlyBucket0.forall(h => ((h % NBuckets) + NBuckets) % NBuckets == 0))
    val blooms = spark.sparkContext.broadcast(buildBlooms(onlyBucket0))
    val otherBuckets = absent.map(h => h - (((h % NBuckets) + NBuckets) % NBuckets) + 1)
    val hits = otherBuckets.toDF("h")
      .where(BloomBucketProbe.probe(col("h"), blooms))
      .count()
    assert(hits == 0L)
  }
}
