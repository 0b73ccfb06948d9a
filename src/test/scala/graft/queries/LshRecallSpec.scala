package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Banding-recall guard at the DRIVER'S gate SF (sf0.01): q_dedup_jaccard
  * and q_dedup_incremental are hash-gated against exact brute-force
  * oracles, but 9-band/2-row LSH has a ~(1-j^2)^9 ≈ 1.6e-2 per-pair
  * false-negative rate at j = 0.8, so those gates passing is
  * data-dependent — new testdata with a threshold-adjacent pair could go
  * red with zero code change. This spec asserts the property the gates
  * silently rely on: every brute-force pair at the gate SF shares at
  * least one band (candidate recall = 100%), so a future red here means
  * "regenerate data or widen bands", not "debug the operator". */
class LshRecallSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Sf001 = "/root/testdata/sf0.01"

  test("every brute-force pair at sf0.01 shares at least one band") {
    val sh = Tables.documents(spark, Sf001)
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", array_distinct(shingles($"toks", 3)).as("sh"))
      .cache()
    try {
      val brute = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
        .withColumn("jac", jaccard($"a.sh", $"b.sh"))
        .filter($"jac" >= 0.8)
        .select($"a.doc_id".as("a"), $"b.doc_id".as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(brute.nonEmpty, "testdata no longer plants near-dup pairs")
      val cands = Dedup.bandCandidates(Dedup.bandTable(spark, Sf001))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = brute -- cands
      assert(missed.isEmpty,
        s"banding would miss ${missed.size} oracle pair(s): $missed — " +
          "threshold-adjacent data; regenerate or widen the banding")
    } finally { sh.unpersist(); () }
  }
}
