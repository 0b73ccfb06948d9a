package graft

import graft.queries.{Dedup, Materialized, Similarity}

/** The precomputed-artifact paths must return byte-identical results to
  * their from-scratch twins, and their plans must actually use the
  * artifact: candidate generation off the band parquet with a single
  * corpus scan (verify only), and the IVF probe against the
  * cell-partitioned inverted file. */
class MaterializedSpec extends SparkTestBase {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, Sf0001)

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    // Force a fresh artifact build for this testdata dir.
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/artifacts/_root_testdata_sf0.001"))
  }

  test("q_dedup_jaccard_pre equals the from-scratch query") {
    val fresh = q("q_dedup_jaccard").collect().map(_.toSeq).toSeq
    val pre = q("q_dedup_jaccard_pre").collect().map(_.toSeq).toSeq
    assert(pre == fresh)
    assert(pre.nonEmpty)
  }

  test("precomputed dedup plan drops the signature-building corpus scan") {
    val plan = q("q_dedup_jaccard_pre").queryExecution.executedPlan.toString
    assert(plan.contains("minhash_bands"), "candidates must read the artifact")
    val docScans = "documents\\.parquet".r.findAllIn(plan).size
    val freshPlan = q("q_dedup_jaccard").queryExecution.executedPlan.toString
    val freshScans = "documents\\.parquet".r.findAllIn(freshPlan).size
    // The from-scratch twin additionally scans the corpus to re-shingle
    // and re-hash signatures; the precomputed path only verifies.
    assert(docScans < freshScans,
      s"expected fewer corpus scans than from-scratch " +
        s"(pre=$docScans fresh=$freshScans)")
    assert(!plan.contains("fastShingleHash") && !plan.contains("sig0"),
      "precomputed path must not recompute signatures")
  }

  test("q_ann_ivf_pre equals the from-scratch query") {
    val fresh = q("q_ann_ivf").collect().map(_.toSeq).toSeq
    val pre = q("q_ann_ivf_pre").collect().map(_.toSeq).toSeq
    assert(pre == fresh)
    assert(pre.nonEmpty)
  }

  test("IVF artifact is cell-partitioned and the probe prunes it") {
    // Build (or reuse) the artifact first: run in isolation, beforeAll has
    // just deleted it and listFiles() on the bare path would NPE.
    val root = new java.io.File(Materialized.buildIvfCells(spark, Sf0001))
    val cellDirs = root.listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "inverted file must be partitioned by cell")
    val plan = q("q_ann_ivf_pre").queryExecution.executedPlan.toString
    assert(plan.contains("ivf_cells"), "probe must read the artifact")
    // Broadcast probe side => dynamic partition pruning on the cell dirs.
    assert(plan.contains("dynamicpruning"),
      "expected dynamic partition pruning of unprobed cells")
  }
}
