package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized-artifact variants of the dedup/ANN operators — the
  * "at 100 TB the sigs/bands/cells are computed once and reused" design
  * made real (see the in-code notes in [[Dedup.bandTable]] /
  * [[Similarity.ivfAssignment]]).
  *
  * Each query ensures its artifact exists on disk (a one-time build job,
  * skipped when the `_SUCCESS` marker is present — the deliberate eager
  * step; everything after it is a lazy plan over the artifact):
  *
  *  - `q_dedup_jaccard_pre`: MinHash band table as parquet. Candidate
  *    generation reads ONLY the 24-byte-row band table; the corpus is
  *    scanned once, for exact verification of the rare candidates —
  *    versus twice (signature build + verify) in the from-scratch query.
  *  - `q_ann_ivf_pre`: the inverted file partitioned BY CELL on disk.
  *    The probe join broadcasts the query probes, so dynamic partition
  *    pruning drops the 14 unprobed cell directories from the scan —
  *    the probe touches 2/16 of the data on disk, not just logically.
  *
  * Both return byte-identical results to their from-scratch twins and are
  * checked against the same DuckDB oracle SQL. Artifacts land under
  * `target/artifacts/<sf-dir-slug>/` — derived deterministically from
  * static testdata, so the marker-file cache is safe; a real deployment
  * would rebuild on corpus version bumps.
  */
object Materialized extends QueryGroup {

  /** Logic fingerprint baked into each artifact path: any change to the
    * constants that determine artifact CONTENT (MinHash coefficients /
    * modulus / shingle size / band packing; IVF plane constant / anchor
    * offset / cell count / quantize scale) changes the directory name, so
    * the `_SUCCESS` marker of a stale artifact is never found and the
    * artifact rebuilds — instead of silently serving parquet computed by
    * old logic while the from-scratch twin uses new logic. */
  private def fingerprint(descriptor: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(descriptor.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  // Descriptors reference the live constants in Dedup/Similarity/
  // TextFunctions — never re-typed literals — so changing any of them
  // changes the path and stale artifacts rebuild instead of being reused.
  private val minhashFp = fingerprint(
    "minhash|P=" + graft.functions.TextFunctions.HashP +
      s"|k=${Dedup.ShingleK}|bands=${Dedup.NumBands}x${Dedup.RowsPerBand}" +
      "|coeffs=" + graft.functions.TextFunctions.MinHashCoeffs.mkString(","))

  private val ivfFp = fingerprint(
    s"ivf|plane=${Similarity.PlaneMult}|anchorOffset=${Similarity.AnchorOffset}" +
      s"|cells=${Similarity.NumCells}|quant=${Similarity.QuantScale}")

  private def artDir(d: String, name: String, fp: String): String =
    s"target/artifacts/${d.replaceAll("[^A-Za-z0-9._-]", "_")}/${name}_$fp"

  private def ensure(path: String)(build: => Unit): Unit =
    if (!new File(s"$path/_SUCCESS").exists()) build

  /** One-time build: persist the MinHash band table. Plain parquet — the
    * band self-join shuffles on (band_idx, band_key) either way; the win
    * is never re-shingling/re-hashing the corpus. */
  def buildMinhashBands(s: SparkSession, d: String): String = {
    val path = artDir(d, "minhash_bands", minhashFp)
    ensure(path) {
      Dedup.bandTable(s, d).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** One-time build: persist the IVF inverted file, partitioned by cell
    * so probes prune unprobed cells at the directory level. */
  def buildIvfCells(s: SparkSession, d: String): String = {
    val path = artDir(d, "ivf_cells", ivfFp)
    ensure(path) {
      Similarity.ivfAssignment(s, d)
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    }
    path
  }

  // Edge definition has no tunable constants; version the layout.
  private val coEdgesFp = fingerprint("coedges|order-pair-v1")

  /** One-time build: persist the canonical co-purchase edge list — the
    * graph analogue of the band/cell artifacts: every graph analytic
    * (PageRank, triangles, reachability, CC) starts from this relation,
    * and at 100 TB the lineitem self-join + distinct that derives it is
    * exactly what a deployment computes once, not per query. */
  def buildCoEdges(s: SparkSession, d: String): String = {
    val path = artDir(d, "co_edges", coEdgesFp)
    ensure(path) {
      Graph.coEdges(s, d).write.mode("overwrite").parquet(path)
    }
    path
  }

  private def pagerankPre(s: SparkSession, d: String): DataFrame =
    Graph.pagerankOver(s.read.parquet(buildCoEdges(s, d)))

  /** Directory-bucket count for the symmetrized-edge artifact. Sized so
    * a small BFS frontier prunes most of the scan (level 0 probes 1/64)
    * while directories stay file-sized at the test SFs; a deployment
    * scales it with the edge volume (buckets ≈ cluster cores, like
    * [[Bucketed.NumBuckets]]). */
  private[queries] val SymEdgeBuckets = 64

  private val symEdgesFp = fingerprint(
    s"symedges|nb=$SymEdgeBuckets|order-pair-v1")

  /** One-time build: the SYMMETRIZED edge list laid out in
    * [[SymEdgeBuckets]] hash-of-src directory partitions. This is the
    * storage-side fix the r17 ×100 reachability cell named
    * (SCALE_PROBE.md): the recursive-CTE twin re-probes every edge
    * block per BFS level even when the frontier is a handful of nodes;
    * a src-bucketed layout lets each level's probe prune to the
    * frontier's buckets at the DIRECTORY level via dynamic partition
    * pruning — the same mechanism `q_join_dpp` demonstrates on the
    * fact-dim shape. */
  def buildSymEdges(s: SparkSession, d: String): String = {
    val path = artDir(d, "sym_edges", symEdgesFp)
    ensure(path) {
      import s.implicits._
      val pairs = Graph.coEdges(s, d)
      pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
        .withColumn("sb",
          pmod(xxhash64($"src"), lit(SymEdgeBuckets)).cast("int"))
        // One file per directory: the partition column is a hash, so
        // repartitioning ON it groups each directory's rows into one task.
        .repartition(col("sb"))
        .write.mode("overwrite").partitionBy("sb").parquet(path)
    }
    path
  }

  /** Bucket-pruned twin of `q_graph_reachability`: the same 2-hop
    * min-depth BFS from min(src), but over the [[buildSymEdges]]
    * artifact and UNROLLED into one lazy plan whose per-level edge
    * probes are broadcast joins on (src, sb) — so dynamic partition
    * pruning narrows each level's scan to the frontier's hash buckets
    * instead of re-reading the full edge relation (the CTE twin's
    * measured d2 ≈ 1.12 per the r17 ×100 cell came exactly from that
    * full re-probe per UnionLoop level). The frontier never touches
    * the driver: it rides the broadcast exchange, which DPP reuses for
    * the pruning subquery. The depth bound is static (2), so unrolling
    * loses nothing vs the iterative executor; unbounded closures keep
    * using the CC machinery.
    *
    * The `>= 0` frontier guards are semantically free (part keys are
    * positive) but load-bearing for planning: DPP's insertion gate
    * requires a likely-selective predicate on the filtering side, and
    * an aggregate/distinct alone does not qualify. PlanAuditSpec pins
    * the two DynamicPruningExpressions so a regression fails the suite
    * rather than silently reverting to full scans. */
  private def reachabilityPre(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = s.read.parquet(buildSymEdges(s, d))
    def withBucket(df: DataFrame): DataFrame =
      df.filter($"node" >= 0L).withColumn("fb",
        pmod(xxhash64($"node"), lit(SymEdgeBuckets)).cast("int"))
    val anchor = edges.agg(min($"src").as("node"))
    def probe(frontier: DataFrame): DataFrame =
      edges.join(broadcast(withBucket(frontier)),
        $"src" === $"node" && $"sb" === $"fb")
    val hop1 = probe(anchor).select($"dst")
    val hop2 = probe(hop1.select($"dst".as("node")).distinct())
      .select($"dst")
    val reach =
      anchor.select($"node", lit(0).as("depth"))
        .unionAll(hop1.select($"dst".as("node"), lit(1).as("depth")))
        .unionAll(hop2.select($"dst".as("node"), lit(2).as("depth")))
    reach.groupBy($"node")
      .agg(min($"depth").cast("int").as("min_depth"))
      .groupBy($"min_depth")
      .agg(count(lit(1)).as("n_nodes"),
        bit_xor($"node").as("node_sig"))
      .orderBy($"min_depth")
  }

  private def dedupJaccardPre(s: SparkSession, d: String): DataFrame = {
    val bands = s.read.parquet(buildMinhashBands(s, d))
    Dedup.verifyJaccard(s, d, Dedup.bandCandidates(bands))
  }

  private def annIvfPre(s: SparkSession, d: String): DataFrame = {
    val table = s.read.parquet(buildIvfCells(s, d))
    Similarity.ivfScore(Similarity.ivfProbes(s, d), table)
  }

  val queries: Map[String, Catalog.Q] = Map(
    "q_dedup_jaccard_pre" -> dedupJaccardPre,
    "q_ann_ivf_pre" -> annIvfPre,
    "q_graph_pagerank_pre" -> pagerankPre,
    "q_graph_reachability_pre" -> reachabilityPre,
  )

  // Same outputs as the from-scratch twins => same oracle SQL.
  val oracle: Map[String, String] = Map(
    "q_dedup_jaccard_pre" -> Dedup.oracle("q_dedup_jaccard"),
    "q_ann_ivf_pre" -> Similarity.oracle("q_ann_ivf"),
    "q_graph_pagerank_pre" -> Graph.oracle("q_graph_pagerank"),
    "q_graph_reachability_pre" -> Graph.oracle("q_graph_reachability"),
  )
}
