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

  /** Session-scoped resolved-relation cache for the immutable artifacts.
    * Why: `spark.read.parquet` builds a fresh InMemoryFileIndex per
    * call, and at the ×100 scale probe the sym-edges layout's ~2k
    * directories cost 5.4 s of the query's 6.4 s total JUST in
    * re-listing (r18 `ProfileR18 reachpre`) — a per-construction driver
    * cost a real deployment amortizes through its table catalog (a
    * metastore or Delta log caches the file listing; re-enumerating an
    * immutable table per query is not a cost any production reader
    * pays). Artifact paths are content-fingerprinted and written once,
    * so caching the resolved relation is sound; rebuilt artifacts land
    * at new paths.
    *
    * Mechanism: a TEMP VIEW in the session's own catalog, named from
    * the path's fingerprint — the analyzed plan (and its file index)
    * is stored by the session and `s.table` reuses it, so the cache's
    * lifecycle IS the session's. The earlier cut used an external
    * `WeakHashMap[SparkSession, DataFrame]`, which can never collect:
    * the cached DataFrame strongly references its session through
    * `queryExecution`, defeating the weak key (r18 review — the same
    * unbounded-driver-leak shape the r16 Broadcasts advisor hit). */
  private def readCached(s: SparkSession, path: String): DataFrame = {
    val vn = "graft_artifact_" + fingerprint(path)
    synchronized {
      if (!s.catalog.tableExists(vn))
        s.read.parquet(path).createOrReplaceTempView(vn)
    }
    s.table(vn)
  }

  /** Memoized sym-edges sidecar values: (bucket count, anchor id,
    * anchor bucket) keyed by artifact path. */
  private[queries] val symEdgeMeta =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long, Int)]()

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

  /** Bucket sizing for the symmetrized-edge artifact: the count is
    * DERIVED FROM THE EDGE VOLUME so each directory holds a roughly
    * constant number of rows. This is the property that makes the BFS
    * probe scale-independent: a constant-size frontier touches a
    * bounded number of buckets, and constant bucket size means the
    * bytes read per level stop growing with the corpus — a fixed
    * bucket count would instead make every touched bucket grow
    * linearly (the first r18 cut measured exactly that: d2 ≈ 0.92 at
    * 64 fixed buckets, still linear-dominated). The floor keeps small
    * test SFs from degenerating to one directory. */
  private[queries] val SymEdgeRowsPerBucket = 65536L
  private[queries] val SymEdgeMinBuckets = 64

  private val symEdgesFp = fingerprint(
    s"symedges|rpb=$SymEdgeRowsPerBucket|min=$SymEdgeMinBuckets|meta-v2")

  /** One-time build: the SYMMETRIZED edge list laid out in
    * hash-of-src directory partitions (count from [[SymEdgeRowsPerBucket]]),
    * plus a `_graft_meta` sidecar carrying (bucket count, BFS anchor =
    * global min src). This is the storage-side fix the r17 ×100
    * reachability cell named (SCALE_PROBE.md): the recursive-CTE twin
    * re-probes every edge block per BFS level even when the frontier is
    * a handful of nodes; a src-bucketed layout lets each level's probe
    * prune to the frontier's buckets at the DIRECTORY level via dynamic
    * partition pruning — the same mechanism `q_join_dpp` demonstrates
    * on the fact-dim shape. The anchor lives in the sidecar because it
    * is a property of the artifact: computing `min(src)` per query is a
    * full linear scan that would dominate the otherwise
    * frontier-proportional probe cost (the other r18 ×100 linear term).
    * The sidecar directory is underscore-prefixed, so the partitioned
    * read ignores it; the build sentinel is the SIDECAR's `_SUCCESS`,
    * written last — a crash mid-build leaves no sentinel and rebuilds. */
  def buildSymEdges(s: SparkSession, d: String): String = {
    val path = artDir(d, "sym_edges", symEdgesFp)
    if (!new File(s"$path/_graft_meta/_SUCCESS").exists()) {
      import s.implicits._
      val pairs = Graph.coEdges(s, d)
      val sym = pairs
        .union(pairs.select($"dst".as("src"), $"src".as("dst")))
      // One extra pass at BUILD time (amortized across every read):
      // edge count sizes the layout, min(src) is the BFS anchor.
      val (nEdges, anchor) = {
        val r = sym.agg(count(lit(1)), min($"src")).head
        // Loud guard (r18 review): an edge-free corpus would write an
        // empty partitioned artifact (unreadable — no schema) and a
        // phantom anchor; the CTE twin is the right surface for
        // degenerate graphs.
        require(r.getLong(0) > 0L,
          s"buildSymEdges($d): no co-purchase edges — " +
            "use q_graph_reachability (the CTE twin) on this corpus")
        (r.getLong(0), r.getLong(1))
      }
      val nb = math.max(SymEdgeMinBuckets.toLong,
        (nEdges + SymEdgeRowsPerBucket - 1) / SymEdgeRowsPerBucket).toInt
      sym
        .withColumn("sb", pmod(xxhash64($"src"), lit(nb)).cast("int"))
        // One file per directory: repartition ON the partition column
        // with one task per bucket value.
        .repartition(nb, col("sb"))
        .write.mode("overwrite").partitionBy("sb").parquet(path)
      // anchor_sb via the SAME Spark expression that bucketed the
      // rows — never a driver-side reimplementation of xxhash64+pmod,
      // which would silently diverge on sign handling.
      Seq((nb, anchor)).toDF("nb", "anchor")
        .withColumn("anchor_sb",
          pmod(xxhash64($"anchor"), lit(nb)).cast("int"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_graft_meta")
    }
    path
  }

  /** Bucket-pruned twin of `q_graph_reachability`: the same 2-hop
    * min-depth BFS from min(src), but over the [[buildSymEdges]]
    * artifact and UNROLLED into one lazy plan. Level 0 probes with a
    * STATIC partition filter (the anchor and its bucket are literals
    * from the artifact sidecar — one directory read); level 1 probes
    * through a broadcast join on (src, sb) whose dynamic partition
    * pruning narrows the scan to the frontier's buckets. The CTE twin's
    * measured d2 ≈ 1.12 (r17 ×100 cell) came from re-probing the FULL
    * edge relation per UnionLoop level; here the per-query cost is
    * O(frontier buckets) of CONSTANT size (bucket count scales with the
    * edge volume), with no full scan anywhere — the anchor derivation
    * moved to build time. The frontier never touches the driver: it
    * rides the broadcast exchange, which DPP reuses for the pruning
    * subquery. The depth bound is static (2), so unrolling loses
    * nothing vs the iterative executor; unbounded closures keep using
    * the CC machinery.
    *
    * The `>= 0` frontier guard is semantically free (part keys are
    * positive) but load-bearing for planning: DPP's insertion gate
    * requires a likely-selective predicate on the filtering side, and
    * an aggregate/distinct alone does not qualify. PlanAuditSpec pins
    * the DynamicPruningExpression plus every-scan-partition-filtered so
    * a regression fails the suite rather than silently reverting to
    * full scans. */
  private def reachabilityPre(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = buildSymEdges(s, d)
    // Bounded sidecar read at plan-construction time (1 row — same
    // class as the memoized fixtures): the layout's bucket count and
    // the build-time BFS anchor.
    // Sidecar values are immutable data at a fingerprinted path —
    // memoize across constructions (JVM-wide, not per-session).
    val (nb, anchorId, anchorBucket) = symEdgeMeta
      .computeIfAbsent(base, _ => {
        val m = s.read.parquet(s"$base/_graft_meta").head
        (m.getAs[Int]("nb"), m.getAs[Long]("anchor"),
          m.getAs[Int]("anchor_sb"))
      })
    val edges = readCached(s, base)
    // Level 0: static pruning — one directory, then the src equality.
    val hop1 = edges
      .filter($"sb" === lit(anchorBucket) && $"src" === lit(anchorId))
      .select($"dst")
    // Level 1: DPP — the frontier's buckets only.
    val frontier = hop1.select($"dst".as("node")).distinct()
      .filter($"node" >= 0L)
      .withColumn("fb", pmod(xxhash64($"node"), lit(nb)).cast("int"))
    val hop2 = edges.join(broadcast(frontier),
      $"src" === $"node" && $"sb" === $"fb")
      .select($"dst")
    val reach =
      Seq(anchorId).toDF("node").select($"node", lit(0).as("depth"))
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
