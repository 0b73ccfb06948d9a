package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoints.MaterializeOps
import Catalog._

/** Relational graph analytics over the part co-purchase graph (parts are
  * adjacent when they appear in the same order — the classic
  * market-basket projection of lineitem).
  *
  * Connected components already live in [[Dedup]] (`q_dedup_cluster`,
  * large-star/small-star); this group adds value propagation (PageRank)
  * and motif counting (triangles) — the two other workhorse graph shapes
  * a relational engine is asked for.
  *
  * Cross-engine determinism: PageRank is computed in 1e9 fixed-point
  * integer arithmetic — every contribution is an exact integer floor
  * division (`div` in Spark, `//` in DuckDB; all operands positive, so
  * truncation = floor in both), every combine an exact integer sum —
  * so ranks are bit-identical across engines and shuffle orders, with
  * none of the double-summation fold-order hazards the float form has.
  */
object Graph extends QueryGroup {

  /** 1e9 fixed-point scale for PageRank ranks. */
  private val Scale = 1000000000L

  /** Canonical undirected co-purchase edges (src < dst), deduplicated.
    * Per-order fanout is bounded by lines-per-order (≤ 7), so the
    * self-join emits O(rows × lines-per-order) pair instances — never
    * order-count × order-count. */
  private[queries] def coEdges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Basket form, not a self-join: ONE groupBy-orderkey shuffle builds
    // per-order sorted item sets (collect_set partial-aggregates
    // map-side), then the src < dst upper triangle explodes ROW-LOCALLY
    // off the sorted array — bounded by C(lines-per-order, 2) ≤ C(7,2)
    // pairs per order — before the pair distinct. The equi-self-join
    // formulation shuffles lineitem twice and re-sorts both sides; this
    // moves the fact table once (the q_assoc_rules basket move).
    // The triangle explodes through two GENERATORS (posexplode anchor +
    // slice-tail explode), not nested transform lambdas building a
    // struct per pair: higher-order functions evaluate interpreted per
    // element, and the r18 assoc_rules sub-probe priced the two forms
    // at 0.91 vs 0.48 s on the same basket relation. slice is 1-based,
    // so start i+2 with the 0-based posexplode index yields exactly the
    // elements after src; the downstream distinct makes pair order
    // irrelevant. Same rows, cheaper stage, for every coEdges consumer
    // (pagerank, triangles, reachability, linkpred, and the
    // materialized-artifact builders).
    Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("items"))
      .select($"items", posexplode($"items").as(Seq("i", "src")))
      .select($"src",
        explode(slice($"items", $"i" + lit(2), size($"items"))).as("dst"))
      .distinct()
  }

  /** PageRank, 2 synchronous iterations, damping 0.85, over the
    * symmetrized co-purchase graph.
    *
    * Shape per iteration: adjacency ⋈ ranks on src (both sides keyed on
    * the node id), then one partial-agg shuffle summing contributions
    * per dst. The (src, dst, deg) adjacency is MATERIALIZED once
    * (eager localCheckpoint, hash-partitioned on src — the same
    * build-the-graph-once move as `reachability` below): left lazy, the
    * lineitem self-join + distinct re-executes under every reference —
    * deg, plus once per iteration — and dominated the runtime. Each
    * iteration then finds the edge side pre-partitioned, so only the
    * skinny rank relation moves. Ranks are fixed-point longs:
    * contribution = r div deg, update = 0.15·Scale + 85·Σ div 100 —
    * exact integers end to end. */
  private def pagerank(s: SparkSession, d: String): DataFrame =
    pagerankOver(coEdges(s, d))

  /** The iteration body over any canonical (src < dst) edge relation —
    * shared by the from-scratch query above and the materialized-edge
    * twin (`q_graph_pagerank_pre` in [[Materialized]]). */
  private[queries] def pagerankOver(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val adj = edges.join(deg, "src").repartition($"src").materialized
    // Iteration 1 unrolled: the initial rank is the SAME constant for
    // every node, so the first round's contribution is Scale div deg
    // straight off the adjacency — no init relation, no first join; the
    // symmetrized graph has no rank-only nodes, so the receiving node set
    // is identical to the joined form.
    def update(s: org.apache.spark.sql.Column) =
      lit(15L * Scale / 100) + expr("(85 * s) div 100")
    var rank = adj
      .select($"dst", expr(s"$Scale div deg").as("c"))
      .groupBy($"dst")
      .agg(sum($"c").as("s"))
      .select($"dst".as("node"), update($"s").as("r"))
    for (_ <- 2 to 2) {
      rank = adj
        .join(rank, adj("src") === rank("node"))
        .select($"dst", expr("r div deg").as("c"))
        .groupBy($"dst")
        .agg(sum($"c").as("s"))
        .select($"dst".as("node"), update($"s").as("r"))
    }
    rank.select($"node".as("part"), $"r".as("rank_fp"))
      .orderBy(desc("rank_fp"), $"part")
      .limit(100)
  }

  /** Degree-ordered oriented edge set: each undirected edge {u,v} is
    * directed from the lower-rank to the higher-rank endpoint, where
    * rank = (degree, id) lexicographic — PACKED into one long as
    * `deg << 40 | id`, so rank comparison is a single long compare and
    * the edge relation stays two columns. The packing requires ids in
    * [0, 2⁴⁰) and degrees < 2²³ (the 32/32 split of rounds ≤11 capped
    * ids at 2³², which the ×100 key-shifted probe corpus exceeds; 2⁴⁰
    * covers key offsets to ×10000 while 8.4M max degree still dwarfs
    * any co-occurrence graph's). Both bounds hold by construction here
    * and the build asserts them per row, so a violation at larger scale
    * fails loudly rather than miscounting (the unpacked (deg, id)
    * struct form is the drop-in general fallback for arbitrary ids). Out-degree under degree orientation is bounded
    * by O(√(2·|E|)) — the arboricity argument behind node-iterator++
    * triangle counting — which is what tames wedge fanout on skewed
    * graphs: a hub with degree h and a small id would otherwise sit on
    * the left of all h of its edges and emit C(h,2) wedges. The deg
    * relation is one row per node — broadcast both probes. */
  private[queries] def orientedEdges(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val deg = pairs.select($"src".as("node"))
      .union(pairs.select($"dst".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    def rank(id: String, dg: String) = {
      val guarded = when(
        col(id) < 0 || col(id) >= (1L << 40) || col(dg) >= (1L << 23),
        raise_error(lit("orientedEdges: rank packing out of range")))
        .otherwise(shiftleft(col(dg), 40).bitwiseOR(col(id)))
      guarded.cast("long")
    }
    pairs
      .join(broadcast(deg.select($"node".as("src"), $"deg".as("sdeg"))), "src")
      .join(broadcast(deg.select($"node".as("dst"), $"deg".as("ddeg"))), "dst")
      .select(
        rank("src", "sdeg").as("r_src"), rank("dst", "ddeg").as("r_dst"))
      .select(
        least($"r_src", $"r_dst").as("u"),
        greatest($"r_src", $"r_dst").as("v"))
  }

  /** Global triangle count — the two-join motif shape over the
    * DEGREE-ORDERED oriented edges: wedges (b, c) from two out-edges of
    * the lowest-rank corner u (rank(b) < rank(c)), closed by probing the
    * oriented edge b→c. Each triangle is counted exactly once, from its
    * minimum-rank corner.
    *
    * Why degree ordering and not raw id order: wedge fanout per corner is
    * C(out-deg, 2), and degree orientation bounds out-deg by O(√(2|E|))
    * (arboricity) instead of letting a high-degree hub with a small id
    * emit deg² wedges. On the sf0.1 co-purchase graph this cuts wedge
    * rows ~1.9x vs id order (GraphSpec pins the inequality).
    *
    * Wedges still vastly outnumber triangles, so the closure join's
    * exchange is THE cost: a bloom filter over the oriented edge set
    * (`bloom_agg_exact` — same family as q_join_bloom's `bloom_agg`, but
    * with explicit conf-free geometry) prunes non-closing wedges
    * map-side, BEFORE they hit the wire. False positives just pass
    * a few extra wedges to the exact join; the count is unchanged. */
  private def triangles(s: SparkSession, d: String): DataFrame =
    trianglesWithBloomBucketItems(s, d, TriangleBloomBucketItems)

  /** Per-bucket item capacity of the partitioned closure bloom. 64M
    * items ≈ 77 MB of bloom at 1% FP — large enough that every corpus
    * up to ~64M oriented edges keeps the single-bucket plan (bucket
    * count 1 degenerates to exactly the r14 scalar-bloom probe), small
    * enough that each bucket's bit array stays far from the sketch
    * library's Int-indexed ceiling. The test seam
    * [[trianglesWithBloomBucketItems]] lowers this to force the
    * multi-bucket path on the small fixtures. */
  private[queries] val TriangleBloomBucketItems = 64000000L

  /** Transport threshold for the single-bucket closure bloom: at or
    * under this many oriented edges the bloom ships as a scalar-subquery
    * plan literal; above it (and always when bucketed) it rides a real
    * `Broadcast` probed by the codegen `bloom_bucket_probe`. The r16
    * transport A/B (SCALE_PROBE.md r16 section) measured the literal
    * plan fastest at 1.2M edges (sf0.1: 5.6 s vs 6.0 s broadcast) and
    * the broadcast plan fastest by ×10 (12M edges: 24.7 s literal vs
    * 19.7 s broadcast single-bucket / 19.2 s 4-bucket) — the literal's
    * per-task rehydration and non-codegen probe grow with bloom bytes
    * and wedge count, the broadcast's fixed cost does not. 4M edges
    * (~4.8 MB bloom) splits the two measured regimes. */
  private[queries] val TriangleScalarMaxEdges = 4000000L

  /** EAGER-BUILD CONTRACT (r15/r16 advisors): whenever the BROADCAST
    * transport is chosen — nBuckets > 1 OR edgeRows > `scalarMaxEdges`
    * (so also the common single-bucket regime between 4M and 64M edges) —
    * the per-bucket bloom-build jobs run DURING plan construction; this
    * method is not purely lazy there. Building the plan without executing
    * it still pays the bloom-build edge scans.
    *
    * Staleness is defused by a SNAPSHOT FINGERPRINT (r16): construction
    * records (count, bit_xor(xxhash64(u, v))) of the materialized edge
    * relation in the same pass that sizes the buckets, and the returned
    * plan re-derives that pair per execution (a lazy 1-row aggregate
    * crossJoin'd in, one cheap scan of the checkpointed blocks) and
    * raises an error on mismatch instead of probing stale blooms. The
    * mismatch is reachable in `graft.checkpoint.mode=disk`, where
    * persist() keeps lineage and evicted blocks recompute from CHANGED
    * source data (GraphSpec pins the throw); in `local` mode the
    * localCheckpoint blocks are immutable-or-gone, so every execution is
    * snapshot-consistent and the guard only costs the scan. The broadcast
    * blooms are registered with [[graft.core.Broadcasts]] so measurement
    * harnesses can destroy them deterministically after each collect. */
  private[graft] def trianglesWithBloomBucketItems(
      s: SparkSession, d: String, bucketItems: Long): DataFrame =
    trianglesWithBloomConfig(s, d, bucketItems, TriangleScalarMaxEdges)

  /** Full test seam: `bucketItems` sets the bucket geometry (as above) and
    * `scalarMaxEdges` the TRANSPORT threshold — a single-bucket bloom at
    * or under it ships as a scalar subquery (plan literal), anything else
    * rides a real Broadcast probed by the codegen `bloom_bucket_probe`.
    * The r16 probe measures the two transports independently of bucket
    * count this way (scalarMaxEdges=0 forces broadcast at one bucket;
    * Long.MaxValue forces the literal plan wherever nBuckets == 1). */
  private[graft] def trianglesWithBloomConfig(
      s: SparkSession, d: String, bucketItems: Long,
      scalarMaxEdges: Long): DataFrame = {
    import s.implicits._
    org.apache.spark.sql.graft.GraftSqlFunctions.ensure(s)
    // The oriented edge set is read FOUR times (bloom build, both wedge
    // sides, closure probe): materialize it once (eager localCheckpoint)
    // so the lineitem self-join + distinct + degree join runs once. The
    // repartition on u is the orientation's structural dividend: every
    // consumer joins keyed on u (wedge self-join both sides, closure
    // build side), so checkpointing hash-partitioned on u lets the wedge
    // join run with ZERO exchanges — id order couldn't co-locate because
    // it joined dst-to-src, two different keys.
    val oe = orientedEdges(coEdges(s, d)).repartition($"u").materialized
    // Size the closure bloom from the ACTUAL edge count — one cheap scan
    // of the just-checkpointed blocks. The fixed 4M sizing of rounds ≤11
    // saturated at the ×100 probe corpus (~150M edges → ~100% false
    // positives → the full multi-billion-row wedge relation reached the
    // closure join and spilled the disk dry). A bloom sized for the data
    // keeps the map-side prune effective at ANY corpus size. The
    // aggregate is graft's `bloom_agg_exact` — explicit geometry baked
    // into the plan at construction, NO session conf consulted: the r12
    // variant had to raise spark.sql.optimizer.runtime.bloomFilter.
    // maxNumItems/maxNumBits session-wide and never restored them, a
    // cross-query side effect on any shared session.
    //
    // PARTITIONED above `bucketItems` edges (r15; the partitioned-bloom
    // fallback rounds 12-14 only named in this comment): edges hash into
    // `nBuckets` key ranges by pmod(xxhash64(u,v), nBuckets), one
    // bloom_agg_exact scalar subquery per bucket, and wedges probe the
    // bucket their own hash selects via a CASE over the subqueries —
    // still entirely map-side (each scalar is computed once and cached
    // by might_contain, zero wedge bytes moved for the prune). The CASE
    // shape rather than a map<bucket, bloom> scalar because Spark's
    // might_contain analyzer only accepts a constant or a DIRECT scalar
    // subquery as the filter argument — element_at(subquery-map, k) is
    // a DATATYPE_MISMATCH. Each bucket's bloom holds ~edges/nBuckets
    // items, so no single bit array ever approaches the sketch
    // library's Int-indexed bound and the FP rate stays at the designed
    // 1% at ANY edge count (the single-bloom clamp degraded FP past
    // ~2.1B edges and sat at a 2.4 GiB monolith well before that). An
    // empty bucket aggregates to an EMPTY bloom → probe returns false,
    // which is exact (empty bucket = the wedge's closing edge cannot
    // exist). Build cost is nBuckets passes over the checkpointed edge
    // blocks (each with the bucket predicate evaluated scan-side);
    // total bloom bytes are unchanged by the split. At corpora where
    // even the summed blooms outgrow broadcast budgets, the knob to
    // turn is FPP (more FPs only cost extra exact-join probes), never
    // correctness.
    // One pass yields the edge count (bucket geometry + transport choice)
    // AND the snapshot fingerprint the broadcast-transport plan re-checks
    // per execution (see the EAGER-BUILD CONTRACT above).
    val cntFp = oe.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
    val edgeRows = cntFp.getLong(0)
    val edgeFingerprint = cntFp.getLong(1)
    val nBuckets = math.max(1L, (edgeRows + bucketItems - 1) / bucketItems).toInt
    // 20% headroom over the mean bucket fill: xxhash64 spreads edges
    // near-uniformly, so mean+20% keeps every bucket at-or-under its
    // designed FP rate without re-counting per bucket. The capacity
    // floor applies ONLY to the single-bucket plan: under the split the
    // floor would multiply by bucket count (total bloom bytes growing
    // ~nBuckets× past the single bloom's, for zero FP benefit), and
    // because every bucket's bloom builds as a CONCURRENT scalar
    // subquery whose partial-agg buffer is allocated full-size in every
    // task, a floored 16-bucket build holds nBuckets × tasks × floorMB
    // of live bit arrays at once — measured as a heap OOM at the ×10
    // forced-bucket probe on an 8g driver. Per-bucket capacity scaled
    // to actual fill keeps total bloom bytes (and peak build memory)
    // constant under any split; in the production regime (buckets only
    // above `bucketItems` edges) per-bucket fill is ≥ bucketItems/1.2
    // anyway, so no floor is ever binding there.
    val perBucket =
      if (nBuckets == 1) math.max(4000000L, edgeRows * 6 / 5 + 1)
      else math.max(65536L, edgeRows / nBuckets * 6 / 5 + 1)
    // Per-invocation view name: two concurrent triangle runs on one
    // session must not race on create/drop of a shared name
    // (ConcurrencySpec interleaves this query with itself since r13).
    val vn = s"graph_oedges_${java.util.UUID.randomUUID.toString.take(8)}"
    oe.createOrReplaceTempView(vn)
    // Closure-join strategy from the same count. The wedge stream is
    // the single thing in this plan that is allowed to be huge, so it
    // must never be SORTED (sort-merge would buffer/spill it) and
    // ideally never shuffled either: up to ~128 MB of edges (8M rows ×
    // 16 B), BROADCAST the edge side — wedges are then probed fully
    // map-side, zero wedge bytes on the wire, which on a cluster beats
    // shuffling a wedge stream that outnumbers edges by orders of
    // magnitude (the 10 MB autoBroadcast default is calibrated for
    // fact×dim, not for avoiding a multi-billion-row shuffle). Past
    // that, SHUFFLE_HASH with the edge side as build — the wedges
    // shuffle but still stream through the probe, never sort.
    val closureHint =
      if (edgeRows <= 8000000L) "/*+ BROADCAST(bc) */"
      else "/*+ SHUFFLE_HASH(bc) */"
    // nBuckets == 1 keeps the exact single-scalar probe (no pmod filter
    // on the build scan) — the common plan for every corpus under
    // `bucketItems` edges.
    //
    // nBuckets > 1 does NOT use per-bucket scalar subqueries: a scalar
    // subquery result is pasted into the plan as a LITERAL and ships
    // inside every fused stage's serialized task binary, rehydrated per
    // task — measured at the ×100 probe corpus (119.6M edges, 2 buckets
    // of ~82 MB) as a 328.8 MiB wedge-stage task binary (the CASE form
    // landed the bloom bytes in two stages, one of them twice) that
    // OOMed a 48g heap the single-bloom plan runs in comfortably.
    // Instead the per-bucket blooms are built SEQUENTIALLY (one
    // bounded-memory aggregate job per bucket — never nBuckets
    // concurrent full-size partial buffers), pulled to the driver (the
    // same bytes a scalar subquery would have moved there anyway), and
    // shipped as a real Broadcast[Array[BloomFilter]]: block-manager
    // torrent, ONE shared copy per executor, a stub in the task binary.
    // Wedges probe their key-selected bucket via the codegen
    // `bloom_bucket_probe` expression — same pmod the build groups by.
    // At corpora where even the summed blooms outgrow the broadcast
    // budget (~1.2 B per edge at 1% FPP), the knob to turn is FPP (more
    // FPs only cost extra exact-join probes), never correctness.
    val out =
      if (nBuckets == 1 && edgeRows <= scalarMaxEdges) {
        s.sql(s"""
          WITH w AS (
            SELECT e1.v AS b, e2.v AS c
            FROM $vn e1 JOIN $vn e2
              ON e1.u = e2.u AND e1.v < e2.v
            WHERE bloom_might_contain(
              (SELECT bloom_agg_exact(xxhash64(u, v), $perBucket) FROM $vn),
              xxhash64(e1.v, e2.v))
          )
          SELECT $closureHint COUNT(*) AS n_triangles
          FROM w JOIN $vn bc ON w.b = bc.u AND w.c = bc.v""")
      } else {
        val bloomBytes = (0 until nBuckets).map { b =>
          s.sql(
            s"""SELECT bloom_agg_exact(xxhash64(u, v), $perBucket)
               |FROM $vn WHERE pmod(xxhash64(u, v), $nBuckets) = $b"""
              .stripMargin)
            .head().getAs[Array[Byte]](0)
        }
        // Deserialize once on the driver; the broadcast re-serializes
        // compactly and every executor rehydrates exactly one copy. An
        // empty bucket yields an empty bloom -> probe false, which is
        // exact (the wedge's closing edge cannot exist in that bucket).
        val blooms = graft.core.Broadcasts.track(s.sparkContext.broadcast(
          bloomBytes.map(bs => org.apache.spark.util.sketch.BloomFilter
            .readFrom(bs)).toArray))
        val closing = xxhash64(col("e1.v"), col("e2.v"))
        val wedges = oe.as("e1")
          .join(oe.as("e2"),
            col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
          .where(org.apache.spark.sql.graft.BloomBucketProbe
            .probe(closing, blooms))
          .select(col("e1.v").as("b"), col("e2.v").as("c"))
        val bc =
          if (edgeRows <= 8000000L) broadcast(oe.as("bc"))
          else oe.as("bc").hint("shuffle_hash")
        // Snapshot guard (EAGER-BUILD CONTRACT): re-derive the edge
        // relation's (count, fingerprint) lazily — so per EXECUTION, not
        // per construction — and fail loudly if it no longer matches what
        // the blooms were built from. One extra 16-byte-per-row scan of
        // the checkpointed blocks; the 1-row aggregate rides the
        // established crossJoin(broadcast(tiny-agg)) scalar shape.
        val guard = oe.agg(count(lit(1)).as("__edge_cnt"),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("__edge_fp"))
        wedges.join(bc, col("b") === col("bc.u") && col("c") === col("bc.v"))
          .agg(count(lit(1)).as("n_triangles"))
          .crossJoin(broadcast(guard))
          .select(when(
            col("__edge_cnt") === lit(edgeRows) &&
              col("__edge_fp") === lit(edgeFingerprint),
            col("n_triangles"))
            .otherwise(raise_error(lit(
              "triangles: edge snapshot changed since plan construction " +
                "— the eager-built closure blooms are stale; rebuild the " +
                "plan (graft.checkpoint.mode=disk recomputes evicted " +
                "blocks from source)")))
            .as("n_triangles"))
      }
    // Analysis has inlined the view; drop it so the checkpointed blocks
    // are collectable once the result is dropped (same as reachability).
    s.catalog.dropTempView(vn)
    out
  }

  /** Bounded BFS reachability via a RECURSIVE CTE (new SQL surface in
    * Spark 4): from the smallest part id in the graph, walk ≤ 2 hops
    * over the symmetrized co-purchase edges and report, per BFS layer,
    * how many parts are first reached there (min-depth semantics — the
    * closure may revisit a node deeper, the final aggregate keeps the
    * first visit) plus an order-independent id fold.
    *
    * The depth bound is load-bearing at scale: an unbounded closure on
    * a deg≈120 graph multiplies ~120x per level; two hops keeps the
    * working relation at deg² rows while still exercising the iterative
    * executor (UnionLoop) end to end. Deeper traversals belong to the
    * dedicated iterative shapes (q_dedup_cluster's large-star/small-star
    * CC, q_graph_pagerank's fixed-iteration loop). */
  private def reachability(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Materialize the symmetrized edge list ONCE (eager localCheckpoint,
    // same precedent as q_dedup_cluster's CC loop): a plain CTE would be
    // INLINED into the recursive step, re-running the lineitem self-join
    // + distinct on every UnionLoop iteration — measured 5.0 s at sf0.1,
    // ~4 edge-build executions (anchor scalar + one per level). The
    // iterative executor should walk a built graph, not rebuild it.
    // The repartition matters too: localCheckpoint PRESERVES the plan's
    // output partitioning, so the per-iteration equi-join on e.src finds
    // the edge side already hash-partitioned and only the (tiny) frontier
    // moves — the "partition the graph once, iterate over it" shape.
    val pairs = coEdges(s, d)
    // Per-invocation view name — same concurrent create/drop race as
    // triangles' oriented-edge view.
    val vn = s"graph_sym_${java.util.UUID.randomUUID.toString.take(8)}"
    pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
      .repartition($"src")
      .materialized
      .createOrReplaceTempView(vn)
    val out = s.sql(s"""
      WITH RECURSIVE reach(node, depth) AS (
        SELECT (SELECT min(src) FROM $vn), 0
        UNION ALL
        SELECT e.dst, r.depth + 1
        FROM reach r JOIN $vn e ON e.src = r.node
        WHERE r.depth < 2
      ),
      first_visit AS (
        SELECT node, CAST(min(depth) AS INT) AS min_depth
        FROM reach GROUP BY node
      )
      SELECT min_depth, COUNT(*) AS n_nodes, bit_xor(node) AS node_sig
      FROM first_visit GROUP BY min_depth ORDER BY min_depth""")
    // sql() analysis has already inlined the view's plan into `out`; drop
    // the catalog entry so the checkpointed blocks become weakly reachable
    // (ContextCleaner-collectable) once the caller drops the result. A
    // registered view would pin them for the whole session lifetime.
    s.catalog.dropTempView(vn)
    out
  }

  /** Neighbor-list cap for link prediction: wedge volume is
    * Σ C(min(deg, cap), 2), i.e. QUADRATIC in the cap once hubs saturate
    * it — 64 produced 40M wedge rows at sf0.1 (~10 s), 32 produces ~10M
    * (~3 s) with the same top-of-ranking. The cap is the declared
    * per-node neighbor sample; scale it with cluster budget, not corpus
    * size. */
  private[graft] val LinkPredCap = 32
  private[queries] val LinkPredTopK = 50

  /** Common-neighbor link prediction: rank NON-adjacent part pairs by how
    * many co-purchase neighbors they share — the classic "customers who
    * bought X also bought Y" recommendation score.
    *
    * Shape: per-node sorted neighbor lists CAPPED at [[LinkPredCap]]
    * (smallest ids — deterministic; uncapped common-neighbor counting IS
    * the all-wedges problem, and top-K under a documented per-node
    * sample is the standard large-graph variant). The capped adjacency
    * is re-exploded to (u, v) rows and CHECKPOINTED hash-partitioned on
    * u, so the wedge self-join runs codegen'd with ZERO exchanges (the
    * q_graph_triangles move — the row-local array-explode alternative
    * pushed 40M structs through interpreted HOF lambdas and was 4x
    * slower); the edge list is checkpointed once too, serving both the
    * symmetrize and the final anti-join instead of rebuilding the
    * lineitem self-join twice. Everything that shuffles is (node,
    * id-pair) skinny. */
  /** Adjacency-row threshold above which linkPred forces SHUFFLED HASH
    * joins instead of letting the planner pick. Below it (every test SF
    * and the canonical bench) the broadcast plans PlanAuditSpec pins
    * are strictly best, and the gate's only cost is the 0.12 s sizing
    * count (ProfileR18 lpcount; full-query A/B 1.04×). Above it the
    * planner flips to SortMergeJoin — correct on strategy but it SORTS
    * the multi-ten-million-row wedge stream and the pair-keyed anti
    * sides. Both joins are hash-friendly by construction: the wedge
    * join's sides are the SAME u-partitioned checkpoint (SHJ inherits
    * co-location, zero exchange, no sort), and the anti join builds on
    * the skinny edge list. 8M rows ≈ the ×10/×100 boundary: ×10 (6.4M)
    * keeps the measured-fine committed plan; at ×20 (12.8M) SHJ is
    * 0.95× of SMJ, at ×100 (64M) ~0.55–0.65× (per-arm minima 170 vs
    * 324 s) — SCALE_PROBE.md "r18 (optimization round)" section. */
  private[queries] val LinkPredShuffleJoinMinRows = 8000000L

  private def linkPred(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = coEdges(s, d).materialized
    val sym = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val capped = sym.groupBy($"src")
      .agg(slice(sort_array(collect_set($"dst")), 1, LinkPredCap).as("nbrs"))
      .select($"src".as("u"), explode($"nbrs").as("v"))
      .repartition($"u").materialized
    // One cheap count of the just-checkpointed blocks sizes the join
    // transport (the triangles scalar-vs-broadcast precedent).
    val shj = capped.count() > LinkPredShuffleJoinMinRows
    def h(df: DataFrame): DataFrame = if (shj) df.hint("shuffle_hash") else df
    h(capped.as("e1"))
      .join(h(capped.as("e2")), $"e1.u" === $"e2.u" && $"e1.v" < $"e2.v")
      .groupBy($"e1.v".as("node_a"), $"e2.v".as("node_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(h(pairs),
        $"node_a" === $"src" && $"node_b" === $"dst", "left_anti")
      .orderBy($"n_common".desc, $"node_a", $"node_b")
      .limit(LinkPredTopK)
  }

  val queries: Map[String, Q] = Map(
    "q_graph_pagerank" -> pagerank,
    "q_graph_triangles" -> triangles,
    "q_graph_reachability" -> reachability,
    "q_graph_linkpred" -> linkPred,
  )

  private val edgesCte =
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Fixed-point twin: `//` is DuckDB's integer floor division (= Spark's
    // `div` on the all-positive operands here); HUGEINT intermediates are
    // cast back to BIGINT to match Spark's long schema.
    "q_graph_pagerank" ->
      s"""$edgesCte,
         |edges AS (SELECT src, dst FROM pairs
         |          UNION ALL SELECT dst, src FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS node, ${Scale}::BIGINT AS r FROM deg),
         |c1 AS (SELECT e.dst AS node, SUM(r.r // d.deg) AS s
         |       FROM edges e JOIN r0 r ON e.src = r.node
         |                    JOIN deg d ON e.src = d.src
         |       GROUP BY 1),
         |r1 AS (SELECT node,
         |         CAST(${15L * Scale / 100} + (85 * s) // 100 AS BIGINT) AS r
         |       FROM c1),
         |c2 AS (SELECT e.dst AS node, SUM(r.r // d.deg) AS s
         |       FROM edges e JOIN r1 r ON e.src = r.node
         |                    JOIN deg d ON e.src = d.src
         |       GROUP BY 1),
         |r2 AS (SELECT node,
         |         CAST(${15L * Scale / 100} + (85 * s) // 100 AS BIGINT) AS r
         |       FROM c2)
         |SELECT node AS part, r AS rank_fp FROM r2
         |ORDER BY rank_fp DESC, part LIMIT 100""".stripMargin,
    "q_graph_triangles" ->
      s"""$edgesCte
         |SELECT COUNT(*) AS n_triangles
         |FROM pairs ab JOIN pairs bc ON ab.dst = bc.src
         |JOIN pairs ac ON ab.src = ac.src AND bc.dst = ac.dst""".stripMargin,
    "q_graph_linkpred" ->
      s"""$edgesCte,
         |sym AS (SELECT src, dst FROM pairs
         |        UNION ALL SELECT dst, src FROM pairs),
         |adj AS (
         |  SELECT src, list_sort(list(DISTINCT dst))[1:$LinkPredCap] AS nbrs
         |  FROM sym GROUP BY src),
         |w AS (
         |  SELECT nbrs[i+1] AS node_a, nbrs[j+1] AS node_b
         |  FROM adj,
         |    UNNEST(range(0, len(nbrs))) AS r1(i),
         |    UNNEST(range(0, len(nbrs))) AS r2(j)
         |  WHERE i < j),
         |c AS (
         |  SELECT node_a, node_b, COUNT(*) AS n_common
         |  FROM w GROUP BY node_a, node_b)
         |SELECT c.node_a, c.node_b, c.n_common FROM c
         |WHERE NOT EXISTS (SELECT 1 FROM pairs p
         |  WHERE p.src = c.node_a AND p.dst = c.node_b)
         |ORDER BY n_common DESC, node_a, node_b LIMIT $LinkPredTopK""".stripMargin,
    "q_graph_reachability" ->
      s"""${edgesCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |sym AS (SELECT src, dst FROM pairs
         |        UNION ALL SELECT dst AS src, src AS dst FROM pairs),
         |reach(node, depth) AS (
         |  SELECT (SELECT min(src) FROM sym), 0
         |  UNION ALL
         |  SELECT e.dst, r.depth + 1
         |  FROM reach r JOIN sym e ON e.src = r.node
         |  WHERE r.depth < 2),
         |first_visit AS (
         |  SELECT node, CAST(min(depth) AS INT) AS min_depth
         |  FROM reach GROUP BY node)
         |SELECT min_depth, COUNT(*) AS n_nodes, bit_xor(node) AS node_sig
         |FROM first_visit GROUP BY min_depth ORDER BY min_depth""".stripMargin,
  )
}
