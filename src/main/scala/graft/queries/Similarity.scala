package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import Catalog._

/** Vector-similarity search over the `embeddings` table (ArrayType(Float),
  * 64-dim) — SURVEY.md §2B "Vector similarity top-K" + the north-star ANN
  * family.
  *
  * Cross-engine determinism strategy:
  *  - `q_vector_topk` / `q_ann_lsh` quantize each component with
  *    floor(x * 1e7) — floor is a pure IEEE op (no decimal-string rounding
  *    ambiguity), so both engines produce identical int64 components, and
  *    all scoring is exact integer arithmetic (|dot| <= 64 * 1e14 << 2^63).
  *  - `q_vector_cosine` keeps real double math but forces an identical
  *    left-fold order: Spark `aggregate(zip_with(...))` and DuckDB
  *    `list_reduce(list_prepend(0.0, ...))` both compute
  *    ((0+p1)+p2)+...+pN, so the doubles are bit-identical.
  *
  * Scale notes (100 TB design point):
  *  - The query set is tiny and the vector table huge: brute force is ONE
  *    narrow pass — broadcast the queries, score per partition, and the
  *    per-group top-K window runs over |queries| x K candidates after a
  *    partial sort. No vector ever shuffles.
  *  - `q_ann_lsh` is the sub-linear path: 2 OR-ed bands of 6 deterministic
  *    hyperplanes bucket the table; candidates shuffle by (band, signature)
  *    — cost O(vectors x bands), join fan-out bounded by bucket size.
  *    Recall is tunable by band count; the oracle runs the same declared
  *    spec, so this is oracle-checked, not rows-only.
  */
object Similarity extends QueryGroup {

  /** Quantizer/LSH/IVF geometry, referenced by the queries, the DuckDB
    * oracle SQL fragments below, AND the [[Materialized]] artifact
    * fingerprints — single source of truth so a constant change here
    * self-invalidates stale on-disk artifacts and keeps both engines in
    * lockstep. */
  private[queries] val QuantScale: Long = 10000000L // floor(x * 1e7)
  private[queries] val PlaneMult: Long = 2654435761L // Knuth multiplicative
  private[queries] val AnchorOffset: Int = 100 // IVF anchors = planes 100+c
  private[queries] val NumCells: Int = 16
  private[queries] val NumProbes: Int = 2
  private val PlanesPerBand = 6
  private val LshBands = 2

  // --- Data-derived candidate geometry for the bucketed near-dup family.
  //
  // r12's measured scale bug: q_dedup_semantic/q_dedup_embedding shipped
  // COMPILE-TIME bucket geometry (16 IVF cells / 2⁶-bucket bands), so
  // within-bucket pair work — Θ(n²/buckets) by declared semantics — grew
  // quadratically and killed the driver at the ×100 probe. The knob the
  // scaladoc promised ("geometry ∝ √n") is now CODE: both queries derive
  // their bucket count from a cheap count(*) of the vector table (parquet
  // footer metadata — the q_graph_triangles bloom-sizing move) with the
  // SAME integer formula the DuckDB oracle computes from its own
  // count(*), so the hash gate is unchanged at every SF and the pair
  // work tracks each family's design point at any corpus size —
  // Θ(n^1.5) for IVF (√n cells balance the Θ(n·cells) assignment cost),
  // Θ(n·C) for LSH (buckets ∝ n, since hashing is only Θ(n·b)).

  /** Smallest power of two p ∈ [16, 4096] with p² ≥ n — i.e. cells ≈ √n,
    * expected cell size ≈ √n. Pure integer arithmetic (a float log2
    * could round differently across engines at exact powers). */
  private[queries] def semCellCount(n: Long): Int =
    (4 to 12).map(1 << _).find(p => p.toLong * p >= n).getOrElse(4096)

  /** Expected-bucket-size ceiling for the LSH near-dup grid (shared by
    * the DuckDB oracle's inlined formula). */
  private[queries] val EmbBucketTarget: Long = 64L

  /** Smallest hyperplane count b ∈ [6, 20] with 2^b · [[EmbBucketTarget]]
    * ≥ n — i.e. expected bucket size ≤ 64 rows, so within-bucket pair
    * work is Θ(n · C) LINEAR in corpus size. LSH can afford buckets ∝ n
    * where the IVF twin cannot: hashing costs only Θ(n · b) = Θ(n log n)
    * (b more sign dots per vector), whereas IVF assignment costs
    * Θ(n · cells), which forces [[semCellCount]]'s √n balance point.
    * (The first shipped derivation used 2^b ≈ √n for both — measured at
    * ×100: 470 s for this query, second-decade exponent 1.8, because
    * √n-sized buckets still hold Θ(n) pairs each.) At the test SFs
    * (n ≤ 4096) this is the historical 6, so committed bench numbers are
    * unchanged. */
  private[queries] def embBandBits(n: Long): Int =
    (6 to 20).find(b => (1L << b) * EmbBucketTarget >= n).getOrElse(20)

  /** Loud backstop behind the derived geometry: the ACTUAL within-bucket
    * pair count (Σ c·(c−1)/2 over buckets) must stay within a 32× slack
    * of the family's design point. Organic skew (a hot Voronoi cell, a
    * dominant sign pattern) degrades gradually and passes; a geometry
    * regression to Θ(n²) overshoots by orders of magnitude and fails the
    * query with the knob named, instead of grinding the driver dead the
    * way the fixed constants measurably did at ×100. */
  private def requirePairBudget(query: String, n: Long, pairs: Long,
      budget: Long): Unit =
    require(pairs <= budget,
      s"$query: $pairs within-bucket candidate pairs exceed the " +
        s"sub-quadratic budget $budget for n=$n — bucket geometry is " +
        "not tracking corpus size (semCellCount/embBandBits)")

  /** Θ(n^1.5) design point with 32× organic-skew slack — the IVF/√n
    * geometry (`q_dedup_semantic`). */
  private def sqrtPairBudget(n: Long): Long =
    32L * n * (math.sqrt(n.toDouble).toLong + 1) + 100000L

  /** Θ(n·C) design point with 32× slack — the bucket-bounded LSH
    * geometry (`q_dedup_embedding`): [[LshBands]] bands of expected
    * bucket ≤ [[EmbBucketTarget]] hold ≈ bands · n · C/2 pairs. */
  private def linearPairBudget(n: Long): Long =
    32L * LshBands * n * EmbBucketTarget / 2 + 100000L

  /** floor(x * 1e7) int64 quantization of a float-array column. */
  private[queries] def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * QuantScale.toDouble))

  /** Exact integer dot product of two quantized vectors — the codegen'd
    * [[org.apache.spark.sql.graft.ArrayDotLong]] expression (identical
    * fold to the HOF formulation `aggregate(zip_with(a,b,_*_),0,_+_)` it
    * replaced; the interpreted HOF walk cost ~2 µs/element). */
  private def dotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.dotLong(a, b)

  /** Left-fold double dot product (bit-identical to DuckDB list_reduce
    * AND to the HOF fold: IEEE multiply-then-add per element, in index
    * order — codegen'd, not reassociated). */
  private def dotDouble(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.dotDouble(a, b)

  private val NQueries = 5
  private val TopK = 10
  private[queries] val ProjOffset: Int = 200 // planeComponent rows 200+j
  private[queries] val ProjDims: Int = 8     // JL target dimensionality

  /** Brute-force inner-product top-[[TopK]] per query — the exact
    * baseline every ANN variant is measured against (shared by
    * `q_vector_topk` and the recall contract `q_ann_recall`). */
  private def exactTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("qv"))
    val queries = broadcast(
      vecs.filter($"vec_id" < NQueries)
        .select($"vec_id".as("query_id"), $"qv".as("q")))
    queries.join(vecs, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        dotInt($"q", $"qv").as("dot"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")))
      .filter($"rnk" <= TopK)
      .select($"query_id", $"rnk", $"neighbor_id", $"dot")
  }

  private def vectorTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    exactTopK(s, d).orderBy($"query_id", $"rnk")
  }

  /** Brute-force cosine top-5 with real double scores (identical fold
    * order in both engines => bit-exact doubles). */
  private def vectorCosine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding",
        dotDouble($"embedding", $"embedding").as("norm2"))
    val queries = broadcast(
      vecs.filter($"vec_id" < NQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"norm2".as("qnorm2")))
    queries.join(vecs, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (dotDouble($"qe", $"embedding") / (sqrt($"qnorm2") * sqrt($"norm2")))
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"neighbor_id")))
      .filter($"rnk" <= 5)
      .select($"query_id", $"rnk", $"neighbor_id", $"cosine")
      .orderBy($"query_id", $"rnk")
  }

  /** Deterministic hyperplane component: c(plane, i) for the LSH bands.
    * Knuth multiplicative constant; all positive before the mod, so Spark
    * and DuckDB agree on `%`. Keep for DATA-DERIVED plane ids (the
    * semantic-dedup anchor relation); constant plane ids should use
    * [[planeLiteral]] instead. */
  private def planeComponent(plane: Column, i: Column): Column =
    (plane * 64L + i) * PlaneMult % 4294967296L - 2147483648L

  /** The same c(plane, ·) stream for a CONSTANT plane id, computed once
    * on the driver and shipped as a 64-element array literal. The Column
    * formulation `transform(sequence(0, 63), i => planeComponent(p, i))`
    * is NOT constant-folded (higher-order functions are never foldable),
    * so every row rebuilt the plane through 64 interpreted lambda evals
    * per dot — measured r17 at sf0.1 as 39% of ivfAssignment's wall
    * (0.36 → 0.22 s with literals), multiplied across every signature
    * consumer. Same integer arithmetic, positive before the mod, so the
    * values are identical by construction and the DuckDB oracle's SQL
    * formula keeps matching. */
  private def planeLiteral(plane: Int): Column =
    typedLit((0 until 64).map(i =>
      (plane * 64L + i) * PlaneMult % 4294967296L - 2147483648L))

  /** Signature of one b-plane band: bit j = (dot(qv, plane_{band·b+j}) > 0).
    * The ANN queries use the fixed [[PlanesPerBand]]; `q_dedup_embedding`
    * passes a data-derived b ([[embBandBits]]). */
  private def bandSigN(qv: Column, band: Int, b: Int): Column =
    (0 until b).map { j =>
      when(dotInt(qv, planeLiteral(band * b + j)) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def bandSig(qv: Column, band: Int): Column =
    bandSigN(qv, band, PlanesPerBand)

  /** LSH candidate pairs (query_id, q, neighbor_id, qv): vectors sharing
    * at least one hyperplane-band bucket with a query — shared by
    * `q_ann_lsh` (which re-scores them) and the recall contract
    * `q_ann_recall` (which only needs membership). */
  private def lshCandidates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("qv"))
    val sigs = vecs
      .select($"vec_id", $"qv",
        posexplode(array((0 until LshBands).map(bandSig($"qv", _)): _*)))
      .toDF("vec_id", "qv", "band", "sig")
    val qs = broadcast(
      sigs.filter($"vec_id" < NQueries)
        .select($"vec_id".as("query_id"), $"qv".as("q"),
          $"band".as("qband"), $"sig".as("qsig")))
    qs
      .join(sigs, $"qband" === $"band" && $"qsig" === $"sig" &&
        $"vec_id" =!= $"query_id")
      .select($"query_id", $"q", $"vec_id".as("neighbor_id"), $"qv")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** LSH-bucketed ANN top-3: candidates share at least one of two 6-bit
    * hyperplane-band buckets with the query; exact integer re-scoring. */
  private def annLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lshCandidates(s, d)
      .select($"query_id", $"neighbor_id", dotInt($"q", $"qv").as("dot"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")))
      .filter($"rnk" <= 3)
      .select($"query_id", $"rnk", $"neighbor_id", $"dot")
      .orderBy($"query_id", $"rnk")
  }

  /** IVF-style ANN: a deterministic coarse quantizer (16 fixed anchor
    * vectors from the same hyperplane formula) assigns every vector to its
    * nearest cell by exact integer dot; queries probe their top-2 cells
    * and re-rank exactly within them. The classic inverted-file layout:
    * at 100 TB the cell assignment is precomputed and the probe touches
    * 2/16 of the data. Deterministic end to end, so oracle-checked. */
  // Anchor c (0..15) reuses planeComponent rows 100+c (distinct from the
  // LSH planes); dot(qv, anchor_c) is exact integer math.
  private def anchorDot(qv: Column, c: Int): Column =
    dotInt(qv, planeLiteral(AnchorOffset + c))

  private def cellRank(qv: Column): Column =
    sort_array(array((0 until NumCells).map(c =>
      struct((-anchorDot(qv, c)).as("negdot"), lit(c).as("cell"))): _*))

  /** The inverted file: (vec_id, qv, cell) with every vector assigned to
    * its top-1 coarse cell — the artifact a 100 TB deployment precomputes
    * and stores partitioned by cell ([[Materialized]] does exactly that). */
  private[queries] def ivfAssignment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("qv"))
      .withColumn("cells", cellRank($"qv"))
      .select($"vec_id", $"qv", $"cells"(0)("cell").as("cell"))
  }

  /** Query-side probes: each query vector fanned out to its top-2 cells. */
  private[queries] def ivfProbes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .filter($"vec_id" < NQueries)
      .select($"vec_id", quantize($"embedding").as("qv"))
      .withColumn("cells", cellRank($"qv"))
      .select($"vec_id".as("query_id"), $"qv".as("q"),
        explode(array((0 until NumProbes).map(i => $"cells"(i)("cell")): _*))
          .as("cell"))
  }

  /** Probe join + exact re-rank over an inverted-file table. */
  private[queries] def ivfScore(probes: DataFrame,
      table: DataFrame): DataFrame = {
    val s = probes.sparkSession
    import s.implicits._
    broadcast(probes)
      .join(table, Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        dotInt($"q", $"qv").as("dot"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"dot".desc, $"neighbor_id")))
      .filter($"rnk" <= 3)
      .select($"query_id", $"rnk", $"neighbor_id", $"dot")
      .orderBy($"query_id", $"rnk")
  }

  private def annIvf(s: SparkSession, d: String): DataFrame =
    ivfScore(ivfProbes(s, d), ivfAssignment(s, d))

  /** Embedding-cosine near-dup PAIRS — completes the dedup family (exact /
    * MinHash-Jaccard / SimHash / n-gram live in [[Dedup]]): all (a < b)
    * pairs sharing at least one hyperplane-LSH band bucket, verified by
    * exact cosine >= [[CosDupThreshold]]. Approximate-by-design like every
    * LSH dedup (a pair colliding in no band is never considered); the
    * oracle mirrors the banding, so the check is exact over the declared
    * semantics.
    *
    * Scale: bucket self-join shuffles O(n x bands) skinny (band, sig, id)
    * rows — never all-pairs; within-bucket pair count is Θ(n²/2^b), and
    * b — the planes per band — is DERIVED from the corpus count
    * ([[embBandBits]]: 2^b buckets ≈ n/[[EmbBucketTarget]], so expected
    * bucket size is a CONSTANT and pair work is Θ(n·C) linear; the same
    * integer formula runs in the oracle's count(*) subquery. The fixed
    * 2⁶ grid this replaces was a measured ×100 driver-killer, and the
    * intermediate √n-bucket derivation still measured 470 s /
    * exponent 1.8 in the second decade — √n buckets hold Θ(n) pairs
    * each, a balance LSH does not need since hashing is Θ(n·b), unlike
    * the IVF twin's Θ(n·cells) assignment). Like the semantic
    * twin, the sub-quadratic claim is ENFORCED: the signature relation
    * is materialized once and its actual within-bucket pair count is
    * checked against the Θ(n·C) budget before the self-join runs.
    *
    * Candidate scoring is INLINE in the bucket self-join: the signature
    * relation carries (embedding, norm2), both join sides share the
    * materialized hash partitioning on (band, sig) — a zero-exchange
    * sort-merge self-join — and the cosine filter runs in the join's own
    * projection, so candidate pairs are compute only (one codegen'd
    * 64-wide double dot each) and NEVER shuffle; only true duplicates
    * (output-linear) reach the dedup exchange. The first shipped shape
    * materialized the skinny pair list, dedup-shuffled it, and joined
    * vectors back on id — three shuffles of the CANDIDATE relation,
    * measured 261 s at ×100 on this corpus, where clustered embeddings
    * stack within-bucket pairs 18× above the uniform expectation
    * (182M pairs); inline scoring makes the same 182M pairs a streamed
    * in-partition scan. */
  private def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.core.Checkpoints.MaterializeOps
    val n = Tables.embeddings(s, d).count() // parquet metadata count
    val b = embBandBits(n)
    val sigs = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding",
        dotDouble($"embedding", $"embedding").as("norm2"),
        quantize($"embedding").as("qv"))
      .select($"vec_id", $"embedding", $"norm2",
        posexplode(array((0 until LshBands).map(bandSigN($"qv", _, b)): _*)))
      .toDF("vec_id", "embedding", "norm2", "band", "sig")
      .repartition($"band", $"sig")
      .materialized
    val pairs = sigs.groupBy($"band", $"sig").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("p"))
      .head().getLong(0)
    requirePairBudget("q_dedup_embedding", n, pairs, linearPairBudget(n))
    sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (dotDouble(col("x.embedding"), col("y.embedding")) /
          (sqrt(col("x.norm2")) * sqrt(col("y.norm2")))).as("cosine"))
      .filter($"cosine" >= CosDupThreshold)
      .distinct() // a pair may collide in several bands; scores identical
      .orderBy($"vec_a", $"vec_b")
  }

  /** Near-dup cosine floor: random testdata tops out ~0.55, so 0.30 keeps
    * the result nonempty yet selective at every SF. */
  private[queries] val CosDupThreshold = 0.30

  /** Anchor-plane row offset for the semantic-dedup coarse quantizer —
    * far above every other consumer of the shared `planeComponent`
    * stream (LSH planes 0..39 — b ≤ 20 over 2 bands — IVF anchors
    * 100..115, JL rows 200..207),
    * so up to 4096 data-derived cells never alias another family. */
  private[queries] val SemAnchorOffset: Int = 1000000

  /** The semantic-dedup coarse quantizer as a TINY broadcast relation
    * (cell, aq): with data-derived cell counts up to 4096, inlining one
    * anchor-dot EXPRESSION per cell (the fixed-16 `cellRank` shape)
    * would blow codegen out; a broadcast nested-loop over `cells` rows
    * keeps the per-vector work a codegen'd [[dotInt]] loop instead. */
  private def semAnchors(s: SparkSession, cells: Int): DataFrame = {
    import s.implicits._
    s.range(cells).select($"id".cast("int").as("cell"),
      transform(sequence(lit(0), lit(63)),
        i => planeComponent(lit(SemAnchorOffset) + $"id", i)).as("aq"))
  }

  /** Nearest-anchor cell assignment at a data-derived cell count:
    * (vec_id, qv, cell). One broadcast cross join (n × cells skinny
    * rows, consumed map-side by the partial argmin agg — at cells ≈ √n
    * the assignment work is Θ(n^1.5) dots, same order as the pair scan
    * it enables) and ONE shuffle of n collapsed rows. */
  private[queries] def semAssignment(s: SparkSession, d: String,
      cells: Int): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("qv"))
      .crossJoin(broadcast(semAnchors(s, cells)))
      .select($"vec_id", $"qv",
        struct((-dotInt($"qv", $"aq")).as("negdot"), $"cell").as("sc"))
      .groupBy($"vec_id")
      .agg(min($"sc").as("sc"), first($"qv").as("qv"))
      .select($"vec_id", $"qv", $"sc.cell".as("cell"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space coarsely, compare pairs ONLY within a cluster, and
    * keep one representative per near-dup star — the published recipe for
    * pruning web-scale corpora where global all-pairs is impossible.
    * The clustering is nearest-of-[[semCellCount]] anchors from the same
    * deterministic plane family as the IVF/LSH queries, with the cell
    * count DERIVED from the corpus (cells ≈ √n, identical integer
    * formula in the DuckDB oracle's own count(*) subquery — r12 shipped
    * a fixed 16 and measurably killed the driver at ×100). The duplicate
    * test is exact integer arithmetic over quantized vectors
    * (cos ≥ 3/10 ⇔ dot > 0 ∧ 100·dot² ≥ 9·|a|²·|b|², with the squares in
    * DECIMAL(38,0) ↔ HUGEINT — no doubles anywhere), and the keep policy
    * is deterministic min-id: a vector is removed iff some smaller-id
    * vector in its cell clears the threshold against it. Output is the
    * full verdict relation (cell, vec_id, kept).
    *
    * Scale: assignment is Θ(n·cells) = Θ(n^1.5) broadcast-local dots;
    * the within-cell self-join is Θ(Σ |cell|²) ≈ Θ(n^1.5) — and that
    * claim is ENFORCED, not assumed: the assignment is materialized
    * once (mode-selectable, [[graft.core.Checkpoints]]), its actual
    * within-cell pair count is checked against a 32× slack of the
    * design point, and a geometry regression fails loudly with the knob
    * named. The verdict join back is a skinny distinct of removed ids. */
  private def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.core.Checkpoints.MaterializeOps
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val n = Tables.embeddings(s, d).count() // parquet metadata count
    val cells = semCellCount(n)
    val asg = semAssignment(s, d, cells)
      .select($"vec_id", $"qv", $"cell", dotInt($"qv", $"qv").as("n2"))
      .repartition($"cell")
      .materialized
    val pairs = asg.groupBy($"cell").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("p"))
      .head().getLong(0)
    requirePairBudget("q_dedup_semantic", n, pairs, sqrtPairBudget(n))
    val removed = asg.as("a").join(asg.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"),
        dotInt(col("a.qv"), col("b.qv")).as("dot"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
      .filter($"dot" > 0 &&
        $"dot".cast(d38) * $"dot" * 100 >= $"na".cast(d38) * $"nb" * 9)
      .select($"vec_id").distinct()
    asg.select($"cell", $"vec_id")
      .join(removed.withColumn("rm", lit(1L)), Seq("vec_id"), "left")
      .select($"cell", $"vec_id",
        when($"rm".isNull, 1L).otherwise(0L).as("kept"))
      .orderBy($"cell", $"vec_id")
  }

  /** Per-label centroid (elementwise mean) of the embedding column — the
    * aggregation step of k-means / class-prototype computation. Output is
    * LONG (label, dim-position) rows, not a vector column: the driver
    * comparator can't hash LIST cells, and at scale the skinny shape is
    * what you want anyway (one partial-agg shuffle keyed (label, pos),
    * map-side combined; the 4-byte floats never move as whole vectors).
    * Determinism: components quantize to int64 (floor(x*1e7), exact in
    * both engines), the integer SUM is order-independent, and the final
    * divide is one double op. */
  private def embedCentroid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"label", posexplode(quantize($"embedding")))
      .toDF("label", "pos", "q")
      .groupBy($"label", $"pos".cast("long").as("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum($"q".cast("long")) /
          (count(lit(1)) * QuantScale).cast("double")).as("centroid"))
      .orderBy($"label", $"pos")
  }

  /** Int8 scalar quantization of the embedding column — the storage form
    * a 100 TB ANN corpus actually ships (float32 → int8 is a 4× smaller
    * scan + cache footprint at a recall cost this query measures).
    * Per-dimension symmetric scale `absmax = max |component|` (the train
    * pass), code `c = trunc(q·127 / absmax) ∈ [-127, 127]`, then the
    * eval pass reports exact reconstruction error per dimension: row
    * count, saturated-code count, Σ|q−q̂| and max |q−q̂|, and the relative
    * error ×1e6 against the dimension's own scale.
    *
    * Scale shape: ONE positional explode (64 skinny long rows per
    * vector), a map-side-combined 64-row absmax agg, absmax broadcast
    * back (no shuffle for the join), then a second map-side 64-row agg —
    * vectors never shuffle and nothing wider than (pos, q) ever moves.
    * All arithmetic is int64 via the shared floor(x·1e7) quantizer;
    * error sums ride DECIMAL(38,0) (Σ|err| is Θ(rows·absmax) and clears
    * int64 long before 100 TB), and every division is integer `div` —
    * truncation toward zero, verified identical in both engines. */
  private def embedQuantize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = Tables.embeddings(s, d)
      .select(posexplode(quantize($"embedding")))
      .toDF("pos", "qd")
      .select($"pos".cast("long").as("pos"), $"qd".cast("long").as("q"))
    val scale = q.groupBy($"pos")
      .agg(greatest(max(abs($"q")), lit(1L)).as("absmax"))
    q.join(broadcast(scale), "pos")
      .select($"pos", $"absmax",
        expr("q * 127 div absmax").as("c"),
        expr("abs(q - ((q * 127 div absmax) * absmax div 127))").as("err"))
      .groupBy($"pos", $"absmax")
      .agg(count(lit(1)).as("n"),
        sum(($"c" === 127L || $"c" === -127L).cast("long")).as("n_sat"),
        sum($"err".cast(d38)).as("serr"),
        max($"err").as("max_abs_err"))
      .select($"pos", $"absmax", $"n", $"n_sat",
        $"serr".cast("long").as("sum_abs_err"), $"max_abs_err",
        expr("CAST((serr * 1000000) div (CAST(n AS DECIMAL(38,0)) * absmax) AS BIGINT)")
          .as("rel_err_fp"))
      .orderBy($"pos")
  }

  private val KmeansK = 8
  private val KmeansIters = 2

  /** One Lloyd's assignment step: nearest centroid by exact int64
    * squared distance, expanded as |v|² − 2·v·c + |c|² so the cross term
    * is the codegen'd [[dotInt]] and the self terms are computed ONCE per
    * vector/centroid instead of per pair. Centroids broadcast (K rows);
    * the argmin is a per-vector window, tie-broken by centroid id. */
  private def kmeansAssign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"dist", $"cid")
    vecs.crossJoin(broadcast(cents))
      .select($"vec_id", $"q",
        ($"self" - lit(2L) * dotInt($"q", $"cq") + $"cself").as("dist"),
        $"cid")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"q", $"cid")
  }

  /** Recompute integer centroids: per-(cluster, position) floor(sum/n) —
    * floor of one exact double divide, the only non-integer op, identical
    * in both engines. Skinny (cid, pos) shuffle, then K tiny rows. */
  private def kmeansRecenter(asg: DataFrame): DataFrame = {
    val s = asg.sparkSession
    import s.implicits._
    asg.select($"cid", posexplode($"q"))
      .toDF("cid", "pos", "qc")
      .groupBy($"cid", $"pos")
      .agg(floor(sum($"qc").cast("double") / count(lit(1))).as("c"))
      .groupBy($"cid")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
        _.getField("c")).as("cq"))
      .select($"cid", $"cq", dotInt($"cq", $"cq").as("cself"))
  }

  /** Distributed k-means over the embedding column — [[KmeansIters]]
    * Lloyd's iterations from deterministic anchors (vec_id < K), entirely
    * integer-quantized so the DuckDB oracle reproduces every assignment
    * exactly. Unlike [[graft.queries.Dedup]]'s CC loop the iteration
    * count is FIXED, so the whole computation is one lazy plan — no
    * driver actions, no checkpoints; at 100 TB each iteration is one
    * broadcast-join pass over the vectors, a per-vector argmin shuffle,
    * and a K×dim-sized recenter agg. */
  /** Final per-vector assignment (vec_id, q, cid) after [[KmeansIters]]
    * Lloyd's iterations — the ground truth the q_kmeans summary
    * aggregates; exposed so KmeansAssignSpec can check the summary
    * against actual membership instead of trusting the aggregation. */
  private[queries] def kmeansAssignments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("q"))
      .withColumn("self", dotInt($"q", $"q"))
    var cents = e.filter($"vec_id" < KmeansK)
      .select($"vec_id".as("cid"), $"q".as("cq"), $"self".as("cself"))
    var asg = kmeansAssign(e, cents)
    for (_ <- 2 to KmeansIters) {
      cents = kmeansRecenter(asg)
      asg = kmeansAssign(e, cents)
    }
    asg
  }

  private def kmeans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    kmeansAssignments(s, d).select($"cid".as("cluster"), $"vec_id")
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_members"), min($"vec_id").as("first_vec"))
      .orderBy($"cluster")
  }

  /** Johnson–Lindenstrauss random projection to [[ProjDims]] dimensions —
    * the dimensionality-reduction pass a vector pipeline runs before
    * LSH/IVF indexing when the native width is too wide to band cheaply.
    * The projection matrix is the Achlioptas ±-style dense integer family
    * drawn from the SAME deterministic `planeComponent` stream as the LSH
    * hyperplanes and IVF anchors (rows [[ProjOffset]]+j) — no RNG, no
    * stored matrix, both engines synthesize identical coefficients.
    *
    * Row-local and scan-shaped: [[ProjDims]] codegen'd exact integer dots
    * per vector, a posexplode, and the output sort — nothing shuffles at
    * any scale but the result, which is ProjDims/64ths the input width. */
  private def embedProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val comps = (0 until ProjDims).map(jd =>
      dotInt($"qv", planeLiteral(ProjOffset + jd)))
    Tables.embeddings(s, d)
      .select($"vec_id", quantize($"embedding").as("qv"))
      .select($"vec_id", posexplode(array(comps: _*)).as(Seq("out_dim", "c")))
      .select($"vec_id", $"out_dim".cast("int").as("out_dim"), $"c")
      .orderBy($"vec_id", $"out_dim")
  }

  /** The K the LSH path actually serves (`q_ann_lsh` re-ranks to 3). */
  private val AnnK = 3

  /** ANN recall@[[AnnK]] CONTRACT, per method and query: the fraction of
    * the exact top-[[AnnK]] each ANN candidate generator (LSH bands, IVF
    * top-2 probes) recovers — the number an ANN deployment actually
    * publishes, measured at the K it serves. Both sides are
    * deterministic, so unlike a typical recall benchmark this is
    * oracle-gated: hash-equal recall values in both engines, and a
    * regression in the banding/probe math fails verify rather than
    * silently degrading search quality.
    *
    * Expect LOW absolute recall here: the synthetic embeddings are
    * near-uniform — the known worst case for ANN (no cluster structure
    * for cells or hyperplanes to exploit). The contract's job is to PIN
    * that floor so any change to the signature math shows up as a diff,
    * not to showcase recall a structured corpus would give. Shape: two
    * skinny (query, neighbor) membership relations left-joined to the
    * exact baseline; one |methods|×|queries|-row summary agg. */
  private def annRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val exact = exactTopK(s, d)
      .filter($"rnk" <= AnnK).select($"query_id", $"neighbor_id")
    val lsh = lshCandidates(s, d)
      .select(lit("lsh").as("method"), $"query_id", $"neighbor_id")
    val ivf = ivfProbes(s, d)
      .join(ivfAssignment(s, d).select($"vec_id", $"cell"), "cell")
      .filter($"vec_id" =!= $"query_id")
      .select(lit("ivf").as("method"), $"query_id",
        $"vec_id".as("neighbor_id"))
    val cands = lsh.unionByName(ivf)
      .dropDuplicates("method", "query_id", "neighbor_id")
      .withColumn("hit", lit(1L))
    val perMethod = Seq("ivf", "lsh").toDF("method")
    exact.crossJoin(broadcast(perMethod))
      .join(cands, Seq("method", "query_id", "neighbor_id"), "left")
      .groupBy($"method", $"query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .select($"method", $"query_id", $"n_exact", $"n_hit",
        ($"n_hit".cast("double") / $"n_exact".cast("double")).as("recall"))
      .orderBy($"method", $"query_id")
  }

  val queries: Map[String, Q] = Map(
    "q_ann_recall" -> annRecall,
    "q_embed_project" -> embedProject,
    "q_embed_centroid" -> embedCentroid,
    "q_embed_quantize" -> embedQuantize,
    "q_kmeans" -> kmeans,
    "q_vector_topk" -> vectorTopK,
    "q_vector_cosine" -> vectorCosine,
    "q_ann_lsh" -> annLsh,
    "q_ann_ivf" -> annIvf,
    "q_dedup_embedding" -> dedupEmbedding,
    "q_dedup_semantic" -> dedupSemantic,
  )

  // DuckDB fragments ------------------------------------------------------

  /** Quantized int64 vector of the embedding column. */
  private[queries] val duckQuant =
    s"[CAST(floor(CAST(x AS DOUBLE) * $QuantScale.0) AS BIGINT) FOR x IN embedding]"

  /** Exact integer dot of two quantized list columns a/b (1-based index). */
  private[queries] def duckDotInt(a: String, b: String): String =
    s"CAST(list_sum([$a[i+1] * $b[i+1] FOR i IN range(0, 64)]) AS BIGINT)"

  /** Left-fold double dot of two float-list columns (bit-identical to the
    * Spark aggregate fold). */
  private def duckDotDouble(a: String, b: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0.0 AS DOUBLE),
       |    [CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)
       |     FOR i IN range(0, 64)]),
       |  (acc, x) -> acc + x)""".stripMargin

  /** One unrolled Lloyd's step against centroid CTE `c$idx`: exact
    * integer distances (the Σ(a−b)² form — integer-identical to the
    * Spark side's |a|²−2ab+|b|² expansion), argmin via the same
    * (dist, cid) window order. */
  private def duckKmeansStep(idx: Int): String =
    s"""d$idx AS (
       |  SELECT e.vec_id, c.cid,
       |    list_sum([(e.q[i+1] - c.cq[i+1]) * (e.q[i+1] - c.cq[i+1])
       |              FOR i IN range(0, 64)]) AS dist
       |  FROM e, c$idx c
       |), a$idx AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
       |  FROM d$idx
       |), m$idx AS (SELECT vec_id, cid FROM a$idx WHERE rn = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ann_recall" ->
      s"""WITH q AS (
         |  SELECT vec_id, $duckQuant qv FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id query_id, b.vec_id neighbor_id,
         |    ${duckDotInt("a.qv", "b.qv")} dot
         |  FROM q a JOIN q b ON a.vec_id < $NQueries
         |    AND b.vec_id <> a.vec_id
         |), ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) rnk
         |    FROM scored) t
         |  WHERE rnk <= $AnnK
         |), sigs AS (
         |  SELECT vec_id, band,
         |    CAST(list_sum([
         |      CASE WHEN CAST(list_sum([
         |          qv[i+1] * (((band*$PlanesPerBand + j)*64 + i) * $PlaneMult % 4294967296
         |                     - 2147483648)
         |          FOR i IN range(0, 64)]) AS BIGINT) > 0
         |      THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
         |      FOR j IN range(0, $PlanesPerBand)]) AS BIGINT) sig
         |  FROM q, (SELECT unnest(range(0, $LshBands)) band) b
         |), lcand AS (
         |  SELECT DISTINCT qs.vec_id query_id, ns.vec_id neighbor_id
         |  FROM sigs qs JOIN sigs ns
         |    ON qs.band = ns.band AND qs.sig = ns.sig
         |    AND qs.vec_id < $NQueries AND ns.vec_id <> qs.vec_id
         |), ad AS (
         |  SELECT vec_id, cell,
         |    CAST(list_sum([
         |      qv[i+1] * ((($AnchorOffset + cell)*64 + i) * $PlaneMult % 4294967296
         |                 - 2147483648)
         |      FOR i IN range(0, 64)]) AS BIGINT) dot
         |  FROM q, (SELECT unnest(range(0, $NumCells)) cell) c
         |), ranked AS (
         |  SELECT vec_id, cell, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY dot DESC, cell) rn
         |  FROM ad
         |), assign AS (
         |  SELECT vec_id, cell FROM ranked WHERE rn = 1
         |), icand AS (
         |  SELECT DISTINCT p.vec_id query_id, t.vec_id neighbor_id
         |  FROM ranked p JOIN assign t
         |    ON p.rn <= $NumProbes AND p.vec_id < $NQueries
         |    AND p.cell = t.cell AND t.vec_id <> p.vec_id
         |), allc AS (
         |  SELECT 'lsh' AS method, query_id, neighbor_id FROM lcand
         |  UNION ALL
         |  SELECT 'ivf', query_id, neighbor_id FROM icand
         |), exm AS (
         |  SELECT m.method, e.query_id, e.neighbor_id
         |  FROM ex e, (SELECT unnest(['ivf', 'lsh']) AS method) m
         |)
         |SELECT exm.method, exm.query_id, COUNT(*) AS n_exact,
         |  CAST(COUNT(c.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(COUNT(c.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
         |FROM exm LEFT JOIN allc c
         |  ON c.method = exm.method AND c.query_id = exm.query_id
         |  AND c.neighbor_id = exm.neighbor_id
         |GROUP BY exm.method, exm.query_id
         |ORDER BY exm.method, exm.query_id""".stripMargin,
    "q_embed_project" ->
      s"""WITH q AS (SELECT vec_id, $duckQuant qv FROM embeddings)
         |SELECT vec_id, CAST(jd AS INTEGER) AS out_dim,
         |  CAST(list_sum([
         |    qv[i+1] * ((($ProjOffset + jd)*64 + i) * $PlaneMult % 4294967296
         |               - 2147483648)
         |    FOR i IN range(0, 64)]) AS BIGINT) AS c
         |FROM q, (SELECT unnest(range(0, $ProjDims)) jd) d
         |ORDER BY vec_id, out_dim""".stripMargin,
    "q_kmeans" ->
      s"""WITH e AS (SELECT vec_id, $duckQuant AS q FROM embeddings),
         |c1 AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < $KmeansK),
         |${duckKmeansStep(1)},
         |s2 AS (
         |  SELECT m.cid, t.i,
         |    CAST(floor(CAST(SUM(e.q[t.i+1]) AS DOUBLE) / COUNT(*)) AS BIGINT)
         |      AS c
         |  FROM m1 m JOIN e USING (vec_id), UNNEST(range(0, 64)) AS t(i)
         |  GROUP BY m.cid, t.i
         |),
         |c2 AS (SELECT cid, list(c ORDER BY i) AS cq FROM s2 GROUP BY cid),
         |${duckKmeansStep(2)}
         |SELECT cid AS cluster, COUNT(*) AS n_members,
         |  MIN(vec_id) AS first_vec
         |FROM m2 GROUP BY cid ORDER BY cluster""".stripMargin,
    // HUGEINT guard: DuckDB's SUM(BIGINT) returns int128; the sum stays
    // under 2^53 so the cast to DOUBLE is exact before the one divide.
    "q_embed_centroid" ->
      s"""SELECT label, i AS pos, COUNT(*) AS n_vecs,
         |  CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE)
         |    * $QuantScale.0) AS BIGINT)) AS DOUBLE)
         |    / (COUNT(*) * $QuantScale) AS centroid
         |FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
         |GROUP BY label, i ORDER BY label, pos""".stripMargin,
    // Same trunc-toward-zero integer `//` chain as the Spark `div`s;
    // SUM(err) is HUGEINT, matching the Spark DECIMAL(38,0) error sum.
    "q_embed_quantize" ->
      s"""WITH q AS (
         |  SELECT CAST(i AS BIGINT) AS pos,
         |    CAST(floor(CAST(embedding[i+1] AS DOUBLE) * $QuantScale.0)
         |      AS BIGINT) AS q
         |  FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)),
         |s AS (
         |  SELECT pos, GREATEST(MAX(ABS(q)), 1) AS absmax
         |  FROM q GROUP BY pos),
         |e AS (
         |  SELECT q.pos, s.absmax,
         |    q.q * 127 // s.absmax AS c,
         |    ABS(q.q - ((q.q * 127 // s.absmax) * s.absmax // 127)) AS err
         |  FROM q JOIN s USING (pos))
         |SELECT pos, absmax, COUNT(*) AS n,
         |  CAST(SUM(CAST(c = 127 OR c = -127 AS BIGINT)) AS BIGINT)
         |    AS n_sat,
         |  CAST(SUM(err) AS BIGINT) AS sum_abs_err,
         |  MAX(err) AS max_abs_err,
         |  CAST(SUM(err) * 1000000 // (COUNT(*) * absmax) AS BIGINT)
         |    AS rel_err_fp
         |FROM e GROUP BY pos, absmax ORDER BY pos""".stripMargin,
    "q_vector_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id, $duckQuant qv FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id query_id, b.vec_id neighbor_id,
         |    ${duckDotInt("a.qv", "b.qv")} dot
         |  FROM q a JOIN q b ON a.vec_id < $NQueries
         |    AND b.vec_id <> a.vec_id
         |)
         |SELECT query_id, rnk, neighbor_id, dot FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) rnk
         |  FROM scored) t
         |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
    "q_vector_cosine" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding,
         |    ${duckDotDouble("embedding", "embedding")} norm2
         |  FROM embeddings
         |), scored AS (
         |  SELECT a.vec_id query_id, b.vec_id neighbor_id,
         |    ${duckDotDouble("a.embedding", "b.embedding")}
         |      / (sqrt(a.norm2) * sqrt(b.norm2)) cosine
         |  FROM v a JOIN v b ON a.vec_id < $NQueries
         |    AND b.vec_id <> a.vec_id
         |)
         |SELECT query_id, rnk, neighbor_id, cosine FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) rnk
         |  FROM scored) t
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH q AS (
         |  SELECT vec_id, $duckQuant qv FROM embeddings
         |), ad AS (
         |  SELECT vec_id, cell,
         |    CAST(list_sum([
         |      qv[i+1] * ((($AnchorOffset + cell)*64 + i) * $PlaneMult % 4294967296
         |                 - 2147483648)
         |      FOR i IN range(0, 64)]) AS BIGINT) dot
         |  FROM q, (SELECT unnest(range(0, $NumCells)) cell) c
         |), ranked AS (
         |  SELECT vec_id, cell, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY dot DESC, cell) rn
         |  FROM ad
         |), assign AS (
         |  SELECT vec_id, cell FROM ranked WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id query_id, cell FROM ranked
         |  WHERE rn <= $NumProbes AND vec_id < $NQueries
         |), cand AS (
         |  SELECT p.query_id, t.vec_id neighbor_id
         |  FROM probes p JOIN assign t
         |    ON p.cell = t.cell AND t.vec_id <> p.query_id
         |), scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    ${duckDotInt("a.qv", "b.qv")} dot
         |  FROM cand c JOIN q a ON a.vec_id = c.query_id
         |              JOIN q b ON b.vec_id = c.neighbor_id
         |)
         |SELECT query_id, rnk, neighbor_id, dot FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) rnk
         |  FROM scored) t
         |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // Anchor family at SemAnchorOffset; cell count computed from the
    // oracle's own COUNT(*) with the same integer formula as
    // semCellCount (smallest power of two p in [16, 4096] with p² ≥ n),
    // so both engines derive identical geometry from the same table.
    // The duplicate test squares ride HUGEINT, matching the Spark
    // DECIMAL(38,0) chain.
    "q_dedup_semantic" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings
         |), geo AS (
         |  SELECT COALESCE(MIN(CASE WHEN p*p >= nn.n THEN p END), 4096)
         |    AS cells
         |  FROM (SELECT CAST(1 AS BIGINT) << k AS p
         |        FROM (SELECT unnest(range(4, 13)) AS k)) pw, nn
         |), q AS (
         |  SELECT vec_id, $duckQuant qv FROM embeddings
         |), ad AS (
         |  SELECT vec_id, cell,
         |    CAST(list_sum([
         |      qv[i+1] * ((($SemAnchorOffset + cell)*64 + i) * $PlaneMult % 4294967296
         |                 - 2147483648)
         |      FOR i IN range(0, 64)]) AS BIGINT) dot
         |  FROM q, (SELECT unnest(range(0, (SELECT cells FROM geo))) cell) c
         |), ranked AS (
         |  SELECT vec_id, cell, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY dot DESC, cell) rn
         |  FROM ad
         |), qa AS (
         |  SELECT r.vec_id, r.cell, q.qv,
         |    ${duckDotInt("q.qv", "q.qv")} n2
         |  FROM ranked r JOIN q USING (vec_id) WHERE r.rn = 1
         |), pairs AS (
         |  SELECT b.vec_id AS vid,
         |    ${duckDotInt("a.qv", "b.qv")} AS dot,
         |    a.n2 AS na, b.n2 AS nb
         |  FROM qa a JOIN qa b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |), rm AS (
         |  SELECT DISTINCT vid AS vec_id FROM pairs
         |  WHERE dot > 0
         |    AND CAST(dot AS HUGEINT) * dot * 100 >= CAST(na AS HUGEINT) * nb * 9
         |)
         |SELECT qa.cell, qa.vec_id,
         |  CAST(CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS kept
         |FROM qa LEFT JOIN rm USING (vec_id)
         |ORDER BY cell, vec_id""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH q AS (
         |  SELECT vec_id, $duckQuant qv FROM embeddings
         |), sigs AS (
         |  SELECT vec_id, qv, band,
         |    CAST(list_sum([
         |      CASE WHEN CAST(list_sum([
         |          qv[i+1] * (((band*$PlanesPerBand + j)*64 + i) * $PlaneMult % 4294967296
         |                     - 2147483648)
         |          FOR i IN range(0, 64)]) AS BIGINT) > 0
         |      THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
         |      FOR j IN range(0, $PlanesPerBand)]) AS BIGINT) sig
         |  FROM q, (SELECT unnest(range(0, $LshBands)) band) b
         |), cand AS (
         |  SELECT DISTINCT qs.vec_id query_id, ns.vec_id neighbor_id
         |  FROM sigs qs JOIN sigs ns
         |    ON qs.band = ns.band AND qs.sig = ns.sig
         |    AND qs.vec_id < $NQueries AND ns.vec_id <> qs.vec_id
         |), scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    ${duckDotInt("a.qv", "b.qv")} dot
         |  FROM cand c JOIN q a ON a.vec_id = c.query_id
         |              JOIN q b ON b.vec_id = c.neighbor_id
         |)
         |SELECT query_id, rnk, neighbor_id, dot FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) rnk
         |  FROM scored) t
         |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // Planes per band computed from the oracle's own COUNT(*) with the
    // same integer formula as embBandBits (smallest b in [6, 20] with
    // 2^b · EmbBucketTarget ≥ n) — `geo.nb` rides a cross join because
    // DuckDB forbids scalar subqueries inside lambda/list-comprehension
    // bodies.
    "q_dedup_embedding" ->
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM embeddings
         |), geo AS (
         |  SELECT COALESCE(MIN(CASE
         |      WHEN (CAST(1 AS BIGINT) << b) * $EmbBucketTarget >= nn.n
         |      THEN b END), 20) AS nb
         |  FROM (SELECT unnest(range(6, 21)) AS b) bb, nn
         |), q AS (
         |  SELECT vec_id, $duckQuant qv, embedding,
         |    ${duckDotDouble("embedding", "embedding")} norm2
         |  FROM embeddings
         |), sigs AS (
         |  SELECT vec_id, band,
         |    CAST(list_sum([
         |      CASE WHEN CAST(list_sum([
         |          qv[i+1] * (((band*geo.nb + j)*64 + i) * $PlaneMult % 4294967296
         |                     - 2147483648)
         |          FOR i IN range(0, 64)]) AS BIGINT) > 0
         |      THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END
         |      FOR j IN range(0, geo.nb)]) AS BIGINT) sig
         |  FROM q, geo, (SELECT unnest(range(0, $LshBands)) band) b
         |), cand AS (
         |  SELECT DISTINCT a.vec_id vec_a, b.vec_id vec_b
         |  FROM sigs a JOIN sigs b
         |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
         |), scored AS (
         |  SELECT c.vec_a, c.vec_b,
         |    ${duckDotDouble("x.embedding", "y.embedding")}
         |      / (sqrt(x.norm2) * sqrt(y.norm2)) cosine
         |  FROM cand c JOIN q x ON x.vec_id = c.vec_a
         |              JOIN q y ON y.vec_id = c.vec_b
         |)
         |SELECT vec_a, vec_b, cosine FROM scored
         |WHERE cosine >= $CosDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin,
  )
}
