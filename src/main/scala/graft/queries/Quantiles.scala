package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoints.MaterializeOps
import Catalog._

/** Exact global order statistics WITHOUT a global sort — SURVEY.md §2B
  * "exact global percentiles (two-phase distributed selection)".
  *
  * The naive formulation (a partitionless `row_number` window, or
  * `ORDER BY` + positional pick) funnels the whole table through one
  * task — the PlanAuditSpec-banned shape. This is the classic two-phase
  * selection instead:
  *
  *  1. histogram pass: bin every value (`floor(v / width)`), aggregate
  *     per-bin counts (map-side combined; #bins is bounded by the value
  *     domain / width, independent of row count), and turn the SMALL bin
  *     relation into inclusive cumulative counts via a broadcast
  *     non-equi self-join — never a partitionless window;
  *  2. selection pass: for each requested percentile p the target global
  *     rank k = ceil(p·n/100) falls in exactly one bin (the cumulative
  *     table locates it) at within-bin rank k − cum(bin−1); a second
  *     scan joins against the broadcast 3-row target table and ranks
  *     ONLY the rows of the hit bins (window partitioned by pct — each
  *     partition holds one bin's rows, bounded by width, not by n).
  *
  * At 100 TB: two narrow scans of one column, one tiny broadcast, and a
  * window over ~1/1000th of the data. The DuckDB oracle runs the global
  * one-task specification the Spark plan deliberately avoids.
  *
  * Determinism: bin ids are `floor` of an IEEE double divide (correctly
  * rounded, identical cross-engine); ranks are exact integers; the k
  * formula ceil(p·n/100) = floor((p·n+99)/100) is computed on exact
  * doubles (p·n ≤ 6e7 ≪ 2^53) in both engines.
  */
object Quantiles extends QueryGroup {

  private val Pcts = Seq(50, 90, 99)
  private val BinWidth = 100.0
  /** Internal edges of the 8-bucket equi-depth histogram. */
  private[queries] val EdgePcts = Seq(12, 25, 37, 50, 62, 75, 87)

  /** The shared two-phase selection core: exact values at the given
    * integer percentiles of l_extendedprice, as a (pct, value) relation. */
  private[queries] def percentiles(s: SparkSession, d: String,
      pcts: Seq[Int]): DataFrame = {
    import s.implicits._
    val v = Tables.lineitem(s, d)
      .select($"l_extendedprice".as("v"),
        floor($"l_extendedprice" / BinWidth).cast("long").as("bin"))
    // The bin histogram is TINY (value domain / width) but has three
    // consumers (both sides of the cumulative self-join + the total),
    // each of which re-ran the 600k-row binning aggregation — the r18
    // profile had the whole percentile core re-scanning lineitem 3×
    // for it. Checkpoint the ~1k-row relation once.
    val bins = v.groupBy($"bin").agg(count(lit(1)).as("cnt")).materialized
    val cum = bins.as("a")
      .join(broadcast(bins.as("b")), $"b.bin" <= $"a.bin")
      .groupBy($"a.bin", $"a.cnt")
      .agg(sum($"b.cnt").as("cum"))
      .select($"bin", $"cnt", $"cum")
    val total = bins.agg(sum($"cnt").as("n"))
    val ks = pcts.toDF("pct")
      .crossJoin(broadcast(total))
      .select($"pct",
        floor(($"pct" * $"n" + 99) / 100.0).cast("long").as("k"))
    val hit = ks.join(broadcast(cum), $"cum" >= $"k")
      .groupBy($"pct", $"k").agg(min($"bin").as("bin"))
    val tgt = hit.join(broadcast(cum), Seq("bin"))
      .select($"pct", $"bin", ($"k" - ($"cum" - $"cnt")).as("off"))
    v.join(broadcast(tgt), Seq("bin"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"pct").orderBy($"v")))
      .filter($"rn" === $"off")
      .select($"pct", $"v".as("value"))
  }

  private def quantileGlobal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    percentiles(s, d, Pcts).orderBy($"pct")
  }

  /** Equi-depth (equi-height) histogram — the optimizer-statistics /
    * drift-monitoring histogram whose buckets hold ~equal row counts, so
    * no bucket is blind to a dense region the way fixed-width
    * `q_histogram` bins can be. Built by composition: the two-phase
    * selection supplies the 7 exact internal edges (a 7-row relation),
    * the edges collapse to ONE broadcast array row, and bucket assignment
    * is a row-local STATIC-WIDTH comparison sum over that array (bucket =
    * #edges strictly below v, as Σᵢ (v > edges[i]) over the fixed 7
    * positions) — no per-row join fan-out, no global sort, one final
    * |buckets|-sized aggregation. The comparison sum replaced a
    * higher-order `filter` lambda in r18: HOFs run interpreted per row
    * (never codegen'd — the r17 ANN plane lesson), and the r18 profile
    * priced the two formulations at 1.06 vs 0.66 s over the 600k-row
    * scan. Identical count by construction; |EdgePcts| is a compile-time
    * constant, so the unrolled sum is exactly as general as the lambda.
    * The DuckDB oracle derives the same edges from the global-window
    * specification and buckets by a correlated count over them. */
  private def histogramEquidepth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = percentiles(s, d, EdgePcts)
      .agg(array_sort(collect_list($"value")).as("edges"))
    Tables.lineitem(s, d)
      .select($"l_extendedprice".as("v"))
      .crossJoin(broadcast(edges))
      .select($"v",
        EdgePcts.indices
          .map(i => ($"v" > $"edges".getItem(i)).cast("long"))
          .reduce(_ + _).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"bucket")
  }

  val queries: Map[String, Q] = Map(
    "q_quantile_global" -> quantileGlobal,
    "q_histogram_equidepth" -> histogramEquidepth,
  )

  val oracle: Map[String, String] = Map(
    // The one-task specification: a global window the Spark side never
    // plans. Rank ties inside equal values are irrelevant — only the
    // VALUE at sorted position k is selected, and that is unique.
    "q_quantile_global" ->
      s"""WITH s AS (
         |  SELECT l_extendedprice AS v,
         |    row_number() OVER (ORDER BY l_extendedprice) AS rk,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM lineitem
         |), p AS (SELECT unnest([${Pcts.mkString(", ")}]) AS pct)
         |SELECT pct, v AS value
         |FROM s JOIN p
         |  ON s.rk = CAST(floor((p.pct * s.n + 99) / 100.0) AS BIGINT)
         |ORDER BY pct""".stripMargin,
    "q_histogram_equidepth" ->
      s"""WITH s AS (
         |  SELECT l_extendedprice AS v,
         |    row_number() OVER (ORDER BY l_extendedprice) AS rk,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM lineitem
         |), p AS (SELECT unnest([${EdgePcts.mkString(", ")}]) AS pct),
         |e AS (
         |  SELECT v AS edge FROM s JOIN p
         |    ON s.rk = CAST(floor((p.pct * s.n + 99) / 100.0) AS BIGINT)),
         |b AS (
         |  SELECT v, (SELECT COUNT(*) FROM e WHERE t.v > e.edge) AS bucket
         |  FROM (SELECT l_extendedprice AS v FROM lineitem) t)
         |SELECT bucket, COUNT(*) AS n, min(v) AS min_v, max(v) AS max_v
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
