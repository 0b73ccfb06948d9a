package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import Catalog._

/** Structured-data privacy operators — the release-side counterpart of
  * the free-text regex redaction in [[TextAnalysis]] (`q_text_redact_pii`):
  * before a table leaves the trust boundary (training corpus export,
  * analytics share), direct identifiers are pseudonymized, quantitative
  * attributes generalized, and quasi-identifier groups too small to hide
  * in are suppressed (k-anonymity, Sweeney 2002).
  *
  * The reference has no privacy layer (its serving API returns raw
  * aggregates — `rest_api/.../index.py`); this is north-star surface for
  * a pipeline exporting 100 TB of user-adjacent data.
  *
  * Cross-engine determinism: the pseudonym is a KEYED md5 (hex text in
  * both engines), the balance band is a single IEEE divide + floor, and
  * the k-anonymity group size is an exact integer count — every output
  * cell hash-matches DuckDB.
  */
object Privacy extends QueryGroup {

  /** Pseudonymization key — in production a managed secret; pinned here
    * so both engines derive identical pseudonyms. */
  private val PiiSalt = "gr-pii-1"

  /** Account-balance generalization band width. */
  private val BandWidth = 2500.0

  /** Minimum quasi-identifier group size (the k of k-anonymity). */
  private val AnonK = 5

  /** Pseudonymize + generalize + suppress, row-level.
    *
    * - `pseudonym`: keyed md5 of the direct identifier (c_name) — stable
    *   across runs (joinable) yet irreversible without the key.
    * - `acct_band`: balance generalized to [[BandWidth]]-wide bands.
    * - quasi-identifier = (nation, segment, band). Groups smaller than
    *   [[AnonK]] get their most identifying attribute (nation) suppressed
    *   to NULL and are flagged `k_ok = 0`.
    *
    * Scale shape: one window over the quasi-identifier partitioning
    * computes every group size without a join (same exchange the
    * suppressed output would need anyway); everything else — hashing,
    * banding, suppression — is row-local projection fused into the scan.
    * At 100 TB the quasi-identifier space is tiny relative to rows, so
    * the group-size exchange carries no skew a salted agg would fix. */
  private def kanonymize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val band = (floor($"c_acctbal" / BandWidth) * BandWidth).cast("long")
    val grp = Window.partitionBy($"c_nationkey", $"c_mktsegment", $"acct_band")
    Tables.customer(s, d)
      .select(
        md5(concat(lit(PiiSalt), $"c_name")).as("pseudonym"),
        $"c_nationkey", $"c_mktsegment", band.as("acct_band"))
      .withColumn("grp_n", count(lit(1)).over(grp))
      .select(
        $"pseudonym",
        when($"grp_n" >= AnonK, $"c_nationkey").as("nation_anon"),
        $"c_mktsegment", $"acct_band",
        ($"grp_n" >= AnonK).cast("int").as("k_ok"))
      .orderBy($"pseudonym")
  }

  /** Deletion-request predicate: in production a managed request table;
    * here the deterministic stand-in set (1 user in 20) both engines
    * derive identically. */
  private val ErasureBucket = 20
  private val ErasureResidue = 3

  /** Right-to-be-forgotten sweep: purge every event of the users in the
    * deletion-request set and PROVE the purge in one pass — per event
    * type, rows before/after/purged plus an order-independent `bit_xor`
    * checksum of the surviving event ids (the anti-entropy receipt an
    * auditor re-derives; the same fold as `q_table_checksum`).
    *
    * Scale shape: the request set is users-sized but the sweep never
    * joins it — membership is a row-local predicate here (in production:
    * a broadcast semi-join against the request table, same plan
    * otherwise), so the scan is one pass with a conditional partial agg;
    * ONE |event_type|-row exchange total. Purged rows are counted, not
    * collected. */
  private def piiErasure(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val erased = $"user_id" % ErasureBucket === ErasureResidue
    Tables.events(s, d)
      .select($"event_type", $"event_id", erased.as("erased"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("rows_before"),
        sum((!$"erased").cast("long")).as("rows_after"),
        sum($"erased".cast("long")).as("rows_purged"),
        expr("bit_xor(CASE WHEN NOT erased THEN event_id END)")
          .as("survivor_sig"))
      .orderBy($"event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_pii_kanonymize" -> kanonymize,
    "q_pii_erasure" -> piiErasure,
  )

  val oracle: Map[String, String] = Map(
    "q_pii_kanonymize" ->
      s"""WITH g AS (
         |  SELECT md5('$PiiSalt' || c_name) AS pseudonym,
         |    c_nationkey, c_mktsegment,
         |    CAST(floor(c_acctbal / $BandWidth) * $BandWidth AS BIGINT)
         |      AS acct_band
         |  FROM customer),
         |n AS (
         |  SELECT *, COUNT(*) OVER (
         |    PARTITION BY c_nationkey, c_mktsegment, acct_band) AS grp_n
         |  FROM g)
         |SELECT pseudonym,
         |  CASE WHEN grp_n >= $AnonK THEN c_nationkey END AS nation_anon,
         |  c_mktsegment, acct_band,
         |  CAST(grp_n >= $AnonK AS INTEGER) AS k_ok
         |FROM n ORDER BY pseudonym""".stripMargin,
    "q_pii_erasure" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id,
         |    user_id % $ErasureBucket = $ErasureResidue AS erased
         |  FROM events)
         |SELECT event_type,
         |  count(*) AS rows_before,
         |  CAST(SUM(CAST(NOT erased AS BIGINT)) AS BIGINT) AS rows_after,
         |  CAST(SUM(CAST(erased AS BIGINT)) AS BIGINT) AS rows_purged,
         |  bit_xor(CASE WHEN NOT erased THEN event_id END) AS survivor_sig
         |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
