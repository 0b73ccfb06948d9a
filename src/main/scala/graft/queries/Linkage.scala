package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import Catalog._

/** Entity resolution / record linkage — the blocked fuzzy-match operator
  * every ingestion pipeline needs when two sources describe the same
  * entities with dirty keys (the reference's scrape→clean→serve flow
  * sidesteps it only because its scraped rows carry a synthesized uuid5
  * key, `/root/reference/data-cleaner/cleaner.py:96-101`; real feeds
  * rarely do).
  *
  * Canonical three-stage shape, each stage chosen for the 100 TB case:
  *  1. **Block**: candidate pairs only within corruption-resistant
  *     blocking keys (here: first-4-chars × last-char — the deterministic
  *     corruption edits an interior position — intersected with a ±4
  *     length band, which a one-char edit cannot escape). This is what
  *     makes linkage sub-quadratic: candidates are Σ|block|², never
  *     |A|×|B|, and each extra independent key divides block sizes. Hot
  *     blocks are data skew, handled like any other skewed equi-join
  *     (AQE skew split or the [[graft.operators.SkewJoin]] salting) —
  *     at scale one would also block on 2-3 redundant keys and union.
  *  2. **Score**: [[org.apache.spark.sql.graft.JaroWinkler]] — a native
  *     codegen expression (Spark has `levenshtein` but nothing in the
  *     Jaro family), pinned bit-for-bit to DuckDB's
  *     `jaro_winkler_similarity` so the oracle hash-matches.
  *  3. **Resolve**: top-3 matches per registry row via a per-rid window
  *     (partition cardinality = block size, never corpus size), with
  *     deterministic (score DESC, key ASC) tie-break.
  *
  * Determinism: both engines compute bit-identical similarity doubles
  * (validated over every sf0.01 candidate pair), so ranking on the raw
  * double is stable; the reported score is `floor(jw·1e6)` — floor of an
  * identical double is identical, with no decimal-rounding tie risk.
  */
object Linkage extends QueryGroup {

  /** Every 17th part seeds the "dirty registry" side. */
  private[queries] val RegistryMod = 17
  /** Matches reported per registry row. */
  private[queries] val TopMatches = 3

  private def linkJaroWinkler(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graft.JaroWinkler.jaroWinkler
    val parts = Tables.part(s, d)
      .select($"p_partkey", concat($"p_name", lit(" "), $"p_brand").as("nm"))
    // Deterministic corruption: drop the 5th character (the blocking
    // prefix survives; the match must be recovered by fuzzy score).
    val registry = parts
      .filter($"p_partkey" % RegistryMod === 0)
      .select(
        $"p_partkey".as("rid"),
        concat(substring($"nm", 1, 4), expr("substr(nm, 6)")).as("dirty"))
      .select($"rid", $"dirty",
        concat(substring($"dirty", 1, 4), substring($"dirty", -1, 1))
          .as("blk"))
    val scored = registry
      .join(parts.withColumn("blk",
        concat(substring($"nm", 1, 4), substring($"nm", -1, 1))), "blk")
      // Third blocking key: a ±4 length band. A one-char corruption
      // shifts length by 1, so no true match is lost, and the cheap
      // integer gate runs BEFORE the O(len·window) scorer — standard
      // multi-key blocking (prefix × suffix × length) from the ER
      // literature.
      .filter(abs(length($"nm") - length($"dirty")) <= 4)
      .select($"rid", $"p_partkey".as("match_key"),
        jaroWinkler($"dirty", $"nm").as("jw"))
    val w = Window.partitionBy($"rid").orderBy($"jw".desc, $"match_key")
    scored
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= TopMatches)
      .select($"rid", $"rnk", $"match_key",
        floor($"jw" * 1000000.0).cast("long").as("score_micro"),
        ($"rid" === $"match_key").as("exact_hit"))
      .orderBy($"rid", $"rnk")
  }

  val queries: Map[String, Q] = Map(
    "q_link_jarowinkler" -> linkJaroWinkler,
  )

  val oracle: Map[String, String] = Map(
    "q_link_jarowinkler" ->
      s"""WITH p AS (
         |  SELECT p_partkey, p_name || ' ' || p_brand AS nm FROM part),
         |reg0 AS (
         |  SELECT p_partkey AS rid,
         |    substr(nm, 1, 4) || substr(nm, 6) AS dirty
         |  FROM p WHERE p_partkey % $RegistryMod = 0),
         |reg AS (
         |  SELECT rid, dirty,
         |    substr(dirty, 1, 4) || substr(dirty, -1, 1) AS blk
         |  FROM reg0),
         |scored AS (
         |  SELECT reg.rid, p.p_partkey AS match_key,
         |    jaro_winkler_similarity(reg.dirty, p.nm) AS jw
         |  FROM reg JOIN p
         |    ON substr(p.nm, 1, 4) || substr(p.nm, -1, 1) = reg.blk
         |    AND abs(length(p.nm) - length(reg.dirty)) <= 4),
         |ranked AS (
         |  SELECT rid, match_key, jw,
         |    row_number() OVER (PARTITION BY rid
         |      ORDER BY jw DESC, match_key) AS rnk
         |  FROM scored)
         |SELECT rid, rnk, match_key,
         |  CAST(floor(jw * 1000000.0) AS BIGINT) AS score_micro,
         |  (rid = match_key) AS exact_hit
         |FROM ranked WHERE rnk <= $TopMatches ORDER BY rid, rnk""".stripMargin,
  )
}
