package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12) as a
  * typed Spark [[Aggregator]] — the bounded-state path to heavy hitters
  * when the key domain is too large to hash-aggregate exactly.
  *
  * Contract: after summarizing a stream of n items with capacity c, every
  * item whose true frequency exceeds n/(c+1) is PRESENT in the summary
  * (counts may undercount by at most n/(c+1), and spurious keys may
  * appear — the summary is a candidate SUPERSET, never a miss). Both the
  * per-partition update and the partial-merge preserve the guarantee, so
  * the result is partitioning- and order-independent as a candidate set.
  *
  * The 100 TB shape this enables is the two-pass exact heavy hitter:
  * pass 1 folds every partition into a c-entry map (map-side combine;
  * the shuffle carries one tiny map per partition), pass 2 exact-counts
  * ONLY the ≤ c candidates via a broadcast membership filter. Total
  * shuffle volume is O(c × partitions + c), never O(distinct keys) —
  * the full-vocabulary hash agg that an exact one-pass top-K needs.
  *
  * Update: hit → +1; miss with room → insert 1; miss when full →
  * decrement ALL counters by 1, dropping zeros (amortized O(1) per
  * item). Merge: pointwise sum, then subtract the (c+1)-th largest
  * count from every entry and drop non-positive ones — the PODS'12
  * merge that keeps the combined error bound additive.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < capacity => b.updated(tok, 1L)
      case None =>
        // Decrement-all: one stream item "cancels" one occurrence of
        // every tracked key — the classic MG step that bounds undercount
        // by the number of decrement rounds ≤ n/(c+1).
        b.iterator
          .map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity) // (c+1)-th largest
      sum.iterator
        .map { case (k, c) => (k, c - cut) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
}

object MisraGries {
  /** Untyped-DataFrame handle: `df.agg(MisraGries.udaf(c)($"tok"))`. */
  def udaf(capacity: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(capacity),
      Encoders.STRING)

  /** The plan behind [[topKeys]], exposed so PlanAuditSpec can pin its
    * shape: one partial-agg per partition folding into a c-entry map,
    * one single-partition exchange carrying ≤ one tiny map per
    * partition, zero sorts. Compare with the naive Zipf-head derivation
    * (`groupBy(key).count().orderBy(desc).limit(k)`), whose exchange
    * carries the FULL key domain and whose top-k is a global sort. */
  def summaryPlan(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      capacity: Int): org.apache.spark.sql.DataFrame =
    df.select(key.cast("string").as("__mg_key"))
      .agg(udaf(capacity)(org.apache.spark.sql.functions.col("__mg_key"))
        .as("mg"))

  /** One-job Zipf-head derivation: fold `key` into a `capacity`-entry
    * MG summary (map-side combine — no key-domain shuffle, no global
    * sort) and return its top-`k` keys as strings (summary-count desc,
    * key asc). This is the 100 TB way to seed
    * [[SkewJoin.saltedJoinHotKeys]]: the derivation cost is one scan
    * with O(capacity) state per task, not a full key-count aggregation
    * plus global sort.
    *
    * Approximation caveat, and why it is safe here: MG counts undercount
    * by ≤ n/(capacity+1) and the candidate set can vary with partition
    * merge order, so the RANKING among near-tied keys is not exact —
    * keep `capacity ≫ k` (≥8× is plenty for a Zipf head). Callers that
    * feed salting decisions are insensitive to that by construction:
    * which keys get salted changes only the partitioning of the
    * downstream join, never its rows.
    *
    * MAY RETURN FEWER THAN k KEYS — including NONE: on a near-uniform
    * stream every true count is below n/(capacity+1), and the
    * decrement-all and merge-subtract steps can legitimately empty the
    * summary (observed on 1.5M near-singleton keys, r18 ×10 sweep).
    * That is the correct "no heavy hitters" verdict, not an error —
    * callers must branch on it (e.g. skip salting entirely). */
  def topKeys(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      k: Int, capacity: Int): Seq[String] = {
    require(capacity >= k, s"capacity $capacity < k $k")
    val m = summaryPlan(df, key, capacity)
      .collect()(0).getMap[String, Long](0)
    m.toSeq.sortBy { case (kk, c) => (-c, kk) }.take(k).map(_._1)
  }
}
