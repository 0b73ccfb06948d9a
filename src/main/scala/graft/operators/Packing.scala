package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign each document a contiguous shard id
  * such that every shard holds ~`budget` tokens in stable `doc_id` order —
  * the sequence-packing step of an LLM pretraining pipeline (shard k =
  * docs whose global token offset lands in [k*budget, (k+1)*budget)).
  *
  * The defining quantity is a GLOBAL running sum — the one thing a naive
  * window (`Window.orderBy("doc_id")` with no partition) computes by
  * funneling the whole corpus through a single task, which this repo's
  * plan gate forbids as a 100 TB killer. Instead, a two-phase distributed
  * prefix sum, the classic parallel-scan shape:
  *
  *  1. per-block token totals: one partial-aggregated `groupBy` on
  *     `block = doc_id div blockSize` — output is |blocks| rows (metadata
  *     scale, tunable via blockSize), collected to the driver like an AQE
  *     statistic, scanned into per-block starting offsets;
  *  2. offsets broadcast back; each row's global offset = its block's
  *     offset + an intra-block running sum — a window PARTITIONED by
  *     block, so per-task state is one block (≤ blockSize docs), never
  *     the corpus.
  *
  * Deterministic end-to-end: block boundaries are pure arithmetic on the
  * stable key (no range-sampling nondeterminism, no caching needed to pin
  * results), so the same input always packs identically — and matches a
  * single-node global-window oracle bit-for-bit.
  */
object Packing {

  /** @param docs      (keyCol, tokCol) rows; keyCol non-negative integral
    * @param budget    tokens per shard
    * @param blockSize keys per prefix-sum block: pick so |blocks| stays
    *                  driver-small (1e5–1e6) while blocks stay task-small
    */
  def packShards(docs: DataFrame, keyCol: String, tokCol: String,
      budget: Long, blockSize: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val key: Column = col(keyCol).cast("long")
    val base = docs.select(key.as("k"), col(tokCol).cast("long").as("t"))
      .withColumn("block", expr(s"k div $blockSize"))
    // Phase 1: block totals — |blocks| rows, driver-side prefix scan.
    val sums = base.groupBy($"block").agg(sum($"t").as("bt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft((-1L, 0L)) { case ((_, acc), (b, bt)) =>
      (b, acc + bt)
    }
    val offDf = sums.map(_._1).zip(offsets.map(_._2))
      .toSeq.toDF("block", "block_offset")
    // Phase 2: block-partitioned intra-block running sum + broadcast join.
    val w = Window.partitionBy($"block").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offDf), "block")
      .withColumn("tok_offset",
        $"block_offset" + coalesce(sum($"t").over(w), lit(0L)))
      .select($"k".as(keyCol), $"t".as(tokCol), $"tok_offset",
        expr(s"tok_offset div $budget").as("shard"))
  }
}
