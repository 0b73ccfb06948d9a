package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.Packing

/** The two-phase distributed prefix sum must equal the naive global-window
  * running sum exactly, independent of block size (block boundaries are
  * implementation detail, not semantics). */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def docTokens = Tables.documents(spark, Sf0001)
    .select($"doc_id", size(tokens($"text")).cast("long").as("n_tok"))

  /** Single-task reference: fine at test scale, forbidden in the catalog. */
  private def naive = {
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docTokens
      .withColumn("tok_offset", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("shard", expr("tok_offset div 4096"))
      .select($"doc_id", $"n_tok", $"tok_offset", $"shard")
  }

  test("two-phase prefix sum equals the global-window formulation") {
    val expected = naive.collect().map(_.toSeq).toSet
    for (blockSize <- Seq(7L, 100L, 100000L)) {
      val got = Packing
        .packShards(docTokens, "doc_id", "n_tok", 4096L, blockSize)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"mismatch at blockSize=$blockSize")
    }
  }

  test("shards partition the corpus contiguously with ~budget tokens") {
    val rows = Packing
      .packShards(docTokens, "doc_id", "n_tok", 4096L, 100L)
      .orderBy($"doc_id").collect()
    assert(rows.nonEmpty)
    // offsets are the exclusive running sum => strictly non-decreasing and
    // consistent with each row's token count.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1))
      assert(b.getLong(3) >= a.getLong(3), "shard ids must be monotone")
    }
    // every shard id in [0, total/budget] is used (contiguity).
    val total = rows.map(_.getLong(1)).sum
    val shards = rows.map(_.getLong(3)).distinct.sorted
    assert(shards.head == 0L && shards.last == (total - rows.last.getLong(1)) / 4096L)
    assert(shards.zipWithIndex.forall { case (s, i) => s == i.toLong })
  }
}
