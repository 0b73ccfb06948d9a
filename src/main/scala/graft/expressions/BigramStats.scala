// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Fused per-row bigram statistics for the repetition filter: token array
  * in, `(top bigram count << 32) | total bigram count` out. The relational
  * formulation it replaces (explode bigrams → groupBy(doc, bigram) count →
  * groupBy(doc) max/sum) shuffled every distinct (doc, bigram) string pair
  * corpus-wide — 4.4 s at sf0.1 — to aggregate values that never leave the
  * row: one compiled loop with a local hash map computes the same counts
  * scan-shaped, ZERO shuffles. Exact (real strings, no hashing of bigrams
  * into a lossy key), so bit-identical to the relational twin — pinned by
  * RepetitionSpec — and to the DuckDB oracle.
  *
  * Both counts fit comfortably in 31 bits (a document would need 2^31
  * tokens to overflow); the packed long avoids a struct return type, and
  * callers unpack with `shiftright`/`bitwiseAND` — pure codegen'd
  * arithmetic. Documents with < 2 tokens return 0 (no bigrams).
  */
case class BigramStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bigram_stats"

  override def nullSafeEval(input: Any): Any =
    BigramStatsKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.BigramStatsKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)
}

object BigramStats {
  /** Column-API wrapper. */
  def bigramStats(toks: Column): Column =
    ExpressionUtils.column(BigramStats(ExpressionUtils.expression(toks)))
}

/** Standalone object => Scala emits a mirror class with STATIC forwarders,
  * so generated Java calls `BigramStatsKernel.compute(...)` directly. */
object BigramStatsKernel {

  /** Packed (topCount, nBigrams) of the "a b" bigrams of one token array.
    * Null tokens render as the empty string, matching what the relational
    * explode + concat_ws shape produced (`tokens()` never yields them). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[String, Integer](Math.min(n * 2, 1024))
    var top = 0
    var prev = tokenAt(arr, 0)
    var i = 1
    while (i < n) {
      val cur = tokenAt(arr, i)
      val big = prev + " " + cur
      val c = counts.merge(big, Integer.valueOf(1), (a, b) => a + b)
      if (c > top) top = c
      prev = cur
      i += 1
    }
    (top.toLong << 32) | (n - 1).toLong
  }

  private def tokenAt(arr: ArrayData, i: Int): String =
    if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
}
