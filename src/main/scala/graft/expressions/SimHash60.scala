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

/** Fused per-row 60-bit SimHash kernel: token array in, the weighted-token
  * SimHash out — one tight loop per document instead of the
  * explode → groupBy(doc, token) count → groupBy(doc) 60-conditional-sum
  * pipeline it replaces in [[graft.queries.Dedup]] (TWO corpus-wide
  * shuffles just to build per-document signatures). Per-row, the token bag
  * is already local: each occurrence contributes ±1 per bit directly,
  * which is arithmetically identical to grouping into (token, count)
  * first — `sum_t cnt_t * sign_t(bit) == sum over occurrences
  * sign(bit)` — so the value is BIT-IDENTICAL to the relational
  * formulation (pinned by SimHashSpec) and to its DuckDB oracle twin.
  *
  * Token hash = [[graft.functions.TextFunctions.tokenHash60]]: two
  * per-character polynomial rolling hashes (multipliers 31/37, mod 1e9+7)
  * truncated to 30 bits and packed — reproduced here in compiled loops
  * (~chars x 2 multiply-mods per token, then 60 adds).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHashKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** Column-API wrapper. */
  def simhash60(toks: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(toks)))
}

/** Standalone object => Scala emits a mirror class with STATIC forwarders,
  * so generated Java calls `SimHashKernel.compute(...)` directly. */
object SimHashKernel {

  private val P = graft.functions.TextFunctions.HashP
  private val Mask30 = (1L << 30) - 1L // P < 2^30, kept for formula parity

  /** 60-bit SimHash of one token array. BMP-only by declaration, matching
    * [[PolyHash]] (charAt = codepoint on the BMP, as `ascii()`/DuckDB
    * `unicode()` see the corpus). Null tokens contribute nothing (the
    * relational explode drops nothing, but `tokens()` never yields them). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val bitSums = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        // tokenHash60: (poly31 % 2^30) * 2^30 + poly37 % 2^30.
        var h31 = 0L
        var h37 = 0L
        var c = 0
        while (c < s.length) {
          val ch = s.charAt(c)
          h31 = (h31 * 31L + ch) % P
          h37 = (h37 * 37L + ch) % P
          c += 1
        }
        val h = ((h31 & Mask30) << 30) + (h37 & Mask30)
        var bit = 0
        while (bit < 60) {
          if (((h >> bit) & 1L) == 1L) bitSums(bit) += 1
          else bitSums(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var bit = 0
    while (bit < 60) {
      if (bitSums(bit) > 0) sim |= 1L << bit
      bit += 1
    }
    sim
  }
}
