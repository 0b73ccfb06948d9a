// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Fused per-row DISTINCT shingle-hash kernel: token array in, the
  * sorted set of `fastShingleHash` values of all k-gram shingles out —
  * one tight JIT-compiled loop per document.
  *
  * This is the candidate-generation twin of [[MinHashShingleSigs]]: the
  * relational formulation it replaces
  * (`array_distinct(transform(sequence(...), i -> concat_ws(...)))`)
  * runs INTERPRETED — Spark's higher-order functions are CodegenFallback,
  * so every shingle paid an expression-tree walk plus a built k-gram
  * string (~60 µs/shingle; the prefix-filter query spent 15 of its 16
  * bench seconds there). Here the shingle bytes are assembled once in a
  * local buffer, hashed with the identical `pmod(xxhash64(bytes, seed=42),
  * P)` fold, and deduplicated with one sort — per-element cost is
  * nanoseconds and the stage stays inside whole-stage codegen.
  *
  * Downstream users treat shingles as opaque join/grouping keys, so the
  * 64-bit hash substitutes for the string with no semantic change to
  * candidate generation: equal strings always collide, so every shared
  * shingle still keys a candidate pair, and a spurious collision
  * normally just adds a candidate that exact verification discards.
  * Recall caveat (same data-dependent class as the LSH banding margin
  * pinned by LshRecallSpec): a collision between two shingles INSIDE a
  * true pair's intersection shrinks the hashed similarity by ~1/|set|,
  * which could drop a pair sitting exactly at the threshold. The hash
  * domain is P ≈ 1e9 over ~1e5-scale shingle vocabularies (collision
  * odds ~1e-4 per corpus) and planted test pairs sit ≥ 0.1 above the
  * 0.8 threshold, so the gates are safe; rerun the string formulation
  * if future testdata plants threshold-adjacent pairs.
  *
  * Returns NULL for documents with fewer than k tokens (they produce no
  * shingle rows relationally, hence no set). Output order is ascending —
  * deterministic, unlike first-occurrence order, and irrelevant to the
  * explode-then-aggregate consumers.
  */
case class ShingleHashSet(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.ShingleHashKernel.compute($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashSet = copy(child = newChild)
}

object ShingleHashSet {
  /** Column-API wrapper. */
  def shingleHashes(toks: Column, k: Int): Column =
    ExpressionUtils.column(
      ShingleHashSet(ExpressionUtils.expression(toks), k))
}

/** Standalone object => static forwarders for the generated Java. */
object ShingleHashKernel {

  private val P = TextFunctions.HashP

  /** Sorted distinct `pmod(xxhash64(shingle), P)` values of one token
    * array's k-grams; null when < k tokens. Shingle bytes are the
    * space-joined k-gram, byte-identical to `concat_ws(" ", ...)` (null
    * tokens contribute no bytes and no separator), so hashes equal
    * `fastShingleHash` of the string formulation. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return null
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val u = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      toks(i) = if (u == null) null else u.getBytes
      i += 1
    }
    val hs = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var len = 0
      var present = 0
      var j = 0
      while (j < k) {
        val t = toks(i + j)
        if (t != null) { len += t.length; present += 1 }
        j += 1
      }
      if (present > 0) len += present - 1
      val buf = new Array[Byte](len)
      var pos = 0
      var first = true
      j = 0
      while (j < k) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) { buf(pos) = ' '; pos += 1 }
          System.arraycopy(t, 0, buf, pos, t.length)
          pos += t.length
          first = false
        }
        j += 1
      }
      val x = XxHash64Function.hash(
        UTF8String.fromBytes(buf), StringType, 42L)
      var h = x % P
      if (h < 0) h += P
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // In-place dedupe of the sorted hashes.
    var w = 0
    i = 0
    while (i < hs.length) {
      if (w == 0 || hs(w - 1) != hs(i)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}
