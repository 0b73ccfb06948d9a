// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-element overlap count |set(a) ∩ set(b)| of two string arrays —
  * the verification kernel of every exact set-similarity operator
  * (jaccard = |∩| / (|a|+|b| − |∩|), containment = |∩| / |a| when the
  * inputs are pre-deduplicated).
  *
  * The builtin formulation `size(array_intersect(a, b))` +
  * `size(array_union(a, b))` builds THREE hash structures and materializes
  * two intermediate arrays per row pair; this expression builds ONE
  * HashSet over the smaller side, streams the larger side through it, and
  * returns only the count — with union size derived arithmetically by the
  * caller, the verify stage does half the hashing and zero array
  * materialization. Inputs are NOT required to be distinct: matched
  * elements are removed from the probe set so duplicates on the streamed
  * side cannot double-count (same distinct-set semantics as
  * array_intersect).
  *
  * `doGenCode` emits one static call (loop in JVM code, not an
  * interpreted expression walk); null array → null, null elements are
  * ignored (array_intersect drops nulls from the comparison unless both
  * sides hold one — corpus shingle arrays never contain null, pinned by
  * ContainmentSpec/DedupSpec fixtures).
  */
case class SetOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_overlap"

  override def nullSafeEval(l: Any, r: Any): Any =
    SetOverlap.overlap(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.SetOverlap.overlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}

object SetOverlap {

  /** Column-API wrapper. */
  def setOverlap(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SetOverlap(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Build a set over the SMALLER side, stream the larger; remove on
    * match so streamed duplicates count once. Called from generated code. */
  def overlap(l: ArrayData, r: ArrayData): Int = {
    val (small, big) =
      if (l.numElements() <= r.numElements()) (l, r) else (r, l)
    val n = small.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var i = 0
    while (i < n) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var count = 0
    val m = big.numElements()
    var j = 0
    while (j < m && !set.isEmpty) {
      if (!big.isNullAt(j) && set.remove(big.getUTF8String(j))) count += 1
      j += 1
    }
    count
  }
}
