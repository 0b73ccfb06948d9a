// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler string similarity — the
  * record-linkage scorer Spark ships no builtin for (it has `levenshtein`
  * but nothing in the Jaro family). Semantics are pinned to DuckDB's
  * `jaro_winkler_similarity` (prefix weight 0.1, boost threshold 0.7,
  * prefix cap 4) so the [[graft.queries.Linkage]] catalog entry can be
  * oracle-checked bit-for-bit: validated on every blocked part-name pair
  * at sf0.01 (29,706 pairs, max abs diff 0.0) plus the adversarial edge
  * set, including DuckDB's `jw("","") = 0` convention and its
  * STRICT `sim > 0.7` boost gate evaluated in double arithmetic (e.g.
  * "x" vs "xxxxxxxxxx": jaro = 2.1/3 = 0.700000…01 > 0.7 ⇒ boosted).
  *
  * The kernel operates on UTF-8 BYTE sequences, because that is what
  * DuckDB itself does — `jaro_winkler_similarity('café','cafe')` =
  * 0.84833… is only reproducible with byte-level lengths (|café| = 5
  * bytes), not codepoints. For ASCII data bytes and codepoints coincide;
  * for non-ASCII the byte semantics are the declared (DuckDB-compatible)
  * behavior. `doGenCode` emits a static call into the companion's
  * kernel — the same shape as Spark's own `levenshtein` (a
  * `UTF8String.levenshteinDistance` call inside WholeStageCodegen), so the
  * scorer stays inside the fused stage with no interpreted tree walk or
  * UDF serialization per row.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // The object's JVM accessor: class `JaroWinkler$`, static field MODULE$.
      val cls = JaroWinkler.getClass.getName // "org.apache.spark.sql.graft.JaroWinkler$"
      s"${ev.value} = $cls.MODULE$$.similarity($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private final val PrefixWeight = 0.1
  private final val BoostThreshold = 0.7
  private final val PrefixCap = 4

  /** General Jaro over byte arrays: mean of (m/|s1|, m/|s2|, (m-t)/m)
    * with the classic bounded match window and half-transposition count.
    * Matches are found greedily left-to-right within
    * `max(|s1|,|s2|)/2 - 1` positions; a byte in s2 matches at most once.
    * O(|s1|·window) time, two boolean scratch arrays — the rare >64-byte
    * path (the mask kernel below serves the hot path). */
  private def jaroBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    // DuckDB convention: two empty strings score 0, not 1.
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Transpositions: walk both matched-byte sequences in order; each
    // position where they disagree is half a transposition.
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** Allocation-free Jaro for strings of ≤ 64 BYTES — the hot path of the
    * linkage join (the bench's candidate volume is millions of ~20-byte
    * name pairs): match/used flags live in two long bitmasks and bytes
    * are read straight from the UTF8String, so nothing is allocated.
    * Identical algorithm to [[jaroBytes]], identical doubles —
    * [[LinkageSpec]] pins both paths to the same vectors. */
  private def jaroMaskSmall(s1: UTF8String, s2: UTF8String): Double = {
    val l1 = s1.numBytes
    val l2 = s2.numBytes
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    var m1 = 0L // matched positions in s1
    var m2 = 0L // consumed positions in s2
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.getByte(i)
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if ((m2 & (1L << j)) == 0 && c == s2.getByte(j)) {
          m1 |= 1L << i; m2 |= 1L << j; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if ((m1 & (1L << i)) != 0) {
        while ((m2 & (1L << j)) == 0) j += 1
        if (s1.getByte(i) != s2.getByte(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** JVM entry point used by both the interpreted and generated paths:
    * the allocation-free mask kernel when both inputs fit 64 bytes (the
    * linkage hot path), the array kernel beyond; the Winkler prefix is
    * compared byte-wise in both cases. */
  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val b1 = s1.numBytes
    val b2 = s2.numBytes
    val sim =
      if (b1 <= 64 && b2 <= 64) jaroMaskSmall(s1, s2)
      else jaroBytes(s1.getBytes, s2.getBytes)
    if (sim > BoostThreshold) {
      var prefix = 0
      val n = math.min(math.min(b1, b2), PrefixCap)
      while (prefix < n && s1.getByte(prefix) == s2.getByte(prefix))
        prefix += 1
      sim + prefix * PrefixWeight * (1.0 - sim)
    } else sim
  }

  /** Convenience overload (tests): identical byte-level semantics. */
  def similarity(s1: String, s2: String): Double =
    similarity(UTF8String.fromString(s1), UTF8String.fromString(s2))

  /** Column-API wrapper. */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
