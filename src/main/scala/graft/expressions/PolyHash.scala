// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling string hash
  * `fold(h = (h*mult + codepoint) mod 1e9+7)` — semantically identical to
  * the higher-order-function formulation in
  * [[graft.functions.TextFunctions.charHash]] (and to its DuckDB
  * `list_reduce` twin), but with `doGenCode`: the fold compiles into a
  * tight Java loop inside WholeStageCodegen instead of one interpreted
  * expression-tree walk per character. The round-3 bench measured the
  * interpreted fold at ~2 µs/char; this is the (b)-tier extension point of
  * SURVEY.md §2 (custom scalar `Expression` before custom plans).
  *
  * BMP-only by declaration (charAt = UTF-16 unit = codepoint on the BMP;
  * matches `ascii()` per-char and DuckDB `unicode()` for all corpus data).
  */
case class PolyHash(child: Expression, mult: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  private final val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * mult + s.charAt(i)) % P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val i = ctx.freshName("phI")
      val h = ctx.freshName("phH")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${mult}L + $s.charAt($i)) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API wrapper. */
  def polyHash(s: Column, mult: Long = 31L): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(s), mult))
}
