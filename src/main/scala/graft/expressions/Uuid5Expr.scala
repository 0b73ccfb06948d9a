// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-4122 version-5 (SHA-1 name-based) UUID over the DNS namespace as a
  * NATIVE Catalyst expression — byte-exact with CPython
  * `uuid.uuid5(uuid.NAMESPACE_DNS, name)` (vectors pinned in Uuid5Spec),
  * which is what the reference uses for its serving-table surrogate keys
  * (`/root/reference/data_populator/populator.py:53`).
  *
  * `doGenCode` emits a single static call, so the derivation runs inside
  * WholeStageCodegen with no ScalaUDF wrapper (no Row encoding, native
  * null handling) and no interpreted expression-tree walk: SURVEY §7.2's
  * "expression where a UDF sits" endgame. The digest is thread-local —
  * one MessageDigest per task thread, zero per-row allocation beyond the
  * 20-byte digest output. Input bytes are hashed straight from the
  * UTF8String buffer (already UTF-8), no String round-trip.
  */
case class Uuid5Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override def nullSafeEval(input: Any): Any =
    Uuid5Expr.uuid5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Uuid5Expr.uuid5($c)")

  override protected def withNewChildInternal(newChild: Expression): Uuid5Expr =
    copy(child = newChild)
}

object Uuid5Expr {

  /** Column-API wrapper. */
  def uuid5(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.classic.ExpressionUtils
    ExpressionUtils.column(Uuid5Expr(ExpressionUtils.expression(name)))
  }

  /** RFC-4122 DNS namespace: 6ba7b810-9dad-11d1-80b4-00c04fd430c8. */
  private val NamespaceDns: Array[Byte] =
    Array(0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
      0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  private val sha1: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-1"))

  private val Hex = "0123456789abcdef".getBytes

  /** uuid5(NAMESPACE_DNS, name) formatted as the canonical 36-char
    * lowercase-hex string. Called from generated code — keep static-shaped. */
  def uuid5(name: UTF8String): UTF8String = {
    val md = sha1.get()
    md.reset()
    md.update(NamespaceDns)
    md.update(name.getBytes)
    val b = md.digest()
    b(6) = ((b(6) & 0x0f) | 0x50).toByte // version 5
    b(8) = ((b(8) & 0x3f) | 0x80).toByte // RFC-4122 variant
    val out = new Array[Byte](36)
    var i = 0
    var o = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) { out(o) = '-'; o += 1 }
      out(o) = Hex((b(i) >> 4) & 0xf)
      out(o + 1) = Hex(b(i) & 0xf)
      o += 2
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
