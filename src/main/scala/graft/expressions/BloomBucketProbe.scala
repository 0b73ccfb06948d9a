// Hosted in an org.apache.spark.sql subpackage: AbstractDataType and
// classic.ExpressionUtils are private[sql], the normal home for third-party
// native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe of a hash-range-PARTITIONED bloom family carried by a real
  * `Broadcast`, for the regimes where embedding filters in the plan
  * stops scaling.
  *
  * `bloom_might_contain` only accepts a constant or a direct scalar
  * subquery, so a partitioned bloom (one per key-hash range) had to be
  * expressed as a CASE over per-bucket scalar subqueries — and a scalar
  * subquery result is pasted into the plan as a LITERAL, which ships
  * with every stage's serialized task binary and deserializes per task.
  * Measured at the ×100 probe corpus (119.6M oriented edges, 2 buckets
  * of ~82 MB): the wedge stage's task binary reached 328.8 MiB — the
  * CASE form lands the bloom bytes in TWO fused stages and each task
  * rehydrates its own copy — and 32 concurrent tasks OOMed a 48g heap
  * that runs the equivalent single-bloom plan comfortably.
  *
  * This expression moves the blooms through the mechanism built for
  * exactly this: the driver broadcasts the deserialized
  * `Array[BloomFilter]` ONCE (block-manager torrent, one shared copy
  * per executor, a few bytes of stub in the task binary), and each row
  * probes `blooms[pmod(hash, nBuckets)]`. Bucket selection uses the
  * same `pmod` the build side groups by, so a value always probes the
  * bloom that saw its bucket. codegen is a single virtual call on the
  * referenced expression object — the hot loop never touches the bytes.
  *
  * Correctness contract: FALSE only when the probed bucket's bloom
  * excludes the hash — for values inserted at build time,
  * `mightContainLong` is guaranteed true (no false negatives), so a
  * plan may use this strictly as a prune.
  */
case class BloomBucketProbe(
    child: Expression,
    blooms: Broadcast[Array[BloomFilter]])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bucket_probe"

  // Resolved lazily ON THE EXECUTOR: tasks share the executor-local
  // broadcast value; only the stub serializes with the expression.
  @transient private lazy val arr: Array[BloomFilter] = blooms.value
  @transient private lazy val nb: Int = arr.length

  def probe(h: Long): Boolean = {
    val m = h % nb
    arr((if (m < 0) m + nb else m).toInt).mightContainLong(h)
  }

  override def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bloomBucketProbe", this, classOf[BloomBucketProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBucketProbe =
    copy(child = newChild)
}

object BloomBucketProbe {
  /** Column form: `hash` must be the SAME hash expression the build
    * side bucketed by (`pmod(hash, nBuckets)`) and inserted. */
  def probe(hash: Column, blooms: Broadcast[Array[BloomFilter]]): Column =
    ExpressionUtils.column(
      BloomBucketProbe(ExpressionUtils.expression(hash), blooms))
}
