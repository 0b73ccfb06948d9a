// Hosted in an org.apache.spark.sql subpackage alongside the other
// native expressions (GraftSqlFunctions registers it by SQL name).
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregate with EXPLICIT, construction-time geometry — no
  * session conf consulted anywhere.
  *
  * Spark's own `BloomFilterAggregate` silently clamps both its item and
  * bit counts to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/
  * maxNumBits` (defaults 4M items / 64 Mbit), and parts of that clamping
  * happen lazily at EXECUTION time — so a query that needs a bigger
  * bloom (q_graph_triangles sizes one from the measured edge count;
  * ~150M edges at the ×100 probe) had to mutate the session-wide caps
  * and leave them mutated for the plan to execute correctly later
  * (the r12 verdict's cross-query side-effect finding). This aggregate
  * takes `numItems` directly, computes the standard optimal bit count
  * for the declared FPP at construction, and never reads a conf: the
  * caller's sizing decision is baked into the plan, queries are
  * side-effect-free, and a bench/verify sweep sees identical optimizer
  * limits regardless of execution order.
  *
  * Wire format: `BloomFilter.writeTo` — byte-identical to Spark's
  * aggregate, so `bloom_might_contain` (Spark's
  * `BloomFilterMightContain`) consumes the output unchanged.
  *
  * Input contract (same as Spark's): values pre-hashed to LONG with
  * `xxhash64`. Merge is only ever called on buffers created with the
  * same geometry (one aggregate instance), so `mergeInPlace` cannot see
  * incompatible sketches.
  */
case class BloomAggExact(
    child: Expression,
    numItems: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with ExpectsInputTypes
  with UnaryLike[Expression] {

  require(numItems > 0, "bloom_agg_exact: numItems must be positive")

  /** Optimal bit count for 1% FPP: n·ln(0.01)/ln(2)² ≈ 9.585·n, clamped
    * to the sketch library's array bound (~1.37e11 bits ≈ 16 GiB — far
    * past any broadcastable filter; callers cap items accordingly). */
  private val numBits: Long = {
    val optimal = math.ceil(numItems * 9.585059).toLong
    math.min(math.max(64L, optimal), Int.MaxValue.toLong * 32L)
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(numItems, numBits)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def prettyName: String = "bloom_agg_exact"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggExact =
    copy(child = newChild)
}
