package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.broadcast.Broadcast

/** Registry for long-lived driver-created broadcasts (the partitioned
  * triangle blooms in [[graft.queries.Graph]]) so measurement harnesses can
  * release them deterministically.
  *
  * Why it exists: a `Broadcast[Array[BloomFilter]]` created during plan
  * construction stays executor-resident until ContextCleaner proves the
  * stub dead via GC — at >64M-edge corpora that is ~100 MB+ per triangles
  * invocation, and a repeated bench sweep can accumulate copies faster
  * than the asynchronous cleaner drains them (r15 advisor). The returned
  * DataFrame is lazy, so the query itself cannot destroy the broadcast
  * eagerly; instead the creator registers it here and the harnesses
  * (Bench.quiesce, TriangleBloomProbe) call [[drain]] after each collect.
  * Outside a harness the registry is just a weak-ish bookkeeping list and
  * ContextCleaner still reclaims everything as before.
  */
object Broadcasts {
  private val live = ArrayBuffer.empty[Broadcast[_]]

  def track[T](b: Broadcast[T]): Broadcast[T] = synchronized {
    live += b; b
  }

  /** Destroy every tracked broadcast. Safe to call while no tracked plan
    * is mid-execution (the harness contract: call after the collect).
    * Destroyed broadcasts are removed; a re-executed plan that still
    * references one would fail, which is the loud behavior we want — the
    * eager-built bloom would be stale against changed data anyway. */
  def drain(): Unit = synchronized {
    live.foreach { b =>
      try b.destroy() catch { case scala.util.control.NonFatal(_) => () }
    }
    live.clear()
  }
}
