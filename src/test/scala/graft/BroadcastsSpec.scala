package graft

import graft.core.Broadcasts

/** Pins the weak-reference semantics of [[graft.core.Broadcasts]] (r16
  * advisor): tracking must never extend a broadcast's lifetime — a
  * long-lived non-harness session that keeps building tracked plans must
  * not accumulate driver stubs — while [[Broadcasts.drain]] still
  * destroys everything a harness has live. */
class BroadcastsSpec extends SparkTestBase {

  test("drain destroys tracked broadcasts that are still reachable") {
    val b = Broadcasts.track(spark.sparkContext.broadcast(Array(1, 2, 3)))
    assert(Broadcasts.liveCount >= 1)
    Broadcasts.drain()
    assert(Broadcasts.liveCount == 0)
    // destroy() makes any further use fail loudly — the contract drain's
    // scaladoc promises for stale eager-built blooms.
    intercept[org.apache.spark.SparkException](b.value)
  }

  test("tracking does not keep an otherwise-unreachable broadcast alive") {
    Broadcasts.drain()
    // Track inside a method scope so the only strong ref dies with it.
    def trackTransient(): Unit = {
      Broadcasts.track(spark.sparkContext.broadcast(Array.fill(1024)(7L)))
      ()
    }
    trackTransient()
    // GC is advisory, so retry: once the stub is collected the registry
    // must observe it gone (liveCount prunes via WeakReference.get).
    var tries = 0
    while (Broadcasts.liveCount > 0 && tries < 50) {
      System.gc()
      Thread.sleep(50)
      tries += 1
    }
    assert(Broadcasts.liveCount == 0,
      s"weak-tracked broadcast still registered after $tries GC attempts")
    // drain() with only GC-cleared entries takes the id-based
    // block-removal path (BroadcastBlocks.remove) — the deterministic
    // cleanup of blocks whose stub died before the harness drained.
    Broadcasts.drain()
  }
}
