// Hosted in an org.apache.spark subpackage: BlockManagerMaster is
// private[spark], the same hosting precedent as sql.graft.MoneyDecimal.
package org.apache.spark.graft

import org.apache.spark.SparkEnv

/** Synchronous removal of a broadcast's blocks BY ID — what
  * ContextCleaner does asynchronously once GC proves a stub dead, made
  * callable for [[graft.core.Broadcasts.drain]]'s determinism contract:
  * a stub whose WeakReference was already cleared cannot be
  * `destroy()`ed (the object is gone) but its executor/driver-resident
  * blocks still exist until the cleaner thread gets to them. */
object BroadcastBlocks {
  def remove(broadcastId: Long): Unit =
    SparkEnv.get.blockManager.master
      .removeBroadcast(broadcastId, removeFromMaster = true, blocking = true)
}
