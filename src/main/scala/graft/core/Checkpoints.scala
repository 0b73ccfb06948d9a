package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-selectable materialization for the iterative/multi-consumer
  * queries (graph family, dedup CC loop, scoring histograms) that must
  * evaluate a relation once and reuse it.
  *
  * Mode conf: `graft.checkpoint.mode` — read per call, so one session
  * can switch per job.
  *
  *  - `local` (default): eager `localCheckpoint()` — fastest (blocks on
  *    executor local disk/memory, lineage truncated). The local[*] /
  *    single-JVM choice. The trade the 100 TB story must name: lineage
  *    is GONE, so on a real cluster one lost executor kills any query
  *    still holding only locally-checkpointed blocks.
  *  - `disk`: eager `persist(DISK_ONLY)` — blocks spill to local disk
  *    but lineage is PRESERVED: a lost executor's blocks are recomputed
  *    from source, the fault-tolerant cluster default. Hash
  *    partitioning survives (InMemoryTableScan forwards the cached
  *    plan's partitioning), so the zero-exchange join shapes built on
  *    checkpointed relations hold in this mode too.
  *  - `reliable`: `checkpoint()` to the SparkContext checkpoint dir
  *    (set to a session-local tmp dir if unset) — blocks on shared
  *    reliable storage (HDFS/S3 on a cluster), surviving executor AND
  *    node loss without recompute; the right mode when the materialized
  *    relation is expensive enough that re-deriving it is worse than
  *    re-reading it.
  *
  * All three are EAGER (the persist path forces a count) so consumers
  * see identical once-evaluated semantics, and all three preserve the
  * child plan's output partitioning — callers' co-location contracts
  * (e.g. the wedge join's zero-exchange shape) are mode-independent.
  */
object Checkpoints {

  val ModeKey = "graft.checkpoint.mode"

  def materialize(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint()
      case "disk" =>
        val p = df.persist(StorageLevel.DISK_ONLY)
        p.count() // eager: consumers find built blocks, like localCheckpoint
        p
      case "reliable" =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(new java.io.File(
            System.getProperty("java.io.tmpdir"),
            s"graft-ckpt-${sc.applicationId}").getPath)
        }
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local|disk|reliable, got '$other'")
    }
  }

  /** `df.materialized` sugar at the former `.localCheckpoint()` sites. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = materialize(df)
  }
}
