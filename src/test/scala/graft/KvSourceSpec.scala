package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources.{EqualTo, StringStartsWith}

import graft.sources.kv.KvScan

/** The graftkv DataSourceV2 connector (`sources/KvDataSource.scala`):
  * write→read round-trip against the FileKvStore log, upsert semantics
  * through the connector, and the filter-pushdown contract (claimed
  * filters appear on the scan AND are applied exactly). */
class KvSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graftkv-spec").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private def write(dir: String, rows: (String, String)*): Unit =
    rows.toDF("key", "value")
      .write.format("graftkv").mode("append").save(dir)

  test("write-read round-trip preserves pairs") {
    val dir = freshDir()
    write(dir, "a" -> "1", "b" -> "2", "tab\tkey" -> "new\nline")
    val got = spark.read.format("graftkv").load(dir)
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "1", "b" -> "2", "tab\tkey" -> "new\nline"))
  }

  test("a second write upserts: last write wins per key") {
    val dir = freshDir()
    write(dir, "a" -> "old", "b" -> "keep")
    Thread.sleep(2) // segment order is millisecond-granular across writers
    write(dir, "a" -> "new")
    val got = spark.read.format("graftkv").load(dir)
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "new", "b" -> "keep"))
  }

  test("key predicates are claimed by the scan and applied exactly") {
    val dir = freshDir()
    write(dir, "order:1" -> "x", "order:10" -> "y", "part:1" -> "z")
    val df = spark.read.format("graftkv").load(dir)
      .filter($"key".startsWith("order:"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size === 1)
    val pushed = scans.head.asInstanceOf[KvScan].pushed
    assert(pushed.toSeq === Seq(StringStartsWith("key", "order:")))
    assert(df.as[(String, String)].collect().toMap ===
      Map("order:1" -> "x", "order:10" -> "y"))

    val eq = spark.read.format("graftkv").load(dir)
      .filter($"key" === "part:1")
    val eqPushed = eq.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[KvScan].pushed
    assert(eqPushed.toSeq === Seq(EqualTo("key", "part:1")))
    assert(eq.as[(String, String)].collect().toSeq === Seq("part:1" -> "z"))
  }

  test("exact-key filters prune the scan to the matching slices") {
    val dir = freshDir()
    write(dir, "a" -> "1", "b" -> "2")
    def partitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      }.head.asInstanceOf[KvScan].toBatch.planInputPartitions().length
    val point = spark.read.format("graftkv").load(dir)
      .filter($"key" === "a")
    assert(partitions(point) === 1)
    assert(point.count() === 1L)
    val full = spark.read.format("graftkv").load(dir)
      .filter($"key".startsWith("a")) // prefix can't prune
    assert(partitions(full) === graft.sources.kv.KvDataSource.NumSlices)
  }

  test("an aborted segment writer leaves nothing a reader can see") {
    val dir = freshDir()
    write(dir, "kept" -> "1")
    val seg = new graft.sources.FileKvStore.SegmentWriter(dir)
    seg.append("phantom", "2")
    seg.abort()
    assert(graft.sources.FileKvStore.read(dir) === Map("kept" -> "1"))
    assert(new java.io.File(dir).listFiles().forall(
      !_.getName.endsWith(".tmp")))
  }

  test("value predicates stay residual and still filter correctly") {
    val dir = freshDir()
    write(dir, "a" -> "hit", "b" -> "miss")
    val df = spark.read.format("graftkv").load(dir)
      .filter($"value" === "hit")
    val pushed = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[KvScan].pushed
    assert(pushed.isEmpty)
    assert(df.as[(String, String)].collect().toSeq === Seq("a" -> "hit"))
  }
}
