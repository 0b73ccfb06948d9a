package graft

import java.io.File

import graft.sources.FileKvStore

/** Durability contract of the file-backed KV store (reference S15/serving
  * boundary): writes from distributed tasks are visible to a FRESH handle
  * on the directory — what a restarted JVM sees — with last-write-wins
  * upsert semantics and lossless key/value encoding. */
class FileKvStoreSpec extends SparkTestBase {

  private def freshDir(name: String): String = {
    val d = s"target/test_kvstore/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new File(d))
    d
  }

  test("distributed foreachPartition writes survive a fresh handle") {
    val dir = freshDir("distributed")
    val store = new FileKvStore(dir)
    import spark.implicits._
    spark.range(0, 100).toDF("id").repartition(8)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach(r => store.upsert(s"k${r.getLong(0)}", s"v${r.getLong(0)}"))
      }
    // Read through the companion, not the writing instance — the view a
    // restarted serving JVM gets from the directory alone.
    val back = FileKvStore.read(dir)
    assert(back.size == 100)
    assert(back("k42") == "v42")
    // 8 partitions wrote 8 independent log files: no shared-file contention.
    assert(new File(dir).listFiles().count(_.getName.startsWith("log-")) == 8)
  }

  test("last write wins across store generations (restart + re-upsert)") {
    val dir = freshDir("lww")
    val gen1 = new FileKvStore(dir)
    gen1.upsert("a", "old")
    gen1.upsert("b", "kept")
    Thread.sleep(5) // filename ordering is millisecond-granular
    val gen2 = new FileKvStore(dir) // a restarted writer JVM
    gen2.upsert("a", "new")
    val back = FileKvStore.read(dir)
    assert(back == Map("a" -> "new", "b" -> "kept"))
  }

  test("keys and values with tabs, newlines, and unicode round-trip") {
    val dir = freshDir("encoding")
    val store = new FileKvStore(dir)
    val k = "key\twith\ntricky|chars"
    val v = "value\twith\nnewlines £ 中文"
    store.upsert(k, v)
    assert(new FileKvStore(dir).get(k).contains(v))
  }

  test("compact preserves the merged view in a single log") {
    val dir = freshDir("compact")
    val gen1 = new FileKvStore(dir)
    (1 to 10).foreach(i => gen1.upsert(s"k$i", "old"))
    Thread.sleep(5)
    val gen2 = new FileKvStore(dir)
    gen2.upsert("k3", "new")
    FileKvStore.compact(dir)
    assert(new File(dir).listFiles().count(_.getName.startsWith("log-")) == 1)
    val back = FileKvStore.read(dir)
    assert(back.size == 10)
    assert(back("k3") == "new")
    assert(back("k1") == "old")
  }

  test("rowSink adapter keys rows by column and serializes sorted k=v") {
    val dir = freshDir("rowsink")
    val sink = new FileKvStore(dir).rowSink("job_id")
    sink.put(Map("job_id" -> "j1", "job" -> "data engineer", "s1" -> "python"))
    val back = FileKvStore.read(dir)
    assert(back("j1") == "job=data engineer,job_id=j1,s1=python")
  }
}
