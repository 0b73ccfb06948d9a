package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventsStreaming

/** End-to-end Structured-Streaming smoke: events-shaped JSON files →
  * file-source stream → watermarked tumbling aggregation → foreachBatch
  * upsert store, run with Trigger.AvailableNow (the batch-cadence analogue
  * of the reference's daily drop folder).
  *
  * Usage: runMain graft.StreamingSmoke [workDir]
  */
object StreamingSmoke {

  object Store {
    val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0) else "target/streaming_smoke"
    val inDir = s"$work/in"
    val ckpt = s"$work/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    Files.createDirectories(Paths.get(inDir))
    // Two drop files, overlapping windows.
    Files.writeString(Paths.get(s"$inDir/batch1.json"), Seq(
      """{"event_id":1,"ts":"2024-01-01T10:01:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T10:02:00.000Z","user_id":1,"event_type":"view","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T10:06:00.000Z","user_id":2,"event_type":"click","value":3.0}""").mkString("\n"))
    Files.writeString(Paths.get(s"$inDir/batch2.json"), Seq(
      """{"event_id":4,"ts":"2024-01-01T10:07:00.000Z","user_id":2,"event_type":"click","value":4.0}""",
      """{"event_id":5,"ts":"2024-01-01T10:11:00.000Z","user_id":3,"event_type":"view","value":5.0}""").mkString("\n"))

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = EventsStreaming.fileSource(spark, inDir)
    val counts = EventsStreaming.tumblingCounts(events)
    val q = counts.writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cols = batch.columns
        batch.collect().foreach { r =>
          Store.map.put(s"${r.get(0)}|${r.get(1)}",
            cols.zipWithIndex.map { case (c, i) => s"$c=${r.get(i)}" }
              .mkString(","))
        }
      }
      .start()
    q.awaitTermination()
    println("=== upserted window counts ===")
    Store.map.forEach((k, v) => println(s"$k -> $v"))
    println(s"STORE_KEYS=${Store.map.size}")
    spark.stop()
  }
}
