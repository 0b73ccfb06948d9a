package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Streaming state-scale probe — the measured evidence behind the
  * streaming surface's bounded-state claims (SCALE_PROBE.md "Streaming
  * state at scale").
  *
  * The behavioral suite (StreamingSpec) pins CORRECTNESS on tiny
  * MemoryStream fixtures; this main drives the RocksDB-backed stateful
  * operators with a full scale-probe events corpus fed in chronological
  * chunks, and records, per micro-batch: input rows, wall seconds,
  * state-store rows, and state bytes (the store's own usage metric).
  * What the numbers must show, per operator:
  *
  *  - `ewma` (`transformWithState`, ListState last-64 buffer): state rows
  *    = distinct users seen so far, byte size O(users · K) — growth
  *    tracks NEW users only, never total events processed.
  *  - `attribution` (`transformWithState`, one ValueState): state rows =
  *    users, O(1) bytes per user.
  *  - `sliding` (watermarked 10/5-minute windowed agg): state rows =
  *    open windows × event types, BOUNDED by the watermark horizon —
  *    rows must plateau and shrink as the watermark closes windows,
  *    never track corpus size.
  *
  * Usage: runMain graft.StateScaleProbe [eventsSfDir] [nChunks]
  *        (defaults: /tmp/graft_scale/x10 10)
  * The corpus is fed in event-time order (sorted by ts, event_id), so
  * the watermark advances once per chunk like a live ingest tail. */
object StateScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale/x10"
    val nChunks = if (args.length > 1) args(1).toInt else 10

    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.EventsStreaming
    import EventsStreaming.Event

    val all = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .orderBy($"ts", $"event_id")
      .as[Event].collect()
    println(s"""{"probe":"corpus","dir":"$dir","rows":${all.length}}""")
    val chunks = all.grouped((all.length + nChunks - 1) / nChunks).toSeq

    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    /** Feed the corpus chunk-by-chunk through `build`, recording one
      * JSON line per micro-batch from the query's progress metrics. */
    def drive(name: String)(
        build: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
          => org.apache.spark.sql.DataFrame): Unit = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Event](spark)
      val q = build(input).writeStream.format("noop")
        .outputMode(OutputMode.Update).start()
      try {
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          val t0 = System.nanoTime()
          input.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          val so = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators.toSeq)
          val rows = so.map(_.numRowsTotal).sum
          val bytes = so.map(_.memoryUsedBytes).sum
          // memoryUsedBytes on the RocksDB provider counts ALL SST files
          // including obsolete pre-compaction/changelog versions — an
          // accumulation artifact of the local checkpoint dir, not live
          // state. The live-state figures are `state_rows`
          // (numRowsTotal) and the per-batch FLUSH volume (bytes of
          // actual state written this batch, which must track state
          // churn, not history length).
          import scala.jdk.CollectionConverters._
          val cm = so.flatMap(_.customMetrics.asScala)
            .groupMapReduce(_._1)((kv: (String, java.lang.Long)) =>
              kv._2.longValue)(_ + _)
          val flush = cm.getOrElse("rocksdbTotalBytesWrittenByFlush", 0L)
          println(s"""{"probe":"$name","chunk":${i + 1},"rows_in":${chunk.length},"sec":${f3(sec)},"rows_per_sec":${f3(chunk.length / sec)},"state_rows":$rows,"batch_flush_bytes":$flush,"sst_accum_bytes":$bytes}""")
        }
      } finally q.stop()
    }

    drive("ewma")(in => EventsStreaming.ewmaUpdates(in.toDS()).toDF())
    drive("attribution")(in =>
      EventsStreaming.attributionUpdates(in.toDS()).toDF())
    drive("sliding")(in => EventsStreaming.slidingCounts(in.toDS().toDF()))

    spark.stop()
  }
}
