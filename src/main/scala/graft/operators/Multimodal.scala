package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages as `mapPartitions` over typed rows (the Scala
  * analogue of a Pandas-UDF `mapInPandas` batch — iterator-of-rows in,
  * iterator-of-rows out, schema declared up front).
  *
  * The actual codec call is STUBBED with a deterministic fake (this
  * container ships no image/audio libraries): [[fakeDecodeFeatures]]
  * computes an 8-bin byte histogram in place of a real
  * decode-and-embed. Everything AROUND the stub — binary schema,
  * partition-wise batching, typed encoders, metadata struct, the
  * catalog queries — is real and oracle-checked (the fake is exactly
  * reproducible in SQL over UTF-8 text payloads).
  *
  * Scale notes: payloads never shuffle — both stages are narrow
  * mapPartitions; only the (id, small-feature-vector) projection moves.
  */
object Multimodal {

  /** media(id, kind, payload binary, meta struct) — the multimodal table
    * shape; built here from `documents` (text bytes as stand-in payloads,
    * deterministic). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      features: Seq[Double])

  /** Deterministic stand-in for decode+embed: 8-bin histogram of
    * byte % 8, normalized by payload length. A real implementation
    * replaces ONLY the body of this function with a codec call. */
  def fakeDecodeFeatures(payload: Array[Byte]): Seq[Double] = {
    val bins = new Array[Long](8)
    payload.foreach(b => bins((b & 0xff) % 8) += 1)
    val n = payload.length.toDouble
    bins.toSeq.map(_ / n)
  }

  /** Feature extraction as a partition-batched typed map — the
    * mapInPandas-shaped stage. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          MediaFeatures(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            payload.length, fakeDecodeFeatures(payload))
        }
    }
  }

  case class Thumb(media_id: Long, n_bytes: Int, thumb_bytes: Int,
      thumb_sig: Long)

  /** Resize stage: nearest-neighbor downsample of each payload to a
    * fixed `target` size (src index = floor(i·n/t) — the 1-D analogue of
    * image NN resize; payloads at or under target pass through
    * unchanged). Emits the thumb's polynomial signature rather than the
    * bytes so the result stays skinny and SQL-checkable; a real codec
    * implementation would emit the resized payload and only this body
    * changes. Narrow mapPartitions like the other stages — payloads
    * never shuffle. */
  def resizeThumbs(media: DataFrame, target: Int = 32): Dataset[Thumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val p = r.getAs[Array[Byte]]("payload")
          val n = p.length
          val t = math.min(target, n)
          var sig = 0L
          var i = 0
          while (i < t) {
            val b = p((i.toLong * n / t).toInt) & 0xff
            sig = (sig * 31 + b) % 1000000007L
            i += 1
          }
          Thumb(r.getAs[Long]("media_id"), n, t, sig)
        }
    }
  }

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every `stride` bytes, emit a fixed-size slice — the
    * video-frame-sampler shape (flatMap: one payload → N frames). */
  def sampleFrames(media: DataFrame, frameSize: Int = 16,
      stride: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").flatMap { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      Iterator.range(0, math.max(payload.length - frameSize + 1, 0), stride)
        .map(off => Frame(r.getAs[Long]("media_id"), off / stride,
          payload.slice(off, off + frameSize)))
    }
  }
}
