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
  * Codec seam: PNG and JPEG payloads (detected by magic bytes) are
  * decoded with the JDK-built-in `javax.imageio` ([[ImageCodec]]) and
  * yield REAL pixel statistics — an 8-bin luma histogram for features,
  * a nearest-neighbor 2-D downsample for thumbnails. Every other
  * payload falls back to a deterministic byte-level fake
  * ([[fakeDecodeFeatures]]) so the text stand-in payloads used by the
  * catalog queries stay exactly reproducible in SQL (the DuckDB
  * oracle). Audio/video codecs are out of scope for this container and
  * keep the byte fallback.
  *
  * Scale notes: payloads never shuffle — both stages are narrow
  * mapPartitions; only the (id, small-feature-vector) projection moves.
  * Magic-byte sniffing is O(1) per row, so non-image payloads never pay
  * ImageIO's cost.
  */
object Multimodal {

  /** Magic-byte sniffing + JDK `javax.imageio` decode for PNG/JPEG. */
  object ImageCodec {
    def isPng(p: Array[Byte]): Boolean =
      p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
        p(3) == 'G'
    def isJpeg(p: Array[Byte]): Boolean =
      p.length > 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
        (p(2) & 0xff) == 0xff
    def isImage(p: Array[Byte]): Boolean = isPng(p) || isJpeg(p)

    /** Decode to a BufferedImage; None for non-image or corrupt payloads
      * (callers fall back to the byte-level stub). */
    def decode(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!isImage(p)) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
        catch { case _: java.io.IOException => None }

    /** Integer BT.601 luma in [0,255] from a packed ARGB pixel. */
    def luma(argb: Int): Int = {
      val r = (argb >> 16) & 0xff; val g = (argb >> 8) & 0xff
      val b = argb & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }

    /** 8-bin luma histogram (bin = luma/32) normalized by pixel count —
      * the real-decode analogue of the byte-histogram stub: same arity,
      * same sums-to-1 contract. */
    def lumaHistogram(img: java.awt.image.BufferedImage): Seq[Double] = {
      val bins = new Array[Long](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          bins(luma(img.getRGB(x, y)) / 32) += 1
          x += 1
        }
        y += 1
      }
      val n = (img.getWidth.toLong * img.getHeight).toDouble
      bins.toSeq.map(_ / n)
    }

    /** Nearest-neighbor downsample to a `side`×`side` luma grid
      * (src = floor(i·w/side) — the 2-D form of the byte-path resize).
      * Returns the luma bytes in row-major order. */
    def resizeLuma(img: java.awt.image.BufferedImage, side: Int): Array[Int] = {
      val w = img.getWidth; val h = img.getHeight
      val s = math.min(side, math.min(w, h))
      val out = new Array[Int](s * s)
      var j = 0
      while (j < s) {
        var i = 0
        while (i < s) {
          out(j * s + i) =
            luma(img.getRGB((i.toLong * w / s).toInt, (j.toLong * h / s).toInt))
          i += 1
        }
        j += 1
      }
      out
    }
  }

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

  /** Deterministic byte-level fallback for non-image payloads: 8-bin
    * histogram of byte % 8, normalized by payload length — exactly
    * reproducible in SQL over UTF-8 text stand-ins, which is what the
    * DuckDB oracle checks. */
  def fakeDecodeFeatures(payload: Array[Byte]): Seq[Double] = {
    val bins = new Array[Long](8)
    payload.foreach(b => bins((b & 0xff) % 8) += 1)
    val n = payload.length.toDouble
    bins.toSeq.map(_ / n)
  }

  /** Codec dispatch: real luma histogram for decodable PNG/JPEG,
    * byte-histogram fallback otherwise. Both emit 8 bins summing to 1. */
  def decodeFeatures(payload: Array[Byte]): Seq[Double] =
    ImageCodec.decode(payload) match {
      case Some(img) => ImageCodec.lumaHistogram(img)
      case None      => fakeDecodeFeatures(payload)
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
            payload.length, decodeFeatures(payload))
        }
    }
  }

  case class Thumb(media_id: Long, n_bytes: Int, thumb_bytes: Int,
      thumb_sig: Long)

  /** Polynomial signature over a value sequence — keeps thumbnail results
    * skinny and SQL-checkable instead of shipping raw pixel bytes. */
  def thumbSignature(values: Iterator[Int]): Long = {
    var sig = 0L
    values.foreach(v => sig = (sig * 31 + v) % 1000000007L)
    sig
  }

  /** Resize stage. Decodable PNG/JPEG payloads get a REAL 2-D
    * nearest-neighbor downsample to a `target`×`target` luma grid
    * (`thumb_bytes` = side², the thumb pixel count); every other payload
    * gets the 1-D byte-index analogue (src = floor(i·n/t), payloads at
    * or under target pass through). Both emit the thumb's polynomial
    * signature rather than the bytes. Narrow mapPartitions like the
    * other stages — payloads never shuffle. */
  def resizeThumbs(media: DataFrame, target: Int = 32): Dataset[Thumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val p = r.getAs[Array[Byte]]("payload")
          ImageCodec.decode(p) match {
            case Some(img) =>
              val lumas = ImageCodec.resizeLuma(img, target)
              Thumb(r.getAs[Long]("media_id"), p.length, lumas.length,
                thumbSignature(lumas.iterator))
            case None =>
              val n = p.length
              val t = math.min(target, n)
              val sig = thumbSignature(
                Iterator.range(0, t).map(i => p((i.toLong * n / t).toInt) & 0xff))
              Thumb(r.getAs[Long]("media_id"), n, t, sig)
          }
        }
    }
  }

  /** 63-bit average hash (aHash — the DCT-free perceptual hash): 63
    * deterministic samples, bit i set iff 63·v_i > Σv — a strict integer
    * compare against the un-divided total, so there is no rounding
    * anywhere. Decodable PNG/JPEG payloads sample a REAL 9×7 luma grid
    * (nearest-neighbor, same src arithmetic as [[ImageCodec.resizeLuma]]);
    * every other payload samples bytes at src = floor(i·n/63) — the 1-D
    * analogue, exactly reproducible in SQL over the text stand-ins.
    * 63 bits (not 64) keeps the hash positive in a signed int64 AND
    * splits evenly into 9 pigeonhole chunks of 7 bits — the banding
    * width behind the hamming <= 8 near-dup query. */
  val AHashBits = 63

  def ahashFromValues(vs: Array[Int]): Long = {
    var sum = 0L
    vs.foreach(sum += _)
    var h = 0L
    var i = 0
    while (i < vs.length) {
      if (AHashBits.toLong * vs(i) > sum) h |= 1L << i
      i += 1
    }
    h
  }

  def ahash(p: Array[Byte]): Long =
    ImageCodec.decode(p) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        val vs = new Array[Int](AHashBits)
        var j = 0
        while (j < 7) {
          var i = 0
          while (i < 9) {
            vs(j * 9 + i) = ImageCodec.luma(
              img.getRGB((i.toLong * w / 9).toInt, (j.toLong * h / 7).toInt))
            i += 1
          }
          j += 1
        }
        ahashFromValues(vs)
      case None =>
        val n = p.length
        if (n == 0) 0L
        else ahashFromValues(
          Array.tabulate(AHashBits)(i => p((i.toLong * n / AHashBits).toInt) & 0xff))
    }

  case class MediaHash(media_id: Long, ahash: Long)

  /** Perceptual-hash stage: one narrow typed map, payloads never shuffle
    * — downstream near-dup joins move only (id, 60-bit hash) pairs. */
  def perceptualHashes(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map(r =>
          MediaHash(r.getAs[Long]("media_id"),
            ahash(r.getAs[Array[Byte]]("payload"))))
    }
  }

  /** RIFF/WAVE sniffing + 8-bit mono PCM parse — the audio analogue of
    * [[ImageCodec]]'s seam: a payload that really is a WAV yields its
    * actual PCM samples; everything else (the catalog's text stand-ins
    * included) falls back to raw bytes, keeping the DuckDB oracle able
    * to reproduce the result exactly. Unsigned 8-bit PCM centers at
    * 128, so samples land in [-128, 127]. */
  object WavCodec {
    def isWav(p: Array[Byte]): Boolean =
      p.length > 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E'

    private def le16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

    /** Centered samples of an 8-bit mono linear-PCM WAV; None for any
      * other payload or encoding (callers fall back to raw bytes). */
    def samples(p: Array[Byte]): Option[Array[Int]] = {
      if (!isWav(p)) return None
      var off = 12
      var pcm8Mono = false
      while (off + 8 <= p.length) {
        val id = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(p, off + 4)
        if (size < 0 || off + 8 + size > p.length) return None
        id match {
          case "fmt " if size >= 16 =>
            pcm8Mono = le16(p, off + 8) == 1 && // linear PCM
              le16(p, off + 10) == 1 &&         // mono
              le16(p, off + 22) == 8            // 8-bit
          case "data" =>
            return if (!pcm8Mono) None
            else Some(Array.tabulate(size)(i => (p(off + 8 + i) & 0xff) - 128))
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      None
    }
  }

  /** Frame length (samples) and the active-frame energy threshold of the
    * audio feature stage: a frame is "active" (speech/energy vs silence
    * — the VAD gate of an audio ingest pipeline) when its energy
    * Σ s² exceeds [[AudioFrameLen]] × a mean-square of 1800 (RMS ≈ 42
    * on the [-128,127] sample scale). */
  val AudioFrameLen = 64
  val AudioActiveEnergy: Long = AudioFrameLen.toLong * 1800

  case class AudioFeatures(media_id: Long, n_frames: Long,
      total_energy: Long, max_energy: Long, n_active: Long, total_zc: Long)

  /** Per-media audio stats from centered samples: non-overlapping
    * [[AudioFrameLen]]-sample frames (partial tail dropped), per-frame
    * energy Σ s² and zero-crossing count, folded to one skinny row —
    * frame state never materializes. None when the payload is shorter
    * than one frame. */
  def audioStats(mediaId: Long, s: Array[Int]): Option[AudioFeatures] = {
    val nf = s.length / AudioFrameLen
    if (nf == 0) return None
    var totE = 0L; var maxE = 0L; var nAct = 0L; var totZc = 0L
    var f = 0
    while (f < nf) {
      val base = f * AudioFrameLen
      var e = 0L; var zc = 0L
      var i = 0
      while (i < AudioFrameLen) {
        val v = s(base + i)
        e += v.toLong * v
        if (i > 0 && (v < 0) != (s(base + i - 1) < 0)) zc += 1
        i += 1
      }
      totE += e; totZc += zc
      if (e > maxE) maxE = e
      if (e > AudioActiveEnergy) nAct += 1
      f += 1
    }
    Some(AudioFeatures(mediaId, nf, totE, maxE, nAct, totZc))
  }

  /** Audio feature extraction over the `kind = 'audio'` slice: decode
    * through the [[WavCodec]] seam (raw-byte fallback for non-WAV
    * payloads), then frame + energy + zero-crossings + VAD gating per
    * media. Narrow mapPartitions like the other stages — payloads never
    * shuffle; only the 6-column stats row moves. */
  def audioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("media_id", "payload").mapPartitions {
        (rows: Iterator[Row]) =>
          rows.flatMap { r =>
            val p = r.getAs[Array[Byte]]("payload")
            val s = WavCodec.samples(p)
              .getOrElse(p.map(b => (b & 0xff) - 128))
            audioStats(r.getAs[Long]("media_id"), s)
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
