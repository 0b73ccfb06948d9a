package graft.queries

import graft.SparkEntry
import graft.core.Tables

/** q_embed_quantize against a from-scratch sequential recompute: the
  * int8 scalar quantization (per-dimension absmax scale, trunc-toward-
  * zero code and reconstruction) re-derived driver-side from the raw
  * embedding floats with plain Scala Long arithmetic — no Spark
  * expression in the loop — plus the round-trip invariants the int8
  * storage format promises (code range, error bound, saturation only at
  * the extremes). */
class EmbedQuantizeSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** (pos, q) rows exactly as the query's quantizer produces them. */
  private def quantized(): Seq[(Long, Long)] =
    Tables.embeddings(spark, Sf0001)
      .select($"embedding").as[Seq[Float]].collect().toSeq
      .flatMap(_.zipWithIndex.map { case (x, i) =>
        (i.toLong, math.floor(x.toDouble * 1e7).toLong)
      })

  test("per-dimension stats equal the sequential recompute") {
    val got = SparkEntry.queries("q_embed_quantize")(spark, Sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 64L)) // one row per dimension, sorted

    val byPos = quantized().groupBy(_._1)
    val expected = byPos.toSeq.map { case (pos, rows) =>
      val qs = rows.map(_._2)
      val absmax = math.max(qs.map(math.abs).max, 1L)
      val codes = qs.map(q => q * 127 / absmax) // Long / truncates to zero
      val errs = qs.zip(codes).map { case (q, c) =>
        math.abs(q - c * absmax / 127)
      }
      val serr = errs.map(BigInt(_)).sum
      (pos, absmax, qs.size.toLong,
        codes.count(c => c == 127 || c == -127).toLong,
        serr.toLong, errs.max,
        ((serr * 1000000) / (BigInt(qs.size) * absmax)).toLong)
    }.sortBy(_._1)
    assert(got == expected)
  }

  test("round-trip invariants of the int8 format hold") {
    val got = SparkEntry.queries("q_embed_quantize")(spark, Sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    got.foreach { case (_, absmax, n, nSat, sumErr, maxErr, relFp) =>
      assert(n > 0 && nSat >= 1) // the absmax row itself saturates
      assert(nSat <= n)
      // reconstruction error is bounded by one quantization step
      assert(maxErr <= absmax / 127 + 1)
      assert(sumErr <= n * (absmax / 127 + 1))
      // relative error: under half a step of the 254-level grid
      assert(relFp >= 0 && relFp <= 1000000L / 127)
    }
  }
}
