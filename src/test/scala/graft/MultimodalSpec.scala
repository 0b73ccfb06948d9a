package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, partition-batched feature
  * extraction (stubbed decode), frame sampling fan-out. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media =
    Multimodal.mediaTable(Tables.documents(spark, Sf0001)).cache()

  // The session is suite-shared: release the fixture cache so the
  // no-pinned-cache invariant in SmokeSpec stays strict.
  override protected def afterAll(): Unit = {
    media.unpersist()
    super.afterAll()
  }

  test("media table schema: binary payload + metadata struct") {
    val f = media.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() > 0)
  }

  test("features: 8 normalized bins summing to 1") {
    val rows = Multimodal.extractFeatures(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.features.length == 8)
      assert(math.abs(r.features.sum - 1.0) < 1e-9)
      assert(r.n_bytes > 0)
    }
  }

  test("fake decode matches a hand-computed histogram") {
    val payload = "abcabc".getBytes("UTF-8") // a=97%8=1, b=98%8=2, c=99%8=3
    val f = Multimodal.fakeDecodeFeatures(payload)
    assert(f(1) == 2.0 / 6 && f(2) == 2.0 / 6 && f(3) == 2.0 / 6)
    assert(f(0) == 0.0)
  }

  test("frame sampling emits fixed-size frames at the stride") {
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 16))
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }
}
