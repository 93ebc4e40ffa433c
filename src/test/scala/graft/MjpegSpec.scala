package graft

import graft.multimodal.{Jpeg, Mjpeg}

/** Pins for MJPEG-in-AVI frame sampling ([[graft.multimodal.Mjpeg]]):
  * container round-trip, stride semantics, the RIFF even-padding rule,
  * per-frame vs container refusals, and bounds-checked walks. */
class MjpegSpec extends SparkSpec {

  // Achromatic constant frames: the lossy codec is exact on these
  // (JpegSpec), so decoded stats are closed-form.
  private def grey16(v: Int): Array[Byte] =
    Jpeg.encode(16, 16, 1, (_, _, _) => v)

  test("round-trip: every frame decodes with exact constant-block stats") {
    val avi = Mjpeg.encodeAvi(16, 16, fps = 5,
      frames = Seq(grey16(10), grey16(20), grey16(30)))
    val rows = Mjpeg.sampleFrames(7L, avi, stride = 1)
    assert(rows.length == 3)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.ok && r.asset_id == 7L)
      assert(r.n_frames.contains(3) && r.frame_idx.contains(i))
      assert(r.width.contains(16) && r.height.contains(16) &&
        r.channels.contains(1))
      assert(r.n_pixels.contains(256L))
      assert(r.pix_sum.contains(256L * (10 + 10 * i)))
      assert(r.pix_min.contains(10 + 10 * i) && r.pix_max.contains(10 + 10 * i))
    }
  }

  test("stride samples frames 0, k, 2k and skips the rest") {
    val avi = Mjpeg.encodeAvi(16, 16, fps = 5,
      frames = (0 until 5).map(i => grey16(i + 1)))
    val rows = Mjpeg.sampleFrames(1L, avi, stride = 2)
    assert(rows.map(_.frame_idx.get) == Seq(0, 2, 4))
    assert(rows.forall(_.n_frames.contains(5)))
    assert(rows.map(_.pix_min.get) == Seq(1, 3, 5))
  }

  test("odd-sized frame chunks are padded: the next frame still aligns") {
    // Frame 0 is odd-length garbage (a per-frame refusal, not a
    // container one); if the walker forgot the RIFF pad byte, frame 1's
    // header would be misread and the walk would refuse or misalign.
    val garbage = Array[Byte](1, 2, 3)
    val avi = Mjpeg.encodeAvi(16, 16, fps = 5, frames = Seq(garbage, grey16(42)))
    val rows = Mjpeg.sampleFrames(2L, avi, stride = 1)
    assert(rows.length == 2)
    assert(!rows(0).ok && rows(0).frame_idx.contains(0) &&
      rows(0).n_frames.contains(2))
    assert(rows(1).ok && rows(1).pix_min.contains(42))
  }

  test("container refusals: truncation, bad magic, overrun, no movi") {
    val good = Mjpeg.encodeAvi(16, 16, fps = 5, frames = Seq(grey16(9)))
    def refused(bytes: Array[Byte]): Boolean = {
      val rows = Mjpeg.sampleFrames(0L, bytes, stride = 1)
      rows.length == 1 && !rows.head.ok && rows.head.n_frames.isEmpty
    }
    assert(refused(null))
    assert(refused(good.take(8)))                      // truncated header
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(refused(badMagic))                          // not RIFF
    assert(refused(good.dropRight(6)))                 // chunk overruns RIFF
    // RIFF with a declared size past the buffer
    val lied = good.clone(); lied(4) = (lied(4) + 64).toByte
    assert(refused(lied))
    // valid RIFF/AVI whose movi fourcc is corrupted -> no movi list
    val noMovi = good.clone()
    val moviAt = noMovi.sliding(4).indexWhere(
      _.sameElements("movi".getBytes("US-ASCII")))
    noMovi(moviAt) = 'x'.toByte
    assert(refused(noMovi))
  }

  test("empty movi list emits one zero-frame row, so the asset never vanishes") {
    val avi = Mjpeg.encodeAvi(16, 16, fps = 5, frames = Seq.empty)
    val rows = Mjpeg.sampleFrames(3L, avi, stride = 1)
    assert(rows.length == 1)
    assert(!rows.head.ok)
    assert(rows.head.n_frames.contains(0))   // container fine, zero frames
    assert(rows.head.frame_idx.isEmpty)
  }

  test("the batch op is shuffle-free") {
    import spark.implicits._
    val df = Seq((1L, Mjpeg.encodeAvi(16, 16, 5, Seq(grey16(1)))))
      .toDF("doc_id", "asset")
    val plan = Mjpeg.frameStats(df, "doc_id", "asset", stride = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
