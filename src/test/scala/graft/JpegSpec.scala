package graft

import graft.multimodal.Jpeg

/** Pins the real baseline JPEG codec ([[graft.multimodal.Jpeg]]): exact
  * round-trips on MCU-constant fixtures (the DC-only property that makes
  * the codec-free oracle possible), tolerance round-trips through the AC
  * path on arbitrary gradients, restart markers, chroma subsampling, and
  * loud refusal of everything outside the baseline-sequential subset. */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  // Constant per 8x8 block: the DCT is then DC-only, and with the all-1s
  // quant table the round trip is exact (quantization error < 0.5/8 per
  // sample, see Jpeg.encode doc).
  private def blockVal(bx: Int, by: Int, c: Int): Int = (7 * bx + 13 * by + 85 * c) % 256
  private def blockPix(x: Int, y: Int, c: Int): Int = blockVal(x / 8, y / 8, c)
  // Constant per 16x16 MCU: survives 4:2:0 box-averaging exactly.
  private def mcuPix(x: Int, y: Int, c: Int): Int = blockVal(x / 16, y / 16, c)

  test("zigzag table is the T.81 diagonal walk") {
    // spot-pin the well-known prefix and a full permutation property
    assert(Jpeg.ZigZag.take(10).toSeq == Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Jpeg.ZigZag.sorted.toSeq == (0 until 64))
  }

  test("grey block-constant image round-trips exactly") {
    val (w, h) = (24, 16)
    val jpg = Jpeg.encode(w, h, 1, blockPix)
    val Some((dw, dh, dc, raw)) = Jpeg.decodeRaw(jpg)
    assert((dw, dh, dc) == (w, h, 1))
    val expect = for (y <- 0 until h; x <- 0 until w) yield blockPix(x, y, 0)
    assert(raw.map(_ & 0xff).toSeq == expect)
  }

  // Achromatic (R=G=B) blocks have INTEGER Y and Cb=Cr=128 exactly, so
  // the integer component planes introduce no rounding and the colour
  // round trip is exact. Chromatic blocks round Y/Cb/Cr to bytes before
  // conversion (the real-decoder plane layout), bounding error at
  // (0.5 + 1/16)·(1 + 1.402) < 2 — pinned separately below.
  test("achromatic colour 4:4:4 block-constant image round-trips exactly") {
    val (w, h) = (16, 24)
    val jpg = Jpeg.encode(w, h, 3, (x, y, _) => blockPix(x, y, 0))
    val Some((dw, dh, dc, raw)) = Jpeg.decodeRaw(jpg)
    assert((dw, dh, dc) == (w, h, 3))
    val expect =
      for (y <- 0 until h; x <- 0 until w; _ <- 0 until 3) yield blockPix(x, y, 0)
    assert(raw.map(_ & 0xff).toSeq == expect)
  }

  test("achromatic colour 4:2:0 MCU-constant image round-trips exactly") {
    val (w, h) = (32, 16)
    val jpg = Jpeg.encode(w, h, 3, (x, y, _) => mcuPix(x, y, 0), subsample420 = true)
    val Some((dw, dh, dc, raw)) = Jpeg.decodeRaw(jpg)
    assert((dw, dh, dc) == (w, h, 3))
    val expect =
      for (y <- 0 until h; x <- 0 until w; _ <- 0 until 3) yield mcuPix(x, y, 0)
    assert(raw.map(_ & 0xff).toSeq == expect)
  }

  test("chromatic block-constant colour stays within the plane-rounding bound") {
    val (w, h) = (16, 16)
    val jpg = Jpeg.encode(w, h, 3, blockPix)
    val Some((_, _, _, raw)) = Jpeg.decodeRaw(jpg)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val got = raw((y * w + x) * 3 + c) & 0xff
      worst = math.max(worst, math.abs(got - blockPix(x, y, c)))
    }
    assert(worst <= 2, s"chromatic error $worst exceeds the rounding bound")
  }

  test("restart markers (DRI/RSTn) decode identically") {
    val (w, h) = (40, 24)
    val plain = Jpeg.encode(w, h, 1, blockPix)
    val rst = Jpeg.encode(w, h, 1, blockPix, restartEvery = 2)
    assert(rst.length > plain.length) // markers really were emitted
    val Some((_, _, _, a)) = Jpeg.decodeRaw(plain)
    val Some((_, _, _, b)) = Jpeg.decodeRaw(rst)
    assert(a.toSeq == b.toSeq)
  }

  test("arbitrary gradient survives the AC path within quant tolerance") {
    // non-constant blocks: every AC machinery piece (run lengths, EOB,
    // magnitude categories) is exercised; with q=1 the error bound is
    // small but nonzero (coefficient rounding through the IDCT).
    val (w, h) = (21, 13) // non-MCU-aligned: exercises edge-block cropping
    def grad(x: Int, y: Int, c: Int): Int = (x * 11 + y * 23 + c * 5) % 256
    val jpg = Jpeg.encode(w, h, 3, grad)
    val Some((dw, dh, dc, raw)) = Jpeg.decodeRaw(jpg)
    assert((dw, dh, dc) == (w, h, 3))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val got = raw((y * w + x) * 3 + c) & 0xff
      worst = math.max(worst, math.abs(got - grad(x, y, c)))
    }
    assert(worst <= 8, s"max abs error $worst exceeds quant tolerance")
  }

  test("steep quant tables still decode (lossy but in range)") {
    val q = Array.tabulate(64)(i => math.min(255, 16 + 4 * i))
    val (w, h) = (16, 16)
    def grad(x: Int, y: Int, c: Int): Int = (x * 16 + y * 3) % 256
    val jpg = Jpeg.encode(w, h, 1, grad, quant = q)
    val Some((_, _, _, raw)) = Jpeg.decodeRaw(jpg)
    assert(raw.length == w * h)
  }

  test("everything outside the baseline subset refuses") {
    val good = Jpeg.encode(16, 16, 1, blockPix)
    assert(Jpeg.decodeRaw(good).isDefined)
    def patched(find: Int => Boolean, repl: Int): Array[Byte] = {
      val out = good.clone()
      val i = out.indices.drop(2).find(j =>
        (out(j - 1) & 0xff) == 0xff && find(out(j) & 0xff)).get
      out(i) = repl.toByte
      out
    }
    // SOF0 -> SOF2 (progressive): refuse at the marker
    assert(Jpeg.decodeRaw(patched(_ == 0xc0, 0xc2)).isEmpty)
    // SOF0 -> SOF9 (arithmetic): refuse
    assert(Jpeg.decodeRaw(patched(_ == 0xc0, 0xc9)).isEmpty)
    // 12-bit precision: byte after SOF length; patch and refuse
    val sofAt = good.indices.drop(2).find(j =>
      (good(j - 1) & 0xff) == 0xff && (good(j) & 0xff) == 0xc0).get
    val deep = good.clone(); deep(sofAt + 3) = 12.toByte
    assert(Jpeg.decodeRaw(deep).isEmpty)
    // truncated entropy stream
    assert(Jpeg.decodeRaw(good.take(good.length - 8)).isEmpty)
    // truncated before the scan
    assert(Jpeg.decodeRaw(good.take(40)).isEmpty)
    // not a JPEG, empty, null
    assert(Jpeg.decodeRaw("definitely not a jpeg".getBytes("UTF-8")).isEmpty)
    assert(Jpeg.decodeRaw(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodeRaw(null).isEmpty)
    val s = Jpeg.decodePixels(1L, null)
    assert(!s.ok && s.width.isEmpty && s.pix_sum.isEmpty)
  }

  test("decodePixels stats are the exact closed-form aggregates") {
    val (w, h) = (32, 32)
    val jpg = Jpeg.encode(w, h, 3, (x, y, _) => mcuPix(x, y, 0), subsample420 = true)
    val st = Jpeg.decodePixels(5L, jpg)
    assert(st.ok)
    val vals = for (y <- 0 until h; x <- 0 until w; _ <- 0 until 3)
      yield mcuPix(x, y, 0)
    assert(st.width.contains(w) && st.height.contains(h) && st.channels.contains(3))
    assert(st.n_pixels.contains(w.toLong * h))
    assert(st.pix_sum.contains(vals.map(_.toLong).sum))
    assert(st.pix_min.contains(vals.min) && st.pix_max.contains(vals.max))
  }

  test("pixelStats decodes a mixed batch, nulling only the bad rows") {
    val rows = Seq(
      (1L, Jpeg.encode(16, 8, 1, blockPix)),
      (2L, Jpeg.encode(8, 8, 3, blockPix)),
      (3L, "garbage".getBytes("UTF-8")))
    val out = Jpeg.pixelStats(rows.toDF("id", "blob"), "id", "blob")
      .orderBy("asset_id").collect()
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, true, false))
    assert(out(0).getLong(6) == 16L * 8)  // n_pixels
    assert(out(1).getInt(5) == 3)         // channels
    assert(out(2).isNullAt(6))            // bad row: null features
  }
}
