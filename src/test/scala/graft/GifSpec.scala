package graft

import graft.multimodal.Gif

/** Pins the real GIF/LZW pixel codec ([[graft.multimodal.Gif]]):
  * lossless round-trips through dictionary growth, width bumps and the
  * KwKwK case, small palettes, and loud refusal outside the subset. */
class GifSpec extends SparkSpec {
  import spark.implicits._

  private val grey256: Array[(Int, Int, Int)] =
    Array.tabulate(256)(i => (i, i, i))

  private def expectRgb(w: Int, h: Int, palette: Array[(Int, Int, Int)],
                        index: (Int, Int) => Int): Seq[Int] =
    for (y <- 0 until h; x <- 0 until w;
         v <- { val (r, g, b) = palette(index(x, y)); Seq(r, g, b) }) yield v

  test("round-trip: gradient through a 256-colour table") {
    val (w, h) = (13, 7)
    def ix(x: Int, y: Int): Int = (x + y * 3) % 256
    val gif = Gif.encode(w, h, grey256, ix)
    val Some((dw, dh, rgb)) = Gif.decodeRaw(gif)
    assert((dw, dh) == (w, h))
    assert(rgb.map(_ & 0xff).toSeq == expectRgb(w, h, grey256, ix))
  }

  test("round-trip: repetitive 64x64 image drives width growth past 9 bits") {
    val (w, h) = (64, 64)
    def ix(x: Int, y: Int): Int = (x * y) % 251
    val gif = Gif.encode(w, h, grey256, ix)
    val Some((dw, dh, rgb)) = Gif.decodeRaw(gif)
    assert((dw, dh) == (w, h))
    assert(rgb.map(_ & 0xff).toSeq == expectRgb(w, h, grey256, ix))
  }

  test("round-trip: constant image exercises KwKwK immediately") {
    val (w, h) = (40, 11)
    val gif = Gif.encode(w, h, grey256, (_, _) => 7)
    val Some((dw, dh, rgb)) = Gif.decodeRaw(gif)
    assert((dw, dh) == (w, h))
    assert(rgb.map(_ & 0xff).forall(_ == 7))
    assert(rgb.length == w * h * 3)
  }

  test("round-trip: non-power-of-two palette leaves dead literal codes") {
    val pal = Array((10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3), (250, 128, 9))
    val (w, h) = (9, 5)
    def ix(x: Int, y: Int): Int = (x + y) % 5
    val gif = Gif.encode(w, h, pal, ix)
    val Some((dw, dh, rgb)) = Gif.decodeRaw(gif)
    assert((dw, dh) == (w, h))
    assert(rgb.map(_ & 0xff).toSeq == expectRgb(w, h, pal, ix))
  }

  test("stats are the exact palette-resolved RGB aggregates") {
    val (w, h) = (8, 6)
    def ix(x: Int, y: Int): Int = (x * 7 + y * 11) % 256
    val s = Gif.decodePixels(9L, Gif.encode(w, h, grey256, ix))
    assert(s.ok)
    val vals = expectRgb(w, h, grey256, ix)
    assert(s.n_pixels.contains(w.toLong * h))
    assert(s.pix_sum.contains(vals.map(_.toLong).sum))
    assert(s.pix_min.contains(vals.min) && s.pix_max.contains(vals.max))
  }

  test("outside the subset refuses with null features") {
    val gif = Gif.encode(6, 4, grey256, (x, y) => (x + y) % 256)
    assert(Gif.decodePixels(1L, gif).ok)
    // truncated
    assert(!Gif.decodePixels(1L, gif.take(gif.length - 5)).ok)
    // interlace flag set (image descriptor packed byte; GIF has no CRC)
    val descPacked = 13 + 3 * 256 + 9
    val inter = gif.clone(); inter(descPacked) = (inter(descPacked) | 0x40).toByte
    assert(!Gif.decodePixels(1L, inter).ok)
    // descriptor claims more pixels than the code stream carries: the
    // wrong-pixel-count check refuses (height u16le at descriptor +7)
    val tall = gif.clone(); tall(13 + 3 * 256 + 7) = 200.toByte
    assert(!Gif.decodePixels(1L, tall).ok)
    // not a gif / null
    assert(!Gif.decodePixels(1L, "GIF99a nope".getBytes("UTF-8")).ok)
    assert(!Gif.decodePixels(1L, null).ok)
  }

  test("pixelStats decodes a mixed batch, nulling only the bad rows") {
    val rows = Seq(
      (1L, Gif.encode(5, 4, grey256, (x, y) => (x * y) % 256)),
      (2L, "nope".getBytes("UTF-8")))
    val out = Gif.pixelStats(rows.toDF("id", "blob"), "id", "blob")
      .orderBy("asset_id").collect()
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, false))
    assert(out(0).getLong(5) == 20L)
    assert(out(1).isNullAt(5))
  }
}
