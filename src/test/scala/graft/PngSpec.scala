package graft

import graft.multimodal.Png
import org.apache.spark.sql.functions._

/** Pins the real PNG pixel codec ([[graft.multimodal.Png]]): lossless
  * round-trips across every scanline filter and both colour types, exact
  * stats, and loud refusal of everything outside the supported subset. */
class PngSpec extends SparkSpec {
  import spark.implicits._

  private def grad(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 77) % 256

  test("grey round-trip is lossless under every scanline filter") {
    for (f <- 0 to 4) {
      val (w, h) = (7, 9)
      val png = Png.encode(w, h, 1, grad, _ => f)
      val Some((dw, dh, dc, raw)) = Png.decodeRaw(png)
      assert((dw, dh, dc) == (w, h, 1), s"filter $f dims")
      val expect = for (y <- 0 until h; x <- 0 until w) yield grad(x, y, 0)
      assert(raw.map(_ & 0xff).toSeq == expect, s"filter $f pixels")
    }
  }

  test("RGB round-trip is lossless with per-row mixed filters") {
    val (w, h) = (11, 6)
    val png = Png.encode(w, h, 3, grad, y => y % 5)
    val Some((dw, dh, dc, raw)) = Png.decodeRaw(png)
    assert((dw, dh, dc) == (w, h, 3))
    val expect =
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield grad(x, y, c)
    assert(raw.map(_ & 0xff).toSeq == expect)
  }

  test("decodePixels stats are the exact integer aggregates of the pixels") {
    val (w, h) = (13, 5)
    val png = Png.encode(w, h, 1, grad, y => (y + 2) % 5)
    val s = Png.decodePixels(42L, png)
    assert(s.ok)
    val vals = for (y <- 0 until h; x <- 0 until w) yield grad(x, y, 0)
    assert(s.width.contains(w) && s.height.contains(h) && s.channels.contains(1))
    assert(s.n_pixels.contains(w.toLong * h))
    assert(s.pix_sum.contains(vals.map(_.toLong).sum))
    assert(s.pix_min.contains(vals.min) && s.pix_max.contains(vals.max))
  }

  /** Patch one byte inside the IHDR data and RE-SIGN the chunk CRC, so
    * the mutation tests the semantic check, not the checksum. */
  private def patchIhdr(png: Array[Byte], offsetInData: Int, value: Byte): Array[Byte] = {
    val out = png.clone()
    out(16 + offsetInData) = value // IHDR data starts at byte 16
    val crc = new java.util.zip.CRC32()
    crc.update(out, 12, 4 + 13) // type + data
    val v = crc.getValue
    out(29) = ((v >>> 24) & 0xff).toByte; out(30) = ((v >>> 16) & 0xff).toByte
    out(31) = ((v >>> 8) & 0xff).toByte; out(32) = (v & 0xff).toByte
    out
  }

  test("everything outside the subset refuses with null features") {
    val png = Png.encode(5, 4, 1, grad)
    assert(Png.decodePixels(1L, png).ok)
    // corrupt CRC (flip an IDAT byte without re-signing)
    val bad = png.clone(); bad(png.length - 20) = (bad(png.length - 20) ^ 0x5a).toByte
    assert(!Png.decodePixels(1L, bad).ok)
    // truncated file
    assert(!Png.decodePixels(1L, png.take(png.length - 7)).ok)
    // 16-bit depth (valid CRC) refuses rather than mis-decoding
    assert(!Png.decodePixels(1L, patchIhdr(png, 8, 16.toByte)).ok)
    // palette colour type (valid CRC) refuses
    assert(!Png.decodePixels(1L, patchIhdr(png, 9, 3.toByte)).ok)
    // Adam7 interlace flag refuses
    assert(!Png.decodePixels(1L, patchIhdr(png, 12, 1.toByte)).ok)
    // non-PNG bytes and null refuse
    assert(!Png.decodePixels(1L, "not a png at all".getBytes("UTF-8")).ok)
    assert(!Png.decodePixels(1L, null).ok)
    val s = Png.decodePixels(1L, null)
    assert(s.width.isEmpty && s.pix_sum.isEmpty)
  }

  test("FDICT zlib header inside a CRC-valid IDAT refuses instead of hanging") {
    // Inflater.inflate() returns 0 forever on a preset-dictionary stream
    // (needsDictionary() true, needsInput() false) — an unguarded loop spins.
    val good = Png.encode(5, 4, 1, grad)
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      bos.write(be32(data.length.toLong))
      bos.write(ctype.getBytes("US-ASCII")); bos.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      bos.write(be32(crc.getValue))
      bos.toByteArray
    }
    // 0x78 0x20: CM=8, FDICT=1, and 0x7820 % 31 == 0 so FCHECK passes;
    // then a 4-byte DICTID and junk deflate bytes.
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x5b, 0x00)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(good, 0, 8) // PNG signature
    bos.write(chunk("IHDR", good.slice(16, 16 + 13)))
    bos.write(chunk("IDAT", fdictIdat))
    bos.write(chunk("IEND", Array.emptyByteArray))
    assert(!Png.decodePixels(9L, bos.toByteArray).ok) // refuses, promptly
  }

  test("nearest-neighbour resize samples the exact NN grid") {
    val (w, h) = (10, 6)
    val png = Png.encode(w, h, 1, grad, y => y % 5)
    val Some(resized) = Png.resize(png, 5, 3)
    val Some((dw, dh, dc, raw)) = Png.decodeRaw(resized)
    assert((dw, dh, dc) == (5, 3, 1))
    val expect = for (y <- 0 until 3; x <- 0 until 5)
      yield grad((x * w / 5), (y * h / 3), 0)
    assert(raw.map(_ & 0xff).toSeq == expect)
  }

  test("resizeAssets applies the fit-box rule and never upscales") {
    val rows = Seq(
      (1L, Png.encode(20, 10, 1, grad, _ => 2)), // shrinks to 8x4
      (2L, Png.encode(4, 3, 3, grad, _ => 3)),   // already fits: untouched dims
      (3L, "junk".getBytes("UTF-8")))
    val out = Png.resizeAssets(rows.toDF("id", "blob"), "id", "blob", maxDim = 8)
      .orderBy("asset_id").collect()
    val r1 = Png.decodeRaw(out(0).getAs[Array[Byte]]("resized")).get
    assert((r1._1, r1._2) == (8, 4))
    // scale capped at 1: same dims AND pixel-identical (NN identity map)
    val r2 = Png.decodeRaw(out(1).getAs[Array[Byte]]("resized")).get
    assert((r2._1, r2._2, r2._3) == (4, 3, 3))
    val orig = for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) yield grad(x, y, c)
    assert(r2._4.map(_ & 0xff).toSeq == orig)
    // undecodable source: null everything, row still flows
    assert(out(2).isNullAt(1) && out(2).isNullAt(3))
  }

  test("pixelStats decodes a mixed batch, nulling only the bad rows") {
    val rows = Seq(
      (1L, Png.encode(4, 3, 1, grad, _ => 4)),
      (2L, Png.encode(2, 2, 3, grad, _ => 1)),
      (3L, "garbage".getBytes("UTF-8")))
    val out = Png.pixelStats(rows.toDF("id", "blob"), "id", "blob")
      .orderBy("asset_id").collect()
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, true, false))
    assert(out(0).getLong(6) == 12L) // 4x3 grey pixels
    assert(out(1).getInt(5) == 3)    // RGB channels
    assert(out(2).isNullAt(6))       // bad row: null features
  }
}
