package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** REAL baseline JPEG pixel codec — no stub, no codec library. Baseline
  * sequential DCT (ITU T.81 SOF0/SOF1) is pure integer/float arithmetic:
  * marker parse, canonical Huffman entropy decode (F.2.2.3), dequantize,
  * 8×8 inverse DCT (A.3.3), chroma upsample, YCbCr→RGB. The encoder side
  * exists for fixtures and export: real forward DCT, quantization, and
  * Huffman coding with self-built canonical tables (the DHT segment
  * carries them, so any conformant decoder reads our output).
  *
  * Supported subset (the overwhelming majority of web/corpus JPEGs):
  * 8-bit baseline or extended-sequential Huffman (SOF0/SOF1), 1 or 3
  * components in one interleaved scan, sampling factors 1–2 per axis
  * (4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn), 0xFF00 byte
  * stuffing. Everything else — progressive (SOF2), arithmetic coding
  * (SOF9+), hierarchical, 12-bit precision, 4-component CMYK, undefined
  * tables, truncated or overrun entropy data — fails LOUDLY into a row
  * with null feature columns (`ok = false`), the [[Png]]/[[Gif]] refusal
  * discipline: a corrupt asset in a 100 TB scan must neither kill the
  * stage nor emit plausible-but-wrong pixels.
  *
  * Reference behavioral analogue: the reference toolkit treats binary
  * assets as opaque rows; pixel features here extend it the way
  * [[Png]]/[[Gif]] do (SURVEY §2.3 rows 56/97/101). */
object Jpeg {

  /** Decoded-pixel feature row, the [[Png.PngPixelStats]] shape. */
  final case class JpegPixelStats(asset_id: Long, n_bytes: Long, ok: Boolean,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      n_pixels: Option[Long], pix_sum: Option[Long],
      pix_min: Option[Int], pix_max: Option[Int])

  /** Zigzag scan: natural-order index at each zigzag position. GENERATED
    * by the diagonal walk (T.81 Figure A.6), not transcribed — even
    * diagonals run up-right, odd ones down-left. */
  private[graft] val ZigZag: Array[Int] = {
    val out = new Array[Int](64); var i = 0
    for (s <- 0 until 15) {
      val r0 = math.max(0, s - 7); val r1 = math.min(7, s)
      val diag = (r0 to r1).map(r => (r, s - r))
      val walk = if (s % 2 == 0) diag.reverse else diag
      walk.foreach { case (r, c) => out(i) = r * 8 + c; i += 1 }
    }
    out
  }

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward 8×8 DCT-II (T.81 A.3.3), separable, input level-shifted. */
  private def fdct(b: Array[Double]): Array[Double] = {
    val t = new Array[Double](64); val out = new Array[Double](64)
    var y = 0
    while (y < 8) { var u = 0
      while (u < 8) { var s = 0.0; var x = 0
        while (x < 8) { s += b(y * 8 + x) * CosT(x)(u); x += 1 }
        t(y * 8 + u) = s; u += 1 }
      y += 1 }
    var v = 0
    while (v < 8) { var u = 0
      while (u < 8) { var s = 0.0; var yy = 0
        while (yy < 8) { s += t(yy * 8 + u) * CosT(yy)(v); yy += 1 }
        out(v * 8 + u) = 0.25 * Cn(u) * Cn(v) * s; u += 1 }
      v += 1 }
    out
  }

  /** Inverse 8×8 DCT (T.81 A.3.3), separable; output NOT yet shifted. */
  private def idct(c: Array[Double]): Array[Double] = {
    val t = new Array[Double](64); val out = new Array[Double](64)
    var v = 0
    while (v < 8) { var x = 0
      while (x < 8) { var s = 0.0; var u = 0
        while (u < 8) { s += Cn(u) * c(v * 8 + u) * CosT(x)(u); u += 1 }
        t(v * 8 + x) = s; x += 1 }
      v += 1 }
    var y = 0
    while (y < 8) { var x = 0
      while (x < 8) { var s = 0.0; var vv = 0
        while (vv < 8) { s += Cn(vv) * t(vv * 8 + x) * CosT(y)(vv); vv += 1 }
        out(y * 8 + x) = 0.25 * s; x += 1 }
      y += 1 }
    out
  }

  // ------------------------------------------------------------------
  // Encode (fixture/export side)
  // ------------------------------------------------------------------

  /** Bit accumulator with JPEG 0xFF00 byte stuffing; pads with 1s. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1); n += 1
        if (n == 8) { out.write(acc); if (acc == 0xff) out.write(0x00); acc = 0; n = 0 }
        i -= 1
      }
    }
    def flush(): Unit = while (n != 0) put(1, 1)
  }

  // Encoder Huffman tables: canonical single-length codes, valid by
  // construction (Kraft: 12·2^-4 = 0.75, 162·2^-9 ≈ 0.32, both ≤ 1; no
  // all-ones code at max length). Building our own tables instead of
  // transcribing the T.81 Annex K examples removes a whole class of
  // copy errors — the DHT segment ships them, so decoders don't care.
  private val DcSyms: Array[Int] = (0 to 11).toArray
  private val AcSyms: Array[Int] =
    (0x00 +: 0xf0 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s))
      .sorted.toArray
  private val DcLen = 4
  private val AcLen = 9
  private val DcCode: Map[Int, Int] = DcSyms.zipWithIndex.toMap
  private val AcCode: Map[Int, Int] = AcSyms.zipWithIndex.toMap

  /** Magnitude category: bits needed for |v| (0 for 0) — T.81 F.1.2.1. */
  private def cat(v: Int): Int = { var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }; n }

  /** Encode an 8-bit baseline JPEG. `channels` 1 (luma only) or 3 (RGB →
    * YCbCr); `pixel(x, y, c)` returns the channel byte; `quant` is the
    * 64-entry natural-order quantization table used for every component
    * (default all-1s: on GREY or ACHROMATIC inputs constant per MCU the
    * round trip is then EXACT — integer Y, Cb=Cr=128, DC-only blocks: the
    * codec-free-oracle fixture property; chromatic constants round
    * through the integer component planes, error < 2, see JpegSpec);
    * `subsample420` emits 4:2:0 chroma (Y factors 2×2, box-averaged
    * chroma); `restartEvery` > 0 emits DRI + RSTn markers every that
    * many MCUs. Deterministic for fixed inputs. */
  def encode(width: Int, height: Int, channels: Int,
             pixel: (Int, Int, Int) => Int,
             quant: Array[Int] = Array.fill(64)(1),
             subsample420: Boolean = false,
             restartEvery: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(channels == 1 || channels == 3, s"channels=$channels not in {1,3}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 entries in 1..255")
    require(!subsample420 || channels == 3, "4:2:0 needs 3 channels")

    // Component planes as doubles (chroma averaging stays exact for
    // MCU-constant fixtures because no intermediate rounding happens).
    val yP = new Array[Double](width * height)
    var cbP: Array[Double] = null; var crP: Array[Double] = null
    if (channels == 1) {
      var i = 0
      var y = 0
      while (y < height) { var x = 0
        while (x < width) { yP(i) = pixel(x, y, 0).toDouble; i += 1; x += 1 }
        y += 1 }
    } else {
      cbP = new Array[Double](width * height); crP = new Array[Double](width * height)
      var i = 0; var y = 0
      while (y < height) { var x = 0
        while (x < width) {
          val r = pixel(x, y, 0); val g = pixel(x, y, 1); val b = pixel(x, y, 2)
          yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
          cbP(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
          crP(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
          i += 1; x += 1 }
        y += 1 }
    }
    // (plane, width, height, hFactor, vFactor) per component
    case class Plane(p: Array[Double], w: Int, h: Int, hf: Int, vf: Int)
    val planes: Seq[Plane] =
      if (channels == 1) Seq(Plane(yP, width, height, 1, 1))
      else if (!subsample420)
        Seq(Plane(yP, width, height, 1, 1), Plane(cbP, width, height, 1, 1),
          Plane(crP, width, height, 1, 1))
      else {
        val cw = (width + 1) / 2; val ch = (height + 1) / 2
        def box(src: Array[Double]): Array[Double] = {
          val out = new Array[Double](cw * ch)
          var yy = 0
          while (yy < ch) { var xx = 0
            while (xx < cw) {
              val x0 = xx * 2; val y0 = yy * 2
              val x1 = math.min(x0 + 1, width - 1); val y1 = math.min(y0 + 1, height - 1)
              out(yy * cw + xx) = (src(y0 * width + x0) + src(y0 * width + x1) +
                src(y1 * width + x0) + src(y1 * width + x1)) / 4.0
              xx += 1 }
            yy += 1 }
          out
        }
        Seq(Plane(yP, width, height, 2, 2), Plane(box(cbP), cw, ch, 1, 1),
          Plane(box(crP), cw, ch, 1, 1))
      }
    val hMax = planes.map(_.hf).max; val vMax = planes.map(_.vf).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT: Pq=0, Tq=0
    for (k <- 0 until 64) out.write(quant(ZigZag(k)))
    marker(0xc0); u16(2 + 6 + 3 * channels) // SOF0
    out.write(8); u16(height); u16(width); out.write(channels)
    planes.zipWithIndex.foreach { case (p, i) =>
      out.write(i + 1); out.write((p.hf << 4) | p.vf); out.write(0)
    }
    def dht(cls: Int, len: Int, syms: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + syms.length)
      out.write(cls << 4) // Tc, Th=0
      for (l <- 1 to 16) out.write(if (l == len) syms.length else 0)
      syms.foreach(out.write)
    }
    dht(0, DcLen, DcSyms); dht(1, AcLen, AcSyms)
    if (restartEvery > 0) { marker(0xdd); u16(4); u16(restartEvery) } // DRI
    marker(0xda); u16(2 + 1 + 2 * channels + 3) // SOS
    out.write(channels)
    for (i <- 0 until channels) { out.write(i + 1); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    val pred = new Array[Int](channels)
    def encodeBlock(pl: Plane, bx0: Int, by0: Int, ci: Int): Unit = {
      val b = new Array[Double](64)
      var yy = 0
      while (yy < 8) { var xx = 0
        while (xx < 8) {
          val sx = math.min(bx0 + xx, pl.w - 1); val sy = math.min(by0 + yy, pl.h - 1)
          b(yy * 8 + xx) = pl.p(sy * pl.w + sx) - 128.0
          xx += 1 }
        yy += 1 }
      val coef = fdct(b)
      val q = new Array[Int](64)
      var i = 0
      while (i < 64) { q(i) = math.round(coef(i) / quant(i)).toInt; i += 1 }
      val dc = q(0); val diff = dc - pred(ci); pred(ci) = dc
      val s = cat(diff)
      bw.put(DcCode(s), DcLen)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var k = 1; var run = 0
      while (k < 64) {
        val v = q(ZigZag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(AcCode(0xf0), AcLen); run -= 16 }
          val sz = cat(v)
          bw.put(AcCode((run << 4) | sz), AcLen)
          bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(AcCode(0x00), AcLen) // EOB
    }
    var mcu = 0; var rstN = 0
    var my = 0
    while (my < mcusY) { var mx = 0
      while (mx < mcusX) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.flush(); marker(0xd0 + rstN); rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < planes.length) {
          val pl = planes(ci)
          var by = 0
          while (by < pl.vf) { var bx = 0
            while (bx < pl.hf) {
              encodeBlock(pl, (mx * pl.hf + bx) * 8, (my * pl.vf + by) * 8, ci)
              bx += 1 }
            by += 1 }
          ci += 1 }
        mcu += 1; mx += 1 }
      my += 1 }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode (the real thing)
  // ------------------------------------------------------------------

  /** MSB-first entropy-data reader with 0xFF00 de-stuffing. A marker hit
    * mid-read parks its code in `sawMarker` and returns -1 bits. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    var sawMarker = 0
    def bit(): Int = {
      if (n == 0) {
        if (sawMarker != 0 || pos >= bytes.length) return -1
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) return -1
          val m = bytes(pos) & 0xff; pos += 1
          if (m != 0x00) { sawMarker = m; return -1 }
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    /** Byte-align and consume the expected RSTn marker (T.81 E.2.4). */
    def restart(): Boolean = {
      n = 0
      if (sawMarker >= 0xd0 && sawMarker <= 0xd7) { sawMarker = 0; return true }
      if (sawMarker != 0) return false
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { val b = bit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1 }
      v
    }
  }

  /** Canonical Huffman decode tables per T.81 F.2.2.3 / C.2. */
  private final class HuffDec(bits: Array[Int], vals: Array[Byte]) {
    private val mincode = new Array[Int](17)
    private val maxcode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        mincode(l) = code; valptr(l) = k
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1; l += 1
      }
    }
    /** Next symbol, or -1 on exhausted/corrupt input. */
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.bit(); if (code < 0) return -1
      while (maxcode(l) < 0 || code > maxcode(l)) {
        l += 1
        if (l > 16) return -1
        val b = br.bit(); if (b < 0) return -1
        code = (code << 1) | b
      }
      vals(valptr(l) + code - mincode(l)) & 0xff
    }
  }

  /** T.81 F.2.2.1 EXTEND: map `s`-bit magnitude code to signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, hf: Int, vf: Int, tq: Int,
                                var td: Int = 0, var ta: Int = 0)

  /** Decode to (width, height, channels, interleaved samples): grey bytes
    * for 1 component, RGB for 3. None = refusal (outside the supported
    * subset, or corrupt). */
  def decodeRaw(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    val qts = new Array[Array[Int]](4)
    val hdc = new Array[HuffDec](4); val hac = new Array[HuffDec](4)
    var restartInterval = 0
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var scanStart = -1
    var pos = 2
    while (scanStart < 0) {
      // fill bytes: any number of 0xFF may precede a marker (T.81 B.1.1.2)
      if (pos >= bytes.length) return None
      if (u8(pos) != 0xff) return None
      while (pos < bytes.length && u8(pos) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val m = u8(pos); pos += 1
      m match {
        case 0x01 => () // TEM, standalone
        case 0xd8 => () // duplicate SOI: tolerate
        case x if x >= 0xd0 && x <= 0xd7 => return None // RST outside scan
        case 0xd9 => return None // EOI before any scan
        case _ =>
          if (pos + 2 > bytes.length) return None
          val seglen = (u8(pos) << 8) | u8(pos + 1)
          if (seglen < 2 || pos + seglen > bytes.length) return None
          val d = pos + 2; val dlen = seglen - 2
          m match {
            case 0xdb => // DQT: one or more tables
              var p = d
              while (p < d + dlen) {
                val pq = u8(p) >> 4; val tq = u8(p) & 15
                if (tq > 3) return None
                val entryBytes = if (pq == 0) 1 else if (pq == 1) 2 else return None
                if (p + 1 + 64 * entryBytes > d + dlen) return None
                val t = new Array[Int](64)
                for (k <- 0 until 64) {
                  val v = if (pq == 0) u8(p + 1 + k)
                          else (u8(p + 1 + 2 * k) << 8) | u8(p + 1 + 2 * k + 1)
                  if (v == 0) return None
                  t(ZigZag(k)) = v
                }
                qts(tq) = t
                p += 1 + 64 * entryBytes
              }
            case 0xc4 => // DHT: one or more tables
              var p = d
              while (p < d + dlen) {
                if (p + 17 > d + dlen) return None
                val tc = u8(p) >> 4; val th = u8(p) & 15
                if (tc > 1 || th > 3) return None
                val bits = Array.tabulate(16)(i => u8(p + 1 + i))
                val total = bits.sum
                if (total == 0 || total > 256 || p + 17 + total > d + dlen) return None
                val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
                val dec = new HuffDec(bits, vals)
                if (tc == 0) hdc(th) = dec else hac(th) = dec
                p += 17 + total
              }
            case 0xdd =>
              if (dlen != 4 - 2) return None
              restartInterval = (u8(d) << 8) | u8(d + 1)
            case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
              if (comps != null) return None
              if (dlen < 6) return None
              if (u8(d) != 8) return None // 12-bit precision outside subset
              h = (u8(d + 1) << 8) | u8(d + 2); w = (u8(d + 3) << 8) | u8(d + 4)
              val nc = u8(d + 5)
              if (w <= 0 || h <= 0) return None
              if (w.toLong * h > 64L * 1024 * 1024) return None // crafted-SOF bound
              if (nc != 1 && nc != 3) return None
              if (dlen < 6 + 3 * nc) return None
              comps = Array.tabulate(nc) { i =>
                val b = d + 6 + 3 * i
                val c = Comp(u8(b), u8(b + 1) >> 4, u8(b + 1) & 15, u8(b + 2))
                if (c.hf < 1 || c.hf > 2 || c.vf < 1 || c.vf > 2 || c.tq > 3)
                  return None
                c
              }
            // progressive, arithmetic, lossless, hierarchical: refuse
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf => return None
            case 0xda => // SOS
              if (comps == null) return None
              val ns = u8(d)
              if (ns != comps.length || dlen != 1 + 2 * ns + 3) return None
              for (i <- 0 until ns) {
                val cs = u8(d + 1 + 2 * i); val tt = u8(d + 2 + 2 * i)
                val c = comps.find(_.id == cs).getOrElse(return None)
                c.td = tt >> 4; c.ta = tt & 15
              }
              // sequential scans cover the full spectrum in one pass
              if (u8(d + 1 + 2 * ns) != 0 || u8(d + 2 + 2 * ns) != 63) return None
              scanStart = pos + seglen
            case _ => () // APPn / COM: skipped
          }
          pos += seglen
      }
    }
    // every referenced table must exist
    comps.foreach { c =>
      if (qts(c.tq) == null || hdc(c.td) == null || hac(c.ta) == null) return None
    }
    val hMax = comps.map(_.hf).max; val vMax = comps.map(_.vf).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * c.hf * 8)
    val planeH = comps.map(c => mcusY * c.vf * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Double](64)

    def decodeBlock(ci: Int, bx0: Int, by0: Int): Boolean = {
      val c = comps(ci); val qt = qts(c.tq)
      val s = hdc(c.td).decode(br)
      if (s < 0 || s > 11) return false
      val diffBits = if (s == 0) 0 else br.receive(s)
      if (diffBits == Int.MinValue) return false
      pred(ci) += extend(diffBits, s)
      java.util.Arrays.fill(coef, 0.0)
      coef(0) = pred(ci).toDouble * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = hac(c.ta).decode(br)
        if (rs < 0) return false
        val r = rs >> 4; val sz = rs & 15
        if (sz == 0) {
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) k += 16
          else return false
        } else {
          k += r
          if (k > 63) return false
          val vb = br.receive(sz)
          if (vb == Int.MinValue) return false
          val nat = ZigZag(k)
          coef(nat) = extend(vb, sz).toDouble * qt(nat)
          k += 1
        }
      }
      val px = idct(coef)
      val pw = planeW(ci)
      var yy = 0
      while (yy < 8) { var xx = 0
        while (xx < 8) {
          val v = math.round(px(yy * 8 + xx) + 128.0).toInt
          planes(ci)((by0 + yy) * pw + bx0 + xx) =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          xx += 1 }
        yy += 1 }
      true
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) { var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return None
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.vf) { var bx = 0
            while (bx < c.hf) {
              if (!decodeBlock(ci, (mx * c.hf + bx) * 8, (my * c.vf + by) * 8))
                return None
              bx += 1 }
            by += 1 }
          ci += 1 }
        mcu += 1; mx += 1 }
      my += 1 }

    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w); y += 1 }
      Some((w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      def clamp(v: Double): Byte = {
        val r = math.round(v).toInt
        (if (r < 0) 0 else if (r > 255) 255 else r).toByte
      }
      var y = 0
      while (y < h) { var x = 0
        while (x < w) {
          // nearest-sample chroma upsampling (replication)
          def samp(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.hf / hMax; val sy = y * c.vf / vMax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yv = samp(0).toDouble
          val cb = samp(1).toDouble - 128.0; val cr = samp(2).toDouble - 128.0
          val o = (y * w + x) * 3
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1 }
        y += 1 }
      Some((w, h, 3, out))
    }
  }

  /** Decode + exact integer pixel stats; refusals yield null features. */
  def decodePixels(assetId: Long, rawBytes: Array[Byte]): JpegPixelStats = {
    val n = if (rawBytes == null) 0L else rawBytes.length.toLong
    decodeRaw(rawBytes) match {
      case None =>
        JpegPixelStats(assetId, n, ok = false, None, None, None, None, None, None, None)
      case Some((w, h, ch, raw)) =>
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < raw.length) {
          val v = raw(i) & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        JpegPixelStats(assetId, n, ok = true, Some(w), Some(h), Some(ch),
          Some(w.toLong * h), Some(sum), Some(mn), Some(mx))
    }
  }

  /** Batch pixel decode — the [[Multimodal.decodeMeta]] mapPartitions
    * codec shape (amortized: the static cos/zigzag tables are shared;
    * per-asset state is the decoder locals). No shuffle. */
  def pixelStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      it.map { case (id, bytes) => decodePixels(id, bytes) }
    }(Encoders.product[JpegPixelStats]).toDF()
  }
}
