package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** REAL PNG pixel codec — no stub. The JDK already contains everything a
  * baseline PNG needs: `java.util.zip.Inflater`/`Deflater` ARE zlib, and
  * `CRC32` is the chunk checksum, so unlike the JPEG/video pixel paths
  * (which genuinely need an external codec and stay stubbed), PNG
  * decode/encode is pure byte arithmetic + the JDK. Implements the W3C
  * PNG spec (third edition) subset that covers the overwhelming majority
  * of training-corpus screenshots/diagrams: 8-bit greyscale (colour type
  * 0) and truecolour (type 2), non-interlaced, all five scanline filters
  * (None/Sub/Up/Average/Paeth, §9.2) with the Paeth predictor of §9.4.
  *
  * Everything else — 16-bit depth, palette, alpha, Adam7 interlace, bad
  * CRC, truncated or over-long IDAT — fails LOUDLY into a row with null
  * feature columns (`ok = false`), the [[Multimodal]] discipline: a
  * corrupt asset in a 100 TB scan must neither kill the stage nor emit
  * plausible-but-wrong pixels.
  *
  * Stats use exact integer arithmetic (sum/min/max over channel bytes) so
  * results are bit-identical across engines and partitionings — the same
  * reason [[Multimodal.pcmFeatures]] keeps its power sums in Longs. */
object Png {

  /** Decoded-pixel feature row. Feature columns are null (`ok = false`)
    * for anything [[decodePixels]] refuses. `pix_sum` is the exact sum of
    * every channel byte — mean = pix_sum / (n_pixels · channels). */
  final case class PngPixelStats(asset_id: Long, n_bytes: Long, ok: Boolean,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      n_pixels: Option[Long], pix_sum: Option[Long],
      pix_min: Option[Int], pix_max: Option[Int])

  private val Sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

  /** §9.4 Paeth predictor: nearest of left/up/up-left to a+b−c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------------
  // Encode (fixture/export side)
  // ------------------------------------------------------------------

  /** Encode an 8-bit PNG. `channels` 1 (greyscale) or 3 (RGB);
    * `pixel(x, y, c)` returns the channel byte; `filterFor(y)` picks the
    * scanline filter (0-4) — exercised per-row so decode proves every
    * inverse, not just None. Deterministic for fixed inputs (single
    * deflate stream, fixed strategy). */
  def encode(width: Int, height: Int, channels: Int,
             pixel: (Int, Int, Int) => Int,
             filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(channels == 1 || channels == 3, s"channels=$channels not in {1,3}")
    val bpp = channels
    val stride = width * channels
    val raw = Array.ofDim[Byte](height * stride) // unfiltered image bytes
    for (y <- 0 until height; x <- 0 until width; c <- 0 until channels)
      raw(y * stride + x * channels + c) = (pixel(x, y, c) & 0xff).toByte
    // filtered stream: each scanline prefixed by its filter type (§9.2)
    val filt = Array.ofDim[Byte](height * (1 + stride))
    for (y <- 0 until height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f not in 0..4")
      filt(y * (1 + stride)) = f.toByte
      for (i <- 0 until stride) {
        val x = raw(y * stride + i) & 0xff
        val a = if (i >= bpp) raw(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val cc = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xff else 0
        val out = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, cc)
        }
        filt(y * (1 + stride) + 1 + i) = (out & 0xff).toByte
      }
    }
    val deflater = new Deflater()
    deflater.setInput(filt); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    Sig.foreach(out.write)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(data.length.toLong))
      val tb = ctype.getBytes("US-ASCII")
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be32(crc.getValue))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put((if (channels == 1) 0 else 2).toByte) // colour type
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Full pixel decode to the raw (unfiltered) image bytes:
    * (width, height, channels, bytes row-major x-major channel-minor).
    * None for anything outside the supported subset or structurally
    * invalid (bad signature/CRC/zlib, wrong inflated size, truncation).
    * Pass a shared `inflater` to amortize native-buffer setup across a
    * partition (the [[pixelStats]] batch path); it is reset per call. */
  def decodeRaw(rawBytes: Array[Byte],
                inflater: Inflater = new Inflater()): Option[(Int, Int, Int, Array[Byte])] = {
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    def u8(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 8 || Sig.indices.exists(i => u8(i) != Sig(i))) return None

    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    while (!seenIend) {
      if (pos + 8 > bytes.length) return None // truncated chunk header
      val len = ((u8(pos).toLong << 24) | (u8(pos + 1) << 16) |
        (u8(pos + 2) << 8) | u8(pos + 3))
      if (len > Int.MaxValue - 8 || pos + 8 + len + 4 > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      val stored = ((u8(pos + 8 + len.toInt).toLong << 24) |
        (u8(pos + 9 + len.toInt) << 16) | (u8(pos + 10 + len.toInt) << 8) |
        u8(pos + 11 + len.toInt))
      if (crc.getValue != stored) return None // corrupt chunk
      ctype match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          width = ((u8(pos + 8) << 24) | (u8(pos + 9) << 16) |
            (u8(pos + 10) << 8) | u8(pos + 11))
          height = ((u8(pos + 12) << 24) | (u8(pos + 13) << 16) |
            (u8(pos + 14) << 8) | u8(pos + 15))
          val bitDepth = u8(pos + 16); val colour = u8(pos + 17)
          val interlace = u8(pos + 20)
          if (width <= 0 || height <= 0) return None
          if (bitDepth != 8 || interlace != 0) return None // outside subset
          channels = colour match {
            case 0 => 1
            case 2 => 3
            case _ => return None // palette/alpha outside subset
          }
          // bound the decode buffer: refuse images over 64 MP (a crafted
          // IHDR must not allocate unbounded memory in an executor)
          if (width.toLong * height > 64L * 1024 * 1024) return None
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr) return None

    val stride = width * channels
    val expect = height * (1 + stride)
    val filt = new Array[Byte](expect)
    inflater.reset()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(filt, got, expect - got)
        // All input was staged up front, so ANY zero-progress iteration is a
        // refusal: needsInput() = truncated stream; !needsInput() = a stream
        // this decoder cannot advance (e.g. a zlib header with the FDICT bit
        // set leaves inflate() returning 0 with needsDictionary() true — an
        // unguarded loop would hang the executor task on a crafted asset).
        if (n == 0) return None
        got += n
      }
      // stream must end exactly at the expected byte count
      if (got != expect) return None
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) != 0)
        return None // over-long stream: more pixels than IHDR declared
    } catch { case _: java.util.zip.DataFormatException => return None }

    val bpp = channels
    val raw = new Array[Byte](height * stride)
    for (y <- 0 until height) {
      val f = filt(y * (1 + stride)) & 0xff
      if (f > 4) return None
      for (i <- 0 until stride) {
        val v = filt(y * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= bpp) raw(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + (a + b) / 2
          case 4 => v + paeth(a, b, c)
        }
        raw(y * stride + i) = (rec & 0xff).toByte
      }
    }
    Some((width, height, channels, raw))
  }

  /** Decode + exact integer pixel stats; the refusal path yields null
    * features, never fabricated ones. */
  def decodePixels(assetId: Long, rawBytes: Array[Byte],
                   inflater: Inflater = new Inflater()): PngPixelStats = {
    val n = if (rawBytes == null) 0L else rawBytes.length.toLong
    decodeRaw(rawBytes, inflater) match {
      case None =>
        PngPixelStats(assetId, n, ok = false, None, None, None, None, None, None, None)
      case Some((w, h, ch, raw)) =>
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < raw.length) {
          val v = raw(i) & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        PngPixelStats(assetId, n, ok = true, Some(w), Some(h), Some(ch),
          Some(w.toLong * h), Some(sum), Some(mn), Some(mx))
    }
  }

  /** Batch pixel decode — the [[Multimodal.decodeMeta]] mapPartitions
    * codec shape, with the per-partition amortization REAL here: one
    * Inflater (native zlib state) serves the whole partition, reset per
    * asset instead of re-allocated. No shuffle. */
  def pixelStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      val inflater = new Inflater()
      it.map { case (id, bytes) => decodePixels(id, bytes, inflater) }
    }(Encoders.product[PngPixelStats]).toDF()
  }

  // ------------------------------------------------------------------
  // Resize (real pixels, not a plan)
  // ------------------------------------------------------------------

  /** Nearest-neighbour resize THROUGH the codec: decode, sample with the
    * integer mapping `src = dst·srcDim / dstDim` (floor division — the
    * standard NN grid), re-encode (filter 0). None for undecodable input
    * or degenerate targets. Upscaling is allowed (callers wanting the
    * fit-box rule use [[resizeAssets]], which never upscales — matching
    * [[Multimodal.resizePlan]]'s contract). */
  def resize(rawBytes: Array[Byte], targetW: Int, targetH: Int,
             inflater: Inflater = new Inflater()): Option[Array[Byte]] = {
    if (targetW <= 0 || targetH <= 0) return None
    decodeRaw(rawBytes, inflater).map { case (w, h, ch, raw) =>
      encode(targetW, targetH, ch, (x, y, c) => {
        val sx = (x.toLong * w / targetW).toInt
        val sy = (y.toLong * h / targetH).toInt
        raw(sy * w * ch + sx * ch + c) & 0xff
      })
    }
  }

  /** One resized asset row: `resized` is null when the source refused to
    * decode — the null-features discipline, binary edition. */
  final case class PngResizedAsset(asset_id: Long, orig_width: Option[Int],
      orig_height: Option[Int], resized: Option[Array[Byte]])

  /** Batch fit-box resize — the REAL pixel work behind
    * [[Multimodal.resizePlan]]'s dimension arithmetic, same scale rule
    * (`scale = min(1, maxDim / max(w, h))`, floor to target dims, never
    * upscale, floor clamped to ≥ 1). Same one-Inflater-per-partition
    * shape as [[pixelStats]]; compose the two to decode-resize-audit in
    * a single lazy plan. */
  def resizeAssets(df: DataFrame, idCol: String, binCol: String,
                   maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"maxDim=$maxDim must be >= 1")
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      val inflater = new Inflater()
      it.map { case (id, bytes) =>
        decodeRaw(bytes, inflater) match {
          case None => PngResizedAsset(id, None, None, None)
          case Some((w, h, ch, raw)) =>
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val tw = math.max(1, math.floor(w * scale).toInt)
            val th = math.max(1, math.floor(h * scale).toInt)
            val out = encode(tw, th, ch, (x, y, c) => {
              val sx = (x.toLong * w / tw).toInt
              val sy = (y.toLong * h / th).toInt
              raw(sy * w * ch + sx * ch + c) & 0xff
            })
            PngResizedAsset(id, Some(w), Some(h), Some(out))
        }
      }
    }(Encoders.product[PngResizedAsset]).toDF()
  }
}
