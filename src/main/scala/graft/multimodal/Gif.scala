package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** REAL GIF pixel codec — the second stub-free pixel path next to
  * [[Png]]. GIF needs no external library either: the only compression
  * in the format is LZW with GIF's variable-width code stream (GIF89a
  * spec appendix F), which is ~60 lines of bit arithmetic. Implements
  * the decode subset covering ordinary single-frame GIFs: global or
  * local colour table, non-interlaced, any minimum code size; plus a
  * REAL LZW encoder (dictionary-building, width-growing, 4096-entry
  * reset) so the pair is exercised as a true codec.
  *
  * Refusals (interlaced images, missing colour table, truncated or
  * malformed streams, out-of-palette indices, trailing garbage in the
  * code stream) produce null features — never fabricated pixels — the
  * same discipline as [[Png]].
  *
  * Stats are exact integer sums over the palette-RESOLVED RGB bytes
  * (every pixel contributes its three channel bytes), engine- and
  * partitioning-identical. */
object Gif {

  /** Decoded-pixel feature row; feature columns null when refused.
    * `pix_sum` sums R+G+B bytes over all pixels (3·n_pixels values). */
  final case class GifPixelStats(asset_id: Long, n_bytes: Long, ok: Boolean,
      width: Option[Int], height: Option[Int],
      n_pixels: Option[Long], pix_sum: Option[Long],
      pix_min: Option[Int], pix_max: Option[Int])

  // ------------------------------------------------------------------
  // Encode (fixture/export side)
  // ------------------------------------------------------------------

  /** Encode a single-frame non-interlaced GIF89a with a global colour
    * table. `palette` is up to 256 (r, g, b) entries (padded to a power
    * of two); `index(x, y)` returns the palette index per pixel. The LZW
    * stream is a real dictionary-building encoder (width grows at
    * 2^width, resets at 4096) — not the uncompressed-literal trick. */
  def encode(width: Int, height: Int, palette: Array[(Int, Int, Int)],
             index: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length} not in 1..256")
    // colour table size must be a power of two >= 2
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val tableSize = 1 << bits
    val minCode = math.max(2, bits)

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
    "GIF89a".getBytes("US-ASCII").foreach(b => out.write(b & 0xff))
    u16le(width); u16le(height)
    u8(0x80 | (bits - 1)) // global colour table, size 2^bits
    u8(0); u8(0)          // background, aspect
    for (i <- 0 until tableSize) {
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      u8(r); u8(g); u8(b)
    }
    u8(0x2c) // image descriptor
    u16le(0); u16le(0); u16le(width); u16le(height)
    u8(0) // no local table, not interlaced
    u8(minCode)

    // --- LZW encode the index stream (spec appendix F) ---
    val clear = 1 << minCode
    val eoi = clear + 1
    val bitBuf = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    def putCode(code: Int, width0: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width0
      while (nbits >= 8) { bitBuf.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    // Width discipline (the classic LZW off-by-one): the ENCODER widens
    // when its next-free code reaches 2^width — the DECODER, whose
    // dictionary lags by exactly one entry at each stream position, must
    // widen at 2^width − 1 (see decode below). At 4096 the dictionary
    // FREEZES (the spec's deferred-clear-code behaviour): both sides
    // simply stop adding, which keeps them aligned with no mid-stream
    // clears.
    var codeWidth = minCode + 1
    var nextCode = eoi + 1
    val dict = new java.util.HashMap[String, Integer]()
    putCode(clear, codeWidth)
    var w = ""
    for (y <- 0 until height; x <- 0 until width) {
      val k = index(x, y)
      require(k >= 0 && k < tableSize, s"index $k outside palette at ($x,$y)")
      val wk = w + k.toChar
      if (w.isEmpty) w = wk
      else if (dict.containsKey(wk)) w = wk
      else {
        putCode(if (w.length == 1) w.charAt(0).toInt else dict.get(w), codeWidth)
        if (nextCode < 4096) {
          dict.put(wk, nextCode)
          nextCode += 1
          if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        w = k.toChar.toString
      }
    }
    if (w.nonEmpty)
      putCode(if (w.length == 1) w.charAt(0).toInt else dict.get(w), codeWidth)
    putCode(eoi, codeWidth)
    if (nbits > 0) bitBuf.write((acc & 0xff).toInt)
    // sub-blocks of <= 255 bytes
    val lz = bitBuf.toByteArray
    var off = 0
    while (off < lz.length) {
      val n = math.min(255, lz.length - off)
      u8(n); out.write(lz, off, n); off += n
    }
    u8(0)    // block terminator
    u8(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Decode the first image of a GIF to palette-resolved RGB bytes:
    * (width, height, rgb bytes row-major). None outside the subset. */
  def decodeRaw(rawBytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    pos += 4 // logical screen w/h (image descriptor dims are what we decode)
    val packed = u8(pos); pos += 3 // packed, bg, aspect
    var globalTable: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 0x07) + 1)
      if (pos + 3 * n > bytes.length) return None
      globalTable = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length && u8(pos) == 0x21) { // extension
      pos += 2 // introducer + label
      while (pos < bytes.length && u8(pos) != 0) {
        pos += 1 + u8(pos)
        if (pos > bytes.length) return None
      }
      pos += 1 // terminator
    }
    if (pos + 10 > bytes.length || u8(pos) != 0x2c) return None
    val w = u16le(pos + 5); val h = u16le(pos + 7)
    val ipacked = u8(pos + 9)
    pos += 10
    if (w <= 0 || h <= 0) return None
    if ((ipacked & 0x40) != 0) return None // interlaced: outside subset
    if (w.toLong * h > 64L * 1024 * 1024) return None
    var table = globalTable
    if ((ipacked & 0x80) != 0) {
      val n = 1 << ((ipacked & 0x07) + 1)
      if (pos + 3 * n > bytes.length) return None
      table = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    if (table == null) return None // no colour table at all
    if (pos >= bytes.length) return None
    val minCode = u8(pos); pos += 1
    if (minCode < 2 || minCode > 11) return None
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length && u8(pos) != 0) {
      val n = u8(pos)
      if (pos + 1 + n > bytes.length) return None
      data.write(bytes, pos + 1, n); pos += 1 + n
    }
    if (pos >= bytes.length) return None // missing terminator

    // --- LZW decode ---
    val lz = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    val nColours = table.length / 3
    var codeWidth = minCode + 1
    // dictionary as (prefixCode, tailIndex) pairs; singles implicit
    val prefix = new Array[Int](4096)
    val tail = new Array[Int](4096)
    var nextCode = eoi + 1
    def entryBytes(code0: Int): Array[Int] = {
      var c = code0; val buf = new scala.collection.mutable.ArrayBuffer[Int]()
      while (c >= clear + 2) { buf += tail(c); c = prefix(c) }
      buf += c
      buf.reverseIterator.toArray
    }
    val out = new Array[Int](w * h)
    var outPos = 0
    var acc = 0L; var nbits = 0; var bytePos = 0
    var prev = -1
    var finished = false
    while (!finished) {
      while (nbits < codeWidth && bytePos < lz.length) {
        acc |= (lz(bytePos) & 0xffL) << nbits; nbits += 8; bytePos += 1
      }
      if (nbits < codeWidth) return None // truncated code stream
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>>= codeWidth; nbits -= codeWidth
      if (code == clear) { nextCode = eoi + 1; codeWidth = minCode + 1; prev = -1 }
      else if (code == eoi) finished = true
      else {
        // a code may reference at most the entry being defined RIGHT NOW
        // (the KwKwK case); anything beyond is a corrupt stream, as is a
        // literal outside the actual palette (legal code space can exceed
        // the colour count when the palette isn't a power of two)
        if (code > nextCode || (code < clear && code >= nColours)) return None
        // decoder widens at 2^width − 1: its dictionary lags the
        // encoder's by one entry at each stream position (see encode)
        def addEntry(pfx: Int, t: Int): Unit =
          if (nextCode < 4096) {
            prefix(nextCode) = pfx; tail(nextCode) = t
            nextCode += 1
            if (nextCode == (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
          }
        val seq: Array[Int] =
          if (code < nextCode) {
            if (prev < 0) {
              if (code >= clear) return None // first code must be a literal
              Array(code)
            } else {
              val s = entryBytes(code)
              addEntry(prev, s.head)
              s
            }
          } else { // code == nextCode: the KwKwK case
            if (prev < 0) return None
            val ps = entryBytes(prev)
            addEntry(prev, ps.head)
            ps :+ ps.head
          }
        if (outPos + seq.length > out.length) return None // too many pixels
        var si = 0
        while (si < seq.length) {
          val ix = seq(si)
          if (ix >= nColours) return None
          out(outPos) = ix; outPos += 1; si += 1
        }
        prev = code
      }
      if (bytePos >= lz.length && nbits < codeWidth && !finished)
        return None // ran out of stream before EOI
    }
    if (outPos != out.length) return None // wrong pixel count

    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < out.length) {
      val ix = out(i) * 3
      rgb(i * 3) = table(ix); rgb(i * 3 + 1) = table(ix + 1)
      rgb(i * 3 + 2) = table(ix + 2)
      i += 1
    }
    Some((w, h, rgb))
  }

  /** Decode + exact integer stats over the palette-resolved RGB bytes. */
  def decodePixels(assetId: Long, rawBytes: Array[Byte]): GifPixelStats = {
    val n = if (rawBytes == null) 0L else rawBytes.length.toLong
    decodeRaw(rawBytes) match {
      case None =>
        GifPixelStats(assetId, n, ok = false, None, None, None, None, None, None)
      case Some((w, h, rgb)) =>
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < rgb.length) {
          val v = rgb(i) & 0xff
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        GifPixelStats(assetId, n, ok = true, Some(w), Some(h),
          Some(w.toLong * h), Some(sum), Some(mn), Some(mx))
    }
  }

  /** Batch decode — the [[Multimodal.decodeMeta]] mapPartitions shape. */
  def pixelStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      it.map { case (id, bytes) => decodePixels(id, bytes) }
    }(Encoders.product[GifPixelStats]).toDF()
  }
}
