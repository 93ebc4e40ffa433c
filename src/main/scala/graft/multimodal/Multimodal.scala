package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Extracted (fake-)image metadata row. */
final case class AssetMeta(asset_id: Long, n_bytes: Long, width: Int,
                           height: Int, format: String)

/** Multimodal column plumbing (SURVEY §2.3 row 56): images/audio/video as
  * opaque `binary` columns with typed metadata, processed in per-partition
  * batches.
  *
  * The Spark-side shape is real — binary schema, `mapPartitions` batch
  * iterator with a typed Encoder, metadata struct joins — and [[decode]] /
  * [[decodeAudio]] parse REAL container headers (PNG IHDR, JPEG SOFn, GIF
  * logical screen, WAV/RIFF fmt — pure byte arithmetic, no codec library).
  * Bytes that match no known container fall back to the clearly-marked
  * deterministic [[decodeStub]]. PIXEL/SAMPLE codecs are REAL for PNG
  * ([[Png]]), GIF ([[Gif]]), baseline JPEG ([[Jpeg]]) and PCM WAV
  * ([[pcmFeatures]]); only video FRAME decode remains out of scope (an
  * H.264 codec is not byte arithmetic — swap in a JNI/javacv call and
  * nothing else changes).
  */
object Multimodal {

  /** STUB decode — deterministic fake standing in for a real image codec.
    * Used by [[decode]] for bytes that are neither PNG nor JPEG (a real
    * pipeline would route those to the right codec; this container has
    * none, so the fake keeps non-image bytes flowing, loudly, never null).
    */
  def decodeStub(assetId: Long, bytes: Array[Byte]): AssetMeta = {
    val n = bytes.length.toLong
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    AssetMeta(
      asset_id = assetId,
      n_bytes = n,
      width  = (64 + n % 1856).toInt,
      height = (64 + (n * 7 + first) % 1016).toInt,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** REAL container-header metadata for the two formats whose headers are
    * pure byte arithmetic — no codec library needed:
    *  - PNG: 8-byte signature, then the IHDR chunk (always first, W3C PNG
    *    §11.2.2): width/height are big-endian u32 at offsets 16/20.
    *  - JPEG: SOI then a marker scan (ITU T.81 §B): each segment is
    *    0xFF<marker><u16 len includes itself>; the first SOFn frame header
    *    (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC) carries
    *    [len][precision][height u16][width u16].
    * Anything else — including truncated/malformed image bytes — falls
    * back to [[decodeStub]] rather than throwing, so a corrupt asset in a
    * 100 TB scan degrades to fake metadata instead of killing the stage.
    */
  def decode(assetId: Long, rawBytes: Array[Byte]): AssetMeta = {
    // null blob degrades to the stub like any other undecodable asset
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)

    def png: Option[AssetMeta] =
      if (bytes.length >= 24 && PngSig.indices.forall(i => u8(i) == PngSig(i)) &&
          u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
        val (w, h) = (u32(16), u32(20))
        // spec caps dims at 2^31-1 and forbids 0 — a crafted IHDR outside
        // that range must degrade to the stub, not emit negative metadata
        if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
          Some(AssetMeta(assetId, bytes.length.toLong, w.toInt, h.toInt, "png"))
        else None
      } else None

    def jpeg: Option[AssetMeta] = {
      if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
      var i = 2
      while (i + 3 < bytes.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone marker
        else {
          val len = u16(i + 2)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            // height 0 is legal-but-deferred (DNL marker) — treat like a
            // malformed frame and stub rather than emit a 0-dim asset
            return if (i + 8 < bytes.length && u16(i + 5) > 0 && u16(i + 7) > 0)
              Some(AssetMeta(assetId, bytes.length.toLong,
                u16(i + 7), u16(i + 5), "jpeg"))
            else None // truncated or dimension-less SOF
          }
          if (len < 2) return None // malformed length
          i += 2 + len
        }
      }
      None
    }

    // GIF (GIF87a/GIF89a): logical-screen width/height are LITTLE-endian
    // u16 at offsets 6/8 (GIF89a spec §18).
    def gif: Option[AssetMeta] =
      if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
          u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
        val w = u8(6) | (u8(7) << 8)
        val h = u8(8) | (u8(9) << 8)
        if (w > 0 && h > 0)
          Some(AssetMeta(assetId, bytes.length.toLong, w, h, "gif"))
        else None
      } else None

    png.orElse(jpeg).orElse(gif).getOrElse(decodeStub(assetId, bytes))
  }

  /** Extracted audio metadata row ([[decodeAudio]]). */
  final case class WavMeta(asset_id: Long, n_bytes: Long, channels: Int,
                           sample_rate: Int, bits_per_sample: Int,
                           format: String)

  /** Audio twin of [[decode]]: WAV/RIFF `fmt ` chunk parsing (RIFF spec:
    * little-endian u16 channels @ chunk+2, u32 sample rate @ chunk+4,
    * u16 bits/sample @ chunk+14, scanning chunks from offset 12). Non-WAV
    * or malformed bytes degrade to a deterministic stub row with format
    * "unknown" — same loud-but-flowing policy as the image stub. */
  def decodeAudio(assetId: Long, rawBytes: Array[Byte]): WavMeta = {
    // null blob (missing asset, left-join miss) gets the same
    // loud-but-flowing stub as malformed bytes, never an NPE
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    def u8(i: Long): Int = bytes(i.toInt) & 0xff
    def u16le(i: Long): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Long): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    val stub = WavMeta(assetId, bytes.length.toLong, 1,
      8000 + (bytes.length % 8).toInt * 4000, 16, "unknown")
    if (bytes.length < 44 ||
        !(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F') ||
        !(u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return stub
    // cursor stays Long: a chunk size near 2^31 would overflow an Int
    // cursor into a negative index (AIOOBE) instead of degrading
    var i = 12L
    while (i + 8 <= bytes.length) {
      val size = u32le(i + 4)
      if (u8(i) == 'f' && u8(i + 1) == 'm' && u8(i + 2) == 't' && u8(i + 3) == ' ') {
        if (i + 8 + 16 > bytes.length) return stub // truncated fmt chunk
        val channels = u16le(i + 10)
        val rate = u32le(i + 12)
        val bits = u16le(i + 22)
        return if (channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0)
          WavMeta(assetId, bytes.length.toLong, channels, rate.toInt, bits, "wav")
        else stub
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size + (size & 1)
    }
    stub
  }

  /** Batch audio-metadata extraction — same mapPartitions codec shape as
    * [[decodeMeta]]. */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      it.map { case (id, bytes) => decodeAudio(id, bytes) }
    }(Encoders.product[WavMeta]).toDF()
  }

  /** Extracted video-container metadata row ([[decodeVideo]]). */
  final case class Mp4Meta(asset_id: Long, n_bytes: Long, duration_ms: Long,
                           timescale: Long, n_tracks: Int, brand: String,
                           format: String)

  /** Video twin of [[decode]]: MP4 / ISO-BMFF box walking (ISO 14496-12) —
    * pure byte arithmetic, no codec library. Boxes are
    * `[u32 size]["4cc" type]`; `size == 1` switches to a u64 largesize at
    * +8, `size == 0` means to-end-of-file (both §4.2). The top-level walk
    * reads the `ftyp` major brand, then inside `moov` reads `mvhd`
    * (version 0: u32 timescale/duration at payload +12/+16; version 1:
    * 64-bit times, timescale at +20, u64 duration at +24) and counts
    * `trak` children. `duration_ms = duration · 1000 / timescale` in
    * integer arithmetic. Anything malformed — truncated box, size < 8,
    * missing moov/mvhd, zero timescale — degrades to a deterministic stub
    * row with format "unknown", the same loud-but-flowing policy as the
    * image/audio stubs: one corrupt asset in a 100 TB scan must not kill
    * the stage. */
  def decodeVideo(assetId: Long, rawBytes: Array[Byte]): Mp4Meta = {
    val bytes = if (rawBytes == null) Array.emptyByteArray else rawBytes
    val n = bytes.length.toLong
    def u8(i: Long): Int = bytes(i.toInt) & 0xff
    def u32(i: Long): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def cc(i: Long): String =
      new String(Array(u8(i), u8(i + 1), u8(i + 2), u8(i + 3)).map(_.toByte),
        java.nio.charset.StandardCharsets.US_ASCII)
    val first = if (bytes.nonEmpty) u8(0) else 0
    val stub = Mp4Meta(assetId, n, (n * 13 + first) % 600000L, 90000L,
      (1 + n % 4).toInt, "none", "unknown")

    // (payload start, box end) of the box headed at `i`, or None when the
    // header lies about its size (negative, < header, past the buffer)
    def bounds(i: Long, limit: Long): Option[(Long, Long)] = {
      if (i + 8 > limit) return None
      u32(i) match {
        case 0 => Some((i + 8, limit)) // to end of enclosing scope
        case 1 =>
          if (i + 16 > limit) None
          else {
            val sz = u64(i + 8)
            if (sz < 16 || i + sz > limit) None else Some((i + 16, i + sz))
          }
        case sz =>
          if (sz < 8 || i + sz > limit) None else Some((i + 8, i + sz))
      }
    }

    var brand = "none"
    var i = 0L
    var mvhd: Option[(Long, Long)] = None // (timescale, duration)
    var tracks = 0
    var sawMoov = false
    while (i < n) {
      bounds(i, n) match {
        case None => return stub
        case Some((p, end)) =>
          cc(i + 4) match {
            case "ftyp" if p + 4 <= end => brand = cc(p)
            case "moov" =>
              sawMoov = true
              var j = p
              while (j < end) {
                bounds(j, end) match {
                  case None => return stub
                  case Some((cp, cend)) =>
                    cc(j + 4) match {
                      case "mvhd" if cp + 4 <= cend =>
                        val v = u8(cp)
                        mvhd =
                          if (v == 0 && cp + 20 <= cend)
                            Some((u32(cp + 12), u32(cp + 16)))
                          else if (v == 1 && cp + 32 <= cend)
                            Some((u32(cp + 20), u64(cp + 24)))
                          else return stub // truncated or unknown version
                      case "trak" => tracks += 1
                      case _ => ()
                    }
                    j = cend
                }
              }
            case _ => ()
          }
          i = end
      }
    }
    mvhd match {
      case Some((ts, dur)) if sawMoov && ts > 0 && dur >= 0 =>
        Mp4Meta(assetId, n, dur * 1000L / ts, ts, tracks, brand, "mp4")
      case _ => stub
    }
  }

  /** Batch video-metadata extraction — same mapPartitions codec shape as
    * [[decodeMeta]]; pair with [[frameSamplePlan]] for the sampling plan. */
  def decodeVideoMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      it.map { case (id, bytes) => decodeVideo(id, bytes) }
    }(Encoders.product[Mp4Meta]).toDF()
  }

  /** Batch metadata extraction: (id, binary) -> AssetMeta via
    * mapPartitions — one iterator per partition, the batch shape a real
    * codec wants (amortized init, sequential IO). No shuffle. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      // Real codecs initialize once per partition here (the expensive part
      // a per-row UDF cannot amortize).
      it.map { case (id, bytes) => decode(id, bytes) }
    }(Encoders.product[AssetMeta]).toDF()
  }

  /** Resize plan stub: computes target dimensions (fit into maxDim box,
    * aspect preserved) as pure column arithmetic; the pixel work would be
    * the same mapPartitions shape as [[decodeMeta]]. */
  def resizePlan(meta: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    meta.withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample plan stub for "video" assets: every `stride`-th frame
    * offset, as an array column (`sequence` — codegen'd). */
  def frameSamplePlan(meta: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    meta.withColumn("frame_offsets",
      when(col("n_bytes") >= frameBytes,
        sequence(lit(0L), col("n_bytes") - frameBytes, lit(frameBytes.toLong * stride)))
        .otherwise(array().cast("array<bigint>")))

  /** REAL audio decode + feature extraction: one codegen'd pass over each
    * WAV blob's 16-bit PCM samples via [[graft.functions.WavPcmStats]]
    * (PCM needs no codec library — "decoding" is byte interpretation).
    * Emits per asset: container fields (channels, sample_rate), sample
    * stats exact in integers (n_samples, duration_ms, sum_sq, peak,
    * zero_crossings) and the derived `rms` (the only float, computed from
    * the exact integers). Non-PCM16 / non-WAV blobs yield NULL features —
    * unlike [[decodeAudioMeta]]'s stub row, a feature consumer must be
    * able to FILTER undecodable assets, not average fake numbers in.
    * Stays entirely inside whole-stage codegen: no mapPartitions, no UDF,
    * so a downstream quality predicate fuses with the decode. */
  def pcmFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val stats = graft.functions.GraftFunctions.wavPcmStats(col(binCol))
    df.select(col(idCol).cast("long").as("asset_id"),
        length(col(binCol)).cast("long").as("n_bytes"), stats.as("_gf_pcm"))
      .select(col("asset_id"), col("n_bytes"), col("_gf_pcm.*"))
      .withColumn("rms",
        when(col("n_samples") > 0,
          sqrt(col("sum_sq").cast("double") / col("n_samples"))))
  }
}
