package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Motion-JPEG video: frame sampling + per-frame pixel statistics over
  * MJPEG-in-AVI assets — the video-frame analogue of [[Jpeg.pixelStats]],
  * closing the frame-decode slot of the multimodal surface (H.264+
  * entropy coding stays declared out of scope; MJPEG is exactly the
  * baseline-JPEG codec already in-tree, one image per frame).
  *
  * Container format is AVI (RIFF): `RIFF('AVI ') { LIST(hdrl){avih,
  * LIST(strl){strh,strf}}, LIST(movi){ ##dc frames }, idx1 }` with the
  * RIFF even-byte chunk padding rule. The walker is bounds-checked at
  * every header: a chunk that overruns its parent, a missing magic, or
  * an absent movi list refuses into a null-feature row rather than
  * throwing ([[Multimodal.decode]]'s discipline — corrupt assets are
  * data, not exceptions).
  *
  * Scale shape: one `mapPartitions` pass, no shuffle — each partition
  * decodes its own assets with the codec's static tables shared; every
  * k-th frame is decoded and the rest are SKIPPED at the container walk
  * (a sampled frame costs a JPEG decode, an unsampled one costs only a
  * 8-byte header hop), so sampling stride divides decode cost, not just
  * output size.
  *
  * Reference analogue: the reference has no video module; this extends
  * its asset-audit shape (multimodal metadata tables) to frame level.
  */
object Mjpeg {

  /** One row per SAMPLED frame (plus one refusal row for undecodable
    * containers): `ok=false` with null frame fields = container refused;
    * `ok=false` with `frame_idx` set = that frame's JPEG refused. */
  final case class FrameStats(asset_id: Long, n_bytes: Long, ok: Boolean,
      n_frames: Option[Int], frame_idx: Option[Int],
      width: Option[Int], height: Option[Int], channels: Option[Int],
      n_pixels: Option[Long], pix_sum: Option[Long],
      pix_min: Option[Int], pix_max: Option[Int])

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal spec-correct MJPEG-in-AVI writer (fixture/export side, the
    * [[Jpeg.encode]] counterpart): one 'vids'/'MJPG' stream, each frame
    * an independent baseline JPEG in a '00dc' chunk, odd-sized chunks
    * padded to even per RIFF, plus an idx1 keyframe index (offsets
    * relative to the 'movi' fourcc, the convention players expect). */
  def encodeAvi(width: Int, height: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "bad AVI geometry")
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = { var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    def chunk(cc: String, body: Array[Byte]): Unit = {
      out.write(fourcc(cc)); u32(body.length.toLong); out.write(body)
      if ((body.length & 1) == 1) out.write(0)       // RIFF pad to even
    }
    def list(listType: String, body: Array[Byte]): Unit = {
      out.write(fourcc("LIST")); u32(body.length.toLong + 4)
      out.write(fourcc(listType)); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    def build(f: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def bu16(b: ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >>> 8) & 0xff) }
    def bu32(b: ByteArrayOutputStream, v: Long): Unit = { var i = 0
      while (i < 4) { b.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }

    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    // avih: MainAVIHeader, 56 bytes
    val avih = build { b =>
      bu32(b, 1000000L / fps); bu32(b, maxFrame.toLong * fps)
      bu32(b, 0); bu32(b, 0x10 /* AVIF_HASINDEX */)
      bu32(b, frames.length.toLong); bu32(b, 0); bu32(b, 1 /* streams */)
      bu32(b, maxFrame.toLong); bu32(b, width.toLong); bu32(b, height.toLong)
      (0 until 4).foreach(_ => bu32(b, 0))
    }
    // strh: AVIStreamHeader, 56 bytes — 'vids'/'MJPG', rate/scale = fps
    val strh = build { b =>
      b.write(fourcc("vids")); b.write(fourcc("MJPG"))
      bu32(b, 0); bu16(b, 0); bu16(b, 0); bu32(b, 0)
      bu32(b, 1); bu32(b, fps.toLong); bu32(b, 0)
      bu32(b, frames.length.toLong); bu32(b, maxFrame.toLong)
      bu32(b, 0xFFFFFFFFL /* quality: default */); bu32(b, 0)
      bu16(b, 0); bu16(b, 0); bu16(b, width); bu16(b, height)
    }
    // strf: BITMAPINFOHEADER, 40 bytes — biCompression 'MJPG'
    val strf = build { b =>
      bu32(b, 40); bu32(b, width.toLong); bu32(b, height.toLong)
      bu16(b, 1); bu16(b, 24); b.write(fourcc("MJPG"))
      bu32(b, width.toLong * height * 3); bu32(b, 0); bu32(b, 0)
      bu32(b, 0); bu32(b, 0)
    }
    val strl = build { b =>
      b.write(fourcc("strh")); bu32(b, strh.length.toLong); b.write(strh)
      b.write(fourcc("strf")); bu32(b, strf.length.toLong); b.write(strf)
    }
    val hdrl = build { b =>
      b.write(fourcc("avih")); bu32(b, avih.length.toLong); b.write(avih)
      b.write(fourcc("LIST")); bu32(b, strl.length.toLong + 4)
      b.write(fourcc("strl")); b.write(strl)
    }
    // movi body + idx1 offsets (relative to the 'movi' fourcc position)
    val idx = new ByteArrayOutputStream()
    val movi = build { b =>
      frames.foreach { f =>
        val off = b.size() + 4                       // 'movi' fourcc = 4
        idx.write(fourcc("00dc")); bu32(idx, 0x10 /* KEYFRAME */)
        bu32(idx, off.toLong); bu32(idx, f.length.toLong)
        b.write(fourcc("00dc")); bu32(b, f.length.toLong); b.write(f)
        if ((f.length & 1) == 1) b.write(0)
      }
    }
    val body = build { b =>
      b.write(fourcc("AVI "))
      b.write(build { h =>
        h.write(fourcc("LIST")); bu32(h, hdrl.length.toLong + 4)
        h.write(fourcc("hdrl")); h.write(hdrl) })
      b.write(build { m =>
        m.write(fourcc("LIST")); bu32(m, movi.length.toLong + 4)
        m.write(fourcc("movi")); m.write(movi) })
      val ib = idx.toByteArray
      b.write(fourcc("idx1")); bu32(b, ib.length.toLong); b.write(ib)
    }
    out.write(fourcc("RIFF")); u32(body.length.toLong); out.write(body)
    out.toByteArray
  }

  /** Walk the RIFF tree and return every video-frame ('##dc') chunk's
    * byte range, bounds-checked; None = container refused. */
  private[multimodal] def frameRanges(bytes: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (bytes == null || bytes.length < 12) return None
    def cc(i: Int): String =
      new String(bytes, i, 4, "US-ASCII")
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val riffEnd = 8L + u32(4)
    if (riffEnd > bytes.length) return None
    val isDc = (s: String) => s.length == 4 &&
      s(0).isDigit && s(1).isDigit && s.substring(2) == "dc"
    var pos = 12L
    while (pos + 8 <= riffEnd) {
      val id = cc(pos.toInt); val sz = u32(pos.toInt + 4)
      val dataEnd = pos + 8 + sz
      if (dataEnd > riffEnd) return None              // chunk overruns RIFF
      if (id == "LIST" && sz >= 4 && cc(pos.toInt + 8) == "movi") {
        // walk the frame chunks inside movi
        val frames = Seq.newBuilder[(Int, Int)]
        var p = pos + 12
        while (p + 8 <= dataEnd) {
          val fid = cc(p.toInt); val fsz = u32(p.toInt + 4)
          if (p + 8 + fsz > dataEnd) return None      // frame overruns movi
          if (isDc(fid)) frames += ((p.toInt + 8, fsz.toInt))
          p += 8 + fsz + (fsz & 1)                    // RIFF even padding
        }
        return Some(frames.result())
      }
      pos = dataEnd + (sz & 1)
    }
    None                                              // no movi list
  }

  /** Decode every `stride`-th frame (indices 0, stride, 2·stride, …) of
    * one asset into per-frame pixel stats. */
  def sampleFrames(assetId: Long, rawBytes: Array[Byte],
                   stride: Int): Seq[FrameStats] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val n = if (rawBytes == null) 0L else rawBytes.length.toLong
    frameRanges(rawBytes) match {
      case None =>
        Seq(FrameStats(assetId, n, ok = false, None, None, None, None,
          None, None, None, None, None))
      // A well-formed AVI whose movi list holds no '##dc' chunks: the
      // asset must still be represented in the output (the refusal-row
      // discipline — no input vanishes), as one ok=false row that says
      // "container fine, zero frames" via n_frames = Some(0).
      case Some(ranges) if ranges.isEmpty =>
        Seq(FrameStats(assetId, n, ok = false, Some(0), None, None, None,
          None, None, None, None, None))
      case Some(ranges) =>
        val total = ranges.length
        ranges.zipWithIndex.collect {
          case ((off, len), idx) if idx % stride == 0 =>
            val frame = java.util.Arrays.copyOfRange(rawBytes, off, off + len)
            Jpeg.decodePixels(assetId, frame) match {
              case s if s.ok =>
                FrameStats(assetId, n, ok = true, Some(total), Some(idx),
                  s.width, s.height, s.channels, s.n_pixels, s.pix_sum,
                  s.pix_min, s.pix_max)
              case _ =>
                FrameStats(assetId, n, ok = false, Some(total), Some(idx),
                  None, None, None, None, None, None, None)
            }
        }
    }
  }

  /** Batch frame sampling — the [[Jpeg.pixelStats]] mapPartitions codec
    * shape: zero shuffle, codec tables amortized per partition, frames
    * outside the stride skipped at the container walk (8-byte hops). */
  def frameStats(df: DataFrame, idCol: String, binCol: String,
                 stride: Int = 1): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      it.flatMap { case (id, bytes) => sampleFrames(id, bytes, stride) }
    }(Encoders.product[FrameStats]).toDF()
  }
}
