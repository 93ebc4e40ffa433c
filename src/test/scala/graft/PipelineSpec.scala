package graft

import graft.dedup.Duplicates
import graft.impute.Constant
import graft.multimodal.{AssetMeta, Multimodal}
import graft.normalize.NormalizeConfig
import graft.outliers.{Iqr, ReplaceConstant}
import graft.pipeline._
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline chains stages in order and collects reports") {
    val df = Seq(
      (1, "a", Some(10.0)), (2, "a", Some(11.0)), (3, "b", None),
      (4, "B", Some(10000.0))
    ).toDF("id", "k", "v")
    val res = Pipeline.run(df, Seq(
      NormalizeStage(NormalizeConfig(standardizeTextColumns = Seq("k"))),
      ImputeStage(Map("v" -> Constant("0"))),
      DedupStage(Seq("k"), Duplicates.KeepFirst, Seq(col("id"))),
      OutlierStage(Map("v" -> Iqr(1.5)), Map("v" -> ReplaceConstant(-1.0)))))
    val rows = res.df.orderBy("id").collect()
    // dedup on normalized k keeps ids 1 (a), 3 (b); id 4 ("B"->"b") dropped
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3))
    assert(rows(1).getDouble(2) == 0.0) // null imputed before outlier step
    assert(res.reports.keySet ==
      Set("0:normalize", "1:impute", "3:outliers"))
  }

  test("multimodal decodeMeta runs batch-wise and resize plan fits box") {
    val df = Seq((1L, "x".getBytes("UTF-8")), (2L, ("y" * 3000).getBytes("UTF-8")))
      .toDF("id", "bin")
    val meta = Multimodal.decodeMeta(df, "id", "bin")
    val planned = Multimodal.resizePlan(meta, 512).orderBy("asset_id").collect()
    assert(planned.length == 2)
    planned.foreach { r =>
      assert(r.getAs[Int]("target_width") <= 512 && r.getAs[Int]("target_height") <= 512)
    }
    assert(planned(1).getAs[Long]("n_bytes") == 3000L)
  }

  test("decode parses hand-built PNG IHDR and JPEG SOFn headers; stubs the rest") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    // PNG: signature + IHDR length + "IHDR" + width 320 + height 240 + tail
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000140" + "000000F0" + "0806000000")
    assert(Multimodal.decode(7L, png) ==
      AssetMeta(7L, png.length.toLong, 320, 240, "png"))
    // JPEG: SOI, APP0 (skipped by the marker scan), COM (also skipped),
    // then SOF0 with height 240 / width 320
    val jpeg = hexBytes("FFD8" +
      "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "0000" +
      "FFFE" + "0004" + "4869" + // COM segment "Hi"
      "FFC0" + "0011" + "08" + "00F0" + "0140" + "03" + "011100" + "021101" + "031101")
    val j = Multimodal.decode(8L, jpeg)
    assert((j.width, j.height, j.format) == ((320, 240, "jpeg")))
    // non-image bytes and truncated image bytes fall back to the stub
    val txt = "hello world".getBytes("UTF-8")
    assert(Multimodal.decode(9L, txt) == Multimodal.decodeStub(9L, txt))
    val soiOnly = hexBytes("FFD8FFC0")
    assert(Multimodal.decode(10L, soiOnly) == Multimodal.decodeStub(10L, soiOnly))
    val badPng = hexBytes("89504E470D0A1A0A" + "0000000D" + "49480000")
    assert(Multimodal.decode(11L, badPng) == Multimodal.decodeStub(11L, badPng))
    // GIF89a logical screen 320x240 (little-endian u16s)
    val gif = hexBytes("474946383961" + "4001" + "F000" + "80" + "00" + "00")
    assert(Multimodal.decode(12L, gif) ==
      AssetMeta(12L, gif.length.toLong, 320, 240, "gif"))
    val zeroGif = hexBytes("474946383961" + "0000" + "F000" + "80" + "00" + "00")
    assert(Multimodal.decode(13L, zeroGif) == Multimodal.decodeStub(13L, zeroGif))
  }

  test("decodeAudio parses a hand-built WAV fmt chunk; stubs the rest") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    // RIFF/WAVE with a JUNK chunk (odd size -> pad byte) before fmt:
    // stereo, 44100 Hz, 16-bit PCM
    val wav = hexBytes("52494646" + "30000000" + "57415645" +
      "4A554E4B" + "03000000" + "AABBCC" + "00" + // JUNK(3)+pad
      "666D7420" + "10000000" +                   // "fmt " size 16
      "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000" +
      "64617461" + "00000000")
    val m = Multimodal.decodeAudio(1L, wav)
    assert((m.channels, m.sample_rate, m.bits_per_sample, m.format) ==
      ((2, 44100, 16, "wav")))
    val noise = "not audio at all".getBytes("UTF-8")
    assert(Multimodal.decodeAudio(2L, noise).format == "unknown")
    // chunk size near 2^31 must degrade (an Int cursor would go negative
    // and AIOOBE); null blobs stub instead of NPE
    val hugeChunk = hexBytes("52494646" + "30000000" + "57415645" +
      "4A554E4B" + "FCFFFF7F") ++ Array.fill[Byte](20)(0)
    assert(Multimodal.decodeAudio(3L, hugeChunk).format == "unknown")
    assert(Multimodal.decodeAudio(4L, null).format == "unknown")
    assert(Multimodal.decode(5L, null) ==
      Multimodal.decodeStub(5L, Array.emptyByteArray))
    // batch path: mapPartitions with the typed encoder
    val df = Seq((1L, wav), (2L, noise)).toDF("asset_id", "bytes")
    val out = Multimodal.decodeAudioMeta(df, "asset_id", "bytes")
      .orderBy("asset_id").collect()
    assert(out(0).getAs[String]("format") == "wav" &&
      out(0).getAs[Int]("sample_rate") == 44100)
    assert(out(1).getAs[String]("format") == "unknown")
  }

  test("decodeVideo walks MP4 boxes (mvhd v0/v1, largesize, trak count); stubs the rest") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    // the query builder's constant, not a copy — a tail fix there must
    // flow into these fixtures or they'd stop testing what ships
    val tail = graft.queries.PipelineQueries.Mp4Tail
    val ftyp = "00000014" + "66747970" + "69736F6D" + "00000200" + "6D703432"
    // v0 mvhd: timescale 600, duration 90000 -> 150000 ms; two traks
    val v0 = hexBytes(ftyp +
      "00000084" + "6D6F6F76" + // moov: 8 + 108 + 2*8
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      "00000258" + "00015F90" + tail +
      "00000008" + "7472616B" + "00000008" + "7472616B")
    assert(Multimodal.decodeVideo(1L, v0) ==
      Multimodal.Mp4Meta(1L, v0.length.toLong, 150000L, 600L, 2, "isom", "mp4"))
    // v1 mvhd (64-bit times): timescale 1000, duration 7500 -> 7500 ms,
    // one trak; mdat uses size==1 + u64 largesize (16-byte header only)
    val v1 = hexBytes(ftyp +
      "00000088" + "6D6F6F76" + // moov: 8 + 120 + 8
      "00000078" + "6D766864" + "01000000" + ("00" * 8) + ("00" * 8) +
      "000003E8" + ("00" * 4) + "00001D4C" + tail +
      "00000008" + "7472616B" +
      "00000001" + "6D646174" + "0000000000000010")
    assert(Multimodal.decodeVideo(2L, v1) ==
      Multimodal.Mp4Meta(2L, v1.length.toLong, 7500L, 1000L, 1, "isom", "mp4"))
    // size==0 final box (extends to EOF) is legal and must not loop/stub
    val v0free = hexBytes(ftyp +
      "00000074" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      "00000258" + "00015F90" + tail + "00000008" + "7472616B" +
      "00000000" + "66726565" + "AABB")
    assert(Multimodal.decodeVideo(3L, v0free).format == "mp4")
    // non-video, truncated moov, zero timescale, lying box size, null:
    // all degrade to the deterministic stub
    val txt = "definitely not a movie".getBytes("UTF-8")
    assert(Multimodal.decodeVideo(4L, txt) ==
      Multimodal.Mp4Meta(4L, txt.length.toLong,
        (txt.length * 13L + (txt(0) & 0xff)) % 600000L,
        90000L, 1 + txt.length % 4, "none", "unknown"))
    val truncated = hexBytes(ftyp + "00000070" + "6D6F6F76" + "0000006C")
    assert(Multimodal.decodeVideo(5L, truncated).format == "unknown")
    val zeroTs = hexBytes(ftyp +
      "0000007C" + "6D6F6F76" + // moov: 8 + 108 + 8
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      "00000000" + "00015F90" + tail + "00000008" + "7472616B")
    assert(Multimodal.decodeVideo(6L, zeroTs).format == "unknown")
    val lyingSize = hexBytes("00000003" + "66747970")
    assert(Multimodal.decodeVideo(7L, lyingSize).format == "unknown")
    assert(Multimodal.decodeVideo(8L, null).format == "unknown")
    // batch path
    val df = Seq((1L, v0), (2L, txt)).toDF("asset_id", "bytes")
    val out = Multimodal.decodeVideoMeta(df, "asset_id", "bytes")
      .orderBy("asset_id").collect()
    assert(out(0).getAs[String]("format") == "mp4" &&
      out(0).getAs[Long]("duration_ms") == 150000L &&
      out(0).getAs[Int]("n_tracks") == 2)
    assert(out(1).getAs[String]("format") == "unknown")
  }

  test("frame sample plan emits stride offsets") {
    val meta = Seq((1L, 100L)).toDF("asset_id", "n_bytes")
    val out = Multimodal.frameSamplePlan(meta, frameBytes = 20, stride = 2).collect()(0)
    assert(out.getAs[scala.collection.Seq[Long]]("frame_offsets").toSeq == Seq(0L, 40L, 80L))
  }

  test("sessionize splits on gap in batch mode") {
    def ts(min: Int) = new Timestamp(min * 60000L)
    val df = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(50)),  // gap 40 -> two sessions
      (2L, ts(5))
    ).toDF("user_id", "ts")
    val rows = StreamOps.sessionize(df, gap = "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("n_events") == 2)
  }

  test("windowedAgg works on a real stream (MemoryStream + watermark)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedAgg(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("agg_out")
      .outputMode("complete").start()
    try {
      mem.addData((new Timestamp(0L), "click", 1.0),
        (new Timestamp(60000L), "click", 2.0),
        (new Timestamp(601000L), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("agg_out").collect()
      assert(out.length == 2)
      assert(out.map(_.getAs[Long]("n")).sum == 3)
    } finally q.stop()
  }
}
