package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.{GraftFunctions, PcmKernel}
import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins [[graft.functions.WavPcmStats]] / [[PcmKernel]]: real PCM sample
  * statistics (exact integers), container edge cases, and the DataFrame
  * path ([[Multimodal.pcmFeatures]]) that runs the expression under
  * whole-stage codegen. */
class PcmStatsSpec extends SparkSpec {

  /** Build a PCM16 WAV blob: header with CORRECT sizes + the samples. */
  private def wav(channels: Int, rate: Int, samples: Array[Short],
                  declaredLen: Option[Int] = None,
                  audioFormat: Int = 1, bits: Int = 16): Array[Byte] = {
    val dlen = declaredLen.getOrElse(samples.length * 2)
    val bb = ByteBuffer.allocate(44 + samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dlen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(audioFormat.toShort); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dlen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def stats(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long, Int, Long)] =
    Option(PcmKernel.compute(bytes)).map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5), r.getLong(6))
    }

  test("mono sine wave: exact integer stats match a plain-Scala reference") {
    val n = 400
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 440 * i / 8000.0) * 12000).toShort)
    val Some((ch, rate, ns, durMs, sumSq, peak, zc)) =
      stats(wav(1, 8000, samples))
    assert(ch == 1 && rate == 8000 && ns == n)
    assert(durMs == n.toLong * 1000 / 8000)
    assert(sumSq == samples.map(s => s.toLong * s).sum)
    assert(peak == samples.map(s => math.abs(s.toInt)).max)
    val expectedZc = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
    assert(zc == expectedZc && zc > 30) // 440 Hz over 50 ms ≈ 44 crossings
  }

  test("stereo: zero crossings compare within a channel, not across interleave") {
    // L channel: constant +1000 (no crossings). R channel: alternating
    // ±1000 (crossing at every sample). Comparing adjacent interleaved
    // samples (the naive bug) would count crossings on BOTH channels.
    val frames = 100
    val samples = Array.tabulate(frames * 2) { i =>
      if (i % 2 == 0) 1000.toShort
      else (if ((i / 2) % 2 == 0) 1000 else -1000).toShort
    }
    val Some((ch, _, ns, _, _, _, zc)) = stats(wav(2, 16000, samples))
    assert(ch == 2 && ns == frames * 2)
    assert(zc == frames - 1) // only the R channel crosses
  }

  test("negative samples: sign extension and peak on Short.MinValue") {
    val samples = Array[Short](Short.MinValue, Short.MaxValue, -1, 0, 1)
    val Some((_, _, _, _, sumSq, peak, zc)) = stats(wav(1, 8000, samples))
    assert(peak == 32768) // |-32768|
    assert(sumSq == samples.map(s => s.toLong * s).sum)
    // sign(x) = x >= 0: [F,T,F,T,T] → transitions F→T, T→F, F→T = 3
    assert(zc == 3)
  }

  test("zero-crossing truth table on the sign(x) = x>=0 convention") {
    val samples = Array[Short](-5, 5, -5, 0, 7)
    // signs: F T F T T → crossings at each of the 3 flips
    val Some((_, _, _, _, _, _, zc)) = stats(wav(1, 8000, samples))
    assert(zc == 3)
  }

  test("declared data size beyond the blob clamps; partial frames drop") {
    val samples = Array.tabulate(11)(i => (i * 100).toShort)
    // stereo with 11 samples = 5 whole frames + 1 dangling sample
    val Some((_, _, ns, _, _, _, _)) = stats(wav(2, 8000, samples))
    assert(ns == 10)
    // declared length far beyond the actual bytes: clamp, don't throw
    val Some((_, _, ns2, _, _, _, _)) =
      stats(wav(1, 8000, samples, declaredLen = Some(1 << 20)))
    assert(ns2 == 11)
  }

  test("non-PCM, non-16-bit, non-WAV and null all yield NULL (not a stub)") {
    val samples = Array[Short](1, 2, 3, 4)
    assert(stats(wav(1, 8000, samples, audioFormat = 85)).isEmpty) // MP3 tag
    assert(stats(wav(1, 8000, samples, bits = 8)).isEmpty)
    assert(stats("just some text".getBytes).isEmpty)
    assert(stats(null).isEmpty)
    assert(stats(Array.emptyByteArray).isEmpty)
    // zero-channel fmt must not divide by zero
    assert(stats(wav(0, 8000, samples)).isEmpty)
  }

  test("empty data chunk: zero samples, zero stats, rms NULL downstream") {
    val Some((_, _, ns, durMs, sumSq, peak, zc)) =
      stats(wav(1, 8000, Array.empty[Short]))
    assert(ns == 0 && durMs == 0 && sumSq == 0 && peak == 0 && zc == 0)
  }

  test("DataFrame path: codegen'd expression matches the kernel, row for row") {
    import spark.implicits._
    val blobs = Seq(
      1L -> wav(1, 8000, Array.tabulate(50)(i => (i * 317 - 7000).toShort)),
      2L -> wav(2, 44100, Array.tabulate(64)(i => (math.sin(i * 0.7) * 9000).toShort)),
      3L -> "not audio at all".getBytes,
      4L -> null.asInstanceOf[Array[Byte]])
    val df = blobs.toDF("asset_id", "asset")
    val out = Multimodal.pcmFeatures(df, "asset_id", "asset")
      .orderBy("asset_id").collect()
    assert(out.length == 4)
    for ((row, (_, bytes)) <- out.zip(blobs)) {
      val expected = stats(bytes)
      expected match {
        case Some((ch, rate, ns, durMs, sumSq, peak, zc)) =>
          assert(row.getAs[Int]("channels") == ch)
          assert(row.getAs[Int]("sample_rate") == rate)
          assert(row.getAs[Long]("n_samples") == ns)
          assert(row.getAs[Long]("duration_ms") == durMs)
          assert(row.getAs[Long]("sum_sq") == sumSq)
          assert(row.getAs[Int]("peak") == peak)
          assert(row.getAs[Long]("zero_crossings") == zc)
          val rms = row.getAs[Double]("rms")
          assert(math.abs(rms - math.sqrt(sumSq.toDouble / ns)) < 1e-9)
        case None =>
          assert(row.isNullAt(row.fieldIndex("channels")))
          assert(row.isNullAt(row.fieldIndex("sum_sq")))
          assert(row.isNullAt(row.fieldIndex("rms")))
      }
    }
    // n_bytes rides along even for undecodable blobs
    assert(out(2).getAs[Long]("n_bytes") == "not audio at all".getBytes.length)
  }

  test("expression filter fuses: quality predicate over decoded features") {
    import spark.implicits._
    val loud = wav(1, 8000, Array.fill(20)(20000.toShort))
    val quiet = wav(1, 8000, Array.fill(20)(10.toShort))
    val df = Seq(1L -> loud, 2L -> quiet).toDF("asset_id", "asset")
    val kept = Multimodal.pcmFeatures(df, "asset_id", "asset")
      .filter(col("rms") > 1000).select("asset_id").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }
}
