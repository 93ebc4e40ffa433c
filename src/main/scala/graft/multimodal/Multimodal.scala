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
  * iterator with a typed Encoder, metadata struct joins — while the codec
  * call itself is a clearly-marked deterministic STUB (image/audio
  * libraries are not in this container): the "decode" derives metadata
  * from byte length/content so the whole pipeline stays testable and
  * oracle-checkable. Swap [[decodeStub]] for a JNI/javacv call and nothing
  * else changes.
  */
object Multimodal {

  /** STUB decode — deterministic fake standing in for a real image codec.
    * Real implementation would parse the container header here. */
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

  /** Batch metadata extraction: (id, binary) -> AssetMeta via
    * mapPartitions — one iterator per partition, the batch shape a real
    * codec wants (amortized init, sequential IO). No shuffle. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val pair = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pair.mapPartitions { it =>
      // Real codecs initialize once per partition here (the expensive part
      // a per-row UDF cannot amortize).
      it.map { case (id, bytes) => decodeStub(id, bytes) }
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
}
