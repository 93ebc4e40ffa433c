package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — match point rows to interval rows with
  * `start <= point < end` (plus optional equi-keys) without the
  * cartesian-per-key blowup Spark's own planner produces for a raw
  * inequality join (BroadcastNestedLoopJoin, or a per-key cross product
  * in sort-merge).
  *
  * Spark-first plan: the classic BIN join. The axis is divided into
  * fixed-width buckets; each interval row is exploded to one row per
  * bucket it overlaps (`sequence()` — bounded by interval span / width),
  * each point row computes its single bucket, and the two sides meet in
  * an ordinary EQUI-join on (keys…, bucket) that Catalyst shuffles or
  * broadcasts like any other join, followed by the exact range filter.
  * A point meets a given interval in exactly one bucket (the point's
  * own), so no post-join dedup is needed.
  *
  * At 100 TB: shuffle volume is |points| + |intervals|·avg_buckets, and
  * `bucketWidth` is the knob — pick it near the typical interval span so
  * avg_buckets stays O(1); skewed hot buckets fall out of AQE skew-join
  * like any equi-join. A degenerate width (≪ span) multiplies the
  * interval side, so [[intervalJoin]] refuses spans wider than
  * `maxBucketsPerInterval` buckets instead of silently exploding.
  */
object RangeJoin {

  /** Inner-join points to the intervals containing them
    * (`start <= point < end`, same `keys` on both sides). The axis is any
    * integral column (for timestamps, pass `unix_micros(ts)`).
    * Every interval column survives; point columns survive under their
    * own names (caller disambiguates beforehand). */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   keys: Seq[String], bucketWidth: Long,
                   maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    val pBucket = floor(col(pointCol).cast("long") / w)
    val sBucket = floor(col(startCol).cast("long") / w)
    // end is exclusive: an interval touching a bucket boundary exactly at
    // `end` contributes nothing there
    val eBucket = floor((col(endCol).cast("long") - 1) / w)
    val guard = when(eBucket - sBucket >= maxBucketsPerInterval,
      raise_error(concat(lit(s"intervalJoin: interval spans more than $maxBucketsPerInterval " +
        s"buckets of width $bucketWidth — raise bucketWidth ("), col(startCol).cast("string"),
        lit(".."), col(endCol).cast("string"), lit(")"))).cast("long"))
      .otherwise(eBucket)
    val expl = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_gf_bucket", explode(sequence(sBucket, guard)))
    val pts = points.withColumn("_gf_bucket", pBucket)
    pts.join(expl, keys :+ "_gf_bucket")
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("_gf_bucket")
  }
}
