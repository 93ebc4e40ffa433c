package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of "fast at
  * 100 TB". A key-range-partitioned, internally-sorted parquet layout
  * gives every file a tight min/max band on the layout key, so a reader's
  * key predicate prunes whole files (parquet row-group statistics +
  * Spark's file skipping) instead of scanning the corpus.
  *
  * `repartitionByRange` samples the key distribution (one extra pass) to
  * cut balanced ranges — skewed keys still land in balanced files, unlike
  * hash bucketing by a skewed key; `sortWithinPartitions` then makes each
  * row group's min/max stats tight. This is the plain-directory analogue
  * of bucketed tables (BucketingSpec covers those): no metastore needed,
  * and any engine that reads parquet statistics benefits.
  */
object Layout {

  /** Write `df` as `numFiles` range-partitioned, key-sorted parquet files. */
  def writeRangeSorted(df: DataFrame, keyCol: String, path: String,
                       numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Per-file (min, max) of the layout key — the pruning evidence. Disjoint
    * bands mean a point/range predicate touches at most one band's files. */
  def keyBands(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col(keyCol), input_file_name().as("file"))
      .groupBy("file")
      .agg(min(keyCol).as("key_min"), max(keyCol).as("key_max"),
        count(lit(1)).as("n_rows"))
}
