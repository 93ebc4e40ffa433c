package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  // ---------------------------------------------------------------- z-order

  /** Max interleaved bits: k columns × `bits` each must fit a signed LONG. */
  private def checkZArgs(nCols: Int, bits: Int): Unit = {
    require(nCols >= 2, s"z-order needs >= 2 columns, got $nCols")
    require(bits >= 1 && nCols * bits <= 62,
      s"need 1 <= bits and cols*bits <= 62, got $nCols cols x $bits bits")
  }

  /** Min-max range bucket of `v` into [0, 2^bits): the per-dimension
    * quantization under the z-value. All arithmetic is the same IEEE
    * expression tree as [[sqlRangeBucket]] so oracles hash-match.
    * Constant columns (mx == mn) land in bucket 0; nulls propagate. */
  private def rangeBucket(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    when(mx === mn, lit(0L)).otherwise(
      least(lit((1L << bits) - 1),
        floor((v.cast("double") - mn.cast("double"))
          / (mx.cast("double") - mn.cast("double")) * lit(cells))))
  }

  /** DuckDB mirror of [[rangeBucket]] — identical operation order. */
  private def sqlRangeBucket(v: String, mn: String, mx: String, bits: Int): String = {
    val cells = (1L << bits).toDouble
    s"CASE WHEN $mx = $mn THEN 0 ELSE least(${(1L << bits) - 1}, " +
      s"CAST(floor((CAST($v AS DOUBLE) - CAST($mn AS DOUBLE)) " +
      s"/ (CAST($mx AS DOUBLE) - CAST($mn AS DOUBLE)) * $cells) AS BIGINT)) END"
  }

  /** Morton interleave of per-column buckets: bit `b` of bucket `i` goes
    * to position `b*k + i`, so a prefix of the z-value constrains EVERY
    * dimension — the property that gives multi-column file pruning. */
  private def interleave(buckets: Seq[Column], bits: Int): Column =
    (for { b <- 0 until bits; (c, i) <- buckets.zipWithIndex }
      yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)),
        b * buckets.size + i).cast(LongType))
      .reduce(_ bitwiseOR _)

  private def sqlInterleave(buckets: Seq[String], bits: Int): String =
    (for { b <- 0 until bits; (c, i) <- buckets.zipWithIndex }
      yield s"((($c >> $b) & 1) << ${b * buckets.size + i})").mkString(" | ")

  /** Append a `zCol` LONG z-order (Morton) value over `cols`.
    *
    * Why this beats [[writeRangeSorted]] for multi-predicate workloads: a
    * single-key sort gives perfect pruning on that key and none on any
    * other, while z-order interleaves `bits` range-bucket bits per column,
    * so files cover a small hyper-rectangle of the key space and a
    * predicate on ANY of the columns skips most files.
    *
    * Shape at 100 TB: one tiny min/max aggregate (broadcast back as a
    * 1-row dimension — the plan stays lazy, nothing collects), then a
    * pure per-row projection; the z-value computation itself never
    * shuffles. Skewed columns degrade bucket balance (min-max, not rank,
    * quantization) — pre-thin heavy hitters or raise `bits` if a single
    * value dominates a dimension. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               zCol: String = "zval"): DataFrame = {
    checkZArgs(cols.size, bits)
    val boundCols = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c).as(s"_gf_mn$i"), max(c).as(s"_gf_mx$i"))
    }
    val bounds = df.agg(boundCols.head, boundCols.tail: _*)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      rangeBucket(col(c), col(s"_gf_mn$i"), col(s"_gf_mx$i"), bits)
    }
    // explicit null-out: Spark's (and recent DuckDB's) least() IGNORES
    // nulls, so without this guard a null dimension would silently land
    // in the top bucket instead of propagating
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    df.crossJoin(broadcast(bounds))
      .withColumn(zCol,
        when(anyNull, lit(null).cast(LongType))
          .otherwise(interleave(buckets, bits)))
      .drop(bounds.columns.toSeq: _*)
  }

  /** DuckDB mirror of [[zorderBy]]'s z-value over table `tbl` — bounds
    * come from the same min/max subquery, buckets and interleave from the
    * same loops, so the oracle cannot drift from the Spark expression.
    * Returns (boundsSubquerySql, zValueSql) for use as
    * `FROM $tbl, ($bounds) b` + select `$zexpr`. */
  def sqlZValue(tbl: String, cols: Seq[String], bits: Int): (String, String) = {
    checkZArgs(cols.size, bits)
    val bounds = cols.zipWithIndex.map { case (c, i) =>
      s"min($c) AS _gf_mn$i, max($c) AS _gf_mx$i"
    }.mkString("SELECT ", ", ", s" FROM $tbl")
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      s"(${sqlRangeBucket(c, s"_gf_mn$i", s"_gf_mx$i", bits)})"
    }
    val anyNull = cols.map(c => s"$c IS NULL").mkString(" OR ")
    (bounds,
      s"CASE WHEN $anyNull THEN NULL ELSE ${sqlInterleave(buckets, bits)} END")
  }

  /** Write `df` z-ordered on `cols`: range-partitioned and sorted by the
    * z-value, which is dropped from the files (it's a layout artifact,
    * recomputable from the data). */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    numFiles: Int, bits: Int = 8): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    zorderBy(df, cols, bits, zCol = "_gf_z")
      .repartitionByRange(numFiles, col("_gf_z"))
      .sortWithinPartitions("_gf_z")
      .drop("_gf_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
