package graft

import graft.dedup.Duplicates
import graft.outliers._
import org.apache.spark.sql.functions._

class DedupOutlierSpec extends SparkSpec {
  import spark.implicits._

  private def dupDf = Seq(
    (1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "a")
  ).toDF("id", "k")

  test("flag marks keep=False duplicates") {
    val flagged = Duplicates.flag(dupDf, Seq("k")).collect()
      .map(r => r.getInt(0) -> r.getBoolean(2)).toMap
    assert(flagged(1) && flagged(2) && flagged(5))
    assert(!flagged(3) && !flagged(4))
  }

  test("drop keep first/last/none with explicit tiebreak") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getInt(0)).toSet
    assert(ids(Duplicates.drop(dupDf, Seq("k"), Duplicates.KeepFirst, Seq(col("id"))))
      == Set(1, 3, 4))
    assert(ids(Duplicates.drop(dupDf, Seq("k"), Duplicates.KeepLast, Seq(col("id"))))
      == Set(5, 3, 4))
    assert(ids(Duplicates.drop(dupDf, Seq("k"), Duplicates.KeepNone, Nil))
      == Set(3, 4))
  }

  private def numDf = (Seq.fill(20)(10.0) ++ Seq(1000.0)).toDF("v")

  test("iqr detect flags the spike and log reports bounds") {
    val det = Outliers.detect(numDf, Map("v" -> Iqr(1.5)))
    assert(Outliers.outlierRows(det).count() == 1)
    val log = Outliers.log(det).collect()(0)
    assert(log.getAs[String]("method") == "iqr")
    assert(log.getAs[Long]("outlier_count") == 1)
  }

  test("zscore detect respects threshold and skips nulls") {
    val df = (Seq.fill(20)(Some(10.0)) ++ Seq(Some(1000.0), None)).toDF("v")
    val det = Outliers.detect(df, Map("v" -> ZScore(2.0)))
    assert(Outliers.outlierRows(det).count() == 1)
  }

  test("handle clip / constant / drop") {
    val det = Outliers.detect(numDf, Map("v" -> Iqr(1.5)))
    val clipped = Outliers.handle(det, Map("v" -> Clip))
      .agg(max("v")).collect()(0).getDouble(0)
    assert(clipped == 10.0) // iqr=0 -> bounds collapse to 10
    val const = Outliers.handle(det, Map("v" -> ReplaceConstant(-1)))
      .filter(col("v") === -1).count()
    assert(const == 1)
    assert(Outliers.handle(det, Map("v" -> DropRows)).count() == 20)
  }

  test("handle replace median") {
    val det = Outliers.detect(numDf, Map("v" -> Iqr(1.5)))
    val out = Outliers.handle(det, Map("v" -> ReplaceMedian))
    assert(out.filter(col("v") === 10.0).count() == 21)
  }

  test("MAD flags by robust sigma where mean/std would be dragged") {
    // 20 values at 10 ± small noise, one monster at 1000: the classic
    // case where the outlier inflates the stddev enough that zscore at
    // 3.0 misses it on tiny samples, while MAD is untouched by it
    import spark.implicits._
    val vals = (0 until 20).map(i => 10.0 + (i % 5) * 0.1) :+ 1000.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val det = Outliers.detect(df, Map("v" -> Mad(3.5)))
    val flagged = Outliers.outlierRows(det).select("id").collect().map(_.getLong(0))
    assert(flagged.toSeq == Seq(20L))
    // hand-check the bound arithmetic: med = 10.1..., MAD over |x - med|
    val sorted = vals.sorted
    val med = sorted(vals.length / 2)
    val devs = vals.map(v => math.abs(v - med)).sorted
    val mad = devs(vals.length / 2)
    val hi = med + 3.5 * 1.4826 * mad
    assert(vals.count(_ > hi) == 1 && 1000.0 > hi)
  }

  test("winsorize: exact discrete ranks, clip counts, hand-computed means") {
    import spark.implicits._
    // 1..100 in one group at (p05, p95): lo = 5th smallest = 5, hi = 95;
    // 4 rows clip up, 5 clip down; mean 50.5 → 50.45 after (+10 − 15).
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = Outliers.winsorize(df, "v", Seq("grp"), pLo = 0.05, pHi = 0.95)
      .collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 95.0)
    assert(r.getLong(4) == 4L && r.getLong(5) == 5L)
    assert(r.getDouble(6) == 50.5 && r.getDouble(7) == 50.45)
  }

  test("winsorize: nulls drop; tiny groups pick in-range bounds; refusals") {
    import spark.implicits._
    val df = Seq(("g", Option(1.0)), ("g", Option(2.0)), ("g", Option.empty[Double]))
      .toDF("grp", "v")
    val r = Outliers.winsorize(df, "v", Seq("grp")).collect().head
    // n = 2: ceil(.01·2) = 1 → lo = 1.0; ceil(.99·2) = 2 → hi = 2.0
    assert(r.getLong(1) == 2L && r.getDouble(2) == 1.0 && r.getDouble(3) == 2.0)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    intercept[IllegalArgumentException](
      Outliers.winsorize(df, "v", Seq("grp"), pLo = 0.5, pHi = 0.5))
  }

  test("madBy: discrete per-group medians, robust bounds, hand-computed counts") {
    import spark.implicits._
    // group g: values 1..9 plus outlier 100 → n=10; disc median at rank
    // ceil(0.5·10)=5 → 5.0; deviations |v−5|: 4,3,2,1,0,1,2,3,4,95 →
    // sorted 0,1,1,2,2,3,3,4,4,95, disc median at rank 5 → 2.0;
    // bounds = 5 ± 3.5·1.4826·2 = 5 ± 10.3782 → [−5.3782, 15.3782];
    // only 100 falls outside.
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 100.0) :+
      ("h", 7.0)).toDF("grp", "v")
    val out = graft.outliers.Outliers.madBy(df, "grp", "v", threshold = 3.5)
      .orderBy("grp").collect()
    val g = out(0); val h = out(1)
    assert(g.getAs[Long]("n") == 10 && g.getAs[Double]("median") == 5.0)
    assert(g.getAs[Double]("mad") == 2.0)
    assert(g.getAs[Double]("lower") == -5.3782 && g.getAs[Double]("upper") == 15.3782)
    assert(g.getAs[Long]("outlier_count") == 1)
    // single-value group: mad 0 → zero-width bounds, nothing outside
    assert(h.getAs[Double]("mad") == 0.0 && h.getAs[Long]("outlier_count") == 0)
    intercept[IllegalArgumentException] {
      graft.outliers.Outliers.madBy(df, "grp", "v", threshold = 0.0)
    }
  }
}
