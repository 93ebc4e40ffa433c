package graft

import graft.ops.Layout
import java.nio.file.Files
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  test("writeRangeSorted produces disjoint key bands that prune point reads") {
    val dirFile = Files.createTempDirectory("graft-layout").toFile
    val dir = dirFile.getAbsolutePath
    try {
    val df = (0L until 20000L).map(i => (i, s"p$i")).toDF("k", "payload")
    Layout.writeRangeSorted(df, "k", dir, numFiles = 8)

    val bands = Layout.keyBands(spark, dir, "k")
      .orderBy("key_min")
      .select("key_min", "key_max", "n_rows")
      .as[(Long, Long, Long)].collect()
    assert(bands.length == 8)
    assert(bands.map(_._3).sum == 20000L)
    // bands are disjoint and ordered: each file's min exceeds the previous max
    bands.sliding(2).foreach { case Array((_, prevMax, _), (curMin, _, _)) =>
      assert(curMin > prevMax, s"overlapping bands: $prevMax vs $curMin")
    }
    // a point predicate on the sorted layout reads back exactly one row
    val hit = spark.read.parquet(dir).filter(col("k") === 12345L)
    assert(hit.count() == 1)
    val scan = hit.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(k,12345)"),
      "key predicate pushed to the parquet scan")
    } finally deleteRecursively(dirFile)
  }

  test("zorderBy interleaves bucket bits and never shuffles the fact side") {
    // 2-bit toy: x,y in [0,4) map to buckets == values; z is the classic
    // 4x4 Morton curve (x bit i -> position 2i, y bit i -> 2i+1)
    val df = (for { x <- 0 to 3; y <- 0 to 3 } yield (x, y.toDouble))
      .toDF("x", "y")
    val z = Layout.zorderBy(df, Seq("x", "y"), bits = 2)
      .select("x", "y", "zval").as[(Int, Double, Long)].collect()
      .map { case (x, y, v) => ((x, y.toInt), v) }.toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)))
        .reduce(_ | _).toLong
    for (x <- 0 to 3; y <- 0 to 3)
      assert(z((x, y)) === morton(x, y), s"($x,$y)")
    // neighbours in z differ in few high bits: the curve is locality-preserving
    assert(z((0, 0)) === 0L && z((3, 3)) === 15L)
  }

  test("zorderBy handles constant and null dimensions") {
    val df = Seq((1, Some(5.0)), (2, None), (3, Some(5.0)), (4, Some(9.0)))
      .toDF("k", "v").withColumn("c", lit(7))
    // constant column -> bucket 0 everywhere; null value -> null z (an
    // explicit guard: least() would otherwise swallow the null)
    val out = Layout.zorderBy(df, Seq("c", "v"), bits = 4)
      .select("k", "zval").as[(Int, Option[Long])].collect().toMap
    assert(out(2).isEmpty)
    assert(out(1).nonEmpty && out(1) === out(3))
    assert(out(4).nonEmpty && out(4) != out(1))
  }

  test("writeZOrdered gives every file a tight band on BOTH dimensions") {
    val dirFile = Files.createTempDirectory("graft-zorder").toFile
    val dir = dirFile.getAbsolutePath
    try {
      // 128x128 grid in random insertion order: single-key sorting would
      // give width-128 bands on one dim and width-128 (everything) on the
      // other; z-order must localize both
      val rnd = new scala.util.Random(7)
      val pts = rnd.shuffle((for { x <- 0 until 128; y <- 0 until 128 }
        yield (x, y)).toVector)
      Layout.writeZOrdered(pts.toDF("x", "y"), Seq("x", "y"), dir,
        numFiles = 16, bits = 7)
      val bx = Layout.keyBands(spark, dir, "x")
        .select("key_min", "key_max").as[(Int, Int)].collect()
      val by = Layout.keyBands(spark, dir, "y")
        .select("key_min", "key_max").as[(Int, Int)].collect()
      assert(bx.length === 16)
      // Range boundaries are SAMPLED, and a file straddling a top-level
      // Morton-quadrant crossing legitimately spans a full dimension — so
      // the honest claim is distributional: most files cover a small
      // hyper-rectangle. The anti-property being excluded: a single-key
      // sort gives the unsorted dimension a ~127 span in EVERY file
      // (mean ~127, zero files under 64).
      def spans(b: Array[(Int, Int)]) = b.map { case (mn, mx) => mx - mn }
      for (sp <- Seq(spans(bx), spans(by))) {
        assert(sp.sum / 16.0 <= 70.0, sp.toSeq)
        assert(sp.count(_ <= 64) >= 10, sp.toSeq)
      }
    } finally deleteRecursively(dirFile)
  }
}
