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
}
