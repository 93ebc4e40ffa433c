package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 19L, "p19"), (1L, 20L, "p20"),
    (2L, 10L, "q10")).toDF("k", "t", "pid")
  private val intervals = Seq(
    (1L, 10L, 20L, "A"),   // [10, 20) — p10, p19 in; p20 out (end-exclusive)
    (1L, 0L, 6L, "B"),     // [0, 6) — p5
    (2L, 50L, 60L, "C"),   // no points
    (1L, 7L, 7L, "E")      // empty interval, dropped
  ).toDF("k", "s", "e", "iid")

  test("intervalJoin matches start-inclusive end-exclusive, once per pair") {
    val out = RangeJoin.intervalJoin(points, "t", intervals, "s", "e",
        Seq("k"), bucketWidth = 4)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("p10", "A"), ("p19", "A"), ("p5", "B")))
  }

  test("wide bucket width still finds every match") {
    val out = RangeJoin.intervalJoin(points, "t", intervals, "s", "e",
        Seq("k"), bucketWidth = 1000)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("p10", "A"), ("p19", "A"), ("p5", "B")))
  }

  test("an interval spanning too many buckets raises instead of exploding") {
    val wide = Seq((1L, 0L, 100000L, "W")).toDF("k", "s", "e", "iid")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(points, "t", wide, "s", "e", Seq("k"),
        bucketWidth = 2, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null)
  }
}
