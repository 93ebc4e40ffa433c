package graft

import graft.ops.Binning
import org.apache.spark.sql.functions._

class BinningSpec extends SparkSpec {
  import spark.implicits._

  test("exact qcut: near-equal buckets, monotone in the value") {
    val df = (1 to 103).map(i => (i.toLong, i * 3.0 % 97)).toDF("id", "v")
    val binned = Binning.equalFrequency(df, "v", q = 4, tiebreak = Seq("id"))
    val sizes = binned.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1) // ntile guarantee
    // bucket id is monotone in the value
    val maxB1 = binned.filter($"bin" === 1).agg(max("v")).collect()(0).getDouble(0)
    val minB4 = binned.filter($"bin" === 4).agg(min("v")).collect()(0).getDouble(0)
    assert(maxB1 <= minB4)
  }

  test("approx qcut agrees with exact on bucket placement away from edges") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val exact = Binning.equalFrequency(df, "v", 4, Seq("id"), exact = true)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val approx = Binning.equalFrequency(df, "v", 4, exact = false)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val disagree = exact.count { case (id, b) => approx(id) != b }
    assert(disagree <= 10, s"only edge rows may differ, got $disagree")
    assert(approx.values.toSet == Set(1, 2, 3, 4))
  }

  test("approxEdges emits q-1 interior edges; summary reports per-bucket stats") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    assert(Binning.approxEdges(df, "v", 5).count() == 4)
    val s = Binning.summary(
      Binning.equalFrequency(df.withColumn("id", col("v")), "v", 5, Seq("id")), "v")
      .collect()
    assert(s.length == 5 && s.map(_.getAs[Long]("n")).sum == 100)
  }
}
