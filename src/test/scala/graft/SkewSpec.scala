package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
    (4L, "cold", 5.0)
  ).toDF("id", "k", "v")

  test("saltedJoin matches plain join results") {
    val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", factor = 4, Seq(col("id")))
      .select("id", "label").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val plain = fact.join(dim, "k").select("id", "label").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedSum equals direct aggregation") {
    val out = Skew.saltedSum(fact, Seq("k"), "v", factor = 8, Seq(col("id")))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq(("cold", 5.0, 1L), ("hot", 60.0, 3L)))
  }

  test("salt is deterministic across evaluations") {
    val a = fact.select(Skew.saltColumn(16, Seq(col("id")))).collect().map(_.getInt(0))
    val b = fact.select(Skew.saltColumn(16, Seq(col("id")))).collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.distinct.length > 1) // actually spreads
  }

  test("heavyHitters surfaces the hot key with its row share") {
    val rows = (1L to 900L).map(i => ("cold" + (i % 90), i)) ++
      (1L to 100L).map(i => ("hot", i))
    val df = rows.toDF("k", "v")
    val out = graft.ops.Skew.heavyHitters(df, "k", k = 3)
      .orderBy(col("cnt").desc, col("k")).collect()
    assert(out(0).getString(0) == "hot" && out(0).getLong(1) == 100L)
    assert(out(0).getDouble(2) == 0.1) // 100 of 1000 rows
    assert(out.length == 3)
  }
}
