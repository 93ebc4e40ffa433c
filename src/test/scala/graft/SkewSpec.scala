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

  test("capPerGroup preThin splits the dominant group yet keeps the exact winner set") {
    // 90%-one-group skew fixture: "hot" dominates with 450 of 500 rows
    val rows = (1L to 450L).map(i => (i, "hot")) ++
      (451L to 500L).map(i => (i, s"cold${i % 5}"))
    val df = rows.toDF("doc_id", "source")
    def keySet(d: org.apache.spark.sql.DataFrame) = d.select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val direct = graft.ops.Quota.capPerGroup(df, "source", "doc_id", n = 7)
    val thinned = graft.ops.Quota.capPerGroup(df, "source", "doc_id", n = 7,
      preThin = true, preThinBuckets = 8)
    // pigeonhole exactness: phase 1 never discards a global winner
    assert(keySet(thinned) === keySet(direct))

    // plan pin: the pre-thin pass adds its own (group, salt) exchange —
    // the dominant group fans out over preThinBuckets reducers before the
    // final per-group window sees the <= buckets*n survivors
    val p = thinned.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 2, s"expected pre-thin + final exchange:\n$p")
    assert(exchanges.exists(l => l.contains("_w")),
      s"pre-thin exchange should carry the projected salt column:\n$p")
  }

  test("capPerGroupAuto routes skew to pre-thin and uniform data to the direct plan") {
    def exchanges(d: org.apache.spark.sql.DataFrame): Int = d.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    def keySet(d: org.apache.spark.sql.DataFrame) = d.select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // the 90%-one-group fixture: auto must pick the pre-thin plan WITHOUT
    // the caller passing preThin, and the winner set must stay exact
    val hot = ((1L to 450L).map(i => (i, "hot")) ++
      (451L to 500L).map(i => (i, s"cold${i % 5}"))).toDF("doc_id", "source")
    val auto = graft.ops.Quota.capPerGroupAuto(hot, "source", "doc_id",
      n = 7, preThinBuckets = 8)
    assert(exchanges(auto) == 2,
      "skewed fixture must take the two-exchange pre-thin plan unprompted")
    assert(keySet(auto) ===
      keySet(graft.ops.Quota.capPerGroup(hot, "source", "doc_id", n = 7)))

    // a uniform fixture must NOT pay the extra pass
    val uniform = (1L to 500L).map(i => (i, s"g${i % 10}")).toDF("doc_id", "source")
    val autoU = graft.ops.Quota.capPerGroupAuto(uniform, "source", "doc_id",
      n = 7, preThinBuckets = 8)
    assert(exchanges(autoU) == 1,
      "uniform fixture must keep the single-window direct plan")
    assert(keySet(autoU) ===
      keySet(graft.ops.Quota.capPerGroup(uniform, "source", "doc_id", n = 7)))
  }
}
