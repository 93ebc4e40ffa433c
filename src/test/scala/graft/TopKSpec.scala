package graft

import org.apache.spark.sql.functions._

import graft.ops.TopK

/** Pins for the bounded top-k-per-group Aggregator (SURVEY §2 row 144):
  * window-form equivalence on the real corpus, tie/short-group/null
  * semantics on hand fixtures, and the buffer-merge path under forced
  * multi-partition input. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window form exactly on the events corpus") {
    val e = Tables.events(spark, sfDir)
    val agg = TopK.perGroup(e, Seq("event_type"), "value", "event_id", k = 5)
      .orderBy("event_type", "rank").collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val win = e.filter(col("value").isNotNull && col("event_id").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("rank"),
        col("event_id").as("id"), col("value").as("score"))
      .orderBy("event_type", "rank").collect().map(_.toString).toSeq
    assert(agg == win)
  }

  test("ties break on min id; short groups emit what they have; nulls drop") {
    val df = Seq(
      ("a", 9.0, 7L), ("a", 9.0, 3L), ("a", 1.0, 1L),
      ("b", 5.0, 2L),
      ("c", 4.0, 4L)).toDF("g", "v", "id")
      .unionByName(Seq(("c", Option.empty[Double], Option(9L)),
        ("c", Option(8.0), Option.empty[Long])).toDF("g", "v", "id"))
    val out = TopK.perGroup(df, Seq("g"), "v", "id", k = 2)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 1, 3L), ("a", 2, 7L), ("b", 1, 2L), ("c", 1, 4L)))
  }

  test("buffer merge across many partitions keeps exact global order") {
    // 1000 rows of one group spread over 8 partitions: each partition's
    // partial buffer is k-sized, and the merged result must equal the
    // global truth
    val rows = (1L to 1000L).map(i => ("g", ((i * 7919) % 997).toDouble, i))
    val df = rows.toDF("g", "v", "id").repartition(8)
    val out = TopK.perGroup(df, Seq("g"), "v", "id", k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
    val truth = rows.sortBy { case (_, v, id) => (-v, id) }.take(10)
      .map { case (_, v, id) => (id, v) }
    assert(out == truth)
  }

  test("misuse refused: k < 1, no group columns") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "v", "id")
    assertThrows[IllegalArgumentException](TopK.perGroup(df, Seq("g"), "v", "id", 0))
    assertThrows[IllegalArgumentException](TopK.perGroup(df, Seq.empty, "v", "id", 1))
  }
}
