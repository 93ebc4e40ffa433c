package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // key, ts (long for easy arithmetic), id
  private val left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
    (2L, 10L, "d")).toDF("k", "ts", "id")
  private val right = Seq(
    (1L, 8L, 0.8), (1L, 10L, 1.0), (1L, 15L, 1.5),
    (3L, 1L, 9.9)).toDF("k", "rts", "v")

  test("backward picks greatest right ts <= left ts, inclusive") {
    val out = AsofJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out("a") == (Some(10L), Some(1.0))) // equal ts matches (inclusive)
    assert(out("b") == (Some(15L), Some(1.5)))
    assert(out("c") == (None, None))           // nothing at or before 5
    assert(out("d") == (None, None))           // key with no right rows
  }

  test("forward picks smallest right ts >= left ts, inclusive") {
    val out = AsofJoin.forward(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out("a") == (Some(10L), Some(1.0)))
    assert(out("b") == (None, None))           // nothing at or after 20
    assert(out("c") == (Some(8L), Some(0.8)))
  }

  test("tolerance nulls out matches farther than the bound") {
    val out = AsofJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"),
        tolerance = Some(lit(3L)))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("a") == Some(10L))  // gap 0 <= 3
    assert(out("b") == None)       // gap 5 > 3
  }

  test("suffix collision with an existing left column is rejected") {
    val l2 = left.withColumn("v_asof", lit(1))
    intercept[IllegalArgumentException] {
      AsofJoin.backward(l2, right, Seq("k"), "ts", "rts", Seq("v"))
    }
  }

  test("plan is a single window over the key shuffle — no join operator") {
    val plan = AsofJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
  }
}
