package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Pins for the CDC changelog apply ([[graft.ops.Cdc]]): latest-wins per
  * key, upsert/delete/pass-through semantics, and the refusal ladder. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "v", "x")

  test("latest change wins; I/U upsert, D deletes, untouched keys pass through") {
    val changes = Seq(
      // key 1: update then delete — the delete (higher seq) wins
      (1L, "a2", 11.0, 1L, "U"), (1L, "a3", 12.0, 2L, "D"),
      // key 2: delete then a re-insert at higher seq — the insert wins
      (2L, "b2", 21.0, 1L, "D"), (2L, "b3", 22.0, 2L, "I"),
      // key 3: plain update
      (3L, "c2", 33.0, 1L, "U"),
      // key 5: fresh insert
      (5L, "e", 50.0, 1L, "I")
    ).toDF("k", "v", "x", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (2L, "b3", 22.0),   // re-inserted payload
      (3L, "c2", 33.0),   // updated payload
      (4L, "d", 40.0),    // untouched
      (5L, "e", 50.0)))   // fresh insert; key 1 deleted
  }

  test("an empty changelog is the identity") {
    val none = Seq.empty[(Long, String, Double, Long, String)]
      .toDF("k", "v", "x", "seq", "op")
    val out = Cdc.applyChanges(base, none, Seq("k"), "seq", "op")
    assert(out.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
  }

  test("refusals: unknown op, duplicate (key, seq), missing columns") {
    val badOp = Seq((1L, "a", 1.0, 1L, "X")).toDF("k", "v", "x", "seq", "op")
    assert(intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, badOp, Seq("k"), "seq", "op")
    }.getMessage.contains("op"))
    val dup = Seq((1L, "a", 1.0, 1L, "U"), (1L, "b", 2.0, 1L, "D"))
      .toDF("k", "v", "x", "seq", "op")
    assert(intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, dup, Seq("k"), "seq", "op")
    }.getMessage.contains("no defined winner"))
    val narrow = Seq((1L, 1L, "U")).toDF("k", "seq", "op")
    assert(intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, narrow, Seq("k"), "seq", "op")
    }.getMessage.contains("missing columns"))
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, badOp, Seq.empty, "seq", "op")
    }
  }
}
