package graft

import graft.ops.EventAnalytics
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  test("funnel requires strict step ordering per user") {
    // u1 completes view→click→purchase in order; u2 clicks BEFORE viewing
    // (no funnel click); u3 only views.
    val rows = Seq(
      (1L, ts(1, 1), "view"), (1L, ts(1, 2), "click"), (1L, ts(1, 3), "purchase"),
      (2L, ts(1, 1), "click"), (2L, ts(1, 2), "view"),
      (3L, ts(1, 5), "view"),
      (4L, ts(2, 1), "view"), (4L, ts(2, 2), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(out.map(r => r.getString(1) -> r.getLong(2)).toSeq ==
      Seq("view" -> 4L, "click" -> 2L, "purchase" -> 1L))
    assert(out(1).getAs[Double]("pct_of_first") == 0.5)
    assert(out(2).getAs[Double]("pct_of_first") == 0.25)
  }

  test("funnel step time must be strictly after the previous step's time") {
    val t = ts(1, 1)
    val rows = Seq((1L, t, "view"), (1L, t, "click")) // same instant: no conversion
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      Seq("view", "click")).collect()
    assert(out(1).getLong(2) == 0L)
  }

  test("retention counts distinct users per cohort day offset") {
    val rows = Seq(
      (1L, ts(1, 1)), (1L, ts(1, 9)), (1L, ts(3, 1)), // cohort d0, back on d2
      (2L, ts(1, 2)), // cohort d0, never returns
      (3L, ts(3, 1)) // cohort d2
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retention(rows, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getAs[Double]("retention_pct"))).toMap
    val d0 = out.keys.map(_._1).min
    assert(out((d0, 0L)) == (2L, 1.0))      // users 1,2 on their day 0
    assert(out((d0, 2L)) == (1L, 0.5))      // user 1 returns two days later
    assert(out((d0 + 2, 0L))._1 == 1L)      // user 3's own cohort
  }
}
