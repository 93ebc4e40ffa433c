package graft

import graft.ops.EventAnalytics
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

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

  test("history builds SCD2 intervals: changes open versions, repeats collapse") {
    val rows = Seq(
      // u1: A A B A  -> versions A[1,3) B[3,4) A[4,null)
      (1L, ts(1, 1), "A", 10L), (1L, ts(1, 2), "A", 11L),
      (1L, ts(1, 3), "B", 12L), (1L, ts(1, 4), "A", 13L),
      // u2: single observation -> one open interval
      (2L, ts(2, 1), "X", 20L),
      // u3: tie on ts broken by event_id (31 before 32) -> C then D
      (3L, ts(3, 1), "C", 31L), (3L, ts(3, 1), "D", 32L),
      // null state/entity/ts rows anchor nothing
      (4L, ts(4, 1), null, 40L), (0L, null, "Z", 41L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.history(rows, "user_id", "ts", "event_type",
        tieCol = "event_id")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.isNullAt(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1, "A", false, false), (1L, 2, "B", false, false),
      (1L, 3, "A", true, true),
      (2L, 1, "X", true, true),
      (3L, 1, "C", false, false), (3L, 2, "D", true, true)))
    // interval arithmetic: u1's B starts where A ends (half-open chain)
    val u1 = EventAnalytics.history(rows, "user_id", "ts", "event_type",
        tieCol = "event_id")
      .filter(col("user_id") === 1L).orderBy("version")
      .collect().map(r => (r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(u1(0)._2 == u1(1)._1 && u1(1)._2 == u1(2)._1 && u1(2)._2 == -1L)
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

  test("rollingAnomaly flags a planted spike, nulls degenerate frames") {
    // user 1: stable 10±1 series then a 100 spike; user 2: constant
    // (zero variance -> null z); user 3: single event (n=1 -> null z)
    val base = (1 to 10).map(i => (1L, ts(1, i), i.toLong,
      if (i % 2 == 0) 11.0 else 9.0))
    val rows = (base :+ (1L, ts(1, 11), 11L, 100.0)) ++
      Seq((2L, ts(1, 1), 20L, 5.0), (2L, ts(1, 2), 21L, 5.0),
        (3L, ts(1, 1), 30L, 7.0))
    val out = EventAnalytics.rollingAnomaly(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", orderTiebreak = "event_id",
        frame = 20, threshold = 3.0)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getBoolean(4))).toMap
    assert(out(11L)._2, "spike flagged")
    assert(out(11L)._1.get > 3.0)
    assert(base.forall { case (_, _, eid, _) => !out(eid)._2 },
      "stable prefix unflagged")
    assert(out(1L)._1.isEmpty, "first row of a series has no frame")
    assert(out(21L)._1.isEmpty && !out(21L)._2, "constant series -> null z")
    assert(out(30L)._1.isEmpty && !out(30L)._2, "singleton series -> null z")
  }

  test("seasonalProfile: hand-computed variance decomposition") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(hour: Int, day: Int) =
      new Timestamp((day * 24L + hour) * 3600L * 1000L)
    // Perfectly seasonal: hour 0 always 10, hour 12 always 20.
    //   gmean = 15; SS_total = 1000 - 4*225 = 100; SS_between = 100 → R² = 1
    val perfect = Seq(
      ("a", at(0, 0), 10.0), ("a", at(0, 1), 10.0),
      ("a", at(12, 0), 20.0), ("a", at(12, 1), 20.0))
    // Zero-variance group: R² undefined → null.
    val flat = Seq(("b", at(3, 0), 5.0), ("b", at(9, 0), 5.0))
    val df = (perfect ++ flat).toDF("grp", "ts", "value")
    val out = graft.ops.EventAnalytics.seasonalProfile(df, "ts", "value", Seq("grp"))
      .orderBy("grp", "hour_of_day").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((0L, 2L, 10.0), (12L, 2L, 20.0)))
    assert(a.forall(_.getDouble(4) == 1.0), "perfect seasonality must score R2 = 1")
    val b = out.filter(_.getString(0) == "b")
    assert(b.forall(_.isNullAt(4)), "zero total variance -> null R2")
  }

  test("seasonalProfile: anti-seasonal noise scores near zero") {
    import spark.implicits._
    import java.sql.Timestamp
    // The same value pattern in EVERY hour: the hour profile explains
    // nothing, R² ≈ 0 (exactly 0 up to the mean rounding).
    val rows = for (h <- 0 until 24; i <- 0 until 4)
      yield ("g", new Timestamp((h * 3600L + i * 60) * 1000L), (i * 5).toDouble)
    val out = graft.ops.EventAnalytics.seasonalProfile(
        rows.toDF("grp", "ts", "value"), "ts", "value", Seq("grp"))
      .collect()
    assert(out.length == 24)
    assert(out.forall(r => math.abs(r.getDouble(4)) < 0.01),
      s"uniform pattern must score ~0, got ${out.head.getDouble(4)}")
  }

  test("survival: hand-computed Kaplan-Meier curve with censoring") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(day: Int) = new Timestamp(1704067200000L + day * 86400000L)
    // horizon day 20 (user 9 active at 20). censorDays = 2 → censored
    // iff last day > 18. Lifetimes: u1 (0..5) t=5 churn; u2 (0..5) t=5
    // churn; u3 (2..12) t=10 churn; u9 (0..20) t=20 censored.
    // KM: t=5 n=4 d=2 → S=0.5; t=10 n=2 d=1 → 0.25; t=20 censored only.
    val rows = Seq(
      (1L, 0), (1L, 5), (2L, 0), (2L, 5), (3L, 2), (3L, 12),
      (9L, 0), (9L, 20))
      .map { case (u, d) => (u, ts(d)) }
      .toDF("user_id", "ts")
    val out = graft.ops.EventAnalytics.survival(rows, "user_id", "ts",
        censorDays = 2)
      .orderBy("t_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (5L, 4L, 2L, 0L, 0.5),
      (10L, 2L, 1L, 0L, 0.25),
      (20L, 1L, 0L, 1L, 0.25)))
    intercept[IllegalArgumentException] {
      graft.ops.EventAnalytics.survival(rows, "user_id", "ts", censorDays = -1)
    }
  }
}
