package graft

import graft.impute._
import graft.audit._
import graft.drift.Drift
import graft.dict.DataDictionary
import graft.quality.NotNull
import org.apache.spark.sql.functions._

class ImputerAuditSpec extends SparkSpec {
  import spark.implicits._

  test("impute mean/median/mode/constant") {
    val df = Seq(
      (Some(10.0), Some("a")), (Some(20.0), Some("a")),
      (None, Some("b")), (Some(30.0), None)
    ).toDF("v", "s")
    val mean = Imputer.impute(df, Map("v" -> Mean))
      .agg(sum("v")).collect()(0).getDouble(0)
    assert(mean == 80.0) // 10+20+30 + fill 20
    val mode = Imputer.impute(df, Map("s" -> Mode))
      .filter(col("s") === "a").count()
    assert(mode == 3)
    val const = Imputer.impute(df, Map("s" -> Constant("zz")))
      .filter(col("s") === "zz").count()
    assert(const == 1)
  }

  test("changelog reports fill values and null counts") {
    val df = Seq(Some(1.0), None, None, Some(3.0)).toDF("v")
    val r = Imputer.changelog(df, Map("v" -> Mean)).collect()(0)
    assert(r.getAs[String]("strategy") == "mean")
    assert(r.getAs[String]("fill_value") == "2.0")
    assert(r.getAs[Long]("nulls_filled") == 2)
  }

  test("finalAudit edits + null audit") {
    val df = Seq((1, Some("x")), (2, None)).toDF("id", "s")
    val (edited, log) = FinalAudit.applyEdits(df, FinalEditsConfig(
      dropColumns = Seq("nope"), renameColumns = Map("s" -> "label"),
      coerceTypes = Map("id" -> "string")))
    assert(edited.columns.toSeq == Seq("id", "label"))
    assert(edited.schema("id").dataType.simpleString == "string")
    assert(log.count() == 2) // drop skipped (missing), rename + coerce logged
    val audit = FinalAudit.nullAudit(edited, Seq("label")).collect()(0)
    assert(audit.getAs[Long]("null_count") == 1 && !audit.getAs[Boolean]("passed"))
  }

  test("health score weights and status bands") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val det = graft.outliers.Outliers.detect(df.withColumn("v", lit(1.0)),
      Map("v" -> graft.outliers.ZScore(3.0)))
    val r = HealthScore.compute(df, Seq("id"), Seq(NotNull("id")),
      Seq("id"), det.flagged).collect()(0)
    assert(r.getAs[Double]("overall_score") == 100.0)
    assert(r.getAs[String]("status") == "green")
  }

  test("drift detects schema and mean changes") {
    val base = Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
    val target = Seq((1, 100.0), (2, 200.0)).toDF("id", "v")
      .withColumn("extra", lit("x"))
    val schema = Drift.schemaDrift(base, target).collect()
    assert(schema.map(_.getString(0)).toSeq == Seq("added_column"))
    val num = Drift.numericDrift(base, target).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(num("v") == 9.0) // |150-15|/15
  }

  test("imputeBy fills per group; all-null groups and null keys keep nulls") {
    val df = Seq(
      (1L, Some("a"), Option(10.0)), (2L, Some("a"), None),
      (3L, Some("b"), Option(50.0)), (4L, Some("b"), Option(70.0)),
      (5L, Some("b"), None),
      (6L, Some("c"), Option.empty[Double]),   // all-null group
      (7L, Option.empty[String], None))        // null group key
      .toDF("id", "g", "v")
    val out = Imputer.imputeBy(df, "g", Map("v" -> Mean))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(out(1).contains(10.0)) // group a mean
    assert(out(4).contains(60.0)) // group b mean
    assert(out(5).isEmpty && out(6).isEmpty)
    // Mode per group ties on the smaller value
    val m = Imputer.imputeBy(
      Seq((1L, "a", Some("x")), (2L, "a", Some("y")), (3L, "a", None))
        .toDF("id", "g", "s"), "g", Map("s" -> Mode))
      .orderBy("id").collect()
    assert(m(2).getString(2) == "x")
  }

  test("data dictionary semantic types") {
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("user_id", "cat", "score")
    val m = DataDictionary.build(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("user_id") == "identifier")
    assert(m("cat") == "categorical") // distinct=2 <= max(5, 1)
    assert(m("score") == "numeric")
  }
}
