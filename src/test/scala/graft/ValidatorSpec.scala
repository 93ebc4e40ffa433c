package graft

import graft.quality._

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some(10.0), "F"),
    (2, Some(500.0), "O"),   // out of range
    (3, None, "P"),          // null value + bad category
    (3, Some(20.0), "F")     // duplicate key
  ).toDF("id", "amount", "status")

  test("summary counts violations per rule") {
    val rules = Seq(
      NotNull("amount"),
      InRange("amount", 0, 100),
      InSet("status", Seq("F", "O")),
      ExpectedType("id", "int"),
      ExpectedColumns(Seq("id", "amount", "status")),
      UniqueKey(Seq("id")))
    val m = Validator.summary(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(m(("not_null", "amount")) == (1L, false))
    assert(m(("numeric_range", "amount")) == (1L, false))
    assert(m(("categorical_values", "status")) == (1L, false))
    assert(m(("dtype_enforcement", "id")) == (0L, true))
    assert(m(("schema_conformity", "*")) == (0L, true))
    assert(m(("unique_key", "id")) == (2L, false))
  }

  test("schema rules catch mismatches without scanning") {
    val m = Validator.summary(df, Seq(
      ExpectedType("id", "string"),
      ExpectedColumns(Seq("id", "missing_col")))).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!m("dtype_enforcement"))
    assert(!m("schema_conformity"))
  }

  test("rowCoverage computes failing-row share once per row") {
    val r = Validator.rowCoverage(df,
      Seq(NotNull("amount"), InRange("amount", 0, 100))).collect()(0)
    assert(r.getAs[Long]("total_rows") == 4)
    assert(r.getAs[Long]("failing_rows") == 2)
    assert(r.getAs[Double]("coverage_pct") == 50.0)
  }

  test("violations tags each failing row with its failed rules") {
    val rows = Validator.violations(df,
      Seq(InRange("amount", 0, 100), InSet("status", Seq("F", "O"))))
      .select("id", "failed_rules").collect()
    val byId = rows.map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(byId(2) == Seq("numeric_range:amount"))
    assert(byId(3) == Seq("categorical_values:status"))
  }

  test("invalidValueSummary groups bad values") {
    val rows = Validator.invalidValueSummary(df, InSet("status", Seq("F")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("O", 1L), ("P", 1L)))
  }
}
