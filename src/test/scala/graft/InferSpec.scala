package graft

import graft.infer.ConfigInference
import graft.impute.{Median, Mode}

class InferSpec extends SparkSpec {
  import spark.implicits._

  test("inference rules: imputation, outlier specs, whitelists, types") {
    val df = Seq(
      (1L, Some(10.0), Some("a"), "free text one"),
      (2L, None, Some("b"), "free text two"),
      (3L, Some(30.0), None, "free text three")
    ).toDF("row_id", "amount", "cat", "blob")
    val cfg = ConfigInference.infer(df, catThreshold = 2)
    assert(cfg.imputation == Map("amount" -> Median, "cat" -> Mode))
    assert(cfg.outlierSpecs.keySet == Set("amount")) // row_id is key-like
    assert(cfg.categoricalWhitelists == Map("cat" -> Seq("a", "b")))
    assert(cfg.expectedTypes("blob") == "string")
  }

  test("suggestions frame is deterministic and ordered") {
    val df = Seq((1, Some("x")), (2, None)).toDF("id", "s")
    val rows = ConfigInference.suggestions(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.contains(("imputation", "s", "mode")))
    assert(rows.sorted.toSeq == rows.toSeq)
  }
}
