package graft

import graft.impute.Median
import graft.pipeline._
import java.nio.file.Files

class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  test("bundle round-trips cleaned frame, reports, and manifest") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", None), (3L, "b", Some(30.0))
    ).toDF("id", "grp", "price")
    val result = Pipeline.run(df, Seq(ImputeStage(Map("price" -> Median))))
    val out = Files.createTempDirectory("graft-artifacts").toString

    val entries = Artifacts.write(spark, result, out, "run-42")
    assert(entries.map(_.artifact).contains("cleaned"))
    assert(entries.exists(e => e.artifact == "0:impute" && e.kind == "report"))

    val cleaned = Artifacts.readCleaned(spark, out, "run-42")
      .orderBy("id").collect()
    assert(cleaned.length == 3)
    assert(cleaned.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 30.0))

    val report = Artifacts.readReport(spark, out, "run-42", "0:impute")
    assert(report.count() > 0)

    val manifest = Artifacts.readManifest(spark, out, "run-42").collect()
    assert(manifest.length == entries.length)

    // re-run overwrites, not duplicates
    Artifacts.write(spark, result, out, "run-42")
    assert(Artifacts.readManifest(spark, out, "run-42").count() == entries.length)

    intercept[IllegalArgumentException] {
      Artifacts.readReport(spark, out, "run-42", "nope")
    }
  }
}
