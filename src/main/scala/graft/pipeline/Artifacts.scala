package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Run-artifact bundle writer — the Spark-native counterpart of the
  * reference's `m00_utils/export_utils.py` (export_dataframes /
  * export_validation_results: every exported artifact is keyed by a
  * `run_id` for traceability, export_utils.py:24-66,134-140).
  *
  * Layout under `<outDir>/<runId>/`:
  * {{{
  *   cleaned/                 — the pipeline's output frame (parquet)
  *   reports/<stage_name>/    — each Pipeline.Result report (parquet)
  *   manifest/                — (artifact, kind, path) parquet index
  * }}}
  *
  * Everything is `spark.write.parquet` — distributed, partitioned,
  * re-readable at 100 TB — not a driver-side CSV dump; the manifest is the
  * only driver-materialized piece and is O(#reports) rows. Report names
  * like `0:normalize` become directory-safe (`0_normalize`).
  */
object Artifacts {

  final case class Entry(artifact: String, kind: String, path: String)

  private[pipeline] def safe(name: String): String =
    name.replaceAll("[^A-Za-z0-9_.-]", "_")

  def bundleDir(outDir: String, runId: String): String = s"$outDir/${safe(runId)}"

  /** Write cleaned frame + all reports + manifest; returns the manifest
    * entries. Overwrites any previous bundle for the same runId (re-runs
    * replace, matching the reference's per-run_id export paths). */
  def write(spark: SparkSession, result: Pipeline.Result,
            outDir: String, runId: String): Seq[Entry] = {
    val base = bundleDir(outDir, runId)
    val cleanedPath = s"$base/cleaned"
    result.df.write.mode(SaveMode.Overwrite).parquet(cleanedPath)
    val reportEntries = result.reports.toSeq.sortBy(_._1).map { case (name, df) =>
      val p = s"$base/reports/${safe(name)}"
      df.write.mode(SaveMode.Overwrite).parquet(p)
      Entry(name, "report", p)
    }
    val entries = Entry("cleaned", "data", cleanedPath) +: reportEntries
    import spark.implicits._
    entries.toDF().write.mode(SaveMode.Overwrite).parquet(s"$base/manifest")
    entries
  }

  def readManifest(spark: SparkSession, outDir: String, runId: String): DataFrame =
    spark.read.parquet(s"${bundleDir(outDir, runId)}/manifest")

  def readCleaned(spark: SparkSession, outDir: String, runId: String): DataFrame =
    spark.read.parquet(s"${bundleDir(outDir, runId)}/cleaned")

  /** Read one report back by its original name (e.g. "0:normalize"). */
  def readReport(spark: SparkSession, outDir: String, runId: String,
                 name: String): DataFrame = {
    val m = readManifest(spark, outDir, runId)
      .filter(col("artifact") === name).select("path").collect()
    require(m.nonEmpty, s"no artifact '$name' in bundle $runId under $outDir")
    spark.read.parquet(m.head.getString(0))
  }
}
