package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.1 row 36: sources/sinks — the reference's load_data.py (CSV
  * ingest) and export/checkpoint utilities map to plain spark.read/write;
  * this spec exercises the round-trips the engine relies on. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv round-trip with header + schema inference") {
    val dir = tmp("graft-csv")
    val df = Seq((1, "a", 1.5), (2, "b,с", 2.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.schema("id").dataType.simpleString == "int")
    assert(back.filter(col("s") === "b,с").count() == 1) // quoting survived
  }

  test("json lines round-trip preserves nested structs") {
    val dir = tmp("graft-json")
    val df = Seq((1, ("x", 10)), (2, ("y", 20))).toDF("id", "meta")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.select(col("meta._2")).as[Long].collect().sorted.toSeq == Seq(10L, 20L))
  }

  test("parquet snapshot checkpoint (reference joblib-checkpoint analog)") {
    val dir = tmp("graft-ckpt")
    val df = Tables.customer(spark, sfDir)
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
  }

  test("partitioned write prunes partitions on read") {
    val dir = tmp("graft-part")
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("status") === "F")
    // partition pruning: only the F directory is listed in the scan
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(!scan.contains("status=O") || scan.contains("PartitionFilters"))
  }
}
