package graft

import org.apache.spark.sql.SparkSession

// Dev-only helper: per-query wall time with live output (System.err flushes
// through sbt immediately), so slow queries are identifiable mid-run.
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.headOption.filterNot(_.startsWith("after:"))
    val after = args.headOption.filter(_.startsWith("after:")).map(_.drop(6))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val regs0 = SparkEntry.registry
    val regs = after match {
      case Some(a) => regs0.drop(regs0.indexWhere(_.name == a) + 1)
      case None => regs0.filter(q => only.forall(_ == q.name))
    }
    regs.foreach { q =>
      val t0 = System.nanoTime()
      try {
        val n = q.run(spark, sfDir).count()
        System.err.println(f"TIME ${q.name}%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      } catch { case e: Throwable =>
        System.err.println(s"TIME ${q.name} FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
