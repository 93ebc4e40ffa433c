package graft

import org.apache.spark.sql.SparkSession

// Dev-only scratch main for plan audits; not part of the contract.
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries
    args.foreach { name =>
      System.err.println(s"===== $name =====")
      System.err.println(q(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
