package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB story: a table written bucketed on
  * its join/aggregation key is already hash-partitioned on disk, so
  * groupBy and equi-joins on that key plan WITHOUT an Exchange — the
  * technique that turns the repeated fact-table shuffle into a one-time
  * write-side cost. Asserted against the physical plan. */
class BucketingSpec extends SparkSpec {

  private def bucketedOrders() = {
    if (!spark.catalog.tableExists("graft_bucketed_orders")) {
      Tables.orders(spark, sfDir).write
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .format("parquet").saveAsTable("graft_bucketed_orders")
    }
    spark.table("graft_bucketed_orders")
  }

  test("groupBy and self-join on the bucket key plan without a shuffle") {
    val t = bucketedOrders()

    val agg = t.groupBy("o_custkey").agg(sum("o_totalprice").as("total"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), s"agg shuffled:\n$aggPlan")
    assert(agg.count() > 0)

    val joined = t.as("a").join(t.as("b"), "o_custkey")
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange hashpartitioning"),
      s"join shuffled:\n$joinPlan")
    assert(joined.count() > 0)
  }

  test("non-bucket-key aggregation still shuffles (sanity: the pin is real)") {
    val t = bucketedOrders()
    val agg = t.groupBy("o_orderpriority").agg(count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
