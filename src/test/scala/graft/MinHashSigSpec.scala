package graft

import graft.dedup.MinHash
import org.apache.spark.sql.functions._

/** Pins the codegen'd MinHashSig kernel lane-exactly to the relational
  * formulation (explode → K min(xxhash64(h, i)) aggregates) that
  * MinHash.signatures ships. The kernel backs the per-row column helper
  * (MinHash.signature — the streaming/one-off shape, where no aggregation
  * is available); the equivalence is what lets a per-row signature probe a
  * stored index the relational path built, and vice versa. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  /** MinHash.signatures' relational formulation, verbatim. */
  private def relationalSignatures(df: org.apache.spark.sql.DataFrame,
                                   textCol: String, idCol: String,
                                   n: Int, k: Int) = {
    val hashed = df
      .select(col(idCol).as("_gf_id"), explode(MinHash.shingles(col(textCol), n)).as("_gf_s"))
      .select(col("_gf_id"), xxhash64(col("_gf_s")).as("_gf_hh"))
    hashed.groupBy("_gf_id")
      .agg(min(xxhash64(col("_gf_hh"), lit(0))).as("_gf_m0"),
        (1 until k).map(i => min(xxhash64(col("_gf_hh"), lit(i))).as(s"_gf_m$i")): _*)
      .select(col("_gf_id"),
        array((0 until k).map(i => col(s"_gf_m$i")): _*).as("_gf_sig"))
  }

  private def collectSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  private def kernelSignatures(df: org.apache.spark.sql.DataFrame,
                               textCol: String, idCol: String,
                               n: Int, k: Int) =
    df.select(col(idCol).as("_gf_id"),
        MinHash.signature(MinHash.shingles(col(textCol), n), k).as("_gf_sig"))
      .filter(col("_gf_sig").isNotNull)

  test("kernel signatures are lane-exact vs the relational formulation on real docs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").limit(100)
    for (k <- Seq(16, 64); n <- Seq(3, 5)) {
      val kernel = collectSigs(kernelSignatures(docs, "text", "doc_id", n, k))
      val relational = collectSigs(relationalSignatures(docs, "text", "doc_id", n, k))
      assert(kernel.keySet == relational.keySet, s"row set drifted at n=$n k=$k")
      kernel.foreach { case (id, sig) =>
        assert(sig == relational(id), s"doc $id signature drifted at n=$n k=$k")
      }
    }
  }

  test("kernel matches the column helper and handles null/empty/short docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "x"), // shorter than n: single whole-doc shingle
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val sigs = collectSigs(kernelSignatures(docs, "text", "doc_id", n = 3, k = 8))
    val rel = collectSigs(relationalSignatures(docs, "text", "doc_id", n = 3, k = 8))
    assert(sigs == rel) // includes the row SET: null-text doc absent in both
    assert(!sigs.contains(3L), "null-text doc must emit no signature row")
    // and MinHash.signatures (the frame API) agrees with both
    assert(collectSigs(MinHash.signatures(docs, "text", "doc_id", 3, 8)) == sigs)
  }

  test("per-row kernel path is a pure projection: no explode, no aggregate, no shuffle") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val plan = kernelSignatures(docs, "text", "doc_id", n = 3, k = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"explode in the per-row path:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregate in the per-row path:\n$plan")
    // the Tables.load scan-parallelism fix-up (r14) is a RoundRobin
    // exchange above the scan; the pin still forbids ROW-LEVEL shuffles
    // (hash/range), which is the failure class it exists for
    val rowExchanges = plan.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("RoundRobinPartitioning")).toSeq
    assert(rowExchanges.isEmpty,
      s"shuffle in the per-row path:\n${rowExchanges.mkString("\n")}")
  }
}
