package graft

import graft.sim.Ivf
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated direction clusters in R^8, 10 vectors each. */
  private def clustered = (0 until 30).map { i =>
    val c = i / 10 // cluster
    val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0f else 0.1f)
    val jitter = Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat * 0.05f)
    (i.toLong, base.zip(jitter).map { case (a, b) => a + b })
  }

  test("train partitions well-separated clusters and topK finds self first") {
    val df = clustered.toDF("vec_id", "embedding")
    val index = Ivf.train(df, "vec_id", "embedding", k = 3, iters = 2)
    assert(index.centroids.size == 3)
    // every cluster of 10 lands in one cell
    val cells = index.indexed.groupBy("_gf_cid").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(cells == Seq(10L, 10L, 10L))

    val top = Ivf.topK(index, df.filter(col("vec_id") === 7L),
      "vec_id", "embedding", k = 3, nprobe = 1)
      .orderBy("rank").collect()
    assert(top.head.getAs[Long]("neighbor_id") == 7L)
    assert(top.head.getAs[Double]("cosine") == 1.0)
    // nprobe=1: all results from the query's own cluster (ids 0-9)
    assert(top.forall(_.getAs[Long]("neighbor_id") < 10L))
  }

  test("nprobe widens recall beyond the first cluster") {
    val df = clustered.toDF("vec_id", "embedding")
    val index = Ivf.train(df, "vec_id", "embedding", k = 3, iters = 2)
    val narrow = Ivf.topK(index, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 30, nprobe = 1).count()
    val wide = Ivf.topK(index, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 30, nprobe = 3).count()
    assert(narrow == 10 && wide == 30)
  }

  test("empty clusters keep their previous centroid (no crash)") {
    // k larger than distinct directions: some cells stay empty
    val df = clustered.take(10).toDF("vec_id", "embedding")
    val index = Ivf.train(df, "vec_id", "embedding", k = 6, iters = 2)
    assert(index.centroids.size == 6)
    assert(index.indexed.count() == 10)
  }
}
