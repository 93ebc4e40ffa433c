package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Greedy k-center (MaxMin / farthest-point traversal, Gonzalez 1985 —
  * public) diversity sampling over an embedding column: pick the vector
  * farthest from the origin, then repeatedly the vector maximizing its
  * distance to the closest already-selected center — the classic
  * 2-approximation to the k-center cover, and the standard "diverse
  * subset" selector in data-curation stacks (coreset seeding, eval-set
  * picking, dedup-aware sampling).
  *
  * Scale shape: k driver-coordinated rounds (the BPE-merge/PCA
  * bounded-driver-step discipline), each ONE map-side-combined argmax
  * aggregate over the corpus — no shuffle of rows, no window, nothing
  * corpus-sized ever leaves the executors. Selected vectors ride into
  * the next round as broadcast literals feeding the codegen'd
  * [[graft.functions.VecL2Sq]] kernel. Distances are recomputed against
  * all t selected centers each round (O(k²·d) kernel work per row in
  * total) — stateless, no cache/checkpoint lifecycle; past k ≈ 50,
  * maintain the running min as a cached column instead (least(old, new),
  * O(k·d)) at the price of a per-round persist.
  *
  * Determinism/oracle parity: every distance is a sequential
  * index-order fold on identical operands (float widened to double per
  * element — exactly DuckDB's list arithmetic), ties break on min id,
  * and the emitted frame is INTEGERS ONLY (round, id) — no float ever
  * crosses the comparison boundary.
  */
object KCenter {

  /** The (round, id) selection, round 1..k in pick order. Vectors with
    * null/empty values or null elements carry no geometry and are
    * skipped. Fails loudly if the corpus exhausts before k picks. */
  def select(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val v = col(vecCol)
    val clean = df
      .filter(v.isNotNull && size(v) > 0 && !exists(v, x => x.isNull))
      // explicit long cast: the argmax reads the id back with getLong, and
      // an int id column would otherwise die in the row accessor instead
      // of resolving here
      .select(col(idCol).cast("long").as("_gf_id"), v.as("_gf_v"))

    // Seed = farthest from the origin (min-id tie-break): norm² via the
    // same index-order fold the per-round kernel uses.
    val norm2 = aggregate(transform(col("_gf_v"), x => x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x * x)

    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var centers = Vector.empty[Seq[Double]]
    var t = 0
    while (t < k) {
      val dist =
        if (centers.isEmpty) norm2
        else {
          val ds = centers.map(c =>
            graft.functions.GraftFunctions.vecL2Sq(col("_gf_v"),
              typedlit(c.toArray)))
          // exclude already-selected ids so re-picks are impossible even
          // when duplicate vectors make the max distance 0
          if (ds.size == 1) ds.head else least(ds: _*)
        }
      val picked = picks.map(_._2).toSet
      val candidates =
        if (picked.isEmpty) clean else clean.filter(!col("_gf_id").isInCollection(picked))
      val row = candidates
        .select(struct(col("_gf_id"), col("_gf_v")).as("_gf_s"),
          struct(dist.as("_gf_d"), (-col("_gf_id")).as("_gf_nid")).as("_gf_o"))
        .agg(max_by(col("_gf_s"), col("_gf_o")).as("_gf_w"))
        .collect()(0)
      if (row.isNullAt(0))
        throw new IllegalArgumentException(
          s"kCenter: corpus exhausted after ${picks.size} picks — asked for " +
            s"$k centers but only ${picks.size} usable vectors exist")
      val s = row.getStruct(0)
      val id = s.getLong(0)
      val vec = s.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue())
      picks += ((t + 1, id))
      centers = centers :+ vec
      t += 1
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "vec_id")
  }
}
