package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-group embedding centroids + per-dimension variance — the
  * prototype-vector analytics behind class balance and feature-collapse
  * audits: a centroid is the group's mean vector (the "class prototype");
  * a dimension whose variance collapses toward 0 carries no signal for
  * that group (dead feature), and two groups with near-identical
  * centroids are candidates for merging in a mixture plan.
  *
  * Output is MELTED — one row per (group, dimension) — so the result is
  * groups × dim rows regardless of corpus size, and the oracle can check
  * every component without array-equality semantics.
  *
  * Scale shape: `posexplode` multiplies rows by `dim`, but each carries
  * one float, and the keyed aggregate collapses map-side — only
  * groups × dim partial rows ever shuffle. Both moments accumulate in one
  * pass as exact decimals of portably-rounded doubles (the
  * [[graft.queries.Q]] float-parity discipline: `dround` is
  * floor(x·10ⁿ+0.5)/10ⁿ — single IEEE ops both engines execute
  * identically — and decimal addition is order-independent, so results
  * are bit-identical across engines AND partitionings). Null vectors are
  * skipped by `posexplode` (null group keys aggregate like any key). */
object EmbeddingStats {

  /** (groupCol, pos, n, centroid, variance): n vectors contributed,
    * centroid = mean of the 6-dp-rounded components, variance = the
    * population variance E[x²]−E[x]² of the raw components (clamped at
    * 0 against rounding), both 6-dp-rounded. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val xd = col("_gf_x").cast(DoubleType)
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "_gf_x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(graft.Num.dround(xd, 6).cast(DecimalType(38, 6)))
          .cast(DoubleType).as("_gf_s1"),
        sum(graft.Num.dround(xd * xd, 8).cast(DecimalType(38, 8)))
          .cast(DoubleType).as("_gf_s2"))
      .select(
        col(groupCol), col("pos"), col("n"),
        graft.Num.dround(col("_gf_s1") / col("n"), 6).as("centroid"),
        graft.Num.dround(
          greatest(lit(0.0),
            col("_gf_s2") / col("n")
              - (col("_gf_s1") / col("n")) * (col("_gf_s1") / col("n"))), 6)
          .as("variance"))
  }

  /** Per-vector squared L2 distance to its OWN group's centroid — the
    * embedding-space outlier audit (a vector far from its class
    * prototype is a mislabeled/noise candidate; the pruning threshold is
    * a downstream filter on `dist_sq`, like every other audit here).
    *
    * Scale shape: the centroid frame is groups × dim rows (dimension-
    * sized) and broadcasts into the exploded vector stream, so the only
    * corpus-side exchange is the id-keyed partial-aggregated distance
    * sum. Per-dimension terms go through the dround/decimal discipline
    * (6-dp components, 10-dp squared diffs, exact-decimal sum, 6-dp
    * total), so distances are bit-identical across engines and
    * partitionings. */
  def centroidDistances(df: DataFrame, idCol: String, groupCol: String,
                        vecCol: String): DataFrame = {
    val cents = broadcast(centroids(df, groupCol, vecCol)
      .select(col(groupCol), col("pos"), col("centroid")))
    val xd = graft.Num.dround(col("_gf_x").cast(DoubleType), 6)
    df.select(col(idCol), col(groupCol),
        posexplode(col(vecCol)).as(Seq("pos", "_gf_x")))
      .join(cents, Seq(groupCol, "pos"))
      .select(col(idCol), col(groupCol),
        graft.Num.dround(
          (xd - col("centroid")) * (xd - col("centroid")), 10).as("_gf_d2"))
      .groupBy(col(idCol), col(groupCol))
      .agg(count(lit(1)).as("n_dims"),
        graft.Num.dround(
          sum(col("_gf_d2").cast(DecimalType(38, 10))).cast(DoubleType), 6)
          .as("dist_sq"))
  }

  /** The filter form: drop vectors farther than `maxDistSq` from their
    * group centroid (original columns intact, audited ids semi-joined —
    * id + verdict pairs shuffle, vectors don't move twice). */
  def pruneFar(df: DataFrame, idCol: String, groupCol: String,
               vecCol: String, maxDistSq: Double): DataFrame = {
    require(maxDistSq >= 0, s"maxDistSq must be >= 0, got $maxDistSq")
    val keep = centroidDistances(df, idCol, groupCol, vecCol)
      .filter(col("dist_sq") <= maxDistSq).select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
