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
}
