package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Num.dround

/** Int8 scalar quantization audit for embedding columns — the standard
  * 4× vector-store compression (per-vector affine min/max codes, the
  * "SQ8" of the FAISS family; Jégou et al.'s PQ sibling already lives in
  * [[Pq]]). The audit quantizes, dequantizes, and reports per-vector
  * reconstruction error, so a pipeline can decide whether SQ8 (cheap,
  * 4×) suffices or PQ (lossier, 32×) is needed before committing an
  * index layout.
  *
  * Scale shape: ONE codegen'd projection — no shuffle, no join, no UDF;
  * per-row cost is O(d²) float compares (the min/max scalars re-evaluate
  * inside element lambdas after project collapsing — bounded by dim², a
  * few thousand compares, ≪ the parquet decode of the vector itself;
  * the O(len²) ngrams lesson does not bite at fixed small d).
  *
  * Float parity: float→double casts are exact; mn/mx are selections (no
  * arithmetic); scale, codes, and errors are chains of single IEEE ops
  * on identical operands; the MSE accumulates 12-dp-rounded squared
  * errors as exact DECIMAL — bit-identical across engines and
  * partitionings.
  */
object Quantize {

  /** Per-vector audit: (id, n_dims, vmin, scale, max_abs_err, mse).
    * `vmin`/`scale` are the code book (x ≈ vmin + code·scale); constant
    * vectors get scale 1 and all-zero codes (error 0). */
  def int8Audit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xd = transform(col(vecCol), x => x.cast(DoubleType))
    val mn = array_min(xd)
    val mx = array_max(xd)
    val scale = when(mx > mn, (mx - mn) / 255.0).otherwise(lit(1.0))
    val codes = transform(xd, x =>
      least(lit(255.0), greatest(lit(0.0), floor((x - mn) / scale + 0.5))))
    val errs = zip_with(xd, codes, (x, q) => x - (mn + q * scale))
    df.select(col(idCol),
      size(col(vecCol)).cast("long").as("n_dims"),
      mn.as("vmin"),
      scale.as("scale"),
      dround(array_max(transform(errs, e => abs(e))), 7).as("max_abs_err"),
      dround(
        // precision 30, not 38: the add (30,12)+(30,12) → (31,12) stays
        // under Spark's 38-digit cap, so every accumulation step is EXACT
        // and the cast back to (30,12) is lossless (values ≪ 10¹⁸); at
        // (38,12) Spark caps the add to (38,11), rounding per step.
        aggregate(errs, lit(0).cast(DecimalType(30, 12)),
          (acc, e) => (acc + dround(e * e, 12).cast(DecimalType(30, 12)))
            .cast(DecimalType(30, 12)))
          .cast(DoubleType) / size(col(vecCol)).cast(DoubleType), 10)
        .as("mse"))
  }
}
