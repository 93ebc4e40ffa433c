package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One registered operator query: a Spark implementation and (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column aliases MUST match between the two — the driver sorts
  * columns by name then hashes values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact-decimal accumulator for double columns: sums of doubles are
    * order-dependent in the last ulps (Spark and DuckDB reduce in different
    * orders), so cross-engine hash comparison needs exact arithmetic.
    * Pattern: round the (deterministic, IEEE) scalar double expression to
    * 4dp, accumulate as DECIMAL(30,4) (exact), convert the exact total back
    * to double (deterministic).
    * The final step rounds the exact decimal total to 2dp BEFORE the double
    * cast: a decimal with few digits (< 2^53 numerator) converts to double
    * identically everywhere, whereas a scale-12 int128 numerator loses
    * different ulps in different engines. */
  def dsum(c: Column): Column =
    round(sum(round(c, 4).cast(DecimalType(30, 4))), 2).cast(DoubleType)

  /** Exact-decimal sum of an already-decimal (exact) expression, emitted as
    * a deterministic 2dp double. */
  def decSum(c: Column): Column =
    round(sum(c), 2).cast(DoubleType)

  /** Cross-engine-deterministic rounding of a computed DOUBLE:
    * `floor(x·10ⁿ + 0.5)/10ⁿ` — every step is a single IEEE op that both
    * engines execute identically. Plain `round(double, n)` is NOT portable:
    * Spark rounds the exact binary value (BigDecimal HALF_UP) while DuckDB
    * multiplies first, and the multiply can manufacture an exact .5 tie —
    * observed 1-ulp mismatches at sf0.1. Exact-decimal values (dsum/decSum)
    * may keep using round(). */
  def dround(c: Column, n: Int): Column = graft.Num.dround(c, n)

  /** SQL fragment mirroring [[dround]]. */
  def sqlDround(e: String, n: Int): String =
    s"floor(($e) * 1e$n + 0.5) / 1e$n"

  /** Deterministic mean built on the exact-decimal sum. */
  def davg(c: Column): Column =
    dround(dsum(c) / count(c), 4)

  /** Money/rate factors as exact decimals. The source doubles carry <= 4
    * decimal digits semantically, so the decimal cast is unambiguous (no
    * rounding ties); all subsequent ×/−/sum arithmetic is exact in both
    * engines, and the single final decimal→double conversion is
    * deterministic. Rounding a double PRODUCT per-row, by contrast, ties
    * differently between engines (observed 1-ulp mismatches). */
  def money(c: Column): Column = c.cast(DecimalType(18, 4))
  def rate(c: Column): Column  = c.cast(DecimalType(8, 4))
  val one: Column              = lit(1).cast(DecimalType(8, 4))

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(round(sum(CAST(round($e, 4) AS DECIMAL(30,4))), 2) AS DOUBLE)"

  /** SQL fragment mirroring [[decSum]]. */
  def sqlDecSum(e: String): String =
    s"CAST(round(sum($e), 2) AS DOUBLE)"

  def sqlMoney(e: String): String = s"CAST($e AS DECIMAL(18,4))"
  def sqlRate(e: String): String  = s"CAST($e AS DECIMAL(8,4))"
  val sqlOne: String              = "CAST(1 AS DECIMAL(8,4))"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(e: String): String =
    sqlDround(s"${sqlDsum(e)} / count($e)", 4)

  /** DuckDB fragment: word `n`-grams of token array `l` as space-joined
    * strings (mirrors `graft.text.TextAnalysis.ngrams`). */
  def sqlNgrams(l: String, n: Int): String = {
    val joined = (0 until n).map(i => s"$l[i + $i]").mkString(" || ' ' || ")
    s"""CASE WHEN len($l) < $n THEN CAST([] AS VARCHAR[])
        ELSE list_transform(generate_series(1, len($l) - ${n - 1}), i -> $joined) END"""
  }
}
