package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared across modules. */
object Num {
  /** Cross-engine-deterministic rounding of a computed DOUBLE:
    * `floor(x·10ⁿ + 0.5)/10ⁿ` — each step is one IEEE op every engine
    * executes identically. `round(double, n)` is NOT portable across
    * engines (Spark rounds the exact binary value, DuckDB's multiply can
    * manufacture an exact tie); see graft.queries.Q.dround. */
  def dround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * f + lit(0.5)) / f
  }

  /** The histogram backbone's value contract, enforced loudly: cast to
    * DECIMAL(18,4) — values are QUANTIZED at 4 decimal places (the
    * documented fixed-precision contract of the exact-quantile /
    * outlier-bound family; >4-dp inputs round half-up to the grid) —
    * and a magnitude that overflows DECIMAL(18,4) (|v| ≥ 1e14) REFUSES
    * with a named error instead of ANSI's anonymous throw or non-ANSI's
    * silent NULL (a silently nulled histogram row would still shift
    * cumulative ranks and skew every downstream quantile). */
  def dec4(c: Column, label: String): Column = {
    val cast = c.try_cast("decimal(18,4)")
    when(c.isNotNull && cast.isNull, raise_error(concat(
      lit(s"graft: '$label' overflows DECIMAL(18,4) (|v| >= 1e14): "),
      c.cast("string")))).otherwise(cast)
  }

  /** Exact, layout-independent sum of grid-quantized doubles — the cheap
    * form of the DECIMAL(38,0) "qsum" discipline (FastText/Profiler):
    * each value quantizes to the integer grid `q = floor(x·scale + 0.5)`
    * (a long), and the q's accumulate EXACTLY as two plain LONG sums —
    * the arithmetic split `q = (q >> 31)·2³¹ + (q & 0x7FFFFFFF)` — instead
    * of a DECIMAL(38,0) sum. Long addition is exact and commutative, so
    * the total is independent of partition layout and shuffle merge
    * order; and a long-sum aggregation buffer stays on the codegen'd
    * compact path, where a precision-38 decimal buffer boxes a BigDecimal
    * per row (measured: the decimal form cost text_ft_train_score ~+4 s
    * at 32c in r14).
    *
    * The recompose `(Σhi + Σlo >> 31)·2³¹ + (Σlo & 0x7FFFFFFF)` rounds the
    * exact integer ΣQ to the nearest double in ONE IEEE add — bit-identical
    * to what DECIMAL(38,0)→double produced — then divides by `scale`.
    * Exactness bounds (documented, loud on overflow under ANSI): |ΣQ| and
    * the per-group row count n must satisfy n·2³¹ < 2⁶³ (n < 4.3e9 rows
    * per GROUP) and |Σ(q>>31)| < 2⁶³; the recompose is exact-to-nearest
    * for |ΣQ| < 2⁸⁴. Null inputs are skipped by both halves alike; an
    * all-null/empty group yields null, like sum(). */
  def qsum(x: Column, scale: Column): Column = {
    val q = floor(x * scale + lit(0.5)).cast("long")
    val hiS = sum(shiftright(q, 31))
    val loS = sum(q.bitwiseAND(lit(0x7FFFFFFFL)))
    ((hiS + shiftright(loS, 31)).cast("double") * lit(2147483648.0) +
      loS.bitwiseAND(lit(0x7FFFFFFFL)).cast("double")) / scale
  }

  /** Exact, layout-independent mean of grid-quantized doubles: [[qsum]]
    * over count of non-null values. The drop-in hardening for a raw
    * `avg(double)` whose partition-merge order must not leak into the
    * result (Lloyd centroid updates, residual offsets): values land on
    * the 1/scale grid, so the mean is deterministic under any scan split
    * or shuffle geometry. */
  def qmean(x: Column, scale: Column): Column = qsum(x, scale) / count(x)

  /** Entity-key coercion, enforced loudly: a non-null key that does not
    * cast to BIGINT refuses with a named error — a silently nulled key
    * would merge every malformed id into ONE pseudo-entity and corrupt
    * per-entity statistics (lifetimes, CUPED arms) instead of failing. */
  def longKey(c: Column, label: String): Column = {
    val cast = c.try_cast("bigint")
    // Round-trip guard: a fractional numeric TRUNCATES under a bigint
    // cast (12.7 → 12), silently merging distinct malformed keys into one
    // pseudo-entity — the exact failure this guard exists to refuse. The
    // comparison side uses try_cast so a non-numeric string stays on the
    // cast.isNull branch instead of throwing an anonymous ANSI error.
    when(c.isNotNull &&
      (cast.isNull || cast.cast("double") =!= c.try_cast("double")),
      raise_error(concat(
        lit(s"graft: '$label' is not a BIGINT-coercible entity key: "),
        c.cast("string")))).otherwise(cast)
  }
}
