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
