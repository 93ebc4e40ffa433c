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
}
