package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs on sf0.001 and returns rows or a valid empty result") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // Gate invariant (the r10 red-row class): the driver's correctness
      // canonicalizer sorts the frame column-wise in pandas, which cannot
      // factorize nested values — a registered query emitting a top-level
      // array/map/struct column errors the gate instead of being checked.
      // Flatten (pc_0..pc_k scalars, or a melted (id, pos, value) frame)
      // before registering; there is deliberately NO exempt list.
      val nested = df.schema.fields.filter(f => f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => true
        case _ => false
      })
      assert(nested.isEmpty,
        s"$name emits nested top-level column(s) ${
          nested.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")
        } — the driver's canonicalizer cannot sort them; flatten the output")
      // Gate invariant (the r11 red-row class): a DECIMAL output column
      // reads as pandas `object` from Spark parquet but float64 from
      // DuckDB, so the driver's hash diverges even when values match
      // (cdc_apply, r11). Emit dround(cast(x AS DOUBLE), n) instead —
      // decimals are for intermediate exact arithmetic, never for output.
      val decimals = df.schema.fields.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
      assert(decimals.isEmpty,
        s"$name emits DecimalType output column(s) ${
          decimals.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")
        } — pandas reads Spark decimal as object vs DuckDB float64; " +
          "emit dround(cast(... as double), n) instead")
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
