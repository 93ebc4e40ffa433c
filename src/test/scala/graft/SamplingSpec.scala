package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 10000L).toDF("id")
    .withColumn("cls", when(col("id") % 10 === 0, "minority").otherwise("majority"))

  test("hashSample is reproducible and close to the requested fraction") {
    val a = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 10000.0 - 0.2) < 0.03)
    // a different seed draws a different (but still reproducible) sample
    val c = Sampling.hashSample(ids, "id", 0.2, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("smaller fraction is a subset of a larger one (same seed)") {
    val small = Sampling.hashSample(ids, "id", 0.1).collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample applies per-class fractions and drops unlisted strata") {
    val out = Sampling.stratifiedSample(ids, "id", "cls",
      Map("minority" -> 1.0, "majority" -> 0.1))
    val counts = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("minority") == 1000)
    assert(math.abs(counts("majority") / 9000.0 - 0.1) < 0.03)
    val none = Sampling.stratifiedSample(ids, "id", "cls", Map("other" -> 1.0))
    assert(none.count() == 0)
  }

  test("split partitions every row into exactly one named bucket, reproducibly") {
    val df = (0L until 10000L).toDF("id")
    val out = Sampling.split(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L, "no row dropped or duplicated")
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 10000.0 - 0.1) < 0.02)
    // same key -> same split on a rerun
    val again = Sampling.split(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.select("id", "split").except(again.select("id", "split")).count() == 0)
    // fractions must sum to 1, and each must be in [0,1]
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 1.5, "b" -> -0.5))
    }
    // degenerate single split: everything in one named bucket, and the SQL
    // mirror is a bare literal (a branchless CASE would be a syntax error)
    assert(Sampling.split(df, "id", Seq("all" -> 1.0))
      .filter(col("split") === "all").count() == 10000L)
    assert(Sampling.sqlSplit("id", Seq("all" -> 1.0)) == "'all'")
    // float cumsum boundaries round instead of truncating: 0.7+0.2 =
    // 0.8999999999999999 must still cut at exactly 900000
    assert(Sampling.sqlSplit("id", Seq("a" -> 0.7, "b" -> 0.2, "c" -> 0.1))
      .contains("< 900000 THEN 'b'"))
  }

  test("bottomKSample: exact budget, nested prefixes, reproducible, hash-uniform") {
    val out = Sampling.bottomKSample(ids, "id", "cls", k = 25)
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[Long]("id"),
        r.getAs[Int]("sample_rank")))
    // exactly k per stratum (both strata are larger than k)
    val byCls = out.groupBy(_._1)
    assert(byCls.keySet == Set("majority", "minority"))
    assert(byCls.values.forall(_.length == 25))
    // ranks are 1..k and ordered by (bucket asc, id asc)
    byCls.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 25))
    }
    // reproducible; different seed draws differently
    val again = Sampling.bottomKSample(ids, "id", "cls", k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
    val other = Sampling.bottomKSample(ids, "id", "cls", k = 25, seed = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(other != again)
    // the rank <= j prefix IS the bottom-j sample (nested subsamples)
    val j = Sampling.bottomKSample(ids, "id", "cls", k = 10)
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[Long]("id"))).toSet
    assert(j == out.filter(_._3 <= 10).map(t => (t._1, t._2)).toSet)
    // a stratum smaller than k keeps all its rows
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cls")
    assert(Sampling.bottomKSample(tiny, "id", "cls", k = 5).count() == 3)
    // refusals
    intercept[IllegalArgumentException] {
      Sampling.bottomKSample(ids, "id", "cls", k = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.bottomKSample(ids.withColumn("sid", col("id").cast("string")),
        "sid", "cls", k = 3)
    }
  }

  test("composed selectors are decorrelated: quota-then-sample keeps ~fraction") {
    // r4 ADVICE: with one shared hash, quota kept the n LOWEST buckets per
    // group, which a following sample(0.8) then kept at ~100% instead of
    // 80%. Per-operator fold primes must restore the fraction contract.
    import graft.ops.Quota
    val df = (1L to 20000L).toDF("id").withColumn("grp", col("id") % 20)
    val quota = Quota.capPerGroup(df, "grp", "id", n = 200)
    val qn = quota.count().toDouble // 20 groups x 200
    val frac = Sampling.hashSample(quota, "id", 0.5).count() / qn
    assert(math.abs(frac - 0.5) < 0.05, s"sample after quota kept $frac, expected ~0.5")
    // split after a sample must fill every bucket, not drain val/test
    val splits = Sampling.split(Sampling.hashSample(df, "id", 0.5), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(math.abs(splits("val") / (20000 * 0.5 * 0.1) - 1.0) < 0.3)
    // weighted sampling after a hash sample keeps ~weight of the survivors
    val ws = Sampling.weightedSample(
      Sampling.hashSample(df, "id", 0.5), "id", lit(0.4)).count()
    assert(math.abs(ws / (20000 * 0.5 * 0.4) - 1.0) < 0.15)
  }

  test("same module composed twice: same seed nests, distinct seeds multiply") {
    val df = (1L to 20000L).toDF("id")
    // same seed: identical predicate — nested subset, second pass a no-op
    val sameSeed = Sampling.hashSample(
      Sampling.hashSample(df, "id", 0.5), "id", 0.5).count()
    assert(sameSeed == Sampling.hashSample(df, "id", 0.5).count())
    // distinct seeds vary the MULTIPLIER: draws compose ~independently
    val twoSeeds = Sampling.hashSample(
      Sampling.hashSample(df, "id", 0.5), "id", 0.5, seed = 7L).count()
    assert(math.abs(twoSeeds / (20000 * 0.25) - 1.0) < 0.15,
      s"expected ~5000 survivors of two independent halvings, got $twoSeeds")
  }

  test("non-integral sampling key fails loudly instead of emptying the output") {
    val df = Seq(("a1", 1.0), ("b2", 2.0)).toDF("sid", "x")
    intercept[IllegalArgumentException] { Sampling.hashSample(df, "sid", 0.5) }
    intercept[IllegalArgumentException] {
      Sampling.split(df, "sid", Seq("a" -> 0.5, "b" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Quota.capPerGroup(df.withColumn("g", lit(1)), "g", "sid", 1)
    }
  }

  test("incremental dedup keeps only batch docs unseen in the index") {
    import graft.dedup.LlmDedup
    val index = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA beta gamma  "), // noisy clone of doc 1 -> dropped
      (11L, "brand new words"),    // genuinely new -> kept
      (12L, "same fresh text"),    // in-batch dup pair -> min id kept
      (13L, "same fresh text")
    ).toDF("doc_id", "text")
    val kept = LlmDedup.incremental(batch, index, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(11L, 12L))
  }

  test("sqlBucket agrees with bucket for negative keys") {
    // Spark pmod is non-negative; ANSI % (DuckDB, and Spark SQL's own %)
    // is sign-preserving. Evaluating the oracle fragment through Spark's
    // sign-preserving % pins that both expressions land in the same
    // bucket on all signs.
    val keys = (-5000L to 5000L by 37L).toDF("id")
    val mismatches = keys
      .withColumn("spark_b", Sampling.bucket(col("id"), seed = 3L))
      .withColumn("sql_b", expr(Sampling.sqlBucket("id", seed = 3L)))
      .filter(col("spark_b") =!= col("sql_b") || col("spark_b") < 0)
      .count()
    assert(mismatches == 0)
    // same parity for the per-operator prime fold (the path every
    // selector actually uses)
    val primeMismatches = keys
      .withColumn("spark_b", Sampling.bucket(col("id"), 3L, 999999937L))
      .withColumn("sql_b", expr(Sampling.sqlBucket("id", 3L, 999999937L)))
      .filter(col("spark_b") =!= col("sql_b") || col("spark_b") < 0)
      .count()
    assert(primeMismatches == 0)
  }

  test("weightedKSample: exact k, no replacement, reproducible") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"s${i % 4}", 1.0 + (i % 7)))
      .toDF("id", "grp", "w")
    val out = Sampling.weightedKSample(df, "id", "grp", "w", k = 10)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.values.toSet == Set(10L), s"budgets off: $byGrp")
    assert(out.select("id").distinct().count() == 40)
    val again = Sampling.weightedKSample(df, "id", "grp", "w", k = 10)
      .orderBy("grp", "sample_rank").collect().map(_.toString).toSeq
    assert(again ==
      out.orderBy("grp", "sample_rank").collect().map(_.toString).toSeq)
  }

  test("weightedKSample: selection pressure follows the weights") {
    import spark.implicits._
    // 300 independent strata, two items each (weight 9 vs 1), k = 1:
    // P(heavy wins) = 0.9 per stratum — expect ~270 wins.
    val rows = (0L until 300L).flatMap { s =>
      Seq((2 * s, s"g$s", 9.0, "heavy"), (2 * s + 1, s"g$s", 1.0, "light"))
    }
    val df = rows.toDF("id", "grp", "w", "tag")
    val wins = Sampling.weightedKSample(df, "id", "grp", "w", k = 1)
      .filter(col("tag") === "heavy").count()
    assert(wins >= 240 && wins <= 295, s"heavy wins $wins, expected ~270")
  }

  test("weightedKSample: null weights drop, non-positive weights refuse") {
    import spark.implicits._
    val df = Seq((1L, "g", Option(5.0)), (2L, "g", Option.empty[Double]),
      (3L, "g", Option(2.0))).toDF("id", "grp", "w")
    val kept = Sampling.weightedKSample(df, "id", "grp", "w", k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), "the null-weight row must drop")
    val bad = Seq((1L, "g", 0.0)).toDF("id", "grp", "w")
    val e = intercept[Exception] {
      Sampling.weightedKSample(bad, "id", "grp", "w", k = 1).collect()
    }
    assert(e.getMessage.contains("must be positive") ||
      Option(e.getCause).exists(_.getMessage.contains("must be positive")))
  }

  test("neyman: allocation follows N_h * S_h; degenerate strata get zero") {
    // stratum a: 100 rows, high spread; b: 100 rows, low spread;
    // c: constant (S=0); d: single row
    val rows =
      (1 to 100).map(i => (i.toLong, "a", if (i % 2 == 0) 100.0 else 0.0)) ++
      (1 to 100).map(i => (i.toLong + 1000, "b", if (i % 2 == 0) 51.0 else 49.0)) ++
      (1 to 100).map(i => (i.toLong + 2000, "c", 10.0)) ++
      Seq((3001L, "d", 5.0))
    val df = rows.toDF("id", "grp", "v")
    val plan = Sampling.neymanPlan(df, "grp", "v", totalN = 60)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("share"),
          r.getAs[Long]("alloc"))).toMap
    // equal sizes, so allocation ratio = stddev ratio ≈ 50.25 : 1.005
    assert(plan("a")._3 > 50 && plan("b")._3 >= 1,
      s"high-spread stratum should dominate: $plan")
    assert(plan("c")._3 == 0 && plan("d")._3 == 0,
      s"degenerate strata must get zero: $plan")
    assert(math.abs(plan.values.map(_._2).sum - 1.0) < 1e-5, "shares sum to 1")

    // the sample honors the per-stratum cut and the bottom-k nesting
    val sel = Sampling.neymanSample(df, "id", "grp", "v", totalN = 60)
    val byGrp = sel.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.getOrElse("a", 0L) == plan("a")._3)
    assert(byGrp.getOrElse("b", 0L) == plan("b")._3)
    assert(!byGrp.contains("c") && !byGrp.contains("d"))
    // nested-prefix: a smaller budget's selection is a strict prefix of
    // a larger one's (same hash order, lower cuts)
    val small = Sampling.neymanSample(df, "id", "grp", "v", totalN = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = sel.select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "smaller budget must nest inside larger")

    // all-degenerate family refuses
    val flat = Seq((1L, "x", 1.0), (2L, "x", 1.0)).toDF("id", "grp", "v")
    val e2 = intercept[Exception] {
      Sampling.neymanPlan(flat, "grp", "v", totalN = 10).collect()
    }
    assert(e2.getMessage.contains("degenerate") ||
      Option(e2.getCause).exists(_.getMessage.contains("degenerate")))
    intercept[IllegalArgumentException](
      Sampling.neymanPlan(df, "grp", "v", totalN = 0))
  }
}
