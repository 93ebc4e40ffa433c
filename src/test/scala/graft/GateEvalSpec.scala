package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.quality.{Anonymity, GateEval}
import graft.text.TextAnalysis

/** Hand-computed fixtures for the gate-evaluation metrics (SURVEY §2 rows
  * 125-128): AUC/PR/calibration, Cohen's kappa, k-anonymity, and the
  * encoding-artifact audit. */
class GateEvalSpec extends SparkSpec {
  import spark.implicits._

  private val scored = Seq(
    // (score, label): pos {0.9, 0.8, 0.8, 0.4}, neg {0.8, 0.3, 0.2}
    (0.9, 1L), (0.8, 1L), (0.8, 1L), (0.4, 1L),
    (0.8, 0L), (0.3, 0L), (0.2, 0L)).toDF("score", "label")

  test("auc matches the hand-computed pairwise win rate with ties") {
    // wins: 0.9 beats all 3; each 0.8 beats 2 + ties 1 (0.5); 0.4 beats 2
    // → (3 + 2·2.5 + 2) / (4·3) = 10/12
    val r = GateEval.auc(scored, "score", "label").head()
    assert(r.getAs[Long]("n_pos") == 4 && r.getAs[Long]("n_neg") == 3)
    assert(r.getAs[Double]("auc") == math.floor(10.0 / 12.0 * 1e6 + 0.5) / 1e6)
  }

  test("auc is NULL for single-class input (undefined, not NaN)") {
    val allPos = Seq((0.9, 1L), (0.5, 1L)).toDF("score", "label")
    val r = GateEval.auc(allPos, "score", "label").head()
    assert(r.getAs[Long]("n_neg") == 0 && r.isNullAt(r.fieldIndex("auc")))
    val allNeg = Seq((0.9, 0L)).toDF("score", "label")
    val r2 = GateEval.auc(allNeg, "score", "label").head()
    assert(r2.getAs[Long]("n_pos") == 0 && r2.isNullAt(r2.fieldIndex("auc")))
  }

  test("encoding audit: null text is not clean and is not lost") {
    val df = Seq((1L, Some("fine text")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingAudit(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Boolean]("is_clean"))
    assert(!out(1).getAs[Boolean]("is_clean")) // false, never NULL
    assert(out(1).isNullAt(out(1).fieldIndex("n_mojibake")))
  }

  test("auc degenerates correctly: perfect 1, inverted 0, constant 0.5") {
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.1, 0L)).toDF("score", "label")
    assert(GateEval.auc(perfect, "score", "label").head().getAs[Double]("auc") == 1.0)
    val inverted = Seq((0.1, 1L), (0.9, 0L)).toDF("score", "label")
    assert(GateEval.auc(inverted, "score", "label").head().getAs[Double]("auc") == 0.0)
    val constant = Seq((0.5, 1L), (0.5, 1L), (0.5, 0L)).toDF("score", "label")
    assert(GateEval.auc(constant, "score", "label").head().getAs[Double]("auc") == 0.5)
  }

  test("prCurve matches hand-computed operating points and null guards") {
    val rows = GateEval.prCurve(scored, "score", "label", Seq(0.0, 0.5, 0.95))
      .orderBy("threshold").collect()
    val t0 = rows(0) // everything predicted positive
    assert(t0.getAs[Long]("tp") == 4 && t0.getAs[Long]("fp") == 3 &&
      t0.getAs[Long]("fn") == 0 && t0.getAs[Long]("tn") == 0)
    assert(t0.getAs[Double]("precision") == math.floor(4.0 / 7.0 * 1e6 + 0.5) / 1e6)
    assert(t0.getAs[Double]("recall") == 1.0)
    assert(t0.getAs[Double]("f1") == math.floor(8.0 / 11.0 * 1e6 + 0.5) / 1e6)
    val t5 = rows(1) // score >= 0.5: 3 pos, 1 neg
    assert(t5.getAs[Long]("tp") == 3 && t5.getAs[Long]("fp") == 1)
    assert(t5.getAs[Double]("precision") == 0.75 && t5.getAs[Double]("recall") == 0.75
      && t5.getAs[Double]("f1") == 0.75)
    val t95 = rows(2) // nothing predicted positive → precision/f1 NULL
    assert(t95.getAs[Long]("tp") == 0 && t95.getAs[Long]("fp") == 0)
    assert(t95.isNullAt(t95.fieldIndex("precision")))
    assert(t95.getAs[Double]("recall") == 0.0)
    assert(t95.isNullAt(t95.fieldIndex("f1")))
  }

  test("calibration bins fixed-width with the top edge closed") {
    val df = Seq((0.05, 0L), (0.15, 1L), (0.15, 0L), (1.0, 1L))
      .toDF("score", "label")
    val bins = GateEval.calibration(df, "score", "label", 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 9L))
    val b1 = bins(1)
    assert(b1.getAs[Long]("n") == 2 && b1.getAs[Long]("n_pos") == 1)
    assert(b1.getAs[Double]("mean_score") == 0.15 && b1.getAs[Double]("pos_rate") == 0.5)
    assert(bins(2).getAs[Long]("bin") == 9L) // score 1.0 clamps into bin 9
  }

  test("kappa: perfect 1, complementary -1, independent 0") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    assert(GateEval.kappa(perfect, "a", "b").head().getAs[Double]("kappa") == 1.0)
    val comp = Seq((true, false), (true, false), (false, true), (false, true))
      .toDF("a", "b")
    assert(GateEval.kappa(comp, "a", "b").head().getAs[Double]("kappa") == -1.0)
    val indep = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "b")
    assert(GateEval.kappa(indep, "a", "b").head().getAs[Double]("kappa") == 0.0)
  }

  test("kappa is NULL when chance agreement is total (all same cell)") {
    val allSame = Seq((true, true), (true, true)).toDF("a", "b")
    val r = GateEval.kappa(allSame, "a", "b").head()
    assert(r.getAs[Long]("both_pass") == 2)
    assert(r.isNullAt(r.fieldIndex("kappa"))) // p_e = 1 → undefined
  }

  test("anonymity audit + summary on a hand-built class structure") {
    // class (1,x): 6 rows, 2 sensitive values; class (2,y): 3 rows, 1 value
    val rows = (1 to 6).map(i => (1, "x", i % 2 == 0)) ++
      (1 to 3).map(_ => (2, "y", true))
    val df = rows.toDF("qi1", "qi2", "sens")
    val audit = Anonymity.audit(df, Seq("qi1", "qi2"), "sens", k = 5, l = 2)
      .orderBy("qi1").collect()
    assert(audit.length == 2)
    assert(audit(0).getAs[Long]("class_size") == 6 &&
      !audit(0).getAs[Boolean]("k_violation") && !audit(0).getAs[Boolean]("l_violation"))
    assert(audit(1).getAs[Long]("class_size") == 3 &&
      audit(1).getAs[Boolean]("k_violation") && audit(1).getAs[Boolean]("l_violation"))
    val s = Anonymity.summary(df, Seq("qi1", "qi2"), "sens", k = 5, l = 2).head()
    assert(s.getAs[Long]("n_rows") == 9 && s.getAs[Long]("n_classes") == 2)
    assert(s.getAs[Long]("k_achieved") == 3 && s.getAs[Long]("l_achieved") == 1)
    assert(s.getAs[Long]("k_violating_rows") == 3)
    assert(s.getAs[Double]("at_risk_frac") == math.floor(3.0 / 9.0 * 1e6 + 0.5) / 1e6)
  }

  test("encoding audit counts each artifact class and passes clean text") {
    val df = Seq(
      (1L, "cafÃ© menu"),          // mojibake: Ã
      (2L, "he said â€œhiâ€"), // mojibake: â€ twice
      (3L, "famous Â© symbol"),     // mojibake: Â
      (4L, "lost�char"),       // replacement char
      (5L, "bellring"),       // C0 control
      (6L, "tabs\tand\nnewlines ok"),
      (7L, "plain ascii text")).toDF("doc_id", "text")
    val out = TextAnalysis.encodingAudit(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_mojibake") == 1)
    assert(out(1).getAs[Long]("n_mojibake") == 2)
    assert(out(2).getAs[Long]("n_mojibake") == 1)
    assert(out(3).getAs[Long]("n_replacement") == 1)
    assert(out(4).getAs[Long]("n_control") == 1)
    assert(Seq(5, 6).forall(i => out(i).getAs[Boolean]("is_clean")))
    assert(Seq(0, 1, 2, 3, 4).forall(i => !out(i).getAs[Boolean]("is_clean")))
  }

  test("record linkage: block bounds candidates, best match wins, id tie-break") {
    import graft.ops.RecordLinkage
    val master = Seq((10L, "cold widget"), (11L, "cold wodget"),
      (20L, "blue rod"), (30L, "warm plate")).toDF("rid", "name")
    val dirty = Seq((1L, "cold widgt"),  // matches 10 best, 11 second
      (2L, "blue ro"),                   // matches 20 within the block
      (3L, "zzzz none")).toDF("did", "name") // block miss → absent
    val out = RecordLinkage.bestMatch(dirty, "did", "name",
        master, "rid", "name", c => c.substr(1, 4), minScore = 0.8)
      .orderBy("did").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Long]("match_id") == 10L)
    assert(out(0).getAs[Long]("n_candidates") == 2) // both cold* survive 0.8
    assert(out(1).getAs[Long]("match_id") == 20L)
    // exact duplicate master rows: the tie breaks on the smaller id
    val dupMaster = Seq((7L, "cold widget"), (5L, "cold widget"))
      .toDF("rid", "name")
    val tied = RecordLinkage.bestMatch(dirty.filter($"did" === 1L), "did", "name",
        dupMaster, "rid", "name", c => c.substr(1, 4), minScore = 0.0)
      .head()
    assert(tied.getAs[Long]("match_id") == 5L)
    assertThrows[IllegalArgumentException](
      RecordLinkage.bestMatch(dirty, "did", "name", master, "rid", "name",
        c => c.substr(1, 4), minScore = 1.5))
  }

  test("gains curve hits its endpoints; all-negative labels null out") {
    // scores separate perfectly: the top half holds every positive
    val df = ((1 to 10).map(i => (0.9, 1L)) ++ (1 to 10).map(i => (0.1, 0L)))
      .toDF("score", "label")
    val g = GateEval.gains(df, "score", "label")
      .orderBy(org.apache.spark.sql.functions.col("score").desc).collect()
    assert(g.length == 2)
    // at depth 0.5 the gate has captured ALL positives: gain 1, lift 2
    assert(g(0).getAs[Double]("depth") == 0.5 &&
      g(0).getAs[Double]("gain") == 1.0 && g(0).getAs[Double]("lift") == 2.0)
    // the full-corpus row is always (depth 1, gain 1, lift 1)
    assert(g(1).getAs[Double]("depth") == 1.0 &&
      g(1).getAs[Double]("gain") == 1.0 && g(1).getAs[Double]("lift") == 1.0)
    // no positives anywhere -> gain/lift null, never 0/0
    val neg = GateEval.gains(
      Seq((0.9, 0L), (0.1, 0L)).toDF("score", "label"), "score", "label")
      .collect()
    assert(neg.forall(r => r.isNullAt(r.fieldIndex("gain")) &&
      r.isNullAt(r.fieldIndex("lift"))))
  }

  test("zipf slope is exactly -1 on a planted power law") {
    import org.apache.spark.sql.functions._
    // counts 12/6/4/3 = 12/rank for ranks 1..4: ln cnt = ln 12 - ln rank
    val words = Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val z = graft.text.Vocab.zipf(docs, "text", k = 4).orderBy("rank").collect()
    assert(z.map(_.getAs[String]("term")).toSeq == Seq("aa", "bb", "cc", "dd"))
    val slope = z.head.getAs[Double]("zipf_slope")
    assert(math.abs(slope - (-1.0)) < 1e-5, s"slope was $slope")
    // a degenerate fit (uniform counts -> denominator fine, slope 0)
    val flat = Seq(Seq.fill(5)("aa bb cc dd").mkString(" ")).toDF("text")
    val z2 = graft.text.Vocab.zipf(flat, "text", k = 4).collect()
    assert(z2.head.getAs[Double]("zipf_slope") == 0.0)
  }

  test("misuse is refused") {
    val df = Seq((0.5, 1L)).toDF("score", "label")
    assertThrows[IllegalArgumentException](
      GateEval.prCurve(df, "score", "label", Seq.empty))
    assertThrows[IllegalArgumentException](
      graft.text.Vocab.zipf(Seq("a").toDF("text"), "text", 1))
    assertThrows[IllegalArgumentException](
      GateEval.calibration(df, "score", "label", 1))
    assertThrows[IllegalArgumentException](
      Anonymity.audit(df, Seq.empty, "label", 5, 2))
    assertThrows[IllegalArgumentException](
      Anonymity.audit(df, Seq("score"), "label", 0, 2))
  }
}
