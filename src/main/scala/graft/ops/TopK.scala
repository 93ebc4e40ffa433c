package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k-per-group via a bounded typed Aggregator — the sort-free
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY s)` for
  * "keep the best k of each key".
  *
  * Honest comparison on THIS Spark (4.x): the rank-filter window form is
  * no longer the naive everything-through-one-sort plan — Spark ≥ 3.5's
  * `InferWindowGroupLimit` inserts a PARTIAL WindowGroupLimit before the
  * exchange (measured on q_window_topn/events_latest: the exchange
  * carries ≤ k rows per (group, partition), same as this aggregator).
  * What the window path still pays and this aggregator does not:
  * TWO partition-wide SORTS on (group, order) — one feeding the partial
  * limit, one after the exchange — where the aggregate form is hash
  * grouping + an O(k) insertion per row with NO sort anywhere. And the
  * aggregator stays available where the limit inference cannot fire
  * (rank filters that are not literal comparisons, rank columns consumed
  * downstream).
  *
  * Semantics match the window form exactly (score descending, id
  * ascending on ties), which is what makes the registry query
  * HASH-CHECKABLE against the ANSI row_number oracle. Null and NaN
  * scores (and null ids) carry no rank and are dropped at the scan (the
  * window form ranks nulls engine-dependently, and NaN breaks the
  * comparator's total order).
  */
object TopK {

  /** Buffer/result: parallel (scores, ids), rank-ordered (score desc,
    * id asc), length ≤ k. Arrays stay tiny (k-bounded) so the per-row
    * reduce is an insertion into a short sorted array — no heap churn. */
  private type Buf = (Array[Double], Array[Long])

  private final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Buf, Buf] {

    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    def zero: Buf = (Array.empty[Double], Array.empty[Long])

    def reduce(b: Buf, v: (Double, Long)): Buf = {
      val (ss, is) = b
      val n = ss.length
      if (n == k && !beats(v._1, v._2, ss(n - 1), is(n - 1))) b
      else {
        // insertion position by (score desc, id asc)
        var p = 0
        while (p < n && beats(ss(p), is(p), v._1, v._2)) p += 1
        val m = math.min(n + 1, k)
        val ns = new Array[Double](m); val ni = new Array[Long](m)
        System.arraycopy(ss, 0, ns, 0, p)
        System.arraycopy(is, 0, ni, 0, p)
        ns(p) = v._1; ni(p) = v._2
        val tail = m - p - 1
        if (tail > 0) {
          System.arraycopy(ss, p, ns, p + 1, tail)
          System.arraycopy(is, p, ni, p + 1, tail)
        }
        (ns, ni)
      }
    }

    def merge(a: Buf, b: Buf): Buf = {
      val (as, ai) = a; val (bs, bi) = b
      val m = math.min(as.length + bs.length, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= bs.length ||
          (i < as.length && beats(as(i), ai(i), bs(j), bi(j)))
        if (takeA) { ns(o) = as(i); ni(o) = ai(i); i += 1 }
        else { ns(o) = bs(j); ni(o) = bi(j); j += 1 }
        o += 1
      }
      (ns, ni)
    }

    def finish(r: Buf): Buf = r

    def bufferEncoder: Encoder[Buf] = TopK.bufEncoder
    def outputEncoder: Encoder[Buf] = TopK.bufEncoder
  }

  private val bufEncoder: Encoder[Buf] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](),
      ExpressionEncoder[Array[Long]]())

  /** Top-k rows per group: (groupCols..., rank, id, score), rank 1..k by
    * (score desc, id asc). One map-side-combined aggregation; the
    * exchange carries ≤ k candidates per (group, partition). */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               scoreCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "perGroup needs at least one group column")
    // the output frame adds rank/id/score, and the intermediate explode
    // adds pos/col — a group column shadowing any of them would emit an
    // ambiguous or silently-renamed frame
    val reserved = Set("rank", "id", "score", "pos", "col", "_gf_top")
    val clash = groupCols.map(_.toLowerCase).filter(reserved.contains)
    require(clash.isEmpty,
      s"perGroup group columns collide with output/intermediate names " +
        s"${clash.mkString(", ")} — rename them before calling (reserved: " +
        s"${reserved.mkString(", ")})")
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    // NaN scores are dropped WITH the nulls: the comparator's (>, ==)
    // ordering is partial under NaN — a NaN row would be inserted at the
    // front of a non-full buffer yet never beat a full one's tail, an
    // order-dependent result diverging from the row_number oracle.
    df.filter(col(scoreCol).isNotNull && col(idCol).isNotNull &&
        !isnan(col(scoreCol).cast("double")))
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("_gf_top"))
      .select(groupCols.map(col) :+
        posexplode(arrays_zip(col("_gf_top._1").as("s"),
          col("_gf_top._2").as("i"))): _*)
      .select(groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+
        col("col.i").as("id") :+
        col("col.s").as("score"): _*)
  }
}
