package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog application — the warehouse MERGE every ingest pipeline
  * runs to keep a snapshot current against an upstream change stream
  * (Debezium/binlog-shaped): per key the LATEST change wins, I/U upsert
  * the payload, D deletes, and keys the changelog never touches pass
  * through untouched. The complement of [[EventAnalytics.history]]: that
  * derives versions FROM observations, this applies versions TO a
  * snapshot.
  *
  * Contract: `changes` carries every `base` column plus `opCol`
  * (I/U/D) and `seqCol` (the log sequence number — totally ordered per
  * key, as any binlog/LSN is). Both are enforced, not assumed: an
  * unknown op or a duplicated (key, seq) pair refuses loudly — two
  * changes at one sequence number have no defined winner, and applying
  * either silently would corrupt the snapshot.
  *
  * Scale shape: one window over the CHANGELOG only (partitioned by key
  * — never over the base), one key anti-join and one union. The
  * changelog is the small side in every real deployment; the base
  * snapshot is touched exactly once, by the anti-join, and AQE
  * broadcasts the latest-change keys while they fit. */
object Cdc {

  val Ops: Set[String] = Set("I", "U", "D")

  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val payload = base.columns.toSeq
    val missing = (payload :+ seqCol :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changelog is missing columns: ${missing.mkString(", ")} — it must " +
        "carry every base column plus the op and sequence columns")
    require(!payload.contains(opCol),
      s"op column '$opCol' collides with a base column")

    // refusals: unknown ops, duplicated (key, seq)
    val badOp = changes.filter(!col(opCol).isin(Ops.toSeq: _*))
      .select(opCol).limit(1).collect()
    if (badOp.nonEmpty) throw new IllegalArgumentException(
      s"changelog carries op '${badOp(0).get(0)}' — ops must be one of " +
        Ops.mkString(", "))
    val dup = changes.groupBy((keyCols :+ seqCol).map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"changelog has two changes at one (key, $seqCol): " +
        s"${dup(0).toSeq.mkString(", ")} — no defined winner; fix the log")

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") === 1)
    // pass-through keys = base minus ANY touched key — the raw changelog
    // keys suffice (anti-joins are duplicate-insensitive), so this branch
    // skips the latest-change window entirely: ONE window in the plan,
    // over the changelog (PlanQualitySpec pins it)
    val survivors = base.join(
      changes.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    survivors.unionByName(upserts)
  }
}
