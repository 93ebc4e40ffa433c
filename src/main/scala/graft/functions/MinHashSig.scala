package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd K-lane MinHash signature over a shingle array — the
  * per-document kernel of the near-dup family (MinHash/Jaccard/components/
  * incremental/decontamination).
  *
  * Replaces the relational formulation (explode shingles to rows → one
  * `min(xxhash64(h, i))` aggregate per lane), whose exchange ships every
  * hashed shingle (docs × shingles rows) and whose aggregate holds K lane
  * buffers per group. Here the whole signature is ONE generated loop in
  * the projection: per shingle one string hash + one seed fold, then K
  * `hashInt` lane updates against a local min array — no explode, no
  * aggregate, and the only exchange left in a signature pipeline is the
  * (id, sig) repartition its consumers share. At corpus scale that turns
  * the dedup family's dominant shuffle (hashed shingles) into a 520-byte-
  * per-doc one.
  *
  * Value parity is EXACT, lane by lane, with the relational path:
  *  - per shingle `h = xxhash64(s)` = `XXH64.hashUTF8String(s, 42)`
  *    (a NULL shingle element hashes to the untouched seed 42, exactly as
  *    `xxhash64(NULL)` does — hash expressions skip null children);
  *  - per lane `xxhash64(h, i)` folds the seed child-by-child:
  *    `hashInt(i, hashLong(h, 42))` (the lane index is an INT literal in
  *    the relational form, so the fold uses hashInt, not hashLong);
  *  - the lane value is the MIN over shingles.
  * MinHashSigSpec pins this equivalence on real documents, and the stored
  * signature indexes written by either formulation stay probe-compatible.
  *
  * Null semantics: NULL array → NULL; EMPTY array → NULL (the relational
  * path emits no row for a shingle-less doc — callers filter the NULLs to
  * keep the same row set).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<string> of shingles, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      val s1 = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, s1)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val s1 = ctx.freshName("s1"); val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |final int $m = $arr.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $m; $j++) {
         |    final long $h = $arr.isNullAt($j) ? 42L
         |      : $xxh.hashUTF8String($arr.getUTF8String($j), 42L);
         |    final long $s1 = $xxh.hashLong($h, 42L);
         |    for (int $i = 0; $i < $k; $i++) {
         |      final long $v = $xxh.hashInt($i, $s1);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
