package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the sign-LSH bucket of a ×1000-quantized
  * BIGINT vector under the deterministic LCG hyperplane family the
  * engine-neutral twins replay in DuckDB — bit p of the result is set iff
  * Σ_d v[d] · plane(offset + p, d) > 0 for p in [0, nPlanes), with
  * plane(p, d) = ((p·1315423911 + d·2654435761 + 97531) mod 2³²) mod 2001
  * − 1000 over d < min(64, |v|). Pure BIGINT arithmetic, bit-identical to
  * the SQL expansion (OracleVariants.intBucketSql).
  *
  * Exists because the column form — nPlanes × 64 `element_at·const`
  * chains per table — is a 1152-term interpreted expression tree at the
  * r13 plane count: measured 2.6 s to bucket just 2000 vectors at sf0.1
  * (each dim re-extracted per plane, no CSE), which made the
  * dedup_embed_lsh twin bucket-projection-bound regardless of pair count.
  * The fused loop is the pack_signs/pq_encode discipline: cheap wherever
  * the optimizer places it. NULL vector → NULL. A NULL element or a
  * vector SHORTER than 64 dims → bucket 0, matching the SQL expansion
  * EXACTLY: there every plane dot is a 64-term product chain, so one
  * NULL term (a null element, or an out-of-range `embedding[d]`) nulls
  * the whole dot and every `CASE WHEN dot > 0` branch goes untaken —
  * per-dim null-SKIPPING (the first cut) produced a live partial dot and
  * cross-engine bucket divergence on partially-null vectors (r13
  * review). Offsets/plane counts are foldable non-null INTs.
  */
final case class LshSignBucket(first: Expression, second: Expression,
                               third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> input, got ${first.dataType.simpleString}")
    else if (Seq(second, third).exists(e => e.dataType != IntegerType || !e.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable INT offset and plane count")
    else if (second.eval(null) == null || third.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName offset/plane count must not be NULL")
    else if (third.eval(null).asInstanceOf[Int] > 63)
      TypeCheckResult.TypeCheckFailure(s"$prettyName supports at most 63 planes")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "lsh_sign_bucket"

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) return null
    LshSignBucket.bucket(v.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[Int], third.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = first.genCode(ctx)
    val offGen = second.genCode(ctx)
    val nGen = third.genCode(ctx)
    val resultCode =
      code"""
        ${vecGen.code}
        ${offGen.code}
        ${nGen.code}
        boolean ${ev.isNull} = ${vecGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.LshSignBucket.bucket(
            ${vecGen.value}, ${offGen.value}, ${nGen.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LshSignBucket =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshSignBucket {
  /** Static so generated code calls the same implementation as eval. */
  def bucket(a: ArrayData, offset: Int, nPlanes: Int): Long = {
    // SQL-twin parity gate: every plane dot is a 64-term chain there, so
    // a null element or a missing dim nulls ALL dots → bucket 0
    if (a.numElements() < 64) return 0L
    var d = 0
    while (d < 64) {
      if (a.isNullAt(d)) return 0L
      d += 1
    }
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = offset + p
      var dot = 0L
      d = 0
      while (d < 64) {
        val x = (plane * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
        dot += a.getLong(d) * ((x % 2001L) - 1000L)
        d += 1
      }
      if (dot > 0) bits |= 1L << p
      p += 1
    }
    bits
  }
}
