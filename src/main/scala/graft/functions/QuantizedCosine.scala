package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: cosine of two INTEGER-QUANTIZED vectors
  * (ARRAY<BIGINT>) in one fused codegen'd loop — exact long dot product and
  * norms, then a single IEEE division + sqrt:
  *
  *   dot / sqrt(max(na * nb, 1))
  *
  * This is the engine-neutral arithmetic the DuckDB-provable oracle twins
  * rely on (OracleVariants): every intermediate is an exact integer, so any
  * engine computes bit-identical values, and the one floating step at the
  * end is IEEE-determined by its exact inputs. Exists because the
  * interpreted `aggregate(zip_with(...))` form of the same math has no
  * codegen and was the single slowest line of the round-3 bench; the fused
  * loop runs at the same speed as the float `cosine_similarity` path.
  *
  * NULL when either input is NULL. Matching DuckDB's list arithmetic
  * exactly: each side's NORM runs over that side's FULL vector (a NULL
  * element contributes nothing, like list_sum skipping NULLs); the DOT
  * pairs elements up to the shorter length (an out-of-range or NULL
  * partner makes the product NULL in SQL, so it contributes nothing).
  * The norm product is formed in DOUBLE — na and nb are exact below 2⁵³,
  * so the one rounding of `(double)na * (double)nb` is bit-identical to
  * DuckDB casting the exact HUGEINT product, with no Long overflow.
  * Quantized magnitudes must keep each norm sum within 2⁵³
  * (|x| ≤ ~1e7 at 64 dims).
  */
final case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_cosine"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    QuantizedCosine.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one static call — the loop body is identical either way and a single
    // shared implementation cannot drift between eval and codegen
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.QuantizedCosine.cosine(
            ${leftGen.value}, ${rightGen.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

object QuantizedCosine {
  /** Static so generated code calls the same implementation as eval. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val nA = a.numElements()
    val nB = b.numElements()
    val shared = math.min(nA, nB)
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < shared) {
      val aNull = a.isNullAt(i)
      val bNull = b.isNullAt(i)
      if (!aNull && !bNull) dot += a.getLong(i) * b.getLong(i)
      if (!aNull) { val x = a.getLong(i); na += x * x }
      if (!bNull) { val y = b.getLong(i); nb += y * y }
      i += 1
    }
    // norms cover each side's FULL vector (DuckDB list_sum semantics)
    var j = shared
    while (j < nA) {
      if (!a.isNullAt(j)) { val x = a.getLong(j); na += x * x }
      j += 1
    }
    j = shared
    while (j < nB) {
      if (!b.isNullAt(j)) { val y = b.getLong(j); nb += y * y }
      j += 1
    }
    dot.toDouble / math.sqrt(math.max(na.toDouble * nb.toDouble, 1.0))
  }
}
