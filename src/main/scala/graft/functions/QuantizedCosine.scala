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
  * NULL when either input is NULL. Extra elements beyond the shorter length
  * are ignored; NULL elements contribute nothing. Quantized magnitudes must
  * keep dot/norm sums within Long (|x| ≤ ~3e4 at 64 dims is ample).
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
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getLong(i)
        val y = b.getLong(i)
        dot += x * y
        na += x * x
        nb += y * y
      }
      i += 1
    }
    dot.toDouble / math.sqrt(math.max(na * nb, 1L).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.freshName("lArr")
    val r = ctx.freshName("rArr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $l = ${leftGen.value};
          org.apache.spark.sql.catalyst.util.ArrayData $r = ${rightGen.value};
          int $n = java.lang.Math.min($l.numElements(), $r.numElements());
          long $dot = 0L;
          long $na = 0L;
          long $nb = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
              long $x = $l.getLong($i);
              long $y = $r.getLong($i);
              $dot += $x * $y;
              $na += $x * $x;
              $nb += $y * $y;
            }
          }
          ${ev.isNull} = false;
          ${ev.value} = (double) $dot /
            java.lang.Math.sqrt((double) java.lang.Math.max($na * $nb, 1L));
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}
