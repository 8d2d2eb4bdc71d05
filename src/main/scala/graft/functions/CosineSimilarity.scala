package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays in a
  * single fused loop (dot product + both norms at once), with whole-stage
  * codegen via `doGenCode` — no lambda-expression interpretation, no
  * intermediate zip_with array allocation per row pair, and float arrays are
  * read element-wise (no upfront array cast/copy).
  *
  * NULL when either input is NULL or either norm is zero. Inputs are
  * ARRAY<FLOAT> or ARRAY<DOUBLE>, independently per side. Extra elements
  * beyond the shorter length are ignored; NULL elements contribute nothing.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val leftFloat = elemType(left).contains(FloatType)
    val rightFloat = elemType(right).contains(FloatType)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
      }
      i += 1
    }
    if (na > 0.0 && nb > 0.0) dot / math.sqrt(na * nb) else null
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
    val getX =
      if (elemType(left).contains(FloatType)) s"(double) $l.getFloat($i)"
      else s"$l.getDouble($i)"
    val getY =
      if (elemType(right).contains(FloatType)) s"(double) $r.getFloat($i)"
      else s"$r.getDouble($i)"
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
          double $dot = 0.0;
          double $na = 0.0;
          double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
              double $x = $getX;
              double $y = $getY;
              $dot += $x * $y;
              $na += $x * $x;
              $nb += $y * $y;
            }
          }
          if ($na > 0.0 && $nb > 0.0) {
            ${ev.isNull} = false;
            ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
          }
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
