package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dense matrix × vector, `out[i] = Σ_t
  * mat[i][t] · vec[t]`, in one fused codegen'd loop — the rotation /
  * projection primitive of the OPQ and PCA paths.
  *
  * The matrix argument must be FOLDABLE (a broadcast-literal model, e.g.
  * an OPQ rotation or a component basis); it is evaluated ONCE and pinned
  * as a `double[][]` reference object, so per row the only work is the
  * d_out×d_in multiply-add loop over the vector read element-wise in
  * place. This is also what makes it safe under CollapseProject: a
  * higher-order `transform(matLit, row -> dot(row, v))` re-evaluates an
  * inlined `v` expression once per OUTPUT element (64× for a 64-row
  * matrix — the O(n²) lambda-inlining trap), while this expression
  * references its vector child exactly once.
  *
  * NULL when the vector is NULL; vector elements beyond a matrix row's
  * length are ignored (and vice versa); NULL vector elements contribute 0.
  */
final case class MatVec(mat: Expression, vec: Expression)
    extends BinaryExpression {

  override def left: Expression = mat
  override def right: Expression = vec

  private def vecElem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!mat.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable matrix argument")
    else (mat.dataType, vecElem(vec)) match {
      case (ArrayType(ArrayType(DoubleType, _), _), Some(_)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<ARRAY<DOUBLE>>, ARRAY<FLOAT|DOUBLE>), got " +
            s"(${mat.dataType.simpleString}, ${vec.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "mat_vec"

  /** The folded matrix, evaluated once per (driver/executor) instance. */
  @transient private lazy val matrix: Array[Array[Double]] = {
    val rows = mat.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(rows.numElements()) { i =>
      rows.getArray(i).toDoubleArray()
    }
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val isFloat = vecElem(vec).contains(FloatType)
    val n = a.numElements()
    val x = new Array[Double](n)
    var t = 0
    while (t < n) {
      if (!a.isNullAt(t)) x(t) = if (isFloat) a.getFloat(t).toDouble else a.getDouble(t)
      t += 1
    }
    val out = new Array[Double](matrix.length)
    var i = 0
    while (i < matrix.length) {
      val row = matrix(i)
      val m = math.min(row.length, n)
      var s = 0.0
      var j = 0
      while (j < m) { s += row(j) * x(j); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matVecMatrix", matrix, "double[][]")
    val vArr = ctx.freshName("vArr")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    val out = ctx.freshName("out")
    val row = ctx.freshName("row")
    val m = ctx.freshName("m")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val t = ctx.freshName("t")
    val getV =
      if (vecElem(vec).contains(FloatType)) s"(double) $vArr.getFloat($t)"
      else s"$vArr.getDouble($t)"
    val vecGen = vec.genCode(ctx)
    val resultCode =
      code"""
        ${vecGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${vecGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $vArr = ${vecGen.value};
          int $n = $vArr.numElements();
          double[] $x = new double[$n];
          for (int $t = 0; $t < $n; $t++) {
            if (!$vArr.isNullAt($t)) $x[$t] = $getV;
          }
          double[] $out = new double[$matRef.length];
          for (int $i = 0; $i < $matRef.length; $i++) {
            double[] $row = $matRef[$i];
            int $m = java.lang.Math.min($row.length, $n);
            double $s = 0.0;
            for (int $j = 0; $j < $m; $j++) { $s += $row[$j] * $x[$j]; }
            $out[$i] = $s;
          }
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec =
    copy(mat = newLeft, vec = newRight)
}
