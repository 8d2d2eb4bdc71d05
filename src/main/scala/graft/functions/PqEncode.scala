package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: product-quantization encode. For a
  * codebook of `nSub` subspaces × `k` centroids × `subDim` dims and a
  * vector of length `nSub·subDim`, `out[s] = argmin_c Σ_j (vec[s·subDim+j]
  * − cb[s][c][j])²` with ties broken toward the LOWEST code id — exactly
  * the historical crossJoin+window argmin rule, as one fused codegen'd
  * loop.
  *
  * Why an expression and not the relational form: the crossJoin against
  * nSub×k codebook rows + per-(vector,subspace) rank window shuffles
  * N·nSub·k rows per encode, and the expression-tree alternative (k
  * literal structs per subspace through an interpreted higher-order
  * sqdist) is k·nSub un-codegen'd lambda evaluations per row — both melt
  * the moment the code budget grows past 16 codes/subspace. Here the
  * codebook folds ONCE into a `double[][][]` reference object and the
  * per-row cost is the tight nSub·k·subDim multiply-add loop, with no
  * exchange at all.
  *
  * NULL when the vector is NULL; NULL vector elements read as 0; vector
  * elements beyond a subspace's slice are ignored (a short vector scores
  * missing dims as (0 − cb)²) — degenerate inputs still encode
  * deterministically rather than erroring mid-index-build.
  */
final case class PqEncode(codebook: Expression, vec: Expression)
    extends BinaryExpression {

  override def left: Expression = codebook
  override def right: Expression = vec

  private def vecElem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!codebook.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable codebook argument")
    else (codebook.dataType, vecElem(vec)) match {
      case (ArrayType(ArrayType(ArrayType(DoubleType, _), _), _), Some(_)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<ARRAY<ARRAY<DOUBLE>>>, ARRAY<FLOAT|DOUBLE>), got " +
            s"(${codebook.dataType.simpleString}, ${vec.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "pq_encode"

  /** The folded codebook, evaluated once per (driver/executor) instance:
    * cb(s)(c) is subspace s's centroid c. */
  @transient private lazy val cb: Array[Array[Array[Double]]] = {
    val subs = codebook.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(subs.numElements()) { s =>
      val codes = subs.getArray(s)
      Array.tabulate(codes.numElements())(c => codes.getArray(c).toDoubleArray())
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
    val out = new Array[Int](cb.length)
    var s = 0
    var off = 0
    while (s < cb.length) {
      val codes = cb(s)
      val subDim = if (codes.isEmpty) 0 else codes(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes.length) {
        val cv = codes(c)
        var d = 0.0
        var j = 0
        while (j < cv.length) {
          val xv = if (off + j < n) x(off + j) else 0.0
          val diff = xv - cv(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    val vArr = ctx.freshName("vArr")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    val out = ctx.freshName("out")
    val codes = ctx.freshName("codes")
    val cv = ctx.freshName("cv")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val d = ctx.freshName("d")
    val diff = ctx.freshName("diff")
    val xv = ctx.freshName("xv")
    val s = ctx.freshName("s")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val t = ctx.freshName("t")
    val off = ctx.freshName("off")
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
          int[] $out = new int[$cbRef.length];
          int $off = 0;
          for (int $s = 0; $s < $cbRef.length; $s++) {
            double[][] $codes = $cbRef[$s];
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $codes.length; $c++) {
              double[] $cv = $codes[$c];
              double $d = 0.0;
              for (int $j = 0; $j < $cv.length; $j++) {
                double $xv = ($off + $j < $n) ? $x[$off + $j] : 0.0;
                double $diff = $xv - $cv[$j];
                $d += $diff * $diff;
              }
              if ($d < $bestD) { $bestD = $d; $best = $c; }
            }
            $out[$s] = $best;
            $off += ($codes.length == 0) ? 0 : $codes[0].length;
          }
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(codebook = newLeft, vec = newRight)
}
