package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hashed word n-gram shingles of a document in
  * ONE fused pass — lowercase, `[a-z0-9]+` tokenization, one xxhash64 per
  * token (Spark's own XXH64, seed 42), and chained pairwise n-gram
  * combination (`xxhash64(acc, next)` semantics), returning
  * ARRAY<BIGINT> of length max(0, tokens − n + 1).
  *
  * Replaces the composed `transform(regexp_extract_all(...), xxhash64)` +
  * `zip_with`-over-slices column pipeline (Dedup.scala round-1..3): that
  * shape was CollapseProject-safe but still ran the per-token hashing and
  * per-shingle combination through interpreted higher-order functions —
  * the hot inner loop of dedup_ngram / dedup_minhash / dedup_clusters /
  * corpus_decontaminate. Shingle VALUES are engine-internal (the DuckDB
  * oracles for those gates re-derive pairs from word strings), so the only
  * requirements are determinism and hash quality, both inherited from
  * Spark's XXH64.
  *
  * `n` must be a foldable positive INT literal. NULL text → NULL.
  */
final case class WordShingleHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING document, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT shingle size")
    else {
      val n = right.eval().asInstanceOf[Int]
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName shingle size must be >= 1, got $n")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hash"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordShingleHash.shingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.WordShingleHash.shingles(
            ${leftGen.value}, ${rightGen.value});
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingleHash =
    copy(left = newLeft, right = newRight)
}

object WordShingleHash {
  private val Token = java.util.regex.Pattern.compile("[a-z0-9]+")
  private val Seed = 42L

  /** Static so generated code calls the same implementation as eval. Token
    * hashes and combines go through Spark's own XxHash64Function, so every
    * value is exactly what the composed `xxhash64(...)` columns produced. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = Token.matcher(s)
    val hs = new java.util.ArrayList[java.lang.Long](64)
    while (m.find()) {
      val tok = UTF8String.fromString(s.substring(m.start, m.end))
      hs.add(XxHash64Function.hash(tok, StringType, Seed))
    }
    val count = hs.size - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      // chained pairwise combine, identical to folding xxhash64(acc, next)
      var acc = hs.get(i).longValue()
      var k = 1
      while (k < n) {
        val h1 = XxHash64Function.hash(acc, LongType, Seed)
        acc = XxHash64Function.hash(hs.get(i + k).longValue(), LongType, h1)
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
