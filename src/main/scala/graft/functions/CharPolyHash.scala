package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-neutral char-polynomial token
  * hash used by the DuckDB-provable oracle twins (OracleVariants) —
  *
  *   fold over code points: acc ← (acc·31 + cp) mod 1000000007, seed 7
  *
  * — i.e. exactly DuckDB's
  * `list_reduce(list_prepend(7, list_transform(string_split_regex(w, ''),
  * c -> ascii(c))), (acc, x) -> (acc*31 + x) % 1000000007)`.
  *
  * Exists because the composed column-expression form
  * (`aggregate(filter(split(w, '')), ...)`) builds a per-CHARACTER
  * interpreted expression tree — it was the dominant cost of the minhash/
  * simhash oracle twins. This expression does the same fold in one tight
  * loop (ASCII fast path over raw UTF8 bytes; code-point fallback), and
  * participates in whole-stage codegen via a static call.
  *
  * NULL in, NULL out. Empty string hashes to the seed (7).
  */
final case class CharPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "char_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    CharPolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  val Mod: Long = 1000000007L
  val Seed: Long = 7L
  val Mult: Long = 31L

  /** Static so generated code can call it (Scala emits a static forwarder
    * on the companion class). acc stays < Mod ≈ 2³⁰, so acc·31 + cp is
    * far from Long overflow. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = Seed
    var i = 0
    var ascii = true
    while (i < n && ascii) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else {
        acc = (acc * Mult + b) % Mod
        i += 1
      }
    }
    if (ascii) acc
    else {
      // non-ASCII: fold UNICODE CODE POINTS (what DuckDB's ascii(c) yields
      // for a single-char string), not UTF-8 bytes
      val str = s.toString
      acc = Seed
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * Mult + cp) % Mod
        j += Character.charCount(cp)
      }
      acc
    }
  }
}
