package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharPolyHash, CosineSimilarity, LshSignBucket, MatVec, PackSigns, PqEncode, QuantizedCosine, WordShingleHash}

/** Session extensions: registers graft's native Catalyst expressions so they
  * are callable from SQL and `functions.call_function`. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[QuantizedCosine].getName, "quantized_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "quantized_cosine takes exactly 2 arguments")
        QuantizedCosine(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("char_poly_hash"),
      new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "char_poly_hash takes exactly 1 argument")
        CharPolyHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("mat_vec"),
      new ExpressionInfo(classOf[MatVec].getName, "mat_vec"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "mat_vec takes exactly 2 arguments")
        MatVec(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "pq_encode takes exactly 2 arguments")
        PqEncode(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_sign_bucket"),
      new ExpressionInfo(classOf[LshSignBucket].getName, "lsh_sign_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "lsh_sign_bucket takes exactly 3 arguments")
        LshSignBucket(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("pack_signs"),
      new ExpressionInfo(classOf[PackSigns].getName, "pack_signs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "pack_signs takes exactly 2 arguments")
        PackSigns(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingle_hash"),
      new ExpressionInfo(classOf[WordShingleHash].getName, "word_shingle_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingle_hash takes exactly 2 arguments")
        WordShingleHash(children.head, children(1))
      }))
  }
}
