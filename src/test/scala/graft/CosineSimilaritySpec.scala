package graft

import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine_similarity matches the composed zip_with formulation") {
    val df = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = df.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    def dotc(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val da = transform(col("ea"), v => v.cast("double"))
    val db = transform(col("eb"), v => v.cast("double"))
    val out = pairs.select(
      call_function("cosine_similarity", col("ea"), col("eb")).as("native"),
      (dotc(da, db) / (sqrt(dotc(da, da)) * sqrt(dotc(db, db)))).as("composed"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("cosine_similarity null semantics: null input and zero vector") {
    val out = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 2.0d), CAST(NULL AS ARRAY<DOUBLE>)) AS a,
        |       cosine_similarity(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS b,
        |       cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c
        |""".stripMargin).head()
    assert(out.isNullAt(0))
    assert(out.isNullAt(1))
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-12)
  }

  test("quantized_cosine matches the interpreted integer formulation exactly") {
    // the fused expression must be BIT-IDENTICAL to the aggregate(zip_with)
    // integer math it replaced — exact long dot/norms, one IEEE div+sqrt —
    // or the DuckDB oracle twin's hash gate breaks
    val q = (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * 1000).cast("long"))
    val df = graft.sources.Tables.embeddings(spark, sfDir).limit(40)
      .select(col("vec_id"), q(col("embedding")).as("v"))
    val a = df.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = df.select(col("vec_id").as("ib"), col("v").as("vb"))
    def idot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0L), (acc, v) => acc + v)
    val out = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        call_function("quantized_cosine", col("va"), col("vb")).as("native"),
        (idot(col("va"), col("vb")).cast("double") /
          sqrt(greatest(idot(col("va"), col("va")) * idot(col("vb"), col("vb")), lit(1L))
            .cast("double"))).as("composed"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not atol
  }

  test("quantized_cosine null and type semantics") {
    val out = spark.sql(
      """SELECT quantized_cosine(array(1L, 2L), CAST(NULL AS ARRAY<BIGINT>)) AS a,
        |       quantized_cosine(array(0L, 0L), array(1L, 2L)) AS b,
        |       quantized_cosine(array(3L, 4L), array(3L, 4L)) AS c
        |""".stripMargin).head()
    assert(out.isNullAt(0))
    assert(out.getDouble(1) == 0.0) // zero norm → max(na*nb,1) guard, not null
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-12)
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT quantized_cosine(array(1.0d), array(2.0d))").collect())
    // unequal lengths follow DuckDB list arithmetic: dot over the shared
    // prefix, each NORM over its side's FULL vector
    val uneq = spark.sql(
      "SELECT quantized_cosine(array(3L, 4L), array(3L, 4L, 12L)) AS c").head()
    assert(uneq.getDouble(0) == 25.0 / 65.0) // 25 / sqrt(25 * 169), exact
    // norm product forms in double: magnitudes that overflow Long stay finite
    val big = spark.sql(
      "SELECT quantized_cosine(array_repeat(30000L, 64), array_repeat(30000L, 64)) AS c")
      .head().getDouble(0)
    assert(math.abs(big - 1.0) < 1e-12)
  }

  test("char_poly_hash matches the composed aggregate(split) formulation") {
    // the native expression replaced the per-character interpreted tree; it
    // must produce IDENTICAL values or the minhash/simhash oracle twins'
    // hash gates break
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(100)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
    val composed = aggregate(
      filter(split(col("w"), ""), ch => length(ch) > 0),
      lit(7L),
      (acc, ch) => (acc * lit(31L) + ascii(ch)) % lit(1000000007L))
    val out = docs
      .select(call_function("char_poly_hash", col("w")).as("native"),
        composed.as("composed"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // non-ASCII inputs fold code points (DuckDB ascii() semantics); empty = seed
    def ref(s: String): Long = {
      var acc = 7L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); acc = (acc * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    val row = spark.sql("SELECT char_poly_hash('héllo✓') AS h, char_poly_hash('') AS e").head()
    assert(row.getLong(0) == ref("héllo✓"))
    assert(row.getLong(1) == 7L)
  }

  test("cosine_similarity is usable from SQL and survives codegen") {
    graft.sources.Tables.embeddings(spark, sfDir).limit(10)
      .createOrReplaceTempView("emb_tmp")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS cos
        |FROM emb_tmp a JOIN emb_tmp b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("cos").isNotNull).count()
    assert(n == 45)
  }

  test("mat_vec matches the higher-order transform/dot formulation") {
    val m: Seq[Seq[Double]] = Seq(
      Seq(1.0, 2.0, -3.0, 0.5),
      Seq(0.0, -1.0, 4.0, 2.5),
      Seq(7.0, 0.25, 0.0, -2.0))
    val mLit = typedlit(m)
    val df = Seq(
        (1L, Seq(1.0f, 0.0f, 2.0f, -1.0f)),
        (2L, Seq(-2.5f, 3.0f, 0.5f, 4.0f)))
      .toDF("id", "v")
    val out = df.select(
        call_function("mat_vec", mLit, col("v")).as("native"),
        transform(mLit, row =>
          aggregate(zip_with(row, transform(col("v"), x => x.cast("double")),
            (a, b) => a * b), lit(0.0), (acc, z) => acc + z)).as("composed"))
      .collect()
    out.foreach { r =>
      val n = r.getSeq[Double](0); val c = r.getSeq[Double](1)
      assert(n.size == 3 && c.size == 3)
      n.zip(c).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
    // null vector -> null result; interpreted eval path (no codegen via
    // a plain Column outside wholestage) agrees with the codegen'd one
    val nul = df.select(call_function("mat_vec", mLit,
      when(col("id") === 99L, col("v")).otherwise(lit(null)
        .cast("array<float>"))).as("r")).collect()
    nul.foreach(r => assert(r.isNullAt(0)))
  }
}
