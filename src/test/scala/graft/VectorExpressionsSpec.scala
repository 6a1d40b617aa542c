package graft

import graft.ext.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native codegen vector expressions must agree exactly with the
  * composed higher-order-function arithmetic (same linear fold, same IEEE
  * op order), work from SQL after registration, and survive both codegen
  * and interpreted evaluation paths.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("native cosine/dot agree bitwise with the composed expressions") {
    val e = Tables(spark, sf0001, "embeddings").limit(50)
    val a = e.alias("a")
    val b = e.alias("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorFunctions.vector_cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("composed"),
        VectorFunctions.vector_dot(col("a.embedding"), col("b.embedding")).as("ndot"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
      assert(!r.isNullAt(2))
    }
  }

  test("fused quantized cosine agrees bitwise with the composed HOF form") {
    // the quantized variant is the oracle-checked one: the kernel must
    // reproduce Spark's half-up rounding and fold order exactly, over
    // every pair of real embeddings incl. negatives near rounding ties
    val e = Tables(spark, sf0001, "embeddings").limit(60)
    val a = e.alias("a")
    val b = e.alias("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosineQuantized(col("a.embedding"), col("b.embedding")).as("kernel"),
        Similarity.cosineQuantizedComposed(col("a.embedding"), col("b.embedding")).as("composed"))
      .collect()
    assert(both.length == 60 * 59 / 2)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"kernel ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("fused hyperplane bucket matches the composed HOF assignment") {
    val e = Tables(spark, sf0001, "embeddings")
    val both = e.select(
        Similarity.hyperplaneBucket(col("embedding"), 8).as("kernel"),
        Similarity.hyperplaneBucketComposed(col("embedding"), 8).as("composed"))
      .collect()
    assert(both.length == 500)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"bucket ${r.getLong(0)} != ${r.getLong(1)}"))
  }

  test("registered SQL functions evaluate") {
    VectorFunctions.register(spark)
    Tables(spark, sf0001, "embeddings").limit(5).createOrReplaceTempView("emb_v")
    val out = spark.sql(
      """SELECT a.vec_id, vector_cosine(a.embedding, b.embedding) AS c,
        |       vector_dot(a.embedding, a.embedding) AS selfdot
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""".stripMargin)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      assert(r.getDouble(2) > 0.0)
    }
    // self-cosine is exactly 1.0 up to rounding of the identical norms
    val self = spark.sql(
      "SELECT vector_cosine(embedding, embedding) FROM emb_v").collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("null and type handling") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.vector_dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0), "null input must yield null")
    // wrong type is an analysis error
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorFunctions.vector_dot(col("a"), col("b"))).collect()
    }
  }

  test("interpreted path (codegen disabled) matches codegen path") {
    val e = Tables(spark, sf0001, "embeddings").limit(10)
    val expr = VectorFunctions.vector_cosine(col("embedding"), reverse(col("embedding")))
    val withCodegen = e.select(expr).collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = e.select(expr).collect().map(_.getDouble(0)).toSeq
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
