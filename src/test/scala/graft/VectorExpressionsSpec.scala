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

  test("codebook score kernels agree bitwise with the per-centroid literal composition") {
    val e = Tables(spark, sf0001, "embeddings")
    val codebook = e.orderBy("vec_id").limit(7).collect()
      .map(_.getSeq[Float](1).toArray)
    // the composed forms the kernels replaced: k literal sub-trees
    def litArr(c: Array[Float]) = array(c.map(lit(_)): _*)
    val composedL2 = array(codebook.map { c =>
      val cc = c.map(x => x.toDouble * x.toDouble).sum
      VectorFunctions.vector_dot(col("embedding"), col("embedding")) -
        lit(2.0d) * VectorFunctions.vector_dot(col("embedding"), litArr(c)) + lit(cc)
    }: _*)
    val composedCos = array(codebook.map(c =>
      Similarity.cosineQuantized(col("embedding"), litArr(c))): _*)
    val rows = e.select(
        VectorFunctions.centroid_l2_scores(col("embedding"), codebook).as("kl2"),
        composedL2.as("cl2"),
        VectorFunctions.centroid_cosq_scores(col("embedding"), codebook).as("kcos"),
        composedCos.as("ccos"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val kl2 = r.getSeq[Double](0); val cl2 = r.getSeq[Double](1)
      val kcos = r.getSeq[Double](2); val ccos = r.getSeq[Double](3)
      assert(kl2.length == 7 && kcos.length == 7)
      kl2.zip(cl2).foreach { case (k, c) =>
        assert(java.lang.Double.doubleToLongBits(k) ==
          java.lang.Double.doubleToLongBits(c), s"l2 $k != $c") }
      kcos.zip(ccos).foreach { case (k, c) =>
        assert(java.lang.Double.doubleToLongBits(k) ==
          java.lang.Double.doubleToLongBits(c), s"cosq $k != $c") }
    }
  }

  test("fused nearest-centroid argmax matches the array_position(array_max) form") {
    val spark0 = spark
    import spark0.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val codebook = e.orderBy("vec_id").limit(9).collect()
      .map(_.getSeq[Float](1).toArray)
    val composed = {
      val scores = VectorFunctions.centroid_cosq_scores(col("embedding"), codebook)
      (array_position(scores, array_max(scores)) - 1).cast("long")
    }
    val rows = e.select(
        VectorFunctions.nearest_centroid_cosq(col("embedding"), codebook).as("fused"),
        composed.as("composed"))
      .collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused ${r.getLong(0)} != composed ${r.getLong(1)}"))
    // NaN edge: a zero-norm vector scores NaN against every centroid;
    // Spark sorts NaN greatest, so the FIRST centroid wins in both forms
    val dim = codebook.head.length
    val zero = Seq(Tuple1(Seq.fill(dim)(0.0f))).toDF("embedding")
    val z = zero.select(
      VectorFunctions.nearest_centroid_cosq(col("embedding"), codebook).as("fused"),
      composed.as("composed")).head()
    assert(z.getLong(0) == z.getLong(1))
    // tie edge: duplicated centroid -> lowest id wins in both forms
    val dupBook = Array(codebook(3), codebook(3), codebook(0))
    val composedDup = {
      val scores = VectorFunctions.centroid_cosq_scores(col("embedding"), dupBook)
      (array_position(scores, array_max(scores)) - 1).cast("long")
    }
    val t = e.select(
        VectorFunctions.nearest_centroid_cosq(col("embedding"), dupBook).as("fused"),
        composedDup.as("composed"))
      .collect()
    t.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("codebook score kernels stay flat at k in the thousands") {
    // the literal composition chokes Catalyst analysis at large k; the
    // kernel must plan and run with a 2000-centroid codebook untouched
    val e = Tables(spark, sf0001, "embeddings")
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val codebook = Array.tabulate(2000, dim)((j, d) =>
      ((j * 31 + d * 7) % 13 - 6).toFloat / 6.0f)
    val assigned = e.select(
        (array_position(
          VectorFunctions.centroid_cosq_scores(col("embedding"), codebook),
          array_max(VectorFunctions.centroid_cosq_scores(col("embedding"), codebook)))
          - 1).cast("long").as("cluster"))
      .groupBy("cluster").count().collect()
    assert(assigned.map(_.getLong(1)).sum == 500L)
    assert(assigned.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 2000))
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
    val codebook = e.orderBy("vec_id").limit(5).collect()
      .map(_.getSeq[Float](1).toArray)
    val projections = Seq(
      VectorFunctions.vector_cosine(col("embedding"), reverse(col("embedding"))),
      VectorFunctions.centroid_l2_scores(col("embedding"), codebook).cast("string"),
      VectorFunctions.centroid_cosq_scores(col("embedding"), codebook).cast("string"),
      VectorFunctions.nearest_centroid_cosq(col("embedding"), codebook).cast("string"),
      graft.functions.SketchFunctions.masked_keep(
        split(lit("a b c d e"), " "), array(lit(1), lit(3))).cast("string"))
    def run() = e.select(projections: _*).collect()
      .map(r => (0 until projections.size).map(r.get(_).toString)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(withCodegen == run())
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("native ADC distance agrees bitwise with the composable HOF fold " +
    "and survives both evaluation paths") {
    import graft.ext.{IvfPq, Pq}
    val e = Tables(spark, sf0001, "embeddings").limit(200)
    val model = IvfPq.train(e, "embedding", nCentroids = 4, m = 8)
    val encoded = Pq.encode(e, model.pq)
      .withColumn("_tables",
        Pq.queryTables(col("nvec"), model.pq))
    def run(): Seq[(Long, Long)] = encoded
      .select(col("neighbor_id"),
        Pq.adcDistance(col("_tables"), col("codes")).as("native"),
        Pq.adcDistanceComposable(col("_tables"), col("codes")).as("composed"))
      .collect().toSeq.map { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"native ${r.getDouble(1)} != composed ${r.getDouble(2)}")
        (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    val withCodegen = run()
    assert(withCodegen.nonEmpty)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(withCodegen == run())
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
