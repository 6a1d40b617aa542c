package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - `bruteForceTopK` — the exact baseline: broadcast the (small) query
  *    set, one pass over the corpus, per-query top-k. The corpus is
  *    never shuffled in full: scoring happens map-side against the
  *    broadcast, then only (query, candidate) rows move.
  *  - `lshTopK` — the scale path: sign-of-dot-product against fixed
  *    random hyperplanes buckets both sides; candidates come from the
  *    same bucket only (IVF-style coarse quantization with a hash
  *    codebook). Recall is tested against the brute-force baseline.
  *
  * Dot products and norms are `zip_with`/`aggregate` expressions —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Exact dot product of two double arrays (linear left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Cosine similarity of two float/double vectors (composed higher-order
    * expressions — works for any numeric array type).
    */
  def cosine(a: Column, b: Column): Column = {
    val da = toDouble(a)
    val db = toDouble(b)
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

  /** Native fused cosine kernel for raw `array<float>` columns
    * (graft.functions.CosineSimilarityFloat — codegen'd single loop;
    * bitwise-equal to `cosine`, ~order-of-magnitude less per-pair
    * overhead). Use on embedding columns straight off parquet.
    */
  def cosineFloat(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_cosine(a, b)

  /** Integer-quantized cosine (multiply by 2^20, round half-up): every
    * intermediate is an exact integer-valued double below 2^53, so the
    * result is bit-identical across engines and partitionings — the
    * deterministic variant used for oracle-checked queries. Runs the
    * fused native kernel (graft.functions.CosineQuantizedFloat), which
    * is bit-identical to the composed form below (VectorExpressionsSpec
    * pins the equality on real embeddings).
    */
  def cosineQuantized(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_cosine_quantized(a, b)

  /** The composed higher-order-function form of `cosineQuantized` — kept
    * as the differential-testing reference for the fused kernel.
    */
  def cosineQuantizedComposed(a: Column, b: Column): Column = {
    val qa = transform(a, x => round(x.cast("double") * lit(1048576.0d)))
    val qb = transform(b, x => round(x.cast("double") * lit(1048576.0d)))
    dot(qa, qb) / (sqrt(dot(qa, qa)) * sqrt(dot(qb, qb)))
  }

  /** Deterministic pseudo-random hyperplane weights: integer Weyl-style
    * mixing of (plane, dim) — reproducible everywhere, no RNG state.
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    pmod(((lit(plane.toLong * 64L) + dim) * lit(2654435761L)), lit(1L << 31)) - lit(1L << 30)

  /** Random-hyperplane LSH bucket id: one bit per plane = sign of the
    * dot product with that plane; bucket = the packed bit string.
    * Exact integer arithmetic end to end. Runs the fused native kernel
    * (graft.functions.HyperplaneBucketFloat) — the map-side pass over
    * the whole corpus; identical assignments to the composed form
    * (spec-pinned).
    */
  def hyperplaneBucket(vec: Column, planes: Int = 8): Column =
    graft.functions.VectorFunctions.hyperplane_bucket(vec, planes)

  /** The composed higher-order-function form of `hyperplaneBucket` —
    * kept as the differential-testing reference for the fused kernel.
    */
  def hyperplaneBucketComposed(vec: Column, planes: Int = 8): Column = {
    val dims = sequence(lit(0L), size(vec).cast("long") - 1L)
    val bits = (0 until planes).map { p =>
      val s = aggregate(
        zip_with(transform(vec, x => round(x.cast("double") * lit(1048576.0d))),
          dims, (x, d) => x * planeWeight(p, d).cast("double")),
        lit(0.0d), (acc, x) => acc + x)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b)).cast("long")
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (the common case: a probe/eval set).
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     quantized: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val cos = if (quantized) cosineQuantized(col("qvec"), col("nvec"))
              else cosineFloat(col("qvec"), col("nvec"))
    // two-stage top-k: scores are ranked within (query, scan partition)
    // first, so only each partition's local top-k reaches the per-query
    // global rank — no task ever sorts the whole corpus for one query.
    // Top-k of the union of local top-ks IS the global top-k.
    val wLocal = Window.partitionBy(col("query_id"), col("_p"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"),
        spark_partition_id().as("_p"))
      .withColumn("_lrank", row_number().over(wLocal))
      .filter(col("_lrank") <= k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** LSH-bucketed approximate top-k: both sides bucketed by
    * `hyperplaneBucket`; candidates share a bucket. Multi-probe = union
    * of buckets at Hamming distance ≤ 1 from the query's bucket (flip
    * one bit), which sharply improves recall at 2× candidate cost.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              planes: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneBucket(col(vecCol), planes).as("qbucket"))
    val probes =
      if (!multiProbe) qBase.withColumn("bucket", col("qbucket"))
      else qBase.withColumn("bucket",
          explode(array(col("qbucket") +:
            (0 until planes).map(p => col("qbucket").bitwiseXOR(lit(1L << p))): _*)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineQuantized(col("qvec"), col("nvec")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Per-vector symmetric int8 scale: `max(|x|)/127`, the standard
    * scalar-quantization calibration (one IEEE division — deterministic
    * cross-engine given the same vector).
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Quantize to int8 codes under a pre-staged `scale` column:
    * `round(x/scale)` ∈ [-127, 127]. Stage the scale as its own
    * projection first (interpreted HOFs re-evaluate bound subtrees per
    * element). The zero vector maps to all-zero codes.
    */
  def int8Codes(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0).cast("tinyint")))
      .otherwise(transform(vec,
        x => round(x.cast("double") / scale).cast("tinyint")))

  /** Compressed index for [[int8TopK]]: `(id, scale, codes)` with codes
    * stored as `array<tinyint>` — 4× smaller than float32 at rest and on
    * the wire (the point of scalar quantization at 100 TB: the scan and
    * shuffle move byte codes, floats never leave the writer).
    */
  def int8Index(corpus: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_v"))
      .withColumn("scale", int8Scale(col("_v")))
      .select(col("neighbor_id"), col("scale"),
        int8Codes(col("_v"), col("scale")).as("codes"))

  /** Dequantized dot product of two int8-coded vectors:
    * `(s_a·s_b) · Σ q_a[i]·q_b[i]`. The code dot is exact integer
    * arithmetic (|q|≤127 ⇒ products ≤ 16129, sums far below 2^53); the
    * two trailing multiplies are single IEEE ops — bit-identical across
    * engines, like the ×2^20 quantized-cosine convention.
    */
  def int8Dot(codesA: Column, scaleA: Column,
              codesB: Column, scaleB: Column): Column =
    (scaleA * scaleB) * dot(toDouble(codesA), toDouble(codesB))

  /** Top-k neighbors over the int8-compressed index — the brute-force
    * scorer run on 1/4 the bytes (same broadcast-queries / two-stage
    * top-k shape as [[bruteForceTopK]]; ranking by dequantized dot).
    */
  def int8TopK(index: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("qscale", int8Scale(col("_qv")))
      .select(col("query_id"), col("qscale"),
        int8Codes(col("_qv"), col("qscale")).as("qcodes"))
    val wLocal = Window.partitionBy(col("query_id"), col("_p"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    index.join(broadcast(q0), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        int8Dot(col("qcodes"), col("qscale"), col("codes"), col("scale"))
          .as("score"),
        spark_partition_id().as("_p"))
      .withColumn("_lrank", row_number().over(wLocal))
      .filter(col("_lrank") <= k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Per-class element-wise vector mean — class centroids / prototypes
    * (the aggregation behind prototype classifiers, cluster profiling,
    * and IVF-style seeding from labeled data). One posexplode + one hash
    * aggregation keyed on (label, dimension): partial aggregation
    * collapses each scan partition to ≤ |labels|·dims rows before the
    * shuffle, so the pattern holds at any corpus size.
    *
    * Arithmetic is deterministic cross-engine: each component quantizes
    * to an exact-integer double (×2²⁰, half-up — the `cosineQuantized`
    * convention), sums of those are exact for any realistic group size,
    * and the final single division is one IEEE op.
    */
  def classCentroids(df: DataFrame, labelCol: Column, vecCol: Column,
                     maxDims: Int = Int.MaxValue): DataFrame =
    df.select(labelCol.as("label"), posexplode(vecCol).as(Seq("pos", "x")))
      .filter(col("pos") < maxDims)
      .groupBy("label", "pos")
      .agg((sum(round(col("x").cast("double") * lit(1048576.0)))
        / count(lit(1))).as("centroid_q"))
}
