package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression scale path of the
  * ANN family (Jégou et al., "Product quantization for nearest neighbor
  * search", TPAMI 2011), beside the hash path (`Similarity.lshTopK`) and
  * the partition path (`Ivf`).
  *
  * A D-dim float vector (4·D bytes) compresses to `m` one-byte codes:
  * the vector splits into `m` sub-vectors, each snapped to its nearest
  * of `k ≤ 256` per-subspace centroids. At 100 TB that turns a 256-dim
  * corpus (1 KiB/vector) into 8-16 bytes/vector — the difference between
  * scanning the corpus from disk and holding the codes in executor
  * memory.
  *
  * Search is asymmetric-distance (ADC): the RAW query precomputes an
  * m×k table of sub-distances ONCE (query-side projection), and each
  * corpus row's approximate distance is m table lookups + adds over its
  * codes — no float vector is read on the scan side. ADC prunes to
  * `nCandidates`; exact (integer-quantized) cosine re-ranks only those,
  * so the emitted ranking is exact arithmetic over the true vectors and
  * the sketch only decides WHICH rows get rescored.
  *
  * Train/encode reuse the IVF discipline: seeded bounded driver sample,
  * Lloyd per subspace, assignment defined once and shared.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j. */
  final case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Per-subspace Lloyd's k-means on one bounded driver-side sample
    * (seeded top-n under a random key — no count pass, same recipe as
    * `Ivf.train`).
    */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int = 16,
            sampleSize: Int = 4096, iterations: Int = 8,
            seed: Long = 42L): Model = {
    require(k <= 256, "PQ codes are byte-sized: k must be <= 256")
    val sample = corpus.select(vecCol).orderBy(rand(seed).asc)
      .limit(sampleSize).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sd = dim / m
    val codebooks = (0 until m).toArray.map { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sd, (j + 1) * sd))
      var cs = subs.take(math.min(k, subs.length)).map(_.clone())
      for (_ <- 1 to iterations) {
        val sums = Array.fill(cs.length)(new Array[Double](sd))
        val counts = new Array[Long](cs.length)
        subs.foreach { v =>
          val c = nearestSub(v, cs)
          counts(c) += 1
          var d = 0
          while (d < sd) { sums(c)(d) += v(d); d += 1 }
        }
        cs = cs.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else {
            val out = new Array[Float](sd)
            var d = 0
            while (d < sd) { out(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
            out
          }
        }
      }
      cs
    }
    Model(codebooks)
  }

  private def nearestSub(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      var d2 = 0.0; var d = 0
      while (d < v.length) { val x = v(d) - cs(c)(d); d2 += x * x; d += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Encode a vector to its m byte codes (0-based ints; argmin of
    * `c·c − 2·sub·c` — the |sub−c|² argmin with the constant sub·sub
    * dropped — ties to the lowest code). One fused kernel with the
    * codebook grid as a reference object: the literal-plan form (m×k
    * centroid arrays + a dot sub-tree each) generated 12k lines of
    * Java that janino refused to compile, silently dropping the whole
    * stage to interpreted mode.
    */
  def encodeCol(vec: Column, model: Model): Column =
    graft.functions.PqFunctions.pq_encode(vec, model.codebooks)

  /** The query-side ADC table: m arrays of k exact sub-distances
    * (including the sub·sub term so the summed ADC is a true |q−ĉ|²).
    * Stage as its own projection — computed once per query. Same fused
    * kernel treatment (and identical accumulation order) as
    * [[encodeCol]].
    */
  def queryTables(qvec: Column, model: Model): Column =
    graft.functions.PqFunctions.pq_adc_tables(qvec, model.codebooks)

  /** ADC distance: sum over subspaces of the table entry the row's code
    * selects — m lookups + adds per corpus row, no vector access. The
    * codegen kernel ([[graft.functions.PqExpressions]] `PqAdcDistance`):
    * this runs once per PROBED ROW, and the interpreted
    * `aggregate(zip_with(...))` chain it replaces dominated IVF-PQ query
    * cost at scale (r8 ANN sweep — 14.0 s vs 1.3 s plain-IVF on equal
    * probed volume). [[adcDistanceComposable]] is the executable oracle.
    */
  def adcDistance(tables: Column, codes: Column): Column =
    graft.functions.PqFunctions.pq_adc_distance(tables, codes)

  /** The composable-HOF twin of [[adcDistance]] — same left-fold order,
    * bit-identical scores; kept as the differential-spec oracle.
    */
  private[graft] def adcDistanceComposable(tables: Column, codes: Column): Column =
    aggregate(zip_with(tables, codes, (t, c) => element_at(t, c + 1)),
      lit(0.0d), (acc, x) => acc + x)

  /** Corpus + codes. At scale persist (id, codes) as the compact scan
    * table and fetch candidate vectors by id for the rescore; here the
    * vector rides along to keep the gate a single join.
    */
  def encode(corpus: DataFrame, model: Model, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .withColumn("codes", encodeCol(col("nvec"), model))

  /** Approximate top-k: ADC prunes to `nCandidates` per query over the
    * codes, exact quantized cosine re-ranks the candidates.
    */
  def topK(encoded: DataFrame, queries: DataFrame, model: Model, k: Int,
           nCandidates: Int = 64, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("_tables", queryTables(col("qvec"), model))
    // two-stage prune so no task ever sorts the whole corpus for one
    // query: stage 1 ranks within (query, input partition) — the ADC
    // scores never leave the scan task's hash bucket granularity — and
    // only each partition's local top-nCandidates reach the per-query
    // stage-2 rank (≤ nCandidates·partitions rows per query). Top-k of
    // the union of local top-ks is exactly the global top-k.
    val wLocal = Window.partitionBy(col("query_id"), col("_p"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // skinny prune + fetch-by-id rescore (the IvfPq.rank device): the
    // per-corpus-row window shuffles carry (ids, _adc) — never the
    // vectors — and only the bounded survivor set rejoins for vectors.
    val candidates = encoded.select("neighbor_id", "codes")
      .join(broadcast(q.select("query_id", "_tables")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcDistance(col("_tables"), col("codes")).as("_adc"),
        spark_partition_id().as("_p"))
      .withColumn("_lrank", row_number().over(wLocal))
      .filter(col("_lrank") <= nCandidates)
      .withColumn("_crank", row_number().over(wAdc))
      .filter(col("_crank") <= nCandidates)
      .select("query_id", "neighbor_id")
    broadcast(candidates)
      .join(encoded.select("neighbor_id", "nvec"), Seq("neighbor_id"))
      .join(broadcast(q.select("query_id", "qvec")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineQuantized(col("qvec"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
