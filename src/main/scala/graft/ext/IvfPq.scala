package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed ANN scale recipe (Jégou et al. 2011 §V:
  * inverted file + product codes): [[Ivf]] partitions the corpus into
  * centroid cells so a probe touches ~nProbe/nCentroids of the data, and
  * [[Pq]] compresses what the probe scans from 4·D bytes to `m` bytes
  * per vector. Together they bound BOTH the fraction of the corpus a
  * query reads and the bytes per row it reads — at 100 TB the probed
  * cells' code columns fit in executor memory where raw vectors never
  * would.
  *
  * Codes here quantize the RAW vectors under one global PQ codebook
  * (FAISS's `by_residual=false` configuration) rather than per-cell
  * residuals: the codebook stays shared (one broadcast object), encoding
  * stays a single map-side pass, and the exact-rescore stage makes the
  * recall difference immaterial — the sketch only decides WHICH rows get
  * rescored, exactly as in [[Pq.topK]].
  *
  * Index layout = [[Ivf]]'s: persist partitioned by `centroid`
  * ([[Ivf.writeIndex]] works unchanged on the coded index) and the probe
  * prunes partitions statically.
  */
object IvfPq {

  final case class Model(ivf: Ivf.Model, pq: Pq.Model)

  /** Train both codebooks on the same seeded bounded sample discipline. */
  def train(corpus: DataFrame, vecCol: String, nCentroids: Int, m: Int,
            k: Int = 16, sampleSize: Int = 4096, iterations: Int = 8,
            seed: Long = 42L): Model =
    Model(Ivf.train(corpus, vecCol, nCentroids, sampleSize, iterations, seed),
      Pq.train(corpus, vecCol, m, k, sampleSize, iterations, seed))

  /** Build the coded inverted file: `(neighbor_id, nvec, codes,
    * centroid)` — one map-side pass (both assignments are broadcast-
    * codebook kernels). At scale persist `(neighbor_id, codes)`
    * partitioned by `centroid` as the scan table and fetch candidate
    * vectors by id for the rescore; the vector rides along here to keep
    * the gate a single join.
    */
  def index(corpus: DataFrame, model: Model, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame =
    Pq.encode(corpus, model.pq, idCol, vecCol)
      .withColumn("centroid", Ivf.assignCol(col("nvec"), model.ivf))

  /** Approximate top-k: each query probes its `nProbe` nearest cells,
    * ADC over the codes prunes the probed rows to `nCandidates`, exact
    * quantized cosine re-ranks only those. The candidate prune is
    * two-stage (per-partition then global, the [[Pq.topK]] device) so no
    * task ever sorts a whole cell for one query.
    */
  def topK(indexed: DataFrame, queries: DataFrame, model: Model, k: Int,
           nProbe: Int = 2, nCandidates: Int = 64, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame =
    rank(Ivf.probes(queries, model.ivf, nProbe, idCol, vecCol), indexed,
      model, k, nCandidates)

  /** [[topK]] over a PERSISTED partitioned index with static partition
    * pruning — the query batch's probe-cell union is collected
    * driver-side (a few ints, the batch broadcasts anyway) and pushed as
    * a partition filter, so the scan reads only the probed directories.
    */
  def topKPruned(indexed: DataFrame, queries: DataFrame, model: Model,
                 k: Int, nProbe: Int = 2, nCandidates: Int = 64,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val q = Ivf.probes(queries, model.ivf, nProbe, idCol, vecCol)
    val probeSet = q.select("centroid").distinct().collect().map(_.getInt(0))
    rank(q, indexed.filter(col("centroid").isin(probeSet.toSeq: _*)),
      model, k, nCandidates)
  }

  /** The ADC prune runs over a SKINNY projection — `(query_id,
    * neighbor_id, _adc, _p)`, ~28 bytes/row — so the two candidate-prune
    * window shuffles never carry the d=64 vectors (~20× the row) or the
    * codes (which die map-side with `_adc`). The pruned candidate set is
    * ≤ nCandidates·|queries| rows; it BROADCASTS back against the index
    * for the vector fetch, so the rescore is a semi-join-shaped scan
    * with no wide shuffle. Measured in the r8 ANN sweep: at 1.25 M
    * vectors this restructure plus the codegen ADC kernel took the
    * query batch 14.0 s → ~2 s (the wide-row form shuffled ~1.5 kB/row
    * through three windows).
    *
    * Output-identical to the wide form: the two-stage top-n is the
    * global ADC top-nCandidates (partition-invariant), and the rescore
    * reads the same vectors by id.
    */
  private def rank(probed: DataFrame, indexed: DataFrame, model: Model,
                   k: Int, nCandidates: Int): DataFrame = {
    val q = probed.withColumn("_tables", Pq.queryTables(col("qvec"), model.pq))
    val wLocal = Window.partitionBy(col("query_id"), col("_p"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val candidates = broadcast(q.select("query_id", "centroid", "_tables"))
      .join(indexed.select("centroid", "neighbor_id", "codes"), Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Pq.adcDistance(col("_tables"), col("codes")).as("_adc"),
        spark_partition_id().as("_p"))
      .withColumn("_lrank", row_number().over(wLocal))
      .filter(col("_lrank") <= nCandidates)
      .withColumn("_crank", row_number().over(wAdc))
      .filter(col("_crank") <= nCandidates)
      .select("query_id", "neighbor_id")
    broadcast(candidates)
      .join(indexed.select("neighbor_id", "nvec"), Seq("neighbor_id"))
      .join(broadcast(probed.select("query_id", "qvec")
        .dropDuplicates("query_id")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineQuantized(col("qvec"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** The TWO-TABLE persisted layout [[Pq.encode]]'s scaladoc promises:
    * `codes/` holds `(neighbor_id, codes, centroid)` partitioned by
    * centroid — m bytes of payload per row, the table the ADC prune
    * scans — and `vectors/` holds `(neighbor_id, nvec)` — touched ONLY
    * by the rescore's bounded fetch-by-id. The single-table index ships
    * every probed row's raw vector through the scan just to rescore
    * ≤ nCandidates of them; at 100 TB that is the difference between
    * scanning m bytes/row and 4·D bytes/row over the probed cells.
    */
  def writeIndexCompact(corpus: DataFrame, model: Model, path: String,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): Unit = {
    // checkpoint before the two projections: `index` is lazy, so writing
    // codes/ and vectors/ from the raw plan would run the full
    // encode + centroid-assign pass over the corpus TWICE — at 100 TB
    // that doubles the build, the one cost this layout exists to pay
    // exactly once
    val indexed = index(corpus, model, idCol, vecCol).localCheckpoint()
    try {
      indexed.select("neighbor_id", "codes", "centroid")
        .write.mode("overwrite").partitionBy("centroid").parquet(s"$path/codes")
      indexed.select("neighbor_id", "nvec")
        .write.mode("overwrite").parquet(s"$path/vectors")
    } finally
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(indexed)
  }

  /** [[topKPruned]] over the compact two-table layout: the ADC prune
    * scans ONLY the codes table (statically partition-pruned to the
    * probed cells), and the rescore pushes the bounded candidate-id set
    * as a scan filter on the vectors table (ids collected driver-side —
    * ≤ nCandidates·|queries| values, the batch broadcasts anyway), so
    * neither stage ever reads a raw vector it doesn't rescore. Ids are
    * collected as untyped values, so any id type the index was written
    * with (long, int, string) round-trips into the pushed filter.
    *
    * CALLER OBLIGATION: the returned DataFrame is backed by a
    * `localCheckpoint` (the candidate prune must materialize before its
    * ids can be pushed into the vectors scan); when finished with the
    * result, release its block-manager storage with
    * `GraftColumnBridge.unpersistCheckpoint(result)` — the same contract
    * as [[graft.ext.Dedup.releaseComponents]].
    */
  def topKPrunedCompact(spark: org.apache.spark.sql.SparkSession,
                        path: String, queries: DataFrame, model: Model,
                        k: Int, nProbe: Int = 2, nCandidates: Int = 64,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val probed = Ivf.probes(queries, model.ivf, nProbe, idCol, vecCol)
    val probeSet = probed.select("centroid").distinct().collect()
      .map(_.getInt(0))
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("centroid").isin(probeSet.toSeq: _*))
    val q = probed.withColumn("_tables", Pq.queryTables(col("qvec"), model.pq))
    val wLocal = Window.partitionBy(col("query_id"), col("_p"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("_adc").asc, col("neighbor_id"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val candidates = broadcast(q.select("query_id", "centroid", "_tables"))
      .join(codes, Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Pq.adcDistance(col("_tables"), col("codes")).as("_adc"),
        spark_partition_id().as("_p"))
      .withColumn("_lrank", row_number().over(wLocal))
      .filter(col("_lrank") <= nCandidates)
      .withColumn("_crank", row_number().over(wAdc))
      .filter(col("_crank") <= nCandidates)
      .select("query_id", "neighbor_id").localCheckpoint()
    // untyped collect: the vectors table's id column keeps whatever type
    // the corpus id had (long, int, string) — getLong would CCE on any
    // non-long id even though the API is generic in idCol
    val candIds = candidates.select("neighbor_id").distinct()
      .collect().map(_.get(0))
    val fetched = spark.read.parquet(s"$path/vectors")
      .filter(col("neighbor_id").isin(candIds.toSeq: _*))
    val out = broadcast(candidates)
      .join(fetched, Seq("neighbor_id"))
      .join(broadcast(probed.select("query_id", "qvec")
        .dropDuplicates("query_id")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineQuantized(col("qvec"), col("nvec")).as("cos"))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
    val detached = out.localCheckpoint()
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(candidates)
    detached
  }
}
