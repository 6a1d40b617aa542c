package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the clustering workhorse behind corpus curation ([[SemDedup]]'s
  * cluster stage, [[Ivf]] codebook training, topic bucketing).
  * [[Ivf.train]] runs Lloyd on a driver-side SAMPLE; this is the fully
  * distributed step for when the codebook must see every row.
  *
  * Scale shape — one iteration over 100 TB costs exactly:
  *
  *   1. one corpus scan with a map-side argmax against the broadcast
  *      codebook kernel ([[SemDedup.assignCluster]] — no join, no
  *      shuffle, stays in whole-stage codegen at any k), and
  *   2. one partially-aggregated (map-side combined) reduction whose
  *      key space is k·d (cluster × dimension) — the shuffle moves at
  *      most k·d rows per input partition, independent of corpus size.
  *
  * The driver folds the k·d sufficient statistics into the next
  * codebook — the same sum/count decomposition every distributed
  * k-means uses (e.g. Spark MLlib's KMeans aggregates per-centroid
  * sums), kept integer-exact here so a step is reproducible bit-for-bit
  * in any engine:
  *
  *   - assignment = exact-integer quantized cosine
  *     ([[Similarity.cosineQuantized]]), ties to the lowest centroid id;
  *   - update = sums of 2^20-quantized components — exact integers far
  *     below 2^53, so no float summation-order sensitivity.
  *
  * The reference engine has no clustering surface (its pipeline stops at
  * schema-shaping ingest, `/root/reference/src/load_datawarehouse/
  * schema.py:23-25`); this extends the engine for training-data
  * curation per SURVEY.md §2.6.
  */
object Clustering {

  /** One Lloyd update step, returned as sufficient statistics: assign
    * every point to its nearest codebook centroid, then emit per
    * (cluster, dimension) the EXACT integer sum of the 2^20-quantized
    * components plus the member count. The new centroid mean is
    * `comp_sum / 2^20 / n_members`; returning the integer sums keeps
    * the output engine-portable (the DuckDB oracle recomputes it
    * exactly).
    *
    * Output: `(cluster, pos, comp_sum, n_members)` — k·d rows.
    */
  def lloydStepStats(points: DataFrame,
                     centroids: Array[(Int, Array[Float])],
                     vecCol: String = "embedding",
                     maxDims: Int = Int.MaxValue): DataFrame = {
    require(centroids.nonEmpty, "empty codebook")
    points
      .select(SemDedup.assignCluster(col(vecCol), centroids).as("cluster"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .filter(col("pos") < maxDims)
      .groupBy("cluster", "pos")
      .agg(sum(round(col("x").cast("double") * lit(1048576.0)))
          .cast("long").as("comp_sum"),
        count(lit(1)).as("n_members"))
  }

  /** Full distributed Lloyd training: `iters` step/fold rounds starting
    * from the deterministic seed codebook (the k lowest-id vectors,
    * [[SemDedup.seedCentroids]]). Each round collects only the k·d
    * statistics rows; a cluster that loses all members keeps its
    * previous centroid (the standard empty-cluster policy).
    */
  def train(points: DataFrame, k: Int, iters: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Array[(Int, Array[Float])] = {
    var codebook = SemDedup.seedCentroids(points, k, idCol, vecCol)
    for (_ <- 0 until iters) {
      val next = codebook.map { case (cid, prev) => cid -> prev.clone() }
      lloydStepStats(points, codebook, vecCol).collect().foreach { r =>
        val c = r.getLong(0).toInt
        val p = r.getInt(1)
        next(c)._2(p) =
          (r.getLong(2).toDouble / 1048576.0 / r.getLong(3)).toFloat
      }
      codebook = next
    }
    codebook
  }
}
