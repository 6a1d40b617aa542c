package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication — cluster-then-prune over an embedding column
  * (the SemDeDup recipe, Abbas et al. 2023, arXiv:2303.09540: k-means
  * the corpus, then drop near-identical members WITHIN each cluster).
  * This is the embedding-space sibling of the lexical near-dup family in
  * [[Dedup]]: MinHash catches verbatim overlap, semantic dedup catches
  * paraphrases/translations/templated rewrites that share no tokens.
  *
  * Scale shape (never globally pairwise):
  *
  *   1. ASSIGN — every vector gets its nearest codebook centroid via a
  *      map-side argmax over the broadcast-codebook score kernel (the
  *      [[Ivf]] assignment pattern): one narrow pass, no shuffle beyond
  *      the cluster key.
  *   2. PRUNE — candidate pairs exist only INSIDE a cluster, so the
  *      pairwise cost is Σ|cluster|², bounded by the codebook size and
  *      cluster balance (at 100 TB you size k so clusters fit a
  *      partition — the published algorithm's own contract). The
  *      cluster-local join shuffles each side once on the cluster id.
  *
  * A member is a duplicate iff some LOWER-id member of the same cluster
  * has quantized cosine ≥ τ with it — the deterministic keep-first rule
  * (keep the lowest id of every near-dup set reachable through kept
  * predecessors is the greedy SemDeDup policy; flagging against ANY
  * predecessor is its superset with an engine-portable closed form).
  * All arithmetic is the exact-integer quantized cosine
  * ([[Similarity.cosineQuantized]]), so results are bit-identical across
  * engines and partitionings.
  */
object SemDedup {

  /** Deterministic seed codebook: the embeddings of the `k` lowest-id
    * vectors, centroid id = rank in that order (0-based). A fixed,
    * recomputable-anywhere codebook for oracle-checked runs; swap in
    * [[Ivf.train]]'s k-means model when codebook quality matters more
    * than cross-engine determinism.
    */
  def seedCentroids(corpus: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Array[(Int, Array[Float])] =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).toArray }

  /** Nearest-centroid id by quantized cosine (ties → lowest centroid id),
    * computed map-side: the whole codebook rides as ONE broadcast
    * reference object inside the fused
    * [[graft.functions.NearestCentroidCosQ]] kernel — argmax runs in
    * the same loop as the scores, so no per-row score array
    * materializes (at k = 10⁴ the array form allocates ~80 KB per row)
    * and the plan stays a single node at any k. Assignment is pinned
    * bit-identical to the composed `array_position(array_max)` form in
    * VectorExpressionsSpec.
    */
  def assignCluster(vec: Column, centroids: Array[(Int, Array[Float])]): Column =
    graft.functions.VectorFunctions.nearest_centroid_cosq(
      vec, centroids.map(_._2))

  /** Corpus + `cluster` + `is_dup`: `is_dup` marks members with a
    * lower-id same-cluster neighbor at quantized cosine ≥ `tau`.
    */
  def flagDuplicates(corpus: DataFrame, centroids: Array[(Int, Array[Float])],
                     tau: Double, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val m = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cluster", assignCluster(col("v"), centroids))
    val earlier = m.select(col("cluster").as("_ecluster"),
      col("id").as("_eid"), col("v").as("_ev"))
    // cluster-local pair generation: EQUI-join on the cluster id + id
    // inequality as a join filter (never a cartesian across clusters);
    // dup flag folds in one distinct
    val dups = m.join(earlier,
        col("cluster") === col("_ecluster") && col("_eid") < col("id"))
      .filter(Similarity.cosineQuantized(col("v"), col("_ev")) >= tau)
      .select(col("id")).distinct().withColumn("_d", lit(true))
    m.join(dups, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("_d"), lit(false)).as("is_dup"))
  }

  /** Per-cluster summary `(cluster, n_members, n_dups)` — the audit
    * report form (O(k) output rows regardless of corpus size).
    */
  def report(corpus: DataFrame, centroids: Array[(Int, Array[Float])],
             tau: Double, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    flagDuplicates(corpus, centroids, tau, idCol, vecCol)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))

  /** The keep-set: members not flagged as duplicates (the SemDeDup
    * output a training run consumes).
    */
  def deduplicate(corpus: DataFrame, centroids: Array[(Int, Array[Float])],
                  tau: Double, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    corpus.join(
      flagDuplicates(corpus, centroids, tau, idCol, vecCol)
        .filter(!col("is_dup")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
}
