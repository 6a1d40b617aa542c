package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly sampling for training pipelines: reproducible
  * train/test splits and exact-n stratified samples.
  *
  * A training split must be a pure function of record CONTENT — stable
  * under repartitioning, reruns, engine changes, and dataset growth
  * (a document keeps its split when new data arrives). Random-number
  * splits have none of these properties; hash splits have all of them.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from the md5 of a key, via a
    * small polynomial over the first four hex characters. md5 and ascii
    * are available in every engine (unlike xxhash64), so the SAME
    * assignment is computable in DuckDB/Trino/BigQuery SQL — the split
    * can be audited outside Spark. Uniform to ~1/4096 over 16⁴ hex
    * combinations, plenty for split percentages.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    val hex = md5(key.cast("string"))
    val poly = (1 to 4).map(i => ascii(substring(hex, i, 1)) * lit(math.pow(31, 4 - i).toLong))
      .reduce(_ + _)
    pmod(poly, lit(buckets)).cast("int")
  }

  /** Membership flag: true ⇒ test split (bucket < testPercent). */
  def isTest(key: Column, testPercent: Int, buckets: Int = 100): Column =
    hashBucket(key, buckets) < testPercent

  /** (train, test) pair under the hash split — two filters over the same
    * scan, no shuffle, no materialization.
    */
  def splitByHash(df: DataFrame, key: Column, testPercent: Int): (DataFrame, DataFrame) =
    (df.filter(!isTest(key, testPercent)), df.filter(isTest(key, testPercent)))

  /** Weighted mixture of sources — the domain-weighting step of a
    * training mix: keep a deterministic hash fraction of each source
    * (weight quantized to `1/buckets`), union the kept rows. Membership
    * is content-determined (`hashBucket`), so re-running the mix —
    * or recomputing it in another engine — selects the same rows.
    * Two filters and a union: no shuffle.
    */
  def weightedMixture(sources: Seq[(DataFrame, Double)], key: Column,
                      buckets: Int = 100): DataFrame = {
    require(sources.nonEmpty, "no sources")
    sources.map { case (df, w) =>
      require(w >= 0.0 && w <= 1.0, s"weight $w outside [0,1]")
      df.filter(hashBucket(key, buckets) < math.round(w * buckets).toInt)
    }.reduce(_ unionByName _)
  }

  /** Token-budget corpus mixing — the planning step of a training mix:
    * given per-group TOKEN budgets (not row fractions — what actually
    * matters for a token-budgeted training run), derive each group's
    * deterministic sampling rate `min(1, budget/total_tokens)` and
    * materialize the mix by [[hashBucket]] membership. Groups without a
    * budget pass through whole.
    *
    * Scale: one partial-aggregable pass for the per-group totals
    * (|groups| rows to the driver — counts, not data), then a single
    * filter over the corpus — no shuffle, no join; membership is
    * content-determined (md5), so the same rows select in any engine
    * and on any partitioning. Rates quantize to `1/buckets` by FLOOR,
    * so quantization never overshoots a budget (hash variance of
    * ±O(1/√n) per group still applies — budgets are targets, not hard
    * caps) — except that a NONZERO budget keeps a minimum of one
    * bucket, so a tiny budget under-fills rather than silently dropping
    * its group.
    */
  def tokenBudgetMix(docs: DataFrame, grpCol: Column, tokenCount: Column,
                     key: Column, budgets: Map[String, Long],
                     buckets: Int = 4096): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    // a null group key or an all-NULL token sum must not NPE the
    // planning pass: null groups carry no budget (they pass through
    // whole, like any unbudgeted group) and a null sum counts as 0
    val totals = docs
      .select(grpCol.as("grp"), tokenCount.as("tok"))
      .groupBy("grp").agg(sum(col("tok")).as("total"))
      .collect()
      .flatMap(r => Option(r.getString(0))
        .map(_ -> (if (r.isNullAt(1)) 0L else r.getLong(1))))
      .toMap
    val rateBuckets: Map[String, Int] = budgets.map { case (g, b) =>
      val total = totals.getOrElse(g, 0L)
      val rate = if (total == 0L) 1.0
        else math.min(1.0, b.toDouble / total.toDouble)
      // floor quantization, but a NONZERO budget keeps at least one
      // bucket — a tiny budget must under-fill, not silently drop the
      // whole group
      val rb = math.floor(rate * buckets).toInt
      g -> (if (b > 0L && rb == 0) 1 else rb)
    }
    val cap = rateBuckets.foldLeft(lit(buckets)) { case (acc, (g, rb)) =>
      when(grpCol === g, lit(rb)).otherwise(acc)
    }
    docs.filter(hashBucket(key, buckets) < cap)
  }

  /** Temperature-based source mixing — the multilingual α-sampling of
    * XLM-R (Conneau et al. 2020 §3.1) / mT5: a source is sampled with
    * probability ∝ n_s^α, so α < 1 upweights low-resource sources
    * relative to their natural share and α = 1 is proportional
    * sampling. Per-source doc counts n_s reweight to
    * w_s = n_s^α / Σ_t n_t^α; a total target of `targetDocs` documents
    * gives the per-source rate min(1, targetDocs·w_s / n_s), which
    * materializes by [[hashBucket]] membership (content-determined —
    * the same rows select in any engine and on any partitioning).
    *
    * Scale: one partial-aggregable count pass (|sources| rows to the
    * driver), then a single filter — no shuffle, no join (the x51
    * shape). Rates floor-quantize to `1/buckets` with the same
    * nonzero-target-keeps-one-bucket rule as [[tokenBudgetMix]];
    * documents with a NULL source carry no weight and drop.
    */
  def temperatureMixture(docs: DataFrame, grpCol: Column, key: Column,
                         alpha: Double, targetDocs: Long,
                         buckets: Int = 4096): DataFrame = {
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    require(targetDocs >= 0L, s"targetDocs must be non-negative, got $targetDocs")
    val counts = docs.select(grpCol.as("grp"))
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .toMap
    // n_s^α quantized to integer 2^-20ths BEFORE the sum: integer
    // addition is order-free, so the normalizer (and therefore every
    // rate) is identical in any engine regardless of summation order —
    // the same portability device as the micro-quantized score sums
    val pows: Map[String, Long] = counts.map { case (g, n) =>
      g -> math.round(math.pow(n.toDouble, alpha) * 1048576.0)
    }
    val powSum = pows.values.sum
    val rateBuckets: Map[String, Int] = counts.map { case (g, n) =>
      val w = pows(g).toDouble / powSum.toDouble
      val rate = math.min(1.0, targetDocs.toDouble * w / n.toDouble)
      val rb = math.floor(rate * buckets).toInt
      g -> (if (targetDocs > 0L && rb == 0) 1 else rb)
    }
    val cap = rateBuckets.foldLeft(lit(0): Column) { case (acc, (g, rb)) =>
      when(grpCol === g, lit(rb)).otherwise(acc)
    }
    docs.filter(hashBucket(key, buckets) < cap)
  }

  /** Deterministic epoch shuffle: a reproducible global training order.
    * Each record's sort key is `md5(seed ":" id)` — content-determined,
    * so epoch N's order is identical across reruns, engines, and
    * partitionings (and a different seed gives an independent order for
    * epoch N+1); the id tiebreak makes the order total.
    *
    * NOT a global `row_number()` window (single-partition at scale):
    * positions come from the range-partition + exact-offset composition
    * (`Ingest.withPosition`) — the data shuffles once on the hash key,
    * which simultaneously IS the shuffle that randomizes placement.
    */
  def epochShuffle(df: DataFrame, idCol: Column, seed: Long,
                   as: String = "pos"): DataFrame =
    graft.ingest.Ingest.withPosition(
        df.withColumn("_graft_shuffle_key",
          md5(concat_ws(":", lit(seed), idCol.cast("string")))),
        Seq(col("_graft_shuffle_key"), idCol), as)
      .drop("_graft_shuffle_key")

  /** Exact-n per-stratum sample: seeded rank within each stratum — a
    * PARTITIONED window (scales with stratum cardinality; never the
    * single-task global window). Returns min(n, |stratum|) rows per
    * stratum, deterministic for a fixed seed and input partitioning.
    */
  def stratifiedSampleExact(df: DataFrame, stratum: Column, n: Int,
                            seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(rand(seed))
    df.withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= n)
      .drop("_graft_rank")
  }

  /** Exact-n per-stratum sample whose MEMBERSHIP (not just the counts)
    * is a pure function of content: rank within each stratum by
    * `md5(seed ":" key)` with the key as tiebreak. Unlike
    * [[stratifiedSampleExact]] (Spark's `rand`, reproducible only
    * within one engine+partitioning), the selected rows are identical
    * across engines, reruns, and partitionings — auditable in plain
    * SQL. Partitioned window: scales with stratum cardinality, never a
    * single-task global sort.
    */
  def stratifiedSampleByHash(df: DataFrame, stratum: Column, key: Column,
                             n: Int, seed: Long = 7L): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(concat_ws(":", lit(seed), key.cast("string"))), key)
    df.withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= n)
      .drop("_graft_rank")
  }

  /** Per-group QUANTILE NORMALIZATION of a score: rank-based
    * calibration that makes scores comparable ACROSS heterogeneous
    * groups before one global threshold is applied. Raw quality scores
    * are not comparable between sources (a mid-tier web page outscores
    * a top-tier forum post on absolute features); normalizing each
    * group to its own [0, 1] quantile scale means "keep the top 30%"
    * cuts every source at the same RELATIVE bar — the fair-mixing
    * counterpart of [[temperatureMixture]].
    *
    * qr = (rank − 1)/(n − 1) in micros (ties broken by `key` so the
    * rank is total and engine-stable); a single-row group is trivially
    * its own top (qr = 1). One PARTITIONED window — scales with group
    * cardinality, never a global sort.
    */
  def quantileNormalize(df: DataFrame, grp: Column, score: Column,
                        key: Column, as: String = "qr_micros"): DataFrame = {
    val w = Window.partitionBy(grp).orderBy(score, key)
    val cw = Window.partitionBy(grp)
    df.withColumn("_graft_rn", row_number().over(w).cast("long"))
      .withColumn("_graft_n", count(lit(1)).over(cw))
      .withColumn(as,
        when(col("_graft_n") === 1L, lit(1000000L))
          .otherwise(round((col("_graft_rn") - 1).cast("double")
            * lit(1000000.0) / (col("_graft_n") - 1).cast("double"), 0)
            .cast("long")))
      .drop("_graft_rn", "_graft_n")
  }

  /** Content-hash priority from `md5(key "#" salt)`: the 8-hex-char
    * polynomial twin of [[hashBucket]] — ~10⁹-scale value space, so
    * top-n ties are data, not device. All-integer and computable in any
    * engine with md5 + ascii.
    */
  def hashPriority(key: Column, salt: Column): Column = {
    val hex = md5(concat(key.cast("string"), lit("#"), salt.cast("string")))
    (1 to 8).map(i => ascii(substring(hex, i, 1)) *
      lit(math.pow(31, 8 - i).toLong)).reduce(_ + _)
  }

  /** Deterministic weighted sampling WITHOUT replacement — the
    * order-sampling device of Efraimidis & Spirakis (2006), integer
    * edition: each row draws priority
    *
    *   max over r = 1..w of hashUniform(key, r)
    *
    * and the top n by priority are the sample. The max of w iid
    * uniforms has CDF x^w — exactly the order distribution of the ES
    * key u^(1/w) — so inclusion probabilities are those of w-weighted
    * sampling without replacement, computed with NO ln and NO floats:
    * membership replays bit-exactly in any engine with md5 (the
    * [[hashBucket]] portability contract, extended to weights).
    *
    * Weights are integers; rows with NULL or non-positive weight have
    * zero inclusion probability and drop. Per-row cost is O(w), so
    * weights cap at `maxReplicas` (a 10⁶-scale weight wants a coarser
    * weight unit, not more replicas).
    *
    * Scale: priorities are map-side projections; top-n plans as
    * TakeOrderedAndProject (per-partition heads merged on the driver,
    * never a global sort).
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int,
                     maxReplicas: Int = 64,
                     as: String = "priority"): DataFrame = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    require(maxReplicas >= 1, s"maxReplicas must be positive, got $maxReplicas")
    val w = least(weight.cast("int"), lit(maxReplicas))
    df.filter(weight.cast("int") >= 1)
      .withColumn(as, array_max(transform(sequence(lit(1), w),
        r => hashPriority(key, r))))
      .orderBy(col(as).desc, key)
      .limit(n)
  }
}
