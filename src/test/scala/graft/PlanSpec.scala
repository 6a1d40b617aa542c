package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression guards: the physical plans that make these
  * queries scale must keep their load-bearing properties — filters
  * reaching the parquet scan, dims broadcast, top-k as
  * TakeOrderedAndProject, candidate generation never cartesian. A change
  * that silently loses one of these still returns correct rows at test
  * scale and then falls over at 100 TB; these specs fail it here instead.
  */
class PlanSpec extends SparkSpec {

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q02: predicates and projection push down to the parquet scan") {
    val plan = physicalPlan("q02_filter_pushdown")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)") ||
      plan.contains("GreaterThanOrEqual(l_shipdate"), s"pushdown lost:\n$plan")
    // pruned read: only the 4 needed columns in ReadSchema
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_shipdate:timestamp_ntz>"), s"column pruning lost:\n$plan")
  }

  test("q04: the part dim joins by broadcast, not shuffle") {
    val plan = physicalPlan("q04_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), s"broadcast lost:\n$plan")
  }

  test("q07: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan("q07_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k plan lost:\n$plan")
  }

  test("q01: aggregation is two-phase (map-side partial before shuffle)") {
    val plan = physicalPlan("q01_pricing_summary")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"partial aggregation lost:\n$plan")
  }

  test("minhash candidates: bucket join, never a cartesian product") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.Dedup.minhashCandidates(d, col("doc_id"), col("text"),
      bands = 4, wordGrams = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian candidate join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"), s"no keyed join found:\n$plan")
  }

  test("embedding near-dup: bucket join, never a cartesian product") {
    val e = Tables(spark, sf0001, "embeddings")
    val plan = graft.ext.Dedup.embeddingNearDup(e, col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian near-dup join:\n$plan")
  }

  test("subset and banded chunking never plan a single-partition window") {
    // A Window with no PARTITION BY moves every row to one task — the
    // 100 TB scale-killer VERDICT r1 flagged. Both operators now compose
    // range partitioning with per-partition offsets instead.
    for (name <- Seq("op_subset", "op_chunks_banded")) {
      val plan = physicalPlan(name)
      assert(!plan.contains("Window"), s"$name re-grew a window:\n$plan")
    }
  }

  test("curation pipeline runs in one shuffle (dedup window only)") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.Curation.curate(d)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges:\n$plan")
  }

  test("hash split reads only the key column (pruning through md5)") {
    val plan = physicalPlan("x17_split_hash")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"split scan reads more than the key:\n$plan")
  }

  test("IVF probe over a persisted index prunes centroid partitions") {
    val e = Tables(spark, sf0001, "embeddings")
    val model = graft.ext.Ivf.train(e, "embedding", nCentroids = 16)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-plan")
      .resolve("index").toString
    graft.ext.Ivf.writeIndex(graft.ext.Ivf.index(e, model), path)
    val idx = graft.ext.Ivf.readIndex(spark, path)
    val q = e.filter(col("vec_id") < 3)
    val plan = graft.ext.Ivf.topKPruned(idx, q, model, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid#") ||
      plan.contains("PartitionFilters: [centroid IN"),
      s"probe does not prune the index scan:\n$plan")
  }

  test("native vector kernel stays inside whole-stage codegen") {
    val e = Tables(spark, sf0001, "embeddings")
    val df = e.select(graft.functions.VectorFunctions
      .vector_cosine(col("embedding"), col("embedding")).as("c"))
    // "*(n)" is the compact WholeStageCodegen stage marker; the Project
    // containing vector_cosine must carry it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("vector_cosine") && l.trim.startsWith("*(")),
      s"codegen lost:\n$plan")
  }

  test("broadcast-codebook kernels stay inside whole-stage codegen") {
    val e = Tables(spark, sf0001, "embeddings")
    val codebook = e.orderBy("vec_id").limit(4).collect()
      .map(_.getSeq[Float](1).toArray)
    for ((expr, name) <- Seq(
        (graft.functions.VectorFunctions
          .centroid_l2_scores(col("embedding"), codebook), "centroid_l2_scores"),
        (graft.functions.VectorFunctions
          .centroid_cosq_scores(col("embedding"), codebook), "centroid_cosq_scores"),
        (graft.functions.VectorFunctions
          .nearest_centroid_cosq(col("embedding"), codebook), "nearest_centroid_cosq"))) {
      val plan = e.select(expr.as("c")).queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains(name) && l.trim.startsWith("*(")),
        s"$name lost codegen:\n$plan")
    }
  }

  test("pq kernels stay inside whole-stage codegen and the generated " +
    "stage actually compiles") {
    val e = Tables(spark, sf0001, "embeddings")
    val model = graft.ext.Pq.train(e, "embedding", m = 8, k = 16)
    for ((expr, name) <- Seq(
        (graft.ext.Pq.encodeCol(col("embedding"), model), "pq_encode"),
        (graft.ext.Pq.queryTables(col("embedding"), model),
          "pq_adc_tables"))) {
      val df = e.select(expr.as("c"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains(name) && l.trim.startsWith("*(")),
        s"$name lost codegen:\n$plan")
      // the literal-plan form generated 12k lines janino refused to
      // compile (silent interpreted fallback) — pin actual compilation
      val stage = df.queryExecution.executedPlan.collectFirst {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.get
      val (_, code) = stage.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(code)
    }
  }
}

/** Partition-layout guards: a partitioned table read filtered on the
  * partition column must prune directories, not scan them.
  */
class PartitionPruningSpec extends SparkSpec {

  test("partitioned table scan prunes on the partition column") {
    val wh = new graft.warehouse.SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-part").toString)
    val spark0 = spark
    import spark0.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"2024-0${1 + i % 6}", i * 1.5))
      .toDF("id", "month", "v")
    assert(wh.createPartitioned("by_month", df, Seq("month")).isRight)
    val read = wh.get("by_month").toOption.get.filter(col("month") === "2024-03")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"partition pruning lost:\n$plan")
    assert(read.count() > 0)
    // directory layout: one dir per month value
    val dirs = new java.io.File(s"${wh.warehouseDir}/by_month")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("month="))
    assert(dirs == 6, s"expected 6 partition dirs, got $dirs")
  }

  test("scd2 merge plans exactly one join over the current slice") {
    val spark0 = spark
    import spark0.implicits._
    val hist = graft.ops.Scd2.initial(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .withColumn("valid_from",
          lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))))
    val upd = Seq((1L, "a2")).toDF("id", "name")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2021-01-01 00:00:00")))
    val plan = graft.ops.Scd2.merge(hist, upd, Seq("id"), Seq("name"), "ts")
      .queryExecution.optimizedPlan.toString
    val joins = "Join ".r.findAllIn(plan).size
    assert(joins == 1, s"expected 1 join (close+reopen from one pass), got $joins:\n$plan")
  }

  test("contamination report: keyed joins only, never cartesian") {
    val d = Tables(spark, sf0001, "documents")
    val (train, test) = graft.ext.Sampling.splitByHash(d, col("doc_id"), 20)
    val plan = graft.ext.Contamination.report(train, test, col("doc_id"),
        col("text"), col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }

  test("binned range join plans a hash join, never nested-loop") {
    val spark0 = spark
    import spark0.implicits._
    val base = 1704067200000000L
    val iv = spark.range(10).select($"id".as("iid"),
      timestamp_micros(lit(base) + $"id" * lit(3600000000L)).as("s"),
      timestamp_micros(lit(base) + $"id" * lit(3600000000L) + lit(1800000000L))
        .as("e"))
    val pts = Tables.events(spark, sf0001).select($"event_id", $"ts")
    val plan = graft.ops.RangeJoin.joinPointsToIntervals(pts, $"ts", iv,
        $"s", $"e", binMicros = 3600000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop range join:\n$plan")
  }

  test("heavy hitters: partial aggregation + TakeOrderedAndProject") {
    val plan = SparkEntry.queries("x25_heavy_hitters")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"partial agg lost:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k plan lost:\n$plan")
  }

  test("temperature mixing selects with a map-side filter: no shuffle") {
    // the count pass aggregates once; the SELECTION plan must be scan +
    // filter only — caps are literals, membership is md5 arithmetic
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.Sampling
      .temperatureMixture(d, col("lang"), col("doc_id"), 0.5, 200L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"selection plan grew a shuffle:\n$plan")
    assert(!plan.contains("Join"), s"selection plan grew a join:\n$plan")
  }

  test("segment dedup: keyed aggregations and equi-joins, no window") {
    val plan = SparkEntry.queries("x54_segment_dedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"x54 grew a window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"x54 degraded to a pairwise join:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"keep-first lost map-side partial aggregation:\n$plan")
  }

  test("segment dedup hashed-key mode keys the shuffle on xxhash64") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.Dedup
      .segmentDedup(d, col("doc_id"), col("text"), 10, hashKeys = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), s"hashed wire keys lost:\n$plan")
  }

  test("bigram scoring joins on bigram/context keys, never cartesian") {
    val plan = SparkEntry.queries("x55_bigram_logprob")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"x55 degraded to a pairwise join:\n$plan")
    assert(plan.contains("partial_count"),
      s"model counts lost map-side partial aggregation:\n$plan")
  }

  test("setsim verify intersects INTERNED LONG arrays, not strings") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.SetSim
      .jaccardJoin(d, col("doc_id"), col("text"), tauPct = 90)
      .queryExecution.executedPlan.toString
    // r9 measured pin (setsim_sweep_r9.json + SetSimProfile): the
    // exploded-token co-count verify paid per-row costs on a 26×-larger
    // row count (the r8 weak-mark cliff: 45 s median at 100k docs), and
    // the string-array intersect paid per-candidate STRING hashing
    // (4.6 s at 5k docs). The shipped verify interns the vocabulary to
    // dense longs and intersects long arrays (3.0 s / 13.3 s at the
    // same points, per-candidate cost falling across a 200× span). Pin
    // both halves: the intersect kernel is present, and it consumes the
    // interned id column (the collected _tid list), never raw token
    // strings.
    assert(plan.contains("array_intersect"),
      s"interned-array verify replaced:\n$plan")
    assert(plan.contains("collect_list(_tid"),
      s"token interning disappeared from the verify:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"setsim degraded to pairwise:\n$plan")
  }

  test("sorted neighborhood: keyed bucket join, no cartesian, no global window") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.SetSim
      .sortedNeighborhoodJoin(d, col("doc_id"), col("text"),
        window = 10, tauPct = 80)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"neighborhood join degraded to pairwise:\n$plan")
    // the global position must come from the offset composition, not a
    // single-partition window
    assert(!plan.contains("Window ["), s"unexpected window operator:\n$plan")
  }

  test("representatives: one hash aggregate with map-side partials, no join") {
    val d = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(7)).as("component"),
        col("n_chars"))
    val plan = graft.ext.Dedup
      .representatives(d, col("doc_id"), col("component"), col("n_chars"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial_"),
      s"representative selection lost map-side partials:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in representatives:\n$plan")
    assert(!plan.contains("Window ["), s"unexpected window operator:\n$plan")
  }

  test("ngram novelty: doc-keyed joins only, gram table never joins the corpus") {
    val d = Tables(spark, sf0001, "documents")
    val plan = graft.ext.Novelty
      .ngramNovelty(d, col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty degraded to pairwise:\n$plan")
    // both joins key on the doc id — a join keyed on the gram column
    // would re-shuffle the full gram table a second time
    assert(!plan.contains("SortMergeJoin [gram") &&
      !plan.contains("ShuffledHashJoin [gram"),
      s"gram-keyed join back against the corpus:\n$plan")
  }

  test("ivf-pq probe over a persisted index prunes centroid partitions") {
    val e = Tables(spark, sf0001, "embeddings")
    val model = graft.ext.IvfPq.train(e, "embedding", nCentroids = 8,
      m = 8, k = 16)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-plan").resolve("index").toString
    graft.ext.Ivf.writeIndex(graft.ext.IvfPq.index(e, model), idxPath)
    val idx = graft.ext.Ivf.readIndex(spark, idxPath)
    val q = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    val plan = graft.ext.IvfPq.topKPruned(idx, q, model, k = 2, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid"),
      s"static centroid pruning lost:\n$plan")
  }

  test("a17: the observed hourly aggregate materializes once, not per branch") {
    // gapFill consumes `observed` twice (span aggregate + join); its two
    // derived exchanges differ ((key) vs (key, tick)) so ReuseExchange
    // can never dedupe them. The operator therefore routes both branches
    // through ONE shared RDD materialization: the consuming plan must
    // show that shared scan on both branches and NO direct events scan
    // (a second FileScan here = the double corpus scan is back).
    val plan = SparkEntry.queries("a17_gap_fill")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"a17 re-scans events around the shared aggregate:\n$plan")
    val sharedScans = "Scan ExistingRDD".r.findAllIn(plan).length
    assert(sharedScans == 2,
      s"expected both branches on the shared materialization (2 scans), " +
        s"got $sharedScans:\n$plan")
  }

  test("merge-on-read read: deletion vectors apply as a BROADCAST " +
    "anti-join and the data scan keeps pushdown") {
    val wh = new graft.warehouse.SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-mor-plan").toString)
    val spark0 = spark
    import spark0.implicits._
    val df = (0L until 5000L).map(i => (i, i % 13, s"v$i")).toDF("id", "k", "v")
    assert(wh.load("t", df).isRight)
    assert(wh.deleteWhereMor("t", col("id") % 17 === 0).isRight)
    val read = wh.get("t").toOption.get
    val plan = read.filter(col("k") === 3).queryExecution.executedPlan.toString
    // the tombstone side is tiny: the anti-join must be broadcast (a
    // shuffled anti-join here would re-shuffle 100 TB of data to drop
    // a handful of tombstoned rows)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV application is not a broadcast anti-join:\n$plan")
    // and the user predicate still reaches the parquet scan underneath
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)]") ||
      plan.contains("EqualTo(k,3)"),
      s"pushdown lost through the DV wrapper:\n$plan")
  }
}
