package graft

import graft.ext.{BpeLearn, SetSim}
import org.apache.spark.sql.functions._

/** Round-8 pins: the batched BPE learner is the default AND actually
  * cuts driver round-trips at a real vocabulary size; the prefix-filter
  * similarity join survives an adversarial hot token under its
  * candidate cap.
  */
class Round8Spec extends SparkSpec {

  test("default learnMerges is the batched path (same output, same API)") {
    val sps = spark; import sps.implicits._
    val docs = Seq("abab abab aa", "the cat sat on the mat").toDF("text")
    val viaDefault = BpeLearn.learnMerges(docs, col("text"), merges = 6)
    val viaBatched = BpeLearn.learnMergesBatched(docs, col("text"), merges = 6)
    val viaSequential = BpeLearn.learnMergesSequential(docs, col("text"), merges = 6)
    assert(viaDefault == viaBatched)
    assert(viaDefault == viaSequential)
  }

  test("a 500-merge vocabulary learns in far fewer than 500 driver round-trips") {
    val sps = spark; import sps.implicits._
    // A corpus where batching can LEGALLY engage (the exactness guard
    // only admits a candidate whose count strictly exceeds what earlier
    // selections could create): 512 two-char words over globally UNIQUE
    // characters (no token sharing, so `sharing` is always empty and the
    // guard reduces to 2x the collection cutoff), frequencies in blocks
    // of 32 equal counts with each block > 2.1x the block four steps
    // down — every round's whole batch clears the guard.
    // (On adversarial corpora — e.g. uniformly random letters, where the
    // top pairs all share tokens — the learner degrades toward one merge
    // per round by DESIGN: exactness over throughput, never past the
    // sequential learner's cost.)
    val blocks = 16
    val freqs = new Array[Int](blocks)
    for (j <- (blocks - 1) to 0 by -1)
      freqs(j) = if (j >= blocks - 3) 20 else math.ceil(freqs(j + 3) * 2.1).toInt
    val words = (0 until 512).map { i =>
      val w = new String(Array((0x4E00 + 2 * i).toChar, (0x4E00 + 2 * i + 1).toChar))
      // one row per word: its F occurrences whitespace-joined
      Seq.fill(freqs(i / 32))(w).mkString(" ")
    }
    val docs = words.toDF("text")
    val stats = BpeLearn.learnMergesBatchedStats(docs, col("text"),
      merges = 500, batch = 32)
    assert(stats.merges.size == 500,
      s"expected 500 merges, learned ${stats.merges.size}")
    // one round-trip per BATCH, not per merge: 500 merges in ~16 rounds
    assert(stats.rounds <= 20,
      s"rounds=${stats.rounds}: batching win lost (expected ~16)")
  }

  test("capped prefix join bounds a 10k-doc hot token and reports the drop") {
    val sps = spark; import sps.implicits._
    // 10 000 two-token docs all sharing `hot`: at tau=50 the prefix is
    // the WHOLE doc, so the uncapped self-join would generate ~50M
    // candidate pairs from the hot bucket alone (none of which verify —
    // J = 1/3). Plus two genuine near-dup docs on cold tokens, which
    // the cap must not disturb.
    val adversarial = (0 until 10000).map(i => (i.toLong, s"hot u$i"))
    val planted = Seq((20001L, "p q r s"), (20002L, "p q r s"))
    val docs = (adversarial ++ planted).toDF("id", "text")
    val out = SetSim.jaccardJoinCapped(docs, col("id"), col("text"),
      tauPct = 50, maxPerTok = 64)
    // loud accounting: exactly the hot bucket reported, at its true width
    val dropped = out.dropped.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dropped.toSeq == Seq(("hot", 10000L)))
    // the planted cold-token pair survives; nothing from the hot bucket
    val pairs = out.pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((20001L, 20002L)))
  }

  test("BM25 model: per-query plan scans only the model, output matches direct") {
    import graft.ext.Bm25
    val docs = Tables(spark, sf0001, "documents").limit(300)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-spec").toString
    Bm25.writeModel(Bm25.buildModel(docs, col("doc_id"), col("text")), dir)
    val model = Bm25.readModel(spark, dir)
    val q = Seq("vector", "stream", "merge")
    // per-(doc, term) components are row-deterministic doubles over the
    // same inputs -> exact equality against the direct path
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val direct = rows(Bm25.scoredTerms(docs, col("doc_id"), col("text"), q)
      .select("doc_id", "term", "tf", "df", "dl", "component"))
    val viaModel = rows(Bm25.scoredTermsModel(model, q)
      .select("doc_id", "term", "tf", "df", "dl", "component"))
    assert(viaModel == direct)
    // the pin: the per-query plan reads the MODEL, never the corpus, and
    // the term filter reaches the postings parquet scan
    val plan = Bm25.scoredTermsModel(model, q).queryExecution.executedPlan.toString
    assert(!plan.contains("documents"), "per-query plan scans the corpus")
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term filter not pushed to the postings scan:\n$plan")
  }

  test("capped join with no hot bucket equals the exact join") {
    val sps = spark; import sps.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"),
      (4L, "x y z w"), (5L, "q r"), (6L, "r s")).toDF("id", "text")
    val exact = SetSim.jaccardJoin(docs, col("id"), col("text"), tauPct = 60)
      .orderBy("id_a", "id_b").collect().toSeq
    val capped = SetSim.jaccardJoinCapped(docs, col("id"), col("text"),
      tauPct = 60, maxPerTok = 64)
    assert(capped.dropped.isEmpty)
    assert(capped.pairs.orderBy("id_a", "id_b").collect().toSeq == exact)
  }

  test("IVF probe calibration: recall is monotone in nProbe and exact at " +
    "full probe width") {
    import graft.ext.Ivf
    val e = Tables(spark, sf0001, "embeddings").limit(400)
    val model = Ivf.train(e, "embedding", nCentroids = 8)
    val indexed = Ivf.index(e, model)
    val queries = e.filter(col("vec_id") < 12)
    val curve = Ivf.calibrateNProbe(indexed, queries, model, k = 5,
      maxProbe = 8).orderBy("n_probe").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(curve.map(_._1).toSeq == (1 to 8))
    // wider probes scan a superset of cells: hits never decrease
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"recall fell ${a} -> ${b}")
    }
    // probing every cell IS the brute-force candidate set: exact recall
    assert(curve.last._4 == 1.0, s"full-width recall ${curve.last._4} != 1.0")
    // truth size constant across the curve
    assert(curve.map(_._3).distinct.length == 1)
  }

  test("sessionizer survives a late batch behind the advanced watermark " +
    "(timeout clamp regression pin)") {
    import org.apache.spark.sql.streaming.Trigger
    val sps = spark; import sps.implicits._
    // batch 1 spans days of event time, so after it the watermark sits
    // far past every session's last+gap; batch 2 replays the SAME event
    // times for other users - pre-clamp, setTimeoutTimestamp(last+gap)
    // threw "Timeout timestamp cannot be earlier than the current
    // watermark" (found by the r8 StreamSweep multi-batch replay)
    val ev = Tables(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val staged = java.nio.file.Files.createTempDirectory("graft-r8-late")
    ev.coalesce(1).write.mode("overwrite")
      .parquet(staged.resolve("b1").toString)
    ev.select((col("event_id") + 9000000L).as("event_id"), col("ts"),
        (col("user_id") + 9000000L).as("user_id"), col("event_type"),
        col("value"))
      .coalesce(1).write.mode("overwrite")
      .parquet(staged.resolve("b2").toString)
    val dir = java.nio.file.Files.createTempDirectory("graft-r8-late-src")
    def mv(sub: String, name: String): Unit = {
      val part = java.nio.file.Files.list(staged.resolve(sub)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, dir.resolve(name))
    }
    mv("b1", "0001.parquet")
    mv("b2", "0002.parquet")
    val schema = spark.read.parquet(dir.toString).schema
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
        .transform(Tables.normalizeTs(_))
      val out = graft.streaming.EventStream.sessionize(
        src.as[graft.streaming.EventStream.Event],
        gapMillis = 30 * 60 * 1000L, watermarkDelay = "10 minutes")
      val q = out.writeStream.format("memory")
        .queryName("r8_late_sessions_sink").outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      // pre-clamp this threw FlatMapGroupsWithStateUserFuncException
      assert(q.awaitTermination(120000), "late-batch sessionizer hung")
      // sessions from BOTH batches' users closed and flushed
      val users = spark.table("r8_late_sessions_sink")
        .select("user_id").distinct().collect().map(_.getLong(0))
      assert(users.exists(_ < 9000000L) && users.exists(_ >= 9000000L),
        s"sessions missing from one batch: ${users.length} users")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("compact two-table IVF-PQ layout returns exactly the single-table " +
    "results and its rescore scan is filtered to the candidate ids") {
    import graft.ext.IvfPq
    val e = Tables(spark, sf0001, "embeddings").limit(400)
    val model = IvfPq.train(e, "embedding", nCentroids = 8, m = 8)
    val queries = e.filter(col("vec_id") < 8)
    val single = IvfPq.topKPruned(IvfPq.index(e, model), queries, model,
      k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r8-compact").toString
    IvfPq.writeIndexCompact(e, model, dir)
    val compact = IvfPq.topKPrunedCompact(spark, dir, queries, model,
      k = 5, nProbe = 3)
    val got = compact.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == single, "compact layout diverged from the single-table path")
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(compact)
    // plan hygiene of the layout itself: the codes table carries no
    // vector column, and the vectors read is id-filtered before any join
    val codesSchema = spark.read.parquet(s"$dir/codes").schema.fieldNames.toSet
    assert(!codesSchema.contains("nvec"), s"codes table ships vectors: $codesSchema")
  }

  test("pointer-jumped components equal linear components on chains, " +
    "cliques, and random near-dup graphs") {
    import graft.ext.Dedup
    val sps = spark; import sps.implicits._
    val rnd = new scala.util.Random(20260818L)
    def comps(df: org.apache.spark.sql.DataFrame, sc: Boolean) = {
      // the linear leg walks the 200-chain one hop per round and needs
      // diameter + one probe segment of budget; the PJ leg needs ~log
      val out = Dedup.connectedComponents(df, maxIterations = 260,
        shortcut = sc)
      val rows = out.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      Dedup.releaseComponents(out)
      rows
    }
    // a 200-deep chain (the high-diameter case pointer jumping exists
    // for), two cliques, and random sparse edges
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val clique = for (a <- 300L to 310L; b <- (a + 1) to 310L) yield (a, b)
    val sparse = Seq.fill(150)((400L + rnd.nextInt(60), 400L + rnd.nextInt(60)))
      .filter(p => p._1 != p._2)
    for (edges <- Seq(chain, clique, sparse, chain ++ clique ++ sparse)) {
      val df = edges.toDF("id_a", "id_b")
      assert(comps(df, sc = true) == comps(df, sc = false),
        s"pointer-jumped labels diverged on ${edges.size} edges")
    }
    // auto-escalation: DEFAULT parameters handle the 200-deep chain —
    // the linear walk would need ~205 of the 200-round budget, but after
    // shortcutAfter (25) rounds the loop switches to pointer jumping
    val auto = Dedup.connectedComponents(chain.toDF("id_a", "id_b"))
    val labels = auto.orderBy("id").collect().map(_.getLong(1)).toSet
    Dedup.releaseComponents(auto)
    assert(labels == Set(0L), s"auto-escalated chain not one component: $labels")
  }
}
