package graft

import org.apache.spark.sql.functions._

/** A local filesystem whose rename THROWS — injects a real IO failure
  * (failing disk / ENOSPC analog) under the commit primitive's
  * put-if-absent. Registered under `failfs18://` via Hadoop conf in the
  * spec (not services — only this spec uses it).
  */
class FailingRenameFs18 extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failfs18"
  override def getUri: java.net.URI = java.net.URI.create("failfs18:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    throw new java.io.IOException("injected disk failure (rename)")
}

/** Round-18 (optimization round) pins:
  *  (1) CDC span walks are CACHED at the retained-slot level (r17 judge
  *      #6): a repeated `changesBetween` over the same span opens ZERO
  *      history-slot files — the parsed headers and entries live in a
  *      bounded LRU keyed (table, generation), sound because a slot
  *      that parsed as its generation's manifest is immutable;
  *  (2) `graft-cdc` restart WITHOUT `startingGeneration` resumes at the
  *      CHECKPOINTED cursor (advisor r17 medium): spans committed while
  *      the stream was down are drained, not withheld behind a
  *      recomputed initialGen;
  *  (3) commit-primitive error discipline (r17 judge finding): a real
  *      IO failure during put-if-absent THROWS instead of masquerading
  *      as lost-the-race (which left the writer rebasing onto a slot
  *      that never appears);
  *  (4) the chunker's internal-row rewrite (r18 perf) emits exactly the
  *      same chunk assignment as the specification;
  *  (5) the bridge's Hadoop-conf broadcast cache is LRU-bounded
  *      (advisor r17 low; since r19 eviction unpersists instead of
  *      destroying — see Round19Spec).
  */
class Round18Spec extends SparkSpec {

  private def tmpWh(prefix: String) = new graft.warehouse.SparkWarehouse(
    spark, java.nio.file.Files.createTempDirectory(prefix).toString)

  private def unwrap[A](e: Either[graft.warehouse.WarehouseError, A]): A =
    e.fold(err => fail(err.message), identity)

  test("CDC span-walk caching: the second changesBetween over the same " +
    "span (including a row-preserving compact) opens ZERO history slots") {
    val sps = spark; import sps.implicits._
    val wh = tmpWh("r18-cdc-cache")
    val t = "t"
    unwrap(wh.load(t, (0L until 400L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(4)))
    val g0 = wh.currentGeneration(t).get
    unwrap(wh.deleteWhere(t, col("id") % 4 === 0))
    unwrap(wh.compact(t, 2, Seq("id"))) // dataChange=false inside the span
    unwrap(wh.load(t, Seq((9000L, "new")).toDF("id", "v")))
    val g3 = wh.currentGeneration(t).get
    val rows1 = unwrap(wh.changesBetween(t, g0, g3)).count()
    val opensAfterFirst = wh.histSlotReads.get()
    val rows2 = unwrap(wh.changesBetween(t, g0, g3)).count()
    assert(rows2 == rows1)
    assert(wh.histSlotReads.get() == opensAfterFirst,
      s"second span walk re-opened history slots " +
        s"(${wh.histSlotReads.get() - opensAfterFirst} extra opens)")
    // and the feed itself is right: 100 deletes + 1 insert, the
    // compaction's churn cancelled
    assert(rows1 == 101L, s"feed carried $rows1 rows")
  }

  test("hist caches invalidate on drop + recreate: a recreated table " +
    "reusing generation numbers never serves the old table's snapshot") {
    val sps = spark; import sps.implicits._
    val wh = tmpWh("r18-histinv")
    val t = "t"
    unwrap(wh.load(t, (0L until 50L).map(i => (i, "old"))
      .toDF("id", "v").repartition(2)))
    unwrap(wh.deleteWhere(t, col("id") < 10)) // creates retained history
    val gens = unwrap(wh.generations(t))
    // warm the hist caches with every retained generation
    gens.dropRight(1).foreach(g => unwrap(wh.getAsOf(t, g)).count())
    unwrap(wh.drop(t))
    unwrap(wh.load(t, (0L until 7L).map(i => (i, "new"))
      .toDF("id", "v")))
    // generation numbers restarted; an as-of at any retained generation
    // must reflect the NEW table (or fail "not retained"), never the
    // old table's cached 50-row snapshot
    unwrap(wh.generations(t)).foreach { g =>
      wh.getAsOf(t, g) match {
        case Right(df) =>
          val n = df.count()
          assert(n <= 7L, s"gen $g served $n rows — a stale cached " +
            "snapshot of the dropped table")
        case Left(_) => () // not retained: acceptable
      }
    }
  }

  test("graft-cdc default-start restart: spans committed while the " +
    "stream was down drain from the CHECKPOINTED cursor (no " +
    "startingGeneration option anywhere)") {
    val sps = spark; import sps.implicits._
    val wh = tmpWh("r18-cdc-defaultstart")
    val src = "src"
    val rep = "rep"
    unwrap(wh.load(src, (0L until 200L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(2)))
    unwrap(wh.load(rep, unwrap(wh.get(src))))
    val ckpt = java.nio.file.Files.createTempDirectory("r18-ckpt")
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    def reader() = spark.readStream
      .format(classOf[graft.streaming.GraftCdcSourceProvider].getName)
      .option("warehouse", wh.warehouseDir)
      .option("table", src)
      .load()
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val dels = batch.filter(col("change_type") === "delete")
            .drop("change_type")
          val ins = batch.filter(col("change_type") === "insert")
            .drop("change_type")
          applied.addAndGet(batch.count())
          val cur = unwrap(wh.get(rep))
          unwrap(wh.replaceContent(rep, cur.exceptAll(dels).unionByName(ins)))
          ()
      }
      .option("checkpointLocation", ckpt.toString)
    // run 1: a live (micro-batch) stream observes span 1 and commits
    // its cursor into the checkpoint, then stops
    val q1 = reader()
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "50 milliseconds"))
      .start()
    try {
      unwrap(wh.deleteWhere(src, col("id") < 50)) // span 1
      // blocks until every available span is processed AND committed —
      // stopping mid-batch would leave span 1 uncommitted and replayed
      q1.processAllAvailable()
      assert(applied.get() == 50L, s"span 1 carried ${applied.get()}")
    } finally q1.stop()
    // span 2 lands while no stream runs; the restarted DEFAULT-START
    // stream must drain it — before the r18 fix, the recomputed
    // initialGen equalled the current generation and AvailableNow
    // terminated without emitting the span
    unwrap(wh.load(src, (9000L until 9030L).map(i => (i, "late"))
      .toDF("id", "v")))
    val q2 = reader()
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000), "restarted stream timed out")
    assert(applied.get() == 80L,
      s"restart withheld the offline span (total ${applied.get()})")
    val repRows = unwrap(wh.get(rep)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val srcRows = unwrap(wh.get(src)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(repRows == srcRows, "replica diverged across the restart")
  }

  test("commit primitive: a real IO failure during put-if-absent THROWS " +
    "instead of reporting lost-the-race; an existing slot still " +
    "reports false") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.failfs18.impl", classOf[FailingRenameFs18].getName)
    val dir = java.nio.file.Files.createTempDirectory("r18-failfs")
    val failing = new org.apache.hadoop.fs.Path(
      s"failfs18://$dir").getFileSystem(conf)
    val slot = new org.apache.hadoop.fs.Path(s"failfs18://$dir/slots/000001")
    val err = intercept[java.io.IOException] {
      graft.warehouse.HdfsCommitPrimitive.putIfAbsent(
        failing, slot, "graft-manifest v3 1 aa 0 - 0\n".getBytes("UTF-8"))
    }
    assert(err.getMessage.contains("injected disk failure"))
    // lost-the-race still reports false on a healthy filesystem
    val okFs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val okSlot = new org.apache.hadoop.fs.Path(s"$dir/ok/000001")
    assert(graft.warehouse.HdfsCommitPrimitive.putIfAbsent(
      okFs, okSlot, "x".getBytes("UTF-8")))
    assert(!graft.warehouse.HdfsCommitPrimitive.putIfAbsent(
      okFs, okSlot, "y".getBytes("UTF-8")))
    assert(graft.warehouse.FileCommitPrimitive.putIfAbsent(
      okFs, new org.apache.hadoop.fs.Path(s"$dir/ok/000002"),
      "x".getBytes("UTF-8")))
    assert(!graft.warehouse.FileCommitPrimitive.putIfAbsent(
      okFs, new org.apache.hadoop.fs.Path(s"$dir/ok/000002"),
      "y".getBytes("UTF-8")))
  }

  test("chunker internal-row rewrite: chunk ids equal the sequential " +
    "specification per partition, chunks never span partitions") {
    val sps = spark; import sps.implicits._
    val df = (0 until 1000).map(i => (i.toLong, 10L + (i % 7) * 30L))
      .toDF("id", "sz").repartition(5)
    val chunked = graft.ingest.Chunker.greedyChunkIds(df, "sz", 200L)
      .fold(e => fail(e.message), identity)
    try {
      val rows = chunked.df
        .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
        .collect()
        .map(r => (r.getInt(r.fieldIndex("pid")),
          r.getLong(r.fieldIndex("sz")), r.getLong(r.fieldIndex("_chunk"))))
      assert(rows.length == 1000)
      assert(chunked.rows == 1000L)
      // replay the greedy specification per partition over the observed
      // (partition, size, chunk) sequence: chunk ids must be exactly
      // contiguous greedy packings, never spanning partitions
      val byPid = rows.groupBy(_._1)
      var totalChunks = 0L
      val allChunkIds = scala.collection.mutable.Set.empty[Long]
      byPid.foreach { case (_, rs) =>
        // rows within a partition arrive in order from collect
        var acc = 0L
        var curChunk = -1L
        var started = false
        val pidChunks = scala.collection.mutable.LinkedHashSet.empty[Long]
        rs.foreach { case (_, sz, ch) =>
          if (!started || acc + sz > 200L) {
            assert(ch != curChunk, "expected a NEW chunk at the boundary")
            curChunk = ch; acc = sz; started = true
          } else {
            assert(ch == curChunk, "row unexpectedly started a new chunk")
            acc += sz
          }
          pidChunks.add(ch)
        }
        pidChunks.foreach { c =>
          assert(!allChunkIds.contains(c), s"chunk $c spans partitions")
          allChunkIds.add(c)
        }
        totalChunks += pidChunks.size
      }
      assert(totalChunks == chunked.chunks,
        s"reported ${chunked.chunks} chunks, observed $totalChunks")
      // global ids are dense 0..n-1
      assert(allChunkIds.toSeq.sorted == (0L until totalChunks),
        "chunk ids are not dense")
    } finally chunked.unpersist()
  }

  test("bridge conf-broadcast cache is LRU-bounded: flooding distinct " +
    "conf contents keeps residency at the cap") {
    val base = spark.sessionState.newHadoopConf()
    (0 until 80).foreach { i =>
      val c = new org.apache.hadoop.conf.Configuration(base)
      c.set("graft.test.distinct", s"v$i")
      org.apache.spark.sql.GraftVerifyingParquetFileFormat
        .cachedConf(spark, c)
    }
    val resident =
      org.apache.spark.sql.GraftVerifyingParquetFileFormat.confCacheResident
    assert(resident <= 64, s"conf cache grew past its bound ($resident)")
  }
}
