package graft.tools

import graft.Tables

/** r19 optimization probe: per-job wall time / stage names / task counts
  * for ANY named bench gate (args = gate-name substrings), plus a
  * streaming-progress listener that prints every micro-batch's
  * durationMs breakdown (triggerExecution, queryPlanning, walCommit,
  * addBatch, stateOperators commit times) — the attribution tool for the
  * r19 brief's x63 anti-scaling and streaming-floor items.
  *
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.GateProbe x63"`.
  * Each selected gate runs twice (warmup + traced).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GATEPROBE_REPS", "2").toInt
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t0s = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) {
          val stages = js.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks})").mkString(" | ")
          t0s.put(js.jobId, (System.nanoTime(), stages))
        }
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val v = t0s.remove(je.jobId)
        if (v != null) println(f"[gateprobe]   job ${je.jobId}%4d: " +
          f"${(System.nanoTime() - v._1) / 1e9}%7.3fs  ${v._2}")
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })

    // streaming micro-batch attribution: durationMs per phase, per batch
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = if (trace) {
        val p = e.progress
        val dm = p.durationMs
        val keys = dm.keySet().toArray(Array.empty[String]).sorted
        val parts = keys.map(k => s"$k=${dm.get(k)}").mkString(" ")
        println(s"[gateprobe]   batch ${p.batchId}: rows=${p.numInputRows} $parts")
      }
    })

    def drain(): Unit =
      org.apache.spark.sql.GraftColumnBridge.drainListenerBus(spark)

    // special probe target: the streaming machinery floor itself
    if (args.contains("floor")) {
      graft.queries.StreamQueries.machineryFloor(spark, dir) // warmup
      drain()
      (1 to reps).foreach { r =>
        trace = true
        val j0 = jobs.get(); val t0 = System.nanoTime()
        graft.queries.StreamQueries.machineryFloor(spark, dir)
        drain()
        trace = false
        println(f"[gateprobe] machineryFloor rep$r: " +
          f"${(System.nanoTime() - t0) / 1e9}%.3fs jobs=${jobs.get() - j0}")
      }
      spark.stop()
      return
    }

    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.exists(n.contains) }
    if (selected.isEmpty) {
      System.err.println(s"[gateprobe] no gate matches ${args.mkString(",")}")
      sys.exit(1)
    }
    selected.foreach { case (name, fn) =>
      println(s"=== $name (cpus=$cpus) ===")
      val w0 = System.nanoTime()
      fn(spark, dir).count() // warmup
      drain()
      println(f"[gateprobe] $name warmup: ${(System.nanoTime() - w0) / 1e9}%.3fs")
      (1 to reps).foreach { r =>
        trace = true
        val j0 = jobs.get(); val k0 = tasks.get()
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        drain()
        trace = false
        println(f"[gateprobe] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.3fs " +
          s"jobs=${jobs.get() - j0} tasks=${tasks.get() - k0} rows=$n")
      }
    }
    spark.stop()
  }
}
