package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale sweep: measure the heavy kernels' wall time against input size
  * and record the time-vs-rows curve — the measurement that converts
  * every "this plan scales" argument into data.
  *
  * Scaled corpora (materialized to parquet first, so prep cost never
  * contaminates kernel timing):
  *
  *  - documents ×k: k copies of the sf0.1 corpus, ids offset per copy,
  *    and every token of copy i > 0 suffixed with a copy tag. Token
  *    renaming is a BIJECTION per copy, so Jaccard / shingle / df /
  *    candidate structure inside each copy is EXACTLY that of the real
  *    corpus while cross-copy similarity is zero — the corpus grows
  *    ×k with its duplicate structure preserved, not distorted (naive
  *    replication would make every doc a 10-way exact dup and
  *    quadratically inflate the very pair space being measured).
  *  - lineitem ×k: ids offset per copy → k disconnected copies of the
  *    co-order supplier graph.
  *  - chains n: a synthetic path graph (length-64 chains), isolating
  *    the connected-components fixpoint machinery.
  *
  * Kernels are the round-7 bench heavyweights (VERDICT r7 next-round
  * item 1): near-dup pipeline (x47), incremental near-dup (x57),
  * quality classifier (x63), PageRank (x81), exact set-similarity join
  * (x83's jaccardJoin), components fixpoint (x21). Each scale point is
  * one timed run after a warmup run at the smallest point (JIT +
  * codegen). Output: one JSON line per (kernel, scale) to
  * SPARK_GRAFT_SWEEP_OUT (default scale_sweep.json).
  */
object ScaleSweep {

  /** Copy `k` of the corpus: ids offset, every token suffixed with the
    * copy tag (bijective per copy — see scaladoc). Copy 0 is the real
    * corpus unchanged.
    */
  private[tools] def docsCopy(d: DataFrame, k: Int): DataFrame =
    if (k == 0) d.select(col("doc_id"), col("text"))
    else d.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
      array_join(transform(split(col("text"), " "),
        // the tag starts with a char no real token contains, so renamed
        // tokens can never collide with real-corpus tokens
        t => concat(t, lit("\u00a7" + k.toString))), " ").as("text"))

  private def lineitemCopy(d: DataFrame, k: Int): DataFrame =
    if (k == 0) d.select(col("l_orderkey"), col("l_suppkey"))
    else d.select((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey"),
      (col("l_suppkey") + lit(k * 10000000L)).as("l_suppkey"))

  /** Time the WHOLE kernel run — the thunk is invoked inside the timer
    * because fixpoint kernels (components, classifier training) execute
    * eagerly while BUILDING their result frame; timing only the final
    * count would read already-materialized checkpoints.
    */
  private def timedRun(thunk: () => DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    val df = thunk()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.GraftColumnBridge.unpersistEmbeddedCheckpoints(df)
    (sec, n)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SWEEP_OUT", "scale_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "target/scale"

    // ---- materialize scaled corpora (prep cost excluded from timings)
    val docs01 = Tables(spark, "/root/testdata/sf0.01", "documents")
    val docs1 = Tables(spark, "/root/testdata/sf0.1", "documents")
    val li01 = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val li1 = Tables(spark, "/root/testdata/sf0.1", "lineitem")
    val docScales = Seq(2, 5, 10, 20)
    val liScales = Seq(2, 5, 10)
    docScales.foreach { k =>
      (0 until k).map(docsCopy(docs1, _)).reduce(_ union _)
        .write.mode("overwrite").parquet(s"$work/docs_x$k")
    }
    liScales.foreach { k =>
      (0 until k).map(lineitemCopy(li1, _)).reduce(_ union _)
        .write.mode("overwrite").parquet(s"$work/li_x$k")
    }
    def docsAt(tag: String): DataFrame = tag match {
      case "sf0.01" => docs01.select("doc_id", "text")
      case "sf0.1"  => docs1.select("doc_id", "text")
      case t        => spark.read.parquet(s"$work/docs_${t}")
    }
    def liAt(tag: String): DataFrame = tag match {
      case "sf0.01" => li01.select("l_orderkey", "l_suppkey")
      case "sf0.1"  => li1.select("l_orderkey", "l_suppkey")
      case t        => spark.read.parquet(s"$work/li_${t}")
    }
    val docTags = Seq("sf0.01", "sf0.1") ++ docScales.map(k => s"x$k")
    val liTags = Seq("sf0.01", "sf0.1") ++ liScales.map(k => s"x$k")

    // ---- kernels (the gates' cores, parameterized by input)
    def neardup(d: DataFrame): DataFrame =
      graft.ext.Dedup.nearDupComponentsPortable(d, col("doc_id"), col("text"))
    def incremental(d: DataFrame): DataFrame = {
      val incoming = d.orderBy("doc_id").limit(15)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      graft.ext.Dedup.newDocumentsNearDup(d, incoming,
        col("doc_id"), col("text"))
    }
    def classifier(d: DataFrame): DataFrame = {
      val withLang = d.withColumn("lang",
        when(pmod(col("doc_id"), lit(3)) === 0, "en").otherwise("de"))
      val labels = withLang.select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      val model = graft.ext.QualityClassifier.train(withLang, col("doc_id"),
        col("text"), labels, steps = 2, lr = 0.05)
      graft.ext.QualityClassifier.score(withLang, col("doc_id"), col("text"), model)
    }
    def pagerank(li: DataFrame): DataFrame = {
      val edges = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct()
      graft.ext.Graph.pageRank(edges, col("src"), col("dst"), iters = 5)
    }
    def setsim(d: DataFrame): DataFrame =
      graft.ext.SetSim.jaccardJoin(d.filter(col("doc_id") % 3 === 0),
        col("doc_id"), col("text"), tauPct = 90)
    def chains(n: Long, shortcut: Boolean = false): DataFrame = {
      val ids = spark.range(n)
      graft.ext.Dedup.connectedComponents(
        ids.filter(pmod(col("id"), lit(64L)) =!= 63L)
          .select(col("id").as("id_a"), (col("id") + 1L).as("id_b")),
        shortcut = shortcut)
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def sweep(kernel: String, tags: Seq[String], rowsOf: String => Long,
              run: String => DataFrame): Unit = {
      timedRun(() => run(tags.head)) // warmup at the smallest point (released)
      tags.foreach { tag =>
        val (sec, outRows) = timedRun(() => run(tag))
        val rows = rowsOf(tag)
        val line = s"""{"kernel":"$kernel","scale":"$tag","rows":$rows,""" +
          s""""out_rows":$outRows,"sec":$sec}"""
        println(s"[sweep] $line")
        results += line
      }
    }

    sweep("neardup_pipeline_x47", docTags, t => docsAt(t).count(),
      t => neardup(docsAt(t)))
    sweep("incremental_neardup_x57", docTags, t => docsAt(t).count(),
      t => incremental(docsAt(t)))
    sweep("quality_classifier_x63", docTags, t => docsAt(t).count(),
      t => classifier(docsAt(t)))
    sweep("setsim_join_x83", docTags, t => docsAt(t).count(),
      t => setsim(docsAt(t)))
    sweep("pagerank_x81", liTags, t => liAt(t).count(),
      t => pagerank(liAt(t)))
    val chainNs = Seq(100000L, 500000L, 1000000L, 2000000L, 4000000L)
    sweep("components_x21", chainNs.map(_.toString),
      t => t.toLong, t => chains(t.toLong))
    // the r8 pointer-jumping twin: O(log diameter) rounds at 2 joins +
    // 2 checkpoints per round — the high-diameter escape hatch
    sweep("components_pj", chainNs.map(_.toString),
      t => t.toLong, t => chains(t.toLong, shortcut = true))

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[sweep] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
