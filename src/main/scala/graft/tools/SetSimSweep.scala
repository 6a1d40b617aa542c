package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedicated set-similarity scale sweep — the artifact the r8 verdict
  * asked for: per scale point it records the CANDIDATE pair count, the
  * VERIFIED pair count, wall seconds, and µs per verified pair, so the
  * "flat per-pair cost" claim is reproducible from the committed file
  * alone instead of living in prose.
  *
  * Methodology: one process = one fresh JVM = ONE pass over every scale
  * point (run/fork := true, so each `runMain` invocation starts cold).
  * The driver script runs this main N times with SPARK_GRAFT_RUN_ID set
  * and merges the per-run JSON into medians — medians over fresh JVMs
  * are the defense against the machine-state band (33–98 s on the same
  * point) that made the r8 artifact unreproducible.
  *
  * Timing discipline: the timed region is EXACTLY the production kernel
  * (`SetSim.jaccardJoin` on the doc_id%3 slice at τ=90, escalation
  * disabled so the measured path is the exact prefix join r8 measured);
  * the candidate count is a separate UNTIMED job (it re-runs prefix
  * generation — diagnostic data, not kernel cost). Corpora are
  * materialized to parquet once (reused across runs) so prep never
  * contaminates timing; the ×k corpora are bijective token-renamed
  * copies (see [[ScaleSweep.docsCopy]]), so candidate/pair structure
  * per copy is exactly the real corpus's.
  */
object SetSimSweep {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SETSIM_OUT", "setsim_sweep.json")
    val runId = sys.env.getOrElse("SPARK_GRAFT_RUN_ID", "r0")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // diagnosis knobs: override shuffle width / scale points for
    // single-point experiments without touching the default sweep
    sys.env.get("SPARK_GRAFT_SHUFFLE").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    val tagFilter = sys.env.get("SPARK_GRAFT_SETSIM_TAGS")
      .map(_.split(",").toSet)
    val work = "target/scale"

    val docs01 = Tables(spark, "/root/testdata/sf0.01", "documents")
    val docs1 = Tables(spark, "/root/testdata/sf0.1", "documents")
    val docScales = Seq(2, 5, 10, 20)
    docScales.foreach { k =>
      if (!new java.io.File(s"$work/docs_x$k/_SUCCESS").exists()) {
        (0 until k).map(ScaleSweep.docsCopy(docs1, _)).reduce(_ union _)
          .write.mode("overwrite").parquet(s"$work/docs_x$k")
      }
    }
    def docsAt(tag: String): DataFrame = tag match {
      case "sf0.01" => docs01.select("doc_id", "text")
      case "sf0.1"  => docs1.select("doc_id", "text")
      case t        => spark.read.parquet(s"$work/docs_$t")
    }
    val tags = (Seq("sf0.01", "sf0.1") ++ docScales.map(k => s"x$k"))
      .filter(t => tagFilter.forall(_.contains(t)))

    def kernel(d: DataFrame): DataFrame =
      graft.ext.SetSim.jaccardJoin(d.filter(col("doc_id") % 3 === 0),
        col("doc_id"), col("text"), tauPct = 90,
        escalateAt = Int.MaxValue)

    // warmup at the smallest point: JIT + codegen compile, untimed
    kernel(docsAt("sf0.01")).count()

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    tags.foreach { tag =>
      val d = docsAt(tag)
      val docRows = d.count()
      val t0 = System.nanoTime()
      val verified = kernel(d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // untimed diagnostics: candidate volume (re-runs prefix gen)
      val cands = graft.ext.SetSim.candidateCount(
        d.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text"), 90)
      val usPerPair = sec * 1e6 / math.max(verified, 1L)
      val line = s"""{"kernel":"setsim_join_x83","run":"$runId",""" +
        s""""scale":"$tag","docs":$docRows,"cand_pairs":$cands,""" +
        s""""verified_pairs":$verified,"sec":$sec,""" +
        f""""us_per_verified_pair":$usPerPair%.3f}"""
      println(s"[setsim-sweep] $line")
      results += line
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[setsim-sweep] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
