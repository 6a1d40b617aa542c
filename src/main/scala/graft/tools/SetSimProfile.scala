package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the exact set-similarity join at one
  * scale point — the profiling companion to [[SetSimSweep]], used to
  * attribute the x20 per-pair cliff to a stage before fixing it.
  * Replicates SetSim's internals (tokenSets/prefix/candidates/verify)
  * so each stage can be timed in isolation behind a count().
  */
object SetSimProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_TAG", "x20")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_SHUFFLE").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    // generic conf pass-through for experiments: "k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val tauPct = 90

    val d0 = (tag match {
      case "sf0.01" => Tables(spark, "/root/testdata/sf0.01", "documents")
      case "sf0.1"  => Tables(spark, "/root/testdata/sf0.1", "documents")
      case t        => spark.read.parquet(s"target/scale/docs_$t")
    }).filter(col("doc_id") % 3 === 0)

    def timed(name: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = thunk
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val toks = d0.select(col("doc_id").cast("long").as("id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("n"))

    val exploded = toks.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    val prefix = exploded.join(freq, "tok")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - expr(s"($tauPct * n + 99) div 100") + 1)
      .select(col("id"), col("n"), col("tok"))
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id") &&
        lit(100L) * col("a.n") >= lit(tauPct.toLong) * col("b.n") &&
        lit(100L) * col("b.n") >= lit(tauPct.toLong) * col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val ex2 = toks.select(col("id"), explode(col("toks")).as("tok"))
    val ea = ex2.select(col("id").as("id_a"), col("tok"))
    val eb = ex2.select(col("id").as("id_b"), col("tok"))
    val expanded = cands.join(ea, "id_a")
    val inter = expanded.join(eb, Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val sizes = toks.select(col("id"), col("n"))
    val full = inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("_na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))

    // warmup on the small corpus: full pipeline once
    graft.ext.SetSim.jaccardJoin(
      Tables(spark, "/root/testdata/sf0.01", "documents")
        .filter(col("doc_id") % 3 === 0),
      col("doc_id"), col("text"), 90, escalateAt = Int.MaxValue).count()

    timed("tokens")(toks.count())
    timed("freq (df groupBy)")(freq.count())
    timed("prefix (join+window)")(prefix.count())
    // candidates decomposition: raw pair generation vs the dedup
    val rawPairs = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id") &&
        lit(100L) * col("a.n") >= lit(90L) * col("b.n") &&
        lit(100L) * col("b.n") >= lit(90L) * col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    timed("candidates raw (no distinct)")(rawPairs.count())
    timed("candidates (selfjoin+dist)")(cands.count())
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      println("[profile] === candidates executed plan ===")
      println(cands.queryExecution.executedPlan.toString)
    }
    timed("expanded (cands x tokens)")(expanded.count())
    timed("inter (co-count agg)")(inter.count())
    timed("full verify")(full.count())
    timed("end-to-end")(graft.ext.SetSim.jaccardJoin(d0, col("doc_id"),
      col("text"), 90, escalateAt = Int.MaxValue).count())

    // hypothesis: the co-count verify's 26x row blowup (cands x tokens)
    // is the cliff — verify by joining the token ARRAYS onto the 8.17M
    // candidate rows and intersecting per pair instead
    val viaArrays = cands
      .join(toks.select(col("id").as("id_a"), col("toks").as("_ta"),
        col("n").as("_na")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("_tb"),
        col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_ta"), col("_tb"))).cast("long").as("inter"),
        col("_na"), col("_nb"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))
    timed("verify-via-arrays e2e")(viaArrays.count())

    // variant: intern tokens to long ids first (token values never
    // matter to the verify — only identity), so the per-candidate
    // intersect hashes longs instead of strings
    val dict = ex2.select("tok").distinct()
      .select(col("tok"), monotonically_increasing_id().as("_tid"))
    val toksInt = ex2.join(dict, "tok")
      .groupBy("id").agg(collect_list("_tid").as("toks"),
        count(lit(1)).as("n"))
    val viaInts = cands
      .join(toksInt.select(col("id").as("id_a"), col("toks").as("_ta"),
        col("n").as("_na")), "id_a")
      .join(toksInt.select(col("id").as("id_b"), col("toks").as("_tb"),
        col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_ta"), col("_tb"))).cast("long").as("inter"),
        col("_na"), col("_nb"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))
    timed("verify-via-int-arrays e2e")(viaInts.count())

    // variant: skip the candidate distinct entirely — carry duplicate
    // pairs (one per shared prefix token) through the cheap interned
    // verify and dedup the verified OUTPUT instead
    val viaLate = rawPairs
      .join(toksInt.select(col("id").as("id_a"), col("toks").as("_ta"),
        col("n").as("_na")), "id_a")
      .join(toksInt.select(col("id").as("id_b"), col("toks").as("_tb"),
        col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_ta"), col("_tb"))).cast("long").as("inter"),
        col("_na"), col("_nb"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))
      .distinct()
    timed("late-dedup e2e")(viaLate.count())
    spark.stop()
  }
}
