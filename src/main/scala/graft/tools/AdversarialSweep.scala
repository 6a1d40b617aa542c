package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-density sweep: the companion to [[ScaleSweep]].
  *
  * The scale sweep's honest caveat was that its ×k corpora preserve
  * REALISTIC duplicate density — kernels whose cost depends on GLOBAL
  * dup density (LSH bucket width, prefix-token bucket width) were never
  * measured at the density an adversarial or heavily-templated corpus
  * produces. This tool measures exactly those regimes:
  *
  *  1. `lsh_cluster_pairs` — synthetic corpora of exact-duplicate
  *     clusters at fixed total size, cluster width c swept 2 → 512.
  *     Every copy of a template collides in every LSH band, so bucket
  *     width = c and candidate pairs grow as N·(c−1)/2 — LINEAR in c by
  *     construction (the output IS the pair set; no sub-quadratic
  *     algorithm can beat its own output size). The claim under test:
  *     wall time tracks the PAIR count, not c², i.e. sec/pair stays
  *     flat as buckets widen.
  *  2. `lsh_skew_fallback` — the same widest corpus run twice with the
  *     bucket cap ABOVE and BELOW the cluster width, forcing the
  *     in-row pair-array path vs the keyed self-join (skew) fallback on
  *     an EQUAL pair count. The claim: the fallback's per-pair cost is
  *     the same order — crossing `maxBucket` changes the constant, not
  *     the cost model.
  *  3. `setsim_hot_token` — the [[graft.ext.SetSim.jaccardJoinCapped]]
  *     guard measured: N docs all sharing one prefix token, capped vs
  *     uncapped. Uncapped cost is C(N,2) and is measured only at small
  *     N (it IS the blowup); capped cost must be near-linear in N with
  *     the dropped bucket loudly reported at its true width.
  *
  * Output: one JSON line per point to SPARK_GRAFT_ADV_OUT (default
  * adversarial_sweep.json).
  */
object AdversarialSweep {

  private def timed[A](thunk: () => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = thunk()
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** N docs in clusters of width c: doc i is copy (i mod c) of template
    * (i div c); every copy is the IDENTICAL 13-token text, and template
    * vocabularies are disjoint — so LSH buckets have width exactly c
    * and cross-template similarity is zero.
    */
  private def clusterCorpus(spark: SparkSession, n: Long, c: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(12)),
        j => concat(lit("t"), expr(s"id div $c"), lit("_"), j)),
        " ").as("text"))

  /** N two-token docs `hot u<i>` — at τ=50% the prefix is the whole
    * doc, so `hot` lands in every prefix and the uncapped candidate
    * join is C(N,2). Two cold-token planted near-dups ride along: the
    * cap must never disturb them.
    */
  private def hotCorpus(spark: SparkSession, n: Long): DataFrame = {
    val adversarial = spark.range(n).select(col("id"),
      concat(lit("hot u"), col("id")).as("text"))
    val sps = spark; import sps.implicits._
    adversarial.union(Seq((n + 1, "p q r s"), (n + 2, "p q r s"))
      .toDF("id", "text"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_ADV_OUT", "adversarial_sweep.json")
    val spark = Tables.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "target/adv"
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    def record(line: String): Unit = { println(s"[adv] $line"); results += line }

    // ---- 1. LSH bucket width sweep at fixed corpus size -------------
    val n = 4096L
    val widths = Seq(2L, 8L, 32L, 64L, 128L, 256L, 512L)
    widths.foreach { c =>
      clusterCorpus(spark, n, c).write.mode("overwrite").parquet(s"$work/cl_$c")
    }
    def candidates(d: DataFrame, cap: Int): Long =
      graft.ext.Dedup.minhashCandidatesPortable(d, col("doc_id"), col("text"),
        maxBucket = cap).count()
    // warmup (JIT + codegen) at the smallest width, result discarded
    candidates(spark.read.parquet(s"$work/cl_2"), 1024)
    widths.foreach { c =>
      val d = spark.read.parquet(s"$work/cl_$c")
      val (sec, pairs) = timed(() => candidates(d, 1024))
      record(s"""{"kernel":"lsh_cluster_pairs","scale":"c$c","rows":$n,""" +
        s""""pairs":$pairs,"sec":$sec}""")
    }

    // ---- 2. array path vs skew fallback on an EQUAL pair count ------
    // Same corpus, cap above vs below the cluster width: which path is
    // faster at each bucket width? The crossover sets the right default
    // `maxBucket`.
    Seq(64L, 128L, 256L, 512L).foreach { c =>
      val d = spark.read.parquet(s"$work/cl_$c")
      Seq(("array_path", 1024), ("skew_fallback", (c / 2).toInt)).foreach {
        case (tag, cap) =>
          val (sec, pairs) = timed(() => candidates(d, cap))
          record(s"""{"kernel":"lsh_skew_fallback","scale":"c${c}_$tag",""" +
            s""""rows":$n,"pairs":$pairs,"sec":$sec}""")
      }
    }

    // ---- 3. hot-token set-sim join: capped vs uncapped --------------
    Seq(1000L, 2000L, 4000L).foreach { m =>
      hotCorpus(spark, m).write.mode("overwrite").parquet(s"$work/hot_$m")
      val d = spark.read.parquet(s"$work/hot_$m")
      val (sec, pairs) = timed(() =>
        graft.ext.SetSim.jaccardJoin(d, col("id"), col("text"), tauPct = 50)
          .count())
      record(s"""{"kernel":"setsim_hot_uncapped","scale":"n$m","rows":$m,""" +
        s""""pairs":$pairs,"sec":$sec}""")
    }
    Seq(10000L, 50000L, 100000L).foreach { m =>
      hotCorpus(spark, m).write.mode("overwrite").parquet(s"$work/hot_$m")
      val d = spark.read.parquet(s"$work/hot_$m")
      val (sec, out) = timed(() => {
        val r = graft.ext.SetSim.jaccardJoinCapped(d, col("id"), col("text"),
          tauPct = 50, maxPerTok = 64)
        val dropped = r.dropped.collect()
        require(dropped.map(x => (x.getString(0), x.getLong(1))).toSeq ==
          Seq(("hot", m)), s"drop accounting wrong at n=$m")
        r.pairs.count()
      })
      record(s"""{"kernel":"setsim_hot_capped","scale":"n$m","rows":$m,""" +
        s""""pairs":$out,"sec":$sec}""")
    }

    // ---- 4. the AUTO guard measured (r10) ---------------------------
    // (a) tier-1 df-probe overhead on CLEAN corpora (max df far below
    // the threshold): the guarded default must cost the unguarded join
    // plus one aggregate ≈ noise.
    // (b) STOPWORD corpora: one token in EVERY doc (df = n ≫ 4096) but
    // prefix-narrow — the r10 window-free width probe must clear it
    // without ever building the windowed prefix table (the r9-advice
    // regression: the old tier-2 permanently defeated the cheap path
    // on any corpus with one popular token).
    Seq(100000L, 1000000L).foreach { m =>
      Seq(("clean", ""), ("stopword", " the")).foreach { case (tag, suffix) =>
        spark.range(m).select(col("id"),
            concat(lit("u"), col("id"), lit(" v"), col("id"), lit(suffix))
              .as("text"))
          .write.mode("overwrite").parquet(s"$work/${tag}_$m")
        val d = spark.read.parquet(s"$work/${tag}_$m")
        val (secU, pU) = timed(() => graft.ext.SetSim.jaccardJoin(
          d, col("id"), col("text"), tauPct = 50,
          escalateAt = Int.MaxValue).count())
        record(s"""{"kernel":"setsim_auto_$tag","scale":"n${m}_unguarded",""" +
          s""""rows":$m,"pairs":$pU,"sec":$secU}""")
        val (secA, pA) = timed(() => {
          val r = graft.ext.SetSim.jaccardJoinAuto(d, col("id"), col("text"),
            tauPct = 50)
          val esc = r.escalated.count()
          require(esc == 0, s"$tag corpus escalated $esc buckets at n=$m")
          r.pairs.count()
        })
        require(pA == pU, s"$tag auto/unguarded pair drift at n=$m")
        record(s"""{"kernel":"setsim_auto_$tag","scale":"n${m}_auto",""" +
          s""""rows":$m,"pairs":$pA,"sec":$secA}""")
      }
    }

    // (c) ESCALATED end-to-end wall vs the capped guard on hot two-
    // family corpora, with the planted rescue pair (every token hot —
    // reachable only through the neighborhood path) and a cold pair.
    // The capped run on the same corpus keeps only the cold pair (its
    // documented trade); auto must recover BOTH with loud accounting.
    Seq(5000L, 25000L, 50000L).foreach { m =>
      val sps = spark; import sps.implicits._
      val fams = spark.range(m).select(col("id"),
          concat(lit("hot1 u"), col("id")).as("text"))
        .union(spark.range(m).select((col("id") + m).as("id"),
          concat(lit("hot2 w"), col("id")).as("text")))
        .union(Seq((2 * m + 1, "hot1 hot2"), (2 * m + 2, "hot1 hot2"),
          (2 * m + 3, "p q r s"), (2 * m + 4, "p q r s"))
          .toDF("id", "text"))
      fams.write.mode("overwrite").parquet(s"$work/fam_$m")
      val d = spark.read.parquet(s"$work/fam_$m")
      val rows = 2 * m + 4
      val (secA, _) = timed(() => {
        val r = graft.ext.SetSim.jaccardJoinAuto(d, col("id"), col("text"),
          tauPct = 50, escalateAt = 64, neighborhoodWindow = 16)
        val esc = r.escalated.collect()
          .map(x => (x.getString(0), x.getLong(1))).sortBy(_._1).toSeq
        require(esc == Seq(("hot1", m + 2), ("hot2", m + 2)),
          s"escalation accounting wrong at n=$rows: $esc")
        val pairs = r.pairs.select("id_a", "id_b").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        require(pairs == Set((2 * m + 1, 2 * m + 2), (2 * m + 3, 2 * m + 4)),
          s"auto lost a planted pair at n=$rows: $pairs")
      })
      record(s"""{"kernel":"setsim_auto_escalated","scale":"n$rows",""" +
        s""""rows":$rows,"pairs":2,"sec":$secA}""")
      val (secC, _) = timed(() => {
        val r = graft.ext.SetSim.jaccardJoinCapped(d, col("id"), col("text"),
          tauPct = 50, maxPerTok = 64)
        require(r.dropped.count() == 2, s"cap accounting wrong at n=$rows")
        val pairs = r.pairs.select("id_a", "id_b").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        require(pairs == Set((2 * m + 3, 2 * m + 4)),
          s"capped pair set wrong at n=$rows: $pairs")
      })
      record(s"""{"kernel":"setsim_capped_same_corpus","scale":"n$rows",""" +
        s""""rows":$rows,"pairs":1,"sec":$secC}""")
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (results.mkString("[\n", ",\n", "\n]") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[adv] wrote ${results.size} points to $outPath")
    spark.stop()
  }
}
