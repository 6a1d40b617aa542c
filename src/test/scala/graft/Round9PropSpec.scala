package graft

import graft.warehouse.SparkWarehouse
import org.apache.spark.sql.functions._

/** Property tests for the round-9 partition-pruned MERGE: over seeded
  * random tables, change-sets, and partition layouts, the pruned path
  * (engaged when the keys cover the partition columns) must produce
  * EXACTLY the same final table state as the whole-table merge — the
  * pruning is an enumeration strategy, never a semantics change.
  */
class Round9PropSpec extends SparkSpec {

  test("pruned upsert ≡ whole-table upsert over random tables and change-sets") {
    val sps = spark; import sps.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val nRows = 50 + rnd.nextInt(150)
      val nParts = 2 + rnd.nextInt(5)
      val base = (0L until nRows).map { i =>
        (i, s"p${rnd.nextInt(nParts)}", rnd.nextInt(1000).toLong)
      }
      val baseDf = base.toDF("id", "part", "v")
      // change-set: random subset updated (same partition — key covers
      // part, so the pair (id, part) identifies the row) + fresh keys
      val changed = base.filter(_ => rnd.nextInt(4) == 0)
        .map { case (id, p, _) => (id, p, 5000L + rnd.nextInt(100)) }
      val fresh = (0 until 1 + rnd.nextInt(10)).map { k =>
        (10000L + k, s"p${rnd.nextInt(nParts)}", 9000L + k)
      }
      val delta = (changed ++ fresh).toDF("id", "part", "v")

      // pruned: partitioned table, keys cover the partition column
      val whP = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-r9p-$trial").toString)
      whP.createPartitioned("t", baseDf, Seq("part"))
        .fold(e => fail(e.message), identity)
      whP.upsert("t", delta, Seq("id", "part"))
        .fold(e => fail(e.message), identity)
      val gotP = whP.get("t").fold(e => fail(e.message), identity)
        .select("id", "part", "v").orderBy("id", "part").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

      // reference: flat table, whole-table merge, same keys
      val whF = new SparkWarehouse(spark,
        java.nio.file.Files.createTempDirectory(s"graft-r9f-$trial").toString)
      whF.load("t", baseDf).fold(e => fail(e.message), identity)
      whF.upsert("t", delta, Seq("id", "part"))
        .fold(e => fail(e.message), identity)
      val gotF = whF.get("t").fold(e => fail(e.message), identity)
        .select("id", "part", "v").orderBy("id", "part").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

      assert(gotP == gotF, s"trial $trial: pruned and flat merges diverge")
      // and the in-Scala model agrees (belt and braces)
      val changedKeys = delta.select("id", "part").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val model = (base.filterNot(r => changedKeys((r._1, r._2))) ++
        changed ++ fresh).sortBy(r => (r._1, r._2))
      assert(gotF == model, s"trial $trial: merge diverges from the model")
    }
  }

  test("pruned upsert ≡ whole-table upsert when the partition column " +
    "contains nulls (touched semi-join must be null-safe)") {
    val sps = spark; import sps.implicits._
    // base: three rows in the null partition, two in p0
    val base = Seq(
      (1L, Option("p0"), 10L), (2L, Option("p0"), 20L),
      (3L, Option.empty[String], 30L), (4L, Option.empty[String], 40L),
      (5L, Option.empty[String], 50L))
    val baseDf = base.toDF("id", "part", "v")
    // delta touches ONLY the null partition, with a fresh key: under a
    // null-UNSAFE touched semi-join no existing null-partition row makes
    // it into the survivors set, so the swap would replace the
    // __HIVE_DEFAULT_PARTITION__ directory with just this one row —
    // silently deleting ids 3..5 (the whole-table path keeps them)
    val delta = Seq((9L, Option.empty[String], 90L)).toDF("id", "part", "v")

    def rows(wh: SparkWarehouse) =
      wh.get("t").fold(e => fail(e.message), identity)
        .select("id", "part", "v").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
        .toSet

    val whP = new SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-r10-nullp").toString)
    whP.createPartitioned("t", baseDf, Seq("part"))
      .fold(e => fail(e.message), identity)
    whP.upsert("t", delta, Seq("id", "part"))
      .fold(e => fail(e.message), identity)

    val whF = new SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-r10-nullf").toString)
    whF.load("t", baseDf).fold(e => fail(e.message), identity)
    whF.upsert("t", delta, Seq("id", "part"))
      .fold(e => fail(e.message), identity)

    val gotP = rows(whP)
    assert(gotP == rows(whF),
      "pruned and whole-table merges diverge on a null partition value")
    // the existing null-partition rows survive
    assert(Set(3L, 4L, 5L).subsetOf(gotP.map(_._1)),
      "pruned merge deleted existing null-partition rows")
    assert(gotP.exists(r => r._1 == 9L && r._2.isEmpty && r._3 == 90L))
  }

  test("window-free width probe: a high-df stopword with a narrow prefix " +
    "bucket stays exact; a genuinely wide bucket on the same token " +
    "escalates with the true width") {
    val sps = spark; import sps.implicits._
    // 20 docs "the aI bI": df(the)=30 trips any small threshold, but
    // rare-first ordering keeps "the" out of every 3-token doc's prefix
    // (tau 50 → prefixLen 2 → the two rare tokens). 10 docs are just
    // "the": n=1 → prefixLen 1 → "the" IS their prefix. True bucket
    // width of "the" is exactly 10.
    val docs = ((0 until 20).map(i => (i.toLong, s"the a$i b$i")) ++
      (0 until 10).map(i => (100L + i, "the"))).toDF("id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "inter", "uni").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val exact = pairs(graft.ext.SetSim.jaccardJoin(docs, col("id"),
      col("text"), 50, escalateAt = Int.MaxValue))
    // escalateAt=15: df probe trips (30 > 15) but the true width (10)
    // does not — the probe must prove the bucket narrow WITHOUT
    // escalating, and the result is the exact join with empty accounting
    val narrow = graft.ext.SetSim.jaccardJoinAuto(docs, col("id"),
      col("text"), 50, escalateAt = 15)
    assert(narrow.escalated.isEmpty,
      "narrow stopword bucket wrongly escalated")
    assert(pairs(narrow.pairs) == exact)
    // escalateAt=8: the true width (10) exceeds the threshold — the
    // accounting must report tok="the" with prefix_docs=10 (the rank
    // count reproduces the windowed width exactly)
    val wide = graft.ext.SetSim.jaccardJoinAuto(docs, col("id"),
      col("text"), 50, escalateAt = 8)
    val acct = wide.escalated.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(acct == Set(("the", 10L)),
      s"escalation accounting wrong: $acct")
  }

  test("auto-escalation only ever loses pairs, never invents; empty " +
    "accounting implies byte-identity with the exact join") {
    val sps = spark; import sps.implicits._
    val rnd = new scala.util.Random(99L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    for (trial <- 1 to 4) {
      // random corpus + a planted hot family that trips a small threshold
      val n = 30 + rnd.nextInt(40)
      val normal = (0L until n.toLong).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .distinct.mkString(" "))
      }
      val hot = (0 until 40).map(i => (1000L + i, s"hot h$i"))
      val docs = (normal ++ hot).toDF("id", "text")
      val tau = Seq(50, 70, 90)(rnd.nextInt(3))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "inter", "uni").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      val exact = pairs(graft.ext.SetSim.jaccardJoin(docs, col("id"),
        col("text"), tau, escalateAt = Int.MaxValue))
      val auto = graft.ext.SetSim.jaccardJoinAuto(docs, col("id"),
        col("text"), tau, escalateAt = 8, neighborhoodWindow = 4)
      val got = pairs(auto.pairs)
      // never invents: every emitted pair is a true pair with the true
      // exact intersection/union (verification runs on every candidate)
      assert(got.subsetOf(exact),
        s"trial $trial tau=$tau: escalation invented pairs")
      // with a non-binding threshold the accounting is empty and the
      // result is the exact join, bit for bit
      val loose = graft.ext.SetSim.jaccardJoinAuto(docs, col("id"),
        col("text"), tau, escalateAt = 1 << 20)
      assert(loose.escalated.isEmpty)
      assert(pairs(loose.pairs) == exact,
        s"trial $trial tau=$tau: non-binding threshold changed the result")
    }
  }
}
