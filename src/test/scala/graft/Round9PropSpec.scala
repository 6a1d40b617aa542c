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
