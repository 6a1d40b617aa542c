package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Graph kernels: PageRank (integer-micros fixpoint) and compact-forward
  * triangle counting. Oracles here are hand-computable graphs plus a
  * naive all-triples reference on seeded random graphs; the DuckDB gate
  * (x81/x82) pins the derived-graph versions.
  */
class GraphSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  private def edgeDf(es: Seq[(Long, Long)]) =
    es.toDF("src", "dst")

  // ---------- pageRank ----------

  test("pageRank: 2-cycle splits mass evenly and conserves ~total") {
    val r = Graph.pageRank(edgeDf(Seq((1L, 2L), (2L, 1L))),
        col("src"), col("dst"), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L))
    // mass conservation up to truncation: each node keeps 500000 micros
    assert(math.abs(r(1L) - 500000L) <= 5)
  }

  test("pageRank: star center accumulates more rank than leaves") {
    // leaves 2..5 each point at 1; 1 points back at 2 (so no dangling sink)
    val es = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val r = Graph.pageRank(edgeDf(es), col("src"), col("dst"), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(3L))
    assert(r(2L) > r(3L)) // 2 receives the center's whole outflow
    assert(r(3L) == r(4L) && r(4L) == r(5L)) // symmetric leaves tie exactly
  }

  test("pageRank is bit-identical under repartitioning (integer math)") {
    val es = (0L until 200L).map(i => (i, (i * 7 + 3) % 50)) ++
      (0L until 50L).map(i => (i, (i + 1) % 50))
    val a = Graph.pageRank(edgeDf(es), col("src"), col("dst"), iters = 4)
      .orderBy("id").collect().toSeq
    val b = Graph.pageRank(edgeDf(es).repartition(17), col("src"), col("dst"),
        iters = 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("pageRank: dangling mass decays into teleport (no NaN/negative)") {
    // 1 -> 2 only: node 2 is dangling; with the dangling-to-teleport
    // simplification its rank stays teleport + 0.85 * inflow.
    val r = Graph.pageRank(edgeDf(Seq((1L, 2L))), col("src"), col("dst"),
        iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.forall(_ >= 0L))
    assert(r(2L) > r(1L)) // 2 receives 1's mass, 1 only teleports
  }

  // ---------- triangleCount ----------

  test("triangleCount: K4 gives every vertex 3 triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val sym = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val r = Graph.triangleCount(edgeDf(sym), col("src"), col("dst"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCount: path graph has none") {
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    assert(Graph.triangleCount(edgeDf(sym), col("src"), col("dst")).count() == 0L)
  }

  test("triangleCount matches the naive all-triples count on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 4
      val undirected = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val sym = undirected ++ undirected.map(_.swap)
      val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val naive = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj.getOrElse(a, Set.empty)(b) && adj.getOrElse(b, Set.empty)(c) &&
          adj.getOrElse(a, Set.empty)(c)
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = Graph.triangleCount(edgeDf(sym), col("src"), col("dst"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == naive, s"trial $trial")
    }
  }

  test("symmetrize drops self-loops and dedupes both orientations") {
    val r = Graph.symmetrize(edgeDf(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))),
        col("src"), col("dst"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 2L), (2L, 1L)))
  }
}
