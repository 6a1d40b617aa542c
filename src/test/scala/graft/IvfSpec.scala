package graft

import graft.ext.{Ivf, Similarity}
import org.apache.spark.sql.functions._

/** IVF ANN: the codebook must spread the corpus across buckets, probing
  * must bound candidate work, and recall on clustered data must approach
  * the exact baseline.
  */
class IvfSpec extends SparkSpec {

  private def clustered() = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(13)
    val rows = for (c <- 0 until 16; i <- 0 until 12) yield {
      val center = { val r = new scala.util.Random(100 + c); Seq.fill(24)(r.nextFloat() * 2 - 1) }
      (c.toLong * 12 + i, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("train/assign spreads vectors over multiple buckets") {
    val e = clustered()
    val model = Ivf.train(e, "embedding", nCentroids = 8, iterations = 5)
    assert(model.numCentroids == 8)
    val idx = Ivf.index(e, model)
    val buckets = idx.groupBy("centroid").count().collect()
    assert(buckets.length >= 4, s"codebook collapsed: ${buckets.toSeq}")
    assert(buckets.map(_.getLong(1)).sum == 192)
  }

  test("probed top-k recalls the exact baseline on clustered data") {
    val e = clustered()
    val model = Ivf.train(e, "embedding", nCentroids = 8, iterations = 5)
    val idx = Ivf.index(e, model)
    val q = e.filter(col("vec_id") % 12 === 0)
    val exact = Similarity.bruteForceTopK(e, q, k = 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.topK(idx, q, model, k = 3, nProbe = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall too low on clustered data: $recall")
  }

  test("same-cluster neighbors rank first through the probe path") {
    val e = clustered()
    val model = Ivf.train(e, "embedding", nCentroids = 8, iterations = 5)
    val idx = Ivf.index(e, model)
    val q = e.filter(col("vec_id") === 0)
    val top = Ivf.topK(idx, q, model, k = 3, nProbe = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    // top neighbors of cluster-0's first member are other cluster-0 members
    assert(top.forall(id => id >= 1 && id <= 11), s"cross-cluster top-k: ${top.toSeq}")
  }
}
