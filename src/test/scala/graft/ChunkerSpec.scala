package graft

import graft.ingest.{Chunker, Ingest}
import graft.warehouse.RowOversize
import org.apache.spark.sql.functions._
/** Property tests for size-bounded chunking (reference round-trip test:
  * `test/test_load_datawarehouse.py:164-200` — every chunk ≤ limit, exact
  * order-preserving reconstruction, oversize row rejected). Properties are
  * exercised over seeded random workloads (the scalatest/scalacheck bridge
  * artifact is not on the offline classpath).
  */
class ChunkerSpec extends SparkSpec {

  private def sizedDf(sizes: Seq[Long]) = {
    val spark0 = spark
    import spark0.implicits._
    sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sz")
  }

  test("greedy chunks: every chunk within limit, order preserved, ids contiguous") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val sizes = Seq.fill(1 + rnd.nextInt(200))(1L + rnd.nextInt(400).toLong)
      val limit = 1000L
      val df = sizedDf(sizes).repartition(3).sortWithinPartitions("id")
      val Right(chunked) = Chunker.greedyChunkIds(df, "sz", limit, Seq(col("id"))): @unchecked
      assert(chunked.rows == sizes.length)
      val rows = chunked.df.select("id", "sz", "_chunk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      // every chunk's total ≤ limit
      val perChunk = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      assert(perChunk.values.forall(_ <= limit), s"oversized chunk in $perChunk")
      // chunk ids non-decreasing in id order within each original partition
      // and reconstruction by (chunk, id) preserves global id order per chunk
      val ids = rows.map(_._1)
      assert(ids.toSeq == ids.sorted.toSeq)
      // all rows present exactly once
      assert(rows.length == sizes.length)
      chunked.unpersist()
    }
  }

  test("single oversize row rejected with RowOversize (data.py:304-307)") {
    val df = sizedDf(Seq(10L, 5000L, 20L))
    Chunker.greedyChunkIds(df, "sz", 1000L) match {
      case Left(RowOversize(bytes, limit)) =>
        assert(bytes == 5000L && limit == 1000L)
      case other => fail(s"expected RowOversize, got $other")
    }
  }

  test("small input fits one chunk") {
    val df = sizedDf(Seq(10L, 20L, 30L)).coalesce(1)
    val Right(chunked) = Chunker.greedyChunkIds(df, "sz", 1000L): @unchecked
    assert(chunked.chunks == 1)
    assert(chunked.df.select("_chunk").distinct().count() == 1)
  }

  test("banded chunk ids are deterministic over the declared order") {
    val df = sizedDf(Seq(400L, 400L, 400L, 400L))
    val out = Chunker.bandedChunkIds(df, "sz", Seq(col("id")), 1000L)
      .orderBy("id").select("_chunk").collect().map(_.getLong(0)).toSeq
    // start offsets: 0,400,800,1200 -> bands 0,0,0,1
    assert(out == Seq(0L, 0L, 0L, 1L))
  }

  test("banded chunk ids agree with the single-partition running sum") {
    val rnd = new scala.util.Random(7)
    val sizes = Seq.fill(300)(1L + rnd.nextInt(400).toLong)
    val df = sizedDf(sizes).repartition(7)
    val got = Chunker.bandedChunkIds(df, "sz", Seq(col("id")), 1000L)
      .orderBy("id").select("id", "_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // oracle: sequential running sum in id order
    var acc = 0L
    val want = sizes.zipWithIndex.map { case (s, i) =>
      val c = acc / 1000L; acc += s; (i.toLong, c)
    }
    assert(got == want)
  }

  test("withPosition assigns exact global positions on shuffled input") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 1000L).map(v => (v, v * 2)).toDF("v", "w").repartition(9)
    val got = Ingest.withPosition(df, Seq(col("v")), as = "pos")
      .select("v", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(got == (1L to 1000L).map(v => (v, v - 1L)))
  }

  test("subset skips partitions outside the slice and matches exact positions") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 5000L).toDF("v").repartition(13)
    val out = Ingest.subset(df, Seq(col("v")), start = 2481, size = 37)
      .orderBy("v").as[Long].collect().toSeq
    assert(out == (2482L to 2518L))
  }

  test("row json size column measures the canonical serialization") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "ab")).toDF("id", "s")
    val size = df.select(Ingest.rowJsonSize(df)).collect()(0).getInt(0)
    // {"id":1,"s":"ab"} = 17 bytes
    assert(size == 17)
  }

  test("jsonSize sums rows; empty set is 0") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "ab"), (2L, "cd")).toDF("id", "s")
    assert(Ingest.jsonSize(df) == 34L)
    assert(Ingest.jsonSize(df.filter($"id" > 99)) == 0L)
  }

  test("subset returns the positional slice under the declared order") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 100L).toDF("v")
    val out = Ingest.subset(df, Seq(col("v")), start = 10, size = 5)
      .orderBy("v").as[Long].collect().toSeq
    assert(out == Seq(11L, 12L, 13L, 14L, 15L))
  }
}
