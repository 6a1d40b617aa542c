package graft

import graft.ext.Contamination
import graft.ops.ZOrder
import org.apache.spark.sql.functions._

/** Semantics of the round-3 extensions: Morton coding and the
  * contamination report.
  */
class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits (known values) and is injective on a grid") {
    val spark0 = spark
    import spark0.implicits._
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val z = grid.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y")).as("z"))
    // spot values: z(1,0)=1, z(0,1)=2, z(3,5)=interleave(011,101)=100111=39
    val m = z.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m((0, 0)) == 0L && m((1, 0)) == 1L && m((0, 1)) == 2L)
    assert(m((3, 5)) == 39L && m((7, 7)) == 63L)
    // bijective over the grid
    assert(z.select("z").distinct().count() == 32L * 32L)
  }

  test("zValue masks inputs to 16 bits (wide/negative keys degrade, not corrupt)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((0x10003, 0), (3, 0), (-1, 0)).toDF("x", "y")
    val zs = df.select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // bit 16 of x is discarded: z(0x10003, 0) == z(3, 0); before the
    // input mask, the stray high bit survived the 0x00FF00FF stage and
    // produced a code outside the 32-bit z-domain
    assert(zs(0) == zs(1))
    // negative input = low 16 bits (0xFFFF): all even bits set
    assert(zs(2) == 0x55555555L)
    assert(zs.forall(z => z >= 0 && z <= 0xFFFFFFFFL))
  }

  test("clusteredWrite bounds both dimensions per output file") {
    val spark0 = spark
    import spark0.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val df = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    ZOrder.clusteredWrite(df, "x", "y", s"$out/t", numFiles = 16)
    // every file's (x,y) envelope must cover far less than the full
    // domain on BOTH axes — the point of z-clustering vs single-column
    // sort (where y's per-file envelope stays ~the full range)
    val perFile = spark.read.parquet(s"$out/t")
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .agg(max("xr"), max("yr")).collect()(0)
    assert(perFile.getInt(0) <= 31 && perFile.getInt(1) <= 31,
      s"envelopes too wide: $perFile")
  }
}

class PqSpec extends SparkSpec {

  test("PQ candidates + exact rescore reach >=0.8 recall@3 vs brute force") {
    val e = Tables(spark, SparkTestBase.Sf0001, "embeddings")
    val model = graft.ext.Pq.train(e, "embedding", m = 16, k = 32)
    val q = e.filter(col("vec_id") < 20)
    val pq = graft.ext.Pq.topK(graft.ext.Pq.encode(e, model), q, model,
        k = 3, nCandidates = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.ext.Similarity.bruteForceTopK(e, q, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("encoding is deterministic and code arity/range match the model") {
    val e = Tables(spark, SparkTestBase.Sf0001, "embeddings")
    val model = graft.ext.Pq.train(e, "embedding", m = 8, k = 16)
    val codes1 = graft.ext.Pq.encode(e, model).select("neighbor_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val codes2 = graft.ext.Pq.encode(e, model).select("neighbor_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes1 == codes2)
    assert(codes1.values.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 16)))
    // compression: 64 floats (256 B) -> 8 codes
    assert(model.m * model.subDim == 64)
  }
}

class MisraGriesSpec extends SparkSpec {

  test("every term above the N/(k+1) guarantee survives the sketch") {
    val spark0 = spark
    import spark0.implicits._
    // skewed stream: term "hot_i" appears (10-i)*200 times, 500 noise terms
    val rows = (0 until 5).flatMap(i =>
      Seq.fill((10 - i) * 200)(s"hot_$i")) ++
      (0 until 500).flatMap(i => Seq.fill(3)(s"noise_$i"))
    val ds = rows.toDF("term").repartition(8).as[String]
    val n = rows.size
    val k = 20
    val sketch = ds.select(new graft.ext.MisraGriesAgg(k).toColumn).head()
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = exact.filter(_._2 > n.toLong / (k + 1)).keySet
    assert(mustSurvive.nonEmpty && mustSurvive.subsetOf(sketch.keySet),
      s"missing: ${mustSurvive -- sketch.keySet}")
    // bounded state
    assert(sketch.size <= k)
    // sketch counts never overestimate
    sketch.foreach { case (t, c) => assert(c <= exact(t), s"$t overcounted") }
  }

  test("merge keeps the bound and is order-insensitive on disjoint parts") {
    val agg = new graft.ext.MisraGriesAgg(3)
    val a = Map("x" -> 10L, "y" -> 4L, "z" -> 2L)
    val b = Map("x" -> 5L, "w" -> 6L, "v" -> 1L)
    val m1 = agg.merge(a, b)
    val m2 = agg.merge(b, a)
    assert(m1 == m2)
    // summed: x=15 w=6 y=4 z=2 v=1; cut = 4th largest (2); survivors -2
    assert(m1 == Map("x" -> 13L, "w" -> 4L, "y" -> 2L))
  }
}

class RangeJoinSpec extends SparkSpec {

  test("half-open boundaries and multi-bin intervals match exactly") {
    val spark0 = spark
    import spark0.implicits._
    def ts(us: Long) = timestamp_micros(lit(us))
    // interval [100s, 300s) spans several 60s bins; points probe both ends
    val iv = Seq(1L).toDF("iid")
      .select(col("iid"), ts(100000000L).as("s"), ts(300000000L).as("e"))
    val pts = Seq(
      (10L, 99999999L),  // just before start -> out
      (11L, 100000000L), // at start (inclusive) -> in
      (12L, 200000000L), // middle, different bin -> in
      (13L, 299999999L), // just before end -> in
      (14L, 300000000L)) // at end (exclusive) -> out
      .toDF("pid", "us")
      .select(col("pid"), timestamp_micros(col("us")).as("ts"))
    val got = graft.ops.RangeJoin.joinPointsToIntervals(pts, col("ts"), iv,
        col("s"), col("e"), binMicros = 60000000L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L, 13L))
  }

  test("empty and inverted intervals contribute nothing") {
    val spark0 = spark
    import spark0.implicits._
    val iv = Seq(
      (1L, 100000000L, 100000000L), // empty [t, t)
      (2L, 300000000L, 100000000L), // inverted
      (3L, 100000000L, 160000000L)) // real
      .toDF("iid", "sus", "eus")
      .select(col("iid"), timestamp_micros(col("sus")).as("s"),
        timestamp_micros(col("eus")).as("e"))
    val pts = Seq((10L, 120000000L)).toDF("pid", "us")
      .select(col("pid"), timestamp_micros(col("us")).as("ts"))
    val got = graft.ops.RangeJoin.joinPointsToIntervals(pts, col("ts"), iv,
        col("s"), col("e"), binMicros = 60000000L)
      .select("iid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }

  test("agrees with the naive cross-filter join on random data") {
    val spark0 = spark
    import spark0.implicits._
    val iv = spark.range(20).select(col("id").as("iid"),
      timestamp_micros(col("id") * 7000000L + 1000000L).as("s"),
      timestamp_micros(col("id") * 7000000L + 5000000L).as("e"))
    val pts = spark.range(500).select(col("id").as("pid"),
      timestamp_micros(pmod(col("id") * 104729L, lit(150000000L)).cast("long"))
        .as("ts"))
    val binned = graft.ops.RangeJoin.joinPointsToIntervals(pts, col("ts"), iv,
        col("s"), col("e"), binMicros = 3000000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(iv)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
  }
}

class ContaminationSpec extends SparkSpec {

  test("report counts shared distinct n-grams per test doc") {
    val spark0 = spark
    import spark0.implicits._
    val train = Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
    val test = Seq(
      (10L, "the quick brown fox runs"), // shares 2 of 3 grams
      (11L, "completely different words here now"), // shares 0
      (12L, "the quick brown fox jumps")) // identical: 3 of 3
      .toDF("id", "text")
    val rep = Contamination.report(train, test, col("id"), col("text"),
        col("id"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == Map(10L -> ((2L, 3L)), 12L -> ((3L, 3L))))
  }

  test("hashed and string paths agree on the test corpus") {
    val d = Tables(spark, SparkTestBase.Sf0001, "documents")
    val (train, test) = graft.ext.Sampling.splitByHash(d, col("doc_id"), 20)
    def run(h: Boolean) = Contamination.report(train, test, col("doc_id"),
        col("text"), col("doc_id"), col("text"), n = 3, hashed = h)
      .select("test_id", "shared_ngrams", "test_ngrams")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(true) == run(false))
  }
}
