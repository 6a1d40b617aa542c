package graft

import graft.ops.{AsofJoin, Skew}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Semantics of the composed operators: as-of join boundaries, salted
  * aggregation equivalence, and the bucketed-table shuffle-free join.
  */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row at or before the left time, per key") {
    val spark0 = spark
    import spark0.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0))
      .toDF("user_id", "ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:04:59")), // -> 100.0
      (11L, 1L, ts("2024-01-01 10:05:00")), // inclusive boundary -> 101.0
      (12L, 1L, ts("2024-01-01 10:30:00")), // -> 102.0
      (13L, 2L, ts("2024-01-01 10:00:00")), // before any quote -> null
      (14L, 3L, ts("2024-01-01 10:00:00"))) // key never quoted -> null
      .toDF("trade_id", "user_id", "ts")
    val out = AsofJoin.asof(trades, quotes, Seq("user_id"), "ts", "ts", Seq("price"))
      .select("trade_id", "asof_price")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(10L -> Some(100.0), 11L -> Some(101.0),
      12L -> Some(102.0), 13L -> None, 14L -> None))
  }

  test("asof carries right columns that share a name with left columns") {
    // regression: a rightCol named like a non-key left column was nulled
    // out by the placeholder synthesis
    val spark0 = spark
    import spark0.implicits._
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100.0))
      .toDF("user_id", "ts", "value")
    val trades = Seq((10L, 1L, ts("2024-01-01 11:00:00"), 7.0))
      .toDF("trade_id", "user_id", "ts", "value") // left also has "value"
    val out = AsofJoin.asof(trades, quotes, Seq("user_id"), "ts", "ts", Seq("value"))
      .select("trade_id", "value", "asof_value").collect()(0)
    assert(out.getDouble(1) == 7.0, "left value clobbered")
    assert(out.getDouble(2) == 100.0, "carried right value lost")
  }

  test("salted aggregate equals plain aggregate on a skewed key") {
    val spark0 = spark
    import spark0.implicits._
    // 90% of rows on one hot key
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
    // and phase 1 actually spread the hot key over multiple groups
    assert(salted("hot")._2 == 9000L)
  }

  test("salted join equals plain join on a skewed key") {
    val spark0 = spark
    import spark0.implicits._
    val big = ((1 to 9000).map(i => (0L, i.toLong)) ++
      (1 to 1000).map(i => (i.toLong % 7, i.toLong)))
      .toDF("k", "v").repartition(8)
    val dim = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "label")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), saltBuckets = 8)
    assert(!salted.columns.contains("_salt"))
    val a = salted.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).sorted.toSeq
    val b = big.join(dim, Seq("k")).collect().map(r => (r.getLong(0),
      r.getLong(1), r.getString(2))).sorted.toSeq
    assert(a == b)
  }

  test("bucketed tables join without a shuffle") {
    val wh = new graft.warehouse.SparkWarehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-bucket").toString)
    val spark0 = spark
    import spark0.implicits._
    val fact = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v1")
    val dim = (1L to 500L).map(i => (i % 100, i * 2)).toDF("k", "v2")
    assert(wh.createBucketed("b_fact", fact, Seq("k"), 8).isRight)
    assert(wh.createBucketed("b_dim", dim, Seq("k"), 8).isRight)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_fact").join(spark.table("b_dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_fact")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}

/** Sketch accuracy: HLL approximate distinct must land within its
  * configured relative error of the exact count on real data.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact") {
    val li = Tables(spark, sf0001, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect()(0).getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"HLL error $err exceeds 3x rsd (exact=$exact approx=$approx)")
  }
}
