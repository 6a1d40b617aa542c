package graft

import graft.ops.{Scd2, Validate}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** SCD2 merge semantics (all four merge paths, idempotence of a no-op
  * batch) and the validation report (each rule kind, one-scan plan for
  * row-local rules).
  */
class Scd2Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def snapshot = {
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, "alice", "A"), (2L, "bob", "B"), (3L, "carol", "C"))
      .toDF("id", "name", "seg")
      .withColumn("valid_from", lit(ts("2020-01-01 00:00:00")))
  }

  test("merge closes changed rows, appends new versions, keeps the rest") {
    val spark0 = spark
    import spark0.implicits._
    val hist0 = Scd2.initial(snapshot)
    val updates = Seq(
      (1L, "alice2", "A"), // changed name
      (2L, "bob", "B"),    // unchanged -> no-op
      (9L, "zoe", "Z"))    // unseen key
      .toDF("id", "name", "seg")
      .withColumn("ts", lit(ts("2021-01-01 00:00:00")))
    val out = Scd2.merge(hist0, updates, Seq("id"), Seq("name", "seg"), "ts")
      .orderBy("id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(4)).map(_.toString), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "alice", Some("2021-01-01 00:00:00.0"), false),
      (1L, "alice2", None, true),
      (2L, "bob", None, true),
      (3L, "carol", None, true),
      (9L, "zoe", None, true)))
  }

  test("asOf slices the valid version per key, boundaries inclusive-exclusive") {
    val spark0 = spark
    import spark0.implicits._
    val u1 = Seq((1L, "v2", "A")).toDF("id", "name", "seg")
      .withColumn("ts", lit(ts("2021-01-01 00:00:00")))
    val h = Scd2.merge(Scd2.initial(snapshot), u1,
      Seq("id"), Seq("name", "seg"), "ts")
    def nameAt(t: String) = Scd2.asOf(h, lit(ts(t)))
      .filter(col("id") === 1).select("name").collect().map(_.getString(0)).toSeq
    // strictly inside the first version
    assert(nameAt("2020-06-01 00:00:00") == Seq("alice"))
    // AT the transition instant: old version's valid_to is exclusive,
    // new version's valid_from inclusive
    assert(nameAt("2021-01-01 00:00:00") == Seq("v2"))
    // before history began: no version
    assert(nameAt("2019-01-01 00:00:00") == Seq())
    // open-ended current version
    assert(nameAt("2030-01-01 00:00:00") == Seq("v2"))
    // exactly one version per key at any covered instant
    val counts = Scd2.asOf(h, lit(ts("2021-06-01 00:00:00")))
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 1L))
  }

  test("a second merge versions the same key again; closed rows immutable") {
    val spark0 = spark
    import spark0.implicits._
    val u1 = Seq((1L, "v2", "A")).toDF("id", "name", "seg")
      .withColumn("ts", lit(ts("2021-01-01 00:00:00")))
    val u2 = Seq((1L, "v3", "A")).toDF("id", "name", "seg")
      .withColumn("ts", lit(ts("2022-01-01 00:00:00")))
    val h2 = Scd2.merge(Scd2.merge(Scd2.initial(snapshot), u1,
        Seq("id"), Seq("name", "seg"), "ts"),
      u2, Seq("id"), Seq("name", "seg"), "ts")
    val key1 = h2.filter(col("id") === 1).orderBy("valid_from")
      .select("name", "is_current").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(key1 == Seq(("alice", false), ("v2", false), ("v3", true)))
    // exactly one open row per live key
    val opens = h2.filter(col("is_current")).groupBy("id").count()
      .filter(col("count") =!= 1).count()
    assert(opens == 0)
  }

  test("merge matches a sequential reference model over random batches") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    // reference model: per key, the full version list (v, from, to_opt)
    var model = Map.empty[Long, Vector[(String, Int, Option[Int])]]
    var hist = Scd2.initial(
      Seq((1L, "v0"), (2L, "v0"), (3L, "v0")).toDF("id", "name")
        .withColumn("valid_from", lit(ts("2020-01-01 00:00:00"))))
    model ++= Seq(1L, 2L, 3L).map(k => k -> Vector(("v0", 0, None)))
    val batchTs = (1 to 5).map(i => ts(s"202$i-01-01 00:00:00"))
    for (b <- 1 to 5) {
      val updates = (1L to 8L).filter(_ => rnd.nextBoolean()).map { k =>
        val v = s"v${rnd.nextInt(3)}" // sometimes equals the open version
        (k, v)
      }
      if (updates.nonEmpty) {
        val df = updates.toDF("id", "name")
          .withColumn("ts", lit(batchTs(b - 1)))
        hist = Scd2.merge(hist, df, Seq("id"), Seq("name"), "ts")
        updates.foreach { case (k, v) =>
          model.get(k) match {
            case None => model += k -> Vector((v, b, None))
            case Some(versions) =>
              val (ov, of, _) = versions.last
              if (ov != v)
                model += k -> (versions.init :+ ((ov, of, Some(b)))
                  :+ ((v, b, None)))
          }
        }
      }
    }
    def tsOf(i: Int) =
      if (i == 0) ts("2020-01-01 00:00:00") else batchTs(i - 1)
    val expected = model.toSeq.flatMap { case (k, versions) =>
      versions.map { case (v, from, to) =>
        (k, v, tsOf(from).toString, to.map(tsOf(_).toString), to.isEmpty)
      }
    }.toSet
    val got = hist.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2).toString,
      Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got}\nextra=${got -- expected}")
  }

  test("stale (out-of-order) updates are ignored, never rewrite history") {
    val spark0 = spark
    import spark0.implicits._
    val hist0 = Scd2.initial(snapshot) // open since 2020-01-01
    val stale = Seq((1L, "timetravel", "A")).toDF("id", "name", "seg")
      .withColumn("ts", lit(ts("2019-06-01 00:00:00")))
    val out = Scd2.merge(hist0, stale, Seq("id"), Seq("name", "seg"), "ts")
    // the open row survives untouched; no negative-duration version
    val key1 = out.filter(col("id") === 1).collect()
    assert(key1.length == 1 && key1(0).getString(1) == "alice"
      && key1(0).getBoolean(5))
    assert(out.filter(col("valid_to") < col("valid_from")).count() == 0)
  }

  test("batch with several updates per key applies only the latest") {
    val spark0 = spark
    import spark0.implicits._
    val updates = Seq(
      (1L, "mid", "A", ts("2021-01-01 00:00:00")),
      (1L, "late", "A", ts("2021-06-01 00:00:00")))
      .toDF("id", "name", "seg", "ts")
    val out = Scd2.merge(Scd2.initial(snapshot), updates,
      Seq("id"), Seq("name", "seg"), "ts")
    val open = out.filter(col("id") === 1 && col("is_current"))
      .select("name").collect().map(_.getString(0)).toSeq
    assert(open == Seq("late"))
  }
}

class ValidateSpec extends SparkSpec {

  test("each rule kind counts its violations") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (Some(1L), Some(0.02), "A"),
      (Some(1L), Some(0.20), "A"), // dup key + out of range
      (Some(2L), None, "A"),       // null value ok (range exempts nulls)
      (None, Some(0.01), "B"),     // null key
      (Some(7L), Some(0.03), "x")) // bad flag + missing in dim
      .toDF("k", "v", "flag")
    val dim = Seq(1L, 2L).toDF("dk")
    val rep = Validate.report(df, Seq(
      Validate.NotNull("k"),
      Validate.InRange("v", 0.0, 0.05),
      Validate.Matches("flag", "^[AB]$"),
      Validate.Unique(Seq("k")),
      Validate.References(Seq("k"), dim, Seq("dk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map(
      "not_null:k" -> 1L,
      "in_range:v" -> 1L,
      "matches:flag" -> 1L,
      "unique:k" -> 1L, // key 1 twice -> one surplus row (null keys distinct-ish is fine: one null only)
      "references:k" -> 1L))
  }

  test("Unique exempts null keys (SQL UNIQUE-constraint semantics)") {
    val spark0 = spark
    import spark0.implicits._
    // three null keys + two null-composite keys: none are violations;
    // the lone real duplicate contributes exactly one surplus row
    val df = Seq(
      (Option.empty[Long], Some(1L)), (None, Some(1L)), (None, None),
      (Some(5L), None), (Some(5L), None),
      (Some(9L), Some(2L)), (Some(9L), Some(2L)))
      .toDF("a", "b")
    val rep = Validate.report(df, Seq(Validate.Unique(Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("unique:a,b" -> 1L))
  }

  test("two rules with the same generated name get distinct report rows") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(0.02, 0.2, 0.5).toDF("v")
    val rep = Validate.report(df, Seq(
      Validate.InRange("v", 0.0, 0.1),   // 0.2, 0.5 violate
      Validate.InRange("v", 0.0, 0.3)))  // 0.5 violates
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("in_range:v" -> 2L, "in_range:v#2" -> 1L))
  }

  test("passes() is the boolean gate form") {
    val spark0 = spark
    import spark0.implicits._
    val clean = Seq((1L, 0.01), (2L, 0.02)).toDF("k", "v")
    assert(Validate.passes(clean,
      Seq(Validate.NotNull("k"), Validate.InRange("v", 0.0, 0.05))))
    assert(!Validate.passes(clean, Seq(Validate.InRange("v", 0.0, 0.015))))
  }

  test("row-local rules share one aggregate (single scan, no join)") {
    val df = Tables(spark, SparkTestBase.Sf0001, "lineitem")
    val plan = Validate.report(df, Seq(
      Validate.NotNull("l_quantity"),
      Validate.InRange("l_discount", 0.0, 0.05),
      Validate.Matches("l_returnflag", "^[ARN]$")))
      .queryExecution.optimizedPlan.toString
    // one scan of lineitem for all three rules
    assert("Relation \\[".r.findAllIn(plan).size == 1, plan)
  }
}
