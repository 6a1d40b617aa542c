package graft

import graft.schema.FieldRepr
import graft.warehouse._
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.time.Instant

/** End-to-end lifecycle tests over a temp warehouse dir — the Spark
  * equivalents of the reference's live-cloud integration cycle
  * (`test/test_bigquery.py:447-518`: create→assert→drop→assert-NotFound,
  * set/clear expiry) plus the full load pipeline
  * (`bigquery/__init__.py:363-461`).
  */
class WarehouseSpec extends SparkSpec {

  private def freshWh() =
    new SparkWarehouse(spark, Files.createTempDirectory("graft-wh-spec").toString)

  test("create / get / drop cycle with NotFound semantics") {
    val wh = freshWh()
    assert(wh.get("t1") == Left(TableNotFound("t1")))
    val schema = Seq(FieldRepr("id", "INTEGER", "NULLABLE"),
      FieldRepr("name", "STRING", "NULLABLE"))
    assert(wh.create("t1", schema).isRight)
    assert(wh.get("t1").map(_.schema.fieldNames.toSeq) == Right(Seq("id", "name")))
    // create without replace on existing table = Conflict
    assert(wh.create("t1", schema).isLeft)
    assert(wh.drop("t1").isRight)
    assert(wh.get("t1") == Left(TableNotFound("t1")))
    // drop with notFoundOk=false surfaces the error; =true tolerates
    assert(wh.drop("t1", notFoundOk = false) == Left(TableNotFound("t1")))
    assert(wh.drop("t1").isRight)
  }

  test("rebuild reuses the pre-drop schema (bigquery/__init__.py:183-188)") {
    val wh = freshWh()
    val schema = Seq(FieldRepr("x", "FLOAT", "NULLABLE"))
    assert(wh.create("t2", schema).isRight)
    assert(wh.rebuild("t2").isRight)
    assert(wh.meta("t2").map(_.schema) == Right(schema))
  }

  test("set/clear expiry + vacuum with injected clock") {
    val wh = freshWh()
    assert(wh.create("t3", Seq(FieldRepr("x", "STRING", "NULLABLE"))).isRight)
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    assert(wh.setExpiry("t3", Some(t0)).isRight)
    assert(wh.meta("t3").map(_.expiresAtMillis) == Right(Some(t0.toEpochMilli)))
    // not yet expired
    assert(wh.vacuum(t0.minusSeconds(60)).isEmpty)
    assert(wh.get("t3").isRight)
    // expired
    assert(wh.vacuum(t0.plusSeconds(60)) == Seq("t3"))
    assert(wh.get("t3") == Left(TableNotFound("t3")))
    // clear expiry
    assert(wh.create("t4", Seq(FieldRepr("x", "STRING", "NULLABLE")),
      expires = Some(t0)).isRight)
    assert(wh.setExpiry("t4", None).isRight)
    assert(wh.vacuum(t0.plusSeconds(60)).isEmpty)
  }

  test("load: prepare -> infer -> create -> chunked append, then fetch") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((3L, "c", 1.5), (1L, "a", 2.5), (2L, "b", 0.5))
      .toDF("id", "name key", "score")
    assert(wh.load("loaded", df) == Right(3L))
    // keys cleaned, schema inferred and recorded
    val m = wh.meta("loaded").toOption.get
    assert(m.schema.map(_.name).contains("name_key"))
    // fetch: projection + sort + limit (reference fetch surface)
    val fetched = wh.fetch("loaded", Seq("id", "score"),
      Seq("score" -> QuerySort.Desc), count = 2)
    val rows = fetched.toOption.get.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 2.5), (3L, 1.5)))
    // query: SQL over the registered view
    assert(wh.query("SELECT count(*) AS n FROM loaded").as[Long].head() == 3L)
    // append via load again merges schema and adds rows
    assert(wh.load("loaded", df).isRight)
    assert(wh.query("SELECT count(*) AS n FROM loaded").as[Long].head() == 6L)
  }

  test("loadJson infers with the lattice (mixed str+int -> STRING)") {
    val wh = freshWh()
    val lines = Seq(
      """{"v": 1, "meta": {"a key": "x"}}""",
      """{"v": "two", "meta": {"a key": "y"}}""")
    assert(wh.loadJson("j1", lines) == Right(2L))
    val schema = wh.meta("j1").toOption.get.schema
    assert(schema.find(_.name == "v").map(_.fieldType) == Some("STRING"))
    val metaField = schema.find(_.name == "meta").get
    assert(metaField.fieldType == "RECORD" && metaField.mode == "REPEATED")
    assert(metaField.fields.map(_.name) == Seq("a_key"))
  }

  test("fullSchema=true skips inference and requires a schema") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(wh.load("fs", df, fullSchema = true).isLeft)
    val schema = Seq(FieldRepr("id", "INTEGER", "NULLABLE"),
      FieldRepr("name", "STRING", "NULLABLE"))
    assert(wh.load("fs", df, schema = schema, fullSchema = true) == Right(1L))
  }

  test("describe renders the table schema tree") {
    val wh = freshWh()
    wh.create("d1", Seq(FieldRepr("id", "INTEGER", "NULLABLE"),
      FieldRepr("nest", "RECORD", "REPEATED",
        Seq(FieldRepr("k", "STRING", "NULLABLE")))))
    val out = wh.describe("d1").toOption.get
    assert(out.contains("├─ id") && out.contains("└─ nest") && out.contains("└─ k"))
  }

  test("load with timestamp and int columns keeps files readable (schema alignment)") {
    // regression: inference previously round-tripped through JSON, typing
    // timestamps as STRING, then appended the raw TimestampType files —
    // footer-conflicting parquet. Typed input now derives its schema from
    // the DataFrame and data is cast to the resolved table schema.
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), 1.5f),
      (2, java.sql.Timestamp.valueOf("2024-06-07 08:09:10"), 2.5f))
      .toDF("id", "when_ts", "score")
    assert(wh.load("typed", df) == Right(2L))
    // second load appends more files; every file must agree with the schema
    assert(wh.load("typed", df) == Right(2L))
    val back = wh.get("typed").toOption.get
    assert(back.count() == 4)
    val m = wh.meta("typed").toOption.get
    assert(m.schema.find(_.name == "when_ts").map(_.fieldType) == Some("TIMESTAMP"))
    assert(m.schema.find(_.name == "id").map(_.fieldType) == Some("INTEGER"))
    // values survive the round trip
    val ts = back.filter($"id" === 1).select("when_ts")
      .collect()(0).getTimestamp(0)
    assert(ts == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
  }

  test("load into an existing table evolves and persists the merged schema") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    assert(wh.load("evolve", Seq((1L, "a")).toDF("id", "name")).isRight)
    assert(wh.load("evolve", Seq((2L, "b", 9.5)).toDF("id", "name", "extra")).isRight)
    val m = wh.meta("evolve").toOption.get
    assert(m.schema.map(_.name).contains("extra"))
    // rows from the first load read null for the new column
    val rows = wh.get("evolve").toOption.get.orderBy("id").collect()
    assert(rows.length == 2)
  }

  test("update overwrite preserves the meta sidecar") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    wh.load("mk", Seq((1L, "a")).toDF("id", "name"))
    wh.setExpiry("mk", Some(java.time.Instant.parse("2030-01-01T00:00:00Z")))
    assert(wh.update("mk", Seq((2L, "b")).toDF("id", "name"), overwrite = true).isRight)
    val m = wh.meta("mk").toOption.get
    assert(m.schema.nonEmpty, "overwrite lost the schema sidecar")
    assert(m.expiresAtMillis.contains(
      java.time.Instant.parse("2030-01-01T00:00:00Z").toEpochMilli),
      "overwrite lost the expiry")
  }

  test("schemaless create is legal; get returns an empty typed frame after setSchema") {
    val wh = freshWh()
    assert(wh.create("bare").isRight)
    assert(wh.get("bare").toOption.get.count() == 0)
    assert(wh.setSchema("bare",
      Seq(graft.schema.FieldRepr("x", "INTEGER", "NULLABLE"))).isRight)
    assert(wh.get("bare").toOption.get.schema.fieldNames.toSeq == Seq("x"))
  }

  test("update overwrite replaces rows") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    wh.load("u1", Seq((1L, "a")).toDF("id", "name"))
    assert(wh.update("u1", Seq((9L, "z")).toDF("id", "name"), overwrite = true).isRight)
    val rows = wh.get("u1").toOption.get.select("id").as[Long].collect().toSeq
    assert(rows == Seq(9L))
  }

  test("chunked load writes multiple files for multi-chunk data") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    // ~200 rows × ~60 bytes of JSON each with a 2 KiB limit → ≥5 chunks
    val df = (1L to 200L).map(i => (i, "x" * 40)).toDF("id", "payload")
    assert(wh.load("ch", df, sizeLimit = 2048L) == Right(200L))
    val files = new java.io.File(s"${wh.warehouseDir}/ch")
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(files >= 5, s"expected >=5 chunk files, got $files")
    assert(wh.get("ch").toOption.get.count() == 200L)
  }

  test("upsert replaces matched keys, appends fresh keys, preserves meta") {
    val spark0 = spark
    import spark0.implicits._
    val wh = freshWh()
    val base = (1L to 20L).map(i => (i, s"v$i", i * 10.0)).toDF("id", "name", "score")
    assert(wh.load("ups", base).isRight)
    wh.setExpiry("ups", Some(java.time.Instant.ofEpochMilli(99999999999999L)))
    val batch = Seq((5L, "CHANGED", 5.5), (21L, "FRESH", 21.5))
      .toDF("id", "name", "score")
    assert(wh.upsert("ups", batch, Seq("id")).isRight)
    val rows = wh.get("ups").toOption.get.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 21)
    assert(rows(4) == ((5L, "CHANGED", 5.5)))
    assert(rows(20) == ((21L, "FRESH", 21.5)))
    assert(rows(0) == ((1L, "v1", 10.0)))
    // meta (expiry + schema) survives the directory swap
    assert(wh.meta("ups").toOption.get.expiresAtMillis.contains(99999999999999L))
    // missing key column rejected
    assert(wh.upsert("ups", Seq(("x", 1.0)).toDF("name", "score"), Seq("id")).isLeft)
    // unknown table rejected
    assert(wh.upsert("nope", batch, Seq("id")).isLeft)
  }

  test("compact shrinks file count, clusters, preserves content and meta") {
    val spark0 = spark
    import spark0.implicits._
    val wh = freshWh()
    val df = (1L to 500L).map(i => (i, s"p$i")).toDF("id", "payload")
    assert(wh.load("cmp", df.repartition(24)).isRight)
    wh.setExpiry("cmp", Some(java.time.Instant.ofEpochMilli(99999999999999L)))
    def parquetFiles() = new java.io.File(s"${wh.warehouseDir}/cmp")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 20)
    assert(wh.compact("cmp", targetFiles = 2, sortCols = Seq("id")).isRight)
    // retire-in-place (r15): the LIVE inventory shrinks to the target;
    // the replaced files stay on disk for snapshot readers until
    // vacuumRetired physically reclaims them
    assert(wh.get("cmp").toOption.get.inputFiles.length <= 2)
    assert(parquetFiles() > 2,
      "retired files should remain on disk until vacuumRetired")
    assert(wh.vacuumRetired("cmp", java.time.Duration.ZERO,
      java.time.Instant.now().plusSeconds(5)).isRight)
    assert(parquetFiles() <= 2)
    // content identical
    val rows = wh.get("cmp").toOption.get.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 500 && rows(0) == ((1L, "p1"))
      && rows(499) == ((500L, "p500")))
    // range clustering: each file's id span is disjoint (min/max skip)
    val perFile = wh.get("cmp").toOption.get
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ => ()
    }
    // meta survives the swap
    assert(wh.meta("cmp").toOption.get.expiresAtMillis.contains(99999999999999L))
    // unknown table rejected
    assert(wh.compact("nope", 2).isLeft)
  }

  test("compact refuses bucketed tables instead of voiding their layout") {
    val spark0 = spark
    import spark0.implicits._
    val wh = freshWh()
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "k")
    assert(wh.createBucketed("cmpb", df, Seq("k"), numBuckets = 4).isRight)
    val res = wh.compact("cmpb", 2)
    assert(res.isLeft)
    assert(res.left.exists(_.message.contains("bucketed")))
    spark.sql("DROP TABLE IF EXISTS cmpb")
  }
}
