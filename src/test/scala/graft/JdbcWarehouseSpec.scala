package graft

import graft.schema.FieldRepr
import graft.warehouse._
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.time.Instant

/** The ABC's swap-the-subclass premise (`classes.py:18-64`;
  * `README.md:7-12`), proven: the SAME `Warehouse` lifecycle the parquet
  * backend passes (WarehouseSpec), green against the JDBC backend over
  * embedded Derby — including the trait-concrete surface (fetch, query,
  * rebuild, describe, loadJson) that a new backend inherits for free.
  */
class JdbcWarehouseSpec extends SparkSpec {

  private def freshWh(): JdbcWarehouse = {
    val dir = Files.createTempDirectory("graft-jdbc-spec").toString
    new JdbcWarehouse(spark, s"jdbc:derby:$dir/wh;create=true")
  }

  test("create / get / drop cycle with NotFound and Conflict semantics") {
    val wh = freshWh()
    assert(wh.get("t1") == Left(TableNotFound("t1")))
    val schema = Seq(FieldRepr("id", "INTEGER", "NULLABLE"),
      FieldRepr("name", "STRING", "NULLABLE"))
    assert(wh.create("t1", schema).isRight)
    assert(wh.get("t1").map(_.schema.fieldNames.toSeq) == Right(Seq("id", "name")))
    assert(wh.create("t1", schema).isLeft) // Conflict
    assert(wh.drop("t1").isRight)
    assert(wh.get("t1") == Left(TableNotFound("t1")))
    assert(wh.drop("t1", notFoundOk = false) == Left(TableNotFound("t1")))
    assert(wh.drop("t1").isRight)
  }

  test("rebuild reuses the pre-drop schema") {
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
    assert(wh.vacuum(t0.minusSeconds(60)).isEmpty)
    assert(wh.get("t3").isRight)
    assert(wh.vacuum(t0.plusSeconds(60)) == Seq("t3"))
    assert(wh.get("t3") == Left(TableNotFound("t3")))
  }

  test("load: prepare -> infer -> create -> append, then trait fetch/query") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((3L, "c", 1.5), (1L, "a", 2.5), (2L, "b", 0.5))
      .toDF("id", "name key", "score")
    assert(wh.load("loaded", df) == Right(3L))
    val m = wh.meta("loaded").toOption.get
    assert(m.schema.map(_.name).contains("name_key"))
    val fetched = wh.fetch("loaded", Seq("id", "score"),
      Seq("score" -> QuerySort.Desc), count = 2)
    val rows = fetched.toOption.get.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 2.5), (3L, 1.5)))
    assert(wh.query("SELECT count(*) AS n FROM loaded").as[Long].head() == 3L)
    assert(wh.load("loaded", df).isRight)
    assert(wh.query("SELECT count(*) AS n FROM loaded").as[Long].head() == 6L)
  }

  test("additive schema evolution becomes ALTER TABLE ADD COLUMN") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    assert(wh.load("evo", Seq((1L, "a")).toDF("id", "name")) == Right(1L))
    assert(wh.load("evo", Seq((2L, "b", 9.5)).toDF("id", "name", "score")) == Right(1L))
    val back = wh.get("evo").toOption.get.orderBy("id")
    assert(back.columns.toSeq.map(_.toLowerCase) == Seq("id", "name", "score"))
    val rows = back.select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some(9.5))))
    assert(wh.meta("evo").toOption.get.schema.map(_.name) == Seq("id", "name", "score"))
  }

  test("upsert: matched rows replace, fresh rows append, survivors intact") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    assert(wh.load("ups", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "name")).isRight)
    assert(wh.upsert("ups",
      Seq((2L, "B2"), (9L, "NEW")).toDF("id", "name"), Seq("id")).isRight)
    val got = wh.get("ups").toOption.get.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "NEW")))
  }

  test("rename moves data and metadata; Conflict on existing target") {
    val wh = freshWh()
    val spark0 = spark
    import spark0.implicits._
    assert(wh.load("rn_a", Seq((1L, "x")).toDF("id", "v")).isRight)
    assert(wh.setExpiry("rn_a", Some(Instant.parse("2030-01-01T00:00:00Z"))).isRight)
    assert(wh.rename("rn_a", "rn_b").isRight)
    assert(wh.get("rn_a") == Left(TableNotFound("rn_a")))
    assert(wh.get("rn_b").toOption.get.count() == 1L)
    assert(wh.meta("rn_b").toOption.get.expiresAtMillis.isDefined)
    assert(wh.load("rn_c", Seq((2L, "y")).toDF("id", "v")).isRight)
    assert(wh.rename("rn_c", "rn_b").isLeft) // Conflict
  }

  test("loadJson (flat records) infers via the lattice") {
    val wh = freshWh()
    val lines = Seq("""{"v": 1, "a key": "x"}""", """{"v": "two", "a key": "y"}""")
    assert(wh.loadJson("j1", lines) == Right(2L))
    val schema = wh.meta("j1").toOption.get.schema
    assert(schema.find(_.name == "v").map(_.fieldType) == Some("STRING"))
    assert(schema.map(_.name).contains("a_key"))
  }

  test("describe renders the schema tree from metadata") {
    val wh = freshWh()
    wh.create("d1", Seq(FieldRepr("id", "INTEGER", "NULLABLE"),
      FieldRepr("name", "STRING", "NULLABLE")))
    val out = wh.describe("d1").toOption.get
    assert(out.contains("├─ id") && out.contains("└─ name"))
  }

  test("the SAME trait-typed lifecycle runs green on BOTH backends") {
    val spark0 = spark
    import spark0.implicits._
    def lifecycle(wh: Warehouse): Seq[(Long, String)] = {
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      assert(wh.load("poly", df).isRight)
      assert(wh.upsert("poly", Seq((2L, "B"), (3L, "c")).toDF("id", "name"),
        Seq("id")).isRight)
      val out = wh.get("poly").toOption.get.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(wh.drop("poly").isRight)
      out
    }
    val parquetWh: Warehouse = new SparkWarehouse(spark,
      Files.createTempDirectory("graft-poly-pq").toString)
    val jdbcWh: Warehouse = freshWh()
    val expected = Seq((1L, "a"), (2L, "B"), (3L, "c"))
    assert(lifecycle(parquetWh) == expected)
    assert(lifecycle(jdbcWh) == expected)
  }
}
