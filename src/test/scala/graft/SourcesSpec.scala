package graft

import graft.sources.Sources
import org.apache.spark.sql.SaveMode

import java.nio.file.Files

/** Source/sink round trips: CSV + JSON readers with schema discipline,
  * the size-budgeted parquet writer, and the JDBC sink/scan against an
  * embedded Derby database (the vendor-neutral warehouse path).
  */
class SourcesSpec extends SparkSpec {

  test("csv round trip with and without supplied schema") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
      .write.option("header", "true").mode("overwrite").csv(dir)
    val inferred = Sources.csv(spark, dir)
    assert(inferred.count() == 2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
    val fixed = Sources.csv(spark, dir, Some(schema))
    assert(fixed.schema == schema)
    assert(fixed.orderBy("id").collect()(0).getLong(0) == 1L)
  }

  test("json records file reads through lattice inference") {
    val dir = Files.createTempDirectory("graft-json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"v": 1, "who": {"a key": "x"}}
        |{"v": "two", "who": {"a key": "y"}}""".stripMargin)
    val df = Sources.jsonRecords(spark, dir)
    // mixed int+str -> STRING; nested record -> array-of-struct; key cleaned
    assert(df.schema("v").dataType == org.apache.spark.sql.types.StringType)
    val whoType = df.schema("who").dataType
    assert(whoType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    assert(df.select("who").schema.treeString.contains("a_key"))
    assert(df.count() == 2)
    val schema = Sources.inferJsonSchema(spark, dir)
    assert(schema.map(_.name).toSet == Set("v", "who"))
  }

  test("size-budgeted parquet writer caps file sizes") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-sized").toString + "/out"
    val df = (1L to 2000L).map(i => (i, "x" * 100)).toDF("id", "payload")
    Sources.writeParquetSized(df.coalesce(1), dir, SaveMode.Overwrite,
      targetFileBytes = 20000L)
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // ~110 json bytes/row, 20 KB budget -> ~180 rows/file -> >5 files
    assert(files >= 5, s"expected multiple size-capped files, got $files")
    assert(spark.read.parquet(dir).count() == 2000L)
  }

  test("jdbc sink + scan round trip on embedded Derby") {
    val spark0 = spark
    import spark0.implicits._
    val dbDir = Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.5), (3L, "gamma", 30.5))
      .toDF("id", "name", "score")
    Sources.writeJdbc(df, url, "loaded_rows", SaveMode.Overwrite)
    val back = Sources.jdbc(spark, url, "loaded_rows")
    assert(back.count() == 3)
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "alpha", 10.5), (2L, "beta", 20.5), (3L, "gamma", 30.5)))
    // appending doubles the rows (the chunked-insert path)
    Sources.writeJdbc(df, url, "loaded_rows", SaveMode.Append)
    assert(Sources.jdbc(spark, url, "loaded_rows").count() == 6)
  }

  test("json-lines sink reads back through warehouse-rule inference") {
    val spark0 = spark
    import spark0.implicits._
    val out = Files.createTempDirectory("graft-jsonl").toString
    val df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "n")
    Sources.writeJsonLines(df, s"$out/t")
    val back = Sources.jsonRecords(spark, s"$out/t")
    // OUR lattice: JSON ints land as LongType (INTEGER), strings as String
    assert(back.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(back.select("id", "name", "n").orderBy("id").collect().map(
      r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("orc sink + scan round trip preserves schema and rows") {
    val spark0 = spark
    import spark0.implicits._
    val out = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "v")
    Sources.writeOrc(df, s"$out/t")
    val back = Sources.orc(spark, s"$out/t")
    // files read back fully nullable (same as parquet) — names/types hold
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().map(
      r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "x", 1.5), (2L, "y", 2.5)))
  }

  test("text sink + scan round trip preserves every line") {
    val sps = spark; import sps.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-text").toString
    val lines = Seq("alpha beta", "gamma", "alpha beta").toDF("value")
    Sources.writeText(lines, out)
    val back = Sources.text(spark, out)
    assert(back.columns.toSeq == Seq("value"))
    assert(back.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha beta", "alpha beta", "gamma"))
  }

  test("binaryFiles reads whole files and the glob filter prunes listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.txt"), Array[Byte](9))
    val rows = Sources.binaryFiles(spark, dir.toString, Some("*.bin")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("length") == 3L)
    assert(rows.head.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3))
  }
}
