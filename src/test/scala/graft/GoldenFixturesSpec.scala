package graft

import graft.ingest.{Chunker, Ingest}
import graft.schema._
import org.apache.spark.sql.functions._

/** Ports of the reference's own test fixtures (FIXTURES.md §1-4) as golden
  * tests: the doc-example unification, the 26-field articles schema with
  * existing-schema pinning, the 1000-record chunking round trip with
  * dirty keys, and the 4-way schema-conversion matrix shape.
  */
class GoldenFixturesSpec extends SparkSpec {

  // ---- FIXTURES.md §2: the nested-inference doc example
  // (reference schema.py:509-566, runnable bigquery/schema.py:644-700)
  test("doc example: full unification incl. type errors and G's scalar/list mix") {
    val spark0 = spark
    import spark0.implicits._
    val lines = Seq(
      """{"A": 1, "B": 2, "C": 3}""",
      """{"A": 1.23, "B": true, "C": 56}""",
      """{"A": 56, "B": "Google", "D": [
        {"D1": true, "D2": false, "D3": [{"D3a": 123}]},
        {"D1": true, "D2": false, "D3": [{"D3a": 456, "D3b": "Something"}]}]}"""
        .replaceAll("\n\\s*", ""),
      """null""",
      """123""",
      """{"E": null, "FFF": 666}""",
      """{"G": 123}""",
      """{"G": [1,2,3,4,5,6,7,8,9,10]}""",
      """{"FFF": 456.123, "G": [2,3,4,5,6,1]}""")
    val d = SchemaInference.deconstructJson(spark.createDataset(lines))
    assert(d.records == 7)
    assert(d.typeErrors == 2) // null and 123 at top level
    val repr = Widen.condense(d.lat)
    val byName = repr.map(f => f.name -> f).toMap
    assert(byName("A").fieldType == "FLOAT") // {int,float} -> FLOAT
    assert(byName("B").fieldType == "STRING") // {int,bool,str} -> STRING
    assert(byName("C").fieldType == "INTEGER")
    val dField = byName("D")
    assert(dField.fieldType == "RECORD" && dField.mode == "REPEATED")
    val dSub = dField.fields.map(f => f.name -> f).toMap
    assert(dSub("D1").fieldType == "BOOLEAN" && dSub("D2").fieldType == "BOOLEAN")
    assert(dSub("D3").fieldType == "RECORD" && dSub("D3").mode == "REPEATED")
    assert(dSub("D3").fields.map(f => f.name -> f.fieldType).toMap ==
      Map("D3a" -> "INTEGER", "D3b" -> "STRING"))
    assert(byName("E").fieldType == "STRING") // only-null -> default STRING
    assert(byName("FFF").fieldType == "FLOAT")
    // G mixes scalar int and list-of-int (documented-unsupported mix):
    // list wins, element INTEGER, REPEATED
    assert(byName("G") == FieldRepr("G", "INTEGER", "REPEATED"))
  }

  // ---- the reference's rendered `Erco_articles` describe tree
  // (bigquery/schema.py:322-349, the describe() docstring example) —
  // byte-identical golden render through Describe.referenceTree,
  // including the 60/30/10 template, `├─┬ ` record branch, `│ ` rails,
  // nested name-width narrowing, and trailing column padding.
  test("describe renders the reference's Erco_articles docstring tree verbatim") {
    def f(n: String, t: String) = FieldRepr(n, t, "NULLABLE")
    val fields = Seq(
      f("pkm_familie", "INTEGER"), f("b_neuheit", "BOOLEAN"),
      f("s_familie", "STRING"), f("u_ugr", "FLOAT"),
      f("led_module", "STRING"), f("s_farbe_kombifeld_indirekt", "STRING"),
      f("s_abblendraster", "STRING"), f("s_control", "STRING"),
      f("s_baugroesse_list_display_string", "STRING"),
      f("u_beleuchtungsstaerke_dl_sym_raster", "FLOAT"),
      f("power_singlefield_with_unit", "STRING"),
      f("s_farbe_kombifeld", "STRING"),
      FieldRepr("t_productfeature", "RECORD", "REPEATED", Seq(
        f("ID", "STRING"), f("Kurztext", "STRING"), f("Text", "STRING"))),
      f("s_montageart", "STRING"), f("s_artikelbild", "STRING"),
      f("s_leuchtenlichtstrom_display_unit", "STRING"),
      f("lumens_with_unit", "STRING"), f("artno_schoen", "STRING"),
      f("pkm_artikel", "STRING"), f("s_einbaudetail", "FLOAT"),
      f("s_untertitel", "STRING"), f("s_gehaeusefarbe", "STRING"),
      f("s_leistung_display_unit", "STRING"), f("s_lichtwerkzeug", "STRING"),
      f("s_lichtaustritt", "STRING"), f("product_image", "STRING"))
    val got = Describe.referenceTree("Table [Erco_articles]", fields,
      echo = false)
    def pad(s: String, w: Int) = s + " " * (w - s.length)
    val leaf = fields.map {
      case r if r.fields.nonEmpty => None
      case x => Some(x)
    }
    val expected = ("Table [Erco_articles]" +: fields.zipWithIndex.map {
      case (fld, i) =>
        val branch = if (i == fields.size - 1) "└" else "├"
        if (fld.fields.isEmpty)
          s"$branch── " + pad(fld.name, 60) + pad(fld.fieldType, 30) +
            pad(fld.mode, 10)
        else
          (s"$branch─┬ " + pad(fld.name, 60) + pad(fld.fieldType, 30) +
            pad(fld.mode, 10)) + "\n" +
            fld.fields.zipWithIndex.map { case (c, j) =>
              val cb = if (j == fld.fields.size - 1) "└" else "├"
              s"│ $cb── " + pad(c.name, 58) + pad(c.fieldType, 30) +
                pad(c.mode, 10)
            }.mkString("\n")
    }).mkString("", "\n", "\n")
    assert(got == expected)
    // spot-pin three raw lines against the docstring literal
    val lines = got.split("\n")
    assert(lines(1) ==
      "├── pkm_familie                                                 INTEGER                       NULLABLE  ")
    assert(lines(13) ==
      "├─┬ t_productfeature                                            RECORD                        REPEATED  ")
    assert(lines(14) ==
      "│ ├── ID                                                        STRING                        NULLABLE  ")
    assert(lines.last ==
      "└── product_image                                               STRING                        NULLABLE  ")
    assert(leaf.flatten.size == 25)
  }

  test("describe prints to stdout AND returns the tree (reference echo parity)") {
    val sample = Seq(FieldRepr("a", "INTEGER", "NULLABLE"),
      FieldRepr("r", "RECORD", "REPEATED", Seq(FieldRepr("b", "STRING", "NULLABLE"))))
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val returned = Console.withOut(ps) { Describe("t", sample) }
    ps.flush()
    assert(buf.toString("UTF-8") == returned, "printed output must equal the returned string")
    val refBuf = new java.io.ByteArrayOutputStream()
    val refPs = new java.io.PrintStream(refBuf, true, "UTF-8")
    val refReturned = Console.withOut(refPs) {
      Describe.referenceTree("Table schema", sample)
    }
    refPs.flush()
    assert(refBuf.toString("UTF-8") == refReturned)
    // deep nesting: rails stack and the name column keeps narrowing
    val deep = Seq(FieldRepr("D", "RECORD", "REPEATED", Seq(
      FieldRepr("D1", "BOOLEAN", "NULLABLE"),
      FieldRepr("D3", "RECORD", "REPEATED", Seq(
        FieldRepr("D3a", "INTEGER", "NULLABLE"),
        FieldRepr("D3b", "STRING", "NULLABLE"))))),
      FieldRepr("G", "INTEGER", "REPEATED"))
    val tree = Describe.referenceTree("Table schema", deep, echo = false)
    val tl = tree.split("\n")
    assert(tl(1).startsWith("├─┬ D "))
    assert(tl(2).startsWith("│ ├── D1"))
    assert(tl(3).startsWith("│ └─┬ D3"))
    assert(tl(4).startsWith("│   ├── D3a"))
    assert(tl(5).startsWith("│   └── D3b"))
    assert(tl(6).startsWith("└── G"))
    // name column narrows by indent per level: D3a pads to 56, after a
    // 4-char rail + 4-char branch the type column stays at offset 64
    assert(tl(4).indexOf("INTEGER") == 8 + 56)
  }

  // ---- FIXTURES.md §1: the 26-field articles golden schema with the
  // existing-schema override pinning u_ugr / u_beleuchtungsstaerke…
  // (reference test_bigquery.py:422-445 passes the schema to pin fields
  // that records alone would widen differently).
  test("articles schema: 26 fields reproduced with existing-schema pinning") {
    val stringFields = Seq("s_familie", "led_module",
      "s_farbe_kombifeld_indirekt", "s_abblendraster", "s_control",
      "s_baugroesse_list_display_string", "power_singlefield_with_unit",
      "s_farbe_kombifeld", "s_montageart", "s_artikelbild",
      "s_leuchtenlichtstrom_display_unit", "lumens_with_unit",
      "artno_schoen", "pkm_artikel", "s_einbaudetail", "s_untertitel",
      "s_gehaeusefarbe", "s_leistung_display_unit", "s_lichtwerkzeug",
      "s_lichtaustritt", "product_image")
    val golden: Seq[FieldRepr] =
      Seq(FieldRepr("pkm_familie", "INTEGER", "NULLABLE"),
        FieldRepr("b_neuheit", "BOOLEAN", "NULLABLE"),
        FieldRepr("u_ugr", "INTEGER", "NULLABLE"),
        FieldRepr("u_beleuchtungsstaerke_dl_sym_raster", "INTEGER", "NULLABLE"),
        FieldRepr("t_productfeature", "RECORD", "REPEATED", Seq(
          FieldRepr("Kurztext", "STRING", "NULLABLE"),
          FieldRepr("Text", "STRING", "NULLABLE"),
          FieldRepr("ID", "STRING", "NULLABLE")))) ++
        stringFields.map(FieldRepr(_, "STRING", "NULLABLE"))
    assert(golden.length == 26)

    // representative records: u_* fields arrive as floats (the pandas
    // empty-field pitfall the reference documents) — the existing schema
    // must pin them back to INTEGER
    val record: Map[String, Any] = Map(
      "pkm_familie" -> 1742L, "b_neuheit" -> false,
      "u_ugr" -> 19.0, "u_beleuchtungsstaerke_dl_sym_raster" -> 300.0,
      "t_productfeature" -> Seq(
        Map("Kurztext" -> "k", "Text" -> "t", "ID" -> "77"))) ++
      stringFields.map(_ -> "x").toMap
    val inferred = SchemaInference.extract(Seq(record), golden, forceNumeric = false)
    assert(inferred.toSet == golden.toSet,
      s"diff: ${(inferred.toSet diff golden.toSet)} / ${(golden.toSet diff inferred.toSet)}")
    // and without pinning, the floats widen to FLOAT (the pitfall itself)
    val unpinned = SchemaInference.extract(Seq(record))
    assert(unpinned.find(_.name == "u_ugr").get.fieldType == "FLOAT")
  }

  // ---- FIXTURES.md §3: 1000-record chunking round trip with dirty keys
  // (reference test_load_datawarehouse.py:164-200): every chunk ≤ limit,
  // exact order-preserving reconstruction.
  test("chunking workload: dirty keys cleaned, chunks bounded, order reconstructed") {
    val spark0 = spark
    import spark0.implicits._
    val lines = (0 until 1000).map { id =>
      val dicts = (0 until id % 7).map(k => s""""Item #$k": $k""").mkString(",")
      s"""{"a": ${10 * id}, "b something": {"b 1": true,
          "b.2": {"$id": "Something", "List": [0,1,2,3,4,5,6,7,8,9],
                  "Dicts": {$dicts}}}}""".replaceAll("\n\\s*", " ")
    }
    val df = Ingest.prepareJson(spark, spark.createDataset(lines))
    // dirty keys cleaned recursively
    assert(df.columns.toSeq.contains("b_something"))
    val sized = df.withColumn("_sz", Ingest.rowJsonSize(df))
    Chunker.greedyChunkIds(sized, "_sz", sizeLimit = 4096L,
      orderCols = Seq(col("a"))) match {
      case Left(e) => fail(e.message)
      case Right(ch) =>
        assert(ch.rows == 1000L)
        val rows = ch.df.select("a", "_sz", "_chunk").collect()
          .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
        // hard cap per chunk
        val perChunk = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
        assert(perChunk.values.forall(_ <= 4096L))
        // reconstruction: reading chunks in id order yields the input order
        val reconstructed = rows.sortBy(r => (r._3, r._1)).map(_._1)
        assert(reconstructed.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
        ch.unpersist()
    }
  }

  // ---- FIXTURES.md §4: conversion-matrix shape — 3-level nesting with
  // BYTES leaves and a RECORD REPEATED, 4-way round trip.
  test("conversion matrix: 3-level nested BYTES schema round-trips all ways") {
    val schema = Seq(
      FieldRepr("artno_schoen", "STRING", "NULLABLE"),
      FieldRepr("b_neuheit", "BOOLEAN", "REQUIRED"),
      FieldRepr("pkm_familie", "INTEGER", "NULLABLE"),
      FieldRepr("t_productfeature", "RECORD", "REPEATED", Seq(
        FieldRepr("Kurztext", "STRING", "NULLABLE"),
        FieldRepr("ID", "STRING", "NULLABLE"))),
      FieldRepr("product_image", "RECORD", "REPEATED", Seq(
        FieldRepr("name", "STRING", "NULLABLE"),
        FieldRepr("data", "RECORD", "REPEATED", Seq(
          FieldRepr("png", "BYTES", "NULLABLE"),
          FieldRepr("jpg", "BYTES", "NULLABLE"))))),
      FieldRepr("u_ugr", "INTEGER", "NULLABLE"))
    // dict -> json -> dict (idempotent self-conversion)
    assert(SchemaCodec.fromJson(SchemaCodec.toJson(schema)) == schema)
    // dict -> StructType -> dict: shape-preserving (REQUIRED survives via
    // nullable=false; BYTES via BinaryType)
    val st = Widen.toStructType(schema)
    assert(!st("b_neuheit").nullable)
    val back = SchemaCodec.fromStructType(st)
    assert(Widen.toStructType(back) == st)
    // deep BYTES leaf survives
    val img = back.find(_.name == "product_image").get
    assert(img.fields.find(_.name == "data").get
      .fields.map(_.fieldType).toSet == Set("BYTES"))
  }

  // ---- build_api_repr's parameterized attributes
  // (bigquery/schema.py:146-160): precision/scale on NUMERIC, maxLength
  // on STRING/BYTES, policyTags names — all must survive json and
  // StructType round trips without widening to type defaults.
  test("conversion matrix: NUMERIC(10,2) + maxLength + policyTags round-trip") {
    val schema = Seq(
      FieldRepr("price", "NUMERIC", "NULLABLE",
        precision = Some(10), scale = Some(2)),
      FieldRepr("big", "BIGNUMERIC", "NULLABLE",
        precision = Some(38), scale = Some(20)),
      FieldRepr("code", "STRING", "REQUIRED", maxLength = Some(16L),
        policyTags = Seq("projects/p/locations/l/taxonomies/t/policyTags/pii")),
      FieldRepr("blob", "BYTES", "NULLABLE", maxLength = Some(1024L)))
    // json round trip keeps every attribute
    assert(SchemaCodec.fromJson(SchemaCodec.toJson(schema)) == schema)
    // serialized form mirrors the api: policyTags is {"names": [...]}
    val json = SchemaCodec.toJson(schema)
    assert(json.contains(""""policyTags":{"names":["""))
    assert(json.contains(""""precision":10""") && json.contains(""""scale":2"""))
    assert(json.contains(""""maxLength":16"""))
    // StructType leg: declared precision/scale becomes the EXACT decimal
    val st = Widen.toStructType(schema)
    assert(st("price").dataType == org.apache.spark.sql.types.DecimalType(10, 2))
    assert(st("big").dataType == org.apache.spark.sql.types.DecimalType(38, 20))
    // and comes back as NUMERIC(10,2), not the (38,9) default
    val back = SchemaCodec.fromStructType(st)
    val price = back.find(_.name == "price").get
    assert(price.fieldType == "NUMERIC" &&
      price.precision.contains(10) && price.scale.contains(2))
    val big = back.find(_.name == "big").get
    assert(big.fieldType == "BIGNUMERIC" &&
      big.precision.contains(38) && big.scale.contains(20))
    // a BIGNUMERIC declared wider than Spark's 38-digit cap clamps
    // (documented divergence) instead of throwing
    assert(Widen.sparkTypeOf(FieldRepr("huge", "BIGNUMERIC", "NULLABLE",
        precision = Some(76), scale = Some(38)))
      == org.apache.spark.sql.types.DecimalType(38, 38))
    // maxLength does not serialize on non-string types, precision not on STRING
    val stray = SchemaCodec.toJson(Seq(
      FieldRepr("n", "INTEGER", "NULLABLE", maxLength = Some(5L)),
      FieldRepr("s", "STRING", "NULLABLE", precision = Some(9))))
    assert(!stray.contains("maxLength") && !stray.contains("precision"))
  }
}
