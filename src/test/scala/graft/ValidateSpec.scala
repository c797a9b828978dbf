package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import graft.checks.Checks
import graft.functions.geo
import graft.meta.{Footer, GeoColumnMeta, GeoMeta}
import graft.table.GeoTable

/** Validation fixture matrix (reference `tests/test_geoparquet_versions
  * .py` + `core/validate.py` check families): a clean write passes, and
  * each deliberately-corrupted variant trips exactly the intended check.
  */
class ValidateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tmp = java.nio.file.Files.createTempDirectory("graft-validate")

  /** CCW unit squares around deterministic centers. */
  private def polyTable(ccw: Boolean) = {
    val k = col("id")
    val cx = k * 3 - 50; val cy = k - 25
    val ring =
      if (ccw) concat(lit("POLYGON (("),
        cx - 1, lit(" "), cy - 1, lit(", "), cx + 1, lit(" "), cy - 1, lit(", "),
        cx + 1, lit(" "), cy + 1, lit(", "), cx - 1, lit(" "), cy + 1, lit(", "),
        cx - 1, lit(" "), cy - 1, lit("))"))
      else concat(lit("POLYGON (("),
        cx - 1, lit(" "), cy - 1, lit(", "), cx - 1, lit(" "), cy + 1, lit(", "),
        cx + 1, lit(" "), cy + 1, lit(", "), cx + 1, lit(" "), cy - 1, lit(", "),
        cx - 1, lit(" "), cy - 1, lit("))"))
    GeoTable.fromDataFrame(
      spark.range(1, 20).toDF("id")
        .withColumn("geometry", geo.st_geomfromtext(ring)),
      "geometry")
  }

  private def write(name: String, t: GeoTable): String = {
    val out = tmp.resolve(name).toString
    t.write(out)
    out
  }

  /** overwrite the geo footer key of every part with raw JSON. */
  private def poke(path: String, json: String): Unit =
    Footer.partFiles(path, new Configuration())
      .foreach(p => Footer.withKeyValueMetadata(p, Map(GeoMeta.FooterKey -> json)))

  private def errs(path: String): Seq[Checks.Finding] =
    Checks.validate(spark, path).filter(_.level == "error")

  test("encoding check catches corrupt WKB that keeps a valid header") {
    // truncated POLYGON body behind a plausible 5-byte header: the
    // header-only st_geometrytype no longer throws on these, so the
    // probe must use a fully-parsing expression (st_npoints)
    import spark.implicits._
    val good = graft.geom.Wkb.write(
      graft.geom.Wkt.parse("POLYGON((0 0,1 0,1 1,0 0))"))
    val out = tmp.resolve("badwkb").toString
    Seq((1L, good.take(9))).toDF("id", "geometry").write.parquet(out)
    poke(out, """{"version":"1.1.0","primary_column":"geometry",""" +
      """"columns":{"geometry":{"encoding":"WKB","geometry_types":[]}}}""")
    assert(errs(out).exists(_.check == "encoding"),
      s"expected the WKB-encoding finding: ${errs(out)}")
  }

  test("clean write validates with no errors") {
    val out = write("clean", polyTable(ccw = true))
    val f = errs(out)
    assert(f.isEmpty, s"unexpected errors: $f")
  }

  test("empty dataset and all-null geometry validate without crashing") {
    // r3 ADVICE: the folded one-pass probe aggregates min/max to NULL on
    // an empty (or all-null-geometry) dataset and getDouble threw — the
    // range checks must skip, not abort
    val empty = write("empty",
      GeoTable.fromDataFrame(
        spark.range(1, 20).toDF("id")
          .withColumn("geometry",
            geo.st_geomfromtext(concat(lit("POINT ("), col("id"), lit(" 1)"))))
          .filter(col("id") < 0),
        "geometry"))
    Checks.validate(spark, empty) // must not throw
    val allNull = write("allnull",
      GeoTable.fromDataFrame(
        spark.range(1, 20).toDF("id")
          .withColumn("geometry", geo.st_geomfromtext(lit(null: String))),
        "geometry"))
    Checks.validate(spark, allNull) // must not throw
  }

  test("per-file bbox check matches parts by full path, not basename") {
    // r3 ADVICE: hive layouts REUSE basenames across key= directories
    // (one task writing several dynamic partitions emits the same
    // part-00000-<uuid> name in each) — a basename-keyed bbox map
    // collides and compares files against the wrong declared envelope.
    // coalesce(1) forces exactly that layout; with disjoint per-key
    // extents any cross-matching produces false bbox errors.
    val out = tmp.resolve("hivecollide").toString
    spark.range(0, 40).toDF("id")
      .withColumn("k", when(col("id") % 2 === 0, "a").otherwise("b"))
      // key a: x in [0,40); key b: x in [1000,1040) — far apart
      .withColumn("x", col("id") + when(col("k") === "a", 0).otherwise(1000))
      .withColumn("geometry",
        geo.st_geomfromtext(concat(lit("POINT ("), col("x"), lit(" 1)"))))
      .coalesce(1)
      .write.partitionBy("k").mode("overwrite").parquet(out)
    val parts = Footer.partFiles(out, new Configuration())
    assert(parts.map(_.getName).distinct.length < parts.length,
      "fixture must reuse basenames across key dirs")
    graft.meta.Footer.writeGeoMetadata(out,
      GeoMeta(version = "1.1.0", primaryColumn = "geometry",
        columns = Map("geometry" -> GeoColumnMeta())), None)
    val f = Checks.validate(spark, out).filter(_.check == "bbox")
    assert(f.isEmpty, s"false per-file bbox findings: $f")
  }

  test("corrupt geo JSON is an error") {
    val out = write("badjson", polyTable(ccw = true))
    poke(out, "{not valid json")
    assert(errs(out).exists(_.check == "metadata"))
  }

  test("unknown version warns") {
    val out = write("badver", polyTable(ccw = true))
    val m = GeoMeta(version = "9.9.0", primaryColumn = "geometry",
      columns = Map("geometry" -> GeoColumnMeta()))
    poke(out, GeoMeta.toJson(m))
    assert(Checks.validate(spark, out)
      .exists(f => f.level == "warn" && f.message.contains("9.9.0")))
  }

  test("primary column missing from schema and columns map") {
    val out = write("badprimary", polyTable(ccw = true))
    val m = GeoMeta(primaryColumn = "nope",
      columns = Map("geometry" -> GeoColumnMeta()))
    poke(out, GeoMeta.toJson(m))
    val f = errs(out)
    assert(f.exists(_.message.contains("not in columns map")))
    assert(f.exists(_.message.contains("not in schema")))
  }

  test("invalid encoding, geometry_types, orientation, edges") {
    val out = write("badvocab", polyTable(ccw = true))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      encoding = "HEXWKB",
      geometryTypes = Seq("Polygon", "Blob"),
      orientation = Some("clockwise"),
      edges = Some("curved"))))
    poke(out, GeoMeta.toJson(m))
    val f = errs(out)
    assert(f.exists(_.message.contains("HEXWKB")))
    assert(f.exists(_.message.contains("'Blob'")))
    assert(f.exists(_.check == "orientation"))
    assert(f.exists(_.check == "edges"))
  }

  test("declared counterclockwise but clockwise data") {
    val out = write("cwdata", polyTable(ccw = false))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      geometryTypes = Seq("Polygon"),
      orientation = Some("counterclockwise"))))
    poke(out, GeoMeta.toJson(m))
    assert(errs(out).exists(f =>
      f.check == "orientation" && f.message.contains("clockwise exterior")))
    // and the ccw twin passes the same check
    val ok = write("ccwdata", polyTable(ccw = true))
    poke(ok, GeoMeta.toJson(m))
    assert(!errs(ok).exists(_.check == "orientation"))
  }

  test("inverted and out-of-CRS declared bbox") {
    val out = write("badbbox", polyTable(ccw = true))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      bbox = Some((10.0, 10.0, -10.0, -10.0)))))
    poke(out, GeoMeta.toJson(m))
    assert(errs(out).exists(_.message.contains("inverted")))
    val m2 = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      bbox = Some((-200.0, -90.0, 180.0, 90.0)))))
    poke(out, GeoMeta.toJson(m2))
    assert(errs(out).exists(_.message.contains("outside CRS bounds")))
  }

  test("data outside geographic CRS bounds") {
    val df = spark.range(1, 10).toDF("id")
      .withColumn("geometry", geo.st_point(col("id") * 40, lit(10.0)))
    val out = write("outofrange", GeoTable.fromDataFrame(df, "geometry"))
    assert(errs(out).exists(_.check == "crs_range"))
  }

  test("covering referencing a missing or non-struct column") {
    val out = write("badcovering", polyTable(ccw = true))
    val missing = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      coveringBbox = Some("no_such_bbox"))))
    poke(out, GeoMeta.toJson(missing))
    assert(errs(out).exists(f =>
      f.check == "covering" && f.message.contains("not at schema root")))
    val nonStruct = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      coveringBbox = Some("id"))))
    poke(out, GeoMeta.toJson(nonStruct))
    assert(errs(out).exists(f =>
      f.check == "covering" && f.message.contains("must be a struct")))
  }

  test("declared geometry types must cover the data") {
    val out = write("badtypes", polyTable(ccw = true))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      geometryTypes = Seq("Point"))))
    poke(out, GeoMeta.toJson(m))
    assert(errs(out).exists(_.check == "geometry_types"))
  }

  test("bbox covering struct with correct field types passes") {
    val t = polyTable(ccw = true).addBbox()
    val out = write("withbbox", t)
    val f = errs(out)
    assert(f.isEmpty, s"unexpected errors: $f")
    // Spark writes row-group stats for the bbox fields, so the
    // stats-presence check must NOT warn here
    assert(!Checks.validate(spark, out).exists(f =>
      f.level == "warn" && f.message.contains("row-group")))
  }

  test("covering path grammar violations are errors") {
    val out = write("badgrammar", polyTable(ccw = true).addBbox())
    def meta(covering: String): String =
      s"""{"version":"1.1.0","primary_column":"geometry","columns":
         |{"geometry":{"encoding":"WKB","geometry_types":[],
         |"covering":$covering}}}""".stripMargin.replaceAll("\n", "")
    poke(out, meta("\"not an object\""))
    assert(errs(out).exists(f =>
      f.check == "covering" && f.message.contains("must be an object")))
    poke(out, meta("""{"bbox":{"xmin":["bbox","xmin"]}}"""))
    assert(errs(out).exists(f =>
      f.check == "covering" && f.message.contains("missing required paths")))
    poke(out, meta("""{"bbox":{"xmin":["bbox"],"ymin":["bbox","ymin"],
      "xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}""".replaceAll("\n", "")))
    assert(errs(out).exists(f =>
      f.check == "covering" && f.message.contains("path array")))
  }

  test("implausible declared bbox magnitude is an error") {
    val out = write("hugebbox", polyTable(ccw = true))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      bbox = Some((-1e300, -90.0, 1e300, 90.0)))))
    poke(out, GeoMeta.toJson(m))
    assert(errs(out).exists(_.message.contains("implausible magnitude")))
  }

  test("bbox covering without row-group statistics warns") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.column.statistics.enabled", "false")
    val out =
      try write("nostats", polyTable(ccw = true).addBbox())
      finally hc.unset("parquet.column.statistics.enabled")
    val stats = Footer.read(Footer.partFiles(out).head)
      .rowGroups.head.columns("bbox.xmin")
    assume(stats.min.isEmpty, "parquet writer ignored statistics toggle")
    assert(Checks.validate(spark, out).exists(f =>
      f.level == "warn" && f.message.contains("row-group min/max")))
  }

  test("native-geo-type fixtures read via the footer-strip stage") {
    import graft.functions.geo
    val data = "/root/reference/tests/data"
    // Spark rejects GEOMETRY logical types outright; the staged
    // byte-copy read recovers the plain-WKB surface
    val pgo = GeoTable.readNativeGeo(spark, s"$data/fields_pgo_5070_snappy.parquet")
    assert(pgo.df.count() == 100)
    val gpq2 = GeoTable.readNativeGeo(spark, s"$data/fields_gpq2_crs84_zstd.parquet")
    assert(gpq2.df.count() == 100 && gpq2.geometryColumn.contains("geometry"))
    // the 5070 sample holds PROJ-projected Hungarian fields; our Albers
    // inverse must recover coordinates in that region (the CRS84 twin
    // sample sits at ~18.3E 47.05N)
    val back = pgo.reproject("EPSG:5070", "EPSG:4326")
    val s = back.df.select(
      min(geo.st_x(geo.st_centroid(col("geometry")))),
      max(geo.st_x(geo.st_centroid(col("geometry")))),
      min(geo.st_y(geo.st_centroid(col("geometry")))),
      max(geo.st_y(geo.st_centroid(col("geometry"))))).head()
    assert(s.getDouble(0) > 17.5 && s.getDouble(1) < 18.5,
      s"lon range ${s.getDouble(0)}..${s.getDouble(1)}")
    assert(s.getDouble(2) > 46.5 && s.getDouble(3) < 47.5,
      s"lat range ${s.getDouble(2)}..${s.getDouble(3)}")
  }

  test("reference fixtures classify and validate as their real flavor") {
    val data = "/root/reference/tests/data"
    def ft(f: String) = Footer.detectFileType(
      new org.apache.hadoop.fs.Path(s"$data/$f.parquet"))
    assert(ft("fields_gpq2_crs84_zstd") == "geoparquet2")
    assert(ft("fields_pgo_crs84_zstd") == "parquet-geo-only")
    assert(ft("buildings_test") == "geoparquet")
    // GeoParquet-2-minimal (native logical type, no geo key) is NOT an
    // error — the info finding names the flavor
    val pgo = Checks.validate(spark, s"$data/fields_pgo_crs84_zstd.parquet")
    assert(!pgo.exists(_.level == "error"), pgo.toString)
    assert(pgo.exists(f => f.level == "info" && f.message.contains("GeoParquet 2")))
    // a real GDAL-written 1.x file passes the metadata/covering checks
    // (geometry scan checks are skipped only if encoding isn't WKB)
    val gp = Checks.validate(spark, s"$data/buildings_test.parquet")
    assert(!gp.exists(_.level == "error"), gp.toString)
  }

  test("v2 CRS / edges / native-stats checks against reference fixtures") {
    val data = "/root/reference/tests/data"
    // gpq2 with a non-default CRS: inline PROJJSON in the Parquet geo
    // type AND the same EPSG:5070 in geo metadata -> all V2 checks pass
    val f5070 = Checks.validate(spark, s"$data/fields_gpq2_5070_brotli.parquet")
    assert(!f5070.exists(f => f.level == "error" && f.check == "v2"),
      f5070.toString)
    // native geospatial statistics present on every fixture -> no
    // missing-stats warning
    assert(!f5070.exists(_.check == "native_geo_stats"), f5070.toString)
    // default-CRS gpq2 twin: nothing to reconcile, still clean
    val fc84 = Checks.validate(spark, s"$data/fields_gpq2_crs84_zstd.parquet")
    assert(!fc84.exists(f => f.level == "error" && f.check == "v2"),
      fc84.toString)
    // reference-format CRS (projjson:key / srid:NNNN) -> compat warning
    Seq("crs-projjson", "crs-srid").foreach { f =>
      val r = Checks.validate(spark, s"$data/$f.parquet")
      assert(r.exists(x => x.level == "warn" && x.check == "crs" &&
        x.message.contains("reference format")), s"$f: $r")
    }
    // footer plumbing the checks ride on: inline/reference CRS resolve
    // to the same EPSG id, and geo_bbox stats surface typed bounds
    val inline = Footer.read(new org.apache.hadoop.fs.Path(
      s"$data/fields_pgo_5070_snappy.parquet"))
    val viaKey = Footer.read(new org.apache.hadoop.fs.Path(
      s"$data/crs-projjson.parquet"))
    val viaSrid = Footer.read(new org.apache.hadoop.fs.Path(
      s"$data/crs-srid.parquet"))
    def crsOf(i: Footer.FooterInfo) =
      i.schemaInfo.find(_.name == "geometry").flatMap(_.geoCrs).get
    assert(graft.geom.Proj.parseEpsg(crsOf(inline)) == 5070)
    assert(crsOf(viaKey) == "projjson:projjson_epsg_5070" &&
      graft.geom.Proj.parseEpsg(
        viaKey.keyValueMeta("projjson_epsg_5070")) == 5070)
    assert(crsOf(viaSrid) == "srid:5070")
    val bb = inline.rowGroups.head.columns("geometry").geoBbox
    assert(bb.exists { case (x0, y0, x1, y1) =>
      x0 > 6.7e6 && y0 > 7.3e6 && x1 < 6.8e6 && y1 < 7.31e6 })
  }

  test("native geo stats vs data: bbox containment and type coverage " +
      "(validate.py:1506-1700)") {
    val data = "/root/reference/tests/data"
    // real fixtures: data sits inside the declared native stats and the
    // declared type set covers the data — neither check fires, for both
    // the with-metadata (gpq2) and no-metadata (pgo) validate paths
    Seq("fields_gpq2_5070_brotli", "fields_pgo_crs84_zstd").foreach { f =>
      val r = Checks.validate(spark, s"$data/$f.parquet")
      assert(!r.exists(x => x.check == "native_geo_stats" &&
        x.level == "error"), s"$f: $r")
      assert(!r.exists(_.check == "native_geo_types"), s"$f: $r")
    }
    // the fixture footers actually declare WKB type codes (all polygon
    // families) — so the coverage check above ran against real stats,
    // not vacuously
    val fi = Footer.read(new org.apache.hadoop.fs.Path(
      s"$data/fields_gpq2_5070_brotli.parquet"))
    val types = fi.rowGroups.flatMap(_.columns.get("geometry"))
      .flatMap(_.geoTypes).flatten.toSet
    assert(types.nonEmpty && types.forall(_ % 1000 == 3), types.toString)
    // synthetic disagreement (no v2 writer exists in this container to
    // author a corrupt fixture): a stats bbox that excludes the data
    // extent and a declared type set missing Polygon must both fire
    import graft.meta.Footer.ColumnStats
    def cs(bbox: Option[(Double, Double, Double, Double)],
        t: Option[Set[Int]]) =
      ColumnStats("SNAPPY", 0L, 0L, None, None, None, bbox, t)
    val bad = Checks.nativeStatsVsData(
      Seq(cs(Some((0.0, 0.0, 1.0, 1.0)), Some(Set(1)))),
      Seq("Polygon"), Some((2.0, 2.0, 3.0, 3.0)))
    assert(bad.exists(f => f.check == "native_geo_stats" &&
      f.level == "error"), bad.toString)
    assert(bad.exists(f => f.check == "native_geo_types" &&
      f.message.contains("polygon")), bad.toString)
    // agreeing stats (Z-flavored code 1003 still names polygon) — clean
    val good = Checks.nativeStatsVsData(
      Seq(cs(Some((0.0, 0.0, 10.0, 10.0)), Some(Set(3, 1003)))),
      Seq("Polygon"), Some((2.0, 2.0, 3.0, 3.0)))
    assert(good.isEmpty, good.toString)
  }

  test("setGeoParquetVersion: 1.1 -> 2.0 -> 1.1 -> parquet-geo-only " +
      "round-trip, footer-only, rows byte-identical") {
    import org.apache.hadoop.fs.Path
    val out = write("vconv", polyTable(ccw = true))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), geo.st_astext(col("geometry")))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val before = rows(GeoTable.read(spark, out).df)
    def part = Footer.partFiles(out, new Configuration()).head

    // upgrade: native GEOMETRY logical type + version 2.0.0; Spark's
    // own reader now rejects the file, the staged readNativeGeo path
    // recovers identical rows, and the v2 validate family passes
    GeoTable.setGeoParquetVersion(out, "2.0")
    assert(Footer.detectFileType(part) == "geoparquet2")
    assert(Footer.read(part).geo.exists(_.version == "2.0.0"))
    assert(rows(GeoTable.readNativeGeo(spark, out).df) == before)
    val v2errs = Checks.validate(spark, out).filter(_.level == "error")
    assert(v2errs.isEmpty, s"unexpected: $v2errs")

    // downgrade: annotation stripped, plain Spark read works again
    GeoTable.setGeoParquetVersion(out, "1.1")
    assert(Footer.detectFileType(part) == "geoparquet")
    assert(Footer.read(part).geo.exists(_.version == "1.1.0"))
    assert(rows(GeoTable.read(spark, out).df) == before)

    // minimal flavor: native type, `geo` key dropped — still validates
    // (classified as GeoParquet-2-minimal, not an error)
    GeoTable.setGeoParquetVersion(out, "parquet-geo-only")
    assert(Footer.detectFileType(part) == "parquet-geo-only")
    assert(rows(GeoTable.readNativeGeo(spark, out).df) == before)
    val pgoErrs = Checks.validate(spark, out).filter(_.level == "error")
    assert(pgoErrs.isEmpty, s"unexpected: $pgoErrs")
  }

  test("v2 datasets: the per-file declared-bbox-vs-data check really " +
      "fires (staged readNativeGeo paths map back to the originals)") {
    val out = write("v2bbox", polyTable(ccw = true))
    GeoTable.setGeoParquetVersion(out, "2.0")
    // a clean v2 file passes
    assert(Checks.validate(spark, out).count(_.level == "error") == 0)
    // corrupt the declared bbox to exclude the data: the check must
    // fire — before the staged-name mapping every lookup missed and v2
    // files passed this check unconditionally
    val part = Footer.partFiles(out, new Configuration()).head
    val gm = Footer.read(part).geo.get
    poke(out, GeoMeta.toJson(gm.copy(columns = gm.columns.map {
      case (n, c) if n == gm.primaryColumn =>
        n -> c.copy(bbox = Some((200.0, 200.0, 201.0, 201.0)))
      case kv => kv
    })))
    val f = Checks.validate(spark, out)
    assert(f.exists(x => x.level == "error" && x.check == "bbox" &&
      x.message.contains("outside declared")), f.toString)
  }

  test("setGeoParquetVersion 2.0 inlines a non-default CRS into the " +
      "Parquet geo type (validate check V2-2/V2-3 pass)") {
    import org.apache.hadoop.fs.Path
    val out = write("vconv3857", polyTable(ccw = true)
      .reproject("EPSG:4326", "EPSG:3857"))
    GeoTable.setGeoParquetVersion(out, "2.0")
    val part = Footer.partFiles(out, new Configuration()).head
    val info = Footer.read(part)
    val f = info.schemaInfo.find(_.name == "geometry").get
    assert(f.geoCrs.exists(_.contains("3857")), s"schema crs: ${f.geoCrs}")
    val v2errs = Checks.validate(spark, out)
      .filter(x => x.level == "error" && x.check == "v2")
    assert(v2errs.isEmpty, s"unexpected: $v2errs")
  }

  test("raw geo JSON shape: missing primary_column/columns/geometry_types " +
      "and non-numeric epoch are errors (reference checks 4/5/8/13)") {
    val out = write("rawshape", polyTable(ccw = true))
    // primary_column not a string + columns not an object
    poke(out, """{"version":"1.1.0","primary_column":7,"columns":[1]}""")
    val f1 = errs(out)
    assert(f1.exists(_.message.contains("`primary_column`")), f1.toString)
    assert(f1.exists(_.message.contains("`columns`")), f1.toString)
    // geometry_types key absent entirely (typed parser defaults to empty,
    // so only the raw check can catch it)
    poke(out, """{"version":"1.1.0","primary_column":"geometry",""" +
      """"columns":{"geometry":{"encoding":"WKB"}}}""")
    assert(errs(out).exists(x => x.check == "geometry_types" &&
      x.message.contains("missing")))
    // geometry_types wrong JSON type
    poke(out, """{"version":"1.1.0","primary_column":"geometry",""" +
      """"columns":{"geometry":{"encoding":"WKB","geometry_types":"Polygon"}}}""")
    assert(errs(out).exists(x => x.check == "geometry_types" &&
      x.message.contains("array")))
    // epoch must be numeric
    poke(out, """{"version":"1.1.0","primary_column":"geometry",""" +
      """"columns":{"geometry":{"encoding":"WKB","geometry_types":[],""" +
      """"epoch":"2020.0"}}}""")
    assert(errs(out).exists(_.message.contains("`epoch`")))
    // and a well-formed document adds none of these
    poke(out, """{"version":"1.1.0","primary_column":"geometry",""" +
      """"columns":{"geometry":{"encoding":"WKB","geometry_types":[],""" +
      """"epoch":2020.0}}}""")
    assert(!errs(out).exists(x =>
      x.message.contains("`epoch`") || x.check == "geometry_types"))
  }

  test("file extension check warns on .geoparquet and unusual suffixes " +
      "(reference check 1.1-8)") {
    assert(Checks.extensionFindings("/data/a.parquet").isEmpty)
    // a dot-less FILE (the caller's isFile gate exempts directories
    // before this check) warns like any other non-.parquet suffix —
    // reference parity: _check_file_extension warns on an empty suffix
    assert(Checks.extensionFindings("/data/noext")
      .exists(f => f.level == "warn" && f.message.contains("unusual")))
    assert(Checks.extensionFindings("/data/a.geoparquet")
      .exists(f => f.level == "warn" && f.message.contains(".geoparquet")))
    assert(Checks.extensionFindings("/data/a.pq")
      .exists(f => f.level == "warn" && f.message.contains("unusual")))
    // end-to-end: the warning must surface through validate() for a FILE;
    // a dataset DIRECTORY with a dot in its name must stay exempt
    val dir = write("ext.v1", polyTable(ccw = true))
    assert(!Checks.validate(spark, dir).exists(_.check == "extension"),
      "directory names are not extensions")
    val part = Footer.partFiles(dir, new Configuration()).head
    val file = tmp.resolve("single.geoparquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(part.toUri.getPath), file,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(Checks.validate(spark, file.toString).exists(_.check == "extension"))
  }

  test("geographic-looking coordinates under a projected CRS are an " +
      "error (reference _detect_geographic_in_projected)") {
    // polyTable coordinates are degrees; declare web-mercator on top
    val out = write("geoinproj", polyTable(ccw = true))
    val m = GeoMeta(columns = Map("geometry" -> GeoColumnMeta(
      geometryTypes = Seq("Polygon"),
      crs = Some(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree("""{"type":"ProjectedCRS","id":{"authority":"EPSG","code":3857}}""")))))
    poke(out, GeoMeta.toJson(m))
    assert(errs(out).exists(x => x.check == "crs_range" &&
      x.message.contains("look geographic")), errs(out).toString)
    // converse soundness: real projected magnitudes do NOT trip it
    val big = write("projok", polyTable(ccw = true)
      .reproject("EPSG:4326", "EPSG:3857"))
    assert(!Checks.validate(spark, big)
      .exists(_.message.contains("look geographic")))
  }

  test("v2 asymmetric CRS: schema type pins 5070 while geo metadata " +
      "defaults to CRS84 -> error (reference _crs_equals one-sided case)") {
    val data = "/root/reference/tests/data"
    val src = java.nio.file.Paths.get(s"$data/fields_gpq2_5070_brotli.parquet")
    val dst = tmp.resolve("gpq2_nocrs.parquet")
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // strip the crs from the geo metadata but leave the native type's
    // inline PROJJSON untouched
    val m = GeoMeta(version = "2.0.0", primaryColumn = "geometry",
      columns = Map("geometry" -> GeoColumnMeta(geometryTypes = Seq())))
    poke(dst.toString, GeoMeta.toJson(m))
    val f = Checks.validate(spark, dst.toString)
    assert(f.exists(x => x.level == "error" && x.check == "v2" &&
      x.message.contains("but geo metadata has none")), f.toString)
    // the untouched fixture stays clean on that check
    assert(!Checks.validate(spark, s"$data/fields_gpq2_5070_brotli.parquet")
      .exists(_.message.contains("but geo metadata has none")))
  }

  /** Parity checklist vs the reference's validate matrix
    * (`core/validate.py:126-2328`): every reference check mapped to the
    * Finding category (or suite) that covers it here. The test fails if
    * any row is left unimplemented — adding a reference check means
    * adding a row AND its coverage.
    */
  test("reference validate-matrix parity checklist has no unimplemented rows") {
    val checklist: Seq[(String, String)] = Seq(
      // reference check (validate.py line)      -> covering category/suite
      "geo_key_exists (:126)" -> "metadata",
      "metadata_is_json (:139)" -> "metadata",
      "version_present (:152)" -> "metadata",
      "primary_column_present (:166)" -> "metadata (rawShapeFindings)",
      "columns_present (:180)" -> "metadata (rawShapeFindings)",
      "primary_column_in_columns (:194)" -> "metadata",
      "encoding_valid (:223)" -> "metadata",
      "geometry_types_list (:237)" -> "geometry_types (rawShapeFindings)",
      "crs_valid (:268)" -> "crs",
      "orientation_valid (:299)" -> "orientation",
      "edges_valid (:322)" -> "edges",
      "bbox_valid (:345)" -> "bbox",
      "epoch_valid (:390)" -> "metadata (rawShapeFindings)",
      "geometry_not_grouped (:418)" -> "schema",
      "geometry_byte_array (:447)" -> "schema",
      "geometry_not_repeated (:475)" -> "schema",
      "encoding_matches_data (:507)" -> "encoding",
      "geometry_types_match_data (:584)" -> "geometry_types",
      // the reference stubs ring-order validation (:699 'not
      // implemented'); ours actually checks exterior winding
      "orientation_matches_data (:682)" -> "orientation (exceeds reference)",
      "bbox_contains_data (:778)" -> "bbox (per-file rollup)",
      "covering_is_object (:819)" -> "covering",
      "covering_bbox_paths (:842)" -> "covering",
      "covering_bbox_column_exists (:885)" -> "covering",
      "covering_bbox_structure (:930)" -> "covering",
      "covering_bbox_field_types (:994)" -> "covering",
      "file_extension (:1059)" -> "extension",
      "native_geo_type_present (:1092)" -> "v2 / metadata(info)",
      "native_crs_format (:1122)" -> "crs (nativeGeoFindings)",
      // the algorithm enum cannot be physically invalid in a
      // parquet-java-written file; the guard still exists for hostile
      // footers
      "geography_edges_valid (:1183)" -> "edges (nativeGeoFindings)",
      "geography_coordinate_bounds (:1256)" -> "crs_range",
      "row_group_bbox_statistics (:1342)" -> "covering (stats warn)",
      "native_geo_statistics (:1430)" -> "native_geo_stats",
      "native_geo_stats_contains_data (:1506)" -> "native_geo_stats",
      "native_geo_types_match (:1617)" -> "native_geo_types",
      "v2_uses_native_types (:1706)" -> "v2",
      "v2_crs_in_parquet_type (:1736)" -> "v2",
      "v2_crs_consistency (:1784)" -> "v2 (incl. one-sided case)",
      "v2_edges_consistency (:1828)" -> "v2",
      "parquet_geo_only_crs (:1880)" -> "crs (nativeGeoFindings)",
      "coordinates_valid_for_crs (:2206)" -> "crs_range",
      "version_matches (:2488)" -> "metadata (version warn)")
    val unimplemented = checklist.filter(_._2.isEmpty)
    assert(unimplemented.isEmpty,
      s"unimplemented reference checks: ${unimplemented.map(_._1)}")
    assert(checklist.size >= 41, "checklist shrank — keep parity with the reference")
    // load-bearing half: every mapped category must actually be a Finding
    // category the implementation emits — deleting a check family from
    // Checks.scala fails this test, not just the prose
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/checks/Checks.scala")))
    val emitted = """Finding\("(?:error|warn|info)",\s*"([a-z0-9_]+)"""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
    val mappedCategories = checklist.map(_._2.split("[ (]").head).distinct
    val missing = mappedCategories.filterNot(emitted.contains)
    assert(missing.isEmpty,
      s"checklist maps to categories the implementation never emits: $missing " +
        s"(emitted: ${emitted.toSeq.sorted.mkString(",")})")
  }
}
