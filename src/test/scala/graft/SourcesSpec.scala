package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{ArcGis, BigQuery, PmTiles, Shapefile, Stac}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("arcgis source pages until exhausted with pushdown params") {
    // fake service: 2 full pages of 3 + final page of 1 (7 features)
    def page(ids: Seq[Int], exceeded: Boolean): String = {
      val features = ids.map { i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},
           "properties":{"oid":$i}}"""
      }.mkString(",")
      s"""{"type":"FeatureCollection","exceededTransferLimit":$exceeded,
         "features":[$features]}"""
    }
    val requested = scala.collection.mutable.ArrayBuffer[String]()
    val fetch: ArcGis.Fetcher = { url =>
      requested += url
      val offset = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      offset match {
        case 0 => page(Seq(1, 2, 3), exceeded = true)
        case 3 => page(Seq(4, 5, 6), exceeded = true)
        case 6 => page(Seq(7), exceeded = false)
        case _ => page(Seq.empty, exceeded = false)
      }
    }
    val q = ArcGis.Query(where = "pop > 10", outFields = Seq("oid"),
      bbox = Some((-10.0, -10.0, 10.0, 10.0)), pageSize = 3)
    val t = ArcGis.read(spark, "http://example.test/FeatureServer/0", q, fetch)
    assert(t.count() == 7)
    // pushdown params present in every request
    assert(requested.forall(u => u.contains("where=pop+%3E+10") ||
      u.contains("where=pop%20%3E%2010")))
    assert(requested.forall(_.contains("geometryType=esriGeometryEnvelope")))
    assert(requested.head.contains("resultRecordCount=3"))
    // pagination stopped after the short page
    assert(requested.size == 3)
  }

  test("arcgis pagination advances by features RETURNED, not requested " +
      "(server clamps resultRecordCount to its own maxRecordCount)") {
    def page(ids: Seq[Int], exceeded: Boolean): String = {
      val fs = ids.map(i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},"properties":{"oid":$i}}""")
        .mkString(",")
      s"""{"type":"FeatureCollection","exceededTransferLimit":$exceeded,"features":[$fs]}"""
    }
    // the service clamps every page to 2 features although pageSize=5;
    // a pageSize-stride (0 -> 5 -> 10) would skip oids 3,4 and 8,9
    val all = (1 to 9).toSeq
    val fetch: ArcGis.Fetcher = { url =>
      val off = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      val slice = all.drop(off).take(2)
      page(slice, exceeded = off + slice.size < all.size)
    }
    val t = ArcGis.read(spark, "http://example.test/FeatureServer/0",
      ArcGis.Query(pageSize = 5), fetch)
    assert(t.df.select("oid").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 9L), "every feature must be fetched exactly once")
  }

  test("arcgis maxFeatures trims the overshooting last page and the " +
      "error envelope surfaces as an exception") {
    def page(ids: Seq[Int]): String = {
      val fs = ids.map(i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},"properties":{"oid":$i}}""")
        .mkString(",")
      s"""{"type":"FeatureCollection","exceededTransferLimit":true,"features":[$fs]}"""
    }
    val fetch: ArcGis.Fetcher = { url =>
      val off = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      page((off + 1 to off + 3).toSeq)
    }
    val t = ArcGis.read(spark, "http://example.test/FeatureServer/0",
      ArcGis.Query(pageSize = 3, maxFeatures = Some(4)), fetch)
    assert(t.count() == 4, "pagination overshoots by a page; read must trim")

    val errFetch: ArcGis.Fetcher = { _ =>
      """{"error":{"code":400,"message":"Invalid where clause"}}"""
    }
    val ex = intercept[java.io.IOException] {
      ArcGis.fetchAllPages("http://example.test/FeatureServer/0",
        ArcGis.Query(), errFetch)
    }
    assert(ex.getMessage.contains("Invalid where clause"))
  }

  test("arcgis offset-blind fetcher (file: snapshot of exactly pageSize " +
      "features) terminates after one page instead of looping") {
    // a file: replay ignores resultOffset entirely — every offset gets
    // the same body. With exactly pageSize features and no repeat guard,
    // features == pageSize kept continue=true forever.
    val body =
      s"""{"type":"FeatureCollection","features":[
         {"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},"properties":{"oid":1}},
         {"type":"Feature","geometry":{"type":"Point","coordinates":[2,2]},"properties":{"oid":2}},
         {"type":"Feature","geometry":{"type":"Point","coordinates":[3,3]},"properties":{"oid":3}}]}"""
    var calls = 0
    val fetch: ArcGis.Fetcher = { _ => calls += 1; body }
    val pages = ArcGis.fetchAllPages("http://example.test/FeatureServer/0",
      ArcGis.Query(pageSize = 3), fetch)
    assert(pages == Seq(body), "the snapshot must be ingested exactly once")
    assert(calls == 2, s"one content fetch + one repeat probe, got $calls")
  }

  test("stac item from written geoparquet validates") {
    import graft.functions.geo
    val out = java.nio.file.Files.createTempDirectory("graft_stac").toString + "/d"
    val df = spark.range(50).toDF("id")
      .withColumn("geometry", geo.st_point(
        col("id").cast("double") % 90, col("id").cast("double") % 45))
    graft.table.GeoTable.fromDataFrame(df, "geometry").addBbox().write(out)
    val item = Stac.item(out, "item-1", "s3://bucket/d.parquet",
      "2024-01-01T00:00:00Z")
    assert(Stac.validateItem(item).isEmpty)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(item)
    assert(node.get("properties").get("table:row_count").asLong == 50)
    assert(node.get("bbox").size == 4)
    // collection wraps item bboxes
    val coll = Stac.collection("c1", "test", Seq((0.0, 0.0, 89.0, 44.0)))
    assert(coll.contains("\"Collection\""))
  }

  test("shapefile round trip: points with attributes") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp")
    val shp = dir.resolve("pts.shp").toString
    val geoms = (1 to 25).map(i => Point(i * 3.5 - 40, i * 1.5 - 20))
    val fields = Seq(
      Shapefile.DbfField("name", 'C', 16, 0),
      Shapefile.DbfField("pop", 'N', 18, 0),
      Shapefile.DbfField("score", 'N', 18, 6),
      Shapefile.DbfField("flag", 'L', 1, 0))
    val recs = (1 to 25).map(i => Seq(s"city$i",
      java.lang.Long.valueOf(i * 1000L),
      java.lang.Double.valueOf(i / 4.0),
      java.lang.Boolean.valueOf(i % 2 == 0)))
    Shapefile.write(shp, geoms, fields, recs)

    val t = graft.table.GeoTable.fromShapefile(spark, shp)
    assert(t.df.count() == 25)
    assert(t.df.columns.toSeq == Seq("name", "pop", "score", "flag", "geometry"))
    val r5 = t.df.filter(org.apache.spark.sql.functions.col("pop") === 5000L)
      .collect().head
    assert(r5.getString(0) == "city5")
    assert(math.abs(r5.getDouble(2) - 1.25) < 1e-9)
    assert(r5.getBoolean(3) == false)
    assert(Wkb.read(r5.getAs[Array[Byte]](4)) == Point(5 * 3.5 - 40, 5 * 1.5 - 20))
  }

  test("shapefile polygons match their GeoJSON twin") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp2")
    val shp = dir.resolve("polys.shp").toString
    // caller holds CCW shells (GeoJSON orientation); the writer re-winds
    // to shapefile convention on disk and the reader restores CCW
    def sq(cx: Double, cy: Double): Polygon = Polygon(Array(CoordSeq.of(
      (cx - 1, cy - 1), (cx + 1, cy - 1), (cx + 1, cy + 1), (cx - 1, cy + 1),
      (cx - 1, cy - 1))))
    val geoms = Seq(sq(0, 0), sq(10, 5), sq(-20, -10))
    Shapefile.write(shp, geoms)
    val t = graft.table.GeoTable.fromShapefile(spark, shp)
    val gj = s"""{"type":"FeatureCollection","features":[
      ${geoms.map(g => s"""{"type":"Feature","geometry":${GeoJson.print(g, -1)},"properties":{}}""").mkString(",")}
    ]}"""
    val twin = graft.table.GeoTable.fromGeoJsonString(spark, gj)
    val a: Array[String] = t.df.select(graft.functions.geo.st_astext(
      org.apache.spark.sql.functions.col("geometry"))).collect().map(_.getString(0)).sorted
    val b: Array[String] = twin.df.select(graft.functions.geo.st_astext(
      org.apache.spark.sql.functions.col("geometry"))).collect().map(_.getString(0)).sorted
    assert(a.toSeq == b.toSeq, s"${a.toSeq} vs ${b.toSeq}")
  }

  test("shapefile parser reads the reference's GDAL-written fixture") {
    // real-world file written by GDAL (reference tests/data), with a
    // GeoJSON twin for ground truth
    val t = graft.table.GeoTable.fromShapefile(spark,
      "/root/reference/tests/data/buildings_test.shp")
    val twin = graft.table.GeoTable.fromGeoJsonFile(spark,
      "/root/reference/tests/data/buildings_test.geojson")
    assert(t.df.count() == twin.df.count())
    assert(t.df.columns.contains("id"))
    val a: Array[String] = t.df.select(graft.functions.geo.st_astext(col("geometry")))
      .collect().map(_.getString(0)).sorted
    val b: Array[String] = twin.df.select(graft.functions.geo.st_astext(col("geometry")))
      .collect().map(_.getString(0)).sorted
    assert(a.toSeq == b.toSeq)
    // attribute values survive (ids are uuids in the dbf)
    val ids = t.df.select("id").collect().map(_.getString(0))
    assert(ids.forall(_.matches("[0-9a-f-]{36}")))
    // and the reference's OWN GeoParquet conversion of the same data
    // agrees envelope-for-envelope per id (winding-insensitive)
    val ours = t.df.select(col("id"),
        graft.functions.geo.st_xmin(col("geometry")),
        graft.functions.geo.st_ymin(col("geometry")),
        graft.functions.geo.st_xmax(col("geometry")),
        graft.functions.geo.st_ymax(col("geometry")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = graft.table.GeoTable.read(spark,
      "/root/reference/tests/data/buildings_test.parquet")
    val theirs = ref.df.select(col("id"),
        graft.functions.geo.st_xmin(col("geometry")),
        graft.functions.geo.st_ymin(col("geometry")),
        graft.functions.geo.st_xmax(col("geometry")),
        graft.functions.geo.st_ymax(col("geometry")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(ours == theirs)
  }

  test("geopackage parser reads the reference's GDAL-written fixture") {
    val t = graft.table.GeoTable.fromGeoPackage(spark,
      "/root/reference/tests/data/buildings_test.gpkg")
    val twin = graft.table.GeoTable.fromGeoJsonFile(spark,
      "/root/reference/tests/data/buildings_test.geojson")
    assert(t.df.count() == twin.df.count())
    // envelope-per-id agreement with the GeoJSON twin
    def envs(df: org.apache.spark.sql.DataFrame, idExpr: org.apache.spark.sql.Column) =
      df.select(idExpr.as("k"),
          graft.functions.geo.st_xmin(col("geometry")),
          graft.functions.geo.st_ymin(col("geometry")),
          graft.functions.geo.st_xmax(col("geometry")),
          graft.functions.geo.st_ymax(col("geometry")))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ours = envs(t.df, col("id"))
    val theirs = envs(twin.df,
      get_json_object(col("properties_json"), "$.id"))
    assert(ours == theirs)
    // the projected variant reads too and carries its srs
    val proj = graft.sources.GeoPackage.featureTables(
      "/root/reference/tests/data/buildings_test_6933.gpkg")
    assert(proj.nonEmpty && proj.head.srsId == 6933)
    val tp = graft.table.GeoTable.fromGeoPackage(spark,
      "/root/reference/tests/data/buildings_test_6933.gpkg")
    assert(tp.df.count() == twin.df.count())
    // projected coordinates are meters, far outside lon/lat range
    val mx = tp.df.select(max(graft.functions.geo.st_x(col("geometry"))))
      .head().getDouble(0)
    assert(math.abs(mx) > 180.0)
  }

  test("dbf numeric overflow fails loudly instead of dropping digits") {
    import graft.table.GeoTable
    val dir = java.nio.file.Files.createTempDirectory("graft_dbfo").toString
    // 19 significant digits exceed the N(18,0) attribute field: the old
    // right-aligned take() stored a DIFFERENT number silently
    val df = spark.range(1, 3).toDF("id")
      .withColumn("big", lit(1234567890123456789L))
      .withColumn("geometry", graft.functions.geo.st_point(col("id"), col("id")))
    val ex = intercept[Exception] {
      GeoTable.fromDataFrame(df, "geometry").writeShapefile(s"$dir/o.shp")
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(ex).getMessage.contains("exceeds width"),
      s"got: ${rootCause(ex).getMessage}")
  }

  test("geopackage NULL geometry rows round-trip (spec-legal stored value)") {
    import graft.table.GeoTable
    val dir = java.nio.file.Files.createTempDirectory("graft_gpkgn").toString
    val df = spark.range(1, 6).toDF("id")
      .withColumn("geometry",
        when(col("id") === 3L, lit(null).cast("binary"))
          .otherwise(graft.functions.geo.st_point(col("id"), col("id"))))
    GeoTable(df, graft.meta.GeoMeta(primaryColumn = "geometry",
        columns = Map("geometry" -> graft.meta.GeoColumnMeta())),
      Some("geometry")).writeGeoPackage(s"$dir/n.gpkg", "pts")
    val back = GeoTable.fromGeoPackage(spark, s"$dir/n.gpkg").df
    assert(back.count() == 5)
    assert(back.filter(col("geometry").isNull).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(back.filter(col("geometry").isNotNull).count() == 4)
  }

  test("geopackage sink round-trips and matches the reference fixture") {
    import graft.table.GeoTable
    val dir = java.nio.file.Files.createTempDirectory("graft_gpkgw").toString
    // synthetic write -> read back through our own SQLite reader;
    // 900 rows with text payload forces multi-leaf b-trees + interior
    val df = spark.range(1, 901).toDF("id")
      .withColumn("name", concat(lit("row_"), col("id"),
        lit("_" + "x" * 40)))
      .withColumn("score", col("id") * 0.5)
      .withColumn("geometry", graft.functions.geo.st_point(
        col("id") % 90, col("id") % 45))
    GeoTable.fromDataFrame(df, "geometry").writeGeoPackage(s"$dir/out.gpkg", "pts")
    val back = GeoTable.fromGeoPackage(spark, s"$dir/out.gpkg")
    assert(back.df.count() == 900)
    val row = back.df.filter(col("id") === 7L)
      .select(col("name"), col("score"),
        graft.functions.geo.st_x(col("geometry")),
        graft.functions.geo.st_y(col("geometry"))).head()
    assert(row.getString(0) == "row_7_" + "x" * 40)
    assert(row.getDouble(1) == 3.5 && row.getDouble(2) == 7.0 &&
      row.getDouble(3) == 7.0)
    val tables = graft.sources.GeoPackage.featureTables(s"$dir/out.gpkg")
    assert(tables.map(_.name) == Seq("pts") && tables.head.srsId == 4326)

    // reference fixture -> our writer -> reader: envelope-for-envelope
    val ref = GeoTable.fromGeoPackage(spark,
      "/root/reference/tests/data/buildings_test.gpkg")
    ref.writeGeoPackage(s"$dir/ours.gpkg", "buildings")
    val rt = GeoTable.fromGeoPackage(spark, s"$dir/ours.gpkg")
    def envs(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id").as("k"),
          graft.functions.geo.st_xmin(col("geometry")),
          graft.functions.geo.st_ymin(col("geometry")),
          graft.functions.geo.st_xmax(col("geometry")),
          graft.functions.geo.st_ymax(col("geometry")))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(envs(rt.df) == envs(ref.df))
  }

  test("flatgeobuf round-trips all geometry families and matches the twin") {
    import graft.geom._
    import graft.sources.FlatGeobuf
    val dir = java.nio.file.Files.createTempDirectory("graft_fgb").toString
    // direct codec round-trip over every supported geometry family
    val geoms: Seq[Geom] = Seq(
      Point(1.5, 2.5),
      LineString(CoordSeq.of((0, 0), (1, 1), (2, 0.5))),
      Polygon(Array(CoordSeq.of((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)),
        CoordSeq.of((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)))),
      MultiPoint(Array(Point(1, 2), Point(3, 4))),
      MultiLineString(Array(LineString(CoordSeq.of((0, 0), (1, 1))),
        LineString(CoordSeq.of((5, 5), (6, 7), (8, 8))))),
      MultiPolygon(Array(
        Polygon(Array(CoordSeq.of((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)))),
        Polygon(Array(CoordSeq.of((5, 5), (7, 5), (7, 7), (5, 7), (5, 5)))))))
    val cols = Seq(("id", FlatGeobuf.CtLong), ("name", FlatGeobuf.CtString),
      ("score", FlatGeobuf.CtDouble), ("ok", FlatGeobuf.CtBool))
    val rows = geoms.indices.map(i =>
      Seq[Any](i.toLong, s"g$i", i * 0.5, i % 2 == 0))
    // indexNodeSize = 0: no index, file order preserved
    FlatGeobuf.write(s"$dir/mixed.fgb", cols, rows, geoms, indexNodeSize = 0)
    val back = FlatGeobuf.read(s"$dir/mixed.fgb")
    assert(back.columns == cols && back.rows == rows)
    assert(back.geoms.map(graft.geom.Wkb.write).map(_.toSeq) ==
      geoms.map(graft.geom.Wkb.write).map(_.toSeq))
    assert(back.crsCode.contains(4326))
    // default write: hilbert-ordered features + packed R-tree; the full
    // scan must still see every row (keyed by id)
    FlatGeobuf.write(s"$dir/mixed_idx.fgb", cols, rows, geoms)
    val bi = FlatGeobuf.read(s"$dir/mixed_idx.fgb")
    assert(bi.rows.map(_.head).toSet == rows.map(_.head).toSet)
    assert(bi.rows.sortBy(_.head.asInstanceOf[Long]) ==
      rows.sortBy(_.head.asInstanceOf[Long]))

    // reference GeoJSON twin -> fgb -> back: envelope-per-id agreement
    val twin = graft.table.GeoTable.fromGeoJsonFile(spark,
      "/root/reference/tests/data/buildings_test.geojson")
      .df.withColumn("id",
        get_json_object(col("properties_json"), "$.id"))
      .select(col("id"), col("geometry"))
    val t = graft.table.GeoTable.fromDataFrame(twin, "geometry")
    t.writeFlatGeobuf(s"$dir/buildings.fgb", "buildings")
    val rt = graft.table.GeoTable.fromFlatGeobuf(spark, s"$dir/buildings.fgb")
    def envs(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"),
          graft.functions.geo.st_xmin(col("geometry")),
          graft.functions.geo.st_ymin(col("geometry")),
          graft.functions.geo.st_xmax(col("geometry")),
          graft.functions.geo.st_ymax(col("geometry")))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(envs(rt.df) == envs(twin))

    // packed R-tree size formula (spec node layout: 40-byte nodes)
    assert(FlatGeobuf.indexSize(1, 16) == 80)
    assert(FlatGeobuf.indexSize(179, 16) == (179 + 12 + 1) * 40)
  }

  test("flatgeobuf packed r-tree drives spatial filtered reads") {
    import graft.geom._
    import graft.sources.FlatGeobuf
    val dir = java.nio.file.Files.createTempDirectory("graft_fgbidx").toString
    // 500 unit squares on a deterministic scatter; small nodeSize forces
    // a multi-level tree (500 items, node size 4 -> 5 levels)
    val geoms: Seq[Geom] = (0 until 500).map { i =>
      val cx = (i * 37 % 360 - 180).toDouble
      val cy = (i * 91 % 180 - 90).toDouble
      Polygon(Array(CoordSeq.of((cx - 0.5, cy - 0.5), (cx + 0.5, cy - 0.5),
        (cx + 0.5, cy + 0.5), (cx - 0.5, cy + 0.5), (cx - 0.5, cy - 0.5))))
    }
    val cols = Seq(("id", FlatGeobuf.CtLong))
    val rows = (0 until 500).map(i => Seq[Any](i.toLong))
    FlatGeobuf.write(s"$dir/grid.fgb", cols, rows, geoms, indexNodeSize = 4)
    val full = FlatGeobuf.read(s"$dir/grid.fgb")
    assert(full.rows.length == 500)
    var totalHits = 0
    for ((x0, y0, x1, y1) <- Seq((-30.0, -20.0, 30.0, 20.0),
        (100.0, 40.0, 170.0, 88.0), (-179.0, -89.0, -150.0, -60.0),
        (57.25, 13.25, 57.75, 13.75))) {
      val got = FlatGeobuf.readFiltered(s"$dir/grid.fgb", x0, y0, x1, y1)
        .rows.map(_.head.asInstanceOf[Long]).toSet
      val want = full.rows.indices.filter { i =>
        val e = full.geoms(i).envelope
        e._1 <= x1 && x0 <= e._3 && e._2 <= y1 && y0 <= e._4
      }.map(i => full.rows(i).head.asInstanceOf[Long]).toSet
      assert(got == want, s"bbox ($x0,$y0,$x1,$y1)")
      totalHits += got.size
    }
    assert(totalHits > 0 && totalHits < 500) // selective, not all-or-nothing
    // a no-index file falls back to full-scan filtering, same answer
    FlatGeobuf.write(s"$dir/noidx.fgb", cols, rows, geoms, indexNodeSize = 0)
    val a = FlatGeobuf.readFiltered(s"$dir/noidx.fgb", -30, -20, 30, 20)
      .rows.map(_.head).toSet
    val b = FlatGeobuf.readFiltered(s"$dir/grid.fgb", -30, -20, 30, 20)
      .rows.map(_.head).toSet
    assert(a == b)
  }

  test("gpkg rowid-alias detection follows SQLite's actual rules") {
    import graft.sources.GeoPackage.rowidAliasIndex
    // the classic GPKG pk IS the alias, wherever it sits
    assert(rowidAliasIndex(
      "CREATE TABLE t (fid INTEGER PRIMARY KEY AUTOINCREMENT, g BLOB)") == 0)
    assert(rowidAliasIndex(
      "CREATE TABLE t (g BLOB, id INTEGER NOT NULL PRIMARY KEY)") == 1)
    // quoted name with spaces: the TAIL is matched, not the name
    assert(rowidAliasIndex(
      "CREATE TABLE t (\"zip code\" INTEGER PRIMARY KEY, v TEXT)") == 0)
    // PRIMARY KEY DESC is NOT a rowid alias (values are stored for real
    // — treating it as the alias would overwrite stored values' slots)
    assert(rowidAliasIndex(
      "CREATE TABLE t (x INTEGER PRIMARY KEY DESC, y TEXT)") == -1)
    // declared type must be exactly INTEGER
    assert(rowidAliasIndex(
      "CREATE TABLE t (x INT PRIMARY KEY, y TEXT)") == -1)
    // a CHECK expression mentioning both words must not match
    assert(rowidAliasIndex(
      "CREATE TABLE t (y TEXT CHECK (y <> 'INTEGER' AND y <> 'PRIMARY KEY'), z TEXT)") == -1)
    // ASC is fine
    assert(rowidAliasIndex(
      "CREATE TABLE t (x INTEGER PRIMARY KEY ASC, y TEXT)") == 0)
  }

  test("gpkg and fgb sinks tolerate empty inputs") {
    import graft.sources.{FlatGeobuf, GeoPackage}
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    GeoPackage.write(s"$dir/empty.gpkg", "nothing", "geom", 4326,
      Seq("name"), Nil, Nil)
    val t = GeoPackage.featureTables(s"$dir/empty.gpkg")
    assert(t.map(_.name) == Seq("nothing"))
    assert(GeoPackage.read(s"$dir/empty.gpkg").rows.isEmpty)
    FlatGeobuf.write(s"$dir/empty.fgb", Seq(("name", FlatGeobuf.CtString)),
      Nil, Nil)
    val c = FlatGeobuf.read(s"$dir/empty.fgb")
    assert(c.rows.isEmpty && c.columns.map(_._1) == Seq("name"))
    assert(FlatGeobuf.readFiltered(s"$dir/empty.fgb", -1, -1, 1, 1).rows.isEmpty)
  }

  test("ndjson geojson round-trips through the distributed reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndjson")
    val out = dir.resolve("features").toString
    val df = spark.range(1, 500).toDF("id")
      .withColumn("geometry", graft.functions.geo.st_point(
        col("id") % 360 - 180 + 0.5, col("id") % 180 - 90 + 0.25))
      .withColumn("name", concat(lit("f"), col("id")))
    val t = graft.table.GeoTable.fromDataFrame(df, "geometry")
    t.writeGeoJsonSeq(out)
    val back = graft.table.GeoTable.fromGeoJsonSeq(spark, out)
    assert(back.df.count() == 499)
    // parsing is distributed: more than one input partition at this size
    assert(back.df.rdd.getNumPartitions >= 1)
    val wkts = back.df.select(graft.functions.geo.st_astext(col("geometry")))
      .collect().map(_.getString(0)).toSet
    val orig = t.df.select(graft.functions.geo.st_astext(col("geometry")))
      .collect().map(_.getString(0)).toSet
    assert(wkts == orig)
    // properties survive
    assert(back.df.filter(get_json_object(col("properties_json"), "$.name")
      === "f42").count() == 1)
  }

  test("shapefile sink writes a readable file back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp3")
    val out = dir.resolve("out.shp").toString
    val df = spark.range(1, 12).toDF("id")
      .withColumn("geometry", graft.functions.geo.st_point(
        org.apache.spark.sql.functions.col("id") * 2.0,
        org.apache.spark.sql.functions.col("id") * 1.0))
      .withColumn("tag", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("t"),
        org.apache.spark.sql.functions.col("id")))
    graft.table.GeoTable.fromDataFrame(df, "geometry").writeShapefile(out)
    val back = graft.table.GeoTable.fromShapefile(spark, out)
    assert(back.df.count() == 11)
    assert(back.df.columns.contains("id") && back.df.columns.contains("tag"))
    val ids: Seq[Long] = back.df.select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == (1L to 11L).toSeq)
  }

  test("all-CCW multi-ring polygon falls back to largest-area shell") {
    import graft.geom._
    // nonconformant writer: both rings CCW, so the CW-shell rule finds
    // no shell; the larger ring must become the CCW exterior, the
    // smaller a CW hole — never a CW-exterior polygon
    val outer = CoordSeq.of((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
    val inner = CoordSeq.of((4, 4), (6, 4), (6, 6), (4, 6), (4, 4))
    graft.sources.Shapefile.parts2Rings(Array(outer, inner)) match {
      case Polygon(rings) =>
        assert(rings.length == 2)
        assert(Orientation.signedArea(rings(0)) > 0) // CCW exterior
        assert(Orientation.signedArea(rings(1)) < 0) // CW hole
        assert(rings(0).xs.max == 10.0 && rings(1).xs.max == 6.0)
      case other => fail(s"expected Polygon, got $other")
    }
  }

  test("jsonl sink/source round-trips adversarial strings losslessly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // every JSON escaping hazard: quotes, backslashes, newlines, tabs,
    // control chars, unicode (incl. astral plane), embedded JSON, nulls
    val rows = Seq(
      (1L, "plain text"),
      (2L, "quote \" and backslash \\ mix \\\" here"),
      (3L, "line1\nline2\r\nline3\ttabbed"),
      (4L, "unicode: éß中文 😀 end"),
      (5L, "control: bell:"),
      (6L, """{"nested":"json","arr":[1,2]}"""),
      (7L, ""),
      (8L, null.asInstanceOf[String]))
    val df = rows.toDF("id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    graft.sources.Jsonl.write(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    val back = graft.sources.Jsonl.read(spark, dir, schema)
    assert(back.count() === 8)
    val got = back.as[(Long, String)].collect().toMap
    rows.foreach { case (id, want) =>
      assert(got(id) === want, s"id=$id")
    }
    // inferred-schema read sees the same data
    val inferred = graft.sources.Jsonl.read(spark, dir)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(inferred === got)
  }

  test("tar shards round-trip samples and parse as valid ustar") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", encode($"text", "UTF-8").as("txt"),
        encode(to_json(struct($"lang", $"source")), "UTF-8").as("meta"))
    val dir = java.nio.file.Files.createTempDirectory("tarshards").toString
    graft.sources.TarShards.write(docs, dir, "doc_id",
      Seq("txt" -> "txt", "json" -> "meta"), nShards = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(files.length == 4, s"expected 4 shards, got ${files.length}")
    // every byte accounted for: sizes are 512-aligned
    files.foreach(f => assert(f.length % 512 == 0, f.getName))

    // read back (the parser validates magic + checksum per entry)
    val back = graft.sources.TarShards.read(spark, dir)
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .count()
    assert(back.count() == 2 * n) // one .txt + one .json per doc
    val texts = back.filter($"ext" === "txt")
      .select($"key".cast("long"), decode($"content", "UTF-8"))
      .as[(Long, String)].collect().toMap
    val want = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts === want)

    // cross-check against the system tar when present: the shards must
    // be readable by a foreign ustar implementation, not just our own
    if (new java.io.File("/bin/tar").exists() ||
        new java.io.File("/usr/bin/tar").exists()) {
      import scala.sys.process._
      val listed = Seq("tar", "-tf", files.head.getPath).!!.linesIterator
        .toSeq
      assert(listed.nonEmpty && listed.forall(l =>
        l.endsWith(".txt") || l.endsWith(".json")), listed.take(3))
    }
  }
  test("bigquery source: validation, detection, bbox strategy, scan composition") {
    import org.apache.spark.sql.functions._
    // --- id validation (injection-safe patterns) ---
    assert(BigQuery.normalizeTableId("proj-x1.ds.tbl") == "proj-x1.ds.tbl")
    assert(BigQuery.normalizeTableId("ds.tbl", Some("my-project")) ==
      "my-project.ds.tbl")
    intercept[IllegalArgumentException](BigQuery.normalizeTableId("ds.tbl"))
    intercept[IllegalArgumentException](
      BigQuery.normalizeTableId("ds.tbl'; DROP--", Some("my-project")))
    intercept[IllegalArgumentException](
      BigQuery.normalizeTableId("ds.tbl", Some("UPPER")))

    // --- geometry detection: typed column wins, explicit validates ---
    val sch = Seq("id" -> "INT64", "geog" -> "GEOGRAPHY", "name" -> "STRING")
    assert(BigQuery.detectGeometryColumn(sch, None, "t").contains("geog"))
    assert(BigQuery.detectGeometryColumn(
      Seq("id" -> "INT64", "the_geom" -> "BYTES"), None, "t")
      .contains("the_geom"))
    assert(BigQuery.detectGeometryColumn(sch, Some("GEOG"), "t")
      .contains("geog"))
    intercept[IllegalArgumentException](
      BigQuery.detectGeometryColumn(sch, Some("nope"), "t"))

    // --- bbox strategy thresholds ---
    assert(BigQuery.useServerBbox("server", None, 10))
    assert(!BigQuery.useServerBbox("local", Some(99L), 10))
    assert(BigQuery.useServerBbox("auto", Some(10L), 10))
    assert(!BigQuery.useServerBbox("auto", Some(9L), 10))
    assert(!BigQuery.useServerBbox("auto", None, 10))

    // --- fake transport serving WKB points at (1,1),(5,5),(20,20) ---
    val pts = Seq((1L, 1.0, 1.0), (2L, 5.0, 5.0), (3L, 20.0, 20.0))
    val scans = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Option[String])]
    val fake = new BigQuery.Transport {
      def schema(t: String) =
        Seq("id" -> "INT64", "geog" -> "GEOGRAPHY", "name" -> "STRING")
      def rowCount(t: String) = Some(3L)
      def scan(s: org.apache.spark.sql.SparkSession, t: String,
          select: Seq[String], serverFilter: Option[String]) = {
        scans += ((select, serverFilter))
        import s.implicits._
        val df = pts.toDF("id", "x", "y")
          .withColumn("geog", graft.functions.geo.st_point($"x", $"y"))
          .withColumn("name", concat(lit("p"), $"id"))
          .select(select.map(col): _*)
        // server-side predicate honored by the fake via the bbox WKT
        serverFilter match {
          case Some(f) if f.contains("20 20") => df
          case Some(_) => df.filter($"id" =!= 3)
          case None => df
        }
      }
    }

    // local strategy (below threshold): Spark-side bbox filter applies
    val t1 = BigQuery.read(spark, "ds.tbl", Some("my-project"),
      BigQuery.Query(bbox = Some((0.0, 0.0, 10.0, 10.0)),
        bboxThreshold = 100L), fake)
    assert(scans.last._2.isEmpty)
    assert(t1.meta.primary.flatMap(_.edges).contains("spherical"))
    assert(t1.df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // server strategy (forced): predicate handed to the transport
    val t2 = BigQuery.read(spark, "my-project.ds.tbl", None,
      BigQuery.Query(bbox = Some((0.0, 0.0, 10.0, 10.0)),
        bboxMode = "server"), fake)
    assert(scans.last._2.exists(f => f.startsWith("ST_INTERSECTS(geog") &&
      f.contains("POLYGON((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))")))
    assert(t2.df.count() == 2)

    // column selection force-includes geometry; WHERE + limit compose
    val t3 = BigQuery.read(spark, "my-project.ds.tbl", None,
      BigQuery.Query(columns = Some(Seq("id", "name")),
        where = Some("id >= 2"), limit = Some(1)), fake)
    assert(scans.last._1 == Seq("id", "name", "geog"))
    assert(t3.df.count() == 1)
    assert(t3.df.columns.toSet == Set("id", "name", "geog"))
  }
  test("pmtiles sink: path guard, tippecanoe argv, declarative stages") {
    import org.apache.spark.sql.functions._
    // shell-metacharacter guard (reference core.py:24-38)
    intercept[IllegalArgumentException](PmTiles.validatePath("a;rm -rf"))
    intercept[IllegalArgumentException](PmTiles.validatePath("a|b"))
    assert(PmTiles.validatePath("/tmp/ok-path_1.pmtiles") == "/tmp/ok-path_1.pmtiles")

    // argv construction (core.py:160-188): layer from filename, -zg auto
    assert(PmTiles.tippecanoeCommand("/tmp/roads.pmtiles", PmTiles.Options())
      == Seq("tippecanoe", "-P", "-o", "/tmp/roads.pmtiles", "-l", "roads",
        "-zg", "--drop-densest-as-needed"))
    assert(PmTiles.tippecanoeCommand("/tmp/x.pmtiles",
      PmTiles.Options(layer = Some("l1"), minZoom = Some(2), maxZoom = Some(9)))
      == Seq("tippecanoe", "-P", "-o", "/tmp/x.pmtiles", "-l", "l1",
        "-Z", "2", "-z", "9", "--drop-densest-as-needed"))

    // the piped-subprocess stages as one Spark plan: bbox + where +
    // column selection + precision all reflected in the feature lines
    val df = spark.range(1, 21).toDF("id")
      .withColumn("keep", col("id") % 2 === 0)
      .withColumn("geometry", graft.functions.geo.st_point(
        col("id").cast("double"), col("id").cast("double") / 2))
    val t = graft.table.GeoTable.fromDataFrame(df, "geometry")
    val lines = PmTiles.featureLines(t, PmTiles.Options(
      bbox = Some((0.0, 0.0, 10.0, 10.0)), where = Some("keep"),
      includeCols = Some(Seq("id")), precision = 3))
      .collect().map(_.getString(0))
    // ids 2..10 even AND x<=10 -> 2,4,6,8,10
    assert(lines.length == 5, lines.mkString("\n"))
    assert(lines.forall(l => l.contains("\"type\":\"Feature\"") &&
      l.contains("\"id\":") && !l.contains("keep")))

    // execution path: absent binary -> the reference's install guidance
    if (!PmTiles.tippecanoeAvailable()) {
      val e = intercept[IllegalStateException](PmTiles.generate(spark,
        "/tmp/nonexistent.parquet", "/tmp/out.pmtiles"))
      assert(e.getMessage.contains("install tippecanoe"))
    }
  }
  test("stac checkFile: full reference check matrix + CLI command") {
    import org.apache.spark.sql.functions._
    import graft.functions.geo
    val dir = java.nio.file.Files.createTempDirectory("graft_stac_chk")
    // a real item whose asset href resolves locally
    val data = dir.resolve("d").toString
    val df = spark.range(10).toDF("id")
      .withColumn("geometry", geo.st_point(
        col("id").cast("double"), col("id").cast("double")))
    graft.table.GeoTable.fromDataFrame(df, "geometry").addBbox().write(data)
    val good = Stac.item(data, "i1", "d")
    val gp = dir.resolve("item.json")
    java.nio.file.Files.writeString(gp, good)
    val (e1, w1) = Stac.checkFile(gp.toString)
    assert(e1.isEmpty, e1.toString)
    // our own items carry a data role + media type; only the self-link
    // recommendation should remain
    assert(w1 == Seq("No 'self' link found (recommended)"), w1.toString)

    // broken item: missing fields, dangling asset, inverted bbox
    val bad = """{"type":"Feature","id":"x","geometry":{"type":"Point",
      "coordinates":[0,0]},"bbox":[5,5,1,1],"properties":{},
      "assets":{"data":{"href":"missing.parquet"}},"links":[]}"""
    val bp = dir.resolve("bad.json")
    java.nio.file.Files.writeString(bp, bad)
    val (e2, w2) = Stac.checkFile(bp.toString)
    assert(e2.exists(_.contains("Invalid bbox ordering")), e2.toString)
    assert(w2.exists(_.contains("does not resolve locally")), w2.toString)
    assert(w2.exists(_.contains("missing media type")), w2.toString)
    assert(w2.exists(_.contains("No asset with 'data' role")), w2.toString)
    assert(w2.exists(_.contains("Missing 'datetime'")), w2.toString)

    // collection path + unreadable path
    java.nio.file.Files.writeString(dir.resolve("coll.json"),
      Stac.collection("c1", "desc", Seq((0.0, 0.0, 1.0, 1.0))))
    val (e3, _) = Stac.checkFile(dir.resolve("coll.json").toString)
    assert(e3.isEmpty, e3.toString)
    val (e4, _) = Stac.checkFile(dir.resolve("nope.json").toString)
    assert(e4.exists(_.contains("cannot load")), e4.toString)

    // CLI face: passes on the good item
    graft.cli.Main.run(spark, Seq("check", "stac", gp.toString))
  }

  // ---- round-11 codec review regressions --------------------------------

  test("dbf round-trips non-ASCII attributes (UTF-8, byte-budget truncation)") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shputf")
    val shp = dir.resolve("u.shp").toString
    val fields = Seq(Shapefile.DbfField("name", 'C', 16, 0))
    Shapefile.write(shp, Seq(Point(1, 2), Point(3, 4)),
      fields, Seq(Seq("caf\u00e9"), Seq("z\u00fcrich")))
    val t = graft.table.GeoTable.fromShapefile(spark, shp)
    val names = t.df.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("caf\u00e9", "z\u00fcrich"), names.toString)
    // byte-budget truncation must not split a multi-byte char: 16 ASCII
    // chars + one 2-byte char over the 16-byte budget drops the whole char
    Shapefile.write(dir.resolve("t.shp").toString, Seq(Point(1, 2)),
      fields, Seq(Seq(("x" * 15) + "\u00e9")))
    val trunc = graft.table.GeoTable
      .fromShapefile(spark, dir.resolve("t.shp").toString)
      .df.select("name").collect().head.getString(0)
    assert(trunc == "x" * 15, s"got '$trunc'")
  }

  test("dbf rejects a record with the wrong arity instead of shifting " +
      "every later record") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shpar")
    val fields = Seq(Shapefile.DbfField("a", 'C', 4, 0),
      Shapefile.DbfField("b", 'C', 4, 0))
    val ex = intercept[IllegalArgumentException] {
      Shapefile.write(dir.resolve("x.shp").toString,
        Seq(Point(1, 2)), fields, Seq(Seq("only")))
    }
    assert(ex.getMessage.contains("values for"))
  }

  test("shapefile sink tolerates empty input (header-only file)") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shpe")
    val shp = dir.resolve("e.shp").toString
    Shapefile.write(shp, Seq.empty, Seq(Shapefile.DbfField("a", 'C', 4, 0)),
      Seq.empty)
    val t = graft.table.GeoTable.fromShapefile(spark, shp)
    assert(t.df.count() == 0)
  }

  test("shapefile polygon record length matches the shape-type formula " +
      "(no junk padding words)") {
    import graft.geom._
    val dir = java.nio.file.Files.createTempDirectory("graft_shplen")
    val shp = dir.resolve("p.shp").toString
    val ring = CoordSeq(Array(0.0, 4.0, 4.0, 0.0, 0.0), Array(0.0, 0.0, 4.0, 4.0, 0.0))
    Shapefile.write(shp, Seq(Polygon(Array(ring))), Seq.empty, Seq(Seq()))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shp))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(104) // first record: header(8) at 100, content length at 104
    bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    val contentWords = bb.getInt(104)
    // formula: (4 type + 32 bbox + 8 counts + 4*parts + 16*points) / 2
    val expect = (44 + 4 * 1 + 16 * 5) / 2
    assert(contentWords == expect, s"content $contentWords words, want $expect")
  }

  // ---- round-12 sources sweep regressions --------------------------------

  test("gpkg: a column NAMED like a constraint keyword survives parsing") {
    import graft.sources.GeoPackage
    val dir = java.nio.file.Files.createTempDirectory("graft_kw").toString
    GeoPackage.write(s"$dir/kw.gpkg", "t", "geom", 4326,
      Seq("primary_fuel", "checksum", "v"),
      Seq(Seq("coal", "abc", 1L), Seq("wind", "def", 2L)),
      Seq(graft.geom.Point(1, 2), graft.geom.Point(3, 4)))
    val c = GeoPackage.read(s"$dir/kw.gpkg")
    assert(c.columns.takeRight(3) == Seq("primary_fuel", "checksum", "v"),
      s"keyword-prefixed columns must not be dropped: ${c.columns}")
    val fi = c.columns.indexOf("primary_fuel")
    assert(c.rows.map(_(fi)) == Seq("coal", "wind"))
    assert(c.geoms.forall(_ != null))
  }

  test("gpkg: identifiers with embedded double quotes are rejected loudly") {
    import graft.sources.GeoPackage
    val dir = java.nio.file.Files.createTempDirectory("graft_q").toString
    val e = intercept[IllegalArgumentException] {
      GeoPackage.write(s"$dir/q.gpkg", "a\"b", "geom", 4326,
        Seq("v"), Seq(Seq(1L)), Seq(graft.geom.Point(1, 2)))
    }
    assert(e.getMessage.contains("double quote"))
  }

  test("tar shards: multi-dot extensions split at the FIRST dot " +
      "(webdataset convention) so one sample's entries share a key") {
    import spark.implicits._
    val docs = Seq((7L, "hello".getBytes("UTF-8"), "{}".getBytes("UTF-8")))
      .toDF("doc_id", "payload", "meta")
    val dir = java.nio.file.Files.createTempDirectory("graft_tar2").toString
    graft.sources.TarShards.write(docs, dir, "doc_id",
      Seq("json.gz" -> "meta", "cls" -> "payload"), nShards = 1)
    val back = graft.sources.TarShards.read(spark, dir)
      .select($"key", $"ext").as[(String, String)].collect().toSet
    assert(back == Set(("7", "json.gz"), ("7", "cls")),
      s"entries of one sample must share key: $back")
  }

  test("shapefile: a present dbf declaring 0 records next to shapes " +
      "fails loudly instead of silently dropping attributes") {
    import graft.sources.Shapefile
    val dir = java.nio.file.Files.createTempDirectory("graft_shp0").toString
    Shapefile.write(s"$dir/a.shp",
      Seq(graft.geom.Point(1, 2), graft.geom.Point(3, 4)),
      Seq(Shapefile.DbfField("v", 'N', 18, 0)),
      Seq(Seq(java.lang.Long.valueOf(1L)), Seq(java.lang.Long.valueOf(2L))))
    // zero out the dbf header's record count (LE u32 at offset 4)
    val dbf = java.nio.file.Paths.get(s"$dir/a.dbf")
    val bytes = java.nio.file.Files.readAllBytes(dbf)
    bytes(4) = 0; bytes(5) = 0; bytes(6) = 0; bytes(7) = 0
    java.nio.file.Files.write(dbf, bytes)
    val e = intercept[IllegalArgumentException] {
      Shapefile.read(s"$dir/a.shp")
    }
    assert(e.getMessage.contains("0 records"), e.getMessage)
  }

  test("pmtiles: explicit minZoom with auto maxZoom keeps the floor") {
    val cmd = graft.sources.PmTiles.tippecanoeCommand("/tmp/x.pmtiles",
      graft.sources.PmTiles.Options(minZoom = Some(10), maxZoom = None))
    val zi = cmd.indexOf("-Z")
    assert(zi >= 0 && cmd(zi + 1) == "10" && cmd.contains("-zg"),
      s"minZoom must survive: $cmd")
  }

  test("bigquery: a typo'd requested column fails loudly, not silently") {
    import graft.sources.BigQuery
    val fake = new BigQuery.Transport {
      def schema(t: String) =
        Seq("id" -> "INT64", "geog" -> "GEOGRAPHY", "name" -> "STRING")
      def rowCount(t: String) = Some(1L)
      def scan(s: org.apache.spark.sql.SparkSession, t: String,
          select: Seq[String], serverFilter: Option[String]) =
        throw new IllegalStateException("must not scan")
    }
    val e = intercept[IllegalArgumentException] {
      BigQuery.read(spark, "ds.tbl", Some("my-project"),
        BigQuery.Query(columns = Some(Seq("nmae"))), fake)
    }
    assert(e.getMessage.contains("nmae"))
  }

  test("stac: empty item set makes collection() fail with a clear message") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.Stac.collection("c", "d", Seq.empty)
    }
    assert(e.getMessage.contains("at least one item"))
  }
}
