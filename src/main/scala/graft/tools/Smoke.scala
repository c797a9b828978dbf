package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev smoke: exercises the SQL-registered geo surface and edge cases
  * end-to-end on a live session. Run:
  *   sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.geo.register(spark)

    println("== SQL surface ==")
    spark.sql(
      """SELECT
        |  st_astext(st_centroid(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS centroid,
        |  st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS dist,
        |  st_intersects(st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
        |                st_geomfromtext('POINT (1 1)')) AS hits
        |""".stripMargin).show(false)

    println("== malformed WKT via try_geomfromtext (null, no crash) ==")
    Seq("POINT (1 2)", "GARBAGE((", "LINESTRING (0 0, 1 1)").toDF("wkt")
      .select($"wkt", graft.functions.geo.try_geomfromtext($"wkt").isNull.as("parse_failed"))
      .show(false)

    println("== malformed WKB via strict st_x (error surfaced) ==")
    try {
      graft.util.CollectCapped(
        Seq(Array[Byte](9, 9, 9)).toDF("b")
          .select(graft.functions.geo.st_x($"b")), 1000, "smoke probe").head
      println("ERROR: expected exception")
    } catch {
      case e: Exception =>
        val root = Option(e.getCause).getOrElse(e)
        println(s"strict parse error surfaced: ${root.getMessage.take(100)}")
    }

    println("== spatial keys ==")
    spark.range(1).select(
      graft.functions.geo.quadkey(lit(-122.4194), lit(37.7749), 13).as("sf_quadkey"),
      graft.functions.geo.hilbert_xy(lit(0.5), lit(0.5), 0, 0, 1, 1).as("hilbert_mid"))
      .show(false)

    println("== GeoTable end-to-end (write -> footer -> read -> validate) ==")
    locally {
      import graft.table.GeoTable
      import graft.checks.Checks
      val out = java.nio.file.Files.createTempDirectory("graft_smoke").toString + "/pts"
      val df = spark.range(1000).toDF("id")
        .withColumn("geometry", graft.functions.geo.st_point(
          col("id") * 37 % 360 - 180, col("id") * 91 % 180 - 90))
      GeoTable.fromDataFrame(df, "geometry")
        .addBbox().sortHilbert().write(out)
      val summary = Checks.inspect(out)
      println(s"rows=${summary.rowCount} rowGroups=${summary.numRowGroups} " +
        s"geo=${summary.hasGeoMetadata} v=${summary.geoVersion.orNull} " +
        s"bboxStatus=${Checks.checkBboxStructure(out)}")
      val t = GeoTable.read(spark, out)
      println(s"readBack geometryColumn=${t.geometryColumn} " +
        s"spatialOrderRatio=${"%.3f".format(t.checkSpatialOrder())} " +
        s"validateFindings=${Checks.validate(spark, out).size}")
      val filtered = t.filterBbox(-60, -30, 60, 30).count()
      println(s"bboxFilter count=$filtered (fast path via bbox struct)")
    }

    println("== optimizer rule + admin enrich ==")
    locally {
      import graft.table.GeoTable
      graft.plans.GraftExtensions.install(spark)
      val out = java.nio.file.Files.createTempDirectory("graft_sm_rule").toString + "/d"
      val df0 = spark.range(500).toDF("id").withColumn("geometry",
        graft.functions.geo.st_point(col("id") * 37 % 360 - 180, col("id") * 91 % 180 - 90))
      GeoTable.fromDataFrame(df0, "geometry").addBbox().write(out)
      val filtered = spark.read.parquet(out).filter(
        graft.functions.geo.st_intersects(col("geometry"),
          graft.functions.geo.st_makeenvelope(-60, -30, 60, 30)))
      val pushed = filtered.queryExecution.executedPlan.toString.contains("bbox.xmax")
      println(s"bbox conjuncts pushed to scan: $pushed  rows=${filtered.count()}")
      import spark.implicits._
      val boundaries = Seq(
        ("west", "POLYGON ((-180 -90, 0 -90, 0 90, -180 90, -180 -90))"),
        ("east", "POLYGON ((0 -90, 180 -90, 180 90, 0 90, 0 -90))"))
        .toDF("region", "wkt")
        .withColumn("bgeom", graft.functions.geo.st_geomfromtext($"wkt")).drop("wkt")
      val enriched = GeoTable.read(spark, out)
        .enrichSpatial(boundaries, "bgeom", Seq("region"))
      graft.util.CollectCapped(
      enriched.df.groupBy("region").count().orderBy("region"), 1000,
      "smoke region rollup")
        .foreach(r => println(s"region ${r.get(0)}: ${r.getLong(1)} points"))
      println(s"file type: ${graft.meta.Footer.detectFileType(graft.meta.Footer.partFiles(out).head)}")
      // write-settings surface: zstd level + row-group byte target
      val tuned = java.nio.file.Files.createTempDirectory("graft_sm_tuned").toString + "/t"
      GeoTable.read(spark, out).write(tuned, compression = "zstd",
        compressionLevel = Some(15), rowGroupBytes = Some(1L * 1024 * 1024))
      val codecs = graft.meta.Footer.read(graft.meta.Footer.partFiles(tuned).head)
        .rowGroups.flatMap(_.columns.values.map(_.codec)).distinct
      println(s"tuned write codecs=${codecs.mkString(",")} " +
        s"compressionCheck=${graft.checks.Checks.checkCompression(tuned).isEmpty}")
      // LSH-blocked embedding near-dup through the public op
      import spark.implicits._
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val nd = graft.ops.Dedup.embeddingNearDups(emb, "embedding", "vec_id",
        threshold = 0.4, bits = 6).count()
      println(s"embedding near-dup pairs (cos>=0.4, lsh-blocked): $nd")
    }

    println("== streaming twin + sinks + stac ==")
    locally {
      import graft.streaming.Streaming
      val sdir = java.nio.file.Files.createTempDirectory("graft_sm_stream").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(s"$sdir/events.parquet"))
      val win = Streaming.runToCompletion(
        Streaming.windowedAgg(Streaming.readEvents(spark, sdir)),
        "smoke_win", outputMode = "complete")
      println(s"streaming windows=${win.count()}")
      import graft.table.GeoTable
      val t = GeoTable.fromDataFrame(
        spark.range(10).toDF("id").withColumn("geometry",
          graft.functions.geo.st_point(col("id").cast("double"), lit(1.0))),
        "geometry")
      val csvOut = java.nio.file.Files.createTempDirectory("graft_sm_csv").toString + "/c"
      t.writeCsv(csvOut)
      println(s"csv sink rows=${spark.read.option("header", "true").csv(csvOut).count()}")
      println("featureCollection head=" + t.limit(1).toFeatureCollection().take(80))
      val gpq = java.nio.file.Files.createTempDirectory("graft_sm_gpq").toString + "/d"
      t.addBbox().write(gpq)
      val item = graft.sources.Stac.item(gpq, "it", "file://x")
      println(s"stac validates: ${graft.sources.Stac.validateItem(item).isEmpty}")
    }

    println("== geojson round-trip ==")
    spark.range(1).select(
      graft.functions.geo.st_asgeojson(
        graft.functions.geo.st_geomfromgeojson(
          lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":[1.5,2.5]},"properties":{}}""")))
        .as("gj")).show(false)

    spark.stop()
  }
}
