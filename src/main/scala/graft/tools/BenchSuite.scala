package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.table.GeoTable

/** Operation-matrix benchmark harness (reference `gpio benchmark suite`,
  * `core/benchmark_suite.py` + `benchmarks/operations.py:21-358`): times
  * the core operator set on a generated geo table, compares against a
  * stored baseline JSON with the reference's regression thresholds
  * (warn >10% / fail >25% time — `benchmarks/config.py:16-19`).
  *
  *   sbt "runMain graft.tools.BenchSuite [rows] [baselinePath]"
  *
  * or via the CLI (`graft benchmark suite|report`, mirroring the
  * reference's `cli/main.py:4448-4643` command group). With no baseline
  * file present, writes one. With one present, prints per-op deltas and
  * regression status.
  */
object BenchSuite {

  /** Reference thresholds (`benchmarks/config.py:16-19`). */
  val WarnPct = 10.0
  val FailPct = 25.0

  /** Time the reference's §6 operation matrix on a generated geo table
    * of `rows` rows; returns (op, seconds) in matrix order.
    */
  def runMatrix(spark: SparkSession, rows: Int): Seq[(String, Double)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_suite").toString
    val src = s"$work/src"
    // generated geo table (benchmark input tiers in the reference are
    // hosted files; zero-egress here, so synthesize deterministically)
    val df = spark.range(rows).toDF("id")
      .withColumn("name", concat(lit("feature_"), col("id")))
      .withColumn("category", (col("id") % 16).cast("string"))
      .withColumn("geometry", geo.st_point(
        col("id") * 37 % 360 - 180 + (col("id") % 8) * 0.125,
        col("id") * 91 % 180 - 90 + (col("id") % 4) * 0.25))
    GeoTable.fromDataFrame(df, "geometry").write(src)

    def time(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[suite] $name%-22s $dt%8.3f s")
      name -> dt
    }

    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()

    // warmup
    noop(GeoTable.read(spark, src).addBbox().df)

    Seq(
      time("read") { noop(GeoTable.read(spark, src).df) },
      time("write") { GeoTable.read(spark, src).write(s"$work/w") },
      time("add_bbox") { noop(GeoTable.read(spark, src).addBbox().df) },
      time("add_quadkey") { noop(GeoTable.read(spark, src).addQuadkey(13).df) },
      time("extract_bbox") {
        noop(GeoTable.read(spark, src).filterBbox(-60, -30, 60, 30).df)
      },
      time("extract_columns") {
        noop(GeoTable.read(spark, src).selectColumns(include = Seq("id")).df)
      },
      time("sort_hilbert") { noop(GeoTable.read(spark, src).sortHilbert().df) },
      time("sort_column") {
        noop(GeoTable.read(spark, src).sortBy(Seq("category", "id")).df)
      },
      time("reproject") {
        noop(GeoTable.read(spark, src).reproject("EPSG:4326", "EPSG:3857").df)
      },
      time("to_geojson") {
        noop(GeoTable.read(spark, src).toGeoJsonFeatures(6))
      },
      time("partition_quadkey") {
        GeoTable.read(spark, src).partitionByQuadkey(6, 2, s"$work/pq", force = true)
      },
      time("chain_bbox_qk_hilbert") {
        noop(GeoTable.read(spark, src).addBbox().addQuadkey(13).sortHilbert().df)
      })
  }

  def toJson(ops: Seq[(String, Double)]): String =
    ops.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  def parseJson(json: String): Seq[(String, Double)] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val it = node.fields()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue.asDouble }
    buf.toSeq
  }

  /** Per-op (name, deltaPct, status) with the reference thresholds;
    * ops missing from the baseline are reported as "new".
    */
  def compare(current: Seq[(String, Double)],
      baseline: Map[String, Double]): Seq[(String, Double, String)] =
    current.map { case (k, v) =>
      baseline.get(k) match {
        case Some(b) if b > 0 =>
          val delta = (v - b) / b * 100
          val status =
            if (delta > FailPct) "FAIL"
            else if (delta > WarnPct) "warn"
            else "ok"
          (k, delta, status)
        case _ => (k, 0.0, "new")
      }
    }

  /** Print the comparison table; returns true when any op FAILed. */
  def report(rows: Seq[(String, Double, String)]): Boolean = {
    rows.foreach { case (k, delta, status) =>
      println(f"[suite] $k%-22s ${delta}%+7.1f%% vs baseline [$status]")
    }
    val regressed = rows.exists(_._3 == "FAIL")
    if (regressed) println("[suite] REGRESSION")
    regressed
  }

  /** `benchmark compare` (reference `cli/main.py:4401-4500`): the
    * reference races converter BACKENDS (DuckDB / GeoPandas / GDAL) on
    * one input file. This engine has exactly one backend (Spark), so
    * the comparable axis is the SINK FORMAT: convert the input to each
    * requested format (optional warmup, best-of-N) and report seconds +
    * output bytes — the same "which conversion path should I use for
    * this file" answer. Returns (format, bestSeconds, outputBytes).
    */
  def compareConverters(spark: SparkSession, input: String,
      formats: Seq[String], iterations: Int,
      warmup: Boolean): Seq[(String, Double, Long)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    def sizeOf(p: String): Long = {
      // listFiles is null (not empty) on a vanished dir or an IO error —
      // a race with the writer's temp-file cleanup must not NPE the report
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).fold(0L)(_.map(walk).sum)
        else f.length
      walk(new java.io.File(p))
    }
    formats.map { fmt =>
      val out = s"$work/out_$fmt"
      def once(): Double = {
        val t = GeoTable.read(spark, input)
        val t0 = System.nanoTime()
        fmt match {
          case "geoparquet" => t.write(out)
          case "geojson"    => t.writeGeoJsonSeq(out)
          case "csv"        => t.writeCsv(out)
          case "shapefile"  => t.writeShapefile(out)
          case "geopackage" => t.writeGeoPackage(out)
          case "flatgeobuf" => t.writeFlatGeobuf(out)
          case other =>
            throw new IllegalArgumentException(s"unknown converter $other")
        }
        (System.nanoTime() - t0) / 1e9
      }
      if (warmup) once()
      val best = (1 to iterations).map(_ => once()).min
      val bytes = sizeOf(out)
      println(f"[compare] $fmt%-12s $best%8.3f s $bytes%12d bytes")
      (fmt, best, bytes)
    }
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(100000)
    val baselinePath = args.lift(1).getOrElse("bench_baseline.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ops = runMatrix(spark, rows)
    val p = java.nio.file.Paths.get(baselinePath)
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.writeString(p, toJson(ops))
      println(s"[suite] baseline written to $baselinePath")
    } else {
      val base = parseJson(java.nio.file.Files.readString(p)).toMap
      if (report(compare(ops, base))) sys.exit(1)
    }
    spark.stop()
  }
}
