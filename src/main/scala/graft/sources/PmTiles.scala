package graft.sources

import org.apache.spark.sql.SparkSession
import graft.table.GeoTable

/** PMTiles sink (reference plugin `gpio-pmtiles`,
  * `plugins/gpio-pmtiles/gpio_pmtiles/core.py`): generate a .pmtiles
  * archive by piping line-delimited GeoJSON into tippecanoe — the
  * reference is subprocess orchestration of that same external tool,
  * with a helpful install message when it is absent
  * (`core.py:9-21` TippecanoeNotFoundError).
  *
  * Spark-first shape: the filter/reproject/precision stages the
  * reference runs as piped `gpio` subprocesses are ONE declarative
  * plan here ([[GeoTable.filterBbox]]/[[GeoTable.reproject]]/
  * `toGeoJsonFeatures`), streamed to tippecanoe's stdin driver-side
  * (the tile build itself is inherently single-process — tippecanoe
  * owns the tiling). Command construction and path validation
  * (`core.py:24-38`) are pure and spec-covered; execution is gated on
  * the binary being installed.
  */
object PmTiles {

  /** Shell-metacharacter guard (`core.py:24-38`). Paths run through
    * ProcessBuilder (no shell), but the reference rejects these anyway
    * — defense in depth against a caller later composing a shell line.
    */
  def validatePath(path: String): String = {
    val dangerous = Seq(";", "|", "&", "$", "`", "\n", "\r")
    dangerous.find(path.contains(_)).foreach { c =>
      throw new IllegalArgumentException(
        s"Path contains dangerous character '$c': $path. " +
          "File paths must not contain shell metacharacters.")
    }
    path
  }

  final case class Options(
      layer: Option[String] = None,
      minZoom: Option[Int] = None,
      maxZoom: Option[Int] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      where: Option[String] = None,
      includeCols: Option[Seq[String]] = None,
      srcCrs: Option[String] = None,
      precision: Int = 6)

  /** The tippecanoe argv (`core.py:160-188`): `-P` (parallel ndjson
    * read), explicit or filename-derived layer, `-Z/-z` zooms or `-zg`
    * auto, and the recommended `--drop-densest-as-needed`.
    */
  def tippecanoeCommand(outputPath: String, opts: Options): Seq[String] = {
    validatePath(outputPath)
    val layer = opts.layer.getOrElse {
      val base = new java.io.File(outputPath).getName
      if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
    }
    val zooms = (opts.minZoom, opts.maxZoom) match {
      case (Some(z0), Some(z1)) => Seq("-Z", z0.toString, "-z", z1.toString)
      case (None, Some(z1))     => Seq("-z", z1.toString)
      // an explicit minimum with auto maximum: -zg guesses the max but
      // the user's floor must survive (it used to be silently dropped)
      case (Some(z0), None)     => Seq("-Z", z0.toString, "-zg")
      case _                    => Seq("-zg")
    }
    Seq("tippecanoe", "-P", "-o", outputPath, "-l", layer) ++ zooms ++
      Seq("--drop-densest-as-needed")
  }

  def tippecanoeAvailable(): Boolean =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(d => new java.io.File(d, "tippecanoe").canExecute)

  /** The declarative stage pipeline (the reference's piped `gpio
    * reproject | extract | convert geojson` subprocesses,
    * `core.py:64-158`, as one Spark plan): reproject to EPSG:4326 when
    * a source CRS is given, then bbox / WHERE / column selection, then
    * line-delimited GeoJSON features at the requested precision.
    */
  def featureLines(t: GeoTable, opts: Options): org.apache.spark.sql.DataFrame = {
    var cur = opts.srcCrs.map(src => t.reproject(src, "EPSG:4326")).getOrElse(t)
    opts.bbox.foreach { case (x0, y0, x1, y1) =>
      cur = cur.filterBbox(x0, y0, x1, y1)
    }
    opts.where.foreach(w => cur = cur.filterWhere(w))
    opts.includeCols.foreach(cs => cur = cur.selectColumns(include = cs))
    cur.toGeoJsonFeatures(opts.precision)
  }

  /** Generate `outputPath` from a GeoParquet input. Fails with the
    * reference's install guidance when tippecanoe is not on PATH.
    */
  def generate(spark: SparkSession, inputPath: String, outputPath: String,
      opts: Options = Options()): Unit = {
    validatePath(inputPath); validatePath(outputPath)
    if (!tippecanoeAvailable())
      throw new IllegalStateException(
        "tippecanoe not found in PATH.\n\nTo use the pmtiles sink, " +
          "install tippecanoe:\n  macOS:  brew install tippecanoe\n" +
          "  Ubuntu: sudo apt install tippecanoe\n\nAlternatively pipe " +
          "it yourself: graft to geojson data.parquet - | " +
          "tippecanoe -P -o output.pmtiles")
    val lines = featureLines(GeoTable.read(spark, inputPath), opts)
    val proc = new ProcessBuilder(tippecanoeCommand(outputPath, opts): _*)
      .redirectErrorStream(true).start()
    // drain the child's merged stdout/stderr CONCURRENTLY with the
    // stdin writes: tippecanoe emits progress lines while ingesting,
    // and once the ~64 KiB OS pipe fills it blocks on write — which
    // stops it reading stdin, which blocks our println — a silent
    // two-process deadlock, not an error
    val drained = new java.lang.StringBuilder
    val drainer = new Thread(() => {
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(
        proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      var line = r.readLine()
      while (line != null) {
        if (drained.length < 8192) drained.append(line).append('\n')
        line = r.readLine()
      }
    }, "pmtiles-drain")
    drainer.setDaemon(true)
    drainer.start()
    val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
    // toLocalIterator: one partition in flight — the driver streams
    // features without materializing the corpus. checkError(): a
    // PrintWriter swallows broken-pipe IOExceptions into a flag, so if
    // tippecanoe exits early (e.g. output exists without --force) we'd
    // otherwise pump the whole dataset into a dead pipe before failing
    try {
      var n = 0L
      lines.toLocalIterator().forEachRemaining { r =>
        out.println(r.getString(0))
        n += 1
        if (n % 4096 == 0 && out.checkError())
          throw new java.io.IOException(
            "tippecanoe stopped reading its stdin (exited early?)")
      }
    } finally out.close()
    val rc = proc.waitFor()
    drainer.join(5000)
    require(rc == 0,
      s"tippecanoe exited with $rc\n${drained.toString.take(4096)}")
  }
}
