package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import graft.table.GeoTable

/** ArcGIS Feature Service source (reference `core/arcgis.py:422-712`):
  * driver-side REST pagination (`resultOffset`/`resultRecordCount`) with
  * server-side pushdown of `where`, bbox and field selection; GeoJSON
  * pages parsed into one table.
  *
  * The HTTP layer is pluggable (`fetch`) so the pagination/pushdown
  * logic is testable in a zero-egress environment; the default fetcher
  * uses java.net.http.
  */
object ArcGis {

  final case class Query(
      where: String = "1=1",
      outFields: Seq[String] = Seq("*"),
      bbox: Option[(Double, Double, Double, Double)] = None,
      pageSize: Int = 1000,
      maxFeatures: Option[Int] = None)

  type Fetcher = String => String

  /** Default driver-side HTTP GET (used outside tests). A `file:`
    * service URL replays a saved response body instead — offline replay
    * of a captured service page, and the zero-egress test path for the
    * CLI face (query params are ignored: a static snapshot is one
    * page, which terminates pagination by the short-page rule).
    */
  val httpFetch: Fetcher = { url =>
    if (url.startsWith("file:")) {
      val path = java.nio.file.Paths.get(java.net.URI.create(
        url.takeWhile(_ != '?').stripSuffix("/query")))
      new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
    } else {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      // non-2xx must not read as "empty page" (fetchAllPages separately
      // surfaces the 200-with-error-JSON ArcGIS convention)
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"arcgis fetch failed: HTTP ${resp.statusCode()} for $url: " +
            resp.body().take(300))
      resp.body()
    }
  }

  /** Build the page URL with server-side pushdown query params
    * (reference `fetch_features_page`, `core/arcgis.py:422-478`).
    */
  def pageUrl(serviceUrl: String, q: Query, offset: Int): String = {
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val base = new StringBuilder(
      s"${serviceUrl.stripSuffix("/")}/query?f=geojson&outSR=4326" +
        s"&where=${enc(q.where)}&outFields=${enc(q.outFields.mkString(","))}" +
        s"&resultOffset=$offset&resultRecordCount=${q.pageSize}")
    q.bbox.foreach { case (x0, y0, x1, y1) =>
      base.append(s"&geometry=$x0%2C$y0%2C$x1%2C$y1")
        .append("&geometryType=esriGeometryEnvelope&spatialRel=esriSpatialRelIntersects")
        .append("&inSR=4326")
    }
    base.toString
  }

  /** Page through the service until exhausted (reference
    * `fetch_all_features`, `core/arcgis.py:478-560`).
    */
  def fetchAllPages(serviceUrl: String, q: Query,
      fetch: Fetcher = httpFetch): Seq[String] = {
    val mapper = new ObjectMapper()
    val pages = scala.collection.mutable.ArrayBuffer[String]()
    var offset = 0
    var continue = true
    var fetched = 0
    var prevBody: String = null
    while (continue) {
      val body = fetch(pageUrl(serviceUrl, q, offset))
      // a fetcher that ignores resultOffset (the file: snapshot replay,
      // or a misbehaving server) returns the SAME page for every
      // offset; without this guard a snapshot of exactly pageSize
      // features keeps features == pageSize true forever — infinite
      // loop, unbounded driver memory. Distinct offsets can never
      // legitimately yield byte-identical bodies (feature ids repeat).
      if (body == prevBody) continue = false
      else {
        prevBody = body
        val root = mapper.readTree(body)
        // surface the service's error envelope (an ArcGIS convention:
        // HTTP 200 with {"error": {code, message}}) instead of letting
        // it read as an empty page — silently truncated data otherwise
        Option(root.get("error")).foreach { e =>
          throw new java.io.IOException(
            s"arcgis service error at offset $offset: " +
              Option(e.get("message")).map(_.asText).getOrElse(e.toString))
        }
        val features = Option(root.get("features"))
          .map(_.size()).getOrElse(0)
        if (features > 0) pages += body
        fetched += features
        val exceeded = Option(root.get("exceededTransferLimit")).exists(_.asBoolean)
        val hitMax = q.maxFeatures.exists(fetched >= _)
        continue = features > 0 && (exceeded || features == q.pageSize) && !hitMax
        // advance by what the server actually RETURNED, not what was
        // asked: services clamp resultRecordCount to their own
        // maxRecordCount, and a pageSize-stride over clamped pages
        // would silently skip every record between the clamp and the
        // stride (the reference's short-page offset correction,
        // `core/arcgis.py:548-552`)
        offset += features
      }
    }
    pages.toSeq
  }

  /** Full source: fetch pages driver-side, union into one GeoTable
    * (reference `arcgis_to_table`, `core/arcgis.py:712`).
    */
  def read(spark: SparkSession, serviceUrl: String, q: Query = Query(),
      fetch: Fetcher = httpFetch): GeoTable = {
    val pages = fetchAllPages(serviceUrl, q, fetch)
    require(pages.nonEmpty, s"no features returned from $serviceUrl")
    val tables = pages.map(p => GeoTable.fromGeoJsonString(spark, p).df)
    // pagination stops at the page that CROSSES maxFeatures, so the
    // last page can overshoot by up to pageSize-1 rows — trim to the
    // requested cap (the reference clamps `total` upfront,
    // `core/arcgis.py:39-40`)
    val unioned = q.maxFeatures.foldLeft(tables.reduce(_ unionByName _))(
      (d, m) => d.limit(m))
    // typed attribute columns, like the reference's extraction: infer
    // ONE schema across all pages from the properties JSON, then expand
    // (a page-local inference could disagree across pages)
    import org.apache.spark.sql.functions._
    val props = unioned.select(col("properties_json"))
      .as(org.apache.spark.sql.Encoders.STRING)
    val schema = spark.read.json(props).schema
    val expanded =
      if (schema.isEmpty) unioned.drop("properties_json")
      else unioned
        .withColumn("__props", from_json(col("properties_json"), schema))
        .select(schema.fieldNames.filterNot(_ == "geometry")
          .map(n => col(s"__props.`$n`").as(n)).toSeq :+ col("geometry"): _*)
    GeoTable.fromDataFrame(expanded, "geometry")
  }
}
