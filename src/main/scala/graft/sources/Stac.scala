package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.checks.Checks
import graft.meta.Footer

/** STAC publisher (reference `core/stac.py:309-636`): generate STAC
  * Item / Collection JSON from GeoParquet file metadata — footer-only,
  * driver-side.
  */
object Stac {
  private val mapper = new ObjectMapper()

  /** STAC Item for one GeoParquet dataset. */
  def item(path: String, itemId: String, assetHref: String,
      datetime: String = "1970-01-01T00:00:00Z"): String = {
    val s = Checks.inspect(path)
    val bbox = s.declaredBbox
      .orElse(Footer.bboxFromStats(path, "bbox"))
      .getOrElse((-180.0, -90.0, 180.0, 90.0))
    val (x0, y0, x1, y1) = bbox
    val root = mapper.createObjectNode()
    root.put("type", "Feature")
    root.put("stac_version", "1.0.0")
    root.put("id", itemId)
    val geom = root.putObject("geometry")
    geom.put("type", "Polygon")
    val rings = geom.putArray("coordinates").addArray()
    Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)).foreach { case (x, y) =>
      val c = rings.addArray(); c.add(x); c.add(y)
    }
    val bb = root.putArray("bbox")
    bb.add(x0); bb.add(y0); bb.add(x1); bb.add(y1)
    val props = root.putObject("properties")
    props.put("datetime", datetime)
    props.put("table:row_count", s.rowCount)
    props.put("table:columns", s.columns.mkString(","))
    s.geoVersion.foreach(v => props.put("geoparquet:version", v))
    val asset = root.putObject("assets").putObject("data")
    asset.put("href", assetHref)
    asset.put("type", "application/vnd.apache.parquet")
    // roles is a LIST per the STAC asset spec (the reference's data-role
    // check iterates it as one, `core/stac_check.py:89`)
    asset.putArray("roles").add("data")
    root.putArray("links")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** STAC Collection wrapping one or more item bboxes. */
  def collection(collectionId: String, description: String,
      itemBboxes: Seq[(Double, Double, Double, Double)]): String = {
    val root = mapper.createObjectNode()
    root.put("type", "Collection")
    root.put("stac_version", "1.0.0")
    root.put("id", collectionId)
    root.put("description", description)
    root.put("license", "proprietary")
    require(itemBboxes.nonEmpty,
      "STAC collection needs at least one item bbox for its spatial extent")
    val extent = root.putObject("extent")
    val spatial = extent.putObject("spatial").putArray("bbox").addArray()
    val x0 = itemBboxes.map(_._1).min; val y0 = itemBboxes.map(_._2).min
    val x1 = itemBboxes.map(_._3).max; val y1 = itemBboxes.map(_._4).max
    spatial.add(x0); spatial.add(y0); spatial.add(x1); spatial.add(y1)
    extent.putObject("temporal").putArray("interval").addArray()
      .addNull().addNull()
    root.putArray("links")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Full STAC file check (reference `core/stac_check.py:52-170`
    * validate_stac_file): required fields per type, local asset-href
    * resolution relative to the file's directory, media-type and
    * data-role best practices, self-link recommendation, and Item
    * geometry/bbox consistency. Returns (errors, warnings) — the
    * reference's valid flag is `errors.isEmpty`.
    */
  def checkFile(path: String): (Seq[String], Seq[String]) = {
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    val warns = scala.collection.mutable.ArrayBuffer[String]()
    val root =
      try mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path)))
      catch { case e: Exception =>
        return (Seq(s"cannot load STAC JSON: ${e.getMessage}"), Seq.empty)
      }
    val dir = Option(java.nio.file.Paths.get(path).getParent)
      .getOrElse(java.nio.file.Paths.get("."))
    val stacType = Option(root.get("type")).map(_.asText).getOrElse("")
    stacType match {
      case "Feature" =>
        Seq("id", "geometry", "bbox", "properties", "assets", "links")
          .filterNot(root.has).foreach(f =>
            errs += s"Missing required field: $f")
        if (root.has("properties") && !root.get("properties").has("datetime"))
          warns += "Missing 'datetime' in properties"
      case "Collection" =>
        Seq("id", "description", "extent", "links")
          .filterNot(root.has).foreach(f =>
            errs += s"Missing required field: $f")
      case other =>
        errs += s"type must be Feature or Collection, got '$other'"
    }
    // assets: local href resolution + best practices
    Option(root.get("assets")).filter(_.isObject).foreach { assets =>
      val it = assets.fields()
      var hasDataRole = false
      while (it.hasNext) {
        val e = it.next()
        val href = Option(e.getValue.get("href")).map(_.asText).getOrElse("")
        if (!Seq("http://", "https://", "s3://").exists(href.startsWith) &&
            href.nonEmpty && !java.nio.file.Files.exists(dir.resolve(href)))
          warns += s"Asset '${e.getKey}' href does not resolve locally: $href"
        if (!e.getValue.has("type"))
          warns += s"Asset '${e.getKey}' missing media type"
        val roles = Option(e.getValue.get("roles")).toSeq
          .flatMap(r => (0 until r.size).map(r.get(_).asText))
        if (roles.contains("data")) hasDataRole = true
      }
      if (!hasDataRole) warns += "No asset with 'data' role found"
    }
    // links: self recommended
    Option(root.get("links")).filter(_.isArray).foreach { links =>
      val rels = (0 until links.size)
        .flatMap(i => Option(links.get(i).get("rel")).map(_.asText))
      if (!rels.contains("self")) warns += "No 'self' link found (recommended)"
    }
    // Item geometry/bbox consistency
    if (stacType == "Feature" && root.has("geometry") && root.has("bbox")) {
      val bb = root.get("bbox")
      if (bb.size != 4 && bb.size != 6)
        errs += s"Invalid bbox length: ${bb.size} (expected 4 or 6)"
      else if (bb.size == 4) {
        val Seq(x0, y0, x1, y1) = (0 until 4).map(bb.get(_).asDouble)
        // NOTE: west > east is spec-LEGAL for antimeridian-crossing
        // boxes (RFC 7946 §5.2); flagging it mirrors the reference's
        // own check (`core/stac_check.py:123-127`), which we match for
        // result parity — a Fiji-spanning Item fails both tools alike
        if (x0 > x1 || y0 > y1)
          errs += s"Invalid bbox ordering: [$x0, $y0, $x1, $y1]"
      }
    }
    (errs.toSeq, warns.toSeq)
  }

  /** Basic STAC validation (reference `core/stac_check.py`). */
  def validateItem(json: String): Seq[String] = {
    val root = mapper.readTree(json)
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    if (Option(root.get("type")).map(_.asText).forall(_ != "Feature"))
      errs += "type must be Feature"
    Seq("stac_version", "id", "geometry", "bbox", "properties", "assets")
      .foreach { k =>
        if (!root.has(k)) errs += s"missing $k"
      }
    if (root.has("properties") && !root.get("properties").has("datetime"))
      errs += "properties.datetime required"
    errs.toSeq
  }
}
