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
    root.putObject("assets").putObject("data")
      .put("href", assetHref)
      .put("type", "application/vnd.apache.parquet")
      .put("roles", "data")
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
