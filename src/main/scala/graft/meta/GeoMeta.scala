package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** GeoParquet `geo` footer metadata model (spec 1.0/1.1; written by the
  * reference in `core/common.py:1540-1657` create_geo_metadata, validated
  * in `core/validate.py:126-418`).
  *
  * `crs` is carried as raw PROJJSON (opaque JsonNode) exactly like the
  * reference does — we never interpret it beyond geographic/projected
  * classification (graft.geom.Proj).
  */
final case class GeoColumnMeta(
    encoding: String = "WKB",
    geometryTypes: Seq[String] = Seq.empty,
    bbox: Option[(Double, Double, Double, Double)] = None,
    crs: Option[JsonNode] = None,
    edges: Option[String] = None,
    orientation: Option[String] = None,
    /** covering.bbox: map of corner -> [column, field] paths. */
    coveringBbox: Option[String] = None,
    /** the raw `covering` node, for path-grammar validation. */
    coveringRaw: Option[JsonNode] = None)

final case class GeoMeta(
    version: String = "1.1.0",
    primaryColumn: String = "geometry",
    columns: Map[String, GeoColumnMeta] = Map.empty) {

  def primary: Option[GeoColumnMeta] = columns.get(primaryColumn)
}

object GeoMeta {
  val FooterKey = "geo"
  private val mapper = new ObjectMapper()

  /** Column-name heuristics for geometry detection when no metadata
    * exists (reference `core/streaming.py:197-242`).
    */
  val GeometryNameCandidates: Seq[String] =
    Seq("geometry", "geom", "the_geom", "wkb_geometry")

  val BboxNameCandidates: Seq[String] = Seq("bbox", "bounds", "bounding_box")

  /** Column-metadata key pairing a geometry column with the bbox covering
    * that describes it. Both columns carry the same opaque id, so
    * [[graft.plans.BboxPushdownRule]] can prune post-join two-geometry
    * plans by matching the FILTERED geometry to ITS covering — name
    * heuristics can't do that soundly. Spark persists field metadata in
    * the parquet footer schema, so the pairing survives write/read.
    */
  val GeoPairKey: String = "graft.geo.pair"

  /** Minimal PROJJSON-shaped node for an "EPSG:nnnn"-style CRS string —
    * enough for the spec's `crs.id` shape and our geographic/projected
    * classification.
    */
  def crsNode(crs: String): JsonNode = {
    val n = mapper.createObjectNode()
    val id = mapper.createObjectNode()
    val parts = crs.split(":")
    id.put("authority", if (parts.length > 1) parts(0) else "EPSG")
    val code = parts.last
    if (code.forall(_.isDigit)) id.put("code", code.toInt)
    else id.put("code", code)
    n.set[ObjectNode]("id", id)
    n
  }

  // ---- JSON codec -------------------------------------------------------

  def toJson(m: GeoMeta): String = {
    val root = mapper.createObjectNode()
    root.put("version", m.version)
    root.put("primary_column", m.primaryColumn)
    val cols = root.putObject("columns")
    m.columns.foreach { case (name, c) =>
      val cn = cols.putObject(name)
      cn.put("encoding", c.encoding)
      val types = cn.putArray("geometry_types")
      c.geometryTypes.foreach(types.add)
      c.bbox.foreach { case (x0, y0, x1, y1) =>
        val b = cn.putArray("bbox")
        b.add(x0); b.add(y0); b.add(x1); b.add(y1)
      }
      c.crs.foreach(cn.set[ObjectNode]("crs", _))
      c.edges.foreach(cn.put("edges", _))
      c.orientation.foreach(cn.put("orientation", _))
      c.coveringBbox.foreach { bboxCol =>
        val cov = cn.putObject("covering").putObject("bbox")
        Seq("xmin", "ymin", "xmax", "ymax").foreach { corner =>
          val arr = cov.putArray(corner)
          arr.add(bboxCol); arr.add(corner)
        }
      }
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(json: String): GeoMeta = {
    val root = mapper.readTree(json)
    val cols = Option(root.get("columns")).map { cn =>
      cn.properties().asScala.map { e =>
        val c = e.getValue
        val bbox = Option(c.get("bbox")).collect {
          case a: ArrayNode if a.size >= 4 =>
            (a.get(0).asDouble, a.get(1).asDouble, a.get(2).asDouble, a.get(3).asDouble)
        }
        val covering = for {
          cov <- Option(c.get("covering"))
          bb <- Option(cov.get("bbox"))
          xm <- Option(bb.get("xmin")) if xm.isArray && xm.size > 0
        } yield xm.get(0).asText
        e.getKey -> GeoColumnMeta(
          encoding = Option(c.get("encoding")).map(_.asText).getOrElse("WKB"),
          geometryTypes = Option(c.get("geometry_types"))
            .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty),
          bbox = bbox,
          crs = Option(c.get("crs")),
          edges = Option(c.get("edges")).map(_.asText),
          orientation = Option(c.get("orientation")).map(_.asText),
          coveringBbox = covering,
          coveringRaw = Option(c.get("covering")))
      }.toMap
    }.getOrElse(Map.empty[String, GeoColumnMeta])
    GeoMeta(
      version = Option(root.get("version")).map(_.asText).getOrElse("1.0.0"),
      primaryColumn = Option(root.get("primary_column")).map(_.asText)
        .getOrElse("geometry"),
      columns = cols)
  }
}
