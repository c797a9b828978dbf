package graft.geom

import com.fasterxml.jackson.core.{JsonFactory, JsonGenerator, JsonParser, JsonToken}
import java.io.StringWriter
import scala.collection.mutable.ArrayBuffer

/** GeoJSON geometry codec (`ST_GeomFromGeoJSON` / `ST_AsGeoJSON` surface;
  * reference parses inline GeoJSON spatial filters — `core/extract.py:
  * 286-449` — and streams Feature JSON out — `core/geojson_stream.py:
  * 136-330`). Jackson-core streaming API (ships in /opt/spark/jars).
  */
object GeoJson {
  private val factory = new JsonFactory()

  // ---- printing ---------------------------------------------------------

  def print(g: Geom, precision: Int = -1): String = {
    val sw = new StringWriter()
    val gen = factory.createGenerator(sw)
    writeGeom(g, gen, precision)
    gen.close()
    sw.toString
  }

  private def writeCoord(gen: JsonGenerator, x: Double, y: Double, p: Int): Unit = {
    gen.writeStartArray()
    if (p >= 0) {
      gen.writeNumber(round(x, p)); gen.writeNumber(round(y, p))
    } else { gen.writeNumber(x); gen.writeNumber(y) }
    gen.writeEndArray()
  }

  private def round(d: Double, p: Int): Double = {
    val f = math.pow(10, p)
    math.rint(d * f) / f
  }

  private def writeSeq(gen: JsonGenerator, cs: CoordSeq, p: Int): Unit = {
    gen.writeStartArray()
    var i = 0
    while (i < cs.size) { writeCoord(gen, cs.xs(i), cs.ys(i), p); i += 1 }
    gen.writeEndArray()
  }

  private def writeGeom(g: Geom, gen: JsonGenerator, p: Int): Unit = {
    gen.writeStartObject()
    g match {
      case pt: Point =>
        gen.writeStringField("type", "Point")
        gen.writeFieldName("coordinates")
        if (pt.isEmpty) { gen.writeStartArray(); gen.writeEndArray() }
        else writeCoord(gen, pt.x, pt.y, p)
      case LineString(cs) =>
        gen.writeStringField("type", "LineString")
        gen.writeFieldName("coordinates"); writeSeq(gen, cs, p)
      case Polygon(rings) =>
        gen.writeStringField("type", "Polygon")
        gen.writeFieldName("coordinates")
        gen.writeStartArray(); rings.foreach(writeSeq(gen, _, p)); gen.writeEndArray()
      case MultiPoint(ps) =>
        gen.writeStringField("type", "MultiPoint")
        gen.writeFieldName("coordinates")
        gen.writeStartArray(); ps.foreach(pt => writeCoord(gen, pt.x, pt.y, p)); gen.writeEndArray()
      case MultiLineString(ls) =>
        gen.writeStringField("type", "MultiLineString")
        gen.writeFieldName("coordinates")
        gen.writeStartArray(); ls.foreach(l => writeSeq(gen, l.coords, p)); gen.writeEndArray()
      case MultiPolygon(polys) =>
        gen.writeStringField("type", "MultiPolygon")
        gen.writeFieldName("coordinates")
        gen.writeStartArray()
        polys.foreach { poly =>
          gen.writeStartArray(); poly.rings.foreach(writeSeq(gen, _, p)); gen.writeEndArray()
        }
        gen.writeEndArray()
      case GeometryCollection(gs) =>
        gen.writeStringField("type", "GeometryCollection")
        gen.writeFieldName("geometries")
        gen.writeStartArray(); gs.foreach(writeGeom(_, gen, p)); gen.writeEndArray()
    }
    gen.writeEndObject()
  }

  // ---- parsing ----------------------------------------------------------

  /** Parse a GeoJSON geometry, Feature (takes its geometry), or
    * FeatureCollection (takes the FIRST feature's geometry — the
    * reference's rule for spatial-filter input, `core/extract.py:286-449`).
    */
  def parse(json: String): Geom = {
    val p = factory.createParser(json)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, "not a JSON object")
      parseObject(p)
    } finally p.close()
  }

  def parseOpt(json: String): Option[Geom] =
    try Some(parse(json)) catch { case _: Exception => None }

  /** Parser positioned just after START_OBJECT. Depth-bounded like
    * Wkb.readGeom: nested "geometries"/"geometry"/"features" recursion
    * on hostile input would otherwise reach StackOverflowError, which
    * escapes parseOpt's Exception catch.
    */
  private def parseObject(p: JsonParser, depth: Int = 0): Geom = {
    require(depth <= Wkb.MaxNesting,
      s"GeoJSON nesting deeper than ${Wkb.MaxNesting}")
    var typ: String = null
    var coords: Any = null // nested ArrayBuffer structure of Double
    var geometries: ArrayBuffer[Geom] = null
    var geometry: Geom = null
    var features: Geom = null

    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "type" => typ = p.getText
        case "coordinates" => coords = parseNested(p)
        case "geometries" =>
          geometries = ArrayBuffer.empty
          require(p.currentToken() == JsonToken.START_ARRAY, "geometries not array")
          while (p.nextToken() != JsonToken.END_ARRAY) geometries += parseObject(p, depth + 1)
        case "geometry" =>
          if (p.currentToken() == JsonToken.START_OBJECT) geometry = parseObject(p, depth + 1)
          else p.skipChildren()
        case "features" =>
          require(p.currentToken() == JsonToken.START_ARRAY, "features not array")
          var first = true
          while (p.nextToken() != JsonToken.END_ARRAY) {
            if (first) { features = parseObject(p, depth + 1); first = false }
            else p.skipChildren()
          }
        case _ => p.skipChildren()
      }
    }

    typ match {
      case "Feature" =>
        // "geometry": null is explicitly legal (RFC 7946 §3.2) — an
        // unlocated feature. Map it to the empty geometry instead of
        // rejecting the document (which silently nulled VALID siblings
        // through the TRY surface).
        if (geometry != null) geometry
        else GeometryCollection(Array.empty)
      case "FeatureCollection" =>
        require(features != null, "empty FeatureCollection")
        features
      case "GeometryCollection" =>
        GeometryCollection(Option(geometries).map(_.toArray).getOrElse(Array.empty))
      case t => build(t, coords)
    }
  }

  /** Parses nested arrays of numbers into ArrayBuffer[Any].
    * Depth-bounded for the same reason as parseObject (coordinates
    * arrays legitimately nest 4 deep at most — MultiPolygon).
    */
  private def parseNested(p: JsonParser, depth: Int = 0): Any = p.currentToken() match {
    case JsonToken.START_ARRAY =>
      require(depth <= Wkb.MaxNesting,
        s"GeoJSON coordinate nesting deeper than ${Wkb.MaxNesting}")
      val buf = ArrayBuffer[Any]()
      while (p.nextToken() != JsonToken.END_ARRAY) buf += parseNested(p, depth + 1)
      buf
    case JsonToken.VALUE_NUMBER_FLOAT | JsonToken.VALUE_NUMBER_INT =>
      p.getDoubleValue
    case t => throw new IllegalArgumentException(s"unexpected token $t in coordinates")
  }

  private def toCoord(a: Any): (Double, Double) = {
    val b = a.asInstanceOf[ArrayBuffer[Any]]
    (b(0).asInstanceOf[Double], b(1).asInstanceOf[Double])
  }

  private def toSeq(a: Any): CoordSeq = {
    val b = a.asInstanceOf[ArrayBuffer[Any]]
    val xs = new Array[Double](b.size); val ys = new Array[Double](b.size)
    var i = 0
    while (i < b.size) { val (x, y) = toCoord(b(i)); xs(i) = x; ys(i) = y; i += 1 }
    CoordSeq(xs, ys)
  }

  private def build(typ: String, coords: Any): Geom = typ match {
    case "Point" =>
      val b = coords.asInstanceOf[ArrayBuffer[Any]]
      if (b.isEmpty) Point(Double.NaN, Double.NaN)
      else { val (x, y) = toCoord(coords); Point(x, y) }
    case "LineString" => LineString(toSeq(coords))
    case "Polygon" =>
      Polygon(coords.asInstanceOf[ArrayBuffer[Any]].map(toSeq).toArray)
    case "MultiPoint" =>
      MultiPoint(coords.asInstanceOf[ArrayBuffer[Any]].map { c =>
        val (x, y) = toCoord(c); Point(x, y)
      }.toArray)
    case "MultiLineString" =>
      MultiLineString(coords.asInstanceOf[ArrayBuffer[Any]]
        .map(c => LineString(toSeq(c))).toArray)
    case "MultiPolygon" =>
      MultiPolygon(coords.asInstanceOf[ArrayBuffer[Any]]
        .map(pc => Polygon(pc.asInstanceOf[ArrayBuffer[Any]].map(toSeq).toArray))
        .toArray)
    case t => throw new IllegalArgumentException(s"unknown GeoJSON type '$t'")
  }
}
