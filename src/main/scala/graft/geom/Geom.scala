package graft.geom

/** Minimal planar (XY) geometry model.
  *
  * Mirrors the seven WKB geometry types the reference engine handles
  * (cf. reference `core/inspect_utils.py:432-516` hand-rolled WKB parser,
  * `core/common.py:1989-2042` geometry-type profile). Z/M coordinates are
  * accepted on parse and dropped (reference behaves the same way: DuckDB
  * spatial works in XY for all ops it uses).
  *
  * All coordinates are raw doubles; CRS is carried out-of-band in table
  * metadata (see graft.meta.GeoMetadata), exactly like GeoParquet.
  */
sealed trait Geom extends Serializable {
  def typeName: String

  /** (xmin, ymin, xmax, ymax); NaNs if empty. */
  def envelope: (Double, Double, Double, Double) = {
    var x0 = Double.PositiveInfinity; var y0 = Double.PositiveInfinity
    var x1 = Double.NegativeInfinity; var y1 = Double.NegativeInfinity
    foreachCoord { (x, y) =>
      if (x < x0) x0 = x; if (x > x1) x1 = x
      if (y < y0) y0 = y; if (y > y1) y1 = y
    }
    if (x0 > x1) (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else (x0, y0, x1, y1)
  }

  def foreachCoord(f: (Double, Double) => Unit): Unit

  def isEmpty: Boolean

  def numPoints: Int = { var n = 0; foreachCoord((_, _) => n += 1); n }

  /** Map every coordinate (e.g. reprojection, precision reduction). */
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom
}

/** Packed coordinate sequence: xs(i), ys(i). */
final case class CoordSeq(xs: Array[Double], ys: Array[Double]) {
  def size: Int = xs.length
  def foreach(f: (Double, Double) => Unit): Unit = {
    var i = 0
    while (i < xs.length) { f(xs(i), ys(i)); i += 1 }
  }
  def map(f: (Double, Double) => (Double, Double)): CoordSeq = {
    val nx = new Array[Double](xs.length); val ny = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) {
      val (a, b) = f(xs(i), ys(i)); nx(i) = a; ny(i) = b; i += 1
    }
    CoordSeq(nx, ny)
  }
  override def equals(o: Any): Boolean = o match {
    case CoordSeq(oxs, oys) =>
      java.util.Arrays.equals(xs, oxs) && java.util.Arrays.equals(ys, oys)
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(xs) + java.util.Arrays.hashCode(ys)
}

object CoordSeq {
  val empty: CoordSeq = CoordSeq(Array.emptyDoubleArray, Array.emptyDoubleArray)
  def of(pts: (Double, Double)*): CoordSeq =
    CoordSeq(pts.map(_._1).toArray, pts.map(_._2).toArray)
}

final case class Point(x: Double, y: Double) extends Geom {
  def typeName = "POINT"
  def isEmpty: Boolean = x.isNaN && y.isNaN
  def foreachCoord(f: (Double, Double) => Unit): Unit = if (!isEmpty) f(x, y)
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    if (isEmpty) this else { val (a, b) = f(x, y); Point(a, b) }
}

final case class LineString(coords: CoordSeq) extends Geom {
  def typeName = "LINESTRING"
  def isEmpty: Boolean = coords.size == 0
  def foreachCoord(f: (Double, Double) => Unit): Unit = coords.foreach(f)
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    LineString(coords.map(f))
}

/** rings(0) = exterior shell; rest are holes. Rings are closed
  * (first == last point) per WKB convention.
  */
final case class Polygon(rings: Array[CoordSeq]) extends Geom {
  def typeName = "POLYGON"
  def isEmpty: Boolean = rings.isEmpty
  def shell: CoordSeq = rings(0)
  def foreachCoord(f: (Double, Double) => Unit): Unit =
    rings.foreach(_.foreach(f))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    Polygon(rings.map(_.map(f)))
  override def equals(o: Any): Boolean = o match {
    case Polygon(or) => rings.toSeq == or.toSeq
    case _ => false
  }
  override def hashCode: Int = rings.toSeq.hashCode
}

final case class MultiPoint(points: Array[Point]) extends Geom {
  def typeName = "MULTIPOINT"
  def isEmpty: Boolean = points.isEmpty
  def foreachCoord(f: (Double, Double) => Unit): Unit =
    points.foreach(_.foreachCoord(f))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    MultiPoint(points.map(p => p.mapCoords(f).asInstanceOf[Point]))
  override def equals(o: Any): Boolean = o match {
    case MultiPoint(op) => points.toSeq == op.toSeq
    case _ => false
  }
  override def hashCode: Int = points.toSeq.hashCode
}

final case class MultiLineString(lines: Array[LineString]) extends Geom {
  def typeName = "MULTILINESTRING"
  def isEmpty: Boolean = lines.isEmpty
  def foreachCoord(f: (Double, Double) => Unit): Unit =
    lines.foreach(_.foreachCoord(f))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    MultiLineString(lines.map(l => l.mapCoords(f).asInstanceOf[LineString]))
  override def equals(o: Any): Boolean = o match {
    case MultiLineString(ol) => lines.toSeq == ol.toSeq
    case _ => false
  }
  override def hashCode: Int = lines.toSeq.hashCode
}

final case class MultiPolygon(polys: Array[Polygon]) extends Geom {
  def typeName = "MULTIPOLYGON"
  def isEmpty: Boolean = polys.isEmpty
  def foreachCoord(f: (Double, Double) => Unit): Unit =
    polys.foreach(_.foreachCoord(f))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    MultiPolygon(polys.map(p => p.mapCoords(f).asInstanceOf[Polygon]))
  override def equals(o: Any): Boolean = o match {
    case MultiPolygon(op) => polys.toSeq == op.toSeq
    case _ => false
  }
  override def hashCode: Int = polys.toSeq.hashCode
}

final case class GeometryCollection(geoms: Array[Geom]) extends Geom {
  def typeName = "GEOMETRYCOLLECTION"
  def isEmpty: Boolean = geoms.isEmpty
  def foreachCoord(f: (Double, Double) => Unit): Unit =
    geoms.foreach(_.foreachCoord(f))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom =
    GeometryCollection(geoms.map(_.mapCoords(f)))
  override def equals(o: Any): Boolean = o match {
    case GeometryCollection(og) => geoms.toSeq == og.toSeq
    case _ => false
  }
  override def hashCode: Int = geoms.toSeq.hashCode
}
