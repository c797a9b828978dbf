package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom._

class GeomSpec extends AnyFunSuite {

  private def p(x: Double, y: Double) = Point(x, y)
  private def ring(pts: (Double, Double)*) = CoordSeq.of(pts: _*)
  private val unitSq = Polygon(Array(ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))))

  // ---- WKB --------------------------------------------------------------

  test("WKB round-trips all seven geometry types") {
    val geoms: Seq[Geom] = Seq(
      p(1.5, -2.25),
      LineString(ring((0, 0), (1, 1), (2, 0))),
      unitSq,
      Polygon(Array(
        ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)),
        ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))),
      MultiPoint(Array(p(1, 2), p(3, 4))),
      MultiLineString(Array(LineString(ring((0, 0), (1, 1))),
        LineString(ring((2, 2), (3, 3))))),
      MultiPolygon(Array(unitSq)),
      GeometryCollection(Array(p(9, 9), unitSq)))
    geoms.foreach { g =>
      assert(Wkb.read(Wkb.write(g)) == g, s"round trip failed for ${g.typeName}")
    }
  }

  test("WKB reads big-endian input") {
    // POINT(1 2) big-endian ISO
    val buf = java.nio.ByteBuffer.allocate(21)
    buf.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(Wkb.read(buf.array()) == p(1, 2))
  }

  test("WKB skips Z/M ordinates and EWKB SRID") {
    // ISO 1001 = PointZ
    val z = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte).putInt(1001).putDouble(1).putDouble(2).putDouble(99)
    assert(Wkb.read(z.array()) == p(1, 2))
    // EWKB Z flag + SRID flag
    val e = java.nio.ByteBuffer.allocate(33).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    e.put(1.toByte).putInt(0x80000000 | 0x20000000 | 1).putInt(4326)
      .putDouble(3).putDouble(4).putDouble(5)
    assert(Wkb.read(e.array()) == p(3, 4))
  }

  test("WKB rejects malformed input") {
    assert(Wkb.readOpt(Array[Byte](9, 9, 9)).isEmpty)
    assert(Wkb.readOpt(Array.emptyByteArray).isEmpty)
    // huge claimed ring size must not OOM
    val b = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(2).putInt(Int.MaxValue)
    assert(Wkb.readOpt(b.array()).isEmpty)
  }

  // ---- WKT --------------------------------------------------------------

  test("WKT round-trips and parses variants") {
    val cases = Seq(
      "POINT (30 10)",
      "LINESTRING (30 10, 10 30, 40 40)",
      "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
      "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
      "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
      "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
      "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
      "GEOMETRYCOLLECTION (POINT (40 10), LINESTRING (10 10, 20 20, 10 40))")
    cases.foreach { w =>
      assert(Wkt.print(Wkt.parse(w)) == w, s"round trip failed: $w")
    }
    // bare multipoint, Z dropped, EMPTY
    assert(Wkt.parse("MULTIPOINT (10 40, 40 30)") ==
      MultiPoint(Array(p(10, 40), p(40, 30))))
    assert(Wkt.parse("POINT Z (1 2 3)") == p(1, 2))
    assert(Wkt.parse("POLYGON EMPTY").isEmpty)
    assert(Wkt.parseOpt("NOT A GEOM").isEmpty)
  }

  // ---- GeoJSON ----------------------------------------------------------

  test("GeoJSON round-trips and handles Feature/FeatureCollection") {
    val g = GeoJson.parse("""{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}""")
    assert(g == unitSq)
    assert(GeoJson.parse(GeoJson.print(g)) == g)
    val viaFeature = GeoJson.parse(
      """{"type":"Feature","properties":{"a":1},"geometry":{"type":"Point","coordinates":[5,6]}}""")
    assert(viaFeature == p(5, 6))
    // FeatureCollection: first feature's geometry (reference rule)
    val viaFc = GeoJson.parse(
      """{"type":"FeatureCollection","features":[
        {"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{}},
        {"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{}}]}""")
    assert(viaFc == p(1, 2))
  }

  // ---- predicates / measures --------------------------------------------

  test("intersects: point/line/polygon matrix") {
    assert(Ops.intersects(p(0.5, 0.5), unitSq))
    assert(Ops.intersects(p(0, 0), unitSq)) // boundary counts
    assert(!Ops.intersects(p(2, 2), unitSq))
    val diag = LineString(ring((-1, -1), (2, 2)))
    assert(Ops.intersects(diag, unitSq))
    assert(Ops.intersects(diag, p(0.5, 0.5)))
    assert(!Ops.intersects(LineString(ring((2, 0), (3, 1))), unitSq))
    val far = Polygon(Array(ring((5, 5), (6, 5), (6, 6), (5, 6), (5, 5))))
    assert(!Ops.intersects(unitSq, far))
    val overlap = Polygon(Array(ring((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5))))
    assert(Ops.intersects(unitSq, overlap))
    // containment without edge crossing
    val inner = Polygon(Array(ring((0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25))))
    assert(Ops.intersects(unitSq, inner))
    assert(Ops.contains(unitSq, inner))
    assert(!Ops.contains(inner, unitSq))
    // touching at a corner counts
    val corner = Polygon(Array(ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))))
    assert(Ops.intersects(unitSq, corner))
  }

  test("contains is closed-boundary: edge and corner points ARE contained") {
    // q17's oracle verifies its cell join with an inclusive coordinate
    // range filter and trusts range-filter = st_contains; that identity
    // needs closed-boundary semantics (a point ON a cell edge is
    // contained by both adjacent cells, same as >= / <= matching both
    // ranges). Pin it so a semantics change breaks here, not in a
    // silent oracle drift.
    assert(Ops.contains(unitSq, p(0.5, 0.0)))  // edge midpoint
    assert(Ops.contains(unitSq, p(0.0, 0.0)))  // corner
    assert(Ops.contains(unitSq, p(1.0, 0.5)))  // opposite edge
    assert(!Ops.contains(unitSq, p(1.0 + 1e-12, 0.5))) // just outside
  }

  test("polygon hole semantics") {
    val withHole = Polygon(Array(
      ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)),
      ring((1, 1), (3, 1), (3, 3), (1, 3), (1, 1))))
    assert(Ops.pointInPolygon(0.5, 0.5, withHole))
    assert(!Ops.pointInPolygon(2, 2, withHole)) // inside the hole
    assert(Ops.pointInPolygon(1, 2, withHole)) // on hole boundary
  }

  test("distance") {
    assert(Ops.distance(p(0, 0), p(3, 4)) == 5.0)
    assert(Ops.distance(p(2, 0), unitSq) == 1.0)
    assert(Ops.distance(p(0.5, 0.5), unitSq) == 0.0)
    val seg = LineString(ring((0, 2), (2, 2)))
    assert(Ops.distance(seg, unitSq) == 1.0)
    assert(math.abs(Ops.distance(p(2, 2), unitSq) - math.sqrt(2)) < 1e-12)
  }

  test("centroid") {
    assert(Ops.centroid(unitSq) == p(0.5, 0.5))
    assert(Ops.centroid(p(3, 4)) == p(3, 4))
    assert(Ops.centroid(LineString(ring((0, 0), (2, 0)))) == p(1, 0))
    assert(Ops.centroid(MultiPoint(Array(p(0, 0), p(2, 2)))) == p(1, 1))
    // hole-aware: symmetric hole keeps centroid at center
    val withHole = Polygon(Array(
      ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0)),
      ring((1, 1), (1, 3), (3, 3), (3, 1), (1, 1)))) // opposite winding
    val c = Ops.centroid(withHole)
    assert(math.abs(c.x - 2) < 1e-12 && math.abs(c.y - 2) < 1e-12)
  }

  test("validity") {
    assert(Ops.isValid(unitSq))
    val open = Polygon(Array(ring((0, 0), (1, 0), (1, 1)))) // not closed, <4 pts
    assert(!Ops.isValid(open))
    val bowtie = Polygon(Array(ring((0, 0), (2, 2), (2, 0), (0, 2), (0, 0))))
    assert(!Ops.isValid(bowtie)) // self-intersecting
  }

  test("reducePrecision") {
    val g = Ops.reducePrecision(p(1.23456, -7.89123), 0.01)
    val pt = g.asInstanceOf[Point]
    assert(math.abs(pt.x - 1.23) < 1e-12 && math.abs(pt.y + 7.89) < 1e-12)
  }
}
