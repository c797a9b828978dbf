package graft.geom

import scala.collection.mutable.ArrayBuffer

/** WKT parser/printer (`ST_GeomFromText` / `ST_AsText` surface,
  * reference `core/convert.py:374-463` WKT CSV ingestion and
  * `core/inspect_utils.py:432-516` WKB→WKT preview).
  * Z/M suffixes accepted and dropped; EMPTY supported.
  */
object Wkt {

  def print(g: Geom): String = g match {
    case p: Point =>
      if (p.isEmpty) "POINT EMPTY" else s"POINT (${num(p.x)} ${num(p.y)})"
    case LineString(cs) =>
      if (cs.size == 0) "LINESTRING EMPTY" else s"LINESTRING ${seq(cs)}"
    case Polygon(rings) =>
      if (rings.isEmpty) "POLYGON EMPTY"
      else s"POLYGON (${rings.map(seq).mkString(", ")})"
    case MultiPoint(ps) =>
      if (ps.isEmpty) "MULTIPOINT EMPTY"
      else s"MULTIPOINT (${ps.map(p => s"(${num(p.x)} ${num(p.y)})").mkString(", ")})"
    case MultiLineString(ls) =>
      if (ls.isEmpty) "MULTILINESTRING EMPTY"
      else s"MULTILINESTRING (${ls.map(l => seq(l.coords)).mkString(", ")})"
    case MultiPolygon(ps) =>
      if (ps.isEmpty) "MULTIPOLYGON EMPTY"
      else s"MULTIPOLYGON (${ps.map(p => s"(${p.rings.map(seq).mkString(", ")})").mkString(", ")})"
    case GeometryCollection(gs) =>
      if (gs.isEmpty) "GEOMETRYCOLLECTION EMPTY"
      else s"GEOMETRYCOLLECTION (${gs.map(print).mkString(", ")})"
  }

  private def seq(cs: CoordSeq): String = {
    val sb = new StringBuilder("(")
    var i = 0
    while (i < cs.size) {
      if (i > 0) sb.append(", ")
      sb.append(num(cs.xs(i))).append(' ').append(num(cs.ys(i)))
      i += 1
    }
    sb.append(")").toString
  }

  /** Integral doubles print without trailing ".0", and non-integral
    * ones as plain decimals (matches DuckDB/PostGIS ST_AsText): Java's
    * Double.toString emits scientific notation for |x| < 1e-3 and
    * >= 1e7 ("1.0E-5"), which strict WKT consumers reject and
    * reference-output diffs flag. BigDecimal.valueOf keeps the same
    * shortest-round-trip digits, just positionally.
    */
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) d.toString // BigDecimal would throw
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString

  def parse(s: String): Geom = {
    val p = new WktParser(s)
    val g = p.parseGeom()
    // trailing garbage after a complete geometry is malformed input,
    // not a shorter valid geometry — "POINT (1 2) junk" must fail (the
    // TRY surface otherwise silently accepts truncated data)
    p.requireFullyConsumed()
    g
  }

  def parseOpt(s: String): Option[Geom] =
    try Some(parse(s)) catch { case _: Exception => None }

  private final class WktParser(s: String) {
    private var pos = 0

    private def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def word(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetter)) pos += 1
      s.substring(start, pos).toUpperCase
    }

    private def peekWordIs(w: String): Boolean = {
      skipWs()
      s.regionMatches(true, pos, w, 0, w.length)
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c)
        throw new IllegalArgumentException(
          s"WKT parse error at $pos in '$s': expected '$c'")
      pos += 1
    }

    private def tryChar(c: Char): Boolean = {
      skipWs()
      if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }

    private def number(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      if (pos == start)
        throw new IllegalArgumentException(s"WKT parse error at $pos in '$s'")
      s.substring(start, pos).toDouble
    }

    /** number of ordinates per coordinate beyond XY (Z/M markers) */
    private var extraDims = 0

    private def dimTag(): Unit = {
      skipWs()
      // reset first: extraDims is parser state, and without the reset a
      // Z/M tag on one GEOMETRYCOLLECTION member leaked into untagged
      // SIBLING members, making valid mixed collections fail to parse
      extraDims = 0
      if (peekWordIs("ZM")) { pos += 2; extraDims = 2 }
      else if (peekWordIs("Z") && !peekWordIs("ZM")) {
        // single letter followed by non-letter
        if (pos + 1 >= s.length || !s.charAt(pos + 1).isLetter) { pos += 1; extraDims = 1 }
      } else if (peekWordIs("M")) {
        if (pos + 1 >= s.length || !s.charAt(pos + 1).isLetter) { pos += 1; extraDims = 1 }
      }
    }

    def requireFullyConsumed(): Unit = {
      skipWs()
      if (pos < s.length)
        throw new IllegalArgumentException(
          s"WKT parse error: trailing input at $pos in '$s'")
    }

    private def coord(): (Double, Double) = {
      val x = number(); val y = number()
      var i = 0
      while (i < extraDims) { number(); i += 1 }
      (x, y)
    }

    private def coordSeq(): CoordSeq = {
      expect('(')
      val xs = ArrayBuffer[Double](); val ys = ArrayBuffer[Double]()
      var cont = true
      while (cont) {
        val (x, y) = coord(); xs += x; ys += y
        cont = tryChar(',')
      }
      expect(')')
      CoordSeq(xs.toArray, ys.toArray)
    }

    private def isEmptyTag(): Boolean = {
      skipWs()
      if (peekWordIs("EMPTY")) { pos += 5; true } else false
    }

    private var depth = 0

    def parseGeom(): Geom = {
      val t = word()
      dimTag()
      val g = t match {
        case "POINT" =>
          if (isEmptyTag()) Point(Double.NaN, Double.NaN)
          else { expect('('); val (x, y) = coord(); expect(')'); Point(x, y) }
        case "LINESTRING" =>
          if (isEmptyTag()) LineString(CoordSeq.empty) else LineString(coordSeq())
        case "POLYGON" =>
          if (isEmptyTag()) Polygon(Array.empty)
          else {
            expect('(')
            val rings = ArrayBuffer[CoordSeq]()
            var cont = true
            while (cont) { rings += coordSeq(); cont = tryChar(',') }
            expect(')')
            Polygon(rings.toArray)
          }
        case "MULTIPOINT" =>
          if (isEmptyTag()) MultiPoint(Array.empty)
          else {
            expect('(')
            val pts = ArrayBuffer[Point]()
            var cont = true
            while (cont) {
              // both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
              if (tryChar('(')) {
                val (x, y) = coord(); expect(')'); pts += Point(x, y)
              } else { val (x, y) = coord(); pts += Point(x, y) }
              cont = tryChar(',')
            }
            expect(')')
            MultiPoint(pts.toArray)
          }
        case "MULTILINESTRING" =>
          if (isEmptyTag()) MultiLineString(Array.empty)
          else {
            expect('(')
            val ls = ArrayBuffer[LineString]()
            var cont = true
            while (cont) { ls += LineString(coordSeq()); cont = tryChar(',') }
            expect(')')
            MultiLineString(ls.toArray)
          }
        case "MULTIPOLYGON" =>
          if (isEmptyTag()) MultiPolygon(Array.empty)
          else {
            expect('(')
            val ps = ArrayBuffer[Polygon]()
            var cont = true
            while (cont) {
              expect('(')
              val rings = ArrayBuffer[CoordSeq]()
              var rc = true
              while (rc) { rings += coordSeq(); rc = tryChar(',') }
              expect(')')
              ps += Polygon(rings.toArray)
              cont = tryChar(',')
            }
            expect(')')
            MultiPolygon(ps.toArray)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmptyTag()) GeometryCollection(Array.empty)
          else {
            // bounded like Wkb.readGeom: unbounded recursion on a
            // hostile "GEOMETRYCOLLECTION("*k string would reach
            // StackOverflowError, an Error parseOpt's catch misses
            depth += 1
            require(depth <= Wkb.MaxNesting,
              s"WKT nesting deeper than ${Wkb.MaxNesting}")
            expect('(')
            val gs = ArrayBuffer[Geom]()
            var cont = true
            while (cont) { gs += parseGeom(); cont = tryChar(',') }
            expect(')')
            depth -= 1
            GeometryCollection(gs.toArray)
          }
        case other =>
          throw new IllegalArgumentException(s"unknown WKT type '$other'")
      }
      g
    }
  }
}
