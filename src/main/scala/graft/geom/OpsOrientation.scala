package graft.geom

/** Ring-orientation helpers for the validate suite (reference
  * `core/validate.py:682-703` orientation-vs-data check).
  */
object Orientation {

  /** Signed shoelace area of a closed ring: > 0 when counterclockwise. */
  def signedArea(r: CoordSeq): Double = {
    var a = 0.0
    var i = 0
    while (i < r.size - 1) {
      a += r.xs(i) * r.ys(i + 1) - r.xs(i + 1) * r.ys(i)
      i += 1
    }
    a / 2.0
  }

  /** Some(true) if every exterior ring is counterclockwise; None for
    * non-polygonal geometry (the spec's orientation only constrains
    * polygons).
    */
  def exteriorsCcw(g: Geom): Option[Boolean] = g match {
    case p: Polygon if !p.isEmpty => Some(signedArea(p.shell) > 0)
    case mp: MultiPolygon if !mp.isEmpty =>
      // an empty member has no rings and constrains nothing — it must
      // not count as a CCW violation
      Some(mp.polys.filter(!_.isEmpty).forall(p => signedArea(p.shell) > 0))
    case gc: GeometryCollection =>
      val rs = gc.geoms.flatMap(exteriorsCcw)
      if (rs.isEmpty) None else Some(rs.forall(identity))
    case _ => None
  }
}
