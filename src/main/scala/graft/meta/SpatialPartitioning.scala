package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geom.{H3, SpatialKey}
import graft.ops.KdTree

/** Spatial-partitioning descriptor recorded at write time by the
  * partition-by-quadkey / H3 / KD-tree writers and consumed at read time
  * by `GeoTable.filterBbox` to derive a PARTITION-COLUMN predicate for a
  * query bbox, so Spark prunes directories — not just row groups. The
  * reference gets directory elimination implicitly because its users
  * hand DuckDB `hive_partitioning=true` plus quadkey-prefix WHERE
  * clauses (`core/partition_by_quadkey.py:27-226`,
  * `docs/concepts/best-practices.md` spatial-query guidance); here the
  * engine derives the predicate itself. At 100 TB this is the
  * difference between listing a handful of directories and opening ten
  * thousand footers.
  *
  * Soundness: the partition key is computed from an ANCHOR point of each
  * geometry (envelope midpoint for quadkey, centroid for H3/KD-tree).
  * `filterBbox` keeps rows whose ENVELOPE intersects the query box, and
  * a big geometry's envelope can intersect the box while its anchor sits
  * in a far-away partition. The writers therefore record the dataset's
  * maximum anchor reach — the largest distance from any row's anchor to
  * its envelope edge, per axis — and the reader expands the query box by
  * that reach before computing the covering key set. Any row whose
  * envelope intersects the query box has its anchor inside the expanded
  * box, so every partition that can hold a matching row is kept.
  */
final case class SpatialPartitioning(
    scheme: String, // "quadkey" | "h3" | "kdtree"
    column: String, // hive partition column name
    level: Int = 0, // quadkey: tile zoom of the partition value
    resolution: Int = 0, // h3
    splits: Option[KdTree.Node] = None, // kdtree
    maxHalfW: Double = 0.0, // anchor reach, x axis (table CRS units)
    maxHalfH: Double = 0.0) // anchor reach, y axis

object SpatialPartitioning {
  /** Parquet key-value footer key — a graft extension alongside "geo"
    * (kept out of the `geo` node so spec validators see pure GeoParquet).
    */
  val FooterKey = "graft:partitioning"

  /** Covering key-set size above which pruning is skipped: an IN list of
    * thousands of directories saves nothing over listing them all.
    */
  val MaxKeys = 4096

  /** H3 covering sample-grid cap — bounds driver-side planning work. */
  val MaxSamples = 250000

  private val mapper = new ObjectMapper()

  // ---- JSON codec ---------------------------------------------------------

  private def nodeToJson(n: KdTree.Node, o: ObjectNode): Unit = {
    o.put("s", n.split)
    n.left.foreach(l => nodeToJson(l, o.putObject("l")))
    n.right.foreach(r => nodeToJson(r, o.putObject("r")))
  }

  private def nodeFromJson(j: JsonNode): KdTree.Node =
    KdTree.Node(j.get("s").asDouble,
      Option(j.get("l")).map(nodeFromJson),
      Option(j.get("r")).map(nodeFromJson))

  def toJson(sp: SpatialPartitioning): String = {
    val o = mapper.createObjectNode()
    o.put("scheme", sp.scheme)
    o.put("column", sp.column)
    if (sp.level != 0) o.put("level", sp.level)
    if (sp.resolution != 0) o.put("resolution", sp.resolution)
    o.put("max_half_w", sp.maxHalfW)
    o.put("max_half_h", sp.maxHalfH)
    sp.splits.foreach(n => nodeToJson(n, o.putObject("splits")))
    mapper.writeValueAsString(o)
  }

  /** None on any parse problem: stale/foreign metadata must degrade to
    * "no pruning", never fail the read.
    */
  def fromJsonOpt(json: String): Option[SpatialPartitioning] =
    try {
      val r = mapper.readTree(json)
      val scheme = r.get("scheme").asText
      val level = Option(r.get("level")).map(_.asInt).getOrElse(0)
      val resolution = Option(r.get("resolution")).map(_.asInt).getOrElse(0)
      // range-validate what the covering math later trusts: a foreign
      // footer with a negative quadkey level reaches `1L << zoom` and
      // throws out of filterBbox instead of degrading to "no pruning"
      if (!Seq("quadkey", "h3", "kdtree").contains(scheme) ||
          level < 0 || level > 30 || resolution < 0 || resolution > 15) None
      else Some(SpatialPartitioning(
        scheme = scheme,
        column = r.get("column").asText,
        level = level,
        resolution = resolution,
        splits = Option(r.get("splits")).map(nodeFromJson),
        maxHalfW = Option(r.get("max_half_w")).map(_.asDouble).getOrElse(0.0),
        maxHalfH = Option(r.get("max_half_h")).map(_.asDouble).getOrElse(0.0)))
    } catch { case _: Exception => None }

  // ---- covering key sets ----------------------------------------------------

  /** Quadkey strings at `level` of every WebMercator tile intersecting
    * the (already reach-expanded) box. Exact: `tile()` is monotone in
    * lon / anti-monotone in lat, so the tile RANGE of the box corners is
    * precisely the set of tiles whose cell can contain an in-box anchor.
    */
  private[graft] def quadkeyCovering(level: Int, ex0: Double, ey0: Double,
      ex1: Double, ey1: Double): Option[Seq[String]] = {
    val (xt0, yt0) = SpatialKey.tile(ex0, ey1, level) // top-left
    val (xt1, yt1) = SpatialKey.tile(ex1, ey0, level) // bottom-right
    val n = (xt1 - xt0 + 1) * (yt1 - yt0 + 1)
    if (n <= 0 || n > MaxKeys) None
    else Some(for { xt <- xt0 to xt1; yt <- yt0 to yt1 }
      yield SpatialKey.quadkeyOfTile(xt, yt, level))
  }

  /** Average hexagon edge length in km per H3 resolution (published H3
    * table) — only used with wide safety factors below, so the exact
    * revision of the table does not matter.
    */
  private val H3AvgEdgeKm: Array[Double] = Array(
    1107.712591, 418.6760055, 158.2446558, 59.81085794, 22.6063794,
    8.544408276, 3.229482772, 1.220629759, 0.461354684, 0.174375668,
    0.065907807, 0.024910561, 0.009415526, 0.003559893, 0.001348575,
    0.000509713)

  private val EarthRadiusKm = 6371.0088
  private val KmPerDegLow = 108.0 // a degree of arc is always > 108 km

  /** Exact (up to float error) great-circle distance in km from a point
    * to a lat/lng-aligned box on the sphere. The nearest box point for
    * an outside-longitude point lies on one of the two meridian-arc
    * edges; for each arc the distance-critical latitude is the foot of
    * the cross-track perpendicular (tan φ* = tan φp / cos Δλ), valid on
    * the near half (cos Δλ > 0) — otherwise, and when φ* falls outside
    * the arc, the distance is unimodal and an endpoint wins. No
    * directional approximations, so the covering filter below never
    * over- OR under-estimates past float error.
    */
  private[graft] def distToBoxKm(lat: Double, lng: Double, bx0: Double,
      by0: Double, bx1: Double, by1: Double): Double = {
    def wrapSep(a: Double, b: Double): Double = {
      val d = math.abs(a - b) % 360.0
      math.min(d, 360.0 - d)
    }
    val lngInside =
      (lng >= bx0 && lng <= bx1) ||
        wrapSep(lng, bx0) + wrapSep(lng, bx1) <= (bx1 - bx0) + 1e-9
    if (lngInside) {
      val dLat = math.max(0.0, math.max(by0 - lat, lat - by1))
      return dLat * math.Pi / 180.0 * EarthRadiusKm
    }
    val f = math.toRadians(lat)
    def hav(lat2: Double, lng2: Double): Double = {
      val f2 = math.toRadians(lat2)
      val dl = math.toRadians(wrapSep(lng, lng2))
      val a = math.sin((f2 - f) / 2) * math.sin((f2 - f) / 2) +
        math.cos(f) * math.cos(f2) * math.sin(dl / 2) * math.sin(dl / 2)
      2.0 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
    }
    def arcDist(edgeLng: Double): Double = {
      val dl = math.toRadians(wrapSep(lng, edgeLng))
      val ends = math.min(hav(by0, edgeLng), hav(by1, edgeLng))
      if (math.cos(dl) <= 0) ends
      else {
        val footLat = math.toDegrees(math.atan(math.tan(f) / math.cos(dl)))
        if (footLat < by0 || footLat > by1) ends
        else {
          val xt = math.abs(math.asin(math.sin(dl) * math.cos(f)))
          math.min(ends, xt * EarthRadiusKm)
        }
      }
    }
    math.min(arcDist(bx0), arcDist(bx1))
  }

  /** Sample-grid covering at `res` (cells as raw longs) of every cell
    * whose center is within `padKm` + R_MAX(res) of the box, using only
    * the FORWARD transform (latLngToCell):
    *
    *  - any cell containing an in-box anchor has its center within
    *    R_MAX km of the box (R_MAX = 3x avg edge >= any circumradius at
    *    this resolution, pentagons included), so sampling the box padded
    *    by R_MAX (+ the caller's padKm) covers every candidate center;
    *  - grid spacing `s` deg keeps every point of the padded region
    *    within 0.71*s deg of a sample; ground distance per degree is
    *    <= 111.7 km, so with s = RHO_MIN/90 the nearest sample sits
    *    within 79/90 * RHO_MIN km of the candidate center — inside the
    *    cell (RHO_MIN = 0.25x avg edge <= any inradius). The sample's
    *    cell IS the candidate, so the set covers it.
    *
    * Pole-safe (round-14): the km→deg longitude pad is CAPPED at the
    * full circle instead of refusing past 84° — ground distance per
    * longitude degree only shrinks toward the poles, so degree-spaced
    * samples get denser on the ground there, never sparser, and the
    * coverage argument above still holds. None = sample grid exceeds
    * `budget` (caller decides whether to coarsen or give up).
    */
  private[graft] def sampleCells(res: Int, ex0: Double, ey0: Double,
      ex1: Double, ey1: Double, padKm: Double, budget: Long)
      : Option[scala.collection.mutable.LinkedHashSet[Long]] = {
    val edge = H3AvgEdgeKm(res)
    val rMax = 3.0 * edge + padKm
    val rhoMin = 0.25 * edge
    val latPad = rMax / KmPerDegLow // over-expands: a lat degree is >108 km
    val sy0 = math.max(-90.0, ey0 - latPad)
    val sy1 = math.min(90.0, ey1 + latPad)
    val maxAbsLat = math.max(math.abs(sy0), math.abs(sy1))
    val lngPad =
      if (maxAbsLat >= 89.9) 360.0
      else math.min(360.0,
        rMax / (KmPerDegLow * math.cos(math.toRadians(maxAbsLat))))
    val sx0 = math.max(-180.0, ex0 - lngPad)
    val sx1 = math.min(180.0, ex1 + lngPad)
    // clamped to nothing (query box outside world bounds): refuse rather
    // than emit an empty covering — nonstandard data could still match
    if (sx1 < sx0 || sy1 < sy0) return None
    val s = rhoMin / 90.0
    val nx = math.ceil((sx1 - sx0) / s).toLong + 1
    val ny = math.ceil((sy1 - sy0) / s).toLong + 1
    if (nx <= 0 || ny <= 0 || nx * ny > budget) return None
    val cells = scala.collection.mutable.LinkedHashSet[Long]()
    var iy = 0L
    while (iy < ny) {
      val lat = math.min(sy1, sy0 + iy * s)
      var ix = 0L
      while (ix < nx) {
        val lng = math.min(sx1, sx0 + ix * s)
        cells += H3.latLngToCell(lat, lng, res)
        ix += 1
      }
      iy += 1
    }
    Some(cells)
  }

  /** H3 cell-string covering of the (reach-expanded) box.
    *
    * Direct sample-grid when it fits the budget; otherwise HIERARCHICAL
    * (round-14, replacing the high-res refusal): sample at the finest
    * ancestor resolution p whose grid fits, then refine p → res one
    * level at a time by child enumeration (`H3.cellChildren`, pentagon
    * digit-1 skip included), filtering each level against the box with
    * the exact sphere distance. Soundness chain:
    *
    *  - candidates at res have centers within M = 3·edge(res) of the
    *    box; a res-q ancestor's center sits within drift(q) =
    *    2·edge(q) of any descendant center (child-center offsets form
    *    a geometric series in 1/√7, summing < 1.9·edge(q)), so level q
    *    must keep exactly the cells within M + drift(q) — the sample
    *    pad and the refinement filter both use that margin;
    *  - filter centers come from `cellCenterApprox` only when the
    *    forward transform round-trips to the same cell (exact center);
    *    otherwise the cell is kept unconditionally — never dropped on
    *    an approximation.
    *
    * None when the covering exceeds MaxKeys — the regime where an IN
    * list stops paying — or the working set blows past refinement
    * headroom.
    */
  private[graft] def h3Covering(res: Int, ex0: Double, ey0: Double,
      ex1: Double, ey1: Double): Option[Seq[String]] = {
    if (res < 0 || res > 15) return None
    val mKm = 3.0 * H3AvgEdgeKm(res)
    def drift(q: Int): Double = if (q >= res) 0.0 else 2.0 * H3AvgEdgeKm(q)
    def padKm(q: Int): Double =
      math.max(0.0, mKm + drift(q) - 3.0 * H3AvgEdgeKm(q))
    // finest sampling resolution whose grid fits the budget (res 0 is
    // ~7k samples worldwide, so the descent always terminates)
    var p = res
    var seed: Option[scala.collection.mutable.LinkedHashSet[Long]] =
      None
    while (p >= 0 && seed.isEmpty) {
      seed = sampleCells(p, ex0, ey0, ex1, ey1, padKm(p), MaxSamples)
      if (seed.isEmpty) p -= 1
    }
    var cur = seed.getOrElse(return None)
    var q = p
    val headroom = 4L * MaxKeys // bail before a hopeless level explodes
    while (q < res) {
      q += 1
      val margin = mKm + drift(q)
      val next = scala.collection.mutable.LinkedHashSet[Long]()
      val it = cur.iterator
      while (it.hasNext) {
        val cell = it.next()
        val kids = H3.cellChildren(cell)
        var i = 0
        while (i < kids.length) {
          val k = kids(i)
          val (clatR, clngR) = H3.cellCenterApprox(k) // RADIANS
          val clat = math.toDegrees(clatR)
          val clng = math.toDegrees(clngR)
          val exact = H3.latLngToCell(clat, clng, q) == k
          if (!exact ||
              distToBoxKm(clat, clng, ex0, ey0, ex1, ey1) <= margin)
            next += k
          if (next.size > headroom) return None
          i += 1
        }
      }
      cur = next
    }
    if (cur.size > MaxKeys) None
    else Some(cur.iterator.map(c =>
      java.lang.Long.toHexString(c)).toSeq)
  }

  /** KD-tree leaf cell ids whose rectangle intersects the
    * (reach-expanded) box — mirrors `KdTree.cellOf`'s walk exactly:
    * even depth splits x, '0' = coordinate < split.
    */
  private[graft] def kdCovering(tree: KdTree.Node, ex0: Double, ey0: Double,
      ex1: Double, ey1: Double): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def hits(rx0: Double, ry0: Double, rx1: Double, ry1: Double): Boolean =
      rx0 <= ex1 && rx1 >= ex0 && ry0 <= ey1 && ry1 >= ey0
    def walk(n: KdTree.Node, depth: Int, path: String,
        rx0: Double, ry0: Double, rx1: Double, ry1: Double): Unit = {
      val xDim = depth % 2 == 0
      val (l0, m0, l1, m1) =
        if (xDim) (rx0, ry0, math.min(rx1, n.split), ry1)
        else (rx0, ry0, rx1, math.min(ry1, n.split))
      val (r0, s0, r1, s1) =
        if (xDim) (math.max(rx0, n.split), ry0, rx1, ry1)
        else (rx0, math.max(ry0, n.split), rx1, ry1)
      if (hits(l0, m0, l1, m1)) n.left match {
        case Some(l) => walk(l, depth + 1, path + "0", l0, m0, l1, m1)
        case None => out += path + "0"
      }
      if (hits(r0, s0, r1, s1)) n.right match {
        case Some(r) => walk(r, depth + 1, path + "1", r0, s0, r1, s1)
        case None => out += path + "1"
      }
    }
    walk(tree, 0, "", -1e308, -1e308, 1e308, 1e308)
    out.toSeq
  }

  // ---- predicate --------------------------------------------------------

  /** The partition-column conjunct for a `filterBbox(x0,y0,x1,y1)` query
    * over `df`, or None when pruning cannot apply (column absent — e.g.
    * a single leaf directory was read without hive discovery — covering
    * too large, or an un-handleable partition-value type).
    *
    * Hive partition-value TYPE INFERENCE may have turned all-digit keys
    * ("0123" quadkey prefixes, "0101" kd cells) into numbers, dropping
    * leading zeros. Fixed-length digit strings map to Long injectively,
    * so for a numeric column the keys are compared as Longs — but only
    * when every covering key has the same length; mixed lengths could
    * collide after the leading-zero loss, so that case refuses.
    */
  def predicate(sp: SpatialPartitioning, df: DataFrame,
      x0: Double, y0: Double, x1: Double, y1: Double): Option[Column] = {
    if (!df.columns.contains(sp.column)) return None
    val ex0 = x0 - sp.maxHalfW; val ex1 = x1 + sp.maxHalfW
    val ey0 = y0 - sp.maxHalfH; val ey1 = y1 + sp.maxHalfH
    if (!(ex0 <= ex1 && ey0 <= ey1) ||
        ex0.isNaN || ex1.isNaN || ey0.isNaN || ey1.isNaN) return None
    val keys: Option[Seq[String]] = sp.scheme match {
      case "quadkey" => quadkeyCovering(sp.level, ex0, ey0, ex1, ey1)
      case "h3" => h3Covering(sp.resolution, ex0, ey0, ex1, ey1)
      case "kdtree" => sp.splits.map(kdCovering(_, ex0, ey0, ex1, ey1))
        .filter(_.size <= MaxKeys)
      case _ => None
    }
    keys.flatMap { ks =>
      if (ks.isEmpty) None // out-of-pattern; never prune on an empty set
      else df.schema(sp.column).dataType match {
        case org.apache.spark.sql.types.StringType =>
          Some(col(sp.column).isin(ks: _*))
        case org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType =>
          if (ks.map(_.length).distinct.size == 1 &&
              ks.forall(_.forall(_.isDigit)) && ks.head.length <= 18)
            Some(col(sp.column).isin(ks.map(_.toLong): _*))
          else None
        case _ => None
      }
    }
  }
}
