package graft.geom

/** Coordinate reprojection without PROJ (SURVEY §2.9, §7.4).
  *
  * The reference delegates to DuckDB `ST_Transform(..., always_xy := true)`
  * (`core/reproject.py:150-156`). We implement the projection families
  * its test matrix and common user CRSs exercise (standard Snyder
  * formulas, ellipsoidal forms):
  *  - geographic: EPSG:4326 / 4269 (NAD83) / 4258 (ETRS89) / OGC:CRS84
  *  - spherical WebMercator (3857/900913) + ellipsoidal Mercator (3395)
  *  - Albers Equal Area (5070 CONUS)
  *  - Transverse Mercator / UTM: WGS84 326xx/327xx, NAD83 269xx,
  *    ETRS89 258xx
  *  - Lambert Conformal Conic 2SP: 2154 (RGF93 / Lambert-93)
  *  - Lambert Azimuthal Equal Area: 3035 (ETRS89-extended Europe)
  *  - world pseudocylindricals: Sinusoidal (ESRI:54008), Mollweide
  *    (ESRI:54009), Eckert VI (ESRI:54010), Eckert IV (ESRI:54012),
  *    Robinson (ESRI:54030), Equal Earth (EPSG:8857)
  * CRS inputs may be "EPSG:n", bare codes, OGC URNs, or PROJJSON (the
  * `id.authority/code` is extracted). Always-XY axis order everywhere.
  *
  * Accuracy caveat — Robinson (ESRI:54030): Robinson is a TABLE
  * projection (5°-node coefficients, Robinson 1974) and implementations
  * differ in how they interpolate between nodes. This engine uses a
  * monotone Hermite interpolant: node latitudes (0°, 5°, …, 90°) map
  * EXACTLY to the published table values and round-trip through our own
  * inverse to sub-meter, but interior latitudes can deviate from PROJ's
  * central-difference spline (`robin`) by up to ~100 m on the ground.
  * Coordinates produced by PROJ/pyproj therefore do not inverse-
  * transform bit-exactly through this engine between nodes; pipelines
  * mixing the two engines on 54030 should compare with a ~100 m
  * tolerance. Every other CRS above follows closed-form Snyder
  * equations and matches PROJ to numerical precision.
  */
object Proj {

  private val A = 6378137.0 // WGS84/GRS80 semi-major
  private val F = 1.0 / 298.257222101 // GRS80 flattening (Albers/UTM grids)
  private val FWgs = 1.0 / 298.257223563 // WGS84 flattening (UTM on WGS84)

  // ---- WebMercator ------------------------------------------------------

  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = A * math.toRadians(lon)
    val latC = math.max(-89.9999, math.min(89.9999, lat))
    val y = A * math.log(math.tan(math.Pi / 4 + math.toRadians(latC) / 2))
    (x, y)
  }

  def mercatorToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / A)
    val lat = math.toDegrees(2 * math.atan(math.exp(y / A)) - math.Pi / 2)
    (lon, lat)
  }

  /** forward/inverse pair — every projection family implements this so
    * the PROJJSON conversion-driven dispatch can treat them uniformly.
    */
  private[graft] trait Projection {
    def forward(lon: Double, lat: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  // ---- Albers Equal Area (general 2SP; EPSG method 9822) ----------------

  private final class Aea(lat1d: Double, lat2d: Double, lat0d: Double,
      lon0d: Double, fe: Double, fn: Double, flattening: Double = F,
      a: Double = A) extends Projection {
    val lat1 = math.toRadians(lat1d)
    val lat2 = math.toRadians(lat2d)
    val lat0 = math.toRadians(lat0d)
    val lon0 = math.toRadians(lon0d)
    val e2 = 2 * flattening - flattening * flattening
    val e = math.sqrt(e2)

    private def qOf(phi: Double): Double = {
      val sin = math.sin(phi)
      // spherical limit (e = 0, reachable via PROJJSON sphere-based
      // CRSs like the EASE grids): q -> 2 sin(phi); the ellipsoidal
      // form divides by 2e and would return NaN for every coordinate
      if (e == 0) return 2.0 * sin
      (1 - e2) * (sin / (1 - e2 * sin * sin) -
        (1 / (2 * e)) * math.log((1 - e * sin) / (1 + e * sin)))
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))

    val m1 = mOf(lat1); val m2 = mOf(lat2)
    val q0 = qOf(lat0); val q1 = qOf(lat1); val q2 = qOf(lat2)
    val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    val c = m1 * m1 + n * q1
    val rho0 = a * math.sqrt(c - n * q0) / n

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val q = qOf(phi)
      val rho = a * math.sqrt(c - n * q) / n
      val theta = n * (lam - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe; val yp = y - fn
      // southern-parallel parameterizations have n < 0: rho and theta
      // take the cone-constant sign (Snyder 14-10/14-11)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(xp, rho0 - yp)
      val theta = math.atan2(sgn * xp, sgn * (rho0 - yp))
      val q = (c - rho * rho * n * n / (a * a)) / n
      // iterate for phi
      var phi = math.asin(math.max(-1, math.min(1, q / 2)))
      // e = 0: asin(q/2) IS the spherical answer; the ellipsoidal
      // iteration below divides by 2e and would NaN
      var i = if (e == 0) 100 else 0
      while (i < 15) {
        val sin = math.sin(phi)
        val esin = e * sin
        val next = phi + math.pow(1 - e2 * sin * sin, 2) / (2 * math.cos(phi)) *
          (q / (1 - e2) - sin / (1 - e2 * sin * sin) +
            (1 / (2 * e)) * math.log((1 - esin) / (1 + esin)))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 100 } else phi = next
        i += 1
      }
      (math.toDegrees(lon0 + theta / n), math.toDegrees(phi))
    }
  }

  /** NAD83 / Conus Albers (published parameter set). */
  private lazy val Albers5070 = new Aea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0)

  // ---- Transverse Mercator (general form; UTM/MGA/NZTM/CS92 are
  // parameterizations) ----------------------------------------------------

  /** Snyder series TM; ellipsoid (a, 1/f) parameterized so non-GRS80
    * datums (e.g. Airy 1830 for OSGB) project correctly too.
    */
  private final class Tm(lat0d: Double, lon0d: Double, k0: Double,
      fe: Double, fn: Double, flattening: Double = FWgs,
      a: Double = A) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val ep2 = e2 / (1 - e2)
    private val lon0 = math.toRadians(lon0d)
    private def mOf(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
        (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
        (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
        (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    private val m0 = mOf(math.toRadians(lat0d))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val nRad = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val cc = ep2 * cosP * cosP
      val aa = cosP * (lam - lon0)
      val m = mOf(phi)
      val x = k0 * nRad * (aa + (1 - t + cc) * aa * aa * aa / 6 +
        (5 - 18 * t + t * t + 72 * cc - 58 * ep2) * math.pow(aa, 5) / 120) + fe
      val y = fn + k0 * (m - m0 + nRad * tanP * (aa * aa / 2 +
        (5 - t + 9 * cc + 4 * cc * cc) * math.pow(aa, 4) / 24 +
        (61 - 58 * t + t * t + 600 * cc - 330 * ep2) * math.pow(aa, 6) / 720))
      (x, y)
    }

    // constants of the projection instance — hoisted off the per-row
    // inverse hot path (two sqrts + series denominator per coordinate)
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    private val muDen = a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256)

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xm = x - fe
      val m = m0 + (y - fn) / k0
      val mu = m / muDen
      val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = a / math.sqrt(1 - e2 * sinP * sinP)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = xm / (n1 * k0)
      val phi = phi1 - (n1 * tanP / r1) * (d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
      val lam = lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cosP
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  private val tmCache = new java.util.concurrent.ConcurrentHashMap[Int, Tm]()
  private def tmFor(epsg: Int): Tm =
    tmCache.computeIfAbsent(epsg, { code =>
      code match {
        case z if z >= 32601 && z <= 32660 =>
          new Tm(0, -183.0 + 6 * (z - 32600), 0.9996, 500000.0, 0.0)
        case z if z >= 32701 && z <= 32760 =>
          new Tm(0, -183.0 + 6 * (z - 32700), 0.9996, 500000.0, 10000000.0)
        case z if z >= 25828 && z <= 25838 =>
          new Tm(0, -183.0 + 6 * (z - 25800), 0.9996, 500000.0, 0.0, F)
        case z if z >= 26901 && z <= 26923 =>
          new Tm(0, -183.0 + 6 * (z - 26900), 0.9996, 500000.0, 0.0, F)
        case z if z >= 28348 && z <= 28358 => // GDA94 / MGA zones
          new Tm(0, -183.0 + 6 * (z - 28300), 0.9996, 500000.0, 10000000.0, F)
        case 2193 => // NZGD2000 / New Zealand TM 2000
          new Tm(0, 173.0, 0.9996, 1600000.0, 10000000.0, F)
        case 2180 => // ETRS89 / Poland CS92
          new Tm(0, 19.0, 0.9993, 500000.0, -5300000.0, F)
        case other =>
          throw new IllegalArgumentException(s"not a TM code: EPSG:$other")
      }
    })

  private def isTm(c: Int): Boolean =
    (c >= 32601 && c <= 32660) || (c >= 32701 && c <= 32760) ||
      (c >= 25828 && c <= 25838) || (c >= 26901 && c <= 26923) ||
      (c >= 28348 && c <= 28358) || c == 2193 || c == 2180

  // ---- Polar Stereographic (Snyder ellipsoidal; EPSG methods 9810
  // variant A / 9829 variant B) ------------------------------------------

  /** north = projection centered on the north pole. Variant A fixes k0
    * at the pole; variant B derives the scale from a standard parallel
    * latTs (pass latTs = ±90 with an explicit k0 for variant A).
    */
  private final class PolarStereo(latTsD: Double, lon0d: Double, fe: Double,
      fn: Double, north: Boolean, k0A: Double = Double.NaN,
      flattening: Double = FWgs, a: Double = A) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0d)
    private def tOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), e / 2)
    }
    /** rho = a * k * t where k collapses the variant A/B distinction. */
    private val rhoFactor: Double =
      if (!k0A.isNaN) // variant A: rho = 2 a k0 t / sqrt((1+e)^(1+e)(1-e)^(1-e))
        2 * a * k0A / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      else { // variant B: rho = a mc t / tc at the standard parallel
        val latTs = math.toRadians(math.abs(latTsD))
        val mc = math.cos(latTs) /
          math.sqrt(1 - e2 * math.sin(latTs) * math.sin(latTs))
        a * mc / tOf(latTs)
      }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(if (north) lat else -lat)
      val lam = math.toRadians(if (north) lon else -lon) -
        (if (north) lon0 else -lon0)
      val rho = rhoFactor * tOf(phi)
      val x = rho * math.sin(lam)
      val y = -rho * math.cos(lam)
      if (north) (fe + x, fn + y) else (fe - x, fn - y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val (xp, yp) = if (north) (x - fe, y - fn) else (fe - x, fn - y)
      val rho = math.hypot(xp, yp)
      val t = rho / rhoFactor
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 100 } else phi = next
        i += 1
      }
      val lam = (if (north) lon0 else -lon0) + math.atan2(xp, -yp)
      if (north) (math.toDegrees(lam), math.toDegrees(phi))
      else (math.toDegrees(-lam), math.toDegrees(-phi))
    }
  }

  private lazy val polarByCode: Map[Int, PolarStereo] = Map(
    3413 -> new PolarStereo(70, -45, 0, 0, north = true), // NSIDC Sea Ice North
    3995 -> new PolarStereo(71, 0, 0, 0, north = true), // Arctic Polar Stereo
    3031 -> new PolarStereo(-71, 0, 0, 0, north = false), // Antarctic Polar Stereo
    3976 -> new PolarStereo(-70, 0, 0, 0, north = false), // NSIDC Sea Ice South
    3032 -> new PolarStereo(-71, 70, 6000000, 6000000, north = false), // Australian Antarctic
    5041 -> new PolarStereo(90, 0, 2000000, 2000000, north = true, k0A = 0.994), // UPS North
    5042 -> new PolarStereo(-90, 0, 2000000, 2000000, north = false, k0A = 0.994)) // UPS South

  // ---- ellipsoidal Mercator (general; EPSG methods 9804 variant A /
  // 9805 variant B via k0 = m(lat1)) --------------------------------------

  private final class Merc(k0: Double, lon0d: Double, fe: Double, fn: Double,
      flattening: Double = FWgs, a: Double = A) extends Projection {
    val e2 = 2 * flattening - flattening * flattening
    val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0d)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(math.max(-89.9999, math.min(89.9999, lat)))
      val esin = e * math.sin(phi)
      val y = a * k0 * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - esin) / (1 + esin), e / 2))
      (fe + a * k0 * (math.toRadians(lon) - lon0), fn + y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-(y - fn) / (a * k0))
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 100 } else phi = next
        i += 1
      }
      (math.toDegrees(lon0 + (x - fe) / (a * k0)), math.toDegrees(phi))
    }
  }

  /** WGS84 / World Mercator (published parameter set). */
  private lazy val Merc3395 = new Merc(1.0, 0.0, 0.0, 0.0)

  // ---- Lambert Conformal Conic 2SP (general, GRS80) --------------------

  private final class Lcc2SP(lat1d: Double, lat2d: Double, lat0d: Double,
      lon0d: Double, fe: Double, fn: Double, flattening: Double = F,
      a: Double = A) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val e = math.sqrt(e2)
    private val lat1 = math.toRadians(lat1d)
    private val lat2 = math.toRadians(lat2d)
    private val lat0 = math.toRadians(lat0d)
    private val lon0 = math.toRadians(lon0d)
    private def tOf(phi: Double): Double = {
      val esin = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), e / 2)
    }
    private def mOf(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    private val n =
      math.log(mOf(lat1) / mOf(lat2)) / math.log(tOf(lat1) / tOf(lat2))
    private val bigF = mOf(lat1) / (n * math.pow(tOf(lat1), n))
    private val rho0 = a * bigF * math.pow(tOf(lat0), n)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val rho = a * bigF * math.pow(tOf(math.toRadians(lat)), n)
      val theta = n * (math.toRadians(lon) - lon0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - fe; val yp = rho0 - (y - fn)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(xp, yp)
      val theta = math.atan2(sgn * xp, sgn * yp)
      val t = math.pow(rho / (a * bigF), 1 / n)
      var phi = math.Pi / 2 - 2 * math.atan(t)
      var i = 0
      while (i < 15) {
        val esin = e * math.sin(phi)
        val next = math.Pi / 2 -
          2 * math.atan(t * math.pow((1 - esin) / (1 + esin), e / 2))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 100 } else phi = next
        i += 1
      }
      (math.toDegrees(lon0 + theta / n), math.toDegrees(phi))
    }
  }

  /** RGF93 / Lambert-93 (published parameter set). */
  private lazy val Lambert93 = new Lcc2SP(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)

  // ---- Lambert Azimuthal Equal Area (general oblique, GRS80) -----------

  private final class Laea(lat0d: Double, lon0d: Double, fe: Double,
      fn: Double, flattening: Double = F, a: Double = A) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val e = math.sqrt(e2)
    private val lat0 = math.toRadians(lat0d)
    private val lon0 = math.toRadians(lon0d)
    private def qOf(phi: Double): Double = {
      val sin = math.sin(phi)
      // spherical limit (e = 0, reachable via PROJJSON sphere-based
      // CRSs like the EASE grids): q -> 2 sin(phi); the ellipsoidal
      // form divides by 2e and would return NaN for every coordinate
      if (e == 0) return 2.0 * sin
      (1 - e2) * (sin / (1 - e2 * sin * sin) -
        (1 / (2 * e)) * math.log((1 - e * sin) / (1 + e * sin)))
    }
    private val qp = qOf(math.Pi / 2)
    private val q0 = qOf(lat0)
    private val beta0 = math.asin(math.max(-1, math.min(1, q0 / qp)))
    private val rq = a * math.sqrt(qp / 2)
    private val m0 = math.cos(lat0) / math.sqrt(1 - e2 * math.sin(lat0) * math.sin(lat0))
    private val d = a * m0 / (rq * math.cos(beta0))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon) - lon0
      val beta = math.asin(math.max(-1, math.min(1, qOf(phi) / qp)))
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(lam)))
      (fe + b * d * math.cos(beta) * math.sin(lam),
        fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
          math.sin(beta0) * math.cos(beta) * math.cos(lam)))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = (x - fe) / d; val yp = (y - fn) * d
      val rho = math.hypot(xp, yp)
      if (rho < 1e-12) return (math.toDegrees(lon0), math.toDegrees(lat0))
      val ce = 2 * math.asin(math.max(-1, math.min(1, rho / (2 * rq))))
      val q = qp * (math.cos(ce) * math.sin(beta0) +
        yp * math.sin(ce) * math.cos(beta0) / rho)
      val lam = math.atan2(xp * math.sin(ce),
        rho * math.cos(beta0) * math.cos(ce) - yp * math.sin(beta0) * math.sin(ce))
      // iterate phi from q (same relation as Albers)
      var phi = math.asin(math.max(-1, math.min(1, q / 2)))
      // e = 0: asin(q/2) IS the spherical answer; the ellipsoidal
      // iteration below divides by 2e and would NaN
      var i = if (e == 0) 100 else 0
      while (i < 15) {
        val sin = math.sin(phi)
        val esin = e * sin
        val next = phi + math.pow(1 - e2 * sin * sin, 2) / (2 * math.cos(phi)) *
          (q / (1 - e2) - sin / (1 - e2 * sin * sin) +
            (1 / (2 * e)) * math.log((1 - esin) / (1 + esin)))
        if (math.abs(next - phi) < 1e-12) { phi = next; i = 100 } else phi = next
        i += 1
      }
      (math.toDegrees(lon0 + lam), math.toDegrees(phi))
    }
  }

  /** ETRS89-extended / LAEA Europe (published parameter set). */
  private lazy val Laea3035 = new Laea(52.0, 10.0, 4321000.0, 3210000.0)

  // ---- dispatch ---------------------------------------------------------

  /** EPSG code from "EPSG:n", a bare code, an OGC URN
    * ("urn:ogc:def:crs:EPSG::3857"), OGC:CRS84, or a PROJJSON document
    * (reads `id.code` — enough to dispatch any CRS we implement, the
    * same role pyproj's CRS parsing plays for the reference).
    */
  private[graft] def parseEpsg(crs: String): Int = {
    val s = crs.trim
    if (s.startsWith("{")) {
      if (epsgCache.size > CacheCap) epsgCache.clear()
      return epsgCache.computeIfAbsent(s, { _ =>
        try Some(parseEpsgJson(s)) catch { case _: Exception => None }
      }).getOrElse(throw new IllegalArgumentException(
        s"PROJJSON without id: $s"))
    }
    parseEpsgPlain(s)
  }

  private def parseEpsgJson(s: String): Int = {
    {
      val node = jsonMapper.readTree(s)
      val id = node.get("id")
      if (id != null && id.get("code") != null) {
        val code = id.get("code")
        if (code.isNumber) return code.asInt
        val codeTxt = code.asText.trim
        if (codeTxt.nonEmpty && codeTxt.forall(_.isDigit))
          return codeTxt.toInt
        // non-numeric authority codes: the GeoParquet spec's DEFAULT
        // CRS document carries id {"authority":"OGC","code":"CRS84"} —
        // toInt here used to throw, and the throw made the single most
        // common CRS in the wild read as unsupported (the name fallback
        // below was unreachable whenever an id was present)
        val auth = Option(id.get("authority"))
          .map(_.asText.toUpperCase).getOrElse("")
        (auth, codeTxt.toUpperCase) match {
          case ("OGC", "CRS84") => return 4326
          case ("OGC", "CRS83") => return 4269 // NAD83 lon-lat
          case ("OGC", "CRS27") => return 4267 // NAD27 lon-lat
          case _ => () // fall through to the geographic-name heuristic
        }
      }
      val name = Option(node.get("name")).map(_.asText.toUpperCase).getOrElse("")
      // the name fallback must only apply to GEOGRAPHIC CRSs — a
      // projected document ("WGS 84 / World Mercator") also contains
      // "WGS 84" but is emphatically not 4326
      val tpe = Option(node.get("type")).map(_.asText).getOrElse("")
      val geographic = tpe.isEmpty || tpe.startsWith("Geographic")
      if (geographic && (name.contains("CRS84") || name.contains("WGS 84")))
        return 4326
      throw new IllegalArgumentException(s"PROJJSON without id: $s")
    }
  }

  private def parseEpsgPlain(s: String): Int = {
    val u = s.toUpperCase
    if (u == "OGC:CRS84" || u == "CRS84") return 4326
    val code =
      if (u.startsWith("URN:")) u.substring(u.lastIndexOf(':') + 1)
      else if (u.startsWith("EPSG:")) u.substring(5)
      else if (u.startsWith("ESRI:")) u.substring(5) // 54008/54009/54030 world codes
      else u
    // the URN suffix may itself be the NAMED default —
    // "urn:ogc:def:crs:OGC:1.3:CRS84" is RFC 7946's legacy GeoJSON crs
    // string; without this it fell through to toInt and threw
    if (code == "CRS84") return 4326
    code.toInt
  }

  /** Authoritative projected-coordinate extents per EPSG code — the
    * role pyproj's `area_of_use` plays for the reference's
    * coordinate-range checks (`core/validate.py:2022-2092`,
    * `core/reproject.py:150-156`). Exact where the EPSG registry
    * publishes a projected bbox; rounded OUTWARD elsewhere so a
    * widened envelope can only miss a finding, never invent one.
    */
  private[graft] def boundsForEpsg(code: Int): Option[(Double, Double, Double, Double)] =
    code match {
      case 4326 | 4269 | 4258 => Some((-180.0, -90.0, 180.0, 90.0))
      case 3857 | 900913 =>
        Some((-20037508.342789244, -20048966.104014594,
          20037508.342789244, 20048966.104014594))
      case 3395 => // World Mercator: lat clipped to [-80, 84] per EPSG
        Some((-20037508.342789244, -15496570.74, 20037508.342789244, 18764656.23))
      case 3035 => // LAEA Europe, EPSG projected bbox
        Some((1896628.62, 1095703.18, 7104179.2, 6882401.15))
      case 2154 => // RGF93 / Lambert-93, EPSG projected bbox
        Some((-378305.81, 6005281.2, 1320649.57, 7235612.72))
      case 5070 => // NAD83 / Conus Albers, rounded outward
        Some((-2500000.0, 0.0, 2500000.0, 3500000.0))
      case c if c >= 32601 && c <= 32660 => // WGS84 UTM north, outward
        Some((-100000.0, 0.0, 1100000.0, 9600000.0))
      case c if c >= 32701 && c <= 32760 => // WGS84 UTM south, outward
        Some((-100000.0, 100000.0, 1100000.0, 10000000.0))
      case c if (c >= 25828 && c <= 25838) || (c >= 26901 && c <= 26923) =>
        Some((-100000.0, 0.0, 1100000.0, 9600000.0)) // ETRS89 / NAD83 UTM north
      case c if c >= 28348 && c <= 28358 => // GDA94 / MGA (south), outward
        Some((-100000.0, 100000.0, 1100000.0, 10000000.0))
      case 2193 => Some((900000.0, 4300000.0, 2200000.0, 6300000.0)) // NZTM, outward
      case 2180 => Some((100000.0, 100000.0, 900000.0, 900000.0)) // CS92, outward
      case 3413 | 3995 => Some((-6e6, -6e6, 6e6, 6e6)) // polar stereo north, outward
      case 3031 | 3976 => Some((-5e6, -5e6, 5e6, 5e6)) // polar stereo south, outward
      case 3032 => Some((1e6, 1e6, 11e6, 11e6)) // Australian Antarctic, outward
      case 5041 | 5042 => Some((0.0, 0.0, 4e6, 4e6)) // UPS, outward
      case 54008 => // World Sinusoidal: |x| ≤ aπ, |y| ≤ M(90°), outward
        Some((-20.1e6, -10.1e6, 20.1e6, 10.1e6))
      case 54009 => // World Mollweide: |x| ≤ 2√2·a, |y| ≤ √2·a, outward
        Some((-18.1e6, -9.1e6, 18.1e6, 9.1e6))
      case 54010 => // World Eckert VI: |x| ≤ 2aπ/√(2+π), |y| ≤ aπ/√(2+π)
        Some((-17.7e6, -8.9e6, 17.7e6, 8.9e6))
      case 54012 => // World Eckert IV: |x| ≤ 4aπ/√(π(4+π)), |y| ≤ 2a√(π/(4+π))
        Some((-17.0e6, -8.5e6, 17.0e6, 8.5e6))
      case 54030 => // World Robinson: |x| ≤ 0.8487aπ, |y| ≤ 1.3523a, outward
        Some((-17.1e6, -8.7e6, 17.1e6, 8.7e6))
      case 8857 => // Equal Earth: |x| ≤ aπcos0/(M·A1), |y| ≤ a·poly(θmax)
        Some((-17.3e6, -8.7e6, 17.3e6, 8.7e6))
      case _ => None
    }

  private def codeSupported(c: Int): Boolean =
    c == 4326 || c == 4269 || c == 4258 ||
      c == 3857 || c == 900913 || c == 3395 ||
      c == 5070 || c == 2154 || c == 3035 ||
      isTm(c) || polarByCode.contains(c) || worldByCode.contains(c)

  def supported(crs: String): Boolean =
    (try codeSupported(parseEpsg(crs)) catch { case _: Exception => false }) ||
      projjsonProjection(crs).isDefined

  // ---- Equidistant Cylindrical (EPSG method 1028; 1029 spherical) -------
  // EPSG Guidance Note 7-2: E = FE + ν₁·cosφ₁·(λ−λ₀),
  // N = FN + M(φ) (meridian arc, the Tm series); the inverse recovers φ
  // through the rectifying-latitude series and λ linearly. The spherical
  // variant (1029) falls out at e² = 0. Covers Plate Carrée /
  // EPSG:4087-style world grids (`core/reproject.py` gets these free
  // from PROJ).
  private final class EqCyl(lat1d: Double, lon0d: Double, fe: Double,
      fn: Double, flattening: Double = FWgs, a: Double = A)
      extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val lon0 = math.toRadians(lon0d)
    private val nu1Cos = {
      val s = math.sin(math.toRadians(lat1d))
      a / math.sqrt(1 - e2 * s * s) * math.cos(math.toRadians(lat1d))
    }
    private def mOf(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
        (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
        (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
        (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

    def forward(lon: Double, lat: Double): (Double, Double) =
      (fe + nu1Cos * (math.toRadians(lon) - lon0),
        fn + mOf(math.toRadians(lat)))

    // constants of the projection instance — hoisted off the per-row
    // inverse hot path (two sqrts + series denominator per coordinate)
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    private val muDen = a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256)

    def inverse(x: Double, y: Double): (Double, Double) = {
      val mu = (y - fn) /
        (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      var phi = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      // Newton-polish the truncated series on M(phi) (dM/dphi = a(1-e2)/w^3)
      var j = 0
      while (j < 2) {
        val s = math.sin(phi)
        val w = math.sqrt(1 - e2 * s * s)
        phi -= (mOf(phi) - (y - fn)) * w * w * w / (a * (1 - e2))
        j += 1
      }
      (math.toDegrees(lon0 + (x - fe) / nu1Cos), math.toDegrees(phi))
    }
  }

  // ---- Mollweide (ESRI:54009; no EPSG method code) -----------------------
  // Equal-area pseudocylindrical, spherical formulation with R = the
  // ellipsoid's semi-major axis — PROJ's `moll` convention, which is what
  // the reference gets for ESRI:54009 (`core/reproject.py` via pyproj).
  // Forward solves 2θ + sin 2θ = π sin φ by Newton (Snyder 1987 §31);
  // the inverse recovers θ from y in closed form, so the defining
  // equation itself certifies the iteration in tests.
  private final class Mollweide(lon0d: Double, fe: Double, fn: Double,
      a: Double = A) extends Projection {
    private val lon0 = math.toRadians(lon0d)
    private val sqrt2 = math.sqrt(2.0)

    private def thetaOf(phi: Double): Double = {
      val target = math.Pi * math.sin(phi)
      var th = phi
      var i = 0
      while (i < 12) {
        val f = 2 * th + math.sin(2 * th) - target
        val d = 2 + 2 * math.cos(2 * th)
        if (math.abs(d) < 1e-14) return math.signum(phi) * math.Pi / 2
        val next = th - f / d
        if (math.abs(next - th) < 1e-13) return next
        th = next
        i += 1
      }
      th
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val th = thetaOf(math.toRadians(lat))
      (fe + (2 * sqrt2 / math.Pi) * a *
        normLon(math.toRadians(lon) - lon0) * math.cos(th),
        fn + sqrt2 * a * math.sin(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val th = math.asin(math.max(-1.0, math.min(1.0, (y - fn) / (sqrt2 * a))))
      val phi = math.asin(math.max(-1.0,
        math.min(1.0, (2 * th + math.sin(2 * th)) / math.Pi)))
      val lam =
        if (math.abs(math.cos(th)) < 1e-12) lon0
        else lon0 + math.Pi * (x - fe) / (2 * sqrt2 * a * math.cos(th))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Sinusoidal (ESRI:54008; no EPSG method code) ----------------------
  // Equal-area pseudocylindrical, ellipsoidal (Snyder 1987 §30):
  // x = FE + a·Δλ·cosφ/√(1−e²sin²φ), y = FN + M(φ) — the same meridian
  // arc series as Equidistant Cylindrical / TM, inverted through the
  // rectifying-latitude series plus a Newton polish.
  private final class Sinusoidal(lon0d: Double, fe: Double, fn: Double,
      flattening: Double = FWgs, a: Double = A) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val lon0 = math.toRadians(lon0d)
    private def mOf(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
        (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
        (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
        (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val s = math.sin(phi)
      (fe + a * normLon(math.toRadians(lon) - lon0) * math.cos(phi) /
        math.sqrt(1 - e2 * s * s),
        fn + mOf(phi))
    }

    // constants of the projection instance — hoisted off the per-row
    // inverse hot path (two sqrts + series denominator per coordinate)
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    private val muDen = a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256)

    def inverse(x: Double, y: Double): (Double, Double) = {
      val mu = (y - fn) /
        (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      var phi = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      var j = 0
      while (j < 2) {
        val s = math.sin(phi)
        val w = math.sqrt(1 - e2 * s * s)
        phi -= (mOf(phi) - (y - fn)) * w * w * w / (a * (1 - e2))
        j += 1
      }
      val s = math.sin(phi)
      val cos = math.cos(phi)
      val lam =
        if (math.abs(cos) < 1e-12) lon0
        else lon0 + (x - fe) * math.sqrt(1 - e2 * s * s) / (a * cos)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Eckert IV (ESRI:54012; no EPSG method code) -----------------------
  // Equal-area pseudocylindrical with elliptical meridians, spherical
  // formulation with R = the semi-major axis (PROJ's `eck4` convention).
  // Forward solves θ + sinθ·cosθ + 2sinθ = (2 + π/2)·sinφ by Newton
  // (Snyder 1989); pole lines at half the equator length. The inverse
  // recovers θ from y in closed form, so the defining equation itself
  // certifies the iteration in tests (the Mollweide recipe).
  private final class EckertIV(lon0d: Double, fe: Double, fn: Double,
      a: Double = A) extends Projection {
    private val lon0 = math.toRadians(lon0d)
    private val cx = 2.0 / math.sqrt(math.Pi * (4.0 + math.Pi))
    private val cy = 2.0 * math.sqrt(math.Pi / (4.0 + math.Pi))
    private val cp = 2.0 + math.Pi / 2.0

    private def thetaOf(phi: Double): Double = {
      // the pole is a Newton fixed point with zero derivative (f' =
      // 2cosθ(1+cosθ)); snap instead of stalling 1e-7 short of π/2
      if (math.abs(phi) >= math.Pi / 2 - 1e-12)
        return math.signum(phi) * math.Pi / 2
      val target = cp * math.sin(phi)
      var th = phi / 2
      var i = 0
      while (i < 12) {
        val c = math.cos(th)
        val f = th + math.sin(th) * c + 2 * math.sin(th) - target
        val d = 2 * c * (1 + c)
        if (math.abs(d) < 1e-14) return math.signum(phi) * math.Pi / 2
        val next = th - f / d
        if (math.abs(next - th) < 1e-13) return next
        th = next
        i += 1
      }
      th
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val th = thetaOf(math.toRadians(lat))
      (fe + cx * a * normLon(math.toRadians(lon) - lon0) * (1 + math.cos(th)),
        fn + cy * a * math.sin(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val th = math.asin(math.max(-1.0, math.min(1.0, (y - fn) / (cy * a))))
      val phi = math.asin(math.max(-1.0, math.min(1.0,
        (th + math.sin(th) * math.cos(th) + 2 * math.sin(th)) / cp)))
      val lam = lon0 + (x - fe) / (cx * a * (1 + math.cos(th)))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Eckert VI (ESRI:54010; no EPSG method code) -----------------------
  // Equal-area pseudocylindrical with sinusoidal meridians, spherical
  // with R = the semi-major axis (PROJ's `eck6`). Forward solves
  // θ + sinθ = (1 + π/2)·sinφ by Newton (f' = 1 + cosθ, monotone);
  // pole lines at half the equator length; closed-form inverse.
  private final class EckertVI(lon0d: Double, fe: Double, fn: Double,
      a: Double = A) extends Projection {
    private val lon0 = math.toRadians(lon0d)
    private val sq = math.sqrt(2.0 + math.Pi)
    private val cp = 1.0 + math.Pi / 2.0

    private def thetaOf(phi: Double): Double = {
      val target = cp * math.sin(phi)
      var th = phi
      var i = 0
      while (i < 12) {
        val f = th + math.sin(th) - target
        val d = 1 + math.cos(th)
        if (math.abs(d) < 1e-14) return math.signum(phi) * math.Pi / 2
        val next = th - f / d
        if (math.abs(next - th) < 1e-13) return next
        th = next
        i += 1
      }
      th
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val th = thetaOf(math.toRadians(lat))
      (fe + a * normLon(math.toRadians(lon) - lon0) * (1 + math.cos(th)) / sq,
        fn + 2 * a * th / sq)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val th = (y - fn) * sq / (2 * a)
      val phi = math.asin(math.max(-1.0,
        math.min(1.0, (th + math.sin(th)) / cp)))
      val lam = lon0 + (x - fe) * sq / (a * (1 + math.cos(th)))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Equal Earth (EPSG:8857 / method 1078) -----------------------------
  // Šavrič, Patterson & Jenny 2018: equal-area pseudocylindrical with
  // the published degree-9 polynomial in θ = asin(√3/2 · sinφ);
  // spherical formulation with R = semi-major axis (PROJ's `eqearth`
  // spherical form, the one EPSG:8857's WGS84 usage resolves to).
  // Inverse recovers θ from y by Newton on the SAME polynomial (the
  // derivative is the forward's x-denominator), so tests certify the
  // defining equation and the equal-area Jacobian directly.
  private final class EqualEarth(lon0d: Double, fe: Double, fn: Double,
      a: Double = A) extends Projection {
    private val lon0 = math.toRadians(lon0d)
    private val A1 = 1.340264
    private val A2 = -0.081106
    private val A3 = 0.000893
    private val A4 = 0.003796
    private val M = math.sqrt(3.0) / 2.0

    private def poly(th: Double): Double = {
      val t2 = th * th; val t6 = t2 * t2 * t2
      th * (A1 + A2 * t2 + t6 * (A3 + A4 * t2))
    }
    private def dPoly(th: Double): Double = {
      val t2 = th * th; val t6 = t2 * t2 * t2
      A1 + 3 * A2 * t2 + t6 * (7 * A3 + 9 * A4 * t2)
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val th = math.asin(M * math.sin(math.toRadians(lat)))
      (fe + a * normLon(math.toRadians(lon) - lon0) * math.cos(th) /
        (M * dPoly(th)),
        fn + a * poly(th))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      var th = (y - fn) / a // A1 ≈ 1.34 keeps this inside the basin
      var i = 0
      while (i < 12) {
        val f = poly(th) - (y - fn) / a
        val d = dPoly(th)
        val next = th - f / d
        if (math.abs(next - th) < 1e-14) { th = next; i = 12 }
        else { th = next; i += 1 }
      }
      val phi = math.asin(math.max(-1.0, math.min(1.0, math.sin(th) / M)))
      val lam = lon0 + (x - fe) * M * dPoly(th) / (a * math.cos(th))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Robinson (ESRI:54030; no EPSG method code) ------------------------
  // Robinson's 1974 table projection: published X (parallel length) and
  // Y (parallel distance from equator) multipliers at 5° latitude nodes,
  // interpolated between nodes; x = 0.8487·R·X·Δλ, y = 1.3523·R·Y·sign φ,
  // R = semi-major axis (PROJ's `robin` convention for ESRI:54030).
  // Interpolation here is monotone cubic Hermite with centered-difference
  // slopes — C¹, hits every published node exactly, and is its own
  // inverse target (the y-inverse bisects the same interpolant), so
  // round-trips are exact to solver tolerance. PROJ uses its own spline
  // coefficients; between nodes the two differ by < ~100 m at world
  // scale, at the nodes they agree exactly.
  private final class Robinson(lon0d: Double, fe: Double, fn: Double,
      a: Double = A) extends Projection {
    private val lon0 = math.toRadians(lon0d)
    private val X = Array(1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730,
      0.9600, 0.9427, 0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597,
      0.7186, 0.6732, 0.6213, 0.5722, 0.5322)
    private val Y = Array(0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100,
      0.3720, 0.4340, 0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903,
      0.8435, 0.8936, 0.9394, 0.9761, 1.0000)

    // Hermite value at |lat| (degrees) over a node table
    private def interp(t: Array[Double], absLatDeg: Double): Double = {
      val pos = math.min(absLatDeg, 90.0) / 5.0
      val i = math.min(pos.toInt, 17)
      val u = pos - i
      def slope(j: Int): Double =
        if (j <= 0) t(1) - t(0)
        else if (j >= 18) t(18) - t(17)
        else (t(j + 1) - t(j - 1)) / 2.0
      val (p0, p1, m0, m1) = (t(i), t(i + 1), slope(i), slope(i + 1))
      val u2 = u * u; val u3 = u2 * u
      (2 * u3 - 3 * u2 + 1) * p0 + (u3 - 2 * u2 + u) * m0 +
        (-2 * u3 + 3 * u2) * p1 + (u3 - u2) * m1
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val absLat = math.abs(lat)
      (fe + 0.8487 * a * interp(X, absLat) *
        normLon(math.toRadians(lon) - lon0),
        fn + 1.3523 * a * interp(Y, absLat) * math.signum(lat))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val yy = math.min(math.abs(y - fn) / (1.3523 * a), 1.0)
      // Y is strictly increasing: bisect the interpolant
      var lo = 0.0; var hi = 90.0
      var i = 0
      while (i < 60) {
        val mid = (lo + hi) / 2
        if (interp(Y, mid) < yy) lo = mid else hi = mid
        i += 1
      }
      val absLat = (lo + hi) / 2
      val lam = lon0 + (x - fe) / (0.8487 * a * interp(X, absLat))
      (math.toDegrees(lam), absLat * math.signum(y - fn))
    }
  }

  private def normLon(rad: Double): Double =
    if (rad > math.Pi) rad - 2 * math.Pi
    else if (rad < -math.Pi) rad + 2 * math.Pi
    else rad

  /** ESRI world pseudocylindricals on WGS84 (what PROJ resolves the
    * 54008/54009/54030 codes to): sinusoidal, Mollweide, Robinson.
    */
  private lazy val worldByCode: Map[Int, Projection] = Map(
    54008 -> new Sinusoidal(0, 0, 0),
    54009 -> new Mollweide(0, 0, 0),
    54010 -> new EckertVI(0, 0, 0),
    54012 -> new EckertIV(0, 0, 0),
    54030 -> new Robinson(0, 0, 0),
    8857 -> new EqualEarth(0, 0, 0))

  // ---- Krovak (EPSG methods 9819 south-west / 1041 north-orientated) ----
  // Conformal oblique conic on Bessel 1841 (S-JTSK, Czechia/Slovakia);
  // formulas from EPSG Guidance Note 7-2. Method 9819's CRS axes are
  // (X = Southing, Y = Westing); method 1041 is the same projection with
  // east-north axes (E = −Y, N = −X), the form EPSG:5514 uses.
  private final class Krovak(latCd: Double, lon0d: Double, alphaCd: Double,
      latPd: Double, kP: Double, fe: Double, fn: Double,
      flattening: Double, a: Double, eastNorth: Boolean) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val e = math.sqrt(e2)
    private val latC = math.toRadians(latCd)
    private val lon0 = math.toRadians(lon0d)
    private val alphaC = math.toRadians(alphaCd)
    private val latP = math.toRadians(latPd)
    private val bigA = a * math.sqrt(1 - e2) /
      (1 - e2 * math.sin(latC) * math.sin(latC))
    private val bigB = math.sqrt(1 + e2 * math.pow(math.cos(latC), 4) / (1 - e2))
    private val gamma0 = math.asin(math.sin(latC) / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * math.sin(latC)) / (1 - e * math.sin(latC)), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + latC / 2), bigB)
    private val n = math.sin(latP)
    private val r0 = kP * bigA / math.tan(latP)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val esin = e * math.sin(phi)
      val u = 2 * (math.atan(t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) /
        math.pow((1 + esin) / (1 - esin), e * bigB / 2)) - math.Pi / 4)
      val v = bigB * (lon0 - lam)
      val t = math.asin(math.cos(alphaC) * math.sin(u) +
        math.sin(alphaC) * math.cos(u) * math.cos(v))
      val d = math.asin(math.cos(u) * math.sin(v) / math.cos(t))
      val theta = n * d
      val r = r0 * math.pow(math.tan(math.Pi / 4 + latP / 2), n) /
        math.pow(math.tan(t / 2 + math.Pi / 4), n)
      val southing = r * math.cos(theta) + fn
      val westing = r * math.sin(theta) + fe
      if (eastNorth) (-westing, -southing) else (southing, westing)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val (southing, westing) = if (eastNorth) (-y, -x) else (x, y)
      val xp = southing - fn; val yp = westing - fe
      val r = math.hypot(xp, yp)
      val theta = math.atan2(yp, xp)
      val d = theta / n
      val t = 2 * (math.atan(math.pow(r0 / r, 1.0 / n) *
        math.tan(math.Pi / 4 + latP / 2)) - math.Pi / 4)
      val u = math.asin(math.cos(alphaC) * math.sin(t) -
        math.sin(alphaC) * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      val lam = lon0 - v / bigB
      var phi = u
      var j = 0
      while (j < 15) {
        val esin = e * math.sin(phi)
        phi = 2 * (math.atan(math.pow(t0, -1.0 / bigB) *
          math.pow(math.tan(u / 2 + math.Pi / 4), 1.0 / bigB) *
          math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 4)
        j += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- Hotine Oblique Mercator (EPSG methods 9812 variant A /
  // 9815 variant B) -------------------------------------------------------
  // Conformal cylinder along an oblique initial line (Malaysian RSO
  // grids, Alaska zone 1, Swiss-style grids); EPSG GN7-2 formulas. The
  // variants share the whole (u, v) computation — variant B just shifts
  // u by |uc| so the grid origin is the projection centre (its EC/NC
  // apply there), while variant A's FE/FN apply at the natural origin.
  private final class HotineOm(latCd: Double, lonCd: Double, alphaCd: Double,
      gammaCd: Double, kC: Double, fe: Double, fn: Double,
      variantB: Boolean, flattening: Double, a: Double) extends Projection {
    private val e2 = 2 * flattening - flattening * flattening
    private val e = math.sqrt(e2)
    private val latC = math.toRadians(latCd)
    private val lonC = math.toRadians(lonCd)
    private val alphaC = math.toRadians(alphaCd)
    private val gammaC = math.toRadians(gammaCd)
    private val bigB = math.sqrt(1 + e2 * math.pow(math.cos(latC), 4) / (1 - e2))
    private val bigA = a * bigB * kC * math.sqrt(1 - e2) /
      (1 - e2 * math.sin(latC) * math.sin(latC))
    private val t0 = math.tan(math.Pi / 4 - latC / 2) /
      math.pow((1 - e * math.sin(latC)) / (1 + e * math.sin(latC)), e / 2)
    private val bigD = bigB * math.sqrt(1 - e2) /
      (math.cos(latC) * math.sqrt(1 - e2 * math.sin(latC) * math.sin(latC)))
    private val d2 = math.max(bigD * bigD, 1.0)
    private val bigF = bigD + math.sqrt(d2 - 1) * math.signum(latC)
    private val bigH = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    private val gamma0 = math.asin(math.sin(alphaC) / bigD)
    private val lam0 = lonC - math.asin(bigG * math.tan(gamma0)) / bigB
    // u at the projection centre (the variant-B shift); the aC = 90°
    // special case (Hungarian EOV style) is not dispatched here
    private val uc = (bigA / bigB) *
      math.atan2(math.sqrt(d2 - 1), math.cos(alphaC)) * math.signum(latC)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val t = math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
      val q = bigH / math.pow(t, bigB)
      val s = (q - 1 / q) / 2
      val bigT = (q + 1 / q) / 2
      val v0 = math.sin(bigB * (lam - lam0))
      val bigU = (-v0 * math.cos(gamma0) + s * math.sin(gamma0)) / bigT
      val v = bigA * math.log((1 - bigU) / (1 + bigU)) / (2 * bigB)
      var u = bigA * math.atan2(s * math.cos(gamma0) + v0 * math.sin(gamma0),
        math.cos(bigB * (lam - lam0))) / bigB
      if (variantB) u -= math.abs(uc) * math.signum(latC)
      (v * math.cos(gammaC) + u * math.sin(gammaC) + fe,
        u * math.cos(gammaC) - v * math.sin(gammaC) + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val v = (x - fe) * math.cos(gammaC) - (y - fn) * math.sin(gammaC)
      var u = (y - fn) * math.cos(gammaC) + (x - fe) * math.sin(gammaC)
      if (variantB) u += math.abs(uc) * math.signum(latC)
      val qp = math.exp(-bigB * v / bigA)
      val sp = (qp - 1 / qp) / 2
      val tp = (qp + 1 / qp) / 2
      val vp = math.sin(bigB * u / bigA)
      val up = (vp * math.cos(gamma0) + sp * math.sin(gamma0)) / tp
      val ts = math.pow(bigH / math.sqrt((1 + up) / (1 - up)), 1.0 / bigB)
      var phi = math.Pi / 2 - 2 * math.atan(ts)
      var j = 0
      while (j < 15) {
        val esin = e * math.sin(phi)
        phi = math.Pi / 2 - 2 * math.atan(ts *
          math.pow((1 - esin) / (1 + esin), e / 2))
        j += 1
      }
      val lam = lam0 - math.atan2(sp * math.cos(gamma0) - vp * math.sin(gamma0),
        math.cos(bigB * u / bigA)) / bigB
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  // ---- generic PROJJSON conversion-driven dispatch ----------------------
  // When a CRS arrives as a PROJJSON document whose EPSG code is NOT one
  // of the parameterizations above, read the projection method +
  // parameters + ellipsoid straight from the `conversion` object and
  // instantiate the matching family — any TM / LCC-2SP / AEA / LAEA /
  // polar-stereographic CRS works without being EPSG-keyed here (the
  // role pyproj's CRS.from_json plays for the reference,
  // `core/reproject.py:94-430`).

  // one shared mapper (Jackson ObjectMapper is thread-safe after
  // configuration) — constructing one per parseEpsg call put mapper
  // construction + a full JSON tree parse on the PER-ROW st_transform
  // path. Both caches are bounded: adversarially distinct documents
  // must not grow driver/executor memory without limit.
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val CacheCap = 1024

  private val epsgCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Int]]()

  private val projjsonCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Projection]]()

  private[graft] def projjsonProjection(crs: String): Option[Projection] = {
    val s = crs.trim
    if (!s.startsWith("{")) return None
    if (projjsonCache.size > CacheCap) projjsonCache.clear()
    projjsonCache.computeIfAbsent(s, { _ =>
      try buildFromProjjson(s) catch { case _: Exception => None }
    })
  }

  private def buildFromProjjson(s: String): Option[Projection] = {
    val node = jsonMapper.readTree(s)
    val conv = node.get("conversion")
    if (conv == null || conv.get("method") == null) return None
    // REFUSE (unsupported, loud at reproject) rather than silently
    // mis-project: non-metre projected axes (ftUS State Plane zones
    // would come out ~3.28x off) and non-Greenwich prime meridians
    // (Paris-based CRSs would shift 2.34 deg)
    val cs = node.get("coordinate_system")
    if (cs != null && cs.get("axis") != null) {
      var metric = true
      cs.get("axis").forEach { ax =>
        val u = ax.get("unit")
        if (u != null) {
          if (u.isTextual) { if (u.asText != "metre") metric = false }
          else {
            val f = Option(u.get("conversion_factor"))
              .map(_.asDouble).getOrElse(1.0)
            if (math.abs(f - 1.0) > 1e-12) metric = false
          }
        }
      }
      if (!metric) return None
    }
    val pm = Option(node.get("base_crs"))
      .flatMap(b => (Option(b.get("datum")) orElse
        Option(b.get("datum_ensemble"))))
      .flatMap(d => Option(d.get("prime_meridian")))
      .flatMap(m => Option(m.get("longitude")))
      .map(l => if (l.isNumber) l.asDouble else
        Option(l.get("value")).map(_.asDouble).getOrElse(0.0))
      .getOrElse(0.0)
    if (pm != 0.0) return None
    val method = conv.get("method")
    val methodCode: Int =
      Option(method.get("id")).flatMap(id => Option(id.get("code")))
        .map(c => if (c.isNumber) c.asInt else c.asText.toInt)
        .getOrElse {
          val n = Option(method.get("name")).map(_.asText.toLowerCase)
            .getOrElse("")
          if (n.contains("transverse mercator")) 9807
          // 1SP LCC has no standard parallels: matching it to the 2SP
          // builder made n = log(1)/log(1) = NaN and every transform
          // NaN'd silently — refuse so supported() answers honestly
          else if (n.contains("conic conformal") && n.contains("1sp")) -1
          else if (n.contains("conic conformal")) 9802
          else if (n.contains("albers")) 9822
          else if (n.contains("azimuthal equal area")) 9820
          else if (n.contains("polar stereographic") && n.contains("variant b")) 9829
          // variant C's latitude-of-standard-parallel/false-origin
          // parameterization is NOT the 9810 shape (a south-polar doc
          // would be projected as north polar) — refuse
          else if (n.contains("polar stereographic") && n.contains("variant c")) -1
          else if (n.contains("polar stereographic")) 9810
          else if (n.contains("krovak") &&
            (n.contains("north") || n.contains("east"))) 1041
          else if (n.contains("krovak")) 9819
          else if (n.contains("oblique mercator") && n.contains("variant b")) 9815
          else if (n.contains("oblique mercator") || n.contains("hotine")) 9812
          else if (n.contains("equidistant cylindrical") && n.contains("spherical")) 1029
          else if (n.contains("equidistant cylindrical")) 1028
          else if (n.contains("mollweide")) 54009
          else if (n.contains("sinusoidal")) 54008
          else if (n.contains("robinson")) 54030
          else if (n.contains("eckert iv") || n.contains("eckert_iv")) 54012
          else if (n.contains("eckert vi") || n.contains("eckert_vi")) 54010
          else if (n.contains("equal earth") || n.contains("equal_earth")) 8857
          else -1
        }
    // parameters by EPSG id and by lowercase name; values normalized to
    // degrees / metres (PROJJSON unit objects carry a conversion factor
    // to the SI base: radians for angles, metres for lengths)
    var byId = Map.empty[Int, Double]
    var byName = Map.empty[String, Double]
    val params = conv.get("parameters")
    if (params != null) params.forEach { p =>
      val raw = p.get("value").asDouble
      val unit = p.get("unit")
      val (isAngle, factor) =
        if (unit == null) (false, 1.0)
        else if (unit.isTextual) (unit.asText == "degree", 1.0)
        else {
          val tpe = Option(unit.get("type")).map(_.asText.toLowerCase).getOrElse("")
          val nm = Option(unit.get("name")).map(_.asText.toLowerCase).getOrElse("")
          (tpe.contains("angular") || nm.contains("degree") ||
            nm.contains("radian") || nm.contains("grad"),
            Option(unit.get("conversion_factor")).map(_.asDouble).getOrElse(1.0))
        }
      val v =
        if (unit == null || unit.isTextual) raw // degree / metre pass through
        else if (isAngle) math.toDegrees(raw * factor)
        else raw * factor
      Option(p.get("id")).flatMap(id => Option(id.get("code"))).foreach { c =>
        byId += (if (c.isNumber) c.asInt else c.asText.toInt) -> v
      }
      Option(p.get("name")).foreach(n => byName += n.asText.toLowerCase -> v)
    }
    def pv(id: Int, name: String, dflt: Double = 0.0): Double =
      byId.getOrElse(id, byName.getOrElse(name, dflt))
    // ellipsoid from base_crs (datum or datum_ensemble)
    val ell = Option(node.get("base_crs")).flatMap { b =>
      (Option(b.get("datum")) orElse Option(b.get("datum_ensemble")))
        .flatMap(d => Option(d.get("ellipsoid")))
    }
    // every ellipsoid number may be a bare number OR a {value, unit}
    // object (Jackson's asDouble on an object is 0.0 — flattening 1.0
    // and all-NaN coordinates, silently)
    def num(n: com.fasterxml.jackson.databind.JsonNode): Double =
      if (n.isNumber) n.asDouble
      else Option(n.get("value")).map(_.asDouble).getOrElse(Double.NaN)
    // sphere form {"radius": R}: a = R, flattening 0 — this is what
    // makes the e == 0 code paths reachable from EASE-grid-style docs
    val radius = ell.flatMap(e => Option(e.get("radius"))).map(num)
    val a = radius.orElse(
      ell.flatMap(e => Option(e.get("semi_major_axis"))).map(num))
      .getOrElse(A)
    val flat = if (radius.isDefined) 0.0 else ell.flatMap { e =>
      Option(e.get("inverse_flattening")).map(n => 1.0 / num(n))
        .orElse(Option(e.get("semi_minor_axis"))
          .map(b => 1.0 - num(b) / a))
    }.getOrElse(FWgs)
    if (a.isNaN || flat.isNaN) return None
    methodCode match {
      case 9807 => Some(new Tm(
        pv(8801, "latitude of natural origin"),
        pv(8802, "longitude of natural origin"),
        pv(8805, "scale factor at natural origin", 1.0),
        pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 9802 => Some(new Lcc2SP(
        pv(8823, "latitude of 1st standard parallel"),
        pv(8824, "latitude of 2nd standard parallel"),
        pv(8821, "latitude of false origin"),
        pv(8822, "longitude of false origin"),
        pv(8826, "easting at false origin"),
        pv(8827, "northing at false origin"), flat, a))
      case 9822 => Some(new Aea(
        pv(8823, "latitude of 1st standard parallel"),
        pv(8824, "latitude of 2nd standard parallel"),
        pv(8821, "latitude of false origin"),
        pv(8822, "longitude of false origin"),
        pv(8826, "easting at false origin"),
        pv(8827, "northing at false origin"), flat, a))
      case 9820 => Some(new Laea(
        pv(8801, "latitude of natural origin"),
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 9810 =>
        val lat0 = pv(8801, "latitude of natural origin", 90.0)
        Some(new PolarStereo(lat0, pv(8802, "longitude of natural origin"),
          pv(8806, "false easting"), pv(8807, "false northing"),
          north = lat0 >= 0,
          k0A = pv(8805, "scale factor at natural origin", 1.0), flat, a))
      case 9829 =>
        val ts = pv(8832, "latitude of standard parallel", 90.0)
        Some(new PolarStereo(ts, pv(8833, "longitude of origin"),
          pv(8806, "false easting"), pv(8807, "false northing"),
          north = ts >= 0, Double.NaN, flat, a))
      case 9804 => Some(new Merc( // Mercator variant A: explicit k0
        pv(8805, "scale factor at natural origin", 1.0),
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 9819 | 1041 => Some(new Krovak(
        pv(8811, "latitude of projection centre"),
        pv(8833, "longitude of origin"),
        pv(1036, "co-latitude of cone axis"),
        pv(8818, "latitude of pseudo standard parallel"),
        pv(8819, "scale factor on pseudo standard parallel", 1.0),
        pv(8806, "false easting"), pv(8807, "false northing"),
        flat, a, eastNorth = methodCode == 1041))
      case 9812 => Some(new HotineOm(
        pv(8811, "latitude of projection centre"),
        pv(8812, "longitude of projection centre"),
        pv(8813, "azimuth of initial line"),
        pv(8814, "angle from rectified to skew grid"),
        pv(8815, "scale factor on initial line", 1.0),
        pv(8806, "false easting"), pv(8807, "false northing"),
        variantB = false, flat, a))
      case 9815 => Some(new HotineOm(
        pv(8811, "latitude of projection centre"),
        pv(8812, "longitude of projection centre"),
        pv(8813, "azimuth of initial line"),
        pv(8814, "angle from rectified to skew grid"),
        pv(8815, "scale factor on initial line", 1.0),
        pv(8816, "easting at projection centre"),
        pv(8817, "northing at projection centre"),
        variantB = true, flat, a))
      case 1028 => Some(new EqCyl(
        pv(8823, "latitude of 1st standard parallel"),
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 1029 | 9823 => Some(new EqCyl( // spherical variant: e² = 0
        pv(8823, "latitude of 1st standard parallel"),
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), 0.0, a))
      case 9805 => // Mercator variant B: k0 from the standard parallel
        val e2 = 2 * flat - flat * flat
        val lat1 = math.toRadians(pv(8823, "latitude of 1st standard parallel"))
        val k0 = math.cos(lat1) / math.sqrt(1 - e2 * math.sin(lat1) * math.sin(lat1))
        Some(new Merc(k0, pv(8802, "longitude of natural origin"),
          pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 54009 => Some(new Mollweide(
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), a))
      case 54008 => Some(new Sinusoidal(
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), flat, a))
      case 54030 => Some(new Robinson(
        pv(8802, "longitude of natural origin"),
        pv(8806, "false easting"), pv(8807, "false northing"), a))
      case _ => None
    }
  }

  /** (lon-ish x, lat-ish y) in `from` CRS → `to` CRS, always XY. */
  def transform(x: Double, y: Double, from: String, to: String): (Double, Double) = {
    val f = try Some(parseEpsg(from)) catch { case _: Exception => None }
    val t = try Some(parseEpsg(to)) catch { case _: Exception => None }
    if (f.isDefined && f == t) return (x, y)
    val (lon, lat) = f match {
      case Some(c) if codeSupported(c) => toLonLat(x, y, c)
      case _ => projjsonProjection(from) match {
        case Some(p) => p.inverse(x, y)
        case None => toLonLat(x, y, f.getOrElse(
          throw new IllegalArgumentException(s"unsupported CRS: $from")))
      }
    }
    t match {
      case Some(c) if codeSupported(c) => fromLonLat(lon, lat, c)
      case _ => projjsonProjection(to) match {
        case Some(p) => p.forward(lon, lat)
        case None => fromLonLat(lon, lat, t.getOrElse(
          throw new IllegalArgumentException(s"unsupported CRS: $to")))
      }
    }
  }

  // NAD83 (269xx) and ETRS89 (258xx) are treated as WGS84-compatible
  // datums (sub-2m agreement) — the same simplification the reference's
  // fixtures rely on; the UTM math itself is exact per ellipsoid series.
  private def toLonLat(x: Double, y: Double, epsg: Int): (Double, Double) =
    epsg match {
      case 4326 | 4269 | 4258 => (x, y)
      case 3857 | 900913 => mercatorToLonLat(x, y)
      case 3395 => Merc3395.inverse(x, y)
      case 5070 => Albers5070.inverse(x, y)
      case 2154 => Lambert93.inverse(x, y)
      case 3035 => Laea3035.inverse(x, y)
      case z if isTm(z) => tmFor(z).inverse(x, y)
      case z if polarByCode.contains(z) => polarByCode(z).inverse(x, y)
      case z if worldByCode.contains(z) => worldByCode(z).inverse(x, y)
      case _ => throw new IllegalArgumentException(s"unsupported CRS EPSG:$epsg")
    }

  private def fromLonLat(lon: Double, lat: Double, epsg: Int): (Double, Double) =
    epsg match {
      case 4326 | 4269 | 4258 => (lon, lat)
      case 3857 | 900913 => lonLatToMercator(lon, lat)
      case 3395 => Merc3395.forward(lon, lat)
      case 5070 => Albers5070.forward(lon, lat)
      case 2154 => Lambert93.forward(lon, lat)
      case 3035 => Laea3035.forward(lon, lat)
      case z if isTm(z) => tmFor(z).forward(lon, lat)
      case z if polarByCode.contains(z) => polarByCode(z).forward(lon, lat)
      case z if worldByCode.contains(z) => worldByCode(z).forward(lon, lat)
      case _ => throw new IllegalArgumentException(s"unsupported CRS EPSG:$epsg")
    }

  def transformGeom(g: Geom, from: String, to: String): Geom =
    g.mapCoords((x, y) => transform(x, y, from, to))

  /** Rough geographic-vs-projected classification used for CRS gates
    * (reference `core/add_quadkey_column.py:78-143`, `core/extract.py:104-247`).
    */
  def isGeographic(crs: String): Boolean = {
    // PROJJSON carries the answer directly (reference is_geographic_crs,
    // core/extract.py:115-147): trust the document type before any code
    // or name heuristic — a ProjectedCRS whose base_crs is named
    // "WGS 84" must not classify as geographic via the substring fallback
    val t = crs.trim
    if (t.startsWith("{")) {
      try {
        val tpe = Option(jsonMapper.readTree(t).get("type"))
          .map(_.asText).getOrElse("")
        if (tpe == "GeographicCRS") return true
        if (tpe == "ProjectedCRS") return false
      } catch { case _: Exception => () }
    }
    try {
      val c = parseEpsg(crs)
      c == 4326 || c == 4269 || c == 4258
    } catch { case _: Exception =>
      val s = crs.toUpperCase
      s.contains("4326") || s.contains("CRS84") || s.contains("WGS 84") || s.contains("WGS84")
    }
  }
}
