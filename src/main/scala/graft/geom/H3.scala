package graft.geom

/** H3 cell indexing: `latLngToCell` for resolutions 0-15, re-implemented
  * from the published H3 algorithm (gnomonic projection onto icosahedron
  * faces + aperture-7 hex grid; see the public h3lib / Uber H3 papers).
  * The reference engine calls the DuckDB h3 community extension
  * (`core/add_h3_column.py:80-84` `h3_latlng_to_cell_string(lat, lng,
  * res)`); here the same cell math runs inside a codegen'd expression.
  *
  * Two kinds of data feed the algorithm:
  *  - geometric constants (face centers, face i-axis azimuths, aperture
  *    constants) — fixed published values of the H3 icosahedron
  *    orientation;
  *  - the face+IJK → base-cell lookup — NOT hardcoded here: it is derived
  *    at class-init from the 122-entry base-cell home table by inverse
  *    projection (each res-0 slot's sphere point is matched to the
  *    nearest base-cell center, and the frame rotation is measured by
  *    projecting a res-1 child onto both faces). The derivation
  *    self-checks (twin-slot consistency, home-slot zero-rotation,
  *    full 122-cell reachability, 12 pentagons) and the test suite pins
  *    canonical published vectors (e.g. SF res 9 = 8928308280fffff).
  */
object H3 {

  // ---- geometric constants (published H3 icosahedron orientation) -------

  private val Sqrt7 = 2.6457513110645905905016157536392604257102
  private val Res0UGnomonic = 0.38196601125010500003
  private val Sin60 = math.sqrt(3.0) / 2.0
  /** rotation between class II and class III grids: asin(sqrt(3/28)) */
  private val Ap7Rot = math.asin(math.sqrt(3.0 / 28.0))
  private val Eps = 1e-16

  /** (lat, lng) of the 20 face centers, radians. */
  private val faceCenterGeo: Array[Array[Double]] = Array(
    Array(0.803582649718989942, 1.248397419617396099),
    Array(1.307747883455638156, 2.536945009877921159),
    Array(1.054751253523952054, -1.347517358900396623),
    Array(0.600191595538186799, -0.450603909469755746),
    Array(0.491715428198773866, 0.401988202911306943),
    Array(0.172745327415618701, 1.678146885280433686),
    Array(0.605929321571350690, 2.953923329812411617),
    Array(0.427370518328979641, -1.888876200336285401),
    Array(-0.079066118549212831, -0.733429513380867741),
    Array(-0.230961644455383637, 0.506495587332349035),
    Array(0.079066118549212831, 2.408163140208925497),
    Array(0.230961644455383637, -2.635097066257444203),
    Array(-0.172745327415618701, -1.463445768309359553),
    Array(-0.605929321571350690, -0.187669323777381622),
    Array(-0.427370518328979641, 1.252716453253507838),
    Array(-0.600191595538186799, 2.690988744120037492),
    Array(-0.491715428198773866, -2.739604450678486295),
    Array(-0.803582649718989942, -1.893195233972397139),
    Array(-1.307747883455638156, -0.604647643711872080),
    Array(-1.054751253523952054, 1.794075294689396615))

  /** azimuth (radians, from face center) of each face's i-axis. */
  private val faceAzI: Array[Double] = Array(
    5.619958268523939882, 5.760339081714187279, 0.780213654393430055,
    0.430469363979999913, 6.130269123335111400, 2.692877706530642877,
    2.982963003477243874, 3.532912002790141181, 3.494305004259568154,
    3.003214169499538391, 5.930472956509811562, 0.138378484090254847,
    0.448714947059150361, 0.158629650112549365, 5.891865957979238535,
    2.711123289609793325, 3.294508837434268316, 3.804819692245439833,
    3.664438879055192436, 2.361378999196363184)

  /** 3D unit vectors of the face centers (derived). */
  private val faceCenterXyz: Array[Array[Double]] = faceCenterGeo.map { g =>
    Array(math.cos(g(0)) * math.cos(g(1)), math.cos(g(0)) * math.sin(g(1)),
      math.sin(g(0)))
  }

  // ---- base cell data ----------------------------------------------------
  // home face, home i, j, k, isPentagon, and for belt pentagons the two
  // faces whose frame is clockwise-offset from the home frame.

  private val bcFace = Array(
    1, 2, 1, 2, 0, 1, 1, 2, 0, 2, 1, 1, 3, 3, 11, 4, 0, 6, 0, 2,
    7, 2, 0, 6, 10, 6, 3, 11, 4, 3, 0, 4, 5, 0, 7, 11, 7, 10, 12, 6,
    7, 4, 3, 3, 4, 6, 11, 8, 5, 14, 5, 12, 10, 4, 12, 7, 11, 10, 13, 10,
    11, 9, 8, 6, 8, 9, 14, 5, 16, 8, 5, 12, 7, 12, 10, 9, 13, 16, 15, 15,
    16, 14, 13, 5, 8, 14, 9, 14, 17, 12, 16, 17, 15, 16, 9, 15, 13, 8, 13, 17,
    19, 14, 19, 17, 13, 17, 16, 9, 15, 15, 18, 18, 19, 17, 19, 18, 18, 19, 19, 18,
    19, 18)

  private val bcI = Array(
    1, 1, 0, 1, 2, 1, 0, 0, 1, 0, 0, 0, 1, 1, 2, 1, 0, 0, 0, 0,
    0, 0, 1, 0, 2, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 1, 2, 1,
    1, 0, 0, 0, 0, 1, 0, 0, 0, 2, 0, 1, 1, 0, 1, 1, 0, 0, 2, 0,
    0, 0, 0, 2, 0, 0, 1, 1, 0, 1, 1, 0, 2, 0, 0, 0, 1, 0, 0, 0,
    0, 1, 1, 2, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 2, 0, 1,
    0, 0, 0, 0, 0, 0, 1, 2, 1, 1, 0, 0, 0, 1, 0, 0, 1, 2, 1, 0,
    1, 1)

  private val bcJ = Array(
    0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 0, 1, 0, 0, 0, 1, 0, 1,
    0, 0, 1, 0, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1, 1, 0, 0, 0, 0,
    0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 1, 0, 0, 0,
    0, 1, 1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 1, 1,
    1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0,
    1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0,
    0, 0)

  private val bcK = Array(
    0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1,
    1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1,
    1, 0, 0, 0, 0, 1, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0,
    0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 0, 0, 0, 0, 1,
    0, 0, 1, 0, 1, 0, 0, 0, 1, 0, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0,
    1, 0)

  /** the 12 pentagon base cells (icosahedron vertices). */
  private val pentagons =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  /** for each pentagon, the two adjacent faces whose frame is offset
    * clockwise (drives the leading-K-digit rotation direction).
    */
  private val cwOffsetPent: Map[Int, (Int, Int)] = Map(
    14 -> (2, 6), 24 -> (1, 5), 38 -> (3, 7), 49 -> (0, 9), 58 -> (4, 8),
    63 -> (11, 15), 72 -> (12, 16), 83 -> (10, 19), 97 -> (13, 17),
    107 -> (14, 18))

  def isPentagon(bc: Int): Boolean = pentagons.contains(bc)

  // ---- small spherical helpers ------------------------------------------

  private def posAngle(a: Double): Double = {
    var x = a
    while (x < 0.0) x += 2.0 * math.Pi
    while (x >= 2.0 * math.Pi) x -= 2.0 * math.Pi
    x
  }

  private def constrainLng(l: Double): Double = {
    var x = l
    while (x > math.Pi) x -= 2.0 * math.Pi
    while (x < -math.Pi) x += 2.0 * math.Pi
    x
  }

  private def geoAzimuth(lat1: Double, lng1: Double, lat2: Double,
      lng2: Double): Double =
    math.atan2(math.cos(lat2) * math.sin(lng2 - lng1),
      math.cos(lat1) * math.sin(lat2) -
        math.sin(lat1) * math.cos(lat2) * math.cos(lng2 - lng1))

  /** destination point from (lat,lng) along azimuth az, arc distance d. */
  private def azDistancePoint(lat: Double, lng: Double, azIn: Double,
      d: Double): (Double, Double) = {
    if (d < Eps) return (lat, lng)
    val az = posAngle(azIn)
    if (az < Eps || math.abs(az - math.Pi) < Eps) {
      val lat2 = if (az < Eps) lat + d else lat - d
      if (math.abs(lat2 - math.Pi / 2) < Eps) (math.Pi / 2, 0.0)
      else if (math.abs(lat2 + math.Pi / 2) < Eps) (-math.Pi / 2, 0.0)
      else (lat2, constrainLng(lng))
    } else {
      val sinLat2 = math.max(-1.0, math.min(1.0,
        math.sin(lat) * math.cos(d) +
          math.cos(lat) * math.sin(d) * math.cos(az)))
      val lat2 = math.asin(sinLat2)
      if (math.abs(lat2 - math.Pi / 2) < Eps) (math.Pi / 2, 0.0)
      else if (math.abs(lat2 + math.Pi / 2) < Eps) (-math.Pi / 2, 0.0)
      else {
        val sinLng = math.sin(az) * math.sin(d) / math.cos(lat2)
        val cosLng = (math.cos(d) - math.sin(lat) * sinLat2) /
          (math.cos(lat) * math.cos(lat2))
        (lat2, constrainLng(lng + math.atan2(sinLng, cosLng)))
      }
    }
  }

  private def sphereDist(lat1: Double, lng1: Double, lat2: Double,
      lng2: Double): Double = {
    val sl = math.sin((lat2 - lat1) / 2)
    val sg = math.sin((lng2 - lng1) / 2)
    val a = sl * sl + math.cos(lat1) * math.cos(lat2) * sg * sg
    2.0 * math.asin(math.min(1.0, math.sqrt(a)))
  }

  // ---- IJK coordinate ops (aperture-7 hex grid) --------------------------

  private def ijkNormalize(cIn: Array[Int]): Array[Int] = {
    val c = cIn
    // remove any negative components by axis translation
    if (c(0) < 0) { c(1) -= c(0); c(2) -= c(0); c(0) = 0 }
    if (c(1) < 0) { c(0) -= c(1); c(2) -= c(1); c(1) = 0 }
    if (c(2) < 0) { c(0) -= c(2); c(1) -= c(2); c(2) = 0 }
    var m = math.min(c(0), math.min(c(1), c(2)))
    if (m > 0) { c(0) -= m; c(1) -= m; c(2) -= m }
    c
  }

  private def upAp7(c: Array[Int]): Array[Int] = {
    val i = c(0) - c(2); val j = c(1) - c(2)
    ijkNormalize(Array(math.round((3 * i - j) / 7.0).toInt,
      math.round((i + 2 * j) / 7.0).toInt, 0))
  }

  private def upAp7r(c: Array[Int]): Array[Int] = {
    val i = c(0) - c(2); val j = c(1) - c(2)
    ijkNormalize(Array(math.round((2 * i + j) / 7.0).toInt,
      math.round((3 * j - i) / 7.0).toInt, 0))
  }

  private def downAp7(c: Array[Int]): Array[Int] =
    // i-axis -> (3,0,1), j -> (1,3,0), k -> (0,1,3)
    ijkNormalize(Array(3 * c(0) + 1 * c(1), 3 * c(1) + 1 * c(2),
      1 * c(0) + 3 * c(2)))

  private def downAp7r(c: Array[Int]): Array[Int] =
    // i-axis -> (3,1,0), j -> (0,3,1), k -> (1,0,3)
    ijkNormalize(Array(3 * c(0) + 1 * c(2), 1 * c(0) + 3 * c(1),
      1 * c(1) + 3 * c(2)))

  private val unitVecDigit: Map[(Int, Int, Int), Int] = Map(
    (0, 0, 0) -> 0, (0, 0, 1) -> 1, (0, 1, 0) -> 2, (0, 1, 1) -> 3,
    (1, 0, 0) -> 4, (1, 0, 1) -> 5, (1, 1, 0) -> 6)

  private val digitUnitVec: Array[Array[Int]] = Array(
    Array(0, 0, 0), Array(0, 0, 1), Array(0, 1, 0), Array(0, 1, 1),
    Array(1, 0, 0), Array(1, 0, 1), Array(1, 1, 0))

  /** digit rotation: one 60° ccw step. i->ij->j->jk->k->ik->i */
  private val rotDigitCcw = Array(0, 5, 3, 1, 6, 4, 2)
  /** digit rotation: one 60° cw step. i->ik->k->jk->j->ij->i */
  private val rotDigitCw = Array(0, 3, 6, 2, 5, 1, 4)

  // ---- projections -------------------------------------------------------

  private def isClassIII(res: Int): Boolean = (res & 1) == 1

  /** hex2d coords of a geo point on a FIXED face at a resolution. */
  private def geoToHex2dOnFace(face: Int, lat: Double, lng: Double,
      res: Int): (Double, Double) = {
    val p = faceCenterXyz(face)
    val x = math.cos(lat) * math.cos(lng)
    val y = math.cos(lat) * math.sin(lng)
    val z = math.sin(lat)
    val dx = x - p(0); val dy = y - p(1); val dz = z - p(2)
    geoToHex2dOnFaceSqd(face, lat, lng, res, dx * dx + dy * dy + dz * dz)
  }

  /** Same, with the face-center squared chord distance already in hand —
    * the per-row path computes it in [[nearestFaceSqd]]; recomputing the
    * point's 3D vector and the distance here doubled the trig per call
    * (h3lib's _geoToClosestFace returns sqd for exactly this reason).
    */
  private def geoToHex2dOnFaceSqd(face: Int, lat: Double, lng: Double,
      res: Int, sqd: Double): (Double, Double) = {
    var r = math.acos(math.max(-1.0, math.min(1.0, 1.0 - sqd / 2.0)))
    if (r < Eps) return (0.0, 0.0)
    var theta = posAngle(faceAzI(face) -
      posAngle(geoAzimuth(faceCenterGeo(face)(0), faceCenterGeo(face)(1),
        lat, lng)))
    if (isClassIII(res)) theta = posAngle(theta - Ap7Rot)
    r = math.tan(r) / Res0UGnomonic
    var i = 0
    while (i < res) { r *= Sqrt7; i += 1 }
    (r * math.cos(theta), r * math.sin(theta))
  }

  /** nearest face to a geo point, plus its squared chord distance. */
  private def nearestFaceSqd(lat: Double, lng: Double): (Int, Double) = {
    val x = math.cos(lat) * math.cos(lng)
    val y = math.cos(lat) * math.sin(lng)
    val z = math.sin(lat)
    var best = 0; var bestSqd = Double.MaxValue
    var f = 0
    while (f < 20) {
      val p = faceCenterXyz(f)
      val dx = x - p(0); val dy = y - p(1); val dz = z - p(2)
      val sqd = dx * dx + dy * dy + dz * dz
      if (sqd < bestSqd) { bestSqd = sqd; best = f }
      f += 1
    }
    (best, bestSqd)
  }

  /** nearest face to a geo point. */
  private def nearestFace(lat: Double, lng: Double): Int =
    nearestFaceSqd(lat, lng)._1

  /** hex2d -> nearest hex cell IJK (published H3 rounding). */
  private def hex2dToIjk(xIn: Double, yIn: Double): Array[Int] = {
    val a1 = math.abs(xIn); val a2 = math.abs(yIn)
    val x2 = a2 / Sin60
    val x1 = a1 + x2 / 2.0
    val m1 = x1.toInt; val m2 = x2.toInt
    val r1 = x1 - m1; val r2 = x2 - m2
    var i = 0; var j = 0
    if (r1 < 0.5) {
      if (r1 < 1.0 / 3.0) {
        i = m1
        j = if (r2 < (1.0 + r1) / 2.0) m2 else m2 + 1
      } else {
        j = if (r2 < (1.0 - r1)) m2 else m2 + 1
        i = if ((1.0 - r1) <= r2 && r2 < (2.0 * r1)) m1 + 1 else m1
      }
    } else {
      if (r1 < 2.0 / 3.0) {
        j = if (r2 < (1.0 - r1)) m2 else m2 + 1
        i = if ((2.0 * r1 - 1.0) < r2 && r2 < (1.0 - r1)) m1 else m1 + 1
      } else {
        i = m1 + 1
        j = if (r2 < (r1 / 2.0)) m2 else m2 + 1
      }
    }
    // fold negative axes back
    if (xIn < 0.0) {
      if (j % 2 == 0) { val axisi = j / 2; val diff = i - axisi; i = i - 2 * diff }
      else { val axisi = (j + 1) / 2; val diff = i - axisi; i = i - (2 * diff + 1) }
    }
    if (yIn < 0.0) { i = i - (2 * j + 1) / 2; j = -j }
    ijkNormalize(Array(i, j, 0))
  }

  /** inverse: geo point of a FaceIJK at a resolution (no substrate). */
  private def faceIjkToGeo(face: Int, c: Array[Int], res: Int): (Double, Double) = {
    val i = c(0) - c(2); val j = c(1) - c(2)
    val vx = i - 0.5 * j
    val vy = j * Sin60
    var r = math.sqrt(vx * vx + vy * vy)
    if (r < Eps)
      return (faceCenterGeo(face)(0), faceCenterGeo(face)(1))
    var theta = math.atan2(vy, vx)
    var q = 0
    while (q < res) { r /= Sqrt7; q += 1 }
    r = math.atan(r * Res0UGnomonic)
    if (isClassIII(res)) theta = posAngle(theta + Ap7Rot)
    theta = posAngle(faceAzI(face) - theta)
    azDistancePoint(faceCenterGeo(face)(0), faceCenterGeo(face)(1), theta, r)
  }

  // ---- derived face+IJK -> (base cell, ccw rotations) table --------------

  /** geo center of a base cell (home-face inverse projection). */
  private def baseCellCenter(bc: Int): (Double, Double) =
    faceIjkToGeo(bcFace(bc), Array(bcI(bc), bcJ(bc), bcK(bc)), 0)

  private def inBox(c: Array[Int]): Boolean =
    c(0) >= 0 && c(0) <= 2 && c(1) >= 0 && c(1) <= 2 && c(2) >= 0 && c(2) <= 2

  private def ccwSteps(from: Int, to: Int): Int = {
    var d = from; var r = 0
    while (d != to && r < 6) { d = rotDigitCcw(d); r += 1 }
    if (d == to) r else -1
  }

  /** packed (bc << 3 | ccwRot60) for each face and i,j,k in 0..2 —
    * derived by [[deriveTable]], pinned as a constant: the derivation costs
    * ~10^5 trial projections plus pentagon ring searches at class init
    * (paid per executor JVM on the codegen'd expression path), and any
    * floating-point environment where one of its require()s trips
    * would surface as ExceptionInInitializerError killing every H3
    * query. H3Spec re-derives the table and asserts it matches this
    * constant, so the derivation machinery remains the checked source
    * of truth without riding the hot path.
    */
  private val fijkBaseCell: Array[Int] =
    (
      "128 144 192 264 240 259 393 387 403 64 45 85 176 128 144 329 264 240 " +
      "32 5 21 121 64 45 249 176 128 16 48 112 80 88 139 193 187 203 0 13 " +
      "77 40 16 48 145 80 88 33 29 61 65 0 13 129 40 16 56 168 304 72 152 " +
      "275 113 163 291 24 109 237 8 56 168 49 72 152 34 101 213 1 24 109 17 " +
      "8 56 208 336 464 232 344 499 305 379 515 96 229 357 104 208 336 169 " +
      "232 344 35 125 253 25 96 229 57 104 208 248 328 392 352 424 491 465 " +
      "523 603 120 181 269 224 248 328 337 352 424 36 69 133 97 120 181 209 " +
      "224 248 400 384 395 256 243 267 195 147 131 560 536 531 419 400 384 " +
      "299 256 243 664 699 683 595 560 536 459 419 400 200 184 195 136 91 " +
      "83 115 51 19 360 312 299 283 200 184 219 136 91 504 475 459 451 360 " +
      "312 371 283 200 288 160 115 272 155 75 307 171 59 440 320 219 435 " +
      "288 160 411 272 155 576 483 371 587 440 320 571 435 288 512 376 307 " +
      "496 347 235 467 339 211 672 552 411 659 512 376 611 496 347 776 715 " +
      "571 787 672 552 771 659 512 600 520 467 488 427 355 395 331 251 752 " +
      "688 611 651 600 520 531 488 427 856 835 771 811 752 688 683 651 600 " +
      "456 472 507 592 627 635 667 739 763 296 315 363 416 456 472 563 592 " +
      "627 192 187 203 259 296 315 403 416 456 368 480 579 448 547 643 507 " +
      "619 723 216 323 443 280 368 480 363 448 547 112 163 291 139 216 323 " +
      "203 280 368 568 712 779 584 731 827 579 707 843 408 555 675 432 568 " +
      "712 443 584 731 304 379 515 275 408 555 291 432 568 768 832 859 784 " +
      "883 923 779 891 955 608 691 755 656 768 832 675 784 883 464 523 603 " +
      "499 608 691 515 656 768 680 696 667 808 819 803 859 899 915 528 539 " +
      "563 648 680 696 755 808 819 392 387 403 491 528 539 603 648 680 760 " +
      "736 664 632 624 595 505 475 459 872 864 805 745 760 736 617 632 624 " +
      "940 949 917 849 872 864 721 745 760 720 616 504 640 544 451 577 483 " +
      "371 848 744 637 793 720 616 705 640 544 939 877 765 905 848 744 841 " +
      "793 720 840 704 576 824 728 587 777 715 571 904 792 645 929 840 704 " +
      "889 824 728 938 853 725 969 904 792 953 929 840 952 888 776 920 880 " +
      "787 857 835 771 968 928 829 961 952 888 897 920 880 937 909 845 945 " +
      "968 928 913 961 952 912 896 856 800 816 811 665 699 683 944 960 925 " +
      "865 912 896 737 800 816 936 973 957 873 944 960 761 865 912 "
    ).trim.split(' ').map(_.toInt)


  /** test access: H3Spec pins deriveTable() == this constant. */
  private[graft] def pinnedTable: Array[Int] = fijkBaseCell

  /** Re-derives [[fijkBaseCell]] in three phases: (1) each slot's base
    * cell by nearest-center matching (inverse projection of the slot vs
    * the 122 home-derived centers — robust, centers are ≥ 0.17 rad
    * apart); (2) hexagon slot rotations from res-0 neighbor topology
    * (which neighboring base cell lies in each hex direction, seen from
    * both frames — pure table lookups, no cross-face projection); (3)
    * pentagon slot rotations by searching the rotation assignment under
    * which sample rings around the pentagon's vertex tile into exactly
    * the 6 valid children with contiguous arcs at res 1 and 2 (wrong
    * rotations tear the tiling). Test-only at runtime: H3Spec asserts
    * derived == pinned.
    */
  private[graft] def deriveTable(): Array[Int] = {
    val centers = Array.tabulate(122)(baseCellCenter)
    // sanity: base-cell centers are pairwise distinct on the sphere
    for (a <- 0 until 122; b <- (a + 1) until 122) {
      val d = sphereDist(centers(a)._1, centers(a)._2,
        centers(b)._1, centers(b)._2)
      require(d > 0.1, s"base cells $a/$b centers collide: $d")
    }
    // ---- phase 1: base cell per slot ----
    val slotBc = Array.fill(20 * 27)(-1)
    val seen = scala.collection.mutable.Set[Int]()
    for (f <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      // the slot's cell is the unique base cell whose center, projected
      // onto THIS face and hex-rounded, lands on the slot coords — the
      // exact criterion the forward algorithm applies to points
      val norm = ijkNormalize(Array(i, j, k))
      val matches = (0 until 122).filter { b =>
        // gnomonic projection is only meaningful within the hemisphere;
        // antipodal centers would otherwise alias near the face center
        sphereDist(faceCenterGeo(f)(0), faceCenterGeo(f)(1),
          centers(b)._1, centers(b)._2) < 1.2 && {
          val (x, y) = geoToHex2dOnFace(f, centers(b)._1, centers(b)._2, 0)
          val c = hex2dToIjk(x, y)
          c(0) == norm(0) && c(1) == norm(1) && c(2) == norm(2)
        }
      }
      require(matches.size == 1,
        s"slot $f/$i$j$k matched by base cells $matches")
      slotBc(f * 27 + i * 9 + j * 3 + k) = matches.head
      seen += matches.head
    }
    require(seen.size == 122, s"only ${seen.size}/122 base cells reachable")
    for (bc <- 0 until 122)
      require(slotBc(bcFace(bc) * 27 + bcI(bc) * 9 + bcJ(bc) * 3 + bcK(bc)) == bc,
        s"home slot of $bc holds another cell")

    def bcAt(f: Int, c: Array[Int]): Int =
      if (inBox(c)) slotBc(f * 27 + c(0) * 9 + c(1) * 3 + c(2)) else -1

    // ---- phase 2: hexagon slot rotations via neighbor topology ----
    val slotRot = Array.fill(20 * 27)(-1)
    for (f <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      val idx = f * 27 + i * 9 + j * 3 + k
      val bc = slotBc(idx)
      if (!isPentagon(bc)) {
        val h = bcFace(bc)
        val homeC = Array(bcI(bc), bcJ(bc), bcK(bc))
        val rots = for {
          d <- 1 to 6
          nf = ijkNormalize(Array(i + digitUnitVec(d)(0), j + digitUnitVec(d)(1),
            k + digitUnitVec(d)(2)))
          nbBc = bcAt(f, nf)
          if nbBc >= 0 && nbBc != bc
          dh <- 1 to 6
          nh = ijkNormalize(Array(homeC(0) + digitUnitVec(dh)(0),
            homeC(1) + digitUnitVec(dh)(1), homeC(2) + digitUnitVec(dh)(2)))
          if bcAt(h, nh) == nbBc
        } yield ccwSteps(d, dh)
        require(rots.nonEmpty, s"no shared neighbor for face $f slot $i$j$k (bc $bc)")
        require(rots.distinct.size == 1,
          s"inconsistent rots ${rots.distinct} for face $f slot $i$j$k (bc $bc)")
        require(rots.head >= 0, s"non-rotational frame map at face $f slot $i$j$k")
        slotRot(idx) = rots.head
      }
    }

    // ---- phase 3: pentagon slot rotations via ring tiling search ----
    // temporary packed table; pentagon slots get candidate rotations
    // poked in during the search
    val packed = Array.tabulate(20 * 27) { ix =>
      if (slotRot(ix) >= 0) (slotBc(ix) << 3) | slotRot(ix) else (slotBc(ix) << 3)
    }
    // destination point handling the degenerate pole case (rings around
    // the polar pentagons parameterize longitude directly)
    def ringPoint(vlat: Double, vlng: Double, az: Double,
        d: Double): (Double, Double) =
      if (vlat > math.Pi / 2 - 1e-9) (math.Pi / 2 - d, constrainLng(az))
      else if (vlat < -math.Pi / 2 + 1e-9) (-math.Pi / 2 + d, constrainLng(az))
      else azDistancePoint(vlat, vlng, az, d)

    for (bc <- 0 until 122 if isPentagon(bc)) {
      val h = bcFace(bc)
      val vertex = centers(bc)
      def slotsOf(f: Int): Seq[Int] =
        (0 until 27).filter(s => slotBc(f * 27 + s) == bc)
      // the 5 faces meeting at this vertex, in azimuth order, home first
      val ringAll = (0 until 20).filter(f => slotsOf(f).nonEmpty)
        .sortBy(f => posAngle(geoAzimuth(vertex._1, vertex._2,
          faceCenterGeo(f)(0), faceCenterGeo(f)(1))))
      require(ringAll.size == 5, s"pentagon $bc vertex ring is $ringAll")
      val hIx = ringAll.indexOf(h)
      // frame rotation between two edge-adjacent ring faces, measured by
      // the hexagon cells around the vertex shared by both face grids
      def stepRot(f: Int, g: Int): Int = {
        val sf = slotsOf(f).head
        val sg = slotsOf(g).head
        val cf = Array(sf / 9, (sf / 3) % 3, sf % 3)
        val cg = Array(sg / 9, (sg / 3) % 3, sg % 3)
        val rots = for {
          d <- 1 to 6
          nf = ijkNormalize(Array(cf(0) + digitUnitVec(d)(0),
            cf(1) + digitUnitVec(d)(1), cf(2) + digitUnitVec(d)(2)))
          nbBc = bcAt(f, nf)
          if nbBc >= 0 && nbBc != bc
          dg <- 1 to 6
          ng = ijkNormalize(Array(cg(0) + digitUnitVec(dg)(0),
            cg(1) + digitUnitVec(dg)(1), cg(2) + digitUnitVec(dg)(2)))
          if bcAt(g, ng) == nbBc
        } yield ccwSteps(d, dg)
        require(rots.nonEmpty && rots.distinct.size == 1 && rots.head >= 0,
          s"pentagon $bc step $f->$g rots $rots")
        rots.head
      }
      def setRots(assign: Map[Int, Int]): Unit =
        for ((f, r) <- assign; s <- slotsOf(f))
          packed(f * 27 + s) = (bc << 3) | r
      // validation: a ring of points at ~0.65 hex units from the vertex
      // (inside the band of ring-1 children under the vertex's 1.26-1.57×
      // gnomonic distortion) must tile into exactly the 5 non-center,
      // non-K children {2..6}, each as one contiguous arc
      def ringValid(res: Int, n: Int): Boolean = {
        val radius = 0.65 * math.atan(Res0UGnomonic) / math.pow(Sqrt7, res)
        val ids = Array.tabulate(n) { t =>
          val az = 2.0 * math.Pi * t / n
          val (la, lo) = ringPoint(vertex._1, vertex._2, az, radius)
          latLngToCellImpl(la, lo, res, packed)
        }
        val parentOk = ids.forall { id =>
          getBaseCell(id) == bc &&
            (1 until res).forall(r => getDigit(id, r) == 0)
        }
        var changes = 0
        for (t <- ids.indices)
          if (ids(t) != ids((t + 1) % ids.length)) changes += 1
        parentOk && changes == 5 &&
          ids.map(getDigit(_, res)).toSet == Set(2, 3, 4, 5, 6)
      }
      // Around a degree-5 vertex the five 72° face wedges map onto six
      // 60° hex frame steps, so exactly ONE ring edge carries a 2-step
      // frame jump (the pentagon "defect") while neighbor measurement
      // sees every edge as 1 step. Composition along any path that
      // avoids the defect edge is exact: try each edge as the carrier
      // and keep the assignment whose vertex ring tiles cleanly.
      var ok = false
      var solution: Map[Int, Int] = null
      for (defect <- 0 until 5 if !ok) {
        def m5(x: Int): Int = ((x % 5) + 5) % 5
        val rotOf = scala.collection.mutable.Map(h -> 0)
        // walk fwd from home up to (but not across) the defect edge
        var ix = hIx
        while (m5(ix) != defect && rotOf.size < 5) {
          val cur = ringAll(m5(ix)); val nxt = ringAll(m5(ix + 1))
          rotOf(nxt) = ((rotOf(cur) - stepRot(cur, nxt)) % 6 + 6) % 6
          ix += 1
        }
        // walk bwd from home down to the defect edge
        ix = hIx
        while (m5(ix - 1) != defect && rotOf.size < 5) {
          val cur = ringAll(m5(ix)); val prv = ringAll(m5(ix - 1))
          rotOf(prv) = (rotOf(cur) + stepRot(prv, cur)) % 6
          ix -= 1
        }
        if (rotOf.size == 5) {
          setRots(rotOf.toMap)
          if (ringValid(1, 720) && ringValid(2, 1440)) {
            ok = true
            solution = rotOf.toMap
          }
        }
      }
      if (ok) setRots(solution)
      if (!ok && System.getProperty("graft.h3.debug") != null) {
        val radius = 0.65 * math.atan(Res0UGnomonic) / Sqrt7
        val dump = (0 until 72).map { t =>
          val az = 2.0 * math.Pi * t / 72
          val (la, lo) = ringPoint(vertex._1, vertex._2, az, radius)
          val id = latLngToCellImpl(la, lo, 1, packed)
          s"${nearestFace(la, lo)}:${getBaseCell(id)}.${getDigit(id, 1)}"
        }
        println(s"pentagon $bc home $h ring $ringAll (last trial table)")
        println(dump.grouped(12).map(_.mkString(" ")).mkString("\n"))
      }
      require(ok, s"pentagon $bc: no rotation assignment tiles the vertex ring")
    }
    // twin consistency: ijk and ijk+(1,1,1) address the same cell
    for (f <- 0 until 20; i <- 0 to 1; j <- 0 to 1; k <- 0 to 1)
      require(packed(f * 27 + i * 9 + j * 3 + k) ==
        packed(f * 27 + (i + 1) * 9 + (j + 1) * 3 + (k + 1)),
        s"twin slots disagree at face $f ($i,$j,$k)")
    // home slots carry rotation 0
    for (bc <- 0 until 122) {
      val v = packed(bcFace(bc) * 27 + bcI(bc) * 9 + bcJ(bc) * 3 + bcK(bc))
      require(v == (bc << 3), s"home slot of $bc is not ($bc, rot 0): $v")
    }
    packed
  }

  // ---- H3 index bit packing ---------------------------------------------

  private val ModeCell = 1L
  private def initIndex(res: Int): Long =
    (ModeCell << 59) | (res.toLong << 52) | 0x1fffffffffffL

  private def setDigit(h: Long, r: Int, digit: Int): Long = {
    val off = (15 - r) * 3
    (h & ~(7L << off)) | (digit.toLong << off)
  }

  private def getDigit(h: Long, r: Int): Int =
    ((h >> ((15 - r) * 3)) & 7L).toInt

  private def setBaseCell(h: Long, bc: Int): Long =
    (h & ~(0x7fL << 45)) | (bc.toLong << 45)

  /** resolution of an index. */
  def getResolution(h: Long): Int = ((h >> 52) & 0xfL).toInt

  /** base cell of an index. */
  def getBaseCell(h: Long): Int = ((h >> 45) & 0x7fL).toInt

  private def leadingNonZeroDigit(h: Long, res: Int): Int = {
    var r = 1
    while (r <= res) {
      val d = getDigit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  private def rotate60(h: Long, res: Int, table: Array[Int]): Long = {
    var out = h
    var r = 1
    while (r <= res) {
      out = setDigit(out, r, table(getDigit(out, r)))
      r += 1
    }
    out
  }

  private def rotatePent60ccw(h: Long, res: Int): Long = {
    var out = h
    var foundFirst = false
    var r = 1
    while (r <= res) {
      out = setDigit(out, r, rotDigitCcw(getDigit(out, r)))
      if (!foundFirst && getDigit(out, r) != 0) {
        foundFirst = true
        if (leadingNonZeroDigit(out, res) == 1)
          out = rotate60(out, res, rotDigitCcw)
      }
      r += 1
    }
    out
  }

  // ---- the public surface ------------------------------------------------

  /** core pipeline, radians in, parameterized by the lookup table so the
    * table derivation itself can run trial tables through it.
    */
  private def latLngToCellImpl(lat: Double, lng: Double, res: Int,
      table: Array[Int]): Long = {
    val (face, sqd) = nearestFaceSqd(lat, lng)
    val (x, y) = geoToHex2dOnFaceSqd(face, lat, lng, res, sqd)
    var ijk = hex2dToIjk(x, y)

    var h = initIndex(res)
    if (res > 0) {
      var r = res - 1
      while (r >= 0) {
        val last = ijk
        var lastCenter: Array[Int] = null
        if (isClassIII(r + 1)) { ijk = upAp7(last); lastCenter = downAp7(ijk) }
        else { ijk = upAp7r(last); lastCenter = downAp7r(ijk) }
        val diff = ijkNormalize(Array(last(0) - lastCenter(0),
          last(1) - lastCenter(1), last(2) - lastCenter(2)))
        h = setDigit(h, r + 1, unitVecDigit((diff(0), diff(1), diff(2))))
        r -= 1
      }
    }
    val v = table(face * 27 + ijk(0) * 9 + ijk(1) * 3 + ijk(2))
    val bc = v >> 3
    val rots = v & 7
    h = setBaseCell(h, bc)
    if (isPentagon(bc)) {
      if (leadingNonZeroDigit(h, res) == 1) {
        h = if (cwOffsetPent.get(bc).exists(p => p._1 == face || p._2 == face))
          rotate60(h, res, rotDigitCw)
        else rotate60(h, res, rotDigitCcw)
      }
      var i = 0
      while (i < rots) { h = rotatePent60ccw(h, res); i += 1 }
    } else {
      var i = 0
      while (i < rots) { h = rotate60(h, res, rotDigitCcw); i += 1 }
    }
    h
  }

  /** H3 cell of a (lat, lng) in DEGREES at a resolution 0..15. */
  def latLngToCell(latDeg: Double, lngDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= 15, s"H3 resolution must be 0-15, got $res")
    latLngToCellImpl(math.toRadians(latDeg), math.toRadians(lngDeg), res,
      fijkBaseCell)
  }

  /** lowercase-hex cell string, the reference's
    * `h3_latlng_to_cell_string` output format.
    */
  def latLngToCellString(latDeg: Double, lngDeg: Double, res: Int): String =
    java.lang.Long.toHexString(latLngToCell(latDeg, lngDeg, res))

  /** parent of a cell at a coarser resolution (digit truncation). */
  def cellToParent(h: Long, parentRes: Int): Long = {
    val res = getResolution(h)
    require(parentRes >= 0 && parentRes <= res, "invalid parent res")
    var out = (h & ~(0xfL << 52)) | (parentRes.toLong << 52)
    var r = parentRes + 1
    while (r <= res) { out = setDigit(out, r, 7); r += 1 }
    out
  }

  /** True iff the index is a pentagon CELL: pentagon base cell with an
    * all-zero digit path (any nonzero digit moves off the pentagon
    * center into a plain hexagon).
    */
  private[graft] def isPentagonCell(h: Long): Boolean = {
    if (!isPentagon(getBaseCell(h))) return false
    val res = getResolution(h)
    var r = 1
    while (r <= res) {
      if (getDigit(h, r) != 0) return false
      r += 1
    }
    true
  }

  /** Direct children of a cell at the next resolution: digits 0-6
    * appended, except digit 1 (the deleted K subsequence) for pentagon
    * cells — the standard cell-to-children rule.
    */
  private[graft] def cellChildren(h: Long): Array[Long] = {
    val res = getResolution(h)
    require(res < 15, s"res-$res cell has no children below 15")
    val withRes = (h & ~(0xfL << 52)) | ((res + 1).toLong << 52)
    val digits = if (isPentagonCell(h)) Array(0, 2, 3, 4, 5, 6)
      else Array(0, 1, 2, 3, 4, 5, 6)
    digits.map(d => setDigit(withRes, res + 1, d))
  }

  /** approximate cell center — exact for cells whose center hex lies on
    * the home face's projection region; returns RADIANS. Consumers
    * (tests, the SpatialPartitioning covering filter) must verify the
    * forward round-trip before trusting it — the covering keeps any
    * cell whose round-trip fails rather than dropping on approximation.
    */
  private[graft] def cellCenterApprox(h: Long): (Double, Double) = {
    val res = getResolution(h)
    val bc = getBaseCell(h)
    var c = Array(bcI(bc), bcJ(bc), bcK(bc))
    var r = 1
    while (r <= res) {
      c = if (isClassIII(r)) downAp7(c) else downAp7r(c)
      val u = digitUnitVec(getDigit(h, r))
      c = ijkNormalize(Array(c(0) + u(0), c(1) + u(1), c(2) + u(2)))
      r += 1
    }
    faceIjkToGeo(bcFace(bc), c, res)
  }
}
