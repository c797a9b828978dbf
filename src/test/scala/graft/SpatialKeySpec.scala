package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{Proj, SpatialKey}

class SpatialKeySpec extends AnyFunSuite {

  test("hilbert order-1 curve visits cells in U order") {
    // canonical order-1 hilbert: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    assert(SpatialKey.hilbertXY2D(1, 0, 0) == 0)
    assert(SpatialKey.hilbertXY2D(1, 0, 1) == 1)
    assert(SpatialKey.hilbertXY2D(1, 1, 1) == 2)
    assert(SpatialKey.hilbertXY2D(1, 1, 0) == 3)
  }

  test("hilbert order-2 known values") {
    // classic 4x4 hilbert d-indices
    val expected = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (1L, 1L) -> 2L, (0L, 1L) -> 3L,
      (0L, 2L) -> 4L, (0L, 3L) -> 5L, (1L, 3L) -> 6L, (1L, 2L) -> 7L,
      (2L, 2L) -> 8L, (2L, 3L) -> 9L, (3L, 3L) -> 10L, (3L, 2L) -> 11L,
      (3L, 1L) -> 12L, (2L, 1L) -> 13L, (2L, 0L) -> 14L, (3L, 0L) -> 15L)
    expected.foreach { case ((x, y), d) =>
      assert(SpatialKey.hilbertXY2D(2, x, y) == d, s"($x,$y)")
    }
  }

  test("hilbert is a bijection on an order-4 grid") {
    val seen = (for { x <- 0 until 16; y <- 0 until 16 }
      yield SpatialKey.hilbertXY2D(4, x, y)).toSet
    assert(seen == (0 until 256).map(_.toLong).toSet)
  }

  test("hilbert locality: consecutive indices are adjacent cells") {
    val byD = (for { x <- 0 until 16; y <- 0 until 16 }
      yield SpatialKey.hilbertXY2D(4, x, y) -> (x, y)).toMap
    (0 until 255).foreach { d =>
      val (x0, y0) = byD(d.toLong); val (x1, y1) = byD(d + 1L)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"d=$d not adjacent: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("morton interleave") {
    assert(SpatialKey.interleave(0) == 0)
    assert(SpatialKey.interleave(0xFFFF) == 0x55555555L)
    // (x=3, y=1) -> x bits at even, y at odd: 3=0b11 -> 0b0101; y=1 -> 0b10
    val m = SpatialKey.interleave(3) | (SpatialKey.interleave(1) << 1)
    assert(m == 0x7) // 0b111
  }

  test("quadkey matches Bing tile-system examples") {
    // Bing docs: tile (3,5) level 3 -> "213"
    assert(SpatialKey.quadkeyOfTile(3, 5, 3) == "213")
    assert(SpatialKey.quadkeyOfTile(0, 0, 1) == "0")
    assert(SpatialKey.quadkeyOfTile(1, 0, 1) == "1")
    assert(SpatialKey.quadkeyOfTile(0, 1, 1) == "2")
    assert(SpatialKey.quadkeyOfTile(1, 1, 1) == "3")
    // prefix property: the level-n quadkey is a prefix of level-(n+1)
    val q13 = SpatialKey.quadkey(-122.4194, 37.7749, 13)
    val q10 = SpatialKey.quadkey(-122.4194, 37.7749, 10)
    assert(q13.startsWith(q10))
    assert(q13.length == 13)
  }

  test("slippy tile math matches known example") {
    // lon 0 lat 0 at zoom 1 -> tile (1, 1)
    assert(SpatialKey.tile(0.0, 0.0, 1) == (1L, 1L))
    // openstreetmap example: lon 13.37 lat 52.51 z 10 -> (550, 335)
    assert(SpatialKey.tile(13.37, 52.51, 10) == (550L, 335L))
  }

  test("webmercator forward matches known constants") {
    val (x, y) = Proj.lonLatToMercator(180, 0)
    assert(math.abs(x - 20037508.342789244) < 1e-6)
    assert(math.abs(y) < 1e-6)
    val (lon, lat) = Proj.mercatorToLonLat(x, 0)
    assert(math.abs(lon - 180) < 1e-9 && math.abs(lat) < 1e-9)
  }

  test("projection round trips") {
    val pts = Seq((-122.4194, 37.7749), (13.37, 52.51), (-96.0, 23.0), (151.2, -33.8))
    for ((lon, lat) <- pts) {
      val (mx, my) = Proj.transform(lon, lat, "EPSG:4326", "EPSG:3857")
      val (lon2, lat2) = Proj.transform(mx, my, "EPSG:3857", "EPSG:4326")
      assert(math.abs(lon - lon2) < 1e-9 && math.abs(lat - lat2) < 1e-9, "3857")
    }
    // Albers 5070 round trip over CONUS
    for ((lon, lat) <- Seq((-120.0, 40.0), (-75.0, 41.0), (-96.0, 23.0))) {
      val (ax, ay) = Proj.transform(lon, lat, "EPSG:4326", "EPSG:5070")
      val (lon2, lat2) = Proj.transform(ax, ay, "EPSG:5070", "EPSG:4326")
      assert(math.abs(lon - lon2) < 1e-7 && math.abs(lat - lat2) < 1e-7, "5070")
    }
    // UTM 10N round trip (San Francisco)
    val (ux, uy) = Proj.transform(-122.4194, 37.7749, "EPSG:4326", "EPSG:32610")
    val (lon3, lat3) = Proj.transform(ux, uy, "EPSG:32610", "EPSG:4326")
    assert(math.abs(lon3 + 122.4194) < 1e-7 && math.abs(lat3 - 37.7749) < 1e-7)
    // known UTM reference value (easting ~551k, northing ~4.18M)
    assert(math.abs(ux - 551000) < 1000 && math.abs(uy - 4182000) < 2000)
  }

  test("EPSG:5070 known reference point") {
    // projection origin: lon -96, lat 23 -> (0, 0)
    val (x, y) = Proj.transform(-96.0, 23.0, "EPSG:4326", "EPSG:5070")
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
  }
}
