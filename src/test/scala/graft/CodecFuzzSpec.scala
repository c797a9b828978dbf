package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** Systematic property + bounded-mutation fuzz tests for every binary
  * codec in the repo (round-12 verdict item 3): the review sweeps kept
  * finding the same defect class by hand (GPKG DDL column shift, FGB
  * Int-wrap, WAV pad clamp, WKB parser depth bounds) — this suite makes
  * that class a standing regression gate instead of a per-round hunt.
  *
  * Two invariant families:
  *
  *  1. Round-trip identity on GENERATED inputs: parse∘print == id for
  *     WKT/GeoJSON, read∘write == id for WKB (plus ISO Z/M/ZM and EWKB
  *     forms in both endiannesses projecting to the same XY geometry).
  *  2. Mutation robustness: for seeded byte/char mutations and
  *     truncations of VALID encodings, every reader must return a loud
  *     error (an Exception for strict `read`s, None/null for the Opt
  *     forms) or a decoded value — never an Error (StackOverflow, OOM),
  *     never a hang. "Silent wrong data" is covered where the format
  *     carries integrity metadata worth honoring; structural corruption
  *     below that is indistinguishable from valid data by construction.
  *
  * Iterations are bounded and the seed fixed so the suite is
  * deterministic; set GRAFT_FUZZ_ITERS (per-target case count) for the
  * long certification run (the 10k-case bar in the round-12 verdict).
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val iters =
    sys.env.get("GRAFT_FUZZ_ITERS").map(_.toInt).getOrElse(2000)

  /** Geometry equality via canonical WKB bytes: case-class equality on
    * Double fields breaks on NaN (empty POINT), byte equality doesn't.
    */
  private def geomEq(a: Geom, b: Geom): Boolean =
    java.util.Arrays.equals(Wkb.write(a), Wkb.write(b))

  // ---- deterministic geometry generator ---------------------------------

  private def genCoord(r: scala.util.Random): (Double, Double) = {
    // full-precision doubles in a plausible range, with exact-integer and
    // tiny/huge magnitudes mixed in (the WKT printer's three formatting
    // regimes: integral, plain decimal, would-be-scientific)
    def d(): Double = r.nextInt(5) match {
      case 0 => r.nextInt(361) - 180.0
      case 1 => (r.nextDouble() - 0.5) * 360.0
      case 2 => (r.nextDouble() - 0.5) * 1e-4
      case 3 => (r.nextDouble() - 0.5) * 1e9
      case _ => r.nextDouble() - 0.5
    }
    (d(), d())
  }

  private def genSeq(r: scala.util.Random, min: Int): CoordSeq = {
    val n = min + r.nextInt(5)
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) { val (x, y) = genCoord(r); xs(i) = x; ys(i) = y; i += 1 }
    CoordSeq(xs, ys)
  }

  private def genRing(r: scala.util.Random): CoordSeq = {
    val open = genSeq(r, 3)
    CoordSeq(open.xs :+ open.xs(0), open.ys :+ open.ys(0))
  }

  private def genGeom(r: scala.util.Random, depth: Int = 0): Geom =
    r.nextInt(if (depth >= 2) 6 else 7) match {
      case 0 => val (x, y) = genCoord(r); Point(x, y)
      case 1 => LineString(genSeq(r, 2))
      case 2 => Polygon(Array.fill(1 + r.nextInt(2))(genRing(r)))
      case 3 => MultiPoint(Array.fill(1 + r.nextInt(3)) {
        val (x, y) = genCoord(r); Point(x, y)
      })
      case 4 => MultiLineString(Array.fill(1 + r.nextInt(3))(LineString(genSeq(r, 2))))
      case 5 => MultiPolygon(Array.fill(1 + r.nextInt(2))(
        Polygon(Array.fill(1 + r.nextInt(2))(genRing(r)))))
      case _ => GeometryCollection(Array.fill(1 + r.nextInt(3))(genGeom(r, depth + 1)))
    }

  private def emptyGeoms: Seq[Geom] = Seq(
    Point(Double.NaN, Double.NaN), LineString(CoordSeq.empty),
    Polygon(Array.empty), MultiPoint(Array.empty),
    MultiLineString(Array.empty), MultiPolygon(Array.empty),
    GeometryCollection(Array.empty))

  // ---- helpers -----------------------------------------------------------

  /** The call may throw an Exception (strict readers are loud by
    * contract) but never an Error — a StackOverflowError or OOM kills
    * the whole Spark executor, not just the row.
    */
  private def neverError[A](label: String)(f: => A): Unit =
    try { f; () }
    catch {
      case _: Exception => ()
      case t: Throwable =>
        fail(s"$label: non-Exception throwable ${t.getClass.getName}: ${t.getMessage}")
    }

  /** Opt-form decoders must never throw AT ALL (None is their error). */
  private def neverThrows[A](label: String)(f: => A): Unit =
    try { f; () }
    catch {
      case t: Throwable =>
        fail(s"$label: Opt decoder threw ${t.getClass.getName}: ${t.getMessage}")
    }

  private def mutate(r: scala.util.Random, bytes: Array[Byte]): Array[Byte] = {
    val out = bytes.clone()
    r.nextInt(3) match {
      case 0 => // flip 1-4 bytes
        (0 to r.nextInt(4)).foreach { _ =>
          if (out.nonEmpty) out(r.nextInt(out.length)) = r.nextInt(256).toByte
        }
        out
      case 1 => // truncate
        out.take(r.nextInt(out.length + 1))
      case _ => // flip bytes AND truncate
        (0 to r.nextInt(4)).foreach { _ =>
          if (out.nonEmpty) out(r.nextInt(out.length)) = r.nextInt(256).toByte
        }
        out.take(1 + r.nextInt(out.length))
    }
  }

  private def mutateStr(r: scala.util.Random, s: String): String =
    r.nextInt(3) match {
      case 0 if s.nonEmpty =>
        val i = r.nextInt(s.length)
        s.substring(0, i) + "()0,E. G".charAt(r.nextInt(8)) + s.substring(i + 1)
      case 1 => s.take(r.nextInt(s.length + 1))
      case _ if s.nonEmpty =>
        val i = r.nextInt(s.length)
        s.substring(0, i) + s.substring(math.min(s.length, i + 1 + r.nextInt(4)))
      case _ => s
    }

  // =========================================================================
  // 1. round-trip properties
  // =========================================================================

  test("WKB: read(write(g)) == g on generated geometries + empties") {
    val r = new scala.util.Random(42)
    (emptyGeoms ++ Seq.fill(iters / 4)(genGeom(r))).zipWithIndex.foreach {
      case (g, i) =>
        val back = Wkb.read(Wkb.write(g))
        assert(geomEq(back, g), s"case $i: ${Wkt.print(g).take(120)}")
    }
  }

  test("WKT: parse(print(g)) == g on generated geometries + empties") {
    val r = new scala.util.Random(43)
    (emptyGeoms ++ Seq.fill(iters / 4)(genGeom(r))).zipWithIndex.foreach {
      case (g, i) =>
        val s = Wkt.print(g)
        assert(!s.matches("(?s).*\\d[eE][+-]?\\d.*"),
          s"case $i: scientific notation leaked into WKT: $s")
        val back = Wkt.parse(s)
        assert(geomEq(back, g), s"case $i: $s")
    }
  }

  test("GeoJSON: parse(print(g)) == g on generated geometries") {
    val r = new scala.util.Random(44)
    // GeoJSON has no EMPTY POINT form; empties of the array-backed types
    // round-trip as empty coordinate arrays
    val empties = emptyGeoms.filterNot(_.isInstanceOf[Point])
    (empties ++ Seq.fill(iters / 4)(genGeom(r))).zipWithIndex.foreach {
      case (g, i) =>
        val s = GeoJson.print(g)
        val back = GeoJson.parse(s)
        assert(geomEq(back, g), s"case $i: ${s.take(160)}")
    }
  }

  test("WKB: ISO Z/M/ZM and EWKB forms, both endiannesses, project to XY") {
    val r = new scala.util.Random(45)
    Seq.fill(200)(genGeom(r)).zipWithIndex.foreach { case (g, i) =>
      for {
        big <- Seq(false, true)
        (hasZ, hasM) <- Seq((false, false), (true, false), (false, true), (true, true))
        ewkb <- Seq(false, true)
        srid <- if (ewkb) Seq(false, true) else Seq(false)
      } {
        val bytes = writeDim(g, big, hasZ, hasM, ewkb, srid, r)
        val back = Wkb.read(bytes)
        assert(geomEq(back, g),
          s"case $i big=$big z=$hasZ m=$hasM ewkb=$ewkb srid=$srid: ${Wkt.print(g).take(100)}")
      }
    }
  }

  /** Test-side WKB writer for the dimension/endianness/EWKB matrix the
    * production writer deliberately doesn't emit (it writes ISO LE XY
    * only). Z/M ordinates get arbitrary finite values — the reader's
    * contract is to drop them.
    */
  private def writeDim(g: Geom, big: Boolean, hasZ: Boolean, hasM: Boolean,
      ewkb: Boolean, srid: Boolean, r: scala.util.Random): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val extra = (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
    def putInt(v: Int): Unit = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(if (big) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); bos.write(b.array(), 0, 4)
    }
    def putD(v: Double): Unit = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(if (big) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putDouble(v); bos.write(b.array(), 0, 8)
    }
    def putCoord(x: Double, y: Double): Unit = {
      putD(x); putD(y)
      (0 until extra).foreach(_ => putD(r.nextDouble() * 100))
    }
    def putSeq(cs: CoordSeq): Unit = { putInt(cs.size); cs.foreach(putCoord) }
    def code(base: Int): Int =
      if (ewkb) {
        var c = base
        if (hasZ) c |= 0x80000000
        if (hasM) c |= 0x40000000
        if (srid) c |= 0x20000000
        c
      } else base + (if (hasZ && hasM) 3000 else if (hasM) 2000 else if (hasZ) 1000 else 0)
    def writeG(g: Geom): Unit = {
      bos.write(if (big) 0 else 1)
      g match {
        case Point(x, y) =>
          putInt(code(1)); if (srid && ewkb) putInt(4326); putCoord(x, y)
        case LineString(cs) =>
          putInt(code(2)); if (srid && ewkb) putInt(4326); putSeq(cs)
        case Polygon(rings) =>
          putInt(code(3)); if (srid && ewkb) putInt(4326)
          putInt(rings.length); rings.foreach(putSeq)
        case MultiPoint(ps) =>
          putInt(code(4)); if (srid && ewkb) putInt(4326)
          putInt(ps.length); ps.foreach(writeG)
        case MultiLineString(ls) =>
          putInt(code(5)); if (srid && ewkb) putInt(4326)
          putInt(ls.length); ls.foreach(writeG)
        case MultiPolygon(ps) =>
          putInt(code(6)); if (srid && ewkb) putInt(4326)
          putInt(ps.length); ps.foreach(writeG)
        case GeometryCollection(gs) =>
          putInt(code(7)); if (srid && ewkb) putInt(4326)
          putInt(gs.length); gs.foreach(writeG)
      }
    }
    writeG(g)
    bos.toByteArray
  }

  // =========================================================================
  // 2. mutation fuzz — geometry codecs
  // =========================================================================

  test("WKB fuzz: readOpt never throws, read never Errors, on mutations") {
    val r = new scala.util.Random(46)
    val fixtures = Seq.fill(40)(Wkb.write(genGeom(r)))
    (1 to iters).foreach { i =>
      val m = mutate(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"Wkb.readOpt case $i")(Wkb.readOpt(m))
      neverError(s"Wkb.read case $i")(Wkb.read(m))
      neverError(s"Wkb.typeName case $i")(Wkb.typeName(m))
    }
    // adversarial: deep nesting must refuse, not StackOverflow
    val deep = {
      val bos = new java.io.ByteArrayOutputStream()
      (1 to 100000).foreach { _ =>
        bos.write(1)
        bos.write(Array[Byte](7, 0, 0, 0)) // LE GEOMETRYCOLLECTION
        bos.write(Array[Byte](1, 0, 0, 0)) // n = 1
      }
      bos.toByteArray
    }
    neverThrows("Wkb.readOpt deep nesting")(assert(Wkb.readOpt(deep).isEmpty))
  }

  test("WKT fuzz: parseOpt never throws on mutated strings") {
    val r = new scala.util.Random(47)
    val fixtures = Seq.fill(40)(Wkt.print(genGeom(r)))
    (1 to iters).foreach { i =>
      val m = mutateStr(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"Wkt.parseOpt case $i")(Wkt.parseOpt(m))
      neverError(s"Wkt.parse case $i")(Wkt.parse(m))
    }
    val deep = "GEOMETRYCOLLECTION (" * 50000
    neverThrows("Wkt deep nesting")(assert(Wkt.parseOpt(deep).isEmpty))
  }

  test("GeoJSON fuzz: parseOpt never throws on mutated strings") {
    val r = new scala.util.Random(48)
    // geometry JSON plus the Feature / FeatureCollection forms parse()
    // also accepts — their framing has its own code path
    val fixtures = Seq.fill(34)(GeoJson.print(genGeom(r))) ++
      Seq.fill(3) {
        s"""{"type":"Feature","geometry":${GeoJson.print(genGeom(r))},""" +
          """"properties":{"name":"a \"b\"","n":3,"v":null}}"""
      } ++
      Seq.fill(3) {
        s"""{"type":"FeatureCollection","features":[{"type":"Feature",""" +
          s""""geometry":${GeoJson.print(genGeom(r))},"properties":{}},""" +
          s"""{"type":"Feature","geometry":null,"properties":{"x":1}}]}"""
      }
    (1 to iters).foreach { i =>
      val m = mutateStr(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"GeoJson.parseOpt case $i")(GeoJson.parseOpt(m))
      neverError(s"GeoJson.parse case $i")(GeoJson.parse(m))
    }
    val deep = """{"type":"GeometryCollection","geometries":[""" * 20000
    neverThrows("GeoJson deep nesting")(assert(GeoJson.parseOpt(deep).isEmpty))
  }

  // =========================================================================
  // 3. mutation fuzz — vector file formats (SHP / GPKG / FGB)
  // =========================================================================

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_fuzz").toString

  private def fixtureGeoms(r: scala.util.Random): Seq[Geom] =
    Seq.fill(8)(if (r.nextBoolean()) { val (x, y) = genCoord(r); Point(x, y) }
      else Polygon(Array(genRing(r))))

  test("Shapefile fuzz: read is loud-or-valid on mutated .shp/.dbf, never Errors") {
    val r = new scala.util.Random(49)
    val dir = tmpDir()
    val geoms = fixtureGeoms(r)
    val fields = Seq(sources.Shapefile.DbfField("name", 'C', 16, 0),
      sources.Shapefile.DbfField("v", 'N', 10, 2))
    val recs = geoms.indices.map(i => Seq[Any](s"f$i", i * 1.25))
    sources.Shapefile.write(s"$dir/t.shp", geoms, fields, recs)
    // unmutated read-back must agree (the silent-wrong-data face)
    val base = sources.Shapefile.read(s"$dir/t.shp")
    assert(base.geoms.size == geoms.size && base.records.size == geoms.size)
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.shp"))
    val dbf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.dbf"))
    (1 to iters / 2).foreach { i =>
      val mutateShp = r.nextBoolean()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/t.shp"),
        if (mutateShp) mutate(r, shp) else shp)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/t.dbf"),
        if (mutateShp) dbf else mutate(r, dbf))
      neverError(s"Shapefile.read case $i")(sources.Shapefile.read(s"$dir/t.shp"))
    }
  }

  test("GeoPackage fuzz: read is loud-or-valid on mutated bytes, never Errors") {
    val r = new scala.util.Random(50)
    val dir = tmpDir()
    val geoms = fixtureGeoms(r)
    val rows = geoms.indices.map(i => Seq[Any](s"n$i", i.toLong))
    sources.GeoPackage.write(s"$dir/t.gpkg", "feats", "geom", 4326,
      Seq("name", "v"), rows, geoms)
    val base = sources.GeoPackage.read(s"$dir/t.gpkg")
    assert(base.rows.size == geoms.size)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.gpkg"))
    (1 to iters / 2).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.gpkg"), mutate(r, bytes))
      neverError(s"GeoPackage.read case $i")(sources.GeoPackage.read(s"$dir/m.gpkg"))
    }
  }

  test("FlatGeobuf fuzz: read is loud-or-valid on mutated bytes, never Errors") {
    val r = new scala.util.Random(51)
    val dir = tmpDir()
    val geoms = fixtureGeoms(r)
    val rows = geoms.indices.map(i => Seq[Any](s"n$i", i.toLong))
    sources.FlatGeobuf.write(s"$dir/t.fgb",
      Seq("name" -> sources.FlatGeobuf.CtString, "v" -> sources.FlatGeobuf.CtLong),
      rows, geoms)
    val base = sources.FlatGeobuf.read(s"$dir/t.fgb")
    assert(base.rows.size == geoms.size)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/t.fgb"))
    (1 to iters / 2).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.fgb"), mutate(r, bytes))
      neverError(s"FlatGeobuf.read case $i")(sources.FlatGeobuf.read(s"$dir/m.fgb"))
      neverError(s"FlatGeobuf.readFiltered case $i")(
        sources.FlatGeobuf.readFiltered(s"$dir/m.fgb", -10, -10, 10, 10))
    }
  }

  test("FlatGeobuf readFiltered refuses Int-wrapping leaf feature offsets") {
    // a corrupt i64 leaf offset of trueOffset + 2^32 used to wrap back to
    // trueOffset through the unchecked .toInt narrowing and decode
    // SILENTLY — the one corruption class loud-or-valid fuzz can't see.
    // Pin: it must now refuse loudly (require), never decode.
    val dir = tmpDir()
    val pts = (0 until 10).map(i => Point(i.toDouble, i.toDouble))
    sources.FlatGeobuf.write(s"$dir/w.fgb",
      Seq("v" -> sources.FlatGeobuf.CtLong),
      pts.indices.map(i => Seq[Any](i.toLong)), pts)
    val p = java.nio.file.Paths.get(s"$dir/w.fgb")
    val bytes = java.nio.file.Files.readAllBytes(p)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getInt(8)
    val indexStart = 12 + headerLen
    // default nodeSize 16, 10 features: levels top-down [1 root, 10
    // leaves]; leaf i's feature offset is the i64 at node (1+i) + 32
    assert(sources.FlatGeobuf.indexSize(10, 16) == 11 * 40)
    val offPos = indexStart + 40 * 1 + 32
    bb.putLong(offPos, bb.getLong(offPos) + (1L << 32))
    java.nio.file.Files.write(p, bytes)
    val e = intercept[IllegalArgumentException](
      sources.FlatGeobuf.readFiltered(s"$dir/w.fgb", -100, -100, 100, 100))
    assert(e.getMessage.contains("leaf feature offset"))
  }

  test("DBF record bound includes the header (spec: len = hdr + n*rec + 1)") {
    val dir = tmpDir()
    val geoms = (0 until 3).map(i => Point(i.toDouble, 0))
    val fields = Seq(sources.Shapefile.DbfField("name", 'C', 16, 0))
    sources.Shapefile.write(s"$dir/h.shp", geoms, fields,
      geoms.indices.map(i => Seq[Any](s"f$i")))
    val p = java.nio.file.Paths.get(s"$dir/h.dbf")
    val dbf = java.nio.file.Files.readAllBytes(p)
    val bb = java.nio.ByteBuffer.wrap(dbf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerSize = java.lang.Short.toUnsignedInt(bb.getShort(8))
    val recordSize = java.lang.Short.toUnsignedInt(bb.getShort(10))
    // a count that passes the OLD bound (n*rec <= len) but whose records
    // run past end-of-buffer once headerSize is accounted for
    val n = (dbf.length - 1) / recordSize
    assert(n * recordSize <= dbf.length &&
      headerSize + n.toLong * recordSize > dbf.length, "fixture geometry drifted")
    bb.putInt(4, n)
    java.nio.file.Files.write(p, dbf)
    val e = intercept[IllegalArgumentException](
      sources.Shapefile.read(s"$dir/h.shp"))
    assert(e.getMessage.contains("dbf declares"))
  }

  // =========================================================================
  // 4. mutation fuzz — media codecs (PNG / GIF / WAV)
  // =========================================================================

  test("PNG fuzz: decodeImage/aHashOf never throw on mutated payloads") {
    val r = new scala.util.Random(52)
    val fixtures = (0 until 12).map(i =>
      ops.Multimodal.encodePng(1 + i % 13, 1 + i % 7, i.toLong)) ++
      (0 until 4).map(i => ops.Multimodal.encodeGrayPng(
        Array.tabulate(64)(p => (p * 31 + i) & 0xff), 8, 8))
    (1 to iters / 2).foreach { i =>
      val m = mutate(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"decodeImage case $i")(ops.Multimodal.decodeImage(m))
      neverThrows(s"aHashOf case $i")(ops.Multimodal.aHashOf(m))
    }
  }

  test("GIF fuzz: parseGifGrayFrames/decodeGifFrames never throw on mutations") {
    val r = new scala.util.Random(53)
    def gifOf(id: Long): Array[Byte] = {
      // the q183 fixture construction: nf-1 class frames + 1 noise frame
      val c = id % 30
      val nf = (4 + c % 5).toInt
      ops.Multimodal.encodeGrayGif(Array.tabulate(nf)(f =>
        if (f < nf - 1) ops.Multimodal.classFrameLums(c, f)
        else ops.Multimodal.noiseFrameLums(id)), 8, 8)
    }
    val fixtures = (0 until 8).map(i => gifOf(i.toLong))
    (1 to iters / 2).foreach { i =>
      val m = mutate(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"parseGifGrayFrames case $i")(ops.Multimodal.parseGifGrayFrames(m))
      neverThrows(s"decodeGifFrames case $i")(ops.Multimodal.decodeGifFrames(m))
    }
  }

  test("WAV fuzz: parseWavPcm16/decodeWavPcm16 never throw on mutations") {
    val r = new scala.util.Random(54)
    val fixtures = (0 until 8).map(i => ops.Multimodal.encodeWavPcm16(
      ops.Multimodal.syntheticSamples(i.toLong), ops.Multimodal.syntheticWavRate))
    (1 to iters / 2).foreach { i =>
      val m = mutate(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"parseWavPcm16 case $i")(ops.Multimodal.parseWavPcm16(m))
      neverThrows(s"decodeWavPcm16 case $i")(ops.Multimodal.decodeWavPcm16(m))
    }
    // hand-rolled and JDK parsers must agree on every VALID fixture
    fixtures.zipWithIndex.foreach { case (f, i) =>
      val a = ops.Multimodal.parseWavPcm16(f)
      val b = ops.Multimodal.decodeWavPcm16(f)
      assert(a.isDefined && b.isDefined, s"fixture $i undecodable")
      assert(a.get._1 == b.get._1 &&
        java.util.Arrays.equals(a.get._2, b.get._2), s"fixture $i disagrees")
    }
  }

  test("tar fuzz: parseTarEntries is loud-or-valid on mutations, never Errors") {
    val r = new scala.util.Random(55)
    // hand-assemble a 3-sample ustar shard from the production header
    // builder (the write side needs a Spark job; the HEADER format is
    // the contract under test)
    val bos = new java.io.ByteArrayOutputStream()
    (0 until 3).foreach { i =>
      val data = Array.fill[Byte](100 + 37 * i)((i + 1).toByte)
      bos.write(sources.TarShards.header(s"sample$i.json", data.length.toLong))
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    val tar = bos.toByteArray
    // unmutated parse must return the 3 entries with exact content
    val base = sources.TarShards.parseTarEntries("fixture.tar", tar)
    assert(base.map(_._1) == Seq("sample0", "sample1", "sample2"))
    assert(base.forall(_._2 == "json"))
    assert(base(2)._3.length == 174 && base(2)._3.forall(_ == 3.toByte))
    (1 to iters / 2).foreach { i =>
      neverError(s"parseTarEntries case $i")(
        sources.TarShards.parseTarEntries("m.tar", mutate(r, tar)))
    }
    // corrupt size claiming bytes past end-of-archive must refuse, not
    // zero-pad a 2 GB allocation (copyOfRange pads past the source end)
    val hugeSize = tar.clone()
    val sz = "77777777777".getBytes("US-ASCII") // 8 GiB-1 in octal
    System.arraycopy(sz, 0, hugeSize, 124, sz.length)
    // re-stamp the checksum so the size field is what the parser trusts
    java.util.Arrays.fill(hugeSize, 148, 156, ' '.toByte)
    val sum = hugeSize.take(512).map(_ & 0xff).sum
    System.arraycopy(f"$sum%06o".getBytes("US-ASCII"), 0, hugeSize, 148, 6)
    hugeSize(154) = 0; hugeSize(155) = ' '
    neverError("huge-size tar entry")(
      sources.TarShards.parseTarEntries("h.tar", hugeSize))
    assert(
      try { sources.TarShards.parseTarEntries("h.tar", hugeSize); false }
      catch { case _: IllegalArgumentException => true },
      "oversized entry must refuse loudly")
  }

  test("deep fuzz: structure-preserving corruptions reach past the outer checks") {
    val r = new scala.util.Random(57)
    // PNG with corrupt IDAT payload but RE-STAMPED CRC: a plain byte
    // flip fails the chunk CRC early; restamping forces the decoder to
    // face corrupt zlib/filter data (our encodePng layout: sig 8 +
    // IHDR chunk 25 -> IDAT length at 33, tag at 37, data at 41)
    val png = ops.Multimodal.encodePng(9, 5, 11L)
    val idatLen = java.nio.ByteBuffer.wrap(png, 33, 4).getInt
    (1 to iters / 10).foreach { i =>
      val m = png.clone()
      (0 to r.nextInt(3)).foreach { _ =>
        m(41 + r.nextInt(idatLen)) = r.nextInt(256).toByte
      }
      val crc = new java.util.zip.CRC32()
      crc.update(m, 37, 4 + idatLen)
      java.nio.ByteBuffer.wrap(m, 41 + idatLen, 4).putInt(crc.getValue.toInt)
      neverThrows(s"crc-valid png case $i")(ops.Multimodal.decodeImage(m))
      neverThrows(s"crc-valid png ahash case $i")(ops.Multimodal.aHashOf(m))
    }
    // GPKG with the 100-byte SQLite header intact: page-level corruption
    // must be caught by the b-tree/record parsers, not the magic check
    val dir = tmpDir()
    val geoms = fixtureGeoms(r)
    sources.GeoPackage.write(s"$dir/t.gpkg", "feats", "geom", 4326,
      Seq("name"), geoms.indices.map(i => Seq[Any](s"n$i")), geoms)
    val gpkg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t.gpkg"))
    (1 to iters / 10).foreach { i =>
      val m = gpkg.clone()
      (0 to r.nextInt(4)).foreach { _ =>
        m(100 + r.nextInt(m.length - 100)) = r.nextInt(256).toByte
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.gpkg"), m)
      neverError(s"header-valid gpkg case $i")(
        sources.GeoPackage.read(s"$dir/m.gpkg"))
    }
    // SHP with the file code intact: record-walk corruption, not the
    // not-a-shapefile bail
    sources.Shapefile.write(s"$dir/t.shp", geoms)
    val shp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t.shp"))
    (1 to iters / 10).foreach { i =>
      val m = shp.clone()
      (0 to r.nextInt(4)).foreach { _ =>
        m(100 + r.nextInt(m.length - 100)) = r.nextInt(256).toByte
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/m.shp"), m)
      neverError(s"header-valid shp case $i")(
        sources.Shapefile.read(s"$dir/m.shp"))
    }
  }

  test("PROJJSON fuzz: projjsonProjection never throws; parseEpsg never Errors") {
    val r = new scala.util.Random(56)
    val fixtures = Seq(
      // UTM-ish TransverseMercator ProjectedCRS
      """{"type":"ProjectedCRS","name":"t","base_crs":{"datum":{"ellipsoid":
        |{"semi_major_axis":6378137,"inverse_flattening":298.257223563}}},
        |"conversion":{"method":{"name":"Transverse Mercator","id":
        |{"authority":"EPSG","code":9807}},"parameters":[
        |{"name":"Latitude of natural origin","value":0,"unit":"degree"},
        |{"name":"Longitude of natural origin","value":-75,"unit":"degree"},
        |{"name":"Scale factor at natural origin","value":0.9996,"unit":"unity"},
        |{"name":"False easting","value":500000,"unit":"metre"},
        |{"name":"False northing","value":0,"unit":"metre"}]}}"""
        .stripMargin.replace("\n", ""),
      """{"type":"GeographicCRS","name":"WGS 84 (CRS84)","id":
        |{"authority":"OGC","code":"CRS84"}}""".stripMargin.replace("\n", ""))
    (1 to iters / 2).foreach { i =>
      val m = mutateStr(r, fixtures(r.nextInt(fixtures.length)))
      neverThrows(s"projjsonProjection case $i") {
        geom.Proj.projjsonProjection(m).foreach { p =>
          // a projection built from mutated input may be degenerate but
          // its transforms must not throw or hang on a plain point
          try { p.forward(-75.5, 40.2); p.inverse(500000.0, 4400000.0) }
          catch { case _: Exception => () }
        }
      }
      neverError(s"parseEpsg case $i")(geom.Proj.parseEpsg(m))
    }
  }

  test("media decoders refuse absurd declared dimensions instead of allocating") {
    // a 4-byte header mutation can claim a 2-gigapixel raster; the decode
    // paths must refuse BEFORE allocation (an OOM is an Error that kills
    // the executor, not the row)
    val png = ops.Multimodal.encodePng(4, 4, 7L)
    val huge = png.clone()
    // IHDR width at offset 16 (BE): claim 2^30
    huge(16) = 0x40.toByte; huge(17) = 0; huge(18) = 0; huge(19) = 0
    neverThrows("huge-dims png")(ops.Multimodal.decodeImage(huge))
    val gif = ops.Multimodal.encodeGrayGif(Array.tabulate(4)(f =>
      ops.Multimodal.classFrameLums(1L, f)), 8, 8)
    val hugeGif = gif.clone()
    // logical screen width/height at offsets 6-9 (LE u16): claim
    // 40000 x 40000 — 1.6e9 pixels, a positive Int that would allocate
    // ~6.4 GB as an int raster (the sneaky case: 65535^2 overflows to a
    // negative size and fails loudly on its own)
    hugeGif(6) = 0x40.toByte; hugeGif(7) = 0x9c.toByte
    hugeGif(8) = 0x40.toByte; hugeGif(9) = 0x9c.toByte
    // AND the first frame's image-descriptor dims (encodeGrayGif layout:
    // 6 header + 7 LSD + 768 GCT = descriptor at 781; w/h at +5..+8) —
    // the hand-rolled parser allocates from the FRAME dims
    hugeGif(786) = 0x40.toByte; hugeGif(787) = 0x9c.toByte
    hugeGif(788) = 0x40.toByte; hugeGif(789) = 0x9c.toByte
    assert(hugeGif(781) == 0x2c.toByte, "fixture layout drifted")
    neverThrows("huge-dims gif (hand-rolled)")(
      ops.Multimodal.parseGifGrayFrames(hugeGif))
    neverThrows("huge-dims gif (imageio)")(
      ops.Multimodal.decodeGifFrames(hugeGif))
  }

  test("BMP and JPEG decode-bomb headers are refused before allocation") {
    // BMP: 14-byte file header + BITMAPINFOHEADER; w/h are LE i32 at
    // offsets 18/22 — a hostile header can claim gigapixel dims in 8
    // bytes. Claim 60000 x 60000 = 3.6e9 px (~14 GB ARGB).
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.array()
    }
    assert(ops.Multimodal.declaredPixels(bmp(60000, 60000)) == 3600000000L)
    // negative height = top-down rows, legal; magnitude is the claim
    assert(ops.Multimodal.declaredPixels(bmp(60000, -60000)) == 3600000000L)
    assert(ops.Multimodal.declaredPixels(bmp(0, 5)) == -1L)
    neverThrows("huge-dims bmp")(
      assert(ops.Multimodal.decodeImage(bmp(60000, 60000)).isEmpty))
    neverThrows("huge-dims bmp top-down")(
      assert(ops.Multimodal.decodeImage(bmp(60000, -60000)).isEmpty))

    // JPEG: SOI + APP0 + SOF0 claiming 65500 x 65500 = 4.3e9 px. The
    // SOF walk must find the frame header past the APP0 segment.
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
      b.put(0xff.toByte).put(0xd8.toByte)                     // SOI
      b.put(0xff.toByte).put(0xe0.toByte).putShort(16)        // APP0 len 16
      b.put("JFIF".getBytes).put(0.toByte)
      b.put(Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0))           // rest of APP0
      b.put(0xff.toByte).put(0xc0.toByte).putShort(11)        // SOF0 len 11
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort) // prec, h, w
      b.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte)
      b.array()
    }
    assert(ops.Multimodal.declaredPixels(jpeg(65500, 65500)) == 4290250000L)
    assert(ops.Multimodal.declaredPixels(jpeg(4, 0)) == -1L)
    neverThrows("huge-dims jpeg")(
      assert(ops.Multimodal.decodeImage(jpeg(65500, 65500)).isEmpty))
    // a real small JPEG-shaped header below the cap: no SOF claim drama,
    // decode may still fail (no scan data) but must not throw
    neverThrows("small jpeg header")(ops.Multimodal.decodeImage(jpeg(4, 4)))
    // truncated mid-segment: walk must return 0 (no claim), never hang
    assert(ops.Multimodal.declaredPixels(
      jpeg(65500, 65500).take(6)) == 0L)

    // generic registry path: a WBMP bomb (type 0, no sniff of ours) —
    // dims are uintvar; 0x87 0x68 = 1000, so 1000x1000 ok but craft
    // huge via 5-byte uintvar claiming ~2^31. The reader-path cap must
    // refuse without OOM.
    val wbmp = Array[Byte](0, 0,
      0x8f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte,
      0x8f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte)
    assert(ops.Multimodal.declaredPixels(wbmp) == 0L) // not our sniff
    neverThrows("huge-dims wbmp via registry path")(
      assert(ops.Multimodal.decodeImage(wbmp).isEmpty))
  }
}
