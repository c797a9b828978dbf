package graft.sources

import java.nio.charset.StandardCharsets
import graft.geom._

/** Pure-JVM FlatGeobuf source/sink — the reference's last GDAL ingest
  * format (`core/convert.py:42-108`). Implements the public FlatGeobuf
  * spec (flatgeobuf.org): 8-byte magic, size-prefixed flatbuffers
  * Header, optional packed Hilbert R-tree (skipped on full scans — its
  * size is computable from featuresCount × nodeSize), then size-prefixed
  * Feature records. A minimal flatbuffers reader/writer is inlined —
  * only the vtable/table/vector/string encoding the format needs.
  *
  * Driver-side parse like Shapefile/GeoPackage (single non-splittable
  * file, boundary-scale data); rows distribute immediately after.
  */
object FlatGeobuf {

  private val Magic = Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 1)

  // GeometryType enum (geometry.fbs)
  private val GtPoint = 1
  private val GtLineString = 2
  private val GtPolygon = 3
  private val GtMultiPoint = 4
  private val GtMultiLineString = 5
  private val GtMultiPolygon = 6

  // ColumnType enum (header.fbs)
  val CtBool = 2
  val CtInt = 5
  val CtLong = 7
  val CtDouble = 10
  val CtString = 11

  final case class Contents(name: Option[String],
      columns: Seq[(String, Int)], rows: Seq[Seq[Any]], geoms: Seq[Geom],
      crsCode: Option[Int])

  // ---- minimal flatbuffers reader ---------------------------------------

  private final class FbReader(val buf: Array[Byte], val base: Int) {
    def u16(p: Int): Int = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8)
    def i32(p: Int): Int =
      (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
        ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
    def i64(p: Int): Long = (i32(p).toLong & 0xffffffffL) | (i32(p + 4).toLong << 32)
    def f64(p: Int): Double = java.lang.Double.longBitsToDouble(i64(p))
    def root: Int = base + i32(base)
    /** absolute position of field data for vtable slot, or -1 if absent. */
    def field(table: Int, slot: Int): Int = {
      val vt = table - i32(table)
      val off = 4 + 2 * slot
      if (off + 2 > u16(vt)) -1
      else {
        val fo = u16(vt + off)
        if (fo == 0) -1 else table + fo
      }
    }
    def indirect(p: Int): Int = p + i32(p)
    /** (element start, length) of a vector field position. */
    def vector(p: Int): (Int, Int) = {
      val v = indirect(p); (v + 4, i32(v))
    }
    /** [[vector]] with an element-size bound checked BEFORE the caller
      * allocates: a corrupt length can claim 2^31 elements (a 16 GB
      * coordinate array — an OOM Error that kills the executor, not a
      * per-row exception); the data must physically fit the buffer.
      */
    def vectorBounded(p: Int, elemBytes: Int): (Int, Int) = {
      val (s, n) = vector(p)
      require(n >= 0 && s >= 0 && s.toLong + elemBytes.toLong * n <= buf.length,
        s"corrupt vector: $n elements of $elemBytes B at $s in a ${buf.length}-byte file")
      (s, n)
    }
    def string(p: Int): String = {
      val v = indirect(p)
      new String(buf, v + 4, i32(v), StandardCharsets.UTF_8)
    }
  }

  // ---- geometry decode ---------------------------------------------------

  private def splitByEnds(xs: Array[Double], ys: Array[Double],
      ends: Array[Int]): Array[CoordSeq] = {
    if (ends.isEmpty) Array(CoordSeq(xs, ys))
    else {
      var start = 0
      ends.map { e =>
        val cs = CoordSeq(xs.slice(start, e), ys.slice(start, e))
        start = e
        cs
      }
    }
  }

  private def readGeom(r: FbReader, table: Int, headerType: Int): Geom = {
    val tpField = r.field(table, 6)
    val gtype = if (tpField < 0) headerType else r.buf(tpField) & 0xff
    val (xs, ys) = {
      val f = r.field(table, 1)
      if (f < 0) (Array.empty[Double], Array.empty[Double])
      else {
        val (p, n) = r.vectorBounded(f, 8) // n doubles (n/2 xy pairs)
        val xs = new Array[Double](n / 2); val ys = new Array[Double](n / 2)
        var i = 0
        while (i < n / 2) {
          xs(i) = r.f64(p + 16 * i); ys(i) = r.f64(p + 16 * i + 8); i += 1
        }
        (xs, ys)
      }
    }
    val ends: Array[Int] = {
      val f = r.field(table, 0)
      if (f < 0) Array.empty
      else {
        val (p, n) = r.vectorBounded(f, 4)
        Array.tabulate(n)(i => r.i32(p + 4 * i))
      }
    }
    gtype match {
      case GtPoint => Point(xs(0), ys(0))
      case GtMultiPoint =>
        MultiPoint(Array.tabulate(xs.length)(i => Point(xs(i), ys(i))))
      case GtLineString => LineString(CoordSeq(xs, ys))
      case GtMultiLineString =>
        MultiLineString(splitByEnds(xs, ys, ends).map(LineString))
      case GtPolygon => Polygon(splitByEnds(xs, ys, ends))
      case GtMultiPolygon =>
        val f = r.field(table, 7)
        require(f >= 0, "MultiPolygon without parts")
        val (p, n) = r.vectorBounded(f, 4)
        MultiPolygon(Array.tabulate(n) { i =>
          readGeom(r, r.indirect(p + 4 * i), GtPolygon)
            .asInstanceOf[Polygon]
        })
      case other =>
        throw new IllegalArgumentException(s"unsupported geometry type $other")
    }
  }

  private def geomTypeOf(g: Geom): Int = g match {
    case _: Point => GtPoint
    case _: LineString => GtLineString
    case _: Polygon => GtPolygon
    case _: MultiPoint => GtMultiPoint
    case _: MultiLineString => GtMultiLineString
    case _: MultiPolygon => GtMultiPolygon
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  /** packed Hilbert R-tree byte size (40-byte nodes, level fan-out
    * nodeSize) — computed only to SKIP the index on full scans.
    */
  private[graft] def indexSize(numItems: Long, nodeSize: Int): Long = {
    require(nodeSize >= 2)
    // a corrupt NEGATIVE featuresCount reaches here through the == 0
    // guards; (n + nodeSize - 1) / nodeSize then fixes at 0 and the
    // level walk never reaches 1 — an infinite loop, not an error
    require(numItems >= 1, s"bad feature count $numItems")
    var n = numItems
    var total = numItems
    while ({ n = (n + nodeSize - 1) / nodeSize; total += n; n != 1 }) ()
    total * 40
  }

  // ---- read --------------------------------------------------------------

  /** (columns, header geometry type) from a parsed Header table. */
  private def read0Header(hr: FbReader, header: Int): (Seq[(String, Int)], Int) = {
    val headerType = {
      val f = hr.field(header, 2)
      if (f < 0) 0 else hr.buf(f) & 0xff
    }
    val columns: Seq[(String, Int)] = {
      val f = hr.field(header, 7)
      if (f < 0) Seq.empty
      else {
        val (p, n) = hr.vectorBounded(f, 4)
        (0 until n).map { i =>
          val ct = hr.indirect(p + 4 * i)
          val cname = hr.string(hr.field(ct, 0))
          val tf = hr.field(ct, 1)
          (cname, if (tf < 0) 0 else hr.buf(tf) & 0xff)
        }
      }
    }
    (columns, headerType)
  }

  /** Decode the size-prefixed Feature at `pos`; returns its byte length
    * (without the 4-byte prefix). Properties use the spec encoding:
    * [u16 column index][value]... with u32-length-prefixed strings.
    */
  private def decodeFeature(bytes: Array[Byte], pos: Int,
      columns: Seq[(String, Int)], headerType: Int,
      rows: scala.collection.mutable.ArrayBuffer[Seq[Any]],
      geoms: scala.collection.mutable.ArrayBuffer[Geom]): Int = {
    val fr = new FbReader(bytes, pos + 4)
    val len = fr.i32(pos)
    val feature = fr.root
    val gf = fr.field(feature, 0)
    // geometry is OPTIONAL per the FlatGeobuf spec (OGR omits the field
    // for null geometries) — map it to a null Geom like the GPKG reader;
    // fromFlatGeobuf already carries the null branch downstream
    geoms += (if (gf >= 0) readGeom(fr, fr.indirect(gf), headerType) else null)
    val vals = Array.fill[Any](columns.length)(null)
    val pf = fr.field(feature, 1)
    if (pf >= 0) {
      val (p, n) = fr.vectorBounded(pf, 1)
      var q = p
      while (q < p + n) {
        val ci = fr.u16(q); q += 2
        columns(ci)._2 match {
          case CtBool => vals(ci) = bytes(q) != 0; q += 1
          case CtInt => vals(ci) = fr.i32(q).toLong; q += 4
          case CtLong => vals(ci) = fr.i64(q); q += 8
          case CtDouble => vals(ci) = fr.f64(q); q += 8
          case CtString =>
            val sl = fr.i32(q); q += 4
            vals(ci) = new String(bytes, q, sl, StandardCharsets.UTF_8)
            q += sl
          case other => throw new IllegalArgumentException(
            s"unsupported column type $other for ${columns(ci)._1}")
        }
      }
    }
    rows += vals.toSeq
    len
  }

  def read(path: String): Contents = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length > 12 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file")
    val hr = new FbReader(bytes, 12)
    val headerLen = hr.i32(8)
    val header = hr.root
    val name = Option(hr.field(header, 0)).filter(_ >= 0).map(hr.string)
    val (columns, headerType) = read0Header(hr, header)
    val featuresCount = {
      val f = hr.field(header, 8)
      if (f < 0) 0L else hr.i64(f)
    }
    val nodeSize = {
      val f = hr.field(header, 9)
      if (f < 0) 16 else hr.u16(f)
    }
    val crsCode = Option(hr.field(header, 10)).filter(_ >= 0).map(hr.indirect)
      .flatMap { crs =>
        val f = hr.field(crs, 1)
        if (f < 0) None else Some(hr.i32(f))
      }

    var pos = 12 + headerLen
    if (nodeSize > 0 && featuresCount > 0) {
      val idxBytes = indexSize(featuresCount, nodeSize)
      require(idxBytes >= 0 && pos + idxBytes <= bytes.length,
        s"corrupt spatial index: $featuresCount features / node size " +
          s"$nodeSize imply $idxBytes index bytes in a ${bytes.length}-byte file")
      pos += idxBytes.toInt
    }

    val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val geoms = scala.collection.mutable.ArrayBuffer[Geom]()
    while (pos + 4 <= bytes.length && {
        val len = hr.i32(pos); len > 0 && pos + 4 + len <= bytes.length }) {
      pos += 4 + decodeFeature(bytes, pos, columns, headerType, rows, geoms)
    }
    Contents(name, columns, rows.toSeq, geoms.toSeq, crsCode)
  }

  // ---- minimal flatbuffers writer ---------------------------------------

  /** Forward assembler: tables first, children after, u32 offsets
    * patched once targets are placed (matches the file order the
    * back-to-front reference builder produces).
    */
  private final class FbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private val patches =
      scala.collection.mutable.ArrayBuffer[(Int, () => Int)]()
    def pos: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def i32(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToLongBits(v))
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def align(n: Int): Unit = while (pos % n != 0) u8(0)
    /** u32 placeholder that will become (target - here). */
    def ref(target: () => Int): Unit = { patches += ((pos, target)); i32(0) }
    def result(): Array[Byte] = {
      val arr = out.toByteArray
      patches.foreach { case (at, t) =>
        val v = t() - at
        arr(at) = v.toByte; arr(at + 1) = (v >> 8).toByte
        arr(at + 2) = (v >> 16).toByte; arr(at + 3) = (v >> 24).toByte
      }
      arr
    }
  }

  /** One table field: either inline scalar bytes (with alignment) or a
    * u32 reference to an object written later.
    */
  private sealed trait Field
  private case class Scalar(bytes: Array[Byte], alignTo: Int) extends Field
  private case class Ref(target: () => Int) extends Field

  private def sU8(v: Int) = Scalar(Array(v.toByte), 1)
  private def sU16(v: Int) = Scalar(Array(v.toByte, (v >> 8).toByte), 2)
  private def sU64(v: Long) =
    Scalar(Array.tabulate(8)(i => (v >> (8 * i)).toByte), 8)
  private def sI32(v: Int) =
    Scalar(Array.tabulate(4)(i => (v >> (8 * i)).toByte), 4)

  /** Write vtable + table for the given slots (None = field absent);
    * returns the table position.
    */
  private def writeTable(w: FbWriter, slots: Seq[Option[Field]]): Int = {
    val present = slots.zipWithIndex.collect { case (Some(f), i) => (f, i) }
    val nSlots = if (present.isEmpty) 0 else present.map(_._2).max + 1
    // layout table data: soffset32 then fields in slot order with alignment
    var off = 4
    val fieldOff = new Array[Int](nSlots)
    slots.take(nSlots).zipWithIndex.foreach {
      case (Some(Scalar(b, a)), i) =>
        off = ((off + a - 1) / a) * a; fieldOff(i) = off; off += b.length
      case (Some(Ref(_)), i) =>
        off = ((off + 3) / 4) * 4; fieldOff(i) = off; off += 4
      case (None, _) => ()
    }
    val tableSize = off
    val vtSize = 4 + 2 * nSlots
    w.align(2)
    val vtPos = w.pos
    w.u16(vtSize); w.u16(tableSize)
    (0 until nSlots).foreach(i =>
      w.u16(if (slots(i).isDefined) fieldOff(i) else 0))
    // field offsets are table-relative and already aligned, so the
    // table start itself must carry the strictest field alignment
    val needs8 = slots.take(nSlots).exists {
      case Some(Scalar(_, 8)) => true
      case _ => false
    }
    w.align(if (needs8) 8 else 4)
    val tPos = w.pos
    w.i32(tPos - vtPos) // soffset: vtable = table - soffset
    var cur = 4
    slots.take(nSlots).foreach {
      case Some(Scalar(b, a)) =>
        val target = ((cur + a - 1) / a) * a
        while (cur < target) { w.u8(0); cur += 1 }
        w.bytes(b); cur += b.length
      case Some(Ref(t)) =>
        val target = ((cur + 3) / 4) * 4
        while (cur < target) { w.u8(0); cur += 1 }
        w.ref(t); cur += 4
      case None => ()
    }
    while (cur < tableSize) { w.u8(0); cur += 1 }
    tPos
  }

  private def writeStr(w: FbWriter, s: String): Int = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    w.align(4)
    val p = w.pos
    w.i32(b.length); w.bytes(b); w.u8(0)
    p
  }

  private def writeF64Vec(w: FbWriter, xs: Seq[Double]): Int = {
    w.align(8) // element alignment (length prefix sits at p, elems at p+4)
    while (w.pos % 8 != 4) w.u8(0)
    val p = w.pos
    w.i32(xs.length); xs.foreach(w.f64)
    p
  }

  private def writeU32Vec(w: FbWriter, xs: Seq[Int]): Int = {
    w.align(4)
    val p = w.pos
    w.i32(xs.length); xs.foreach(w.i32)
    p
  }

  // ---- write -------------------------------------------------------------

  private def geomFields(g: Geom): (Seq[Double], Seq[Int], Seq[Geom]) = g match {
    case Point(x, y) => (Seq(x, y), Nil, Nil)
    case MultiPoint(ps) => (ps.toSeq.flatMap(p => Seq(p.x, p.y)), Nil, Nil)
    case LineString(c) => (interleave(c), Nil, Nil)
    case MultiLineString(ls) =>
      val xy = ls.toSeq.flatMap(l => interleave(l.coords))
      (xy, endsOf(ls.toSeq.map(_.coords)), Nil)
    case Polygon(rings) =>
      (rings.toSeq.flatMap(interleave),
        if (rings.length > 1) endsOf(rings.toSeq) else Nil, Nil)
    case MultiPolygon(ps) => (Nil, Nil, ps.toSeq)
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  private def interleave(c: CoordSeq): Seq[Double] =
    (0 until c.xs.length).flatMap(i => Seq(c.xs(i), c.ys(i)))

  private def endsOf(parts: Seq[CoordSeq]): Seq[Int] =
    parts.scanLeft(0)(_ + _.xs.length).tail

  private def writeGeomTable(w: FbWriter, g: Geom, writeType: Boolean): Int = {
    val (xy, ends, parts) = geomFields(g)
    var xyPos = -1; var endsPos = -1
    val partPos = new Array[Int](parts.length)
    val t = writeTable(w, Seq(
      if (ends.nonEmpty) Some(Ref(() => endsPos)) else None, // 0 ends
      if (xy.nonEmpty) Some(Ref(() => xyPos)) else None, // 1 xy
      None, None, None, None, // z, m, t, tm
      if (writeType) Some(sU8(geomTypeOf(g))) else None, // 6 type
      if (parts.nonEmpty) Some(Ref(() => partPos(0))) else None)) // 7 parts
    if (xy.nonEmpty) xyPos = writeF64Vec(w, xy)
    if (ends.nonEmpty) endsPos = writeU32Vec(w, ends)
    if (parts.nonEmpty) {
      // vector of table offsets precedes the tables (offsets are
      // unsigned and point forward)
      w.align(4)
      val vp = w.pos
      w.i32(parts.length)
      val tps = new Array[Int](parts.length)
      parts.indices.foreach(i => w.ref(() => tps(i)))
      parts.zipWithIndex.foreach { case (p, i) =>
        tps(i) = writeGeomTable(w, p, writeType = false)
      }
      partPos(0) = vp
    }
    t
  }

  private def propBytes(columns: Seq[(String, Int)], row: Seq[Any]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def i32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    columns.zipWithIndex.foreach { case ((_, ct), i) =>
      row(i) match {
        case null => ()
        case v =>
          u16(i)
          ct match {
            case CtBool => bb.write(if (v.asInstanceOf[Boolean]) 1 else 0)
            case CtInt => i32(v.asInstanceOf[Number].intValue)
            case CtLong => i64(v.asInstanceOf[Number].longValue)
            case CtDouble =>
              i64(java.lang.Double.doubleToLongBits(
                v.asInstanceOf[Number].doubleValue))
            case CtString =>
              val b = v.toString.getBytes(StandardCharsets.UTF_8)
              i32(b.length); bb.write(b)
          }
      }
    }
    bb.toByteArray
  }

  /** Write a FlatGeobuf file. With `indexNodeSize >= 2` (the spec
    * default 16), features are Hilbert-sorted by envelope center and a
    * packed Hilbert R-tree is written between header and features —
    * node layout per the spec: 40-byte nodes, levels stored root-first,
    * internal offsets = absolute node index of the first child, leaf
    * offsets = feature byte offset. `indexNodeSize = 0` skips both.
    */
  def write(path: String, columns: Seq[(String, Int)], rows: Seq[Seq[Any]],
      geoms: Seq[Geom], name: String = "features",
      crsCode: Int = 4326, indexNodeSize: Int = 16): Unit = {
    require(rows.length == geoms.length, "rows/geoms length mismatch")
    val headerType = {
      val ts = geoms.map(geomTypeOf).distinct
      if (ts.length == 1) ts.head else 0
    }
    val indexed = indexNodeSize >= 2 && geoms.nonEmpty
    // dataset extent + spec feature order (hilbert of envelope centers)
    val envs = geoms.map(_.envelope)
    val extent =
      if (envs.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (envs.map(_._1).min, envs.map(_._2).min,
        envs.map(_._3).max, envs.map(_._4).max)
    val order: Seq[Int] =
      if (!indexed) geoms.indices
      else geoms.indices.sortBy { i =>
        val e = envs(i)
        SpatialKey.hilbert((e._1 + e._3) / 2, (e._2 + e._4) / 2,
          extent._1, extent._2, extent._3, extent._4)
      }
    // serialize features in final order to know sizes before the index
    val featBufs: Seq[Array[Byte]] = order.map { i =>
      featureBuffer(columns, rows(i), geoms(i), headerType)
    }
    val out = new java.io.FileOutputStream(path)
    try {
      out.write(Magic)
      // ---- header buffer
      val hw = new FbWriter()
      hw.i32(0) // root offset placeholder (patched via ref-less trick below)
      var namePos = -1; var colsVecPos = -1; var crsPos = -1; var envPos = -1
      val rootPos = writeTable(hw, Seq(
        Some(Ref(() => namePos)), // 0 name
        if (geoms.nonEmpty) Some(Ref(() => envPos)) else None, // 1 envelope
        Some(sU8(headerType)), // 2 geometry_type
        None, None, None, None, // 3-6 has_z..has_tm
        if (columns.nonEmpty) Some(Ref(() => colsVecPos)) else None, // 7
        Some(sU64(rows.length.toLong)), // 8 features_count
        Some(sU16(if (indexed) indexNodeSize else 0)), // 9 index_node_size
        Some(Ref(() => crsPos)))) // 10 crs
      namePos = writeStr(hw, name)
      if (geoms.nonEmpty) {
        envPos = writeF64Vec(hw,
          Seq(extent._1, extent._2, extent._3, extent._4))
      }
      if (columns.nonEmpty) {
        hw.align(4)
        colsVecPos = hw.pos
        hw.i32(columns.length)
        val colPos = new Array[Int](columns.length)
        columns.indices.foreach(i => hw.ref(() => colPos(i)))
        columns.zipWithIndex.foreach { case ((cn, ct), i) =>
          var np = -1
          colPos(i) = writeTable(hw, Seq(Some(Ref(() => np)), Some(sU8(ct))))
          np = writeStr(hw, cn)
        }
      }
      locally {
        var orgPos = -1
        crsPos = writeTable(hw, Seq(
          Some(Ref(() => orgPos)), Some(sI32(crsCode))))
        orgPos = writeStr(hw, "EPSG")
      }
      val headerBuf = hw.result()
      // patch root offset (i32 at 0 → rootPos relative to buffer start)
      headerBuf(0) = rootPos.toByte
      headerBuf(1) = (rootPos >> 8).toByte
      headerBuf(2) = (rootPos >> 16).toByte
      headerBuf(3) = (rootPos >> 24).toByte
      val lenPrefix = Array.tabulate(4)(i => (headerBuf.length >> (8 * i)).toByte)
      out.write(lenPrefix)
      out.write(headerBuf)
      // ---- packed Hilbert R-tree
      if (indexed) {
        // feature byte offsets (within the features section), sorted order
        val offsets = featBufs.scanLeft(0L)((acc, b) => acc + 4 + b.length)
        val itemEnvs = order.map(envs)
        out.write(packedRTree(itemEnvs, offsets, indexNodeSize))
      }
      // ---- features
      featBufs.foreach { fb =>
        out.write(Array.tabulate(4)(i => (fb.length >> (8 * i)).toByte))
        out.write(fb)
      }
    } finally out.close()
  }

  /** One size-prefix-less Feature flatbuffer. */
  private def featureBuffer(columns: Seq[(String, Int)], row: Seq[Any],
      g: Geom, headerType: Int): Array[Byte] = {
    val fw = new FbWriter()
    fw.i32(0)
    var geomPos = -1; var propsPos = -1
    val props = propBytes(columns, row)
    val fPos = writeTable(fw, Seq(
      Some(Ref(() => geomPos)),
      if (props.nonEmpty) Some(Ref(() => propsPos)) else None))
    geomPos = writeGeomTable(fw, g,
      writeType = headerType == 0 || geomTypeOf(g) != headerType)
    if (props.nonEmpty) {
      fw.align(4)
      propsPos = fw.pos
      fw.i32(props.length)
      fw.bytes(props)
    }
    val fb = fw.result()
    fb(0) = fPos.toByte; fb(1) = (fPos >> 8).toByte
    fb(2) = (fPos >> 16).toByte; fb(3) = (fPos >> 24).toByte
    fb
  }

  /** Level sizes bottom-up (items first) for numItems/nodeSize. */
  private def levelSizes(numItems: Long, nodeSize: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer(numItems)
    var n = numItems
    while ({ n = (n + nodeSize - 1) / nodeSize; out += n; n != 1 }) ()
    out.toSeq
  }

  /** Serialize the packed Hilbert R-tree: 40-byte LE nodes
    * (minX,minY,maxX,maxY doubles + u64 offset), levels root-first;
    * internal node offset = absolute node index of its first child,
    * leaf offset = the feature's byte offset.
    */
  private def packedRTree(itemEnvs: Seq[(Double, Double, Double, Double)],
      offsets: Seq[Long], nodeSize: Int): Array[Byte] = {
    val sizesBottomUp = levelSizes(itemEnvs.length.toLong, nodeSize)
    val sizesTopDown = sizesBottomUp.reverse.map(_.toInt)
    val starts = sizesTopDown.scanLeft(0)(_ + _) // per-level absolute start
    val numNodes = sizesTopDown.sum
    val boxes = new Array[(Double, Double, Double, Double)](numNodes)
    val offs = new Array[Long](numNodes)
    // leaf level (last top-down level)
    val leafStart = starts(sizesTopDown.length - 1)
    itemEnvs.indices.foreach { i =>
      boxes(leafStart + i) = itemEnvs(i)
      offs(leafStart + i) = offsets(i)
    }
    // build parents bottom-up
    var lvl = sizesTopDown.length - 2
    while (lvl >= 0) {
      val childStart = starts(lvl + 1)
      val childCount = sizesTopDown(lvl + 1)
      val myStart = starts(lvl)
      (0 until sizesTopDown(lvl)).foreach { i =>
        val c0 = i * nodeSize
        val c1 = math.min(c0 + nodeSize, childCount)
        var (x0, y0, x1, y1) =
          (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
        (c0 until c1).foreach { c =>
          val b = boxes(childStart + c)
          x0 = math.min(x0, b._1); y0 = math.min(y0, b._2)
          x1 = math.max(x1, b._3); y1 = math.max(y1, b._4)
        }
        boxes(myStart + i) = (x0, y0, x1, y1)
        offs(myStart + i) = (childStart + c0).toLong
      }
      lvl -= 1
    }
    val bb = java.nio.ByteBuffer.allocate(numNodes * 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until numNodes).foreach { i =>
      val b = boxes(i)
      bb.putDouble(b._1).putDouble(b._2).putDouble(b._3).putDouble(b._4)
      bb.putLong(offs(i))
    }
    bb.array()
  }

  /** Spatial filtered read driven by the packed R-tree: decodes ONLY the
    * features whose envelope intersects the query box (falls back to a
    * full-scan filter when the file carries no index).
    */
  def readFiltered(path: String, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Contents = {
    def hit(b: (Double, Double, Double, Double)): Boolean =
      b._1 <= xmax && xmin <= b._3 && b._2 <= ymax && ymin <= b._4
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length > 12 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file")
    val hr = new FbReader(bytes, 12)
    val headerLen = hr.i32(8)
    val header = hr.root
    val nodeSize = {
      val f = hr.field(header, 9); if (f < 0) 16 else hr.u16(f)
    }
    val featuresCount = {
      val f = hr.field(header, 8); if (f < 0) 0L else hr.i64(f)
    }
    if (nodeSize < 2 || featuresCount == 0) {
      val full = read(path)
      // a null geometry (spec-legal missing geometry field) matches no
      // spatial filter — dereferencing .envelope NPE'd on unindexed
      // files that read() itself accepts
      val keep = full.geoms.indices.filter(i =>
        full.geoms(i) != null && hit(full.geoms(i).envelope))
      return full.copy(rows = keep.map(full.rows),
        geoms = keep.map(full.geoms))
    }
    val indexStart = 12 + headerLen
    // bound BEFORE the Int narrowing: a corrupt header claiming huge
    // featuresCount yields an index size whose .toInt wraps, silently
    // decoding mid-file bytes as features instead of failing loudly
    val idxBytes = indexSize(featuresCount, nodeSize)
    require(idxBytes >= 0 && indexStart + idxBytes <= bytes.length,
      s"corrupt spatial index: $featuresCount features / node size " +
        s"$nodeSize imply $idxBytes index bytes in a ${bytes.length}-byte file")
    val featuresStart = indexStart + idxBytes.toInt
    def node(i: Int): ((Double, Double, Double, Double), Long) = {
      val p = indexStart + 40 * i
      ((hr.f64(p), hr.f64(p + 8), hr.f64(p + 16), hr.f64(p + 24)),
        hr.i64(p + 32))
    }
    val sizesTopDown = levelSizes(featuresCount, nodeSize).reverse.map(_.toInt)
    val starts = sizesTopDown.scanLeft(0)(_ + _)
    val leafLevel = sizesTopDown.length - 1
    val featureOffsets = scala.collection.mutable.ArrayBuffer[Long]()
    def search(idx: Int, level: Int): Unit = {
      val (box, off) = node(idx)
      if (!hit(box)) return
      if (level == leafLevel) featureOffsets += off
      else {
        // a corrupt child offset (negative, or before the next level's
        // start) must refuse: a very negative off.toInt makes this range
        // billions of elements — a HANG, not an error (10k-case fuzz)
        require(off >= starts(level + 1) && off <= starts(level + 2),
          s"corrupt index: child offset $off outside level ${level + 1} " +
            s"[${starts(level + 1)}, ${starts(level + 2)})")
        val childEnd = math.min(off.toInt + nodeSize, starts(level + 2))
        (off.toInt until childEnd).foreach(c => search(c, level + 1))
      }
    }
    search(0, 0)
    // decode selected features with the full header's schema
    val base = read0Header(hr, header)
    val (columns, headerType) = base
    val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val geoms = scala.collection.mutable.ArrayBuffer[Geom]()
    featureOffsets.sorted.foreach { off =>
      // leaf feature byte offsets are i64 in the file; compare in Long
      // BEFORE the Int narrowing — a corrupt 2^32+k offset wraps to a
      // small positive Int and silently decodes mid-file bytes as a
      // feature (silent wrong data), the same Int-wrap class the
      // indexSize guard above refuses loudly.
      require(off >= 0 && featuresStart + off < bytes.length,
        s"corrupt index: leaf feature offset $off outside feature " +
          s"section [0, ${bytes.length - featuresStart})")
      val pos = featuresStart + off.toInt
      decodeFeature(bytes, pos, columns, headerType, rows, geoms)
    }
    val name = Option(hr.field(header, 0)).filter(_ >= 0).map(hr.string)
    val crsCode = Option(hr.field(header, 10)).filter(_ >= 0).map(hr.indirect)
      .flatMap { crs =>
        val f = hr.field(crs, 1)
        if (f < 0) None else Some(hr.i32(f))
      }
    Contents(name, columns, rows.toSeq, geoms.toSeq, crsCode)
  }
}
