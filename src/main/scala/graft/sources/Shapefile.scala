package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import graft.geom._

/** Pure-JVM ESRI Shapefile reader (read-only subset of the public spec:
  * shape types Point / MultiPoint / PolyLine / Polygon plus their Z/M
  * variants with Z/M dropped, attributes from the dBase III `.dbf`,
  * CRS text from `.prj`). The reference reaches shapefiles through GDAL
  * (`core/convert.py:42-108`); this covers the same ingest surface
  * without a native dependency.
  *
  * Parsing happens driver-side (the format caps files at 2 GB and is
  * not splittable without the index); the resulting rows are distributed
  * immediately, like the reference's read-then-register flow.
  */
object Shapefile {

  final case class DbfField(name: String, kind: Char, length: Int, decimals: Int)

  final case class Contents(
      geoms: Seq[Geom],
      fields: Seq[DbfField],
      records: Seq[Seq[Any]],
      prjWkt: Option[String])

  def read(shpPath: String): Contents = {
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shpPath))
    val base = shpPath.stripSuffix(".shp")
    val dbfPath = java.nio.file.Paths.get(base + ".dbf")
    val prjPath = java.nio.file.Paths.get(base + ".prj")
    val geoms = parseShp(shp)
    val (fields, records) =
      if (java.nio.file.Files.exists(dbfPath))
        parseDbf(java.nio.file.Files.readAllBytes(dbfPath))
      else (Seq.empty, geoms.map(_ => Seq.empty[Any]))
    val prj =
      if (java.nio.file.Files.exists(prjPath))
        Some(new String(java.nio.file.Files.readAllBytes(prjPath),
          StandardCharsets.UTF_8).trim)
      else None
    // strict arity: when the dbf is absent the branch above already
    // synthesizes one empty record per shape, so ANY size mismatch here
    // — including a present dbf declaring 0 records next to N shapes
    // (the old records.isEmpty escape hatch) — is corruption and must
    // fail loudly, not silently drop every attribute
    require(records.size == geoms.size,
      s"dbf has ${records.size} records but shp has ${geoms.size} shapes")
    Contents(geoms, fields, records, prj)
  }

  // ---- .shp --------------------------------------------------------------

  private def parseShp(bytes: Array[Byte]): Seq[Geom] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLenBytes = buf.getInt(24).toLong * 2
    val geoms = scala.collection.mutable.ArrayBuffer[Geom]()
    var off = 100
    while (off + 8 <= math.min(fileLenBytes, bytes.length)) {
      val contentWords = buf.getInt(off + 4)
      // every record carries at least the 4-byte shape type (2 words); a
      // zero or negative declared length would stall or reverse the walk
      // — unbounded geoms growth on corrupt input, an OOM not an error
      require(contentWords >= 2, s"bad record content length $contentWords")
      val contentStart = off + 8
      geoms += parseRecord(bytes, contentStart)
      off = contentStart + contentWords * 2
    }
    geoms.toSeq
  }

  private def parseRecord(bytes: Array[Byte], start: Int): Geom = {
    val b = ByteBuffer.wrap(bytes, start, bytes.length - start)
      .order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = b.getInt
    shapeType match {
      case 0 => GeometryCollection(Array.empty) // null shape
      case 1 | 11 | 21 => Point(b.getDouble, b.getDouble)
      case 8 | 18 | 28 => // MultiPoint: bbox + n + points
        b.position(b.position() + 32)
        val n = b.getInt
        // allocation bound BEFORE Array.fill: a corrupt count claims up
        // to 2^31 points; the buffer can hold at most remaining/16
        require(n >= 0 && n.toLong * 16 <= b.remaining(),
          s"bad multipoint count $n for ${b.remaining()} bytes")
        MultiPoint(Array.fill(n)(Point(b.getDouble, b.getDouble)))
      case 3 | 13 | 23 => // PolyLine: bbox + parts + points
        val parts = readParts(b)
        val ls = parts.map(cs => LineString(cs))
        if (ls.length == 1) ls.head else MultiLineString(ls)
      case 5 | 15 | 25 => // Polygon: rings (shells CW, holes CCW per spec)
        val rings = parts2Rings(readParts(b))
        rings
      case t => throw new IllegalArgumentException(s"unsupported shape type $t")
    }
  }

  /** bbox + numParts + numPoints + part offsets + xy points. */
  private def readParts(b: ByteBuffer): Array[CoordSeq] = {
    b.position(b.position() + 32) // skip bbox
    val numParts = b.getInt
    val numPoints = b.getInt
    // corrupt counts must refuse before allocating (see parseRecord):
    // parts are 4 bytes each, points 16, and both live in THIS buffer
    require(numParts >= 0 && numParts.toLong * 4 <= b.remaining(),
      s"bad part count $numParts for ${b.remaining()} bytes")
    require(numPoints >= 0 &&
      numPoints.toLong * 16 <= b.remaining() - numParts.toLong * 4,
      s"bad point count $numPoints for ${b.remaining()} bytes")
    val starts = Array.fill(numParts)(b.getInt)
    val xs = new Array[Double](numPoints)
    val ys = new Array[Double](numPoints)
    var i = 0
    while (i < numPoints) { xs(i) = b.getDouble; ys(i) = b.getDouble; i += 1 }
    Array.tabulate(numParts) { p =>
      val s = starts(p)
      val e = if (p + 1 < numParts) starts(p + 1) else numPoints
      CoordSeq(xs.slice(s, e), ys.slice(s, e))
    }
  }

  /** Shapefile ring convention: clockwise = shell, counterclockwise =
    * hole. Holes attach to the first shell whose ring contains their
    * first vertex. Rings are re-wound on read to CCW shells / CW holes —
    * the orientation GeoParquet and RFC 7946 GeoJSON recommend (GDAL's
    * GeoJSON writer does the same to this fixture data).
    */
  private[graft] def parts2Rings(rings: Array[CoordSeq]): Geom = {
    def reversed(r: CoordSeq): CoordSeq =
      CoordSeq(r.xs.reverse, r.ys.reverse)
    def ccwShell(r: CoordSeq): CoordSeq =
      if (Orientation.signedArea(r) < 0) reversed(r) else r
    def cwHole(r: CoordSeq): CoordSeq =
      if (Orientation.signedArea(r) > 0) reversed(r) else r
    if (rings.isEmpty) return Polygon(Array.empty) // empty polygon record
    if (rings.length == 1) return Polygon(Array(ccwShell(rings(0))))
    val (shells, holes) = rings.partition(r => Orientation.signedArea(r) < 0)
    if (shells.isEmpty) {
      // nonconformant writer: every ring is CCW, so the CW-shell rule
      // found nothing. Treat the largest-area ring as the shell (CCW)
      // and nest the rest as CW holes — never emit a CW exterior.
      val shellIdx = rings.indices.maxBy(i =>
        math.abs(Orientation.signedArea(rings(i))))
      Polygon(ccwShell(rings(shellIdx)) +:
        rings.indices.filter(_ != shellIdx).map(i => cwHole(rings(i))).toArray)
    } else if (shells.length == 1)
      Polygon(shells.map(ccwShell) ++ holes.map(cwHole))
    else {
      val assigned = shells.map(s =>
        scala.collection.mutable.ArrayBuffer(ccwShell(s)))
      holes.foreach { h =>
        val px = h.xs(0); val py = h.ys(0)
        val owner = shells.indexWhere(s => Ops.pointInRing(px, py, s))
        assigned(if (owner >= 0) owner else 0) += cwHole(h)
      }
      MultiPolygon(assigned.map(rs => Polygon(rs.toArray)))
    }
  }

  // ---- .dbf --------------------------------------------------------------

  private def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Seq[Any]]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = b.getInt(4)
    val headerSize = java.lang.Short.toUnsignedInt(b.getShort(8))
    val recordSize = java.lang.Short.toUnsignedInt(b.getShort(10))
    // declared records must physically fit the file (spec: file length =
    // header + n*recordSize + EOF byte); without this a corrupt count
    // with zero declared fields materializes 2^31 empty rows — an OOM,
    // not a loud error. recordSize >= 1 (the deletion flag) per spec.
    require(recordSize >= 1, s"bad dbf record size $recordSize")
    // records start AT headerSize, so the bound must include it (file
    // length = header + n*recordSize + EOF byte) — without headerSize a
    // corrupt count can pass while records run past end-of-buffer.
    require(headerSize >= 32, s"bad dbf header size $headerSize")
    require(numRecords >= 0 &&
      headerSize + numRecords.toLong * recordSize <= bytes.length.toLong,
      s"dbf declares $headerSize B header + $numRecords records of " +
        s"$recordSize B in ${bytes.length} B")
    // field descriptors: 32 bytes each, from offset 32 to 0x0D terminator
    val fields = scala.collection.mutable.ArrayBuffer[DbfField]()
    var off = 32
    while (off + 32 <= headerSize && bytes(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(i => bytes(i) == 0).getOrElse(off + 11)
      val name = new String(bytes, off, nameEnd - off, StandardCharsets.US_ASCII)
      val kind = bytes(off + 11).toChar
      val len = java.lang.Byte.toUnsignedInt(bytes(off + 16))
      val dec = java.lang.Byte.toUnsignedInt(bytes(off + 17))
      fields += DbfField(name, kind, len, dec)
      off += 32
    }
    val records = (0 until numRecords).map { r =>
      val base = headerSize + r * recordSize
      var f = base + 1 // skip deletion flag
      fields.toSeq.map { fd =>
        val raw = new String(bytes, f, fd.length, StandardCharsets.UTF_8).trim
        f += fd.length
        fd.kind match {
          case 'N' | 'F' =>
            if (raw.isEmpty) null
            else if (fd.decimals == 0 && fd.kind == 'N')
              try java.lang.Long.valueOf(raw)
              catch { case _: NumberFormatException => java.lang.Double.valueOf(raw) }
            else java.lang.Double.valueOf(raw)
          case 'L' =>
            if (raw.isEmpty || raw == "?") null
            else java.lang.Boolean.valueOf("YyTt".contains(raw.head))
          case _ => if (raw.isEmpty) null else raw
        }
      }
    }
    (fields.toSeq, records)
  }

  // ---- .shp/.dbf writer (test fixtures + sink parity) --------------------

  /** Minimal writer for Point/Polygon features — enough for round-trip
    * tests and the GDAL-format sink surface (`core/format_writers.py`).
    */
  def write(shpPath: String, geoms: Seq[Geom],
      fields: Seq[DbfField] = Seq.empty,
      records: Seq[Seq[Any]] = Seq.empty): Unit = {
    val recs = geoms.map {
      case Point(x, y) =>
        val c = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        c.putInt(1); c.putDouble(x); c.putDouble(y); c.array()
      case p: Polygon =>
        // shapefile convention on disk: shell CW, holes CCW — re-wind
        // whatever orientation the caller holds
        def rev(r: CoordSeq): CoordSeq = CoordSeq(r.xs.reverse, r.ys.reverse)
        val rings = p.rings.zipWithIndex.map { case (r, i) =>
          val area = Orientation.signedArea(r)
          if (i == 0) { if (area > 0) rev(r) else r }
          else { if (area < 0) rev(r) else r }
        }
        val n = rings.map(_.size).sum
        // 4 type + 32 bbox + 8 counts + 4/part + 16/point — an extra 8
        // bytes here padded every record with junk zeros that strict
        // readers reject against the shape-type length formula
        val c = ByteBuffer.allocate(44 + rings.length * 4 + n * 16)
          .order(ByteOrder.LITTLE_ENDIAN)
        c.putInt(5)
        val (x0, y0, x1, y1) = p.envelope
        c.putDouble(x0); c.putDouble(y0); c.putDouble(x1); c.putDouble(y1)
        c.putInt(rings.length); c.putInt(n)
        var s = 0
        rings.foreach { r => c.putInt(s); s += r.size }
        rings.foreach(_.foreach((x, y) => { c.putDouble(x); c.putDouble(y) }))
        c.array()
      case g => throw new IllegalArgumentException(
        s"writer supports Point/Polygon, got ${g.typeName}")
    }
    val contentBytes = recs.map(_.length + 8).sum
    val buf = ByteBuffer.allocate(100 + contentBytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994); buf.position(24)
    buf.putInt((100 + contentBytes) / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000)
    buf.putInt(recs.headOption.map(r =>
      ByteBuffer.wrap(r).order(ByteOrder.LITTLE_ENDIAN).getInt).getOrElse(0))
    val env = geoms.map(_.envelope)
    // empty input is legal (header-only file) — min/max over an empty
    // Seq would throw 'empty.min'
    if (env.isEmpty) { (1 to 4).foreach(_ => buf.putDouble(0.0)) }
    else {
      buf.putDouble(env.map(_._1).min); buf.putDouble(env.map(_._2).min)
      buf.putDouble(env.map(_._3).max); buf.putDouble(env.map(_._4).max)
    }
    buf.position(100)
    recs.zipWithIndex.foreach { case (r, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1); buf.putInt(r.length / 2)
      buf.put(r)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(shpPath), buf.array())
    if (fields.nonEmpty) writeDbf(shpPath.stripSuffix(".shp") + ".dbf",
      fields, records)
  }

  private def writeDbf(path: String, fields: Seq[DbfField],
      records: Seq[Seq[Any]]): Unit = {
    val recordSize = 1 + fields.map(_.length).sum
    val headerSize = 32 + fields.size * 32 + 1
    val buf = ByteBuffer.allocate(headerSize + records.size * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte); buf.put(Array[Byte](124, 1, 1)) // version + date
    buf.putInt(records.size)
    buf.putShort(headerSize.toShort); buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { f =>
      val name = f.name.take(10).getBytes(StandardCharsets.US_ASCII)
      val p0 = buf.position()
      buf.put(name); buf.position(p0 + 11)
      buf.put(f.kind.toByte)
      buf.position(p0 + 16)
      buf.put(f.length.toByte); buf.put(f.decimals.toByte)
      buf.position(p0 + 32)
    }
    buf.put(0x0d.toByte)
    records.foreach { r =>
      // zip would silently TRUNCATE a short record and shift every later
      // record left in the fixed-stride buffer — all subsequent rows
      // would read back as garbage
      require(r.size == fields.size,
        s"dbf record has ${r.size} values for ${fields.size} fields")
      buf.put(' '.toByte)
      r.zip(fields).foreach { case (v, f) =>
        val s = Option(v).map {
          case d: java.lang.Double if f.decimals > 0 =>
            String.format(java.util.Locale.ROOT, s"%${f.length}.${f.decimals}f", d)
          case other => other.toString
        }.getOrElse("")
        // numeric overflow must fail loudly: right-aligned take() would
        // drop the LEAST-significant digits and store a different
        // number with no warning (character fields truncate by DBF
        // convention — lossy but standard)
        if ((f.kind == 'N' || f.kind == 'F') && s.length > f.length)
          throw new IllegalArgumentException(
            s"dbf field ${f.name}: value '$s' exceeds width ${f.length}")
        // UTF-8 to match parseDbf's decode (US_ASCII silently mangled
        // non-ASCII to '?'); truncate at BYTE budget without splitting a
        // multi-byte sequence, then pad with spaces to the field width
        val raw = s.getBytes(StandardCharsets.UTF_8)
        val cut =
          if (raw.length <= f.length) raw.length
          else {
            var c = f.length
            while (c > 0 && (raw(c) & 0xc0) == 0x80) c -= 1
            c
          }
        val cell = new Array[Byte](f.length)
        java.util.Arrays.fill(cell, ' '.toByte)
        if (f.kind == 'N' || f.kind == 'F')
          System.arraycopy(raw, 0, cell, f.length - cut, cut) // right-align
        else System.arraycopy(raw, 0, cell, 0, cut)
        buf.put(cell)
      }
    }
    buf.put(0x1a.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }
}
