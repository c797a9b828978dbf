package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import graft.geom.{Geom, Wkb}

/** Pure-JVM GeoPackage reader: a read-only subset of the public SQLite
  * file format (table b-trees, records, overflow chains) plus the GPKG
  * geometry blob header — enough to list feature tables via
  * `gpkg_geometry_columns` and scan their rows. The reference reaches
  * GeoPackage through GDAL (`core/convert.py:42-108`).
  *
  * Driver-side parse like the Shapefile path (the format is a single
  * SQLite file); rows are distributed immediately after.
  */
object GeoPackage {

  final case class FeatureTable(name: String, geometryColumn: String,
      srsId: Int, columns: Seq[String], rootPage: Int,
      /** declaration index of the INTEGER PRIMARY KEY rowid alias, or -1 —
        * SQLite stores that column as NULL and the rowid IS the value. */
      pkIndex: Int = -1)

  final case class Contents(columns: Seq[String], geometryColumn: String,
      srsId: Int, rows: Seq[Seq[Any]], geoms: Seq[Geom])

  // ---- SQLite primitives -------------------------------------------------

  private final class Db(val bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not an SQLite file")
    val pageSize: Int = {
      val v = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (v == 1) 65536 else v
    }
    val reserved: Int = bytes(20) & 0xff
    val usable: Int = pageSize - reserved

    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

    /** (value, bytesRead) of an SQLite varint at off. */
    def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i)
        v = (v << 7) | (b & 0x7fL)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(off + 8) & 0xffL), 9)
    }

    /** full payload of a leaf-table cell, following overflow pages. */
    def payload(off: Int, totalLen: Long): (Array[Byte], Int) = {
      // local-storage rule for table leaves (SQLite file format docs)
      val maxLocal = usable - 35
      if (totalLen <= maxLocal)
        return (java.util.Arrays.copyOfRange(bytes, off, off + totalLen.toInt),
          totalLen.toInt)
      val minLocal = (usable - 12) * 32 / 255 - 23
      var local = minLocal + ((totalLen - minLocal) % (usable - 4)).toInt
      if (local > maxLocal) local = minLocal
      val out = new Array[Byte](totalLen.toInt)
      System.arraycopy(bytes, off, out, 0, local)
      var written = local
      var page = u32(off + local).toInt
      while (page != 0 && written < totalLen) {
        val base = (page - 1) * pageSize
        val next = u32(base).toInt
        val n = math.min(usable - 4, totalLen.toInt - written)
        System.arraycopy(bytes, base + 4, out, written, n)
        written += n
        page = next
      }
      (out, local + 4)
    }

    /** visit every (rowid, record bytes) of a table b-tree. */
    def walk(rootPage: Int)(f: (Long, Array[Byte]) => Unit): Unit = {
      val base = (rootPage - 1) * pageSize
      val hdr = if (rootPage == 1) base + 100 else base
      val ptype = bytes(hdr) & 0xff
      val nCells = u16(hdr + 3)
      ptype match {
        case 0x0d => // leaf table
          val cellPtrs = hdr + 8
          var c = 0
          while (c < nCells) {
            var off = base + u16(cellPtrs + 2 * c)
            val (plen, n1) = varint(off); off += n1
            val (rowid, n2) = varint(off); off += n2
            val (rec, _) = payload(off, plen)
            f(rowid, rec)
            c += 1
          }
        case 0x05 => // interior table
          val cellPtrs = hdr + 12
          var c = 0
          while (c < nCells) {
            val off = base + u16(cellPtrs + 2 * c)
            walk(u32(off).toInt)(f)
            c += 1
          }
          walk(u32(hdr + 8).toInt)(f)
        case t => throw new IllegalArgumentException(
          s"unexpected b-tree page type 0x${t.toHexString} at page $rootPage")
      }
    }

    /** decode an SQLite record into column values. */
    def record(rec: Array[Byte]): Seq[Any] = {
      def vint(off: Int): (Long, Int) = {
        var v = 0L
        var i = 0
        while (i < 8) {
          val b = rec(off + i)
          v = (v << 7) | (b & 0x7fL)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (rec(off + 8) & 0xffL), 9)
      }
      val (hdrLenL, n0) = vint(0)
      val hdrLen = hdrLenL.toInt
      val types = scala.collection.mutable.ArrayBuffer[Long]()
      var p = n0
      while (p < hdrLen) {
        val (t, n) = vint(p)
        types += t
        p += n
      }
      var off = hdrLen
      types.toSeq.map { t =>
        def intN(n: Int): Long = {
          var v = if ((rec(off) & 0x80) != 0) -1L else 0L
          var i = 0
          while (i < n) { v = (v << 8) | (rec(off + i) & 0xffL); i += 1 }
          off += n
          v
        }
        t match {
          case 0 => null
          case 1 => intN(1)
          case 2 => intN(2)
          case 3 => intN(3)
          case 4 => intN(4)
          case 5 => intN(6)
          case 6 => intN(8)
          case 7 =>
            val v = java.lang.Double.longBitsToDouble(intN(8)); v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(rec, off, len, StandardCharsets.UTF_8)
            off += len; s
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(rec, off, off + len)
            off += len; b
        }
      }
    }
  }

  // ---- GeoPackage layer --------------------------------------------------

  /** crude CREATE TABLE parser: column declarations in order. */
  private def columnDecls(sql: String): Seq[String] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    var depth = 0
    val parts = scala.collection.mutable.ArrayBuffer[StringBuilder](new StringBuilder)
    body.foreach {
      case '(' => depth += 1; parts.last.append('(')
      case ')' => depth -= 1; parts.last.append(')')
      case ',' if depth == 0 => parts += new StringBuilder
      case c => parts.last.append(c)
    }
    parts.toSeq.map(_.toString.trim)
      // table-constraint clauses are recognized by their FIRST TOKEN
      // exactly: a startsWith test filtered real columns whose names
      // merely begin with a keyword ("primary_fuel TEXT"), shifting
      // every later column against the stored record
      .filterNot { p =>
        val tok = p.split("[\\s(]", 2)(0).toUpperCase
        Seq("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK", "FOREIGN")
          .contains(tok)
      }
  }

  /** First identifier of a column declaration — quote-aware, so a quoted
    * name containing spaces ("zip code") survives instead of truncating
    * at the first space. */
  private def declName(p: String): String = p.headOption match {
    case Some(q @ ('"' | '`')) =>
      val end = p.indexOf(q, 1)
      if (end > 0) p.substring(1, end) else p.drop(1)
    case Some('[') =>
      val end = p.indexOf(']', 1)
      if (end > 0) p.substring(1, end) else p.drop(1)
    case _ => p.split("\\s+").head
  }

  private def columnsFromSql(sql: String): Seq[String] =
    columnDecls(sql).map(declName)

  /** Declaration tail after the (quote-aware) column name. */
  private def declTail(p: String): String = p.headOption match {
    case Some(q @ ('"' | '`')) =>
      val end = p.indexOf(q, 1)
      if (end > 0) p.substring(end + 1) else ""
    case Some('[') =>
      val end = p.indexOf(']', 1)
      if (end > 0) p.substring(end + 1) else ""
    case _ =>
      val m = "\\s".r.findFirstMatchIn(p)
      m.map(x => p.substring(x.start)).getOrElse("")
  }

  /** Index of the rowid-alias column (the one SQLite stores as NULL),
    * or -1. Per SQLite's rowid rules the declared TYPE must be exactly
    * INTEGER and the column-level PRIMARY KEY must not be DESC
    * ("x INTEGER PRIMARY KEY DESC" stores REAL values, it is NOT an
    * alias). Matching the declaration TAIL (not the whole decl) keeps a
    * CHECK expression that merely mentions both words from matching,
    * and the contiguous PRIMARY\s+KEY phrase is required. */
  private val RowidAliasTail =
    """(?is)^INTEGER\b.*\bPRIMARY\s+KEY(?!\s+DESC\b).*""".r
  private[graft] def rowidAliasIndex(sql: String): Int =
    columnDecls(sql).indexWhere { d =>
      RowidAliasTail.matches(declTail(d).trim)
    }

  /** GPKG geometry blob ("GP" header + envelope + WKB). A NULL stored
    * value is a legal GeoPackage geometry (spec table schemas allow it)
    * and maps to a null Geom, not an error.
    */
  private def parseGpkgGeom(b: Array[Byte]): Geom = {
    if (b == null || b.isEmpty) return null
    require(b.length > 8 && b(0) == 'G' && b(1) == 'P', "not a GPKG geometry blob")
    val flags = b(3) & 0xff
    // ExtendedGeoPackageBinary (flags bit 5) carries a 4-byte extension
    // code before an extension-DEFINED body — parsing it as WKB would
    // read garbage; fail with the real reason
    require((flags & 0x20) == 0,
      "extended GeoPackage binary (flags bit 5) is not supported")
    val envIndicator = (flags >> 1) & 7
    val envDoubles = envIndicator match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case other => throw new IllegalArgumentException(s"bad envelope code $other")
    }
    val wkbStart = 8 + envDoubles * 8
    Wkb.read(java.util.Arrays.copyOfRange(b, wkbStart, b.length))
  }

  def featureTables(path: String): Seq[FeatureTable] =
    featureTables(new Db(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))))

  private def featureTables(db: Db): Seq[FeatureTable] = {
    // sqlite_master: (type, name, tbl_name, rootpage, sql)
    val master = scala.collection.mutable.ArrayBuffer[(String, String, Long, String)]()
    db.walk(1) { (_, rec) =>
      val vals = db.record(rec)
      if (vals.length >= 5 && vals(0) == "table")
        master += ((vals(1).asInstanceOf[String], vals(2).asInstanceOf[String],
          vals(3).asInstanceOf[Long], Option(vals(4)).map(_.toString).getOrElse("")))
    }
    val geomCols = master.find(_._1 == "gpkg_geometry_columns").toSeq.flatMap { m =>
      val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      db.walk(m._3.toInt) { (_, rec) => rows += db.record(rec) }
      // (table_name, column_name, geometry_type_name, srs_id, z, m)
      rows.toSeq.map(r => (r(0).asInstanceOf[String], r(1).asInstanceOf[String],
        r(3).asInstanceOf[Long].toInt))
    }
    geomCols.flatMap { case (tbl, gcol, srs) =>
      master.find(_._1 == tbl).map { m =>
        FeatureTable(tbl, gcol, srs, columnsFromSql(m._4), m._3.toInt,
          rowidAliasIndex(m._4))
      }
    }
  }

  // ---- GeoPackage writer -------------------------------------------------
  //
  // Pure-JVM sink: a minimal but conformant SQLite writer (leaf/interior
  // table b-trees, overflow chains, 100-byte header with the GPKG
  // application id + user_version) carrying gpkg_spatial_ref_sys,
  // gpkg_contents, gpkg_geometry_columns and one feature table of GPKG
  // geometry blobs. The reference writes GeoPackage through GDAL
  // (`core/format_writers.py:42-243`); the payload-local/overflow split
  // mirrors the reader's `payload` rule above, so write→read is exact.

  /** SQLite varint (big-endian 7-bit groups; 9-byte form for values
    * needing bits 63..56 — e.g. negative rowids like srs_id -1).
    */
  private def varintBytes(v0: Long): Array[Byte] = {
    if (v0 < 0 || (v0 >>> 56) != 0) {
      val out = new Array[Byte](9)
      out(8) = (v0 & 0xff).toByte
      var i = 7
      var v = v0 >>> 8
      while (i >= 0) { out(i) = ((v & 0x7f) | 0x80).toByte; v >>>= 7; i -= 1 }
      out
    } else {
      val tmp = scala.collection.mutable.ArrayBuffer[Byte]((v0 & 0x7f).toByte)
      var v = v0 >>> 7
      while (v != 0) { tmp += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      tmp.reverse.toArray
    }
  }

  /** (serial type, body bytes) of one record value. */
  private def serialOf(v: Any): (Long, Array[Byte]) = {
    def be(l: Long, n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      var x = l; var i = n - 1
      while (i >= 0) { a(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
      a
    }
    v match {
      case null => (0L, Array.emptyByteArray)
      case b: Boolean => serialOf(if (b) 1L else 0L)
      case i: Int => serialOf(i.toLong)
      case l: Long =>
        if (l >= -128 && l <= 127) (1L, be(l, 1))
        else if (l >= -32768 && l <= 32767) (2L, be(l, 2))
        else if (l >= -8388608 && l <= 8388607) (3L, be(l, 3))
        else if (l >= Int.MinValue && l <= Int.MaxValue) (4L, be(l, 4))
        else if (l >= -140737488355328L && l <= 140737488355327L) (5L, be(l, 6))
        else (6L, be(l, 8))
      case f: Float => serialOf(f.toDouble)
      case d: Double => (7L, be(java.lang.Double.doubleToLongBits(d), 8))
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8); (13L + 2 * b.length, b)
      case b: Array[Byte] => (12L + 2 * b.length, b)
      case other => serialOf(other.toString)
    }
  }

  /** SQLite record: header of serial-type varints (length-prefixed,
    * self-inclusive) + value bodies.
    */
  private[graft] def buildRecord(values: Seq[Any]): Array[Byte] = {
    val sv = values.map(serialOf)
    val typesLen = sv.map(t => varintBytes(t._1).length).sum
    var hdrLen = typesLen + 1
    while (varintBytes(hdrLen).length + typesLen != hdrLen)
      hdrLen = varintBytes(hdrLen).length + typesLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(varintBytes(hdrLen))
    sv.foreach(t => out.write(varintBytes(t._1)))
    sv.foreach(t => out.write(t._2))
    out.toByteArray
  }

  /** Page-at-a-time SQLite file builder (page numbers are 1-based). */
  private final class SqliteBuilder(val pageSize: Int = 4096) {
    val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length }
    private def usable: Int = pageSize // reserved space 0
    private def maxLocal: Int = usable - 35
    private def minLocal: Int = (usable - 12) * 32 / 255 - 23
    private def put16(p: Array[Byte], off: Int, v: Int): Unit = {
      p(off) = (v >> 8).toByte; p(off + 1) = v.toByte
    }
    private def put32(p: Array[Byte], off: Int, v: Long): Unit = {
      p(off) = (v >> 24).toByte; p(off + 1) = (v >> 16).toByte
      p(off + 2) = (v >> 8).toByte; p(off + 3) = v.toByte
    }
    private def pageOffset(page: Int): Int = if (page == 1) 100 else 0

    /** leaf cell (varint P + varint rowid + local payload [+ overflow
      * chain]) — the exact inverse of the reader's `payload` rule.
      */
    private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
      val plen = payload.length
      val head = varintBytes(plen.toLong) ++ varintBytes(rowid)
      if (plen <= maxLocal) head ++ payload
      else {
        var local = minLocal + ((plen - minLocal) % (usable - 4))
        if (local > maxLocal) local = minLocal
        var off = local
        var firstPage = 0
        var prevPage = 0
        while (off < plen) {
          val pg = alloc()
          if (firstPage == 0) firstPage = pg
          if (prevPage != 0) put32(pages(prevPage - 1), 0, pg)
          val n = math.min(usable - 4, plen - off)
          System.arraycopy(payload, off, pages(pg - 1), 4, n)
          off += n
          prevPage = pg
        }
        val ptr = new Array[Byte](4)
        put32(ptr, 0, firstPage)
        head ++ payload.slice(0, local) ++ ptr
      }
    }

    private def finalizeLeaf(cells: Seq[Array[Byte]], page: Int,
        pageType: Int = 0x0d): Unit = {
      val p = pages(page - 1)
      val hdr = pageOffset(page)
      p(hdr) = pageType.toByte
      put16(p, hdr + 3, cells.length)
      var contentStart = pageSize
      cells.zipWithIndex.foreach { case (cell, i) =>
        contentStart -= cell.length
        System.arraycopy(cell, 0, p, contentStart, cell.length)
        put16(p, hdr + 8 + 2 * i, contentStart)
      }
      put16(p, hdr + 5, if (contentStart == 65536) 0 else contentStart)
    }

    private def finalizeInterior(children: Seq[(Int, Long)], page: Int): Unit = {
      val p = pages(page - 1)
      val hdr = pageOffset(page)
      p(hdr) = 0x05
      put16(p, hdr + 3, children.length - 1)
      put32(p, hdr + 8, children.last._1)
      var contentStart = pageSize
      children.init.zipWithIndex.foreach { case ((child, maxRowid), i) =>
        val cell = new Array[Byte](4) ++ varintBytes(maxRowid)
        put32(cell, 0, child)
        contentStart -= cell.length
        System.arraycopy(cell, 0, p, contentStart, cell.length)
        put16(p, hdr + 12 + 2 * i, contentStart)
      }
      put16(p, hdr + 5, if (contentStart == 65536) 0 else contentStart)
    }

    /** greedy split into page-sized groups (ptrSize = 2 per cell). */
    private def group[A](items: Seq[(A, Int)], capacity: Int): Seq[Seq[A]] = {
      val out = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[A]())
      var free = capacity
      items.foreach { case (a, len) =>
        if (len + 2 > free && out.last.nonEmpty) {
          out += scala.collection.mutable.ArrayBuffer[A](); free = capacity
        }
        out.last += a; free -= len + 2
      }
      out.map(_.toSeq).toSeq
    }

    private def buildInterior(children: Seq[(Int, Long)],
        rootAt: Option[Int]): Int = {
      if (children.length == 1 && rootAt.isEmpty) return children.head._1
      val offset = rootAt.map(pageOffset).getOrElse(0)
      val fitsOne = children.init
        .map(c => 4 + varintBytes(c._2).length + 2).sum <= usable - 12 - offset
      if (fitsOne) {
        val p = rootAt.getOrElse(alloc())
        finalizeInterior(children, p)
        p
      } else {
        val groups = group(
          children.map(c => c -> (4 + varintBytes(c._2).length)), usable - 12)
        val ips = groups.map { g =>
          val p = alloc(); finalizeInterior(g, p); (p, g.last._2)
        }
        buildInterior(ips, rootAt)
      }
    }

    /** Build a table b-tree (rows must be in ascending rowid order);
      * returns the root page. `rootAt = Some(1)` pins the root onto
      * page 1 (sqlite_master), after the 100-byte file header.
      */
    def table(rows: Seq[(Long, Array[Byte])], rootAt: Option[Int] = None): Int = {
      val offset = rootAt.map(pageOffset).getOrElse(0)
      val cells = rows.map { case (rid, rec) => (rid, leafCell(rid, rec)) }
      val groups = group(cells.map(c => c -> c._2.length),
        usable - 8 - offset)
      if (groups.length == 1 && rootAt.isDefined) {
        finalizeLeaf(groups.head.map(_._2), rootAt.get)
        rootAt.get
      } else if (groups.length == 1 && groups.head.isEmpty) {
        val p = alloc(); finalizeLeaf(Nil, p); p
      } else {
        val leaves = groups.map { g =>
          val p = alloc(); finalizeLeaf(g.map(_._2), p)
          (p, g.last._1)
        }
        buildInterior(leaves, rootAt)
      }
    }

    /** Single-leaf index b-tree (page type 0x0a) — the automatic
      * indexes SQLite derives from TEXT PRIMARY KEY / UNIQUE
      * constraints; integrity_check demands they exist and agree with
      * the table. Records are (key columns..., rowid); only used for
      * the one-row gpkg_* metadata tables, so one leaf always fits.
      */
    def indexLeaf(records: Seq[Array[Byte]]): Int = {
      val cells = records.map(r => varintBytes(r.length.toLong) ++ r)
      require(cells.map(_.length + 2).sum <= usable - 8,
        "autoindex exceeds one page")
      val p = alloc()
      finalizeLeaf(cells, p, pageType = 0x0a)
      p
    }

    /** Write the 100-byte header into page 1 and flush all pages. */
    def finish(path: String): Unit = {
      val p1 = pages.head
      val magic = "SQLite format 3\u0000".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(magic, 0, p1, 0, 16)
      put16(p1, 16, pageSize)
      p1(18) = 1; p1(19) = 1 // legacy journaling read/write versions
      p1(21) = 64; p1(22) = 32; p1(23) = 32 // payload fractions
      put32(p1, 24, 1) // file change counter
      put32(p1, 28, pages.length)
      put32(p1, 40, 1) // schema cookie
      put32(p1, 44, 4) // schema format
      put32(p1, 56, 1) // UTF-8
      put32(p1, 60, 10300) // GPKG user_version (1.3)
      put32(p1, 68, 0x47504B47L) // application id "GPKG"
      put32(p1, 92, 1) // version-valid-for
      put32(p1, 96, 3045001)
      val out = new java.io.FileOutputStream(path)
      try pages.foreach(out.write) finally out.close()
    }
  }

  /** GPKG geometry blob: "GP" magic, LE byte order, envelope code 1
    * ([minx,maxx,miny,maxy]), srs id, then ISO WKB.
    */
  private[graft] def gpkgBlob(g: Geom, srsId: Int): Array[Byte] = {
    if (g == null) return null // stored as SQL NULL — spec-legal
    val wkb = Wkb.write(g)
    val (x0, y0, x1, y1) = g.envelope
    val buf = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('P'.toByte).put(0.toByte)
    buf.put(((1 << 1) | 1).toByte)
    buf.putInt(srsId)
    buf.putDouble(x0).putDouble(x1).putDouble(y0).putDouble(y1)
    buf.put(wkb)
    buf.array()
  }

  private def geometryTypeName(geoms: Seq[Geom]): String = {
    val names = geoms.map {
      case _: graft.geom.Point => "POINT"
      case _: graft.geom.LineString => "LINESTRING"
      case _: graft.geom.Polygon => "POLYGON"
      case _: graft.geom.MultiPoint => "MULTIPOINT"
      case _: graft.geom.MultiLineString => "MULTILINESTRING"
      case _: graft.geom.MultiPolygon => "MULTIPOLYGON"
      case _ => "GEOMETRY"
    }.distinct
    if (names.length == 1) names.head else "GEOMETRY"
  }

  private def sqlType(v: Any): String = v match {
    case _: Long | _: Int => "INTEGER"
    case _: Double | _: Float => "DOUBLE"
    case _: Boolean => "BOOLEAN"
    case _: Array[Byte] => "BLOB"
    case _ => "TEXT"
  }

  /** Write a single-feature-table GeoPackage. `rows` are the attribute
    * values (no geometry), `geoms` the parallel geometries.
    */
  def write(path: String, tableName: String, geometryColumn: String,
      srsId: Int, attrNames: Seq[String], rows: Seq[Seq[Any]],
      geoms: Seq[Geom]): Unit = {
    require(rows.length == geoms.length, "rows/geoms length mismatch")
    // identifiers are embedded in generated DDL inside double quotes
    // without escaping; an embedded quote would produce schema SQL this
    // module's own reader (and external SQLite tools) mis-parse — the
    // column list would diverge from the record arity. Reject loudly.
    (tableName +: geometryColumn +: attrNames).foreach { n =>
      require(!n.contains('"') && !n.contains('\u0000'),
        s"identifier contains a double quote or NUL: $n")
    }
    val b = new SqliteBuilder()
    b.alloc() // page 1: sqlite_master root + file header

    // gpkg_spatial_ref_sys — srs_id is INTEGER PRIMARY KEY, i.e. a
    // rowid alias stored as NULL; rows must be rowid-ascending
    val wgs84Def = "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
      "SPHEROID[\"WGS 84\",6378137,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"
    val srsBase = Seq(
      (-1L, Seq[Any]("Undefined cartesian SRS", null, "NONE", -1L, "undefined", null)),
      (0L, Seq[Any]("Undefined geographic SRS", null, "NONE", 0L, "undefined", null)),
      (4326L, Seq[Any]("WGS 84 geodetic", null, "EPSG", 4326L, wgs84Def, null)))
    val srsRows = (if (srsBase.exists(_._1 == srsId.toLong)) srsBase
      else srsBase :+ (srsId.toLong,
        Seq[Any](s"EPSG:$srsId", null, "EPSG", srsId.toLong, "undefined", null)))
      .sortBy(_._1)
    val srsRoot = b.table(srsRows.map { case (rid, vs) => (rid, buildRecord(vs)) })

    // feature table — fid INTEGER PRIMARY KEY rowid alias (NULL), then
    // geometry blob, then attributes
    val featRoot = b.table(rows.zip(geoms).zipWithIndex.map {
      case ((attrs, g), i) =>
        (i + 1L, buildRecord(null +: gpkgBlob(g, srsId) +: attrs))
    })

    // gpkg_contents with the dataset envelope (null geometries are
    // legal stored values and contribute nothing to the extent)
    val env = geoms.filter(_ != null).map(_.envelope)
    val (cx0, cy0, cx1, cy1) =
      if (env.isEmpty) (null, null, null, null)
      else (env.map(_._1).min: Any, env.map(_._2).min: Any,
        env.map(_._3).max: Any, env.map(_._4).max: Any)
    val contentsRoot = b.table(Seq((1L, buildRecord(Seq[Any](
      tableName, "features", tableName, "", "2026-01-01T00:00:00.000Z",
      cx0, cy0, cx1, cy1, srsId.toLong)))))

    val gcRoot = b.table(Seq((1L, buildRecord(Seq[Any](
      tableName, geometryColumn, geometryTypeName(geoms.filter(_ != null)), srsId.toLong,
      0L, 0L)))))

    // automatic indexes implied by the TEXT PRIMARY KEY / UNIQUE
    // constraints (one entry each: the single metadata row)
    val idxContentsPk = b.indexLeaf(Seq(buildRecord(Seq[Any](tableName, 1L))))
    val idxContentsIdent = b.indexLeaf(Seq(buildRecord(Seq[Any](tableName, 1L))))
    val idxGcPk = b.indexLeaf(Seq(
      buildRecord(Seq[Any](tableName, geometryColumn, 1L))))

    // sqlite_master
    val attrDdl = attrNames.zipWithIndex.map { case (n, i) =>
      val t = rows.iterator.map(_(i)).find(_ != null).map(sqlType).getOrElse("TEXT")
      s""""$n" $t"""
    }
    val ddl = Map(
      "gpkg_spatial_ref_sys" ->
        ("CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, " +
          "srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, " +
          "organization_coordsys_id INTEGER NOT NULL, " +
          "definition TEXT NOT NULL, description TEXT)"),
      "gpkg_contents" ->
        ("CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, " +
          "data_type TEXT NOT NULL, identifier TEXT UNIQUE, " +
          "description TEXT DEFAULT '', last_change DATETIME NOT NULL, " +
          "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, " +
          "srs_id INTEGER)"),
      "gpkg_geometry_columns" ->
        ("CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, " +
          "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, " +
          "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, " +
          "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"),
      tableName ->
        (s"""CREATE TABLE "$tableName" ("fid" INTEGER PRIMARY KEY, """ +
          s""""$geometryColumn" ${geometryTypeName(geoms.filter(_ != null))}""" +
          (if (attrDdl.isEmpty) "" else attrDdl.mkString(", ", ", ", "")) + ")"))
    val masterRows = Seq[(String, String, String, Int, Any)](
      ("table", "gpkg_spatial_ref_sys", "gpkg_spatial_ref_sys", srsRoot,
        ddl("gpkg_spatial_ref_sys")),
      ("table", "gpkg_contents", "gpkg_contents", contentsRoot,
        ddl("gpkg_contents")),
      ("index", "sqlite_autoindex_gpkg_contents_1", "gpkg_contents",
        idxContentsPk, null),
      ("index", "sqlite_autoindex_gpkg_contents_2", "gpkg_contents",
        idxContentsIdent, null),
      ("table", "gpkg_geometry_columns", "gpkg_geometry_columns", gcRoot,
        ddl("gpkg_geometry_columns")),
      ("index", "sqlite_autoindex_gpkg_geometry_columns_1",
        "gpkg_geometry_columns", idxGcPk, null),
      ("table", tableName, tableName, featRoot, ddl(tableName))
    ).zipWithIndex.map { case ((typ, name, tbl, root, sql), i) =>
      (i + 1L, buildRecord(Seq[Any](typ, name, tbl, root.toLong, sql)))
    }
    b.table(masterRows, rootAt = Some(1))
    b.finish(path)
  }

  def read(path: String, tableName: Option[String] = None): Contents = {
    // ONE byte-array copy of the file: featureTables reuses this Db
    // rather than re-reading (a 1.5 GB .gpkg would otherwise hold two
    // full copies on the driver heap)
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val tables = featureTables(db)
    require(tables.nonEmpty, s"no feature tables in $path")
    val t = tableName match {
      case Some(n) => tables.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(
          s"no feature table $n (have ${tables.map(_.name).mkString(",")})"))
      case None => tables.head
    }
    val gIdx = t.columns.indexOf(t.geometryColumn)
    require(gIdx >= 0, s"geometry column ${t.geometryColumn} not in ${t.columns}")
    val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val geoms = scala.collection.mutable.ArrayBuffer[Geom]()
    db.walk(t.rootPage) { (rowid, rec) =>
      val vals0 = db.record(rec)
      // ALTER TABLE ADD COLUMN leaves pre-existing records SHORT of the
      // schema arity (SQLite semantics: missing trailing values read as
      // NULL) — pad, or the geometry index lands out of bounds and row
      // arity drifts from the schema
      val valsP =
        if (vals0.length >= t.columns.length) vals0
        else vals0 ++ Seq.fill(t.columns.length - vals0.length)(null)
      // the INTEGER PRIMARY KEY column (by DECLARATION, not position 0)
      // is a rowid alias stored as NULL — a genuinely-NULL first column
      // must stay NULL
      val vals = valsP.zipWithIndex.map {
        case (null, i) if i == t.pkIndex => rowid
        case (v, _) => v
      }
      geoms += parseGpkgGeom(vals(gIdx).asInstanceOf[Array[Byte]])
      rows += vals.zipWithIndex.filterNot(_._2 == gIdx).map(_._1)
    }
    Contents(t.columns.filterNot(_ == t.geometryColumn), t.geometryColumn,
      t.srsId, rows.toSeq, geoms.toSeq)
  }
}
