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
      srsId: Int, columns: Seq[String], rootPage: Int)

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

  /** crude CREATE TABLE parser: column names in declaration order. */
  private def columnsFromSql(sql: String): Seq[String] = {
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
      .filterNot(p => Seq("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK", "FOREIGN")
        .exists(k => p.toUpperCase.startsWith(k)))
      .map { p =>
        val tok = p.split("\\s+").head
        tok.stripPrefix("\"").stripSuffix("\"").stripPrefix("`").stripSuffix("`")
          .stripPrefix("[").stripSuffix("]")
      }
  }

  /** GPKG geometry blob ("GP" header + envelope + WKB). */
  private def parseGpkgGeom(b: Array[Byte]): Geom = {
    require(b.length > 8 && b(0) == 'G' && b(1) == 'P', "not a GPKG geometry blob")
    val flags = b(3) & 0xff
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

  def featureTables(path: String): Seq[FeatureTable] = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
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
        FeatureTable(tbl, gcol, srs, columnsFromSql(m._4), m._3.toInt)
      }
    }
  }

  def read(path: String, tableName: Option[String] = None): Contents = {
    val db = new Db(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val tables = featureTables(path)
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
      // INTEGER PRIMARY KEY (fid) is a rowid alias stored as NULL
      val vals = vals0.zipWithIndex.map {
        case (null, 0) => rowid
        case (v, _) => v
      }
      geoms += parseGpkgGeom(vals(gIdx).asInstanceOf[Array[Byte]])
      rows += vals.zipWithIndex.filterNot(_._2 == gIdx).map(_._1)
    }
    Contents(t.columns.filterNot(_ == t.geometryColumn), t.geometryColumn,
      t.srsId, rows.toSeq, geoms.toSeq)
  }
}
