package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.geom.H3
import graft.functions.geo
import graft.table.GeoTable

/** H3 indexing: canonical published vectors, global structural
  * invariants, and the GeoTable/SQL surface.
  */
class H3Spec extends AnyFunSuite {

  test("pinned face+IJK base-cell table matches a fresh derivation") {
    // the table constant removed the per-JVM derivation cost from the
    // hot path; this keeps the derivation machinery the checked source
    // of truth (a wrong edit to either side fails here)
    assert(graft.geom.H3.deriveTable()
      .sameElements(graft.geom.H3.pinnedTable))
  }

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pentagons = Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  test("canonical published vectors") {
    // h3 docs quickstart
    assert(H3.latLngToCellString(37.7752702151959257, -122.418307270836, 9)
      == "8928308280fffff")
    // h3 polyfill/docs res-5 example
    assert(H3.latLngToCellString(37.3615593, -122.0553238, 5)
      == "85283473fffffff")
    // h3-java TestCore vector (lng given there as 191.598...E)
    assert(H3.latLngToCellString(67.194013596, -168.401741982, 5)
      == "850dab63fffffff")
    // documented center of the quickstart cell rounds back to it
    assert(H3.latLngToCellString(37.77670234943567, -122.41845932318311, 9)
      == "8928308280fffff")
  }

  test("res-1 globe structure: 842 cells, 7 children per hexagon, 6 per pentagon") {
    val cells = scala.collection.mutable.Set[Long]()
    val n = 450
    for (a <- 0 until n; b <- 0 until 2 * n) {
      val lat = -90.0 + 180.0 * (a + 0.5) / n
      val lng = -180.0 + 360.0 * (b + 0.5) / (2 * n)
      cells += H3.latLngToCell(lat, lng, 1)
    }
    assert(cells.size == 842, s"res-1 cell count ${cells.size}")
    val byBase = cells.groupBy(H3.getBaseCell)
    assert(byBase.size == 122)
    byBase.foreach { case (bc, cs) =>
      assert(cs.size == (if (pentagons(bc)) 6 else 7),
        s"base cell $bc has ${cs.size} res-1 children")
    }
  }

  test("pentagon cells never carry a leading K digit") {
    for (s <- 0 until 20000) {
      val lat = -90.0 + (s * 7919 % 180000) / 1000.0
      val lng = -180.0 + (s * 104729 % 360000) / 1000.0
      for (res <- Seq(2, 5, 9)) {
        val c = H3.latLngToCell(lat, lng, res)
        if (pentagons(H3.getBaseCell(c))) {
          val lead = (1 to res).iterator
            .map(r => ((c >> ((15 - r) * 3)) & 7L).toInt)
            .find(_ != 0).getOrElse(0)
          assert(lead != 1, s"leading K in ${java.lang.Long.toHexString(c)}")
        }
      }
    }
  }

  test("parent-child containment holds away from cell boundaries") {
    // children overhang parent boundaries, so latLngToCell(p, r+1)'s
    // parent can differ from latLngToCell(p, r) near edges — but only
    // there; the global rate is a structure check
    var ok = 0; var bad = 0
    for (s <- 1 to 300; r <- 0 until 14) {
      val lat = (s * 37 % 170) - 85 + 0.123
      val lng = (s * 91 % 360) - 180 + 0.456
      val c = H3.latLngToCell(lat, lng, r)
      if (H3.cellToParent(H3.latLngToCell(lat, lng, r + 1), r) == c) ok += 1
      else bad += 1
    }
    val rate = ok.toDouble / (ok + bad)
    assert(rate > 0.85, s"parent-child agreement $rate")
  }

  test("resolution bounds are enforced") {
    intercept[IllegalArgumentException](H3.latLngToCell(0, 0, -1))
    intercept[IllegalArgumentException](H3.latLngToCell(0, 0, 16))
  }

  test("addH3 writes the reference's default column and respects the CRS gate") {
    val df = spark.range(1, 50).toDF("id")
      .withColumn("geometry", geo.st_point(col("id") * 3 - 75, col("id") - 25))
    val t = GeoTable.fromDataFrame(df, "geometry").addH3()
    assert(t.df.columns.contains("h3_cell"))
    val rows = t.df.select("id", "h3_cell").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val expect = H3.latLngToCellString(id - 25.0, id * 3 - 75.0, 9)
      assert(r.getString(1) == expect)
    }
    intercept[IllegalArgumentException](
      GeoTable.fromDataFrame(df, "geometry").addH3(16))
    val projected = GeoTable.fromDataFrame(df, "geometry")
      .reproject("EPSG:4326", "EPSG:3857")
    intercept[IllegalArgumentException](projected.addH3())
  }

  test("partitionByH3 writes one hive folder per cell with per-file metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_h3part").toString
    // a few tight clusters -> few distinct res-5 cells
    val df = spark.range(0, 300).toDF("id")
      .withColumn("geometry", geo.st_point(
        (col("id") % 3) * 30 - 30 + col("id") / 10000.0,
        (col("id") % 3) * 20 - 20))
    GeoTable.fromDataFrame(df, "geometry")
      .partitionByH3(5, s"$dir/out", force = true)
    val folders = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(folders.nonEmpty && folders.forall(_.startsWith("__h3=")))
    // 3 clusters, each possibly straddling one res-5 cell boundary
    assert(folders.length >= 3 && folders.length <= 6, folders.toSeq.toString)
    val back = GeoTable.read(spark, s"$dir/out")
    assert(back.df.count() == 300)
    assert(back.df.columns.contains("h3_cell"))
  }

  test("h3_latlng_to_cell_string registers in SQL") {
    geo.register(spark)
    val out = spark.sql(
      "SELECT h3_latlng_to_cell_string(37.7752702151959257, -122.418307270836, 9) AS c")
      .head().getString(0)
    assert(out == "8928308280fffff")
  }
}
