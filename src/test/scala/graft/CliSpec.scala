package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.cli.Main
import graft.functions.geo
import graft.table.GeoTable

/** CLI command chain — the reference's flagship quick-start pipeline
  * (convert -> add bbox -> sort hilbert -> extract -> inspect).
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cli_$name").toString

  test("flagship CLI chain: convert csv -> extract -> to geojson") {
    val dir = tmp("chain")
    // input CSV
    val csv = new StringBuilder("id,wkt\n")
    (0 until 200).foreach { i =>
      csv.append(s"$i,POINT (${i % 90} ${i % 45})\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      csv.toString)

    // convert applies hilbert + bbox by default (reference CLI semantic)
    Main.run(spark, Seq("convert", s"$dir/in.csv", s"$dir/a.parquet",
      "--wkt-column", "wkt"))
    val a = GeoTable.read(spark, s"$dir/a.parquet")
    assert(a.count() == 200)
    assert(a.meta.primary.get.coveringBbox.contains("bbox"))
    assert(a.checkSpatialOrder() < 0.5) // hilbert applied

    Main.run(spark, Seq("extract", s"$dir/a.parquet", s"$dir/b.parquet",
      "--bbox", "0,0,40,40", "--columns", "id", "--limit", "50"))
    val b = GeoTable.read(spark, s"$dir/b.parquet")
    assert(b.count() <= 50 && b.count() > 0)
    assert(b.df.columns.toSet == Set("id", "geometry", "bbox"))

    Main.run(spark, Seq("to", "geojson", s"$dir/b.parquet", s"$dir/gj",
      "--precision", "3"))
    assert(spark.read.text(s"$dir/gj").count() == b.count())

    Main.run(spark, Seq("add", "quadkey", s"$dir/a.parquet", s"$dir/q.parquet",
      "--zoom", "6"))
    val q = GeoTable.read(spark, s"$dir/q.parquet")
    assert(q.df.columns.contains("quadkey"))

    Main.run(spark, Seq("reproject", s"$dir/a.parquet", s"$dir/m.parquet",
      "--from", "EPSG:4326", "--to", "EPSG:3857"))
    val m = GeoTable.read(spark, s"$dir/m.parquet")
    val mx = m.df.select(max(geo.st_x(col("geometry")))).head().getDouble(0)
    assert(mx > 180.0) // meters now, not degrees
  }
}
