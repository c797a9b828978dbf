package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{ArcGis, Stac}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("arcgis source pages until exhausted with pushdown params") {
    // fake service: 2 full pages of 3 + final page of 1 (7 features)
    def page(ids: Seq[Int], exceeded: Boolean): String = {
      val features = ids.map { i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},
           "properties":{"oid":$i}}"""
      }.mkString(",")
      s"""{"type":"FeatureCollection","exceededTransferLimit":$exceeded,
         "features":[$features]}"""
    }
    val requested = scala.collection.mutable.ArrayBuffer[String]()
    val fetch: ArcGis.Fetcher = { url =>
      requested += url
      val offset = "resultOffset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      offset match {
        case 0 => page(Seq(1, 2, 3), exceeded = true)
        case 3 => page(Seq(4, 5, 6), exceeded = true)
        case 6 => page(Seq(7), exceeded = false)
        case _ => page(Seq.empty, exceeded = false)
      }
    }
    val q = ArcGis.Query(where = "pop > 10", outFields = Seq("oid"),
      bbox = Some((-10.0, -10.0, 10.0, 10.0)), pageSize = 3)
    val t = ArcGis.read(spark, "http://example.test/FeatureServer/0", q, fetch)
    assert(t.count() == 7)
    // pushdown params present in every request
    assert(requested.forall(u => u.contains("where=pop+%3E+10") ||
      u.contains("where=pop%20%3E%2010")))
    assert(requested.forall(_.contains("geometryType=esriGeometryEnvelope")))
    assert(requested.head.contains("resultRecordCount=3"))
    // pagination stopped after the short page
    assert(requested.size == 3)
  }

  test("stac item from written geoparquet validates") {
    import graft.functions.geo
    val out = java.nio.file.Files.createTempDirectory("graft_stac").toString + "/d"
    val df = spark.range(50).toDF("id")
      .withColumn("geometry", geo.st_point(
        col("id").cast("double") % 90, col("id").cast("double") % 45))
    graft.table.GeoTable.fromDataFrame(df, "geometry").addBbox().write(out)
    val item = Stac.item(out, "item-1", "s3://bucket/d.parquet",
      "2024-01-01T00:00:00Z")
    assert(Stac.validateItem(item).isEmpty)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(item)
    assert(node.get("properties").get("table:row_count").asLong == 50)
    assert(node.get("bbox").size == 4)
    // collection wraps item bboxes
    val coll = Stac.collection("c1", "test", Seq((0.0, 0.0, 89.0, 44.0)))
    assert(coll.contains("\"Collection\""))
  }
}
