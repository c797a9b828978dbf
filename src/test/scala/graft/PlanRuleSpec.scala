package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.plans.GraftExtensions
import graft.table.GeoTable

class PlanRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writtenTable(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft_rule").toString + "/d"
    val df = spark.range(2000).toDF("id")
      .withColumn("geometry", geo.st_point(
        col("id") * 37 % 360 - 180, col("id") * 91 % 180 - 90))
    GeoTable.fromDataFrame(df, "geometry").addBbox().write(out)
    out
  }

  test("bbox pushdown rule injects prunable conjuncts for st_intersects") {
    GraftExtensions.install(spark)
    val out = writtenTable()
    val df = spark.read.parquet(out)
      .filter(geo.st_intersects(col("geometry"), geo.st_makeenvelope(-60, -30, 60, 30)))

    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bbox") && optimized.contains("xmax"),
      s"expected bbox conjuncts in optimized plan:\n$optimized")

    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("bbox.xmax"),
      s"expected bbox pushed filters in scan:\n${physical.take(2000)}")

    // semantics unchanged: same rows as the plain precise predicate
    // (points: envelope test == intersects here)
    val expected = spark.read.parquet(out)
      .filter(col("bbox.xmax") >= -60 && col("bbox.xmin") <= 60 &&
        col("bbox.ymax") >= -30 && col("bbox.ymin") <= 30)
      .count()
    assert(df.count() == expected)
  }

  test("rule matches the literal in either st_intersects argument order") {
    GraftExtensions.install(spark)
    val out = writtenTable()
    // literal FIRST (the reference's other call-site order)
    val df = spark.read.parquet(out)
      .filter(geo.st_intersects(geo.st_makeenvelope(-60, -30, 60, 30), col("geometry")))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("bbox.xmax"),
      s"expected bbox pushed filters for literal-first order:\n${physical.take(2000)}")
    val expected = spark.read.parquet(out)
      .filter(geo.st_intersects(col("geometry"), geo.st_makeenvelope(-60, -30, 60, 30)))
      .count()
    assert(df.count() == expected)
  }

  test("rule is a no-op without a bbox column and is idempotent") {
    GraftExtensions.install(spark)
    val df = spark.range(100).toDF("id")
      .withColumn("geometry", geo.st_point(col("id").cast("double"), lit(0.0)))
      .filter(geo.st_intersects(col("geometry"), geo.st_makeenvelope(0, -1, 50, 1)))
    assert(df.count() == 51) // ids 0..50
    // idempotence: re-optimizing the optimized plan adds nothing
    val once = graft.plans.BboxPushdownRule(df.queryExecution.optimizedPlan)
    val twice = graft.plans.BboxPushdownRule(once)
    assert(once.toString == twice.toString)
  }
}
