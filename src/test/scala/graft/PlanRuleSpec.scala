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

  test("rule must NOT fire on st_intersects under OR (bbox overlap is " +
      "not implied for every surviving row)") {
    GraftExtensions.install(spark)
    val out = writtenTable()
    // rows far outside the envelope but with id < 100 satisfy the OR;
    // the old rule ANDed the bbox conjuncts on and dropped them
    val df = spark.read.parquet(out).filter(
      geo.st_intersects(col("geometry"), geo.st_makeenvelope(-1, -1, 1, 1))
        || col("id") < 100)
    val want = spark.read.parquet(out).collect().count { r =>
      val id = r.getAs[Long]("id")
      val x = id * 37 % 360 - 180; val y = id * 91 % 180 - 90
      (x >= -1 && x <= 1 && y >= -1 && y <= 1) || id < 100
    }
    assert(df.count() == want, s"OR semantics: got ${df.count()}, want $want")
  }

  test("rule skips plans with two geometry-typed columns (the covering " +
      "may describe the OTHER one)") {
    GraftExtensions.install(spark)
    val out = writtenTable()
    // a second binary column rides along: the rule cannot know which
    // geometry the bbox struct covers, so it must not prune
    val df = spark.read.parquet(out)
      .withColumn("geometry2", geo.st_point(lit(100.0), lit(80.0)))
      .filter(geo.st_intersects(col("geometry2"),
        geo.st_makeenvelope(99, 79, 101, 81)))
    // every row's geometry2 intersects; pruning by the FIRST geometry's
    // bbox (the old behavior) would drop most rows
    assert(df.count() == 2000, s"got ${df.count()}")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("bbox.xmax"),
      s"rule must not add conjuncts for an uncovered geometry:\n$optimized")
  }
}
