package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.meta.SpatialPartitioning
import graft.table.GeoTable

/** Spatial partition pruning on read: a Hive dataset written by
  * partitionByQuadkey/H3/Kdtree carries a `graft:partitioning` footer;
  * filterBbox derives a partition-column conjunct from the query bbox so
  * the FileSourceScan gets PartitionFilters (directory elimination), not
  * just row-group pruning. Reference behavior matched:
  * `core/partition_by_quadkey.py:27-226` + the partitioned-layout
  * spatial-query guidance in `docs/concepts/best-practices.md`.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_prune").toString + "/d"

  /** Points spread over the world from deterministic key coords. */
  private def pointTable(n: Int): GeoTable = {
    val df = spark.range(n).toDF("id")
      .withColumn("geometry", geo.st_point(
        col("id") * 37 % 360 - 180, col("id") * 83 % 170 - 85))
    GeoTable.fromDataFrame(df, "geometry")
  }

  /** Fat boxes (width/height up to ~6 deg) — anchors can sit far from
    * the envelope edge, exercising the recorded reach.
    */
  private def boxTable(n: Int): GeoTable = {
    val cx = col("id") * 37 % 340 - 170
    val cy = col("id") * 83 % 150 - 75
    val w = (col("id") % 7).cast("double") * 0.5 + 0.1
    val df = spark.range(n).toDF("id")
      .withColumn("geometry", geo.st_makeenvelope(
        cx - w, cy - w, cx + w, cy + w))
    GeoTable.fromDataFrame(df, "geometry")
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  private def partitionFilterCount(df: org.apache.spark.sql.DataFrame): Int = {
    val s = df.queryExecution.executedPlan.toString
    "PartitionFilters: \\[[^\\]]".r.findAllIn(s).length
  }

  test("quadkey-partitioned dataset: filterBbox prunes directories " +
      "(PartitionFilters populated, fewer files read) with equal results") {
    val out = tmp()
    pointTable(4000).partitionByQuadkey(zoom = 6, prefixChars = 2, out,
      force = true)
    val t = GeoTable.read(spark, out)
    assert(t.partitioning.exists(_.scheme == "quadkey"),
      "read must restore the partitioning footer")
    val pruned = t.filterBbox(-10, -10, 10, 10).df
    assert(partitionFilterCount(pruned) > 0,
      s"expected PartitionFilters in scan:\n${pruned.queryExecution.executedPlan.toString.take(2500)}")
    val allFiles = filesRead(t.df)
    val prunedFiles = filesRead(pruned.select(input_file_name().as("f")))
    assert(prunedFiles < allFiles,
      s"pruning must read fewer files: $prunedFiles vs $allFiles")
    // result equivalence vs a metadata-free slow path on the same data
    val want = spark.read.parquet(out)
      .filter(geo.envelope_intersects(col("geometry"), -10, -10, 10, 10))
      .select("id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"row mismatch: missing=${want -- got} extra=${got -- want}")
  }

  test("quadkey pruning stays SOUND for fat geometries: the recorded " +
      "anchor reach expands the covering") {
    val out = tmp()
    boxTable(3000).partitionByQuadkey(zoom = 5, prefixChars = 2, out,
      force = true)
    val t = GeoTable.read(spark, out)
    val sp = t.partitioning.get
    assert(sp.maxHalfW > 1.0 && sp.maxHalfH > 1.0,
      s"fat boxes must record a real reach, got $sp")
    for ((x0, y0, x1, y1) <- Seq((-10.0, -10.0, 10.0, 10.0),
        (87.3, 12.7, 94.1, 19.9), (-180.0, -85.0, -140.0, -40.0))) {
      val got = t.filterBbox(x0, y0, x1, y1).df
        .select("id").collect().map(_.getLong(0)).toSet
      val want = spark.read.parquet(out)
        .filter(geo.envelope_intersects(col("geometry"), x0, y0, x1, y1))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"bbox ($x0,$y0,$x1,$y1): missing=${want -- got} extra=${got -- want}")
    }
  }

  test("h3-partitioned dataset: filterBbox prunes directories with " +
      "equal results; oversized boxes refuse (scan all) but stay correct") {
    val out = tmp()
    pointTable(3000).partitionByH3(resolution = 1, out, force = true)
    val t = GeoTable.read(spark, out)
    assert(t.partitioning.exists(_.scheme == "h3"))
    val pruned = t.filterBbox(10, 10, 22, 22).df
    assert(partitionFilterCount(pruned) > 0,
      s"expected PartitionFilters:\n${pruned.queryExecution.executedPlan.toString.take(2500)}")
    assert(filesRead(pruned.select(input_file_name().as("f"))) < filesRead(t.df))
    val want = spark.read.parquet(out)
      .filter(geo.envelope_intersects(col("geometry"), 10, 10, 22, 22))
      .select("id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // near-pole box: documented refusal — no partition filter, same rows
    val polar = t.filterBbox(-170, 80, 170, 89).df
    val wantPolar = spark.read.parquet(out)
      .filter(geo.envelope_intersects(col("geometry"), -170, 80, 170, 89))
      .count()
    assert(polar.count() == wantPolar)
  }

  test("h3 covering soundness: every sampled point's cell is in the " +
      "covering of a small box around it (forward-transform property)") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 100; res <- Seq(0, 1, 2)) {
      val lat = rnd.nextDouble() * 160 - 80
      val lng = rnd.nextDouble() * 360 - 180
      val cell = graft.geom.H3.latLngToCellString(lat, lng, res)
      val d = 0.01
      val cov = SpatialPartitioning.h3Covering(res,
        lng - d, lat - d, lng + d, lat + d)
      assert(cov.forall(_.contains(cell)),
        s"cell $cell of ($lat,$lng) res=$res missing from covering")
    }
  }

  test("kdtree-partitioned dataset: filterBbox prunes leaf rectangles " +
      "with equal results") {
    val out = tmp()
    boxTable(3000).partitionByKdtree(iterations = 4, out)
    val t = GeoTable.read(spark, out)
    assert(t.partitioning.exists(sp =>
      sp.scheme == "kdtree" && sp.splits.isDefined))
    val pruned = t.filterBbox(-15, -15, 15, 15).df
    assert(partitionFilterCount(pruned) > 0,
      s"expected PartitionFilters:\n${pruned.queryExecution.executedPlan.toString.take(2500)}")
    assert(filesRead(pruned.select(input_file_name().as("f"))) < filesRead(t.df))
    val want = spark.read.parquet(out)
      .filter(geo.envelope_intersects(col("geometry"), -15, -15, 15, 15))
      .select("id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("pre-existing user key column: writer records NO partitioning " +
      "footer (anchor semantics unknown), read degrades to no pruning") {
    val out = tmp()
    val withKey = pointTable(500).addQuadkey(4)
    withKey.partitionByQuadkey(zoom = 4, prefixChars = 1, out, force = true)
    val t = GeoTable.read(spark, out)
    assert(t.partitioning.isEmpty,
      "user-supplied key column must not claim pruning metadata")
    // still correct, just unpruned
    val got = t.filterBbox(-10, -10, 10, 10).df.count()
    val want = spark.read.parquet(out)
      .filter(geo.envelope_intersects(col("geometry"), -10, -10, 10, 10))
      .count()
    assert(got == want)
  }

  test("partitioning JSON round-trips including the kd split tree") {
    import graft.ops.KdTree
    val tree = KdTree.Node(0.0,
      Some(KdTree.Node(-10.0, None, None)),
      Some(KdTree.Node(10.0, Some(KdTree.Node(5.0, None, None)), None)))
    val sp = SpatialPartitioning("kdtree", "kdtree_cell",
      splits = Some(tree), maxHalfW = 1.5, maxHalfH = 2.5)
    val back = SpatialPartitioning.fromJsonOpt(SpatialPartitioning.toJson(sp))
    assert(back.contains(sp))
    val qk = SpatialPartitioning("quadkey", "__qk", level = 3,
      maxHalfW = 0.25, maxHalfH = 0.25)
    assert(SpatialPartitioning.fromJsonOpt(SpatialPartitioning.toJson(qk))
      .contains(qk))
    assert(SpatialPartitioning.fromJsonOpt("{not json").isEmpty)
    assert(SpatialPartitioning.fromJsonOpt("""{"scheme":"bogus","column":"c"}""").isEmpty)
  }

  test("kd covering enumerates exactly the leaf rects hitting the box") {
    import graft.ops.KdTree
    // splits: x@0 then y@0 on both sides -> 4 quadrant leaves
    val tree = KdTree.Node(0.0,
      Some(KdTree.Node(0.0, None, None)),
      Some(KdTree.Node(0.0, None, None)))
    assert(SpatialPartitioning.kdCovering(tree, -5, -5, -1, -1) == Seq("00"))
    assert(SpatialPartitioning.kdCovering(tree, 1, 1, 5, 5) == Seq("11"))
    assert(SpatialPartitioning.kdCovering(tree, -5, -5, 5, 5).toSet ==
      Set("00", "01", "10", "11"))
    // boundary: x=0 belongs to the right side (v < split goes left)
    assert(SpatialPartitioning.kdCovering(tree, 0, 1, 5, 5).toSet ==
      Set("01", "11"))
  }
}
