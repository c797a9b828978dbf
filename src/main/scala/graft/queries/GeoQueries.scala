package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.geo
import QueryDef.table
import Coords._

/** Additional ST-function oracle coverage: quadkey strings, WebMercator
  * reprojection, geometric measures, WKT text output — each recomputed
  * independently in DuckDB SQL so the Catalyst expressions (and the
  * codecs under them) are hash-verified, not just unit-tested.
  */
object GeoQueries {

  /** DuckDB SQL for slippy tile x/y at a zoom (mirrors SpatialKey.tile:
    * clamp lat to WebMercator bounds, floor, clamp to [0, 2^z-1]).
    */
  private def tileSql(lon: String, lat: String, z: Int): (String, String) = {
    val n = 1L << z
    val latC = s"GREATEST(-85.051128779806604, LEAST(85.051128779806604, $lat))"
    val lonC = s"GREATEST(-180.0, LEAST(180.0, $lon))"
    val xt = s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR(($lonC + 180.0) / 360.0 * $n) AS BIGINT)))"
    val latRad = s"radians($latC)"
    val yt = s"LEAST(${n - 1}, GREATEST(0, CAST(FLOOR((1.0 - ln(tan($latRad) + 1.0 / cos($latRad)) / pi()) / 2.0 * $n) AS BIGINT)))"
    (xt, yt)
  }

  /** Quadkey digit concat: digit_i = 2*bit_i(y) + bit_i(x), msb first. */
  private def quadkeySql(xt: String, yt: String, z: Int): String =
    (z - 1 to 0 by -1).map { i =>
      s"CAST((($xt >> $i) & 1) + 2 * (($yt >> $i) & 1) AS VARCHAR)"
    }.mkString(" || ")

  val defs: Seq[QueryDef] = Seq(
    // ---- quadkey string vs independent SQL tile math -------------------
    QueryDef(
      "q33_quadkey",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "customer")
          .withColumn("qk",
            geo.quadkey(lon($"c_custkey"), lat($"c_custkey"), 8))
          .select($"c_custkey", $"qk")
          .orderBy($"c_custkey")
      }, {
        val (xt, yt) = tileSql(lonSql("c_custkey"), latSql("c_custkey"), 8)
        Some(s"""WITH tiles AS (
            SELECT c_custkey, $xt AS xt, $yt AS yt FROM customer)
          SELECT c_custkey, ${quadkeySql("xt", "yt", 8)} AS qk
          FROM tiles ORDER BY c_custkey""")
      }),

    // ---- WebMercator forward transform through WKB --------------------
    QueryDef(
      "q34_reproject",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "supplier")
          .withColumn("g", geo.st_point(lon($"s_suppkey"), lat($"s_suppkey")))
          .withColumn("m", geo.st_transform($"g", "EPSG:4326", "EPSG:3857"))
          .select($"s_suppkey",
            round(geo.st_x($"m"), 4).as("mx"),
            round(geo.st_y($"m"), 4).as("my"))
          .orderBy($"s_suppkey")
      },
      Some(s"""SELECT s_suppkey,
          ROUND(6378137.0 * radians(${lonSql("s_suppkey")}), 4) AS mx,
          ROUND(6378137.0 * ln(tan(pi() / 4 +
            radians(GREATEST(-89.9999, LEAST(89.9999, ${latSql("s_suppkey")}))) / 2)), 4) AS my
        FROM supplier ORDER BY s_suppkey""")),

    // ---- measures: distance(lag), centroid, npoints, validity ---------
    QueryDef(
      "q35_geo_measures",
      (s, dir) => {
        import s.implicits._
        val cx = lon($"s_suppkey"); val cy = lat($"s_suppkey")
        val base = table(s, dir, "supplier")
          .withColumn("sq", geo.st_makeenvelope(
            cx - 0.5, cy - 0.5, cx + 0.5, cy + 0.5))
          .withColumn("g", geo.st_point(cx, cy))
        // exact global lag of the point geometry without a
        // single-partition window
        graft.ops.DistWindow
          .withLag1(base, "s_suppkey", Seq("g" -> "pg"))
          .select($"s_suppkey",
            round(geo.st_x(geo.st_centroid($"sq")), 6).as("centroid_x"),
            round(geo.st_y(geo.st_centroid($"sq")), 6).as("centroid_y"),
            geo.st_npoints($"sq").as("np"),
            geo.st_isvalid($"sq").as("valid"),
            geo.st_geometrytype($"sq").as("gtype"),
            when($"pg".isNotNull,
              round(geo.st_distance($"g", $"pg"), 6)).as("dist_prev"))
          .orderBy($"s_suppkey")
      },
      Some(s"""WITH pts AS (
          SELECT s_suppkey, ${lonSql("s_suppkey")} AS x, ${latSql("s_suppkey")} AS y
          FROM supplier)
        SELECT s_suppkey,
          ROUND(x, 6) AS centroid_x, ROUND(y, 6) AS centroid_y,
          5 AS np, TRUE AS valid, 'POLYGON' AS gtype,
          CASE WHEN px IS NOT NULL THEN
            ROUND(SQRT((x - px) * (x - px) + (y - py) * (y - py)), 6)
          END AS dist_prev
        FROM (SELECT s_suppkey, x, y,
            LAG(x) OVER (ORDER BY s_suppkey) AS px,
            LAG(y) OVER (ORDER BY s_suppkey) AS py
          FROM pts) t
        ORDER BY s_suppkey""")),

    // ---- as-of join: composed window formulation vs native ASOF -------
    // Spark's batch API has no as-of join; ours is one shuffle + window
    // carry-forward (graft.ops.AsOf). DuckDB verifies with its NATIVE
    // ASOF LEFT JOIN — two completely independent formulations.
    QueryDef(
      "q37_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = JoinQueries.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"value")
        graft.ops.AsOf.join(clicks, purchases, "user_id", "ts", "ts",
            Map("value" -> "last_purchase"))
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"),
            (coalesce(round($"last_purchase" * 100), lit(-1)).cast("long"))
              .as("purchase_cents"))
          .orderBy($"event_id")
      },
      Some("""WITH l AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id,
          epoch_us(l.ts) AS ts_us,
          CAST(COALESCE(ROUND(r.value * 100), -1) AS BIGINT) AS purchase_cents
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id""")),

    // ---- WKT text output (integral coords -> exact string match) ------
    QueryDef(
      "q36_wkt_text",
      (s, dir) => {
        import s.implicits._
        val k = $"p_partkey"
        // keys divisible by 8: lon/lat fractions vanish -> integral coords
        table(s, dir, "part")
          .filter(k % 8 === 0)
          .withColumn("g", geo.st_point(lon(k), lat(k)))
          .select($"p_partkey", geo.st_astext($"g").as("wkt"),
            geo.st_asgeojson($"g").as("gj"))
          .orderBy($"p_partkey")
      },
      Some(s"""SELECT p_partkey,
          'POINT (' || CAST(CAST(${lonSql("p_partkey")} AS BIGINT) AS VARCHAR)
            || ' ' || CAST(CAST(${latSql("p_partkey")} AS BIGINT) AS VARCHAR)
            || ')' AS wkt,
          '{"type":"Point","coordinates":[' ||
            CAST(CAST(${lonSql("p_partkey")} AS BIGINT) AS VARCHAR) || '.0,' ||
            CAST(CAST(${latSql("p_partkey")} AS BIGINT) AS VARCHAR) || '.0]}' AS gj
        FROM part WHERE p_partkey % 8 = 0
        ORDER BY p_partkey""")),

    // ---- H3 cells vs canonical published vectors -----------------------
    // The sandbox DuckDB has no h3 extension, so the oracle is a literal
    // table of independently-published H3 test vectors (h3 docs
    // quickstart, h3-java TestCore, the documented cell-center round
    // trip). A wrong face constant, base-cell table, rotation, or digit
    // step in graft.geom.H3 breaks these exact strings.
    QueryDef(
      "q38_h3",
      (s, dir) => {
        import s.implicits._
        val pts = Seq(
          (1, 37.7752702151959257, -122.418307270836, 9),
          (2, 37.3615593, -122.0553238, 5),
          (3, 67.194013596, -168.401741982, 5),
          (4, 37.7752702151959257, -122.418307270836, 0),
          (5, 37.77670234943567, -122.41845932318311, 9)
        ).toDF("id", "lat", "lng", "res")
        pts.select($"id",
            when($"res" === 9, geo.h3_latlng_to_cell_string($"lat", $"lng", 9))
              .when($"res" === 5, geo.h3_latlng_to_cell_string($"lat", $"lng", 5))
              .otherwise(geo.h3_latlng_to_cell_string($"lat", $"lng", 0))
              .as("h3_cell"))
          .orderBy($"id")
      },
      Some("""SELECT * FROM (VALUES
          (1, '8928308280fffff'),
          (2, '85283473fffffff'),
          (3, '850dab63fffffff'),
          (4, '8029fffffffffff'),
          (5, '8928308280fffff')) AS t(id, h3_cell)
        ORDER BY id""")),

    // ---- spatial partition pruning on read ------------------------------
    // Write a quadkey-partitioned Hive dataset (the engine's own §2.7
    // writer), read it back, and bbox-filter: filterBbox derives the
    // partition-column covering predicate from the recorded
    // `graft:partitioning` footer so the scan prunes DIRECTORIES
    // (reference `core/partition_by_quadkey.py:27-226` + the
    // best-practices spatial-query guidance). The oracle recomputes the
    // surviving key set with a plain coordinate filter — hash equality
    // proves pruning dropped no row. The staged dataset is cached per
    // (session, dir) so bench repeats measure the pruned READ, not the
    // staging write.
    QueryDef(
      "q186_partition_prune",
      (s, dir) => {
        import s.implicits._
        val out = GeoQueries.prunedDataset(s, dir)
        graft.table.GeoTable.read(s, out)
          .filterBbox(-60, -30, 60, 30)
          .df.select($"c_custkey").orderBy($"c_custkey")
      },
      Some(s"""WITH pts AS (
          SELECT c_custkey, ${lonSql("c_custkey")} AS cx,
                 ${latSql("c_custkey")} AS cy
          FROM customer)
        SELECT c_custkey FROM pts
        WHERE cx >= -60 AND cx <= 60 AND cy >= -30 AND cy <= 30
        ORDER BY c_custkey""")),

    // H3 twin of q186 over the round-14 hierarchical covering
    // (meta/SpatialPartitioning.h3Covering): the H3-partitioned layout
    // prunes directories through the sample-or-refine covering + the
    // recorded anchor reach; hash equality against a plain coordinate
    // filter proves the covering dropped no row. The bbox is NARROW and
    // high-latitude on purpose — the regime the round-13 sampler
    // refused (lng pad divergence) and the hierarchical path now
    // covers.
    QueryDef(
      "q187_h3_partition_prune",
      (s, dir) => {
        import s.implicits._
        val out = GeoQueries.prunedH3Dataset(s, dir)
        graft.table.GeoTable.read(s, out)
          .filterBbox(-170, 55, -20, 78)
          .df.select($"c_custkey").orderBy($"c_custkey")
      },
      Some(s"""WITH pts AS (
          SELECT c_custkey, ${lonSql("c_custkey")} AS cx,
                 ${latSql("c_custkey")} AS cy
          FROM customer),
        staged AS (
          SELECT * FROM pts
          WHERE cx >= -180 AND cx <= 0 AND cy >= 30 AND cy <= 85)
        SELECT c_custkey FROM staged
        WHERE cx >= -170 AND cx <= -20 AND cy >= 55 AND cy <= 78
        ORDER BY c_custkey"""))
  )

  private val prunedCache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), String]()

  /** Stage the quadkey-partitioned customer-points dataset once per
    * (session, sf dir); queries then exercise only the read+prune path.
    */
  private def prunedDataset(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    prunedCache.computeIfAbsent((s, dir), { case (spark, d) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft_q186").toString + "/qk"
      val pts = table(spark, d, "customer")
        .withColumn("geometry", geo.st_point(
          Coords.lon(col("c_custkey")), Coords.lat(col("c_custkey"))))
        .select(col("c_custkey"), col("geometry"))
      graft.table.GeoTable.fromDataFrame(pts, "geometry")
        .partitionByQuadkey(zoom = 6, prefixChars = 2, out, force = true)
      out
    })

  private val prunedH3Cache =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), String]()

  /** H3-partitioned twin of [[prunedDataset]] (q187). The staged corpus
    * is the NORTHERN-HEMISPHERE-WEST slice of the customer points —
    * worldwide points at H3 res 1 shatter 15k rows into ~330 one-file
    * directories, a layout no sane writer produces (and whose listing,
    * not the query, then dominates the measurement); the slice keeps
    * ~40 res-1 cells with the box still pruning most of them.
    */
  private def prunedH3Dataset(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    prunedH3Cache.computeIfAbsent((s, dir), { case (spark, d) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft_q187").toString + "/h3"
      val pts = table(spark, d, "customer")
        .withColumn("__cx", Coords.lon(col("c_custkey")))
        .withColumn("__cy", Coords.lat(col("c_custkey")))
        .where(col("__cx") >= -180 && col("__cx") <= 0 &&
          col("__cy") >= 30 && col("__cy") <= 85)
        .withColumn("geometry", geo.st_point(col("__cx"), col("__cy")))
        .select(col("c_custkey"), col("geometry"))
      graft.table.GeoTable.fromDataFrame(pts, "geometry")
        .partitionByH3(resolution = 1, out, force = true)
      out
    })
}
