package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geo
import QueryDef.{table, BoundedSort}
import Coords._

/** Join surface (SURVEY §2.3) + event-time windowing. The spatial enrich
  * join reproduces the reference's only join shape — input LEFT JOIN
  * small boundary set ON bbox-range pre-filter AND precise ST_Contains —
  * as a broadcast join with the cheap range condition evaluated before
  * the geometry predicate.
  */
object JoinQueries {

  /** events table: driver parquet has stored `ts` as TIMESTAMP(NANOS)
    * (readable only as long via the nanosAsLong legacy flag) in some
    * rounds and as native timestamp[us] in others — adapt to whichever
    * physical type the file carries.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    // Probe WITHOUT the legacy flag first: nanosAsLong is session-global
    // and silently changes how every later parquet read in the session
    // treats TIMESTAMP(NANOS) columns, so it is set only when this
    // file's schema inference actually demands it. Once set it must
    // STAY set for the session — the scan re-reads the conf at physical
    // planning, so a save/restore around the (lazy) read would break
    // the eventual execution.
    val raw = try table(s, dir, "events") catch {
      case e: Throwable if e.getMessage != null &&
          e.getMessage.toUpperCase.contains("NANOS") =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        table(s, dir, "events")
    }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns values ~1.7e18 exceed double's 2^53
        // mantissa, so a float path would corrupt the low bits
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        // timestamp[us]/[ms] read natively (NTZ); session TZ is UTC, so
        // casting to TIMESTAMP keeps the same instant the long path built
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- left semi join: customers having large orders -----------------
    QueryDef(
      "q15_semi_join",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val big = table(s, dir, "orders").filter($"o_totalprice" > 300000.0)
        cust.join(big, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey""")),

    // ---- left anti join: customers with no orders at all ---------------
    QueryDef(
      "q16_anti_join",
      (s, dir) => {
        import s.implicits._
        val cust = table(s, dir, "customer")
        val big = table(s, dir, "orders").filter($"o_totalprice" > 250000.0)
        cust.join(big, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        ORDER BY c_custkey""")),

    // ---- spatial enrich join (reference's admin-division join shape,
    // `core/add_admin_divisions_multi.py:72-151`): points LEFT JOIN a
    // small grid of boundary cells, bbox-range pre-filter ANDed before
    // the precise ST_Contains, boundary set broadcast ------------------
    QueryDef(
      "q17_spatial_join",
      (s, dir) => {
        import s.implicits._
        val pts = table(s, dir, "customer")
          .withColumn("x", lon($"c_custkey"))
          .withColumn("y", lat($"c_custkey"))
          .withColumn("g", geo.st_point($"x", $"y"))
        // boundary cells derived from nation: 25 disjoint-ish boxes
        val cells = table(s, dir, "nation")
          .withColumn("x0", ($"n_nationkey" * 14).cast("double") - 180)
          .withColumn("y0", (($"n_nationkey" % 5) * 36).cast("double") - 90)
          .withColumn("cell", geo.st_makeenvelope(
            $"x0", $"y0", $"x0" + 14, $"y0" + 36))
          .select($"n_nationkey", $"n_name", $"x0", $"y0", $"cell")
        pts.join(broadcast(cells),
            // cheap bbox range pre-filter first, then precise predicate.
            // NOTE boundary-semantics coupling: the oracle verifies the
            // range filter ONLY, so range-filter = st_contains must hold
            // for every point in the data. st_contains treats the
            // envelope as a closed set (boundary points ARE contained —
            // pinned in GeomSpec), exactly matching the >= / <=
            // inclusive range above; a point on a shared cell edge
            // matches BOTH adjacent cells under either formulation, so
            // the two stay equal even on edges. This breaks only if the
            // predicate changes to an open-boundary one (st_within-style
            // proper interior) — if you change one side, change both.
            $"x" >= $"x0" && $"x" <= $"x0" + 14 &&
            $"y" >= $"y0" && $"y" <= $"y0" + 36 &&
            geo.st_contains($"cell", $"g"),
            "left")
          .groupBy($"n_name")
          .agg(count($"c_custkey").as("n_points"))
          .sortBounded($"n_name".asc_nulls_first)
      },
      Some(s"""WITH pts AS (
          SELECT c_custkey, ${lonSql("c_custkey")} AS x, ${latSql("c_custkey")} AS y
          FROM customer),
        cells AS (
          SELECT n_nationkey, n_name,
            CAST(n_nationkey * 14 AS DOUBLE) - 180 AS x0,
            CAST((n_nationkey % 5) * 36 AS DOUBLE) - 90 AS y0
          FROM nation)
        SELECT n_name, COUNT(c_custkey) AS n_points
        FROM pts LEFT JOIN cells
          ON x >= x0 AND x <= x0 + 14 AND y >= y0 AND y <= y0 + 36
        GROUP BY n_name
        ORDER BY n_name NULLS FIRST""")),

    // ---- event-time tumbling window aggregation ------------------------
    // (Structured-Streaming-compatible plan shape; batch semantics here so
    // the oracle can reproduce it with date_trunc)
    QueryDef(
      "q18_event_window",
      (s, dir) => {
        import s.implicits._
        events(s, dir)
          .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"),
            (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
          .select(unix_timestamp($"w.start").as("window_start"),
            $"event_type", $"n", $"sum_value")
          .sortBounded($"window_start", $"event_type")
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
          event_type, COUNT(*) AS n,
          SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type""")),

    // ---- sessionization via window lag (gap > 30 min = new session) ----
    QueryDef(
      "q19_sessionize",
      (s, dir) => {
        import s.implicits._
        graft.ops.Behavior.withSessionIds(events(s, dir))
          .groupBy($"user_id")
          .agg(max($"session_id").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH marked AS (
          SELECT user_id, event_id,
            CASE WHEN prev_ts IS NULL
              OR (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
               - (epoch_us(CAST(prev_ts AS TIMESTAMP)) // 1000000) > 1800
              THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, event_id, ts,
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events) t),
        sessions AS (
          SELECT user_id,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked)
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id ORDER BY user_id""")),

    // ---- semi-structured JSON property extraction -----------------------
    // Every event carries a JSON props payload; extract a typed field
    // with ONE from_json projection (Jackson parse inside the scan's
    // codegen stage, schema pruned to the single field — no UDF, no
    // second pass) and aggregate per event type map-side-combinably.
    // The oracle extracts the same path with DuckDB's JSON operators,
    // so the parse semantics themselves are certified cross-engine.
    QueryDef(
      "q83_json_extract",
      (s, dir) => {
        import s.implicits._
        events(s, dir)
          .select($"event_type",
            from_json($"props",
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("k",
                  org.apache.spark.sql.types.LongType))))
              .getField("k").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            min($"k").as("min_k"), max($"k").as("max_k"),
            sum(when($"k" > 50, 1L).otherwise(0L)).as("n_high"))
          .sortBounded($"event_type")
      },
      Some("""WITH e AS (SELECT event_type,
            CASE WHEN json_valid(props) THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k FROM events)
        SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
          MIN(k) AS min_k, MAX(k) AS max_k,
          CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM e GROUP BY event_type ORDER BY event_type""")),

    // ---- grid-partitioned spatial join (large x large) -----------------
    // No broadcast, no cross join: both sides explode onto grid cells,
    // candidates come from a hash equi-join on the cell, and the
    // canonical-cell rule (bottom-left of the envelope intersection)
    // reports every true pair exactly once. The oracle brute-forces the
    // same envelope-overlap join.
    QueryDef(
      "q41_grid_join",
      (s, dir) => {
        import s.implicits._
        val parts = table(s, dir, "part").select($"p_partkey",
          (lon($"p_partkey") - 0.25).as("xmin"), (lat($"p_partkey") - 0.25).as("ymin"),
          (lon($"p_partkey") + 0.25).as("xmax"), (lat($"p_partkey") + 0.25).as("ymax"))
        val supps = table(s, dir, "supplier").select($"s_suppkey",
          (lon($"s_suppkey") - 0.5).as("xmin"), (lat($"s_suppkey") - 0.5).as("ymin"),
          (lon($"s_suppkey") + 0.5).as("xmax"), (lat($"s_suppkey") + 0.5).as("ymax"))
        graft.ops.SpatialJoin.envelopeJoin(parts, supps,
            "p_partkey", "s_suppkey", cellSize = 2.0)
          .select($"l_id".as("p_partkey"), $"r_id".as("s_suppkey"))
          .orderBy($"p_partkey", $"s_suppkey")
      },
      Some(s"""WITH pe AS (
          SELECT p_partkey,
            ${lonSql("p_partkey")} - 0.25 AS xmin, ${latSql("p_partkey")} - 0.25 AS ymin,
            ${lonSql("p_partkey")} + 0.25 AS xmax, ${latSql("p_partkey")} + 0.25 AS ymax
          FROM part),
        se AS (
          SELECT s_suppkey,
            ${lonSql("s_suppkey")} - 0.5 AS xmin, ${latSql("s_suppkey")} - 0.5 AS ymin,
            ${lonSql("s_suppkey")} + 0.5 AS xmax, ${latSql("s_suppkey")} + 0.5 AS ymax
          FROM supplier)
        SELECT pe.p_partkey, se.s_suppkey
        FROM pe JOIN se ON pe.xmin <= se.xmax AND se.xmin <= pe.xmax
          AND pe.ymin <= se.ymax AND se.ymin <= pe.ymax
        ORDER BY p_partkey, s_suppkey"""))
  )
}
