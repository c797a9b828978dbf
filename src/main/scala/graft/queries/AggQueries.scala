package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.geo
import QueryDef.{table, BoundedSort}
import Coords._

/** Aggregation + inspection surface (SURVEY §2.4, §2.10): dataset bounds,
  * bbox column add + fast-path filter, per-column stats, partition
  * histogram with guardrail stats, distinct combos.
  */
object AggQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- dataset bounds: min/max of envelope exprs over WKB ------------
    // (reference `core/common.py:3493-3573` / `hilbert_order.py:80-92`)
    QueryDef(
      "q6_bounds",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part")
          .withColumn("g", geo.st_point(lon($"p_partkey"), lat($"p_partkey")))
          .agg(
            min(geo.st_xmin($"g")).as("xmin"),
            min(geo.st_ymin($"g")).as("ymin"),
            max(geo.st_xmax($"g")).as("xmax"),
            max(geo.st_ymax($"g")).as("ymax"),
            count(lit(1)).as("n"))
      },
      Some(s"""SELECT
        MIN(${lonSql("p_partkey")}) AS xmin,
        MIN(${latSql("p_partkey")}) AS ymin,
        MAX(${lonSql("p_partkey")}) AS xmax,
        MAX(${latSql("p_partkey")}) AS ymax,
        COUNT(*) AS n
        FROM part""")),

    // ---- bbox struct column + fast-path bbox predicate -----------------
    // Square polygons -> bbox struct (reference `core/add_bbox_column.py`)
    // -> filter on struct fields (the 10-100x fast path,
    // `core/extract.py:568-575`). Output flattened for the compare.
    QueryDef(
      "q7_bbox_fastpath",
      (s, dir) => {
        import s.implicits._
        val cx = lon($"p_partkey"); val cy = lat($"p_partkey")
        table(s, dir, "part")
          .withColumn("g", geo.st_makeenvelope(
            cx - 0.25, cy - 0.25, cx + 0.25, cy + 0.25))
          .withColumn("bbox", struct(
            geo.st_xmin($"g").as("xmin"), geo.st_ymin($"g").as("ymin"),
            geo.st_xmax($"g").as("xmax"), geo.st_ymax($"g").as("ymax")))
          .filter($"bbox.xmax" >= -60.0 && $"bbox.xmin" <= 60.0 &&
            $"bbox.ymax" >= -30.0 && $"bbox.ymin" <= 30.0)
          .select($"p_partkey", $"bbox.xmin".as("xmin"), $"bbox.ymin".as("ymin"),
            $"bbox.xmax".as("xmax"), $"bbox.ymax".as("ymax"))
          .orderBy($"p_partkey")
      },
      Some(s"""WITH pts AS (
          SELECT p_partkey, ${lonSql("p_partkey")} AS cx, ${latSql("p_partkey")} AS cy
          FROM part)
        SELECT p_partkey, cx - 0.25 AS xmin, cy - 0.25 AS ymin,
          cx + 0.25 AS xmax, cy + 0.25 AS ymax
        FROM pts
        WHERE cx + 0.25 >= -60.0 AND cx - 0.25 <= 60.0
          AND cy + 0.25 >= -30.0 AND cy - 0.25 <= 30.0
        ORDER BY p_partkey""")),

    // ---- inspect stats: nulls / min / max / distinct per column --------
    // (reference `core/inspect_utils.py:717-797`, one batched SELECT)
    // Exact nd WITHOUT tripling the scan: a single in-agg plan with two
    // countDistinct columns forces an Expand (×3 rows before partial
    // agg) over the whole table. Instead pre-aggregate by the two
    // distinct keys — a plain map-side-combinable hash agg whose output
    // is bounded by the distinct-pair count — then take the exact
    // distincts and every other statistic from that small table. The
    // Expand now runs over |distinct pairs|, not |orders|. The engine's
    // own inspect path (GeoTable.stats) uses approx_count_distinct
    // (HLL) instead, which is the right default at 100 TB.
    QueryDef(
      "q8_stats",
      (s, dir) => {
        import s.implicits._
        val pre = table(s, dir, "orders")
          .groupBy($"o_custkey", $"o_orderstatus")
          .agg(count(lit(1)).as("c"),
            min($"o_totalprice").as("mnp"), max($"o_totalprice").as("mxp"))
        pre.agg(
          // coalesce: sum over an empty pre-agg is NULL where the old
          // count(*) gave 0 — keep the empty-table contract
          coalesce(sum($"c"), lit(0L)).as("n_rows"),
          coalesce(sum(when($"o_orderstatus".isNull, $"c")), lit(0L))
            .as("null_status"),
          min($"o_orderstatus").as("min_status"),
          max($"o_orderstatus").as("max_status"),
          countDistinct($"o_orderstatus").as("nd_status"),
          min($"mnp").as("min_price"),
          max($"mxp").as("max_price"),
          min($"o_custkey").as("min_cust"),
          max($"o_custkey").as("max_cust"),
          countDistinct($"o_custkey").as("nd_cust"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
        COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS null_status,
        MIN(o_orderstatus) AS min_status, MAX(o_orderstatus) AS max_status,
        COUNT(DISTINCT o_orderstatus) AS nd_status,
        MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
        COUNT(DISTINCT o_custkey) AS nd_cust
        FROM orders""")),

    // ---- partition histogram + guardrail stats (SURVEY §2.7 pre-flight)
    // (reference `core/partition_common.py:232-249`: histogram then
    // COUNT/SUM/MIN/MAX/AVG/MEDIAN over it)
    QueryDef(
      "q9_partition_analysis",
      (s, dir) => {
        import s.implicits._
        val hist = table(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("cnt"))
        hist.agg(
          count(lit(1)).as("n_partitions"),
          sum($"cnt").as("total_rows"),
          min($"cnt").as("min_rows"),
          max($"cnt").as("max_rows"),
          (sum($"cnt").cast("double") / count(lit(1))).as("avg_rows"),
          expr("percentile(cnt, 0.5)").as("median_rows"))
      },
      Some("""WITH hist AS (
          SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
          FROM lineitem GROUP BY 1, 2)
        SELECT COUNT(*) AS n_partitions, CAST(SUM(cnt) AS BIGINT) AS total_rows,
          MIN(cnt) AS min_rows, MAX(cnt) AS max_rows,
          CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_rows,
          MEDIAN(cnt) AS median_rows
        FROM hist""")),

    // ---- distinct partition values (SURVEY §2.7 key discovery) ---------
    // (reference `core/partition_common.py:601-618` DISTINCT + prefix)
    QueryDef(
      "q10_distinct_prefix",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "part")
          .select(substring($"p_type", 1, 6).as("type_prefix"))
          .where($"type_prefix".isNotNull)
          .distinct()
          .sortBounded($"type_prefix")
      },
      Some("""SELECT DISTINCT substr(p_type, 1, 6) AS type_prefix
        FROM part WHERE substr(p_type, 1, 6) IS NOT NULL
        ORDER BY type_prefix"""))
  )
}
