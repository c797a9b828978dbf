package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.geo
import QueryDef.table
import Coords._

/** Sort / spatial-linearization surface (SURVEY §2.6): multi-column sort,
  * Morton (quadkey) sort, Hilbert sort — the engine's flagship — and the
  * spatial-order quality check (SURVEY §2.10).
  *
  * The Hilbert and Morton oracles re-derive the curve indices in pure
  * DuckDB SQL (bit arithmetic + recursive CTE), so the custom Catalyst
  * expressions are hash-verified bit-for-bit, not just "rows > 0".
  */
object SortQueries {

  /** DuckDB SQL for the 16-bit grid cell of v over [lo, hi] — must mirror
    * SpatialKey.clampCell exactly (truncation + clamp).
    */
  private def cellSql(v: String, lo: String, hi: String): String =
    s"LEAST(65535, GREATEST(0, CAST(FLOOR((($v) - ($lo)) / (($hi) - ($lo)) * 65535) AS BIGINT)))"

  /** DuckDB SQL expression interleaving 16-bit cx/cy into a Morton key
    * (y in odd bits) — mirrors SpatialKey.morton/interleave.
    */
  private def mortonSql(cx: String, cy: String): String =
    (0 until 16).map { i =>
      s"((($cx >> $i) & 1) << ${2 * i}) + ((($cy >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  val defs: Seq[QueryDef] = Seq(
    // ---- multi-column sort (reference `core/sort_by_column.py`) --------
    QueryDef(
      "q11_sort_multi",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity",
            $"l_shipdate".cast("date").as("ship_date"))
          .orderBy($"l_returnflag".desc, $"l_quantity".desc,
            $"l_orderkey".asc, $"l_linenumber".asc)
          .limit(300)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        ORDER BY l_returnflag DESC, l_quantity DESC,
          l_orderkey ASC, l_linenumber ASC
        LIMIT 300""")),

    // ---- Morton / quadkey-style Z-order sort ---------------------------
    // (reference `core/sort_quadkey.py`: quadkey string sort == Z-order;
    // here the key is the equivalent interleaved integer over a 2^16 grid)
    QueryDef(
      "q12_morton_sort",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "customer")
          .withColumn("mkey",
            geo.morton_xy(lon($"c_custkey"), lat($"c_custkey"),
              -180, -90, 180, 90))
          .select($"c_custkey", $"mkey")
          .orderBy($"mkey", $"c_custkey")
      },
      Some(s"""WITH cells AS (
          SELECT c_custkey,
            ${cellSql(lonSql("c_custkey"), "-180.0", "180.0")} AS cx,
            ${cellSql(latSql("c_custkey"), "-90.0", "90.0")} AS cy
          FROM customer)
        SELECT c_custkey, ${mortonSql("cx", "cy")} AS mkey
        FROM cells
        ORDER BY mkey, c_custkey""")),

    // ---- Hilbert sort (flagship; reference `core/hilbert_order.py`) ----
    // Oracle recomputes the Hilbert index with a 16-step recursive CTE
    // (the classic xy2d loop with rotate/reflect), so the Catalyst
    // expression is verified against an independent formulation.
    QueryDef(
      "q13_hilbert_sort",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "customer")
          .withColumn("hkey",
            geo.hilbert_xy(lon($"c_custkey"), lat($"c_custkey"),
              -180, -90, 180, 90))
          .select($"c_custkey", $"hkey")
          .orderBy($"hkey", $"c_custkey")
      },
      Some(s"""WITH RECURSIVE cells AS (
          SELECT c_custkey,
            ${cellSql(lonSql("c_custkey"), "-180.0", "180.0")} AS cx,
            ${cellSql(latSql("c_custkey"), "-90.0", "90.0")} AS cy
          FROM customer),
        h(c_custkey, x, y, s, d) AS (
          SELECT c_custkey, cx, cy, CAST(32768 AS BIGINT), CAST(0 AS BIGINT)
          FROM cells
          UNION ALL
          SELECT c_custkey,
            CASE WHEN (y & s) > 0 THEN x
                 WHEN (x & s) > 0 THEN s - 1 - y ELSE y END,
            CASE WHEN (y & s) > 0 THEN y
                 WHEN (x & s) > 0 THEN s - 1 - x ELSE x END,
            s // 2,
            d + s * s * (CASE
              WHEN (x & s) > 0 AND (y & s) > 0 THEN 2
              WHEN (x & s) > 0 THEN 3
              WHEN (y & s) > 0 THEN 1
              ELSE 0 END)
          FROM h WHERE s > 0)
        SELECT c_custkey, d AS hkey FROM h WHERE s = 0
        ORDER BY hkey, c_custkey""")),

    // ---- spatial-order quality check (reference
    // `core/check_spatial_order.py`: avg consecutive distance vs avg
    // pair distance; random pairs made deterministic via a fixed stride
    // so both engines see identical pairs) ------------------------------
    QueryDef(
      "q14_spatial_order",
      (s, dir) => {
        import s.implicits._
        val pts = table(s, dir, "customer")
          .select($"c_custkey", lon($"c_custkey").as("x"), lat($"c_custkey").as("y"))
        // exact global lag without a single-partition window (DistWindow:
        // range-partitioned lag + broadcast boundary fix-up)
        val consec = graft.ops.DistWindow
          .withLag1(pts, "c_custkey", Seq("x" -> "px", "y" -> "py"))
          .filter($"px".isNotNull)
          .agg(avg(sqrt(pow($"x" - $"px", 2) + pow($"y" - $"py", 2))).as("d"))
          .select(round($"d", 4).as("consec_avg"))
        // n rides along as a broadcast 1-row aggregate on BOTH sides so
        // the stride-pair join stays a plain equi-join on pk — no
        // driver-side count() action, one fewer job
        val nDf = broadcast(pts.agg(count(lit(1)).as("__n")))
        val paired = pts.crossJoin(nDf)
          .select($"c_custkey", $"x", $"y",
            (($"c_custkey" * 7919) % $"__n").as("pk"))
        val other = pts.crossJoin(nDf)
          .select($"c_custkey".as("o_key"), $"x".as("ox"), $"y".as("oy"),
            ($"c_custkey" % $"__n").as("pk"))
        val rand = paired.join(other, Seq("pk"))
          .filter($"c_custkey" =!= $"o_key")
          .agg(avg(sqrt(pow($"x" - $"ox", 2) + pow($"y" - $"oy", 2))).as("d"))
          .select(round($"d", 4).as("random_avg"))
        consec.crossJoin(rand)
      },
      Some(s"""WITH pts AS (
          SELECT c_custkey, ${lonSql("c_custkey")} AS x, ${latSql("c_custkey")} AS y
          FROM customer),
        n AS (SELECT COUNT(*) AS n FROM pts),
        consec AS (
          SELECT ROUND(AVG(SQRT(POW(x - px, 2) + POW(y - py, 2))), 4) AS consec_avg
          FROM (SELECT x, y,
              LAG(x) OVER (ORDER BY c_custkey) AS px,
              LAG(y) OVER (ORDER BY c_custkey) AS py
            FROM pts) t
          WHERE px IS NOT NULL),
        rand AS (
          SELECT ROUND(AVG(SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2))), 4) AS random_avg
          FROM pts a CROSS JOIN n
          INNER JOIN pts b ON ((a.c_custkey * 7919) % n.n) = (b.c_custkey % n.n)
          WHERE a.c_custkey <> b.c_custkey)
        SELECT consec_avg, random_avg FROM consec, rand"""))
  )
}
