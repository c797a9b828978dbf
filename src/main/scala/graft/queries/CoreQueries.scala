package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.geo
import QueryDef.{table, BoundedSort}

/** Core relational operator surface (SURVEY §2.2-§2.5): extract
  * (project/filter/limit), aggregation, broadcast joins, windows — each
  * with a DuckDB oracle.
  *
  * Float determinism: double sums are made engine-order-independent by
  * scaling to exact integers first (`round(x * 10^k)::BIGINT`), summing
  * exactly, and dividing once at the end — both engines then produce the
  * identical double.
  */
object CoreQueries {

  /** sum of x scaled by 10^k as exact integers, divided back to double. */
  private def exactSum(c: Column, k: Int): Column = {
    val f = math.pow(10, k)
    sum(round(c * f).cast("long")) / f
  }
  private def sqlExactSum(e: String, k: Int): String = {
    val f = math.pow(10, k).toLong
    s"SUM(CAST(ROUND(($e) * $f) AS BIGINT)) / $f.0"
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- TPC-H Q1-shaped scan+aggregate (pricing summary) --------------
    QueryDef(
      "q1_agg",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            exactSum($"l_extendedprice", 2).as("sum_base_price"),
            exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
              .as("sum_disc_price"),
            exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6)
              .as("sum_charge"),
            exactSum($"l_discount", 2).as("sum_disc"),
            count(lit(1)).as("count_order"))
          .sortBounded($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        ${sqlExactSum("l_extendedprice", 2)} AS sum_base_price,
        ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
        ${sqlExactSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
        ${sqlExactSum("l_discount", 2)} AS sum_disc,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- extract: project + filter + limit (SURVEY §2.2) ---------------
    QueryDef(
      "q2_extract",
      (s, dir) => {
        import s.implicits._
        table(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
            $"l_extendedprice")
          .filter($"l_quantity" >= 45.0 && $"l_extendedprice" > 40000.0)
          .orderBy($"l_orderkey", $"l_linenumber")
          .limit(500)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 45.0 AND l_extendedprice > 40000.0
        ORDER BY l_orderkey, l_linenumber
        LIMIT 500""")),

    // ---- broadcast-dim join + aggregate (SURVEY §2.3 enrich shape) -----
    QueryDef(
      "q3_join_agg",
      (s, dir) => {
        import s.implicits._
        val orders = table(s, dir, "orders")
        val cust = table(s, dir, "customer")
        val nation = table(s, dir, "nation")
        orders
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_orders"),
            exactSum($"o_totalprice", 2).as("revenue"))
          .sortBounded($"n_name")
      },
      Some(s"""SELECT n_name, COUNT(*) AS n_orders,
        ${sqlExactSum("o_totalprice", 2)} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- geometry WKB round-trip + spatial predicate vs plain SQL ------
    // Synthesizes exact lon/lat from integer keys (all arithmetic exact in
    // double), builds WKB points through our codec, filters with
    // ST_Intersects against an envelope, reads coordinates back out.
    // The oracle never sees WKB — pure arithmetic — so a hash match
    // certifies the codec + predicate.
    QueryDef(
      "q4_geo_roundtrip",
      (s, dir) => {
        import s.implicits._
        val p = table(s, dir, "part")
        p.withColumn("g", geo.st_point(Coords.lon($"p_partkey"),
            Coords.lat($"p_partkey")))
          .filter(geo.st_intersects($"g", geo.st_makeenvelope(-90, -45, 90, 45)))
          .select($"p_partkey", geo.st_x($"g").as("x"), geo.st_y($"g").as("y"))
          .orderBy($"p_partkey")
      },
      Some(s"""SELECT p_partkey,
        ${Coords.lonSql("p_partkey")} AS x,
        ${Coords.latSql("p_partkey")} AS y
        FROM part
        WHERE ${Coords.lonSql("p_partkey")} BETWEEN -90 AND 90
          AND ${Coords.latSql("p_partkey")} BETWEEN -45 AND 45
        ORDER BY p_partkey""")),

    // ---- window-equivalent: partitioned top-k (SURVEY §2.5) ------------
    // Not a window: o_orderpriority has 5 distinct values, so a
    // partitioned row_number would serialize ~1/5 of the table through
    // each window task. TopK.perGroup keeps a 5-row heap per group per
    // map task instead — same rows, O(k) state, heap-sized shuffle.
    QueryDef(
      "q5_window_topk",
      (s, dir) => {
        import s.implicits._
        graft.ops.TopK.perGroup(table(s, dir, "orders"),
            Seq("o_orderpriority"),
            Seq(($"o_totalprice", true), ($"o_orderkey", false)), 5, "rn")
          .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
          .sortBounded($"o_orderpriority", $"rn")
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) t
        WHERE rn <= 5
        ORDER BY o_orderpriority, rn"""))
  )
}
