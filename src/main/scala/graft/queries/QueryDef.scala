package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the driver testdata plus
  * (when SQL-expressible) an equivalent DuckDB oracle query. Column names
  * must match exactly between the two — the driver sorts columns by name
  * and hash-compares values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Read one driver table (`/root/testdata/sfX/<name>.parquet`).
    *
    * The analyzed relation is cached per (session, path) — the catalog
    * role a metastore table plays in production. Without it every query
    * re-lists files and re-reads parquet footers at plan time, which at
    * benchmark scale charges each of 43 queries a fixed scan-planning
    * toll that a real deployment pays once. (Data is NOT cached; only
    * the relation/plan node.)
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
}
