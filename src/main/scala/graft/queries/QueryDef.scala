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
  /** Read one driver table (`/root/testdata/sfX/<name>.parquet`). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
