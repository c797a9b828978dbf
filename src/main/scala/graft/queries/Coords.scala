package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic coordinates derived from integer keys.
  *
  * The driver testdata has no geometry columns, so geo operators are
  * exercised on points/boxes synthesized from keys. Every operation here
  * is EXACT in IEEE double (integer arithmetic plus multiples of 1/8),
  * so the DuckDB oracle can reproduce the same values with plain SQL and
  * hash-compare against results that flowed through our WKB codec.
  */
object Coords {
  /** lon in [-180, 180): integer part + eighth-fractions. */
  def lon(key: Column): Column =
    (key * 37) % 360 - 180 + (key % 8) * 0.125

  /** lat in [-90, 90): integer part + quarter-fractions. */
  def lat(key: Column): Column =
    (key * 91) % 180 - 90 + (key % 4) * 0.25

  /** identical expressions in DuckDB SQL (keep in sync with the above). */
  def lonSql(key: String): String =
    s"CAST(($key * 37) % 360 - 180 + ($key % 8) * 0.125 AS DOUBLE)"
  def latSql(key: String): String =
    s"CAST(($key * 91) % 180 - 90 + ($key % 4) * 0.25 AS DOUBLE)"
}
