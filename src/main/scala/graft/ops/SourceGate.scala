package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source (domain-level) curation gate — the C4/RefinedWeb decision
  * to drop a polluted domain WHOLESALE instead of fighting its
  * documents one by one (the declared q96 surface).
  *
  * Signals: language purity (fraction of docs in `keepLang`),
  * short-document fraction (n_chars below `shortChars`), mean token
  * length. Every signal derives from exact integer counts and the
  * verdict is an integer-arithmetic inequality (en·10 ≥ n·minEnTenths
  * ∧ short·10 ≤ n·maxShortTenths), so the gate is float-safe by
  * construction — no float-sum ordering anywhere, on any engine.
  *
  * Scale shape: ONE map-side-combinable groupBy(source); a hot domain
  * costs per-task partials only.
  */
object SourceGate {

  def gate(df: DataFrame, sourceCol: String, textCol: String,
      langCol: String, charsCol: Column, keepLang: String = "en",
      shortChars: Int = 200, minEnTenths: Int = 4,
      maxShortTenths: Int = 3): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(langCol) === keepLang, 1L).otherwise(0L)).as("__en"),
        sum(when(charsCol < shortChars, 1L).otherwise(0L)).as("__short"),
        sum(regexp_count(col(textCol), lit("\\S+"))
          .cast("long")).as("__tok"))
      .select(col(sourceCol), col("n_docs"),
        round(col("__en").cast("double") / col("n_docs").cast("double"), 6)
          .as("en_frac"),
        round(col("__short").cast("double") / col("n_docs").cast("double"), 6)
          .as("short_frac"),
        round(col("__tok").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_tokens"),
        ((col("__en") * 10 >= col("n_docs") * minEnTenths) &&
          (col("__short") * 10 <= col("n_docs") * maxShortTenths)).as("kept"))
      // bounded source domain: 1-partition sort skips the sampling job
      .coalesce(1).sortWithinPartitions(col(sourceCol))
}
