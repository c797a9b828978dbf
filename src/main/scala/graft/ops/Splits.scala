package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact stratified train/validation/test assignment.
  *
  * The existing hash split (CLI `split`, q40) gives each row an
  * INDEPENDENT md5-bucket draw — proportions are only correct in
  * expectation, and a 9-document stratum can land 9/0/0. This operator
  * ranks rows WITHIN each stratum by deterministic hash order and cuts
  * by integer rank inequalities, so every stratum's proportions are
  * exact (floor semantics) and reproducible across engines and runs.
  *
  * Scale shape: ranking is [[DistWindow.withGroupedRank]] partitioned
  * by (stratum, hash-prefix bucket) — no task serializes a whole
  * stratum — and the per-stratum counts ride a broadcast join (the
  * stratum count table is #strata rows).
  */
object Splits {

  /** Add `outCol` ∈ {train, validation, test} per (strataCols) stratum:
    * exact trainPct/valPct/(100-trainPct-valPct) percent cuts of the
    * stratum's hash-ordered ranking.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      trainPct: Int = 80, valPct: Int = 10,
      outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents: $trainPct/$valPct")
    val stratum: Column = struct(strataCols.map(col): _*)
    val base = df.withColumn("__hk", md5(col(idCol).cast("string")))
    val ranked = DistWindow.withGroupedRank(base, stratum,
      conv(substring(col("__hk"), 1, 2), 16, 10).cast("long"),
      Seq(col("__hk"), col(idCol)), "__r",
      groupTotalCol = Some("__n"))
    ranked
      .withColumn(outCol,
        when(col("__r") * 100 <= col("__n") * trainPct, "train")
          .when(col("__r") * 100 <= col("__n") * (trainPct + valPct),
            "validation")
          .otherwise("test"))
      .drop("__hk", "__r", "__n")
  }
}
