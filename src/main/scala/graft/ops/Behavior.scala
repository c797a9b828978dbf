package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-behavior analytics ops (q136/q137/q139 bodies, factored for
  * the CLI): cohort retention, Markov transitions, robust anomaly
  * report. All thresholds/probabilities are exact integers (basis
  * points, micros); see the query scaladocs for the scale posture.
  */
object Behavior {

  /** Weekly cohort retention matrix: (cohort_week, week_offset,
    * n_users, retention_bp). ONE user-keyed exchange; per-user state
    * bounded by calendar weeks.
    *
    * @param tsSecs column of epoch SECONDS for the activity instant.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsSecs: Column): DataFrame = {
    val per = events.select(col(userCol).as("__u"),
        floor(tsSecs.cast("long") / 604800.0).cast("long").as("wk"))
      .groupBy(col("__u"))
      .agg(min(col("wk")).as("cohort_week"), collect_set(col("wk")).as("wks"))
    val cells = per
      .select(col("cohort_week"), explode(col("wks")).as("wk"))
      .select(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val wC = Window.partitionBy(col("cohort_week"))
    cells
      .withColumn("n0",
        max(when(col("week_offset") === 0, col("n_users"))).over(wC))
      .withColumn("retention_bp", expr("n_users * 10000 DIV n0"))
      .drop("n0")
  }

  /** Markov transition matrix: (from_type, to_type, n, p_bp) over
    * consecutive per-key events. The lead window partitions by the
    * high-cardinality key; normalization runs on the |types|²
    * aggregate.
    */
  def markovTransitions(events: DataFrame, userCol: String,
      typeCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .select(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p_bp", expr(
        "n * 10000 DIV (sum(n) OVER (PARTITION BY from_type))"))
  }

  /** Robust anomaly report per type: exact lower median + MAD of
    * `valueCol` in micros, and the count/fraction of rows beyond 3×MAD.
    *
    * Both medians come from [[DistWindow.groupedWeightedMedian]] with
    * unit weights — the cumulative-count inequality picks the same
    * element a row_number rank pass does (position (n+1) DIV 2 of the
    * value-sorted multiset; an id tie-break never changes which VALUE
    * sits at that position), but each pass carries ONE fused
    * offsets+totals broadcast instead of rank machinery with two.
    * `idCol` is kept for API stability but no longer participates.
    */
  def robustAnomalyReport(events: DataFrame, typeCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val bkt = (c: Column) => floor(c / 1000000.0).cast("long")
    val e2 = events.select(col(typeCol),
      expr(s"CAST(ROUND($valueCol * 1000000) AS BIGINT)").as("v"))
    // the |types|-row median table is lazy-checkpointed: its subtree —
    // the whole first median machinery — is consumed by both the MAD
    // pass and the final gate, and exchange reuse alone would still
    // re-run the windows above the shared exchange per consumer
    val med = DistWindow.groupedWeightedMedian(e2, col(typeCol),
      bkt(col("v")), col("v"), lit(1L), typeCol, "med_mi", "n")
      .localCheckpoint(false)
    val d = e2.join(broadcast(med), Seq(typeCol))
      .withColumn("dev", abs(col("v") - col("med_mi")))
    val mad = DistWindow.groupedWeightedMedian(d, col(typeCol),
      bkt(col("dev")), col("dev"), lit(1L), typeCol, "mad_mi", "n2")
      .drop("n2")
    d.join(broadcast(mad), Seq(typeCol))
      .groupBy(typeCol)
      .agg(max(col("n")).as("n_events"),
        max(col("med_mi")).as("median_micro"),
        max(col("mad_mi")).as("mad_micro"),
        sum(when(col("dev") > col("mad_mi") * 3, 1L)
          .otherwise(0L)).as("n_anomalies"))
      .withColumn("anomaly_bp", expr("n_anomalies * 10000 DIV n_events"))
  }
}
