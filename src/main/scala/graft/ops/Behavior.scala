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
  /** Session bookkeeping columns over a (user_id, ts, event_id) event
    * stream: `prev_ts`, `new_session` (1L at a gap > `gapSec` or at the
    * first event), and the running `session_id` — ONE definition of the
    * sessionization rule shared by q19/q144/q165 (hand-copied variants
    * had already drifted on literal types). Scale shape: one window on
    * hash(user), deterministic (ts, event_id) tie-break.
    */
  def withSessionIds(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(run))
  }

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
    * ONE scan of the raw rows: a combinable aggregation collapses the
    * events to the (type, value) COUNT HISTOGRAM, and everything else —
    * median, the deviation histogram (dev = |v − median| re-keys
    * histogram rows, weights carried), MAD, and the 3×MAD gate count —
    * is histogram algebra via [[DistWindow.histCeilRanks]]
    * (whose cumulative-weight inequality picks the same VALUE the
    * oracle's row_number rank at (n+1) DIV 2 picks; an id tie-break
    * never changes which value sits at that position). The previous
    * plan exchanged every event through a (type, bucket) window twice
    * and re-scanned the input thrice. Telemetry values are fixed-
    * precision by construction (micros), so the histogram is
    * range-bounded in practice; in an adversarial all-distinct-values
    * corpus it degrades to the row-sized exchange the rank formulation
    * always paid — never worse, and still map-side combined. `idCol`
    * is kept for API stability but no longer participates.
    */
  def robustAnomalyReport(events: DataFrame, typeCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val h = events
      .select(col(typeCol),
        // Column form, not a spliced SQL string: a name needing
        // backticks ("value micros") failed to parse, and a dotted one
        // silently resolved a struct field (siblings here all take
        // resolvable names through col())
        round(col(valueCol) * 1000000).cast("long").as("v"))
      .groupBy(col(typeCol), col("v")).agg(count(lit(1)).as("c"))
    // everything below h rides ONE hash(type) exchange: per-type
    // histograms are domain-bounded (distinct micro values), so a
    // type-partitioned window is skew-safe here, and every later
    // operator's distribution is satisfied by hash(type) — the
    // deviation group-by ((type, dev) ⊇ type), the MAD window, and
    // the final gate aggregate all plan with NO further exchange.
    // The selected row (whose cumulative range contains the target
    // position) broadcasts its value to its whole type partition via
    // the tagged-row max-over-unbounded-frame, replacing the
    // broadcast-join machinery the bucketed variants pay.
    val wT = Window.partitionBy(col(typeCol))
    val wV = Window.partitionBy(col(typeCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = h
      .withColumn("cum", sum(col("c")).over(wV))
      .withColumn("n", sum(col("c")).over(wT))
      .withColumn("med_mi", max(when(
        col("cum") - col("c") < expr("(n + 1) DIV 2") &&
          expr("(n + 1) DIV 2") <= col("cum"), col("v"))).over(wT))
    val dh = m
      .groupBy(col(typeCol), abs(col("v") - col("med_mi")).as("dev"))
      .agg(sum(col("c")).as("cd"), max(col("med_mi")).as("med_mi"),
        max(col("n")).as("n"))
    val wD = Window.partitionBy(col(typeCol)).orderBy(col("dev"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = dh.withColumn("cum", sum(col("cd")).over(wD))
      .withColumn("mad_mi", max(when(
        col("cum") - col("cd") < expr("(n + 1) DIV 2") &&
          expr("(n + 1) DIV 2") <= col("cum"), col("dev"))).over(wT))
    g.groupBy(typeCol)
      .agg(max(col("n")).as("n_events"),
        max(col("med_mi")).as("median_micro"),
        max(col("mad_mi")).as("mad_micro"),
        sum(when(col("dev") > col("mad_mi") * 3, col("cd"))
          .otherwise(0L)).as("n_anomalies"))
      .withColumn("anomaly_bp", expr("n_anomalies * 10000 DIV n_events"))
  }
}
