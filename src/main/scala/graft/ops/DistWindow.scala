package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact lag over a global ordering.
  *
  * `Window.orderBy(k)` with no partition spec funnels the whole table
  * through a single task (Spark's "No Partition Defined" warning) — a
  * scale-killer at 100 TB. For lag(1) the serialization is unnecessary:
  * partition on a monotone bucket of the order key, lag within each
  * bucket, then patch each bucket's first row with the previous
  * non-empty bucket's last row. The patch table has one row per
  * non-empty bucket, so the fix-up is a broadcast join, and no window
  * task ever sees more than one bucket's rows.
  *
  * The bucket is `floor(key / chunk)` — a pure projection, so unlike
  * `repartitionByRange` there is no boundary-sampling pre-pass; the
  * whole thing costs one hash shuffle plus a tiny aggregate. With dense
  * keys each task handles ≤ chunk rows whatever the table size; with
  * sparse keys buckets are smaller, never bigger.
  *
  * Result is exactly `lag(v, 1) over (order by k)` when k is unique
  * (ties stay inside one bucket either way, but their intra-tie order
  * would be nondeterministic under both formulations).
  */
object DistWindow {

  /** Add lag(1) columns over a global ORDER BY `orderCol` (numeric).
    *
    * @param lagCols (sourceCol -> outputCol) pairs; each outputCol gets
    *                the previous row's sourceCol under the global order.
    * @param chunk   max rows per window task when keys are dense.
    */
  def withLag1(df: DataFrame, orderCol: String,
      lagCols: Seq[(String, String)], chunk: Long = 65536L): DataFrame = {
    // an output name shadowing a source would make the boundary table
    // (built off the windowed output below) read LAGGED values
    require(!lagCols.exists { case (src, out) =>
      lagCols.exists(_._1 == out) || src == out },
      s"lag output names must not shadow source columns: $lagCols")
    val key: Column = col(orderCol)
    val parted = df.withColumn("__bkt", floor(key / chunk))
    val w = Window.partitionBy(col("__bkt")).orderBy(key)
    val lagged = lagCols.foldLeft(parted) { case (d, (src, out)) =>
      d.withColumn(out, lag(col(src), 1).over(w))
    }.withColumn("__rn", row_number().over(w))

    // Last (max-key) row of each non-empty bucket: tiny by construction.
    // Derived from `lagged` (the windowed output, same rows/columns),
    // NOT `parted`: a groupBy on the un-exchanged input hangs a second
    // partial-agg exchange off it and recomputes the whole upstream
    // subtree — the exact anti-pattern withGlobalRank documents; off
    // the windowed child, ReuseExchange shares the one shuffle.
    val lastPer = lagged.groupBy(col("__bkt"))
      .agg(max_by(struct(lagCols.map { case (src, _) => col(src) }: _*),
        key).as("__last"))
    // The constant partition key is deliberate: this window runs over the
    // one-row-per-bucket boundary table, so a single partition is the
    // point. pmod(k,1) (always 0) rather than lit(0) because Catalyst
    // folds literal specs back into the warn-on-no-partition path.
    val wB = Window.partitionBy(pmod(col("__bkt"), lit(1))).orderBy(col("__bkt"))
    val prevB = lagCols.foldLeft(lastPer) { case (d, (src, out)) =>
      d.withColumn(s"__prev_$out", lag(col(s"__last.$src"), 1).over(wB))
    }.select(col("__bkt") +:
      lagCols.map { case (_, out) => col(s"__prev_$out") }: _*)

    val patched = lagCols.foldLeft(
      lagged.join(broadcast(prevB), Seq("__bkt"), "left")) {
      case (d, (_, out)) =>
        d.withColumn(out,
          when(col("__rn") === 1, col(s"__prev_$out")).otherwise(col(out)))
    }
    patched.drop("__bkt" +: "__rn" +:
      lagCols.map { case (_, out) => s"__prev_$out" }: _*)
  }

  /** Add `outCol` = exact 1-based global rank under ORDER BY `orderCols`
    * (a deterministic total order), without a global window — the same
    * two-phase recipe as [[withLag1]]/[[Packing.withRunningBefore]]:
    * row_number within `bucket` partitions, then add each bucket's
    * exclusive row-count offset via a broadcast join.
    *
    * `bucket` must be a monotone coarsening of the `orderCols` order
    * (rows in a lower bucket sort before rows in a higher bucket) — e.g.
    * the integer value of the first hex chars of a hash sort key. The
    * offset table has one row per non-empty bucket, so the fix-up window
    * runs over that tiny table only.
    */
  def withGlobalRank(df: DataFrame, bucket: Column, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    val parted = df.withColumn("__bkt", bucket)
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
    val local = parted.withColumn("__rn", row_number().over(w))
    // per-bucket count = max(row_number) over the SAME bucket exchange
    // the window already built — a groupBy on `parted` would hang a
    // second (partial-agg) exchange off the un-exchanged input and
    // recompute the whole upstream subtree; off `local`, ReuseExchange
    // shares one shuffle between the window and the count (round 8)
    val counts = local.groupBy(col("__bkt")).agg(max(col("__rn")).as("__n"))
    // pmod rather than lit(0): see withLag1 — the single partition is the
    // point (one row per bucket), but a literal spec would fold back into
    // the warn-on-no-partition path.
    val wB = Window.partitionBy(pmod(col("__bkt"), lit(1)))
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wB), lit(0L)))
      .select(col("__bkt"), col("__off"))
    local.join(broadcast(offsets), Seq("__bkt"))
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__bkt", "__rn", "__off")
  }

  /** Fused global rank + exclusive running weight + grand total — the
    * "coverage curve" stack ([[withGlobalRank]] →
    * [[Packing.withRunningBefore]] → a separate total aggregate +
    * crossJoin) in ONE bucket machinery. Each machinery alone costs a
    * full exchange, a count aggregate, an offset window and a broadcast
    * build; stacked they also re-read their input per stage. Here the
    * row_number and the inclusive running weight ride the SAME
    * (bucket)-partitioned window, the per-bucket rank/weight totals
    * come off that window's own exchange, and rank offsets, weight
    * offsets AND the grand weight total ride ONE broadcast prefix-sum
    * table. Contracts as [[withGlobalRank]] (monotone bucket,
    * deterministic order) plus non-negative `weight` (the bucket weight
    * total is read as max of the nondecreasing running sum).
    */
  def withGlobalRankAndBefore(df: DataFrame, bucket: Column,
      orderCols: Seq[Column], weight: Column, rankOut: String,
      beforeOut: String, totalOut: String): DataFrame = {
    val parted = df.withColumn("__bkt", bucket).withColumn("__w", weight)
    val wR = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
    val wInc = wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__rn", row_number().over(wR))
      .withColumn("__cw", sum(col("__w")).over(wInc))
    val counts = local.groupBy(col("__bkt"))
      .agg(max(col("__rn")).as("__n"), max(col("__cw")).as("__wt"))
    val wB = Window.partitionBy(pmod(col("__bkt"), lit(1)))
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(pmod(col("__bkt"), lit(1)))
      .orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__offr", coalesce(sum(col("__n")).over(wB), lit(0L)))
      .withColumn("__offw", coalesce(sum(col("__wt")).over(wB), lit(0L)))
      .withColumn("__totw", sum(col("__wt")).over(wAll))
      .select(col("__bkt"), col("__offr"), col("__offw"), col("__totw"))
    local.join(broadcast(offsets), Seq("__bkt"))
      .withColumn(rankOut, col("__offr") + col("__rn"))
      .withColumn(beforeOut, col("__offw") + col("__cw") - col("__w"))
      .withColumn(totalOut, col("__totw"))
      .drop("__bkt", "__w", "__rn", "__cw", "__offr", "__offw", "__totw")
  }

  /** [[withGlobalRankAndBefore]] generalized to N weight columns (and
    * no grand-total output): exact global rank + N exclusive running
    * sums over ONE bucket exchange, one window pass and ONE broadcast
    * prefix-sum table (r17 optimization round: q161 stacked a full
    * withGlobalRank machinery and a full withRunningBeforeMulti
    * machinery over the same doc-ordered rows — two exchanges, two
    * count aggregates, two broadcast builds for what is one window).
    * Contracts as [[withGlobalRank]] (monotone bucket, deterministic
    * total order) plus non-negative weights (bucket totals are read as
    * max of the nondecreasing inclusive running sums).
    */
  def withGlobalRankAndBeforeMulti(df: DataFrame, bucket: Column,
      orderCols: Seq[Column], weights: Seq[(String, String)],
      rankOut: String): DataFrame = {
    require(weights.nonEmpty,
      "withGlobalRankAndBeforeMulti: weights must be non-empty")
    val parted = df.withColumn("__bkt", bucket)
    val wR = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
    val wInc = wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = weights.foldLeft(
      parted.withColumn("__rn", row_number().over(wR))) {
      case (d, (src, out)) =>
        d.withColumn(s"__cw_$out", sum(col(src)).over(wInc))
    }
    // per-bucket totals off the window's own exchange (ReuseExchange —
    // see withGlobalRank)
    val counts = local.groupBy(col("__bkt"))
      .agg(max(col("__rn")).as("__n"),
        weights.map { case (_, out) =>
          max(col(s"__cw_$out")).as(s"__wt_$out") }: _*)
    val wB = Window.partitionBy(pmod(col("__bkt"), lit(1)))
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = weights.foldLeft(counts.withColumn("__offr",
        coalesce(sum(col("__n")).over(wB), lit(0L)))) {
      case (d, (_, out)) => d.withColumn(s"__offw_$out",
        coalesce(sum(col(s"__wt_$out")).over(wB), lit(0L)))
    }.select(col("__bkt") +: col("__offr") +:
      weights.map { case (_, out) => col(s"__offw_$out") }: _*)
    val joined = local.join(broadcast(offsets), Seq("__bkt"))
      .withColumn(rankOut, col("__offr") + col("__rn"))
    weights.foldLeft(joined) { case (d, (src, out)) =>
      d.withColumn(out, col(s"__offw_$out") + col(s"__cw_$out") - col(src))
    }.drop("__bkt" +: "__rn" +: "__offr" +: weights.flatMap {
      case (_, out) => Seq(s"__cw_$out", s"__offw_$out") }: _*)
  }

  /** Add `outCol` = exact 1-based rank under ORDER BY `orderCols` WITHIN
    * each `group` — the grouped form of [[withGlobalRank]]. A plain
    * `Window.partitionBy(group)` serializes each group through one task,
    * which at 100 TB is a skew hazard exactly when groups are few and
    * large (per-language ranking of a web corpus). Here the window is
    * partitioned by (group, bucket) so no task sees more than one
    * bucket's rows, and each bucket's exclusive offset within its group
    * comes from a broadcast prefix-sum over the tiny
    * one-row-per-(group, bucket) count table.
    *
    * `bucket` must be a monotone coarsening of `orderCols` within every
    * group (same contract as [[withGlobalRank]]).
    */
  def withGroupedRank(df: DataFrame, group: Column, bucket: Column,
      orderCols: Seq[Column], outCol: String,
      groupTotalCol: Option[String] = None): DataFrame = {
    val parted = df.withColumn("__grp", group).withColumn("__bkt", bucket)
    val w = Window.partitionBy(col("__grp"), col("__bkt"))
      .orderBy(orderCols: _*)
    val local = parted.withColumn("__rn", row_number().over(w))
    // count via max(row_number) off `local`: shares the window's
    // exchange instead of recomputing the upstream (see withGlobalRank)
    val counts = local.groupBy(col("__grp"), col("__bkt"))
      .agg(max(col("__rn")).as("__n"))
    val wB = Window.partitionBy(col("__grp"))
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    // group total (rank-vs-n cuts — the q106/q118/q124 consumers) rides
    // the SAME tiny broadcast as the offsets: an unbounded frame over
    // the same count-table exchange, instead of a second groupBy +
    // broadcast join that would re-read `counts`
    val wAll = Window.partitionBy(col("__grp")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wB), lit(0L)))
    val offsets = groupTotalCol match {
      // select, not drop: a caller may name the total col "__n" itself
      case Some(gt) => offsets0.withColumn(gt, sum(col("__n")).over(wAll))
        .select(col("__grp"), col("__bkt"), col("__off"), col(gt))
      case None => offsets0.select(col("__grp"), col("__bkt"), col("__off"))
    }
    local.join(broadcast(offsets), Seq("__grp", "__bkt"))
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__grp", "__bkt", "__rn", "__off")
  }

  /** Exact weighted value at rank ceil(W·p/100) of the expanded
    * multiset within each `group`, for each percent in `ps` — the
    * multi-percentile generalization of [[groupedWeightedMedian]]
    * (p = 50 IS the lower median: ceil(W/2) = (W+1) DIV 2), matching
    * the oracle-side ceil-rank inequality r·100 ≥ n·p > (r−1)·100.
    *
    * Designed to run over a PRE-AGGREGATED (group, value, weight)
    * histogram: the caller collapses raw rows with one combinable
    * aggregation (map-side combine does the heavy lifting before the
    * wire), and every exchange here is histogram-sized, not row-sized.
    * Same scale shape as [[withGroupedRank]] otherwise: the running
    * weight sum is windowed on (group, bucket) so no task sees more
    * than one bucket of a group's distinct values, and offsets + group
    * totals ride ONE broadcast prefix-sum over the tiny per-(group,
    * bucket) count table. `bucket` must be a monotone coarsening of
    * `value` within every group. Duplicate value rows are fine — ties
    * split the cumulative range arbitrarily but every tied row carries
    * the same value, so the SELECTED value is deterministic.
    *
    * Output: one row per (group, p) — (groupOut, pOut, valueOut,
    * totalCol) with totalCol = Σweight of the group.
    */
  def groupedWeightedCeilRanks(df: DataFrame, group: Column,
      bucket: Column, value: Column, weight: Column, ps: Seq[Int],
      groupOut: String, pOut: String, valueOut: String,
      totalCol: String): DataFrame = {
    val parted = df.select(group.as("__grp"), bucket.as("__bkt"),
      value.as("__v"), weight.as("__w"))
    val w = Window.partitionBy(col("__grp"), col("__bkt"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__cum", sum(col("__w")).over(w))
    // per-bucket weight total = max running sum over the window's own
    // exchange (ReuseExchange; see withGlobalRank)
    val counts = local.groupBy(col("__grp"), col("__bkt"))
      .agg(max(col("__cum")).as("__n"))
    val wB = Window.partitionBy(col("__grp"))
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    // group total rides the SAME tiny broadcast as the offsets (an
    // unbounded frame over the same exchange) — a separate tots
    // groupBy+join would add a second broadcast build re-reading `counts`
    val wAll = Window.partitionBy(col("__grp")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wB), lit(0L)))
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .select(col("__grp"), col("__bkt"), col("__off"), col("__tot"))
    local.join(broadcast(offsets), Seq("__grp", "__bkt"))
      .withColumn("__gcum", col("__off") + col("__cum"))
      // fan each histogram row out per requested percent, then keep the
      // row whose cumulative-weight range [gcum − w, gcum) contains that
      // percent's target position (histogram-sized × |ps|, pre-filter)
      .withColumn("__p", explode(array(ps.map(p => lit(p)): _*)))
      .withColumn("__pos", expr("(__tot * __p + 99) DIV 100"))
      .filter(col("__gcum") - col("__w") < col("__pos") &&
        col("__pos") <= col("__gcum"))
      .select(col("__grp").as(groupOut), col("__p").as(pOut),
        col("__v").as(valueOut), col("__tot").as(totalCol))
  }

  /** Exact weighted value at rank ceil(W·p/100) per group over a
    * PRE-AGGREGATED (group, value, weight) histogram, via ONE
    * per-group window — the stage-lean sibling of
    * [[groupedWeightedCeilRanks]].
    *
    * A `Window.partitionBy(group)` over raw rows is a skew hazard; over
    * a HISTOGRAM it is not: per-group row count is bounded by the value
    * domain (distinct values), which does not grow with corpus size —
    * the same boundedness argument as the broadcast offsets table. So
    * where the bucketed variant pays window-exchange + count-aggregate
    * + offset-window + broadcast-join (~4 plan segments), this is one
    * exchange: cumulative and total weight ride the same sort, and the
    * ceil-rank inequality r·100 ≥ W·p > (r−1)·100 picks the element.
    * Use the bucketed variant when the value domain itself is unbounded.
    */
  def histCeilRanks(df: DataFrame, group: Column, value: Column,
      weight: Column, ps: Seq[Int], groupOut: String, pOut: String,
      valueOut: String, totalCol: String): DataFrame = {
    val parted = df.select(group.as("__grp"), value.as("__v"),
      weight.as("__w"))
    val wC = Window.partitionBy(col("__grp")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col("__grp"))
    parted.withColumn("__cum", sum(col("__w")).over(wC))
      .withColumn("__tot", sum(col("__w")).over(wT))
      .withColumn("__p", explode(array(ps.map(p => lit(p)): _*)))
      .withColumn("__pos", expr("(__tot * __p + 99) DIV 100"))
      .filter(col("__cum") - col("__w") < col("__pos") &&
        col("__pos") <= col("__cum"))
      .select(col("__grp").as(groupOut), col("__p").as(pOut),
        col("__v").as(valueOut), col("__tot").as(totalCol))
  }

  /** Exact weighted LOWER median per group — see
    * [[groupedWeightedCeilRanks]]; kept as the single-percentile entry
    * point its consumers read naturally.
    */
  def groupedWeightedMedian(df: DataFrame, group: Column, bucket: Column,
      value: Column, weight: Column, groupOut: String, outCol: String,
      totalCol: String): DataFrame =
    groupedWeightedCeilRanks(df, group, bucket, value, weight, Seq(50),
      groupOut, "__p50", outCol, totalCol).drop("__p50")
}
