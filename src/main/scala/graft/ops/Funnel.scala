package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel over an event stream: for each user, the
  * first completion time of each step, where step i must occur strictly
  * after step i-1 and within `horizonMicros` of it (the classic
  * view → click → purchase conversion funnel, generalized to any step
  * chain — the q113 surface).
  *
  * Scale shape: ONE user-keyed combinable aggregation — a min for the
  * first step plus one timestamp list per later step (partials
  * concatenate; per-user state is bounded by that user's own events,
  * the same bound any per-user analysis carries) — then the chained
  * "first after previous, within horizon" steps are array folds in the
  * projection. No self-join, no per-user window, no re-shuffle between
  * steps. Timestamps are exact epoch-micro BIGINTs, so step decisions
  * are integer comparisons in any engine.
  */
object Funnel {

  /** Per-user stage times: output has `userCol` plus t0..t{n-1}
    * (BIGINT epoch micros, null where the user never completes the
    * stage under the ordering/horizon rule).
    */
  def stageTimes(ev: DataFrame, userCol: String, typeCol: String,
      usCol: String, steps: Seq[String], horizonMicros: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(horizonMicros > 0, s"horizon must be positive: $horizonMicros")
    val aggs =
      min(when(col(typeCol) === steps.head, col(usCol))).as("t0") +:
        steps.tail.zipWithIndex.map { case (st, i) =>
          collect_list(when(col(typeCol) === st, col(usCol)))
            .as(s"__a${i + 1}")
        }
    var df = ev.groupBy(col(userCol)).agg(aggs.head, aggs.drop(1): _*)
    for (i <- 1 until steps.size)
      df = df.withColumn(s"t$i",
        array_min(filter(col(s"__a$i"), x =>
          x > col(s"t${i - 1}") &&
            x <= col(s"t${i - 1}") + lit(horizonMicros))))
    df.drop((1 until steps.size).map(i => s"__a$i"): _*)
  }
}
