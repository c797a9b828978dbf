package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark's batch API lacks.
  *
  * Built the preferred way (compose existing ops, builder-prompt ladder
  * step (a)): union both sides tagged, one window pass per key carrying
  * the latest right-side payload forward with
  * `last_value(..., ignoreNulls)`, keep left rows. Cost = ONE shuffle on
  * the key + an in-partition sort — same shape as a sort-merge join, no
  * per-row probing, no range explosion; at 100 TB this is strictly
  * cheaper than the naive "join then filter max ts" formulation, which
  * shuffles the full pair multiplicity.
  *
  * Matches DuckDB/pandas ASOF semantics: for each left row, the right
  * row with the greatest rightTs <= leftTs within the same key (verified
  * against DuckDB's native ASOF JOIN by q37).
  */
object AsOf {

  /** @param payload right-side columns to attach (renamed as given). */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val srcCols = payload.keys.toSeq
    val outCols = payload.values.toSeq

    // the payload rides as ONE struct: a right row's struct is non-null
    // even when every payload FIELD is null, so `last(ignoreNulls)` —
    // which must skip the left rows' null slots — can no longer skip a
    // legitimately-null matched value and resurrect an older one (the
    // DuckDB/pandas ASOF answer for that row is the matched row's NULL).
    // One struct also means one window expression instead of N.
    val pType = StructType(srcCols.zip(outCols).map { case (s, o) =>
      StructField(o, right.schema(s).dataType, nullable = true) })
    val taggedRight = right.select(
      (col(key) :: col(rightTs).as("__ts") :: lit(1).as("__isr") ::
        struct(srcCols.zip(outCols).map { case (s, o) => col(s).as(o) }: _*)
          .as("__p") :: Nil): _*)
    val taggedLeft = left.select(
      (col(key) :: col(leftTs).as("__ts") :: lit(0).as("__isr") ::
        lit(null).cast(pType).as("__p") ::
        leftCols.filterNot(c => c == key || c == leftTs)
          .map(c => col(c).as(s"__l_$c")).toList): _*)
    val taggedRightPadded = taggedRight.select(
      (taggedRight.columns.map(col).toList :::
        leftCols.filterNot(c => c == key || c == leftTs).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")).toList): _*)

    // right rows sort before left rows at equal ts (inclusive <= match).
    // The payload struct is the TERTIARY key so two right rows tied on
    // (key, ts) resolve deterministically — last() then picks the
    // GREATEST payload tuple, run-to-run stable under any shuffle order
    // (DuckDB's native ASOF leaves the tied pick unspecified, so a
    // tie-free right side is still what cross-engine comparisons need).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__isr").desc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRightPadded)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__isr") === 0)
      .select((col(key) :: col("__ts").as(leftTs) ::
        leftCols.filterNot(c => c == key || c == leftTs).map(c => col(s"__l_$c").as(c)).toList :::
        outCols.map(o => col("__m").getField(o).as(o)).toList): _*)
  }
}
