package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005)
  * over a term column — the streaming-frequency workhorse: a
  * depth×width counter table where every term adds its count at slot
  * h_d(term) in each row d, and est(term) = min over rows, always ≥ the
  * true count (collisions only ADD).
  *
  * Spark-first shape: the sketch is a TABLE of (d, slot, cell) rows —
  * never a driver array — built by map-side-combinable aggregations, so
  * at 100 TB the counter build shuffles at most depth×width partial
  * rows per task. Hashing is the bloomPos discipline (the four
  * independent 32-bit slices of md5(term), no re-hash, depth ≤ 4), so a
  * SQL oracle rebuilds the sketch hex-for-hex (q90).
  */
object Cms {

  /** (d, slot) column for depth column `d` (0..3) over `term`. */
  private[graft] def slotCol(width: Int): Column =
    conv(expr("substring(md5(term), d * 8 + 1, 8)"), 16, 10)
      .cast("long") % width

  /** Counter table in ONE aggregation straight off the scan (no
    * term-level pre-aggregation): every (doc, term, count) occurrence
    * adds its count at its depth×slot cells. Identical to
    * [[counterTable]]∘[[termCounts]] because the cell sum is
    * associative over occurrences — and being a single aggregation it
    * is also the STREAMING twin's shape (chained aggregations are not
    * streamable; this is).
    */
  def counterTableDirect(df: DataFrame, textCol: String, width: Int,
      depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1, 4] (md5 has 4 32-bit slices): $depth")
    require(width > 0, s"width must be positive: $width")
    df.select(explode(graft.functions.SketchExpressions
        .term_counts(coalesce(col(textCol), lit("")))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.tf").cast("long").as("c"))
      .select(col("term"), col("c"),
        posexplode(sequence(lit(0), lit(depth - 1))).as(Seq("__i", "d")))
      .withColumn("slot", slotCol(width))
      .groupBy(col("d"), col("slot")).agg(sum(col("c")).as("cell"))
  }

  /** Exact global term counts off the one-pass term_counts kernel:
    * (term, cnt), token occurrences never cross the shuffle.
    */
  def termCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.SketchExpressions
        .term_counts(coalesce(col(textCol), lit("")))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.tf").cast("long").as("c"))
      .groupBy(col("term")).agg(sum(col("c")).as("cnt"))

  /** The CMS counter table (d, slot, cell) for the corpus vocabulary. */
  def counterTable(termCnts: DataFrame, width: Int, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1, 4] (md5 has 4 32-bit slices): $depth")
    require(width > 0, s"width must be positive: $width")
    termCnts
      .select(col("term"), col("cnt"),
        posexplode(sequence(lit(0), lit(depth - 1))).as(Seq("__i", "d")))
      .withColumn("slot", slotCol(width))
      .groupBy(col("d"), col("slot")).agg(sum(col("cnt")).as("cell"))
  }

  /** Heavy-hitter certification report: the exact top-`topK` terms with
    * their CMS estimates — (term, exact_cnt, cms_est, overcount ≥ 0).
    * The declared q90 surface.
    */
  def heavyHitters(df: DataFrame, textCol: String, width: Int = 1024,
      depth: Int = 4, topK: Int = 20): DataFrame = {
    val gc = termCounts(df, textCol)
    val counters = counterTable(gc, width, depth)
    gc.orderBy(col("cnt").desc, col("term")).limit(topK)
      .select(col("term"), col("cnt"),
        posexplode(sequence(lit(0), lit(depth - 1))).as(Seq("__i", "d")))
      .withColumn("slot", slotCol(width))
      .join(counters, Seq("d", "slot"))
      .groupBy(col("term"))
      .agg(max(col("cnt")).as("exact_cnt"), min(col("cell")).as("cms_est"))
      .select(col("term"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      // bounded by topK: 1-partition sort skips orderBy's sampling job
      .coalesce(1).sortWithinPartitions(col("exact_cnt").desc, col("term"))
  }
}
