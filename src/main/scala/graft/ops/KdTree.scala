package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KD-tree spatial partitioning (reference `core/add_kdtree_column.py`):
  * recursive median splits alternating x/y produce 2^iterations balanced
  * cells; each row gets a '0'/'1' path-bit string cell id.
  *
  * The reference builds the tree with a WITH RECURSIVE + windowed
  * APPROX_QUANTILE over a sample; here the tree is built driver-side from
  * `approxQuantile` over a sample (a few KB of state), then applied in a
  * single distributed pass — O(n) with a broadcast-size model, the right
  * shape at 100 TB.
  */
object KdTree {

  /** Absolute cap on the split-sample collect when a caller passes
    * sampleRows<=0 ("use everything"): a KD split map estimated from 10M
    * points is already saturated — beyond that the caller is trying to
    * materialize the dataset, which this bound refuses. */
  val AbsoluteSampleCap = 10000000L

  /** Binary tree of alternating x/y median splits. */
  final case class Node(split: Double, left: Option[Node], right: Option[Node])

  /** Build the split tree from a bounded sample (reference
    * `core/add_kdtree_column.py:83` `USING SAMPLE n ROWS`): never more
    * than `sampleRows` points reach the driver, whatever the table size —
    * a fraction-based sample would collect 10 TB at 100 TB scale.
    * `sampleRows <= 0` (or >= table size) collects everything; callers use
    * that only when the split set must be the exact full table.
    *
    * With `rankBy = Some(idCol)` the sample is the exact `sampleRows`
    * rows with the smallest `(md5(id), id)` rank — deterministic under
    * any partitioning and engine (so an external oracle can rebuild the
    * identical tree), and executed as a distributed top-N
    * (TakeOrdered: per-partition heaps, no global sort).
    */
  def build(df: DataFrame, xCol: String, yCol: String, iterations: Int,
      sampleRows: Int = 100000, seed: Long = 42L,
      rankBy: Option[String] = None): Node = {
    val base = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val rows = rankBy match {
      case Some(idCol) if sampleRows > 0 =>
        val ranked = df.select(col(xCol).cast("double").as("x"),
            col(yCol).cast("double").as("y"),
            md5(col(idCol).cast("string")).as("__rk"),
            col(idCol).as("__id"))
          .orderBy(col("__rk"), col("__id")).limit(sampleRows)
          .select("x", "y")
        graft.util.CollectCapped(ranked, sampleRows.toLong,
          "KD-tree deterministic rank sample")
      case _ =>
        val total = base.count()
        if (sampleRows <= 0 || total <= sampleRows)
          graft.util.CollectCapped(base, AbsoluteSampleCap,
            "KD-tree full-input split sample")
        else {
          // oversample 1.2× then trim to the exact budget; the trim bias
          // (drops late-partition rows) is acceptable for split estimation
          val frac = math.min(1.0, sampleRows * 1.2 / total)
          graft.util.CollectCapped(
            base.sample(withReplacement = false, frac, seed)
              .limit(sampleRows), sampleRows.toLong,
            "KD-tree random split sample")
        }
    }
    val sample = rows.map(r => (r.getDouble(0), r.getDouble(1)))

    def median(vs: Array[Double]): Double = {
      val sorted = vs.sorted
      if (sorted.isEmpty) 0.0 else sorted(sorted.length / 2)
    }

    def split(pts: Array[(Double, Double)], depth: Int): Node = {
      val useX = depth % 2 == 0
      val m = median(pts.map(p => if (useX) p._1 else p._2))
      if (depth + 1 >= iterations) Node(m, None, None)
      else {
        val (lo, hi) = pts.partition(p => (if (useX) p._1 else p._2) < m)
        Node(m, Some(split(lo, depth + 1)), Some(split(hi, depth + 1)))
      }
    }
    split(sample, 0)
  }

  /** Cell id of a point: the '0'/'1' path through the split tree
    * (reference cell-id format, `core/add_kdtree_column.py:140-207`).
    */
  def cellOf(tree: Node, x: Double, y: Double): String = {
    val sb = new StringBuilder
    var node: Option[Node] = Some(tree)
    var depth = 0
    while (node.isDefined) {
      val n = node.get
      val v = if (depth % 2 == 0) x else y
      if (v < n.split) { sb.append('0'); node = n.left }
      else { sb.append('1'); node = n.right }
      depth += 1
    }
    sb.toString
  }

  private def depthOf(n: Node): Int = 1 + ((n.left, n.right) match {
    case (Some(l), Some(r)) => math.max(depthOf(l), depthOf(r))
    case _ => 0
  })

  /** Add the kdtree cell column in one distributed pass. Shallow trees
    * (≤ 2^10 leaves — every partitioning use) compile to a nested
    * `when` chain, keeping the assignment inside whole-stage codegen;
    * deeper trees fall back to a broadcast-closure UDF.
    */
  def withCell(df: DataFrame, xCol: String, yCol: String, tree: Node,
      cellCol: String = "kdtree_cell"): DataFrame = {
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    def chain(n: Node, depth: Int): org.apache.spark.sql.Column = {
      val v = if (depth % 2 == 0) x else y
      (n.left, n.right) match {
        case (Some(l), Some(r)) =>
          when(v < n.split, concat(lit("0"), chain(l, depth + 1)))
            .otherwise(concat(lit("1"), chain(r, depth + 1)))
        case _ => when(v < n.split, lit("0")).otherwise(lit("1"))
      }
    }
    val cell =
      if (depthOf(tree) <= 10) chain(tree, 0)
      else {
        val assign = udf((px: Double, py: Double) => cellOf(tree, px, py))
        assign(x, y)
      }
    df.withColumn(cellCol, cell)
  }

  /** Auto iterations targeting ~rowsPerCell rows per cell (reference
    * auto-iteration rule).
    */
  def autoIterations(totalRows: Long, rowsPerCell: Long = 100000L): Int =
    math.max(1, math.ceil(math.log(totalRows.toDouble / rowsPerCell) / math.log(2)).toInt)
}
