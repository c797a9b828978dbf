package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-partitioned spatial join for LARGE × LARGE inputs.
  *
  * The enrich join (GeoTable.enrichSpatial) broadcasts the boundary
  * side — right for dimension-sized polygons, impossible when both
  * sides are data-scale. Here both sides map their envelopes onto a
  * fixed grid, candidate pairs come from an equi-join on the cell key
  * (plain hash shuffle, linear in coverage), and each true pair is
  * emitted EXACTLY once without a distinct: only the canonical cell —
  * the one containing the bottom-left corner of the envelope
  * intersection — reports it. No broadcast, no cross join, no
  * dedup shuffle; skew folds into ordinary AQE skew handling.
  */
object SpatialJoin {

  /** cells covered by an envelope at the given cell size. */
  private def cells(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      cellSize: Double): Column = {
    val x0 = floor(xmin / cellSize).cast("long")
    val x1 = floor(xmax / cellSize).cast("long")
    val y0 = floor(ymin / cellSize).cast("long")
    val y1 = floor(ymax / cellSize).cast("long")
    flatten(transform(sequence(x0, x1), cx =>
      transform(sequence(y0, y1), cy => struct(cx.as("cx"), cy.as("cy")))))
  }

  /** Envelope-overlap join of two envelope tables.
    *
    * Inputs carry (idCol, xmin, ymin, xmax, ymax); output is the id
    * pairs whose envelopes intersect, each exactly once.
    *
    * @param cellSize grid pitch — pick ≈ the median envelope size;
    *                 coverage (and the explode factor) is
    *                 O(area / cellSize²) per row.
    */
  def envelopeJoin(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, cellSize: Double): DataFrame = {
    // cellSize 0 turns floor(x/0.0) into +-Inf casts and sequence() into
    // either an opaque "too long sequence" job failure or one giant
    // bucket (O(n^2) in a single task); negative sizes enumerate
    // reversed ranges — fail fast like every other op's params
    require(cellSize > 0 && !cellSize.isNaN && !cellSize.isInfinite,
      s"cellSize must be a positive finite number, got $cellSize")
    def gridded(df: DataFrame, id: String, p: String): DataFrame =
      df.select(col(id).as(s"${p}_id"),
          col("xmin").as(s"${p}_xmin"), col("ymin").as(s"${p}_ymin"),
          col("xmax").as(s"${p}_xmax"), col("ymax").as(s"${p}_ymax"),
          explode(cells(col("xmin"), col("ymin"), col("xmax"), col("ymax"),
            cellSize)).as("cell"))
    val l = gridded(left, leftId, "l")
    val r = gridded(right, rightId, "r")
    l.join(r, Seq("cell"))
      .filter(
        col("l_xmin") <= col("r_xmax") && col("r_xmin") <= col("l_xmax") &&
        col("l_ymin") <= col("r_ymax") && col("r_ymin") <= col("l_ymax"))
      // canonical-cell rule: report only where the bottom-left corner of
      // the envelope intersection falls — one cell per true pair
      .filter(
        col("cell.cx") === floor(greatest(col("l_xmin"), col("r_xmin")) / cellSize)
          .cast("long") &&
        col("cell.cy") === floor(greatest(col("l_ymin"), col("r_ymin")) / cellSize)
          .cast("long"))
      .select(col("l_id"), col("r_id"))
  }
}
