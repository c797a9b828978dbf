package graft.util

import org.apache.spark.sql.Dataset

/** The ONE sanctioned driver-side materialization point.
  *
  * Every `.collect()` in the engine flows through here with an explicit,
  * caller-declared row bound and a label saying WHAT model-sized artifact
  * is being materialized (BPE merge table, k-means centroids, per-dim
  * quantizer ranges, a single query vector, one boundary-format file...).
  * `CollectAuditSpec` lint-gates the source tree so a raw `.collect()`
  * anywhere else fails the build — the "driver materializations are
  * model-sized, never data-sized" 100 TB claim is a regression test, not
  * review discipline.
  *
  * Deliberately a plain collect + post-check rather than
  * `limit(max+1).collect()`: a limit would re-plan small hot-path frames
  * through `executeTake`'s incremental partition scanning (1, 4, 16...
  * jobs) and perturb every pinned plan for zero benefit at the scales
  * where the bound actually holds. The bound is an audit contract — when
  * it trips, the job fails loudly with the label instead of silently
  * ballooning the driver.
  */
object CollectCapped {
  def apply[T](ds: Dataset[T], max: Long, what: String): Array[T] = {
    require(max > 0, s"$what: declared collect bound must be positive")
    val got = ds.collect()
    require(got.length <= max,
      s"$what: driver materialization returned ${got.length} rows, " +
        s"exceeding its declared model-size bound of $max — " +
        "this path is about to hold data-sized state on the driver")
    got
  }
}
