package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, plus SemDeDup
  * (Abbas et al. 2023): semantic dedup that prunes near-duplicate pairs
  * WITHIN k-means clusters only, so the pairwise work is bounded by the
  * cluster size instead of the corpus size.
  *
  * Scale shape:
  *  - init: deterministic stride sample ([[Ann.ivfCentroids]]) — one
  *    scan, k vectors to the driver.
  *  - assignment: a codegen argmax expression carrying the k×d centroid
  *    table as a generated-code reference object (no UDF bridge, no
  *    shuffle — the table streams through a projection).
  *  - update: posexplode to (cluster, dim, value) then ONE two-stage
  *    aggregation; map-side combine means the shuffle carries k×d
  *    partial sums per task, never vectors. The k×d collect per
  *    iteration is the standard driver synchronization of every
  *    distributed k-means (Spark MLlib does the same via treeAggregate).
  *
  * Determinism contract (what lets DuckDB re-derive the clustering
  * bit-for-bit): centroid updates are FIXED-POINT means — per dimension,
  * sum of round(value·1e6) as integers (exact in any summation order)
  * divided by n·1e6 in double. Float addition is not associative, so a
  * plain avg() would differ between engines (and between partitionings
  * of the same data!); the fixed-point mean makes every iteration's
  * centroids identical everywhere at a precision (1e-6) far below any
  * real embedding's noise floor. Reference dedup surface:
  * geoparquet_io has no embedding ops — this is builder-prompt scope.
  */
object KMeans {

  /** Collect-bound sanity cap on embedding dimensionality: the centroid
    * update materializes k x dims partial-sum rows on the driver. */
  val MaxDims = 65536

  /** Scale of the fixed-point centroid mean (see determinism contract). */
  val Scale = 1e6

  /** Run `iters` assignment passes (centroid update between passes).
    *
    * @return (input + `clusterCol`, centroids used in the FINAL pass as
    *         (label, perDimMean) ordered by label — empty clusters keep
    *         their original labels and simply disappear)
    */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 2, clusterCol: String = "cluster")
      : (DataFrame, Seq[(Int, Array[Double])]) = {
    require(iters >= 1, "iters must be >= 1")
    val src = df
    var cents: Seq[(Int, Array[Double])] =
      Ann.ivfCentroids(src, vecCol, idCol, k).zipWithIndex
        .map { case (v, i) => (i, v.map(_.toDouble)) }
    def assign(src: DataFrame, cs: Seq[(Int, Array[Double])]): DataFrame =
      src.withColumn(clusterCol,
        graft.functions.SketchExpressions.kmeans_assign(col(vecCol),
          cs.map(_._1).toArray, cs.map(_._2).toArray))
    // Plan size is bounded by construction: every pass rebuilds
    // assign() from the INPUT frame with the new centroids as driver
    // literals, so the lineage never stacks across iterations (pinned
    // at iters=5 in OpsSpec). What does repeat is the scan of `df` —
    // one per update pass — so beyond the default 2-iter contract the
    // input is persisted for the loop (the MLlib convention) and
    // released once the final centroids are fixed.
    val input = if (iters > 2)
      src.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else src
    var it = 1
    while (it < iters) {
      // exact integer partial sums per (cluster, dim); n is the member
      // count (identical across dims of one cluster)
      val rows0 = assign(input, cents)
        .select(col(clusterCol).as("__c"),
          posexplode(col(vecCol)).as(Seq("__i", "__v")))
        .groupBy(col("__c"), col("__i"))
        .agg(sum(round(col("__v").cast("double") * Scale).cast("long")).as("__s"),
          count(lit(1)).as("__n"))
      val rows = graft.util.CollectCapped(rows0, k.toLong * MaxDims,
        "k-means centroid partial sums (k x dims)")
      cents = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (c, rs) =>
        val dims = rs.sortBy(_.getInt(1))
          .map(r => r.getLong(2).toDouble / (r.getLong(3) * Scale)).toArray
        (c, dims)
      }
      it += 1
    }
    if (iters > 2) input.unpersist(false)
    (assign(src, cents), cents)
  }

  /** SSL-prototypes pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws"): within each cluster, rank vectors by cosine to the
    * cluster centroid (prototypicality) and mark the most prototypical
    * `1/pruneDiv` fraction prunable — prototypical examples are the
    * most redundant with the cluster's mass, so dropping them prunes
    * with the least information loss (the DataComp/SemDeDup-adjacent
    * recipe for embedding-based data pruning).
    *
    * Scale shape: the score is a codegen expression carrying the k×d
    * centroid table as a reference object (one scan, no join for the
    * score); the rank window and the size aggregate are both keyed on
    * the cluster id — bounded k-row broadcast back. Integer division
    * sizes the prune quota, so the cut is exact in any engine.
    */
  def protoPrune(assigned: DataFrame, cents: Seq[(Int, Array[Double])],
      vecCol: String, idCol: String, pruneDiv: Int = 5,
      clusterCol: String = "cluster"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = cents.map(_._1).toArray
    val cc = cents.map(_._2).toArray
    // rank on the ROUNDED score (6 dp) with the id tiebreak: the oracle
    // sums the cosine's terms in its own order, and near-tied
    // prototypicality scores can differ in the last ulp across engines —
    // rounding before the rank makes the rk/pruned cut float-robust
    // (the q61/q63 discipline)
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(round(col("__proto"), 6).desc, col(idCol))
    val sizes = assigned.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("__n"))
    assigned
      .withColumn("__proto", graft.functions.SketchExpressions
        .centroid_cosine(col(vecCol), col(clusterCol), labels, cc))
      .withColumn("rk", row_number().over(w))
      .join(broadcast(sizes), Seq(clusterCol))
      .select(col(idCol), col(clusterCol), col("__proto").as("proto"),
        col("rk"), (col("rk") <= expr(s"__n div $pruneDiv")).as("pruned"))
  }

  /** SemDeDup candidate pairs: same-cluster pairs with cosine ≥
    * `threshold`. Callers resolve keepers via [[Dedup.connectedComponents]]
    * or a min-id rule. The join is keyed on the cluster id: with k
    * sized so clusters hold ~10³ vectors (k grows with the corpus —
    * that is SemDeDup's own design), each join group does bounded
    * pairwise work. A cluster far above `warnSize` means k is too small
    * for the corpus — warn, same philosophy as the partition guardrails.
    */
  def semDedupPairs(assigned: DataFrame, vecCol: String, idCol: String,
      threshold: Double, clusterCol: String = "cluster",
      warnSize: Long = 100000L): DataFrame = {
    // `assigned` (a full k-means assignment projection) feeds three
    // consumers — the size guard plus both self-join sides. Materialize
    // it ONCE: the guard's collect doubles as the checkpointing action,
    // and the join then reads the materialized partitions instead of
    // re-running the assignment twice more.
    val mat = assigned.localCheckpoint(false)
    val sizes = graft.util.CollectCapped(
      mat.groupBy(col(clusterCol)).count()
        .filter(col("count") > warnSize).limit(1), 1,
      "semDedup oversized-cluster probe")
    if (sizes.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"semDedup: cluster ${sizes(0).get(0)} has ${sizes(0).getLong(1)} " +
          s"members (> $warnSize); increase k to bound pairwise work")
    val a = mat.select(col(clusterCol).as("__c"),
      col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = mat.select(col(clusterCol).as("__c"),
      col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Ann.cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("__c").as("cluster"), col("id_a"), col("id_b"),
        col("cosine"))
  }
}
