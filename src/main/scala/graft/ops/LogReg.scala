package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed quality-classifier training: logistic regression over
  * hashed bag-of-words features (the fastText/CCNet filter-model shape),
  * trained by full-batch gradient descent.
  *
  * Scale shape at 100 TB:
  *  - the corpus collapses ONCE into a cached per-document sparse
  *    feature row ((doc_id, y, [(f, x)])) — one token-keyed shuffle;
  *  - each GD iteration is a single job: the model rides INTO the plan
  *    as a (dims+1)-long literal array (codegen element_at lookups — no
  *    join, no broadcast machinery), per-document margin and residual
  *    are computed row-wise, and the gradient comes back as a
  *    feature-keyed, map-side-combinable aggregation of at most dims+1
  *    rows per partition;
  *  - driver state is the model itself (dims+1 longs), exactly like
  *    [[KMeans]] holds k centroids.
  *
  * Cross-engine determinism (the q51 fixed-point recipe): weights live
  * in integer micro-units, so per-document margins are exact BIGINT
  * dot products (order-independent sums); the sigmoid is the rational
  * surrogate σ̃(z) = 0.5 + z / (2(1+|z|)) — only +,*,/,abs, all
  * IEEE-exact — never exp(), whose last-ulp behavior differs between
  * engines; and gradient contributions quantize back to BIGINT via
  * floor before the order-sensitive sum. Every arithmetic step is
  * bit-reproducible in DuckDB, so the oracle replays ALL iterations.
  */
object LogReg {

  /** Feature hash: md5-derived 24-bit value mod dims (oracle twin:
    * CAST(('0x' || substr(md5(term),1,6)) AS BIGINT) % dims).
    */
  def featureHash(term: Column, dims: Int): Column =
    conv(substring(md5(term), 1, 6), 16, 10).cast("long") % dims

  /** Train `iters` full-batch GD steps; returns (f, weight_micro) for
    * f ∈ [0, dims] — index dims is the bias. `label` must evaluate to
    * 1.0/0.0 per row.
    */
  def train(docs: DataFrame, textCol: String, label: Column,
      dims: Int = 256, iters: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val (prep, weights) = trainCore(docs, textCol, label, dims, iters)
    prep.unpersist()
    spark.createDataFrame((0 to dims).map(f => (f.toLong, weights(f))))
      .toDF("f", "weight_micro")
  }

  /** Train, then score every document with the final model — WITHOUT
    * re-featurizing the corpus: the scoring margin is one more row-wise
    * pass over the SAME cached sparse rows the gradient jobs read (the
    * per-token hashing is paid once for the whole train+apply cycle).
    * Scores are materialized before the feature cache is released.
    */
  def trainScore(docs: DataFrame, textCol: String, label: Column,
      dims: Int = 256, iters: Int = 3): DataFrame = {
    val (prep, weights) = trainCore(docs, textCol, label, dims, iters)
    val wLit = typedLit(weights.toSeq)
    val scored = prep
      .withColumn("dm", aggregate(col("fs"), lit(0L), (acc, s) =>
        acc + element_at(wLit, (s.getField("f") + 1).cast("int"))
          * s.getField("x")))
      .withColumn("z", col("dm").cast("double") / lit(1e6))
      .select(col("doc_id"),
        round(lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))), 6)
          .as("score"))
      .localCheckpoint(true) // ~16 bytes/doc, freed with the session
    prep.unpersist()
    scored
  }

  private def trainCore(docs: DataFrame, textCol: String, label: Column,
      dims: Int, iters: Int): (DataFrame, Array[Long]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs.select(col("doc_id"),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
        .as("term"))
    val byDoc = terms
      .select(col("doc_id"), featureHash(col("term"), dims).as("f"))
      .groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("x"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("f"), col("x"))).as("fs"))
    val prep = docs.select(col("doc_id"), label.cast("double").as("y"))
      .join(byDoc, Seq("doc_id"), "left")
      .withColumn("fs", concat(
        coalesce(col("fs"), array().cast("array<struct<f:bigint,x:bigint>>")),
        array(struct(lit(dims.toLong).as("f"), lit(1L).as("x")))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = prep.count() // the model update's denominator, driver-side
    val weights = new Array[Long](dims + 1)
    for (_ <- 1 to iters) {
      val wLit = typedLit(weights.toSeq)
      val scored = prep
        .withColumn("dm", aggregate(col("fs"), lit(0L), (acc, s) =>
          acc + element_at(wLit, (s.getField("f") + 1).cast("int"))
            * s.getField("x")))
        .withColumn("z", col("dm").cast("double") / lit(1e6))
        .withColumn("r",
          lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z"))))
            - col("y"))
      val grads = scored
        .select(explode(col("fs")).as("s"), col("r"))
        .select(col("s.f").as("f"),
          floor((col("r") * col("s.x").cast("double")) * lit(1e6)).as("c"))
        .groupBy(col("f")).agg(sum(col("c")).as("g"))
        .collect()
      grads.foreach { row =>
        val f = row.getLong(0).toInt
        val g = row.getLong(1)
        weights(f) = weights(f) - math.floor(g.toDouble / (2.0 * n)).toLong
      }
    }
    (prep, weights)
  }

  /** Score text with a trained micro-weight vector (index dims = bias):
    * the rational-sigmoid probability of the positive class.
    */
  def scoreExpr(text: Column, weights: Array[Long], dims: Int): Column = {
    val wLit = typedLit(weights.toSeq)
    val fx = filter(split(lower(coalesce(text, lit(""))), "\\s+"),
      t => t =!= "")
    val dm = aggregate(
      fx, lit(weights(dims)), (acc, t) =>
        acc + element_at(wLit, (featureHash(t, dims) + 1).cast("int")))
    val z = dm.cast("double") / lit(1e6)
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
  }
}
