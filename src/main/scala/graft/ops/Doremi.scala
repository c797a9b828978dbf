package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DoReMi-style domain mixture reweighting (Xie et al. 2023, public):
  * exponentiated-gradient updates push sampling weight toward domains
  * with higher model loss, smoothed toward uniform. Here the per-domain
  * loss is the corpus's own bigram-LM surprisal ([[BigramLm]]) — the
  * proxy-model signal a full DoReMi run would refresh per round.
  *
  * Scale/determinism shape (the q72/q88 driver-state contract): ONE
  * corpus-sized job builds the per-source loss aggregate; the model
  * state (K domain weights — dozens, never corpus-sized) then iterates
  * on the driver in pico-unit fixed point. The exp factor is rounded
  * to a nano-unit BIGINT once per source, so every round is arithmetic
  * on exact integers (IEEE-identical in any engine) and the oracle
  * replays all rounds bit-for-bit; per-round normalization divides by
  * an order-independent integer SUM.
  */
object Doremi {

  /** Collect-bound cap on distinct mixture domains: DoReMi reweights a
    * hand-curated source taxonomy (tens of entries), never raw keys. */
  val MaxDomains = 100000

  /** Final mixture weights after `rounds` EG updates with fixed
    * eta=0.5, alpha=0.01 (the literals are baked into the generated
    * oracle, so they are not parameters here).
    */
  def mixtureWeights(spark: SparkSession, docs: DataFrame, textCol: String,
      sourceCol: String, rounds: Int = 12): DataFrame = {
    val sc = BigramLm.scoreDocs(docs, textCol, "doc_id",
        carry = Seq(sourceCol))
      .select(col(sourceCol).as("source"),
        round(col("avg_neg_logp") * 1e6).cast("long").as("sk"))
    val base0 = sc.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("sk")).as("ss"))
      // bounded source domain: 1-partition sort, same deterministic order
      .coalesce(1).sortWithinPartitions(col("source"))
    val base = graft.util.CollectCapped(base0, MaxDomains,
      "DoReMi per-domain loss rollup")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val k = base.length
    val lossMicro = base.map { case (_, n, ss) => math.round(ss.toDouble / n) }
    // nano-unit exp factor, rounded ONCE: rounds then never touch a
    // transcendental, so iteration error cannot accumulate
    val f = lossMicro.map(lm =>
      math.round(math.exp(0.5 * lm.toDouble / 1000000.0) * 1000000000.0))
    var w = Array.fill(k)(1000000000000L / k)
    for (_ <- 1 to rounds) {
      val ru = Array.tabulate(k)(i =>
        math.round(w(i).toDouble * f(i).toDouble / 1000000000.0))
      val s = ru.sum
      w = Array.tabulate(k)(i =>
        math.round(ru(i).toDouble / s.toDouble * 990000000000.0
          + 10000000000.0 / k))
    }
    import spark.implicits._
    base.indices.map { i =>
      (base(i)._1, base(i)._2, lossMicro(i), w(i))
    }.toDF("source", "n_docs", "loss_micro", "w_pico")
      .select(col("source"), col("n_docs"),
        round(col("loss_micro").cast("double") / 1000000.0, 6)
          .as("mean_nlp"),
        round(col("w_pico").cast("double") / 1000000000000.0, 6)
          .as("weight"),
        round(col("w_pico").cast("double") / 1000000000000.0 * k, 6)
          .as("boost"))
      // bounded source domain: 1-partition sort skips the sampling job
      .coalesce(1).sortWithinPartitions(col("source"))
  }
}
