package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring (Robertson/Okapi; +1 idf so weights stay
  * positive) of every document against a fixed query-term set — the
  * IR-standard ranking a curation pipeline uses for targeted corpus
  * slicing ("the documents most about X").
  *
  * Spark-first shape (q91): per-document term frequencies and length
  * come straight off the one-pass term_counts kernel with ARRAY
  * builtins — no explode, no shuffle; the corpus statistics (N, Σdl,
  * per-term df) ride as ONE broadcast 1-row aggregate; scoring is a
  * zero-shuffle projection and the top-k a bounded TakeOrdered on the
  * ROUNDED score (the ln + round-6 float discipline).
  */
object Bm25 {

  /** The between-session scoring artifact: corpus size, average doc
    * length, and per-query-term document frequencies — a few dozen
    * numbers regardless of corpus size (the bloom-bitmap / LogReg-model
    * contract). Built once batch-side, then scoring anywhere (batch or
    * streaming) is a stateless zero-shuffle projection.
    */
  final case class Stats(n: Long, avgdl: Double, dfs: Map[String, Long])

  /** Collect the [[Stats]] artifact in one aggregation job. */
  def stats(df: DataFrame, textCol: String, terms: Seq[String]): Stats = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df
      .select(graft.functions.SketchExpressions
        .query_tf(coalesce(col(textCol), lit("")), terms).as("__qtf"))
    val row = base.agg(
      count(lit(1)).as("__N"),
      sum(element_at(col("__qtf"), terms.length + 1)).as("__DL") +:
        terms.indices.map { i =>
          sum(when(element_at(col("__qtf"), i + 1) > 0L, 1L)
            .otherwise(0L)).as(s"__df$i") }: _*)
      .first()
    val n = row.getLong(0)
    require(n > 0, "bm25 stats: empty corpus")
    Stats(n, row.getLong(1).toDouble / n.toDouble,
      terms.zipWithIndex.map { case (t, i) => t -> row.getLong(2 + i) }.toMap)
  }

  /** Stateless BM25 score of one document against frozen [[Stats]] —
    * the formula of [[score]] with the corpus statistics as literals
    * instead of a broadcast aggregate; tf/dl come off the one-pass
    * term_counts kernel, so the whole thing is a zero-shuffle codegen
    * projection usable per micro-batch (the streaming twin).
    */
  def scoreExpr(text: org.apache.spark.sql.Column, st: Stats,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.Column = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qtf = graft.functions.SketchExpressions
      .query_tf(coalesce(text, lit("")), terms)
    val dl = element_at(qtf, terms.length + 1).cast("double")
    round(terms.zipWithIndex.map { case (t, i) =>
      val tf = element_at(qtf, i + 1).cast("double")
      val dfq = st.dfs(t).toDouble
      val idf = math.log(1.0 + (st.n.toDouble - dfq + 0.5) / (dfq + 0.5))
      lit(idf) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(st.avgdl)))
    }.reduce(_ + _), 6)
  }

  def score(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // one-pass kernel: [tf_0..tf_{m-1}, dl] per document — no term_counts
    // array materialization, no per-term lambda probes (round-8 weak set)
    val base = df
      .select(col(idCol), graft.functions.SketchExpressions
        .query_tf(coalesce(col(textCol), lit("")), terms).as("__qtf"))
      .withColumn("dl", element_at(col("__qtf"), terms.length + 1))
    val withTf = terms.indices.foldLeft(base) { case (d, i) =>
      d.withColumn(s"__tf$i", element_at(col("__qtf"), i + 1))
    }
    val stats = broadcast(withTf.agg(
      count(lit(1)).as("__N"),
      sum(col("dl")).as("__DL") +: terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*))
    withTf.crossJoin(stats)
      .withColumn("__avgdl",
        col("__DL").cast("double") / col("__N").cast("double"))
      .withColumn("score", round(terms.indices.map { i =>
        val tf = col(s"__tf$i").cast("double")
        val dfq = col(s"__df$i").cast("double")
        val idf = log(lit(1.0) +
          (col("__N").cast("double") - dfq + 0.5) / (dfq + 0.5))
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("__avgdl")))
      }.reduce(_ + _), 6))
      .select(col(idCol), col("dl"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
