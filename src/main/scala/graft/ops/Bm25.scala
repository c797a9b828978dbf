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

  def score(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df
      .select(col(idCol), graft.functions.SketchExpressions
        .term_counts(coalesce(col(textCol), lit(""))).as("__tc"))
      .withColumn("dl",
        aggregate(col("__tc"), lit(0L), (a, e) => a + e.getField("tf")))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"__tf$i", coalesce(
        get(filter(col("__tc"), e => e.getField("term") === t), lit(0))
          .getField("tf"), lit(0L)))
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
