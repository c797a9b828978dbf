package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile for the q151 reshape (dev only): three events scans vs
  * one distinct checkpoint feeding all consumers.
  */
object ProfHll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    import graft.queries.QueryDef.BoundedSort
    def evs = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"user_id",
        floor(unix_timestamp($"ts") / 604800.0).cast("long").as("wk"))
    def legacy = {
      val ev = evs
      val weekly = graft.ops.Hll.distinctPerGroup(ev, $"wk", $"user_id", "week")
        .select($"week", $"n_distinct", $"hll_est")
      val regs = graft.ops.Hll.registers(ev, $"wk", $"user_id", "week")
      val merged = regs.groupBy($"hll_bucket")
        .agg(max($"hll_rho").as("hll_rho")).withColumn("week", lit(-1L))
      val totalEst = graft.ops.Hll.estimateFromRegisters(merged, "week")
      val totalExact = ev.select($"user_id").distinct()
        .agg(count(lit(1)).as("n_distinct")).withColumn("week", lit(-1L))
      weekly.unionByName(totalExact.join(totalEst, Seq("week"))
        .select($"week", $"n_distinct", $"hll_est")).sortBounded($"week")
    }
    val q = graft.SparkEntry.queries("q151_hll_rollup")
    force(q(spark, "/root/testdata/sf0.001"))
    for (r <- 1 to 4) {
      t(s"run$r: legacy 3-scan")(force(legacy))
      t(s"run$r: shipped 1-scan")(force(q(spark, sfDir)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
