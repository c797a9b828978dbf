package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler (dev only). */
object Prof {
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
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("warm: lineitem scan")(force(li.select($"l_returnflag")))
    val agg = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
    for (r <- 1 to 3) {
      t(s"run$r: agg only")(force(agg))
      t(s"run$r: agg+orderBy")(force(agg.orderBy("l_returnflag", "l_linestatus")))
      t(s"run$r: agg+coalesce1 sort")(force(
        agg.coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus")))
    }
    spark.stop()
  }
}
