package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo best-of-N timer for named SparkEntry queries (dev only): the
  * adjudicator's measurement loop, runnable standalone so a suspect
  * query can be re-timed without the 187-query suite around it.
  * `sbt "runMain graft.tools.SoloQ q63_ann_pq [q…]"`.
  */
object SoloQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SOLO_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val names = if (args.nonEmpty) args.toSeq else Seq("q63_ann_pq")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      force(fn(spark, "/root/testdata/sf0.001")) // JIT/codegen warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[solo] $name best=${ts.min}%.3f all=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
