package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Scratch per-query profiler: times one query N times after warmup and
  * reports total shuffle bytes written per run.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleWrite = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val fn = graft.SparkEntry.queries(name)
    force(fn(spark, "/root/testdata/sf0.001"))
    for (i <- 1 to 3) {
      shuffleWrite.set(0)
      val t0 = System.nanoTime()
      force(fn(spark, sfDir))
      Thread.sleep(300) // let the listener bus drain
      println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, " +
        f"shuffle write ${shuffleWrite.get() / 1024.0 / 1024.0}%.2f MiB")
    }
    spark.stop()
  }
}
