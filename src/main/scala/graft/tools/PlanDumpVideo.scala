package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: formatted plan of the videoNearDups SUBTREE (the final
  * q183 plan hides it behind the eager connected-components loop).
  */
object PlanDumpVideo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val fh = (1 to 2000).flatMap(i => (1 to 4).map(f =>
      (i.toLong, (f % 17).toLong, ((i % 41) * f).toLong)))
      .toDF("doc_id", "frame_hi", "frame_lo")
    graft.ops.Multimodal.videoNearDups(fh, "doc_id").explain("formatted")
    spark.stop()
  }
}
