package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source + sink — the interchange
  * format of LLM training-data pipelines (every public corpus release
  * ships as .jsonl/.jsonl.gz shards).
  *
  * Spark-native on both sides: the sink is a `to_json` projection over a
  * distributed `text` write (splittable shards, no driver funnel), the
  * source is `spark.read.json` with an explicit schema — schema
  * inference is a second full pass over the data, which at 100 TB is a
  * scan you don't repeat, so production callers pass the schema.
  */
object Jsonl {

  /** Distributed JSONL sink: one JSON object per line, field order =
    * schema order, JSON escaping per Spark's `to_json`.
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** JSONL read with an explicit schema (single pass). Lines that fail
    * to parse surface in the standard `_corrupt_record` PERMISSIVE-mode
    * contract if the caller adds that field to the schema.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Schema-inferring JSONL read — costs an extra full pass; dev only. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
