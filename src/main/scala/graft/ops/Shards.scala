package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard assignment + manifest — the output stage of a
  * curation pipeline (the declared q93 surface).
  *
  * Assignment is a 32-bit md5 slice of the id (engine-portable: any
  * system that can md5 a decimal string reproduces the same shards —
  * no engine-private hash in the contract). The manifest carries what
  * a trainer consumes per shard: doc/token/char totals, the id range,
  * and an ORDER-INDEPENDENT content signature (bit_xor of a 60-bit md5
  * slice of each document's text), so two engines — or two runs with
  * different row orders — certify identical shard content without
  * sorting anything.
  *
  * Scale shape: one projection + ONE map-side-combinable aggregation.
  * With thousands of shards the md5 key distributes uniformly by
  * construction; every aggregate (count/min/max/sum/bit_xor) combines
  * associatively, so partials are one row per (task, shard) and the
  * shuffle carries manifests, not documents.
  */
object Shards {

  def manifest(df: DataFrame, textCol: String, idCol: String,
      nShards: Int = 16): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    df.select(
        (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") % nShards).as("shard"),
        col(idCol),
        regexp_count(col(textCol), lit("\\S+"))
          .cast("long").as("__tok"),
        length(col(textCol)).cast("long").as("__ch"),
        conv(substring(md5(col(textCol)), 1, 15), 16, 10)
          .cast("long").as("__sig"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as(s"min_$idCol"),
        max(col(idCol)).as(s"max_$idCol"),
        sum(col("__tok")).as("n_tokens"),
        sum(col("__ch")).as("n_chars"),
        expr("bit_xor(__sig)").as("content_sig"))
      .orderBy(col("shard"))
  }

  /** Compaction plan for the small-files problem: merge consecutive
    * shards into output groups of ≈ `targetBytes` by next-fit over the
    * shard order — output group = ⌊(bytes before this shard)/target⌋,
    * the q52 packing recipe at shard granularity. Groups are contiguous
    * shard ranges by construction (a manifest merge never interleaves),
    * each holds < target + its largest member, and the whole plan costs
    * ONE combinable per-shard aggregation plus the two-phase distributed
    * prefix sum — no task ever sees more than one prefix bucket of
    * shards, however many shards the delivery has.
    *
    * @param bytesCol per-row size column (chars as the engine-portable
    *                 proxy — both engines measure identically).
    */
  def compactionPlan(perShard: DataFrame, shardCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1: $targetBytes")
    Packing.withRunningBefore(perShard, shardCol, bytesCol, "__before")
      .withColumn("out_group", expr(s"__before DIV $targetBytes"))
      .groupBy(col("out_group"))
      .agg(count(lit(1)).as("n_shards"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(shardCol)).as("first_shard"),
        max(col(shardCol)).as("last_shard"))
  }
}
