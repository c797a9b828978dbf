package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Kernel-stage parallelism guard (r17 optimization round).
  *
  * Parquet scans parallelize at row-group granularity, so a small file
  * written as ONE row group (or any unsplittable input — the guide's
  * §2.5 input-skew case) plans a single scan partition, and every
  * expensive kernel fused into that stage (container decode, synthetic
  * payload generation, tokenize+hash sweeps) serializes onto one core
  * however many the session has.
  *
  * Heavy per-row operators call [[Par.spread]] on their input: a no-op
  * whenever the scan already supplies >= cores partitions (every
  * production-scale dataset — nothing here is tuned to local mode), and
  * a hash repartition on the caller's key column otherwise.
  * Hash-partitioned, not round-robin: keyed exchanges skip the
  * sortBeforeRepartition local sort (SPARK-23207) and stay
  * deterministic under task retry (SPARK-38388).
  *
  * Measured motivation (sf0.1, 32 cores, same-window A/B): a BLANKET
  * repartition in the table reader was a net wash — kernel-heavy
  * queries gained 0.5-1.8 s each while cheap row-op queries lost
  * 0.2-0.7 s each to the extra always-32-task stage — so the spread is
  * owned by the operators that know their per-row cost, not by the
  * reader.
  */
object Par {

  /** `df` repartitioned to the session's core count by `key` iff the
    * current plan supplies fewer partitions; unchanged otherwise.
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    // a persisted input is read from block storage by every consumer;
    // re-shuffling it per consumer would pay one exchange EACH instead
    // of the cache hit (measured +0.3 s on the q80 tokenizer chain)
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, key)
    else df
  }
}
