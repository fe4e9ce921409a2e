package graft.operators

import org.apache.spark.sql.DataFrame

/** Spread an under-partitioned input across the cluster before per-row
  * heavy compute (shingling, tokenizing, n-gram hashing, minhashing).
  * A small parquet file plans as ONE input split, which serializes the
  * whole map stage regardless of cluster size; at real scale inputs
  * already have >= defaultParallelism partitions and this is a no-op
  * (no shuffle). The decision reads logical-plan statistics (file sizes
  * for scans) — never `.rdd`, which under AQE eagerly executes query
  * stages.
  *
  * BATCH entry points only: a streaming micro-batch frame reports its
  * source's statistics, so a stats-driven spread inside per-batch code
  * re-shuffles raw text every trigger (measured 2x on the
  * stream_doc_near_dup gate when tried). Never call this from code
  * reachable from foreachBatch processing.
  */
private[graft] object Spread {
  def small(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val isSmall = df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(target.toLong) * 8L * 1024 * 1024
    if (isSmall) df.repartition(target) else df
  }
}
