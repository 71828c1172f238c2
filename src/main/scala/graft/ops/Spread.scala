package graft.ops

import org.apache.spark.sql.DataFrame

/** Conditional input spreading for per-row fan-out pipelines (shingling,
  * embedding scoring, token explosion).
  *
  * A single-split input (one small parquet file — the test-scale shape)
  * pins the whole downstream explode/hash pipeline to one task, so those
  * pipelines widen it to `defaultParallelism` first. But the widening must
  * be CONDITIONAL: on a production input (100 TB ≈ 800k file splits) an
  * unconditional `repartition(defaultParallelism)` would (1) force a full
  * shuffle of raw corpus text — violating the dedup module's "documents
  * never shuffle" invariant — and (2) COLLAPSE 800k scan tasks down to the
  * core count, producing multi-GB partitions that OOM executors. A
  * many-split input is therefore passed through untouched (its scan-task
  * sizing is governed by `spark.sql.files.maxPartitionBytes`, the right
  * knob at scale); only inputs narrower than the cluster get the one-off
  * shuffle, whose cost is negligible exactly because such inputs are small.
  */
object Spread {
  /** Widen `df` to `defaultParallelism` partitions only if it has fewer —
    * a no-op (no Exchange in the plan) for well-split inputs. */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans (does not execute) the query: for the parquet
    // scans this guards, that is just split enumeration
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
