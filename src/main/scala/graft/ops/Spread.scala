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
  // memoized partition counts keyed by canonicalized logical plan: each
  // spread() call site would otherwise build the full RDD conversion for
  // its input just to read getNumPartitions — plan-only work, but repeated
  // per invocation (operators like jaccardNearDupStats construct the same
  // scan many times per query). Bounded; cleared wholesale on overflow.
  private val partCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), Integer]()

  /** Widen `df` to `defaultParallelism` partitions only if it has fewer —
    * a no-op (no Exchange in the plan, `df` returned as-is) for well-split
    * inputs. The guard itself is kept cheap: a file-count check first
    * (file-sourced inputs with >= target files always yield >= target scan
    * splits — no RDD conversion needed to prove the no-op), then a
    * memoized getNumPartitions probe for the narrow/unknown cases. */
  /** True when the optimized plan is a plain scan pipeline (relation +
    * narrow projections/filters only) — the only shape where "file count
    * >= target" proves partition count >= target. A join/aggregate/
    * repartition output still reports its LEAF scans' files, while its
    * actual partitioning is shuffle-derived (possibly narrower than the
    * cluster), so those plans must fall through to the real probe. */
  private def scanShaped(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case _: LeafNode => true
      case p: Project => scanShaped(p.child)
      case f: Filter => scanShaped(f.child)
      case s: SubqueryAlias => scanShaped(s.child)
      case _ => false
    }
  }

  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = df.inputFiles.length
    // file-count heuristic: each file contributes at least one split, so
    // files >= target proves a SCAN-shaped input is already wide enough
    // (the listing is driver-cached by the shared FileIndex). Restricted
    // to scan-shaped plans: a post-shuffle plan still reports its leaf
    // files but its partitioning follows the shuffle, not the files.
    val opt = df.queryExecution.optimizedPlan
    if (nFiles >= target && scanShaped(opt)) return df
    if (partCache.size > 256) partCache.clear()
    // file count rides in the key: the same path re-read after an
    // incremental batch lands more files must not hit a stale count
    val key = (df.queryExecution.logical.canonicalized, nFiles)
    val p: Int = partCache.computeIfAbsent(key,
      // getNumPartitions plans (does not execute) the query: for the
      // parquet scans this guards, that is just split enumeration
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (p < target) df.repartition(target) else df
  }
}
