package graft

import org.apache.spark.sql.SparkSession

/** Library-owned session defaults, applied by every graft entry point
  * (Bench / Verify / Smoke / Examples / Explain / Profile) so the
  * configuration that is measured is the configuration that ships.
  * Consumers embedding graft in their own session should call
  * [[defaults]] on their builder too.
  */
object GraftSession {
  /** Session confs the library depends on for performance.
    *
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`:
    * let AQE size CACHED plans' partitions from bytes (guide §2.2 —
    * coalesce small partitions adaptively). Off, a persisted relation
    * materializes at the static shuffle.partitions count, so every pass
    * of an iterative op (GD gradient rounds, k-means steps) pays a full
    * wave of near-empty tasks at local scale; on, partition count
    * follows data size at ANY scale — at 100 TB the advisory size keeps
    * partitions big-but-bounded, locally tiny caches coalesce to a few
    * tasks. Scale-adaptive, not a local[32] tune.
    */
  val confs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true"
  )

  /** Apply graft's session defaults to a builder. */
  def defaults(b: SparkSession.Builder): SparkSession.Builder =
    confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
