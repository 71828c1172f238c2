package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.PipelineOps

/** Continuously maintained materialized view: the streaming face of
  * [[graft.ops.PipelineOps.maintainAgg]].
  *
  * A CDC change stream (the `cdcChanges` schema: id, old_key/old_m/
  * old_present, new_key/new_m/new_present) is folded into a persisted
  * per-key (n_rows, sum_m) view one micro-batch at a time via
  * `foreachBatch` — each batch touches the key-cardinality view plus
  * the batch, never a corpus. The counting algebra is ASSOCIATIVE over
  * batches (deltas add), so micro-batch boundaries cannot change the
  * final view — pinned by the 1-batch == 3-batch == full-recompute
  * test in StreamingHistSpec.
  *
  * Exactly-once: `foreachBatch` replays a batch after failure, and
  * blindly re-applying retract/assert deltas would double-count. The
  * sink is therefore VERSIONED and idempotent — batch k writes
  * `viewDir/b<k>` (staged to a dot-temp dir, then atomically renamed),
  * and a replayed batch whose directory already exists is skipped.
  * This is the standard idempotent-foreachBatch-sink pattern; listing
  * and renames go through the Hadoop FileSystem API so the sink works
  * on HDFS/object stores with atomic dir rename, not just local disk
  * (object stores without atomic rename need their committer, as with
  * any Spark parquet sink).
  *
  * 100 TB shape: the stream is churn-sized by definition; each batch
  * costs O(view + batch). The view parquet is a few KB per thousand
  * keys — reading and rewriting it per micro-batch is noise next to
  * any real batch interval.
  */
object ViewMaintenance {

  private val InitDir = "b_init"
  private val BatchRe = "^b(\\d+)$".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest applied batch dir, or the initial view, or None. */
  private[streaming] def latestViewPath(spark: SparkSession,
      viewDir: String): Option[String] = {
    val f = fs(spark, viewDir)
    val root = new Path(viewDir)
    if (!f.exists(root)) return None
    val names = f.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    val batches = names.collect { case BatchRe(k) => k.toLong }
    if (batches.nonEmpty) Some(s"$viewDir/b${batches.max}")
    else if (names.contains(InitDir)) Some(s"$viewDir/$InitDir")
    else None
  }

  /** Read the current view (latest applied version). */
  def readView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(latestViewPath(spark, viewDir).getOrElse(
      sys.error(s"no view at $viewDir — call writeInitial first")))

  /** Persist the initial view (a [[PipelineOps.snapshotAgg]] result) if
    * absent; a restart with an existing view is a no-op, so the stream
    * resumes from where it left off. */
  def writeInitial(initial: DataFrame, viewDir: String): Unit = {
    val spark = initial.sparkSession
    if (latestViewPath(spark, viewDir).isEmpty)
      writeStaged(initial, viewDir, InitDir)
  }

  private def writeStaged(df: DataFrame, viewDir: String,
      name: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, viewDir)
    val tmp = new Path(s"$viewDir/.staging-$name")
    val dst = new Path(s"$viewDir/$name")
    if (f.exists(tmp)) f.delete(tmp, true) // leftover from a dead attempt
    // the tiny view coalesces to one file — atomic swap, trivial reads
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (!f.rename(tmp, dst))
      sys.error(s"view sink: rename $tmp -> $dst failed")
  }

  /** The foreachBatch body: fold one CDC micro-batch into the view.
    * Public so callers composing their own stream (extra sinks, metrics)
    * can reuse the exact idempotence/staging discipline. */
  def applyBatch(batch: DataFrame, batchId: Long, viewDir: String): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, viewDir)
    if (f.exists(new Path(s"$viewDir/b$batchId"))) return // replayed batch
    val cur = readView(spark, viewDir)
    writeStaged(PipelineOps.maintainAgg(cur, batch), viewDir, s"b$batchId")
  }

  /** Start maintaining: fold the streaming `changes` feed into the view
    * seeded from `initial`. Caller owns trigger/checkpoint options via
    * the returned query's lifecycle; `checkpointDir` is required for
    * restartable streams. */
  def start(changes: DataFrame, initial: DataFrame, viewDir: String,
      checkpointDir: String): StreamingQuery = {
    require(changes.isStreaming, "changes must be a streaming DataFrame")
    writeInitial(initial, viewDir)
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => applyBatch(b, id, viewDir))
      .start()
  }
}
