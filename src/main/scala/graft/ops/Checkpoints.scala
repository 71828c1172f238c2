package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage barriers for iterative DataFrame algorithms (PageRank rounds,
  * connected-components star steps, BPE merge rounds, BFS frontiers):
  * without a barrier every round re-plans the whole history and the
  * lineage tree grows exponentially.
  *
  * Two modes, selected by the `spark.graft.checkpointDir` session conf:
  *
  *  - UNSET (default, right for local mode): `localCheckpoint` — blocks
  *    live on executors, zero filesystem traffic. The trade: local
  *    checkpoint TRUNCATES lineage, so on a real cluster losing one
  *    executor mid-iteration makes the job unrecoverable (the blocks are
  *    neither replicated nor recomputable). Fine single-JVM; an
  *    availability bug at 100-node × multi-hour scale.
  *  - SET to a reliable directory (HDFS/object store): `checkpoint()` —
  *    rounds persist to the shared filesystem and survive any executor
  *    loss; the extra per-round write is the standard price of
  *    fault-tolerant iteration. The FIRST barrier installs the directory
  *    on the SparkContext (SparkContext keeps one checkpoint dir; set
  *    the conf before the first iterative op).
  *
  * Both modes return a Dataset with identical ROWS — mode changes only
  * where the barrier materializes (asserted by GraphTextSpec's
  * both-modes test). `eager = false` keeps the lazy-chain property the
  * walk/BFS loops rely on (branching factor 1 ⇒ one job at the end).
  */
object Checkpoints {
  val DirConf = "spark.graft.checkpointDir"

  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    def lineageBarrier(eager: Boolean = true): Dataset[T] = {
      val spark = ds.sparkSession
      spark.conf.getOption(DirConf) match {
        case Some(dir) if dir.nonEmpty =>
          val sc = spark.sparkContext
          // SparkContext appends a UUID subdir, so compare the parent;
          // first directory wins for the context's lifetime
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          ds.checkpoint(eager)
        case _ => ds.localCheckpoint(eager)
      }
    }
  }
}
