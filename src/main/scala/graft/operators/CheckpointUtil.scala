package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Eager release of localCheckpoint block storage.
  *
  * `Dataset.unpersist` only talks to the cache manager, so the blocks
  * behind a localCheckpoint'ed frame live until GC + ContextCleaner
  * get around to them — which, in an iterative operator that retires
  * one corpus-sized checkpoint per round, means dead rounds stack up
  * in the storage pool and evict/pressure it exactly when downstream
  * stages need execution memory (measured on [[SuffixRank]]: freeing
  * retired rounds cut the 22.6M-position ranking 42.5s → 26.3s).
  *
  * Safe to call once every consumer of the frame has either finished
  * or been re-rooted onto a SUCCESSOR checkpoint — the walk only
  * unpersists the checkpoint RDDs reachable from this frame's plan.
  */
object CheckpointUtil {

  def free(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** [[free]] for several frames. */
  def free(dfs: Seq[DataFrame]): Unit = dfs.foreach(free(_))
}
