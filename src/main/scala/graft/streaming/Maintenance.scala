package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared upkeep for the streaming store sinks. */
private[streaming] object Maintenance {

  /** Drop all but the newest `keep` per-batch `b<N>` subdirs under
    * `dir` (health snapshots, admission-stats rows — the tiny per-batch
    * audit artifacts that otherwise accumulate unboundedly).
    */
  def pruneBatchDirs(spark: SparkSession, dir: String, keep: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.matches("b\\d+"))
      .sortBy(_.getPath.getName.drop(1).toLong)
      .dropRight(math.max(keep, 0))
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Run one micro-batch body, then drop (blocking) every RDD block it
    * persisted — the localCheckpoint frames a batch admission creates
    * would otherwise outlive the batch until the next periodic GC, and
    * hundreds of batches' dead blocks pile against the next batch's
    * allocation storm (the GCLocker-OOM lesson; see CLAUDE.md). Blocking
    * so the drop cannot race the next batch. Scope caveat: this frees
    * blocks persisted DURING `f` session-wide, so it assumes one
    * foreachBatch body runs at a time per session — true for each
    * streaming query's sink (micro-batches are sequential), and graft's
    * stores are single-writer by contract.
    */
  def withBlockCleanup[T](spark: SparkSession)(f: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try f finally {
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = true))
    }
  }
}
