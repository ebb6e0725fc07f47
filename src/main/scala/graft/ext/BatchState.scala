package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch-id snapshot state for foreachBatch streaming operators — the
  * exactly-once pattern shared by the streaming dedup index, heavy-hitter
  * sketch, late-arrival audit, and maintained aggregates:
  *
  *  - each committed batch writes a COMPLETE state snapshot under
  *    `stateDir/batch=<id>` (parquet `_SUCCESS` gates visibility — a crash
  *    mid-write leaves an uncommitted dir that [[load]] ignores);
  *  - the PREVIOUS snapshot is retained (`keep = 2`), so a replayed batch
  *    (Structured Streaming re-runs the one uncommitted batch after
  *    recovery) can recompute against the state BELOW its id instead of
  *    its own already-absorbed data;
  *  - superseded snapshots are retired on each save.
  */
private[ext] object BatchState {
  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest COMMITTED snapshot with id < `maxBatchExclusive` (None = any):
    * (state, its batch id); (None, None) when no committed snapshot
    * qualifies. */
  def load(spark: SparkSession, stateDir: String,
           maxBatchExclusive: Option[Long] = None): (Option[DataFrame], Option[Long]) = {
    val f = fs(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!f.exists(root)) return (None, None)
    val done = f.listStatus(root).map(_.getPath).filter(p =>
      p.getName.startsWith("batch=") &&
        f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(p => p.getName.stripPrefix("batch=").toLong -> p)
      .filter { case (id, _) => maxBatchExclusive.forall(id < _) }
    if (done.isEmpty) (None, None)
    else {
      val (id, p) = done.maxBy(_._1)
      (Some(spark.read.parquet(p.toString)), Some(id))
    }
  }

  /** Commit `state` as the snapshot for `batchId`; retire all but the
    * `keep` newest snapshots. The caller materializes `state`
    * (localCheckpoint) BEFORE saving if it derives from a snapshot this
    * save may retire. */
  def save(state: DataFrame, stateDir: String, batchId: Long, keep: Int = 2): Unit = {
    val spark = state.sparkSession
    state.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = fs(spark, stateDir)
    val dirs = f.listStatus(new org.apache.hadoop.fs.Path(stateDir)).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
    val (committed, junk) = dirs.partition(p =>
      f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
    // crash garbage first: an uncommitted dir must never count toward (or
    // outlive) retention — a high-id junk dir would otherwise crowd out
    // the committed snapshot a replay needs
    junk.foreach(p => f.delete(p, true))
    committed.map(_.getName.stripPrefix("batch=").toLong).sorted.dropRight(keep)
      .foreach(i => f.delete(new org.apache.hadoop.fs.Path(stateDir, s"batch=$i"), true))
  }
}
