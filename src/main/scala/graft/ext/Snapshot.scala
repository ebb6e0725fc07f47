package graft.ext

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Versioned, atomically-published table snapshots — the minimal table
  * format every long-lived pipeline output needs (the discipline
  * Delta/Iceberg industrialize, reduced to its load-bearing core):
  *
  *  - each publish writes a COMPLETE new version directory
  *    (`root/v=<n>/` + a row-count manifest inside it), touching nothing
  *    a reader could be scanning;
  *  - the version becomes visible by ONE pointer swap (`root/_CURRENT`
  *    via write-temp-then-atomic-rename — `FileContext.rename(OVERWRITE)`
  *    is the metadata-atomic primitive on HDFS-class filesystems);
  *  - a crash anywhere before the swap leaves the previous version live
  *    and the partial directory invisible; readers NEVER see a
  *    half-written table;
  *  - old versions stay readable until [[vacuum]] retires them — readers
  *    holding version n survive a publish of n+1 (files are immutable).
  *
  * At 100 TB the point is not elegance, it's that "overwrite the output
  * directory" — the naive alternative — has a window where the table does
  * not exist, and any consumer scheduled in that window fails or, worse,
  * reads partial data. */
object Snapshot {
  private type Q = (SparkSession, String) => DataFrame

  private def fc(spark: SparkSession, root: String): FileContext =
    FileContext.getFileContext(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Highest published version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fc(spark, root)
    val p = new Path(root, "_CURRENT")
    if (!f.util.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        Some(s.toLong)
      } finally in.close()
    }
  }

  /** Publish `df` as the next version; returns it. Only the final pointer
    * rename makes the version visible.
    *
    * Concurrency contract: data is staged into a private temp directory
    * and the version number is CLAIMED by a rename WITHOUT overwrite — of
    * two publishers racing to the same next version, exactly one rename
    * succeeds and the loser throws `ConcurrentModificationException`
    * (loud), never silently clobbering the winner's data. The next
    * version is `max(pointer, existing v= dirs) + 1`, so a publisher that
    * crashed after claiming but before the pointer swap cannot wedge
    * future publishes. */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fc(spark, root)
    val claimed =
      if (!f.util.exists(new Path(root))) 0L
      else f.util.listStatus(new Path(root)).map(_.getPath.getName)
        .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
        .foldLeft(0L)(math.max)
    val v = math.max(currentVersion(spark, root).getOrElse(0L), claimed) + 1L
    val dir = s"$root/v=$v"
    val stage = s"$root/.stage-v=$v-${java.util.UUID.randomUUID}"
    df.write.mode("overwrite").parquet(stage)
    val n = spark.read.parquet(stage).count()
    // manifest inside the version dir (self-describing snapshot)
    val mf = f.create(new Path(stage, "_MANIFEST.json"),
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try mf.write(s"""{"version": $v, "rows": $n}""".getBytes("UTF-8"))
    finally mf.close()
    try f.rename(new Path(stage), new Path(dir)) // Rename.NONE: no overwrite
    catch {
      case e: java.io.IOException =>
        f.delete(new Path(stage), true)
        if (f.util.exists(new Path(dir)))
          throw new java.util.ConcurrentModificationException(
            s"snapshot version $v already claimed under $root " +
              s"(concurrent publish): ${e.getMessage}")
        else throw e
    }
    // write-temp-then-rename pointer swap: the ONLY visible mutation
    val tmp = new Path(root, s"_CURRENT.tmp.$v")
    val out = f.create(tmp, java.util.EnumSet.of(
      org.apache.hadoop.fs.CreateFlag.CREATE, org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    f.rename(tmp, new Path(root, "_CURRENT"), Options.Rename.OVERWRITE)
    v
  }

  /** The currently-published snapshot (throws if none). */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root"))
    readVersion(spark, root, v)
  }

  /** Time travel: any still-retained version by number. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(s"$root/v=$v")

  /** Retire versions older than the newest `keep` (never the current),
    * and reap `.stage-*` directories abandoned by a publisher that
    * crashed mid-write (staged data never renamed into a `v=` dir would
    * otherwise leak forever). A stage dir is only reclaimed once it is
    * older than `stageTtlMs` — a LIVE publisher's stage is at most
    * minutes old, so the day-scale default cannot race an in-flight
    * publish. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             stageTtlMs: Long = 24L * 3600 * 1000): Unit = {
    val f = fc(spark, root)
    val cur = currentVersion(spark, root).getOrElse(return)
    val st = f.util.listStatus(new Path(root))
    val dirs = st.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .map(p => p.getName.stripPrefix("v=").toLong).sorted
    dirs.dropRight(keep).filter(_ != cur)
      .foreach(v => f.delete(new Path(root, s"v=$v"), true))
    val cutoff = System.currentTimeMillis() - stageTtlMs
    st.filter(s => s.getPath.getName.startsWith(".stage-") &&
        s.getModificationTime < cutoff)
      .foreach(s => f.delete(s.getPath, true))
  }

  val queries: Map[String, Q] = Map(
    // full fidelity through the publish → pointer-swap → read path: two
    // publishes, the reader must see version 2 exactly
    "snapshot_roundtrip" -> ((s, dir) => {
      val root = TmpIo.freshDir("snap")
      val docs = SparkEntry.table(s, dir, "documents")
      try {
        publish(docs.limit(1), root.toString) // superseded version
        publish(docs, root.toString)
        // localCheckpoint materializes the read-back, so the temp table is
        // disposable immediately (the dedup_stream_batch cleanup posture)
        readCurrent(s, root.toString).localCheckpoint(true)
      } finally TmpIo.deleteRecursively(root)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "snapshot_roundtrip" -> "SELECT * FROM documents",
  )
}
