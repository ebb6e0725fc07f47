package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Snapshot]]: the atomic-publish contract — a reader can never observe
  * a half-written table, old versions survive a publish for in-flight
  * readers, and vacuum retires only superseded versions. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.ProdSession.spark
  import spark.implicits._

  private def mk(n: Int) = (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "v")

  test("publish is visible only after the pointer swap; versions increment") {
    val root = java.nio.file.Files.createTempDirectory("snapspec").toString
    assert(Snapshot.currentVersion(spark, root).isEmpty)
    assert(Snapshot.publish(mk(3), root) == 1L)
    assert(Snapshot.publish(mk(5), root) == 2L)
    assert(Snapshot.currentVersion(spark, root).contains(2L))
    assert(Snapshot.readCurrent(spark, root).count() == 5)
    // a CRASHED publish = a version dir with no pointer swap: write the
    // data dir by hand and verify readers still see version 2
    mk(9).write.parquet(s"$root/v=3")
    assert(Snapshot.currentVersion(spark, root).contains(2L))
    assert(Snapshot.readCurrent(spark, root).count() == 5,
      "a partial publish must be invisible")
  }

  test("an in-flight reader of version n survives the publish of n+1") {
    val root = java.nio.file.Files.createTempDirectory("snapspec2").toString
    Snapshot.publish(mk(4), root)
    val reader = Snapshot.readCurrent(spark, root) // lazy plan over v=1
    Snapshot.publish(mk(8), root)
    // the old files were never mutated: the stale plan still evaluates
    assert(reader.count() == 4)
    assert(Snapshot.readCurrent(spark, root).count() == 8)
  }

  test("a claimed-but-unpublished version is skipped, never clobbered") {
    val root = java.nio.file.Files.createTempDirectory("snapspec4").toString
    Snapshot.publish(mk(2), root) // v=1, current
    mk(7).write.parquet(s"$root/v=2") // a crashed publisher's claim
    val v = Snapshot.publish(mk(5), root)
    assert(v == 3L, "next version must skip the claimed number")
    assert(spark.read.parquet(s"$root/v=2").count() == 7,
      "a concurrent/crashed publisher's data must never be overwritten")
    assert(Snapshot.readCurrent(spark, root).count() == 5)
  }

  test("vacuum retires superseded versions, never the current one") {
    val root = java.nio.file.Files.createTempDirectory("snapspec3").toString
    (1 to 4).foreach(i => Snapshot.publish(mk(i), root))
    Snapshot.vacuum(spark, root, keep = 2)
    val dirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("v=3", "v=4"), s"kept $dirs")
    assert(Snapshot.readCurrent(spark, root).count() == 4)
  }
}
