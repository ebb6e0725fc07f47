package graft.ext

import java.nio.file.{Files, Path, Paths}

/** Tiny filesystem helpers for the gate queries that round-trip state
  * through local temp parquet (IVF centroids, the streaming-dedup index).
  * Each invocation gets its OWN `Files.createTempDirectory` — a fixed
  * shared path keyed by `dir.hashCode` races overwrite-against-read when
  * two sessions hit the same corpus dir (or two dirs collide) — and the
  * caller deletes it as soon as the state is materialized, so repeated
  * Verify/Bench runs don't accumulate tmp dirs. */
private[ext] object TmpIo {

  /** A fresh private temp directory; caller owns cleanup. */
  def freshDir(prefix: String): Path = Files.createTempDirectory(prefix)

  /** Recursive delete; ignores races with concurrent deletion. */
  def deleteRecursively(root: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(root)) {
      val all = Files.walk(root).iterator().asScala.toVector
      all.reverseIterator.foreach(p => Files.deleteIfExists(p))
    }
  }

  def deleteRecursively(root: String): Unit = deleteRecursively(Paths.get(root))
}
