package graft.ext

/** The specs' independent JVM-side recomputation of [[Hygiene.hashU64]] /
  * [[Hygiene.hashU]] — one definition shared by every sampling/ranking
  * test (the same no-drift rationale as the engine-side helper; being a
  * SEPARATE implementation is the point: it cross-checks the Spark
  * expression, so it must not be derived from it). */
object TestHash {
  def u64(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  def u(id: Long): Double = u64(id).toDouble / 4294967296.0
}
