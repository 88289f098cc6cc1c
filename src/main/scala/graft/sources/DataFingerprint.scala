package graft.sources

/** Cheap content fingerprint of a table file or directory: md5 over the
  * sorted (path, size, mtime) listing — no data is read. Used as the
  * memo key for per-JVM derived artifacts (LSH bucket sizing, k-means
  * quantizers, minhash signature tables) so a rewrite of the underlying
  * data within one JVM lifetime invalidates the cache, where a
  * path-string key would silently serve stale results. At cluster scale
  * the same role is played by a catalog snapshot/version id; file
  * metadata is the standalone equivalent.
  */
object DataFingerprint {

  private def ls(f: java.io.File): Seq[String] =
    if (f.isDirectory)
      f.listFiles().sortBy(_.getName).toSeq.flatMap(ls)
    else Seq(s"${f.getPath}|${f.length}|${f.lastModified}")

  def of(path: String): String = {
    val listing = ls(new java.io.File(path)).mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Fingerprint of one named table under a scale-factor dir. */
  def ofTable(sfDir: String, name: String): String =
    of(s"$sfDir/$name.parquet")
}
