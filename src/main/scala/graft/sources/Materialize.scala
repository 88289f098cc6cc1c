package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize a derived corpus artifact ONCE per (JVM, source-table
  * content): signature tables, similarity edge sets, basket tables —
  * the per-snapshot artifacts a production pipeline WRITES in a batch
  * job and every downstream query joins from, instead of re-running
  * the derivation lineage per query per run.
  *
  * POLICY (what qualifies as an artifact — r12): a table a production
  * pipeline PERSISTS once per corpus snapshot — an index (minhash/
  * winnow fingerprints, LSH buckets), a trained model table (BPE
  * merges, LM counts, PMI collocations), a per-entity score/label
  * snapshot (quality scores, keyword tags, authority ranks, RFM
  * ranking snapshots), an edge set or its components, or a catalog
  * statistic (equi-depth histogram). NEVER an ad-hoc per-query
  * intermediate: queries must still do their own relational work over
  * the artifacts, and every artifact-backed declared query stays
  * oracle-gated end-to-end (the gate validates artifact build + read).
  *
  * Path = per-process temp root + content fingerprint of the SOURCE
  * table (file listing + sizes + mtimes): a corpus rewrite within one
  * JVM yields a new path (stale artifacts can't be served), and other
  * processes can't collide on or poison a predictable shared /tmp
  * location (the root embeds a random suffix and is owned by this
  * process).
  */
object Materialize {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_artifacts_")
    // deleteOnExit silently skips non-empty directories — a recursive
    // shutdown hook actually bounds /tmp growth across sessions
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  private val written = scala.collection.mutable.Set.empty[String]

  /** Resolved-plan cache for artifact re-reads, mirroring
    * Tables.catalog: `spark.read.parquet` lists the artifact dir and
    * reads footers on EVERY call, and artifact consumers (minhash
    * edges, components, BPE merges, baskets…) re-read per query per
    * run. The artifact path already embeds the source content
    * fingerprint, so (session, path) alone is a staleness-safe key —
    * a corpus rewrite lands on a new path and misses this cache.
    */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Read-through cache: builds + writes `kind` derived from the given
    * source tables under `sfDir` on first use, then serves the parquet
    * re-read. EVERY table the build reads must be listed — the cache
    * key is the combined content fingerprint, and omitting one source
    * would serve a stale artifact after that table alone regenerates.
    */
  def once(spark: SparkSession, sfDir: String, tables: Seq[String],
      kind: String)(build: => DataFrame): DataFrame = {
    val fp = tables.map(DataFingerprint.ofTable(sfDir, _)).mkString("_")
    val path = root.resolve(s"${kind}_$fp").toString
    Materialize.synchronized {
      if (!written.contains(path)) {
        build.coalesce(4).write.mode("overwrite").parquet(path)
        written += path
      }
    }
    // Evict entries of stopped sessions on insert (mirrors
    // Tables.table): a cached DataFrame strongly references its
    // SparkSession, so without this a many-session run (test suites)
    // would pin every stopped session in memory and defeat the
    // sessionIds WeakHashMap reclamation.
    resolved.entrySet().removeIf(
      _.getValue.sparkSession.sparkContext.isStopped)
    resolved.computeIfAbsent((Tables.sessionId(spark), path),
      _ => spark.read.parquet(path))
  }
}
