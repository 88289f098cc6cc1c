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

  /** Every artifact kind the engine may build — the r13 budget
    * tripwire's registry (r12 verdict: the ladder grew ~20 artifacts in
    * one round with nothing gating the trend). Adding an artifact now
    * means adding its kind HERE — a deliberate, reviewable diff;
    * [[once]] throws on an unregistered kind and ArtifactBudgetSpec
    * pins the registry size the way InventorySpec pins the query
    * count. Kind names embed their load-bearing build tunables
    * (ADVICE r12: a kind keyed only on the source fingerprint would
    * silently serve a differently-tuned artifact to a future call
    * site with a different threshold — e.g. `minhash_pairs_d010` is
    * the maxDist=0.10 edge set).
    */
  val Kinds: Set[String] = Set(
    // NearDedup — signature tables, edge sets, graph artifacts
    "minhash_sig", "minhash_pairs_d010", "md5_sig", "md5_pairs_d050b3",
    "banded_edges", "cc_components", "rare_shingle_edges",
    "pagerank_ranks", "reach_sym_edges", "reach_closure",
    // Text — fingerprint indexes, trained model tables, label snapshots
    "winnow_fp", "winnow_fp_md5", "keyword_tags", "bigram_lm_scores",
    "pmi_collocations",
    // Analytics — per-entity ranking/score snapshots, basket tables
    "rfm_ranked3", "rfm_migration_ranked", "pareto_rev_ranked",
    "gains_user_ranked", "brand_baskets", "brand_pair_counts",
    // Aggregates — catalog statistics
    "equidepth_stats", "weighted_median_stats",
    // Pipeline — trained tokenizer table
    "bpe_merges_8")

  /** Test-only escape hatch: kinds prefixed `spec_` bypass the
    * registry so MaterializeSpec can exercise cache semantics with
    * throwaway builds without polluting the production registry.
    */
  private val TestKindPrefix = "spec_"

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

  /** Per-path build monitors (ADVICE r12: a single global lock
    * serialized DISTINCT artifact builds — ~25 declared queries route
    * through here, and one slow build would block every artifact
    * consumer in the JVM). Distinct paths build concurrently; two
    * threads racing on the SAME path still build exactly once.
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val written =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Wall-seconds of each artifact build THIS JVM actually ran, keyed
    * by kind — the budget tripwire's measurement half: Bench dumps it
    * to target/artifact_builds.json so a round can see exactly where
    * first_run_total goes and diff it against the previous round.
    */
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def buildTimes: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.toMap
  }

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
    require(Kinds.contains(kind) || kind.startsWith(TestKindPrefix),
      s"unregistered artifact kind '$kind' — add it to Materialize.Kinds " +
        "(the artifact-budget tripwire; see ArtifactBudgetSpec)")
    val fp = tables.map(DataFingerprint.ofTable(sfDir, _)).mkString("_")
    val path = root.resolve(s"${kind}_$fp").toString
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      if (!written.contains(path)) {
        val t0 = System.nanoTime()
        // repartition(4), not coalesce(4) (ADVICE r12): coalesce merges
        // the build's FINAL stage into 4 tasks, computing the heavy
        // projections at 4-way parallelism on a 32-core box; the
        // repartition keeps the upstream stage at natural parallelism
        // and shuffles only the (small, per-corpus) artifact rows into
        // 4 output files.
        build.repartition(4).write.mode("overwrite").parquet(path)
        buildSecs.merge(kind, (System.nanoTime() - t0) / 1e9,
          (a, b) => a + b)
        written.add(path)
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
