package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-ADAPTIVE table loaders for the driver corpus
  * (`/root/testdata/sf*`; see FIXTURES.md).
  *
  * All tables are single parquet files named `<table>.parquet` under the
  * scale-factor dir. Every loader returns the raw columns; only `events`
  * needs a derived event-time column. The corpus has shipped `ts` in TWO
  * physical forms across regenerations (FIXTURES.md "the ts schema
  * dispatch"):
  *   - INT64(TIMESTAMP(NANOS)) — pre-2026-08-13. Spark 4.x refuses it
  *     unless `spark.sql.legacy.parquet.nanosAsLong=true`, after which
  *     `ts` arrives as LongType nanos and `ts_utc` is the µs truncation
  *     (verified identical to DuckDB's ns→µs read).
  *   - plain `timestamp[us]` (isAdjustedToUTC=false) — since the
  *     2026-08-13 regeneration. Spark reads it as TIMESTAMP_NTZ; with the
  *     session TZ pinned to UTC the NTZ→TZ cast preserves the exact same
  *     microsecond instants DuckDB reads natively, so oracles need no
  *     change.
  * A production loader must dispatch on the RESOLVED schema, not pin one
  * era's physical type — hence [[tsUtc]] branches on `ts`'s DataType and
  * fails loudly on anything unrecognized.
  *
  * Scale notes: these are plain `spark.read.parquet` scans — at cluster
  * scale the same call reads a directory of many files with partition
  * pruning / predicate pushdown intact. Nothing here materializes data.
  */
object Tables {
  /** Resolved-plan catalog: `spark.read.parquet` lists the path and reads
    * the footer to infer the schema EVERY call; at ~2 dataframe builds per
    * query across a 284-query Verify/Bench session that is thousands of
    * redundant footer reads of the same nine files. A production catalog
    * resolves a table once and serves the analyzed plan from metadata —
    * this cache does that, keyed by (sessionUUID, path, data fingerprint)
    * so a corpus REGENERATION (observed mid-round; FIXTURES.md) or a new
    * session misses the cache and re-resolves instead of serving a stale
    * schema. The session key is a per-session UUID ([[sessionId]]) —
    * stable and unique for the session's life (an identity hash could
    * collide after a session is GC'd and serve a plan bound to a stopped
    * session). The
    * fingerprint covers the ACTUAL data files: for a Spark-written
    * DIRECTORY the max part-file mtime + total part size (an in-place
    * part rewrite may not touch the directory's own mtime), for a single
    * file its mtime + length. The cached value is the immutable analyzed
    * DataFrame; Spark DataFrames are thread-safe to share, and the map is
    * concurrent, so parallel query threads are fine. On insert, stale
    * entries for the same (session, path) with an older fingerprint and
    * entries bound to stopped sessions are dropped, so the map stays
    * bounded at 9 tables × 3 sf dirs × live sessions.
    */
  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long, Long), DataFrame]()

  /** Stable per-session identifier. `System.identityHashCode` can be
    * REUSED after a session is GC'd (a new session allocated at the same
    * address would hit the dead session's cache entries); a UUID held in
    * a WeakHashMap is unique for the session's life and its entry
    * disappears with the session.
    */
  private val sessionIds =
    new java.util.WeakHashMap[SparkSession, String]()
  private[sources] def sessionId(spark: SparkSession): String =
    sessionIds.synchronized {
      var id = sessionIds.get(spark)
      if (id == null) {
        id = java.util.UUID.randomUUID().toString
        sessionIds.put(spark, id)
      }
      id
    }

  /** (max data-file mtime, total data-file bytes) — see catalog doc.
    * Walks directories RECURSIVELY: a partitioned dataset keeps its
    * part files in subdirectories, and a top-level-only listing would
    * see zero files there and fall back to the directory's own
    * mtime/length — exactly the in-place-rewrite staleness this
    * fingerprint exists to prevent.
    */
  private def dataFingerprint(f: java.io.File): (Long, Long) =
    if (f.isDirectory) {
      // depth cap: a symlink cycle must degrade to a shallow listing,
      // not an infinite recursion (no legitimate dataset nests 32 deep)
      def walk(d: java.io.File, depth: Int): Array[java.io.File] =
        if (depth > 32) Array.empty
        else Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(!_.getName.startsWith("."))
          .flatMap(x => if (x.isDirectory) walk(x, depth + 1) else Array(x))
      val files = walk(f, 0)
      if (files.isEmpty) (f.lastModified(), f.length())
      else (files.map(_.lastModified()).max, files.map(_.length()).sum)
    } else (f.lastModified(), f.length())

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val (mtime, size) = dataFingerprint(new java.io.File(path))
    val key = (sessionId(spark), path, mtime, size)
    val hit = catalog.get(key)
    if (hit != null) hit
    else {
      val df = spark.read.parquet(path)
      // evict superseded fingerprints for this (session, path) and any
      // entry whose session has been stopped
      catalog.keySet.removeIf { k =>
        (k._1 == sessionId(spark) && k._2 == path && k != key) || {
          val v = catalog.get(k)
          v != null && v.sparkSession.sparkContext.isStopped
        }
      }
      catalog.putIfAbsent(key, df)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `ts_utc: TimestampType` (µs, UTC) derivation for the given resolved
    * type of the raw `ts` column. All downstream operators consume ONLY
    * `ts_utc`, so this one dispatch point absorbs corpus schema drift.
    */
  def tsUtc(dt: DataType): Column = dt match {
    // INT64 nanos (nanosAsLong): integer DIV, not `/` — long/int division
    // via double rounds µs beyond 2^52 ns and diverges from DuckDB's
    // exact truncation by ±1 µs.
    case LongType => timestamp_micros(expr("ts DIV 1000"))
    // timestamp[us] without UTC adjustment → Spark TIMESTAMP_NTZ; the
    // session TZ is UTC in every entry point, so the cast re-tags the
    // same wall-clock micros as an instant (bit-identical to DuckDB).
    case TimestampNTZType => col("ts").cast(TimestampType)
    case TimestampType => col("ts")
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other — expected INT64 ns " +
        "(LongType via nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP; " +
        "the corpus schema drifted again: extend Tables.tsUtc")
  }

  /** `events` with `ts_utc: TimestampType` (µs, UTC) derived from the raw
    * `ts` whatever its physical era (see [[tsUtc]]). Keeps raw `ts` too.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Needed only by the INT64-nanos era but harmless otherwise; set
    // idempotently so ad-hoc sessions (tests, spark-shell) work on either
    // corpus without special session setup.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.withColumn("ts_utc", tsUtc(raw.schema("ts").dataType))
  }
}
