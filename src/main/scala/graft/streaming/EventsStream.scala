package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming pipeline over the events table (SURVEY.md §2.1
  * I4, §3.4): file source → event-time derivation → watermark → the SAME
  * tumbling-window aggregation Temporal.streamTumble runs in batch.
  * Batch is the backfill path, streaming is the live path, one logical
  * plan definition — the core Spark-native streaming design.
  *
  * Scale notes: the file source lists incrementally (no re-scan of seen
  * files); state is per (window, event_type) in the executor-local state
  * stores, bounded by the watermark which evicts windows older than
  * max(event time) - delay. Late rows beyond the watermark are dropped
  * before the aggregation (pinned in StreamingSpec via the
  * numRowsDroppedByWatermark metric).
  */
object EventsStream {

  /** Events schema RESOLVED from the files already in `inputDir`
    * (streaming sources require an explicit schema; a one-off batch read
    * of the directory at stream-definition time makes the source
    * schema-adaptive — the corpus has shipped `ts` both as INT64 nanos
    * and as timestamp[us], see Tables.tsUtc). Later files appended to a
    * running stream share the resolved schema by construction.
    */
  def resolvedSchema(spark: SparkSession, inputDir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(inputDir).schema
  }

  /** `ts_utc` column for the schema resolved from `inputDir`. */
  private[streaming] def tsUtcFor(schema: StructType) =
    graft.sources.Tables.tsUtc(schema("ts").dataType)

  /** Streaming exact-dedup of re-synced events: the same payload
    * arriving again (offline-sync retries — the ETL reference's
    * re-delivery case) is dropped by event_id, with state bounded by
    * the watermark: `dropDuplicatesWithinWatermark` keeps an id only
    * until the watermark passes its event time + delay, so dedup state
    * does NOT grow with the stream, unlike plain dropDuplicates.
    * Pinned in StreamingSpec: intra-watermark duplicates dropped across
    * micro-batches, state rows evicted as the watermark advances.
    */
  def dedupedEvents(spark: SparkSession, inputDir: String,
      watermark: String = "10 minutes"): DataFrame = {
    val schema = resolvedSchema(spark, inputDir)
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .withColumn("ts_utc", tsUtcFor(schema))
      .withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts_utc"), col("user_id"),
        col("event_type"), col("value"))
  }

  /** Stream-stream interval join: purchases joined to the same user's
    * signups within the preceding 7 days — the streaming analog of the
    * batch as-of join (C8). Both sides carry watermarks and the join
    * condition bounds signup time to [purchase - 7 days, purchase], so
    * each side's state store evicts rows the other side can no longer
    * match (the time-range bound is what makes unbounded two-stream
    * state finite). Inner join ⇒ rows emit as soon as both sides have
    * arrived; equality with the batch formulation pinned in
    * StreamingSpec.
    */
  /** LEFT OUTER variant of [[purchaseAttribution]]: purchases with NO
    * signup in the window emit null-padded — the "unattributed
    * purchase" feed. Outer results cannot emit eagerly: a left row is
    * held in state until the watermark passes its purchase time (only
    * then can no future signup with s_ts <= p_ts arrive), so
    * null-padded rows surface one watermark advance later than inner
    * matches — the bounded-state/bounded-delay trade stream-stream
    * outer joins make. Equality with the batch left join on the
    * watermark-closed prefix is pinned in StreamingSpec.
    */
  def purchaseAttributionLeft(spark: SparkSession, inputDir: String,
      watermark: String = "10 minutes"): DataFrame =
    purchaseAttribution(spark, inputDir, watermark, "leftOuter")

  def purchaseAttribution(spark: SparkSession, inputDir: String,
      watermark: String = "10 minutes", joinType: String = "inner"): DataFrame = {
    val schema = resolvedSchema(spark, inputDir)
    def side(tpe: String, prefix: String): DataFrame =
      spark.readStream
        .schema(schema)
        .parquet(inputDir)
        .withColumn("ts_utc", tsUtcFor(schema))
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          col("ts_utc").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", watermark)
    side("purchase", "p").join(side("signup", "s"),
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"),
      joinType)
      .select(col("p_id").as("purchase_id"), col("p_user").as("user_id"),
        col("p_ts").as("purchase_ts"), col("s_ts").as("signup_ts"))
  }

  /** Micro-batch JDBC upsert — the streaming form of the ETL "load into
    * reporting tables over JDBC" path. Used as
    * `writeStream.outputMode("update").foreachBatch(upsertBatchToJdbc(url, table))`
    * over a windowed aggregation: update mode emits each window's NEW
    * total whenever a batch changes it, and the keyed upsert
    * (update-then-insert inside one transaction per partition) makes
    * replays idempotent — re-writing a window with the same total is a
    * no-op, the standard exactly-once recipe for non-transactional
    * stores. Connections open once per PARTITION (executor-side, like
    * any JDBC writer), never per row; the tiny aggregated batch is
    * coalesced so a 5-row delta doesn't open 32 connections.
    *
    * CAVEAT — `coalesce(1)` is a SINGLE-WRITER bound: every micro-batch
    * serializes through one task/one connection. That is the right
    * trade for this demo sink (an embedded Derby table fed a handful of
    * changed windows per batch), but if the windowed aggregate's delta
    * ever grew large, drop the coalesce and let each partition run its
    * own transaction — the per-partition-transaction pattern the batch
    * JDBC writer already uses; the upsert is keyed, so partition-level
    * retries stay idempotent.
    *
    * Expects `batch` columns (window_start timestamp, event_type
    * string, n_events long) matching the target table's key (ws, et).
    */
  def upsertBatchToJdbc(url: String, table: String)(
      batch: DataFrame, batchId: Long): Unit = {
    batch.coalesce(1).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val up = conn.prepareStatement(
          s"UPDATE $table SET n_events = ? WHERE window_start = ? AND event_type = ?")
        val ins = conn.prepareStatement(
          s"INSERT INTO $table VALUES (?, ?, ?)")
        rows.foreach { r =>
          val ws = r.getTimestamp(0)
          val et = r.getString(1)
          val n = r.getLong(2)
          up.setLong(1, n); up.setTimestamp(2, ws); up.setString(3, et)
          if (up.executeUpdate() == 0) {
            ins.setTimestamp(1, ws); ins.setString(2, et); ins.setLong(3, n)
            ins.executeUpdate()
          }
        }
        conn.commit()
      } finally conn.close()
    }
  }

  /** Streaming 1-hour tumbling counts per event type.
    *
    * @param watermark late-data tolerance (e.g. Some("10 minutes")); None
    *   disables the watermark (needed for complete-mode equality tests —
    *   complete mode retains all state anyway).
    */
  def tumblingCounts(spark: SparkSession, inputDir: String,
      watermark: Option[String] = Some("10 minutes")): DataFrame = {
    val schema = resolvedSchema(spark, inputDir)
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .withColumn("ts_utc", tsUtcFor(schema))
    val marked = watermark.fold(src)(w => src.withWatermark("ts_utc", w))
    marked
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
  }
}
