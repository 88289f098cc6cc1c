package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned table loaders for the driver corpus
  * (`/root/testdata/sf*`; see FIXTURES.md).
  *
  * All tables are single parquet files named `<table>.parquet` under the
  * scale-factor dir. Every loader returns the raw columns; only `events`
  * needs repair (nanosecond timestamps, FIXTURES.md "THE ns-timestamp
  * trap"): Spark 4.x refuses INT64(TIMESTAMP(NANOS)) parquet unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, after which `ts` arrives
  * as LongType nanos and we derive `ts_utc` (microsecond truncation —
  * verified identical to DuckDB's native ns→µs read).
  *
  * Scale notes: these are plain `spark.read.parquet` scans — at cluster
  * scale the same call reads a directory of many files with partition
  * pruning / predicate pushdown intact. Nothing here materializes data.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts_utc: TimestampType` (µs, UTC) derived from the raw
    * nanosecond INT64 `ts`. Keeps the raw `ts` long column too.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Normally set once at session init (Verify/Bench builders); repeated
    // here idempotently so ad-hoc sessions (tests, spark-shell) work too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Integer DIV, not `/`: long/int division in Spark goes through double,
    // which rounds the µs value for timestamps beyond 2^52 ns and diverges
    // from DuckDB's exact ns→µs truncation by ±1 µs.
    table(spark, sfDir, "events")
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
  }
}
