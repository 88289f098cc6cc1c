package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations (SURVEY/task "salting for skew").
  *
  * A hot grouping key sends all its rows to one reducer; salting splits
  * each key into `buckets` sub-keys, partially aggregates per (key,
  * salt) — spreading the hot key over `buckets` tasks — then merges the
  * tiny per-salt partials in a second shuffle of at most
  * |keys| × buckets rows. Correct for any associative+commutative
  * aggregate; the salt value itself never affects the result, so a
  * cheap partition-local counter is enough (no rand(), which would
  * break retry determinism — a failed task re-draws different salts).
  */
object Salt {

  /** Salted two-phase SUM of `value` per `key`. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      buckets: Int): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(monotonically_increasing_id(), lit(buckets.toLong)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
}
