package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §2.0).
  *
  * The corpus stores money/measure columns as `double`. Spark partial-
  * aggregates in parallel, so float addition order differs from DuckDB's
  * single stream and the driver's hash compare would fail. Casting to
  * DECIMAL *before* aggregation makes the sum associative and therefore
  * bit-identical across engines and across any cluster size — this is the
  * property that keeps results stable at 100 TB too, where partial
  * aggregation order is fully nondeterministic.
  */
object Dec {
  /** Cast to DECIMAL(18,2) — money columns, pre-aggregation. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Cast to DECIMAL(18,6) — rates/ratios, pre-aggregation. */
  def dec6(c: Column): Column = c.cast("decimal(18,6)")

  /** Final-result cast: both engines widen decimal avg/sum differently;
    * an explicit outer cast makes them agree.
    */
  def asDec(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")

  /** Final OUTPUT cast for decimal aggregates: pin scale via an explicit
    * decimal cast, then convert to DOUBLE. Decimal→double of the same
    * exact decimal value is bit-identical in Spark and DuckDB, and float
    * repr survives any downstream normalization — DECIMAL canonical
    * strings ('420129.40' vs '420129.4') do not. Internal math stays
    * decimal (associative, cluster-safe); only the emitted column is
    * double.
    */
  def outDec(c: Column, p: Int, s: Int): Column =
    c.cast(s"decimal($p,$s)").cast("double")

  /** Unavoidable double math (sqrt/ln/cosine): compute in double in both
    * engines, then round to 6 to absorb last-ulp differences.
    */
  def round6(c: Column): Column = round(c, 6)
}
