package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's OWN bloom-filter expressions —
  * `bloom_filter_agg(xxhash64(x)[, items, bits])` and
  * `might_contain(bloomBinary, xxhash64(x))`. Catalyst ships both for
  * runtime row-level filtering but leaves them out of the public
  * registry; registering them gives the ingest pipeline the standard
  * incremental-dedup pre-filter (see NearDedup.dedupBloom) with
  * codegen membership tests and NO custom sketch code. The aggregate's
  * input must be the 64-bit hash (xxhash64) of the key, matching how
  * Spark's own injected filters are built.
  */
object BloomFns {

  private def buildAgg(args: Seq[Expression]): Expression = args match {
    case Seq(child) => new BloomFilterAggregate(child)
    case Seq(child, items) => new BloomFilterAggregate(child, items)
    case Seq(child, items, bits) => new BloomFilterAggregate(child, items, bits)
    case _ => throw new IllegalArgumentException(
      s"bloom_filter_agg takes 1-3 arguments, got ${args.length}")
  }

  /** Register both functions. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_filter_agg", buildAgg, "built-in")
    reg.createOrReplaceTempFunction("might_contain",
      args => {
        require(args.length == 2, s"might_contain takes 2 arguments, got ${args.length}")
        BloomFilterMightContain(args.head, args(1))
      }, "built-in")
  }
}
