package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps
import graft.sources.Tables

/** Z-order layout: the morton bit-interleave (exactness is
  * oracle-gated via layout_zorder) and the property the layout exists
  * for — per-FILE min/max ranges stay narrow on BOTH dimensions, where
  * a single-column sort leaves the secondary column full-range inside
  * every primary run (so row-group pruning on it does nothing).
  */
class ZorderSpec extends SparkTestBase {

  test("mortonCode: known interleavings") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 3L))
      .toDF("a", "b")
      .select(GraftOps.mortonCode(col("a"), col("b"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a bits land at even positions, b bits at odd:
    // (5,3) = a 101, b 011 -> z 011011 = 27
    assert(rows === Seq(0L, 1L, 2L, 15L, 27L))
  }

  test("writeZOrdered: per-file ranges narrow on BOTH columns; linear sort does not") {
    val dims = Tables.orders(spark, sf).select(
      col("o_orderkey"),
      (col("o_custkey") % 256L).as("ca"),
      (datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long") % 256L).as("da"))

    def perFileSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length
    }

    val zPath = s"/tmp/graft_zorder_${java.util.UUID.randomUUID}"
    val lPath = s"/tmp/graft_linear_${java.util.UUID.randomUUID}"
    try {
      GraftOps.writeZOrdered(dims, zPath, col("ca"), col("da"),
        bits = 8, filesTarget = 8)
      // the single-column layout everyone reaches for first
      dims.repartitionByRange(8, col("ca")).sortWithinPartitions(col("ca"))
        .write.parquet(lPath)

      val (zCa, zDa) = (perFileSpan(zPath, "ca"), perFileSpan(zPath, "da"))
      val (lCa, lDa) = (perFileSpan(lPath, "ca"), perFileSpan(lPath, "da"))
      // linear sort wins on its own column but leaves the other
      // full-range; z-order must beat it decisively on the second
      // dimension while keeping the first far below full-range
      assert(zDa < lDa * 0.7,
        s"z-order per-file day-span $zDa not narrower than linear $lDa")
      assert(zCa < 256.0 * 0.7,
        s"z-order per-file custkey-span $zCa is effectively full-range")
      assert(lDa > 256.0 * 0.6,
        s"sanity: linear layout should leave day nearly full-range, got $lDa")
    } finally {
      for (p <- Seq(zPath, lPath)) {
        val dir = new java.io.File(p)
        if (dir.exists) {
          dir.listFiles.foreach(_.delete()); dir.delete()
        }
      }
    }
  }
}
