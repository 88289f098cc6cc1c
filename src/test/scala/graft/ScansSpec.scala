package graft

import graft.operators.Scans

/** Pins scan/top-k physical plans: top-k must NOT be a global sort, and
  * filters/projections must reach the parquet reader.
  */
class ScansSpec extends SparkTestBase {

  test("scan_project plans TakeOrderedAndProject (per-partition top-k, no global sort)") {
    assert(planOf(Scans.scanProject(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("sort_limit plans TakeOrderedAndProject") {
    assert(planOf(Scans.sortLimit(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val plan = planOf(Scans.filterPred(spark, sf))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("o_orderstatus"), "status filter should be pushed")
  }

  test("scan_project prunes the read schema to the projected columns") {
    val plan = planOf(Scans.scanProject(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"expected pruned schema, got: $readSchema")
  }
}
