package graft

/** Integrity of the declared inventory itself — the hazards the `++`
  * composition in SparkEntry cannot see:
  *
  *  - a duplicate query name across two operator maps would SILENTLY
  *    shadow one implementation (map ++ keeps the right side);
  *  - an oracle entry whose name has no matching query would never be
  *    compared (the driver iterates queries, not oracles);
  *  - a query name with path-unsafe characters would break the
  *    per-query parquet dump directory layout.
  */
class InventorySpec extends SparkTestBase {

  private val maps: Seq[(String, Map[String, _])] = Seq(
    "Scans" -> operators.Scans.queries,
    "Joins" -> operators.Joins.queries,
    "Aggregates" -> operators.Aggregates.queries,
    "SetOps" -> operators.SetOps.queries,
    "Windows" -> operators.Windows.queries,
    "Scalars" -> operators.Scalars.queries,
    "Pipeline" -> operators.Pipeline.queries,
    "Temporal" -> operators.Temporal.queries,
    "Text" -> operators.Text.queries,
    "NearDedup" -> operators.NearDedup.queries,
    "Ann" -> operators.Ann.queries,
    "Ivf" -> operators.Ivf.queries,
    "Pq" -> operators.Pq.queries,
    "Pca" -> operators.Pca.queries,
    "Multimodal" -> operators.Multimodal.queries,
    "Tpch" -> operators.Tpch.queries,
    "Etl" -> operators.Etl.queries,
    "Analytics" -> operators.Analytics.queries)

  test("no query name is declared by two operator maps (++ would shadow one)") {
    val owners = maps.flatMap { case (owner, m) => m.keys.map(_ -> owner) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dups = owners.filter(_._2.size > 1)
    assert(dups.isEmpty, s"shadowed query names: $dups")
    assert(maps.map(_._2.size).sum === SparkEntry.queries.size)
  }

  test("every oracle name has a matching query (a dangling oracle is never compared)") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are dump-directory safe (lowercase [a-z0-9_])") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"path-unsafe query names: ${bad.toSeq.sorted}")
  }

  test("declared inventory matches the documented counts (293 queries, 269 gated)") {
    // Keep README/SURVEY honest: update BOTH when this changes.
    assert(SparkEntry.queries.size === 293)
    assert(SparkEntry.oracleSql.size === 269)
  }
}
