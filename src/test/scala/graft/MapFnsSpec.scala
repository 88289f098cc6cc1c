package graft

import org.apache.spark.sql.functions._

/** Map-function surface (SURVEY.md §2.1 H7): the corpus has no map
  * column and DuckDB's MAP syntax diverges, so this surface is pinned by
  * unit tests over literal data instead of an oracle-gated query.
  */
class MapFnsSpec extends SparkTestBase {

  test("map_from_entries / map_keys / map_values round-trip") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq(("a", 1), ("b", 2)))).toDF("id", "kv")
      .select(col("id"), map_from_entries(col("kv")).as("m"))
    val row = df.select(
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      element_at(col("m"), "b").as("b")).collect()(0)
    assert(row.getSeq[String](0) === Seq("a", "b"))
    assert(row.getSeq[Int](1) === Seq(1, 2))
    assert(row.getInt(2) === 2)
  }

  test("explode(map) produces one row per entry") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Map("x" -> 10, "y" -> 20))).toDF("id", "m")
      .select(col("id"), explode(col("m")))
    val rows = df.orderBy("key").collect()
    assert(rows.map(r => (r.getString(1), r.getInt(2))).toSeq ===
      Seq(("x", 10), ("y", 20)))
  }

  test("map built from the events props JSON (map-typed ETL shape)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
      .select(explode(col("m")))
    assert(ev.filter(col("key") === "k").count() === ev.count(),
      "every props object carries exactly the single key 'k'")
  }
}
