package graft

import graft.sources.Tables

/** Corpus contract: each table's RESOLVED Spark schema must be one the
  * loaders know how to handle. The driver regenerates `/root/testdata`
  * between rounds and has already changed physical types once
  * (events.ts: INT64 ns → timestamp[us], 2026-08-13) — that drift took
  * out 24 queries silently. This spec turns the next drift into ONE
  * failing test with a readable diff instead.
  *
  * Columns with several admissible eras list every type the dispatch in
  * Tables.tsUtc (and DuckDB's oracle read) supports.
  */
class SchemaContractSpec extends SparkTestBase {

  // column -> admissible Spark typeNames, in corpus column order
  private val contract: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("integer"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("integer"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("integer")),
    "customer" -> Seq("c_custkey" -> Set("long"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("integer"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("long"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("integer"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("long"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("integer"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("long"), "o_custkey" -> Set("long"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp", "timestamp_ntz", "date"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("long"), "l_partkey" -> Set("long"),
      "l_suppkey" -> Set("long"), "l_linenumber" -> Set("integer"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz", "date")),
    "events" -> Seq("event_id" -> Set("long"),
      // the two known ts eras + a plain instant, all handled by tsUtc
      "ts" -> Set("long", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("long"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("long"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("long")),
    "embeddings" -> Seq("vec_id" -> Set("long"),
      "embedding" -> Set("array"), "label" -> Set("integer")))

  test("every corpus table resolves to a schema the loaders can handle") {
    val diffs = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val resolved = Tables.table(spark, sf, table).schema
        .map(f => f.name -> f.dataType.typeName).toMap
      val missing = cols.collect {
        case (c, _) if !resolved.contains(c) => s"$table.$c: MISSING"
      }
      val wrong = cols.collect {
        case (c, ok) if resolved.contains(c) && !ok(resolved(c)) =>
          s"$table.$c: got ${resolved(c)}, expected one of ${ok.mkString("/")}"
      }
      missing ++ wrong
    }
    assert(diffs.isEmpty,
      s"corpus schema drifted — update loaders/contract:\n  ${diffs.mkString("\n  ")}")
  }

  test("events ts dispatch covers the live corpus era end-to-end") {
    // whatever era is on disk, the derived event-time must land in 2024
    // (the corpus generates one year of 2024 events)
    val years = Tables.events(spark, sf)
      .selectExpr("year(ts_utc) AS y").distinct().collect().map(_.getInt(0)).toSet
    assert(years.nonEmpty && years.forall(y => y >= 2023 && y <= 2025),
      s"ts_utc out of corpus range, got years $years")
  }

  test("SparkEntry.entry smoke: rows > 0 at sf0.001 (the driver's gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
