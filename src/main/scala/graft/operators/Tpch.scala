package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Dec.{dec2, outDec}
import graft.sources.Tables

/** Composite flagship queries — the classic TPC-H shapes (Q3/Q5/Q10)
  * adapted to the corpus's columns. Individually every operator here is
  * already gated (joins C1-C9, aggs D1-D8, sort F1); these entries gate
  * the COMPOSITIONS an analytics user actually runs: multi-way
  * fact-to-fact joins with selective dimension filters, a grouped
  * decimal aggregation, and a top-k.
  *
  * Scale shape, common to all three: dimension tables (nation, region)
  * broadcast; the fact-fact joins (lineitem ⋈ orders ⋈ customer/
  * supplier) shuffle on their join keys and Catalyst picks SMJ/shuffled
  * hash per stats with AQE re-planning at runtime; selective filters
  * (mktsegment, date windows, returnflag) sit BELOW the joins where
  * pushdown puts them, so the shuffled row count is the post-filter
  * cardinality. Revenue math is decimal end-to-end (associative —
  * cluster-safe) with one double cast on output.
  */
object Tpch {

  private val one = lit(1).cast("decimal(18,2)")
  private def revenue = sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))

  /** `tpch_q3` — shipping-priority: unshipped-revenue per order for one
    * market segment: BUILDING customers, orders placed before the
    * cutoff, lineitems shipped after it; top-10 orders by revenue.
    */
  def tpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(outDec(revenue, 38, 4).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** `tpch_q5` — local-supplier volume: revenue in ASIA for 1997 where
    * the supplier and customer share a nation; per-nation totals.
    */
  def tpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val asia = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(outDec(revenue, 38, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** `tpch_q10` — returned-item reporting: top-20 customers by revenue
    * lost to returns in 1997 Q1, with their nation.
    */
  def tpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(outDec(revenue, 38, 4).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** `tpch_q18` — large-volume orders: customers whose orders exceed a
    * quantity threshold (250 here; the classic HAVING-subquery → semi
    * join shape). The scale story: the "big orders" set is a key-only
    * two-phase aggregate of the fact table (map-side partial sums, no
    * wide rows through the shuffle), the semi join against it shuffles
    * on the same l_orderkey the final group-by needs (one partitioning
    * reused), and post-filter the set is tiny — AQE turns the semi
    * join into a runtime broadcast. Threshold 250 keeps the result
    * populated at every test sf (25 / 204 / 2285 qualifying orders).
    */
  def tpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 250)
      .select(col("l_orderkey").as("big_orderkey"))
    li.join(big, col("l_orderkey") === col("big_orderkey"), "left_semi")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(outDec(sum(dec2(col("l_quantity"))), 18, 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  /** `tpch_q14` — promo-revenue ratio: the share of one month's revenue
    * from PROMO parts, as a conditional aggregate over the
    * lineitem ⋈ part join. Scale shape: the shipdate month filter
    * pushes to the lineitem scan (one month of a 100 TB fact table is
    * the read), part joins broadcast, and the CASE folds into the same
    * map-side partial agg as the plain sum — one pass, no second join
    * for the numerator. Decimal sums are exact, so the final
    * double-division is deterministic across engines and cluster
    * sizes.
    */
  def tpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1997-03-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    val rev = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        outDec(sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(18,2)"))), 38, 4).as("promo_revenue"),
        outDec(sum(rev), 38, 4).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (col("promo_revenue") / col("total_revenue") * lit(100.0))
          .as("promo_pct"))
  }

  /** `tpch_q19` — discounted revenue under DISJUNCTIVE brand/size/
    * quantity predicates (three OR'd conjunct clauses spanning both
    * join sides). The scale hazard in this shape: Catalyst pushes
    * conjuncts below a join but will not split an OR across tables, so
    * a naive plan scans ALL of part and lineitem and filters above the
    * join. We derive the per-side residuals by hand — part keeps rows
    * matching the OR of its (brand, size) clauses, lineitem keeps the
    * quantity envelope — exactly what an optimizer with OR-predicate
    * derivation (e.g. DuckDB) does; the full tri-clause predicate then
    * runs post-join on the survivors. Part is a dimension → broadcast;
    * per-brand revenue keeps the output checkable row-by-row.
    */
  def tpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    val clauses = Seq(
      ("Brand#12", 15, (1, 20)),
      ("Brand#23", 25, (10, 30)),
      ("Brand#25", 35, (20, 40)))
    val partSide = clauses.map { case (b, sz, _) =>
      col("p_brand") === b && col("p_size").between(1, sz)
    }.reduce(_ || _)
    val liSide = col("l_quantity").between(
      clauses.map(_._3._1).min, clauses.map(_._3._2).max)
    val full = clauses.map { case (b, sz, (qlo, qhi)) =>
      col("p_brand") === b && col("p_size").between(1, sz) &&
        col("l_quantity").between(qlo, qhi)
    }.reduce(_ || _)
    Tables.lineitem(spark, sfDir)
      .filter(liSide)
      .join(broadcast(Tables.part(spark, sfDir).filter(partSide)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(full)
      .groupBy(col("p_brand"))
      .agg(outDec(revenue, 38, 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** `tpch_q7` — volume shipping between two nation GROUPS: revenue per
    * (supplier nation, customer nation, ship year) where the supplier
    * sits in one group and the customer in the other, either direction.
    * Plan shape this adds over q5: the nation dimension joins TWICE
    * under different roles (supplier's vs customer's), each pre-filtered
    * to the union of both groups (the per-side residual of the
    * direction disjunction, same trick as q19) and broadcast; the
    * direction predicate runs post-join on the two small name columns;
    * the group-by key includes a derived year. Fact-fact joins shuffle
    * on their keys as usual — the nation filters cut the supplier/
    * customer build sides before those shuffles.
    */
  def tpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    val grpA = Seq("NATION_1", "NATION_2", "NATION_3")
    val grpB = Seq("NATION_4", "NATION_5", "NATION_6")
    val both = grpA ++ grpB
    val n = Tables.nation(spark, sfDir)
    val supN = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(both: _*))
    val cusN = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(both: _*))
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cusN), col("c_nationkey") === col("cn_key"))
      .filter(
        (col("supp_nation").isin(grpA: _*) && col("cust_nation").isin(grpB: _*)) ||
          (col("supp_nation").isin(grpB: _*) && col("cust_nation").isin(grpA: _*)))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(outDec(revenue, 38, 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q3" -> tpchQ3 _,
    "tpch_q5" -> tpchQ5 _,
    "tpch_q7" -> tpchQ7 _,
    "tpch_q10" -> tpchQ10 _,
    "tpch_q14" -> tpchQ14 _,
    "tpch_q18" -> tpchQ18 _,
    "tpch_q19" -> tpchQ19 _
  )

  val oracle: Map[String, String] = Map(
    "tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name IN ('NATION_1','NATION_2','NATION_3')
        |       AND n2.n_name IN ('NATION_4','NATION_5','NATION_6'))
        |   OR (n1.n_name IN ('NATION_4','NATION_5','NATION_6')
        |       AND n2.n_name IN ('NATION_1','NATION_2','NATION_3'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q14" ->
      """SELECT promo_revenue, total_revenue,
        |  promo_revenue / total_revenue * 100.0 AS promo_pct
        |FROM (
        |  SELECT
        |    CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS DOUBLE) AS promo_revenue,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01')""".stripMargin,
    "tpch_q19" ->
      """SELECT p_brand,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
