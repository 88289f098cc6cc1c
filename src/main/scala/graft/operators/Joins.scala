package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Dec._
import graft.sources.Tables

/** Join operators (SURVEY.md §2.1 category C, minus C8 as-of → Temporal).
  *
  * Scale design: dimension tables (region 5, nation 25, band lists) are
  * `broadcast()`-hinted — at 100 TB the fact side streams through a
  * BroadcastHashJoin with zero shuffle. The one genuinely large-large
  * join (C2 lineitem⋈orders) is left to Catalyst: both sides shuffle-
  * partition on the join key (sort-merge or shuffled-hash per AQE), which
  * is the correct strategy at any scale; AQE handles skew splitting.
  * Semi/anti joins ship only the key column of the build side.
  */
object Joins {

  /** C1 `join_broadcast` — fact ⋈ two broadcast dims, then aggregate. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        outDec(sum(dec2(col("c_acctbal"))), 18, 2).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** C2 `join_smj` — large ⋈ large on orderkey; shuffle join both sides.
    * The merge hint pins SortMergeJoin at every scale factor: without it
    * Catalyst broadcasts the filtered orders side at test SFs (it fits
    * under the 10 MB threshold), which would silently test the wrong
    * operator. At 100 TB both sides hash-partition on the key and
    * merge — the plan this query exists to exercise (pinned in
    * JoinsSpec).
    */
  def joinSmj(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        outCentsWide(sum((cents2(col("l_extendedprice")) *
          (lit(100L) - cents2(col("l_discount")))).cast("decimal(38,0)")), 4)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** C3 `join_left` — left outer keeps order-less customers with count 0.
    *
    * Pre-aggregates orders by `o_custkey` BEFORE the outer join: the
    * shuffle then carries one row per custkey instead of the full fat
    * join output — the difference between O(|orders|) and O(|customers|)
    * shuffle bytes when orders ≫ customers at scale. `COALESCE(n, 0)` on
    * the null side is equivalent to COUNT over the unaggregated left
    * join because `o_orderkey` is never null.
    */
  def joinLeft(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val oAgg = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    c.join(oAgg, c("c_custkey") === oAgg("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** C4 `join_full` — full outer over distinct key sets + presence flags. */
  def joinFull(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_nationkey")).distinct()
    val s = Tables.supplier(spark, sfDir).select(col("s_nationkey")).distinct()
    c.join(s, c("c_nationkey") === s("s_nationkey"), "full")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("c_nationkey").isNotNull.as("in_customer"),
        col("s_nationkey").isNotNull.as("in_supplier"))
      .orderBy(col("nationkey"))
  }

  /** C5 `join_semi` — customers having ≥1 urgent order (no right columns). */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** `join_interval` — interval OVERLAP join: each order's 30-day
    * fulfilment window [orderdate, orderdate+30d) against a campaign
    * calendar of date intervals, `a.start < b.end AND b.start < a.end`
    * — the canonical temporal-overlap shape (sessions × promotions,
    * downtime × SLA windows) that join_range's point-in-band form
    * cannot express.
    *
    * Scale shape: the campaign side is a literal broadcast (a calendar
    * is always dimension-sized), so the fact side streams map-side
    * through a BroadcastNestedLoopJoin — no shuffle of orders. When
    * BOTH interval sets are large, the production rewrite buckets
    * intervals by coarse time grain (epoch-month) and equi-joins on
    * the bucket with the overlap predicate as a residual — the same
    * banding idea the near-dedup LSH join uses; at this corpus the
    * dimension side is 4 rows and broadcast is strictly better.
    */
  /** The campaign calendar both interval-join formulations share —
    * one definition, so the physical-rewrite equivalence test can
    * never drift on the data. (The two oracle SQL copies stay
    * textual by the oracle-map contract.)
    */
  private val CampaignSpec = Seq(
    ("launch_95", "1995-01-01", "1995-07-01"),
    ("summer_97", "1997-06-01", "1997-09-01"),
    ("holiday_98", "1998-11-15", "1999-01-15"),
    ("clearance_00", "2000-03-01", "2000-04-01"))

  private def campaignDf(spark: SparkSession): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    CampaignSpec.toDF("campaign", "c_start", "c_end")
      .select(col("campaign"), col("c_start").cast("date").as("c_start"),
        col("c_end").cast("date").as("c_end"))
  }

  def joinInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val campaigns = campaignDf(spark)
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("o_end"))
    o.join(broadcast(campaigns),
        col("o_start") < col("c_end") && col("c_start") < col("o_end"))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_orders"),
        outCentsWide(sum(cents2(col("o_totalprice")).cast("decimal(38,0)")), 2).as("total_price"))
      .orderBy(col("campaign"))
  }

  /** `join_interval_bucketed` — the LARGE-LARGE scale path for the
    * interval-overlap join that join_interval only documents: both
    * interval sets explode into the month-grain buckets they touch,
    * the join becomes a plain shuffle EQUI-join on the bucket (two
    * overlapping intervals necessarily share a grain bucket), the
    * original overlap predicate survives as a residual filter, and a
    * DISTINCT collapses the pairs an overlap spanning several buckets
    * produced more than once — the one subtle correctness point of
    * the rewrite. Same semantics, bounded fan-out (intervals/grain),
    * no broadcast requirement, no nested-loop: at 100 TB × 100 TB
    * this is the only shape that runs. The oracle is deliberately the
    * PLAIN overlap join (the join_salted policy: the rewrite is
    * physical, not semantic).
    */
  def joinIntervalBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    def buckets(s: Column, e: Column): Column =
      sequence(trunc(s, "month"), trunc(date_sub(e, 1), "month"),
        expr("interval 1 month"))
    val campaigns = campaignDf(spark)
      .select(col("campaign"), col("c_start"), col("c_end"),
        explode(buckets(col("c_start"), col("c_end"))).as("bkt"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("o_end"))
      .select(col("*"),
        explode(buckets(col("o_start"), col("o_end"))).as("bkt"))
    o.join(campaigns.hint("shuffle_hash"), Seq("bkt"))
      .filter(col("o_start") < col("c_end") && col("c_start") < col("o_end"))
      .select(col("o_orderkey"), col("o_totalprice"), col("campaign"))
      .distinct()
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_orders"),
        outCentsWide(sum(cents2(col("o_totalprice")).cast("decimal(38,0)")), 2).as("total_price"))
      .orderBy(col("campaign"))
  }

  /** C6 `join_anti` — customers with zero urgent orders (the exact
    * complement of C5: |semi| + |anti| = |customer|, pinned in tests).
    */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** C7 `join_range` — non-equi band join (broadcast nested loop on a
    * 4-row literal band table; each part row matches exactly one band).
    */
  def joinRange(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val bands = Seq(
      ("band_900", 900.0, 925.0),
      ("band_925", 925.0, 950.0),
      ("band_950", 950.0, 975.0),
      ("band_975", 975.0, 1000.0)).toDF("band", "lo", "hi")
    Tables.part(spark, sfDir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        outCentsWide(sum(cents2(col("p_retailprice")).cast("decimal(38,0)")), 2).as("total_price"))
      .orderBy(col("band"))
  }

  /** `subq_exists` — correlated EXISTS in SQL text: Catalyst's
    * RewritePredicateSubquery decorrelates it into a left-semi join
    * (same plan as join_semi's DataFrame form — pinned in JoinsSpec),
    * demonstrating the subquery surface a SQL-first user of the engine
    * writes.
    */
  def subqExists(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_sq")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_sq")
    spark.sql(
      """SELECT c_custkey, c_name FROM customer_sq c
        |WHERE EXISTS (SELECT 1 FROM orders_sq o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** `join_lateral` — correlated LATERAL subquery: each high-balance
    * customer paired with their top-2 orders by value, written the way
    * a SQL-first user writes per-row top-k (`, LATERAL (... ORDER BY
    * ... LIMIT 2)`). Catalyst decorrelates the LATERAL into a
    * ranked-window join — the same WindowGroupLimit-prunable shape
    * win_topk_group builds declaratively (no per-customer subquery
    * re-execution; pinned in JoinsSpec). Ties are broken by order key
    * so the selected pair set is cross-engine-unique.
    */
  def joinLateral(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_lat")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_lat")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer_lat c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders_lat o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c.c_acctbal > 9000
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** `join_anti_nullaware` — SQL `NOT IN (subquery)` with its full
    * three-valued-logic semantics: nations with no negative-balance
    * supplier, counted over customers. Unlike `join_anti` (NOT
    * EXISTS — two-valued), NOT IN must yield UNKNOWN for every probe
    * row if the list contains a single NULL, so Catalyst cannot plan a
    * plain anti join when the list column is nullable: it plans the
    * dedicated null-aware anti join (a broadcast nested-loop variant,
    * pinned in JoinsSpec) that checks the whole list's null state.
    *
    * Scale note: null-awareness is intrinsically broadcast-shaped —
    * an UNKNOWN match can come from ANY partition of the list side, so
    * the list must ship whole to every task. That's fine when the
    * IN-list is dimension-sized (here: supplier nations); for a
    * fact-sized list, pre-filter the NULLs explicitly (turning the
    * query into NOT EXISTS two-valued semantics) and Catalyst plans
    * the ordinary partitioned anti join instead.
    */
  def joinAntiNullaware(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_nin")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier_nin")
    spark.sql(
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  COUNT(*) AS n_uncovered
        |FROM customer_nin
        |WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier_nin
        |                          WHERE s_acctbal < 0)
        |GROUP BY c_nationkey
        |ORDER BY nationkey""".stripMargin)
  }

  /** `subq_scalar` — correlated SCALAR subquery: customers above their
    * own nation's average balance. Catalyst decorrelates into an
    * aggregate + join (no per-row subquery execution — pinned in
    * JoinsSpec). The threshold is a decimal-sum / count ratio in double
    * so both engines compute the identical boundary (§2.0.2: their
    * AVG(decimal) widenings differ).
    */
  def subqScalar(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer_sq2")
    spark.sql(
      """SELECT c_custkey, c_nationkey,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM customer_sq2 c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer_sq2 c2
        |  WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** C9 `join_cross` — cartesian of two tiny sets (5 × 5 = 25 rows). */
  def joinCross(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir).select(col("r_name"))
    val et = Tables.events(spark, sfDir).select(col("event_type")).distinct()
    r.crossJoin(et)
      .orderBy(col("r_name"), col("event_type"))
  }

  /** Bucketed-table names already written by this JVM, per corpus dir.
    * Names embed a per-process random tag so concurrent processes
    * sharing one warehouse dir can never collide (the signature-table
    * discipline from NearDedup, applied to the catalog namespace).
    */
  private val bucketedFor = scala.collection.mutable.Map.empty[String, (String, String)]
  private lazy val bktTag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  private def bucketedTables(spark: SparkSession, sfDir: String): (String, String) =
    synchronized {
      bucketedFor.getOrElseUpdate(sfDir, {
        val sfTag = java.security.MessageDigest.getInstance("MD5")
          .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val ord = s"graft_orders_bkt_${sfTag}_$bktTag"
        val cus = s"graft_customer_bkt_${sfTag}_$bktTag"
        Tables.orders(spark, sfDir).write
          .bucketBy(16, "o_custkey").sortBy("o_custkey")
          .mode("overwrite").saveAsTable(ord)
        Tables.customer(spark, sfDir).write
          .bucketBy(16, "c_custkey").sortBy("c_custkey")
          .mode("overwrite").saveAsTable(cus)
        (ord, cus)
      })
    }

  /** `join_bucketed` — the co-located join: both sides pre-bucketed on
    * the join key at WRITE time, so the per-query plan is a
    * SortMergeJoin with NO exchange on either input — the shuffle was
    * paid once when the tables were laid down, and every subsequent
    * join of the pair rides it free. THE lever for the repeated
    * large-large joins of a 100 TB warehouse (fact⋈fact on a shared
    * key), complementing broadcast (small dims) and AQE (ad-hoc
    * shapes). Tables are materialized once per (JVM, corpus) like the
    * minhash signature table — an ingest cost, not a query cost; the
    * merge hint keeps the join SMJ at toy scale where the dimension
    * side would otherwise broadcast and dodge the exchange question.
    * Zero-exchange plan pinned in BucketingSpec; results gated against
    * the plain unbucketed join SQL.
    */
  def joinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val (ord, cus) = bucketedTables(spark, sfDir)
    spark.table(cus).hint("merge")
      .join(spark.table(ord), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        outCentsWide(sum(cents2(col("o_totalprice")).cast("decimal(38,0)")), 2).as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** `join_salted` — skew-safe shuffle join: the fact side gets a
    * partition-local salt in [0, 16), the (too-big-to-broadcast at
    * scale) build side is replicated once per salt value, and the join
    * runs on (key, salt) — a hot key's rows spread over 16 reducers
    * instead of one. The salt never reaches the output, so the result
    * is EXACTLY the plain equi-join (oracle is the unsalted SQL).
    * Complements AQE's OptimizeSkewedJoin (which splits oversized
    * partitions post-shuffle but cannot split ONE giant key's hash
    * bucket feeding a stateful build) — explicit salting is the tool
    * when a single key exceeds an executor. Salt comes from
    * `monotonically_increasing_id` (partition-local counter), not
    * rand(): a retried task re-derives the same salts, keeping the
    * shuffle deterministic under failure. The merge hint pins the
    * shuffle join at toy scale where the replicated dimension would
    * otherwise broadcast and dodge the skew question entirely.
    * Thin binding of `GraftOps.saltedJoin` (mechanics additionally
    * pinned on arbitrary data in SkewSpec).
    */
  def joinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      .hint("merge")
    graft.api.GraftOps.saltedJoin(fact, dim, Seq("l_suppkey"), buckets = 16)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        outCents(sum(cents2(col("l_extendedprice")) *
          (lit(100L) - cents2(col("l_discount")))), 4)
          .as("revenue"))
      .orderBy(col("s_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted" -> joinSalted _,
    "join_broadcast" -> joinBroadcast _,
    "join_bucketed" -> joinBucketed _,
    "join_smj" -> joinSmj _,
    "join_left" -> joinLeft _,
    "join_full" -> joinFull _,
    "join_semi" -> joinSemi _,
    "join_anti" -> joinAnti _,
    "join_range" -> joinRange _,
    "join_interval" -> joinInterval _,
    "join_interval_bucketed" -> joinIntervalBucketed _,
    "join_cross" -> joinCross _,
    "subq_exists" -> subqExists _,
    "join_lateral" -> joinLateral _,
    "join_anti_nullaware" -> joinAntiNullaware _,
    "subq_scalar" -> subqScalar _
  )

  val oracle: Map[String, String] = Map(
    "join_anti_nullaware" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  COUNT(*) AS n_uncovered
        |FROM customer
        |WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_salted" ->
      """SELECT s_name, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,
    "join_bucketed" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "subq_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "subq_scalar" ->
      """SELECT c_custkey, c_nationkey,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer c2
        |  WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "join_smj" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "join_full" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  c.c_nationkey IS NOT NULL AS in_customer,
        |  s.s_nationkey IS NOT NULL AS in_supplier
        |FROM (SELECT DISTINCT c_nationkey FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT s_nationkey FROM supplier) s
        |  ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_range" ->
      """SELECT band, COUNT(*) AS n_parts,
        |  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM part
        |JOIN (VALUES ('band_900', 900.0, 925.0), ('band_925', 925.0, 950.0),
        |             ('band_950', 950.0, 975.0), ('band_975', 975.0, 1000.0))
        |  b(band, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,
    "join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE c.c_acctbal > 9000
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "join_interval" ->
      """SELECT campaign, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM (SELECT o_orderkey, o_totalprice,
        |        CAST(o_orderdate AS DATE) AS o_start,
        |        CAST(o_orderdate AS DATE) + 30 AS o_end
        |      FROM orders) o
        |JOIN (VALUES ('launch_95', DATE '1995-01-01', DATE '1995-07-01'),
        |             ('summer_97', DATE '1997-06-01', DATE '1997-09-01'),
        |             ('holiday_98', DATE '1998-11-15', DATE '1999-01-15'),
        |             ('clearance_00', DATE '2000-03-01', DATE '2000-04-01'))
        |  c(campaign, c_start, c_end)
        |  ON o_start < c_end AND c_start < o_end
        |GROUP BY campaign
        |ORDER BY campaign""".stripMargin,
    "join_interval_bucketed" ->
      // deliberately the PLAIN overlap join: the bucket rewrite is
      // physical, not semantic (the join_salted oracle policy)
      """SELECT campaign, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM (SELECT o_orderkey, o_totalprice,
        |        CAST(o_orderdate AS DATE) AS o_start,
        |        CAST(o_orderdate AS DATE) + 30 AS o_end
        |      FROM orders) o
        |JOIN (VALUES ('launch_95', DATE '1995-01-01', DATE '1995-07-01'),
        |             ('summer_97', DATE '1997-06-01', DATE '1997-09-01'),
        |             ('holiday_98', DATE '1998-11-15', DATE '1999-01-15'),
        |             ('clearance_00', DATE '2000-03-01', DATE '2000-04-01'))
        |  c(campaign, c_start, c_end)
        |  ON o_start < c_end AND c_start < o_end
        |GROUP BY campaign
        |ORDER BY campaign""".stripMargin,
    "join_cross" ->
      """SELECT r_name, event_type
        |FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |ORDER BY r_name, event_type""".stripMargin
  )
}
