package graft

import org.apache.spark.sql.functions._
import graft.operators.Etl

/** Plan + semantics pins for the ETL maintenance operators. The
  * scaladoc on each operator documents a specific 100 TB-safe plan
  * shape (one shuffle, no Expand, key-pruned anti joins); these tests
  * fail if a refactor silently loses that shape.
  */
class EtlSpec extends SparkTestBase {

  /** (hash shuffles, range shuffles) in the FINAL adaptive plan, as in
    * PlanBudgetSpec — broadcast exchanges excluded by pattern.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    def c(p: String) =
      plan.linesIterator.count(l => l.contains(p) && !l.contains("Reused"))
    (c("Exchange hashpartitioning"), c("Exchange rangepartitioning"))
  }

  test("etl_scd2: the lag/lead window pair shares ONE exchange and ONE sort") {
    // Both windows partition by user_id and order by (ts_utc, event_id),
    // and the run-collapse filter between them preserves both — Catalyst
    // must plan a single hash exchange and a single sort for the pair.
    val df = Etl.scd2(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    val (hash, range) = shuffles(df)
    assert(hash === 1, s"window pair must share one data shuffle, got $hash")
    assert(range <= 1, "only the presentation orderBy may range-shuffle")
    val sorts = plan.linesIterator
      .count(l => l.trim.startsWith("+- Sort ") || l.trim.startsWith("Sort "))
    // one window sort + at most the presentation sort
    assert(sorts <= 2, s"expected the window pair to share one sort, got:\n$plan")
  }

  test("etl_scd2: versions are collapsed runs — no consecutive equal tiers") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    val bad = Etl.scd2(spark, sf)
      .withColumn("prev", lag(col("tier"), 1).over(w))
      .filter(col("prev") === col("tier")).count()
    assert(bad === 0L, "adjacent versions with the same tier survived collapse")
  }

  test("etl_scd2: validity intervals chain — valid_to equals the next valid_from") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    val broken = Etl.scd2(spark, sf)
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(
        (col("next_from").isNotNull && (col("valid_to").isNull ||
          col("valid_to") =!= col("next_from"))) ||
        (col("next_from").isNull &&
          (col("valid_to").isNotNull || !col("is_current"))))
      .count()
    assert(broken === 0L, "SCD2 validity chain has gaps or a non-current tail")
  }

  test("etl_merge: ONE scan of events, ONE data shuffle (argmax aggregate)") {
    val df = Etl.merge(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"merge must read the stream once, got $scans scans")
    val (hash, range) = shuffles(df)
    assert(hash === 1, s"conditional-argmax merge is one shuffle, got $hash")
    assert(range <= 1)
  }

  test("etl_merge: actions are consistent with the side aggregates") {
    import org.apache.spark.sql.functions._
    val bad = Etl.merge(spark, sf).filter(
      (col("action") === "insert" && col("prior_tier").isNotNull) ||
      (col("action") === "update" && (col("prior_tier").isNull ||
        col("batch_tier").isNull || col("batch_tier") === col("prior_tier"))) ||
      col("merged_tier").isNull).count()
    assert(bad === 0L)
  }

  test("etl_incr_rollup: merged partials equal the full recompute, boundary day merges both sides") {
    import org.apache.spark.sql.functions._
    import graft.functions.Dec._
    val incr = Etl.incrRollup(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = graft.sources.Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), outDec(sum(dec2(col("value"))), 18, 2).as("t"))
      .collect()
      .map(r => (java.sql.Timestamp.valueOf(r.getDate(0).toString + " 00:00:00"),
        r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(incr === full, "incremental maintenance must equal full recompute")
    // the mid-day cutoff day must exist — the case where both partial
    // sides contribute rows that the merge aggregate has to combine
    val cutDay = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    assert(incr.keys.exists(_._1 == cutDay), "boundary day missing from fixture")
  }

  test("dq_benford: digits partition the table, fractions and expectations each sum to 1") {
    val rows = Etl.dqBenford(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet), "leading digits are 1..9")
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === total, "every order contributes one digit")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "observed fractions sum to 1")
    // Benford expectation is a fixed distribution: Σ log10(1+1/d) over
    // the digits PRESENT; with all 9 present it sums to exactly 1
    val expSum = rows.map(_._4).sum
    val want = rows.map(_._1).map(d => math.log10(1.0 + 1.0 / d)).sum
    assert(math.abs(expSum - want) < 1e-4)
    for ((d, _, _, e) <- rows)
      assert(math.abs(e - math.log10(1.0 + 1.0 / d)) < 1e-6)
  }

  test("dq_profile: no Expand — the unpivot is a generator, not countDistinct fan-out") {
    val df = Etl.dqProfile(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("Expand"),
      s"per-column distinct counts must not plan an Expand:\n$plan")
  }

  test("etl_snapshot_diff: op classes are internally consistent and all occur") {
    val rows = Etl.snapshotDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (op, oldN, newN) = (r.getString(2), r.get(3), r.get(4))
      op match {
        case "I" => assert(oldN == null && newN != null, r.toString)
        case "D" => assert(oldN != null && newN == null, r.toString)
        case "U" => assert(oldN != null && newN != null && oldN != newN,
          s"U row must change: $r")
        case x => fail(s"unknown op $x")
      }
    }
    // presence-based trailing-window state makes all three classes real
    val ops = rows.map(_.getString(2)).toSet
    assert(ops === Set("I", "U", "D"), s"expected all op classes, got $ops")
  }

  test("etl_snapshot_diff plans as ONE aggregate over one scan — no full-outer join") {
    val plan = planOf(Etl.snapshotDiff(spark, sf))
    assert(!plan.contains("FullOuter"),
      s"diff must be the fused conditional aggregate, not a snapshot join:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected a single events scan, got $scans:\n$plan")
  }

  test("dq_orphans: one pass per fact, broadcast outer joins, key-only scans") {
    val df = Etl.dqOrphans(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    // both lineitem relationships ride ONE scan (two broadcast LEFT
    // joins + one conditional aggregate); orders rides a second —
    // three broadcast outer joins total, zero anti joins, zero
    // per-relationship re-scans
    val outer = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter"))
    assert(outer === 3, s"three broadcast LEFT joins expected, got $outer")
    assert(!plan.contains("LeftAnti"), "orphan counts come from pk-null " +
      "conditionals, not per-relationship anti joins")
    // fact scans are pruned to the key columns, one scan per fact table
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"), plan)
    assert(plan.contains("ReadSchema: struct<o_custkey:bigint>"), plan)
    assert(plan.linesIterator.count(_.contains("lineitem.parquet")) === 1,
      "lineitem must be scanned exactly once")
  }

  test("etl_dq_quarantine: quarantined set is exactly the rule violations, reasons exact") {
    import org.apache.spark.sql.functions._
    val got = Etl.dqQuarantine(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // brute-force re-evaluation of the rule set on the driver
    val custKeys = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect()
    var clean = 0
    ev.foreach { r =>
      val k = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val errs = Seq(
        if (r.getDouble(2) > 400) Some("value_out_of_range") else None,
        if (k.forall(_ >= 90)) Some("props_k_out_of_range") else None,
        if (!custKeys(r.getLong(1))) Some("orphan_user") else None).flatten
      if (errs.isEmpty) {
        clean += 1
        assert(!got.contains(r.getLong(0)),
          s"event ${r.getLong(0)} is valid; must not be quarantined")
      } else assert(got.get(r.getLong(0)) === Some(errs.mkString(",")),
        s"event ${r.getLong(0)}: reason list must match in rule order")
    }
    assert(got.size + clean === ev.length, "split is a partition of the stream")
    assert(got.nonEmpty && clean > 0,
      "corpus must exercise both sides of the quarantine split")
  }

  test("dq_outlier_mad: median and MAD recompute from a driver-side sort") {
    import org.apache.spark.sql.functions._
    val rows = Etl.dqOutlierMad(spark, sf).collect()
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val xs = vals(r.getString(0)).map(_._2).toSeq
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      assert(math.abs(r.getDouble(1) - med) < 1e-9, "median")
      assert(math.abs(r.getDouble(2) - mad) < 1e-9, "MAD")
      val zs = xs.map(x => math.abs(0.6745 * (x - med) / mad))
      assert(r.getLong(4) === zs.count(_ > 3.5).toLong, "outlier count")
      assert(math.abs(r.getDouble(5) - zs.max) < 2e-6, "max |z|")
      assert(r.getLong(3) === xs.length.toLong)
    }
  }

  test("dq_freshness: the frontier feed has zero staleness; lags recompute exactly") {
    import org.apache.spark.sql.functions._
    val rows = Etl.dqFreshness(spark, sf).collect()
    assert(rows.map(_.getLong(3)).min === 0L,
      "the newest feed defines the frontier")
    def epochUs(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    val frontier = rows.map(r => epochUs(r.getTimestamp(1))).max
    rows.foreach { r =>
      assert(r.getLong(3) === frontier - epochUs(r.getTimestamp(1)),
        s"${r.getString(0)} staleness")
    }
  }

  test("etl_dq_quarantine plan: one fact scan, referential rule broadcast, no shuffle") {
    import org.apache.spark.sql.functions._
    val plan = planOf(Etl.dqQuarantine(spark, sf))
      .split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"all rules evaluate in one pass, got $scans scans")
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension keyset must broadcast:\n$plan")
    // the only tolerable exchange is the dimension keyset's own
    // distinct — the FACT stream itself must never hash-shuffle
    val factHash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused") &&
        !l.contains("c_custkey"))
    assert(factHash === 0,
      s"the quarantine path must not shuffle the fact stream:\n$plan")
  }

  test("etl_late_data: lateness matches brute-force high-water marks") {
    val rows = Etl.etlLateData(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts_utc")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val late = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(_._2) // arrival = append order
      var hwm = Long.MinValue
      sorted.map { e =>
        val l = math.max(if (hwm == Long.MinValue) 0L else hwm - e._3, 0L)
        hwm = math.max(hwm, e._3)
        (e._3, l)
      }
    }
    val byDay = late.groupBy(e =>
      java.time.LocalDate.ofEpochDay(Math.floorDiv(e._1, 86400000000L)))
    assert(rows.map(_._1).toSet === byDay.keySet)
    rows.foreach { case (day, n, nLate, maxL) =>
      val es = byDay(day)
      assert(n === es.size.toLong, s"$day count")
      assert(nLate === es.count(_._2 > 0).toLong, s"$day late count")
      assert(maxL === es.map(_._2).max, s"$day max lateness")
    }
    // this corpus is fully event-time-ordered within users: the audit's
    // gated output is its CLEAN verdict (detection on planted disorder
    // is pinned in ApiSpec, where the proxy isn't vacuous)
    assert(rows.map(_._3).sum === 0L, "clean-corpus verdict")
    assert(rows.map(_._4).max === 0L)
  }

  test("join_pit: every purchase matched once, to the version valid AT its time") {
    val rows = Etl.joinPit(spark, sf).collect()
      .map(r => (r.getLong(1), r.getString(3), r.getLong(4)))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_utc").cast("long"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    def tierOf(v: Double) = if (v < 50) "low" else if (v < 200) "mid" else "high"
    val purchases = ev.filter(_._3 == "purchase")
    assert(rows.length === purchases.length, "exactly one row per purchase")
    assert(rows.map(_._1).distinct.length === rows.length, "no fan-out")
    // brute force: per user, the version list is the run-starts of the
    // tier sequence; the PIT pick is the last version starting <= ts
    val byUser = ev.groupBy(_._1).view.mapValues { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.collect {
        case (e, i) if i == 0 || tierOf(sorted(i - 1)._5) != tierOf(e._5) =>
          (e._4, e._2, tierOf(e._5)) // (valid_from, version_id, tier)
      }
    }.toMap
    val got = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    purchases.foreach { case (uid, pid, _, ts, _) =>
      val v = byUser(uid).filter(_._1 <= ts)
        .maxBy(v2 => (v2._1, v2._2))
      assert(got(pid) === ((v._3, v._2)), s"purchase $pid PIT version")
    }
  }

  test("dq_dup_keys: audit matches direct per-table counts") {
    val rows = Etl.dqDupKeys(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === Set("customer", "events", "orders", "part",
      "supplier"))
    val expected = Map(
      "customer" -> ("c_custkey", graft.sources.Tables.customer(spark, sf)),
      "events" -> ("event_id", graft.sources.Tables.events(spark, sf)),
      "orders" -> ("o_orderkey", graft.sources.Tables.orders(spark, sf)),
      "part" -> ("p_partkey", graft.sources.Tables.part(spark, sf)),
      "supplier" -> ("s_suppkey", graft.sources.Tables.supplier(spark, sf)))
    expected.foreach { case (name, (key, df)) =>
      val n = df.count()
      val k = df.select(key).distinct().count()
      assert(rows(name) === ((n, k, n - k)), s"table $name audit")
    }
  }

  test("dq_partition_skew: counts conserve, shares sum to 1, ratio recomputes") {
    val rows = Etl.dqPartitionSkew(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum === total, "day counts conserve the stream")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to ~1")
    val mean = total.toDouble / rows.length
    rows.foreach { case (_, n, _, ratio, hot) =>
      assert(math.abs(ratio - n / mean) < 1e-6, s"skew ratio recomputes")
      assert(hot === (n > 2.0 * mean), "hot flag derives from the 2x rule")
    }
    assert(rows.map(_._1.getTime).sliding(2).forall {
      case Array(a, b) => a < b; case _ => true
    }, "days ordered")
  }

  test("etl_checksum: brute-force order-independent fingerprint") {
    val got = Etl.etlChecksum(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def md5u32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 8), 16)
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .collect().map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}")
    // reversed iteration order: the sum must not care
    val brute = orders.reverse.map(md5u32).sum
    assert(got("orders") === ((orders.length.toLong, brute)),
      s"orders checksum ${got("orders")} vs ($brute)")
    assert(got.keySet === Set("orders", "lineitem", "customer"))
  }

  test("dq_value_drift: bins partition, shares smooth correctly, PSI >= 0") {
    val rows = Etl.dqValueDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(r => r._2 + r._3).sum === total, "bins partition")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    val (ta, tb) = (rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble)
    var psi = 0.0
    rows.foreach { case (bin, na, nb, sa, sb, _) =>
      val pa = (na + 1) / (ta + 10); val pb = (nb + 1) / (tb + 10)
      assert(math.abs(sa - pa) < 5e-7, s"bin $bin share_a")
      assert(math.abs(sb - pb) < 5e-7, s"bin $bin share_b")
      psi += (pa - pb) * math.log(pa / pb)
    }
    val gotPsi = rows.head._6
    assert(rows.forall(r => math.abs(r._6 - gotPsi) < 1e-12),
      "PSI is one number on every row")
    assert(math.abs(gotPsi - psi) < 1e-5, s"PSI $gotPsi vs brute $psi")
    // PSI is a sum of (p-q)ln(p/q) terms, each >= 0 (Gibbs)
    assert(gotPsi >= -1e-12, "PSI nonnegative")
    // parity halves of one distribution: drift should read as stable
    assert(gotPsi < 0.1, s"parity halves must not 'drift': $gotPsi")
  }

  test("dq_id_gaps: identities against brute-force id set") {
    val row = Etl.dqIdGaps(spark, sf).collect()(0)
    val (n, lo, hi, missing, dups, contig) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getBoolean(5))
    val ids = graft.sources.Tables.events(spark, sf)
      .select(col("event_id")).collect().map(_.getLong(0))
    assert(n === ids.length.toLong && lo === ids.min && hi === ids.max)
    val distinct = ids.distinct.length.toLong
    assert(missing === hi - lo + 1 - distinct, "missing ids")
    assert(dups === n - distinct, "duplicate ids")
    assert(contig === (hi - lo + 1 == n), "contiguity flag")
    assert(missing >= 0 && dups >= 0)
  }

  test("dq_fd_audit: brute-force the events.user->event_type candidate; rate identities") {
    val rows = Etl.dqFdAudit(spark, sf).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(rows.size === 4, "four FD candidates")
    rows.foreach { case (fd, (nk, nv, rate, mx, avg)) =>
      assert(nv <= nk, s"$fd violators bounded by keys")
      assert(math.abs(rate - nv.toDouble / nk.toDouble) < 1e-6, s"$fd rate")
      assert(mx >= 1 && avg >= 1.0 - 1e-9 && avg <= mx.toDouble, s"$fd fanout")
    }
    // brute-force one candidate end-to-end
    val fans = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
      .groupBy(_._1).map(_._2.length)
    val (nk, nv, _, mx, avg) = rows("events.user->event_type")
    assert(nk === fans.size.toLong, "brute key count")
    assert(nv === fans.count(_ > 1).toLong, "brute violator count")
    assert(mx === fans.max.toLong, "brute max fanout")
    assert(math.abs(avg - fans.sum.toDouble / fans.size) < 1e-5)
  }
}
