package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.operators.{Aggregates, Pipeline}
import graft.sources.Tables

/** Pins LLM-pipeline operator semantics: cosine identity and UDF/native
  * agreement, dedup accounting, weighted-mean correctness, HLL accuracy.
  */
class PipelineSpec extends SparkTestBase {

  test("cosine(v, v) = 1 within 1e-12 for every embedding") {
    val bad = Tables.embeddings(spark, sf)
      .select(VectorFns.cosineSim(col("embedding"), col("embedding")).as("sim"))
      .filter(abs(col("sim") - 1.0) > 1e-12)
    assert(bad.count() === 0)
  }

  test("UDF cosine and pure-Catalyst cosine agree within 1e-9") {
    val e = Tables.embeddings(spark, sf)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    val bad = e.crossJoin(broadcast(probe))
      .select(
        VectorFns.cosineSim(col("embedding"), col("pv")).as("u"),
        VectorFns.cosineSimNative(col("embedding"), col("pv")).as("n"))
      .filter(abs(col("u") - col("n")) > 1e-9)
    assert(bad.count() === 0)
  }

  test("udf_cosine_topk returns 10 rows, sims in [-1,1], strictly ordered") {
    val rows = Pipeline.udfCosineTopk(spark, sf).collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(!rows.map(_.getLong(0)).contains(0L), "probe excluded")
  }

  test("dedup_exact accounting: n_docs - n_uniq = n_dups, and totals match the table") {
    val rows = Pipeline.dedupExact(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) === r.getLong(3),
        s"accounting broken for lang ${r.getString(0)}")
    }
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
  }

  test("dedup is idempotent: distinct hash count equals count of dropDuplicates") {
    val hashed = Tables.documents(spark, sf).select(md5(col("text")).as("h"))
    assert(hashed.distinct().count() === hashed.dropDuplicates("h").count())
  }

  test("udaf_weighted equals decimal-sum ratio computed by plain aggregates") {
    val expected = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)") *
              col("l_quantity").cast("decimal(18,2)")).cast("double") /
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("exp"))
    val got = Pipeline.udafWeighted(spark, sf)
      .select(col("l_returnflag"), col("w_mean_price"))
    val bad = got.join(expected, "l_returnflag")
      .filter(abs(col("w_mean_price") - round(col("exp"), 6)) > 1e-9)
    assert(bad.count() === 0)
  }

  test("approx_count_distinct within 5% of exact per group") {
    // exact side computed HERE, not in the gated query — the gated plan
    // must stay sketch-only (no expand shuffle, see the plan test below)
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val bad = Aggregates.aggApprox(spark, sf)
      .join(exact, "l_returnflag")
      .filter(abs(col("approx_parts") - col("exact_parts")) >
        col("exact_parts") * 0.05)
    assert(bad.count() === 0)
  }

  test("agg_sketch_reagg: union-of-daily-sketches equals the direct whole-stream sketch") {
    // HLL union is register-wise max, so re-aggregating stored daily
    // sketches must give EXACTLY the estimate a direct pass over the
    // full stream gives — the property that makes sketch columns safe
    // to roll up at any later time without the raw data.
    val direct = Tables.events(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est"))
      .collect()(0).getLong(0)
    val rolled = Aggregates.aggSketchReagg(spark, sf)
      .filter(col("scope") === "total")
      .collect()(0).getLong(1)
    assert(rolled === direct)
  }

  test("agg_sketch_reagg: total estimate within 5% of exact distinct users") {
    val exact = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val est = Aggregates.aggSketchReagg(spark, sf)
      .filter(col("scope") === "total")
      .collect()(0).getLong(1)
    assert(math.abs(est - exact).toDouble <= exact * 0.05,
      s"est $est vs exact $exact")
  }

  test("agg_hll_intersect: full pair grid; inclusion-exclusion tracks the exact overlap") {
    val est = Aggregates.aggHllIntersect(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sets = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    assert(est.size === sets.size * (sets.size - 1) / 2,
      "one row per unordered event-type pair")
    for (((a, b), (ea, eb, ei)) <- est) {
      assert(a < b, "grid is the upper triangle")
      val exact = (sets(a) & sets(b)).size
      assert(math.abs(ei - exact).toDouble <= math.max(3.0, 0.15 * exact),
        s"($a,$b): est $ei vs exact $exact")
      assert(ei <= math.min(ea, eb) + math.max(3L, (0.15 * exact).toLong),
        s"($a,$b): intersection can't exceed either side beyond sketch noise")
    }
  }

  test("agg_hll_intersect: the pair grid joins only materialized sketch rows, zero stream rescans") {
    val plan = planOf(Aggregates.aggHllIntersect(spark, sf))
      .split("== Initial Plan ==").head
    // the one stream scan happened building the checkpointed sketch
    // table; the grid plan must reference ONLY that materialization
    // (an unmaterialized self-join re-scans once per side — the
    // aliased projections defeat exchange reuse)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 0, s"grid must not touch the raw stream; got $scans:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"grid joins the checkpointed sketch rows:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 5-row grid must broadcast:\n$plan")
  }

  test("embed_rproject: every output dim recomputes exactly from the sign polynomial") {
    // Output is 16 flattened scalar columns p0..p15 (gated outputs
    // carry scalars only — the driver's checker cannot hash arrays).
    val proj = Pipeline.embedRproject(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (0 until 16).map(j => r.getDouble(1 + j))).toMap
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(proj.keySet === embs.keySet)
    for ((id, v) <- embs; j <- 0 until 16) {
      var s = 0.0 // same left-to-right fold order as the Spark aggregate
      for (i <- v.indices) {
        val sign = if ((i * 37 + j * 101 + i * j * 13) % 4 < 2) 1.0 else -1.0
        s += v(i).toDouble * sign
      }
      val expect = BigDecimal(s)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(proj(id)(j) - expect) < 1e-9,
        s"vec $id dim $j: ${proj(id)(j)} != $expect")
    }
  }

  test("embed_rproject is map-side only: no exchange before the presentation sort") {
    val plan = planOf(Pipeline.embedRproject(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"a signed projection never shuffles:\n$plan")
  }

  test("bpeTrain learns the classic hand-computed merge sequence (ties break lexicographically)") {
    val spark2 = spark
    import spark2.implicits._
    // Sennrich's canonical example: low×5 lower×2 newest×6 widest×3.
    // Hand-derived pair counts: es=9, st=9 (tie → es), then est=9,
    // then lo=7, ow=7 (tie → lo), then low=7.
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val rules = graft.api.GraftOps.bpeTrain(corpus, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("bpeTrain merges left-to-right non-overlapping and stops when words collapse") {
    val spark2 = spark
    import spark2.implicits._
    // "aaa": round 1 merges (a,a) cnt 2 (two adjacent pairs), rewriting
    // to [aa, a] — NOT [aa, aa]; round 2 merges (aa, a); then no pairs
    // remain so requesting 10 merges stops at 2
    val rules = graft.api.GraftOps.bpeTrain(Seq("aaa").toDF("text"), "text", 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeEncode applies the rule sequence in order: hand-encoded words match") {
    val spark2 = spark
    import spark2.implicits._
    val rules = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = graft.api.GraftOps.bpeEncode(
        Seq((1L, "newest widest low lower")).toDF("id", "text"), "text", rules)
      .collect()(0)
    // newest→[n,e,w,est]=4, widest→[w,i,d,est]=4, low→[low]=1,
    // lower→[low,e,r]=3 ⇒ 12 tokens over 4 words
    assert(got.getAs[Long]("n_words") === 4L)
    assert(got.getAs[Long]("n_bpe_tokens") === 12L)
  }

  test("pipeline_bpe_encode: words <= bpe tokens <= chars, every doc covered") {
    val enc = Pipeline.pipelineBpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc.map(_._1).toSet === docs.keySet)
    for ((id, words, toks) <- enc) {
      val chars = docs(id).count(_ != ' ')
      assert(words <= toks && toks <= chars,
        s"doc $id: $words words <= $toks tokens <= $chars chars must hold")
    }
  }

  test("pipeline_bpe_train: 8 corpus rules, all pairs genuinely adjacent-frequent") {
    val rules = Pipeline.pipelineBpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.map(_._1).toSeq === (1L to 8L), "8 rounds in order")
    assert(rules.forall(_._4 > 0), "every learned pair occurs")
    // round 1's count must equal the true most-frequent adjacent char
    // pair over the distinct-word × freq table, recomputed brute-force
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]
    for ((w, f) <- words; i <- 0 until w.length - 1)
      pairCounts((w.substring(i, i + 1), w.substring(i + 1, i + 2))) =
        pairCounts.getOrElse((w.substring(i, i + 1), w.substring(i + 1, i + 2)), 0L) + f
    val best = pairCounts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
    assert((rules(0)._2, rules(0)._3) === best._1 && rules(0)._4 === best._2,
      s"round 1 ${rules(0)} must be the argmax pair $best")
  }

  test("pipeline_dataset_card: metrics self-consistent; no Expand anywhere in the plan") {
    val card = Pipeline.pipelineDatasetCard(spark, sf)
    val m = card.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet === Set("n_docs", "total_tokens", "total_chars",
      "n_langs", "n_sources", "n_distinct_texts"))
    assert(m("n_distinct_texts") <= m("n_docs"))
    assert(m("n_langs") >= 1.0 && m("n_sources") >= 1.0)
    assert(m("total_tokens") <= m("total_chars"),
      "space-separated tokens can never outnumber characters")
    val nDocs = Tables.documents(spark, sf).count().toDouble
    assert(m("n_docs") === nDocs)
    val plan = planOf(card).split("== Initial Plan ==").head
    assert(!plan.contains("Expand"),
      s"distinct cardinalities must ride the two-level stack shape:\n$plan")
  }

  test("agg_filter: all FILTER'd aggregates share ONE 2-phase pass, no Expand") {
    val df = Aggregates.aggFilter(spark, sf)
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), s"FILTER must not Expand:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one pass for every conditioned aggregate, got $scans")
    // conditioned counts bound by the unconditioned one
    for (r <- df.collect())
      assert(r.getLong(2) <= r.getLong(1), "filtered count <= group count")
  }

  test("agg_entropy: bounded by ln(n_sources), recomputes from raw counts") {
    val got = Aggregates.aggEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val counts = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet === counts.keySet)
    for ((lang, rows) <- counts) {
      val cs = rows.map(_._3.toDouble); val n = cs.sum
      val h = math.log(n) - cs.map(c => c * math.log(c)).sum / n
      val (nd, ns, gh) = got(lang)
      assert(nd === n.toLong && ns === cs.length.toLong)
      assert(gh >= -1e-9 && gh <= math.log(ns.toDouble) + 1e-9,
        s"$lang entropy $gh outside [0, ln($ns)]")
      assert(math.abs(gh - h) < 2e-6, s"$lang: $gh vs $h")
    }
  }

  test("agg_gini: in [0,1), recomputes from the sorted closed form; one shuffle") {
    val df = Aggregates.aggGini(spark, sf)
    val got = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP))).groupBy(_._1)
    for ((t, rows) <- vals) {
      val xs = rows.map(_._2).sorted
      val n = xs.length
      val six = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val g = 2.0 * six.toDouble / (n.toDouble * xs.sum.toDouble) - (n + 1.0) / n
      val (gn, gg) = got(t)
      assert(gn === n.toLong)
      assert(gg >= 0.0 && gg < 1.0, s"$t gini $gg out of range")
      assert(math.abs(gg - g) < 2e-6, s"$t: $gg vs $g")
    }
    val plan = planOf(df).split("== Initial Plan ==").head
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"moment aggregate must nest inside the rank window's shuffle, got $hash")
  }

  test("agg_regression: slope/intercept/r2 recompute from closed-form moments") {
    val got = Aggregates.aggRegression(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val epochUs = 1704067200000000L
    val raw = Tables.events(spark, sf)
      .select(col("event_type"),
        ((unix_micros(col("ts_utc")) - epochUs).cast("double") /
          lit(86400000000.0)).as("x"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(got.keySet === raw.keySet)
    for ((t, rows) <- raw) {
      val xs = rows.map(_._2); val ys = rows.map(_._3); val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val slope = sxy / sxx
      val (gs, gi, gr, gn) = got(t)
      assert(gn === n.toLong)
      assert(math.abs(gs - slope) < 1e-5, s"$t slope $gs vs $slope")
      assert(math.abs(gi - (my - slope * mx)) < 1e-4, s"$t intercept")
      assert(math.abs(gr - sxy * sxy / (sxx * syy)) < 1e-5, s"$t r2")
    }
  }

  test("agg_regression plans as one scan + one 2-phase aggregate, no Expand") {
    val plan = planOf(Aggregates.aggRegression(spark, sf))
      .split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"per-moment passes would re-scan; got $scans")
    assert(!plan.contains("Expand"), s"moments merge in ONE aggregate:\n$plan")
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"one shuffle of 5 groups' moments, got $hash")
  }

  test("percentile_approx within 1 quantity unit of the exact percentile per group") {
    // l_quantity is dense integers 1..50, and at accuracy 10000 the
    // sketch's rank error is <= n/10000 rows — far under one value step;
    // the sketch returns an actual data value while the exact form
    // interpolates, so the midpoint cases allow the 1.0 slack
    val exact = Aggregates.aggQuantile(spark, sf)
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"))
    val bad = Aggregates.aggApproxQuantile(spark, sf)
      .join(exact, "l_returnflag")
      .filter(abs(col("approx_median_qty") - col("median_qty")) > 1.0 ||
        abs(col("approx_p90_qty") - col("p90_qty")) > 1.0)
    assert(bad.count() === 0)
  }

  test("agg_approx_quantile plan is sketch-only: 2-phase HashAggregate, no sort") {
    val plan = planOf(Aggregates.aggApproxQuantile(spark, sf))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("HashAggregate"), plan)
    // the whole point vs the exact percentile: no per-group value
    // buffer sort below the aggregate (the final orderBy of 3 rows is
    // the only Sort allowed)
    assert(plan.linesIterator.count(_.trim.startsWith("+- Sort")) <= 1, plan)
  }

  test("count-min estimates bracket the exact counts: exact <= est <= exact + eps*N") {
    val exact = Tables.orders(spark, sf)
      .filter(col("o_custkey").between(1, 5))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("exact_orders"))
    val n = Tables.orders(spark, sf).count()
    val bad = Aggregates.aggApproxFreq(spark, sf)
      .join(exact, Seq("o_custkey"), "left")
      .select(col("o_custkey"), col("est_orders"),
        coalesce(col("exact_orders"), lit(0L)).as("exact_orders"))
      .filter(col("est_orders") < col("exact_orders") ||
        col("est_orders") > col("exact_orders") + lit((0.001 * n).ceil.toLong))
    assert(bad.count() === 0)
  }

  test("agg_approx plan is sketch-only: no Expand, single 2-phase HashAggregate") {
    val plan = planOf(Aggregates.aggApprox(spark, sf))
    assert(!plan.contains("Expand"),
      s"HLL plan must not pay the COUNT(DISTINCT) expand shuffle:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("text_stats token totals: sum over langs equals corpus-wide token count") {
    val perLang = Pipeline.textStats(spark, sf).agg(sum("n_tokens")).collect()(0).getLong(0)
    val corpus = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    assert(perLang === corpus)
  }

  test("multimodal_frames accounting: rows = Σ ceil(bytes/512), lens partition the blob") {
    val frames = graft.operators.Multimodal.multimodalFrames(spark, sf)
    val expectedRows = Tables.documents(spark, sf)
      .select(sum(ceil(length(col("text")) / 512.0).cast("long"))).collect()(0).getLong(0)
    assert(frames.count() === expectedRows)
    assert(frames.filter(col("frame_len") > 512 || col("frame_len") < 1).count() === 0)
    // frame lengths of each doc sum to the full blob size
    val bad = frames.groupBy(col("doc_id"))
      .agg(sum(col("frame_len")).as("total"))
      .join(Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("n")), "doc_id")
      .filter(col("total") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("pack_sequences conserves docs and tokens; bins contiguous from 0 per lang") {
    import org.apache.spark.sql.functions._
    val packed = Pipeline.packSequences(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(packed.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    assert(packed.agg(sum("n_tokens")).collect()(0).getLong(0) ===
      docs.agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0))
    // bins are a gapless 0..max sequence within each lang shard
    val bad = packed.groupBy("lang")
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(bad.count() === 0, "prefix-sum binning cannot skip a bin")
  }

  test("curation funnel metrics via observe: per-stage counts with zero extra scans") {
    // production pipelines need per-stage row accounting (how many docs
    // the quality gate dropped, how many the dedup kept) WITHOUT
    // re-running the plan per stage — Observation piggybacks named
    // aggregates on the one execution.
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obsIn = Observation("funnel_in")
    val obsQuality = Observation("funnel_quality")
    val docs = graft.sources.Tables.documents(spark, sf)
    val staged = docs
      .observe(obsIn, count(lit(1)).as("n"))
      .filter(size(split(col("text"), " ")) >= 50)
      .observe(obsQuality, count(lit(1)).as("n"))
    val kept = graft.api.GraftOps.deterministicSample(
      graft.api.GraftOps.dedupExactKeep(staged, "text", "doc_id"),
      "doc_id", 0.5).count()
    val nIn = obsIn.get("n").asInstanceOf[Long]
    val nQuality = obsQuality.get("n").asInstanceOf[Long]
    assert(nIn === docs.count(), "observe must count the raw input")
    assert(nQuality <= nIn && kept <= nQuality,
      s"funnel must be monotone: $nIn >= $nQuality >= $kept")
    assert(kept > 0)
  }

  test("pipeline_curate: quality gate filters on the scan side, below every Exchange") {
    // the funnel's cheapest win is dropping short docs BEFORE the dedup
    // window's shuffle — an Exchange between the scan and the quality
    // filter would shuffle the raw corpus at 100 TB
    val df = Pipeline.pipelineCurate(spark, sf)
    df.collect() // materialize AQE's final plan
    // AdaptiveSparkPlan prints Final THEN Initial — judge the final only
    val lines = planOf(df).linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    val plan = lines.mkString("\n")
    val fIdx = lines.indexWhere(l => l.contains("Filter") && l.contains(">= 50"))
    assert(fIdx >= 0, s"quality-gate filter not found in plan:\n$plan")
    // tree prints root-first, so everything after the filter line is its
    // input subtree (the plan is one linear chain): scan only, no shuffle
    assert(!lines.drop(fIdx + 1).exists(_.contains("Exchange")),
      s"no Exchange may sit between the scan and the quality gate:\n$plan")
  }

  test("pipeline_split: assignment is join-free map-side projection, counts conserve the corpus") {
    val df = Pipeline.pipelineSplit(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"split assignment must be a projection, not a join:\n$plan")
    // every doc lands in exactly one split
    assert(df.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).count())
  }

  test("pipeline_mixture: rates ride a broadcast join, corpus never sort-merge-shuffles") {
    val df = Pipeline.pipelineMixture(spark, sf)
    df.collect()
    val plan = planOf(df).linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-stratum rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the rate join:\n$plan")
    // the binding (smallest-capacity) language is kept whole
    val n = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = n.minBy(_._2)
    val kept = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(binding._1) === binding._2,
      s"binding stratum $binding must survive whole: $kept")
  }

  test("multimodal_join cardinality equals the embedding side (doc_id ⊇ vec_id)") {
    val joined = Pipeline.multimodalJoin(spark, sf).agg(sum("n_docs")).collect()(0).getLong(0)
    assert(joined === Tables.embeddings(spark, sf).count())
  }

  test("pipeline_drift_report: conservation, share identities, TVD bounds") {
    val rows = Pipeline.pipelineDriftReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val perLang = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet === perLang.keySet)
    rows.foreach { case (lang, na, nb, sa, sb, delta, _) =>
      assert(na + nb === perLang(lang), s"$lang: halves partition the docs")
      assert(math.abs(delta - (sa - sb)) < 2e-6)
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5, "A shares sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-5, "B shares sum to 1")
    val tvd = rows.head._7
    assert(rows.forall(r => math.abs(r._7 - tvd) < 1e-9),
      "TVD is a single corpus-level number")
    assert(tvd >= 0.0 && tvd <= 1.0)
    val brute = rows.map(r => math.abs(r._4 - r._5)).sum / 2.0
    assert(math.abs(tvd - brute) < 1e-5, "TVD = half the L1 distance")
  }

  test("sample_systematic: every 7th row by rank, evenly spread") {
    val rows = Pipeline.sampleSystematic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .orderBy(col("doc_id")).collect().map(_.getLong(0))
    val expect = ids.zipWithIndex
      .collect { case (id, i) if (i + 1) % 7 == 3 => (id, (i + 1).toLong) }
    assert(rows.toSeq === expect.toSeq, "exactly rank ≡ 3 (mod 7)")
    // even spread: consecutive kept ranks differ by exactly k
    assert(rows.map(_._2).sliding(2).forall {
      case Array(a, b) => b - a == 7; case _ => true
    })
  }

  test("pipeline_epoch_shuffle: full permutation per epoch, epochs decorrelated") {
    val rows = Pipeline.pipelineEpochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.length === nDocs.toInt, s"epoch $e covers every doc")
      assert(rs.map(_._3).sorted.toSeq === (1L to nDocs).toSeq,
        s"epoch $e ranks are a complete 1..n permutation")
      assert(rs.map(_._2).distinct.length === rs.length,
        s"epoch $e: each doc exactly once")
    }
    // the two epoch orders must differ (hash decorrelation): the rank
    // assignment agreeing on every doc would defeat the reshuffle
    val r0 = byEpoch(0L).map(r => r._2 -> r._3).toMap
    val agree = byEpoch(1L).count(r => r0(r._2) == r._3)
    assert(agree < nDocs / 10,
      s"epoch orders nearly identical: $agree/$nDocs fixed points")
  }

  test("multimodal_quality: entropy bounds and flag consistency") {
    val rows = graft.operators.Multimodal.multimodalQuality(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length === Tables.documents(spark, sf).count().toInt)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, nBytes, ent, low) =>
      val text = docs(id)
      assert(nBytes === text.length.toLong, "ASCII: bytes == chars")
      val distinct = text.toSet.size
      assert(ent >= -1e-9 && ent <= math.log(distinct.toDouble) /
        math.log(2.0) + 1e-6,
        s"doc $id: entropy within [0, log2(alphabet)]")
      assert(low === (ent < 4.0), "flag derives from the rounded entropy")
    }
  }

  test("sample_balanced: per-class cap, md5 pick order, WindowGroupLimit plan") {
    val df = Pipeline.sampleBalanced(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val classSizes = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    classSizes.foreach { case (lang, n) =>
      assert(picked(lang) === math.min(100L, n),
        s"$lang: picked ${picked(lang)} of $n (cap 100)")
    }
    // pick order is the md5 order (content-addressed, deterministic)
    def md5hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_._3).map(_._1)
      val expect = Tables.documents(spark, sf)
        .filter(col("lang") === lang).select(col("doc_id")).collect()
        .map(_.getLong(0)).sortBy(id => (md5hex(id), id)).take(100)
      assert(byRank.toSeq === expect.toSeq, s"$lang pick order must be md5 order")
    }
    // the literal cap must push a group-limit below the exchange
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"literal rank cap should plan a WindowGroupLimit:\n$plan")
  }

  test("pipeline_curriculum: ntile balance, coverage, ordered phase ranges") {
    val rows = Pipeline.pipelineCurriculum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val classSizes = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, ph) =>
      assert(ph.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L),
        s"$lang: all four phases present")
      assert(ph.map(_._3).sum === classSizes(lang), s"$lang docs conserved")
      // NTILE balance: bucket sizes differ by at most 1
      assert(ph.map(_._3).max - ph.map(_._3).min <= 1, s"$lang balanced")
      // phases are ordered by difficulty: ranges are non-decreasing
      val sorted = ph.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 <= b._5,
            s"$lang phase ${a._2} max ${a._6} vs phase ${b._2} min ${b._5}")
        case _ =>
      }
    }
  }

  test("embed_norm_audit: brute-force norms, stats, and 3-sigma counts") {
    val rows = Pipeline.embedNormAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0).toLong,
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map { case (_, v) =>
      r6(math.sqrt(v.map(x => x * x).sum))
    }).toMap
    rows.foreach { case (label, n, mu, sd, outliers) =>
      val norms = byLabel(label)
      assert(n === norms.length.toLong)
      val bm = norms.sum / norms.length
      val bsd = math.sqrt(
        norms.map(x => (x - bm) * (x - bm)).sum / (norms.length - 1))
      assert(math.abs(mu - bm) < 1e-5, s"label $label mean norm")
      assert(math.abs(sd - bsd) < 1e-5, s"label $label sd norm")
      val bOut = norms.count(x => math.abs(x - bm) > 3 * bsd)
      assert(outliers === bOut.toLong, s"label $label outliers")
    }
  }

  test("pipeline_mix_plan: scarcest language binds; plan is feasible") {
    val rows = Pipeline.pipelineMixPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    val counts = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = counts.keys.map(l =>
      l -> (if (l == "en") 0.40 else 0.15)).toMap
    val m = counts.map { case (l, n) => n / targets(l) }.min
    rows.foreach { case (lang, n, share, t, planned, rate) =>
      assert(n === counts(lang))
      assert(t === targets(lang))
      assert(planned === math.floor(m * t).toLong, s"$lang planned")
      assert(planned <= n, s"$lang plan never upsamples")
      assert(math.abs(rate - planned.toDouble / n) < 5e-7, s"$lang rate")
      assert(math.abs(share - n.toDouble / counts.values.sum) < 5e-7)
    }
    // at least one language is kept (almost) whole — the binder
    assert(rows.map(_._6).max > 0.99 - 1e-6, "the scarcest language binds")
    // planned mixture hits the target shares exactly up to floor error
    val plannedTotal = rows.map(_._5).sum.toDouble
    rows.foreach { case (lang, _, _, t, planned, _) =>
      assert(math.abs(planned / plannedTotal - t) < 0.01,
        s"$lang planned share ~ target")
    }
  }
}
