package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Text}
import graft.sources.Tables

/** Invariants of the text-analysis and multimodal-stub operators (their
  * exactness is oracle-gated; these pin internal consistency).
  */
class TextSpec extends SparkTestBase {

  test("text_quality: stopword count bounded by token count; avg token length positive") {
    val bad = Text.textQuality(spark, sf)
      .filter(col("n_stop") > col("n_tokens") || col("avg_token_len") <= 0.0)
    assert(bad.count() === 0)
  }

  test("text_fingerprint: fingerprints never exceed docs; counts conserve") {
    val rows = Text.textFingerprint(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
  }

  test("text_langid partitions the corpus: per-lang guess counts sum to doc count") {
    val total = Text.textLangid(spark, sf).agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === Tables.documents(spark, sf).count())
  }

  test("text_winnow accounting: doc totals match, exact dups always share") {
    val w = Text.textWinnow(spark, sf)
    assert(w.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).count())
    // deterministic across runs (fixed xxhash64 seed, fixed k/w)
    assert(w.collect().sameElements(Text.textWinnow(spark, sf).collect()))
    // sharing count never exceeds doc count per source
    assert(w.filter(col("n_docs_sharing") > col("n_docs")).count() === 0)
  }

  test("text_winnow sharing scan has bounded aggregation state (no collect_set)") {
    // the round-5 verdict's skew hazard: collect_set(doc_id) per
    // fingerprint materializes an unbounded array in one reducer row
    // when a boilerplate fingerprint is shared corpus-wide
    val plan = planOf(Text.textWinnow(spark, sf))
    assert(!plan.contains("collect_set") && !plan.contains("collect_list"),
      s"unbounded per-group collect crept back into the sharing scan:\n$plan")
  }

  test("text_chunk: chunk count formula, full coverage, no fully-redundant tail") {
    val chunks = Text.textChunk(spark, sf).collect()
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet === nTok.keySet, "every document must be chunked")
    byDoc.foreach { case (doc, cs) =>
      val n = nTok(doc)
      // count = max(0, ceil((n - 64)/48)) + 1 — short docs are exactly
      // one chunk, never a redundant tail fully inside chunk 0
      val expect = math.max(0, math.ceil((n - 64).toDouble / 48).toInt) + 1
      assert(cs.length === expect, s"doc $doc: $n tokens, ${cs.length} chunks")
      val sorted = cs.sortBy(_.getLong(1))
      // indices dense from 0, starts at stride multiples
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i && r.getLong(2) === 48L * i)
      }
      // coverage conservation: last chunk reaches exactly token n
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) === n,
        s"doc $doc: coverage ends at ${last.getLong(2) + last.getLong(3)} of $n")
      // every non-final chunk is a full window
      sorted.init.foreach(r => assert(r.getLong(3) === 64L))
    }
  }

  test("text_chunk plan: one Generate, no exchange before the presentation sort") {
    val plan = planOf(Text.textChunk(spark, sf))
    assert(plan.split("Generate").length - 1 === 1,
      s"chunking must fan out through exactly one Generate:\n$plan")
    // the ONLY exchange is the final orderBy's range partitioning — the
    // chunking itself (tokenize → explode → slice → hash) is map-side
    val exchanges = plan.split("Exchange").length - 1
    assert(exchanges <= 1, s"map-side chunking gained a shuffle:\n$plan")
    assert(!plan.contains("collect_set") && !plan.contains("collect_list"))
  }

  test("text_keywords: k rows per doc, rank-ordered scores, tf·idf recomputes") {
    val kw = graft.operators.Text.textKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val dfreq = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val byDoc = kw.groupBy(_._1)
    assert(byDoc.keySet === docs.keySet, "every document gets keywords")
    for ((d, rows) <- byDoc) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.length <= 3 &&
        sorted.length === math.min(3, docs(d).distinct.length))
      // scores non-increasing in rank, and each recomputes from scratch
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true })
      for ((_, _, tok, score) <- sorted) {
        val tf = docs(d).count(_ == tok).toDouble
        val expect = tf * math.log(n / dfreq(tok))
        assert(math.abs(score - expect) < 2e-6, s"doc $d '$tok': $score != $expect")
      }
    }
  }

  test("keyword-tag BUILD plan: ONE Generate (vocab is prebuilt), no corpus re-tokenize") {
    // The declared text_keywords query reads the keyword_tags artifact
    // (r12); the plan discipline applies to the artifact BUILD — the
    // docKeywords pass that writes it.
    val plan = planOf(graft.api.GraftOps.docKeywords(
        graft.sources.Tables.documents(spark, sf)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", k = 3))
      .split("== Initial Plan ==").head
    val gens = plan.linesIterator.count(_.contains("Generate explode"))
    assert(gens === 1, s"scoring pass must tokenize exactly once:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      s"df table must be the materialized checkpoint, not a live re-aggregate:\n$plan")
  }

  test("text_keywords reads the per-corpus keyword_tags artifact") {
    val plan = planOf(graft.operators.Text.textKeywords(spark, sf))
    assert(plan.contains("keyword_tags"),
      s"declared query must read the written artifact:\n$plan")
  }

  test("text_bigram_lm: every doc scored, scores non-positive, bigram count = tokens - 1") {
    val scored = Text.textBigramLm(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("exp_bi"))
    assert(scored.count() === docs.count(), "every document must be scored")
    val bad = scored.join(docs, "doc_id")
      .filter(col("n_bigrams") =!= col("exp_bi") || col("avg_logprob") > 0.0)
      .count()
    assert(bad === 0L, "bigram accounting or probability sign broken")
  }

  test("text_redact: two-level distinct-shape agg plans without Expand; digits all masked") {
    val df = Text.textRedact(spark, sf)
    df.collect()
    assert(!planOf(df).contains("Expand"),
      "distinct-shape count must aggregate two-level, not via Expand")
    // every digit is consumed by a mask: no masked shape may contain one
    val leaky = df.filter(col("shape_min").rlike("[0-9]") ||
      col("shape_max").rlike("[0-9]")).count()
    assert(leaky === 0L, "redacted output still contains digits")
  }

  test("text_decontaminate accounting: counts bounded, probe docs excluded") {
    val d = Text.textDecontaminate(spark, sf)
    assert(d.filter(col("n_contaminated") > col("n_docs")).count() === 0)
    assert(d.agg(sum("n_docs")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).filter(col("doc_id") >= 10).count())
    // the probe overlaps itself: at least one 5-gram hit exists somewhere
    assert(d.agg(sum("n_contaminated")).collect()(0).getLong(0) >= 0)
  }

  test("text_logprob: every doc scored, scores strictly negative (tf < N always)") {
    val lp = Text.textLogprob(spark, sf)
    assert(lp.count() === Tables.documents(spark, sf).count())
    assert(lp.filter(col("avg_logprob") >= 0.0).count() === 0,
      "ln(tf/N) < 0 whenever any second token exists in the corpus")
    // token accounting matches the raw split
    assert(lp.agg(sum("n_tokens")).collect()(0).getLong(0) ===
      Tables.documents(spark, sf)
        .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0))
  }

  test("multimodal_decode: stub metadata is consistent with the blob bytes") {
    val d = Multimodal.multimodalDecode(spark, sf)
    val joined = d.join(Tables.documents(spark, sf), "doc_id")
    // ASCII corpus ⇒ byte length == char length; header == first 4 chars hex
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() === 0)
    assert(joined.filter(col("header") =!= lower(hex(substring(col("text"), 1, 4)))).count() === 0)
    assert(d.count() === Tables.documents(spark, sf).count())
  }

  test("text_vocab_growth: curve ends at the true vocabulary; monotone; conserves") {
    val rows = Text.textVocabGrowth(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    assert(rows.length === docs.length, "one curve point per document")
    val last = rows.last
    assert(last.getLong(3) === docs.map(_._2.size).sum.toLong,
      "cumulative tokens = corpus tokens")
    assert(last.getLong(4) === docs.flatMap(_._2).distinct.size.toLong,
      "final vocab_size = true distinct type count")
    // vocab is nondecreasing and bounded by tokens at every prefix
    for (i <- 1 until rows.length) {
      assert(rows(i).getLong(4) >= rows(i - 1).getLong(4), "monotone vocab")
      assert(rows(i).getLong(3) === rows(i - 1).getLong(3) + rows(i).getLong(1),
        "cum_tokens chains")
      assert(rows(i).getLong(4) <= rows(i).getLong(3), "types <= tokens")
    }
    // first-occurrence attribution: doc 0's new_types = its distinct tokens
    val firstDoc = rows.head
    val firstTokens = docs.minBy(_._1)._2.distinct.size.toLong
    assert(firstDoc.getLong(2) === firstTokens, "first doc introduces all its types")
  }

  test("text_vocab_growth plan pin: every window partitions by the shard key") {
    // The r8 perf-weak finding: the spine cumsum was an unpartitioned
    // window (one task sorting the corpus spine at 10⁹ docs). Now it
    // rides globalPrefixSums — every WindowExec in the plan must carry
    // the __shard partition key.
    val df = Text.textVocabGrowth(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, "running-sum windows present")
    winLines.foreach(l => assert(l.contains("__shard"),
      s"window must partition by __shard, never a global sort: $l"))
  }

  test("text_oov_rate plan pin: top-k heap selection, never a vocab-sized global sort") {
    val df = Text.textOovRate(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10k must plan as per-partition bounded heaps:\n$plan")
  }

  test("text_pmi: counts and PMI recompute from a brute-force token walk") {
    val rows = Text.textPmi(spark, sf).collect()
    assert(rows.nonEmpty, "corpus has >= 5x repeated bigrams")
    val docs = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = docs.map(_.size).sum.toLong
    val pairs = docs.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // exactly the >= 5 pairs, no mirrors invented, counts exact
    val expect = pairs.filter(_._2 >= 5)
    assert(rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap === expect)
    rows.foreach { r =>
      val (w1, w2, np, n1, n2) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n1 === uni(w1) && n2 === uni(w2), "unigram counts")
      val pmi = BigDecimal(math.log((np * n).toDouble / (n1 * n2).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - pmi) < 1e-9, s"pmi($w1,$w2)")
    }
  }

  test("text_zipf: OLS over the rank-frequency table matches brute force") {
    val r = Text.textZipf(spark, sf).collect().head
    val (nTypes, slope, intercept) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val freqs = Tables.documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    assert(nTypes === freqs.length.toLong)
    val pts = freqs.sortBy { case (tok, f) => (-f, tok) }.zipWithIndex
      .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val bruteSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - bruteSlope) < 1e-6, s"slope $slope vs $bruteSlope")
    assert(math.abs(intercept - (sy - bruteSlope * sx) / n) < 1e-6)
    assert(slope < 0, "frequency decays with rank")
  }

  test("text_hapax: brute-force per-language frequency spectrum head") {
    val rows = graft.operators.Text.textHapax(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).view.mapValues { ds =>
      val toks = ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      val freq = toks.groupBy(identity).view.mapValues(_.length).toMap
      (toks.length.toLong, freq.size.toLong,
        freq.values.count(_ == 1).toLong)
    }.toMap
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.foreach { case (lang, nTok, vocab, hapax, ratio) =>
      val (bTok, bVocab, bHapax) = byLang(lang)
      assert(nTok === bTok && vocab === bVocab && hapax === bHapax,
        s"$lang: ($nTok,$vocab,$hapax) vs brute ($bTok,$bVocab,$bHapax)")
      assert(hapax <= vocab && vocab <= nTok, s"$lang spectrum identities")
      assert(math.abs(ratio - hapax.toDouble / vocab) < 1e-9)
    }
  }

  test("text_vocab_jaccard: brute-force pairwise vocabulary overlap") {
    val rows = graft.operators.Text.textVocabJaccard(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocabs = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty).toSet).toMap
    val langs = vocabs.keys.toSeq.sorted
    val pairs = for {
      i <- langs.indices; j <- i + 1 until langs.size
    } yield (langs(i), langs(j))
    assert(rows.map(_._1).toSet === pairs.toSet, "all C(k,2) pairs present")
    rows.foreach { case ((a, b), (va, vb, common, jac)) =>
      val (sa, sb) = (vocabs(a), vocabs(b))
      assert(va === sa.size.toLong && vb === sb.size.toLong)
      val inter = (sa intersect sb).size.toLong
      assert(common === inter, s"($a,$b) intersection $common vs $inter")
      val expect = inter.toDouble / (sa union sb).size
      assert(math.abs(jac - expect) < 1e-9, s"($a,$b) jaccard")
      assert(jac > 0.0 && jac <= 1.0)
    }
  }

  test("text_code_detect: brute-force char densities; flag from rounded ratio") {
    val rows = graft.operators.Text.textCodeDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (id, n, symR, digR, mtl, flag) =>
      val text = docs(id)
      assert(n === text.length.toLong)
      val sym = text.count("{}[]();=<>".contains(_))
      val dig = text.count(_.isDigit)
      val toks = text.split(" ", -1).length
      assert(symR === r6(sym.toDouble / text.length), s"$id symbols")
      assert(digR === r6(dig.toDouble / text.length), s"$id digits")
      assert(mtl === r6((text.length - (toks - 1)).toDouble / toks),
        s"$id mean token len")
      assert(flag === (symR > 0.02), s"$id flag from ROUNDED ratio")
    }
  }

  test("text_oov_rate: brute-force coverage at every budget; monotone") {
    val rows = graft.operators.Text.textOovRate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq === Seq(1000L, 5000L, 10000L))
    // larger budget covers at least as much
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true
    })
    val freq = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = freq.values.sum
    val ordered = freq.toSeq.sortBy { case (w, c) => (-c, w) }
    rows.foreach { case (budget, vocab, covered, tot, oov) =>
      assert(vocab === freq.size.toLong)
      assert(tot === total)
      val bruteCov = ordered.take(budget.toInt).map(_._2).sum
      assert(covered === bruteCov, s"budget $budget coverage")
      assert(math.abs(oov - (1.0 - bruteCov.toDouble / total)) < 5e-7)
    }
  }

  test("text_js_divergence: brute-force JS; bounds and symmetry of pairs") {
    val rows = graft.operators.Text.textJsDivergence(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3))))
    assert(rows.length === 10, "C(5,2) language pairs")
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dist = docs.groupBy(_._1).view.mapValues { ds =>
      val toks = ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      val n = toks.length.toDouble
      toks.groupBy(identity).view.mapValues(_.length / n).toMap
    }.toMap
    def h(p: Iterable[Double]) = p.filter(_ > 0).map(x => -x * math.log(x)).sum
    rows.foreach { case ((a, b), (js, jsNorm)) =>
      val (pa, pb) = (dist(a), dist(b))
      val support = pa.keySet union pb.keySet
      val hm = h(support.toSeq.map(w =>
        (pa.getOrElse(w, 0.0) + pb.getOrElse(w, 0.0)) / 2))
      val brute = hm - (h(pa.values) + h(pb.values)) / 2
      assert(math.abs(js - brute) < 1e-5, s"($a,$b) JS $js vs $brute")
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9,
        s"($a,$b) JS in [0, ln2]")
      assert(math.abs(jsNorm - js / math.log(2.0)) < 2e-6)
    }
  }

  test("text_edit_distance: brute-force blocked pairs with a reference Levenshtein DP") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect().map { r =>
        // split(-1) semantics: KEEP trailing empties, like Spark's
        // functions.split (limit -1) and DuckDB string_split — Java's
        // default split(., 0) would drop them and skew the last token
        val toks = r.getString(3).split(" ", -1)
        (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3).take(48), toks.head, toks.last)
      }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    // With the neighbor-block fan-out, (same first OR last token,
    // |Δn_chars| <= 8) IS the candidate definition (Δ <= 8 < 16 ⇒
    // bucket diff <= 1, always covered) — pairs straddling a 16-char
    // boundary (15 vs 17) are candidates. The first-token content key
    // is the r15 scale fix (the length-only key's blocks grow ∝ n);
    // the last-token second pass is the r16 recall recovery.
    val pairs = for {
      a <- docs; b <- docs
      if a._2 == b._2 && (a._5 == b._5 || a._6 == b._6) && a._1 < b._1 &&
        math.abs(a._3 - b._3) <= 8
    } yield (a._2, lev(a._4, b._4))
    // Candidate recall vs the UNBLOCKED truth (all same-lang |Δ|<=8
    // pairs at dist <= 12): documents what each blocking pass captures.
    locally {
      val truth = (for {
        a <- docs; b <- docs
        if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) <= 8 &&
          lev(a._4, b._4) <= 12
      } yield (a._1, b._1)).toSet
      if (truth.nonEmpty) {
        def captured(p: ((Long, String, Long, String, String, String),
            (Long, String, Long, String, String, String)) => Boolean) =
          truth.count { case (ia, ib) =>
            val a = docs.find(_._1 == ia).get; val b = docs.find(_._1 == ib).get
            p(a, b)
          }.toDouble / truth.size
        val rA = captured((a, b) => a._5 == b._5)
        val rAB = captured((a, b) => a._5 == b._5 || a._6 == b._6)
        info(f"close-pair candidate recall: first-token $rA%.3f, "
          + f"first-or-last $rAB%.3f over ${truth.size} truth pairs")
        assert(rAB >= rA, "second pass must not lose candidates")
      } else info("no close pairs at this sf — recall not measurable")
    }
    val brute = pairs.groupBy(_._1).map { case (l, ps) =>
      val ds = ps.map(_._2)
      l -> (ds.length.toLong, ds.count(_ == 0).toLong,
        ds.count(_ <= 12).toLong, ds.min.toLong,
        ds.sum.toDouble / ds.length)
    }
    val got = Text.textEditDistance(spark, sf).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet === brute.keySet, "language coverage")
    got.foreach { case (l, (np, ne, nc, mn, av)) =>
      val (bp, be, bc, bm, ba) = brute(l)
      assert(np === bp, s"$l pair count")
      assert(ne === be, s"$l exact pairs")
      assert(nc === bc, s"$l close pairs")
      assert(mn === bm, s"$l min dist")
      assert(math.abs(av - ba) < 1e-5, s"$l avg dist")
      assert(ne <= nc && nc <= np, s"$l monotone counts")
    }
  }
}
