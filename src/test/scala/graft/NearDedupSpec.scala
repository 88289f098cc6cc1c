package graft

import org.apache.spark.sql.functions._
import graft.operators.{NearDedup, Pipeline}
import graft.sources.Tables

/** Accuracy properties of the approximate dedup paths (no SQL oracle —
  * these ARE the correctness gate for dedup_minhash / dedup_simhash).
  */
class NearDedupSpec extends SparkTestBase {

  // Exact text duplicates only exist at sf0.1 (8 dup docs; verified
  // count(*) = count(DISTINCT text) at the smaller sfs) — test there.
  private val dupSf = "/root/testdata/sf0.1"

  test("minhash finds every exact-duplicate pair at distance 0") {
    // ground truth: doc_id pairs sharing an identical text (md5 groups)
    val hashed = Tables.documents(spark, dupSf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val exactPairs = hashed.as("a").join(hashed.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val nExact = exactPairs.count()
    assert(nExact > 0, "corpus must contain exact duplicates for this test")

    val found = NearDedup.dedupMinhash(spark, dupSf)
    val foundExact = found.filter(col("est_dist") === 0.0)
      .select(col("doc_a"), col("doc_b"))
    assert(exactPairs.except(foundExact).count() === 0,
      "every exact-dup pair must surface at estimated distance 0")
  }

  test("minhash result is deterministic across runs (fixed seed)") {
    val a = NearDedup.dedupMinhash(spark, sf).collect()
    val b = NearDedup.dedupMinhash(spark, sf).collect()
    assert(a.sameElements(b))
  }

  // r15: these two tests replaced the r2–r14 "≡ MLlib
  // approxSimilarityJoin" row-identity pin when the signature stage
  // went native (GraftOps.minhashSignatures scaladoc — the MLlib
  // VectorUDT/UDF stage read last-decade exp ~1.3 on the 1000×
  // ladder). THE DIFF, explained: the hash family changed (murmur3
  // into 2¹⁸ HashingTF bins + MLlib's seeded perms → xxhash64 into
  // [0, 2³¹−1) + published (a·h+b) mod p perms), so borderline
  // candidate SETS can differ pair-by-pair between the families —
  // exact duplicates still surface in every band under either. The
  // replacement pin is STRONGER than the old one: a driver-side
  // closed form of the entire production pipeline (signatures, band
  // buckets, Jaccard verify, threshold, cross-band dedup) must be
  // row-identical, the same style dedup_minhash_md5 gates via DuckDB.

  test("native signature stage ≡ independent explode/groupBy-min plan (row-identical)") {
    import graft.api.GraftOps
    val p = GraftOps.MinhashPrime
    val coeffs = GraftOps.minhashCoefficients(3)
    val got = GraftOps.minhashSignatures(
        Tables.documents(spark, dupSf), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSet, r.getSeq[Long](2)))
      .toMap
    // independent plan shape: explode + per-row hash + groupBy-min —
    // no array HOFs anywhere, so the array_min/transform algebra is
    // checked through a genuinely different execution path
    val aggs = coeffs.zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("x") + lit(b)) % lit(p)).as(s"h$j") }
    val expect = Tables.documents(spark, dupSf)
      .select(col("doc_id"),
        explode(GraftOps.shingles(GraftOps.tokens(col("text")))).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(p)).as("x"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_set(col("x")).as("xs"), aggs: _*)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSet, Seq(r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, (idx, h)) =>
      assert(idx === expect(id)._1, s"doc $id feature set diverged")
      assert(h === expect(id)._2, s"doc $id signature diverged")
    }
  }

  test("dedup_minhash equals the driver-side closed form (bands, buckets, jaccard)") {
    // full-pipeline twin: rebuild candidate pairs from per-band hash
    // buckets in plain Scala over the collected signature table, verify
    // with exact set Jaccard, threshold, dedup — must match the engine
    // row-for-row including est_dist values
    val sig = graft.api.GraftOps.minhashSignatures(
        Tables.documents(spark, dupSf), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Long](2)))
    val expect = (0 until 3).flatMap { j =>
      sig.groupBy(_._3(j)).valuesIterator.flatMap { bucket0 =>
        val bucket = bucket0.toSeq
        for {
          (ia, sa, _) <- bucket; (ib, sb, _) <- bucket
          if ia < ib
          dist = 1.0 - sa.intersect(sb).size.toDouble / sa.union(sb).size
          if dist <= 0.1
        } yield (ia, ib) ->
          BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = NearDedup.dedupMinhash(spark, dupSf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === expect,
      s"minhash pipeline diverged: extra=${got.keySet -- expect.keySet} " +
        s"missing=${expect.keySet -- got.keySet}")
    assert(got.nonEmpty, "dupSf must produce near-dup pairs")
  }

  test("minhash join reads ONLY the materialized signature table (no raw-text rescans)") {
    // the round-2 perf bug: the LSH lineage re-ran on both sides of the
    // join (6 scans of documents across 3 bands). After materialization
    // every FileScan in the join plan must point at the signature
    // parquet, never at documents.parquet.
    val df = NearDedup.dedupMinhash(spark, sf) // triggers the one-time writes
    val plan = planOf(df)
    assert(!plan.contains("documents.parquet"),
      s"join must not rescan the raw corpus:\n$plan")
    // r12: the declared query reads the PAIR artifact (the edge-set
    // rung); the band join's signature-table discipline moved to the
    // pair BUILD plan, pinned below
    assert(plan.contains("minhash_pairs_"),
      s"query must read the pair table:\n$plan")
    // by-name build arg: dedupMinhash above already wrote the sig
    // artifact in this JVM, so once() serves the re-read and the build
    // expression is not evaluated
    val sig = graft.sources.Materialize.once(spark, sf, Seq("documents"),
      "minhash_sig")(graft.api.GraftOps.minhashSignatures(
        graft.sources.Tables.documents(spark, sf), "doc_id", "text"))
    val buildPlan = planOf(graft.api.GraftOps.minhashPairsFromSignatures(
      sig, "doc_id", maxDist = 0.1))
    assert(!buildPlan.contains("documents.parquet"),
      s"pair build must not rescan the raw corpus:\n$buildPlan")
    assert(buildPlan.contains("minhash_sig_"),
      s"pair build must read the sig table:\n$buildPlan")
  }

  test("pipeline_near_dedup keeps exactly one survivor per cluster") {
    // every connected component contributes exactly one survivor (its
    // min-id representative), so total survivors == total clusters in
    // dedup_cluster's histogram — the funnel-count observation tying
    // the composed query to its component stages
    val survivors = NearDedup.pipelineNearDedup(spark, sf)
      .agg(sum(col("n_survivors"))).collect()(0).getLong(0)
    val clusters = NearDedup.dedupCluster(spark, sf)
      .agg(sum(col("n_clusters"))).collect()(0).getLong(0)
    assert(survivors === clusters,
      s"$survivors survivors vs $clusters clusters")
    // and the funnel never keeps more docs than exist
    val docs = Tables.documents(spark, sf).count()
    assert(survivors <= docs && survivors > 0)
  }

  test("dedup_bloom: prefiltered verify equals full verify (no false negatives), fpp bounded") {
    // run at dupSf where exact text duplicates actually exist
    val got = NearDedup.dedupBloom(spark, dupSf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // full verify (no bloom): the same split joined exhaustively
    val docs = Tables.documents(spark, dupSf)
    val mid = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2
    val history = docs.filter(col("doc_id") <= mid).select(md5(col("text")).as("h")).distinct()
    val full = docs.filter(col("doc_id") > mid)
      .select(col("lang"), md5(col("text")).as("h"))
      .join(history, Seq("h"), "left_semi")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- full)
      assert(got(lang)._3 === n,
        s"$lang: bloom-prefiltered verify missed dups (${got(lang)._3} vs $n)")
    // candidates = true dups + false positives; at fpp ~3% (1M items
    // sized for far more than this corpus) FPs should be near zero
    for ((lang, (batch, cand, dups)) <- got)
      assert(cand - dups <= math.max(5L, batch / 20),
        s"$lang: false-positive count ${cand - dups} out of bound")
  }

  test("graph_reach: seeds at hops 0, bound respected, shortest-path consistency") {
    val rows = NearDedup.graphReach(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exactness is oracle-gated; these pin the recursion invariants
    rows.foreach { case (doc, (hops, paths)) =>
      assert(hops >= 0 && hops <= 3, s"doc $doc: hops $hops out of bound")
      assert(paths >= 1, s"doc $doc: zero walks")
    }
    // every seed present with hops 0 and exactly one zero-hop walk each
    (0L until 5L).foreach { s =>
      assert(rows.contains(s) && rows(s)._1 === 0L, s"seed $s must be hops 0")
    }
    // non-seeds cannot be at hops 0
    rows.foreach { case (doc, (hops, _)) =>
      if (doc >= 5L) assert(hops >= 1L, s"non-seed $doc at hops 0")
    }
  }

  test("simhash collides at least as often as exact duplication") {
    // sig is a pure function of text ⇒ distinct sigs <= distinct texts
    val sim = NearDedup.dedupSimhash(spark, sf)
      .agg(sum("n_docs"), sum("n_collided")).collect()(0)
    val exactDups = Pipeline.dedupExact(spark, sf)
      .agg(sum("n_dups")).collect()(0).getLong(0)
    assert(sim.getLong(0) === Tables.documents(spark, sf).count())
    assert(sim.getLong(1) >= exactDups)
  }

  test("graph_degree_dist: docs partition across degrees; handshake lemma holds") {
    import org.apache.spark.sql.functions._
    val rows = NearDedup.graphDegreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._2).sum === Tables.documents(spark, sf).count(),
      "every document has exactly one degree")
    // Σ degree·count = 2·|edges| — brute-force the banded edge rule
    // (next-two-ids, 3-gram Jaccard >= 0.01) on the driver
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).toSeq.sliding(3)
          .map(_.mkString(" ")).toSet)
      .toMap
    val nEdges = docs.keys.toSeq.flatMap(i => Seq(i + 1, i + 2).map(i -> _))
      .count { case (a, b) =>
        docs.contains(b) && {
          val (ga, gb) = (docs(a), docs(b))
          val j = BigDecimal(ga.intersect(gb).size.toDouble /
            ga.union(gb).size.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          j >= BigDecimal("0.01")
        }
      }
    assert(rows.map { case (d, n) => d * n }.sum === 2L * nEdges,
      s"handshake: sum(deg*n) must equal 2*|edges| = ${2 * nEdges}")
    assert(rows.map(_._1).distinct.length === rows.length, "one row per degree")
  }

  test("graph_adamic_adar: non-adjacent pairs only, scores ordered and bounded") {
    val rows = NearDedup.graphAdamicAdar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 100, "top-100 head")
    rows.foreach { case (a, b, nc, aa) =>
      assert(a < b, "canonical pair order")
      assert(nc >= 1, "at least one common neighbour")
      // deg(v) >= 2 for any common neighbour => each term <= 1/ln(2)
      assert(aa > 0 && aa <= nc / math.log(2.0) + 1e-9,
        s"AA bounded by n_common/ln(2): $aa vs $nc")
    }
    // descending score, ties by pair
    assert(rows.sliding(2).forall {
      case Array((a1, b1, _, s1), (a2, b2, _, s2)) =>
        s1 > s2 || (s1 == s2 && (a1 < a2 || (a1 == a2 && b1 < b2)))
      case _ => true
    }, "ordering: aa desc, then pair")
  }

  test("dedup_prefix: groups match brute force, representatives are min ids") {
    val rows = NearDedup.dedupPrefix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "prefix-4 collisions exist at every sf by construction")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).take(4).mkString(" ")))
    val brute = docs.groupBy(_._2).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._1).min))
      .filter(_._2._1 > 1).toMap
    assert(rows.map(_._1).toSet === brute.keySet)
    rows.foreach { case (p, n, keep) =>
      assert((n, keep) === brute(p), s"group '$p'")
    }
  }

  test("dedup_prefix plans as ONE hash aggregate on the prefix key — never pairwise") {
    val plan = planOf(NearDedup.dedupPrefix(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"equi-key dedup must not join:\n$plan")
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"one prefix-key shuffle, got $hash:\n$plan")
  }

  test("graph_clustering: structural bounds and internal consistency") {
    val rows = NearDedup.graphClustering(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // triangles per node must agree with graph_triangles exactly
    val triRows = NearDedup.graphTriangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, deg, tri, c) =>
      assert(deg >= 1, s"$id appears in an edge, degree >= 1")
      assert(tri === triRows.getOrElse(id, 0L), s"$id triangle count")
      // a node's triangles can't exceed its neighbour pairs
      assert(tri <= deg * (deg - 1) / 2, s"$id: tri $tri vs C($deg,2)")
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"$id clustering in [0,1]")
      if (deg < 2) assert(c === 0.0, s"$id degree-1 guard")
      else {
        val expect = BigDecimal(2.0 * tri / (deg * (deg - 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(c - expect) < 1e-9, s"$id c recomputes")
      }
    }
    // clustering only covers vertices WITH edges; triangle nodes ⊆ them
    assert(triRows.keySet.subsetOf(rows.map(_._1).toSet))
  }

  test("graph_assortativity: handshake identity with degrees; |r| <= 1") {
    val row = NearDedup.graphAssortativity(spark, sf).collect()(0)
    val (m, r) = (row.getLong(0), row.getDouble(1))
    assert(r.abs <= 1.0 + 1e-9, "a Pearson correlation")
    // each undirected edge contributes two endpoint pairs, and the
    // degree sum over graph_clustering's vertex table equals exactly
    // that (the handshake lemma): m == sum(deg)
    val degSum = NearDedup.graphClustering(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(m === degSum, s"endpoint pairs $m vs handshake ${degSum}")
    assert(m % 2 === 0L, "both orientations counted")
  }

  test("dedup_minhash_md5 equals the driver-side closed form (sigs, bands, jaccard)") {
    val got = NearDedup.dedupMinhashMd5(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // full recompute of the twin's algebra in plain Scala
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val P = 268435399L
    val ab = Seq((7368787L, 104729L), (15485863L, 224737L), (32452843L, 350377L))
    val hs: Map[Long, Set[Long]] = Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        val grams = (0 until math.max(toks.length - 2, 1))
          .map(i => toks.slice(i, i + 3).mkString(" ")).distinct
        r.getLong(0) ->
          grams.map(g => java.lang.Long.parseLong(md5hex(g).take(7), 16)).toSet
      }.toMap
    val sigs = hs.map { case (id, s) =>
      id -> ab.map { case (a, b) => s.map(h => (a * h + b) % P).min }
    }
    val ids = hs.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = ids(i); b = ids(j)
      nb = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } if nb > 0
      inter = (hs(a) intersect hs(b)).size
      dist = 1.0 - inter.toDouble / (hs(a).size + hs(b).size - inter)
      if dist <= 0.5
    } yield (a, b, nb.toLong,
      BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    ).toSet
    assert(got === expect,
      s"minhash twin diverged: extra=${got -- expect} missing=${expect -- got}")
    assert(expect.nonEmpty, "corpus must contain at least one near-dup pair")
  }
}
