#!/usr/bin/env python3
"""Driver-side value-checkers for the document-graph family at blow-up
scales (r15 verdict item 2).

The DuckDB oracles for dedup_cluster / pipeline_near_dedup / graph_*
are exact at the gated sfs but their CLOSURE stage (recursive-CTE
connected components / BFS, self-join triangle enumeration, 5-round
pagerank recurrence) does not terminate in useful time at 500k docs —
the r15 full-batch compare spent 1h45m inside dedup_cluster's CC CTE
before being killed. The EDGE definitions, by contrast, are cheap and
non-recursive. So this checker:

  1. runs the oracle's own edge-building SQL prefix VERBATIM in DuckDB
     (same grams, same Jaccard rounding, same rare-gram blocks — any
     drift from the shipped oracles shows up as a value mismatch), then
  2. replaces only the closure with driver-side graph algorithms:
     union-find (components), layered BFS (reach), adjacency-set
     intersection (triangles/clustering), and a plain 5-iteration
     power loop (pagerank), each linear-ish in |E|, and
  3. compares the result row-for-row against the Verify dump.

Float columns (pagerank's rank, clustering's coefficient) are compared
at atol 2e-6 — the closure re-runs double arithmetic in a different
accumulation order, so bit-equality of ROUND(x, 6) is not guaranteed
at knife-edge values; integer and string columns must match exactly.

Usage: python3 tools/check_heavy.py <sfDir> <outDir> [query...]
Queries default to all supported. Exits non-zero on any mismatch.
"""
import os
import sys
import time
from collections import defaultdict

import duckdb

# The shared 3-gram shingle CTE — copied verbatim from the shipped
# oracles (NearDedup.scala); keep in sync.
SH = """sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(string_split(text, ' ')[i:i+2], ' ')
      for i in range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1)]) AS grams
  FROM documents)"""

# Adjacent-pair Jaccard edges (dedup_cluster / pipeline_near_dedup /
# graph_degree_dist / graph_pagerank family). The shipped oracles spell
# the candidate step `ON b.doc_id IN (a.doc_id + 1, a.doc_id + 2)`;
# DuckDB executes that as a blockwise nested-loop join (500k x 500k at
# 100x — the count(*) alone exceeds 10 min), so spell the identical
# pair set as a UNION ALL of two hash equi-joins (the offsets differ,
# so the union is duplicate-free); 188 s at 100x.
ADJ_EDGES = f"""WITH {SH},
pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.grams AS ga, b.grams AS gb
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
  UNION ALL
  SELECT a.doc_id, b.doc_id, a.grams, b.grams
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 2),
edges AS (
  SELECT src, dst FROM pairs
  WHERE ROUND(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
      / len(list_distinct(list_concat(ga, gb))), 6) >= 0.01)
SELECT src, dst FROM edges"""

# Rare-gram block edges (graph_reach / graph_triangles /
# graph_clustering / graph_assortativity family).
RARE_EDGES = f"""WITH {SH},
g AS (SELECT doc_id, unnest(grams) AS gr FROM sh),
rare AS (SELECT gr FROM (SELECT gr, count(*) AS df FROM g GROUP BY gr)
         WHERE df BETWEEN 3 AND 5),
blk AS (SELECT g.gr, g.doc_id FROM g JOIN rare USING (gr)),
edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM blk a JOIN blk b ON a.gr = b.gr AND a.doc_id < b.doc_id)
SELECT src, dst FROM edges"""

ATOL = 2e-6

# Each edge set is scanned by up to three checkers; at 100x one build
# is ~3 min of DuckDB, so fetch once per process and reuse. Timing
# prints are flushed — the 100x runs go through a redirect and an
# empty log on a 3.5 h run is what this cache/instrumentation replaced.
_EDGE_CACHE = {}


def edges(con, name, sql):
    if name not in _EDGE_CACHE:
        t0 = time.time()
        _EDGE_CACHE[name] = con.execute(sql).fetchall()
        print(f"-- {name}: {len(_EDGE_CACHE[name])} edges "
              f"in {time.time() - t0:.1f}s", flush=True)
    return _EDGE_CACHE[name]


def connect(sf_dir):
    con = duckdb.connect()
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        path += "/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return con


def dumped(con, out_dir, name):
    return con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()


def rows_match(name, got, want):
    """Exact compare with ATOL on floats; reports the first divergence."""
    if len(got) != len(want):
        print(f"FAIL {name}: rowcount spark={len(got)} checker={len(want)}")
        return False
    fuzzy = 0
    for i, (g, w) in enumerate(zip(got, want)):
        if len(g) != len(w):
            print(f"FAIL {name}: row {i} arity {g} vs {w}")
            return False
        for gv, wv in zip(g, w):
            if isinstance(gv, float) or isinstance(wv, float):
                if gv != wv:
                    if abs(float(gv) - float(wv)) <= ATOL:
                        fuzzy += 1
                    else:
                        print(f"FAIL {name}: row {i} {gv} vs {wv}")
                        return False
            elif gv != wv:
                print(f"FAIL {name}: row {i} {g} vs {w}")
                return False
    extra = f" ({fuzzy} float cells within atol)" if fuzzy else " (bit-exact)"
    print(f"PASS {name} ({len(got)} rows){extra}")
    return True


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-root union keeps comp = MIN(member), matching the
            # oracle's MIN(r) representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def components(con):
    uf = UnionFind()
    for s, d in edges(con, "adj", ADJ_EDGES):
        uf.union(s, d)
    comp = defaultdict(list)
    for (doc,) in con.execute("SELECT doc_id FROM documents").fetchall():
        comp[uf.find(doc)].append(doc)
    return comp


def check_dedup_cluster(con, out_dir):
    sizes = defaultdict(int)
    for members in components(con).values():
        sizes[len(members)] += 1
    want = [(sz, n) for sz, n in sorted(sizes.items())]
    return rows_match("dedup_cluster", dumped(con, out_dir, "dedup_cluster"), want)


def check_pipeline_near_dedup(con, out_dir):
    survivors = {min(m) for m in components(con).values()}
    lang = dict(con.execute("SELECT doc_id, lang FROM documents").fetchall())
    by_lang = defaultdict(int)
    for doc in survivors:
        by_lang[lang[doc]] += 1
    want = sorted(by_lang.items())
    return rows_match("pipeline_near_dedup",
                      dumped(con, out_dir, "pipeline_near_dedup"), want)


def rare_adj(con):
    fwd = defaultdict(set)
    und = defaultdict(set)
    for s, d in edges(con, "rare", RARE_EDGES):
        fwd[s].add(d)
        und[s].add(d)
        und[d].add(s)
    return fwd, und


def check_graph_reach(con, out_dir):
    _, und = rare_adj(con)
    seeds = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id < 5").fetchall()]
    # the oracle's recursion is UNION ALL — it enumerates WALKS, not
    # levels: one r-row per walk of length ≤ 3 from any seed. So
    # p_k(v) = #length-k walks ending at v (vertices may repeat),
    # p_{k+1}(v) = Σ_{u ∈ N(v)} p_k(u); n_paths = Σ_k p_k(v) and
    # hops = min{k : p_k(v) > 0}.
    p = defaultdict(int)
    for s in seeds:
        p[s] = 1
    hops, npaths = {}, defaultdict(int)
    for k in range(4):
        for v, cnt in p.items():
            hops.setdefault(v, k)
            npaths[v] += cnt
        if k < 3:
            nxt = defaultdict(int)
            for u, cnt in p.items():
                for v in und[u]:
                    nxt[v] += cnt
            p = nxt
    want = [(v, hops[v], npaths[v]) for v in sorted(hops)]
    return rows_match("graph_reach", dumped(con, out_dir, "graph_reach"), want)


def triangle_counts(fwd):
    """Per-vertex count of (x,y,z) with x→y, y→z, x→z in the
    doc_id-ascending orientation — the oracle's tri CTE verbatim."""
    n_tri = defaultdict(int)
    for x, nx in fwd.items():
        for y in nx:
            common = nx & fwd.get(y, frozenset())
            for z in common:
                n_tri[x] += 1
                n_tri[y] += 1
                n_tri[z] += 1
    return n_tri


def check_graph_triangles(con, out_dir):
    fwd, _ = rare_adj(con)
    n_tri = triangle_counts(fwd)
    want = sorted(n_tri.items())
    return rows_match("graph_triangles",
                      dumped(con, out_dir, "graph_triangles"), want)


def check_graph_clustering(con, out_dir):
    fwd, und = rare_adj(con)
    n_tri = triangle_counts(fwd)
    want = []
    for v in sorted(und):
        deg = len(und[v])
        t = n_tri.get(v, 0)
        c = round(2.0 * t / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
        want.append((v, deg, t, c))
    return rows_match("graph_clustering",
                      dumped(con, out_dir, "graph_clustering"), want)


def check_graph_pagerank(con, out_dir):
    und = defaultdict(set)
    for s, d in edges(con, "adj", ADJ_EDGES):
        und[s].add(d)
        und[d].add(s)
    docs = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
    n = len(docs)
    r = {v: 1.0 / n for v in docs}
    for _ in range(5):
        contrib = defaultdict(float)
        for src, nbrs in und.items():
            share = r[src] / len(nbrs)
            for dst in nbrs:
                contrib[dst] += share
        r = {v: 0.15 / n + 0.85 * contrib.get(v, 0.0) for v in docs}
    want = [(v, round(r[v], 6)) for v in docs]
    return rows_match("graph_pagerank",
                      dumped(con, out_dir, "graph_pagerank"), want)


def check_graph_degree_dist(con, out_dir):
    # Undirected degree histogram over the adjacent-pair edges; the
    # oracle's LEFT JOIN counts zero-degree docs, so seed every doc.
    deg = defaultdict(int)
    for (doc,) in con.execute("SELECT doc_id FROM documents").fetchall():
        deg[doc] = 0
    for s, d in edges(con, "adj", ADJ_EDGES):
        deg[s] += 1
        deg[d] += 1
    hist = defaultdict(int)
    for d in deg.values():
        hist[d] += 1
    want = sorted(hist.items())
    return rows_match("graph_degree_dist",
                      dumped(con, out_dir, "graph_degree_dist"), want)


def check_graph_assortativity(con, out_dir):
    # Degree-degree Pearson over the symmetrized rare-gram edges —
    # the oracle's `pr` is one (dx, dy) row per DIRECTED endpoint
    # pair, so each undirected edge contributes (da,db) and (db,da).
    _, und = rare_adj(con)
    deg = {v: len(n) for v, n in und.items()}
    m = sx = sy = sxy = sxx = syy = 0.0
    for u, nbrs in und.items():
        du = float(deg[u])
        for v in nbrs:
            dv = float(deg[v])
            m += 1
            sx += du
            sy += dv
            sxy += du * dv
            sxx += du * du
            syy += dv * dv
    import math
    r = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    want = [(int(m), round(r, 6))]
    return rows_match("graph_assortativity",
                      dumped(con, out_dir, "graph_assortativity"), want)


def check_graph_adamic_adar(con, out_dir):
    # Adamic–Adar over 2-paths u–v–w (u < w) of the symmetrized
    # rare-gram graph, non-edges only, top-100 by (aa DESC, u, w) —
    # accumulated per-middle-vertex instead of materializing the
    # oracle's `paths` self-join.
    import math
    _, und = rare_adj(con)
    deg = {v: len(n) for v, n in und.items()}
    score = defaultdict(float)
    n_common = defaultdict(int)
    for v, nbrs in und.items():
        w_v = 1.0 / math.log(float(deg[v]))
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for w in ns[i + 1:]:
                score[(u, w)] += w_v
                n_common[(u, w)] += 1
    cand = [(u, w, n_common[(u, w)], round(aa, 6))
            for (u, w), aa in score.items() if w not in und.get(u, ())]
    cand.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = cand[:100]
    return rows_match("graph_adamic_adar",
                      dumped(con, out_dir, "graph_adamic_adar"), want)


CHECKERS = {
    "dedup_cluster": check_dedup_cluster,
    "graph_degree_dist": check_graph_degree_dist,
    "graph_assortativity": check_graph_assortativity,
    "graph_adamic_adar": check_graph_adamic_adar,
    "pipeline_near_dedup": check_pipeline_near_dedup,
    "graph_reach": check_graph_reach,
    "graph_triangles": check_graph_triangles,
    "graph_clustering": check_graph_clustering,
    "graph_pagerank": check_graph_pagerank,
}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or sorted(CHECKERS)
    unknown = sorted(set(names) - set(CHECKERS))
    if unknown:
        print(f"FAIL: no checker for {unknown}; have {sorted(CHECKERS)}")
        return 1
    con = connect(sf_dir)
    n_fail = 0
    for name in names:
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name}: not dumped under {out_dir}")
            continue
        t0 = time.time()
        try:
            if not CHECKERS[name](con, out_dir):
                n_fail += 1
        except Exception as e:  # noqa: BLE001 — report, keep checking
            print(f"FAIL {name}: exception {e}", flush=True)
            n_fail += 1
        print(f"-- {name}: {time.time() - t0:.1f}s", flush=True)
    print(f"== {len(names) - n_fail} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
