#!/usr/bin/env python3
"""Local rehearsal of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>

Reads every query result parquet that Verify wrote under <outDir>/<name>/,
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
(with each <sfDir>/<table>.parquet registered as view <table>), and
compares row-by-row, column-sorted-by-name — the strictest plausible
reading of the driver's "row/schema/hash match".
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    # Normalize to a hashable canonical string, type-tagged.
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def driver_hash_risk(v):
    """Round-1 lesson: the driver's hash normalizes values through float.

    A DECIMAL whose canonical string differs from its float repr (e.g.
    '420129.40' vs '420129.4') passes an exact value compare but FAILS the
    driver hash. Treat ANY decimal output as a declare risk — gated queries
    must emit BIGINT/DOUBLE/STRING/BOOLEAN/µs-TIMESTAMP only.

    Same rule for sub-microsecond timestamps: the gate's documented ban
    covers ns-TIMESTAMP outputs (a ns value stringifies differently across
    engines), so flag any datetime carrying non-zero sub-µs precision.
    """
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return True
    if isinstance(v, datetime.datetime):
        # duckdb surfaces TIMESTAMP_NS as datetime with ns lost, but a
        # nanosecond-typed column fetched via arrow keeps .nanosecond;
        # plain datetime caps at µs — any finer type shows up as an int
        # subclass or pandas Timestamp with non-zero nanosecond.
        ns = getattr(v, "nanosecond", 0)
        return ns != 0
    if isinstance(v, (list, tuple)):
        return any(driver_hash_risk(x) for x in v)
    return False


def type_contract_risks(con, query_sql):
    """Round-8 lesson: the rehearsal compared VALUES but never TYPES, and
    four queries shipped green here yet failed the driver — DuckDB
    SUM(BIGINT) returns HUGEINT (pandas coerces to float64, Spark stays
    int64 → hash mismatch) and list columns crash the driver's pandas
    sort_values outright. So DESCRIBE every gated output, both sides, and
    FAIL on any type outside the scalar contract:
    BIGINT/INTEGER/DOUBLE/FLOAT/VARCHAR/BOOLEAN/DATE/µs-TIMESTAMP.
    """
    risks = []
    for col_name, col_type in con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE {query_sql})"
            ).fetchall():
        t = col_type.upper()
        if ("HUGEINT" in t or "DECIMAL" in t or "[]" in t
                or "STRUCT" in t or "MAP(" in t or "UNION(" in t
                or "TIMESTAMP_NS" in t or "TIME ZONE" in t):
            risks.append(f"{col_name}:{col_type}")
    return risks


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    # Blow-up-scale hygiene (r16, after a kernel OOM kill): DuckDB's
    # default memory budget is ~80% of PHYSICAL RAM, so an uncapped
    # oracle at 100x/1000x can balloon past what the machine has left
    # and the kernel kills the whole compare (etl_merge@100x died at
    # 96 GB RSS). Cap it and give it a spill dir — slower is fine,
    # dead is not. Override with GRAFT_DUCKDB_MEM.
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill_compare'")
    # Thread cap matters as much as the memory cap: the same etl_merge
    # oracle that OOM'd at 63 threads (struct-max partial aggregates
    # hold unmanaged per-thread state the buffer manager can't evict)
    # finishes in minutes at 8 threads within 12 GB.
    con.execute(
        f"SET threads={int(os.environ.get('GRAFT_DUCKDB_THREADS', '16'))}")
    for t in TABLES:
        # a table is a single file in /root/testdata but a Spark-style
        # directory of part files in the ScaleProbe blow-up corpora —
        # accept both so oracle gating also runs at 100x/1000x
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    # Surface Verify-side failures first: a query that threw never wrote a
    # parquet dir, and without this its absence masquerades as "not run".
    try:
        errors = json.load(open(f"{out_dir}/_errors.json"))
        for name, msg in sorted(errors.items()):
            print(f"ERROR {name}: query threw in Verify: {msg}")
    except FileNotFoundError:
        pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        # Partial-dump / long-oracle workflow (100x sweeps): gate ONLY the
        # named queries instead of failing every undumped name. Unknown
        # names are a hard error so a typo can't silently skip a gate.
        unknown = sorted(set(only) - set(oracles))
        if unknown:
            print(f"FAIL: unknown query names {unknown}")
            return 1
        oracles = {n: oracles[n] for n in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # Stream both result sets through independent cursors in fixed
        # batches instead of fetchall() — a 100M-row gated output (fn_try
        # at 1000x) held as Python tuples costs tens of GB per SIDE and
        # gets the process OOM-killed; batch compare is O(batch) RAM.
        try:
            spark_sql = (
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            cur_s = con.cursor()
            cur_o = con.cursor()
            spark_rel = cur_s.execute(spark_sql)
            spark_cols = [d[0] for d in spark_rel.description]
            oracle_rel = cur_o.execute(sql)
            oracle_cols = [d[0] for d in oracle_rel.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        # Type contract first: a value-equal result with a banned type
        # (HUGEINT/DECIMAL/array/struct/ns-ts) still fails the DRIVER.
        try:
            t_risks = (
                [f"oracle {r}" for r in type_contract_risks(con, sql)] +
                [f"spark {r}" for r in type_contract_risks(
                    con,
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")])
        except Exception as e:
            t_risks = [f"DESCRIBE failed: {e}"]
        if t_risks:
            print(f"FAIL {name}: type-contract risk {t_risks}")
            ok = False
        n_rows = 0
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
            ok = False
        else:
            s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
            o_ix = [oracle_cols.index(c) for c in sorted(oracle_cols)]
            batch = 1 << 18
            try:
                while ok:
                    s_rows = spark_rel.fetchmany(batch)
                    o_rows = oracle_rel.fetchmany(batch)
                    if len(s_rows) != len(o_rows):
                        # drain the longer side so the message carries
                        # true totals, not the first unequal batch
                        ns, no = n_rows + len(s_rows), n_rows + len(o_rows)
                        while True:
                            more = spark_rel.fetchmany(batch)
                            if not more:
                                break
                            ns += len(more)
                        while True:
                            more = oracle_rel.fetchmany(batch)
                            if not more:
                                break
                            no += len(more)
                        print(f"FAIL {name}: rowcount spark={ns} oracle={no}")
                        ok = False
                        break
                    if not s_rows:
                        break
                    for sr, orow in zip(s_rows, o_rows):
                        sv = [norm(sr[j]) for j in s_ix]
                        ov = [norm(orow[j]) for j in o_ix]
                        if sv != ov:
                            print(f"FAIL {name}: row {n_rows} spark={sv} oracle={ov}")
                            ok = False
                            break
                        risky = [sorted(spark_cols)[k] for k, j in enumerate(s_ix)
                                 if driver_hash_risk(sr[j]) or driver_hash_risk(orow[o_ix[k]])]
                        if risky:
                            print(f"FAIL {name}: row {n_rows} driver-hash-risk (DECIMAL output) in {risky}")
                            ok = False
                            break
                        n_rows += 1
            except Exception as e:
                print(f"FAIL {name}: exception {e}")
                ok = False
        if ok:
            print(f"PASS {name} ({n_rows} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


def selftest():
    """The harness must REJECT the exact output shapes that shipped four
    silent r8 failures (uncast SUM(BIGINT) → HUGEINT; list columns) and
    accept the contract-clean forms. Run: python3 tools/compare.py --selftest
    """
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS k, 2::BIGINT AS v")
    cases = [  # (sql, must_flag)
        ("SELECT SUM(v) AS s FROM t", True),              # HUGEINT
        ("SELECT CAST(SUM(v) AS BIGINT) AS s FROM t", False),
        ("SELECT [1.0, 2.0] AS proj", True),              # list
        ("SELECT CAST(1.5 AS DECIMAL(9,2)) AS d", True),  # DECIMAL
        ("SELECT {'a': 1} AS st", True),                  # struct
        ("SELECT 1::BIGINT AS a, 1.5::DOUBLE AS b, 'x' AS c, "
         "TRUE AS d, DATE '2024-01-01' AS e, "
         "TIMESTAMP '2024-01-01 00:00:00' AS f", False),
    ]
    bad = 0
    for sql, must_flag in cases:
        risks = type_contract_risks(con, sql)
        flagged = bool(risks)
        status = "ok" if flagged == must_flag else "WRONG"
        if flagged != must_flag:
            bad += 1
        print(f"{status}: flag={flagged} expected={must_flag} :: {sql} {risks}")
    print(f"== selftest {'PASS' if bad == 0 else 'FAIL'} ==")
    return 1 if bad else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
