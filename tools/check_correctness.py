#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB correctness compare.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

For each query dir under verify_out: load the Spark parquet result and
run the matching oracle SQL in DuckDB over the sf_dir tables; sort
columns by name, sort rows, compare values (hash-style exact compare,
with a tiny float tolerance fallback reported separately).

The compare is DTYPE-STRICT: both sides are materialized to pandas
(exactly what the driver hashes) and per-column numpy dtype *kinds*
must match before values are compared. Python `==` says 123 == 123.0,
but the driver's hash says "123" != "123.0" — int-vs-float divergence
(Spark percentile_disc returning DOUBLE, DuckDB SUM returning
HUGEINT→float64) shipped two red rows in round 9 because the old
value-only compare could not see it.

Dev tool only — the engine itself has no Python dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):  # None-tolerant, type-stable ordering
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    return sorted(
        (tuple(r[i] for i in order) for r in rows), key=key
    ), [cols[i] for i in order]


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, False
        if a == b:
            return True, False
        if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
            return True, True  # only approx-equal
    return a == b, False


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    # --skip q24,q40,... excludes queries whose ORACLE side is
    # quadratic in DuckDB (pair joins / recursive closure) — they run
    # in minutes at sf0.01 but tens of minutes to hours at sf0.1.
    skip = set()
    only = None
    if len(sys.argv) > 4 and sys.argv[3] == "--skip":
        skip = {s.strip() for s in sys.argv[4].split(",")}
    # --only q138,q139 restricts the compare to matching name prefixes
    # (single-query iteration against a filtered Verify dump).
    if len(sys.argv) > 4 and sys.argv[3] == "--only":
        only = {s.strip() for s in sys.argv[4].split(",")}
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_exact = n_approx = n_fail = 0
    # a query that failed inside Verify leaves NO output dir — surface
    # that as a failure instead of silently comparing fewer queries
    present = {p.name for p in out_dir.iterdir() if p.is_dir()}
    for name in sorted(set(oracle) - present):
        if any(name.startswith(s) for s in skip):
            continue
        if only is not None and not any(name.startswith(s) for s in only):
            continue
        print(f"FAIL {name}: oracle registered but no Verify output "
              "(query threw or lint-tripped in Verify)")
        n_fail += 1
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        if any(name.startswith(s) for s in skip):
            print(f"  {name}: skipped by request")
            continue
        if only is not None and not any(name.startswith(s) for s in only):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        s_rows, s_cols = canon(spark_rel.fetchall(), spark_rel.columns)
        if name not in oracle:
            print(f"  {name}: rows-only ({len(s_rows)} rows)")
            continue
        # the DRIVER's harness (pandas sort_values) crashes on
        # array/map/struct cells — mirror that here instead of silently
        # stringifying them (the round-7 q86 escape). Check the SCHEMA,
        # not sampled values: an all-NULL-in-sample array column or an
        # empty result must still fail.
        bad_cols = [
            c for c, t in zip(spark_rel.columns, spark_rel.types)
            if any(k in str(t).upper()
                   for k in ("[", "STRUCT(", "MAP(", "UNION("))
        ]
        if bad_cols:
            print(f"FAIL {name}: non-scalar output columns {bad_cols} "
                  "(driver harness cannot hash these)")
            n_fail += 1
            continue
        o_rel = con.sql(oracle[name])
        o_bad = [
            c for c, t in zip(o_rel.columns, o_rel.types)
            if any(k in str(t).upper()
                   for k in ("[", "STRUCT(", "MAP(", "UNION("))
        ]
        if o_bad:
            print(f"FAIL {name}: non-scalar ORACLE columns {o_bad} "
                  "(driver harness cannot hash these)")
            n_fail += 1
            continue
        o_rows, o_cols = canon(o_rel.fetchall(), o_rel.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: schema {s_cols} vs oracle {o_cols}")
            n_fail += 1
            continue
        # dtype-kind gate: the driver compares pandas-materialized
        # values, where int64 vs float64 hash differently even when
        # numerically equal. Re-run both sides through .df() and
        # demand matching numpy kinds ('i' vs 'f' vs 'O' ...).
        s_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        o_df = con.sql(oracle[name]).df()
        kind_bad = [
            (c, s_df[c].dtype.kind, o_df[c].dtype.kind)
            for c in s_cols
            if s_df[c].dtype.kind != o_df[c].dtype.kind
        ]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch {kind_bad} "
                  "(spark vs oracle — would hash-FAIL in the driver)")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: {len(s_rows)} rows vs oracle {len(o_rows)}")
            n_fail += 1
            continue
        bad = approx = 0
        for sr, orow in zip(s_rows, o_rows):
            for a, b in zip(sr, orow):
                ok, ap = eq(a, b)
                if not ok:
                    bad += 1
                elif ap:
                    approx += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches "
                  f"(example spark={s_rows[0]} oracle={o_rows[0]})")
            n_fail += 1
        elif approx:
            print(f"~    {name}: exact except {approx} approx-equal floats "
                  f"({len(s_rows)} rows) — WOULD FAIL a hash compare")
            n_approx += 1
        else:
            print(f"ok   {name}: exact ({len(s_rows)} rows)")
            n_exact += 1
    print(f"\n{n_exact} exact, {n_approx} approx, {n_fail} fail")
    sys.exit(1 if n_fail or n_approx else 0)


if __name__ == "__main__":
    main()
