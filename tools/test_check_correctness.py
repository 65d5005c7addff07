#!/usr/bin/env python3
"""Regression test for the dtype-strict gate in check_correctness.py.

Reproduces the round-9 escape class: a Spark result and an oracle
result whose VALUES are numerically identical but whose dtypes differ
(int64 vs float64 — e.g. Spark percentile_disc DOUBLE vs DuckDB
quantile_disc BIGINT). The old value-only compare passed this; the
dtype-strict gate must FAIL it. A matching-dtype control must pass.

Usage: python3 tools/test_check_correctness.py
Exits 0 iff both assertions hold. Dev tool only.
"""
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

HERE = Path(__file__).resolve().parent


def run_gate(out_dir, sf_dir):
    r = subprocess.run(
        [sys.executable, str(HERE / "check_correctness.py"),
         str(out_dir), str(sf_dir)],
        capture_output=True, text=True)
    return r.returncode, r.stdout + r.stderr


def main():
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        sf = td / "sf"
        sf.mkdir()
        con = duckdb.connect()
        # minimal table universe so the CREATE VIEW loop succeeds
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
            con.sql(f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet'")

        # Spark-side dump: int64 column (what q153 SHOULD emit)
        out = td / "verify"
        (out / "q_dtype").mkdir(parents=True)
        con.sql("COPY (SELECT CAST(7 AS BIGINT) AS p50) "
                f"TO '{out}/q_dtype/part-0.parquet'")

        # RED case: oracle returns the same value as DOUBLE
        (out / "oracle_sql.json").write_text(json.dumps(
            {"q_dtype": "SELECT CAST(7 AS DOUBLE) AS p50"}))
        rc, log = run_gate(out, sf)
        assert rc != 0 and "dtype-kind mismatch" in log, (
            "gate MISSED int-vs-float divergence:\n" + log)
        print("ok: int64-vs-float64 divergence is rejected")

        # GREEN control: same dtype both sides
        (out / "oracle_sql.json").write_text(json.dumps(
            {"q_dtype": "SELECT CAST(7 AS BIGINT) AS p50"}))
        rc, log = run_gate(out, sf)
        assert rc == 0, "gate rejected a dtype-exact match:\n" + log
        print("ok: dtype-exact match passes")
    print("PASS")


if __name__ == "__main__":
    main()
