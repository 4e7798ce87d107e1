#!/usr/bin/env python
"""Full-surface verification sweep: run EVERY queries() entry at a given
sf_dir and compare against its DuckDB oracle (row count, column names,
values — the driver's t2 protocol, one decade up by default).

Usage:
    python tools/sf_sweep.py [sf_dir=/root/testdata/sf0.1] [out=SF01_VERIFY.json]

Entries without an oracle record status "rows_only" (each has an
oracle-paired companion check — see COVERAGE.md).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

# runnable as `python tools/sf_sweep.py`: the repo root (where
# __spark_entry__.py lives) is this file's parent's parent
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(x):
    # Numeric-CLASS sensitive, like the driver's value hash: a Spark BIGINT
    # next to a DuckDB HUGEINT->float64 (uncast SUM/list_sum) must FAIL here
    # even though 123 == 123.0 in Python (round-5 lesson: two oracles without
    # CAST(... AS BIGINT) passed this compare but failed the driver's hash).
    # DECIMAL gets its own tag for the same reason: Decimal('1.5') == 1.5 in
    # Python, so a DECIMAL-vs-DOUBLE column pair would silently pass a
    # compare the driver's hash distinguishes — oracles must CAST instead.
    # This is the ONE canonicalization (tests/test_oracle.py imports it);
    # a second copy is how the round-5 compare-vs-hash divergence happened.
    import decimal

    if x is None:
        return None
    if hasattr(x, "item"):
        return canon_cell(x.item())
    if isinstance(x, bool):
        return ("b", x)
    if isinstance(x, float):
        return ("f", "NaN" if math.isnan(x) else x)
    if isinstance(x, int):
        return ("i", x)
    if isinstance(x, decimal.Decimal):
        return ("d", str(x.normalize()))
    if isinstance(x, (bytes, bytearray)):
        return bytes(x)
    return x


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    ]
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r)), cols


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SF01_VERIFY.json"

    import __spark_entry__ as entry_mod
    from symat_hbase_tools_spark.session import get_spark

    spark = get_spark("sf-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # oracles whose SQL doesn't scale to this sf_dir (e.g. knn_cosine_topk's
    # all-pairs self-join DNFs at 500k vectors — SF1_BENCH.json note): run
    # the engine side, record "oracle_skipped" with the row count.
    skip_oracles = set(
        filter(None, os.environ.get("SWEEP_SKIP_ORACLES", "").split(","))
    )

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    # SWEEP_RESUME=1: keep prior results from out_path and only run queries
    # without a recorded non-FAIL status (long sweeps at probe scales get
    # killed/restarted; re-running hours of green queries proves nothing)
    if os.environ.get("SWEEP_RESUME") == "1" and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        results = {
            k: v
            for k, v in prior.items()
            if v.get("status") in ("pass", "rows_only", "oracle_skipped")
        }
        print(f"resuming: {len(results)} prior results kept", flush=True)
    n_pass = n_rows_only = n_fail = 0
    for name, fn in queries.items():
        if name in results:
            st = results[name]["status"]
            if st == "pass":
                n_pass += 1
            else:
                n_rows_only += 1
            continue
        t0 = time.perf_counter()
        try:
            pdf = fn(spark, sf_dir).toPandas()
            if name in skip_oracles:
                results[name] = {
                    "status": "oracle_skipped",
                    "rows": len(pdf),
                    "sec": round(time.perf_counter() - t0, 1),
                }
                n_rows_only += 1
                print(f"{name}: oracle_skipped ({len(pdf)})", flush=True)
                continue
            if name not in oracles:
                results[name] = {
                    "status": "rows_only",
                    "rows": len(pdf),
                    "sec": round(time.perf_counter() - t0, 1),
                }
                n_rows_only += 1
                print(f"{name}: rows_only ({len(pdf)})", flush=True)
                continue
            want = con.execute(oracles[name]).fetchdf()
            got_rows, got_cols = canon_rows(pdf)
            want_rows, want_cols = canon_rows(want)
            ok = got_cols == want_cols and got_rows == want_rows
            results[name] = {
                "status": "pass" if ok else "FAIL",
                "rows": len(pdf),
                "sec": round(time.perf_counter() - t0, 1),
            }
            if ok:
                n_pass += 1
            else:
                n_fail += 1
                results[name]["detail"] = {
                    "spark_rows": len(got_rows),
                    "oracle_rows": len(want_rows),
                    "spark_cols": got_cols,
                    "oracle_cols": want_cols,
                }
            print(f"{name}: {results[name]['status']}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            n_fail += 1
            results[name] = {"status": "ERROR", "err": str(exc)[:300]}
            print(f"{name}: ERROR {exc}", flush=True)
        # incremental write: a killed sweep keeps its finished results
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(
        f"\n{n_pass} pass / {n_rows_only} rows_only / {n_fail} fail "
        f"of {len(queries)} at {sf_dir} -> {out_path}"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
