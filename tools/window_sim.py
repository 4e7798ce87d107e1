#!/usr/bin/env python
"""Driver-window simulation: run the FIRST-50 window (entry._DRIVER_WINDOW)
against the DuckDB oracles at sf0.01 with the shared sweep canonicalization
— the local mirror of the driver's CORRECTNESS gate. Run before ending a
round after ANY window rotation; expect 50/50.

Usage: python tools/window_sim.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    import __spark_entry__ as em
    from symat_hbase_tools_spark.entry import _DRIVER_WINDOW
    from symat_hbase_tools_spark.session import get_spark
    from tools.sf_sweep import TABLES, canon_rows

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("window-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    q, o = em.queries(), em.oracle_sql()
    n_pass, fails = 0, []
    for name in _DRIVER_WINDOW:
        try:
            pdf = q[name](spark, sf).toPandas()
            want = con.execute(o[name]).fetchdf()
            g, gc = canon_rows(pdf)
            w, wc = canon_rows(want)
            ok = g == w and gc == wc
            n_pass += ok
            if not ok:
                fails.append(name)
            print(f"{name}: {'pass' if ok else 'FAIL'}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            fails.append(name)
            print(f"{name}: ERROR {exc}", flush=True)
    print(f"WINDOW_SIM {n_pass}/{len(_DRIVER_WINDOW)} fails={fails}")
    return 0 if not fails else 1


if __name__ == "__main__":
    raise SystemExit(main())
