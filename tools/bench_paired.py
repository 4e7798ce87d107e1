#!/usr/bin/env python
"""Adjudicate a bench reading against a prior one using the embedded
same-session DuckDB control (the round-10 host-noise protocol, committed
as a tool per the r10 verdict).

Usage:
    python tools/bench_paired.py CURRENT.json [PRIOR.json]

Both files are BENCH_DETAIL.json-format artifacts produced by `python
bench.py` (which now embeds a ``duckdb_control`` block: the same
ORACLE_SQL queries timed on DuckDB in the same process immediately after
the engine pass, so both sides see identical host state). PRIOR defaults
to `git show HEAD:BENCH_DETAIL.json`.

Per-query adjudication (the NEXT.md r10 recipe):
  - engine moved >1.5x vs prior AND the control for that query stayed
    flat (<1.25x) AND the engine time is >=0.1 s absolute  -> REGRESSION
    (the code got slower while the host demonstrably didn't)
  - engine moved >1.5x but the control moved >=1.25x too   -> host noise
  - engine >2x its own control AND >=0.3 s absolute        -> ratio-weak
    (the standing watch-list threshold, independent of history)

Exit 1 iff any REGRESSION rows print, so the tool can gate a round.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _prior_from_git() -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
        return None


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    cur = _load(sys.argv[1])
    prior = _load(sys.argv[2]) if len(sys.argv) > 2 else _prior_from_git()
    if prior is None:
        print("no prior artifact (need a PRIOR.json arg or git history)",
              file=sys.stderr)
        return 2
    if cur.get("sf") != prior.get("sf"):
        print(f"warning: sf mismatch {cur.get('sf')} vs {prior.get('sf')} — "
              "ratios are not comparable", file=sys.stderr)

    eq_cur = cur.get("queries", {})
    eq_pri = prior.get("queries", {})
    ctl_cur = cur.get("duckdb_control", {}).get("queries", {})
    ctl_pri = prior.get("duckdb_control", {}).get("queries", {})

    regressions: list[str] = []
    noise: list[str] = []
    for name in sorted(set(eq_cur) & set(eq_pri)):
        e0, e1 = eq_pri[name], eq_cur[name]
        if e0 <= 0 or e1 < 0.1 or e1 <= 1.5 * e0:
            continue
        # `is not None` (not truthiness): a sub-0.5ms control legitimately
        # rounds to 0.000 in the artifact — 0.0 is a PRESENT measurement,
        # not a missing one
        c0, c1 = ctl_pri.get(name), ctl_cur.get(name)
        have_ctl = c0 is not None and c1 is not None
        ctl_moved = have_ctl and c1 > 1.25 * max(c0, 1e-3)
        row = (f"{name}: engine {e0:.3f} -> {e1:.3f} s ({e1 / e0:.2f}x), "
               f"control "
               + (f"{c0:.3f} -> {c1:.3f} s ({c1 / max(c0, 1e-3):.2f}x)"
                  if have_ctl else "missing"))
        if ctl_moved or not have_ctl:
            noise.append(row + "  [host/unadjudicable]")
        else:
            regressions.append(row + "  [REGRESSION]")

    # floor the control at 1 ms before dividing: an artifact 0.000 means
    # "< 0.5 ms", and a divide-by-zero here would crash the gate instead
    # of returning its documented exit code
    weak = [
        f"{n}: {eq_cur[n]:.3f} s vs control {ctl_cur[n]:.3f} s "
        f"({eq_cur[n] / max(ctl_cur[n], 1e-3):.1f}x)"
        for n in sorted(set(eq_cur) & set(ctl_cur))
        if eq_cur[n] >= 0.3 and eq_cur[n] > 2 * max(ctl_cur[n], 1e-3)
    ]

    etot, ctot = cur.get("value"), cur.get("duckdb_control", {}).get("total_sec")
    if etot is not None and ctot:
        print(f"engine warm total {etot:.2f} s vs DuckDB control {ctot:.2f} s "
              f"= {etot / ctot:.2f}x (same session)")
    for title, rows in (("REGRESSIONS", regressions),
                        ("host-noise moves", noise),
                        ("ratio-weak watch list", weak)):
        print(f"\n{title}: {len(rows)}")
        for r in rows:
            print("  " + r)
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
