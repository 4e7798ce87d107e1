#!/usr/bin/env python
"""Regenerate tests/registry_names.json — the registry-split gate fixture.

Run after ANY intentional registry change (new query, new oracle, window
rotation) and commit the diff alongside it; tests/test_registry_split.py
fails otherwise. The fixture pins the assembled name sets so the round-13
per-domain split (symat_hbase_tools_spark/registry/) can never silently
drop or rename a registration.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from symat_hbase_tools_spark import entry

    snap = {
        "queries": sorted(entry.QUERIES),
        "oracles": sorted(entry.ORACLE_SQL),
        "twins": dict(sorted(entry.ROWS_ONLY_CHECK_TWINS.items())),
        "window": entry._DRIVER_WINDOW,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "registry_names.json",
    )
    with open(path, "w") as f:
        json.dump(snap, f, indent=1)
    print(
        f"wrote {path}: {len(snap['queries'])} queries, "
        f"{len(snap['oracles'])} oracles, {len(snap['window'])} window"
    )


if __name__ == "__main__":
    main()
