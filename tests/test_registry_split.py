"""Round-13 registry-split gate: the per-domain registration modules
(symat_hbase_tools_spark/registry/) must assemble to EXACTLY the name sets
pinned in tests/registry_names.json — a refactor or domain move can never
silently drop, rename, or duplicate a registration.

Intentional registry changes regenerate the fixture:
    python tools/regen_registry_snapshot.py
and commit the diff with the change.
"""

from __future__ import annotations

import json
import os

from symat_hbase_tools_spark import entry, registry

_SNAP = json.load(
    open(os.path.join(os.path.dirname(__file__), "registry_names.json"))
)


def test_assembled_query_names_match_snapshot():
    assert sorted(entry.QUERIES) == _SNAP["queries"]


def test_assembled_oracle_names_match_snapshot():
    assert sorted(entry.ORACLE_SQL) == _SNAP["oracles"]


def test_twins_match_snapshot():
    assert dict(sorted(entry.ROWS_ONLY_CHECK_TWINS.items())) == _SNAP["twins"]


def test_driver_window_matches_snapshot_and_leads_dict_order():
    assert entry._DRIVER_WINDOW == _SNAP["window"]
    assert list(entry.QUERIES)[:50] == entry._DRIVER_WINDOW


def test_domain_fragments_are_disjoint_and_complete():
    mods = registry._MODULES
    seen: set = set()
    for m in mods:
        dup = seen & set(m.QUERIES)
        assert not dup, (m.__name__, sorted(dup))
        seen |= set(m.QUERIES)
    assert seen == set(entry.QUERIES)
    # every oracle belongs to a query registered in the SAME module
    for m in mods:
        stray = set(m.ORACLE_SQL) - set(m.QUERIES)
        assert not stray, (m.__name__, sorted(stray))


def test_entry_reexports_wrapper_surface():
    # names external code imports from entry must survive the split
    for name in (
        "QUERIES",
        "ORACLE_SQL",
        "ROWS_ONLY_CHECK_TWINS",
        "prewarm_fixtures",
        "orders_profile",
        "doc_unimax_resample",
        "events_kv_state",
        "doc_dedup_keep_best",
        "flagship",
        "ann_ivf_indexed_recall_check",
        "_PLAN_CACHE",
        "_PLAN_CACHE_MAX",
        "_FIXTURE_ROOT",
    ):
        assert hasattr(entry, name), name


def test_entry_reexports_every_wrapper_name():
    """Anti-drift: EVERY public name defined in registry/wrappers.py must
    remain importable from entry (the split's compatibility contract) —
    a wrapper added without the star re-export surviving would break
    external `from ...entry import X` silently."""
    from symat_hbase_tools_spark.registry import wrappers

    for name in dir(wrappers):
        if name.startswith("_"):
            continue
        assert hasattr(entry, name), name
