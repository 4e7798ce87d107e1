"""Per-domain query/oracle registration (round-13 split of entry.py).

Each domain module exports a QUERIES fragment (Spark callables
``(spark, sf_dir) -> DataFrame``) and an ORACLE_SQL fragment (equivalent
DuckDB SQL). This package assembles them, asserting key-set discipline:
no duplicate registrations across domains, and every oracle belongs to a
registered query. entry.py applies the driver-window ordering and the
prepared-plan cache on top and re-exports the public surface.
"""

from __future__ import annotations

from symat_hbase_tools_spark.registry import (
    docs,
    embeddings,
    events,
    kv,
    relational,
)

_MODULES = (kv, relational, events, docs, embeddings)

QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    _qdup = set(QUERIES) & set(_m.QUERIES)
    assert not _qdup, f"duplicate query registrations: {sorted(_qdup)}"
    _odup = set(ORACLE_SQL) & set(_m.ORACLE_SQL)
    assert not _odup, f"duplicate oracle registrations: {sorted(_odup)}"
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(_m.ORACLE_SQL)

_orphans = set(ORACLE_SQL) - set(QUERIES)
assert not _orphans, f"oracles without a registered query: {sorted(_orphans)}"
