"""Shared DuckDB-SQL fragments and builders used by the per-domain
ORACLE_SQL registrations (tokenization CTEs, exact-integer money
accumulation, profile/FD renderers). Split out of entry.py in round 13.
"""

from __future__ import annotations

_TOKENS = "string_split_regex(trim(text), ' +')"
_NTOK = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKENS}) END"
_SHINGLE_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh0 AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1)),
                i -> w[i] || '|' || w[i+1] || '|' || w[i+2]) shl FROM t),
    sh AS (SELECT DISTINCT doc_id, unnest(shl) s FROM sh0),
    sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
              FROM sh a JOIN sh b USING (s)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    jac AS (SELECT d1, d2, i / (s1.n + s2.n - i) AS jaccard
            FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                       JOIN sizes s2 ON d2 = s2.doc_id)
"""
_JACCARD_SQL = f"WITH {_SHINGLE_CTE} SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5"


def _simhash_portable_sql(max_hamming: int = 3) -> str:
    """Generated DuckDB twin of dedup.simhash_portable_pairs: md5-derived
    64-bit hash as two 32-bit halves, per-bit ±1 votes, 4x16-bit band
    blocking, bit_count(xor) hamming. 64 vote columns are generated here
    rather than hand-written."""
    votes = ", ".join(
        f"SUM(CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{h}_{j}"
        for h in ("lo", "hi")
        for j in range(32)
    )
    fp = {
        h: " + ".join(
            f"(CASE WHEN v{h}_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
            for j in range(32)
        )
        for h in ("lo", "hi")
    }
    return f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sh0 AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || '|' || w[i+1] || '|' || w[i+2]) shl FROM t),
        sh AS (SELECT DISTINCT doc_id, unnest(shl) s FROM sh0),
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(s), 1, 8))::BIGINT AS hi,
                     ('0x' || substr(md5(s), 9, 8))::BIGINT AS lo
              FROM sh),
        v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
        f AS (SELECT doc_id, {fp['lo']} AS fp_lo, {fp['hi']} AS fp_hi FROM v),
        p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                     CAST(bit_count(xor(a.fp_lo, b.fp_lo))
                          + bit_count(xor(a.fp_hi, b.fp_hi)) AS BIGINT) AS hamming
              FROM f a JOIN f b ON a.doc_id < b.doc_id
              AND ((a.fp_lo & 65535) = (b.fp_lo & 65535)
                   OR ((a.fp_lo >> 16) & 65535) = ((b.fp_lo >> 16) & 65535)
                   OR (a.fp_hi & 65535) = (b.fp_hi & 65535)
                   OR ((a.fp_hi >> 16) & 65535) = ((b.fp_hi >> 16) & 65535)))
        SELECT d1, d2, hamming FROM p WHERE hamming <= {max_hamming}
    """

# exact integer-micros money sum, hi/lo-split longs — mirrors
# relational.money_sum_expr term for term (see its docstring)
_MONEY_LO = "(((CAST(round(({expr}) * 1000000) AS BIGINT) % 1000000000) + 1000000000) % 1000000000)"
_MONEY_HI = (
    "CAST((CAST(round(({expr}) * 1000000) AS BIGINT) - " + _MONEY_LO + ") / 1000000000 AS BIGINT)"
)
_MONEY = (
    "((CAST(SUM(" + _MONEY_HI + ") AS DOUBLE) * 1000000000.0"
    " + CAST(SUM(" + _MONEY_LO + ") AS DOUBLE)) / 1000000.0)"
)


def _money(expr: str) -> str:
    return _MONEY.replace("{expr}", expr)


_PROFILE_RENDER_SQL = {
    "long": "CAST({m}({c}) AS VARCHAR)",
    "string": "{m}({c})",
    "money": "printf('%.2f', {m}({c}))",
    "date": "strftime({m}({c}), '%Y-%m-%d')",
}


def _fk_oracle_sql(edges) -> str:
    """UNION ALL mirror of profiling.referential_integrity (same edges)."""
    parts = []
    for child, ckey, parent, pkey in edges:
        parts.append(
            f"SELECT '{child}.{ckey}->{parent}.{pkey}' AS relationship, "
            f"CAST(COUNT(*) AS BIGINT) AS n_child, "
            f"CAST(SUM(CASE WHEN c.{ckey} IS NOT NULL AND p.__pk IS NULL "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans, "
            f"CAST(SUM(CASE WHEN c.{ckey} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_null_keys "
            f"FROM {child} c LEFT JOIN "
            f"(SELECT DISTINCT {pkey} AS __pk FROM {parent}) p "
            f"ON c.{ckey} = p.__pk"
        )
    return " UNION ALL ".join(parts)


def _profile_oracle_sql(table: str, renderers: dict[str, str]) -> str:
    """UNION ALL per-column mirror of profiling.profile (same renderers)."""
    parts = []
    for c, kind in renderers.items():
        r = _PROFILE_RENDER_SQL[kind]
        parts.append(
            f"SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT({c}) AS BIGINT) AS n_nonnull, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{r.format(m='MIN', c=c)} AS min_repr, "
            f"{r.format(m='MAX', c=c)} AS max_repr FROM {table}"
        )
    return " UNION ALL ".join(parts)


