"""Property-based tests (hypothesis) for version-resolution semantics:
latest_cells / visible_cells against a trivial Python model over random
version histories."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from symat_hbase_tools_spark.operators import kv

cell_st = st.tuples(
    st.sampled_from([b"r1", b"r2"]),  # row
    st.sampled_from(["cf"]),  # family
    st.sampled_from([b"q1", b"q2"]),  # qualifier
    st.integers(min_value=0, max_value=5),  # ts
    st.sampled_from(["Put", "Delete"]),  # type
    st.binary(min_size=0, max_size=4),  # value
)


def model_latest(cells):
    """Reference semantics: per coordinate, max ts; at equal ts Delete wins,
    then larger value (matches the packed-encoding order)."""
    best = {}
    for row, fam, qual, ts, typ, val in cells:
        key = (row, fam, qual)
        rank = (ts, 1 if typ == "Delete" else 0, b"" if val is None else val)
        if key not in best or rank > best[key][0]:
            best[key] = (rank, (ts, typ, val))
    return {k: v for k, (_, v) in best.items()}


_SPARK = [None]


def test_aa_setup_spark(spark):
    # hypothesis @given can't take pytest fixtures; stash the session first
    # (runs first: pytest executes tests in definition order)
    _SPARK[0] = spark


@settings(max_examples=12, deadline=None)
@given(st.lists(cell_st, min_size=1, max_size=20))
def test_latest_and_visible_match_model(cells_py):
    spark = _SPARK[0]
    df = spark.createDataFrame(
        cells_py,
        "row binary, family string, qualifier binary, ts long, type string, value binary",
    )
    want = model_latest(cells_py)
    got = {
        (bytes(r["row"]), r["family"], bytes(r["qualifier"])): (
            r["ts"],
            r["type"],
            bytes(r["value"]) if r["value"] is not None else b"",
        )
        for r in kv.latest_cells(df).collect()
    }
    assert got == {k: (ts, typ, b"" if v is None else v) for k, (ts, typ, v) in want.items()}
    visible = {
        (bytes(r["row"]), r["family"], bytes(r["qualifier"]))
        for r in kv.visible_cells(df).collect()
    }
    assert visible == {k for k, (_, typ, _v) in want.items() if typ == "Put"}


# --- perceptual dHash: random-payload parity + edit-locality ---------------

_payload_st = st.binary(min_size=1, max_size=512)


@settings(max_examples=25, deadline=None)
@given(st.lists(_payload_st, min_size=1, max_size=8, unique=True))
def test_phash_kernel_matches_python_on_random_payloads(payloads):
    """Spark dHash kernel == the python mirror for arbitrary byte strings
    (lengths shorter/longer than the 72-cell grid, repeated bytes, high
    bytes)."""
    spark = _SPARK[0]
    from symat_hbase_tools_spark.operators import multimodal
    from tests.test_multimodal import _phash64

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in multimodal.perceptual_hashes(df).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _phash64(p), (i, p)


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=8, max_size=512),
    st.integers(min_value=0, max_value=255),
)
def test_phash_single_byte_edit_hamming_bound(payload, newbyte):
    """Editing ONE byte (any position's replacement at position 0 is the
    check twin's plant; here: position 0, any value) flips at most 2
    gradient bits — the pure-python statement of the coverage twin's
    guarantee, fuzzed."""
    from tests.test_multimodal import _phash64

    edited = bytes([newbyte]) + payload[1:]
    d = (_phash64(payload) ^ _phash64(edited)) & ((1 << 64) - 1)
    assert bin(d).count("1") <= 2
