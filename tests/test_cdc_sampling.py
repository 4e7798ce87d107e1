"""CDC (merge/SCD2) and consistent-sampling operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators import kv
from symat_hbase_tools_spark.operators.cdc import apply_changeset, scd2_history
from symat_hbase_tools_spark.operators.sampling import (
    hash_sample,
    portable_sample,
    portable_stratified_sample,
    stratified_hash_sample,
)
from symat_hbase_tools_spark.sources.cells import CELL_TS, customer_cells, customer_cells_versioned


def test_scd2_windows_chain(spark, customer):
    hist = scd2_history(customer_cells_versioned(customer))
    one = hist.filter(
        (F.col("row") == F.lit(b"cust#00000007"))
        & (F.decode("qualifier", "UTF-8") == "c_name")
    ).orderBy("valid_from").collect()
    assert [(r["valid_from"], r["valid_to"]) for r in one] == [
        (CELL_TS, CELL_TS + 1000),
        (CELL_TS + 1000, CELL_TS + 2000),
        (CELL_TS + 2000, None),
    ]
    # windows chain: valid_to of version i == valid_from of version i+1
    assert bytes(one[-1]["value"]).decode().startswith("Customer#")


def test_apply_changeset_upsert_and_delete(spark, customer):
    snap = customer_cells(customer)
    key = b"cust#00000005"  # custkey 5: %20==5 -> mktsegment deleted
    deletes = spark.createDataFrame(
        [(key, "cf", b"c_mktsegment", CELL_TS + 5000, "Delete", None)],
        "row binary, family string, qualifier binary, ts long, type string, value binary",
    )
    merged = kv.visible_cells(apply_changeset(snap, deletes))
    gone = merged.filter(
        (F.col("row") == F.lit(key)) & (F.decode("qualifier", "UTF-8") == "c_mktsegment")
    )
    assert gone.count() == 0
    still = merged.filter(F.col("row") == F.lit(key))
    assert still.count() == 3  # other qualifiers intact


def test_hash_sample_is_layout_independent(spark, documents):
    s1 = {r["doc_id"] for r in hash_sample(documents, ["doc_id"], 0.2).collect()}
    s2 = {
        r["doc_id"]
        for r in hash_sample(documents.repartition(13), ["doc_id"], 0.2).collect()
    }
    assert s1 == s2  # repartitioning must not change the sample
    n = documents.count()
    assert 0.1 * n < len(s1) < 0.3 * n


def test_portable_sample_matches_duckdb(spark, documents):
    """The md5 scheme must select the IDENTICAL row set in DuckDB."""
    import duckdb

    from tests.conftest import SF_DIR

    got = {r["doc_id"] for r in portable_sample(documents, ["doc_id"], 0.2).collect()}
    want = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
            "WHERE substr(md5(concat_ws(chr(31), '42', doc_id)), 1, 8) < '33333333'"
        ).fetchall()
    }
    assert got == want and got


def test_portable_stratified_layout_independent(spark, documents):
    fr = {"en": 0.25, "zh": 0.75}
    a = {
        r["doc_id"]
        for r in portable_stratified_sample(
            documents, ["doc_id"], "lang", fr, default_fraction=0.5
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in portable_stratified_sample(
            documents.repartition(7), ["doc_id"], "lang", fr, default_fraction=0.5
        ).collect()
    }
    assert a == b and a


def test_stratified_sample_fractions(spark, documents):
    langs = [r["lang"] for r in documents.select("lang").distinct().collect()]
    fracs = {langs[0]: 1.0, langs[1]: 0.0}
    out = stratified_hash_sample(documents, "lang", fracs)
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs[0] in got and langs[1] not in got
    n_full = documents.filter(F.col("lang") == langs[0]).count()
    assert out.filter(F.col("lang") == langs[0]).count() == n_full


def test_shuffle_assign_is_a_permutation(spark, documents):
    from symat_hbase_tools_spark.operators.sampling import shuffle_assign

    out = shuffle_assign(documents.select("doc_id"), ["doc_id"]).collect()
    assert len(out) == documents.count()
    assert len({r["doc_id"] for r in out}) == len(out)  # every doc exactly once
    # positions are 1..count(shard) within each shard (contiguous ranks)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard
    assert all(0 <= s < 256 for s in by_shard)


def test_shuffle_assign_layout_independent(spark, documents):
    from symat_hbase_tools_spark.operators.sampling import shuffle_assign

    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_assign(documents.select("doc_id"), ["doc_id"]).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_assign(documents.select("doc_id").repartition(13), ["doc_id"]).collect()}
    assert a == b


def test_reservoir_per_group_sizes_and_determinism(spark, documents):
    from symat_hbase_tools_spark.operators.sampling import reservoir_per_group

    out = reservoir_per_group(documents, ["lang"], ["doc_id"], n=7).collect()
    sizes: dict[str, int] = {}
    for r in out:
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
    group_counts = {
        r["lang"]: r["n"]
        for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(7, group_counts[lang])
    again = reservoir_per_group(documents.repartition(11), ["lang"], ["doc_id"], n=7).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in again}


def test_unimax_resample_census_matches_python(spark, documents):
    import hashlib

    from symat_hbase_tools_spark.entry import doc_unimax_resample
    from tests.conftest import SF_DIR

    rows = documents.select("doc_id", "source", "text").collect()
    per_source: dict = {}
    for r in rows:
        ntok = len(r["text"].split())
        frac = int(
            hashlib.md5(f"57\x1f{r['doc_id']}".encode()).hexdigest()[:6], 16
        ) / float(16**6)
        per_source.setdefault(r["source"], []).append((ntok, frac))
    total = sum(n for v in per_source.values() for n, _ in v)
    budget = 0.5 * total / len(per_source)
    want = {}
    for src, v in per_source.items():
        grp_w = sum(n for n, _ in v)
        keep_frac = min(1.0, budget / grp_w)
        kept = [(n, f) for n, f in v if f < keep_frac]
        want[src] = (len(v), grp_w, len(kept), sum(n for n, _ in kept))
    got = {
        r["source"]: (r["n_rows"], r["grp_weight"], r["n_kept"], r["weight_kept"])
        for r in doc_unimax_resample(spark, SF_DIR).collect()
    }
    assert got == want
    # sanity: the cap binds somewhere and spares somewhere on a skewed corpus
    fracs = {
        r["source"]: r["keep_frac"]
        for r in doc_unimax_resample(spark, SF_DIR).collect()
    }
    assert all(0.0 < f <= 1.0 for f in fracs.values())


def test_unimax_under_budget_groups_kept_whole(spark):
    from symat_hbase_tools_spark.operators.sampling import unimax_resample_census
    from pyspark.sql import functions as F

    # one giant domain, two tiny ones: tiny domains must keep everything
    data = [(i, "big", 100) for i in range(50)] + [
        (1000, "s1", 3),
        (1001, "s2", 5),
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, w long")
    out = {
        r["source"]: r
        for r in unimax_resample_census(
            df, "source", F.col("w"), ["doc_id"], budget_frac=0.6
        ).collect()
    }
    for s in ("s1", "s2"):
        assert out[s]["keep_frac"] == 1.0
        assert out[s]["n_kept"] == out[s]["n_rows"]
        assert out[s]["weight_kept"] == out[s]["grp_weight"]
    assert out["big"]["keep_frac"] < 1.0
    assert out["big"]["n_kept"] < out["big"]["n_rows"]


def test_unimax_resample_rows_consistent_with_census(spark, documents):
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.functions.text import token_count
    from symat_hbase_tools_spark.operators.sampling import (
        unimax_resample,
        unimax_resample_census,
    )

    kept = unimax_resample(
        documents, "source", token_count(F.col("text")), ["doc_id"]
    )
    assert kept.columns == documents.columns
    got = {
        r["source"]: (r["n"], r["tok"])
        for r in kept.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(token_count(F.col("text"))).alias("tok"),
        )
        .collect()
    }
    want = {
        r["source"]: (r["n_kept"], r["weight_kept"])
        for r in unimax_resample_census(
            documents, "source", token_count(F.col("text")), ["doc_id"]
        ).collect()
        if r["n_kept"] > 0
    }
    assert got == want


def test_kcenter_matches_python_greedy(spark):
    """Engine greedy k-center == the straight-line python greedy, rank by
    rank (same seed reference: corpus mean direction; same tie-break:
    smallest vec_id)."""
    import numpy as np

    from symat_hbase_tools_spark.operators.sampling import kcenter_select
    from tests.conftest import SF_DIR

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    mean = E.mean(axis=0) * 0 + np.array(
        [r["embedding"] for r in rows], dtype=np.float64
    ).mean(axis=0)
    mean = mean / np.linalg.norm(mean)

    want = []
    centers = mean.reshape(1, -1)
    chosen = set()
    for rank in range(1, 9):
        d = np.sqrt(
            ((E[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        )
        # exclude already chosen; farthest, ties to smallest vec_id
        order = sorted(
            (i for i in range(len(ids)) if ids[i] not in chosen),
            key=lambda i: (-d[i], ids[i]),
        )
        pick = order[0]
        want.append((rank, int(ids[pick]), round(float(d[pick]), 6)))
        chosen.add(ids[pick])
        centers = (
            E[[pick]] if rank == 1 else np.vstack([centers, E[[pick]]])
        )
    got = [
        (r["rank"], r["vec_id"], r["sel_dist"])
        for r in kcenter_select(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == want


def test_kcenter_zero_norm_vector_never_wins(spark, tmp_path):
    """A zero-norm embedding must not produce a NaN min-distance (NaN
    sorts above every double in the struct max, so an unguarded kernel
    would make the zero vector win EVERY greedy round). With the guard it
    normalizes to ~0 and behaves like any near-mean point."""
    import numpy as np

    from symat_hbase_tools_spark.operators.sampling import kcenter_select

    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=8).tolist()) for i in range(20)]
    vecs.append((99, [0.0] * 8))  # the adversarial zero-norm row
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    got = kcenter_select(spark, str(tmp_path), k=5).orderBy("rank").collect()
    ranks = [r["rank"] for r in got]
    dists = [r["sel_dist"] for r in got]
    assert ranks == [1, 2, 3, 4, 5]
    # no NaN leaked into the selection distances
    assert all(d == d for d in dists)
    # greedy invariant from rank 2 on: selection distances non-increasing
    # (rank 1 measures to the corpus MEAN, not a center, so 1->2 may rise;
    # a NaN winner would break this ordering immediately)
    assert all(a >= b for a, b in zip(dists[1:], dists[2:]))
    # the zero vector normalizes to ~0, i.e. close to typical points; it
    # must not be picked ahead of genuinely far vectors every round
    assert [r["vec_id"] for r in got].count(99) <= 1
