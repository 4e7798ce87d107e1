"""Z-order layout tests: the written files must exhibit multi-dimensional
locality (small per-file bounding boxes) so parquet min/max stats can prune
on EITHER clustered column — the property single-column sorting lacks."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from symat_hbase_tools_spark.sources.layout import morton_key, write_zordered
from symat_hbase_tools_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _file_boxes(path: str, xcol: str, ycol: str):
    """(xmin, xmax, ymin, ymax) per parquet data file from footer stats."""
    boxes = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        xmn = ymn = float("inf")
        xmx = ymx = float("-inf")
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name == xcol:
                    xmn = min(xmn, col.statistics.min)
                    xmx = max(xmx, col.statistics.max)
                elif name == ycol:
                    ymn = min(ymn, col.statistics.min)
                    ymx = max(ymx, col.statistics.max)
        boxes.append((xmn, xmx, ymn, ymx))
    return boxes


def test_morton_key_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            morton_key([F.col("a"), F.col("b")], bits=2).alias("z")
        ).collect()
    ]
    # z(a,b) with a in even bits, b in odd: (0,0)->0 (1,0)->1 (0,1)->2 (3,3)->15
    assert got == [0, 1, 2, 15]


def test_zorder_layout_has_2d_locality(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.col("ts_ns").alias("t")
    )
    n = events.count()
    z_path = str(tmp_path / "zordered")
    s_path = str(tmp_path / "timesorted")
    write_zordered(events, z_path, ["user_id", "t"], n_files=8)
    events.repartitionByRange(8, "t").sortWithinPartitions("t").write.parquet(s_path)

    # round trip intact
    assert spark.read.parquet(z_path).count() == n

    span = lambda lo, hi, gmin, gmax: (hi - lo) / max(gmax - gmin, 1)  # noqa: E731
    g = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("t"), F.max("t")
    ).collect()[0]
    umin, umax, tmin, tmax = g

    def mean_spans(path):
        boxes = _file_boxes(path, "user_id", "t")
        assert boxes
        u_spans = [span(x0, x1, umin, umax) for x0, x1, _, _ in boxes]
        t_spans = [span(y0, y1, tmin, tmax) for _, _, y0, y1 in boxes]
        return sum(u_spans) / len(u_spans), sum(t_spans) / len(t_spans)

    z_u, z_t = mean_spans(z_path)
    s_u, s_t = mean_spans(s_path)
    # single-column sorting constrains ONLY its sort axis: every time-sorted
    # file spans ~the full user range. Z-ordered files constrain BOTH axes
    # partially — that's what buys pruning on either predicate.
    assert s_u > 0.9, s_u
    assert z_u < 0.6, (z_u, s_u)
    assert z_t < 0.6, (z_t, s_t)

    # a user-only range predicate (the axis sorting can't serve) must
    # intersect strictly fewer z-ordered files than time-sorted ones
    q_lo = umax - (umax - umin) // 4  # top quarter of the user range

    def files_hit_user_range(path):
        return sum(
            1
            for x0, x1, _, _ in _file_boxes(path, "user_id", "t")
            if not (x1 < q_lo or x0 > umax)
        )

    assert files_hit_user_range(z_path) < files_hit_user_range(s_path)
