#!/usr/bin/env python
"""Boilerplate-heavy documents probe — forces the hot-shingle demotion path.

The driver corpora are boilerplate-free (max shingle df 10 at sf0.1), so
``prefix_filter_pairs``' sampled hot-shingle demotion branch
(``operators/dedup.py::_hot_shingle_list``) never fires at any measured
scale (round-4 verdict #3). This tool derives a corpus where it MUST: a
fixed boilerplate header/footer (think license banners, nav chrome,
cookie notices) is attached to a configurable fraction of documents, so
those shingles reach df in the thousands and would otherwise explode the
prefix join quadratically.

Only documents.parquet is written — the dedup operators read nothing else.

Usage:
    python tools/make_boilerplate_probe.py SRC_DIR OUT_DIR [frac=0.3]
e.g.
    python tools/make_boilerplate_probe.py /root/testdata/sf0.1 /tmp/bp_sf01
    python tools/make_boilerplate_probe.py /tmp/sf1_probe /tmp/bp_sf1
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

#: 14 words -> 12 3-shingles shared by every stamped document; long enough
#: that un-demoted prefixes would certainly include several of them
BOILER_HEAD = (
    "this document is provided under the standard terms and conditions "
    "please review carefully"
)
BOILER_TAIL = "all rights reserved contact the site administrator for details"


def main() -> None:
    src = sys.argv[1]
    outdir = sys.argv[2]
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    os.makedirs(outdir, exist_ok=True)

    tbl = pq.read_table(f"{src}/documents.parquet")
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    mod = max(2, int(round(1 / frac)))
    out = [
        f"{BOILER_HEAD} {t} {BOILER_TAIL}" if (i % mod == 0) else t
        for i, t in zip(ids, texts)
    ]
    n_stamped = sum(1 for i in ids if i % mod == 0)
    tbl = tbl.set_column(
        tbl.column_names.index("text"), "text", pa.array(out, type=pa.string())
    )
    tbl = tbl.set_column(
        tbl.column_names.index("n_chars"),
        "n_chars",
        pa.array([len(t) for t in out], type=pa.int64()),
    )
    pq.write_table(tbl, f"{outdir}/documents.parquet")
    print(f"{len(out)} docs, {n_stamped} stamped ({n_stamped/len(out):.0%}) at {outdir}")


if __name__ == "__main__":
    main()
