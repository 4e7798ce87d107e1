"""Multimodal plumbing tests: schema, batch shape, deterministic fake decode,
stubbed real decoder."""

from __future__ import annotations

import pytest

from symat_hbase_tools_spark.operators import multimodal
from tests.conftest import SF_DIR


def test_payload_schema(spark, documents):
    rec = multimodal.attach_payload(documents)
    dtypes = dict(rec.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<format:string,width:int,height:int,n_frames:int")


def test_features_match_python(spark, documents):
    sample = {r["doc_id"]: r for r in documents.limit(20).collect()}
    out = {r["doc_id"]: r for r in multimodal.multimodal_features(spark, SF_DIR).collect()}
    assert len(out) == documents.count()
    for doc_id, src in sample.items():
        payload = src["text"].encode()
        got = out[doc_id]
        assert got["byte_len"] == len(payload)
        assert got["checksum"] == sum(payload) % multimodal.CHECKSUM_MOD
        assert got["width"] == src["n_chars"] % 640 + 1
        assert got["height"] == doc_id % 480 + 1


def test_real_decoder_is_stubbed(spark, documents):
    rec = multimodal.attach_payload(documents.limit(2))
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(rec, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_features_survive_repartition(spark, documents):
    rec = multimodal.attach_payload(documents).repartition(7)
    out = multimodal.extract_features(rec)
    assert out.count() == documents.count()


def test_frame_sampling(spark, documents):
    frames = multimodal.sample_frames(multimodal.attach_payload(documents))
    rows = frames.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for r in documents.limit(20).collect():
        n_frames = r["doc_id"] % 10 + 1
        assert sorted(by_doc[r["doc_id"]]) == list(range(0, n_frames, 2))


def test_frame_census(spark, documents):
    out = multimodal.multimodal_frame_census(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in out) == documents.count()
