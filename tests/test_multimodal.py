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


def test_real_decoder_rejects_non_raster_and_compressed(spark, documents):
    """The round-15 real tier decodes uncompressed rasters only: the
    synthetic txt payloads are refused as undecodable, and compressed
    containers (png) keep the honest NotImplementedError stub."""
    rec = multimodal.attach_payload(documents.limit(2))
    with pytest.raises(Exception, match="undecodable"):
        multimodal.extract_features(rec, use_real_decoder=True).collect()
    with pytest.raises(NotImplementedError, match="compressed container"):
        multimodal.decode_raster(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


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


def test_sniff_media_meta_real_headers(spark):
    """The header sniffer must parse GENUINE container bytes — hand-built
    valid PNG signature+IHDR, GIF89a screen descriptor, canonical WAV
    RIFF header, and a JPEG SOI — all JVM-side expressions, no Python on
    the data path."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x06\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    wav = (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
    )
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00\x10JFIF\x00"
    junk = b"not a media file at all"

    df = spark.createDataFrame(
        [(1, png), (2, gif), (3, wav), (4, jpeg), (5, junk)],
        "doc_id long, payload binary",
    )
    from symat_hbase_tools_spark.operators.multimodal import sniff_media_meta

    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"], r["sample_rate"])
        for r in sniff_media_meta(df).collect()
    }
    assert got[1] == ("png", 640, 480, None)
    assert got[2] == ("gif", 320, 200, None)
    assert got[3] == ("wav", None, None, 44100)
    assert got[4] == ("jpeg", None, None, None)
    assert got[5] == ("unknown", None, None, None)

    # plan stays whole-stage codegen (no Python workers involved)
    from symat_hbase_tools_spark.plans.explain import plan_string

    plan = plan_string(sniff_media_meta(df), "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_resize_aspect_and_bytes(spark, documents):
    """Resize contract: long side clamps to max_side, aspect preserved
    under integer floor, output bytes = area-ratio truncation of the
    payload, never longer than the input."""
    from symat_hbase_tools_spark.operators.multimodal import (
        attach_payload,
        resize_images,
    )

    recs = attach_payload(documents)
    meta = {
        r["doc_id"]: (r["meta"]["width"], r["meta"]["height"], len(r["payload"]))
        for r in recs.collect()
    }
    out = resize_images(recs, max_side=64).collect()
    assert len(out) == len(meta)
    for r in out:
        w, h, in_len = meta[r["doc_id"]]
        long_side = max(w, h)
        scale = min(long_side, 64)
        assert r["out_width"] == max(w * scale // long_side, 1)
        assert r["out_height"] == max(h * scale // long_side, 1)
        assert max(r["out_width"], r["out_height"]) <= 64
        want_len = min(max(in_len * (r["out_width"] * r["out_height"]) // (w * h), 1), in_len)
        assert r["out_len"] == want_len == len(r["out_bytes"])
        assert r["out_len"] <= in_len


def test_resize_real_decoder_rejects_non_raster(spark, documents):
    """The real resize path decodes uncompressed rasters only — the
    synthetic txt payloads are refused as undecodable."""
    import pytest

    from symat_hbase_tools_spark.operators.multimodal import (
        attach_payload,
        resize_images,
    )

    with pytest.raises(Exception, match="undecodable"):
        resize_images(attach_payload(documents), use_real_decoder=True).collect()


def _phash64(payload: bytes) -> int:
    """Python mirror of the dHash kernel for parity tests."""
    import numpy as np

    n_cells = multimodal.PHASH_ROWS * multimodal.PHASH_COLS
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    edges = (np.arange(n_cells + 1, dtype=np.int64) * len(a)) // n_cells
    cs = np.concatenate(([0.0], np.cumsum(a)))
    cnt = (edges[1:] - edges[:-1]).astype(np.float64)
    sums = cs[edges[1:]] - cs[edges[:-1]]
    means = np.divide(sums, cnt, out=np.zeros(n_cells), where=cnt > 0).reshape(
        multimodal.PHASH_ROWS, multimodal.PHASH_COLS
    )
    bits = (means[:, 1:] > means[:, :-1]).ravel().astype(np.uint64)
    fp = int((bits * (1 << np.arange(63, -1, -1, dtype=np.uint64))).sum())
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_perceptual_hash_matches_python_mirror(spark, documents):
    """Spark kernel == the straight-line python fold, doc by doc."""
    got = {
        r["doc_id"]: r["fp"]
        for r in multimodal.perceptual_hashes(
            multimodal.attach_payload(documents.limit(25))
        ).collect()
    }
    for r in documents.limit(25).collect():
        assert got[r["doc_id"]] == _phash64(r["text"].encode())


def test_single_byte_edit_stays_within_hamming_two(spark, documents):
    """The check twin's guarantee, asserted directly: replacing ONE byte
    perturbs one grid cell, flipping at most the two adjacent gradient
    bits — for every corpus document, at any payload length."""
    for r in documents.limit(50).collect():
        p = r["text"].encode()
        if len(p) < 8:
            continue
        q = b"~" + p[1:]
        d = _phash64(p) ^ _phash64(q)
        assert bin(d & ((1 << 64) - 1)).count("1") <= 2


def test_near_dup_pairs_band_join_is_exact(spark):
    """Band blocking must equal brute force for hamming <= 3 (pigeonhole).

    Payload pairs engineered at hamming 0/1/2 (recovered) and a far pair
    (dropped); brute-force popcount over all fingerprints is the oracle."""
    rows = []
    base = bytes(range(256)) * 4
    rows.append((1, base))
    rows.append((2, base))  # identical -> hamming 0
    rows.append((3, b"~" + base[1:]))  # one-byte edit -> <= 2
    rows.append((4, bytes(255 - b for b in base)))  # inverted -> far
    rows.append((5, base[::-1]))  # reversed -> far-ish
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = {
        r["doc_id"]: r["fp"]
        for r in multimodal.perceptual_hashes(df).collect()
    }
    want = set()
    ids = sorted(fps)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            x = (fps[d1] ^ fps[d2]) & ((1 << 64) - 1)
            if bin(x).count("1") <= 3:
                want.add((d1, d2))
    got = {
        (r["d1"], r["d2"])
        for r in multimodal.near_dup_pairs(df, max_hamming=3).collect()
    }
    assert got == want
    assert (1, 2) in got and (1, 3) in got


def test_multimodal_near_dup_check_covers_all_plants(spark):
    row = multimodal.multimodal_near_dup_check(spark, SF_DIR).collect()[0]
    assert row["coverage_ok"] and row["n_planted"] > 0


def test_decode_raster_roundtrips_all_containers():
    """Round-15 real decoder: asymmetric fixtures round-trip exactly
    through P5 (header parse), P6 (luma fold), and 24-bpp BMP (row
    padding + bottom-up order); headers may carry comments; unknown
    bytes raise ValueError."""
    import numpy as np

    g = (np.arange(7 * 5, dtype=np.int64).reshape(5, 7) * 11) % 256
    assert np.array_equal(multimodal.decode_raster(multimodal.encode_pgm(g)), g)
    assert np.array_equal(
        multimodal.decode_raster(multimodal.encode_bmp24_gray(g)), g
    )
    rgb = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    p6 = b"P6\n4 3\n255\n" + rgb.tobytes()
    assert np.array_equal(
        multimodal.decode_raster(p6), rgb.astype(np.int64).sum(2) // 3
    )
    commented = b"P5\n# fixture\n7 5\n255\n" + g.astype(np.uint8).tobytes()
    assert np.array_equal(multimodal.decode_raster(commented), g)
    with pytest.raises(ValueError, match="undecodable"):
        multimodal.decode_raster(b"not a raster at all")


def test_resize_real_path_box_filters_decoded_pixels(spark):
    """resize_images(use_real_decoder=True) on a genuine PGM: output is
    the exact 8x8 block-mean thumbnail, re-encoded as decodable P5, with
    dims from the DECODED raster (not metadata)."""
    import numpy as np

    g = (np.add.outer(np.arange(64), np.arange(64)) * 3) % 200
    rec = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_pgm(g)))], "doc_id long, payload binary"
    )
    row = multimodal.resize_images(
        rec, max_side=8, use_real_decoder=True
    ).collect()[0]
    assert (row["out_width"], row["out_height"]) == (8, 8)
    got = multimodal.decode_raster(bytes(row["out_bytes"]))
    want = np.rint(multimodal._block_means(g.astype(np.int64), 8, 8)).astype(
        np.int64
    )
    assert np.array_equal(got, want)


def test_decoded_dhash_survives_crop_where_byte_dhash_cannot(spark):
    """The round-15 claim, pinned: a 2-row+2-col crop leaves the DECODED
    dHash exactly unchanged (banded-ramp construction — see
    multimodal_decode_edit_check), while the byte-raster dHash of the
    same payload pair lands far outside max_hamming=3 (the reflowed
    stream misaligns every grid cell). Brightness +20 is also exact."""
    import numpy as np

    rows = []
    for d in (1, 5, 42, 123):
        g = multimodal._banded_ramp_gray(d)
        rows.append((d, bytearray(multimodal.encode_pgm(g))))
        rows.append((d + 1000, bytearray(multimodal.encode_pgm(g[:-2, :-2]))))
        rows.append((d + 2000, bytearray(multimodal.encode_pgm(g + 20))))
    rec = spark.createDataFrame(rows, "doc_id long, payload binary")
    dec = {
        r["doc_id"]: r["fp"]
        for r in multimodal.decoded_perceptual_hashes(rec).collect()
    }
    byt = {
        r["doc_id"]: r["fp"] for r in multimodal.perceptual_hashes(rec).collect()
    }
    for d in (1, 5, 42, 123):
        assert dec[d] == dec[d + 1000] == dec[d + 2000]
        byte_crop_hamming = bin(
            (byt[d] ^ byt[d + 1000]) & ((1 << 64) - 1)
        ).count("1")
        assert byte_crop_hamming > 3, (d, byte_crop_hamming)


def test_decode_features_reports_decoded_dims_not_meta(spark):
    """extract_features(use_real_decoder=True) and decode_features both
    report dims read from the BYTES; a payload whose raster disagrees
    with any metadata claim surfaces the truth."""
    import numpy as np

    g = (np.arange(6 * 9, dtype=np.int64).reshape(6, 9) * 7) % 256
    rec = spark.createDataFrame(
        [(7, bytearray(multimodal.encode_bmp24_gray(g)))],
        "doc_id long, payload binary",
    ).withColumn(
        "meta",
        __import__("pyspark.sql.functions", fromlist=["struct"]).struct(),
    )
    row = multimodal.decode_features(rec).collect()[0]
    assert (row["format"], row["width"], row["height"]) == ("bmp", 9, 6)
    assert row["pixel_sum"] == int(g.sum())
    feat = multimodal.extract_features(rec, use_real_decoder=True).collect()[0]
    assert (feat["width"], feat["height"]) == (9, 6)
    assert feat["checksum"] == int(g.sum()) % multimodal.CHECKSUM_MOD
