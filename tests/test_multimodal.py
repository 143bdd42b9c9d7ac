"""Multimodal plumbing tests: binary payload generation stays JVM-side,
mapInPandas batch shapes are real Arrow batches, the real-codec stub
fails loudly, and stats survive a repartition (distribution-safe)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

from etl_mapwarper_spark.operators import multimodal as mm  # noqa: E402


def test_payload_bytes_match_contract(spark):
    row = (
        mm.synthetic_media(spark, SF_DIR)
        .filter("media_id = 7")
        .collect()[0]
    )
    raw = np.frombuffer(row.payload, dtype=np.uint8)
    assert len(raw) == mm.W * mm.H
    assert list(raw[:5]) == [(7 + i) % 256 for i in range(5)]
    assert row.meta.width == mm.W and row.meta.frames == 1


def test_payload_generation_has_no_python_stage(spark):
    media = mm.synthetic_media(spark, SF_DIR)
    plan = media._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # unhex/transform are JVM expressions


def test_video_payload_is_frames_times_image(spark):
    row = (
        mm.synthetic_media(spark, SF_DIR, kind="video")
        .filter("media_id = 3")
        .collect()[0]
    )
    assert len(row.payload) == mm.W * mm.H * mm.FRAMES
    assert row.meta.frames == mm.FRAMES


def test_image_stats_values(spark):
    stats = {
        r.media_id: r
        for r in mm.image_stats(mm.synthetic_media(spark, SF_DIR))
        .filter("media_id IN (0, 11)")
        .collect()
    }
    # media 0: bytes 0..63 -> mean 31.5, min 0, max 63
    assert stats[0].n_bytes == 64
    assert stats[0].mean_px == pytest.approx(31.5)
    assert (stats[0].min_px, stats[0].max_px) == (0, 63)
    # media 11: bytes 11..74
    assert stats[11].mean_px == pytest.approx(42.5)
    assert (stats[11].min_px, stats[11].max_px) == (11, 74)


def test_stats_stable_under_repartition(spark):
    media = mm.synthetic_media(spark, SF_DIR)
    a = sorted(map(tuple, mm.image_stats(media).collect()))
    b = sorted(map(tuple, mm.image_stats(media.repartition(16, "media_id")).collect()))
    assert a == b


def test_resize_avgpool_shape_and_values(spark):
    rows = (
        mm.resize_avgpool(mm.synthetic_media(spark, SF_DIR))
        .filter("media_id = 0")
        .collect()
    )
    assert len(rows) == (mm.W // 2) * (mm.H // 2)
    vals = {(r.y, r.x): r.pooled for r in rows}
    # cell (0,0) of media 0 = mean of bytes at idx 0,1,8,9 = 4.5
    assert vals[(0, 0)] == pytest.approx(4.5)


def test_real_decode_png_wav_and_loud_stub_otherwise():
    """decode_real is REAL for PNG/WAV (stdlib codec) and a loud,
    import-gated stub for formats that need external libraries."""
    import numpy as np

    from etl_mapwarper_spark.functions.media_codec import encode_png

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(mm.decode_real(encode_png(img), "image"), img)
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        mm.decode_real(b"\x00", "image")


def test_mapinpandas_receives_arrow_batches(spark):
    """The stage contract: whole pandas DataFrames per partition batch."""
    import pandas as pd

    seen_types = []

    def probe(batches):
        for pdf in batches:
            seen_types.append(type(pdf).__name__)
            yield pd.DataFrame({"n": [len(pdf)]})

    media = mm.synthetic_media(spark, SF_DIR).coalesce(2)
    total = media.mapInPandas(probe, schema="n int")
    assert total.agg({"n": "sum"}).collect()[0][0] == media.count()


def test_phash_grouped_matches_pairlisting_model(spark):
    """The r8 grouped mm_phash_neardups plan (identical hashes
    collapsed before the banded Hamming join) must be VALUE-IDENTICAL
    to the pair-listing semantics it replaced. The python model here
    recomputes n_neardups by brute force over all image pairs — and
    first asserts the fixture actually exercises every branch: cross-
    hash neighbors at hamming 1 and 2 (the weight-join path) and
    hamming-3 hash pairs that band blocking MAY generate but the
    filter must exclude."""
    from collections import Counter
    from itertools import combinations

    W = H = 8

    def ahash(m: int) -> str:
        img = np.array(
            [(m + i) % 256 for i in range(W * H)], dtype=np.float64
        ).reshape(H, W)
        pooled = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
        mean = pooled.mean()
        return "".join("1" if p > mean else "0" for p in pooled.flatten())

    n = 200
    hashes = {m: ahash(m) for m in range(n)}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    distinct = sorted(set(hashes.values()))
    cross = Counter(
        ham(a, b) for a, b in combinations(distinct, 2) if ham(a, b) <= 3
    )
    # fixture coverage: the grouped plan's cross-hash weight path AND
    # the exclusion boundary are both live in the gate fixture
    assert cross[1] >= 1 and cross[2] >= 1, cross
    assert cross[3] >= 1, cross

    expect = {
        m: sum(
            1
            for m2 in range(n)
            if m2 != m and ham(hashes[m], hashes[m2]) <= mm._PH_MAX_HAMMING
        )
        for m in range(n)
    }

    got = {
        r.media_id: r.n_neardups
        for r in mm.mm_phash_neardups(spark, SF_DIR).collect()
    }
    assert got == expect
