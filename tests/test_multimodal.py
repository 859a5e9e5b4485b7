"""Multimodal plumbing: schema, batching, decode-stub behavior, frame plan."""

import pytest
from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_media_features,
    frame_sample,
)
from eastmoneygubacrawler_spark.schema import MEDIA


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([i % 251]) * (512 + 997 * i)
        rows.append((i, kind, payload, f"{kind}/x", None, None, None))
    return spark.createDataFrame(rows, MEDIA)


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", deterministic_fake=False)
    w, h, feats = decode_image(b"abc", deterministic_fake=True)
    w2, h2, feats2 = decode_image(b"abc", deterministic_fake=True)
    assert (w, h) == (w2, h2) and (feats == feats2).all()
    assert feats.shape == (FEATURE_DIM,)


def test_extract_media_features(spark, media):
    out = extract_media_features(media, deterministic_fake=True, n_partitions=4)
    rows = out.collect()
    assert len(rows) == 30
    assert all(r.ok for r in rows)
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        if r.kind == "image":
            assert r.width and r.height
        if r.kind == "video":
            assert r.n_frames >= 1
    # deterministic across runs
    again = {r.media_id: tuple(r.features) for r in out.collect()}
    assert all(tuple(r.features) == again[r.media_id] for r in rows)


def test_frame_sample_plan(spark, media):
    frames = frame_sample(media, every_n=5)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 5 == 0 for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 5))
