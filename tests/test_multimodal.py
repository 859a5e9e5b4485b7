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


def test_ppm_roundtrip_exact():
    """Encode → decode must reproduce geometry and generator-truth features
    bit-for-bit, including a header with comments and odd whitespace."""
    import numpy as np

    from eastmoneygubacrawler_spark.fixtures.media import (
        encode_ppm,
        image_feature_truth,
    )
    from eastmoneygubacrawler_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    w, h, feats = decode_ppm(encode_ppm(px, comment="hello # nested"))
    assert (w, h) == (13, 11)
    assert (feats == image_feature_truth(px)).all()
    # arbitrary-whitespace header variant (netpbm allows any blank runs)
    alt = b"P6 # c\n  13\t11\n255\n" + px.tobytes()
    assert decode_ppm(alt)[:2] == (13, 11)


def test_ppm_malformed_raises():
    import numpy as np
    import pytest as _pt

    from eastmoneygubacrawler_spark.fixtures.media import encode_ppm
    from eastmoneygubacrawler_spark.operators.multimodal import decode_ppm

    good = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    for bad in (good[:-5], b"P6\n4 4\n", b"P6\n4 4\n65535\n" + b"\0" * 96,
                b"P5\n4 4\n255\n" + b"\0" * 10,  # truncated P5 raster
                b"P4\n4 4\n" + b"\0" * 2,        # P4 bitmap unsupported
                b""):
        with _pt.raises(ValueError):
            decode_ppm(bad)


def test_wav_roundtrip_exact():
    import numpy as np

    from eastmoneygubacrawler_spark.fixtures.media import (
        audio_feature_truth,
        encode_wav,
    )
    from eastmoneygubacrawler_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(11)
    mono = (rng.standard_normal(4000) * 8000).astype(np.int16)
    nf, rate, dur, feats = decode_wav(encode_wav(mono, 16000, 1))
    assert (nf, rate, dur) == (4000, 16000, 250)
    assert (feats == audio_feature_truth(mono)).all()
    stereo = np.stack([mono, -mono // 3], axis=1).astype(np.int16)
    nf2, rate2, dur2, feats2 = decode_wav(encode_wav(stereo, 8000, 2))
    assert (nf2, rate2, dur2) == (4000, 8000, 500)
    assert (feats2 == audio_feature_truth(stereo)).all()


def test_wav_malformed_raises():
    import numpy as np
    import pytest as _pt

    from eastmoneygubacrawler_spark.fixtures.media import encode_wav
    from eastmoneygubacrawler_spark.operators.multimodal import decode_wav

    good = encode_wav(np.zeros(100, dtype=np.int16), 8000, 1)
    for bad in (good[:20], b"RIFFxxxx", b"", b"abc"):
        with _pt.raises(ValueError):
            decode_wav(bad)


def test_extract_fixture_corpus_real_codecs(spark):
    """The full fixture corpus through the distributed operator: real decodes
    ok=True with generator-truth stats; corrupt/unknown rows ok=False."""
    from eastmoneygubacrawler_spark.fixtures.media import make_media_corpus
    from eastmoneygubacrawler_spark.schema import MEDIA as MEDIA_SCHEMA

    corpus = make_media_corpus()
    media = spark.createDataFrame(corpus["media_rows"], MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           extract_media_features(media, deterministic_fake=True,
                                  n_partitions=4).collect()}
    for exp in corpus["expected"]:
        r = out[exp["media_id"]]
        assert r.ok == exp["ok"], exp
        if exp["ok"]:
            assert (r.width, r.height, r.n_frames, r.sample_rate,
                    r.duration_ms) == (exp["width"], exp["height"],
                                       exp["n_frames"], exp["sample_rate"],
                                       exp["duration_ms"]), exp
            for i in range(6):
                assert r.features[i] == exp[f"f{i}"], (exp["media_id"], i)
        else:
            assert r.features is None


def test_frame_sample_plan(spark, media):
    frames = frame_sample(media, every_n=5)
    rows = frames.collect()
    assert rows and all(r.frame_idx % 5 == 0 for r in rows)
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, 5))


def test_pgm_and_pcm8_roundtrip():
    """P5 grayscale expands to R=G=B through the shared netpbm parser; PCM8
    maps to the int16 scale — both must hit generator truth bit-for-bit."""
    import numpy as np

    from eastmoneygubacrawler_spark.fixtures.media import (
        audio_feature_truth,
        encode_pgm,
        encode_wav8,
        image_feature_truth,
    )
    from eastmoneygubacrawler_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )

    rng = np.random.default_rng(21)
    gray = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    w, h, feats = decode_ppm(encode_pgm(gray, comment="g"))
    assert (w, h) == (14, 9)
    truth = image_feature_truth(np.repeat(gray[..., None], 3, axis=2))
    assert (feats == truth).all()

    u8 = rng.integers(0, 256, size=1500, dtype=np.uint8)
    nf, rate, dur, afeats = decode_wav(encode_wav8(u8, 16000))
    assert (nf, rate, dur) == (1500, 16000, 93)
    atruth = audio_feature_truth(((u8.astype(np.int32) - 128) * 256).astype(np.int16))
    assert (afeats == atruth).all()


def test_codec_fuzz_never_crashes():
    """Contract: arbitrary bytes either decode successfully or raise
    ValueError — no other exception class escapes the parsers (a corrupt
    payload in a 100 TB media table must become an ok=False row, never a
    task failure)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from eastmoneygubacrawler_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )

    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def _fuzz(payload):
        for dec in (decode_ppm, decode_wav):
            try:
                dec(payload)
            except ValueError:
                pass

    _fuzz()

    # seeded near-valid headers (more likely to reach deep parser states)
    import numpy as np

    from eastmoneygubacrawler_spark.fixtures.media import encode_ppm, encode_wav

    rng = np.random.default_rng(3)
    good_p = bytearray(encode_ppm(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)))
    good_w = bytearray(encode_wav((rng.standard_normal(64) * 99).astype(np.int16), 8000))
    for blob, dec in ((good_p, decode_ppm), (good_w, decode_wav)):
        for _ in range(200):
            b = bytearray(blob)
            for _ in range(rng.integers(1, 4)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                dec(bytes(b))
            except ValueError:
                pass
