"""Deterministic media fixture corpus with generator-side ground truth.

The round-3 verdict's top item: de-stub the multimodal codec path with
stdlib-only formats and a fixture-ground-truth oracle.  This module is the
*generator side* of that cross-check, mirroring the pages.text / simulator
pattern: it builds raw pixel / sample arrays first, computes the expected
feature statistics directly from those arrays with its own code, and only
then encodes them to PPM / WAV bytes.  The engine decoder
(operators/multimodal.py) parses the bytes back and computes the same
statistics with *its* code — the two meet bit-for-bit only if the decode is
correct, which makes the DuckDB oracle a real end-to-end gate rather than a
self-comparison.

Formats (zero new dependencies):
- PPM P6 (binary, maxval 255, optional ``#`` header comments) — hand-rolled
  encoder, ~10 lines.
- WAV PCM16 mono/stereo — stdlib ``wave``.

The ``video`` kind stays on the deterministic-fake contract (no container
format parses with the stdlib); its expected features restate the documented
md5-seeded algorithm rather than importing it from the operator, so the
fixture remains an independent statement of the contract.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray, comment: str | None = None) -> bytes:
    """uint8 array (h, w, 3) → binary PPM (P6, maxval 255)."""
    h, w, _ = pixels.shape
    header = b"P6\n"
    if comment is not None:
        header += b"# " + comment.encode() + b"\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def encode_pgm(pixels: np.ndarray, comment: str | None = None) -> bytes:
    """uint8 array (h, w) → binary PGM (P5, maxval 255)."""
    h, w = pixels.shape
    header = b"P5\n"
    if comment is not None:
        header += b"# " + comment.encode() + b"\n"
    header += f"{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, framerate: int, nchannels: int = 1) -> bytes:
    """int16 array, shape (n,) mono or (n, nchannels) → RIFF/WAVE PCM16 bytes."""
    if samples.ndim == 1:
        interleaved = samples
    else:
        interleaved = samples.reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nchannels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(interleaved.astype("<i2").tobytes())
    return buf.getvalue()


def encode_wav8(samples_u8: np.ndarray, framerate: int) -> bytes:
    """uint8 array (n,) → RIFF/WAVE unsigned-PCM8 mono bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(samples_u8.astype(np.uint8).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# ground-truth feature statistics (generator-side restatement of the
# operator's documented feature contract — kept import-independent)
# ---------------------------------------------------------------------------

def image_feature_truth(pixels: np.ndarray) -> np.ndarray:
    """Expected 16-dim features for an RGB uint8 array (h, w, 3).

    [mean_r, mean_g, mean_b, std_r, std_g, std_b, mean_luma, std_luma,
     luma_hist_8bins (fractions)] — channels scaled to [0, 1], population
    std, luma = 0.299 R + 0.587 G + 0.114 B, histogram over [0, 1].
    """
    x = pixels.astype(np.float64) / 255.0
    luma = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    feats = np.concatenate(
        [
            x.reshape(-1, 3).mean(axis=0),
            x.reshape(-1, 3).std(axis=0),
            [luma.mean(), luma.std()],
            hist / luma.size,
        ]
    )
    return feats.astype(np.float32)


def audio_feature_truth(samples: np.ndarray) -> np.ndarray:
    """Expected 16-dim features for int16 samples, (n,) or (n, ch).

    Channels are mixed to mono by mean, scaled by 1/32768:
    [mean, rms, peak(|x|), zero-crossing rate, |x| hist 12 bins over [0, 1]].
    """
    s = samples.astype(np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    s = s / 32768.0
    zc = np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])) if s.size > 1 else 0.0
    hist, _ = np.histogram(np.abs(s), bins=12, range=(0.0, 1.0))
    feats = np.concatenate(
        [
            [s.mean(), np.sqrt(np.mean(s * s)), np.abs(s).max(), zc],
            hist / s.size,
        ]
    )
    return feats.astype(np.float32)


def fake_feature_truth(payload: bytes) -> np.ndarray:
    """Restated deterministic-fake contract (md5-seeded standard normal)."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

def make_media_corpus(seed: int = 42):
    """Deterministic media table + expected-feature ground truth.

    Returns ``{"media_rows": [...], "expected": [...]}`` where media_rows
    match schema.MEDIA and expected rows carry
    (media_id, kind, ok, width, height, n_frames, sample_rate, duration_ms,
    f0..f5) with f_i the exact float64 value of the float32 feature — the
    DuckDB oracle applies the same decimal-round the Spark query does.
    """
    rng = np.random.default_rng(seed)
    media_rows, expected = [], []
    mid = 0

    def _expect(kind, ok, w=None, h=None, nf=None, sr=None, dur=None, feats=None):
        fs = [None] * 6
        if feats is not None:
            fs = [float(np.float32(feats[i])) for i in range(6)]
        expected.append(
            {
                "media_id": mid, "kind": kind, "ok": ok, "width": w,
                "height": h, "n_frames": nf, "sample_rate": sr,
                "duration_ms": dur,
                **{f"f{i}": fs[i] for i in range(6)},
            }
        )

    # --- images: varied sizes, one with a header comment, gradients + noise
    image_shapes = [(1, 1), (7, 3), (16, 16), (9, 40), (33, 5), (64, 48)]
    for i, (h, w) in enumerate(image_shapes):
        if i % 2 == 0:
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        else:  # smooth gradient — exercises histogram bin edges
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((yy * 255) // max(h - 1, 1) + (xx * 97) // max(w - 1, 1)) % 256
            pixels = np.stack([base, 255 - base, (base * 2) % 256], axis=-1).astype(np.uint8)
        payload = encode_ppm(pixels, comment="fixture" if i == 2 else None)
        media_rows.append((mid, "image", payload, "image/x-portable-pixmap", w, h, None))
        _expect("image", True, w=w, h=h, nf=1, feats=image_feature_truth(pixels))
        mid += 1

    # --- audio: mono/stereo sine + noise at two rates
    wav_specs = [
        (8000, 1, 440.0, 0.25), (16000, 1, 220.0, 0.5),
        (8000, 2, 880.0, 0.125), (16000, 2, 55.0, 1.0),
    ]
    for rate, ch, freq, secs in wav_specs:
        n = int(rate * secs)
        t = np.arange(n) / rate
        base = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s16 = np.clip(base * 32767, -32768, 32767).astype(np.int16)
        if ch == 2:
            samples = np.stack([s16, (s16 // 2).astype(np.int16)], axis=1)
        else:
            samples = s16
        payload = encode_wav(samples, rate, ch)
        dur = n * 1000 // rate
        media_rows.append((mid, "audio", payload, "audio/wav", None, None, dur))
        _expect("audio", True, nf=n, sr=rate, dur=dur,
                feats=audio_feature_truth(samples))
        mid += 1

    # --- PGM P5 grayscale: decodes via the same netpbm parser, R=G=B expand
    gray = rng.integers(0, 256, size=(12, 20), dtype=np.uint8)
    payload = encode_pgm(gray, comment="gray fixture")
    media_rows.append((mid, "image", payload, "image/x-portable-graymap", 20, 12, None))
    _expect("image", True, w=20, h=12, nf=1,
            feats=image_feature_truth(np.repeat(gray[..., None], 3, axis=2)))
    mid += 1

    # --- unsigned PCM8 WAV: maps to the int16 scale ((x-128)*256)
    n8 = 2000
    u8 = np.clip(
        128 + 100 * np.sin(2 * np.pi * 330.0 * np.arange(n8) / 8000)
        + 8 * rng.standard_normal(n8), 0, 255,
    ).astype(np.uint8)
    payload = encode_wav8(u8, 8000)
    dur8 = n8 * 1000 // 8000
    media_rows.append((mid, "audio", payload, "audio/wav", None, None, dur8))
    _expect("audio", True, nf=n8, sr=8000, dur=dur8,
            feats=audio_feature_truth(
                ((u8.astype(np.int32) - 128) * 256).astype(np.int16)
            ))
    mid += 1

    # --- video: deterministic-fake contract (no stdlib container codec)
    for i in range(3):
        payload = bytes(rng.integers(0, 256, size=1500 + 700 * i, dtype=np.uint8))
        media_rows.append((mid, "video", payload, "video/x-fake", None, None, None))
        _expect("video", True, nf=len(payload) // 1024 + 1,
                feats=fake_feature_truth(payload))
        mid += 1

    # --- corrupt payloads: recognized magic, malformed body → ok=False
    good_ppm = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    media_rows.append((mid, "image", good_ppm[: len(good_ppm) - 10],
                       "image/x-portable-pixmap", None, None, None))
    _expect("image", False)
    mid += 1
    good_wav = encode_wav(np.zeros(100, dtype=np.int16), 8000, 1)
    media_rows.append((mid, "audio", good_wav[:20], "audio/wav", None, None, None))
    _expect("audio", False)
    mid += 1

    # --- unknown kind → ok=False
    media_rows.append((mid, "text", b"not media", "text/plain", None, None, None))
    _expect("text", False)
    mid += 1

    return {"media_rows": media_rows, "expected": expected}
