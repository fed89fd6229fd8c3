"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode=None`` uses a deterministic fake that derives features from the
bytes themselves, so the Spark-side contract — schema, batch shape,
partitioning, UDF signature — is real and tested. Swapping in Pillow /
torchaudio is a one-function change on the executor side.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = "media_id bigint, kind string, payload binary, width int, height int, duration_ms int"

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, feature array<float>, frames_sampled int"


def _fake_decode(payload: bytes, kind: str, feat_dim: int) -> tuple[np.ndarray, int]:
    """Deterministic stand-in for decode+feature-extract: features are a
    seeded hash-expansion of the payload; 'frame sampling' takes one
    frame per 1 KiB. Raises like a real decoder would on empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    frames = max(1, len(payload) // 1024)
    return rng.standard_normal(feat_dim).astype(np.float32), frames


def extract_media_features(
    media: DataFrame,
    feat_dim: int = 16,
    decode: Callable[[bytes, str, int], tuple[np.ndarray, int]] | None = None,
) -> DataFrame:
    """``(media_id, kind, payload, …)`` → per-item feature vectors via
    ``mapInPandas`` (one Arrow batch at a time; payload bytes never land
    on the driver). Real deployments pass their decoder as ``decode``.
    """
    decode = decode or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, frames, nbytes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                f, fr = decode(bytes(payload), kind, feat_dim)
                feats.append(f.tolist())
                frames.append(fr)
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": feats,
                    "frames_sampled": np.asarray(frames, dtype=np.int32),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Placeholder for the image-resize kernel; container lacks codecs."""
    raise NotImplementedError(
        "image decode/resize requires Pillow/libvips — not available in this "
        "container; plug a real kernel into extract_media_features(decode=...)"
    )
