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


# ---------------------------------------------------------------- probing
# Container-format header introspection is pure byte parsing — no codec
# needed — and is the real first stage of any multimodal ingest pipeline
# (validate declared metadata, drop corrupt payloads, route by format
# *before* paying for decode).


def probe_media(payload: bytes) -> tuple[str | None, int | None, int | None, int | None]:
    """Sniff ``(format, width, height, duration_ms)`` from the header.

    Supports PNG (IHDR), JPEG (SOF0/1/2 frame header), GIF (logical
    screen descriptor), BMP (BITMAPINFOHEADER) and WAV (RIFF fmt/data
    chunks → duration). Unknown/corrupt payloads yield ``(None, …)``.
    """
    p = payload
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"),
                None,
            )
        if p[:3] == b"GIF" and p[3:6] in (b"87a", b"89a"):
            return (
                "gif",
                int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"),
                None,
            )
        if p[:2] == b"BM" and len(p) >= 26:
            return (
                "bmp",
                int.from_bytes(p[18:22], "little", signed=True),
                abs(int.from_bytes(p[22:26], "little", signed=True)),
                None,
            )
        if p[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to a SOF marker
            i = 2
            while i + 9 < len(p) and p[i] == 0xFF:
                marker, seg_len = p[i + 1], int.from_bytes(p[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: baseline/ext/progressive
                    return (
                        "jpeg",
                        int.from_bytes(p[i + 7 : i + 9], "big"),
                        int.from_bytes(p[i + 5 : i + 7], "big"),
                        None,
                    )
                if marker == 0xD9 or seg_len < 2:
                    break
                i += 2 + seg_len
            return ("jpeg", None, None, None)
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(p):
                cid = p[i : i + 4]
                clen = int.from_bytes(p[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 + 8 <= len(p):
                    byte_rate = int.from_bytes(p[i + 16 : i + 20], "little")
                elif cid == b"data":
                    data_size = clen
                i += 8 + clen + (clen & 1)
            dur = (
                int(data_size * 1000 / byte_rate)
                if byte_rate and data_size is not None
                else None
            )
            return ("wav", None, None, dur)
    except (IndexError, ValueError):
        pass
    return (None, None, None, None)


PROBE_SCHEMA = (
    "media_id bigint, kind string, detected_format string, width int, "
    "height int, duration_ms int, metadata_consistent boolean"
)


def probe_gated_features(
    media: DataFrame,
    feat_dim: int = 16,
    decode: Callable[[bytes, str, int], tuple[np.ndarray, int]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The production ingest route: header-probe every asset first, pay
    the (expensive) decode only for assets whose container header parses
    AND agrees with the declared metadata; everything else lands in a
    quarantine frame with the probe evidence attached.

    Returns ``(features, quarantine)``. The decode stage never sees a
    corrupt or mislabeled payload, so a real decoder plugged into
    ``decode=`` cannot be crashed by them — the routing is the part this
    repo ships as real, tested Spark plumbing (the decode kernel itself
    stays a documented stub until codecs exist in the image;
    ``_fake_decode``/``resize_stub`` mark that boundary).
    """
    from pyspark.sql import functions as F

    meta = media_metadata(media)
    ok_ids = meta.filter("metadata_consistent").select("media_id")
    features = extract_media_features(
        media.join(ok_ids, "media_id", "left_semi"), feat_dim, decode
    )
    quarantine = meta.filter(~F.col("metadata_consistent"))
    return features, quarantine


def media_metadata(media: DataFrame) -> DataFrame:
    """Probe every payload's container header and cross-check it against
    the declared metadata columns: ``metadata_consistent`` is false when
    a probed dimension/duration contradicts the declared one (corrupt or
    mislabeled asset — filter these *before* the expensive decode).
    Arrow-batched ``mapInPandas``; payloads never leave the executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmt, ww, hh, dd, ok = [], [], [], [], []
            for payload, dw, dh, dms in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                f, w, h, d = probe_media(bytes(payload))
                fmt.append(f)
                ww.append(w)
                hh.append(h)
                dd.append(d)
                consistent = f is not None
                for probed, declared in ((w, dw), (h, dh), (d, dms)):
                    if probed is not None and not pd.isna(declared):
                        consistent = consistent and int(declared) == probed
                ok.append(consistent)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "detected_format": fmt,
                    "width": pd.array(ww, dtype="Int32"),
                    "height": pd.array(hh, dtype="Int32"),
                    "duration_ms": pd.array(dd, dtype="Int32"),
                    "metadata_consistent": ok,
                }
            )

    return media.mapInPandas(run, schema=PROBE_SCHEMA)
