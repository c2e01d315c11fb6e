"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The actual codecs are NOT available in this
environment, so the decode step is a clearly-marked deterministic fake
(seeded from the payload digest) behind ``decode_backend='fake'``;
``decode_backend='real'`` raises ``NotImplementedError`` until a codec
library (Pillow/torchaudio/ffmpeg) is provisioned.  Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory.  Feature outputs are fixed-width arrays, so the
downstream similarity operators apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_image_features",
    "sample_video_frames",
    "extract_audio_windows",
]

# Canonical multimodal schema: payload + typed metadata.
MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "width int, height int, n_frames int, sample_rate int"
)


# Mersenne prime 2^31-1: every fake-decode value is integer arithmetic
# mod P on the payload's md5 digest, so the SAME values are computable
# in ANSI SQL — the DuckDB oracle can verify the whole multimodal
# pipeline end-to-end, feature values included, not just row shape.
_P = 2_147_483_647


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake media table from a documents table —
    payload = utf-8 text bytes, metadata from the md5 digest (the same
    md5-bigint construction the SQL oracles use) — to exercise the
    plumbing without codec libraries."""
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int")
        ).alias("media_type"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 300 + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )


def _digest_mod_p(payload: bytes) -> int:
    """md5(payload) → bigint mod P, matching the SQL-side construction
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % P``."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16) % _P


def _fake_decode(payload: bytes, out_dim: int, salt: int = 0) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature d is
    ``((h + salt·2654435761) % P) · (2d+3) % P`` — every intermediate
    < 2⁴⁰, exact in int64 AND float64, reproducible in SQL.  A real
    codec backend replaces this wholesale (and would emit float32)."""
    h = (_digest_mod_p(payload) + salt * 2654435761) % _P
    d = np.arange(out_dim, dtype=np.int64)
    return ((h * (2 * d + 3)) % _P).astype(np.float64)


def decode_image_features(
    media: DataFrame, out_dim: int = 64, decode_backend: str = "fake"
) -> DataFrame:
    """``(media_id, payload, …)`` → ``(media_id, features: array<float>)``.

    Arrow-batched; one numpy pass per batch.  ``decode_backend='real'``
    is the integration point for an actual image library.
    """
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                raise NotImplementedError(
                    "real image decode requires a codec library (e.g. Pillow); "
                    "not available in this environment — use decode_backend='fake'"
                )
            feats = [_fake_decode(bytes(p), out_dim) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(fn, schema="media_id long, features array<double>")


def sample_video_frames(
    media: DataFrame, every_n: int = 30, decode_backend: str = "fake"
) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index.

    Frame *indices* are exact JVM-side math (``sequence`` + explode);
    frame *pixels* come from the decode backend (fake here).
    """
    frames = media.where(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                raise NotImplementedError(
                    "real frame decode requires ffmpeg bindings — use decode_backend='fake'"
                )
            feats = [
                _fake_decode(bytes(p), 16, salt=int(i))
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_features": feats,
                }
            )

    return frames.mapInPandas(
        fn, schema="media_id long, frame_idx int, frame_features array<double>"
    )


def extract_audio_windows(
    media: DataFrame,
    win: int = 400,
    hop: int = 160,
    out_dim: int = 16,
    decode_backend: str = "fake",
) -> DataFrame:
    """Speech-pipeline windowing: one output row per analysis window
    (25 ms window / 10 ms hop at 16 kHz with the defaults) over each
    audio payload — the framing stage every MFCC/fbank front-end runs.

    The fake duration is ``n_frames · 160`` samples (SQL-reproducible
    from the metadata the fake media table carries); window *indices*
    are exact JVM-side math (``sequence`` + explode, n_win =
    ⌊(total − win)/hop⌋ + 1, zero when the clip is shorter than one
    window), window *features* come from the decode backend.
    """
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")
    total = F.col("n_frames").cast("long") * 160
    n_win = (
        F.when(total >= win, F.floor((total - win) / hop) + 1)
        .otherwise(F.lit(0))
        .cast("int")
    )
    wins = (
        media.where(F.col("media_type") == "audio")
        .withColumn("__nw", n_win)
        .where(F.col("__nw") > 0)
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), F.col("__nw") - 1)
            ).alias("window_idx"),
        )
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_backend == "real":
                raise NotImplementedError(
                    "real audio decode requires an audio library (e.g. "
                    "torchaudio/soundfile) — use decode_backend='fake'"
                )
            feats = [
                _fake_decode(bytes(p), out_dim, salt=int(i))
                for p, i in zip(pdf["payload"], pdf["window_idx"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "window_idx": pdf["window_idx"],
                    "window_features": feats,
                }
            )

    return wins.mapInPandas(
        fn, schema="media_id long, window_idx int, window_features array<double>"
    )
