"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  Two decode backends:

- ``decode_backend='fake'``: a clearly-marked deterministic stand-in
  (seeded from the payload digest, reproducible in ANSI SQL) so the
  whole pipeline is hash-verifiable end-to-end without codecs;
- ``decode_backend='real'``: genuine pure-stdlib decoders — PNG images
  (``zlib`` inflate + per-filter unfiltering, 8-bit gray/RGB/RGBA/
  palette, non-interlaced) and WAV audio (``wave`` module, 8/16-bit
  PCM) — golden-tested bit-exactly in ``tests/test_multimodal.py``.
  Video frame decode still raises ``NotImplementedError`` (a real
  container/codec needs ffmpeg, absent here); images/audio no longer
  wait on any external library.  Exotic image formats (JPEG etc.)
  would slot in behind the same seam via Pillow when provisioned.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory.  Feature outputs are fixed-width arrays, so the
downstream similarity operators apply unchanged.  The pure-Python PNG
unfilter loops are per-scanline (fine for thumbnail-scale corpora and
the correctness gate; swap in Pillow-SIMD for pixel-heavy production).
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
    "decode_png",
    "decode_wav",
    "image_dhash",
    "image_near_dup_pairs",
    "image_phash",
    "image_phash_near_dup_pairs",
    "decode_audio_features",
    "audio_dhash",
    "audio_near_dup_pairs",
    "image_stats",
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


def _fake_h_col(payload_col):
    """JVM twin of :func:`_digest_mod_p`: md5(payload) → bigint mod P —
    the same ``conv(substr(md5(x), 1, 15), 16, 10) % P`` construction
    the SQL oracles and :func:`attach_fake_media` use."""
    return (
        F.conv(F.substring(F.md5(payload_col), 1, 15), 16, 10).cast("long")
        % F.lit(_P)
    )


def _fake_features_col(hs_col, out_dim: int):
    """JVM twin of :func:`_fake_decode`'s feature ramp over a STAGED
    salted seed column ``hs = (h + salt·2654435761) % P``: feature d =
    ``(hs · (2d+3)) % P`` as double — exact int64 math (hs < 2³¹,
    2d+3 ≤ 129), identical bit-for-bit to the numpy path.

    ``hs_col`` must be a staged column reference (not an inline md5
    expression): a higher-order ``transform`` lambda re-evaluates its
    body per element, which would md5 the payload ``out_dim`` times per
    row (the Generate-inlining pathology measured elsewhere in this
    repo).  The always-true ``hs >= 0`` guard (hs is a modulus of
    non-negative ints) references the staged column a SECOND time so
    CollapseProject keeps the md5 projection staged instead of inlining
    a non-cheap single-reference alias into the lambda — the same
    double-reference shape that keeps ``normalize_embeddings`` O(dim)."""
    ramp = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda d: ((hs_col * (d * 2 + 3)) % F.lit(_P)).cast("double"),
    )
    return F.when(hs_col >= 0, ramp)


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder: ``(height, width, channels)`` uint8.

    Supports 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes ``zlib`` +
    ``struct`` can handle without a codec library.  All five scanline
    filters (None/Sub/Up/Average/Paeth) are implemented per the PNG
    spec and golden-tested against a forward-filtering reference.
    """
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = channels = ctype = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or inter != 0:
                raise NotImplementedError(
                    "only 8-bit non-interlaced PNG is supported"
                )
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride, bpp = w * channels, channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8
        ).astype(np.uint16)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line
        prev = line
    px = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return px


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib WAV decoder: ``(mono float64 samples in [-1, 1],
    sample_rate)``.  8-bit unsigned and 16-bit signed PCM; multi-channel
    input is averaged to mono (the standard feature-front-end prep)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wv:
        sr = wv.getframerate()
        ch = wv.getnchannels()
        sw = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    if sw == 2:
        a = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        a = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError("only 8/16-bit PCM WAV is supported")
    if ch > 1:
        a = a.reshape(-1, ch).mean(axis=1)
    return a, sr


def _pool_segments(values: np.ndarray, out_dim: int) -> np.ndarray:
    """Mean-pool a 1-D array into ``out_dim`` near-equal segments —
    the deterministic fixed-width featurization both real backends
    share (zero-padded when shorter than ``out_dim``)."""
    v = np.asarray(values, dtype=np.float64).ravel()
    if v.shape[0] < out_dim:
        v = np.concatenate([v, np.zeros(out_dim - v.shape[0])])
    bounds = np.linspace(0, v.shape[0], out_dim + 1).astype(np.int64)
    return np.array(
        [v[bounds[i] : bounds[i + 1]].mean() for i in range(out_dim)]
    )


def _real_image_features(payload: bytes, out_dim: int) -> np.ndarray:
    """PNG → grayscale (channel mean) → out_dim mean-pooled values."""
    px = decode_png(bytes(payload))
    gray = px.astype(np.float64).mean(axis=2)
    return _pool_segments(gray.ravel(), out_dim)


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

    ``decode_backend='real'`` (pure-stdlib PNG decode, Arrow-batched)
    is the integration point for an actual image library; the fake
    backend's md5-seeded integer ramp is pure JVM expressions — the
    payload never crosses the Python boundary and its md5 is computed
    once per row (guide §4.1: built-ins over any UDF form).
    """
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")

    if decode_backend == "fake":
        staged = media.select(
            "media_id", _fake_h_col(F.col("payload")).alias("__hs")
        )
        return staged.select(
            "media_id", _fake_features_col(F.col("__hs"), out_dim).alias("features")
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Pure-stdlib PNG decode + grayscale mean-pool (golden
            # tested); JPEG/WebP would slot in here via Pillow.
            feats = [
                _real_image_features(bytes(p), out_dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(fn, schema="media_id long, features array<double>")


def sample_video_frames(
    media: DataFrame, every_n: int = 30, decode_backend: str = "fake"
) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index.

    Frame *indices* are exact JVM-side math (``sequence`` + explode);
    frame *pixels* come from the decode backend (fake here).  The fake
    backend is entirely JVM expressions: the payload's md5 seed is
    staged ONCE per video before the frame explode — the payload used
    to ride every exploded frame row through the Arrow boundary with
    its md5 recomputed per frame (up to ⌈300/every_n⌉ times per clip).
    """
    vids = media.where(F.col("media_type") == "video")
    idx_gen = F.explode(
        F.sequence(
            F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
        )
    ).alias("frame_idx")

    if decode_backend == "fake":
        base = vids.select(
            "media_id", _fake_h_col(F.col("payload")).alias("__h"), "n_frames"
        )
        rows = base.select("media_id", "__h", idx_gen)
        staged = rows.select(
            "media_id",
            "frame_idx",
            (
                (F.col("__h") + F.col("frame_idx").cast("long") * F.lit(2654435761))
                % F.lit(_P)
            ).alias("__hs"),
        )
        return staged.select(
            "media_id",
            "frame_idx",
            _fake_features_col(F.col("__hs"), 16).alias("frame_features"),
        )

    frames = vids.select("media_id", "payload", idx_gen)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # The one modality still codec-gated: container demux +
            # frame decode genuinely needs ffmpeg (no stdlib path —
            # PNG/WAV decode for real via pure stdlib above, video
            # cannot).  Probed at RUNTIME on the executor so the
            # error states the actual environment, not a guess;
            # wire a subprocess demuxer here once a build ships
            # with ffmpeg (probe verified round 5: absent in this
            # container).
            import shutil as _sh

            found = _sh.which("ffmpeg")
            raise NotImplementedError(
                "real frame decode requires the ffmpeg binary on every "
                f"executor (PATH probe on this executor: "
                f"{found or 'NOT FOUND'}) — no stdlib demux path exists; "
                "use decode_backend='fake' (deterministic, oracle-"
                "verified plumbing) until the image/video toolchain is "
                "installed"
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_features": [],
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
    auds = (
        media.where(F.col("media_type") == "audio")
        .withColumn("__nw", n_win)
        .where(F.col("__nw") > 0)
    )
    if decode_backend == "fake":
        # Pure JVM: the md5 seed is staged once per clip BEFORE the
        # window explode (a clip fans out to ~n_frames·160/hop window
        # rows — the payload used to ride every one of them through the
        # Arrow boundary with its md5 recomputed per window).
        base = auds.select(
            "media_id", _fake_h_col(F.col("payload")).alias("__h"), "__nw"
        )
        rows = base.select(
            "media_id",
            "__h",
            F.explode(F.sequence(F.lit(0), F.col("__nw") - 1)).alias("window_idx"),
        )
        staged = rows.select(
            "media_id",
            "window_idx",
            (
                (F.col("__h") + F.col("window_idx").cast("long") * F.lit(2654435761))
                % F.lit(_P)
            ).alias("__hs"),
        )
        return staged.select(
            "media_id",
            "window_idx",
            _fake_features_col(F.col("__hs"), out_dim).alias("window_features"),
        )

    wins = (
        auds
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
            # Pure-stdlib WAV decode; window i covers samples
            # [i·hop, i·hop+win).  The JVM-side window plan came
            # from the metadata duration — windows past the TRUE
            # decoded length are dropped here, so inaccurate
            # metadata can't fabricate feature rows.
            ids, idxs, feats = [], [], []
            cache: dict[int, np.ndarray] = {}
            for mid, p, i in zip(
                pdf["media_id"], pdf["payload"], pdf["window_idx"]
            ):
                key = int(mid)
                if key not in cache:
                    cache[key], _sr = decode_wav(bytes(p))
                samples = cache[key]
                s = int(i) * hop
                if s + win > samples.shape[0]:
                    continue
                ids.append(mid)
                idxs.append(i)
                feats.append(
                    _pool_segments(np.abs(samples[s : s + win]), out_dim)
                )
            yield pd.DataFrame(
                {"media_id": ids, "window_idx": idxs, "window_features": feats}
            )

    return wins.mapInPandas(
        fn, schema="media_id long, window_idx int, window_features array<double>"
    )


def image_dhash(
    media: DataFrame, decode_backend: str = "fake", dim: int = 64
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode to a
    ``dim``-value grayscale feature row, then bit d = 1 iff
    ``f[d+1] > f[d]`` — the gradient-direction signature used for
    image near-dup detection (robust to re-encoding/resizing because
    it compares ADJACENT intensities, not absolute values).

    The ``dim - 1`` comparison bits are packed MSB-first into one
    bigint with an exact JVM integer fold (``acc·2 + bit`` — never a
    float pow, which loses exactness past 2⁵³).  Whole pipeline is one
    Arrow decode pass + pure JVM array expressions; with the fake
    backend every bit is reproducible in ANSI SQL from the payload's
    md5, so the DuckDB oracle checks signature VALUES, not just shape.

    Returns ``(media_id, dhash)``; ``dim`` ≤ 64 keeps the packed hash
    (``dim - 1`` ≤ 63 bits) inside a non-negative int64.
    """
    if not 2 <= dim <= 64:
        raise ValueError("dim must be in [2, 64] (bits must fit an int64)")
    feats = decode_image_features(media, out_dim=dim, decode_backend=decode_backend)
    return _pack_dhash(feats, dim)


def _pack_dhash(feats: DataFrame, dim: int) -> DataFrame:
    """``(media_id, features)`` → ``(media_id, dhash)``: gradient bits
    (f[d+1] > f[d]) packed MSB-first by an exact JVM integer fold —
    shared by the image and audio perceptual hashes."""
    f = F.col("features")
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(dim - 1)),
        lambda d: F.when(F.element_at(f, d + 1) > F.element_at(f, d), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    packed = F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * F.lit(2).cast("long") + b
    )
    return feats.select("media_id", packed.alias("dhash"))


def _near_dup_from_sig(sig, dim: int, max_hamming: int) -> DataFrame:
    """Shared tail of the image/audio near-dup operators: checkpoint
    the (media_id, dhash) rows (16 B each, payload-free) so the band
    self-join never runs the Arrow decode twice, then the lossless
    pigeonhole hamming search."""
    from .dedup import hamming_band_pairs

    sig = sig.localCheckpoint(eager=False)
    return hamming_band_pairs(
        sig, bits=dim - 1, max_hamming=max_hamming,
        id_col="media_id", sig_col="dhash",
    ).select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    decode_backend: str = "fake",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate image pairs: dHash signatures + the band-pigeonhole
    hamming search shared with SimHash text dedup
    (``dedup.hamming_band_pairs`` — ``max_hamming + 1`` bit bands, any
    qualifying pair matches some band exactly, equi-join + popcount
    verify).  Exact within the dHash metric: no recall loss versus a
    brute-force O(n²) scan, at Σ|bucket|² candidate cost.

    Returns ``(media_a, media_b, hamming)`` with ``media_a < media_b``.
    """
    sig = image_dhash(media, decode_backend=decode_backend, dim=dim)
    return _near_dup_from_sig(sig, dim, max_hamming)


# Salt separating the fake AUDIO feature stream from the image one, so
# the two modalities' signatures are distinct surfaces even over the
# same payload (SQL twin: (h + 7*2654435761) % P seeding).
_AUDIO_SALT = 7


def decode_audio_features(
    media: DataFrame, out_dim: int = 64, decode_backend: str = "fake"
) -> DataFrame:
    """``(media_id, payload, …)`` → ``(media_id, features array<double>)``:
    a fixed-width ENERGY PROFILE per audio file — |samples| mean-pooled
    into ``out_dim`` segments (real backend) — the whole-file twin of
    :func:`extract_audio_windows` for fingerprint-style uses.  Fake
    backend is the md5-seeded integer stream (salt ``_AUDIO_SALT``),
    SQL-reproducible end to end."""
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")

    if decode_backend == "fake":
        staged = media.select(
            "media_id",
            (
                (_fake_h_col(F.col("payload")) + F.lit(_AUDIO_SALT * 2654435761))
                % F.lit(_P)
            ).alias("__hs"),
        )
        return staged.select(
            "media_id", _fake_features_col(F.col("__hs"), out_dim).alias("features")
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                samples, _sr = decode_wav(bytes(p))
                feats.append(_pool_segments(np.abs(samples), out_dim))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(fn, schema="media_id long, features array<double>")


def audio_dhash(
    media: DataFrame, decode_backend: str = "fake", dim: int = 64
) -> DataFrame:
    """Perceptual hash for AUDIO: gradient bits over the energy profile
    (does segment d+1 carry more energy than segment d) — robust to
    gain changes the way image dHash is robust to brightness, because
    it compares ADJACENT segments, not absolute levels.  Same exact
    int64 packing as :func:`image_dhash`."""
    if not 2 <= dim <= 64:
        raise ValueError("dim must be in [2, 64] (bits must fit an int64)")
    feats = decode_audio_features(media, out_dim=dim, decode_backend=decode_backend)
    return _pack_dhash(feats, dim)


def audio_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    decode_backend: str = "fake",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate audio pairs: energy-profile dHash + the shared
    band-pigeonhole hamming search (lossless candidate generation, see
    :func:`image_near_dup_pairs`).  Returns ``(media_a, media_b,
    hamming)`` with ``media_a < media_b``."""
    sig = audio_dhash(media, decode_backend=decode_backend, dim=dim)
    return _near_dup_from_sig(sig, dim, max_hamming)


def _dct2_lowfreq(gray32: np.ndarray, block: int = 8) -> np.ndarray:
    """Top-left ``block x block`` of the 2-D DCT-II of a 32x32 image,
    via explicit basis matrix multiplies (numpy cos, float64,
    deterministic — no scipy): ``D @ img @ D.T`` with
    ``D[k, n] = cos(pi (2n+1) k / 2N)``, ORTHONORMALLY scaled — the
    median comparison downstream mixes coefficients across rows and
    columns, so the relative DCT scaling must match the standard
    pHash definition exactly."""
    n = gray32.shape[0]
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    basis = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    basis[0, :] *= 1.0 / np.sqrt(2.0)
    basis *= np.sqrt(2.0 / n)
    return (basis @ gray32 @ basis.T)[:block, :block]


def _phash_bits(gray32: np.ndarray) -> int:
    """Classic pHash: 8x8 low-frequency DCT block, drop the DC term,
    bit_i = coefficient_i > median of the 63 AC coefficients, packed
    MSB-first into a non-negative 63-bit int."""
    ac = _dct2_lowfreq(gray32).ravel()[1:]
    med = float(np.median(ac))
    acc = 0
    for c in ac:
        acc = (acc << 1) | int(c > med)
    return acc


def image_phash(
    media: DataFrame, decode_backend: str = "fake"
) -> DataFrame:
    """Perceptual DCT hash (pHash) per image — the low-frequency
    SPECTRAL signature that complements :func:`image_dhash`'s gradient
    bits: resize to 32x32 grayscale (block-mean), 2-D DCT-II, keep the
    8x8 low-frequency block, bit = AC coefficient > median.  Robust to
    global brightness/contrast shifts and mild blur (those perturb high
    frequencies and the DC term, which pHash discards), where dHash is
    the cheaper choice for crop/re-encode near-dups.

    Returns ``(media_id, phash)`` — 63 bits in a non-negative int64,
    compatible with ``dedup.hamming_band_pairs``.

    The DCT is genuinely non-SQL-expressible, so unlike the dHash
    family this operator is pytest-gated (golden real-PNG test +
    deterministic fake backend), not DuckDB-oracled.  One Arrow pass;
    signatures are 16 B rows, everything downstream JVM.
    """
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if decode_backend == "real":
                    px = decode_png(bytes(p))
                    gray = px.astype(np.float64).mean(axis=2)
                    g32 = _block_mean_32(gray)
                else:
                    g32 = _fake_decode(bytes(p), 1024).reshape(32, 32)
                out.append(_phash_bits(g32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "phash": pd.array(out, dtype="int64")}
            )

    return media.mapInPandas(fn, schema="media_id long, phash long")


def _block_mean_32(gray: np.ndarray) -> np.ndarray:
    """Deterministic 32x32 block-mean resize (the pHash downsample):
    rows and columns are split into 32 near-equal spans and averaged —
    no interpolation kernel, no library dependency."""
    h, w = gray.shape
    if h < 32 or w < 32:  # pad tiny images instead of upsampling
        gray = np.pad(gray, ((0, max(0, 32 - h)), (0, max(0, 32 - w))))
        h, w = gray.shape
    rb = np.linspace(0, h, 33).astype(np.int64)
    cb = np.linspace(0, w, 33).astype(np.int64)
    out = np.empty((32, 32))
    for i in range(32):
        for j in range(32):
            out[i, j] = gray[rb[i]:rb[i + 1], cb[j]:cb[j + 1]].mean()
    return out


def image_phash_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    decode_backend: str = "fake",
) -> DataFrame:
    """Near-duplicate image pairs under the pHash metric — the same
    lossless band-pigeonhole hamming search as
    :func:`image_near_dup_pairs`, over the 63-bit spectral signature.
    Returns ``(media_a, media_b, hamming)`` with ``media_a < media_b``."""
    from .dedup import hamming_band_pairs

    sig = image_phash(media, decode_backend=decode_backend)
    sig = sig.localCheckpoint(eager=False)
    return hamming_band_pairs(
        sig, bits=63, max_hamming=max_hamming,
        id_col="media_id", sig_col="phash",
    ).select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )


def image_stats(
    media: DataFrame,
    out_dim: int = 64,
    decode_backend: str = "fake",
    domain_max: float | None = None,
    low_contrast_frac: float = 0.05,
) -> DataFrame:
    """Per-image luminance statistics + quality flags over the decoded
    grayscale features — the multimodal twin of the text quality
    signals (filter decode failures, black frames, flat synthetic
    images before they reach training):

    ``(media_id, n_features, lum_mean, lum_std, lum_min, lum_max,
    dyn_range, low_contrast, flat)`` where ``low_contrast`` flags
    ``lum_std < low_contrast_frac · domain_max`` and ``flat`` flags a
    constant image.  ``domain_max`` defaults to 255 for the real
    backend (8-bit luminance) and the fake backend's modulus P
    otherwise.

    All statistics are EXACT left-fold JVM array expressions over the
    decoded feature row (sum and sum-of-squares in index order), so
    with the fake backend the oracle reproduces every value bit-for-
    bit from the payload's md5; the real-PNG backend rides the same
    folds and is golden-tested.  One Arrow decode pass; stats add no
    shuffle — the per-image reduction happens inside the row."""
    if low_contrast_frac <= 0:
        raise ValueError("low_contrast_frac must be positive")
    if domain_max is None:
        domain_max = 255.0 if decode_backend == "real" else float(_P)
    imgs = media.where(F.col("media_type") == "image")
    feats = decode_image_features(
        imgs, out_dim=out_dim, decode_backend=decode_backend
    )
    f = F.col("features")
    n = F.size(f)
    s = F.aggregate(f, F.lit(0.0), lambda acc, x: acc + x)
    s2 = F.aggregate(f, F.lit(0.0), lambda acc, x: acc + x * x)
    mean = s / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    mx, mn = F.array_max(f), F.array_min(f)
    return feats.select(
        "media_id",
        n.alias("n_features"),
        F.round(mean, 4).alias("lum_mean"),
        F.round(std, 4).alias("lum_std"),
        mn.alias("lum_min"),
        mx.alias("lum_max"),
        (mx - mn).alias("dyn_range"),
        (std < F.lit(low_contrast_frac * domain_max)).alias("low_contrast"),
        (mx == mn).alias("flat"),
    )
