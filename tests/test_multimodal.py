"""Golden tests for the REAL multimodal decode backend.

The decoders are pure-stdlib (zlib/struct for PNG, wave for WAV), so
the gates here are exact: encoders written inside this test file build
known payloads byte-by-byte per the published specs, and the decoders
must invert them bit-for-bit — including every PNG scanline filter,
which the test applies with an independent forward-filter reference.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from plda_spark.operators import multimodal


# ---------------------------------------------------------------------------
# reference encoders (spec-following, independent of the decoder code)

def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload))
    )


def _forward_filter(img: np.ndarray, f: int) -> bytes:
    """Apply PNG filter ``f`` to every scanline (the encoder side of the
    spec, RFC 2083 §6) — the decoder must invert this exactly."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    out = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = flat[y]
        enc = np.empty(stride, dtype=np.int64)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        out += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line
    return out


def encode_png(img: np.ndarray, f: int = 0, palette: np.ndarray | None = None) -> bytes:
    """Minimal spec-following PNG encoder for the golden tests."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    if palette is not None:
        ctype = 3
        ch = 1
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    arr = img.reshape(h, w, ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    body += _chunk(b"IDAT", zlib.compress(_forward_filter(arr, f)))
    body += _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def encode_wav(samples: np.ndarray, sr: int = 16000, sampwidth: int = 2,
               channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(sampwidth)
        wv.setframerate(sr)
        if sampwidth == 2:
            wv.writeframes(samples.astype("<i2").tobytes())
        else:
            wv.writeframes(samples.astype(np.uint8).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PNG decoder goldens

def test_png_roundtrip_every_filter():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for f in range(5):
        got = multimodal.decode_png(encode_png(img, f=f))
        assert got.shape == (7, 5, 3)
        assert np.array_equal(got, img), f"filter {f} not inverted"


def test_png_color_types():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_png(encode_png(gray, f=2)), gray)
    rgba = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_png(encode_png(rgba, f=4)), rgba)
    ga = rng.integers(0, 256, size=(2, 5, 2), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_png(encode_png(ga, f=1)), ga)


def test_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8).reshape(2, 3, 1)
    got = multimodal.decode_png(encode_png(idx, f=0, palette=palette))
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_png_rejects_garbage_and_16bit():
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"hello world")
    # 16-bit depth header → explicit NotImplementedError, never garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(bad)


# ---------------------------------------------------------------------------
# WAV decoder goldens

def test_wav_roundtrip_16bit():
    s = (np.sin(np.linspace(0, 20, 1000)) * 30000).astype(np.int16)
    got, sr = multimodal.decode_wav(encode_wav(s, sr=8000))
    assert sr == 8000
    assert np.allclose(got, s.astype(np.float64) / 32768.0)


def test_wav_8bit_and_stereo_mono_mix():
    s8 = np.arange(0, 256, dtype=np.uint8)
    got, _ = multimodal.decode_wav(encode_wav(s8, sampwidth=1))
    assert np.allclose(got, (s8.astype(np.float64) - 128.0) / 128.0)
    left = np.full(100, 1000, dtype=np.int16)
    right = np.full(100, 3000, dtype=np.int16)
    inter = np.empty(200, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    got, _ = multimodal.decode_wav(encode_wav(inter, channels=2))
    assert np.allclose(got, np.full(100, 2000.0) / 32768.0)


# ---------------------------------------------------------------------------
# Spark end-to-end through the real backend

def test_real_image_features_end_to_end(spark):
    rng = np.random.default_rng(13)
    imgs = {i: rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
            for i in range(3)}
    rows = [
        (i, bytearray(encode_png(img, f=i % 5)), "image", 4, 6, 1, 16000)
        for i, img in imgs.items()
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: np.array(r["features"])
        for r in multimodal.decode_image_features(
            media, out_dim=8, decode_backend="real"
        ).collect()
    }
    for i, img in imgs.items():
        want = multimodal._pool_segments(
            img.astype(np.float64).mean(axis=2).ravel(), 8
        )
        assert np.allclose(got[i], want), i


def test_real_audio_windows_end_to_end(spark):
    sr = 16000
    n = 1000  # samples; with win=400/hop=160 -> 4 full windows
    s = (np.sin(np.linspace(0, 50, n)) * 20000).astype(np.int16)
    # metadata n_frames chosen so the JVM plan generates MORE window
    # indices than the true decoded length supports -> the real backend
    # must drop the overrun rows, not fabricate features
    rows = [(0, bytearray(encode_wav(s, sr=sr)), "audio", 0, 0, 10, sr)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.extract_audio_windows(
        media, win=400, hop=160, out_dim=4, decode_backend="real"
    ).collect()
    n_true = (n - 400) // 160 + 1  # 4 — vs 8 planned from metadata
    assert len(got) == n_true
    samples = s.astype(np.float64) / 32768.0
    for r in got:
        i = r["window_idx"]
        want = multimodal._pool_segments(
            np.abs(samples[i * 160 : i * 160 + 400]), 4
        )
        assert np.allclose(np.array(r["window_features"]), want), i


# ---------------------------------------------------------------------------
# dHash perceptual signatures + banded near-dup search


def test_image_dhash_real_backend_perturbation(spark):
    """A lightly-perturbed copy of an image must land within a small
    hamming ball of the original; an unrelated image must not.  Runs
    the REAL PNG decode path end-to-end (dHash's whole point is
    robustness to small pixel-level changes)."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (near[0, 0].astype(np.int64) + 3).astype(np.uint8) % 256
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (i, bytearray(encode_png(img)), "image", 16, 16, 1, 16000)
        for i, img in enumerate([base, near, other])
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    sig = {
        r["media_id"]: r["dhash"]
        for r in multimodal.image_dhash(media, decode_backend="real").collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sig[0], sig[1]) <= 4
    assert ham(sig[0], sig[2]) > ham(sig[0], sig[1])
    assert all(0 <= s < 1 << 63 for s in sig.values())


def test_image_near_dup_pairs_banding_lossless(spark):
    """The band-pigeonhole candidate search must find EVERY pair within
    max_hamming — compare against a brute-force scan over the collected
    signatures, at a max_hamming that doesn't divide the bit width
    evenly (uneven band widths are the regression-prone case)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.attach_fake_media(docs)
    r = 10
    sig = {
        row["media_id"]: row["dhash"]
        for row in multimodal.image_dhash(media).collect()
    }
    ids = sorted(sig)
    want = {
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= r
    }
    got = {
        (row["media_a"], row["media_b"], row["hamming"])
        for row in multimodal.image_near_dup_pairs(media, max_hamming=r).collect()
    }
    assert got == want and len(want) > 0


def test_image_dhash_validators(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.attach_fake_media(docs)
    with pytest.raises(ValueError, match="dim"):
        multimodal.image_dhash(media, dim=65)
    with pytest.raises(ValueError, match="dim"):
        multimodal.image_dhash(media, dim=1)
    from plda_spark.operators import dedup

    sig = multimodal.image_dhash(media)
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.hamming_band_pairs(sig, bits=63, max_hamming=0,
                                 id_col="media_id", sig_col="dhash")
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.hamming_band_pairs(sig, bits=63, max_hamming=63,
                                 id_col="media_id", sig_col="dhash")


def test_audio_dhash_gain_invariant_real_backend(spark):
    """Energy-profile dHash compares ADJACENT segments, so a pure gain
    change (same signal at half volume) must produce the IDENTICAL
    hash, while a different signal lands far away in hamming space."""
    rng = np.random.default_rng(11)
    sig = (rng.normal(0, 0.3, 16000).clip(-1, 1) * 20000).astype(np.int16)
    half = (sig * 0.5).astype(np.int16)
    other = (rng.normal(0, 0.3, 16000).clip(-1, 1) * 20000).astype(np.int16)
    rows = [
        (i, bytearray(encode_wav(s)), "audio", 0, 0, 1, 16000)
        for i, s in enumerate([sig, half, other])
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    sig_map = {
        r["media_id"]: r["dhash"]
        for r in multimodal.audio_dhash(media, decode_backend="real").collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert sig_map[0] == sig_map[1]  # gain-invariant
    assert ham(sig_map[0], sig_map[2]) > 10  # unrelated noise differs
    pairs = {
        (r["media_a"], r["media_b"])
        for r in multimodal.audio_near_dup_pairs(
            media, max_hamming=3, decode_backend="real"
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs
    with pytest.raises(ValueError, match="dim"):
        multimodal.audio_dhash(media, dim=100)


def test_image_phash_real_backend_brightness_invariance(spark):
    """pHash's selling point over dHash: a GLOBAL brightness/contrast
    shift perturbs the DC term and overall scale, which pHash discards
    — the brightened copy must land very close; an unrelated image must
    not.  Runs the real PNG decode + 32x32 block-mean + DCT path."""
    rng = np.random.default_rng(11)
    base = rng.integers(30, 180, size=(48, 64, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    rows = [
        (i, bytearray(encode_png(img)), "image", 64, 48, 1, 16000)
        for i, img in enumerate([base, bright, other])
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    sig = {
        r["media_id"]: r["phash"]
        for r in multimodal.image_phash(media, decode_backend="real").collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sig[0], sig[1]) <= 3, "brightness shift must barely move pHash"
    assert ham(sig[0], sig[2]) > 10, "unrelated image must be far"
    assert all(0 <= s < 1 << 63 for s in sig.values())


def test_image_phash_matches_reference_dct(spark):
    """Bit-exact pin of the whole pHash pipeline against an independent
    in-test transcription: block-mean 32x32, orthonormal DCT-II, 8x8
    block, median-of-AC threshold, MSB-first packing."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img)), "image", 56, 40, 1, 16000)],
        multimodal.MEDIA_SCHEMA,
    )
    got = multimodal.image_phash(media, decode_backend="real").first()["phash"]

    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    rb = np.linspace(0, h, 33).astype(int)
    cb = np.linspace(0, w, 33).astype(int)
    g32 = np.array([
        [gray[rb[i]:rb[i+1], cb[j]:cb[j+1]].mean() for j in range(32)]
        for i in range(32)
    ])
    n = 32
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    D = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    D[0, :] /= np.sqrt(2.0)
    ac = (D @ g32 @ D.T)[:8, :8].ravel()[1:]
    med = np.median(ac)
    want = 0
    for c in ac:
        want = (want << 1) | int(c > med)
    assert got == want


def test_image_phash_near_dup_pairs_and_validators(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.attach_fake_media(docs.limit(80))
    sig = {r["media_id"]: r["phash"]
           for r in multimodal.image_phash(media).collect()}
    pairs = multimodal.image_phash_near_dup_pairs(media, max_hamming=8)
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in pairs.collect()}
    # lossless vs brute force over the collected signatures
    ham = lambda a, b: bin(a ^ b).count("1")
    ids = sorted(sig)
    want = {
        (a, b): ham(sig[a], sig[b])
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if ham(sig[a], sig[b]) <= 8
    }
    assert got == want
    with pytest.raises(ValueError, match="decode_backend"):
        multimodal.image_phash(media, decode_backend="gpu")


def test_image_stats_real_backend_flags(spark):
    """Real-PNG luminance stats: a constant image is flat + low
    contrast with zero dynamic range; a black-vs-white checker has
    high contrast; stats ride the decoded 0..255 domain."""
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    checker = np.zeros((32, 32, 3), dtype=np.uint8)
    checker[::2, :, :] = 255
    rows = [
        (0, bytearray(encode_png(flat)), "image", 32, 32, 1, 16000),
        (1, bytearray(encode_png(checker)), "image", 32, 32, 1, 16000),
        (2, b"\x00", "audio", 1, 1, 1, 16000),  # non-image: excluded
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           multimodal.image_stats(media, decode_backend="real").collect()}
    assert set(out) == {0, 1}
    f = out[0]
    assert f["flat"] and f["low_contrast"] and f["dyn_range"] == 0.0
    assert abs(f["lum_mean"] - 128.0) < 1.0
    c = out[1]
    assert not c["flat"] and not c["low_contrast"]
    assert c["lum_std"] > 100 and c["dyn_range"] > 200
    import pytest as _pytest
    with _pytest.raises(ValueError):
        multimodal.image_stats(media, low_contrast_frac=0)
