"""Real media codecs: PNG (zlib+numpy), WAV (RIFF), mp4 box walk, and
the Ray actor-pool stages built on them."""

from __future__ import annotations

import hashlib
import io
import struct
import wave as stdlib_wave
import zlib

import numpy as np
import pyarrow as pa
import pytest

from geografir_ray.functions.png import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    resize_bilinear,
    resize_nearest,
)
from geografir_ray.functions.wav import decode_wav, encode_wav, wav_features


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1), (5, 3), (32, 17), (8, 8, 2), (16, 9, 3), (7, 21, 4)]
)
def test_png_round_trip(shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape
    assert (back == img).all()


def _encode_forced_filter(img: np.ndarray, ftype: int) -> bytes:
    """Reference-style per-pixel PNG encoder forcing one filter type on
    every row — exercises the decoder against all five spec filters."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    rows = []

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

    for y in range(h):
        cur = flat[y]
        out = np.empty(w * ch, dtype=np.uint8)
        for i in range(w * ch):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            pred = [0, left, up, (left + up) // 2, paeth(left, up, ul)][ftype]
            out[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([ftype]) + out.tobytes())
        prev = cur
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 9))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    rng = np.random.default_rng(100 + ftype)
    for shape in [(6, 5), (9, 4, 3), (5, 7, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(_encode_forced_filter(img, ftype)) == img).all()


def test_png_deterministic_golden():
    """Encode is byte-stable across runs/workers (filter heuristic +
    zlib level are fixed) — pin the digest."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert (
        hashlib.sha256(encode_png(img)).hexdigest()[:16] == "8f7efbade6c56f4b"
    )


def test_png_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    bad = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.int32))


def test_resize_kernels():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    up = resize_nearest(img, 6, 8)
    assert up.shape == (6, 8)
    # nearest with exact 2x: each source pixel becomes a 2x2 block
    assert (up[::2, ::2] == img).all() and (up[1::2, 1::2] == img).all()
    flat = np.full((5, 5, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 3, 9) == 77).all()
    # bilinear 1x == identity
    rng = np.random.default_rng(1)
    r = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    assert (resize_bilinear(r, 6, 7) == r).all()


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_round_trip_all_dtypes():
    rng = np.random.default_rng(3)
    cases = [
        ((np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16), 8000),
        (rng.integers(0, 256, 1000, dtype=np.uint8), 11025),
        ((rng.standard_normal(500) * 0.3).astype(np.float32), 44100),
        (rng.integers(-(2**30), 2**30, 300, dtype=np.int32), 48000),
    ]
    for a, r in cases:
        back, rr = decode_wav(encode_wav(a, r))
        assert rr == r and (back[:, 0] == a).all()
    stereo = np.stack([cases[0][0], cases[0][0] // 2], axis=1)
    back, rr = decode_wav(encode_wav(stereo, 16000))
    assert rr == 16000 and (back == stereo).all()


def test_wav_cross_check_stdlib():
    sine = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    # our encoder -> stdlib reader
    data = encode_wav(np.stack([sine, sine // 2], axis=1), 16000)
    w = stdlib_wave.open(io.BytesIO(data))
    assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (2, 16000, 2)
    frames = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16).reshape(-1, 2)
    assert (frames[:, 0] == sine).all()
    # stdlib writer -> our decoder
    buf = io.BytesIO()
    ww = stdlib_wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(sine.tobytes())
    ww.close()
    back, r = decode_wav(buf.getvalue())
    assert r == 8000 and (back[:, 0] == sine).all()


def test_wav_features_normalized_across_depths():
    """Same waveform at int16 and float32 → same normalized stats."""
    x = np.sin(np.linspace(0, 60, 4000))
    f16 = wav_features(encode_wav((x * 32767).astype(np.int16), 8000))
    f32 = wav_features(encode_wav(x.astype(np.float32), 8000))
    assert f16["sample_rate"] == f32["sample_rate"] == 8000
    assert abs(f16["rms_milli"] - f32["rms_milli"]) <= 1
    assert abs(f16["peak_milli"] - f32["peak_milli"]) <= 1
    assert f16["duration_ms"] == 500


# ---------------------------------------------------------------------------
# mp4 box walk
# ---------------------------------------------------------------------------


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _make_mp4(n_samples: int, timescale: int = 30000) -> bytes:
    stts = _box(
        b"stts",
        struct.pack(">II", 0, 2)  # version/flags, 2 entries
        + struct.pack(">II", n_samples - 1, 1001)
        + struct.pack(">II", 1, 2002),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">I", 0)  # version 0
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, n_samples * 1001),
    )
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def test_mp4_sample_info():
    from geografir_ray.stages.multimodal import mp4_sample_info

    info = mp4_sample_info(_make_mp4(240))
    assert info["n_samples"] == 240
    assert info["timescale"] == 30000
    with pytest.raises(ValueError, match="stts"):
        mp4_sample_info(_box(b"ftyp", b"isom"))
    with pytest.raises(ValueError):
        mp4_sample_info(b"\x00\x00\x00\x03bad")


# ---------------------------------------------------------------------------
# Ray stages on real codecs
# ---------------------------------------------------------------------------


def test_media_features_real_png_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import MediaFeatures

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, (16 + i % 5, 12 + i % 7, 3), dtype=np.uint8)
        for i in range(40)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "payload": pa.array([encode_png(im) for im in imgs], type=pa.binary()),
            "format": pa.array(["png"] * 40),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            MediaFeatures,
            fn_constructor_args=("doc_id", "png"),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=16,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["width"].values == [im.shape[1] for im in imgs]).all()
    assert (out["height"].values == [im.shape[0] for im in imgs]).all()
    assert (out["byte_sum"].values == [int(im.sum()) for im in imgs]).all()


def test_image_resize_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import ImageResize

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (64, 48, 3), dtype=np.uint8) for _ in range(10)]
    imgs.append(rng.integers(0, 256, (8, 6), dtype=np.uint8))  # small: untouched
    t = pa.table(
        {
            "doc_id": pa.array(range(len(imgs)), type=pa.int64()),
            "payload": pa.array([encode_png(im) for im in imgs], type=pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            ImageResize,
            fn_constructor_args=(32, "doc_id", "nearest"),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["height"][:10]) == [32] * 10 and list(out["width"][:10]) == [24] * 10
    # payloads are decodable PNGs at the new size; small image untouched
    dec = decode_png(out["payload"][0])
    assert dec.shape == (32, 24, 3)
    assert (decode_png(out["payload"][10]) == imgs[10]).all()


def test_audio_features_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import AudioFeatures

    waves = [
        encode_wav(
            (np.sin(np.linspace(0, 20 * (i + 1), 400 * (i + 1))) * 30000).astype(
                np.int16
            ),
            8000,
        )
        for i in range(12)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(12), type=pa.int64()),
            "payload": pa.array(waves, type=pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            AudioFeatures,
            fn_constructor_args=("doc_id",),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=5,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["n_samples"].values == [400 * (i + 1) for i in range(12)]).all()
    assert (out["sample_rate"].values == 8000).all()
    # full-scale sine RMS ~ 0.707 * 30000/32768
    assert abs(int(out["rms_milli"][5]) - 647) <= 5


def test_video_frame_plan_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import VideoFramePlan

    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "payload": pa.array(
                [_make_mp4(24 * (i + 1)) for i in range(4)], type=pa.binary()
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            VideoFramePlan,
            fn_constructor_args=(10, "doc_id"),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_samples"]) == [24, 48, 72, 96]
    assert list(out["frame_plan"][0]) == [0, 10, 20]
    assert list(out["frame_plan"][3]) == list(range(0, 96, 10))


def test_phash_dedup_exact_replay(ray_session, sf_small):
    """Banded pHash dedup == brute-force all-pairs Hamming rule (the
    8x8 banding has recall 1 for tau <= 7 by pigeonhole), and every
    planted duplicate group collapses to its first member."""
    import numpy as np
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import (
        PHASH_GROUPS,
        PHASH_HAM_TAU,
        _synth_image_grouped,
        mm_phash_dedup,
    )
    from geografir_ray.stages.multimodal import _dct_basis_q, phash64, popcount64

    out = mm_phash_dedup(sf_small).to_pandas()

    ids = np.sort(
        pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy().astype(np.int64)
    )
    basis = _dct_basis_q()
    hashes = np.array(
        [phash64(_synth_image_grouped(int(i)), basis) for i in ids], dtype=np.uint64
    )
    n = len(ids)
    dropped = np.zeros(n, dtype=bool)
    for j in range(n):
        for i in range(j):
            if int(popcount64(np.array([hashes[i] ^ hashes[j]], np.uint64).view(np.int64))[0]) <= PHASH_HAM_TAU:
                dropped[j] = True
                break

    kept_ids = ids[~dropped]
    assert np.array_equal(out["doc_id"].to_numpy().astype(np.int64), kept_ids)
    got_hashes = out["phash"].to_numpy().view(np.uint64)
    assert np.array_equal(got_hashes, hashes[~dropped])
    # planted structure: every group keeps exactly its first member
    # (unless a cross-group chance collision merged groups — allow <=)
    assert len(kept_ids) <= PHASH_GROUPS
    assert len(kept_ids) >= PHASH_GROUPS - 2
