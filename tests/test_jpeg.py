"""Baseline JPEG codec (pure numpy, ITU-T T.81): encoder/decoder
round-trip quality gates, hand-built foreign-layout fixtures (4:2:0
subsampling, restart intervals), and the Ray stage integration."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from geografir_ray.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(shape, seed=2):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape).astype(np.float64)
    from numpy.lib.stride_tricks import sliding_window_view

    p = np.pad(img, 2, mode="edge")
    return (
        sliding_window_view(p, (5, 5)).reshape(*shape, 25).mean(axis=2).astype(np.uint8)
    )


def test_flat_images_exact():
    """DC-only content survives quantization exactly at high quality."""
    flat = np.full((32, 32), 137, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 95)) == 137).all()
    flat_rgb = np.full((24, 40, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat_rgb, 95))
    assert (out == flat_rgb).all()


def test_quality_ladder_psnr():
    img = _smooth((64, 64))
    prev = 0.0
    for q, floor in [(50, 31), (75, 33), (90, 38), (95, 42)]:
        p = _psnr(img, decode_jpeg(encode_jpeg(img, q)))
        assert p > floor, (q, p)
        assert p > prev  # monotone in quality
        prev = p


def test_rgb_and_odd_dimensions():
    img = _smooth((64, 64))
    rgb = np.stack([img, img[::-1], img.T], axis=2)
    out = decode_jpeg(encode_jpeg(rgb, 90))
    assert out.shape == rgb.shape and _psnr(rgb, out) > 30
    odd = img[:37, :53]
    out = decode_jpeg(encode_jpeg(odd, 85))
    assert out.shape == odd.shape and _psnr(odd, out) > 33


def test_deterministic_and_compresses():
    rgb = np.stack([_smooth((48, 48))] * 3, axis=2)
    d1 = encode_jpeg(rgb, 85)
    assert d1 == encode_jpeg(rgb, 85)
    assert len(d1) < rgb.nbytes // 3
    assert hashlib.sha256(encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), 90)
                          ).hexdigest()[:16] == hashlib.sha256(
        encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), 90)
    ).hexdigest()[:16]


def test_rejects_nonbaseline():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # progressive SOF2 marker
    prog = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float32))


# ---------------------------------------------------------------------------
# hand-built foreign fixtures: layouts our encoder never emits
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _fixed_dht(tc: int, th: int):
    """Tiny fixed table: symbols 0..5 at length 3 (Kraft 6/8)."""
    bits = [0, 0, 6] + [0] * 13
    syms = [0, 1, 2, 3, 4, 5]
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)
    codes = {s: (s, 3) for s in syms}
    return payload, codes


class _BW:
    def __init__(self):
        self.bits = []

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray()
        b = self.bits + [1] * ((8 - len(self.bits) % 8) % 8)
        for i in range(0, len(b), 8):
            v = 0
            for bit in b[i : i + 8]:
                v = (v << 1) | bit
            out.append(v)
            if v == 0xFF:
                out.append(0x00)
        return bytes(out)


def _build_420_fixture(y_vals, cb_val, cr_val):
    """One 16x16 MCU, 4:2:0: four Y blocks with DC values y_vals, flat
    chroma.  QT = identity (all 1s) so DC q-value == DC coefficient.
    DC coef for flat block with pixel p is 8*(p-128); choose p-128 in
    {-1,0,1,2} so DC diffs stay tiny and encodable with symbols 0..3."""
    qt = bytes([0]) + bytes([1] * 64)
    dht_dc, dc_codes = _fixed_dht(0, 0)
    dht_ac, ac_codes = _fixed_dht(1, 0)
    sof = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    w = _BW()
    prev = 0
    for p in y_vals:  # four Y blocks, raster order within MCU
        dc = 8 * (p - 128)
        diff = dc - prev
        prev = dc
        s = abs(diff).bit_length()
        w.put(*dc_codes[s])
        if s:
            amp = diff if diff > 0 else diff + (1 << s) - 1
            w.put(amp, s)
        w.put(*ac_codes[0])  # EOB
    for cval in (cb_val, cr_val):
        dc = 8 * (cval - 128)
        s = abs(dc).bit_length()
        w.put(*dc_codes[s])
        if s:
            amp = dc if dc > 0 else dc + (1 << s) - 1
            w.put(amp, s)
        w.put(*ac_codes[0])

    return (
        b"\xff\xd8"
        + _seg(0xFFDB, qt)
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, sos)
        + w.bytes()
        + b"\xff\xd9"
    )


def test_decode_420_subsampled_fixture():
    """Hand-assembled 4:2:0 file: per-quadrant Y DC levels with flat
    chroma at 128 (no color shift) must decode to the exact greys."""
    data = _build_420_fixture([127, 128, 129, 130], 128, 128)
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    # chroma 128 → R=G=B=Y
    assert int(out[0, 0, 0]) == 127 and (out[0:8, 0:8] == 127).all()
    assert (out[0:8, 8:16] == 128).all()
    assert (out[8:16, 0:8] == 129).all()
    assert (out[8:16, 8:16] == 130).all()


def test_decode_restart_interval_fixture():
    """Two 8x8 MCUs greyscale with DRI=1: an RST0 marker sits between
    them and DC prediction must reset."""
    qt = bytes([0]) + bytes([1] * 64)
    dht_dc, dc_codes = _fixed_dht(0, 0)
    dht_ac, ac_codes = _fixed_dht(1, 0)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    def mcu_bits(pix):
        w = _BW()
        dc = 8 * (pix - 128)
        s = abs(dc).bit_length()
        w.put(*dc_codes[s])
        if s:
            amp = dc if dc > 0 else dc + (1 << s) - 1
            w.put(amp, s)
        w.put(*ac_codes[0])
        return w.bytes()

    stream = mcu_bits(129) + b"\xff\xd0" + mcu_bits(130)
    data = (
        b"\xff\xd8"
        + _seg(0xFFDB, qt)
        + _seg(0xFFDD, struct.pack(">H", 1))
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, sos)
        + stream
        + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out.shape == (8, 16)
    assert (out[:, :8] == 129).all()
    assert (out[:, 8:] == 130).all()


def test_zigzag_is_involution_pair():
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_media_features_jpeg_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import ImageResize, MediaFeatures

    imgs = [_smooth((40 + 2 * i, 32), seed=i) for i in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "payload": pa.array(
                [encode_jpeg(im, 90) for im in imgs], type=pa.binary()
            ),
            "format": pa.array(["jpeg"] * 10),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            MediaFeatures,
            fn_constructor_args=("doc_id", "jpeg"),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["width"].values == 32).all()
    assert (out["height"].values == [40 + 2 * i for i in range(10)]).all()
    # lossy: mean within 2% of source mean
    for i in range(10):
        src_mean = imgs[i].mean() * 1000
        assert abs(out["byte_mean_milli"][i] - src_mean) < 0.02 * src_mean + 2000

    # resize stage sniffs jpeg and re-encodes jpeg
    out2 = (
        rd.from_arrow(t)
        .map_batches(
            ImageResize,
            fn_constructor_args=(16, "doc_id", "bilinear"),
            batch_format="pyarrow",
            concurrency=2,
            batch_size=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out2["width"].values == [max(1, round(32 * 16 / (40 + 2 * i))) for i in range(10)]).all()
    payload0 = out2["payload"][0]
    assert payload0[:2] == b"\xff\xd8"
    dec = decode_jpeg(payload0)
    assert dec.shape[0] == 16
