"""Pure-stdlib WAV (RIFF/WAVE) codec for the multimodal audio stages.

Manual RIFF chunk walk (struct) rather than the ``wave`` module so we
handle float32 PCM and ignore unknown chunks the way real WARC-scraped
audio needs; tests cross-check the PCM16 path against stdlib ``wave``.

Formats: PCM 8/16/32-bit integer (format tag 1) and IEEE float32
(format tag 3), any channel count / sample rate.  Public spec only
(Microsoft RIFF/WAVE, IEEE 1003).
"""

from __future__ import annotations

import struct

import numpy as np

_INT_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16/int32/uint8/float32 → WAV bytes."""
    a = np.ascontiguousarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"encode_wav: shape {samples.shape} unsupported")
    n, ch = a.shape
    if a.dtype == np.float32:
        fmt_tag, bits = 3, 32
    elif a.dtype in (np.uint8, np.int16, np.int32):
        fmt_tag, bits = 1, a.dtype.itemsize * 8
    else:
        raise ValueError(f"encode_wav: dtype {a.dtype} unsupported")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, ch, sample_rate, sample_rate * block, block, bits
    )
    payload = a.tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) array in source dtype, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE stream")
    pos = 12
    fmt_tag = ch = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", chunk)
        elif tag == b"data":
            payload = chunk
    if fmt_tag is None or payload is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    if fmt_tag == 3:
        if bits != 32:
            raise ValueError(f"decode_wav: float{bits} unsupported")
        dt = np.dtype(np.float32)
    elif fmt_tag == 1:
        if bits not in _INT_DTYPES:
            raise ValueError(f"decode_wav: {bits}-bit PCM unsupported")
        dt = np.dtype(_INT_DTYPES[bits])
    else:
        raise ValueError(f"decode_wav: format tag {fmt_tag} unsupported")
    n = len(payload) // (dt.itemsize * ch)
    arr = np.frombuffer(payload[: n * dt.itemsize * ch], dtype=dt).reshape(n, ch)
    return arr, rate


def wav_features(data: bytes) -> dict:
    """Decode + summarize: the stats the MediaFeatures stage emits.

    Integer samples are normalized to [-1, 1) before RMS/peak so the
    numbers are comparable across bit depths.
    """
    arr, rate = decode_wav(data)
    n, ch = arr.shape
    if arr.dtype == np.uint8:  # 8-bit WAV is unsigned, midpoint 128
        x = (arr.astype(np.float64) - 128.0) / 128.0
    elif arr.dtype == np.float32:
        x = arr.astype(np.float64)
    else:
        x = arr.astype(np.float64) / float(2 ** (arr.dtype.itemsize * 8 - 1))
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.max(np.abs(x))) if n else 0.0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "n_channels": int(ch),
        "duration_ms": int(round(n * 1000.0 / rate)) if rate else 0,
        "rms_milli": int(round(rms * 1000)),
        "peak_milli": int(round(peak * 1000)),
    }
