"""Multimodal (image/audio/video) stages over opaque ``binary`` columns.

Design (build brief): media are binary columns with typed metadata;
decode / feature-extract / resize / frame-sample run as actor-pool
map_batches stages with the decoder resolved once per actor.

Codec status — REAL pure-Python/stdlib implementations, no imaging
library required:

- ``png``  — functions/png.py (zlib + numpy; all five PNG filters).
- ``wav``  — functions/wav.py (RIFF walk; PCM 8/16/32 + float32).
- ``mp4``  — ISO-BMFF box walk (``mp4_sample_info`` below): real
  sample counts/timescale from moov/trak/mdia/stbl/stts, so the
  frame-sample plan runs on real containers.  Frame PIXEL decode
  (H.264 et al.) stays out of scope.
- ``jpeg`` — functions/jpeg.py (baseline sequential ITU-T T.81:
  per-image optimal Huffman encode, decoder accepting arbitrary
  DHT/DQT, 4:2:0/4:2:2 subsampling and restart intervals).
- ``fake`` — deterministic stand-in retained for plumbing tests and
  payloads of unknown format.

Batch-size guidance: media rows are wide — size ``batch_size`` so
(batch_size x avg_payload x concurrency) fits the worker heap; the
caller passes small batch_size for big payloads (memory-aware knob
from the brief).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.jpeg import decode_jpeg, encode_jpeg
from ..functions.png import decode_png, encode_png, resize_bilinear, resize_nearest
from ..functions.wav import wav_features


def decode_fake(payload: bytes) -> dict:
    """Deterministic stand-in decoder: 'dimensions' and 'channel stats'
    derived from the bytes themselves — stable across runs/workers."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    return {
        "width": int(16 + (n % 32)),
        "height": int(16 + ((n // 32) % 32)),
        "n_bytes": n,
        "byte_sum": int(arr.sum()),
        "byte_mean_milli": int(arr.mean() * 1000) if n else 0,
    }


def decode_png_features(payload: bytes) -> dict:
    """REAL png decode → pixel-level features (same column contract as
    the fake codec so the stage schema is format-independent)."""
    img = decode_png(payload)
    h, w = img.shape[:2]
    flat = img.reshape(-1).astype(np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "n_bytes": len(payload),
        "byte_sum": int(flat.sum()),
        "byte_mean_milli": int(flat.mean() * 1000) if len(flat) else 0,
    }


def decode_jpeg_features(payload: bytes) -> dict:
    """REAL baseline-JPEG decode → pixel-level features (same column
    contract as png/fake)."""
    img = decode_jpeg(payload)
    h, w = img.shape[:2]
    flat = img.reshape(-1).astype(np.int64)
    return {
        "width": int(w),
        "height": int(h),
        "n_bytes": len(payload),
        "byte_sum": int(flat.sum()),
        "byte_mean_milli": int(flat.mean() * 1000) if len(flat) else 0,
    }


def _unimplemented(fmt: str):
    def decode(_payload: bytes) -> dict:
        raise NotImplementedError(
            f"{fmt} decoding requires a codec library not present in this "
            "container; wire a real decoder into multimodal.DECODERS"
        )

    return decode


DECODERS = {
    "fake": decode_fake,
    "png": decode_png_features,
    "jpeg": decode_jpeg_features,
    "mp4": _unimplemented("mp4"),  # pixel decode; sample counts: mp4_sample_info
}


def sniff_image(payload: bytes) -> str:
    """Magic-byte format sniff for image payloads."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    raise ValueError("sniff_image: neither PNG nor JPEG magic")


class MediaFeatures:
    """Actor-pool stage: decode binary payloads → typed feature columns.

    ``__init__`` resolves the decoder once per actor (model-load slot);
    ``__call__`` is per batch.  Input: (id_col, payload: binary,
    format: string).  Output: id + decoded feature columns.
    """

    def __init__(self, id_col: str = "doc_id", default_format: str = "fake"):
        self.id_col = id_col
        self.default_format = default_format
        self.decoders = DECODERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmts = (
            batch["format"].to_pylist()
            if "format" in batch.column_names
            else [self.default_format] * len(payloads)
        )
        feats = [self.decoders[f](p or b"") for f, p in zip(fmts, payloads)]
        cols: dict[str, pa.Array] = {self.id_col: batch[self.id_col]}
        for key in ("width", "height", "n_bytes", "byte_sum", "byte_mean_milli"):
            cols[key] = pa.array([f[key] for f in feats], type=pa.int64())
        return pa.table(cols)


class AudioFeatures:
    """Actor-pool stage: REAL wav decode → audio summary columns
    (sample_rate, n_samples, n_channels, duration_ms, rms_milli,
    peak_milli).  Integer samples are normalized so stats are
    comparable across bit depths (functions/wav.wav_features)."""

    _KEYS = (
        "sample_rate",
        "n_samples",
        "n_channels",
        "duration_ms",
        "rms_milli",
        "peak_milli",
    )

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [wav_features(p or b"") for p in batch["payload"].to_pylist()]
        cols: dict[str, pa.Array] = {self.id_col: batch[self.id_col]}
        for key in self._KEYS:
            cols[key] = pa.array([f[key] for f in feats], type=pa.int64())
        return pa.table(cols)


class ImageResize:
    """Actor-pool stage: REAL decode → resize → re-encode, format
    sniffed per payload (png stays png, jpeg re-encodes jpeg at
    ``jpeg_quality``).  Output rows carry the resized payload plus the
    new dimensions; aspect ratio is preserved by scaling the long edge
    to ``max_px`` (never upscales)."""

    def __init__(
        self,
        max_px: int,
        id_col: str = "doc_id",
        method: str = "bilinear",
        jpeg_quality: int = 85,
    ):
        if method not in ("bilinear", "nearest"):
            raise ValueError(f"ImageResize: method {method!r} unsupported")
        self.max_px = int(max_px)
        self.id_col = id_col
        self.resize = resize_bilinear if method == "bilinear" else resize_nearest
        self.jpeg_quality = int(jpeg_quality)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads: list[bytes] = []
        widths: list[int] = []
        heights: list[int] = []
        for p in batch["payload"].to_pylist():
            fmt = sniff_image(p)
            img = decode_png(p) if fmt == "png" else decode_jpeg(p)
            h, w = img.shape[:2]
            long_edge = max(h, w)
            if long_edge > self.max_px:
                scale = self.max_px / long_edge
                nh = max(1, int(round(h * scale)))
                nw = max(1, int(round(w * scale)))
                img = self.resize(img, nh, nw)
                h, w = nh, nw
            out_payloads.append(
                encode_png(img)
                if fmt == "png"
                else encode_jpeg(img, self.jpeg_quality)
            )
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "payload": pa.array(out_payloads, type=pa.binary()),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# ISO-BMFF (mp4) box walk — real container metadata without a codec.
# Public spec: ISO/IEC 14496-12 base media file format.
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(data: bytes, start: int, end: int, out: dict) -> None:
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: malformed box size")
        if tag in _CONTAINERS:
            _walk_boxes(data, pos + hdr, pos + size, out)
        elif tag == b"mdhd":
            ver = data[pos + hdr]
            if ver == 1:
                timescale, duration = struct.unpack_from(">IQ", data, pos + hdr + 20)
            else:
                timescale, duration = struct.unpack_from(">II", data, pos + hdr + 12)
            out.setdefault("timescale", int(timescale))
            out.setdefault("duration", int(duration))
        elif tag == b"stts":
            (n_entries,) = struct.unpack_from(">I", data, pos + hdr + 4)
            counts = np.frombuffer(
                data, dtype=">u4", count=n_entries * 2, offset=pos + hdr + 8
            ).reshape(n_entries, 2)
            out["n_samples"] = out.get("n_samples", 0) + int(counts[:, 0].sum())
        pos += size


def mp4_sample_info(data: bytes) -> dict:
    """Parse an ISO-BMFF stream → {n_samples, timescale, duration}.

    Real box-tree walk (ftyp/moov/trak/.../stts); raises on malformed
    input.  Feeds frame_sample_plan with true frame counts."""
    out: dict = {}
    _walk_boxes(data, 0, len(data), out)
    if "n_samples" not in out:
        raise ValueError("mp4: no stts box found (not a media container?)")
    return {
        "n_samples": out["n_samples"],
        "timescale": out.get("timescale", 0),
        "duration": out.get("duration", 0),
    }


class VideoFramePlan:
    """Actor-pool stage: REAL mp4 box parse → frame-sampling plan
    (every_n-th sample index) per payload."""

    def __init__(self, every_n: int, id_col: str = "doc_id"):
        self.every_n = int(every_n)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        infos = [mp4_sample_info(p or b"") for p in batch["payload"].to_pylist()]
        plans = [list(range(0, i["n_samples"], self.every_n)) for i in infos]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_samples": pa.array([i["n_samples"] for i in infos], pa.int64()),
                "timescale": pa.array([i["timescale"] for i in infos], pa.int64()),
                "frame_plan": pa.array(plans, type=pa.list_(pa.int64())),
            }
        )


def resize_stub(max_px: int) -> "callable":
    """Metadata-only resize planner (kept for payloads whose format has
    no decoder): passes payloads through and records the target size.
    png/jpeg payloads should use ImageResize (real)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "resize_target_px", pa.array([max_px] * batch.num_rows, type=pa.int64())
        )

    fn.__name__ = f"resize_stub[{max_px}]"
    return fn


def frame_sample_plan(n_frames_col: str, every_n: int) -> "callable":
    """Stage: compute which frame indices a video sampler would decode
    from an n_frames column (VideoFramePlan derives the counts from the
    real mp4 container instead)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch[n_frames_col].to_numpy(zero_copy_only=False)
        plans = [list(range(0, int(x), every_n)) for x in n]
        return batch.append_column(
            "frame_plan", pa.array(plans, type=pa.list_(pa.int64()))
        )

    fn.__name__ = f"frame_sample[{every_n}]"
    return fn


# ---------------------------------------------------------------------------
# Perceptual hash (pHash): 64-bit DCT low-frequency signature for
# image near-dup detection.  Integer-quantized DCT basis (1<<14 fixed
# point) so the hash is bit-stable across workers and platforms — the
# same device as the LSH/kmeans integer dots (CLAUDE.md conventions).
# ---------------------------------------------------------------------------

PHASH_SIZE = 32  # input resized to 32x32 before the DCT


def _dct_basis_q(n: int = PHASH_SIZE) -> np.ndarray:
    """(n, n) int64 DCT-II basis, rows = frequencies, 1<<14 fixed point."""
    i = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)[:, None]
    d = np.cos(np.pi * (i[None, :] + 0.5) * k / n)
    return np.round(d * (1 << 14)).astype(np.int64)


def phash64(img: np.ndarray, basis_q: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w[, 3]) uint8 image.

    Grayscale (integer ITU weights) → 32x32 bilinear resize → integer
    DCT-II → top-left 8x8 block → bits = coefficient > lower median.
    All arithmetic after the resize is int64-exact."""
    from ..functions.png import resize_bilinear

    if img.ndim == 3:
        g = (
            img[..., 0].astype(np.int64) * 299
            + img[..., 1].astype(np.int64) * 587
            + img[..., 2].astype(np.int64) * 114
        ) // 1000
        g = g.astype(np.uint8)
    else:
        g = img
    n = basis_q.shape[0]
    if g.shape != (n, n):
        g = resize_bilinear(g, n, n)
    c = basis_q @ g.astype(np.int64) @ basis_q.T  # integer DCT, exact
    block = c[:8, :8].ravel()
    med = np.partition(block.copy(), 31)[31]  # lower median, deterministic
    bits = (block > med).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


_POP16 = None


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over an int64/uint64 array (16-bit LUT)."""
    global _POP16
    if _POP16 is None:
        v = np.arange(1 << 16, dtype=np.uint16)
        # each uint16 contributes its two bytes consecutively; byte
        # order within the pair doesn't matter for a popcount
        _POP16 = (
            np.unpackbits(v.view(np.uint8)).reshape(-1, 16).sum(axis=1)
        ).astype(np.uint8)
    u = x.astype(np.uint64)
    out = np.zeros(x.shape, dtype=np.int64)
    for s in (0, 16, 32, 48):
        out += _POP16[((u >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


class ImagePHash:
    """Actor-pool stage: binary image payload → 64-bit pHash.

    The PNG decoder dispatch, the quantized DCT basis and the resize
    target are resolved ONCE per actor (__init__), per the stateful-
    stage contract; __call__ only decodes and hashes."""

    def __init__(self, id_col: str = "doc_id"):
        from ..functions.png import decode_png

        self.id_col = id_col
        self.decode = decode_png
        self.basis_q = _dct_basis_q()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        hashes = np.empty(len(ids), dtype=np.uint64)
        payloads = batch["payload"]
        for i in range(len(ids)):
            img = self.decode(payloads[i].as_py())
            hashes[i] = phash64(img, self.basis_q)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "phash": pa.array(hashes.view(np.int64)),
            }
        )


class ImagePatches:
    """Actor-pool stage: real PNG decode → ViT-style patch extraction.

    Emits one row per FULL ``patch x patch`` grayscale tile with
    integer mean/variance (milli-units over the 0-255 domain:
    mean_milli = 1000·Σ/n, var_milli = 1000·(n·Σx² − Σ²)/n² — exact
    int64 arithmetic, no float drift).  The training-data shape this
    feeds: patch filtering (drop uniform tiles) before patch-level
    embedding.  Codec state lives in __init__ (once per actor)."""

    def __init__(self, id_col: str = "doc_id", patch: int = 4):
        from ..functions.png import decode_png

        self._decode = decode_png
        self._id = id_col
        self._p = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self._p
        ids_out, prow, pcol, mean_m, var_m = [], [], [], [], []
        ids = batch[self._id].to_pylist()
        for i, payload in zip(ids, batch["payload"].to_pylist()):
            img = self._decode(payload)
            gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
            H = (gray.shape[0] // p) * p
            W = (gray.shape[1] // p) * p
            if H == 0 or W == 0:
                continue
            tiles = gray[:H, :W].reshape(H // p, p, W // p, p)
            s = tiles.sum(axis=(1, 3))
            sq = (tiles * tiles).sum(axis=(1, 3))
            n = p * p
            mm = (1000 * s) // n
            vv = (1000 * (n * sq - s * s)) // (n * n)
            nr, nc = s.shape
            ids_out.append(np.full(nr * nc, i, dtype=np.int64))
            prow.append(np.repeat(np.arange(nr, dtype=np.int64), nc))
            pcol.append(np.tile(np.arange(nc, dtype=np.int64), nr))
            mean_m.append(mm.ravel())
            var_m.append(vv.ravel())
        if not ids_out:
            return pa.schema(
                [("doc_id", pa.int64()), ("patch_row", pa.int64()),
                 ("patch_col", pa.int64()), ("mean_milli", pa.int64()),
                 ("var_milli", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out)),
                "patch_row": pa.array(np.concatenate(prow)),
                "patch_col": pa.array(np.concatenate(pcol)),
                "mean_milli": pa.array(np.concatenate(mean_m)),
                "var_milli": pa.array(np.concatenate(var_m)),
            }
        )


class AudioSpectrogram:
    """Actor-pool stage: real WAV decode → banded power spectrogram.

    Rectangular 128-sample frames (hop 64), rFFT power summed over
    frames, 8 linear bands over the 65 rFFT bins; energies emitted as
    floor(1000·log10(1+E)) integers so the golden pin is rounding-
    stable.  The per-frame FFT is the genuinely-multimodal compute;
    framing is a zero-copy stride trick."""

    FRAME = 128
    HOP = 64
    BANDS = 8

    def __init__(self, id_col: str = "doc_id"):
        from ..functions.wav import decode_wav

        self._decode = decode_wav
        self._id = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        F, H, B = self.FRAME, self.HOP, self.BANDS
        ids_out, band, energy, nframes = [], [], [], []
        ids = batch[self._id].to_pylist()
        for i, payload in zip(ids, batch["payload"].to_pylist()):
            arr, _rate = self._decode(payload)
            x = arr.astype(np.float64).mean(axis=1)
            if arr.dtype == np.int16:
                x = x / 32768.0
            nf = max(0, (len(x) - F) // H + 1)
            if nf == 0:
                continue
            frames = np.lib.stride_tricks.sliding_window_view(x, F)[::H][:nf]
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            total = spec.sum(axis=0)  # (F//2 + 1,)
            edges = np.linspace(0, len(total), B + 1).astype(np.int64)
            e = np.add.reduceat(total, edges[:-1])
            ids_out.append(np.full(B, i, dtype=np.int64))
            band.append(np.arange(B, dtype=np.int64))
            energy.append(np.floor(1000.0 * np.log10(1.0 + e)).astype(np.int64))
            nframes.append(np.full(B, nf, dtype=np.int64))
        if not ids_out:
            return pa.schema(
                [("doc_id", pa.int64()), ("band", pa.int64()),
                 ("energy_milli", pa.int64()), ("n_frames", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out)),
                "band": pa.array(np.concatenate(band)),
                "energy_milli": pa.array(np.concatenate(energy)),
                "n_frames": pa.array(np.concatenate(nframes)),
            }
        )
