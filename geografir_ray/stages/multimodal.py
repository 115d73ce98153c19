"""Multimodal (image/audio/video) stages — binary payload plumbing.

Design (build brief): media are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool map_batches stages.  The actual codec libraries are NOT in
this container, so the codec call sites are stubbed: ``DECODERS``
raises ``NotImplementedError`` for real formats, and the deterministic
``fake`` codec exercises the full Ray-side plumbing (schema, batching,
actor lifecycle, output layout) so swapping in PIL/ffmpeg later is a
one-function change.

Batch-size guidance: media rows are wide — size ``batch_size`` so
(batch_size x avg_payload x concurrency) fits the worker heap; the
caller passes small batch_size for big payloads (memory-aware knob
from the brief).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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


def _unimplemented(fmt: str):
    def decode(_payload: bytes) -> dict:
        raise NotImplementedError(
            f"{fmt} decoding requires a codec library not present in this "
            "container; wire a real decoder into multimodal.DECODERS"
        )

    return decode


DECODERS = {
    "fake": decode_fake,
    "jpeg": _unimplemented("jpeg"),
    "png": _unimplemented("png"),
    "wav": _unimplemented("wav"),
    "mp4": _unimplemented("mp4"),
}


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


def resize_stub(max_px: int) -> "callable":
    """Stage placeholder for image resize: passes payloads through and
    records the target size (real implementation needs a codec)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "resize_target_px", pa.array([max_px] * batch.num_rows, type=pa.int64())
        )

    fn.__name__ = f"resize_stub[{max_px}]"
    return fn


def frame_sample_plan(n_frames_col: str, every_n: int) -> "callable":
    """Stage: compute which frame indices a video sampler would decode
    (the plan is real; the decode itself is stubbed)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch[n_frames_col].to_numpy(zero_copy_only=False)
        plans = [list(range(0, int(x), every_n)) for x in n]
        return batch.append_column(
            "frame_plan", pa.array(plans, type=pa.list_(pa.int64()))
        )

    fn.__name__ = f"frame_sample[{every_n}]"
    return fn
