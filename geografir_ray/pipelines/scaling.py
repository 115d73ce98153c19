"""Scaling-evidence pipeline: the flagship geocode→cells→PIP chain over
a large deterministic synthetic point stream (no external data).

The sf0.1 parquet tables (~600k rows) finish in ~3s on 32 CPUs — fixed
session overhead (~1.5s) swamps the signal, so a two-level comparison
there measures Ray's constant costs, not the engine's scaling.  This
module runs the SAME per-row work at pages-corpus density (default 64M
points ≈ 100x sf0.1) where compute dominates, which is the regime the
north rule's N→4N-node criterion describes.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa


def throughput_run(n_rows: int = 64_000_000, num_blocks: int | None = None) -> dict:
    """Run the fused derive→cells→PIP chain over n_rows synthetic points.

    Returns {"sec", "rows", "matched", "rows_per_sec"}.  Ray session must
    already be initialised by the caller (bench.py owns it).
    """
    import ray
    import ray.data as rd

    from ..stages import geo as G

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nb = num_blocks or ncpu * 4
    zones_ref = ray.put(G.zones_payload(np.arange(25, dtype=np.int64)))

    from ..functions import synthgeo

    def derive(t: pa.Table) -> pa.Table:
        k = t["id"].to_numpy()
        return pa.table(
            {
                "point_id": pa.array(k),
                "lat": pa.array(synthgeo.synth_lat(k)),
                "lon": pa.array(synthgeo.synth_lon(k)),
            }
        )

    t0 = time.perf_counter()
    ds = rd.range(n_rows, override_num_blocks=nb).map_batches(
        derive, batch_format="pyarrow", batch_size=None
    )
    ds = ds.map_batches(
        G.add_cells(7, 10, 6), batch_format="pyarrow", batch_size=None
    )
    ds = ds.map_batches(
        G.broadcast_pip_task(zones_ref, "point_id", ()),
        batch_format="pyarrow",
        batch_size=None,
    )

    # End the chain the way the real flagship does: a fused per-batch
    # zonal combiner, so each task ships one <=25-row partial instead of
    # materializing every matched row into the object store.  The
    # .count() tail previously measured plasma write/read bandwidth of
    # ~n_rows * 30B of match rows — an artifact no real pipeline pays
    # (flagship feeds the identical rows straight into grouped_sum).
    def zonal_partial(t: pa.Table) -> pa.Table:
        z = t["zone_id"]
        g = pa.table(
            {"zone_id": z, "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by(["zone_id"]).aggregate([("one", "sum")])
        return g.rename_columns(["zone_id", "n"])

    partials = ds.map_batches(zonal_partial, batch_format="pyarrow")
    matched = 0
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            matched += int(
                np.asarray(b["n"].to_numpy(zero_copy_only=False)).sum()
            )
    sec = time.perf_counter() - t0
    return {
        "sec": round(sec, 3),
        "rows": n_rows,
        "matched": matched,
        "rows_per_sec": round(n_rows / sec),
    }
