"""Flagship pipeline (driver `entry()` smoke target).

End-to-end chain exercising the engine's core path on one pass:
  read (pruned) → derive points → geocode to geohash/S2/hex cells →
  broadcast PIP join against the diamond zones (actor-pool stage with
  STR-tree state) → two-phase zonal aggregation → small sorted result.

At 100 TB the same plan holds: the only shuffle is the final groupby
over per-batch partials (O(zones × batches) rows), the polygon side is
broadcast once via ray.put, and every batch-stage is zero-copy Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import synthgeo
from ..sources.tables import read_table
from ..stages import geo as geo_stages
from .common import grouped_sum
from .spatial import N_ZONES


def flagship(sf_dir: str):
    import ray

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def derive(t: pa.Table) -> pa.Table:
        k = (
            t["l_orderkey"].to_numpy(zero_copy_only=False) * 8
            + t["l_linenumber"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "point_id": pa.array(k),
                "lat": pa.array(synthgeo.synth_lat(k)),
                "lon": pa.array(synthgeo.synth_lon(k)),
                "qty_c": pc.cast(
                    pc.floor(pc.multiply(t["l_quantity"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    pts = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    pts = pts.map_batches(
        geo_stages.add_cells(geohash_precision=7, s2_level=10, hex_resolution=6),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    zones_ref = ray.put(geo_stages.zones_payload(np.arange(N_ZONES, dtype=np.int64)))
    # task-based broadcast PIP: zone index cached once per worker process,
    # stage fuses with derive/add_cells (see broadcast_pip_task docstring)
    pairs = pts.map_batches(
        geo_stages.broadcast_pip_task(zones_ref, "point_id", ("qty_c", "cell_s2")),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    def to_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "qty_c": t["qty_c"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_sum(
        pairs.map_batches(to_partial, batch_format="pyarrow"),
        ["zone_id"],
        {"n_points": ("one", "sum"), "sum_qty_c": ("qty_c", "sum")},
        merge="driver",  # <=25 zones
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "n_points": t["n_points"],
                "sum_qty": pc.divide(pc.cast(t["sum_qty_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("zone_id")
