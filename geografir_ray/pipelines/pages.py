"""The north-star pages pipeline: Common-Crawl-style pages →
dedup-by-url → location extraction (gazetteer actor state) → geocode to
H3/S2/geohash cells → point-in-polygon zones → zonal/tile aggregates.

Input schema = BASELINE.json input_hint: (url, warc_ts, html, text,
lang).  The ``html`` column is projected away at the read — never
shipped; ``text`` passes through byte-identical (invariant checked in
tests).

Per-stage shuffle budget (SURVEY.md §7.3):
  dedup     groupby(url_hash)       winner = min(warc_ts, url)
  extract   none (fused map chain, gazetteer cached per worker)
  geocode   none
  PIP       none (zones broadcast) — partitioned variant available
  zonal agg tiny (per-batch combiner → groupby(zone))
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells as cellfns
from ..functions.gazetteer import LocationExtractor
from ..functions.hashing import hash_strings
from ..stages import geo as geo_stages
from .common import grouped_sum
from .spatial import N_ZONES

_EXTRACTOR_CACHE: dict[str, LocationExtractor] = {}


def _extractor() -> LocationExtractor:
    # built once per worker process (task-fusable stateful stage —
    # same amortization as an actor pool, keeps operator fusion;
    # see stages/geo.broadcast_pip_task for the measured tradeoff)
    if "x" not in _EXTRACTOR_CACHE:
        _EXTRACTOR_CACHE["x"] = LocationExtractor()
    return _EXTRACTOR_CACHE["x"]


_TS_BASE_US = np.int64(np.datetime64("2020-01-01T00:00:00", "us").astype(np.int64))


def _winner_key(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(url_hash, packed winner key) per row.

    packed = ((warc_ts - 2020 epoch) << 14) | (row_hash & 0x3FFF):
    min(packed) per url picks the earliest warc_ts, ties broken by a
    14-bit deterministic row hash.  Two DISTINCT rows sharing url,
    exact microsecond, and 14-bit hash could collide (~1e-4 of ties);
    byte-identical rows colliding is harmless by definition.
    """
    from ..functions.hashing import splitmix64

    h = hash_strings(t["url"].to_pylist())
    url_hash = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    ts = t["warc_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    row_h = splitmix64(h ^ splitmix64(ts.astype(np.uint64)))
    packed = ((ts - _TS_BASE_US) << np.int64(14)) | (row_h & np.uint64(0x3FFF)).astype(
        np.int64
    )
    return url_hash, packed


def dedup_by_url(pages):
    """Exact dedup: keep the deterministic winner (min warc_ts, hash
    tie-break) per url — NO per-group Python.

    Plan (scale-first): (1) per-batch combiner emits one (url_hash,
    min packed) row per url per batch; (2) a vectorized groupby Min
    over the partials yields the winner key per url; (3) winners
    broadcast (16 B/url) and each batch keeps rows whose packed key
    equals their url's winner.  The earlier groupby.map_groups form
    made one Python call per url (~50 us x n_urls — 250 s at 1M urls);
    this form is three vectorized passes.  For url cardinalities too
    large to broadcast, swap step 3 for Dataset.join on url_hash.
    """
    import ray
    from ray.data.aggregate import Min

    def partial(t: pa.Table) -> pa.Table:
        url_hash, packed = _winner_key(t)
        g = pa.table({"url_hash": url_hash, "packed": packed}).group_by(
            "url_hash"
        ).aggregate([("packed", "min")])
        return g.rename_columns(["url_hash", "packed"])

    partials = pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # global min-merge: the combiner already emits <= one row per url
    # per batch, so the partial set is ~n_urls rows (16 B each) — a
    # driver-side vectorized merge beats an all-to-all groupby by ~10x
    # at 1M urls.  For url cardinalities beyond driver memory, replace
    # with `.groupby("url_hash").aggregate(Min(...))` (same semantics,
    # distributed) — the combiner keeps that exchange small too.
    wpd = partials.to_pandas()
    merged = wpd.groupby("url_hash", sort=True)["packed"].min()
    ref = ray.put(
        (
            merged.index.values.astype(np.int64),
            merged.values.astype(np.int64),
        )
    )

    _cache: dict = {}

    def keep_winners(t: pa.Table) -> pa.Table:
        if "w" not in _cache:
            _cache["w"] = ray.get(ref)
        wh, wp = _cache["w"]
        url_hash, packed = _winner_key(t)
        pos = np.searchsorted(wh, url_hash)
        pos = np.clip(pos, 0, len(wh) - 1)
        keep = (wh[pos] == url_hash) & (wp[pos] == packed)
        return t.filter(pa.array(keep))

    return pages.map_batches(
        keep_winners, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def extract_locations(pages):
    """text → exploded mention rows (url, name, lat, lon); text column
    only READ, never rewritten."""

    def fn(t: pa.Table) -> pa.Table:
        rows, names, lats, lons = _extractor().extract(t["text"].to_pylist())
        take = pa.array(rows)
        return pa.table(
            {
                "url": t["url"].take(take),
                "name": pa.array(names, type=pa.string()),
                "lat": pa.array(lats),
                "lon": pa.array(lons),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)


def pages_zonal(pages_ds):
    """Full chain → per-zone mention counts (the flagship shape on the
    pages schema)."""
    import ray

    deduped = dedup_by_url(pages_ds)
    mentions = extract_locations(deduped)
    mentions = mentions.map_batches(
        geo_stages.add_cells(7, 10, 6), batch_format="pyarrow", batch_size=None
    )
    zones_ref = ray.put(geo_stages.zones_payload(np.arange(N_ZONES, dtype=np.int64)))
    pairs = mentions.map_batches(
        geo_stages.broadcast_pip_task(zones_ref, "url", ()),
        batch_format="pyarrow",
        batch_size=None,
    )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_sum(
        pairs.map_batches(ones, batch_format="pyarrow"),
        ["zone_id"],
        {"n_mentions": ("one", "sum")},
        merge="driver",  # <=25 zones
    )
    return agg.sort("zone_id")
