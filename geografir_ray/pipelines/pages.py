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

    h = hash_strings(t["url"])
    url_hash = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    ts = t["warc_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    row_h = splitmix64(h ^ splitmix64(ts.astype(np.uint64)))
    packed = ((ts - _TS_BASE_US) << np.int64(14)) | (row_h & np.uint64(0x3FFF)).astype(
        np.int64
    )
    return url_hash, packed


def _winner_partials(pages):
    """Per-batch combiner: <= one (url_hash, min packed) row per url
    per batch — collapses duplicates before any exchange."""

    def partial(t: pa.Table) -> pa.Table:
        url_hash, packed = _winner_key(t)
        g = pa.table({"url_hash": url_hash, "packed": packed}).group_by(
            "url_hash"
        ).aggregate([("packed", "min")])
        return g.rename_columns(["url_hash", "packed"])

    return pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def _broadcast_keep_filter(pages, wh: np.ndarray, wp: np.ndarray):
    """Filter pages to rows whose (url_hash, packed) is a winner, via a
    broadcast sorted winner array (16 B/url) — no shuffle of the corpus."""
    import ray

    ref = ray.put((wh, wp))
    _cache: dict = {}

    def keep_winners(t: pa.Table) -> pa.Table:
        if "w" not in _cache:
            _cache["w"] = ray.get(ref)
        wh_, wp_ = _cache["w"]
        url_hash, packed = _winner_key(t)
        pos = np.searchsorted(wh_, url_hash)
        pos = np.clip(pos, 0, max(len(wh_) - 1, 0))
        if len(wh_) == 0:
            keep = np.zeros(t.num_rows, dtype=bool)
        else:
            keep = (wh_[pos] == url_hash) & (wp_[pos] == packed)
        return t.filter(pa.array(keep))

    return pages.map_batches(
        keep_winners, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


_TAG_COLS = ["__bkt"]


def _shuffle_dedup(pages, n_buckets: int):
    """Fully distributed dedup in ONE exchange: hash-partition the
    corpus on url_hash into B buckets, and resolve winners inside each
    bucket with a vectorized lexsort + segment-min (all rows of a url
    are co-located by construction).  Nothing ever lands on the driver
    — the unbounded-url-cardinality path.

    Measured: 12M pages / 11.88M distinct urls in ~14.5 s at 32 CPUs;
    the alternative two-exchange plan (distributed groupby-Min winners
    + co-partition filter) took 233 s — Ray's sort-based aggregate over
    ~12M partial KEYS dwarfed the single payload exchange.

    n_buckets is the map_groups call count AND the per-call
    materialization unit: size it so corpus_bytes / n_buckets fits a
    worker heap (the per-group-Python trap is per-KEY calls, not
    per-bucket — 100k buckets of vectorized work is fine at 100 TB)."""
    from ..functions.hashing import splitmix64

    def tag(t: pa.Table) -> pa.Table:
        # ONLY the bucket id rides the exchange — the winner key is
        # recomputed bucket-side from (url, warc_ts), trading a cheap
        # buffer-native rehash for 16 B/row less exchanged payload
        url_hash, _packed = _winner_key(t)
        b = (splitmix64(url_hash.astype(np.uint64)) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return t.append_column("__bkt", pa.array(b))

    def keep(g: pa.Table) -> pa.Table:
        uh, pk = _winner_key(g)
        order = np.lexsort((pk, uh))
        uo, po = uh[order], pk[order]
        first = np.ones(len(uo), dtype=bool)
        first[1:] = uo[1:] != uo[:-1]
        grp = np.cumsum(first) - 1
        minpk = po[np.flatnonzero(first)][grp]  # per sorted row: its url's min
        km = np.empty(len(uo), dtype=bool)
        km[order] = po == minpk
        return g.filter(pa.array(km)).drop_columns(_TAG_COLS)

    return (
        pages.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(keep, batch_format="pyarrow")
    )


def dedup_by_url(
    pages,
    merge: str = "auto",
    broadcast_threshold: int = 4_000_000,
    n_buckets: int = 64,
):
    """Exact dedup: keep the deterministic winner (min warc_ts, hash
    tie-break) per url — NO per-group Python, scale-safe by DEFAULT.

    Paths, chosen by ``merge``:

    - "shuffle": ONE hash-partition exchange of the corpus on
      url_hash; winners resolve inside each bucket vectorized (all of
      a url's rows are co-located).  NOTHING is materialized on the
      driver — correct at any url cardinality (the 10^12-doc path).
      Measured 12M pages / 11.88M distinct urls in ~14.5 s @ 32 CPUs.
    - "driver": per-batch combiner partials (<= one 16 B row per url
      per batch) stream to the driver, merge in one vectorized pass,
      and the winner array broadcasts into a task-side filter — NO
      shuffle of the payload.  Fastest; opt-in for provably bounded
      key counts only (CLAUDE.md rule 2).
    - "auto" (default): a memory-CAPPED driver probe streams the
      partials, compacting incrementally; if the distinct url count
      stays <= broadcast_threshold the broadcast filter is used, else
      the probe aborts and the plan falls back to the fully
      distributed "shuffle" path.  Driver memory is bounded by
      ~2 x threshold x 16 B regardless of corpus size.

    The earlier groupby.map_groups form made one Python call per url
    (~50 us x n_urls — 250 s at 1M urls); every path here is
    vectorized passes only.  A two-exchange alternative (distributed
    groupby-Min winner set + co-partition semi-join filter) measured
    16x SLOWER than "shuffle" at 12M urls — Ray's sort-based aggregate
    over ~n_url partial keys costs more than exchanging the payload
    once — so it was dropped.
    """
    if merge not in ("auto", "driver", "shuffle"):
        raise ValueError(f"unsupported merge={merge!r}")

    if merge == "driver":
        partials = _winner_partials(pages)
        wpd = partials.to_pandas()
        merged = wpd.groupby("url_hash", sort=True)["packed"].min()
        return _broadcast_keep_filter(
            pages, merged.index.values.astype(np.int64), merged.values.astype(np.int64)
        )

    if merge == "auto":
        # capped incremental driver merge: accumulate partial batches,
        # compact (group-min) whenever the buffer passes 2x cap; abort
        # the moment the COMPACTED distinct count exceeds the cap.
        cap = int(broadcast_threshold)
        buf: list[pa.Table] = []
        buffered = 0
        over = False

        def compact(tables: list[pa.Table]) -> pa.Table:
            whole = pa.concat_tables(tables)
            g = whole.group_by("url_hash").aggregate([("packed", "min")])
            return g.rename_columns(["url_hash", "packed"])

        for b in _winner_partials(pages).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            buf.append(b)
            buffered += b.num_rows
            if buffered > 2 * cap:
                buf = [compact(buf)]
                buffered = buf[0].num_rows
                if buffered > cap:
                    over = True
                    break
        if not over:
            merged = compact(buf) if buf else pa.table(
                {"url_hash": pa.array([], pa.int64()), "packed": pa.array([], pa.int64())}
            )
            if merged.num_rows <= cap:
                wh = merged["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
                wp = merged["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(wh, kind="stable")
                return _broadcast_keep_filter(pages, wh[order], wp[order])

    return _shuffle_dedup(pages, n_buckets)


def extract_text_from_html(pages, out_col: str = "text_extracted"):
    """html:binary → extracted text (functions/htmltext.extract_text),
    the WARC-ingest leg of the north-star chain.  Pure map (fusable,
    no shuffle); the stored ``text`` column, when present, is untouched
    so the byte-identical invariant can be asserted downstream."""
    from ..functions.htmltext import extract_text

    def fn(t: pa.Table) -> pa.Table:
        extracted = [extract_text(h or b"") for h in t["html"].to_pylist()]
        return t.append_column(out_col, pa.array(extracted, type=pa.string()))

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)


def extract_locations(pages):
    """text → exploded mention rows (url, name, lat, lon); text column
    only READ, never rewritten."""

    def fn(t: pa.Table) -> pa.Table:
        rows, names, lats, lons = _extractor().extract_arrow(t["text"])
        take = pa.array(rows)
        return pa.table(
            {
                "url": t["url"].take(take),
                "name": names,
                "lat": pa.array(lats),
                "lon": pa.array(lons),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                             batch_size=None)


def pages_zonal(pages_ds, from_html: bool = False):
    """Full chain → per-zone mention counts (the flagship shape on the
    pages schema).

    ``from_html=True`` runs the true WARC-ingest shape: the text the
    gazetteer scans is EXTRACTED from the html:binary column
    (functions/htmltext) instead of read from the stored text column —
    chain-equivalence with the stored-text path is proven in
    tests/test_htmltext.py."""
    import ray

    deduped = dedup_by_url(pages_ds)
    if from_html:
        with_ext = extract_text_from_html(deduped)

        def swap(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["text"])
            i = t.schema.get_field_index("text_extracted")
            return t.set_column(i, "text", t["text_extracted"])

        deduped = with_ext.map_batches(
            swap, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
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
