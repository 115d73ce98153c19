"""Deterministic in-repo gazetteer (FIXTURES.md §2) + tokenizing
location matcher — the "location extraction" operator of the north
star (BASELINE.json:6: "geocode each web page's extracted locations").

The gazetteer is a pure function of its index (no external data):
512 synthetic place names ``place_{k}`` plus 24 real-looking anchors,
coordinates drawn from the same hot-center scheme as synthgeo so the
extracted-location distribution is zipf-skewed over urban cells.

For oracle-ability, entries are ALSO expressible as a SQL VALUES list
(gazetteer_sql_values) and matching is exact token equality on the
shared tokenization contract — so extraction+geocode pipelines get
op-for-op DuckDB twins.
"""

from __future__ import annotations

import numpy as np

from .synthgeo import synth_lat, synth_lon

# 24 real-looking anchors; names chosen to overlap the documents
# table's synthetic vocabulary nowhere, plus a handful of data-ish
# words that DO overlap so sf testdata produces matches.
ANCHOR_NAMES = [
    "springfield", "rivertown", "lakeside", "hillview", "oakdale",
    "maplewood", "cedarburg", "pinecrest", "elmhurst", "ashford",
    "sycamore", "willowbrook", "fairview", "brookfield", "glenwood",
    "kingsport", "queensbury", "easton", "weston", "northfield",
    # overlap with the documents vocabulary (so testdata matches):
    "spark", "table", "window", "merge",
]

N_SYNTHETIC = 512
GAZETTEER_KEY_OFFSET = 10_000  # gazetteer rank k -> synthgeo key k+offset


def gazetteer_names() -> list[str]:
    return [f"place_{k}" for k in range(N_SYNTHETIC)] + ANCHOR_NAMES


def gazetteer_table() -> dict[str, np.ndarray]:
    """name / lat / lon / rank arrays (rank = zipf popularity index)."""
    names = gazetteer_names()
    keys = np.arange(len(names), dtype=np.int64) + GAZETTEER_KEY_OFFSET
    return {
        "name": np.array(names, dtype=object),
        "lat": synth_lat(keys),
        "lon": synth_lon(keys),
        "rank": np.arange(len(names), dtype=np.int64),
    }


def gazetteer_sql_values() -> str:
    """The ANCHOR subset as a SQL VALUES relation (name, lat, lon, rank).

    Only anchors can match the driver testdata (its vocabulary has no
    ``place_k`` tokens), so the oracle needs only this subset; lat/lon
    reuse the synthgeo SQL twins keyed by rank + offset.
    """
    from .synthgeo import synth_lat_sql, synth_lon_sql

    rows = []
    for i, name in enumerate(ANCHOR_NAMES):
        rank = N_SYNTHETIC + i
        # BIGINT cast: a bare int literal is INT32 in DuckDB and the
        # mixing multiply overflows it
        key = f"CAST({GAZETTEER_KEY_OFFSET + rank} AS BIGINT)"
        rows.append(
            f"('{name}', {synth_lat_sql(key)}, {synth_lon_sql(key)}, {rank})"
        )
    return "(VALUES " + ", ".join(rows) + ") AS gaz(name, lat, lon, rank)"


class LocationExtractor:
    """Per-worker matcher state: dict name -> (lat, lon, rank).

    Matching = exact token equality over the shared tokenization
    contract (functions/text.py).  Build once per actor/worker; match
    per batch.  Output: exploded (row mention) pairs.
    """

    def __init__(self):
        g = gazetteer_table()
        self.index = {
            str(n): (float(la), float(lo), int(r))
            for n, la, lo, r in zip(g["name"], g["lat"], g["lon"], g["rank"])
        }

    def extract(self, texts) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray]:
        """Returns (row_index, name, lat, lon) for every mention,
        including repeated mentions of the same place in one doc."""
        rows: list[int] = []
        names: list[str] = []
        lats: list[float] = []
        lons: list[float] = []
        idx = self.index
        for i, t in enumerate(texts):
            if not t:
                continue
            for w in t.split(" "):
                hit = idx.get(w)
                if hit is not None:
                    rows.append(i)
                    names.append(w)
                    lats.append(hit[0])
                    lons.append(hit[1])
        return (
            np.asarray(rows, dtype=np.int64),
            names,
            np.asarray(lats, dtype=np.float64),
            np.asarray(lons, dtype=np.float64),
        )
