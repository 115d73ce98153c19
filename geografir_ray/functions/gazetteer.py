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
    """Per-worker matcher state: hash-sorted gazetteer arrays (+ a dict
    for the legacy scalar path).

    Matching = exact token equality over the shared tokenization
    contract (functions/text.py).  Build once per actor/worker; match
    per batch.  Output: exploded (row mention) pairs.

    The hot path is :meth:`extract_arrow` — fully vectorized over the
    Arrow string buffers (flat_tokens → (first-byte, length) LUT prefilter →
    buffer-native FNV-1a →
    searchsorted membership against the sorted gazetteer-hash set →
    exact Arrow string verify on the few hits), zero per-token Python.
    Bit-identical to the scalar :meth:`extract` (parity-tested).
    """

    def __init__(self):
        import pyarrow as pa

        from .text import token_hashes_arrow

        g = gazetteer_table()
        self.index = {
            str(n): (float(la), float(lo), int(r))
            for n, la, lo, r in zip(g["name"], g["lat"], g["lon"], g["rank"])
        }
        names_arr = pa.array([str(n) for n in g["name"]], type=pa.string())
        # FNV-1a (buffer-native): ~3.5x cheaper per token than SipHash
        # on short tokens, and membership is collision-guarded by the
        # exact string verify below, so the weaker hash costs nothing
        h = token_hashes_arrow(names_arr).astype(np.uint64)
        order = np.argsort(h, kind="stable")
        self._gh = h[order]
        self._gnames = names_arr.take(pa.array(order, type=pa.int64()))
        self._glat = np.asarray(g["lat"], dtype=np.float64)[order]
        self._glon = np.asarray(g["lon"], dtype=np.float64)[order]
        # searchsorted lookup is exact only if gazetteer hashes are
        # distinct (536 names; a hash collision here would be built
        # into the index, so assert once at construction)
        if len(np.unique(self._gh)) != len(self._gh):  # pragma: no cover
            raise AssertionError("gazetteer hash collision")
        # (first_byte, byte_length) candidate LUT: only tokens whose
        # leading byte AND length match some gazetteer name get hashed
        # — on the pages corpus this passes ~25% of tokens, cutting
        # the hashing (the dominant cost) proportionally
        self._maxlen = max(len(str(n).encode()) for n in g["name"])
        self._lut = np.zeros((256, self._maxlen + 2), dtype=bool)
        for n in g["name"]:
            b = str(n).encode()
            self._lut[b[0], len(b)] = True

    def extract_arrow(self, col):
        """Vectorized mention scan over an Arrow string column.

        Returns ``(row_index, names, lat, lon)`` where ``names`` is a
        pyarrow StringArray; rows/doc-major token order preserved —
        identical tuples to :meth:`extract` on the same texts.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        from .text import flat_tokens, token_hashes_arrow

        empty = (
            np.empty(0, dtype=np.int64),
            pa.array([], type=pa.string()),
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.float64),
        )
        flat, docidx, _counts = flat_tokens(col)
        if len(flat) == 0:
            return empty
        # byte-level prefilter straight off the Arrow buffers — no
        # hashing for tokens that cannot possibly match
        from .hashing import _str_buffers

        starts, lens, data = _str_buffers(flat)
        b0 = np.zeros(len(lens), dtype=np.uint8)
        nz = lens > 0
        b0[nz] = data[starts[nz]]
        cand = np.flatnonzero(
            self._lut[b0, np.minimum(lens, self._maxlen + 1)]
        ).astype(np.int64)
        if len(cand) == 0:
            return empty
        flat_c = flat.take(pa.array(cand, type=pa.int64()))
        th = token_hashes_arrow(flat_c).astype(np.uint64)
        pos = np.searchsorted(self._gh, th).astype(np.int64)
        pos = np.minimum(pos, len(self._gh) - 1)
        hit_c = np.flatnonzero(self._gh[pos] == th)
        if len(hit_c) == 0:
            return empty
        hit = cand[hit_c]
        gpos = pos[hit_c]
        cand_tokens = flat_c.take(pa.array(hit_c, type=pa.int64()))
        cand_names = self._gnames.take(pa.array(gpos, type=pa.int64()))
        # exact-string verify on the hits (collision guard; hits are
        # rare so this comparison is tiny)
        ok = pc.equal(cand_tokens, cand_names).to_numpy(zero_copy_only=False).astype(bool)
        if not ok.all():
            hit, gpos = hit[ok], gpos[ok]
            cand_tokens = cand_tokens.filter(pa.array(ok))
        return (docidx[hit], cand_tokens, self._glat[gpos], self._glon[gpos])

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
