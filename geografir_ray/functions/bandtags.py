"""BandTags — immutable per-band string-tag metadata
(/root/reference/raster_array/src/raster_array/band_tags.py:60-377
re-implemented; GeoTIFF tag I/O becomes Parquet key-value metadata).

Semantics preserved:
- keys are 1-based positive int band indices (band_tags.py:86, 381-385)
- deep copy on init → immutability (band_tags.py:103-107)
- tags_by_band reverse index: tag name → {tag value → band index},
  LAST band wins on duplicate values (band_tags.py:129-172, :170)
- tag_names = union of tag keys (band_tags.py:174-209)
- get_band_tags returns a copy, {} for unknown bands (band_tags.py:212-236)
- update_band_tags returns a NEW merged instance (band_tags.py:238-284)
"""

from __future__ import annotations

import copy
import json


class BandTags:
    def __init__(self, tags: dict[int, dict[str, str]]):
        for band_index in tags:
            if not isinstance(band_index, int) or band_index < 1:
                raise ValueError(
                    f"Band index {band_index} is not a positive integer."
                )
        self._tags = copy.deepcopy(tags)

    @property
    def tags(self) -> dict[int, dict[str, str]]:
        return copy.deepcopy(self._tags)

    @property
    def band_indices(self) -> set[int]:
        return set(self._tags.keys())

    @property
    def tags_by_band(self) -> dict[str, dict[str, int]]:
        """name -> {value -> band}; last band wins on duplicate values
        (band_tags.py:165-172)."""
        out: dict[str, dict[str, int]] = {}
        for band_index, band_tags in self._tags.items():
            for name, value in band_tags.items():
                out.setdefault(name, {})[value] = band_index
        return out

    @property
    def tag_names(self) -> set[str]:
        names: set[str] = set()
        for band_tags in self._tags.values():
            names.update(band_tags.keys())
        return names

    def get_band_tags(self, band_index: int) -> dict[str, str]:
        return copy.deepcopy(self._tags.get(band_index, {}))

    def update_band_tags(self, band_index: int, tags: dict[str, str]) -> "BandTags":
        """Immutable merge (band_tags.py:238-284)."""
        merged = self.tags
        merged[band_index] = {**merged.get(band_index, {}), **tags}
        return BandTags(merged)

    # --- Parquet key-value metadata mapping (write_tags/from_raster
    # equivalents, band_tags.py:286-377: GeoTIFF per-band update_tags
    # becomes a JSON blob in the table's key-value metadata) ----------

    KV_KEY = b"geografir_ray.band_tags"

    def to_kv_metadata(self) -> dict[bytes, bytes]:
        return {self.KV_KEY: json.dumps({str(k): v for k, v in self._tags.items()}).encode()}

    @staticmethod
    def from_kv_metadata(meta: dict[bytes, bytes] | None) -> "BandTags":
        if not meta or BandTags.KV_KEY not in meta:
            return BandTags({})
        raw = json.loads(meta[BandTags.KV_KEY].decode())
        return BandTags({int(k): dict(v) for k, v in raw.items()})

    def __eq__(self, other):
        if not isinstance(other, BandTags):
            return NotImplemented
        return self._tags == other._tags

    def __repr__(self):
        return f"BandTags(tags={self._tags!r})"
