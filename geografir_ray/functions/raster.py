"""Raster data model: RasterMetadata / RasterArray / profiles — the
reference's raster_array package re-implemented from scratch on pure
numpy (no rasterio/GDAL in the sandbox), plus the Arrow tile-table
mapping the engine streams through Ray Data (SURVEY.md §1.3).

Semantics preserved (with reference citations):
- validation rules + exact error messages
  (raster_array.py:440-461, 358-437, 331-355)
- mask derived on the fly from nodata: isnan when nodata is NaN else
  equality (raster_array.py:106-118)
- bands 1-indexed, band() always 3-D (raster_array.py:136-156)
- conform_to = reproject+resample(nearest)+clip onto the reference
  grid, then mask-merge out[ref.mask | out==nodata] = nodata
  (raster_array.py:158-220); `target_nodata or self.nodata` truthiness
  quirk (a 0 override is ignored) preserved deliberately
  (raster_array.py:188-189)
- RasterMetadata.copy merges only known keys, silently ignoring
  unknown kwargs (raster_metadata.py:156-182)
- bounds calls array_bounds with the reference's own argument order
  (raster_metadata.py:117-124 passes (width, height) into rasterio's
  (height, width) slots — bug-compatible, pinned by their tests on
  square rasters; documented here)
- GeoTIFF/COG profile dicts with the same defaults and the same
  COG-incompatible-key stripping (profiles.py:75-160)

File I/O: GeoTIFF round-trips (to_raster/from_raster,
raster_array.py:222-327) become Parquet tile-table round-trips —
``to_tile_row`` / ``from_tile_row`` with the same band-subset, dtype
cast, and nodata-rewrite semantics (including the `if target_nodata`
truthiness quirk at raster_array.py:288-292).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .crs import CRSDef, ensure_crs, transform as crs_transform

RASTER_BLOCK_SIZE = 512
RASTER_COMPRESS_Z_LEVEL = 9
NO_RESOLUTION_SPECIFIED = 0


class Resampling:
    """Resampling method ids, mirroring rasterio.enums.Resampling's
    names and values (the reference's conform_to accepts this enum,
    raster_array.py:163).  Implemented from scratch: nearest, bilinear,
    average; the remaining ids are accepted as names but raise
    NotImplementedError at use."""

    nearest = 0
    bilinear = 1
    cubic = 2
    cubic_spline = 3
    lanczos = 4
    average = 5
    mode = 6
    gauss = 7

    _BY_NAME = None  # filled below

    @classmethod
    def resolve(cls, value) -> int:
        """Accept enum int, rasterio-style member, or name string."""
        if isinstance(value, str):
            try:
                return cls._BY_NAME[value]
            except KeyError:
                raise ValueError(f"unknown resampling {value!r}") from None
        v = getattr(value, "value", value)  # rasterio enum member -> int
        return int(v)


Resampling._BY_NAME = {
    k: v
    for k, v in vars(Resampling).items()
    if not k.startswith("_") and isinstance(v, int)
}
_IMPLEMENTED_RESAMPLING = {Resampling.nearest, Resampling.bilinear, Resampling.average}


class RasterArrayShapeError(Exception):
    """Used when a RasterArray is not the correct/expected shape."""


class RasterArrayDtypeError(Exception):
    """Used when a RasterArray dtype does not match the metadata dtype."""


class RasterArrayNoDataError(Exception):
    """Used when a RasterArray nodata does not match the metadata nodata value."""


# ---------------------------------------------------------------------------
# Affine helpers (rasterio.transform equivalents; affine = (a,b,c,d,e,f):
# x = a*col + b*row + c ; y = d*col + e*row + f)
# ---------------------------------------------------------------------------


def affine_from_bounds(
    minx: float, miny: float, maxx: float, maxy: float, width: int, height: int
) -> tuple[float, float, float, float, float, float]:
    return (
        (maxx - minx) / width,
        0.0,
        minx,
        0.0,
        (miny - maxy) / height,
        maxy,
    )


def array_bounds(height: int, width: int, t) -> tuple[float, float, float, float]:
    """(left, bottom, right, top) — rasterio.transform.array_bounds."""
    a, b, c, d, e, f = t
    left, top = c, f
    right = c + a * width + b * height
    bottom = f + d * width + e * height
    return (left, bottom, right, top)


def affine_xy(t, rows: np.ndarray, cols: np.ndarray):
    """Pixel (row, col) offsets -> (x, y) coordinates."""
    a, b, c, d, e, f = t
    return a * cols + b * rows + c, d * cols + e * rows + f


def affine_rowcol_fractional(t, x: np.ndarray, y: np.ndarray):
    """(x, y) -> fractional (row, col) via the inverse affine."""
    a, b, c, d, e, f = t
    det = a * e - b * d
    inv_a, inv_b = e / det, -b / det
    inv_d, inv_e = -d / det, a / det
    xs = np.asarray(x, dtype=np.float64) - c
    ys = np.asarray(y, dtype=np.float64) - f
    col = inv_a * xs + inv_b * ys
    row = inv_d * xs + inv_e * ys
    return row, col


# ---------------------------------------------------------------------------
# Profiles (profiles.py semantics; plain dicts, compress as a string)
# ---------------------------------------------------------------------------

DEFAULT_BLOCK_SIZE = 512
DEFAULT_COMPRESS_Z_LEVEL = 9
DEFAULT_DRIVER_COG = "COG"
DEFAULT_DRIVER_GTIFF = "GTiff"
DEFAULT_INTERLEAVE = "pixel"
DEFAULT_TILED = True
DEFAULT_BIGTIFF = "YES"
DEFAULT_COMPRESSION = "deflate"

COG_PROFILE: dict[str, Any] = {
    "bigtiff": DEFAULT_BIGTIFF,
    "blocksize": DEFAULT_BLOCK_SIZE,
    "compress": DEFAULT_COMPRESSION,
    "driver": DEFAULT_DRIVER_COG,
    "level": DEFAULT_COMPRESS_Z_LEVEL,
    "overview_resampling": "nearest",
    "predictor": "standard",
}

GEOTIFF_PROFILE: dict[str, Any] = {
    "bigtiff": DEFAULT_BIGTIFF,
    "blockxsize": DEFAULT_BLOCK_SIZE,
    "blockysize": DEFAULT_BLOCK_SIZE,
    "compress": DEFAULT_COMPRESSION,
    "driver": DEFAULT_DRIVER_GTIFF,
    "interleave": "pixel",
    "tiled": DEFAULT_TILED,
    "zlevel": DEFAULT_COMPRESS_Z_LEVEL,
}


def apply_cog_profile(profile: dict) -> dict:
    """COG defaults; strips the four COG-incompatible keys
    (profiles.py:124-145, invalid list at :142)."""
    invalid_cog_keys = ["blockxsize", "blockysize", "tiled", "interleave"]
    ok = {k: v for k, v in profile.items() if k not in invalid_cog_keys}
    return {**ok, **COG_PROFILE}


def apply_geotiff_profile(profile: dict) -> dict:
    """GeoTIFF defaults merged in, defaults winning (profiles.py:148-160)."""
    return {**profile, **GEOTIFF_PROFILE}


# ---------------------------------------------------------------------------
# GDAL creation-option round trip: the Parquet tile-table writer stores
# profiles as these dicts; when a real GDAL/rasterio writer is present
# the SAME profile must translate losslessly into `-co KEY=VALUE`
# creation options (and back), so outputs written here can be converted
# to reference-identical GeoTIFF/COG files (profiles.py:81-88 defaults:
# 512x512 blocks, deflate level 9, BIGTIFF=YES, pixel interleave).
# ---------------------------------------------------------------------------

# dataset-level keys that are NOT creation options (GDAL takes them
# from the dataset/metadata, not -co)
_NON_CREATION_KEYS = frozenset(
    {"driver", "crs", "transform", "width", "height", "count", "dtype", "nodata"}
)
_CO_BOOL_KEYS = frozenset({"tiled"})  # True <-> "YES"
_CO_INT_KEYS = frozenset({"blockxsize", "blockysize", "blocksize", "zlevel", "level"})
_CO_VERBATIM_KEYS = frozenset({"bigtiff"})  # reference keeps the "YES" string


def gdal_creation_options(profile: dict) -> dict[str, str]:
    """Profile dict -> GDAL ``-co`` creation options (upper KEY=VALUE
    strings).  Dataset-level keys (driver/crs/shape/dtype/nodata) are
    excluded — GDAL takes those from the dataset itself."""
    out: dict[str, str] = {}
    for k, v in profile.items():
        if k in _NON_CREATION_KEYS:
            continue
        if isinstance(v, bool):
            v = "YES" if v else "NO"
        out[k.upper()] = str(v).upper() if isinstance(v, str) else str(v)
    return out


def profile_from_creation_options(co: dict[str, str], driver: str) -> dict:
    """Inverse of :func:`gdal_creation_options`: rebuild the profile
    dict (lower-case keys, reference value typing — ``tiled`` back to
    bool, block/level keys to int, ``bigtiff`` kept as the "YES"
    string, everything else lower-cased)."""
    out: dict[str, Any] = {"driver": driver}
    for K, v in co.items():
        k = K.lower()
        if k in _CO_BOOL_KEYS:
            out[k] = v.upper() == "YES"
        elif k in _CO_INT_KEYS:
            out[k] = int(v)
        elif k in _CO_VERBATIM_KEYS:
            out[k] = v.upper()
        else:
            out[k] = v.lower()
    return out


# ---------------------------------------------------------------------------
# Validation helpers (exact reference error strings)
# ---------------------------------------------------------------------------


def ensure_band_index(band_index) -> list[int] | None:
    """int→[int]; non-empty list[int] passes; None passes
    (raster_array.py:331-355)."""
    if band_index is None:
        return band_index
    if isinstance(band_index, int):
        return [band_index]
    if type(band_index) is list:
        if len(band_index) > 0 and all(isinstance(i, int) for i in band_index):
            return band_index
    raise TypeError("band_index must be an integer or a list of integers or None.")


def ensure_valid_nodata(nodata, dtype):
    """Validate/coerce nodata for dtype (raster_array.py:358-437,
    error strings preserved verbatim)."""
    if nodata is None:
        raise ValueError("nodata cannot be None.")

    dtype_info = (
        np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else np.finfo(dtype)
    )
    nodata_src_dtype = np.dtype(type(nodata))
    is_dtype_integer = np.issubdtype(dtype_info.dtype, np.integer)
    is_nodata_integer = np.issubdtype(nodata_src_dtype, np.integer)

    if np.isnan(nodata) and is_dtype_integer:
        raise ValueError("nodata value should be an integer for an integer dtype.")
    if is_dtype_integer and (nodata % 1 != 0):
        raise ValueError(
            f"nodata value of {str(nodata)} is not a whole number for an integer dtype."
        )
    if not np.isnan(nodata) and not dtype_info.min <= nodata <= dtype_info.max:
        raise ValueError(
            f"nodata value of {str(nodata)} is not between the min and max of dtype "
            f"{np.dtype(dtype).name}"
        )

    target_nodata = nodata
    if is_nodata_integer and not is_dtype_integer:
        target_nodata = float(target_nodata)
    if not is_nodata_integer and is_dtype_integer:
        target_nodata = int(target_nodata)
    return target_nodata


# ---------------------------------------------------------------------------
# RasterMetadata
# ---------------------------------------------------------------------------


class RasterMetadata:
    """Raster metadata container (raster_metadata.py:52-224)."""

    _FIELDS = (
        "crs",
        "count",
        "width",
        "height",
        "dtype",
        "nodata",
        "transform",
        "resolution",
    )

    def __init__(
        self,
        crs,
        count: int,
        width: int,
        height: int,
        dtype,
        nodata,
        transform,
        resolution: float = NO_RESOLUTION_SPECIFIED,
    ):
        self.crs: CRSDef = ensure_crs(crs)
        self.count = int(count)
        self.width = int(width)
        self.height = int(height)
        self.dtype = dtype
        self.nodata = nodata
        self.transform = tuple(float(v) for v in transform)
        self.resolution = resolution

    @property
    def bounds(self):
        """(left, bottom, right, top).  NOTE: reproduces the reference's
        argument order — raster_metadata.py:124 passes (width, height)
        into array_bounds' (height, width) slots; identical on square
        rasters, bug-compatible otherwise."""
        return array_bounds(self.width, self.height, self.transform)

    @property
    def profile(self) -> dict:
        """7 metadata fields + GeoTIFF defaults (raster_metadata.py:126-144)."""
        fields = ["crs", "count", "dtype", "nodata", "width", "height", "transform"]
        return apply_geotiff_profile({k: getattr(self, k) for k in fields})

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.count, self.height, self.width)

    def copy(self, **kwargs) -> "RasterMetadata":
        """Merge only known keys; silently ignore unknown kwargs
        (raster_metadata.py:156-182, filtering at 178-181)."""
        current_items = {k: getattr(self, k) for k in self._FIELDS}
        allowed = set(current_items) & set(kwargs)
        merged = {**current_items, **{k: kwargs[k] for k in allowed}}
        return RasterMetadata(**merged)

    @staticmethod
    def from_profile(profile: dict) -> "RasterMetadata":
        fields = ["crs", "count", "dtype", "nodata", "width", "height", "transform"]
        return RasterMetadata(**{k: profile[k] for k in fields})

    def __eq__(self, other):
        if not isinstance(other, RasterMetadata):
            return NotImplemented
        return all(
            (
                self.crs.equals(other.crs),
                self.count == other.count,
                self.width == other.width,
                self.height == other.height,
                np.dtype(self.dtype).name == np.dtype(other.dtype).name,
                (self.nodata == other.nodata)
                or (
                    isinstance(self.nodata, float)
                    and isinstance(other.nodata, float)
                    and np.isnan(self.nodata)
                    and np.isnan(other.nodata)
                ),
                self.transform == other.transform,
            )
        )

    def __repr__(self):
        return (
            f"RasterMetadata(crs={self.crs.name}, count={self.count}, "
            f"width={self.width}, height={self.height}, dtype={self.dtype!r}, "
            f"nodata={self.nodata}, transform={self.transform}, "
            f"resolution={self.resolution})"
        )


# ---------------------------------------------------------------------------
# RasterArray
# ---------------------------------------------------------------------------


def _validate_3d_array(array):
    if array.ndim != 3:
        raise RasterArrayShapeError(f"Array must have 3 dimensions, has {array.ndim}")


def _validate_array_shape_matches_metadata_shape(array, metadata):
    if array.shape != metadata.shape:
        raise RasterArrayShapeError(
            f"Array shape {array.shape} does not match metadata shape {metadata.shape}"
        )


def _validate_dtype_matches_metadata_dtype(array, metadata):
    if np.dtype(array.dtype).name != np.dtype(metadata.dtype).name:
        raise RasterArrayDtypeError(
            f"Array dtype {array.dtype} does not match metadata dtype {metadata.dtype}"
        )


class RasterArray:
    """A spatially aware NDArray + metadata (raster_array.py:62-327).

    Immutable-by-convention: operations return new RasterArrays; the
    mask is always derived on the fly from nodata, never stored.
    """

    def __init__(self, array: np.ndarray, metadata: RasterMetadata):
        _validate_3d_array(array)
        _validate_array_shape_matches_metadata_shape(array, metadata)
        _validate_dtype_matches_metadata_dtype(array, metadata)
        self.array = array
        self.metadata = metadata

    @property
    def mask(self) -> np.ndarray:
        """nodata mask: isnan when nodata is NaN else equality
        (raster_array.py:106-118)."""
        return (
            np.isnan(self.array)
            if np.isnan(self.metadata.nodata)
            else self.array == self.metadata.nodata
        )

    @property
    def masked(self) -> np.ma.MaskedArray:
        return np.ma.MaskedArray(
            data=self.array, mask=self.mask, fill_value=self.metadata.nodata
        )

    def band(self, band_index: int) -> np.ndarray:
        """1-indexed band slice, always 3-D (raster_array.py:136-145)."""
        return self.array[slice(band_index - 1, band_index), :, :]

    def band_masked(self, band_index: int) -> np.ma.MaskedArray:
        return self.masked[slice(band_index - 1, band_index), :, :]

    def conform_to(
        self,
        raster: "RasterArray",
        target_nodata=None,
        target_dtype=None,
        resampling=Resampling.nearest,
    ) -> "RasterArray":
        """Reproject + resample + clip onto ``raster``'s grid, then
        mask-merge (raster_array.py:158-220; ``resampling`` parameter
        raster_array.py:163).

        From-scratch warp: destination pixel centers map through the
        destination affine, dst CRS → src CRS (functions/crs.py
        kernels), and the inverse source affine into fractional source
        pixel coordinates; the resampling kernel then reads source
        pixels around that position.  Source nodata handling matches
        UNIFIED_SRC_NODATA="NO": each band treats its nodata pixels as
        invalid independently.

        Implemented kernels (rasterio.enums.Resampling ids):
        - nearest: containing source pixel (floor) — GDAL nearest.
        - bilinear: weighted average of the 4 surrounding pixel
          centers; invalid (nodata / out-of-bounds) contributors drop
          out with weight renormalization, all-invalid → nodata (GDAL
          GWKBilinear semantics).  Integer output rounds half away
          from zero.
        - average: unweighted mean of source pixels whose CENTERS fall
          inside the destination pixel's source-space footprint
          (corner-mapped bounding box), excluding nodata; an empty
          window (upsampling) falls back to the containing pixel;
          window with no valid pixel → nodata.  This is GDAL's
          pre-3.1 unweighted-average semantics (sub-pixel
          area-weighting is not reproduced — documented divergence).
        Other enum members raise NotImplementedError.

        The ``or``-defaults quirk is preserved: a falsy override (0) is
        ignored (raster_array.py:188-189).
        """
        if not isinstance(raster, RasterArray):
            raise ValueError("raster must be of type RasterArray")
        method = Resampling.resolve(resampling)
        if method not in _IMPLEMENTED_RESAMPLING:
            name = next(
                (k for k, v in Resampling._BY_NAME.items() if v == method), method
            )
            raise NotImplementedError(
                f"resampling {name!r} is not implemented (nearest, bilinear, "
                f"average are)"
            )

        nodata = target_nodata or self.metadata.nodata
        dtype = target_dtype or self.metadata.dtype
        out_meta = self.metadata.copy(
            nodata=nodata,
            dtype=dtype,
            crs=raster.metadata.crs,
            height=raster.metadata.height,
            transform=raster.metadata.transform,
            width=raster.metadata.width,
        )

        # destination pixel centers -> source fractional pixel indices
        rows, cols = np.meshgrid(
            np.arange(out_meta.height, dtype=np.float64) + 0.5,
            np.arange(out_meta.width, dtype=np.float64) + 0.5,
            indexing="ij",
        )
        dx, dy = affine_xy(out_meta.transform, rows, cols)
        if not out_meta.crs.equals(self.metadata.crs):
            sx, sy = crs_transform(dx.ravel(), dy.ravel(), out_meta.crs, self.metadata.crs)
            sx = sx.reshape(dx.shape)
            sy = sy.reshape(dy.shape)
        else:
            sx, sy = dx, dy
        srow_f, scol_f = affine_rowcol_fractional(self.metadata.transform, sx, sy)

        src_mask = self.mask  # per-band nodata (UNIFIED_SRC_NODATA="NO")
        if method == Resampling.nearest:
            out_array = self._warp_nearest(srow_f, scol_f, src_mask, out_meta)
        elif method == Resampling.bilinear:
            out_array = self._warp_bilinear(srow_f, scol_f, src_mask, out_meta)
        else:
            out_array = self._warp_average(srow_f, scol_f, src_mask, out_meta)

        out_mask = (
            np.isnan(out_array)
            if np.isnan(out_meta.nodata)
            else out_array == out_meta.nodata
        )
        merged_mask = np.logical_or(raster.mask, out_mask)
        out_array[merged_mask] = out_meta.nodata
        return RasterArray(out_array, out_meta)

    def _warp_nearest(self, srow_f, scol_f, src_mask, out_meta) -> np.ndarray:
        srow = np.floor(srow_f).astype(np.int64)
        scol = np.floor(scol_f).astype(np.int64)
        inside = (
            (srow >= 0)
            & (srow < self.metadata.height)
            & (scol >= 0)
            & (scol < self.metadata.width)
        )
        srow_c = np.clip(srow, 0, self.metadata.height - 1)
        scol_c = np.clip(scol, 0, self.metadata.width - 1)
        out_array = np.empty(out_meta.shape, dtype=out_meta.dtype)
        for b in range(out_meta.count):
            sampled = self.array[b][srow_c, scol_c]
            sampled_mask = src_mask[b][srow_c, scol_c]
            band_out = sampled.astype(out_meta.dtype, copy=True)
            band_out[~inside | sampled_mask] = out_meta.nodata
            out_array[b] = band_out
        return out_array

    def _cast_band(self, acc: np.ndarray, valid: np.ndarray, out_meta) -> np.ndarray:
        """float64 accumulator -> out dtype; integer outputs round half
        away from zero (GDAL warp int casting); invalid -> nodata."""
        if np.issubdtype(np.dtype(out_meta.dtype), np.integer):
            acc = np.where(acc >= 0, np.floor(acc + 0.5), np.ceil(acc - 0.5))
        band_out = acc.astype(out_meta.dtype)
        band_out[~valid] = out_meta.nodata
        return band_out

    def _warp_bilinear(self, srow_f, scol_f, src_mask, out_meta) -> np.ndarray:
        h, w = self.metadata.height, self.metadata.width
        # pixel-CENTER coordinates: src pixel i's center sits at i + 0.5
        y = srow_f - 0.5
        x = scol_f - 0.5
        point_inside = (srow_f >= 0) & (srow_f <= h) & (scol_f >= 0) & (scol_f <= w)
        i0 = np.floor(y).astype(np.int64)
        j0 = np.floor(x).astype(np.int64)
        fy = y - i0
        fx = x - j0
        out_array = np.empty(out_meta.shape, dtype=out_meta.dtype)
        corners = [
            (i0, j0, (1.0 - fy) * (1.0 - fx)),
            (i0, j0 + 1, (1.0 - fy) * fx),
            (i0 + 1, j0, fy * (1.0 - fx)),
            (i0 + 1, j0 + 1, fy * fx),
        ]
        for b in range(out_meta.count):
            acc = np.zeros(srow_f.shape, dtype=np.float64)
            wsum = np.zeros(srow_f.shape, dtype=np.float64)
            for ci, cj, cw in corners:
                nb_in = (ci >= 0) & (ci < h) & (cj >= 0) & (cj < w)
                ic = np.clip(ci, 0, h - 1)
                jc = np.clip(cj, 0, w - 1)
                ok = nb_in & ~src_mask[b][ic, jc]
                wv = np.where(ok, cw, 0.0)
                acc += wv * self.array[b][ic, jc].astype(np.float64)
                wsum += wv
            valid = point_inside & (wsum > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                acc = np.where(valid, acc / np.where(wsum > 0, wsum, 1.0), 0.0)
            out_array[b] = self._cast_band(acc, valid, out_meta)
        return out_array

    def _warp_average(self, srow_f, scol_f, src_mask, out_meta) -> np.ndarray:
        h, w = self.metadata.height, self.metadata.width
        # corner-mapped footprint: map dst pixel CORNERS through the
        # same dst->src chain; the window bbox is min/max of the 4
        # corners (exact for affine mappings, bounding for warped ones)
        rows_c, cols_c = np.meshgrid(
            np.arange(out_meta.height + 1, dtype=np.float64),
            np.arange(out_meta.width + 1, dtype=np.float64),
            indexing="ij",
        )
        cx, cy = affine_xy(out_meta.transform, rows_c, cols_c)
        if not out_meta.crs.equals(self.metadata.crs):
            tx, ty = crs_transform(
                cx.ravel(), cy.ravel(), out_meta.crs, self.metadata.crs
            )
            cx = tx.reshape(cx.shape)
            cy = ty.reshape(cy.shape)
        cr, cc = affine_rowcol_fractional(self.metadata.transform, cx, cy)
        # per dst pixel: bbox over its 4 corners
        r_corners = np.stack([cr[:-1, :-1], cr[:-1, 1:], cr[1:, :-1], cr[1:, 1:]])
        c_corners = np.stack([cc[:-1, :-1], cc[:-1, 1:], cc[1:, :-1], cc[1:, 1:]])
        r0, r1 = r_corners.min(axis=0), r_corners.max(axis=0)
        c0, c1 = c_corners.min(axis=0), c_corners.max(axis=0)
        # src pixel centers (i + 0.5) inside [r0, r1): i in [ceil(r0-.5), ceil(r1-.5)-1]
        ri0 = np.ceil(r0 - 0.5).astype(np.int64)
        ri1 = np.ceil(r1 - 0.5).astype(np.int64) - 1
        cj0 = np.ceil(c0 - 0.5).astype(np.int64)
        cj1 = np.ceil(c1 - 0.5).astype(np.int64) - 1
        empty_win = (ri1 < ri0) | (cj1 < cj0)
        # a window entirely outside the source doesn't clip onto the
        # boundary pixel — it's empty (falls back to nearest -> nodata)
        no_overlap = (ri0 > h - 1) | (ri1 < 0) | (cj0 > w - 1) | (cj1 < 0)
        ri0c = np.clip(ri0, 0, h - 1)
        ri1c = np.clip(ri1, 0, h - 1)
        cj0c = np.clip(cj0, 0, w - 1)
        cj1c = np.clip(cj1, 0, w - 1)
        clipped_empty = empty_win | no_overlap

        out_array = np.empty(out_meta.shape, dtype=out_meta.dtype)
        nearest = None  # lazy fallback for empty windows
        for b in range(out_meta.count):
            vals = self.array[b].astype(np.float64)
            valid_px = ~src_mask[b]
            # 2-D prefix sums (integral images) for O(1) window sums
            S = np.zeros((h + 1, w + 1), dtype=np.float64)
            C = np.zeros((h + 1, w + 1), dtype=np.float64)
            S[1:, 1:] = np.cumsum(np.cumsum(np.where(valid_px, vals, 0.0), 0), 1)
            C[1:, 1:] = np.cumsum(np.cumsum(valid_px.astype(np.float64), 0), 1)

            def win(M):
                return (
                    M[ri1c + 1, cj1c + 1]
                    - M[ri0c, cj1c + 1]
                    - M[ri1c + 1, cj0c]
                    + M[ri0c, cj0c]
                )

            s = win(S)
            c = win(C)
            use_window = ~(empty_win | clipped_empty) & (c > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                acc = np.where(use_window, s / np.where(c > 0, c, 1.0), 0.0)
            valid = use_window
            # empty window (upsampling): containing pixel, nearest rules
            fb = (empty_win | clipped_empty)
            if fb.any():
                if nearest is None:
                    nearest = self._warp_nearest(srow_f, scol_f, src_mask, out_meta)
                nb = nearest[b]
                nb_mask = (
                    np.isnan(nb)
                    if np.isnan(out_meta.nodata)
                    else nb == out_meta.nodata
                )
                acc = np.where(fb, nb.astype(np.float64), acc)
                valid = valid | (fb & ~nb_mask)
            out_array[b] = self._cast_band(acc, valid, out_meta)
        return out_array

    # --- REAL GeoTIFF binary I/O (pure-Python codec; reference
    # to_raster/from_raster write/read GeoTIFF via rasterio,
    # raster_array.py:222-327 — here via functions/geotiff.py) --------

    def to_geotiff(self, profile: dict | None = None) -> bytes:
        """GeoTIFF bytes with the metadata profile's writer settings
        (512x512 tiles, deflate 9, BIGTIFF=YES, pixel interleave by
        default — profiles.py:81-88 parity)."""
        from .geotiff import raster_to_geotiff

        return raster_to_geotiff(self, profile)

    @staticmethod
    def from_geotiff(
        data: bytes,
        band_index=None,
        target_nodata=None,
        target_dtype=None,
    ) -> "RasterArray":
        """Decode GeoTIFF bytes, then apply from_raster's band-subset /
        cast / nodata-rewrite semantics (raster_array.py:277-327,
        truthiness quirks preserved via from_tile_row)."""
        from .geotiff import decode_geotiff

        arr, info = decode_geotiff(data)
        row = {
            "crs": int(info["epsg"]),
            "count": arr.shape[0],
            "width": arr.shape[2],
            "height": arr.shape[1],
            "dtype": arr.dtype.name,
            "nodata": info["nodata"] if info["nodata"] is not None else 0,
            "transform": list(info["transform"]),
            "data": arr.ravel(),
        }
        return RasterArray.from_tile_row(
            row,
            band_index=band_index,
            target_nodata=target_nodata,
            target_dtype=target_dtype,
        )

    # --- tile-table mapping (Parquet tile tables for the columnar
    # pipelines; to_geotiff/from_geotiff above is the binary path) ----

    def to_tile_row(self, tile_id: int) -> dict:
        """One Arrow-ready tile-table row (SURVEY.md §1.3 schema)."""
        m = self.metadata
        return {
            "tile_id": int(tile_id),
            "data": self.array.ravel().tolist(),
            "crs": m.crs.epsg,
            "count": m.count,
            "width": m.width,
            "height": m.height,
            "dtype": np.dtype(m.dtype).name,
            "nodata": float(m.nodata),
            "transform": list(m.transform),
            "resolution": float(m.resolution),
        }

    @staticmethod
    def from_tile_row(
        row: dict,
        band_index=None,
        target_nodata=None,
        target_dtype=None,
    ) -> "RasterArray":
        """Rebuild from a tile-table row with from_raster's band-subset /
        cast / nodata-rewrite semantics (raster_array.py:277-327,
        truthiness quirks preserved: `if target_nodata` and
        `if band_index` at :288-292, :299)."""
        src_dtype = np.dtype(row["dtype"])
        src_nodata = row["nodata"]
        src_meta = RasterMetadata(
            crs=int(row["crs"]),
            count=int(row["count"]),
            width=int(row["width"]),
            height=int(row["height"]),
            dtype=src_dtype,
            nodata=src_nodata,
            transform=row["transform"],
            resolution=row.get("resolution", NO_RESOLUTION_SPECIFIED),
        )
        out_dtype = target_dtype if target_dtype else src_meta.dtype
        out_nodata = (
            ensure_valid_nodata(target_nodata, out_dtype)
            if target_nodata
            else src_meta.nodata
        )
        full = np.asarray(row["data"], dtype=src_dtype).reshape(src_meta.shape)
        indexes = ensure_band_index(band_index)
        if band_index:
            data = full[[i - 1 for i in indexes]].astype(out_dtype)
            n_bands = len(indexes)
        else:
            data = full.astype(out_dtype)
            n_bands = src_meta.count

        replacement_mask = (
            np.isnan(data) if np.isnan(src_meta.nodata) else data == src_meta.nodata
        )
        data[replacement_mask] = out_nodata

        metadata = src_meta.copy(
            count=n_bands,
            nodata=out_nodata,
            dtype=out_dtype,
        )
        return RasterArray(data, metadata)
