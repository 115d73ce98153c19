"""Config-driven pipeline runner: ordered named stages → Ray Data plan.

User-extension surface (SURVEY.md §2.2 "user extensions"): every stage
is ``(pa.Table) -> pa.Table``; a pipeline is an ordered list of named
stage specs in a plain config (pydantic-validated when available).
Custom stages register via :func:`register_stage`.

Also provides per-stage metrics from Ray Data stats (rows/s per stage,
the "metrics" half of the north rule's lineage+metrics requirement).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Callable]] = {}


def register_stage(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def stage_names() -> list[str]:
    return sorted(_REGISTRY)


# --- built-in stages -----------------------------------------------------


@register_stage("derive_points")
def _derive_points(key_col: str):
    from ..stages.geo import add_latlon

    return add_latlon(key_col)


@register_stage("assign_cells")
def _assign_cells(geohash_precision: int = 9, s2_level: int = 12, hex_resolution: int = 7):
    from ..stages.geo import add_cells

    return add_cells(geohash_precision, s2_level, hex_resolution)


@register_stage("assign_tiles")
def _assign_tiles(tile_deg: float = 1.0):
    from ..stages.geo import add_tile

    return add_tile(tile_deg)


@register_stage("web_mercator")
def _web_mercator():
    from ..stages.geo import web_mercator

    return web_mercator()


@register_stage("filter_expr")
def _filter_expr(column: str, op: str, value: Any):
    import pyarrow as pa
    import pyarrow.compute as pc

    ops = {
        "==": pc.equal,
        "!=": pc.not_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }
    fn_op = ops[op]

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(fn_op(t[column], pa.scalar(value)))

    fn.__name__ = f"filter[{column}{op}{value}]"
    return fn


@register_stage("select")
def _select(columns: list[str]):
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        return t.select(columns)

    fn.__name__ = f"select[{','.join(columns)}]"
    return fn


@register_stage("hash_sample")
def _hash_sample(key_col: str, pct: int = 5):
    """Deterministic hash sampling (same LCG as docs_sample)."""
    import numpy as np
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        return t.filter(pa.array(h % 100 < pct))

    fn.__name__ = f"hash_sample[{key_col},{pct}%]"
    return fn


@register_stage("stratified_sample")
def _stratified_sample(
    key_col: str, stratum_col: str, major: str, major_pct: int = 5, minor_pct: int = 20
):
    """Per-stratum hash sampling (corpus rebalancing; documents.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761 + 1013904223) % 4294967296
        is_major = pc.equal(t[stratum_col], major).to_numpy(zero_copy_only=False)
        rate = np.where(is_major, major_pct, minor_pct)
        return t.filter(pa.array(h % 100 < rate))

    fn.__name__ = f"stratified_sample[{stratum_col}]"
    return fn


@register_stage("token_stats")
def _token_stats(text_col: str = "text"):
    """Append n_tokens / distinct_pct / stopword_pct (functions/text)."""
    import numpy as np
    import pyarrow as pa

    from ..functions import text as T

    def fn(t: pa.Table) -> pa.Table:
        q = T.quality_stats_arrow(t[text_col])
        t = t.append_column("n_tokens", pa.array(q["n_tokens"]))
        t = t.append_column(
            "distinct_pct",
            pa.array(np.floor(q["distinct_ratio"] * 100.0).astype(np.int64)),
        )
        return t.append_column(
            "stopword_pct",
            pa.array(np.floor(q["stopword_ratio"] * 100.0).astype(np.int64)),
        )

    fn.__name__ = f"token_stats[{text_col}]"
    return fn


@register_stage("langid")
def _langid(text_col: str = "text"):
    """Append the n-gram-marker language prediction (functions/text)."""
    import pyarrow as pa

    from ..functions import text as T

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column("lang_pred", pa.array(T.langid_arrow(t[text_col])))

    fn.__name__ = f"langid[{text_col}]"
    return fn


@register_stage("content_hash")
def _content_hash(text_col: str = "text", out_col: str = "text_hash"):
    """Append the 64-bit content hash (dedup key; functions/hashing)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_strings

    def fn(t: pa.Table) -> pa.Table:
        h = hash_strings(t[text_col])
        return t.append_column(
            out_col, pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))
        )

    fn.__name__ = f"content_hash[{text_col}]"
    return fn


@register_stage("normalize_text")
def _normalize_text(text_col: str = "text", out_col: str = "norm_text"):
    """Lowercase + collapse whitespace runs + trim (vectorized Arrow
    kernels; the training-data normalize pass of docs_normalize_text)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t[text_col])
        x = pc.replace_substring_regex(x, r"\s+", " ")
        return t.append_column(out_col, pc.utf8_trim_whitespace(x))

    fn.__name__ = f"normalize_text[{text_col}]"
    return fn


@register_stage("regex_replace")
def _regex_replace(pattern: str, replacement: str, text_col: str = "text",
                   out_col: str | None = None):
    """Vectorized RE2 replace over a string column (in place unless
    out_col names a new column)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        x = pc.replace_substring_regex(t[text_col], pattern, replacement)
        dest = out_col or text_col
        if dest in t.column_names:
            return t.set_column(t.schema.get_field_index(dest), dest, x)
        return t.append_column(dest, x)

    fn.__name__ = f"regex_replace[{text_col}]"
    return fn


@register_stage("regex_extract")
def _regex_extract(pattern: str, group: str, text_col: str = "text",
                   out_col: str = "extracted"):
    """First-match RE2 extract of a NAMED capture group into a new
    column (null where no match)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        x = pc.struct_field(pc.extract_regex(t[text_col], pattern), group)
        return t.append_column(out_col, x)

    fn.__name__ = f"regex_extract[{text_col}]"
    return fn


@register_stage("pii_redact")
def _pii_redact(text_col: str = "text", out_col: str = "clean_text"):
    """Scrub emails / +D-DDD-DDDD phones / IPv4s with the vectorized
    RE2 kernels of docs_pii_redact; appends <out_col> + n_pii."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .documents import _PII_EMAIL_RE, _PII_IP_RE, _PII_PHONE_RE

    def fn(t: pa.Table) -> pa.Table:
        src = t[text_col]
        n = pc.add(
            pc.add(
                pc.count_substring_regex(src, _PII_EMAIL_RE),
                pc.count_substring_regex(src, _PII_PHONE_RE),
            ),
            pc.count_substring_regex(src, _PII_IP_RE),
        )
        x = pc.replace_substring_regex(src, _PII_EMAIL_RE, "<EMAIL>")
        x = pc.replace_substring_regex(x, _PII_PHONE_RE, "<PHONE>")
        x = pc.replace_substring_regex(x, _PII_IP_RE, "<IP>")
        t = t.append_column(out_col, x)
        return t.append_column("n_pii", pc.cast(n, pa.int64()))

    fn.__name__ = f"pii_redact[{text_col}]"
    return fn


@register_stage("decontaminate")
def _decontaminate(snippets: list, text_col: str = "text"):
    """Benchmark-decontamination scan: flag docs containing any of the
    given eval snippets (list rides the task closure — broadcast state,
    CLAUDE.md rule 3).  Appends n_hits + contaminated."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for s in snippets:
            hits += pc.cast(
                pc.match_substring(t[text_col], s), pa.int64()
            ).to_numpy(zero_copy_only=False)
        t = t.append_column("n_hits", pa.array(hits))
        return t.append_column("contaminated", pa.array(hits > 0))

    fn.__name__ = f"decontaminate[{len(snippets)}]"
    return fn


# --- config model --------------------------------------------------------

try:  # pydantic v2 preferred; plain dataclass fallback
    from pydantic import BaseModel

    class StageSpec(BaseModel):
        name: str
        stage: str
        params: dict[str, Any] = {}

    class PipelineConfig(BaseModel):
        table: str
        columns: list[str] | None = None
        stages: list[StageSpec]

    _HAVE_PYDANTIC = True
except ImportError:  # pragma: no cover

    @dataclass
    class StageSpec:  # type: ignore[no-redef]
        name: str
        stage: str
        params: dict = field(default_factory=dict)

    @dataclass
    class PipelineConfig:  # type: ignore[no-redef]
        table: str
        columns: list | None
        stages: list

    _HAVE_PYDANTIC = False


def build(config: PipelineConfig | dict, sf_dir: str):
    """Config → lazy Dataset (no execution)."""
    if isinstance(config, dict):
        config = PipelineConfig(**config)
    from ..sources.tables import read_table

    ds = read_table(sf_dir, config.table, columns=config.columns)
    for spec in config.stages:
        if spec.stage not in _REGISTRY:
            raise KeyError(
                f"unknown stage '{spec.stage}'; registered: {stage_names()}"
            )
        fn = _REGISTRY[spec.stage](**spec.params)
        ds = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def run(config: PipelineConfig | dict, sf_dir: str) -> dict:
    """Execute and return {rows, wall_sec, rows_per_sec, stage_stats}."""
    ds = build(config, sf_dir)
    t0 = time.perf_counter()
    n = ds.count()
    wall = time.perf_counter() - t0
    stats = ds.stats()
    stage_stats = {}
    for m in re.finditer(r"Operator \d+ (\S+?):.*?\n", stats or ""):
        stage_stats[m.group(1)] = True
    return {
        "rows": n,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n / wall) if wall > 0 else None,
        "stats_excerpt": (stats or "")[:2000],
    }
