"""CSV / JSONL sources and the partitioned-parquet sink.

The engine's canonical interchange format is Parquet (sources/tables),
but ingestion pipelines routinely start from delimited or JSON-lines
drops.  These wrappers keep the two properties the parquet readers
guarantee:

- **Column pruning at the read** — Ray's CSV reader prunes via Arrow's
  ``ConvertOptions.include_columns`` (pushed into the scan, not a
  post-select); JSONL prunes with a fused projection immediately after
  parse (Arrow's JSON reader has no projection pushdown, so the select
  runs before anything else ships between operators).
- **Schema stability** — an explicit Arrow schema (or column subset)
  makes every block agree, so downstream groupbys never see drifting
  block schemas (CLAUDE.md rule 8).

``write_partitioned`` is the resumable sink convention from
state/checkpoint.py re-exported for pipelines: one directory per
partition-column value, never one giant file.
"""

from __future__ import annotations

import ray.data


def read_csv_table(
    path: str,
    columns: list[str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """read_csv with column pruning pushed into the Arrow scan."""
    if columns is not None:
        from pyarrow import csv as pacsv

        kwargs.setdefault(
            "convert_options", pacsv.ConvertOptions(include_columns=columns)
        )
    return ray.data.read_csv(path, **kwargs)


def read_jsonl_table(
    path: str,
    columns: list[str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """read_json (JSON-lines) with an immediate fused projection."""
    ds = ray.data.read_json(path, **kwargs)
    if columns is not None:
        cols = list(columns)
        ds = ds.map_batches(
            lambda t: t.select(cols), batch_format="pyarrow", zero_copy_batch=True
        )
    return ds


def write_partitioned(ds, out_dir: str, partition_cols: list[str], **kwargs) -> None:
    """Partitioned parquet sink: one directory per partition value —
    the resumable layout (a re-run can skip finished partitions; see
    state/checkpoint.py for the lineage/_SUCCESS protocol on top)."""
    ds.write_parquet(out_dir, partition_cols=list(partition_cols), **kwargs)
