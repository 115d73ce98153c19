"""Checkpoint-resumable partitioned output with per-partition lineage.

The north rule requires "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json:14).  Layout per partition:

    {out_dir}/part={key}/data.parquet      (atomic: temp + rename)
    {out_dir}/part={key}/lineage.json      {partition, input_files,
                                            op_version, row_count,
                                            checksum, wall_sec}
    {out_dir}/part={key}/_SUCCESS

Resume = existence probe on _SUCCESS (the reference's
remote_file_exists pattern, object_store.py:334-371) → completed
partitions are skipped without reading their inputs.  ``op_version``
is part of the manifest so a changed kernel invalidates stale
partitions (SURVEY.md §7.4.6): a version mismatch forces rewrite.

Works on any local/NFS path; the same layout maps onto object storage
through ObjectStore (upload + copy_remote_file promote).
"""

from __future__ import annotations

import json
import os
import time
import zlib


def _partition_dir(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, f"part={key}")


def partition_is_complete(out_dir: str, key: str, op_version: str) -> bool:
    pdir = _partition_dir(out_dir, key)
    if not os.path.exists(os.path.join(pdir, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(pdir, "lineage.json")) as f:
            lineage = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return lineage.get("op_version") == op_version


def write_partition(
    out_dir: str,
    key: str,
    table,
    input_files: list[str],
    op_version: str,
) -> dict:
    """Atomically write one partition + lineage + _SUCCESS.

    ``table``: pyarrow Table.  Returns the lineage record.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    pdir = _partition_dir(out_dir, key)
    tmp = pdir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    data_path = os.path.join(tmp, "data.parquet")
    pq.write_table(table, data_path, compression="zstd")

    with open(data_path, "rb") as f:
        checksum = zlib.crc32(f.read())

    lineage = {
        "partition": key,
        "input_files": sorted(input_files),
        "op_version": op_version,
        "row_count": table.num_rows,
        "checksum": checksum,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=1)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")

    # atomic promote: a crashed writer leaves only .tmp dirs behind
    if os.path.exists(pdir):
        import shutil

        shutil.rmtree(pdir)
    os.replace(tmp, pdir)
    return lineage


def completed_partitions(out_dir: str, op_version: str) -> set[str]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("part=") and not name.endswith(".tmp"):
            key = name[len("part=") :]
            if partition_is_complete(out_dir, key, op_version):
                out.add(key)
    return out


def read_output(out_dir: str):
    """Read all completed partitions back as one pyarrow Table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if name.startswith("part=") and os.path.exists(os.path.join(pdir, "_SUCCESS")):
            tables.append(pq.read_table(os.path.join(pdir, "data.parquet")))
    return pa.concat_tables(tables) if tables else pa.table({})


def checkpointed_write(
    ds,
    out_dir: str,
    partition_fn,
    op_version: str,
    input_files: list[str] | None = None,
) -> dict:
    """Write a Dataset as checkpoint-resumable partitioned output.

    ``partition_fn(pa.Table) -> dict[str, pa.Table]`` splits a batch by
    partition key.  Completed partitions (matching ``op_version``) are
    skipped entirely — their input is still read (the split is
    streaming), but no bytes are rewritten; for input-pruning resume,
    filter the source by ``completed_partitions`` BEFORE building the
    Dataset.  Returns {"written": [...], "skipped": [...]}.

    Implementation: the partition split runs distributed (map_batches
    emitting (key, serialized rows)); the per-partition collect +
    atomic write runs via groupby(key).map_groups so each partition is
    written exactly once by exactly one task.
    """
    import pandas as pd
    import pyarrow as pa

    done = completed_partitions(out_dir, op_version)
    os.makedirs(out_dir, exist_ok=True)
    inputs = input_files or []

    def tag(t: pa.Table) -> pa.Table:
        parts = partition_fn(t)
        out = []
        for key, sub in parts.items():
            if key in done:
                continue
            sub = sub.append_column(
                "__part", pa.array([key] * sub.num_rows, type=pa.string())
            )
            out.append(sub)
        if not out:
            empty = t.schema.empty_table()
            return empty.append_column("__part", pa.array([], type=pa.string()))
        return pa.concat_tables(out, promote_options="permissive")

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def write_group(g: pa.Table) -> pa.Table:
        key = str(g["__part"][0].as_py())
        table = g.drop_columns(["__part"])
        lineage = write_partition(out_dir, key, table, inputs, op_version)
        return pa.table(
            {
                "partition": pa.array([key], type=pa.string()),
                "row_count": pa.array([lineage["row_count"]], type=pa.int64()),
            }
        )

    written = (
        tagged.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    ).to_pandas()
    return {
        "written": sorted(written["partition"].tolist()) if len(written) else [],
        "skipped": sorted(done),
    }
