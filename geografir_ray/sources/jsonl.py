"""JSONL (newline-delimited JSON) ingest — the wire format web-text
corpora actually ship in (Common-Crawl derivative dumps, OpenWebText
shards, most labeling-pipeline exports), as opposed to the Parquet the
engine uses internally.

Reader: :func:`read_jsonl` is a thin wrapper over
``ray.data.read_json`` (pyarrow's NDJSON reader — streaming,
block-per-file-chunk, zero Python-per-row) plus an explicit
column-projection step, because the JSON reader has no Parquet-style
``columns=`` pushdown: projection happens in the first map_batches so
at most one block of the full width is ever resident per task.

Writer: :func:`write_jsonl_shards` materializes a deterministic JSONL
copy of a table for tests/benches (sorted by the key column, sharded
by ``key % n_shards``), so round-trip fidelity is checkable against
the Parquet original byte-for-byte.

100 TB story: files are the parallelism unit (one read task per file
chunk); everything downstream is the same Dataset pipeline the Parquet
path feeds — sources are interchangeable at the plan level.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def read_jsonl(path: str, columns: list[str] | None = None):
    """Dataset over a JSONL file or directory of *.jsonl shards.

    ``columns`` projects immediately after the read (the NDJSON format
    has no column pruning at the byte level — projection right after
    parse is the best available, and keeps every downstream exchange
    at the projected width)."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns is not None:
        cols = list(columns)
        ds = ds.map_batches(
            lambda t: t.select(cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


def write_jsonl_shards(
    table: pa.Table, out_dir: str, key: str = "doc_id", n_shards: int = 4
) -> list[str]:
    """Deterministic JSONL materialization of an Arrow table: rows
    sorted by ``key``, shard = key % n_shards, standard ``json.dumps``
    with sorted keys and no ASCII escaping (UTF-8 text survives
    byte-identically through parse).  Returns the shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    t = table.sort_by(key)
    keys = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    cols = {name: t[name].to_pylist() for name in t.schema.names}
    names = t.schema.names
    paths = []
    shard = (keys % n_shards).astype(np.int64)
    for s in range(n_shards):
        p = os.path.join(out_dir, f"part-{s:04d}.jsonl")
        rows = np.flatnonzero(shard == s)
        with open(p, "w", encoding="utf-8") as f:
            for i in rows:
                f.write(
                    json.dumps(
                        {n: cols[n][i] for n in names},
                        ensure_ascii=False,
                        sort_keys=True,
                    )
                )
                f.write("\n")
        paths.append(p)
    return paths
