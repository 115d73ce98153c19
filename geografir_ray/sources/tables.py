"""Column-pruned parquet readers for the driver testdata layout.

Always pass ``columns`` — a read that loads all columns for a
2-column transform ships bytes that never get used (the ``html``-class
mistake called out in the build brief).
"""

from __future__ import annotations

import os

import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """read_parquet with column pruning; kwargs pass through (filter=...)."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)


def read_table_local(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side pyarrow read for SMALL dimension tables.

    Spinning a Ray Dataset execution per dimension table costs ~0.5-1 s
    of fixed overhead each; dimension prep is metadata-scale work that
    belongs on the driver (the result is broadcast via ray.put anyway).
    Returns a pandas DataFrame.
    """
    import pyarrow.parquet as pq

    return pq.read_table(table_path(sf_dir, name), columns=columns).to_pandas()
