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
