"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in geografir_ray library
code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (read → geocode →
    broadcast PIP join → two-phase zonal aggregate)."""
    from geografir_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geografir_ray.pipelines import relational as R
    from geografir_ray.pipelines import spatial as S

    return {
        # relational core (groupby / join / sort / set ops)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_top_orders": R.q3_top_orders,
        "q5_nation_revenue": R.q5_nation_revenue,
        "brand_revenue": R.brand_revenue,
        "set_ops_orders": R.set_ops_orders,
        # spatial
        "geo_tile_assign": S.tile_assign,
        "geo_hot_tiles": S.hot_tiles,
        "geo_pip_join": S.pip_customer_zones,
        "geo_pip_zonal": S.pip_zonal_stats,
        "geo_knn": S.knn_doc_suppliers,
        "geo_reproject": S.reproject_customers,
        "geo_bbox_by_nation": S.bbox_by_nation,
        "geo_cells": S.cell_assignment,  # rows-only: cell ids not SQL-expressible
    }


def oracle_sql() -> dict[str, str]:
    from geografir_ray.pipelines import relational as R
    from geografir_ray.pipelines import spatial as S

    return {
        "q1_pricing_summary": R.Q1_SQL,
        "q3_top_orders": R.Q3_SQL,
        "q5_nation_revenue": R.Q5_SQL,
        "brand_revenue": R.BRAND_REVENUE_SQL,
        "set_ops_orders": R.SET_OPS_SQL,
        "geo_tile_assign": S.tile_assign_sql(),
        "geo_hot_tiles": S.hot_tiles_sql(),
        "geo_pip_join": S.PIP_CUSTOMER_SQL,
        "geo_pip_zonal": S.PIP_ZONAL_SQL,
        "geo_knn": S.knn_doc_suppliers_sql(),
        "geo_reproject": S.REPROJECT_SQL,
        "geo_bbox_by_nation": S.BBOX_BY_NATION_SQL,
        # geo_cells: intentionally omitted (rows-only check)
    }
