"""Relational pipelines over the TPC-H-ish testdata: filtered grouped
aggregates, multi-way joins, top-k — the engine's generic shuffle ops.

Shuffle strategy per query is documented inline (SURVEY.md §7.3):
dimension tables are broadcast (ray.put + per-batch lookup), fact-side
aggregations are two-phase (per-batch combiner → tiny global groupby),
and float money columns aggregate in integer cents for exact oracle
parity (see pipelines/common.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.tables import read_table, read_table_local
from .common import floor_scale, floor_scale_sql, group_by_nullsafe, grouped_sum

_CUTOFF = "1998-09-01"


# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64(_CUTOFF, "us"))))
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": floor_scale(t["l_quantity"]),
                "price_c": floor_scale(t["l_extendedprice"]),
                "disc_price_c": floor_scale(disc_price),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_c": ("qty_c", "sum"),
            "sum_base_price_c": ("price_c", "sum"),
            "sum_disc_price_c": ("disc_price_c", "sum"),
            "count_order": ("one", "sum"),
        },
        merge="driver",  # bounded keys: 3x2 flag/status combinations
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(t["sum_qty_c"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(
                    pc.cast(t["sum_base_price_c"], pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(t["sum_disc_price_c"], pa.float64()), 100.0
                ),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum({floor_scale_sql('l_quantity')}) / 100.0 AS sum_qty,
       sum({floor_scale_sql('l_extendedprice')}) / 100.0 AS sum_base_price,
       sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) / 100.0 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: top-10 orders by revenue for one market segment
# (customer ⋈ orders ⋈ lineitem; dimension sides broadcast)
# ---------------------------------------------------------------------------

_SEGMENT = "BUILDING"
_Q3_DATE = "1995-03-15"


def q3_top_orders(sf_dir: str):
    """Scale design: customer (a dimension) is the ONLY driver-side
    table — its segment custkey set broadcasts into a Ray-side
    semi-join filter over the orders FACT table; the surviving
    (orderkey, orderdate) rows meet the shipdate-filtered lineitem
    rows in a bucketed large-large hash join (stages/join.py), with a
    per-batch revenue pre-aggregation on the lineitem side so the join
    exchange moves one row per (batch, orderkey), not per lineitem."""
    import ray

    from ..stages.broadcast import with_broadcast
    from ..stages.join import hash_join
    from .common import partial_groupby

    cust = (
        read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], _SEGMENT)).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cust_keys_ref = ray.put(np.sort(cust["c_custkey"].values.astype(np.int64)))
    cutoff = np.datetime64(_Q3_DATE, "us")

    def filter_orders(keys: np.ndarray, t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, ck), 0, max(len(keys) - 1, 0))
        hit = (keys[pos] == ck) if len(keys) else np.zeros(len(ck), dtype=bool)
        date_ok = t["o_orderdate"].to_numpy(zero_copy_only=False) < cutoff
        t2 = t.filter(pa.array(hit & date_ok))
        return pa.table(
            {"l_orderkey": t2["o_orderkey"], "o_orderdate": t2["o_orderdate"]}
        )

    orders_f = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        with_broadcast(cust_keys_ref, filter_orders, "semi_join_orders"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def li_rev(t: pa.Table) -> pa.Table:
        keep = t["l_shipdate"].to_numpy(zero_copy_only=False) > cutoff
        t2 = t.filter(pa.array(keep))
        rev = pc.multiply(
            t2["l_extendedprice"], pc.subtract(pa.scalar(1.0), t2["l_discount"])
        )
        return pa.table({"l_orderkey": t2["l_orderkey"], "rev_c": floor_scale(rev)})

    li = (
        read_table(
            sf_dir,
            "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_rev, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            partial_groupby(["l_orderkey"], {"rev_c": ("rev_c", "sum")}),
            batch_format="pyarrow",
        )
    )

    joined = hash_join(
        li,
        orders_f,
        on="l_orderkey",
        left_cols=["l_orderkey", "rev_c"],
        right_cols=["l_orderkey", "o_orderdate"],
    )

    # hash_join co-partitions by orderkey, but Ray may split a large
    # bucket's output into several blocks (target_max_block_size), so a
    # key's rows can straddle blocks — the per-batch combiner inside
    # grouped_sum collapses within-block duplicates and the distributed
    # merge handles the (rare) cross-block remainder exactly.
    agg = grouped_sum(
        joined,
        ["l_orderkey", "o_orderdate"],
        {"revenue_c": ("rev_c", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "revenue": pc.divide(pc.cast(t["revenue_c"], pa.float64()), 100.0),
            }
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) / 100.0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = '{_SEGMENT}'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5-shape: revenue by nation (6-way join; all dimension sides broadcast,
# single pass over lineitem, no shuffle until the 25-row final groupby)
# ---------------------------------------------------------------------------


def q5_nation_revenue(sf_dir: str):
    import ray

    nation = read_table_local(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = read_table_local(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # vectorized dimension prep (no Python dict loops over 150k rows)
    ck_sorted_idx = np.argsort(cust["c_custkey"].values, kind="stable")
    ck_keys = cust["c_custkey"].values[ck_sorted_idx].astype(np.int64)
    ck_nation = cust["c_nationkey"].values[ck_sorted_idx].astype(np.int64)
    o_ck = orders["o_custkey"].values.astype(np.int64)
    pos = np.clip(np.searchsorted(ck_keys, o_ck), 0, len(ck_keys) - 1)
    o_nation = np.where(ck_keys[pos] == o_ck, ck_nation[pos], -1)
    ord_idx = np.argsort(orders["o_orderkey"].values, kind="stable")
    ok_sorted = orders["o_orderkey"].values[ord_idx].astype(np.int64)
    on_sorted = o_nation[ord_idx]
    sk_sorted = np.sort(supp["s_suppkey"].values.astype(np.int64))
    sn_sorted = supp.sort_values("s_suppkey")["s_nationkey"].values.astype(np.int64)
    ref = ray.put((ok_sorted, on_sorted, sk_sorted, sn_sorted))

    from ..stages.broadcast import with_broadcast

    def nation_tag(state, t: pa.Table) -> pa.Table:
        ok_s, on_s, sk_s, sn_s = state
        lok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        lsk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        p1c = np.clip(np.searchsorted(ok_s, lok), 0, len(ok_s) - 1)
        cn = np.where(ok_s[p1c] == lok, on_s[p1c], -1)
        p2c = np.clip(np.searchsorted(sk_s, lsk), 0, len(sk_s) - 1)
        sn = np.where(sk_s[p2c] == lsk, sn_s[p2c], -2)
        keep = cn == sn  # local-supplier condition (customer nation == supplier nation)
        t2 = t.filter(pa.array(keep))
        rev = pc.multiply(
            t2["l_extendedprice"], pc.subtract(pa.scalar(1.0), t2["l_discount"])
        )
        return pa.table({"n_nationkey": pa.array(cn[keep]), "rev_c": floor_scale(rev)})

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        with_broadcast(ref, nation_tag, "nation_tag"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    agg = grouped_sum(li, ["n_nationkey"], {"revenue_c": ("rev_c", "sum")}, merge="driver")  # <=25 nations
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def finish(t: pa.Table) -> pa.Table:
        nk = t["n_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array([nmap[int(k)] for k in nk]),
                "revenue": pc.divide(pc.cast(t["revenue_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False]
    )


Q5_SQL = f"""
SELECT n_name,
       sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# brand revenue: lineitem ⋈ part (broadcast) → top brands
# ---------------------------------------------------------------------------


def brand_revenue(sf_dir: str):
    import ray

    part = read_table_local(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = np.sort(part["p_partkey"].values.astype(np.int64))
    pb = part.sort_values("p_partkey")["p_brand"].values
    ref = ray.put((pk, pb))

    from ..stages.broadcast import with_broadcast

    def brand_tag(state, t: pa.Table) -> pa.Table:
        pk, pb = state
        lpk = t["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pk, lpk), 0, len(pk) - 1)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"p_brand": pa.array(pb[pos]), "rev_c": floor_scale(rev)})

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        with_broadcast(ref, brand_tag, "brand_tag"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = grouped_sum(li, ["p_brand"], {"revenue_c": ("rev_c", "sum")}, merge="driver")  # bounded brand set

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "revenue": pc.divide(pc.cast(t["revenue_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "p_brand"], descending=[True, False]
    )


BRAND_REVENUE_SQL = f"""
SELECT p_brand,
       sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
"""


# ---------------------------------------------------------------------------
# set ops: union + anti-join (except) over order subsets
# ---------------------------------------------------------------------------


def set_ops_orders(sf_dir: str):
    """(high-value ∪ priority-1) orders EXCEPT orders of BUILDING customers.

    Union = ds.union; except = broadcast anti-join on the key set.
    """
    import ray

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    )
    high = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 150000.0)).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    prio = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    both = high.union(prio)

    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    building = np.sort(
        cust[cust["c_mktsegment"] == "BUILDING"]["c_custkey"].values.astype(np.int64)
    )
    ref = ray.put(building)

    from ..stages.broadcast import with_broadcast

    def anti_join(keys, t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, ck), 0, max(len(keys) - 1, 0))
        hit = keys[pos] == ck if len(keys) else np.zeros(len(ck), bool)
        return t.filter(pa.array(~hit)).select(["o_orderkey"])

    out = both.map_batches(
        with_broadcast(ref, anti_join, "anti_join"), batch_format="pyarrow"
    )
    # distinct (union of the two subsets overlaps) — via the bucketed
    # grouped-min, not Ray's groupby().count() (the Aggregate
    # cardinality cliff: every surviving orderkey is its own group)
    distinct = grouped_sum(
        out.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["o_orderkey"],
        {"one": ("one", "min")},
    )
    return distinct.select_columns(["o_orderkey"]).sort("o_orderkey")


SET_OPS_SQL = """
SELECT DISTINCT o_orderkey FROM (
  SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 150000.0
  UNION ALL
  SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) u
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Large-large joins: Ray-native Dataset.join and the explicit bucketed
# hash join (same oracle — proves equivalence of both paths)
# ---------------------------------------------------------------------------


def join_orders_native(sf_dir: str):
    """orders ⋈ customer via Ray's built-in hash-shuffle Dataset.join."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return joined.select_columns(["o_orderkey", "c_mktsegment"]).sort("o_orderkey")


def join_orders_bucketed(sf_dir: str):
    """Same join through the explicit bucketed hash join (stages/join.py)."""
    from ..stages.join import hash_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "key"]), batch_format="pyarrow"
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["key", "c_mktsegment"]), batch_format="pyarrow"
    )
    out = hash_join(
        orders, cust, on="key", n_buckets=32,
        left_cols=["key", "o_orderkey"], right_cols=["key", "c_mktsegment"],
    )
    return out.select_columns(["o_orderkey", "c_mktsegment"]).sort("o_orderkey")


JOIN_ORDERS_SQL = """
SELECT o_orderkey, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# distinct counting: two-phase exact distinct (per-batch dedup -> global
# distinct -> count per group)
# ---------------------------------------------------------------------------


def distinct_parts_per_flag(sf_dir: str):
    """count(DISTINCT l_partkey) per returnflag, exactly.

    Phase 1: per-batch (flag, partkey) dedup (combiner); phase 2:
    global groupby over the deduped pairs; phase 3: count per flag.
    The shuffle moves distinct pairs, not rows.
    """
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def dedup_batch(t: pa.Table) -> pa.Table:
        # nullsafe: multi-key group_by duplicates null-key groups
        # (CLAUDE.md rule 24); raw parquet columns may be nullable
        return group_by_nullsafe(t, ["l_returnflag", "l_partkey"], [])

    pairs = ds.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True)
    # global distinct pairs, then count per flag (bounded: flags x parts)
    agg = grouped_sum(
        pairs.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["l_returnflag", "l_partkey"],
        {"one": ("one", "min")},
        merge="driver",
    )
    final = grouped_sum(
        agg.map_batches(
            lambda t: pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["l_returnflag"],
        {"n_parts": ("one", "sum")},
        merge="driver",
    )
    return final.sort("l_returnflag")


DISTINCT_PARTS_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS n_parts
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def distinct_supps_per_part(sf_dir: str):
    """COUNT(DISTINCT l_suppkey) per part via the value-salted re-key
    engine (stages/salt.salted_distinct_count): the exchange key is
    hash(key, val) % buckets, so a hot part's rows spread over every
    reducer instead of funneling into one task — the skew-safe distinct
    plan benched at 150M rows as skew_distinct_salted_150m."""
    from ..stages.salt import salted_distinct_count

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return salted_distinct_count(
        ds, "l_partkey", "l_suppkey", n_buckets=64, out="n_supps"
    )


DISTINCT_SUPPS_SQL = """
SELECT l_partkey, count(DISTINCT l_suppkey)::BIGINT AS n_supps
FROM lineitem
GROUP BY l_partkey
"""


# ---------------------------------------------------------------------------
# q6: forecast revenue change (pure filter + global sum — the simplest
# full-scan shape; exact via integer cents)
# ---------------------------------------------------------------------------


def q6_forecast_revenue(sf_dir: str):
    import ray.data

    ds = read_table(
        sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
                pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1997-01-01", "us"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev_c": floor_scale(rev), "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    agg = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        ),
        ["g"],
        {"revenue_c": ("rev_c", "sum"), "n_items": ("one", "sum")},
        merge="driver",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue": pc.divide(pc.cast(t["revenue_c"], pa.float64()), 100.0),
                "n_items": t["n_items"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q6_SQL = f"""
SELECT sum({floor_scale_sql('l_extendedprice * l_discount')}) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


# ---------------------------------------------------------------------------
# Exact median (percentile_cont 0.5 semantics) per market segment —
# computed on integer cents so the interpolated midpoint is exact
# ---------------------------------------------------------------------------


def median_price_per_segment(sf_dir: str):
    import pandas as pd
    import ray
    import ray.data

    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = np.sort(cust["c_custkey"].values.astype(np.int64))
    segs = cust.sort_values("c_custkey")["c_mktsegment"].values
    ref = ray.put((keys, segs))

    from ..stages.broadcast import with_broadcast

    def tag(state, t: pa.Table) -> pa.Table:
        k, sg = state
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
        price_c = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table({"segment": pa.array(sg[pos]), "price_c": price_c})

    tagged = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        with_broadcast(ref, tag, "segment_tag"), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # Exact median via an integer-cents HISTOGRAM, not a per-segment
    # sort: each batch collapses to (segment, price_c, n) partial
    # counts, the shuffle moves O(distinct prices) rows instead of the
    # fact table, and the CDF walk over the (bounded) merged histogram
    # is a vectorized driver step — no Python group ever materializes
    # a fifth of the orders table (the old map_groups-on-5-keys shape).
    def with_one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    hist = grouped_sum(
        tagged.map_batches(with_one, batch_format="pyarrow"),
        ["segment", "price_c"],
        {"n": ("one", "sum")},
    )
    h = hist.to_pandas().sort_values(["segment", "price_c"]).reset_index(drop=True)
    seg = h["segment"].values
    price = h["price_c"].values.astype(np.int64)
    cnt = h["n"].values.astype(np.int64)
    seg_start = np.empty(len(h), dtype=bool)
    if len(h):
        seg_start[0] = True
        seg_start[1:] = seg[1:] != seg[:-1]
    firsts = np.flatnonzero(seg_start)
    rows = []
    for i, f in enumerate(firsts):
        e = firsts[i + 1] if i + 1 < len(firsts) else len(h)
        lc = np.cumsum(cnt[f:e])  # within-segment CDF
        n = int(lc[-1])
        # percentile_cont(0.5): positions n//2-1 and n//2 (0-indexed)
        # for even n, position n//2 twice for odd n — found by
        # searchsorted over the within-segment CDF
        lo_pos = (n - 1) // 2
        hi_pos = n // 2
        lo_v = int(price[f + np.searchsorted(lc, lo_pos + 1)])
        hi_v = int(price[f + np.searchsorted(lc, hi_pos + 1)])
        rows.append((seg[f], (lo_v + hi_v) / 200.0, np.int64(n)))
    out = pd.DataFrame(rows, columns=["segment", "median_price", "n_orders"])
    out = out.sort_values("segment").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return ray.data.from_pandas(out)


MEDIAN_PRICE_SQL = """
SELECT c_mktsegment AS segment,
       median(CAST(floor(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS median_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Approximate distinct via HyperLogLog sketches (rows-only: the sketch
# is deterministic and partition-invariant, but not SQL-expressible) —
# the per-batch-sketch -> tiny-merge pattern for 100TB-scale distincts
# ---------------------------------------------------------------------------


def approx_distinct_parts(sf_dir: str):
    import ray.data

    from ..functions.hashing import splitmix64
    from ..functions.sketch import HyperLogLog

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey"])

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p=12)
        hll.add_hashes(
            splitmix64(t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.uint64))
        )
        return pa.table({"sketch": pa.array([hll.serialize()], type=pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
    merged = HyperLogLog(p=12)
    for b in sketches.iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            merged = merged.merge(HyperLogLog.deserialize(blob))

    exact = int(
        read_table_local(sf_dir, "lineitem", columns=["l_partkey"])["l_partkey"].nunique()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "approx_distinct": pa.array([int(round(merged.estimate()))], type=pa.int64()),
                "exact_distinct": pa.array([exact], type=pa.int64()),
            }
        )
    )


def p95_price_per_segment(sf_dir: str):
    """Exact per-segment 95th percentile via the same int-cents
    histogram-CDF machinery as the median — the shuffle moves
    O(distinct prices), never the fact table.

    Percentile semantics are defined IN INTEGER ARITHMETIC (value at
    0-indexed position ceil(0.95*(n-1)) of the sorted multiset) so the
    SQL twin can compute the identical position with row_number() —
    no floating-point position math on either side (quantile_cont's
    double (n-1)*q can land an ulp under an integer and silently
    interpolate; this definition can't)."""
    import pandas as pd
    import ray
    import ray.data

    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = np.sort(cust["c_custkey"].values.astype(np.int64))
    segs = cust.sort_values("c_custkey")["c_mktsegment"].values
    ref = ray.put((keys, segs))

    from ..stages.broadcast import with_broadcast

    def tag(state, t: pa.Table) -> pa.Table:
        k, sg = state
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
        price_c = pc.cast(
            pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table({"segment": pa.array(sg[pos]), "price_c": price_c})

    tagged = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        with_broadcast(ref, tag, "segment_tag_p95"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def with_one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    hist = grouped_sum(
        tagged.map_batches(with_one, batch_format="pyarrow"),
        ["segment", "price_c"],
        {"n": ("one", "sum")},
    )
    h = hist.to_pandas().sort_values(["segment", "price_c"]).reset_index(drop=True)
    seg = h["segment"].values
    price = h["price_c"].values.astype(np.int64)
    cnt = h["n"].values.astype(np.int64)
    seg_start = np.empty(len(h), dtype=bool)
    if len(h):
        seg_start[0] = True
        seg_start[1:] = seg[1:] != seg[:-1]
    firsts = np.flatnonzero(seg_start)
    rows = []
    for i, f in enumerate(firsts):
        e = firsts[i + 1] if i + 1 < len(firsts) else len(h)
        lc = np.cumsum(cnt[f:e])
        n = int(lc[-1])
        pos = ((n - 1) * 95 + 99) // 100  # ceil in pure ints
        v = int(price[f + np.searchsorted(lc, pos + 1)])
        rows.append((seg[f], v / 100.0, np.int64(n)))
    out = pd.DataFrame(rows, columns=["segment", "p95_price", "n_orders"])
    out = out.sort_values("segment").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return ray.data.from_pandas(out)


P95_PRICE_SQL = """
WITH t AS (
  SELECT c_mktsegment AS segment,
         CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_c,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY
                            CAST(floor(o_totalprice * 100.0) AS BIGINT)) - 1 AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT segment, price_c / 100.0 AS p95_price, n AS n_orders
FROM t
WHERE rn = ((n - 1) * 95 + 99) // 100
ORDER BY segment
"""


def revenue_rollup(sf_dir: str):
    """Multi-level aggregate (GROUP BY ROLLUP): revenue at
    (returnflag, linestatus), per returnflag, and grand total, with
    'ALL' filling the rolled-up level.

    Scale design: ONE shuffle computes the finest level (bounded key
    space); the coarser levels re-aggregate FROM the finest result —
    a few rows — so rollup costs no extra pass over the fact table
    (integer-cents sums are associative)."""
    import pandas as pd
    import ray.data

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "rev_c": floor_scale(rev),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    fine = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        {"revenue_c": ("rev_c", "sum"), "n_items": ("one", "sum")},
        merge="driver",  # bounded: |flags| x |statuses|
    ).to_pandas()

    mid = (
        fine.groupby("l_returnflag", as_index=False)[["revenue_c", "n_items"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    top = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "revenue_c": [fine["revenue_c"].sum()],
            "n_items": [fine["n_items"].sum()],
        }
    )
    allv = pd.concat([fine, mid, top], ignore_index=True)
    allv["revenue"] = allv["revenue_c"].astype(np.int64) / 100.0
    allv["n_items"] = allv["n_items"].astype(np.int64)
    out = (
        allv[["l_returnflag", "l_linestatus", "revenue", "n_items"]]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(out)


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
                AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def cust_orders_left(sf_dir: str):
    """Per-customer order count + spend INCLUDING zero-order customers
    — the left-outer join surface.  Scale shape: orders pre-aggregate
    per custkey (combiner + grouped sum) BEFORE the join, so the
    bucketed left join moves one row per customer per side."""
    import pyarrow as pa

    from ..stages.join import hash_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow",
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "price_c": floor_scale(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    per_cust = grouped_sum(
        read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["c_custkey"],
        {"n_orders": ("one", "sum"), "total_c": ("price_c", "sum")},
    )

    joined = hash_join(
        cust,
        per_cust,
        on="c_custkey",
        left_cols=["c_custkey"],
        right_cols=["c_custkey", "n_orders", "total_c"],
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_orders"].to_numpy(zero_copy_only=False)
        tc = t["total_c"].to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(np.int64)
        tc = np.where(np.isnan(tc.astype(np.float64)), 0, tc).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "n_orders": pa.array(n),
                "total_spent": pa.array(tc.astype(np.float64) / 100.0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


CUST_ORDERS_LEFT_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       COALESCE(o.n, 0) AS n_orders,
       CAST(COALESCE(o.tc, 0) AS BIGINT) / 100.0 AS total_spent
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS tc
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
ORDER BY c_custkey
"""


_RECENT_DATE = "1998-05-01"


def cust_no_recent_orders(sf_dir: str):
    """Customers with NO orders on/after a cutoff date — the anti-join
    surface (bucketed hash_join how='anti'; the orders side ships only
    distinct custkeys after the per-batch combiner).  The date filter
    keeps the result non-empty at every sf (a bare no-orders anti-join
    is empty on this data)."""
    import pyarrow as pa

    from ..stages.join import hash_join
    from .common import partial_groupby

    cutoff = np.datetime64(_RECENT_DATE, "us")
    cust = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    okeys = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(
                    t.filter(
                        pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff))
                    )["o_custkey"],
                    pa.int64(),
                ),
            }
        ).append_column(
            "one",
            pa.array(
                np.ones(
                    len(
                        t.filter(
                            pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff))
                        )
                    ),
                    dtype=np.int64,
                )
            ),
        ),
        batch_format="pyarrow",
    ).map_batches(
        partial_groupby(["c_custkey"], {"one": ("one", "sum")}),
        batch_format="pyarrow",
    )

    out = hash_join(
        cust,
        okeys,
        on="c_custkey",
        left_cols=["c_custkey"],
        right_cols=["c_custkey", "one"],
        how="anti",
    )
    return out.sort("c_custkey")


CUST_NO_RECENT_ORDERS_SQL = f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '{_RECENT_DATE}'
)
ORDER BY c_custkey
"""


def approx_quantiles_price(sf_dir: str, eps: float = 0.01):
    """Approximate p50/p95/p99 of o_totalprice via the mergeable
    log-histogram sketch (functions/sketch.py): one sketch per batch
    inside map_batches, bin-count rows merge in a bounded groupby —
    partition-invariant by construction, relative error <= eps.
    Rows-only (the sketch's bin math is not worth mirroring in SQL);
    the tolerance gate vs exact quantiles lives in
    tests/test_pipelines_misc.py."""
    import ray.data

    from ..functions.sketch import LogHistogram

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        h = LogHistogram(eps).add(t["o_totalprice"].to_numpy(zero_copy_only=False))
        b, c = h.to_rows()
        return pa.table({"bin": pa.array(b), "n": pa.array(c)})

    merged = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["bin"],
        {"n": ("n", "sum")},
        merge="driver",  # bounded: O(log(max/min)/eps) bins
    ).to_pandas()
    h = LogHistogram.from_rows(merged["bin"].values, merged["n"].values, eps)
    import pandas as pd

    out = pd.DataFrame(
        {
            "quantile_pct": np.array([50, 95, 99], dtype=np.int64),
            "price_est": [h.quantile(0.5), h.quantile(0.95), h.quantile(0.99)],
            "n": np.full(3, h.total, dtype=np.int64),
        }
    )
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# Q4-style late-shipment count: EXISTS semi-join orders <- lineitem with
# a cross-table date predicate (l_shipdate > o_orderdate + 60 days).
# ---------------------------------------------------------------------------

_LATE_US = 60 * 86_400_000_000  # 60 days in microseconds


def q4_late_orders(sf_dir: str):
    """Per-priority count of orders with at least one lineitem shipped
    more than 60 days after the order date.

    Scale shape: the EXISTS is a large-large bucketed hash join
    (orderkey co-partition) carrying both date columns; the predicate
    filters inside the join output, the distinct collapses per-order
    duplicates with a combiner-first grouped min over the UNBOUNDED
    orderkey, and only the bounded 5-row priority count merges on the
    driver.  Priorities ride as their leading digit so every exchange
    stays integer."""
    from ..stages.join import hash_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def prep_li(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pa.array(ship.astype(np.int64)),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        prio = pc.cast(pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1), pa.int64())
        return pa.table(
            {
                "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "order_us": pa.array(od.astype(np.int64)),
                "prio": prio,
            }
        )

    joined = hash_join(
        li.map_batches(prep_li, batch_format="pyarrow", zero_copy_batch=True),
        orders.map_batches(prep_orders, batch_format="pyarrow", zero_copy_batch=True),
        on="l_orderkey",
        left_cols=["l_orderkey", "ship_us"],
        right_cols=["l_orderkey", "order_us", "prio"],
    )

    def late(t: pa.Table) -> pa.Table:
        ship = t["ship_us"].to_numpy(zero_copy_only=False)
        od = t["order_us"].to_numpy(zero_copy_only=False)
        keep = ship > od + _LATE_US
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].filter(pa.array(keep)),
                "prio": t["prio"].filter(pa.array(keep)),
            }
        )

    lates = joined.map_batches(late, batch_format="pyarrow", zero_copy_batch=True)
    distinct = grouped_sum(lates, ["l_orderkey"], {"prio": ("prio", "min")})

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prio": t["prio"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    out = grouped_sum(
        distinct.map_batches(ones, batch_format="pyarrow"),
        ["prio"],
        {"n_late": ("one", "sum")},
        merge="driver",  # bounded: 5 priorities
    )
    return out.sort("prio")


Q4_LATE_ORDERS_SQL = """
SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS prio,
       count(*) AS n_late
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY 1
ORDER BY prio
"""


# ---------------------------------------------------------------------------
# min_price_supplier: argmin-join (TPC-H Q2/Q15 shape) — for every part,
# the supplier(s) offering its minimum unit price
# ---------------------------------------------------------------------------


def min_price_supplier(sf_dir: str):
    """Per-part minimum unit price and the supplier(s) achieving it —
    the correlated-min / argmin-join surface (reference has no engine;
    TPC-H Q2/Q15 are the published shape).

    Scale plan: unit prices collapse to one row per DISTINCT
    (part, supplier) pair in a per-batch combiner before the exchange;
    per-part mins are a second bounded-width exchange over those pairs;
    the argmin recovery is one bucketed hash_join (pairs x mins) with a
    vectorized equality filter — no correlated per-part probe, no
    driver-side state at any part cardinality.
    """
    from ..stages.join import hash_join

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def unit(t: pa.Table) -> pa.Table:
        # floor((extendedprice / quantity) * 100): IEEE division and
        # multiply are correctly rounded, so numpy and DuckDB produce
        # the identical double -> identical int64 cents (common.py).
        u = pc.divide(t["l_extendedprice"], t["l_quantity"])
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "unit_c": floor_scale(u),
            }
        )

    pairs = grouped_sum(
        li.map_batches(unit, batch_format="pyarrow", zero_copy_batch=True),
        ["p_partkey", "s_suppkey"],
        {"unit_c": ("unit_c", "min")},
    )
    mins = grouped_sum(pairs, ["p_partkey"], {"min_c": ("unit_c", "min")})
    joined = hash_join(
        pairs,
        mins,
        on="p_partkey",
        left_cols=["p_partkey", "s_suppkey", "unit_c"],
        right_cols=["p_partkey", "min_c"],
    )

    def keep_min(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["unit_c"], t["min_c"]))
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "s_suppkey": t["s_suppkey"],
                "min_unit_price": pc.divide(
                    pc.cast(t["min_c"], pa.float64()), 100.0
                ),
            }
        )

    return (
        joined.map_batches(keep_min, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .sort(["p_partkey", "s_suppkey"])
    )


MIN_PRICE_SUPPLIER_SQL = f"""
WITH costs AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         CAST(l_suppkey AS BIGINT) AS s_suppkey,
         min({floor_scale_sql('l_extendedprice / l_quantity')}) AS unit_c
  FROM lineitem GROUP BY 1, 2
), mins AS (
  SELECT p_partkey, min(unit_c) AS min_c FROM costs GROUP BY 1
)
SELECT c.p_partkey, c.s_suppkey,
       CAST(m.min_c AS BIGINT) / 100.0 AS min_unit_price
FROM costs c JOIN mins m ON c.p_partkey = m.p_partkey AND c.unit_c = m.min_c
ORDER BY c.p_partkey, c.s_suppkey
"""


# ---------------------------------------------------------------------------
# nation_value_share: global-scalar share filter (TPC-H Q11 shape)
# ---------------------------------------------------------------------------

_SHARE_MIN_BP = 400  # keep nations holding >= 4% of total revenue


def nation_value_share(sf_dir: str):
    """Per-nation supplier revenue kept only where the nation holds at
    least ``_SHARE_MIN_BP`` basis points of GLOBAL revenue — the
    scalar-subquery-against-a-global-aggregate surface (TPC-H Q11).

    Scale plan: supplier->nation is a broadcast dimension lookup inside
    the fact scan (rule 3/4); the per-nation aggregate is driver-merged
    (<= 25 keys, rule 2); the global total is one int on the driver.
    share_bp = (rev_c * 10000) // total is all-integer on both engines.
    """
    from ..sources.tables import read_table_local
    from ..stages.broadcast import with_broadcast

    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = read_table_local(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    order = np.argsort(sk, kind="stable")
    supp_sorted = sk[order]
    supp_nation = supp["s_nationkey"].to_numpy().astype(np.int64)[order]

    li = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def tag(bc, t: pa.Table) -> pa.Table:
        ssort, snat = bc
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nkey = snat[np.searchsorted(ssort, keys)]
        return pa.table(
            {
                "n_nationkey": pa.array(nkey),
                "rev_c": floor_scale(rev),
            }
        )

    import ray

    supp_ref = ray.put((supp_sorted, supp_nation))
    tagged = li.map_batches(
        with_broadcast(supp_ref, tag),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    per_nation = grouped_sum(
        tagged,
        ["n_nationkey"],
        {"rev_c": ("rev_c", "sum")},
        merge="driver",  # bounded: <= 25 nations
    ).materialize()

    total = 0
    parts = []
    for b in per_nation.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(b)
        total += int(pc.sum(b["rev_c"]).as_py() or 0)

    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    norder = np.argsort(nk, kind="stable")
    nk_sorted = nk[norder]
    nname = nat["n_name"].to_numpy()[norder]

    whole = pa.concat_tables(parts)
    rev_c = whole["rev_c"].to_numpy().astype(np.int64)
    share_bp = (rev_c * 10000) // total
    keep = share_bp >= _SHARE_MIN_BP
    keys = whole["n_nationkey"].to_numpy().astype(np.int64)
    names = nname[np.searchsorted(nk_sorted, keys[keep])]
    out = pa.table(
        {
            "n_name": pa.array(names),
            "revenue": pa.array(rev_c[keep].astype(np.float64) / 100.0),
            "share_bp": pa.array(share_bp[keep]),
        }
    )
    import ray.data

    return ray.data.from_arrow(out).sort("n_name")


NATION_VALUE_SHARE_SQL = f"""
WITH rev AS (
  SELECT n_name,
         CAST(sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS rev_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
), tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t FROM rev)
SELECT n_name, rev_c / 100.0 AS revenue,
       (rev_c * 10000) // t AS share_bp
FROM rev, tot
WHERE (rev_c * 10000) // t >= {_SHARE_MIN_BP}
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# cust_order_histogram: two-level aggregate (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


def cust_order_histogram(sf_dir: str):
    """Distribution of customers by order count INCLUDING the zero-order
    bucket — the aggregate-of-an-aggregate surface (TPC-H Q13).

    Scale plan: level 1 (count per customer) is the standard combiner +
    one hash exchange over the unbounded custkey; level 2 re-aggregates
    those counts per DISTINCT n_orders — a bounded key space (order
    counts are small integers) so it driver-merges (rule 2).  The zero
    bucket needs no join: it is |customer| minus the number of level-1
    groups, two driver scalars (customer is a dimension, rule 4).
    """
    from ..sources.tables import read_table_local

    n_customers = len(read_table_local(sf_dir, "customer", columns=["c_custkey"]))

    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    per_cust = grouped_sum(
        orders.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["c_custkey"],
        {"n_orders": ("one", "sum")},
    )

    def count_counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_orders": t["n_orders"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    hist = grouped_sum(
        per_cust.map_batches(count_counts, batch_format="pyarrow"),
        ["n_orders"],
        {"n_custs": ("one", "sum")},
        merge="driver",  # bounded: distinct order counts are small ints
    ).materialize()

    parts = [
        b
        for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    whole = pa.concat_tables(parts)
    with_orders = int(pc.sum(whole["n_custs"]).as_py() or 0)
    zero = n_customers - with_orders
    if zero > 0:
        whole = pa.concat_tables(
            [
                pa.table(
                    {
                        "n_orders": pa.array([0], pa.int64()),
                        "n_custs": pa.array([zero], pa.int64()),
                    }
                ),
                whole,
            ]
        )
    import ray.data

    return ray.data.from_arrow(whole).sort("n_orders")


CUST_ORDER_HISTOGRAM_SQL = """
SELECT n_orders, count(*) AS n_custs
FROM (
  SELECT c_custkey, COALESCE(o.n, 0) AS n_orders
  FROM customer
  LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
    ON c_custkey = o.o_custkey
)
GROUP BY n_orders
ORDER BY n_orders
"""


# ---------------------------------------------------------------------------
# idle_rich_custs: scalar-avg filter + anti-join + bounded agg
# (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

_IDLE_DATE = "1998-06-01"


def idle_rich_custs(sf_dir: str):
    """Per-market-segment count and balance of customers whose balance
    exceeds the positive-balance average but who placed NO orders on or
    after ``_IDLE_DATE`` — the TPC-H Q22 composite: global scalar
    subquery + anti-join + bounded grouped aggregate.

    Exactness: the average comparison is cross-multiplied
    (bal_c * n_pos > sum_pos_c) so no engine ever divides — identical
    int64 predicates on both sides.  Scale plan: the two scalars come
    off the dimension table locally (rule 4); the anti-join is the
    bucketed hash_join with the orders side pre-collapsed to distinct
    custkeys by the combiner; the final aggregate driver-merges over
    <= 5 segments (rule 2).
    """
    from ..stages.join import hash_join
    from .common import partial_groupby

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_mktsegment"]
    )

    # global scalars (dimension-side, rule 4)
    from ..sources.tables import read_table_local

    cl = read_table_local(sf_dir, "customer", columns=["c_acctbal"])
    bal_raw = cl["c_acctbal"].to_numpy()
    bal_all = np.floor(bal_raw * 100.0).astype(np.int64)
    pos = bal_all[bal_raw > 0.0]
    n_pos = int(len(pos))
    sum_pos_c = int(pos.sum())

    def rich(t: pa.Table) -> pa.Table:
        bal_c = floor_scale(t["c_acctbal"]).to_numpy()
        keep = bal_c * n_pos > sum_pos_c
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "bal_c": floor_scale(t["c_acctbal"]),
            }
        )

    rich_ds = cust.map_batches(rich, batch_format="pyarrow", zero_copy_batch=True)

    cutoff = np.datetime64(_IDLE_DATE, "us")
    okeys = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "c_custkey": pc.cast(f["o_custkey"], pa.int64()),
                    "one": pa.array(np.ones(f.num_rows, dtype=np.int64)),
                }
            )
        )(t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff)))),
        batch_format="pyarrow",
    ).map_batches(
        partial_groupby(["c_custkey"], {"one": ("one", "sum")}),
        batch_format="pyarrow",
    )

    idle = hash_join(
        rich_ds,
        okeys,
        on="c_custkey",
        left_cols=["c_custkey", "c_mktsegment", "bal_c"],
        right_cols=["c_custkey", "one"],
        how="anti",
    )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "bal_c": t["bal_c"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = grouped_sum(
        idle.map_batches(ones, batch_format="pyarrow"),
        ["c_mktsegment"],
        {"n_custs": ("one", "sum"), "bal_c": ("bal_c", "sum")},
        merge="driver",  # bounded: <= 5 market segments
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_custs": t["n_custs"],
                "total_bal": pc.divide(pc.cast(t["bal_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


IDLE_RICH_CUSTS_SQL = f"""
WITH pos AS (
  SELECT {floor_scale_sql('c_acctbal')} AS bal_c FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, count(*) AS n_custs,
       sum({floor_scale_sql('c_acctbal')}) / 100.0 AS total_bal
FROM customer c
WHERE {floor_scale_sql('c_acctbal')} * (SELECT count(*) FROM pos)
        > (SELECT CAST(sum(bal_c) AS BIGINT) FROM pos)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{_IDLE_DATE}'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# part_activity_full: FULL OUTER join of two derived aggregates
# ---------------------------------------------------------------------------


def part_activity_full(sf_dir: str):
    """FULL OUTER join of two per-part aggregates over DIFFERENT row
    subsets (tiny-quantity revenue vs deep-discount counts) — parts can
    appear on either side only, both, or neither.  The full-join engine
    surface: stages/join.hash_join how='full' keeps unmatched rows from
    BOTH sides with typed-null opposite columns, coalescing the key.

    Scale plan: each side pre-collapses to one row per part via the
    combiner + one exchange; the full join is the same single bucketed
    exchange as every other hash_join (no broadcast, no driver state).
    """
    from ..stages.join import hash_join

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def low_qty(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_quantity"], pa.scalar(1.0)))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_c": floor_scale(t["l_extendedprice"]),
            }
        )

    def deep_disc(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_discount"], pa.scalar(0.09)))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    a = grouped_sum(
        li.map_batches(low_qty, batch_format="pyarrow", zero_copy_batch=True),
        ["p_partkey"],
        {"rev_c": ("rev_c", "sum")},
    )
    b = grouped_sum(
        li.map_batches(deep_disc, batch_format="pyarrow", zero_copy_batch=True),
        ["p_partkey"],
        {"n_disc": ("one", "sum")},
    )

    joined = hash_join(
        a,
        b,
        on="p_partkey",
        left_cols=["p_partkey", "rev_c"],
        right_cols=["p_partkey", "n_disc"],
        how="full",
    )

    def finish(t: pa.Table) -> pa.Table:
        rev = t["rev_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = t["n_disc"].to_numpy(zero_copy_only=False).astype(np.float64)
        rev = np.where(np.isnan(rev), 0, rev).astype(np.int64)
        nd = np.where(np.isnan(nd), 0, nd).astype(np.int64)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "low_qty_rev": pa.array(rev.astype(np.float64) / 100.0),
                "n_disc": pa.array(nd),
            }
        )

    return (
        joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .sort("p_partkey")
    )


PART_ACTIVITY_FULL_SQL = f"""
WITH a AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         CAST(sum({floor_scale_sql('l_extendedprice')}) AS BIGINT) AS rev_c
  FROM lineitem WHERE l_quantity <= 1.0 GROUP BY 1
), b AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey, count(*) AS n_disc
  FROM lineitem WHERE l_discount > 0.09 GROUP BY 1
)
SELECT COALESCE(a.p_partkey, b.p_partkey) AS p_partkey,
       COALESCE(a.rev_c, 0) / 100.0 AS low_qty_rev,
       COALESCE(b.n_disc, 0) AS n_disc
FROM a FULL JOIN b ON a.p_partkey = b.p_partkey
ORDER BY p_partkey
"""


def nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape (reference has no engine; the relational surface
    is the north-rule target): shipped revenue between every DISTINCT
    (supplier nation, customer nation) pair by ship year.  Both nation
    taggings ride one broadcast closure over the lineitem scan
    (CLAUDE.md rule 3); the (25 x 24 x years)-bounded aggregate
    driver-merges (rule 2).  Revenue in integer cents both engines."""
    import ray

    from ..stages.broadcast import with_broadcast

    nation = read_table_local(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = read_table_local(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    ck = np.argsort(cust["c_custkey"].values, kind="stable")
    ck_keys = cust["c_custkey"].values[ck].astype(np.int64)
    ck_nat = cust["c_nationkey"].values[ck].astype(np.int64)
    o_ck = orders["o_custkey"].values.astype(np.int64)
    pos = np.clip(np.searchsorted(ck_keys, o_ck), 0, len(ck_keys) - 1)
    o_nat = np.where(ck_keys[pos] == o_ck, ck_nat[pos], -1)
    oi = np.argsort(orders["o_orderkey"].values, kind="stable")
    ok_sorted = orders["o_orderkey"].values[oi].astype(np.int64)
    on_sorted = o_nat[oi]
    sk_sorted = np.sort(supp["s_suppkey"].values.astype(np.int64))
    sn_sorted = supp.sort_values("s_suppkey")["s_nationkey"].values.astype(np.int64)
    ref = ray.put((ok_sorted, on_sorted, sk_sorted, sn_sorted))

    def tag(state, t: pa.Table) -> pa.Table:
        ok_s, on_s, sk_s, sn_s = state
        lok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        lsk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        p1 = np.clip(np.searchsorted(ok_s, lok), 0, len(ok_s) - 1)
        cn = np.where(ok_s[p1] == lok, on_s[p1], -1)
        p2 = np.clip(np.searchsorted(sk_s, lsk), 0, len(sk_s) - 1)
        sn = np.where(sk_s[p2] == lsk, sn_s[p2], -2)
        keep = (cn != sn) & (cn >= 0) & (sn >= 0)
        t2 = t.filter(pa.array(keep))
        year = (
            t2["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        rev = pc.multiply(
            t2["l_extendedprice"], pc.subtract(pa.scalar(1.0), t2["l_discount"])
        )
        return pa.table(
            {
                "supp_nat": pa.array(sn[keep]),
                "cust_nat": pa.array(cn[keep]),
                "l_year": pa.array(year),
                "rev_c": floor_scale(rev),
            }
        )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        with_broadcast(ref, tag, "q7_tag"), batch_format="pyarrow", zero_copy_batch=True
    )

    agg = grouped_sum(
        li, ["supp_nat", "cust_nat", "l_year"], {"revenue_c": ("rev_c", "sum")},
        merge="driver",  # <= 25*24*years keys (CLAUDE.md rule 2)
    )
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nmap[int(k)] for k in t["supp_nat"].to_numpy(zero_copy_only=False)]
                ),
                "cust_nation": pa.array(
                    [nmap[int(k)] for k in t["cust_nat"].to_numpy(zero_copy_only=False)]
                ),
                "l_year": t["l_year"],
                "revenue": pc.divide(pc.cast(t["revenue_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


NATION_TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({floor_scale_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT) / 100.0
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape: per ship month, the share (in basis points) of
    revenue from PROMO-type parts.  The part→is_promo lookup is a
    broadcast sorted-key probe fused into the lineitem scan; months are
    bounded so both the promo and total sums driver-merge; the share is
    all-integer ((promo_c * 10000) // total_c) on both engines."""
    import ray

    from ..stages.broadcast import with_broadcast

    part = read_table_local(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = np.argsort(part["p_partkey"].values, kind="stable")
    pk_keys = part["p_partkey"].values[pk].astype(np.int64)
    pk_promo = (part["p_type"].values[pk] == "PROMO").astype(np.int64)
    ref = ray.put((pk_keys, pk_promo))

    def tag(state, t: pa.Table) -> pa.Table:
        keys, promo = state
        lpk = t["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, lpk), 0, len(keys) - 1)
        isp = np.where(keys[pos] == lpk, promo[pos], 0)
        month = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        ym = (month.astype(np.int64) // 12 + 1970) * 100 + (
            month.astype(np.int64) % 12 + 1
        )
        rev_c = floor_scale(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month": pa.array(ym),
                "promo_c": pa.array(rev_c * isp),
                "total_c": pa.array(rev_c),
            }
        )

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(
        with_broadcast(ref, tag, "q14_tag"), batch_format="pyarrow", zero_copy_batch=True
    )
    agg = grouped_sum(
        li, ["month"], {"promo_c": ("promo_c", "sum"), "total_c": ("total_c", "sum")},
        merge="driver",  # bounded: one key per ship month
    )

    def finish(t: pa.Table) -> pa.Table:
        p = t["promo_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["total_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "month": t["month"],
                "promo_share_bp": pa.array(p * 10000 // np.maximum(tot, 1)),
                "total_revenue": pa.array(tot.astype(np.float64) / 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("month")


PROMO_REVENUE_SHARE_SQL = f"""
WITH m AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) * 100 + EXTRACT(month FROM l_shipdate)
              AS BIGINT) AS month,
         CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN {floor_scale_sql("l_extendedprice * (1 - l_discount)")}
                       ELSE 0 END) AS BIGINT) AS promo_c,
         CAST(sum({floor_scale_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
           AS total_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT month,
       promo_c * 10000 // greatest(total_c, 1) AS promo_share_bp,
       total_c / 100.0 AS total_revenue
FROM m ORDER BY month
"""


def big_orders(sf_dir: str, min_qty: int = 300):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer name and order facts.  The per-order
    quantity sums are the Aggregate-cliff regime (every order is its
    own group) and run on grouped_sum's bucketed merge; survivors are
    rare by construction, so they hash_join back to orders and take
    the customer name from a broadcast probe."""
    import ray

    from ..stages.broadcast import with_broadcast
    from ..stages.join import hash_join

    def qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "qty_c": floor_scale(t["l_quantity"], 1.0),
            }
        )

    per_order = grouped_sum(
        read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
            qty, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["o_orderkey"],
        {"sum_qty_c": ("qty_c", "sum")},
    )
    survivors = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty_c"], min_qty)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    joined = hash_join(
        survivors,
        orders,
        on="o_orderkey",
        left_cols=["o_orderkey", "sum_qty_c"],
        right_cols=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    cust = read_table_local(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ck = np.argsort(cust["c_custkey"].values, kind="stable")
    ck_keys = cust["c_custkey"].values[ck].astype(np.int64)
    ck_names = cust["c_name"].values[ck]
    ref = ray.put((ck_keys, ck_names))

    def name_tag(state, t: pa.Table) -> pa.Table:
        keys, names = state
        okc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, okc), 0, len(keys) - 1)
        nm = np.where(keys[pos] == okc, names[pos], None)
        return pa.table(
            {
                "c_name": pa.array(nm.astype(object), type=pa.string()),
                "c_custkey": pa.array(okc),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "sum_qty": pc.cast(t["sum_qty_c"], pa.int64()),
            }
        )

    return joined.map_batches(
        with_broadcast(ref, name_tag, "q18_names"), batch_format="pyarrow"
    ).sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)


BIG_ORDERS_SQL = """
SELECT c_name, CAST(o_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM (
  SELECT l_orderkey, CAST(sum(floor(l_quantity)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(floor(l_quantity)) > 300
) q
JOIN orders ON q.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def fk_orphan_audit(sf_dir: str):
    """Data-quality audit: orphan counts for every FK relationship in
    the star schema, BOTH directions — child rows whose key has no
    parent (broken FK) and parent rows no child references (dead
    dimension rows).  Each check is one bucketed anti-join
    (stages/join.hash_join how="anti": hash(key) % B co-partition,
    per-bucket sorted-probe — no broadcast, no driver state), then a
    distributed count; at 100 TB each relationship costs one bounded
    exchange of its key columns only."""
    import ray.data

    from ..stages.join import hash_join

    rels = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]

    def keyed(name: str, col: str):
        # project to the key column only — the audit never ships payload
        return read_table(sf_dir, name, columns=[col]).map_batches(
            lambda t, c=col: pa.table({"k": pc.cast(t[c], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def distinct_keys(ds):
        return grouped_sum(
            ds.map_batches(
                lambda t: t.append_column(
                    "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            ),
            ["k"],
            {"one": ("one", "min")},
        ).select_columns(["k"])

    def count_rows(ds) -> int:
        # distributed count: per-batch sizes -> one driver-merged sum
        from .common import grouped_sum as gs

        t = gs(
            ds.map_batches(
                lambda t: pa.table(
                    {
                        "g": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                        "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["g"],
            {"n": ("one", "sum")},
            merge="driver",
        ).to_pandas()
        return int(t["n"].iloc[0]) if len(t) else 0

    names, orphans, dead = [], [], []
    for label, child, ckey, parent, pkey in rels:
        child_keys = distinct_keys(keyed(child, ckey))
        parent_keys = distinct_keys(keyed(parent, pkey))
        broken = hash_join(child_keys, parent_keys, on="k", how="anti")
        unused = hash_join(parent_keys, child_keys, on="k", how="anti")
        names.append(label)
        orphans.append(count_rows(broken))
        dead.append(count_rows(unused))

    return ray.data.from_arrow(
        pa.table(
            {
                "relationship": pa.array(names),
                "n_orphan_keys": pa.array(np.array(orphans, dtype=np.int64)),
                "n_unreferenced_parents": pa.array(np.array(dead, dtype=np.int64)),
            }
        )
    ).sort("relationship")


FK_ORPHAN_AUDIT_SQL = """
WITH rel AS (
  SELECT 'lineitem.l_orderkey->orders' AS relationship,
         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey))
           AS n_orphan_keys,
         (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders) p
          WHERE NOT EXISTS (SELECT 1 FROM lineitem c WHERE c.l_orderkey = p.o_orderkey))
           AS n_unreferenced_parents
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
          WHERE NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)),
         (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer) p
          WHERE NOT EXISTS (SELECT 1 FROM orders c WHERE c.o_custkey = p.c_custkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.l_suppkey)),
         (SELECT count(*) FROM (SELECT DISTINCT s_suppkey FROM supplier) p
          WHERE NOT EXISTS (SELECT 1 FROM lineitem c WHERE c.l_suppkey = p.s_suppkey))
)
SELECT relationship,
       CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys,
       CAST(n_unreferenced_parents AS BIGINT) AS n_unreferenced_parents
FROM rel ORDER BY relationship
"""


def cust_revenue_3way(sf_dir: str, topn: int = 50):
    """Three-table join chain with NO broadcast side: lineitem ⋈
    orders on orderkey, then ⋈ customer on custkey — both as bucketed
    hash_joins (each key hash-co-partitioned, per-bucket sorted probe),
    the shape a 100 TB fact-to-fact chain takes when no side fits an
    object.  Revenue pre-aggregates per orderkey BEFORE the first join
    (combiner: the join then moves one row per order, not one per
    lineitem) and per custkey before the second.  Top-N customers by
    revenue, names carried through the join itself."""
    from ..stages.join import hash_join

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "rev_c": floor_scale(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    )
                ),
            }
        )

    per_order = grouped_sum(
        read_table(
            sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
        ).map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"],
        {"rev_c": ("rev_c", "sum")},
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j1 = hash_join(
        per_order,
        orders,
        on="o_orderkey",
        left_cols=["o_orderkey", "rev_c"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    per_cust = grouped_sum(
        j1.map_batches(
            lambda t: pa.table(
                {"c_custkey": pc.cast(t["o_custkey"], pa.int64()), "rev_c": t["rev_c"]}
            ),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        {"rev_c": ("rev_c", "sum")},
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j2 = hash_join(
        per_cust,
        cust,
        on="c_custkey",
        left_cols=["c_custkey", "rev_c"],
        right_cols=["c_custkey", "c_name"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "revenue": pc.divide(pc.cast(t["rev_c"], pa.float64()), 100.0),
            }
        )

    return (
        j2.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(topn)
    )


CUST_REVENUE_3WAY_SQL = f"""
SELECT CAST(o_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(sum({floor_scale_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY revenue DESC, c_custkey
LIMIT 50
"""

# ---------------------------------------------------------------------------
# late_only_supplier: exclusivity semi/anti composite (TPC-H Q21 shape)
# ---------------------------------------------------------------------------


def late_only_supplier(sf_dir: str, topn: int = 100):
    """TPC-H Q21 shape (adapted: this schema has no receipt/commit
    dates, so "late" = a RETURNED line, ``l_returnflag = 'R'``): for
    each supplier, count the multi-supplier orders in which it was the
    ONLY supplier with a returned line — the EXISTS + NOT-EXISTS
    double-correlation (reference has no engine; the published TPC-H
    query is the shape).

    Scale plan: lineitem collapses to one row per DISTINCT
    (order, supplier) pair carrying ``any_r = max(is_returned)`` in a
    per-batch combiner before one bucketed exchange (grouped_sum
    merge="bucket" — the pair key is unbounded); per-order supplier /
    returned-supplier counts are a second bounded-width exchange over
    those pairs; the EXISTS/NOT-EXISTS predicates become one bucketed
    hash_join (pairs x order stats) + a vectorized filter.  The pair
    table is materialized once because it feeds both the join and the
    per-order aggregate (diamond dataflow; one row per distinct pair,
    spills to the object store at scale).  The final per-supplier
    count is driver-merged — the supplier dimension is bounded."""
    import ray

    from ..stages.broadcast import with_broadcast
    from ..stages.join import hash_join

    def pair_stage(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "is_r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )

    pairs = grouped_sum(
        read_table(
            sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"]
        ).map_batches(pair_stage, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "l_suppkey"],
        {"any_r": ("is_r", "max")},
    ).materialize()

    def ord_stage(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "any_r": t["any_r"],
            }
        )

    per_order = grouped_sum(
        pairs.map_batches(ord_stage, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"],
        {"n_supps": ("one", "sum"), "n_r": ("any_r", "sum")},
    )

    joined = hash_join(
        pairs,
        per_order,
        on="l_orderkey",
        left_cols=["l_orderkey", "l_suppkey", "any_r"],
        right_cols=["l_orderkey", "n_supps", "n_r"],
    )

    def qualify(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(t["any_r"], 1), pc.greater_equal(t["n_supps"], 2)),
            pc.equal(t["n_r"], 1),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "s_suppkey": t["l_suppkey"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    numwait = grouped_sum(
        joined.map_batches(qualify, batch_format="pyarrow", zero_copy_batch=True),
        ["s_suppkey"],
        {"numwait": ("one", "sum")},
        merge="driver",
    )

    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    sk = np.argsort(supp["s_suppkey"].values, kind="stable")
    ref = ray.put(
        (supp["s_suppkey"].values[sk].astype(np.int64), supp["s_name"].values[sk])
    )

    def name_tag(state, t: pa.Table) -> pa.Table:
        keys, names = state
        k = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
        nm = np.where(keys[pos] == k, names[pos], None)
        return pa.table(
            {
                "s_suppkey": pa.array(k),
                "s_name": pa.array(nm.astype(object), type=pa.string()),
                "numwait": pc.cast(t["numwait"], pa.int64()),
            }
        )

    return (
        numwait.map_batches(
            with_broadcast(ref, name_tag, "q21_names"), batch_format="pyarrow"
        )
        .sort(["numwait", "s_suppkey"], descending=[True, False])
        .limit(topn)
    )


LATE_ONLY_SUPPLIER_SQL = """
WITH pair AS (
  SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
         CAST(l_suppkey AS BIGINT) AS s_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS any_r
  FROM lineitem GROUP BY 1, 2
), ord AS (
  SELECT l_orderkey, count(*) AS n_supps, sum(any_r) AS n_r
  FROM pair GROUP BY 1
)
SELECT p.s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM pair p
JOIN ord o ON p.l_orderkey = o.l_orderkey
JOIN supplier ON p.s_suppkey = supplier.s_suppkey
WHERE p.any_r = 1 AND o.n_supps >= 2 AND o.n_r = 1
GROUP BY 1, 2
ORDER BY numwait DESC, p.s_suppkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# small_qty_revenue: correlated per-group average (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#13"


def small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders of one brand's parts were no longer filled — lineitems whose
    quantity is below 20% of their part's average quantity.

    The correlated scalar subquery (avg per part) cross-multiplies to
    all-integer form on both engines: ``qty < 0.2 * (sum/cnt)`` becomes
    ``5 * qty_c * cnt < sum_qty_c * 100`` (qty_c = floor(qty*100), so
    no floating division ever happens).

    Scale plan: the brand's partkeys ride one ray.put broadcast into
    the lineitem scan (a dimension-sized set — never a shuffle join);
    per-part (sum, cnt) stats driver-merge (bounded by the part
    dimension) and broadcast back into a SECOND streaming pass over the
    same pruned read; nothing materializes."""
    import ray

    from ..stages.broadcast import with_broadcast

    part = read_table_local(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_keys = np.sort(
        part["p_partkey"].values[part["p_brand"].values == _Q17_BRAND].astype(np.int64)
    )
    keys_ref = ray.put(brand_keys)

    def brand_lines(state, t: pa.Table) -> pa.Table:
        keys = state
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0))
        keep = keys[pos] == pk if len(keys) else np.zeros(len(pk), dtype=bool)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "qty_c": floor_scale(t["l_quantity"]),
                "price_c": floor_scale(t["l_extendedprice"]),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    def scan():
        return read_table(
            sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
        ).map_batches(
            with_broadcast(keys_ref, brand_lines, "q17_brand_keys"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    stats = grouped_sum(
        scan(),
        ["p_partkey"],
        {"sum_qty_c": ("qty_c", "sum"), "cnt": ("one", "sum")},
        merge="driver",
    )
    st = pa.concat_tables(
        [b for b in stats.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    order = np.argsort(st["p_partkey"].to_numpy(), kind="stable")
    stats_ref = ray.put(
        (
            st["p_partkey"].to_numpy()[order],
            st["sum_qty_c"].to_numpy()[order],
            st["cnt"].to_numpy()[order],
        )
    )

    def small_rev(state, t: pa.Table) -> pa.Table:
        keys, sums, cnts = state
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pk)  # every key present by construction
        qty = t["qty_c"].to_numpy(zero_copy_only=False)
        small = 5 * qty * cnts[pos] < sums[pos]
        total = t["price_c"].to_numpy(zero_copy_only=False)[small].sum()
        return pa.table({"rev_c": pa.array([np.int64(total)])})

    partials = scan().map_batches(
        with_broadcast(stats_ref, small_rev, "q17_part_stats"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    total_c = 0
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            total_c += int(b["rev_c"].to_numpy().sum())
    import ray.data

    return ray.data.from_arrow(
        pa.table({"avg_yearly": pa.array([np.int64(total_c // 7)], pa.int64())})
    )


SMALL_QTY_REVENUE_SQL = f"""
WITH brand_lines AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         {floor_scale_sql('l_quantity')} AS qty_c,
         {floor_scale_sql('l_extendedprice')} AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q17_BRAND}'
), stats AS (
  SELECT p_partkey, sum(qty_c) AS sum_qty_c, count(*) AS cnt
  FROM brand_lines GROUP BY 1
)
SELECT CAST(coalesce(sum(price_c), 0) // 7 AS BIGINT) AS avg_yearly
FROM brand_lines b JOIN stats s ON b.p_partkey = s.p_partkey
WHERE 5 * b.qty_c * s.cnt < s.sum_qty_c
"""

# ---------------------------------------------------------------------------
# top_parts_per_nation: top-k per group with RANK ties (window top-N shape)
# ---------------------------------------------------------------------------


def _block_topk_with_ties(t: pa.Table, k: int) -> pa.Table:
    """Per-block partial grouped top-k, RANK-tie inclusive: keep every
    row whose rev_c ties-or-beats the block's k-th largest (duplicates
    counted) within its nation.  A subset's k-th largest never exceeds
    the superset's, so every globally rank<=k row survives this filter
    — the standard partial-top-k argument, extended to ties."""
    if t.num_rows == 0:
        return t
    nk = t["n_nationkey"].to_numpy(zero_copy_only=False)
    rv = t["rev_c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-rv, nk))
    nk_s, rv_s = nk[order], rv[order]
    starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]])
    seg = np.cumsum(np.r_[False, nk_s[1:] != nk_s[:-1]])
    idx_in_seg = np.arange(len(nk_s)) - starts[seg]
    thr = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
    kth = idx_in_seg == (k - 1)
    thr[seg[kth]] = rv_s[kth]
    keep_sorted = rv_s >= thr[seg]
    keep = np.zeros(len(nk_s), dtype=bool)
    keep[order] = keep_sorted
    return t.filter(pa.array(keep))


def top_parts_per_nation(sf_dir: str, k: int = 3):
    """Top-k parts by supplier-nation revenue with RANK() tie
    semantics (ties at the boundary all kept) — the grouped top-N
    window shape.

    Scale plan: supplier→nation rides a ray.put broadcast into the
    lineitem scan; per-(nation, part) revenue is one bucketed exchange
    (grouped_sum merge="bucket" — the composite key is unbounded); the
    top-N itself never shuffles: after the merge each key's total
    lives in exactly ONE block, so a per-block vectorized partial
    keeps, per nation, only rows tying-or-beating the block's k-th
    revenue (a subset's k-th largest never exceeds the superset's, so
    every global top-k row survives its block filter), and the driver
    finishes an exact RANK over the O(nations × k × blocks) survivors."""
    import ray

    from ..stages.broadcast import with_broadcast

    supp = read_table_local(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sk = np.argsort(supp["s_suppkey"].values, kind="stable")
    supp_ref = ray.put(
        (
            supp["s_suppkey"].values[sk].astype(np.int64),
            supp["s_nationkey"].values[sk].astype(np.int64),
        )
    )

    def tag(state, t: pa.Table) -> pa.Table:
        keys, nk = state
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, s)  # FK integrity: every suppkey present
        rev = floor_scale(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        )
        return pa.table(
            {
                "n_nationkey": pa.array(nk[pos]),
                "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev_c": rev,
            }
        )

    per_np = grouped_sum(
        read_table(
            sf_dir,
            "lineitem",
            columns=["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            with_broadcast(supp_ref, tag, "topk_supp_nation"),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["n_nationkey", "p_partkey"],
        {"rev_c": ("rev_c", "sum")},
    )

    def block_topk(t: pa.Table) -> pa.Table:
        return _block_topk_with_ties(t, k)

    survivors = per_np.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [
        b
        for b in survivors.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    nation = read_table_local(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    names = dict(
        zip(nation["n_nationkey"].values.astype(int), nation["n_name"].values)
    )
    if not parts:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "p_partkey": pa.array([], pa.int64()),
                "rev_c": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    whole = pa.concat_tables(parts)
    nk = whole["n_nationkey"].to_numpy()
    rv = whole["rev_c"].to_numpy()
    pk = whole["p_partkey"].to_numpy()
    out = {"n_name": [], "p_partkey": [], "rev_c": [], "rnk": []}
    for key in np.unique(nk):  # bounded: one iteration per nation
        m = nk == key
        r, p = rv[m], pk[m]
        rnk = len(r) - np.searchsorted(np.sort(r), r, side="right") + 1  # RANK()
        sel = rnk <= k
        order = np.lexsort((p[sel], rnk[sel]))
        out["n_name"].extend([names[int(key)]] * int(sel.sum()))
        out["p_partkey"].extend(p[sel][order].tolist())
        out["rev_c"].extend(r[sel][order].tolist())
        out["rnk"].extend(rnk[sel][order].tolist())
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "p_partkey": pa.array(out["p_partkey"], pa.int64()),
            "rev_c": pa.array(out["rev_c"], pa.int64()),
            "rnk": pa.array(out["rnk"], pa.int64()),
        }
    )


TOP_PARTS_PER_NATION_SQL = f"""
WITH rev AS (
  SELECT CAST(s_nationkey AS BIGINT) AS n_nationkey,
         CAST(l_partkey AS BIGINT) AS p_partkey,
         sum({floor_scale_sql('l_extendedprice * (1 - l_discount)')}) AS rev_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), ranked AS (
  SELECT n_nationkey, p_partkey, rev_c,
         RANK() OVER (PARTITION BY n_nationkey ORDER BY rev_c DESC) AS rnk
  FROM rev
)
SELECT n_name, p_partkey, CAST(rev_c AS BIGINT) AS rev_c, CAST(rnk AS BIGINT) AS rnk
FROM ranked JOIN nation ON ranked.n_nationkey = nation.n_nationkey
WHERE rnk <= 3
ORDER BY n_name, rnk, p_partkey
"""

# ---------------------------------------------------------------------------
# revenue_cube: GROUP BY CUBE — all four grouping sets over
# (returnflag, linestatus), completing the grouping-sets surface next
# to revenue_rollup.  Same scale design: ONE shuffle computes the
# finest (bounded) level; the other three sets re-aggregate from those
# few rows on the driver (integer-cents sums are associative).
# ---------------------------------------------------------------------------


def revenue_cube(sf_dir: str):
    import pandas as pd
    import ray.data

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "rev_c": floor_scale(rev),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    fine = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        {"revenue_c": ("rev_c", "sum"), "n_items": ("one", "sum")},
        merge="driver",  # bounded: |flags| x |statuses|
    ).to_pandas()

    by_flag = (
        fine.groupby("l_returnflag", as_index=False)[["revenue_c", "n_items"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    by_status = (
        fine.groupby("l_linestatus", as_index=False)[["revenue_c", "n_items"]]
        .sum()
        .assign(l_returnflag="ALL")
    )
    top = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "revenue_c": [fine["revenue_c"].sum()],
            "n_items": [fine["n_items"].sum()],
        }
    )
    cols = ["l_returnflag", "l_linestatus", "revenue_c", "n_items"]
    out = pd.concat(
        [fine[cols], by_flag[cols], by_status[cols], top[cols]], ignore_index=True
    ).sort_values(["l_returnflag", "l_linestatus"], kind="mergesort")
    out["revenue"] = out["revenue_c"].astype(np.int64) / 100.0
    out["n_items"] = out["n_items"].astype(np.int64)
    return ray.data.from_pandas(
        out[["l_returnflag", "l_linestatus", "revenue", "n_items"]].reset_index(
            drop=True
        )
    )


REVENUE_CUBE_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum({floor_scale_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
         / 100.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Approximate-string similarity join (edit distance <= 1) — the
# entity-resolution / spell-correction fuzzy join, FastSS-shaped
# (Bocek et al. 2007; the SymSpell deletion-neighborhood trick): two
# strings are within Levenshtein 1 only if they share a member of
# their 1-deletion neighborhoods, so candidates come from ONE
# hash-partition exchange on the deletion-variant hash (never an
# all-pairs scan), a second bounded exchange dedupes candidate pairs,
# and a vectorized LCP+LCS check verifies exactly.  Hash collisions
# between different variants only ADD candidates (the verify kills
# them); missed pairs are impossible (equal variants hash equal).
# Verify rule: lev(a,b) <= 1  iff  |la-lb| <= 1  and
# lcp(a,b) + lcs(a,b) >= min(la,lb) - (1 if la==lb else 0)
# (one substitution splits the string into agreeing prefix+suffix; one
# indel aligns all of the shorter string into prefix+suffix) —
# property-tested against a brute DP in tests/test_pipelines_misc.py.
# ---------------------------------------------------------------------------

EDITDIST_MAXLEN = 24  # fixed-width encode bound; mirrored in the SQL twin


def _editdist_le1(a_names: np.ndarray, b_names: np.ndarray) -> np.ndarray:
    """Vectorized lev(a,b) <= 1 over two equal-length string arrays
    (each string <= EDITDIST_MAXLEN bytes)."""
    W = EDITDIST_MAXLEN
    a = np.frombuffer(
        np.asarray(a_names, dtype=f"S{W}").tobytes(), dtype=np.uint8
    ).reshape(-1, W)
    b = np.frombuffer(
        np.asarray(b_names, dtype=f"S{W}").tobytes(), dtype=np.uint8
    ).reshape(-1, W)
    la = (a != 0).sum(axis=1).astype(np.int64)
    lb = (b != 0).sum(axis=1).astype(np.int64)
    lmin = np.minimum(la, lb)
    cols = np.arange(W, dtype=np.int64)
    # lcp: leading equal run, capped at lmin
    eq = (a == b) & (cols[None, :] < lmin[:, None])
    lcp = np.cumprod(eq, axis=1).sum(axis=1)
    # lcs: trailing equal run on right-aligned strings, capped at lmin
    ar = np.zeros_like(a)
    br = np.zeros_like(b)
    rows = np.arange(len(a))[:, None]
    ar[rows, (cols[None, :] - la[:, None]) % W] = a
    br[rows, (cols[None, :] - lb[:, None]) % W] = b
    eqr = (ar == br) & (cols[None, :] >= (W - lmin)[:, None])
    lcs = np.cumprod(eqr[:, ::-1], axis=1).sum(axis=1)
    return (np.abs(la - lb) <= 1) & (lcp + lcs >= lmin - (la == lb))


def editdist_pairs(names_ds, n_buckets: int = 64, with_ids: bool = False):
    """FastSS edit-distance-<=1 self-join over a ``name`` string column
    (see module comment above): deletion-variant hash exchange →
    in-bucket pair expansion → bounded pair-dedup exchange → vectorized
    LCP+LCS verify.  ``names_ds`` rows must be DISTINCT names.
    Subquadratic and fully distributed at any cardinality.

    ``with_ids=True``: ``names_ds`` additionally carries an int64 ``id``
    column (1:1 with names); the output pairs then carry ``ia``/``ib``
    payload ids alongside ``a``/``b`` — the record-linkage form where
    the caller needs entity keys, not just the matched strings."""
    from ..functions.hashing import splitmix64

    ds = names_ds
    W = EDITDIST_MAXLEN

    def variants(t: pa.Table) -> pa.Table:
        names = np.asarray(t["name"].to_numpy(zero_copy_only=False))
        ids0 = (
            t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if with_ids
            else None
        )
        if len(names) == 0:
            cols = {"vhash": pa.array([], pa.int64()), "name": pa.array([], pa.string())}
            if with_ids:
                cols["id"] = pa.array([], pa.int64())
            return pa.table(cols)
        enc = np.frombuffer(
            np.asarray(names, dtype=f"S{W + 1}").tobytes(), dtype=np.uint8
        ).reshape(-1, W + 1)
        ln = (enc != 0).sum(axis=1).astype(np.int64)
        ok = (ln >= 2) & (ln <= W)
        names, enc, ln = names[ok], enc[ok], ln[ok]
        if with_ids:
            ids0 = ids0[ok]
        n = len(names)

        def row_hash(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
            h = np.zeros(len(mat), dtype=np.uint64)
            u = np.ascontiguousarray(mat[:, :W]).view(np.uint64)  # (n, W//8)
            for c in range(u.shape[1]):
                h = splitmix64(h ^ u[:, c])
            return splitmix64(h ^ lens.astype(np.uint64)).astype(np.int64)

        idx_parts, hash_parts = [], []
        # identity variant
        idx_parts.append(np.arange(n, dtype=np.int64))
        hash_parts.append(row_hash(enc, ln))
        # one-deletion variants (only where the deleted position exists)
        for i in range(W):
            m = ln > i
            if not m.any():
                break
            sub = np.delete(enc[m], i, axis=1)  # (k, W)
            hash_parts.append(row_hash(sub, ln[m] - 1))
            idx_parts.append(np.flatnonzero(m).astype(np.int64))
        idx = np.concatenate(idx_parts)
        vh = np.concatenate(hash_parts)
        # a name's repeated-char deletions can coincide: drop dup
        # (name, vhash) rows before the exchange
        pair_key = np.stack([idx, vh])
        uniq = np.unique(pair_key, axis=1)
        cols = {
            "vhash": pa.array(uniq[1]),
            "name": pa.array(names[uniq[0]], pa.string()),
        }
        if with_ids:
            cols["id"] = pa.array(ids0[uniq[0]])
        return pa.table(cols)

    posts = ds.map_batches(variants, batch_format="pyarrow", zero_copy_batch=True)

    def tag(t: pa.Table) -> pa.Table:
        vh = t["vhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(vh) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bkt", pa.array(b))

    _PAIRS = pa.schema(
        [("a", pa.string()), ("b", pa.string())]
        + ([("ia", pa.int64()), ("ib", pa.int64())] if with_ids else [])
    )

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIRS.empty_table()
        vh = g["vhash"].to_numpy(zero_copy_only=False)
        nm = np.asarray(g["name"].to_numpy(zero_copy_only=False))
        gid = (
            g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if with_ids
            else None
        )
        # integer argsort on the hash only — an object-string lexsort
        # here pays one Python compare per element (rules 13/17/19);
        # pairs are canonicalized a<b AFTER expansion instead, paying
        # O(pairs) compares (pairs << rows)
        order = np.argsort(vh, kind="stable")
        vh, nm = vh[order], nm[order]
        if with_ids:
            gid = gid[order]
        first = np.ones(len(vh), dtype=bool)
        first[1:] = vh[1:] != vh[:-1]
        starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        pos = np.arange(len(vh), dtype=np.int64) - starts[seg_id]
        total = int(pos.sum())
        if total == 0:
            return _PAIRS.empty_table()
        b_idx = np.repeat(np.arange(len(vh), dtype=np.int64), pos)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.repeat(starts[seg_id], pos) + offs
        x, y = nm[a_idx], nm[b_idx]
        # duplicate names impossible (keys distinct), so x != y always
        if not with_ids:
            return pa.table(
                {"a": pa.array(np.minimum(x, y)), "b": pa.array(np.maximum(x, y))}
            )
        ix, iy = gid[a_idx], gid[b_idx]
        sw = x > y  # canonicalize by NAME; ids ride the same swap
        return pa.table(
            {
                "a": pa.array(np.where(sw, y, x), pa.string()),
                "b": pa.array(np.where(sw, x, y), pa.string()),
                "ia": pa.array(np.where(sw, iy, ix)),
                "ib": pa.array(np.where(sw, ix, iy)),
            }
        )

    pairs = (
        posts.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(expand, batch_format="pyarrow")
    )

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    aggs = {"one": ("one", "min")}
    if with_ids:
        # ids are functionally determined by (a, b); min == the value
        aggs.update({"ia": ("ia", "min"), "ib": ("ib", "min")})
    dedup = grouped_sum(
        pairs.map_batches(one, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
        aggs,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIRS.empty_table()
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False))
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False))
        m = _editdist_le1(a, b)
        cols = {"a": pa.array(a[m], pa.string()), "b": pa.array(b[m], pa.string())}
        if with_ids:
            mm = pa.array(m)
            cols["ia"] = t["ia"].filter(mm)
            cols["ib"] = t["ib"].filter(mm)
        return pa.table(cols)

    return dedup.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["a", "b"])


CUST_NAME_EDITDIST_SQL = f"""
WITH v AS (
  SELECT c_name AS name FROM customer
  WHERE c_custkey % 3 = 0 AND length(c_name) BETWEEN 2 AND {EDITDIST_MAXLEN}
)
SELECT a.name AS a, b.name AS b
FROM v a JOIN v b
  ON a.name < b.name AND abs(length(a.name) - length(b.name)) <= 1
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY a, b
"""


def cust_entity_resolution(sf_dir: str, max_iters: int = 25):
    """Record linkage end-to-end — the entity-resolution composition
    every dedupe pipeline runs: blocking + fuzzy match
    (:func:`editdist_pairs` with id payload: FastSS deletion-variant
    exchange, never all-pairs) → undirected match edges → connected
    components (pointer-doubling min-label propagation,
    stages/components.py, O(log diameter) rounds) → one canonical
    ``entity_id`` (the cluster-minimum custkey) per customer.  Every
    subset customer appears, singletons as their own entity.  All
    three stages are bounded exchanges; nothing is materialized on the
    driver.  Same deterministic 1/3 subset as ``cust_name_editdist``
    so the O(n^2) LEVENSHTEIN + recursive-CTE oracle stays bounded."""
    from ..stages.components import min_label_components

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def prep(t: pa.Table) -> pa.Table:
        key = pc.cast(t["c_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = pa.array(key % 3 == 0)
        f = t.filter(keep)
        return pa.table(
            {"name": f["c_name"], "id": pc.cast(f["c_custkey"], pa.int64())}
        )

    subset = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    pairs = editdist_pairs(subset, with_ids=True)

    def both_dirs(t: pa.Table) -> pa.Table:
        ia = t["ia"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t["ib"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([ia, ib])),
                "dst": pa.array(np.concatenate([ib, ia])),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def self_label(t: pa.Table) -> pa.Table:
        k = t["id"]
        return pa.table({"node": k, "label": k})

    labels = subset.map_batches(
        self_label, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    labels = min_label_components(
        edges, labels, max_iters=max_iters, op_name="cust_entity_resolution"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["node"], "entity_id": t["label"]})

    return labels.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).sort("c_custkey")


CUST_ENTITY_RESOLUTION_SQL = f"""
WITH RECURSIVE v AS (
  -- the %3 subset seeds singletons UNFILTERED (mirroring the engine);
  -- the length bound gates only pair generation, like editdist_pairs
  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer
  WHERE c_custkey % 3 = 0
),
pairs AS (
  SELECT a.id AS ia, b.id AS ib
  FROM v a JOIN v b
    ON a.name < b.name AND abs(length(a.name) - length(b.name)) <= 1
  WHERE levenshtein(a.name, b.name) <= 1
    AND length(a.name) BETWEEN 2 AND {EDITDIST_MAXLEN}
    AND length(b.name) BETWEEN 2 AND {EDITDIST_MAXLEN}
),
edges AS (
  SELECT ia AS src, ib AS dst FROM pairs
  UNION ALL SELECT ib AS src, ia AS dst FROM pairs
),
reach(node, label) AS (
  SELECT id, id FROM v
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS c_custkey, CAST(MIN(label) AS BIGINT) AS entity_id
FROM reach GROUP BY node ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Disjunctive multi-predicate join (TPC-H Q19 shape): lineitem x part
# revenue under an OR of (brand, size-band, quantity-band)
# conjunctions.  Engine shape: the part attributes broadcast ONCE
# (dimension table, rule 3/4) and each lineitem batch evaluates the
# whole disjunction as three vectorized boolean conjunctions — the
# predicate never becomes a join condition, so there is no exchange at
# all; the bounded per-branch aggregate driver-merges.
# ---------------------------------------------------------------------------

_Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#34", 1, 15, 20.0, 30.0),
)


def disjunctive_revenue(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    part = read_table_local(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part = part.sort_values("p_partkey")
    pk = part["p_partkey"].values.astype(np.int64)
    pb = part["p_brand"].values
    psz = part["p_size"].values.astype(np.int64)
    ref = ray.put((pk, pb, psz))

    def probe(state, t: pa.Table) -> pa.Table:
        pk, pb, psz = state
        lpk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(pk, lpk), 0, len(pk) - 1)
        hit = pk[pos] == lpk
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        rev_c = floor_scale(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        ).to_numpy(zero_copy_only=False)
        brands, revs, ones = [], [], []
        for brand, s_lo, s_hi, q_lo, q_hi in _Q19_BRANCHES:
            m = (
                hit
                & (pb[pos] == brand)
                & (psz[pos] >= s_lo)
                & (psz[pos] <= s_hi)
                & (qty >= q_lo)
                & (qty <= q_hi)
            )
            k = int(m.sum())
            brands.append(np.full(k, brand, dtype=object))
            revs.append(rev_c[m])
            ones.append(np.ones(k, dtype=np.int64))
        return pa.table(
            {
                "p_brand": pa.array(np.concatenate(brands), pa.string()),
                "rev_c": pa.array(np.concatenate(revs)),
                "one": pa.array(np.concatenate(ones)),
            }
        )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        with_broadcast(ref, probe, "q19_probe"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = grouped_sum(
        li,
        ["p_brand"],
        {"revenue_c": ("rev_c", "sum"), "n_items": ("one", "sum")},
        merge="driver",
        empty_schema=pa.schema(
            [("p_brand", pa.string()), ("revenue_c", pa.int64()), ("n_items", pa.int64())]
        ),
    )
    # bounded (<= 3 branches): return the arrow table itself, sorted on
    # the driver — Ray 2.49 drops empty blocks in iter_batches AND
    # to_pandas, so a fully-EMPTY Dataset cannot carry its schema to
    # the oracle compare (rule 8); the driver contract accepts tables.
    tbls = [
        b for b in agg.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    whole = pa.concat_tables(tbls) if tbls else pa.schema(
        [("p_brand", pa.string()), ("revenue_c", pa.int64()), ("n_items", pa.int64())]
    ).empty_table()
    return whole.sort_by([("p_brand", "ascending")])


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT p_brand,
       CAST(sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')}) AS BIGINT)
         AS revenue_c,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1.0 AND 11.0)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10.0 AND 20.0)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20.0 AND 30.0)
GROUP BY p_brand
ORDER BY p_brand
"""


def cust_name_editdist(sf_dir: str, n_buckets: int = 64):
    """All pairs of (deterministic 1/3-subset) customer names within
    Levenshtein distance 1 — the dedupe-entities fuzzy join over
    :func:`editdist_pairs`.  The subset (c_custkey % 3 = 0, the
    jaccard-limit precedent) bounds the O(n^2) LEVENSHTEIN oracle."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def prep(t: pa.Table) -> pa.Table:
        key = pc.cast(t["c_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = pa.array(key % 3 == 0)
        return pa.table({"name": t.filter(keep)["c_name"]})

    return editdist_pairs(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        n_buckets=n_buckets,
    )


# ---------------------------------------------------------------------------
# EXACT distributed order statistics (p25/p50/p75/p95 of the lineitem
# price in cents) by histogram refinement — the distributed-SELECTION
# algorithm class, complementing the mergeable-sketch approx path
# (approx_quantiles_price): pass 1 computes (n, min, max) + a bounded
# 65536-bucket histogram (per-batch bincount partials, driver merge —
# never a sort); the driver locates each k-th's bucket by cumsum;
# pass 2 collects ONLY the few target buckets' values (expected
# n/65536 rows each) and selects the in-bucket rank exactly.  Two
# streaming passes, zero shuffles, exact at any scale — ties are
# harmless because the VALUE at global rank k is unique regardless of
# tie order.  k_p = ceil(p*n/100) on both engines.
# ---------------------------------------------------------------------------

QUANTILE_PS = (25, 50, 75, 95)
_QHIST_BUCKETS = 65536


def exact_price_quantiles(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    def vc_of(t: pa.Table) -> np.ndarray:
        return (
            pc.cast(
                pc.floor(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])

    # pass 1: n/min/max + bounded histogram in ONE fused scan
    def hist_partial(t: pa.Table) -> pa.Table:
        vc = vc_of(t)
        if len(vc) == 0:
            return pa.table(
                {"bkt": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64())}
            )
        # provisional global domain: prices are bounded by the data
        # model; min/max ride the same partial rows (bkt = -1 sentinel)
        u, c = np.unique(vc >> 8, return_counts=True)  # 256-cent buckets
        return pa.table(
            {
                "bkt": pa.array(np.concatenate([u, [-1]])),
                "cnt": pa.array(np.concatenate([c.astype(np.int64), [len(vc)]])),
                "mn": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64), [vc.min()]])
                ),
                "mx": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64), [vc.max()]])
                ),
            }
        )

    hist = grouped_sum(
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["bkt"],
        {"cnt": ("cnt", "sum"), "mn": ("mn", "min"), "mx": ("mx", "max")},
        merge="driver",
    ).to_pandas().sort_values("bkt")
    meta = hist[hist["bkt"] == -1]
    n = int(meta["cnt"].iloc[0])
    h = hist[hist["bkt"] >= 0]
    bkts = h["bkt"].values.astype(np.int64)
    cnts = h["cnt"].values.astype(np.int64)
    cum = np.cumsum(cnts)
    targets = {}
    for p in QUANTILE_PS:
        k = (p * n + 99) // 100  # ceil(p*n/100), 1-based rank
        i = int(np.searchsorted(cum, k))
        before = int(cum[i - 1]) if i > 0 else 0
        targets.setdefault(int(bkts[i]), []).append((p, k - before))
    ref = ray.put(np.array(sorted(targets), dtype=np.int64))

    # pass 2: collect only the target buckets' values
    def collect(sel: np.ndarray, t: pa.Table) -> pa.Table:
        vc = vc_of(t)
        b = vc >> 8
        pos = np.clip(np.searchsorted(sel, b), 0, len(sel) - 1)
        m = sel[pos] == b
        return pa.table({"bkt": pa.array(b[m]), "vc": pa.array(vc[m])})

    got = (
        ds.map_batches(
            with_broadcast(ref, collect), batch_format="pyarrow", zero_copy_batch=True
        )
        .to_pandas()
    )
    rows = []
    for b, wants in sorted(targets.items()):
        vals = np.sort(got[got["bkt"] == b]["vc"].values.astype(np.int64))
        for p, r in wants:
            rows.append((p, int(vals[r - 1])))
    rows.sort()
    return pa.table(
        {
            "p": pa.array([r[0] for r in rows], pa.int64()),
            "value_c": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


EXACT_PRICE_QUANTILES_SQL = """
WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS vc FROM lineitem
), r AS (
  SELECT vc, row_number() OVER (ORDER BY vc) AS rn, count(*) OVER () AS n
  FROM v
)
SELECT CAST(p.p AS BIGINT) AS p, r.vc AS value_c
FROM r CROSS JOIN (VALUES (25), (50), (75), (95)) AS p(p)
WHERE r.rn = (p.p * r.n + 99) // 100
ORDER BY p
"""


# ---------------------------------------------------------------------------
# Skyline / Pareto-frontier query (Borzsonyi et al., ICDE 2001 — the
# preference-query operator class): parts that are not DOMINATED under
# (minimize retail price, maximize size).  q dominates p iff
# q.price <= p.price AND q.size >= p.size AND strict in at least one.
# Engine shape: 2-d dominance collapses onto the per-size price minima
# — p survives iff p.price == min_price(p.size) AND
# p.price < min_price(any size > p.size) — so pass 1 is a bounded
# per-size MIN (combiner + driver merge: distinct sizes are bounded by
# the attribute domain, never by row count), the driver suffix-scans
# sizes descending for bestGT, and pass 2 re-scans with the tiny
# (size -> minp, bestGT) table broadcast in the task closure.  Two
# streaming passes, zero shuffles, no all-pairs at any scale; ties on
# the frontier all survive.  The oracle is the independent quadratic
# NOT-EXISTS dominance definition, not this algorithm.
# ---------------------------------------------------------------------------


def part_skyline(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "price_c": floor_scale(t["p_retailprice"]),
            }
        )

    per_size = (
        grouped_sum(
            ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
            ["p_size"],
            {"minp": ("price_c", "min")},
            merge="driver",
        )
        .to_pandas()
        .sort_values("p_size")
    )
    sizes = per_size["p_size"].values.astype(np.int64)
    minp = per_size["minp"].values.astype(np.int64)
    # bestGT(s) = min price over strictly LARGER sizes (exclusive
    # suffix-min, descending); int64 max = "no larger size"
    bestgt = np.full(len(sizes), np.iinfo(np.int64).max, dtype=np.int64)
    if len(sizes) > 1:
        bestgt[:-1] = np.minimum.accumulate(minp[::-1])[::-1][1:]
    ref = ray.put((sizes, minp, bestgt))

    def keep(state, t: pa.Table) -> pa.Table:
        sizes, minp, bestgt = state
        sz = pc.cast(t["p_size"], pa.int64()).to_numpy(zero_copy_only=False)
        prc = floor_scale(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sizes, sz)  # every size is present in pass 1
        m = (prc == minp[pos]) & (prc < bestgt[pos])
        mm = pa.array(m)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"].filter(mm), pa.int64()),
                "price_c": pa.array(prc[m]),
                "p_size": pa.array(sz[m]),
            }
        )

    return ds.map_batches(
        with_broadcast(ref, keep), batch_format="pyarrow", zero_copy_batch=True
    ).sort("p_partkey")


PART_SKYLINE_SQL = f"""
WITH v AS (
  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
         {floor_scale_sql('p_retailprice')} AS price_c,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT p.p_partkey, p.price_c, p.p_size
FROM v p
WHERE NOT EXISTS (
  SELECT 1 FROM v q
  WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
    AND (q.price_c < p.price_c OR q.p_size > p.p_size)
)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Exact range partitioner, exposed as an operator: equi-depth boundary
# values (the EXACT p25/p50/p75 order statistics from the
# histogram-refinement pass above — not a sample-based approximation
# like Dataset.sort's) assign every row a partition id, with ties
# going LEFT (pid = count of boundaries strictly below the value).
# This is the building block of a deterministic distributed sort /
# bucketed export: the audit (n_rows, min, max per partition) proves
# the ranges are disjoint, ordered and balanced.  Three streaming
# passes total (fused histogram, target-bucket collect, assign+audit),
# zero shuffles; boundaries broadcast in the task closure.
# ---------------------------------------------------------------------------

RANGE_PART_PS = (25, 50, 75)


def range_partition_assign(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    q = exact_price_quantiles(sf_dir)
    qd = {int(p): int(v) for p, v in zip(q["p"].to_pylist(), q["value_c"].to_pylist())}
    bounds = np.array([qd[p] for p in RANGE_PART_PS], dtype=np.int64)
    ref = ray.put(bounds)

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])

    def assign(state, t: pa.Table) -> pa.Table:
        vc = floor_scale(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        pid = np.searchsorted(state, vc, side="left").astype(np.int64)
        # side="left": vc == boundary -> pid of the LEFT range; mirrors
        # the SQL twin's COUNT(boundary < vc)
        return pa.table(
            {
                "pid": pa.array(pid),
                "one": pa.array(np.ones(len(vc), dtype=np.int64)),
                "mn": pa.array(vc),
                "mx": pa.array(vc),
            }
        )

    agg = grouped_sum(
        ds.map_batches(
            with_broadcast(ref, assign), batch_format="pyarrow", zero_copy_batch=True
        ),
        ["pid"],
        {"n_rows": ("one", "sum"), "min_vc": ("mn", "min"), "max_vc": ("mx", "max")},
        merge="driver",
    )
    return agg.sort("pid")


RANGE_PARTITION_ASSIGN_SQL = """
WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS vc FROM lineitem
), r AS (
  SELECT vc, row_number() OVER (ORDER BY vc) AS rn, count(*) OVER () AS n
  FROM v
), b AS (
  SELECT r.vc FROM r CROSS JOIN (VALUES (25), (50), (75)) AS p(p)
  WHERE r.rn = (p.p * r.n + 99) // 100
), a AS (
  SELECT v.vc, (SELECT count(*) FROM b WHERE b.vc < v.vc) AS pid FROM v
)
SELECT CAST(pid AS BIGINT) AS pid, count(*)::BIGINT AS n_rows,
       CAST(min(vc) AS BIGINT) AS min_vc, CAST(max(vc) AS BIGINT) AS max_vc
FROM a GROUP BY pid ORDER BY pid
"""


# ---------------------------------------------------------------------------
# Robust statistics per segment: EXACT median and MAD (median absolute
# deviation) of the price per l_returnflag — the outlier-robust
# dispersion pair.  Exactness via the same histogram-refinement
# selection as exact_price_quantiles, generalized to bounded SEGMENTS:
# each pass computes per-(group, 256-cent-bucket) count partials
# (combiner + driver merge — group count is bounded by the attribute
# domain), the driver locates each group's k-th bucket, and a collect
# pass fetches only the few target buckets' values.  MAD needs the
# median first, so the full operator is two selection rounds = four
# streaming passes, zero shuffles, no sort.  Rank convention
# ceil(n/2) = (n+1)//2 (lower median), mirrored in the SQL twin.
# ---------------------------------------------------------------------------


def _grouped_exact_median(ds, val_of, groups: np.ndarray):
    """Exact per-group lower median of ``val_of(batch) -> (g_idx, vals)``
    where g_idx indexes into the bounded, sorted ``groups`` array.
    Returns (n_per_group, median_per_group) int64 arrays."""
    import ray

    from ..stages.broadcast import with_broadcast

    G = len(groups)

    def hist_partial(t: pa.Table) -> pa.Table:
        gi, vc = val_of(t)
        if len(vc) == 0:
            return pa.table(
                {"gb": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        # fuse (group, bucket) into one int key: bucket counts stay
        # bounded because values are bounded-domain cents
        gb = gi.astype(np.int64) * (1 << 40) + (vc >> 8)
        u, c = np.unique(gb, return_counts=True)
        return pa.table({"gb": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    hist = (
        grouped_sum(
            ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["gb"],
            {"cnt": ("cnt", "sum")},
            merge="driver",
        )
        .to_pandas()
        .sort_values("gb")
    )
    gb = hist["gb"].values.astype(np.int64)
    cnt = hist["cnt"].values.astype(np.int64)
    gi_h = gb >> 40
    n_per = np.zeros(G, dtype=np.int64)
    target_bkt = np.zeros(G, dtype=np.int64)
    rank_in = np.zeros(G, dtype=np.int64)
    for g in range(G):
        m = gi_h == g
        n = int(cnt[m].sum())
        n_per[g] = n
        if n == 0:
            target_bkt[g] = -1
            continue
        k = (n + 1) // 2  # lower median, 1-based
        cum = np.cumsum(cnt[m])
        i = int(np.searchsorted(cum, k))
        target_bkt[g] = int(gb[m][i] & ((1 << 40) - 1))
        rank_in[g] = k - (int(cum[i - 1]) if i > 0 else 0)
    ref = ray.put(target_bkt)

    def collect(state, t: pa.Table) -> pa.Table:
        gi, vc = val_of(t)
        if len(vc) == 0:
            return pa.table(
                {"gi": pa.array([], pa.int64()), "vc": pa.array([], pa.int64())}
            )
        m = (vc >> 8) == state[gi]
        return pa.table(
            {"gi": pa.array(gi[m].astype(np.int64)), "vc": pa.array(vc[m])}
        )

    got = ds.map_batches(
        with_broadcast(ref, collect), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    med = np.zeros(G, dtype=np.int64)
    for g in range(G):
        vals = np.sort(got[got["gi"] == g]["vc"].values.astype(np.int64))
        if len(vals):
            med[g] = vals[rank_in[g] - 1]
    return n_per, med


def segment_median_mad(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    groups = np.sort(
        read_table_local(sf_dir, "lineitem", columns=["l_returnflag"])[
            "l_returnflag"
        ].unique()
    )
    gset = pa.array(groups, pa.string())

    def base(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        gi = pc.index_in(t["l_returnflag"], value_set=gset).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vc = floor_scale(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        return gi, vc

    n_per, med = _grouped_exact_median(ds, base, groups)

    # second selection round over |vc - med[g]|: the tiny (G,) median
    # array is captured read-only in the task closure (light broadcast
    # state per rule 3 — serialized once per task, 5 int64s); only the
    # bucket arrays inside _grouped_exact_median go through ray.put +
    # with_broadcast
    med_arr = med

    def dev(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        gi, vc = base(t)
        return gi, np.abs(vc - med_arr[gi])

    _, mad = _grouped_exact_median(ds, dev, groups)
    return pa.table(
        {
            "l_returnflag": pa.array(groups, pa.string()),
            "n": pa.array(n_per),
            "median_c": pa.array(med),
            "mad_c": pa.array(mad),
        }
    )


SEGMENT_MEDIAN_MAD_SQL = """
WITH v AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS vc
  FROM lineitem
), r AS (
  SELECT g, vc, row_number() OVER (PARTITION BY g ORDER BY vc) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
), med AS (
  SELECT g, CAST(n AS BIGINT) AS n, vc AS med_c FROM r WHERE rn = (n + 1) // 2
), d AS (
  SELECT v.g, abs(v.vc - med.med_c) AS dv FROM v JOIN med ON v.g = med.g
), r2 AS (
  SELECT g, dv, row_number() OVER (PARTITION BY g ORDER BY dv) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM d
), mad AS (
  SELECT g, dv AS mad_c FROM r2 WHERE rn = (n + 1) // 2
)
SELECT med.g AS l_returnflag, med.n, med.med_c AS median_c, mad.mad_c
FROM med JOIN mad ON med.g = mad.g
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Share-of-total HAVING over an UNBOUNDED key (TPC-H Q11 shape): parts
# whose revenue exceeds 0.05% of total revenue.  The trap at scale is
# computing the global scalar: this pipeline derives the total by a
# second streaming reduction over the (already high-cardinality)
# grouped OUTPUT — no second scan of lineitem, no driver
# materialization of the group table — then broadcasts the threshold
# into a vectorized filter over the grouped Dataset.  Exactly one
# hash-bucket exchange (grouped_sum merge="bucket" on l_partkey);
# threshold compare is an integer cross-multiplication (rev * 2000 >
# total), no float division on either engine.
# ---------------------------------------------------------------------------


def part_revenue_share(sf_dir: str):
    import ray

    from ..stages.broadcast import with_broadcast

    ds = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev_c = floor_scale(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
        )
        return pa.table(
            {"l_partkey": pc.cast(t["l_partkey"], pa.int64()), "rev_c": rev_c}
        )

    per_part = grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"],
        {"revenue_c": ("rev_c", "sum")},
        merge="bucket",
    ).materialize()  # consumed twice: total reduction + filter

    def total_partial(t: pa.Table) -> pa.Table:
        s = int(t["revenue_c"].to_numpy(zero_copy_only=False).sum())
        return pa.table({"k": pa.array([0], pa.int64()), "s": pa.array([s], pa.int64())})

    tot = grouped_sum(
        per_part.map_batches(total_partial, batch_format="pyarrow"),
        ["k"],
        {"s": ("s", "sum")},
        merge="driver",
    ).to_pandas()
    total_c = int(tot["s"].iloc[0])
    ref = ray.put(np.int64(total_c))

    def keep(state, t: pa.Table) -> pa.Table:
        rev = t["revenue_c"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(rev * 2000 > int(state)))

    out = per_part.map_batches(
        with_broadcast(ref, keep), batch_format="pyarrow", zero_copy_batch=True
    )
    # the kept set is provably bounded (< 2000 rows: each needs
    # rev > total/2000) and can legitimately be EMPTY at larger sf —
    # return the arrow table itself so the schema survives (rule 25)
    schema = pa.schema([("l_partkey", pa.int64()), ("revenue_c", pa.int64())])
    tbls = [
        b.select(schema.names)
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    whole = pa.concat_tables(tbls) if tbls else schema.empty_table()
    return whole.sort_by([("l_partkey", "ascending")])


PART_REVENUE_SHARE_SQL = f"""
WITH v AS (
  SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
         CAST(sum({floor_scale_sql('l_extendedprice * (1.0 - l_discount)')})
              AS BIGINT) AS revenue_c
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, revenue_c FROM v
WHERE revenue_c * 2000 > (SELECT CAST(sum(revenue_c) AS BIGINT) FROM v)
ORDER BY l_partkey
"""


# ---------------------------------------------------------------------------
# Regression / covariance moment sums per segment — the exact integer
# moment vector (n, Σx, Σy, Σxy, Σx², Σy²) that every downstream
# statistic (covariance, Pearson r, OLS slope/intercept, the DuckDB
# regr_* family) is a closed form of.  Keeping the EXACT sums instead
# of the float statistic is the mergeable / partition-invariant form —
# partials combine by addition at any tree depth, so the operator
# composes with checkpointed incremental maintenance.  x = quantity in
# hundredths, y = price in whole dollars (y² bounded within int64 up
# to ~6e8 rows/group; widen the encoding before that).  One bounded
# exchange (merge="driver": the segment domain is bounded).
# ---------------------------------------------------------------------------


def segment_moment_sums(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        x = floor_scale(t["l_quantity"]).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.floor(t["l_extendedprice"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
            }
        )

    return grouped_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag"],
        {
            "n": ("one", "sum"),
            "sum_x": ("sx", "sum"),
            "sum_y": ("sy", "sum"),
            "sum_xy": ("sxy", "sum"),
            "sum_xx": ("sxx", "sum"),
            "sum_yy": ("syy", "sum"),
        },
        merge="driver",
    ).sort("l_returnflag")


SEGMENT_MOMENT_SUMS_SQL = """
WITH v AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 100.0) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag, count(*)::BIGINT AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * y) AS BIGINT) AS sum_xy,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(y * y) AS BIGINT) AS sum_yy
FROM v GROUP BY l_returnflag ORDER BY l_returnflag
"""
