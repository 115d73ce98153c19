"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_table(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray Dataset
    import ray

    if isinstance(result, ray.data.Dataset):
        tables = [
            b for b in result.iter_batches(batch_size=None, batch_format="pyarrow")
        ]
        tables = [t for t in tables if t.num_rows > 0] or tables[:1]
        return (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else pa.table({})
        )
    raise TypeError(type(result))


def value_hash(table) -> str:
    """Order-insensitive: sort columns by name, sort rows by all columns,
    hash the CSV-ish repr with floats at repr precision."""
    import pyarrow as pa

    cols = sorted(table.column_names)
    table = table.select(cols)
    df = table.to_pandas()
    if len(df):
        df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        vals = df[c].tolist()
        for v in vals:
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()

    con = duckdb.connect()
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_table(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {got.num_rows} rows, cols={sorted(got.column_names)}")
            continue
        try:
            want = con.sql(oracles[name]).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok_rows = got.num_rows == want.num_rows
        ok_schema = sorted(got.column_names) == sorted(want.column_names)
        gh = value_hash(got)
        wh = value_hash(want)
        ok_hash = gh == wh
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"[{status}] {name}: rows {got.num_rows}/{want.num_rows} "
            f"schema={'ok' if ok_schema else f'{sorted(got.column_names)} vs {sorted(want.column_names)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_schema:
                # print first differing rows to debug
                gd = got.to_pandas().sort_values(sorted(got.column_names)).reset_index(drop=True)
                wd = want.to_pandas().sort_values(sorted(want.column_names)).reset_index(drop=True)
                gd = gd[sorted(gd.columns)]
                wd = wd[sorted(wd.columns)]
                diff = (gd != wd) & ~(gd.isna() & wd.isna())
                bad = diff.any(axis=1)
                print("  first diffs (ray vs oracle):")
                print(gd[bad].head(3).to_string())
                print(wd[bad].head(3).to_string())
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
