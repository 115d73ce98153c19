"""Cluster entry point: ``ray job submit -- python jobs/run_pipeline.py ...``

Runs a named query pipeline (or a runner config JSON) end-to-end and
prints one JSON line of metrics.  On a real cluster the driver
connects to the existing Ray cluster via RAY_ADDRESS; standalone it
starts a local session.  This is the north rule's "runs end-to-end via
ray job submit" surface (BASELINE.json:14) — the same code that the
sandbox benchmarks via bench.py.

Examples:
    ray job submit --working-dir . -- python jobs/run_pipeline.py \
        --query geo_tile_assign --sf-dir /data/sf0.1
    python jobs/run_pipeline.py --config my_pipeline.json --sf-dir ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", help="name from __ray_entry__.queries()")
    ap.add_argument("--config", help="runner config JSON path")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--output", help="write result parquet to this dir")
    ap.add_argument(
        "--checkpoint-dir",
        help="checkpoint-resumable partitioned output (lineage + _SUCCESS "
        "per partition; reruns skip completed partitions)",
    )
    ap.add_argument("--op-version", default="v1",
                    help="kernel version recorded in lineage; changing it invalidates old partitions")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from geografir_ray.context import tune

    tune()

    t0 = time.perf_counter()
    if args.config:
        from geografir_ray.pipelines.runner import run as run_config

        with open(args.config) as f:
            metrics = run_config(json.load(f), args.sf_dir)
        rows = metrics["rows"]
    elif args.query:
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        if args.query not in qs:
            print(json.dumps({"error": f"unknown query {args.query}",
                              "available": sorted(qs)}))
            return 2
        result = qs[args.query](args.sf_dir)
        if args.checkpoint_dir and hasattr(result, "map_batches"):
            import numpy as np
            import pyarrow as pa

            from geografir_ray.state.checkpoint import checkpointed_write

            def partition_fn(t: pa.Table):
                # partition by hash of the first column (generic layout);
                # spatial pipelines may pass tile/zone keys instead
                col = t.column_names[0]
                k = t[col].to_numpy(zero_copy_only=False)
                try:
                    kv = k.astype(np.int64)
                except (TypeError, ValueError):
                    kv = np.arange(t.num_rows, dtype=np.int64)
                parts = {}
                for pkey in np.unique(kv % 8):
                    parts[str(pkey)] = t.filter(pa.array(kv % 8 == pkey))
                return parts

            report = checkpointed_write(
                result, args.checkpoint_dir, partition_fn, args.op_version,
                input_files=[args.sf_dir],
            )
            print(json.dumps({"checkpoint": report}), file=sys.stderr)
            rows = None
        elif args.output and hasattr(result, "write_parquet"):
            result.write_parquet(args.output)
            rows = None
        elif hasattr(result, "count"):
            rows = result.count()
        else:
            rows = len(result)
    else:
        print(json.dumps({"error": "pass --query or --config"}))
        return 2

    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "query": args.query or args.config,
                "rows": rows,
                "wall_sec": round(wall, 3),
                "sf_dir": args.sf_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
