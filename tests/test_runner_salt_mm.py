"""Pipeline runner, salted aggregation, and multimodal stage tests."""

import numpy as np
import pyarrow as pa
import pytest


def test_runner_config_pipeline(ray_session, sf_small):
    from geografir_ray.pipelines.runner import build, run, stage_names

    config = {
        "table": "customer",
        "columns": ["c_custkey", "c_acctbal"],
        "stages": [
            {"name": "pts", "stage": "derive_points", "params": {"key_col": "c_custkey"}},
            {"name": "cells", "stage": "assign_cells", "params": {"s2_level": 10}},
            {"name": "tiles", "stage": "assign_tiles", "params": {"tile_deg": 2.0}},
            {"name": "rich", "stage": "filter_expr", "params": {"column": "c_acctbal", "op": ">", "value": 0.0}},
            {"name": "proj", "stage": "select", "params": {"columns": ["point_id", "cell_s2", "tile_x", "tile_y"]}},
        ],
    }
    ds = build(config, sf_small)
    df = ds.to_pandas()
    assert set(df.columns) == {"point_id", "cell_s2", "tile_x", "tile_y"}
    assert len(df) > 0

    metrics = run(config, sf_small)
    assert metrics["rows"] == len(df)
    assert metrics["wall_sec"] > 0
    assert "derive_points" in stage_names().__repr__() or "derive_points" in stage_names()


def test_runner_curation_stages():
    # table->table stage functions: exercised directly, no Ray needed
    from geografir_ray.pipelines.runner import _REGISTRY

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "  Contact a@b.com or +1-555-1234 NOW  ",
                    "visit 10.0.0.1 and http://x part deux",
                ]
            ),
        }
    )
    norm = _REGISTRY["normalize_text"]()(t)
    assert norm["norm_text"].to_pylist()[0] == "contact a@b.com or +1-555-1234 now"

    red = _REGISTRY["pii_redact"]()(t)
    assert red["clean_text"].to_pylist()[0] == "  Contact <EMAIL> or <PHONE> NOW  "
    assert red["clean_text"].to_pylist()[1] == "visit <IP> and http://x part deux"
    assert red["n_pii"].to_pylist() == [2, 1]

    rep = _REGISTRY["regex_replace"](pattern=r"\d+", replacement="#")(t)
    assert "+#-#-#" in rep["text"].to_pylist()[0]

    ext = _REGISTRY["regex_extract"](
        pattern=r"(?P<word>[A-Z]{2,})", group="word", out_col="shout"
    )(t)
    assert ext["shout"].to_pylist() == ["NOW", None]

    dec = _REGISTRY["decontaminate"](snippets=["part deux", "absent"])(t)
    assert dec["n_hits"].to_pylist() == [0, 1]
    assert dec["contaminated"].to_pylist() == [False, True]


def test_runner_unknown_stage(ray_session, sf_small):
    from geografir_ray.pipelines.runner import build

    with pytest.raises(KeyError, match="unknown stage"):
        build({"table": "customer", "columns": None,
               "stages": [{"name": "x", "stage": "nope", "params": {}}]}, sf_small)


def test_salted_grouped_sum_matches_plain(ray_session):
    import ray.data as rd

    from geografir_ray.pipelines.common import grouped_sum
    from geografir_ray.stages.salt import salted_grouped_sum

    # zipf-hot keys: 80% of rows on key 0
    n = 20000
    rng = np.random.default_rng(61)
    keys = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 50, n)).astype(np.int64)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"key": keys, "val": vals, "one": np.ones(n, dtype=np.int64)})

    plain = (
        grouped_sum(rd.from_arrow(t), ["key"], {"total": ("val", "sum"), "n": ("one", "sum")})
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    salted = (
        salted_grouped_sum(
            rd.from_arrow(t), "key", {"total": ("val", "sum"), "n": ("one", "sum")}, n_salts=8
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert plain.equals(salted[plain.columns])
    # raw-row mode (combine_per_batch=False): same answer, the exchange
    # carries raw rows spread over salts — the bench-isolation mode
    raw_mode = (
        salted_grouped_sum(
            rd.from_arrow(t),
            "key",
            {"total": ("val", "sum"), "n": ("one", "sum")},
            n_salts=8,
            combine_per_batch=False,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert plain.equals(raw_mode[plain.columns])
    # non-self-mergeable aggs are rejected in raw-row mode
    with pytest.raises(ValueError, match="self-mergeable"):
        salted_grouped_sum(
            rd.from_arrow(t), "key", {"n": ("val", "count")}, combine_per_batch=False
        )
    # ground truth
    import pandas as pd

    truth = (
        pd.DataFrame({"key": keys, "val": vals})
        .groupby("key")
        .agg(total=("val", "sum"), n=("val", "size"))
        .reset_index()
    )
    assert (salted.sort_values("key")["total"].values == truth["total"].values).all()


def test_media_features_stage(ray_session):
    import ray.data as rd

    from geografir_ray.stages.multimodal import MediaFeatures

    payloads = [f"payload-{i}".encode() * (i + 1) for i in range(100)]
    t = pa.table(
        {
            "doc_id": pa.array(range(100), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["fake"] * 100),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(MediaFeatures, fn_constructor_args=("doc_id", "fake"),
                     batch_format="pyarrow", concurrency=2, batch_size=32)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 100
    assert (out["n_bytes"].values == [len(p) for p in payloads]).all()
    assert (out["byte_sum"].values == [sum(p) for p in payloads]).all()
    # deterministic across a second run
    out2 = (
        rd.from_arrow(t)
        .map_batches(MediaFeatures, fn_constructor_args=("doc_id", "fake"),
                     batch_format="pyarrow", concurrency=2, batch_size=32)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.reset_index(drop=True).equals(out2.reset_index(drop=True))


def test_media_unimplemented_formats_raise():
    """png/jpeg/wav/mp4-metadata now have REAL pure-Python codecs
    (tests/test_media.py, test_jpeg.py); only mp4 PIXEL decode (H.264)
    remains library-gated."""
    from geografir_ray.stages.multimodal import DECODERS

    for fmt in ("mp4",):
        with pytest.raises(NotImplementedError, match="codec library"):
            DECODERS[fmt](b"xx")


def test_frame_sample_plan():
    import pyarrow as pa

    from geografir_ray.stages.multimodal import frame_sample_plan

    t = pa.table({"n_frames": pa.array([10, 3, 0], type=pa.int64())})
    out = frame_sample_plan("n_frames", 4)(t)
    assert out["frame_plan"].to_pylist() == [[0, 4, 8], [0], []]


def test_streaming_window_matches_batch(ray_session, sf_small):
    """Actor-sharded streaming tumbling windows == batch groupby when
    no rows are late; late rows are counted under tight lateness."""
    import pandas as pd

    from geografir_ray.sources.tables import read_table_local
    from geografir_ray.stages.streaming import streaming_window_counts

    out, late = streaming_window_counts(sf_small, window_min=60, lateness_min=5)
    assert late == 0  # replay is ts-ordered: nothing can be late

    ev = read_table_local(sf_small, "events", columns=["user_id", "ts", "value"])
    ev["window_start"] = ev["ts"].values.astype("datetime64[h]").astype("datetime64[us]")
    ev["v_c"] = np.floor(ev["value"].values * 100.0).astype(np.int64)
    batch = (
        ev.groupby(["user_id", "window_start"])
        .agg(n_events=("v_c", "size"), sum_value_c=("v_c", "sum"))
        .reset_index()
    )
    batch["sum_value"] = batch["sum_value_c"] / 100.0
    batch = batch[["user_id", "window_start", "n_events", "sum_value"]].sort_values(
        ["user_id", "window_start"], kind="mergesort"
    ).reset_index(drop=True)
    batch["user_id"] = batch["user_id"].astype(out["user_id"].dtype)
    pd.testing.assert_frame_equal(out, batch)


def test_streaming_window_late_rows_counted():
    """Out-of-order ingestion past the watermark+lateness drops+counts."""
    import numpy as np

    from geografir_ray.stages.streaming import WindowShardLogic

    w = WindowShardLogic(window_us=100, lateness_us=0)
    w.ingest(np.array([1]), np.array([50]), np.array([1.0]))     # window 0
    w.ingest(np.array([1]), np.array([250]), np.array([1.0]))    # window 2 -> closes window 0 and 1
    w.ingest(np.array([1]), np.array([10]), np.array([1.0]))     # window 0: LATE
    assert w.late_rows == 1
    closed = w.flush()
    # window 0 emitted once with only the on-time row
    assert (1, 0, 1, 1.0) in closed


def test_hash_join_empty_sides(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.stages.join import hash_join

    left = rd.from_arrow(pa.table({"key": pa.array([1, 2], type=pa.int64()),
                                   "lv": pa.array([10, 20], type=pa.int64())}))
    empty = rd.from_arrow(pa.table({"key": pa.array([], type=pa.int64()),
                                    "rv": pa.array([], type=pa.int64())}))
    out = hash_join(left, empty, on="key", n_buckets=4).to_pandas()
    assert len(out) == 0


def test_range_join_no_matches(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geografir_ray.stages.join import range_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    l = rd.from_arrow(pa.table({"key": pa.array([1], type=pa.int64()),
                                "ts": pa.array([base]),
                                "rid": pa.array([100], type=pa.int64())}))
    r = rd.from_arrow(pa.table({"key": pa.array([1], type=pa.int64()),
                                "ts": pa.array([base + np.timedelta64(10, "h")]),
                                "rid": pa.array([200], type=pa.int64())}))
    out = range_join(l, r, key="key", left_ts="ts", right_ts="ts",
                     tolerance_us=60_000_000).to_pandas()
    assert len(out) == 0


def test_runner_text_stages(ray_session, sf_small):
    """The text/training-data stages compose in a config-driven run:
    langid -> token_stats -> stratified_sample -> content_hash."""
    from geografir_ray.pipelines.runner import build, stage_names

    for s in ("hash_sample", "stratified_sample", "token_stats", "langid", "content_hash"):
        assert s in stage_names()

    config = {
        "table": "documents",
        "columns": ["doc_id", "lang", "text"],
        "stages": [
            {"name": "lid", "stage": "langid", "params": {}},
            {"name": "stats", "stage": "token_stats", "params": {}},
            {
                "name": "strat",
                "stage": "stratified_sample",
                "params": {"key_col": "doc_id", "stratum_col": "lang", "major": "en"},
            },
            {"name": "hash", "stage": "content_hash", "params": {}},
        ],
    }
    out = build(config, sf_small).to_pandas()
    assert set(
        ["doc_id", "lang", "text", "lang_pred", "n_tokens", "distinct_pct",
         "stopword_pct", "text_hash"]
    ) <= set(out.columns)
    # sampling matches the standalone query's row set
    from geografir_ray.pipelines.documents import docs_stratified_sample

    expect = docs_stratified_sample(sf_small).to_pandas()
    assert sorted(out["doc_id"]) == sorted(expect["doc_id"])


def test_runner_curation_chain_e2e(ray_session, sf_small):
    """A YAML-shaped config chains the curation stages end-to-end over
    the documents table through build(): normalize -> redact ->
    decontaminate, with metrics from run()."""
    from geografir_ray.pipelines.runner import build, run

    cfg = {
        "table": "documents",
        "columns": ["doc_id", "text"],
        "stages": [
            {"name": "norm", "stage": "normalize_text", "params": {}},
            {"name": "pii", "stage": "pii_redact", "params": {"text_col": "norm_text"}},
            {
                "name": "decon",
                "stage": "decontaminate",
                "params": {"snippets": ["the fast key"], "text_col": "clean_text"},
            },
        ],
    }
    df = build(cfg, sf_small).to_pandas()
    assert {"doc_id", "norm_text", "clean_text", "n_pii", "contaminated"} <= set(
        df.columns
    )
    assert len(df) == 500
    # normalize really lowercased + collapsed whitespace
    assert df["norm_text"].str.contains(r"[A-Z]").sum() == 0
    assert not df["norm_text"].str.contains("  ", regex=False).any()
    # decontaminate matched at least one doc on the known corpus phrase
    assert df["contaminated"].any()

    metrics = run(cfg, sf_small)
    assert metrics["rows"] == 500
    assert metrics["rows_per_sec"] is None or metrics["rows_per_sec"] > 0


def test_salted_distinct_count_exact(ray_session):
    """Value-salted distinct count == pandas nunique on a zipf-hot key,
    invariant to bucket count and block layout."""
    import pandas as pd
    import ray.data as rd

    from geografir_ray.stages.salt import salted_distinct_count

    n = 30000
    rng = np.random.default_rng(17)
    keys = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 40, n)).astype(np.int64)
    vals = rng.integers(0, 5000, n).astype(np.int64)
    t = pa.table({"key": keys, "v": vals})

    want = (
        pd.DataFrame({"key": keys, "v": vals})
        .groupby("key")["v"]
        .nunique()
        .rename("n_distinct")
        .reset_index()
    )
    for n_buckets, blocks in [(7, 1), (64, 13)]:
        got = (
            salted_distinct_count(
                rd.from_arrow(t).repartition(blocks), "key", "v", n_buckets=n_buckets
            )
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_stream_join_chunk_invariance(ray_session, sf_small):
    """StreamJoin results must not depend on replay chunk boundaries —
    including splits between equal-timestamp rows (the strict
    l.ts < r.ts bound is what guarantees it)."""
    from geografir_ray.stages.streaming import streaming_interval_join

    a = streaming_interval_join(sf_small, window_min=60, chunk_rows=1)
    b = streaming_interval_join(sf_small, window_min=60, chunk_rows=2000)
    c = streaming_interval_join(sf_small, window_min=60, chunk_rows=7)
    assert a.equals(b)
    assert a.equals(c)


def test_stream_join_buffer_bounded(ray_session, sf_small):
    """The left buffer must hold only the trailing window, not the
    whole stream (the streaming-state guarantee)."""
    import numpy as np
    import ray

    from geografir_ray.stages.streaming import StreamJoinShardLogic

    Shard = ray.remote(StreamJoinShardLogic)
    s = Shard.remote(60 * 60 * 1_000_000)
    n = 50_000
    ts = np.arange(n, dtype=np.int64) * 10_000_000  # 10s apart -> 500s span/chunk
    keys = np.zeros(n, dtype=np.int64)
    vals = np.ones(n, dtype=np.int64)
    is_left = np.ones(n, dtype=bool)
    rid = np.arange(n, dtype=np.int64)
    for st in range(0, n, 5000):
        sel = slice(st, st + 5000)
        ray.get(s.ingest.remote(keys[sel], ts[sel], vals[sel], is_left[sel], rid[sel]))
    buffered = ray.get(s.buffered.remote())
    assert buffered <= 60 * 60 // 10 + 5000  # trailing hour + one chunk slack
