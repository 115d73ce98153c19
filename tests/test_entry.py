"""End-to-end smoke + correctness tests through the driver contract."""

import numpy as np
import pytest


def test_entry_flagship(ray_session):
    import __ray_entry__ as E

    ds = E.entry()
    df = ds.to_pandas()
    assert len(df) > 0
    assert list(df.columns) == ["zone_id", "n_points", "sum_qty"]
    assert (df["n_points"] > 0).all()
    assert df["zone_id"].is_unique


def test_queries_have_oracles_or_are_documented(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only queries are the documented non-SQL-expressible ones
    assert set(qs) - set(oracles) == {
        "geo_cells",
        "docs_minhash_lsh",
        "docs_crosscorpus_neardup",
        "docs_simhash",
        "docs_simhash_dedup",
        "docs_langid_quality",
        "docs_fingerprints",
        "emb_label_stats",
        "emb_ivf_knn",
        "emb_ivf_join",
        "emb_pq_knn",
        "emb_sq_knn",
        "emb_pq_refine_knn",
        "emb_ivfpq_knn",
        "emb_kmeans",
        "emb_pca_power",
        "emb_mmr_topk",
        "emb_semantic_dedup",
        "mm_features",
        "mm_image_features",
        "mm_phash_dedup",
        "mm_audio_features",
        "mm_image_patches",
        "mm_audio_spectrogram",
        "approx_distinct_parts",
        "approx_quantiles_price",
    }


def test_pip_join_small_oracle(ray_session, sf_small):
    """Partitioned PIP join vs direct closed-form evaluation at sf0.001."""
    import pyarrow.parquet as pq

    from geografir_ray.functions import synthgeo
    from geografir_ray.pipelines.spatial import N_ZONES, pip_customer_zones

    out = pip_customer_zones(sf_small).to_pandas()

    cust = pq.read_table(f"{sf_small}/customer.parquet", columns=["c_custkey"])
    k = cust["c_custkey"].to_numpy().astype(np.int64)
    lat = synthgeo.synth_lat(k)
    lon = synthgeo.synth_lon(k)
    zp = synthgeo.zone_params(np.arange(N_ZONES, dtype=np.int64))
    expect = set()
    for z in range(N_ZONES):
        inside = synthgeo.point_in_diamond(
            lon, lat, zp["cx"][z], zp["cy"][z], zp["rx"][z], zp["ry"][z]
        )
        for pid in k[inside]:
            expect.add((int(pid), z))
    got = set(zip(out["point_id"].tolist(), out["zone_id"].tolist()))
    assert got == expect


def test_tile_assign_deterministic(ray_session, sf_small):
    from geografir_ray.pipelines.spatial import tile_assign

    a = tile_assign(sf_small).to_pandas()
    b = tile_assign(sf_small).to_pandas()
    assert a.equals(b)


def test_sample_prefix_spans_operator_families():
    """The first 50 queries() entries (the driver's CORRECTNESS sample)
    must include every operator family."""
    import __ray_entry__ as E

    names = list(E.queries())
    assert names[:50] == E._SAMPLE_PREFIX
    prefix = set(names[:50])
    families = {
        "relational": {"q1_pricing_summary", "join_orders_bucketed"},
        "window": {"top_parts_per_nation"},
        "order_stats": {"exact_price_quantiles"},
        "sketch": {"approx_distinct_parts"},
        "string_sim": {"cust_name_editdist", "cust_entity_resolution"},
        "spatial": {"geo_pip_join", "geo_knn", "geo_knn_partitioned", "geo_cells"},
        "events": {"events_sessions", "events_asof_signup", "events_stream_join"},
        "north_star": {"docs_locations", "docs_extract_zonal", "docs_text_passthrough"},
        "dedup": {"docs_exact_dedup", "docs_minhash_lsh", "docs_simhash_dedup",
                  "docs_neardup_purge", "docs_dedup_components"},
        "export": {"docs_partitioned_export"},
        "graph": {"graph_pagerank", "graph_triangles"},
        "ann": {"emb_knn", "emb_ivf_knn", "emb_pq_refine_knn", "emb_kmeans"},
        "raster": {"raster_tile_stats", "raster_conform", "raster_regions"},
        "multimodal": {"mm_image_features", "mm_audio_features"},
    }
    for fam, members in families.items():
        assert members & prefix, f"family {fam} absent from the 50-entry sample"
