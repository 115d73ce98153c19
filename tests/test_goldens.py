"""Value-pinned goldens for the rows-only queries (VERDICT r1 item 6).

These queries have no SQL oracle (hash seeds / heuristic models /
cell-id bit layouts are not SQL-expressible), but their outputs are
fully deterministic — so the whole result is pinned as a sha256 over
the column-sorted, row-sorted CSV at sf0.001.  Any change to seeds,
bit layouts, rounding, or partitioning-sensitive logic fails here
loudly instead of drifting silently under a bare row-count check.
"""

import hashlib

import pytest

_GOLDEN = {
    # name -> (rows, sha256 of sorted csv)
    "docs_simhash": (500, "f89d7b6d51960c20c9fc166f1cf315fd9dd52f8da5fe9e4ebe9882ef371ba9ea"),
    "docs_fingerprints": (7888, "e79d043cc08e88e191684bacafe156391ffb683ef11838507f82b522cbd62897"),
    "geo_cells": (150, "79332936dfcd613fbeda749e79412c8b70c606d96d86709962f53f525537b5c9"),
    "emb_label_stats": (10, "5477897f8f5631e948f5fdd6e62d5e23650c78d0ebe87dcf9fa19544e2124066"),
    "docs_langid_quality": (500, "c567c6ace04993eda2fcd5431b432c6d7d9e3326aacad34f9785d0e91d578fe9"),
    "mm_features": (500, "606ec6e062b9d31da89c195018d0a3723cb5f8f03cfc264f92daed5a1f07657c"),
    # real-codec paths: synth payload -> pure-Python PNG/WAV decode in
    # an actor pool (tests/test_media.py proves the codecs themselves)
    "mm_image_features": (500, "add8284d93717f5bdd72cbf49fc1cd4dda44f4cf024456409e9dc68ecc6c658e"),
    "mm_audio_features": (500, "10cc698110d450121f5067ac39d8565c3be7a30f172efc061bd6e5ab72f0491c"),
    "mm_image_patches": (5224, "41d801c08c309e4abfa95f607902452ef091f21d889cd50b7241d3dbe9438734"),
    "mm_audio_spectrogram": (4000, "be1560c7f62a8c5456ecc6910eb18340d73987a5a7e2ad163cf2a4d15cf73475"),
    "emb_mmr_topk": (50, "f79e5aa937aa58568f39713ad6febd1394fff777c6a18399361417a337b23f2e"),
}


def _result_hash(df) -> str:
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_rows_only_golden(ray_session, sf_small, name):
    import __ray_entry__ as E

    res = E.queries()[name](sf_small)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    rows, digest = _GOLDEN[name]
    assert len(df) == rows
    assert _result_hash(df) == digest
