"""Web-corpus curation operators: PII redaction, URL analytics,
paragraph-level dedup, decontamination, rank windows, pivot.

Each new queries() entry is exercised two ways: semantic invariants
here, plus its exact SQL oracle at sf0.001 (the same comparison the
driver runs at sf0.01)."""

import re

import duckdb
import pandas as pd
import pytest


def _oracle(sf_small: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return con.execute(sql).df()


def _cmp(got: pd.DataFrame, exp: pd.DataFrame):
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pii_redact_oracle_and_no_residual_pii(ray_session, sf_small):
    from geografir_ray.pipelines.documents import (
        _PII_EMAIL_RE,
        _PII_IP_RE,
        _PII_PHONE_RE,
        DOCS_PII_REDACT_SQL,
        docs_pii_redact,
    )

    got = docs_pii_redact(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, DOCS_PII_REDACT_SQL))
    # every injected PII instance was found and scrubbed
    assert (got["n_email"] >= 1).all()
    assert (got["n_phone"] >= 1).all()
    assert (got["n_ip"] >= 1).all()
    joined = " ".join(got["clean_text"].tolist())
    for pat in (_PII_EMAIL_RE, _PII_PHONE_RE, _PII_IP_RE):
        assert re.search(pat, joined) is None
    assert "<EMAIL>" in joined and "<PHONE>" in joined and "<IP>" in joined


def test_url_parse_and_domain_stats_oracle(ray_session, sf_small):
    from geografir_ray.pipelines.documents import (
        DOCS_DOMAIN_STATS_SQL,
        DOCS_URL_PARSE_SQL,
        docs_domain_stats,
        docs_url_parse,
    )

    parsed = docs_url_parse(sf_small).to_pandas()
    _cmp(parsed, _oracle(sf_small, DOCS_URL_PARSE_SQL))
    assert (parsed["tld"] == parsed["domain"].str.split(".").str[-1]).all()
    assert (parsed["path_depth"] == 3).all()

    stats = docs_domain_stats(sf_small).to_pandas()
    _cmp(stats, _oracle(sf_small, DOCS_DOMAIN_STATS_SQL))
    assert stats["n_docs"].sum() == len(parsed)


def test_paragraph_dedup_oracle_and_invariants(ray_session, sf_small):
    from geografir_ray.pipelines.documents import (
        DOCS_PARAGRAPH_DEDUP_SQL,
        docs_paragraph_dedup,
    )

    got = docs_paragraph_dedup(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, DOCS_PARAGRAPH_DEDUP_SQL))
    # survivors are globally distinct, and dedup actually removed some
    assert got["para"].is_unique
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_small}/documents.parquet", columns=["text"])
    total = sum(len(t.split(" part ")) for t in texts["text"].to_pylist())
    assert len(got) < total


def test_decontaminate_oracle_and_bench_docs_flagged(ray_session, sf_small):
    from geografir_ray.pipelines.documents import (
        DOCS_DECONTAMINATE_SQL,
        docs_decontaminate,
    )

    got = docs_decontaminate(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, DOCS_DECONTAMINATE_SQL))
    # every benchmark doc contains its own snippet
    bench = got[got["doc_id"] % 97 == 0]
    assert len(bench) >= 1
    assert bench["contaminated"].all()


def test_events_rank_oracle_and_bounds(ray_session, sf_small):
    from geografir_ray.pipelines.events import EVENTS_RANK_SQL, events_rank

    got = events_rank(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, EVENTS_RANK_SQL))
    assert got["nt"].between(1, 4).all()
    # dense_rank <= rank <= row_number, everywhere
    assert (got["drnk"] <= got["rnk"]).all()
    assert (got["rnk"] <= got["rown"]).all()
    # per user: row_number is a permutation of 1..n
    per = got.groupby("user_id")["rown"]
    assert (per.max() == per.count()).all()
    assert (per.min() == 1).all()


def test_events_pivot_oracle_and_totals(ray_session, sf_small):
    from geografir_ray.pipelines.events import EVENTS_PIVOT_SQL, events_pivot

    got = events_pivot(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, EVENTS_PIVOT_SQL))
    counts = got[["n_click", "n_view", "n_purchase", "n_signup", "n_error"]]
    import pyarrow.parquet as pq

    n_events = pq.read_table(f"{sf_small}/events.parquet", columns=["event_id"]).num_rows
    assert int(counts.to_numpy().sum()) == n_events


def test_bpe_token_count_oracle_and_ordering(ray_session, sf_small):
    from geografir_ray.pipelines.documents import (
        DOCS_BPE_TOKEN_SQL,
        docs_bpe_token_count,
    )

    got = docs_bpe_token_count(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, DOCS_BPE_TOKEN_SQL))
    # a BPE-ish pretokenization never yields fewer tokens than
    # whitespace splitting (it only splits finer)
    assert (got["n_bpe"] >= got["n_ws"]).all()
    assert (got["n_ws"] > 0).all()


def test_bigrams_oracle_and_handcheck(ray_session, sf_small):
    from geografir_ray.pipelines.documents import docs_bigrams, docs_bigrams_sql

    got = docs_bigrams(sf_small, k=30).to_pandas()
    _cmp(got, _oracle(sf_small, docs_bigrams_sql(30)))
    # hand-check the global top bigram against a direct python count
    import collections

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_small}/documents.parquet", columns=["text"])
    counts = collections.Counter()
    for t in texts["text"].to_pylist():
        toks = [w for w in t.split(" ") if w]
        counts.update(" ".join(p) for p in zip(toks, toks[1:]))
    best = min(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1])
    assert (got["bigram"].iloc[0], got["n"].iloc[0]) == best


def test_events_funnel_oracle_and_monotone(ray_session, sf_small):
    from geografir_ray.pipelines.events import EVENTS_FUNNEL_SQL, events_funnel

    got = events_funnel(sf_small).to_pandas()
    _cmp(got, _oracle(sf_small, EVENTS_FUNNEL_SQL))
    # funnel stages only narrow: purchases require a qualifying click
    no_click = got[got["n_click_after"] == 0]
    assert (no_click["n_purchase_after"] == 0).all()
    assert got["user_id"].is_unique


def test_chunk_windows_edge_cases(ray_session, tmp_path):
    """The zero-Python window explode agrees with the DuckDB twin on
    adversarial docs the synth corpus never contains: empty text,
    all-spaces, single token, exact window/stride boundaries."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import (
        CHUNK_S,
        CHUNK_W,
        docs_chunk_windows,
        docs_chunk_windows_sql,
    )

    texts = [
        "",  # no tokens -> no windows
        "   ",  # only separators -> no tokens
        "solo",  # one token -> one window of len 1
        "a  b   c",  # multi-space runs collapse
        " ".join(f"t{i}" for i in range(CHUNK_S)),  # exactly one stride
        " ".join(f"t{i}" for i in range(CHUNK_W)),  # exactly one window
        " ".join(f"t{i}" for i in range(CHUNK_W + 1)),  # spills into window 2
        " ".join(f"t{i}" for i in range(3 * CHUNK_S + 5)),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "edge"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = docs_chunk_windows(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    exp = con.execute(docs_chunk_windows_sql()).df()
    assert got.values.tolist() == exp.values.tolist()
    assert set(got[got["doc_id"] < 2]["doc_id"]) == set()  # empty docs: no rows
    con.close()


def test_jsonl_roundtrip_adversarial_text(ray_session, tmp_path):
    """JSONL write -> ray.data.read_json recovers adversarial text
    byte-identically: unicode, embedded newlines/tabs, quotes,
    backslashes, empty strings."""
    import pyarrow as pa

    from geografir_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    texts = [
        "plain ascii",
        "",
        'quotes " and \\ backslash',
        "line\nbreak\ttab\rcarriage",
        "unicodé ß 中文 \U0001f600",
        " leading and trailing ",
        "null-ish \\u0000 literal",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    d = str(tmp_path / "jl")
    paths = write_jsonl_shards(t, d, key="doc_id", n_shards=3)
    assert len(paths) == 3
    got = (
        read_jsonl(d, columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == texts
    assert got["doc_id"].tolist() == list(range(len(texts)))


def test_normalized_dedup_collapses_variants(ray_session, tmp_path):
    """Normalized dedup merges case/punct/whitespace variants that
    exact dedup keeps apart, agrees with the DuckDB twin on crafted
    variants, and keeps the min doc_id as winner."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import (
        DOCS_NORMALIZED_DEDUP_SQL,
        docs_normalized_dedup,
    )

    texts = [
        "Hello, World!",          # 0: canonical
        "hello world",            # 1: dup of 0 after norm
        "  HELLO   WORLD?? ",     # 2: dup of 0 after norm
        "hello world!!!",         # 3: dup of 0 after norm
        "goodbye world",          # 4: distinct
        "Goodbye,   world.",      # 5: dup of 4
        "",                       # 6: empty
        "  ...  ",                # 7: normalizes to empty -> dup of 6
        "unique one",             # 8
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "norm"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = docs_normalized_dedup(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    exp = con.execute(DOCS_NORMALIZED_DEDUP_SQL).df()
    con.close()
    assert got.values.tolist() == exp.values.tolist()
    # winners: 0 (x4), 4 (x2), 6 (x2), 8 (x1)
    assert dict(zip(got["doc_id"], got["n_dupes"])) == {0: 4, 4: 2, 6: 2, 8: 1}


def test_incremental_dedup_paths_agree_and_match_oracle(ray_session, sf_small):
    """Broadcast fast path == forced shuffle anti-join == DuckDB NOT EXISTS."""
    import duckdb

    from geografir_ray.pipelines.documents import (
        DOCS_INCREMENTAL_DEDUP_SQL,
        docs_incremental_dedup,
    )

    a = docs_incremental_dedup(sf_small).to_pandas()
    b = docs_incremental_dedup(sf_small, broadcast_threshold=0).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["doc_id"] % 2 == 1).all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    exp = con.execute(DOCS_INCREMENTAL_DEDUP_SQL).df()
    con.close()
    assert a["doc_id"].tolist() == exp["doc_id"].tolist()


def test_tfidf_pairs_oracle_and_ranking(ray_session, sf_small):
    """Integer TF-IDF pair scores match DuckDB bitwise; ranking is a
    total order (score desc, a, b)."""
    import duckdb

    from geografir_ray.pipelines.documents import (
        DOCS_TFIDF_PAIRS_SQL,
        docs_tfidf_pairs,
    )

    got = docs_tfidf_pairs(sf_small).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'"
    )
    exp = con.execute(DOCS_TFIDF_PAIRS_SQL).df()
    con.close()
    assert got[["a", "b", "score"]].values.tolist() == exp.values.tolist()
    s = got["score"].values
    assert (s[:-1] >= s[1:]).all()


def test_crosscorpus_neardup_brute_containment(ray_session, sf_small):
    """Every emitted cross-corpus pair is a TRUE near-dup (exact
    jaccard >= threshold, verified brute-force), pairs are strictly
    cross-side, and the run is deterministic."""
    import pyarrow.parquet as pq

    from geografir_ray.functions import text as T
    from geografir_ray.pipelines.documents import docs_crosscorpus_neardup

    # gate recall at the near-identical end (0.9), where the LSH
    # S-curve (16 bands x 8 rows) collides with probability ~1
    thr = 0.9
    got = docs_crosscorpus_neardup(sf_small, threshold=thr).to_pandas()
    again = docs_crosscorpus_neardup(sf_small, threshold=thr).to_pandas()
    assert got.values.tolist() == again.values.tolist()

    docs = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    toks = {
        int(r.doc_id): set(T.shingle_hashes(r.text or "", k=3).tolist())
        for r in docs.itertuples()
    }
    # containment: every emitted pair is cross-side and truly >= thr
    for inc, cor, jp in got[["inc_doc", "cor_doc", "jaccard_pct"]].values.tolist():
        assert inc % 2 == 1 and cor % 2 == 0
        si, sc = toks[inc], toks[cor]
        j = len(si & sc) / max(len(si | sc), 1)
        assert j >= thr
        assert int(j * 100) == jp
    # recall vs brute force over all cross pairs at the near-identical
    # end (at shingle-j >= 0.9 the signatures band-collide with
    # probability ~1; exact dups at j = 1.0 are always caught)
    brute = set()
    for a in toks:
        if a % 2 == 0:
            continue
        for b in toks:
            if b % 2 == 1:
                continue
            si, sc = toks[a], toks[b]
            if si or sc:
                if len(si & sc) / max(len(si | sc), 1) >= thr:
                    brute.add((a, b))
    emitted = set(zip(got["inc_doc"].tolist(), got["cor_doc"].tolist()))
    assert emitted <= brute
    if brute:
        assert len(emitted) / len(brute) >= 0.6


def test_simhash_dedup_matches_brute_force(ray_session, sf_small):
    """docs_simhash_dedup == the global all-pairs keep-first rule
    (banded recall is exactly 1 for tau <= 3 by pigeonhole)."""
    import numpy as np
    import pyarrow.parquet as pq

    from geografir_ray.functions import text as T
    from geografir_ray.functions.text import hamming64
    from geografir_ray.pipelines.documents import SIMHASH_HAM_TAU, docs_simhash_dedup

    out = docs_simhash_dedup(sf_small).to_pandas()

    tb = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by("doc_id")
    ids = tb["doc_id"].to_numpy().astype(np.int64)
    sh = T.simhash64_arrow(tb["text"].combine_chunks())
    keep = []
    for i in range(len(ids)):
        dup = False
        for j in range(i):
            if int(hamming64(sh[i : i + 1], sh[j : j + 1])[0]) <= SIMHASH_HAM_TAU:
                dup = True
                break
        if not dup:
            keep.append(int(ids[i]))
    assert out["doc_id"].tolist() == keep
    assert len(keep) < len(ids)  # the corpus has near-dups to drop
