"""Text kernel tests: tokenization contract, minhash/simhash properties,
fingerprints, langid determinism."""

import numpy as np

from geografir_ray.functions import text


def test_tokenize_matches_sql_contract():
    # contract: split on single spaces, drop empties — matches
    # list_filter(string_split(text, ' '), x -> x <> '')
    assert text.tokenize("a b  c") == ["a", "b", "c"]
    assert text.tokenize(" a ") == ["a"]
    assert text.tokenize("") == []
    assert text.token_counts(["a b", "", "x  y z"]).tolist() == [2, 0, 3]
    assert text.distinct_token_counts(["a a b", "x"]).tolist() == [2, 1]


def test_quality_stats():
    s = text.quality_stats(["the cat sat", "", "aaa aaa aaa"])
    assert s["n_tokens"].tolist() == [3, 0, 3]
    assert s["n_distinct"].tolist() == [3, 0, 1]
    assert abs(s["stopword_ratio"][0] - 1 / 3) < 1e-12
    assert s["distinct_ratio"][2] == 1 / 3


def test_minhash_similarity_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different words in this particular document right here now"
    sa = text.minhash_signature(text.shingle_hashes(a), 128)
    sb = text.minhash_signature(text.shingle_hashes(b), 128)
    sc = text.minhash_signature(text.shingle_hashes(c), 128)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    true_ab = _shingle_jaccard(a, b)
    assert abs(sim_ab - true_ab) < 0.2
    assert sim_ac < 0.1
    # identical docs -> identical signatures
    np.testing.assert_array_equal(sa, text.minhash_signature(text.shingle_hashes(a), 128))


def _shingle_jaccard(a, b, k=3):
    sa = set(map(tuple, zip(*[text.tokenize(a)[i:] for i in range(k)])))
    sb = set(map(tuple, zip(*[text.tokenize(b)[i:] for i in range(k)])))
    return len(sa & sb) / len(sa | sb)


def test_minhash_bands_deterministic():
    sig = text.minhash_signature(text.shingle_hashes("a b c d e f g h i j"), 128)
    b1 = text.minhash_bands(sig, 16)
    b2 = text.minhash_bands(sig, 16)
    np.testing.assert_array_equal(b1, b2)
    assert len(b1) == 16


def test_simhash_properties():
    a = "the quick brown fox jumps over the lazy dog and runs far away"
    b = "the quick brown fox jumps over the lazy dog and runs far home"
    c = "zx qv wt yu io pl mn bv cx zl kj hg fd sa qw er"
    ha, hb, hc = text.simhash64(a), text.simhash64(b), text.simhash64(c)
    d_ab = text.hamming64(np.array([ha]), np.array([hb]))[0]
    d_ac = text.hamming64(np.array([ha]), np.array([hc]))[0]
    assert d_ab < d_ac
    assert text.simhash64(a) == ha  # deterministic
    assert text.simhash64("") == 0


def test_hamming64():
    assert text.hamming64(np.array([0]), np.array([0]))[0] == 0
    assert text.hamming64(np.array([0xFFFFFFFFFFFFFFFF]), np.array([0]))[0] == 64
    assert text.hamming64(np.array([0b1011]), np.array([0b0010]))[0] == 2


def test_rolling_fingerprints():
    a = "some reasonably long document text for fingerprinting purposes here"
    f1 = text.rolling_fingerprints(a)
    f2 = text.rolling_fingerprints(a)
    np.testing.assert_array_equal(f1, f2)
    # sharing a long substring -> sharing fingerprints
    b = "PREFIX " + a + " SUFFIX"
    fb = text.rolling_fingerprints(b)
    common = np.intersect1d(f1, fb)
    assert len(common) >= len(f1) * 0.8
    assert len(text.rolling_fingerprints("tiny")) == 0


def test_jaccard_token_sets():
    assert text.jaccard_token_sets("a b c", "a b c") == 1.0
    assert text.jaccard_token_sets("a b", "c d") == 0.0
    assert text.jaccard_token_sets("", "") == 1.0


def test_langid_deterministic_signals():
    out = text.langid(
        [
            "the cat is on the mat and the dog is in the house",
            "la casa de la playa que está en la ciudad de madrid",
            "der hund und die katze schlafen unter einem schönen baum",
            "这是一个中文句子用于测试语言识别",
            "",
        ]
    )
    assert out[0] == "en"
    assert out[3] == "zh"
    assert out[4] == "und"


def test_bloom_filter_no_false_negatives_and_low_fp():
    from geografir_ray.functions.hashing import BloomFilter

    rng = np.random.default_rng(83)
    members = rng.integers(0, 2**62, 50_000).astype(np.uint64)
    others = rng.integers(0, 2**62, 50_000).astype(np.uint64)
    others = np.setdiff1d(others, members)
    bf = BloomFilter(capacity=len(members), fp_rate=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # NO false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 0.03, fp  # near the configured rate


def test_hyperloglog_accuracy_and_merge_invariance():
    from geografir_ray.functions.hashing import splitmix64
    from geografir_ray.functions.sketch import HyperLogLog

    rng = np.random.default_rng(89)
    keys = rng.integers(0, 2**62, 200_000).astype(np.uint64)
    true_n = len(np.unique(keys))

    # single sketch
    one = HyperLogLog(p=12)
    one.add_hashes(keys)
    est = one.estimate()
    assert abs(est - true_n) / true_n < 0.05  # ~1.6% expected stderr

    # partition-invariant merge: 7 arbitrary splits -> identical registers
    merged = HyperLogLog(p=12)
    for chunk in np.array_split(keys, 7):
        part = HyperLogLog(p=12)
        part.add_hashes(chunk)
        merged = merged.merge(part)
    np.testing.assert_array_equal(merged.registers, one.registers)

    # serialization roundtrip
    back = HyperLogLog.deserialize(one.serialize())
    np.testing.assert_array_equal(back.registers, one.registers)
    assert back.estimate() == est


def test_hyperloglog_small_range_linear_counting():
    from geografir_ray.functions.sketch import HyperLogLog

    hll = HyperLogLog(p=12)
    keys = np.arange(100, dtype=np.uint64)
    hll.add_hashes(keys)
    assert abs(hll.estimate() - 100) < 3


def test_flat_tokens_vectorized_matches_per_row():
    import pyarrow as pa

    texts = ["a  b c", "", None, "  ", "hello world hello"]
    flat, docidx, counts = text.flat_tokens(pa.array(texts, type=pa.string()))
    expect = [text.tokenize(t) if t else [] for t in texts]
    assert flat.to_pylist() == [w for ws in expect for w in ws]
    assert counts.tolist() == [len(ws) for ws in expect]
    assert docidx.tolist() == [i for i, ws in enumerate(expect) for _ in ws]


def test_siphash24_arrow_matches_pandas_path():
    """The Arrow-buffer siphash fast path is bit-identical to the
    pandas hash_pandas_object values hash_strings always produced."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from geografir_ray.functions.hashing import hash_strings, siphash24_arrow

    rng = np.random.default_rng(7)
    vals = ["", "a", "hello", "x" * 8, "y" * 16, "z" * 23,
            "héllo wörld 中文テスト", "https://site42.example/1234567"]
    vals += ["s%d/%s" % (i, "t" * int(rng.integers(0, 40))) for i in range(2000)]
    want = pd.util.hash_pandas_object(
        pd.Series(vals, dtype=object), index=False, hash_key="geografir_ray_00"
    ).values
    arr = pa.array(vals, pa.string())
    assert np.array_equal(siphash24_arrow(arr), want)
    assert np.array_equal(hash_strings(arr), want)  # fast path dispatch
    assert np.array_equal(hash_strings(vals), want)  # legacy list path
    # offset-sliced and chunked inputs
    assert np.array_equal(siphash24_arrow(arr.slice(3, 1000)), want[3:1003])
    ch = pa.chunked_array([arr.slice(0, 100), arr.slice(100)])
    assert np.array_equal(siphash24_arrow(ch), want)
    # large_string + binary types
    assert np.array_equal(siphash24_arrow(pa.array(vals, pa.large_string())), want)


def test_minhash_signatures_arrow_matches_batch():
    """Arrow-native minhash (buffer FNV + flat shingling) is
    bit-identical to minhash_signatures_batch, including empty docs,
    short docs (< k tokens), repeated separators and multibyte text."""
    import numpy as np
    import pyarrow as pa

    from geografir_ray.functions import text as T

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "x", "yy"]
    texts = []
    for i in range(1500):
        L = int(rng.integers(0, 9))
        toks = [vocab[int(rng.integers(0, len(vocab)))] + str(i % 13) for _ in range(L)]
        sep = "  " if i % 17 == 0 else " "
        texts.append(sep.join(toks))
    texts += ["", " ", "  ", "one", "one two", "one two three",
              "héllo wörld 中文 test five six"]
    col = pa.array(texts, pa.string())
    for k in (2, 3, 5):
        want = T.minhash_signatures_batch(texts, 64, k=k)
        got = T.minhash_signatures_arrow(col, 64, k=k)
        assert np.array_equal(got, want), f"k={k}"
    # token-level FNV parity
    toks = [t for txt in texts for t in T.tokenize(txt)]
    assert np.array_equal(
        T.token_hashes_arrow(pa.array(toks, pa.string())), T.token_hashes(toks)
    )


def test_token_count_stats_arrow_parity():
    """token_counts_arrow / token_count_stats_arrow must equal the
    per-row scalar twins (string-exact distinct, not hash-based)."""
    import pyarrow as pa

    from geografir_ray.functions import text as T

    texts = [
        "a b c a", "", None, "x", "  spaced   out  ",
        "dup dup dup", "one two three four five six",
        "tok" * 50 + " other", "ünï çødé ünï",
    ]
    col = pa.array(texts, type=pa.string())
    clean = [t if t is not None else "" for t in texts]
    n_tok, n_dis = T.token_count_stats_arrow(col)
    np.testing.assert_array_equal(n_tok, T.token_counts(clean))
    np.testing.assert_array_equal(n_dis, T.distinct_token_counts(clean))
    np.testing.assert_array_equal(T.token_counts_arrow(col), T.token_counts(clean))
    # all-empty batch keeps dtype/shape
    e_tok, e_dis = T.token_count_stats_arrow(pa.array(["", None], type=pa.string()))
    assert e_tok.dtype == np.int64 and e_dis.dtype == np.int64
    np.testing.assert_array_equal(e_tok, [0, 0])
    np.testing.assert_array_equal(e_dis, [0, 0])


def test_pairwise_jaccard_arrow_parity():
    """Vectorized pairwise jaccard (token-set and shingle-set) must
    match the scalar set-arithmetic verify loops exactly."""
    import pyarrow as pa

    from geografir_ray.functions import text as T

    a_txt = ["a b c d", "x y", "", "same same tokens here", "one two three",
             "w1 w2 w3 w4 w5 w6 w7", None]
    b_txt = ["a b e f", "x y", "", "same tokens here same", "four five six",
             "w3 w4 w5 w6 w7 w8 w9", "q"]
    ca = pa.array(a_txt, type=pa.string())
    cb = pa.array(b_txt, type=pa.string())

    jt = T.pairwise_token_jaccard_arrow(ca, cb)
    js = T.pairwise_shingle_jaccard_arrow(ca, cb, k=3)
    for i in range(len(a_txt)):
        sa = set(T.tokenize(a_txt[i] or ""))
        sb = set(T.tokenize(b_txt[i] or ""))
        exp_t = len(sa & sb) / max(len(sa | sb), 1)
        assert jt[i] == exp_t, (i, jt[i], exp_t)
        ha = set(T.shingle_hashes(a_txt[i] or "", k=3).tolist())
        hb = set(T.shingle_hashes(b_txt[i] or "", k=3).tolist())
        exp_s = len(ha & hb) / max(len(ha | hb), 1)
        assert js[i] == exp_s, (i, js[i], exp_s)


def test_quality_and_langid_arrow_parity():
    import pyarrow as pa

    from geografir_ray.functions import text as T

    texts = [
        "the quick brown fox and the lazy dog in the springtime of the year",
        "de la casa que el gato los perros ión ado",
        "le chat est une belle ville de la mer ent ion",
        "der ein schöne und die ung sch ch ",
        "这是一个中文句子 with some latin",
        "", None, "x", "   ", "a b a b a b",
        "ünï çødé wörds ünï",
        "12345 !!! ???",
        "Der Über-Fall: und der Schlüssel die Tür",
    ]
    col = pa.array(texts, type=pa.string())
    clean = [t if t is not None else "" for t in texts]
    qs = T.quality_stats(clean)
    qa = T.quality_stats_arrow(col)
    for k in qs:
        np.testing.assert_allclose(qa[k], qs[k], rtol=0, atol=0, err_msg=k)
    np.testing.assert_array_equal(T.langid_arrow(col), T.langid(clean))


def test_text_kernels_hypothesis_parity():
    """Property test: the Arrow-native text kernels equal their scalar
    twins on arbitrary unicode inputs (spaces, empties, CJK, controls)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geografir_ray.functions import text as T
    from geografir_ray.functions.gazetteer import LocationExtractor

    x = LocationExtractor()
    # max_codepoint: RE2 and CPython disagree on codepoints assigned in
    # Unicode versions newer than CPython's tables (plane 3+); the
    # kernels document that skew, so the property holds below it
    token = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters=" ",
            max_codepoint=0x2FFFF,
        ),
        min_size=0, max_size=12,
    )
    doc = st.lists(
        st.one_of(token, st.sampled_from(["springfield", "spark", "place_7", "中文"])),
        min_size=0, max_size=20,
    ).map(" ".join)
    docs = st.lists(st.one_of(st.none(), doc), min_size=1, max_size=12)

    @settings(max_examples=60, deadline=None)
    @given(docs)
    def run(texts):
        col = pa.array(texts, type=pa.string())
        clean = [t if t is not None else "" for t in texts]
        # token counts
        n_tok, n_dis = T.token_count_stats_arrow(col)
        np.testing.assert_array_equal(n_tok, T.token_counts(clean))
        np.testing.assert_array_equal(n_dis, T.distinct_token_counts(clean))
        # quality + langid
        qa = T.quality_stats_arrow(col)
        qs = T.quality_stats(clean)
        for k in qs:
            np.testing.assert_allclose(qa[k], qs[k], rtol=0, atol=0, err_msg=k)
        np.testing.assert_array_equal(T.langid_arrow(col), T.langid(clean))
        # gazetteer extraction
        rows_v, names_v, lats_v, lons_v = x.extract_arrow(col)
        rows_s, names_s, lats_s, lons_s = x.extract(clean)
        assert list(rows_v) == list(rows_s)
        assert names_v.to_pylist() == list(names_s)
        np.testing.assert_array_equal(lats_v, lats_s)
        np.testing.assert_array_equal(lons_v, lons_s)
        # pairwise jaccard (pair texts with a shifted copy)
        shifted = clean[1:] + clean[:1]
        cb = pa.array(shifted, type=pa.string())
        jt = T.pairwise_token_jaccard_arrow(col, cb)
        js = T.pairwise_shingle_jaccard_arrow(col, cb, k=3)
        for i, (a, b) in enumerate(zip(clean, shifted)):
            sa, sb = set(T.tokenize(a)), set(T.tokenize(b))
            assert jt[i] == len(sa & sb) / max(len(sa | sb), 1)
            ha = set(T.shingle_hashes(a, k=3).tolist())
            hb = set(T.shingle_hashes(b, k=3).tolist())
            assert js[i] == len(ha & hb) / max(len(ha | hb), 1)

    run()
