"""HTML → text extraction: the north rule's byte-identical per-row
invariant, from the parser unit level up through the pages chain."""

from __future__ import annotations

import pyarrow as pa
import pytest

from geografir_ray.functions.htmltext import extract_text, synthesize_html


def test_inverse_property_byte_identical():
    texts = [
        "hello world",
        "",
        "a & b < c > d",
        "tok " * 50,
        "ünïcode — em…dash",
        'He said "quote" & \'tick\'',
        "multi\nline\ttext  double-space",
        "&amp; already-escaped-looking literal",
    ]
    for k in range(60):
        for t in texts:
            assert extract_text(synthesize_html(t, k)) == t


def test_extractor_drops_nontext_content():
    assert (
        extract_text(
            b"<html><head><title>T</title><script>if(a<b){x()}</script></head>"
            b"<body>A<script>x<y</script>B<style>s{}</style>C</body></html>"
        )
        == "ABC"
    )
    assert extract_text(b"<body><p>a</p><!-- no --><div attr='>'>b</div></body>") == "ab"
    assert extract_text(b"<body>&amp;&lt;&gt;&#65;</body>") == "&<>A"
    assert extract_text(b"outside <body>in</body> outside") == "in"
    assert extract_text(b"no body element") == ""
    # script content is CDATA: the first </script> closes it (HTML5 /
    # browser behavior — script elements do not nest)
    assert extract_text(b"<body><script><script>notext</script>tail</script>x</body>") == "tailx"


def test_fast_scanner_matches_reference_parser():
    """The fast str.find/regex scanner is equality-tested against the
    stdlib HTMLParser implementation on markup soup.  (Known scoped
    divergence: CPython's tolerant start-tag attr regex on garbage like
    `<body&#97;</body&amq"r...` — ~1 in 32k random-soup docs; absent
    from well-formed markup.)"""
    import random

    from geografir_ray.functions.htmltext import extract_text_reference

    for seed in (42, 13):
        random.seed(seed)
        bits = [
            "<p>", "</p>", "<body>", "</body>", "text ", "&amp;", "tok",
            "<script>", "</script>", "<!--c-->", "<div a='1'>", "</div>",
            "&#97;", " < ", ">", "<b>", "</b>", "<style>", "</style>",
            "<!--", "-->", "<br/>", "&am", "p;", "</>", "</ body>",
            "<body/>", "<script/>", "<x<y>", "=",
        ]
        for _ in range(2500):
            doc = "".join(random.choice(bits) for _ in range(random.randint(1, 30)))
            assert extract_text(doc) == extract_text_reference(doc), repr(doc)


def test_synth_corpus_invariant():
    """Every synthetic page's html extracts back to its text column —
    the invariant the driver checks against real WARC-derived tables."""
    from geografir_ray.sources.synth import pages_batch

    t = pages_batch(0, 800)
    for h, txt in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(h) == txt


def test_pages_chain_from_html_matches_stored_text(ray_session):
    """Full chain equivalence: dedup → extract_text_from_html →
    locations from the EXTRACTED text == locations from the stored
    text column (so a corpus shipped without `text` yields identical
    downstream results)."""
    from geografir_ray.pipelines.pages import (
        dedup_by_url,
        extract_locations,
        extract_text_from_html,
    )
    from geografir_ray.sources.synth import pages_dataset

    pages = dedup_by_url(pages_dataset(3000, num_blocks=8))
    via_text = extract_locations(pages).to_pandas()

    with_ext = extract_text_from_html(pages)

    def swap(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["text"])
        i = t.schema.get_field_index("text_extracted")
        return t.set_column(i, "text", t["text_extracted"])

    via_html = extract_locations(
        with_ext.map_batches(swap, batch_format="pyarrow")
    ).to_pandas()
    key = ["url", "name", "lat", "lon"]
    a = via_text.sort_values(key).reset_index(drop=True)
    b = via_html.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0
