"""Deterministic synthetic pages corpus (FIXTURES.md §1; input_hint
schema: url, warc_ts, html, text, lang) — pure function of (row index),
no external data, identical across runs and workers.

Location mentions are drawn zipf-style from the gazetteer (~70% of the
mention mass on the 12 hot centers via the synthgeo key scheme), and
~1% of urls are duplicated with differing warc_ts to exercise
dedup-by-url with the deterministic min-(warc_ts, url) winner.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.gazetteer import gazetteer_names
from ..functions.hashing import splitmix64

_VOCAB = (
    "the data spark table row scan filter merge join sort window agg "
    "key value batch part hash fast slow line page site link text html "
    "word count group top rank cell tile zone map near far city range "
    "open close read write load store send recv pack unpack code node "
    "edge path tree leaf root core disk mem net cpu io lat lon geo time"
).split()

EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)


def pages_batch(start: int, n: int, mentions_per_doc: int = 3) -> pa.Table:
    """Rows [start, start+n) of the synthetic pages corpus."""
    i = np.arange(start, start + n, dtype=np.int64)
    names = gazetteer_names()

    # ~1% duplicated urls: row i duplicates url of i-1 when i % 100 == 99
    url_key = np.where(i % 100 == 99, i - 1, i)
    urls = [f"https://site{k % 997}.example/{k}" for k in url_key]

    ts = EPOCH_US + i * 7_000_000 + (i % 100 == 99) * 3_500_000
    warc_ts = ts.astype("datetime64[us]")

    # zipf-ish mention ranks via splitmix of (i, slot)
    texts = []
    h0 = splitmix64(i.astype(np.uint64))
    for row in range(n):
        k = i[row]
        toks = [
            _VOCAB[int((k * 31 + j * 7) % len(_VOCAB))]
            for j in range(10 + int(k % 7))
        ]
        hm = int(h0[row])
        for m in range(mentions_per_doc):
            r = (hm >> (m * 8)) & 0xFFFF
            # zipf-ish: squared-uniform concentrates on low ranks
            rank = int((r / 65536.0) ** 2 * len(names))
            toks.insert((hm >> (m * 3)) % (len(toks) + 1), names[min(rank, len(names) - 1)])
        texts.append(" ".join(toks))

    langs = ["en", "es", "zh", "de", "fr", "en", "en", "es", "zh", "en"]
    lang = [langs[int(k % 10)] for k in i]
    # realistic markup (head junk, attributes, in-body script, comments,
    # entity escaping) built so functions/htmltext.extract_text recovers
    # `text` byte-identically — the north rule's per-row invariant
    from ..functions.htmltext import synthesize_html

    html = [synthesize_html(t, int(k)) for t, k in zip(texts, i)]

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(warc_ts),
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
        }
    )


def pages_dataset(n_rows: int, num_blocks: int | None = None):
    """Lazy Dataset of n_rows synthetic pages (generated in parallel)."""
    import ray
    import ray.data as rd

    nb = num_blocks or max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        return pages_batch(int(ids[0]), len(ids))

    # contiguous id blocks -> contiguous page ranges per task
    return rd.range(n_rows, override_num_blocks=nb).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


def write_pages_parquet(path: str, n_rows: int) -> None:
    pages_dataset(n_rows).write_parquet(path)


def pages_skinny_batch(i: np.ndarray) -> pa.Table:
    """(url, warc_ts, text) rows — same url-duplication scheme as
    pages_batch but fully vectorized (pyarrow string kernels, no
    Python loop), for benches whose subject is the dedup exchange
    itself rather than text extraction."""
    import pyarrow.compute as pc

    url_key = np.where(i % 100 == 99, i - 1, i)
    ks = pc.cast(pa.array(url_key), pa.string())
    urls = pc.binary_join_element_wise(
        pa.scalar("https://site.example/p/"), ks, pa.scalar("")
    )
    ts = (EPOCH_US + i * 7_000_000 + (i % 100 == 99) * 3_500_000).astype(
        "datetime64[us]"
    )
    text = pc.binary_join_element_wise(
        pa.scalar("body text for page "),
        ks,
        pa.scalar(" with enough payload bytes to make the exchange honest"),
        pa.scalar(""),
    )
    return pa.table({"url": urls, "warc_ts": pa.array(ts), "text": text})


def pages_skinny_dataset(n_rows: int, num_blocks: int | None = None):
    import ray
    import ray.data as rd

    nb = num_blocks or max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)

    def gen(t: pa.Table) -> pa.Table:
        return pages_skinny_batch(t["id"].to_numpy())

    return rd.range(n_rows, override_num_blocks=nb).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )
