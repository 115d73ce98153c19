"""Deterministic HTML → text extraction (stdlib html.parser) for the
Common-Crawl-style pages schema (BASELINE.json input_hint: the corpus
carries ``html: binary`` alongside the extracted ``text``).

Contract (the north rule's per-row invariant): extraction is a pure
function of the html bytes — text nodes inside <body>, concatenated in
document order, with <script>/<style> subtrees and comments dropped
and character references resolved.  No whitespace normalization is
applied, so whatever byte sequence the producer embedded is recovered
exactly; ``synthesize_html`` below is the inverse generator used by
the synthetic corpus (sources/synth.py), giving
``extract_text(synthesize_html(text, k)) == text`` byte-identically
for ANY text (entities escaped both ways).
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

_SKIP_TAGS = frozenset({"script", "style"})


class _BodyTextParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._in_body = False
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            self._in_body = True
        elif tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag == "body":
            self._in_body = False
        elif tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_startendtag(self, tag, attrs):
        # <script/> style self-closing: no content, nothing to skip
        if tag == "body":
            self._in_body = True

    def handle_data(self, data):
        if self._in_body and self._skip_depth == 0 and data:
            self.parts.append(data)

    # comments / declarations / PIs contribute nothing (default no-ops)


def extract_text(html_doc: bytes | str) -> str:
    """Text nodes inside <body>, script/style/comments dropped,
    charrefs resolved, no whitespace edits."""
    s = html_doc.decode("utf-8", errors="replace") if isinstance(html_doc, bytes) else html_doc
    p = _BodyTextParser()
    p.feed(s)
    p.close()
    return "".join(p.parts)


def synthesize_html(text: str, key: int) -> bytes:
    """Deterministic 'realistic' page around ``text``: head junk
    (title/script/style), attributes, comments, an in-body script, and
    the text split across inline/block markup — built so
    ``extract_text`` recovers ``text`` byte-for-byte.

    The split point and decoration choice derive from ``key`` only.
    """
    esc = _html.escape
    cut = 0
    if text:
        cut = (key * 31 + 7) % (len(text) + 1)
    head = (
        f"<head><title>page {key}</title>"
        f"<script>var k={key};function f(){{return k<9&&k>0;}}</script>"
        "<style>.m{color:#123;}</style></head>"
    )
    deco = key % 3
    first, second = esc(text[:cut]), esc(text[cut:])
    if deco == 0:
        body_text = f"<p>{first}</p><!--sep--><p>{second}</p>"
    elif deco == 1:
        body_text = f"<span class=\"m\">{first}</span><b>{second}</b>"
    else:
        body_text = f"<div data-k=\"{key}\">{first}<i>{second}</i></div>"
    body = (
        f"<body id=\"p{key}\" data-src=\"warc\">"
        f"<script>track({key});</script>"
        f"{body_text}"
        "<!-- footer --></body>"
    )
    return f"<!DOCTYPE html><html lang=\"en\">{head}{body}</html>".encode()
