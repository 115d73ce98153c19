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


def extract_text_reference(html_doc: bytes | str) -> str:
    """stdlib-HTMLParser extraction — the semantic reference the fast
    scanner below is equality-tested against."""
    s = html_doc.decode("utf-8", errors="replace") if isinstance(html_doc, bytes) else html_doc
    p = _BodyTextParser()
    p.feed(s)
    p.close()
    return "".join(p.parts)


import re as _re

# one regex per tag: quote-aware so '>' inside quoted attribute values
# doesn't terminate the tag (the C regex engine does the char walking).
# Charsets mirror HTMLParser's tolerant tokenizer: a start-tag NAME
# runs to the first whitespace / '/' / '>' (so `<body<style>` is ONE
# tag named "body<style", not a body tag), attributes are introduced
# by whitespace or '/'; end tags are strict with a bogus-comment
# fallback (CPython parse_endtag).
_START_RE = _re.compile(
    r"<([a-zA-Z][^\t\n\r\f />]*)((?:[\s/](?:[^>\"']|\"[^\"]*\"|'[^']*')*)?)>"
)
_END_RE = _re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_NAME_TOLERANT_RE = _re.compile(r"[a-zA-Z][^\t\n\r\f />]*")


def extract_text(html_doc: bytes | str) -> str:
    """Text nodes inside <body>, script/style/comments dropped,
    charrefs resolved, no whitespace edits.

    Fast scanner (str.find + one compiled regex per tag): ~54k
    pages/s/core vs ~14k for the HTMLParser path on the synthetic
    corpus.  Semantics are equality-FUZZED against
    :func:`extract_text_reference` on the corpus, adversarial
    fixtures, and random markup soup (tests/test_htmltext.py); the one
    known divergence class is CPython's tolerant start-tag attribute
    regex on pathological quote/entity soup inside a tag name —
    absent from well-formed markup."""
    s = html_doc.decode("utf-8", errors="replace") if isinstance(html_doc, bytes) else html_doc
    n = len(s)
    parts: list[str] = []
    in_body = False
    skip_depth = 0
    lower: str | None = None  # lazily-built lowercase copy for CDATA jumps
    i = 0
    find = s.find
    while i < n:
        j = find("<", i)
        if j < 0:
            if in_body and skip_depth == 0 and i < n:
                seg = s[i:]
                parts.append(_html.unescape(seg) if "&" in seg else seg)
            break
        if in_body and skip_depth == 0 and j > i:
            seg = s[i:j]
            # unescape per data segment (a charref split across a tag
            # boundary must NOT reassemble — HTMLParser semantics)
            parts.append(_html.unescape(seg) if "&" in seg else seg)
        nxt = s[j + 1] if j + 1 < n else ""
        if nxt in "!?":
            if s.startswith("<!--", j):
                k = find("-->", j + 4)
                if k >= 0:
                    i = k + 3
                    continue
                # unterminated comment: HTMLParser's EOF recovery
                # flushes up to (and incl.) the next '>', else up to
                # the next '<', else one char — then KEEPS parsing
                k = find(">", j + 1)
                if k >= 0:
                    k += 1
                else:
                    k = find("<", j + 1)
                    if k < 0:
                        k = n
                if in_body and skip_depth == 0:
                    seg = s[j:k]
                    parts.append(_html.unescape(seg) if "&" in seg else seg)
                i = k
                continue
            # <!DOCTYPE ...> / <?pi ...> declarations
            k = find(">", j)
            if k < 0:
                # HTMLParser flushes an unterminated construct as
                # data on close(); mirror that
                if in_body and skip_depth == 0:
                    seg = s[j:]
                    parts.append(_html.unescape(seg) if "&" in seg else seg)
                break
            i = k + 1
            continue
        if nxt == "/":
            m = _END_RE.match(s, j)
            if m is not None:
                if m.group(1).lower() == "body":
                    in_body = False
                i = m.end()
                continue
            # tolerant end tag (CPython parse_endtag): a name after
            # '</' still closes its element even with junk before the
            # '>', which is then searched from the end of the name —
            # but with NO '>' at all the construct is unterminated and
            # flushes as data (body stays open)
            m2 = _NAME_TOLERANT_RE.match(s, j + 2)
            k = find(">", m2.end() if m2 is not None else j + 2)
            if k < 0:
                if in_body and skip_depth == 0:
                    seg = s[j:]
                    parts.append(_html.unescape(seg) if "&" in seg else seg)
                break
            if m2 is not None and m2.group(0).lower() == "body":
                in_body = False
            i = k + 1
            continue
        m = _START_RE.match(s, j)
        if m is None:
            # bare '<' that opens no tag: HTMLParser treats it as data
            if in_body and skip_depth == 0:
                parts.append("<")
            i = j + 1
            continue
        name = m.group(1).lower()
        self_closing = m.group(2).rstrip().endswith("/")
        i = m.end()
        if name == "body":
            in_body = True  # <body/> opens body in the reference parser too
        elif name in _SKIP_TAGS and not self_closing:
            # CDATA content: runs to the next matching close tag,
            # case-insensitive (script/style elements do not nest)
            if lower is None:
                lower = s.lower()
            k = lower.find("</" + name, i)
            if k < 0:
                i = n
            else:
                e = find(">", k)
                i = n if e < 0 else e + 1
    return "".join(parts)


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
