"""HTML → text extraction (SURVEY §2 M5, non-identity path).

The reference stores raw page HTML and Jsoup-parses it at serving time:
``Jsoup.parse(page.getContent())`` then ``doc.body().text()`` for the
snippet source and ``doc.title()`` for the result title
(``services/SearchServiceImpl.java:178-193``). Transcripts are plain text,
so the rebuild's ingest is the identity — this module supplies the
equivalent extraction stage for HTML corpora (``build_index(...,
html_content=True)`` and the ``html_extract`` pipeline entry).

``html_body_text`` mirrors Jsoup ``Element.text()`` semantics (public,
documented Jsoup behavior), via the stdlib parser — no external deps:

- whitespace runs collapse to a single space; the result is trimmed,
- text separated only by INLINE tags keeps no space (``a<b>c</b>d`` →
  ``acd``); whitespace around tags is preserved as one space,
- block-level boundaries (``p div h1.. li table tr td br hr`` …) separate
  text with a single space (``<p>a</p><p>b</p>`` → ``a b``, ``a<br>b`` →
  ``a b``),
- ``<script>``/``<style>``/``<template>`` contents are data nodes, not
  text — excluded entirely; comments and doctypes excluded,
- character/entity references decode (``&amp;`` → ``&``),
- ``<head>`` content is metadata, not body text — excluded. (Jsoup
  re-homes stray TEXT inside head into body; that malformed-HTML corner
  is deliberately simplified to "head text is dropped".)

``html_title`` mirrors ``Document.title()``: the first ``<title>``'s
text, whitespace-normalized and trimmed.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Jsoup's text() whitespace (StringUtil.isActuallyWhitespace, used by
# appendNormalisedWhitespace) is {space, \t, \n, \f, \r, U+00A0}: the
# non-breaking space NORMALIZES like whitespace, but the set is still not
# Python's Unicode-wide str.split()/isspace() (\v, thin spaces, etc. are
# text in Jsoup). Normalization here uses the explicit Jsoup set, which
# keeps the html_extract oracle's RE2 ``[ \t\n\f\r\x{00A0}]+`` collapse
# exactly equivalent.
_WS = " \t\n\f\r\xa0"
_WS_RUN = re.compile(r"[ \t\n\f\r\xa0]+")

# Bump on ANY output-changing extraction rule (whitespace set, block tags,
# skip set, …): it joins the shard config signature for html_content
# builds, so a reindex rebuilds shards whose stored text was extracted
# under older rules instead of silently mixing provenances.
EXTRACTOR_VERSION = 2  # v2: nbsp joins the Jsoup whitespace set


def _ws_normalize(s: str) -> str:
    return " ".join(p for p in _WS_RUN.split(s) if p)

# Per Jsoup's block-level tag set (Tag.java isBlock) plus br/hr, which
# Element.text() renders as whitespace.
_BLOCK_TAGS = frozenset(
    """address article aside blockquote br caption center col colgroup dd
    details dir div dl dt fieldset figcaption figure footer form frame
    frameset h1 h2 h3 h4 h5 h6 header hgroup hr html body li main nav ol
    optgroup option p pre section summary table tbody td tfoot th thead
    title tr ul""".split()
)
_SKIP_TAGS = frozenset({"script", "style", "template"})
_VOID_SKIP_END = frozenset({"br", "hr"})  # void tags: no matching end


class _TextExtractor(HTMLParser):
    """One pass: body text (Jsoup ``body().text()``) + title."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._out: list[str] = []
        self._pending_space = False
        self._skip_depth = 0
        self._head_depth = 0
        self._in_title = False
        self._title_parts: list[str] = []
        self._title_done = False

    # -- tag handling -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "head":
            self._head_depth += 1
        elif tag == "body":
            # an explicit <body> closes any unclosed <head>
            self._head_depth = 0
        elif tag == "title" and not self._title_done:
            self._in_title = True
        if tag in _BLOCK_TAGS and self._out:
            self._pending_space = True

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS and self._out:
            self._pending_space = True

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "head":
            self._head_depth = max(0, self._head_depth - 1)
        elif tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
        if tag in _BLOCK_TAGS and tag not in _VOID_SKIP_END and self._out:
            self._pending_space = True

    # -- text handling ------------------------------------------------
    def handle_data(self, data):
        if not data:
            return
        if self._in_title:
            self._title_parts.append(data)
            return
        if self._skip_depth or self._head_depth:
            return
        norm = _ws_normalize(data)
        if not norm:
            # pure-whitespace node still separates neighbors
            if self._out:
                self._pending_space = True
            return
        if self._out and (self._pending_space or data[0] in _WS):
            self._out.append(" ")
        self._out.append(norm)
        self._pending_space = data[-1] in _WS

    # -- results --------------------------------------------------------
    def body_text(self) -> str:
        return "".join(self._out)

    def title(self) -> str:
        return _ws_normalize("".join(self._title_parts))


def html_body_text(html: str) -> str:
    """Jsoup ``Jsoup.parse(html).body().text()`` equivalent
    (SearchServiceImpl.java:179)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.body_text()


def html_title(html: str) -> str:
    """Jsoup ``Document.title()`` equivalent (SearchServiceImpl.java:189)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.title()


class HtmlToText:
    """``map_batches`` ingest stage: replace an HTML ``text`` column with
    its extracted body text (per-worker via ``workerstate.per_worker`` —
    parsing is per-row by nature, state is trivially cheap)."""

    def __call__(self, batch):
        import pyarrow as pa

        texts = [html_body_text(t or "") for t in batch["text"].to_pylist()]
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pa.array(texts, type=pa.string()))
