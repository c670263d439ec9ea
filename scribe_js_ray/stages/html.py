"""Generic-HTML main-content extraction (boilerplate strip).

The DOM-heuristics path of the north rule: block segmentation +
tag/link-density scoring in the spirit of the public boilerplate-removal
literature (Kohlschütter et al.'s shallow text features), structured like
scribe's layout-box model — each DOM block becomes a scored box whose role
(body/title/furniture) decides whether it survives into the extracted text.

Stdlib ``html.parser`` only; deterministic; compiled once per process.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_TAGS = frozenset((
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "pre", "blockquote", "article", "section", "main", "br", "tr",
    "ul", "ol", "table", "figcaption", "dd", "dt",
))
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template", "svg",
                        "iframe", "head"))
_FURNITURE_TAGS = frozenset(("nav", "header", "footer", "aside", "form",
                             "menu"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

_WS_RE = re.compile(r"\s+")


class _Block:
    __slots__ = ("text_parts", "link_chars", "in_furniture", "heading",
                 "in_main")

    def __init__(self, in_furniture, in_main, heading):
        self.text_parts = []
        self.link_chars = 0
        self.in_furniture = in_furniture
        self.in_main = in_main
        self.heading = heading

    @property
    def text(self):
        return _WS_RE.sub(" ", "".join(self.text_parts)).strip()


class _Segmenter(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._skip_depth = 0
        self._furniture_depth = 0
        self._main_depth = 0
        self._link_depth = 0
        self._heading = None
        self._cur: _Block | None = None

    def _flush(self):
        if self._cur is not None and self._cur.text:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _FURNITURE_TAGS:
            self._flush()
            self._furniture_depth += 1
            return
        if tag in ("main", "article"):
            self._flush()
            self._main_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _HEADING_TAGS:
            self._flush()
            self._heading = tag
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _FURNITURE_TAGS:
            self._flush()
            self._furniture_depth = max(0, self._furniture_depth - 1)
            return
        if tag in ("main", "article"):
            self._flush()
            self._main_depth = max(0, self._main_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _HEADING_TAGS:
            self._flush()
            self._heading = None
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if not data or not data.strip():
            return
        if self._cur is None:
            self._cur = _Block(self._furniture_depth > 0,
                               self._main_depth > 0, self._heading)
        self._cur.text_parts.append(data)
        if self._link_depth:
            self._cur.link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


MIN_CONTENT_WORDS = 8
MAX_LINK_DENSITY = 0.33


def extract_html_document(html_text: str):
    """Returns (text, spans, n_blocks_total).

    Content rule: a block survives when it is a heading inside the main
    region, or carries >= MIN_CONTENT_WORDS words at link density <
    MAX_LINK_DENSITY, or sits inside <main>/<article> with link density
    < 0.5 — and is not inside nav/header/footer/aside chrome.
    """
    seg = _Segmenter()
    try:
        seg.feed(html_text)
        seg.close()
    except Exception:
        pass

    kept = []
    for b in seg.blocks:
        text = b.text
        if not text:
            continue
        n_chars = len(text)
        link_density = b.link_chars / n_chars if n_chars else 1.0
        if b.in_furniture:
            # A page's h1 is its title even when the markup wraps it in
            # <header> chrome; everything else in chrome is boilerplate.
            if b.heading == "h1" and link_density == 0:
                kept.append(("title", text))
            continue
        n_words = text.count(" ") + 1
        if b.heading:
            if b.in_main or link_density == 0:
                kept.append(("title", text))
            continue
        if b.in_main and link_density < 0.5:
            kept.append(("body", text))
        elif n_words >= MIN_CONTENT_WORDS and link_density < MAX_LINK_DENSITY:
            kept.append(("body", text))

    parts = []
    spans = []
    byte_pos = 0
    for i, (role, text) in enumerate(kept):
        if parts:
            parts.append("\n")
            byte_pos += 1
        start = byte_pos
        parts.append(text)
        byte_pos += len(text.encode("utf-8"))
        spans.append({"par_idx": i, "type": role, "start": start,
                      "end": byte_pos})
    return "".join(parts), spans, len(seg.blocks)
