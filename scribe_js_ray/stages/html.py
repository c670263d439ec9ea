"""Generic-HTML main-content extraction (boilerplate strip).

The DOM-heuristics path of the north rule: block segmentation +
tag/link-density scoring in the spirit of the public boilerplate-removal
literature (Kohlschütter et al.'s shallow text features, Readability-style
class/id hints), structured like scribe's layout-box model — each DOM
block becomes a scored box whose role (body/title/furniture) decides
whether it survives into the extracted text.

Three heuristic layers, applied in order:

1. **Structural chrome**: semantic furniture tags (``nav``/``header``/
   ``footer``/``aside``/``form``/``menu``) and class/id chrome hints
   (``comment``/``sidebar``/``related``/``share``/``ad``/``cookie``/...)
   mark whole subtrees as boilerplate.  A page's ``h1`` survives chrome
   as the title (sites routinely wrap the headline in ``<header>``).
2. **Shallow text features** per block: word count and link density
   (anchor-text chars / total chars) decide body membership, with a
   laxer threshold inside ``<main>``/``<article>``.
3. **Block fusion** (Kohlschütter's context pass): a short zero-link
   block sandwiched between two accepted body blocks is content (list
   items, one-line paragraphs, code lines) and is promoted.

``<head><title>`` is captured as a title fallback for pages with no
visible heading.  Stdlib ``html.parser`` only; deterministic; compiled
once per process.
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
# Void elements never get an end tag; they must not push hint-stack state.
_VOID_TAGS = frozenset(("br", "img", "hr", "input", "meta", "link", "area",
                        "base", "col", "embed", "source", "track", "wbr"))

# Class/id tokens that mark a subtree as page chrome on div-soup pages
# (no semantic tags).  Matched token-wise against class/id attributes.
_CHROME_HINT_RE = re.compile(
    r"(?:^|[-_\s])(?:comments?|sidebar|side-bar|related|share|sharing|"
    r"social|promo|sponsor|advert\w*|ads?|banner|cookie|consent|popup|"
    r"modal|breadcrumbs?|pagination|pager|masthead|subscribe|newsletter|"
    r"widget|menu|nav|navbar|navigation|topbar|toolbar|footer|header|"
    r"copyright|disclaimer|skip-link|site-info)(?:$|[-_\s])", re.I)

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
        self.head_title_parts: list[str] = []
        self._skip_depth = 0
        # Skip depth excluding <head> — a <title> inside svg/iframe/
        # template is NOT the document title (the fallback must only
        # read the head one, present even on head-omitting markup).
        self._deep_skip = 0
        self._furniture_depth = 0
        self._main_depth = 0
        self._link_depth = 0
        self._heading = None
        self._cur: _Block | None = None
        self._in_head_title = False
        # Every open non-void element with a flag for whether its
        # class/id matched a chrome hint.  End tags pop to the most
        # recent matching name (tolerates the unclosed-div soup real
        # pages are made of) and release the hinted depth of everything
        # popped.
        self._open: list[tuple[str, bool]] = []

    def _flush(self):
        if self._cur is not None and self._cur.text:
            self.blocks.append(self._cur)
        self._cur = None

    @staticmethod
    def _is_chrome_hinted(attrs) -> bool:
        for name, value in attrs:
            if name in ("class", "id") and value \
                    and _CHROME_HINT_RE.search(value):
                return True
        return False

    def handle_starttag(self, tag, attrs):
        if tag == "title" and not self.head_title_parts \
                and self._deep_skip == 0:
            # <head> is a skip tag, but its <title> is the fallback
            # document title; titles inside svg/iframe/template are
            # graphics labels, not the document title.
            self._in_head_title = True
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            if tag != "head":
                self._deep_skip += 1
            return
        if tag not in _VOID_TAGS:
            hinted = self._is_chrome_hinted(attrs)
            self._open.append((tag, hinted))
            if hinted:
                self._flush()
                self._furniture_depth += 1
            # fall through: the tag may also be a block/furniture tag
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
        if tag == "title":
            self._in_head_title = False
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            if tag != "head":
                self._deep_skip = max(0, self._deep_skip - 1)
            return
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i][0] == tag:
                popped = self._open[i:]
                del self._open[i:]
                n_hinted = sum(1 for _, h in popped if h)
                if n_hinted:
                    self._flush()
                    self._furniture_depth = max(
                        0, self._furniture_depth - n_hinted)
                break
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
        if self._in_head_title:
            self.head_title_parts.append(data)
            return
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
MIN_FUSED_WORDS = 2
MAX_LINK_DENSITY = 0.33


def extract_html_document(html_text: str):
    """Returns (text, spans, n_blocks_total).

    Content rule: a block survives when it is a heading inside the main
    region, or carries >= MIN_CONTENT_WORDS words at link density <
    MAX_LINK_DENSITY, or sits inside <main>/<article> with link density
    < 0.5 — and is not inside nav/header/footer/aside/chrome-hinted
    subtrees.  A fusion pass then promotes short zero-link blocks whose
    neighbors on both sides were accepted as body.  Pages with no
    heading fall back to <head><title> for the title span.
    """
    seg = _Segmenter()
    try:
        seg.feed(html_text)
        seg.close()
    except Exception:
        pass

    # Pass 1: classify every block (role or None = dropped).
    classified = []  # (role|None, text, fusable)
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
                classified.append(("title", text, False))
            else:
                classified.append((None, text, False))
            continue
        n_words = text.count(" ") + 1
        if b.heading:
            if b.in_main or link_density == 0:
                classified.append(("title", text, False))
            else:
                classified.append((None, text, False))
            continue
        if b.in_main and link_density < 0.5:
            classified.append(("body", text, False))
        elif n_words >= MIN_CONTENT_WORDS and link_density < MAX_LINK_DENSITY:
            classified.append(("body", text, False))
        else:
            # Candidate for the fusion pass: real text, no links, just
            # short (list items, one-line paragraphs).
            fusable = b.link_chars == 0 and n_words >= MIN_FUSED_WORDS
            classified.append((None, text, fusable))

    # Pass 2: block fusion — a RUN of dropped blocks sandwiched between
    # two body blocks is promoted only when every block in the run is
    # fusable (short, zero-link, unhinted).  A run containing any
    # link-list/chrome block stays dropped: skipping over rejected
    # blocks would inject stray promos nowhere near real content.
    roles = [c[0] for c in classified]
    i = 0
    while i < len(classified):
        if roles[i] is not None:
            i += 1
            continue
        j = i
        while j < len(classified) and roles[j] is None:
            j += 1
        prev_role = roles[i - 1] if i > 0 else None
        next_role = roles[j] if j < len(classified) else None
        if prev_role == "body" and next_role == "body" \
                and all(classified[k][2] for k in range(i, j)):
            for k in range(i, j):
                roles[k] = "body"
        i = j

    kept = [(r, t) for r, (_, t, _f) in zip(roles, classified)
            if r is not None]

    # Title fallback: a page with no heading at all uses <head><title>.
    if not any(r == "title" for r, _ in kept):
        head_title = _WS_RE.sub(" ", "".join(seg.head_title_parts)).strip()
        if head_title and kept:
            kept.insert(0, ("title", head_title))

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
