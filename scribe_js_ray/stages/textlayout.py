"""Plain text → synthetic typeset pages (reference:
/root/reference/js/import/convertPageText.js:1-299).

Semantics mirrored: letter-size pages (612×792), Times 14 pt, 14.4 pt line
height, 30/20 pt margins; whitespace-preserving tokenization (:62-87);
greedy word wrap against the available width with the
leading-whitespace-must-fit and oversized-word force-place rules
(:150-265); one source text line → one paragraph (possibly page-spanning);
page breaks on vertical overflow including on blank lines (:131-143).

Metrics difference (documented): the reference measures advances + kerning
+ side bearings through its embedded opentype Times; this container has no
font files, so widths come from the published Adobe AFM Times-Roman
advance table (``stages/pdf/widths.py``) with ascender 0.683 em /
descender −0.217 em (Times AFM values) and no kerning.  Layout decisions
(wraps, page breaks) are therefore deterministic but not glyph-identical
to the reference's — the extracted TEXT is identical either way, which is
the golden surface.
"""

from __future__ import annotations

import re

from ..model import BBox, Line, Page, Par, Word
from .pdf.widths import base14_widths

FONT_FAMILY = "Times New Roman"
FONT_SIZE = 14
LINE_HEIGHT = 14.4
MARGIN_VERTICAL = 30
MARGIN_HORIZONTAL = 20
_ASCENDER = 0.683  # Times-Roman AFM ascender / unitsPerEm
_DESCENDER = -0.217

_WS_RE = re.compile(r"\s")
_TIMES = base14_widths("Times-Roman")


def _text_width(text: str, size: float = FONT_SIZE) -> float:
    return sum(_TIMES.get(c, 500) for c in text) * size / 1000.0


def _split_tokens(line: str):
    """Whitespace-preserving tokenization (convertPageText.js:62-87)."""
    tokens = []
    current = ""
    in_ws = False
    for ch in line:
        ch_ws = bool(_WS_RE.match(ch))
        if ch_ws != in_ws:
            if current:
                tokens.append((current, in_ws))
                current = ""
            in_ws = ch_ws
        current += ch
    if current:
        tokens.append((current, in_ws))
    return tokens


def parse_text_pages(text_str: str, page_dims=None) -> list[Page]:
    """Raw text → list of synthetic Page trees."""
    if page_dims is None:
        page_dims = (612, 792)  # letter
    width, height = page_dims
    asc_h = _ASCENDER * FONT_SIZE
    desc_h = _DESCENDER * FONT_SIZE

    lines = re.split(r"\r?\n", text_str)
    page_index = 0
    page = Page(page_index, width, height)
    page.text_source = "text"
    pages = [page]
    if not lines or all(not ln.strip() for ln in lines):
        return pages

    available_width = width - MARGIN_HORIZONTAL * 2
    current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    def new_page():
        nonlocal page, page_index, current_y
        page_index += 1
        page = Page(page_index, width, height)
        page.text_source = "text"
        pages.append(page)
        current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    for line_text in lines:
        if not line_text.strip():
            current_y += LINE_HEIGHT
            if current_y + FONT_SIZE > height - MARGIN_VERTICAL:
                new_page()
            continue

        tokens = _split_tokens(line_text)
        par_lines: list[Line] = []
        par_right = MARGIN_HORIZONTAL

        def close_par():
            nonlocal par_lines, par_right
            if par_lines:
                par = Par(page, BBox(
                    MARGIN_HORIZONTAL, par_lines[0].bbox.top,
                    par_right, par_lines[-1].bbox.bottom))
                par.lines = list(par_lines)
                for ln in par_lines:
                    ln.par = par
                page.pars.append(par)
            par_lines = []
            par_right = MARGIN_HORIZONTAL

        idx = 0
        while idx < len(tokens):
            if current_y + FONT_SIZE > height - MARGIN_VERTICAL:
                close_par()
                new_page()

            baseline = [0, desc_h]
            line_top = round(current_y - asc_h)
            line_bottom = round(current_y + desc_h)
            current_x = float(MARGIN_HORIZONTAL)
            width_so_far = 0.0
            line = Line(page, BBox(MARGIN_HORIZONTAL, line_top,
                                   MARGIN_HORIZONTAL, line_bottom),
                        baseline, asc_h, None)

            last_consumed = idx
            for j in range(idx, len(tokens)):
                tok_text, is_ws = tokens[j]
                tok_width = _text_width(tok_text)
                if is_ws:
                    if not line.words and \
                            width_so_far + tok_width > available_width:
                        break
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = j + 1
                else:
                    if line.words and \
                            width_so_far + tok_width > available_width:
                        break  # wrap before this word
                    wbox = BBox(round(current_x), line_top,
                                round(current_x + tok_width), line_bottom)
                    wid = (f"word_{page_index + 1}_"
                           f"{len(page.lines) + 1}_{len(line.words) + 1}")
                    word = Word(line, wid, tok_text, wbox)
                    word.conf = 100
                    word.style.font = FONT_FAMILY
                    line.words.append(word)
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = j + 1

            if not line.words:
                tok_text, is_ws = tokens[idx]
                if not is_ws:  # force-place an oversized word
                    tok_width = _text_width(tok_text)
                    wbox = BBox(round(current_x), line_top,
                                round(current_x + tok_width), line_bottom)
                    wid = (f"word_{page_index + 1}_"
                           f"{len(page.lines) + 1}_1")
                    word = Word(line, wid, tok_text, wbox)
                    word.conf = 100
                    word.style.font = FONT_FAMILY
                    line.words.append(word)
                    current_x += tok_width
                    last_consumed = idx + 1
                else:
                    break  # oversized leading whitespace: drop the rest

            line.bbox = BBox(line.words[0].bbox.left, line_top,
                             round(current_x), line_bottom)
            page.lines.append(line)
            par_lines.append(line)
            par_right = max(par_right, line.bbox.right)
            current_y += LINE_HEIGHT
            idx = last_consumed

        close_par()

    page.angle = 0
    return pages
