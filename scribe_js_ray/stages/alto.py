"""ALTO XML → Page parser (reference: /root/reference/js/import/convertPageAlto.js:25-255).

Regex-scanning parser mirroring the reference's semantics: TextBlock →
paragraph, TextLine → line, String → word; word-level bboxes from
HPOS/VPOS/WIDTH/HEIGHT; baseline/x-height estimated from descender /
x-height character classes (convertPageAlto.js:151-206); STYLE /
STYLEREFS → word style; pass2+pass3 normalization applied at the end.
Runs per page inside a map_batches task.
"""

from __future__ import annotations

import re

from ..functions.textnorm import ASC_CHARS, X_CHARS, unescape_xml
from ..functions.stats import js_round
from ..model import BBox, Line, Page, Par, Word, bbox_union
from .shared import pass2, pass3

DESC_CHARS = frozenset("gjpqy")  # miscUtils.js:8

_PAGE_TAG_RE = re.compile(r"<Page[^>]+>", re.I)
_HEIGHT_RE = re.compile(r"HEIGHT=[\"'](\d+)[\"']", re.I)
_WIDTH_RE = re.compile(r"WIDTH=[\"'](\d+)[\"']", re.I)
_TEXTBLOCK_RE = re.compile(r"<TextBlock[^>]*>([\s\S]*?)</TextBlock>", re.I)
_TEXTBLOCK_TAG_RE = re.compile(r"<TextBlock[^>]+>", re.I)
_TEXTLINE_RE = re.compile(r"<TextLine[^>]*>[\s\S]*?</TextLine>", re.I)
_TEXTLINE_TAG_RE = re.compile(r"<TextLine[^>]+>", re.I)
_STRING_RE = re.compile(r"<(?:String)\s+[^>]+/?>", re.I)


def _attr(elem: str, name: str):
    m = re.search(name + r"=[\"']([^\"']+)[\"']", elem, re.I)
    return m.group(1) if m else None


def _median_sorted(vals):
    vals = sorted(vals)
    return vals[len(vals) // 2]


def parse_alto_page(ocr_str: str, n: int):
    """Parse one ALTO page string → (Page, lang_set)."""
    pm = _PAGE_TAG_RE.search(ocr_str)
    if not pm:
        raise ValueError("Failed to parse ALTO page element.")
    hm = _HEIGHT_RE.search(pm.group(0))
    wm = _WIDTH_RE.search(pm.group(0))
    if not hm or not wm:
        raise ValueError("Failed to parse page dimensions.")
    page = Page(n, int(wm.group(1)), int(hm.group(1)))
    page.text_source = "alto"

    def convert_line(match: str, block_style_refs):
        tag_m = _TEXTLINE_TAG_RE.search(match)
        if not tag_m:
            return None
        tag = tag_m.group(0)
        vpos, hpos = _attr(tag, "VPOS"), _attr(tag, "HPOS")
        height, width = _attr(tag, "HEIGHT"), _attr(tag, "WIDTH")
        if not (vpos and hpos and height and width):
            return None  # skip lines missing positions (reference warns)
        linebox = BBox(int(hpos), int(vpos),
                       int(hpos) + int(width), int(vpos) + int(height))
        line = Line(page, linebox, [0, 0], None, None)

        for content_match in _STRING_RE.findall(match):
            content = _attr(content_match, "CONTENT")
            if not content:
                continue
            text = unescape_xml(content)
            shpos, svpos = _attr(content_match, "HPOS"), \
                _attr(content_match, "VPOS")
            sheight, swidth = _attr(content_match, "HEIGHT"), \
                _attr(content_match, "WIDTH")
            if not (shpos and svpos and sheight and swidth):
                continue
            wbox = BBox(int(shpos), int(svpos),
                        int(shpos) + int(swidth), int(svpos) + int(sheight))
            wid = f"word_{n + 1}_{len(page.lines) + 1}_{len(line.words) + 1}"
            word = Word(line, wid, text, wbox)
            wc = _attr(content_match, "WC")
            if wc:
                word.conf = js_round(float(wc) * 100)
            style_attr = _attr(content_match, "STYLE")
            if style_attr:
                sa = style_attr.lower()
                word.style.bold = "bold" in sa
                word.style.italic = "italic" in sa
                word.style.underline = "underline" in sa
                word.style.sup = "superscript" in sa
                word.style.small_caps = "smallcaps" in sa
            style_refs = _attr(content_match, "STYLEREFS") or block_style_refs
            if style_refs:
                sm = re.search(
                    r"<TextStyle\s*ID=[\"']" + re.escape(style_refs) +
                    r"[\"'][^>]*>", ocr_str, re.I)
                if sm:
                    font_family = _attr(sm.group(0), "FONTFAMILY")
                    if font_family:
                        word.style.font = font_family
                    # FONTSIZE intentionally NOT used (convertPageAlto.js:139)
            line.words.append(word)

        if not line.words:
            return None

        # Baseline from words without descenders (convertPageAlto.js:151-177)
        without_desc = [w for w in line.words
                        if not any(c in DESC_CHARS for c in w.text)]
        if without_desc:
            median_bottom = _median_sorted(
                w.bbox.bottom for w in without_desc)
            line.baseline[1] = median_bottom - line.bbox.bottom
        elif line.words:
            line_height = line.bbox.bottom - line.bbox.top
            line.baseline[1] = -js_round(line_height * 0.25)

        # x-height from x-height-only words (convertPageAlto.js:180-206)
        xonly = [w for w in line.words
                 if w.text and all(c in X_CHARS for c in w.text)]
        has_asc = any(any(c in ASC_CHARS for c in w.text)
                      for w in line.words)
        if xonly:
            line.x_height = _median_sorted(
                w.bbox.bottom - w.bbox.top for w in xonly)
        else:
            baseline_y = line.bbox.bottom + line.baseline[1]
            top_to_baseline = baseline_y - line.bbox.top
            line.x_height = js_round(top_to_baseline) if not has_asc \
                else js_round(top_to_baseline * 0.67)

        page.lines.append(line)
        return line

    for block_match in _TEXTBLOCK_RE.finditer(ocr_str):
        block_tag_m = _TEXTBLOCK_TAG_RE.search(block_match.group(0))
        block_style_refs = _attr(block_tag_m.group(0), "STYLEREFS") \
            if block_tag_m else None
        par_lines = []
        for line_match in _TEXTLINE_RE.findall(block_match.group(1)):
            line = convert_line(line_match, block_style_refs)
            if line is not None:
                par_lines.append(line)
        if par_lines:
            par = Par(page, bbox_union(ln.bbox for ln in par_lines))
            for ln in par_lines:
                ln.par = par
            par.lines = par_lines
            page.pars.append(par)

    pass2(page, 0)
    lang_set = pass3(page)
    return page, lang_set


_STYLES_SECTION_RE = re.compile(r"<Styles>[\s\S]*?</Styles>", re.I)
_ALTO_PAGE_SPLIT_RE = re.compile(r"(?=<Page[ >])", re.I)


def split_alto_pages(ocr_str: str) -> list[str]:
    """Split a multi-page ALTO document into per-page strings, prepending
    the <Styles> section to each (importOCR.js:139-147 behavior)."""
    styles_m = _STYLES_SECTION_RE.search(ocr_str)
    styles = styles_m.group(0) if styles_m else ""
    parts = [p for p in _ALTO_PAGE_SPLIT_RE.split(ocr_str)
             if re.match(r"<Page[ >]", p, re.I)]
    if not parts:
        return [ocr_str]
    return [styles + p for p in parts]
