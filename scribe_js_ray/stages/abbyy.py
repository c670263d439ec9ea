"""Abbyy XML → Page parser (reference: /root/reference/js/import/convertPageAbbyy.js:30-474).

Semantics mirrored from the reference:

* char-level data required (``<charParams>``); pages without it return an
  empty Page with a char warning (convertPageAbbyy.js:57-65).
* page/text ``rotation`` → composed quarter-turn orientation
  (convertPageAbbyy.js:40-49, 70-84); char bboxes rotated into virtual
  horizontal space per orientation (:252-280).
* Abbyy has no word unit — lines split into words on space chars or
  formatting changes (abbyySplitRegex, :19), with the isTab → space and
  blank-char-next-to-formatting cleanups (:131-137) and the lone-period
  merge fix (:141-160).
* per-word style from the first char's formatting attrs, inherited from the
  previous word when absent (:198-226); drop-cap first word; small-caps
  fix after drop cap (:228-235).
* baseline slope = median of per-glyph rise vs the first baseline glyph
  (:301-313); line bbox recalculated from char unions, >0 coords only
  (:324-345); page angle = asin(mean50(slopes)) in degrees (:465-469).
* pass3 normalization only (no pass2 — Abbyy is not Tesseract).
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, mean50, quantile, round6
from ..functions.textnorm import ASC_CHARS, X_CHARS, unescape_xml
from ..model import BBox, Char, Line, Page, Par, Word, bbox_union
from .shared import pass3

_PAGE_TAG_RE = re.compile(r"<page[^>]*>")
_WIDTH_RE = re.compile(r"width=['\"](\d+)['\"]")
_HEIGHT_RE = re.compile(r"height=['\"](\d+)['\"]")
_ROTATION_RE = re.compile(r"rotation=['\"](\w+)['\"]")
_CHARPARAMS_RE = re.compile(r"<charParams", re.I)
_TEXT_TAG_RE = re.compile(r"<text[^>]*>")
_TEXT_ORIENT_RE = re.compile(r"orientation=['\"](\w+)['\"]")

_DROPCAP_RE = re.compile(r"<par dropCapCharsCount=['\"](\d*)", re.I)
_LINEBOX_RE = re.compile(
    r"<line baseline=['\"](\d*)['\"] l=['\"](\d*)['\"] t=['\"](\d*)['\"] "
    r"r=['\"](\d*)['\"] b=['\"](\d*)['\"]>", re.I)
_SPLIT_RE = re.compile(
    r"(?:<charParams[^>]*>\s*</charParams>)|(?:</formatting>\s*(?=<formatting))",
    re.I)
_CHAR_RE = re.compile(
    r"(<formatting[^>]+>\s*)?<charParams l=['\"](\d*)['\"] t=['\"](\d*)['\"] "
    r"r=['\"](\d*)['\"] b=['\"](\d*)['\"](?: suspicious=['\"](\w*)['\"])?"
    r"[^>]*>([^<]*)</charParams>", re.I)
_ISTAB_RE = re.compile(r"isTab=['\"](?:1|true)['\"][^>]*>[^<]+", re.I)
_BLANK_AFTER_FMT_RE = re.compile(
    r"(</formatting><formatting[^>]*>\s*)<charParams[^>]*>\s*</charParams>",
    re.I)
_BLANK_BEFORE_FMT_RE = re.compile(
    r"<charParams[^>]*>\s*</charParams>(\s*</formatting><formatting[^>]*>\s*)",
    re.I)
_WORD_TEXT_RE = re.compile(r">([^<>]+?)(?=</charParams>)")
_SUP_FMT_RE = re.compile(r"superscript=['\"](1|true)", re.I)
_FMT_PREFIX_RE = re.compile(r"(<formatting[^>]+>\s*)", re.I)
_FF_RE = re.compile(r"ff=['\"]([^'\"]*)")
_FORMATTING_TAG_RE = re.compile(r"<formatting[^>]+")


def _orient_of(s: str, clockwise_val: int, counter_val: int) -> int:
    if s == "RotatedClockwise":
        return clockwise_val
    if s == "RotatedUpsidedown":
        return 2
    if s == "RotatedCounterclockwise":
        return counter_val
    return 0


def parse_abbyy_page(ocr_str: str, n: int):
    """Parse one Abbyy XML page string → (Page, lang_set)."""
    pm = _PAGE_TAG_RE.search(ocr_str)
    width_s = _WIDTH_RE.search(pm.group(0)) if pm else None
    height_s = _HEIGHT_RE.search(pm.group(0)) if pm else None
    rot_s = _ROTATION_RE.search(pm.group(0)) if pm else None
    if not width_s or not height_s:
        raise ValueError("Failed to parse page dimensions.")
    width, height = int(width_s.group(1)), int(height_s.group(1))
    # Page rotation is "rotation applied to the original image" → inverse
    # of text rotation (convertPageAbbyy.js:40-49).
    page_orientation = _orient_of(rot_s.group(1) if rot_s else "", 3, 1)

    page = Page(n, width, height)
    page.text_source = "abbyy"

    if not _CHARPARAMS_RE.search(ocr_str):
        return page, set()  # char_error: line-level Abbyy data is unusable

    angle_rise_page: list[float] = []

    def convert_line(xml_line: str, text_orient_final: int, drop_cap: bool):
        baseline_slope_arr: list[float] = []
        baseline_first: list[float] = []

        pre_char = re.match(r"[\s\S]*?(?=<charParams)", xml_line)
        fmt_m = _FORMATTING_TAG_RE.search(pre_char.group(0)) if pre_char \
            else None
        ff_m = _FF_RE.search(fmt_m.group(0)) if fmt_m else None
        font_name = ff_m.group(1) if ff_m else None

        linebox_m = _LINEBOX_RE.search(xml_line)
        if linebox_m is None:
            return None
        line_box_raw = [int(x) for x in linebox_m.groups()]

        xml_line = _ISTAB_RE.sub("> ", xml_line)
        xml_line = _BLANK_AFTER_FMT_RE.sub(r"\1", xml_line)
        xml_line = _BLANK_BEFORE_FMT_RE.sub(r"\1", xml_line)

        word_str_arr1 = _SPLIT_RE.split(xml_line)
        word_str_arr: list[str] = []
        for chunk in word_str_arr1:
            if chunk is None:
                continue
            texts = _WORD_TEXT_RE.findall(chunk)
            if not texts:
                continue
            if len(texts) == 1 and texts[0] == ".":
                # lone period from formatting wrap: merge into previous
                # word unless it was a superscript (convertPageAbbyy.js:146-153)
                if word_str_arr and not _SUP_FMT_RE.search(word_str_arr[-1]):
                    word_str_arr[-1] += _FMT_PREFIX_RE.sub("", chunk, count=1)
                    continue
            word_str_arr.append(chunk)
        if not word_str_arr:
            return None

        nw = len(word_str_arr)
        bboxes: list[list[BBox]] = [[] for _ in range(nw)]
        texts = [""] * nw
        chars: list[list[Char]] = [[] for _ in range(nw)]
        italic = [False] * nw
        bold = [False] * nw
        underline = [False] * nw
        sup = [False] * nw
        dropcap_arr = [False] * nw
        small_caps = [False] * nw
        word_susp = [False] * nw

        for i, word_str in enumerate(word_str_arr):
            letters = list(_CHAR_RE.finditer(word_str))
            if not letters:
                continue
            fmt = letters[0].group(1)
            if fmt is not None:
                if drop_cap and i == 0:
                    dropcap_arr[i] = True
                elif _SUP_FMT_RE.search(fmt):
                    sup[i] = True
                else:
                    italic[i] = bool(re.search(
                        r"italic=['\"](1|true)", fmt, re.I))
                    bold[i] = bool(re.search(
                        r"bold=['\"](1|true)", fmt, re.I))
                    underline[i] = bool(re.search(
                        r"underline=['\"](1|true)", fmt, re.I))
                if re.search(r"smallcaps=['\"](1|true)", fmt, re.I):
                    small_caps[i] = True
            elif i > 0 and not dropcap_arr[i - 1]:
                italic[i] = italic[i - 1]
                bold[i] = bold[i - 1]
                underline[i] = underline[i - 1]
                sup[i] = sup[i - 1]
                small_caps[i] = small_caps[i - 1]

            # caps after a drop cap misread as small caps (js:228-235)
            drop_cap_fix = False
            if drop_cap and i == 1 and small_caps[i]:
                small_caps[i] = False
                drop_cap_fix = True

            for lm in letters:
                if lm.group(2) == "0":  # glyphs at coordinate 0 skipped
                    continue
                l0, t0 = int(lm.group(2)), int(lm.group(3))
                r0, b0 = int(lm.group(4)), int(lm.group(5))
                if text_orient_final == 1:
                    bbox = BBox(js_round(t0), js_round(width - max(r0, l0)),
                                js_round(b0), js_round(width - min(l0, l0)))
                elif text_orient_final == 2:
                    bbox = BBox(js_round(width - r0), js_round(height - b0),
                                js_round(width - l0), js_round(height - t0))
                elif text_orient_final == 3:
                    bbox = BBox(js_round(height - b0), js_round(min(l0, l0)),
                                js_round(height - t0), js_round(max(r0, r0)))
                else:
                    bbox = BBox(js_round(l0), js_round(t0), js_round(r0), js_round(b0))
                bboxes[i].append(bbox)

                letter_susp = lm.group(6) in ("1", "true")
                if letter_susp:
                    word_susp[i] = True

                letter = lm.group(7)
                if drop_cap_fix:
                    letter = letter.upper()
                letter = unescape_xml(letter)

                asc_char = letter in ASC_CHARS
                x_char = letter in X_CHARS
                if (asc_char or x_char) and not letter_susp \
                        and not drop_cap_fix and not (drop_cap and i == 0):
                    if not baseline_first:
                        baseline_first.extend([bbox.left, bbox.bottom])
                    else:
                        dx = bbox.left - baseline_first[0]
                        if dx != 0:
                            baseline_slope_arr.append(
                                (bbox.bottom - baseline_first[1]) / dx)

                texts[i] += letter
                chars[i].append(Char(letter, bbox))

        all_boxes = [b for bb in bboxes for b in bb]
        lefts = [b.left for b in all_boxes if b.left > 0]
        tops = [b.top for b in all_boxes if b.top > 0]
        rights = [b.right for b in all_boxes if b.right > 0]
        bottoms = [b.bottom for b in all_boxes if b.bottom > 0]

        baseline_slope = quantile(baseline_slope_arr, 0.5) or 0

        if lefts and tops and rights and bottoms:
            calc = (min(lefts), min(tops), max(rights), max(bottoms))
        else:
            calc = tuple(line_box_raw[1:5])

        baseline_point = 0.0
        if baseline_first:
            baseline_point = baseline_first[1] - calc[3]
            if baseline_slope < 0:
                baseline_point -= baseline_slope * (baseline_first[0] - calc[0])
        baseline_point = baseline_point or 0

        line = Line(page, BBox(*calc),
                    [round6(baseline_slope), js_round(baseline_point)])
        line.orientation = text_orient_final

        letters_kept = 0
        for i in range(nw):
            if texts[i].strip() == "":
                continue
            bl = [b.left for b in bboxes[i] if b.left > 0]
            br = [b.right for b in bboxes[i] if b.right > 0]
            bt = [b.top for b in bboxes[i] if b.top > 0]
            bb_ = [b.bottom for b in bboxes[i] if b.bottom > 0]
            if not (bl and br and bt and bb_):
                continue  # all char coords at 0 → word skipped (js:368-381)
            wbox = BBox(min(bl), min(bt), max(br), max(bb_))
            wid = f"word_{n + 1}_{len(page.lines) + 1}_{i + 1}"
            word = Word(line, wid, texts[i], wbox)
            word.chars = chars[i]
            word.conf = 0 if word_susp[i] else 100
            word.style.italic = italic[i]
            word.style.bold = bold[i]
            word.style.underline = underline[i]
            word.style.small_caps = small_caps[i]
            if font_name:
                word.style.font = font_name
            if sup[i]:
                word.style.sup = True
            elif dropcap_arr[i]:
                word.style.dropcap = True
            line.words.append(word)
            letters_kept += 1

        if letters_kept == 0:
            return None
        page.lines.append(line)
        return line, baseline_slope

    def convert_text(xml_text: str):
        tm = _TEXT_TAG_RE.search(xml_text)
        om = _TEXT_ORIENT_RE.search(tm.group(0)) if tm else None
        text_orientation = _orient_of(om.group(1) if om else "", 1, 3)
        text_orient_final = (page_orientation + text_orientation) % 4

        for xml_par in xml_text.split("</par>"):
            drop_cap_m = _DROPCAP_RE.search(xml_par)
            drop_cap = bool(drop_cap_m and drop_cap_m.group(1)
                            and int(drop_cap_m.group(1)) > 0)
            par_lines = []
            for xml_line in xml_par.split("</line>"):
                res = convert_line(xml_line, text_orient_final, drop_cap)
                if res is None:
                    continue
                line, slope = res
                par_lines.append(line)
                if not math.isnan(slope):
                    angle_rise_page.append(slope)
            if par_lines:
                par = Par(page, bbox_union(ln.bbox for ln in par_lines))
                for ln in par_lines:
                    ln.par = par
                par.lines = par_lines
                page.pars.append(par)

    for xml_text in ocr_str.split("</text>"):
        convert_text(xml_text)

    angle_rise_median = mean50(angle_rise_page) or 0
    page.angle = math.asin(angle_rise_median) * (180 / math.pi)

    lang_set = pass3(page)
    return page, lang_set


_ABBYY_PAGE_SPLIT_RE = re.compile(r"(?=<page[ >])", re.I)


def split_abbyy_pages(ocr_str: str) -> list[str]:
    parts = [p for p in _ABBYY_PAGE_SPLIT_RE.split(ocr_str)
             if re.match(r"<page[ >]", p, re.I)]
    return parts if parts else [ocr_str]
