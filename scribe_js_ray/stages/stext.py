"""mupdf stext XML → Page parser (reference: /root/reference/js/import/convertPageStext.js:24-701).

Semantics mirrored: per-char quads with orientation from ``dir=`` (:58-67);
no native word unit — split on space chars and font changes (:83-89);
superscript detection from baseline+size deltas at font changes with the
one-word cap (:264-306, :468-473); size-drop small-caps state machine with
title-case adjustment (:258-300, :583-599); char bbox rotation into virtual
horizontal per orientation (:394-419); baseline slope from ``dir`` (:483-497);
CJK char-per-word (:536-551); page angle = asin(mean50(slopes<0.3)) (:640-664).
Table auto-detection is disabled in the reference (autoDetectTables=false)
and not ported.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, mean50, round6
from ..functions.textnorm import calc_lang, unescape_xml
from ..model import BBox, Char, Line, Page, Par, Word, bbox_union, \
    update_line_bbox
from .shared import pass3  # noqa: F401  (stext does NOT run pass3; kept for API symmetry)

_PAGE_DIMS_RE = re.compile(
    r"<page .+?width=['\"]([\d.-]+)['\"] height=['\"]([\d.-]+)['\"]")
_BLOCK_TAG_RE = re.compile(r"<block[^>]*?>", re.I)
_DIR_RE = re.compile(r"dir=['\"](\s*[\d.-]+)(\s*[\d.-]+)")
_FONT_TAG_RE = re.compile(r"<font[^>]+")
_NAME_RE = re.compile(r"name=['\"]([^'\"]*)")
_SIZE_RE = re.compile(r"size=['\"]([^'\"]*)")
_LINEBOX_RE = re.compile(
    r"bbox(?:es)?=['\"](\s*[\d.-]+)(\s*[\d.-]+)?(\s*[\d.-]+)?(\s*[\d.-]+)?")
_SPACE_CHAR_SPLIT_RE = re.compile(r"(?:<char[^>]*?c=['\"]\s+['\"]\s*/>)", re.I)
_STEXT_CHAR_RE = re.compile(
    r"(<font[^>]+>\s*)|<char quad=['\"](\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)"
    r"(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)"
    r"[^>]*?x=['\"]([\d.-]+)[^>]*?y=['\"]([\d.-]+)['\"]"
    r"([^>]*?c=['\"][^'\"]+['\"])\s*/>", re.I)
_FLAGS_RE = re.compile(r"flags=['\"]([^'\"]*)")
_C_RE = re.compile(r"c=['\"]([^'\"]*)")
_SMALLCAPS_FONT_RE = re.compile(r"(small\W?cap)|(sc$)|(caps$)", re.I)
_ITALIC_FONT_RE = re.compile(
    r"italic|oblique", re.I)
_ITALIC_FONT_RE2 = re.compile(r"-\w*ital|-it$", re.I)
_BOLD_FONT_RE = re.compile(r"bold|black", re.I)


class _StextFont:
    __slots__ = ("name", "size")

    def __init__(self, name, size):
        self.name = name
        self.size = size


class _StextChar:
    __slots__ = ("quad", "origin", "flags", "text")

    def __init__(self, quad, origin, flags, text):
        self.quad = quad   # dict ul/ur/ll/lr of (x, y)
        self.origin = origin
        self.flags = flags
        self.text = text


def parse_stext_page(ocr_str: str, n: int):
    """Parse one stext page string → (Page, lang_set)."""
    dm = _PAGE_DIMS_RE.search(ocr_str)
    if not dm:
        raise ValueError("Page dimensions not found in stext.")
    width, height = int(float(dm.group(1))), int(float(dm.group(2)))
    page = Page(n, width, height)
    page.text_source = "stext"

    angle_rise_page: list[float] = []
    lang_set: set[str] = set()

    def convert_line(xml_line: str, par_line_arr: list):
        xml_line = _BLOCK_TAG_RE.sub("", xml_line, count=1)
        pre_m = re.match(r"[\s\S]*?(?=<char)", xml_line)
        pre = pre_m.group(0) if pre_m else ""
        if not pre:
            return None

        dir_m = _DIR_RE.search(pre)
        d = [float(dir_m.group(1)), float(dir_m.group(2))] if dir_m else None
        orientation = 0
        if d and abs(d[0]) < 0.5 and d[1] >= 0.5:
            orientation = 1
        elif d and d[0] <= -0.5 and abs(d[1]) < 0.5:
            orientation = 2
        elif d and abs(d[0]) < 0.5 and d[1] <= -0.5:
            orientation = 3

        fmt_m = _FONT_TAG_RE.search(pre)
        font_name = None
        font_size_line = 10.0
        if fmt_m:
            nm = _NAME_RE.search(fmt_m.group(0))
            sm = _SIZE_RE.search(fmt_m.group(0))
            font_name = nm.group(1) if nm else None
            if sm:
                font_size_line = float(sm.group(1))
        font_family_line = re.sub(r"-.+", "", font_name) if font_name \
            else "Default"

        lb_m = _LINEBOX_RE.search(pre)
        if not lb_m:
            return None
        line_box = [max(float(x or "0"), 0) for x in lb_m.groups()]

        word_str_arr = _SPACE_CHAR_SPLIT_RE.split(xml_line)
        if word_str_arr and word_str_arr[-1].strip() == "</font>":
            word_str_arr.pop()
        word_str_arr = [w for w in word_str_arr if w.strip() != ""]
        if not word_str_arr:
            return None

        # Parse every chunk into font-change / char events.
        word_char_or_font: list[list] = []
        for i, chunk in enumerate(word_str_arr):
            events = []
            matches = list(_STEXT_CHAR_RE.finditer(chunk))
            for j, m in enumerate(matches):
                font_str = m.group(1)
                if font_str is not None:
                    fn = _NAME_RE.search(font_str)
                    fs = _SIZE_RE.search(font_str)
                    if fn is not None and fs is not None:
                        # skip font changes at end of line (js:187-189)
                        if i + 1 == len(word_str_arr) and \
                                j + 1 == len(matches):
                            continue
                        events.append(_StextFont(fn.group(1),
                                                 float(fs.group(1))))
                    continue
                q = [float(m.group(k)) for k in range(2, 10)]
                if orientation == 1:
                    quad = {"ul": (q[4], q[5]), "ur": (q[0], q[1]),
                            "ll": (q[6], q[7]), "lr": (q[2], q[3])}
                elif orientation == 2:
                    quad = {"ul": (q[6], q[7]), "ur": (q[4], q[5]),
                            "ll": (q[2], q[3]), "lr": (q[0], q[1])}
                elif orientation == 3:
                    quad = {"ul": (q[2], q[3]), "ur": (q[6], q[7]),
                            "ll": (q[0], q[1]), "lr": (q[4], q[5])}
                else:
                    quad = {"ul": (q[0], q[1]), "ur": (q[2], q[3]),
                            "ll": (q[4], q[5]), "lr": (q[6], q[7])}
                tail = m.group(12) or ""
                fl_m = _FLAGS_RE.search(tail)
                c_m = _C_RE.search(tail)
                flags = int(fl_m.group(1)) if fl_m and fl_m.group(1) else 0
                events.append(_StextChar(
                    quad, (float(m.group(10)), float(m.group(11))),
                    flags, c_m.group(1) if c_m else ""))
            word_char_or_font.append(events)

        bboxes: list[list[BBox]] = []
        text_arr: list[list[str]] = []
        bold_arr: list[bool] = []
        italic_arr: list[bool] = []
        underline_arr: list[bool] = []
        small_caps_arr: list[bool] = []
        small_caps_alt_arr: list[bool] = []
        small_caps_alt_title_arr: list[bool] = []
        font_family_arr: list[str] = []
        font_size_arr: list[float] = []
        super_arr: list[bool] = []

        baseline_first_done = False
        baseline_first: list[float] = []
        baseline_current = 0.0
        bold_current = False
        italic_current = False
        family_current = "Default"
        size_current_raw = 0.0
        size_current = 0.0
        super_current = False
        small_caps_current = None
        small_caps_current_alt = None

        for i, events in enumerate(word_char_or_font):
            text_word: list[str] = []
            bboxes_word: list[BBox] = []
            underline_word: list[bool] = []
            font_family = family_current or font_family_line or "Default"
            font_size_word = size_current or font_size_line or 10
            small_caps_word = small_caps_current or False
            small_caps_word_alt = small_caps_current_alt or False
            small_caps_title_adj = False
            bold_word = False
            italic_word = False
            if not events:
                continue
            word_char_n = 0

            for j, ev in enumerate(events):
                if isinstance(ev, _StextFont):
                    size_prev_raw = size_current_raw
                    size_current_raw = ev.size
                    second_letter = word_char_n > 0 and \
                        len(text_word) == 1 and \
                        bool(re.match(r"[A-Z]", text_word[0]))

                    baseline_next = None
                    for cand in (events[j + 1] if j + 1 < len(events)
                                 else None,
                                 *(word_char_or_font[i + 1][:3]
                                   if i + 1 < len(word_char_or_font)
                                   else [])):
                        if isinstance(cand, _StextChar):
                            baseline_next = cand.origin[1]
                            break

                    font_size_min = min(size_current_raw, size_prev_raw)
                    baseline_delta = ((baseline_next - baseline_current) /
                                      font_size_min) \
                        if baseline_next is not None and font_size_min else \
                        float("nan")
                    size_delta = ((size_current_raw - size_prev_raw) /
                                  font_size_min) if font_size_min else \
                        float("nan")

                    if second_letter and size_current_raw < size_prev_raw \
                            and size_prev_raw > 0 \
                            and baseline_next is not None \
                            and abs(baseline_delta) < 0.1:
                        small_caps_current_alt = True
                        small_caps_word_alt = True
                        small_caps_title_adj = True
                    elif math.isfinite(baseline_delta) and \
                            math.isfinite(size_delta) and \
                            ((baseline_delta < -0.25 and size_delta < -0.05)
                             or (baseline_delta > 0.25 and
                                 size_delta > 0.05)):
                        # superscript start/end → split word (js:264-306)
                        if text_word:
                            text_arr.append(text_word)
                            bboxes.append(bboxes_word)
                            bold_arr.append(bold_word)
                            italic_arr.append(italic_word)
                            underline_arr.append(
                                sum(underline_word) / len(underline_word)
                                > 0.5 if underline_word else False)
                            font_family_arr.append(font_family)
                            font_size_arr.append(
                                size_prev_raw if size_delta > 0
                                else font_size_word)
                            small_caps_arr.append(small_caps_word)
                            small_caps_alt_arr.append(small_caps_word_alt)
                            small_caps_alt_title_arr.append(
                                small_caps_title_adj)
                            super_arr.append(size_delta > 0)
                            text_word = []
                            bboxes_word = []
                        if size_delta > 0:
                            if not baseline_first_done:
                                baseline_first.clear()
                            family_current = ev.name or family_current
                            size_current = size_current_raw or size_current
                            font_size_word = size_current
                            font_family = family_current
                            if super_arr:
                                super_arr[-1] = True
                        if super_arr and not super_arr[-1] and \
                                baseline_first:
                            baseline_first_done = True
                        super_current = size_delta < 0
                    else:
                        size_current = size_current_raw or size_current
                        family_current = ev.name or family_current
                        if not text_word:
                            font_size_word = size_current
                            font_family = family_current
                        if math.isfinite(size_delta) and \
                                abs(size_delta) > 0.05:
                            small_caps_current_alt = False
                            if not text_word:
                                super_current = False
                                small_caps_word_alt = False
                                small_caps_title_adj = False

                    if small_caps_current_alt is None:
                        small_caps_current_alt = (
                            small_caps_alt_arr[-1] if small_caps_alt_arr
                            else None)
                    small_caps_current = bool(
                        _SMALLCAPS_FONT_RE.search(ev.name))
                    small_caps_word = small_caps_current
                    italic_current = bool(
                        _ITALIC_FONT_RE.search(ev.name) or
                        _ITALIC_FONT_RE2.search(ev.name))
                    bold_current = bool(_BOLD_FONT_RE.search(ev.name))
                    continue
                else:
                    baseline_current = ev.origin[1]

                if word_char_n == 0 or (word_char_n < 3 and
                                        re.match(r"[A-Z\d]", ev.text or "",
                                                 re.I)):
                    bold_word = bold_current
                    italic_word = italic_current
                    word_char_n += 1

                q = ev.quad
                ox, oy = ev.origin
                if orientation == 1:
                    bbox = BBox(js_round(oy),
                                js_round(width - max(q["ur"][0], q["lr"][0])),
                                js_round(oy + (q["lr"][1] - q["ur"][1])),
                                js_round(width - min(q["ul"][0], q["ll"][0])))
                elif orientation == 2:
                    bbox = BBox(js_round(width - ox),
                                js_round(height - max(q["ll"][1], q["lr"][1])),
                                js_round(width - (ox - (q["ur"][0] -
                                                     q["ul"][0]))),
                                js_round(height - min(q["ul"][1], q["ur"][1])))
                elif orientation == 3:
                    bbox = BBox(js_round(height - oy),
                                js_round(min(q["ul"][0], q["ll"][0])),
                                js_round(height - oy + (q["lr"][1] -
                                                     q["ur"][1])),
                                js_round(max(q["ur"][0], q["lr"][0])))
                else:
                    bbox = BBox(js_round(ox),
                                js_round(min(q["ul"][1], q["ur"][1])),
                                js_round(ox + (q["ur"][0] - q["ul"][0])),
                                js_round(max(q["ll"][1], q["lr"][1])))

                if not super_current and not baseline_first:
                    if orientation == 1:
                        origin_y = width - ox
                    elif orientation == 2:
                        origin_y = height - oy
                    elif orientation == 3:
                        origin_y = ox
                    else:
                        origin_y = oy
                    baseline_first.extend([bbox.left, origin_y])

                if small_caps_current_alt is None:
                    small_caps_current_alt = (
                        small_caps_alt_arr[-1] if small_caps_alt_arr
                        else None)

                text_word.append(ev.text or "")
                underline_word.append(ev.flags == 2)
                bboxes_word.append(bbox)

            if not text_word:
                continue
            underline_arr.append(
                sum(underline_word) / len(underline_word) > 0.5)
            text_arr.append(text_word)
            bboxes.append(bboxes_word)
            bold_arr.append(bold_word)
            italic_arr.append(italic_word)
            font_family_arr.append(font_family)
            font_size_arr.append(font_size_word)
            small_caps_alt_arr.append(small_caps_word_alt)
            small_caps_arr.append(small_caps_word)
            small_caps_alt_title_arr.append(small_caps_title_adj)
            # superscripts are only one word long (js:468-473)
            if super_current and super_arr and super_arr[-1]:
                super_arr[-1] = False
                super_current = False
            super_arr.append(super_current)
            if super_current:
                font_size_arr[-1] = size_current_raw

        if not bboxes:
            return None

        baseline_slope = 0.0
        if d is not None and not math.isnan(d[0]) and not math.isnan(d[1]):
            if orientation == 1:
                baseline_slope = -d[0]
            elif orientation == 2:
                baseline_slope = -d[1]
            elif orientation == 3:
                baseline_slope = d[0]
            else:
                baseline_slope = d[1]

        line_bbox = BBox(line_box[0], line_box[1], line_box[2], line_box[3])
        baseline_point = (baseline_first[1] - line_bbox.bottom) \
            if baseline_first else 0
        baseline_point = baseline_point or 0
        letter_height = font_size_line * 0.6

        line = Line(page, line_bbox,
                    [round6(baseline_slope), js_round(baseline_point)],
                    letter_height, None)
        line.orientation = orientation

        letters_kept = 0
        for i, tw in enumerate(text_arr):
            word_text = unescape_xml("".join(tw))
            if word_text.strip() == "":
                continue
            word_lang = calc_lang(word_text)
            lang_set.add(word_lang)
            wid = f"word_{n + 1}_{len(page.lines) + 1}_{i + 1}"
            bbs = bboxes[i]
            char_objs = []
            if word_lang == "chi_sim":
                # CJK: every char is its own word (js:536-551)
                for j, letter in enumerate(tw):
                    w = Word(line, f"{wid}_{j}", unescape_xml(letter), bbs[j])
                    w.conf = 100
                    w.lang = word_lang
                    # stext boxes are font bounding boxes
                    # (convertPageStext.js:544).
                    w.visual_coords = False
                    line.words.append(w)
                    letters_kept += 1
                continue
            for j, letter in enumerate(tw):
                char_objs.append(Char(unescape_xml(letter), bbs[j]))
            bbox = BBox(min(b.left for b in bbs), min(b.top for b in bbs),
                        max(b.right for b in bbs),
                        max(b.bottom for b in bbs))
            if bbox.left < 0 and bbox.right < 0:
                continue
            word = Word(line, wid, word_text, bbox)
            word.style.size = font_size_arr[i]
            word.lang = word_lang
            word.chars = char_objs
            word.conf = 100
            # stext boxes are font bounding boxes (convertPageStext.js:575).
            word.visual_coords = False
            if small_caps_alt_arr[i] and \
                    not re.search(r"[a-z]", word.text) and \
                    re.search(r"[A-Z].?[A-Z]", word.text):
                word.style.small_caps = True
                start = 1 if small_caps_alt_title_arr[i] else 0
                for c in word.chars[start:]:
                    c.text = c.text.lower()
                word.text = "".join(c.text for c in word.chars)
            elif small_caps_arr[i]:
                word.style.small_caps = True
            word.style.italic = italic_arr[i]
            word.style.bold = bold_arr[i]
            word.style.font = font_family_arr[i]
            word.style.sup = super_arr[i]
            word.style.underline = underline_arr[i]
            line.words.append(word)
            letters_kept += 1

        if letters_kept == 0:
            return None
        update_line_bbox(line)  # mupdf line boxes are oversized (js:628-631)
        page.lines.append(line)
        par_line_arr.append(line)
        return baseline_slope

    for xml_par in ocr_str.split("</block>"):
        par_lines: list[Line] = []
        for xml_line in xml_par.split("</line>"):
            slope = convert_line(xml_line, par_lines)
            if slope is not None and not math.isnan(slope) \
                    and abs(slope) < 0.3:
                angle_rise_page.append(slope)
        if par_lines:
            par = Par(page, bbox_union(ln.bbox for ln in par_lines))
            for ln in par_lines:
                ln.par = par
            par.lines = par_lines
            page.pars.append(par)

    angle_rise_median = mean50(angle_rise_page) or 0
    page.angle = math.asin(angle_rise_median) * (180 / math.pi)
    return page, lang_set


_STEXT_PAGE_SPLIT_RE = re.compile(r"(?=<page[ >])", re.I)


def split_stext_pages(ocr_str: str) -> list[str]:
    parts = [p for p in _STEXT_PAGE_SPLIT_RE.split(ocr_str)
             if re.match(r"<page[ >]", p, re.I)]
    return parts if parts else [ocr_str]
