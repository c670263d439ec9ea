"""hOCR (HTML) → Page parser.

Behavioral port of /root/reference/js/import/convertPageHocr.js:22-386:
regex scanning of ocr_page / ocr_par / ocr_line / ocrx_word / ocrx_cinfo
spans, with the same bbox/baseline/x_size title parsing, per-char mode,
<sup>/ocr_dropcap styles, and Chinese char-per-word behavior.  All regexes
are compiled once at module import (warm per worker process).
"""

from __future__ import annotations

import re

from ..functions.textnorm import get_text_script, unescape_xml
from ..model import BBox, Char, Line, Page, Word
from .shared import pass2, pass3

_PAGE_DIV_RE = re.compile(r"<div class=[\"']ocr_page[\"'][^>]+", re.I)
_PAGE_BBOX_RE = re.compile(r"bbox \d+ \d+ (\d+) (\d+)", re.I)
_CHARMODE_RE = re.compile(r"ocrx_cinfo")
_STRONG_EM_RE = re.compile(r"</?strong>|</?em>", re.I)
_HTML_TAG_RE = re.compile(r"<html[^>]*>", re.I)
_CLASS_FIX_RES = [
    (re.compile(r"(class=')ocr_caption", re.I), r"\1ocr_line"),
    (re.compile(r"(class=')ocr_textfloat", re.I), r"\1ocr_line"),
    (re.compile(r"(class=')ocr_header", re.I), r"\1ocr_line"),
]
_LINE_RE = re.compile(
    r"<span class=[\"']ocr_line[\s\S]+?(?:</span>\s*){2}", re.I)
_LINE_RE_CHAR = re.compile(
    r"<span class=[\"']ocr_line[\s\S]+?(?:</span>\s*)(?:</em>\s*)?(?:</span>\s*){2}",
    re.I)
_WORD_RE = re.compile(r"<span class=[\"']ocrx_word[\s\S]+?(?:</span>\s*)", re.I)
_WORD_RE_CHAR = re.compile(
    r"<span class=[\"']ocrx_word[\s\S]+?(?:</span>\s*)(?:</em>\s*)?(?:</span>\s*){1}",
    re.I)
_CHAR_RE = re.compile(
    r"<span class=[\"']ocrx_cinfo[\"'] title='([^'\"]+)[\"']>([^<]*)</span>", re.I)
_PAR_RE = re.compile(r"<p class=[\"']ocr_par[\s\S]+?(?:</p>\s*)", re.I)
_TITLE_RE = re.compile(r"title=['\"]([^'\"]+)")
_BBOX_RE = re.compile(r"bbox(?:es)?(\s+[\d.-]+)(\s+[\d.-]+)?(\s+[\d.-]+)?(\s+[\d.-]+)?")
_BASELINE_RE = re.compile(r"baseline(\s+[\d.-]+)(\s+[\d.-]+)")
_XSIZE_RE = re.compile(r"x_size\s+([\d.-]+)")
_XASC_RE = re.compile(r"x_ascenders\s+([\d.-]+)")
_XDESC_RE = re.compile(r"x_descenders\s+([\d.-]+)")
_SCRIBE_ASC_RE = re.compile(r"x_asc_height\s+([\d.-]+)")
_SCRIBE_X_RE = re.compile(r"x_x_height\s+([\d.-]+)")
_WCONF_RE = re.compile(r"(?:;|\s)x_wconf\s+(\d+)")
_FSIZE_RE = re.compile(r"(?:;|\s)x_fsize\s+(\d+)")
_ID_RE = re.compile(r"id=['\"]([^'\"]*)['\"]", re.I)
_LANG_RE = re.compile(r"lang=['\"]([^'\"]*)['\"]", re.I)
_PAR_LANG_RE = re.compile(r"^.+?lang=['\"]([^'\"]*)['\"]", re.I | re.S)
_XFONT_RE = re.compile(r"^[^>]+?x_font\s*([^'\";]+)")
_STYLE_RE = re.compile(r"style=['\"]([^'\"]+)")
_SUP_RE = re.compile(r"<sup>", re.I)
_DROPCAP_RE = re.compile(r"<span class=['\"]ocr_dropcap['\"]>", re.I)
_TEXT_RE = re.compile(r">([^>]*)<")
_WBOX_NUMS_RE = re.compile(r"(\d+) (\d+) (\d+) (\d+)")


def _parse_bbox4(title: str):
    m = _BBOX_RE.search(title)
    if not m:
        return None
    vals = [int(float(g)) for g in m.groups() if g is not None]
    if len(vals) < 4:
        return None
    return vals


def parse_hocr_page(ocr_str: str, n: int, page_dims=None, scribe_mode=False):
    """Parse one hOCR page string → Page (with pass2+pass3 applied).

    Returns (page, lang_set).
    """
    current_lang = "eng"

    if page_dims is None:
        pm = _PAGE_DIV_RE.search(ocr_str)
        if pm:
            dm = _PAGE_BBOX_RE.search(pm.group(0))
            if dm:
                page_dims = (int(dm.group(1)), int(dm.group(2)))
    if page_dims is None:
        raise ValueError("Failed to parse page dimensions.")

    page = Page(n, page_dims[0], page_dims[1])
    char_mode = bool(_CHARMODE_RE.search(ocr_str))
    line_re = _LINE_RE_CHAR if char_mode else _LINE_RE

    ocr_str = _STRONG_EM_RE.sub("", ocr_str)
    ocr_str = _HTML_TAG_RE.sub("<html>", ocr_str, count=1)
    for rx, rep in _CLASS_FIX_RES:
        ocr_str = rx.sub(rep, ocr_str)

    def convert_word(m, line):
        match = m.group(0)
        wid_m = _ID_RE.search(match)
        wid = wid_m.group(1) if wid_m else \
            f"word_{n + 1}_{len(page.lines) + 1}_{len(line.words) + 1}"

        lower = match.lower()
        word_sup = "<sup>" in lower          # exact _SUP_RE equivalent
        word_dropcap = "ocr_dropcap" in lower and \
            bool(_DROPCAP_RE.search(match))

        if word_sup:
            stripped = re.sub(r"\s*<sup>", "", match, count=1, flags=re.I)
            stripped = re.sub(r"</sup>\s*", "", stripped, count=1, flags=re.I)
            tm = _TEXT_RE.search(stripped)
        elif word_dropcap:
            stripped = re.sub(r"\s*<span class=['\"]ocr_dropcap['\"]>", "",
                              match, count=1, flags=re.I)
            tm = _TEXT_RE.search(stripped)
        else:
            tm = _TEXT_RE.search(match)
        if not tm or not tm.group(1):
            return ""
        text = unescape_xml(tm.group(1))

        title_m = _TITLE_RE.search(match)
        if not title_m:
            return ""
        title = title_m.group(1)

        lang_m = _LANG_RE.search(match) if "lang=" in lower else None
        lang = lang_m.group(1) if lang_m else current_lang

        bb = _parse_bbox4(title)
        if not bb:
            return ""
        word = Word(line, wid, text, BBox(*[float(v) for v in bb]))
        word.lang = lang

        if scribe_mode and "x_fsize" in title:
            fm = _FSIZE_RE.search(title)
            if fm and int(fm.group(1)):
                word.style.size = int(fm.group(1))

        sm = _STYLE_RE.search(match) if "style=" in match else None
        if sm:
            style_str = sm.group(1).lower()
            if "italic" in style_str:
                word.style.italic = True
            if "bold" in style_str:
                word.style.bold = True
            if "small-caps" in style_str:
                word.style.small_caps = True
        if word_sup:
            word.style.sup = True
        if "x_font" in match:
            fm = _XFONT_RE.search(match)
            if fm:
                word.style.font = fm.group(1).strip()
        cm = _WCONF_RE.search(title) if "x_wconf" in title else None
        word.conf = int(cm.group(1)) if cm else 0

        line.words.append(word)
        return ""

    def convert_word_char_level(m, line):
        match = m.group(0)
        title_m = _TITLE_RE.search(match)
        title = title_m.group(1) if title_m else ""
        cm = _WCONF_RE.search(title)
        conf = int(cm.group(1)) if cm else 0
        italic = bool(re.search(r"</em>\s*</span>", match))
        wid_m = _ID_RE.search(match)
        wid = wid_m.group(1) if wid_m else \
            f"word_{n + 1}_{len(page.lines) + 1}_{len(line.words) + 1}"
        lang_m = _LANG_RE.search(match)
        lang_raw = lang_m.group(1) if lang_m else None
        font_m = _XFONT_RE.search(match)
        font = font_m.group(1).strip() if font_m else None

        letters = list(_CHAR_RE.finditer(match))
        if not letters:
            return ""
        bboxes = []
        for lm in letters:
            bm = _WBOX_NUMS_RE.search(lm.group(1))
            bboxes.append([int(g) for g in bm.groups()] if bm else None)

        lang = lang_raw or current_lang
        if lang in ("chi_sim", "chi_tra"):
            script = get_text_script([lm.group(2) for lm in letters])
            if script["han"] == 0:
                if current_lang not in ("chi_sim", "chi_tra"):
                    lang = current_lang
                elif script["latin"] > 0:
                    lang = "eng"

        chars = []
        text = ""
        for j, lm in enumerate(letters):
            ch_text = unescape_xml(lm.group(2))
            bb = bboxes[j]
            bbox = BBox(*[float(v) for v in bb]) if bb else BBox(0, 0, 0, 0)
            if lang == "chi_sim":
                w = Word(line, f"{wid}_{j}", ch_text, bbox)
                w.conf = conf
                w.lang = lang
                line.words.append(w)
            else:
                chars.append(Char(ch_text, bbox))
                text += ch_text
        if lang == "chi_sim":
            return ""
        text = text.strip()
        if text == "":
            return ""

        good = [b for b in bboxes if b]
        wbox = BBox(
            float(min(b[0] for b in good)), float(min(b[1] for b in good)),
            float(max(b[2] for b in good)), float(max(b[3] for b in good)))
        word = Word(line, wid, text, wbox)
        word.lang = lang
        word.chars = chars
        # word.debug.raw carries the matched span markup for char-level
        # words (convertPageHocr.js:250-252, debugMode hardcoded true).
        word.raw_src = match
        if italic:
            word.style.italic = True
        if font:
            word.style.font = font
        word.conf = conf
        line.words.append(word)
        return ""

    def convert_line(m):
        match = m.group(0)
        title_m = _TITLE_RE.search(match)
        if not title_m:
            return ""
        title = title_m.group(1)
        bb = _parse_bbox4(title)
        if not bb:
            return ""
        bbox = BBox(*[float(v) for v in bb])

        blm = _BASELINE_RE.search(title)
        if not blm:
            return ""
        baseline = [float(blm.group(1)), float(blm.group(2))]

        asc_h = x_h = None
        if scribe_mode:
            am = _SCRIBE_ASC_RE.search(title)
            xm = _SCRIBE_X_RE.search(title)
            if am:
                asc_h = float(am.group(1))
            if xm:
                x_h = float(xm.group(1))
        if not asc_h and not x_h:
            sm_ = _XSIZE_RE.search(title)
            all_h = float(sm_.group(1)) if sm_ else 15.0
            am = _XASC_RE.search(title)
            asc_t = float(am.group(1)) if am else 0.0
            dm = _XDESC_RE.search(title)
            desc_t = float(dm.group(1)) if dm else 0.0
            asc_h = all_h - desc_t
            if asc_t > 0:
                x_h = all_h - desc_t - asc_t

        line = Line(page, bbox, baseline, asc_h, x_h)
        if char_mode:
            _WORD_RE_CHAR.sub(lambda wm: convert_word_char_level(wm, line), match)
        else:
            _WORD_RE.sub(lambda wm: convert_word(wm, line), match)
        page.lines.append(line)
        return ""

    def convert_par(m):
        nonlocal current_lang
        match = m.group(0)
        pl = _PAR_LANG_RE.match(match)
        if pl:
            current_lang = pl.group(1)
        line_re.sub(convert_line, match)
        return ""

    ocr_str = _PAR_RE.sub(convert_par, ocr_str)
    line_re.sub(convert_line, ocr_str)

    pass2(page, 0)
    lang_set = pass3(page)
    return page, lang_set


def parse_hocr_layout_meta(hocr_str: str):
    """Legacy-reimport header meta (importOCR.js:186-223 getMeta):
    returns ``{"layout": [...]|None, "tables": [...]|None}`` when the
    hOCR header carries ``ocr-system scribeocr`` (the reimport marker,
    importOCR.js:196), else None.  ``tables`` is the serialized
    LayoutDataTablePage list (scribeDoc.js:956-968); ``layout`` the
    LayoutPage region list."""
    import json

    head = hocr_str.split("<body>", 1)[0]

    def get_meta(name):
        m = re.search(rf"<meta name=[\"']{name}[\"'][^<]+", head, re.I)
        if not m:
            return None
        c = re.search(r"content=[\"']([\s\S]+?)(?=[\"']\s{0,5}/?>)",
                      m.group(0), re.I)
        if not c:
            return None
        return c.group(1).replace("&quot;", '"')

    if get_meta("ocr-system") != "scribeocr":
        return None
    out = {"layout": None, "tables": None}
    for key, name in (("layout", "layout"),
                      ("tables", "layout-data-table")):
        raw = get_meta(name)
        if raw:
            try:
                parsed = json.loads(raw)
            except ValueError:
                continue
            if isinstance(parsed, list):
                out[key] = parsed
    return out


def apply_hocr_layout_meta(pages, meta) -> None:
    """Stamp restored layout data tables onto parsed pages: column
    boxes → ``page.table_boxes`` (+``col_separators`` from interior
    column edges), restored regions → ``page.layout_regions`` (applied
    by the opt-in reorder stage, like the reference's enableLayout
    default-off) — import.js:407-418."""
    if not meta:
        return
    by_n_tables = {p.get("n"): p.get("tables") or []
                   for p in (meta.get("tables") or [])
                   if isinstance(p, dict)}
    by_n_regions = {p.get("n"): p.get("boxes") or {}
                    for p in (meta.get("layout") or [])
                    if isinstance(p, dict)}
    raw_tables = {p.get("n"): p for p in (meta.get("tables") or [])
                  if isinstance(p, dict)}
    raw_layout = {p.get("n"): p for p in (meta.get("layout") or [])
                  if isinstance(p, dict)}
    for i, page in enumerate(pages):
        # Keep the raw page dicts so the hOCR re-export serializes the
        # RESTORED objects verbatim (ids, default flags) — the
        # reference re-serializes the same deserialized objects.
        if i in raw_tables or i in raw_layout:
            page.layout_meta = {"layout": raw_layout.get(i),
                                "tables": raw_tables.get(i)}
        for t in by_n_tables.get(i) or []:
            boxes = [b for b in (t.get("boxes") or [])
                     if isinstance(b, dict) and isinstance(
                         b.get("coords"), dict)]
            if not boxes:
                continue
            coords = [b["coords"] for b in boxes]
            try:
                tb = {
                    "left": min(float(c["left"]) for c in coords),
                    "top": min(float(c["top"]) for c in coords),
                    "right": max(float(c["right"]) for c in coords),
                    "bottom": max(float(c["bottom"]) for c in coords),
                }
                seps = sorted(float(c["left"]) for c in coords)[1:]
            except (KeyError, TypeError, ValueError):
                continue
            if seps:
                tb["col_separators"] = seps
            page.table_boxes.append(tb)
        regions = by_n_regions.get(i)
        if regions:
            page.layout_regions = regions
