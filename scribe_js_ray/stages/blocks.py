"""Tesseract block-JSON → Page parser (convertPageBlocks.js:24-200).

The tesseract.js recognizer emits ``data.blocks``: blocks → paragraphs →
lines → words → symbols, each with pixel-space ``bbox {x0,y0,x1,y1}``,
per-line ``baseline`` endpoints and ``rowAttributes`` metrics, per-word
``confidence``/``language``/``choices``/``font_name``.  A corpus payload
is the JSON of one recognized page: either the raw block array or a
``{"blocks": [...], "width": W, "height": H, ...}`` wrapper.

Decision surface mirrored from the reference:

* baseline slope/point from the baseline segment relative to the line
  box (x − left, y − bottom); non-finite → [0, 0] (vertical text
  unsupported there too, convertPageBlocks.js:68-72).
* ascHeight = rowHeight − descenders; xHeight = rowHeight − descenders
  − ascenders (convertPageBlocks.js:74-75).
* blank words skipped; Chinese-language words exploded one symbol per
  word after the han/latin sanity check (getTextScript gate,
  convertPageBlocks.js:95-126).
* alternative ``choices`` sorted by confidence; a higher-confidence
  alternative than the primary text is kept as ``text_alt``
  (convertPageBlocks.js:133-139: ad-hoc dictionary penalties can demote
  the true best choice).
* italic inferred from ``font_name`` (the ``is_italic`` flag is always
  false upstream, convertPageBlocks.js:141-145) — only when
  ``keep_italic`` (Tesseract Legacy) is set; font name kept either way.
* space symbols from the LSTM model dropped from char boxes
  (convertPageBlocks.js:152-154).
* single-word Legacy lines re-derive the baseline point from the
  mean50 of baseline-character bottoms when those chars form a majority
  (convertPageBlocks.js:171-180: Tesseract fits baselines early and
  misses on single-word lines).
* then the shared pass2/pass3 normalizers, same as every import path.
"""

from __future__ import annotations

import json
import math

from ..functions.stats import mean50
from ..functions.textnorm import ASC_CHARS, X_CHARS, get_text_script
from ..model import BBox, Char, Line, Page, Par, Word
from .shared import pass2, pass3

_CHINESE = ("chi_sim", "chi_tra")
_BASELINE_CHARS = frozenset(X_CHARS) | frozenset(ASC_CHARS)


def _bbox(d: dict) -> BBox:
    return BBox(d.get("x0", 0), d.get("y0", 0),
                d.get("x1", 0), d.get("y1", 0))


def parse_blocks_page(payload_str: str, n: int = 0, page_dims=None,
                      keep_italic: bool = False,
                      rotate_angle: float = 0.0) -> Page:
    data = json.loads(payload_str)
    if isinstance(data, dict):
        blocks = data.get("blocks")
        if blocks is None:
            raise ValueError("Invalid blocks JSON: expected a 'blocks' "
                             "array or a bare block list.")
        if page_dims is None and data.get("width") and data.get("height"):
            page_dims = (data["width"], data["height"])
    elif isinstance(data, list):
        blocks = data
    else:
        raise ValueError("Invalid blocks JSON: expected object or array.")

    if page_dims is None:
        # No declared dims: extent of the block boxes (payloads written
        # from data.blocks alone carry no page record).
        right = max((b.get("bbox", {}).get("x1", 0) for b in blocks),
                    default=612)
        bottom = max((b.get("bbox", {}).get("y1", 0) for b in blocks),
                     default=792)
        page_dims = (right, bottom)

    page = Page(n, page_dims[0], page_dims[1])
    page.text_source = "blocks"
    current_lang = "eng"
    word_count = 0

    for block in blocks:
        for paragraph in block.get("paragraphs") or []:
            par = Par(page, _bbox(paragraph.get("bbox") or {}))
            for line in paragraph.get("lines") or []:
                lbox = _bbox(line.get("bbox") or {})
                bl = line.get("baseline") or {}
                x0 = bl.get("x0", 0) - lbox.left
                x1 = bl.get("x1", 0) - lbox.left
                y0 = bl.get("y0", 0) - lbox.bottom
                y1 = bl.get("y1", 0) - lbox.bottom
                try:
                    slope = (y1 - y0) / (x1 - x0)
                    point = y0 - slope * x0
                except ZeroDivisionError:
                    slope = point = math.inf
                if not (math.isfinite(slope) and math.isfinite(point)):
                    slope = point = 0.0
                row = line.get("rowAttributes") or {}
                row_h = row.get("rowHeight", 0)
                desc = row.get("descenders", 0)
                asc = row.get("ascenders", 0)
                line_obj = Line(page, lbox, [slope, point],
                                asc_height=row_h - desc,
                                x_height=row_h - desc - asc)
                line_obj.par = par

                for word in line.get("words") or []:
                    wbox = _bbox(word.get("bbox") or {})
                    wid = f"word_{n + 1}_{word_count}"
                    word_count += 1
                    wtext = word.get("text") or ""
                    if wtext.strip() == "":
                        continue

                    wlang = word.get("language") or current_lang
                    if wlang in _CHINESE:
                        script = get_text_script(wtext)
                        if script["han"] == 0:
                            if current_lang not in _CHINESE:
                                wlang = current_lang
                            elif script["latin"] > 0:
                                wlang = "eng"

                    symbols = word.get("symbols") or []
                    if wlang in _CHINESE:
                        # one word per character (convertPageBlocks.js:110)
                        for m, sym in enumerate(symbols):
                            w = Word(line_obj, f"{wid}_{m}",
                                     sym.get("text") or "",
                                     _bbox(sym.get("bbox") or {}))
                            w.conf = sym.get("confidence") or 0
                            w.lang = wlang
                            line_obj.words.append(w)
                        continue

                    w = Word(line_obj, wid, wtext.strip(), wbox)
                    w.lang = word.get("language") or "eng"
                    w.conf = word.get("confidence") or 0
                    choices = sorted(word.get("choices") or [],
                                     key=lambda c: -(c.get("confidence")
                                                     or 0))
                    if choices and choices[0].get("text") != wtext:
                        w.text_alt = choices[0].get("text")
                    font_name = word.get("font_name") or ""
                    if keep_italic and "italic" in font_name.lower():
                        w.style.italic = True
                    w.style.font = font_name or None
                    w.chars = []
                    for sym in symbols:
                        stext = sym.get("text") or ""
                        if not stext.strip():
                            continue  # LSTM space symbols
                        w.chars.append(Char(stext,
                                            _bbox(sym.get("bbox") or {})))
                    line_obj.words.append(w)

                if line_obj.words:
                    if len(line_obj.words) == 1 and keep_italic \
                            and line_obj.words[0].chars:
                        chars = line_obj.words[0].chars
                        bottoms = [c.bbox.bottom for c in chars
                                   if c.text in _BASELINE_CHARS]
                        if len(bottoms) * 2 > len(chars):
                            line_obj.baseline[1] = \
                                mean50(bottoms) - line_obj.bbox.bottom
                    page.lines.append(line_obj)
                    par.lines.append(line_obj)
            if par.lines:  # declared par bbox kept as-is (:186)
                page.pars.append(par)

    page.angle = rotate_angle
    pass2(page, rotate_angle)
    pass3(page)
    return page
