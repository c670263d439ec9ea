"""Text-edit operations over the parsed page model (textEdits.js).

The reference's editor deletes or retypes words of a document's native
text layer, recording per-page suppression rects that the PDF export
replays so the file and the model cannot diverge.  The portable
decision surface:

* per-word delete band (textEdits.js:38-54 wordBandRect): the vertical
  middle band of the word box (±15% of height around the center),
  inset horizontally by min(25% height, 25% width), widened to the
  first/last char midpoints when char boxes are known — a full-box
  rect would also match glyphs of neighboring lines and abutting
  words (the hit test is shared with redaction and inflates glyphs
  toward over-matching).
* superimposed-duplicate sweep (textEdits.js:66-83
  findSuperimposedWords): some producers draw a row twice (a visible
  layer plus an alpha-0 duplicate); deleting only the visible words
  keeps the duplicate findable, so words of OTHER lines whose band
  overlaps a delete rect vertically and ≥60% horizontally are deleted
  too.
* markup sweep (textEdits.js:93-117 removeMarkupOnBoxes):
  highlight/underline/strikeout marks ≥60%-covered by the deleted
  word boxes are removed with the words they sat on.
* deleteTextLines (textEdits.js:151-233): per line, band rects +
  twin sweep + markup sweep + one ``deleteText`` record carrying the
  rects.
* replaceTextLine (textEdits.js:243-560): common-prefix/-suffix diff
  of the whitespace-split replacement against the old words (a style
  toggle counts as a change only when it can alter the drawn state),
  reused old-word identity for same-index middle words, original
  inter-word gaps preserved for words adjacent in the old line,
  suffix realignment skipped when the redraw lands within 0.5 px
  (the unchanged suffix glyphs stay), pure appends anchored by
  redrawing the last original word.

Out of scope with the render path: the glyph-run resolution
(glyphResolve.js — embedded-font programs, tofu fallbacks, ligature
re-use); replacement words here are measured with the same base-14
AFM advances as the text/DOCX import (``stages/pdf/widths.py``), and
the undo history (snapshot/splice) is an interactive concern.
"""

from __future__ import annotations

from ..model import BBox, Line, Page, Word, update_line_bbox
from .pdf.widths import base14_widths, char_width

# textEdits.js:154-155 — faux-bold stroke / faux-oblique skew constants
# kept for API parity with style toggles.
FAUX_BOLD_STROKE_EM = 0.025
FAUX_OBLIQUE_SKEW = 0.25

_ASCENDER = 0.683  # Times AFM, same values as stages/textlayout.py
_DESCENDER = -0.217


def bbox_to_page_space(b: BBox, orientation: int, dims: dict) -> BBox:
    """Rotate a line-local bbox into page space (addHighlights.js:16-37)."""
    w, h = dims["width"], dims["height"]
    if orientation == 1:
        return BBox(w - b.bottom, b.left, w - b.top, b.right)
    if orientation == 2:
        return BBox(w - b.right, h - b.bottom, w - b.left, h - b.top)
    if orientation == 3:
        return BBox(b.top, h - b.right, b.bottom, h - b.left)
    return BBox(b.left, b.top, b.right, b.bottom)


def word_band_rect(b: BBox, chars, orientation: int, dims: dict) -> BBox:
    """The per-word delete rect (textEdits.js:38-54)."""
    cy = (b.top + b.bottom) / 2
    q = abs(b.bottom - b.top) * 0.15
    ix = min(abs(b.bottom - b.top) * 0.25, abs(b.right - b.left) * 0.25)
    left = b.left + ix
    right = b.right - ix
    if chars:
        fc = chars[0].bbox
        lc = chars[-1].bbox
        left = min(left, (fc.left + fc.right) / 2)
        right = max(right, (lc.left + lc.right) / 2)
    return bbox_to_page_space(BBox(left, cy - q, right, cy + q),
                              orientation, dims)


def find_superimposed_words(page: Page, exclude_lines: set,
                            rects: list[BBox]):
    """Words on other lines whose middle band sits on any delete rect
    (textEdits.js:66-83): vertical overlap plus ≥60% of the band's own
    width horizontally."""
    hits = []
    for other in page.lines:
        if other in exclude_lines:
            continue
        entry = None
        for w in other.words:
            band = word_band_rect(w.bbox, w.chars, other.orientation,
                                  page.dims)
            bw = band.right - band.left
            hit = any(min(band.bottom, r.bottom) > max(band.top, r.top)
                      and (min(band.right, r.right)
                           - max(band.left, r.left)) >= 0.6 * bw
                      for r in rects)
            if hit:
                if entry is None:
                    entry = {"line": other, "ids": [], "boxes": []}
                entry["ids"].append(w.id)
                entry["boxes"].append(bbox_to_page_space(
                    w.bbox, other.orientation, page.dims))
        if entry:
            hits.append(entry)
    return hits


def remove_markup_on_boxes(page: Page, word_boxes: list[BBox]) -> list:
    """Strip highlight/underline/strikeout marks ≥60%-covered by the
    deleted word boxes (textEdits.js:93-117); returns removed marks."""
    removed = []
    kept = []
    for mark in page.marks:
        mtype = mark.get("type") if isinstance(mark, dict) else None
        if mtype not in ("highlight", "underline", "strikeout"):
            kept.append(mark)
            continue
        ab = mark["bbox"]
        area = max(0, ab.right - ab.left) * max(0, ab.bottom - ab.top)
        if not area > 0:
            kept.append(mark)
            continue
        overlap = 0.0
        for wb in word_boxes:
            ow = min(ab.right, wb.right) - max(ab.left, wb.left)
            oh = min(ab.bottom, wb.bottom) - max(ab.top, wb.top)
            if ow > 0 and oh > 0:
                overlap += ow * oh
            if overlap >= 0.6 * area:
                break
        (removed if overlap >= 0.6 * area else kept).append(mark)
    if removed:
        page.marks = kept
    return removed


def delete_page_words(page: Page, ids: list[str]) -> int:
    """Remove words by id; lines left empty are dropped, shortened lines
    get their bbox recomputed (ocrObjects.js:342-366 deletePageWords)."""
    pending = set(ids)
    deleted = 0
    kept_lines = []
    for line in page.lines:
        before = len(line.words)
        line.words = [w for w in line.words if w.id not in pending]
        removed = before - len(line.words)
        if removed:
            deleted += removed
            if not line.words:
                continue
            update_line_bbox(line)
        kept_lines.append(line)
    if deleted:
        page.lines = kept_lines
        for par in page.pars:
            par.lines = [ln for ln in par.lines if ln.words]
        page.pars = [p for p in page.pars if p.lines]
    return deleted


def delete_text_lines(page: Page, lines: list[Line]) -> dict | None:
    """Delete whole lines plus their superimposed duplicates; returns the
    ``deleteText`` record with the suppression rects the export replays
    (textEdits.js:151-233, minus history/nativeText bookkeeping)."""
    live = [ln for ln in lines if ln is not None and ln.words]
    if not live:
        return None
    rects: list[BBox] = []
    word_ids: list[str] = []
    deleted_boxes: list[BBox] = []
    for line in live:
        for w in line.words:
            rects.append(word_band_rect(w.bbox, w.chars,
                                        line.orientation, page.dims))
            word_ids.append(w.id)
            deleted_boxes.append(bbox_to_page_space(
                w.bbox, line.orientation, page.dims))
    for twin in find_superimposed_words(page, set(live), rects):
        word_ids.extend(twin["ids"])
        deleted_boxes.extend(twin["boxes"])
    remove_markup_on_boxes(page, deleted_boxes)
    delete_page_words(page, word_ids)
    return {"type": "deleteText", "rects": rects}


def _font_key(style) -> str:
    name = (style.font or "").lower()
    if "courier" in name or "mono" in name:
        fam = "Courier"
    elif "arial" in name or "helvetica" in name or "sans" in name:
        fam = "Helvetica"
    else:
        fam = "Times"
    bold, italic = style.bold, style.italic
    if fam == "Times":
        if bold and italic:
            return "Times-BoldItalic"
        if bold:
            return "Times-Bold"
        if italic:
            return "Times-Italic"
        return "Times-Roman"
    suffix = ""
    if bold:
        suffix += "Bold"
    if italic:
        suffix += "Oblique"
    return f"{fam}-{suffix}" if suffix else fam


def _advance(text: str, style, size: float) -> float:
    widths = base14_widths(_font_key(style))
    return sum(char_width(widths, c) for c in text) / 1000.0 * size


def replace_text_line(page: Page, line: Line, new_text: str,
                      word_styles: list | None = None) -> dict | None:
    """Retype a line (textEdits.js:243-560 replaceTextLine, AFM-metric
    layout in place of the glyph-run resolution).  Empty replacement
    deletes the line.  Returns the ``replaceText`` record ({rects,
    word_ids}) or None when nothing changes."""
    if line is None or not line.words:
        raise ValueError("replace_text_line: not a live line.")
    new_texts = [t for t in str(new_text).strip().split() if t]
    if not new_texts:
        return delete_text_lines(page, [line])

    old_words = list(line.words)
    old_texts = [w.text for w in old_words]
    old_boxes = [w.bbox.copy() for w in old_words]
    olen, nlen = len(old_words), len(new_texts)

    def style_change_at(w: Word, ov) -> bool:
        # A toggle counts only when it can alter the drawn state
        # (textEdits.js:259-270; the stream strokeWidth/skew states of
        # the native-text entries collapse to the style flags here).
        if not ov:
            return False
        if ov.get("bold") is True and not w.style.bold:
            return True
        if ov.get("bold") is False and w.style.bold:
            return True
        if ov.get("italic") is True and not w.style.italic:
            return True
        if ov.get("italic") is False and w.style.italic:
            return True
        return False

    def style_at(m: int):
        # tolerate short arrays like the reference's wordStylesIn?.[m]
        return word_styles[m] if word_styles and m < len(word_styles) \
            else None

    i0 = 0
    while i0 < olen and i0 < nlen and old_texts[i0] == new_texts[i0] \
            and not style_change_at(old_words[i0], style_at(i0)):
        i0 += 1
    if i0 == olen and i0 == nlen:
        return None
    k = 0
    while k < olen - i0 and k < nlen - i0 \
            and old_texts[olen - 1 - k] == new_texts[nlen - 1 - k] \
            and not style_change_at(old_words[olen - 1 - k],
                                    style_at(nlen - 1 - k)):
        k += 1

    rs = i0
    if rs == olen:  # pure append anchors on the last original word
        rs = olen - 1
    realign_start_old = olen - k

    baseline_y = line.bbox.bottom + (line.baseline[1] if line.baseline
                                     else 0)
    style_from = old_words[min(i0, olen - 1)]

    def old_index_for(m: int):
        if m < i0:
            return m
        if m >= nlen - k:
            return m - (nlen - olen)
        return m if m < olen - k else None

    def pen_left(idx: int) -> float:
        return old_boxes[idx].left

    new_words: list[Word] = []
    redraw_rects: list[BBox] = []
    redrawn_old: set[int] = set()
    new_redraw_end = nlen
    realigned = False
    in_suffix = False
    suffix_delta = 0.0
    pen = pen_left(rs)
    prev_old_idx = rs - 1 if rs > 0 else None
    prev_space_adv = 0.0

    # Unchanged prefix words keep their objects untouched.
    new_words.extend(old_words[:rs])

    m = rs
    while m < new_redraw_end:
        cur_old = old_index_for(m)
        if m == rs:
            flow_x = pen
        elif prev_old_idx is not None and cur_old is not None \
                and cur_old == prev_old_idx + 1:
            # words adjacent in the original line keep their gap
            flow_x = pen + (pen_left(cur_old)
                            - old_boxes[prev_old_idx].right)
        else:
            flow_x = pen + prev_space_adv

        if not realigned and realign_start_old < olen \
                and m == nlen - (olen - realign_start_old):
            delta = suffix_delta if in_suffix \
                else flow_x - pen_left(realign_start_old)
            if abs(delta) < 0.5:
                realigned = True
                new_redraw_end = m
                break
            in_suffix = True
            suffix_delta = delta

        src = old_words[cur_old] if cur_old is not None else None
        style_src = src if src is not None else style_from
        pre_box = old_boxes[cur_old] if cur_old is not None \
            else old_boxes[min(i0, olen - 1)]
        size = style_src.style.size or \
            abs(pre_box.bottom - pre_box.top) / 0.75

        if src is not None and m < i0:
            x = pen_left(cur_old)
        elif src is not None and m >= nlen - k:
            if not in_suffix:
                in_suffix = True
                suffix_delta = flow_x - pen_left(cur_old)
            x = pen_left(cur_old) + suffix_delta
        else:
            x = flow_x

        ov = word_styles[m] if word_styles and m < len(word_styles) \
            else None
        width = _advance(new_texts[m], style_src.style, size)
        box = BBox(x, baseline_y - _ASCENDER * size, x + width,
                   baseline_y - _DESCENDER * size)
        if src is not None:
            # a retyped word keeps its identity and style (:321)
            w = src
            w.text = new_texts[m]
            w.bbox = box
            w.chars = None
            redrawn_old.add(cur_old)
        else:
            w = Word(line, f"{line.words[0].id}_e{m}", new_texts[m], box)
            s = style_from.style
            for attr in s.__slots__:
                setattr(w.style, attr, getattr(s, attr))
            w.lang = style_from.lang
            w.conf = 100
        if ov:
            if ov.get("bold") is not None:
                w.style.bold = bool(ov["bold"])
            if ov.get("italic") is not None:
                w.style.italic = bool(ov["italic"])
        new_words.append(w)
        pen = box.right
        prev_space_adv = _advance(" ", style_src.style, size)
        prev_old_idx = cur_old
        m += 1

    if new_redraw_end < nlen:
        # kept suffix: original objects, untouched
        new_words.extend(old_words[olen - (nlen - new_redraw_end):])
    elif in_suffix and suffix_delta:
        pass  # suffix words were redrawn (shifted) in the loop

    # Erase rects: every old word whose glyphs the redraw replaces.
    for idx in range(rs, olen):
        if idx >= realign_start_old and new_redraw_end < nlen:
            break  # suffix kept in place
        redraw_rects.append(word_band_rect(
            old_boxes[idx], None, line.orientation, page.dims))

    line.words = new_words
    update_line_bbox(line)

    # Same duplicate/markup sweeps as deletion, over the erased boxes —
    # a shifted (not early-realigned) suffix was redrawn too, so its
    # old boxes count as erased (textEdits.js:598-601).
    erased_end = min(realign_start_old, olen) if new_redraw_end < nlen \
        else olen
    erased_boxes = [bbox_to_page_space(old_boxes[i], line.orientation,
                                       page.dims)
                    for i in range(rs, erased_end)]
    twins = find_superimposed_words(page, {line}, redraw_rects)
    twin_ids = [i for t in twins for i in t["ids"]]
    if twin_ids:
        erased_boxes.extend(b for t in twins for b in t["boxes"])
        delete_page_words(page, twin_ids)
    remove_markup_on_boxes(page, erased_boxes)

    redrawn_words = new_words[rs:new_redraw_end]
    if not redrawn_words:
        # Pure tail deletion: zero redraw runs make this a delete record
        # (textEdits.js:626-633).
        return {"type": "deleteText", "rects": redraw_rects}
    return {"type": "replaceText", "rects": redraw_rects,
            "word_ids": [w.id for w in redrawn_words]}
