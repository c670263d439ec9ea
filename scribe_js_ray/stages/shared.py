"""Shared per-page normalization passes.

Behavioral ports from /root/reference/js/import/convertPageShared.js:
- split_unicode_superscripts (:19-138)
- pass2  (:146-333) — Tesseract-data corrections (line bboxes, small caps
  inference from char heights, trailing-superscript split)
- pass3  (:342-517) — universal normalizer: page angle from baselines,
  smart quotes, apostrophes, asc/x-height stats, dash-width normalization,
  ligature expansion.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, mean50, quantile
from ..functions.textnorm import (
    ASC_CHARS, SUPERSCRIPT_CHARS, X_CHARS, remove_superscript,
    replace_ligatures,
)
from ..model import BBox, Line, Page, Word, bbox_union, calc_word_bbox, update_line_bbox

_SUP_SEG_RE = re.compile("[" + SUPERSCRIPT_CHARS + "]+")
_TRAILING_NUM_RE = re.compile(r"\d+$")
_LETTER_RE = re.compile(r"[a-z]", re.I)
_LOWER_RE = re.compile(r"[a-z]")
_MULTI_CAP_RE = re.compile(r"[A-Z].?[A-Z]")
_ALNUM_RE = re.compile(r"[a-z\d]", re.I)
_CLOSE_QUOTE_RE = re.compile(r"[a-z\d][.,!?;]?['\"]$", re.I)
_ASC_LETTER_RE = re.compile(r"[a-pr-z]", re.I)


def split_unicode_superscripts(line: Line, word_polys: dict | None = None
                               ) -> None:
    """convertPageShared.js:19-138 — split words on unicode superscripts.

    ``word_polys`` (quadrilateral word bounds keyed by word id, Textract
    path) is edited in place: each split segment gets a proportional
    polygon slice (convertPageShared.js:92-122)."""
    new_words = []
    for word in line.words:
        text = word.text
        if not _SUP_SEG_RE.search(text):
            new_words.append(word)
            continue

        segments = []
        last = 0
        for m in _SUP_SEG_RE.finditer(text):
            if m.start() > last:
                segments.append((text[last:m.start()], False))
            segments.append((m.group(0), True))
            last = m.end()
        if last < len(text):
            segments.append((text[last:], False))

        if len(segments) == 1:
            word.text = remove_superscript(word.text)
            word.style.sup = segments[0][1]
            new_words.append(word)
            continue

        width = word.bbox.right - word.bbox.left
        total = len(text)
        offset = 0
        word_poly = word_polys.get(word.id) if word_polys else None
        for j, (seg_text, is_sup) in enumerate(segments):
            start_ratio = offset / total
            end_ratio = (offset + len(seg_text)) / total
            h = word.bbox.bottom - word.bbox.top
            sup_height_ratio = 0.58
            sup_bottom_offset = h * 0.42
            bbox = BBox(
                js_round(word.bbox.left + width * start_ratio),
                word.bbox.top,
                js_round(word.bbox.left + width * end_ratio),
                js_round(word.bbox.top + sup_bottom_offset) if is_sup
                else word.bbox.bottom,
            )
            seg_id = word.id if j == 0 else f"{word.id}_{j}"
            if word_poly is not None:
                # Proportional polygon slice; the first segment overwrites
                # the original word's entry (same id).
                tl, tr, bl, br = (word_poly["tl"], word_poly["tr"],
                                  word_poly["bl"], word_poly["br"])
                poly_width = tr[0] - tl[0]
                poly_bottom_width = br[0] - bl[0]
                poly_height = ((bl[1] - tl[1]) + (br[1] - tr[1])) / 2
                bl_y = (tl[1] + poly_height * sup_height_ratio
                        if is_sup else bl[1])
                br_y = (tr[1] + poly_height * sup_height_ratio
                        if is_sup else br[1])
                word_polys[seg_id] = {
                    "tl": (tl[0] + poly_width * start_ratio, tl[1]),
                    "tr": (tl[0] + poly_width * end_ratio, tr[1]),
                    "bl": (bl[0] + poly_bottom_width * start_ratio, bl_y),
                    "br": (bl[0] + poly_bottom_width * end_ratio, br_y),
                }
            seg_word = Word(line, seg_id,
                            remove_superscript(seg_text) if is_sup else seg_text,
                            bbox)
            seg_word.conf = word.conf
            seg_word.lang = word.lang
            if is_sup:
                seg_word.style.sup = True
            new_words.append(seg_word)
            offset += len(seg_text)
    line.words = new_words


def pass2(page: Page, rotate_angle: float) -> None:
    """convertPageShared.js:146-333 (rotation arm omitted: inputs arrive
    unrotated in this engine; the angle is carried on the page instead)."""
    for line in page.lines:
        update_line_bbox(line)

    # Small-caps inference from char heights.
    for line in page.lines:
        first_word = False
        small_caps_words = []
        title_case = []
        for j, word in enumerate(line.words):
            if word.style.small_caps:
                small_caps_words.append(word)
                first_word = True
                continue
            if (not _LOWER_RE.search(word.text)
                    and _MULTI_CAP_RE.search(word.text) and word.chars):
                letter_chars = [c for c in word.chars if _LETTER_RE.search(c.text)]
                if not letter_chars:
                    continue
                first_h = letter_chars[0].bbox.bottom - letter_chars[0].bbox.top
                others = [c for c in letter_chars[1:] if not re.search(r"[q]", c.text, re.I)]
                if not others:
                    continue
                heights = [c.bbox.bottom - c.bbox.top for c in others]
                h_max, h_min = max(heights), min(heights)
                thresh = 1.3 if letter_chars[0].text in ("q", "Q") else 1.1
                if first_h > h_max * thresh:
                    if h_min > 0 and (h_max / h_min) < 1.15:
                        small_caps_words.append(word)
                        if j == 0:
                            first_word = True
                        title_case.append(True)
                else:
                    asc_chars = [c for c in word.chars if _ASC_LETTER_RE.search(c.text)]
                    if len(asc_chars) < 2:
                        continue
                    all_h = [c.bbox.bottom - c.bbox.top for c in asc_chars]
                    if min(all_h) > 0 and (max(all_h) / min(all_h)) < 1.15:
                        small_caps_words.append(word)
                        if j == 0:
                            first_word = True
                        title_case.append(False)

        if first_word or len(small_caps_words) >= 2:
            title_case_total = sum(1 for t in title_case if t)
            for k, word in enumerate(small_caps_words):
                word.style.small_caps = True
                if not word.chars or not title_case_total:
                    continue
                if k < len(title_case) and title_case[k]:
                    for c in word.chars[1:]:
                        c.text = c.text.lower()
                else:
                    for c in word.chars:
                        c.text = c.text.lower()
                word.text = "".join(c.text for c in word.chars)

    # Trailing-superscript split (footnote references fused into words).
    for line in page.lines:
        i = 0
        while i < len(line.words):
            word = line.words[i]
            if word.lang in ("chi_sim", "chi_tra") or not word.chars:
                i += 1
                continue
            m = _TRAILING_NUM_RE.search(word.text)
            if not m:
                i += 1
                continue
            trailing = m.group(0)

            linebox = word.line.bbox.copy()
            slope, off = line.baseline[0], line.baseline[1]
            if slope < 0:
                linebox.top -= (linebox.right - linebox.left) * slope
                baseline_point = off
            else:
                linebox.bottom -= (linebox.right - linebox.left) * slope
                baseline_point = off + (line.bbox.bottom - linebox.bottom)

            expected_baseline = ((word.bbox.left
                                  + (word.bbox.right - word.bbox.left) / 2
                                  - linebox.left) * slope
                                 + baseline_point + linebox.bottom)
            line_asc_height = expected_baseline - linebox.top

            base_n = 0
            for c in reversed(word.chars):
                if c.bbox.bottom < expected_baseline - line_asc_height / 4:
                    base_n += 1
                else:
                    break
            super_n = min(len(trailing), base_n)
            if super_n == 0:
                i += 1
                continue
            if super_n == len(word.text):
                word.style.sup = True
                word.style.bold = False
                word.style.italic = False
                word.style.underline = False
                i += 1
                continue

            core_chars = word.chars[: len(word.chars) - super_n]
            sup_chars = [Char_copy(c) for c in word.chars[len(word.chars) - super_n:]]
            sup_word = Word(line, f"{word.id}a",
                            "".join(c.text for c in sup_chars), word.bbox.copy())
            sup_word.conf = word.conf
            sup_word.lang = word.lang
            sup_word.chars = sup_chars
            sup_word.style.sup = True
            # cloneWord carries visualCoords (ocrObjects.js:807).
            sup_word.visual_coords = word.visual_coords
            calc_word_bbox(sup_word)

            word.text = "".join(c.text for c in core_chars)
            word.chars = core_chars
            calc_word_bbox(word)

            line.words.insert(i + 1, sup_word)
            i += 2


def Char_copy(c):
    from ..model import Char
    return Char(c.text, c.bbox.copy())


def pass3(page: Page):
    """convertPageShared.js:342-517.  Returns the set of detected langs."""
    lang_set = set()

    if not page.angle:
        rises = [ln.baseline[0] for ln in page.lines
                 if (ln.bbox.right - ln.bbox.left) >= 200]
        rise_median = mean50(rises) or 0
        page.angle = math.asin(rise_median) * (180 / math.pi)

    for line in page.lines:
        line_asc_heights = []
        line_x_heights = []
        line_all_heights = []

        for word in line.words:
            letters = list(word.text)
            chars = word.chars
            lang_set.add(word.lang)

            if word.chars is not None and len(word.chars) != len(word.text):
                continue

            # Opening quotes.
            if letters and letters[0] in ('"', "'") and len(letters) > 1 \
                    and _ALNUM_RE.match(letters[1]):
                if letters[0] == '"':
                    letters[0] = "“"
                else:
                    letters[0] = "‘"
                if chars:
                    chars[0].text = letters[0]

            # Closing quotes.
            if letters and letters[-1] in ('"', "'") \
                    and _CLOSE_QUOTE_RE.search(word.text):
                if letters[-1] == '"':
                    letters[-1] = "”"
                else:
                    letters[-1] = "’"
                if chars:
                    chars[len(letters) - 1].text = letters[-1]

            # Apostrophes between two alphanumerics.
            for k in range(len(letters)):
                if letters[k] == "'" and 0 < k < len(letters) - 1 \
                        and _ALNUM_RE.match(letters[k + 1]) \
                        and _ALNUM_RE.match(letters[k - 1]):
                    letters[k] = "’"
                    if chars:
                        chars[k].text = "’"

            if word.chars:
                for k in range(len(letters)):
                    if word.style.sup or word.style.dropcap:
                        continue
                    c = word.chars[k]
                    ch_height = c.bbox.bottom - c.bbox.top
                    letter = letters[k]
                    asc = (word.style.small_caps and re.match(r"[A-Z0-9]", letter)) or \
                        (not word.style.small_caps and letter in ASC_CHARS)
                    xch = (word.style.small_caps and re.match(r"[a-z]", letter)) or \
                        (not word.style.small_caps and letter in X_CHARS)
                    line_all_heights.append(ch_height)
                    if asc:
                        line_asc_heights.append(ch_height)
                    elif xch:
                        line_x_heights.append(ch_height)

            word.text = "".join(letters)

        line_all_height = max(line_all_heights) if line_all_heights else None
        line_asc_height = quantile(line_asc_heights, 0.5)
        line_x_height = quantile(line_x_heights, 0.5)

        if line_asc_height:
            line.asc_height = line_asc_height
        if line_x_height:
            line.x_height = line_x_height

        if line.asc_height and line.x_height \
                and line.x_height >= line.asc_height * 0.9:
            if len(line_asc_heights) > len(line_x_heights):
                line.x_height = None
            else:
                line.asc_height = None

        if not line_asc_height and not line_x_height and line_all_height:
            line.asc_height = line_all_height

        # Dash-width normalization + ligature expansion.
        for word in line.words:
            if word.chars is not None and len(word.chars) != len(word.text):
                continue
            letters = list(word.text)
            chars = word.chars
            if chars and word.line.x_height:
                for k in range(len(letters)):
                    enough = len(letters) > 2 or len(word.line.words) > 2
                    if letters[k] in ("-", "–", "—", "¬") and enough:
                        ch_width = chars[k].bbox.right - chars[k].bbox.left
                        if k - 1 >= 0:
                            right_bound = chars[k + 1].bbox.left \
                                if k + 1 < len(chars) else chars[k].bbox.right
                            ch_width = min(ch_width,
                                           right_bound - chars[k - 1].bbox.right)
                        norm = ch_width / word.line.x_height
                        if norm > 1.5:
                            letters[k] = "—"
                        elif norm > 0.9:
                            letters[k] = "–"
                        else:
                            letters[k] = "-"
                        chars[k].text = letters[k]
            word.text = replace_ligatures("".join(letters))

    return lang_set
