"""Per-page paragraph assignment (reflow).

Line-by-line behavioral port of /root/reference/js/utils/reflowPars.js:14-360,
including its JS-coercion quirks (undefined reads → false comparisons, the
``bottom - null`` first line space, array truthiness), because paragraph cut
decisions feed the byte-identical extracted-text surface.

Assumes lines are already in reading order; only decides where to split.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import at, quantile, rangei, truthy
from ..model import Page, Par, bbox_union

_BULLET_RE = re.compile(r"([•◦▪▫●○◼◻➢«»]|((i+|\d+|[a-z])(\.|\)))$)")
_TERMINAL_RE = re.compile(r"[.!?:]$")
_LOWER_RE = re.compile(r"[a-z]")
_WORDCHAR_RE = re.compile(r"\w")


def _nn(x):
    """None-safe float: JS `undefined` arithmetic yields NaN → comparisons
    false; we model that by returning None and guarding comparisons."""
    return x


def assign_paragraphs(page: Page, angle: float) -> None:
    ends_early_prev = False
    starts_late_prev = False
    bullet_prev = False
    letter_end_prev = False

    new_par = True
    reason = "first line"

    sin_a = math.sin(angle * (math.pi / 180))
    cos_a = math.cos(angle * (math.pi / 180))

    par_arr: list[Par] = []

    line_left = []
    line_right = []
    line_width = []
    line_center = []
    line_space = []

    y2_prev = 0.0  # JS: `bottom - null` coerces null → 0 for the first line.
    for line in page.lines:
        line_space.append(line.bbox.bottom - y2_prev)
        x1r = line.bbox.left * cos_a - sin_a * line.bbox.bottom
        x2r = line.bbox.right * cos_a - sin_a * line.bbox.bottom
        line_left.append(x1r)
        line_right.append(x2r)
        line_width.append(line.bbox.right - line.bbox.left)
        line_center.append((x1r + x2r) / 2)
        y2_prev = line.bbox.bottom

    lines = page.lines
    n_lines = len(lines)
    line_index = {id(ln): i for i, ln in enumerate(lines)}

    def calc_expected(i):
        window = 5
        cur_bottom = lines[i].bbox.bottom
        prev_lines = [x for x in lines[max(0, i - window):i]
                      if x.bbox.bottom <= cur_bottom]
        next_lines = [x for x in lines[i + 1:i + window + 1]
                      if x.bbox.bottom >= cur_bottom]
        n_next = len(next_lines)
        n_prev = min(window - n_next, len(prev_lines))

        comp = []
        if n_prev:
            comp.extend(rangei(i - n_prev, i - 1))
        if n_next:
            comp.extend(rangei(i + 1, i + n_next))
        if not comp:
            return None
        lm = quantile([line_left[x] for x in comp], 0.5)
        rm = quantile([line_right[x] for x in comp], 0.5)
        wm = quantile([line_width[x] for x in comp], 0.5)
        sm = quantile([line_space[x] for x in comp], 0.5)
        if lm is None or rm is None or wm is None or sm is None:
            return None
        return lm, rm, wm, sm

    # Drawn horizontal separator rules (from the PDF path) split a
    # paragraph when one lies in the vertical gap between two lines and
    # horizontally overlaps the later line (analyzeLayout.js decideBreak
    # pageRules consumer).
    page_rules = getattr(page, "rules", None) or []

    for h in range(n_lines):
        line = lines[h]
        ends_early_int = False
        starts_late = False

        if h > 0 and line.orientation != lines[h - 1].orientation:
            new_par = True
            reason = "orientation change"

        if not new_par and h > 0 and page_rules:
            # Line bboxes carry full ascender/descender bands, so a rule
            # drawn visually between two rows can sit inside the next
            # line's box; tolerate up to ~40% of each band.
            prev_b = lines[h - 1].bbox
            gap_top = prev_b.bottom - (prev_b.bottom - prev_b.top) * 0.4
            gap_bot = line.bbox.top + (line.bbox.bottom
                                       - line.bbox.top) * 0.4
            for r in page_rules:
                if gap_top <= r["y"] <= gap_bot \
                        and r["right"] > line.bbox.left \
                        and r["left"] < line.bbox.right:
                    new_par = True
                    reason = "separator rule"
                    break

        w0_text = line.words[0].text if line.words else ""
        bullet = bool(_BULLET_RE.match(w0_text))
        if bullet and w0_text == "v.":
            bullet = False
        is_real_list_item = bullet
        if is_real_list_item and h > 0:
            prev_line = lines[h - 1]
            prev_last = prev_line.words[-1].text if prev_line.words else ""
            if not _TERMINAL_RE.search(prev_last):
                is_real_list_item = False
            else:
                prev_text = "".join(w.text for w in prev_line.words)
                if prev_text.rfind("(") > prev_text.rfind(")"):
                    is_real_list_item = False

        lower_start = bool(_LOWER_RE.match(w0_text[:1]))
        last_text = line.words[-1].text if line.words else ""
        letter_end = bool(_WORDCHAR_RE.search(last_text[-1:]))
        lower_connection = lower_start and letter_end_prev

        if is_real_list_item and h > 0:
            new_par = True
            reason = "bullet/list item"

        first_word_sup = bool(line.words and line.words[0].style.sup)
        if first_word_sup and h > 0:
            new_par = True
            reason = "superscript/footnote"

        par_line_indices = []
        if par_arr and par_arr[-1].lines:
            par_line_indices = [line_index[id(x)] for x in par_arr[-1].lines]

            if len(par_arr[-1].lines) > 2 and not bullet_prev:
                par_left_median = quantile([line_left[x] for x in par_line_indices], 0.5)
                par_width_median = quantile([line_width[x] for x in par_line_indices], 0.5)
                thresh = max((par_width_median or 0) * 0.05, 50)
                nxt = at(line_left, h + 1)
                if (truthy(par_left_median) and truthy(par_width_median)
                        and truthy(line_left[h])
                        and abs(line_left[h] - line_left[h - 1]) > thresh
                        and abs(line_left[h] - par_left_median) > thresh
                        and nxt is not None
                        and abs(nxt - par_left_median) > thresh):
                    new_par = True
                    reason = "left change"

        expected = calc_expected(h)

        truly_center_aligned_prev = False
        center_aligned_prev = False
        if not expected:
            new_par = True
            reason = "default value (unable to calculate)"
        else:
            left_median, right_median, width_median, space_median = expected

            par_in_progress = par_arr[-1] if par_arr else None
            par_first_line_left = (line_left[par_line_indices[0]]
                                   if par_line_indices else None)
            prev_left = at(line_left, h - 1)
            continues_prev_indent = (
                par_in_progress is not None
                and len(par_in_progress.lines) >= 2
                and prev_left is not None
                and abs(line_left[h] - prev_left) < (width_median * 0.025)
                and par_first_line_left is not None
                and par_first_line_left < line_left[h] - (width_median * 0.025))
            continues_at_same_indent = (
                par_in_progress is not None
                and len(par_in_progress.lines) >= 1
                and h - 1 >= 0
                and par_in_progress.lines[-1] is lines[h - 1]
                and prev_left is not None
                and abs(line_left[h] - prev_left) < (width_median * 0.025))
            indented = (
                truthy(left_median) and (h + 1) < n_lines
                and line_left[h] > (left_median + width_median * 0.025)
                and line_left[h] > line_left[h + 1]
                and not continues_prev_indent
                and not continues_at_same_indent)

            prev_center = at(line_center, h - 1)
            center_aligned_prev = (
                par_line_indices is not None
                and all(abs(line_center[x] - prev_center) < (width_median * 0.0125)
                        for x in par_line_indices)
                if prev_center is not None else
                (par_line_indices is not None and len(par_line_indices) == 0))

            if center_aligned_prev and par_line_indices:
                if len(par_line_indices) > 1:
                    prev_w = at(line_width, h - 1)
                    truly_center_aligned_prev = any(
                        abs(line_width[x] - prev_w) > (width_median * 0.05)
                        for x in par_line_indices) if prev_w is not None else False
                elif len(par_line_indices) == 1:
                    pi = par_line_indices[0]
                    shared_center = abs(line_center[pi] - line_center[h]) \
                        < (width_median * 0.0125)
                    width_differs = abs(line_width[pi] - line_width[h]) \
                        > (width_median * 0.05)
                    truly_center_aligned_prev = shared_center and width_differs

            center_aligned = (prev_center is not None and truthy(prev_center)
                              and abs(prev_center - line_center[h])
                              < (width_median * 0.0125))
            next_center = at(line_center, h + 1)
            center_aligned_next = (next_center is not None and truthy(next_center)
                                   and abs(next_center - line_center[h])
                                   < (width_median * 0.0125))

            center_aligned_start = (not center_aligned_prev and not center_aligned
                                    and center_aligned_next)
            center_aligned_end = center_aligned_prev and not center_aligned

            if (par_line_indices is not None and prev_center is not None
                    and truthy(prev_center)
                    and (center_aligned_start or center_aligned_end)):
                prev_w = at(line_width, h - 1)
                width_variation_prev = (
                    par_line_indices and len(par_line_indices) > 1
                    and prev_w is not None
                    and any(abs(line_width[x] - prev_w) > (width_median * 0.05)
                            for x in par_line_indices))
                prev_r = at(line_right, h - 1)
                width_variation = (prev_r is not None and truthy(prev_r)
                                   and abs(line_right[h] - prev_r)
                                   > (width_median * 0.05))
                next_r = at(line_right, h + 1)
                width_variation_next = (next_r is not None and truthy(next_r)
                                        and abs(line_right[h] - next_r)
                                        > (width_median * 0.05))
                prev_l = at(line_left, h - 1)
                left_change = (prev_l is not None and truthy(prev_l)
                               and abs(prev_l - line_left[h])
                               > (width_median * 0.025))
                right_change = (prev_r is not None and truthy(prev_r)
                                and abs(prev_r - line_right[h])
                                > (width_median * 0.025))
                if (left_change and right_change and width_variation_prev
                        and width_variation and width_variation_next):
                    new_par = True
                    reason = "alignment change"

            prev_l = at(line_left, h - 1)
            indented_weak = prev_l is not None and line_left[h] > (prev_l + 1)
            prev_s = at(line_space, h - 1)
            line_space_weak = (prev_s is not None and prev_s > 0
                               and line_space[h] > 1.1 * prev_s)

            next_line = at(lines, h + 1)
            next_first_word = next_line.words[0] if next_line and next_line.words else None
            prev_r = at(line_right, h - 1)
            ends_early_int = (
                right_median - line_right[h] > (width_median * 0.1)
                and prev_r is not None and truthy(prev_r)
                and (prev_r - line_right[h]) > (width_median * 0.1)
                and next_first_word is not None
                and (next_first_word.bbox.right - next_first_word.bbox.left)
                < (right_median - line_right[h]))
            starts_late = (
                line_left[h] > (left_median + width_median * 0.2)
                and prev_l is not None and truthy(prev_l)
                and line_left[h] - prev_l > (width_median * 0.2))

            if ends_early_prev and not lower_connection \
                    and (line_space_weak or indented_weak):
                new_par = True
                reason = "prev line ends early"
            elif starts_late_prev and not lower_connection \
                    and not center_aligned_prev:
                new_par = True
                reason = "prev line starts late"
            elif indented and not bullet_prev and not lower_connection \
                    and not truly_center_aligned_prev:
                new_par = True
                reason = "indentation"
            elif h == 1 and line_space[h] > 1.5 * space_median:
                new_par = True
                reason = "large space (first line)"

        line_height = line.bbox.bottom - line.bbox.top
        if truthy(line_space[h]) and line_space[h] < (line_height * -1):
            new_par = True
            reason = "new column"

        prev_s = at(line_space, h - 1)
        next_s = at(line_space, h + 1)
        line_space_increase = (prev_s is not None and prev_s > 0
                               and line_space[h] > 1.5 * prev_s)
        line_space_decrease = (next_s is not None and next_s > 0
                               and line_space[h] > 1.5 * next_s)
        if line_space_increase or line_space_decrease:
            new_par = True
            reason = "large space (relative)"

        bbox = line.bbox
        bbox_prev = lines[h - 1].bbox if h - 1 >= 0 else None

        height = bbox.bottom - bbox.top
        width = bbox.right - bbox.left
        height_rot = height * cos_a - sin_a * width
        if truthy(line_space[h]) and line_space[h] > 3 * height_rot:
            new_par = True
            reason = "large space (absolute)"

        if bbox_prev is not None \
                and (bbox_prev.right < bbox.left or bbox_prev.left > bbox.right) \
                and (bbox_prev.bottom < bbox.top or bbox_prev.top > bbox.bottom):
            new_par = True
            reason = "no overlap"

        if new_par:
            par = Par(page, bbox_union([line.bbox]))
            par.reason = reason
            par_arr.append(par)
            reason = ""

        par_arr[-1].lines.append(line)

        ends_early_prev = ends_early_int and not new_par
        starts_late_prev = starts_late
        bullet_prev = bullet
        letter_end_prev = letter_end
        new_par = False

    for par in par_arr:
        for ln in par.lines:
            ln.par = par
        par.bbox = bbox_union([ln.bbox for ln in par.lines])

    page.pars = par_arr
