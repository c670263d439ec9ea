"""OCR-layer merge operators (within-document alignment joins, SURVEY §2 J1-J2).

* ``combine_ocr_page`` — /root/reference/js/modifyOCR.js:15-193: merge the
  lines/words of layer A into layer B by spatial alignment (y-overlap ≥0.5
  line match with x-overlap tie-break and nearest-line fallback;
  other-column rejection rule; x-ordered word insertion; short-line slope
  replacement).  Rotation handling is ported for the angle==0 path only —
  deskewed inputs are the norm in our pipeline (pass3 already measured the
  angle and line-cutting used it upstream).
* ``build_consensus_layer`` — modifyOCR.js:266-360: n-way consensus vote
  across comparator layers, assigning comparator words to the base word
  with the highest bbox overlap, then scoring agreement into confidence
  tiers and replacing unanimous-against-base words by plurality.

Ray mapping: both layers of one document ride in the same row (or are
zip-joined on url via ``groupby(url).map_groups``) — the operators
themselves are pure per-page functions.
"""

from __future__ import annotations

import math

from ..model import Page, update_line_bbox


def _box_overlap(a, b) -> float:
    """calcBoxOverlap (miscUtils.js:29-45): intersection / area of A."""
    left = max(a.left, b.left)
    top = max(a.top, b.top)
    right = min(a.right, b.right)
    bottom = min(a.bottom, b.bottom)
    w = right - left
    h = bottom - top
    if w <= 0 or h <= 0:
        return 0.0
    area_a = (a.right - a.left) * (a.bottom - a.top)
    return (w * h) / area_a if area_a else 0.0


def combine_ocr_page(page_a: Page, page_b: Page,
                     replace_font_size: bool = False) -> None:
    """Merge page_a's lines/words into page_b in place."""
    for line_new in page_a.lines:
        if not line_new.words:
            continue

        match = None
        match_x_overlap = 0.0
        match_x_dist = 1e6
        closest_i = 0
        closest_metric = 1e6
        y_dist_min = 1e6
        line_i = -1

        for line_i, line in enumerate(page_b.lines):
            if not line.words or line.orientation != 0:
                continue
            left = max(line.bbox.left, line_new.bbox.left)
            top = max(line.bbox.top, line_new.bbox.top)
            right = min(line.bbox.right, line_new.bbox.right)
            bottom = min(line.bbox.bottom, line_new.bbox.bottom)
            width = right - left
            height = bottom - top
            nh = line_new.bbox.bottom - line_new.bbox.top
            y_overlap = 0 if height < 0 else (height / nh if nh else 0)

            if y_overlap >= 0.5:
                nw = line_new.bbox.right - line_new.bbox.left
                x_overlap = 0 if width < 0 else (width / nw if nw else 0)
                if x_overlap > match_x_overlap:
                    match_x_overlap = x_overlap
                    match = line
                elif x_overlap == 0 and match_x_overlap == 0:
                    x_dist = min(abs(line.bbox.right - line_new.bbox.left),
                                 abs(line.bbox.left - line_new.bbox.right))
                    if x_dist < match_x_dist:
                        match_x_dist = x_dist
                        match = line
            elif match is None:
                nw = line_new.bbox.right - line_new.bbox.left
                x_overlap = 0 if width < 0 else (width / nw if nw else 0)
                x_dist = 0 if x_overlap > 0 else min(
                    abs(line.bbox.right - line_new.bbox.left),
                    abs(line.bbox.left - line_new.bbox.right))
                y_dist = 0 if y_overlap > 0 else min(
                    abs(line.bbox.bottom - line_new.bbox.top),
                    abs(line.bbox.top - line_new.bbox.bottom))
                y_dist_min = min(y_dist, y_dist_min)
                total = x_dist + y_dist * 3
                if total < closest_metric:
                    closest_metric = total
                    closest_i = line_i

        # Other-column rejection (modifyOCR.js:103-107)
        if match is not None and match_x_overlap == 0 and \
                match_x_dist > 2 * y_dist_min and \
                page_b.width * 0.05 < match_x_dist:
            match = None

        if match is not None:
            words = match.words
            for word_new in line_new.words:
                word_new.line = match
                k = 0
                word_index = 0
                while k < len(words):
                    word_index = k
                    if not (words[k].bbox.right < word_new.bbox.left
                            and k + 1 < len(words)):
                        break
                    k += 1
                ref = words[word_index]
                word_new.id = ref.id + "+"
                if word_new.bbox.left > ref.bbox.left:
                    words.insert(word_index + 1, word_new)
                else:
                    words.insert(word_index, word_new)
            # Short-line slope replacement (modifyOCR.js:141-147)
            if match.bbox.right - match.bbox.left < 300:
                match.baseline[0] = math.tan(page_b.angle * math.pi / 180)
            update_line_bbox(match)
        else:
            if replace_font_size:
                if closest_i == 0 or closest_i + 1 == len(page_b.lines):
                    line_new.asc_height = (line_new.bbox.bottom -
                                           line_new.bbox.top)
                    line_new.x_height = None
                elif page_b.lines:
                    closest = page_b.lines[closest_i]
                    line_new.asc_height = closest.asc_height
                    line_new.x_height = closest.x_height
                    lh = line_new.bbox.bottom - line_new.bbox.top
                    if line_new.asc_height and line_new.asc_height > lh * 1.5:
                        line_new.asc_height = lh
                        line_new.x_height = None
            line_new.page = page_b
            page_b.lines.insert(closest_i + 1, line_new)


def build_consensus_page(base_page: Page, comparator_pages: list[Page],
                         conf_high: int = 100, conf_med: int = 80,
                         conf_low: int = 50, overlap_thresh: float = 0.5,
                         replace_min_agree: int = 2) -> dict:
    """n-way consensus vote in place on base_page; returns stats."""
    stats = {"total": 0, "high": 0, "medium": 0, "low": 0, "replaced": 0}
    base_words = [w for ln in base_page.lines for w in ln.words]
    # Comparators that failed to parse contribute nothing; with ZERO usable
    # comparators there is no corroboration — every word stays at its
    # existing conf and is reported 'low', rather than the degenerate
    # matches == n_comparators == 0 → all-'high' outcome (ADVICE r1).
    comparator_pages = [c for c in comparator_pages if c is not None]
    n_comparators = len(comparator_pages)
    if n_comparators == 0:
        n = len(base_words)
        stats["total"] = n
        stats["low"] = n
        return stats

    assignments = []
    for comp in comparator_pages:
        mapping: dict[int, list] = {}
        if comp is not None:
            for c_word in (w for ln in comp.lines for w in ln.words):
                best_idx = None
                best_overlap = -1.0
                for bi, b_word in enumerate(base_words):
                    o = _box_overlap(c_word.bbox, b_word.bbox)
                    if o > best_overlap and o >= overlap_thresh:
                        best_overlap = o
                        best_idx = bi
                if best_idx is not None:
                    mapping.setdefault(best_idx, []).append(
                        (c_word.bbox.left, c_word.text))
        assignments.append(mapping)

    for bi, b_word in enumerate(base_words):
        stats["total"] += 1
        present = []
        matches = 0
        for k in range(n_comparators):
            arr = assignments[k].get(bi)
            if not arr:
                continue
            text = "".join(t for _, t in sorted(arr, key=lambda x: x[0]))
            present.append(text)
            if text == b_word.text:
                matches += 1
        if matches == n_comparators:
            b_word.conf = conf_high
            stats["high"] += 1
        elif matches > 0:
            b_word.conf = conf_med
            stats["medium"] += 1
        else:
            b_word.conf = conf_low
            stats["low"] += 1
            counts: dict[str, int] = {}
            for t in present:
                counts[t] = counts.get(t, 0) + 1
            best_text, best_count, tie = None, 0, False
            for t, c in counts.items():
                if c > best_count:
                    best_count, best_text, tie = c, t, False
                elif c == best_count:
                    tie = True
            if best_text is not None and best_count >= replace_min_agree \
                    and not tie:
                b_word.text = best_text
                b_word.chars = None
                stats["replaced"] += 1
    return stats
