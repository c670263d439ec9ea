"""Borderless (text-alignment) table detection — the column-alignment
core of the reference's ``js/pdf/detectPdfTables.js``.

Detects data tables with no ruled grid from text geometry alone:

- Phase 0 quick bail-out for single-column prose pages (zero same-y line
  pairs and no dot-leader cluster)             (detectPdfTables.js:72-119)
- Phase 1 row grouping by y-proximity + table-like row identification:
  stream-order consecutiveness (Signal A), numeric content (Signal B),
  right-clustered-numeric single-line rows, sub-row splitting for
  multi-column pages                           (:121-224, :881-902)
- Phase 2 candidate regions from runs of table-like rows with dynamic
  y-gap thresholds, section-header bridging, x-overlap union-find
  clustering and in-cluster gap re-splitting   (:908-1127)
- Phase 4 validation: multi-segment row floor, column-alignment
  consistency, segment-count consistency, tiny-fragment (equation) and
  prose/narrative rejections                   (:1914-2062)
- Column-structure extraction: phrase merge + currency chaining on
  spatially-sorted row words, greedy column-bound clustering, and
  low-coverage column pruning                  (:2728-3042)

The detected regions feed ``page.table_boxes`` exactly like the
ruled-grid detector (``pdf/paths.py``): furniture suppression in
``analyzeLayout`` (reference ``ocrObjects.js:28-34``) and pipe-table
rendering in the markdown export.

Path/fill-based signals live in ``pdf/paths.py``: strict vector grids,
row-band fills, dashed-line reconstruction, and header-rule anchored
tables (``detect_header_rule_tables``).
"""

from __future__ import annotations

import re

from ..functions.stats import js_round
from ..model import BBox

_NUM_TOKEN_RE = re.compile(r"^[\d,$%.()+-]+$")
_HAS_DIGIT_RE = re.compile(r"\d")
_HAS_LETTER_RE = re.compile(r"[a-zA-Z]")
_CURRENCY_RE = re.compile(r"^[$€£¥¢]+$")
_LEADER_RE = re.compile(r"^[*.]+$")


def _is_num_token(t: str) -> bool:
    return bool(_NUM_TOKEN_RE.match(t))


def _is_num_word(t: str) -> bool:
    return _is_num_token(t) and (bool(_HAS_DIGIT_RE.search(t)) or t == "-")


def is_right_clustered_numeric(words) -> bool:
    """Label followed by 3+ right-clustered numeric tokens
    (detectPdfTables.js:14-29)."""
    if len(words) < 4:
        return False
    num_w = sum(1 for w in words if _is_num_word(w.text))
    if num_w < 3:
        return False
    last_text_idx = -1
    for i, w in enumerate(words):
        if not _is_num_token(w.text):
            last_text_idx = i
    num_after_text = 0
    for w in words[last_text_idx + 1:]:
        if not _is_num_token(w.text):
            return False
        if _is_num_word(w.text):
            num_after_text += 1
    return num_after_text >= 3


def group_lines_into_rows(lines) -> list[dict]:
    """y-proximity grouping within 5pt, running-average row y
    (detectPdfTables.js:881-902)."""
    rows: list[dict] = []
    for i, line in enumerate(lines):
        top = line.bbox.top
        for row in rows:
            if abs(top - row["y"]) <= 5:
                row["idx"].append(i)
                row["y"] = sum(lines[j].bbox.top for j in row["idx"]) \
                    / len(row["idx"])
                break
        else:
            rows.append({"y": top, "idx": [i]})
    rows.sort(key=lambda r: r["y"])
    return rows


def _numeric_word_count(lines, indices) -> int:
    return sum(1 for idx in indices for w in lines[idx].words
               if _is_num_token(w.text) and _HAS_DIGIT_RE.search(w.text))


def find_table_like_rows(lines) -> list[dict] | None:
    """Phases 0-1: returns table-like rows (or None on the quick
    bail-out for prose pages) (detectPdfTables.js:72-224)."""
    if len(lines) < 3:
        return None

    same_y_pairs = sum(
        1 for i in range(len(lines) - 1)
        if abs(lines[i].bbox.top - lines[i + 1].bbox.top) < 5)
    if same_y_pairs == 0:
        # Dot-leader rows emit one OCR line per visual row → zero same-y
        # pairs but still a table; require a ≥3-rows-within-300pt cluster.
        dot_ys = sorted(ln.bbox.top for ln in lines
                        if is_right_clustered_numeric(ln.words))
        if not any(dot_ys[i + 2] - dot_ys[i] < 300
                   for i in range(len(dot_ys) - 2)):
            return None

    rows = group_lines_into_rows(lines)
    table_like: list[dict] = []
    for row in rows:
        idx = row["idx"]
        if len(idx) < 2:
            if len(idx) == 1 and \
                    is_right_clustered_numeric(lines[idx[0]].words):
                table_like.append({"y": row["y"], "idx": list(idx),
                                   "has_numbers": True})
            continue

        # Signal A: stream-order consecutiveness (table cells at one y
        # are row-major-consecutive; multi-column text is not).
        max_gap = max(idx[i] - idx[i - 1] for i in range(1, len(idx)))
        if max_gap > 2:
            # Split into consecutive sub-sequences, test each.
            subs, cur = [], [idx[0]]
            for j in idx[1:]:
                if j - cur[-1] <= 2:
                    cur.append(j)
                else:
                    subs.append(cur)
                    cur = [j]
            subs.append(cur)

            # Column-major stream: 3+ pure-numeric singleton subs →
            # accept the whole row as one multi-segment table row.
            if len(subs) >= 4:
                pure_numeric = 0
                for sub in subs:
                    if len(sub) == 1:
                        w = lines[sub[0]].words
                        if len(w) == 1 and _is_num_token(w[0].text) \
                                and _HAS_DIGIT_RE.search(w[0].text):
                            pure_numeric += 1
                if pure_numeric >= 3:
                    table_like.append({"y": row["y"], "idx": list(idx),
                                       "has_numbers": True})
                    continue

            for sub in subs:
                if len(sub) < 2:
                    if len(sub) == 1 and \
                            is_right_clustered_numeric(lines[sub[0]].words):
                        table_like.append({
                            "y": lines[sub[0]].bbox.top, "idx": sub,
                            "has_numbers": True})
                    continue
                n_num = _numeric_word_count(lines, sub)
                if n_num >= 1 or len(sub) >= 3:
                    sub_y = sum(lines[j].bbox.top for j in sub) / len(sub)
                    table_like.append({"y": sub_y, "idx": sub,
                                       "has_numbers": n_num >= 1})
            continue

        # Signal B: numeric content.
        has_numbers = _numeric_word_count(lines, idx) >= 1
        if has_numbers or len(idx) >= 3:
            table_like.append({"y": row["y"], "idx": list(idx),
                               "has_numbers": has_numbers})
    return table_like or None


def _bridge_ok(lines, y_low, y_high, bracket, left, right, width,
               y_gap_threshold) -> bool:
    """Section-header gap bridging: 1-3 intervening non-wide lines in
    the table's x-region, every step small (detectPdfTables.js:940-997)."""
    x_tol = max(50.0, width * 0.05)
    bridge_ys = [y_low]
    any_wide = False
    for li, line in enumerate(lines):
        if li in bracket:
            continue
        ly = line.bbox.top
        if y_low < ly < y_high:
            lx = line.bbox.left
            if left - x_tol <= lx <= right:
                bridge_ys.append(ly)
                if line.bbox.right - line.bbox.left > width * 0.6:
                    any_wide = True
    intervening = len(bridge_ys) - 1
    if not (0 < intervening <= 3) or any_wide:
        return False
    bridge_ys.append(y_high)
    bridge_ys.sort()
    max_step = max(bridge_ys[s] - bridge_ys[s - 1]
                   for s in range(1, len(bridge_ys)))
    return max_step < y_gap_threshold


def group_rows_into_candidates(table_like, lines, page_height) -> list[dict]:
    """Phase 2 (detectPdfTables.js:908-1127): runs of close rows →
    x-overlap clusters → in-cluster gap re-split → candidates with
    ≥3 numeric / ≥4 non-numeric rows."""
    table_like = sorted(table_like, key=lambda r: r["y"])

    y_gap_threshold = 150.0
    if len(table_like) >= 3:
        spacings = sorted(table_like[i]["y"] - table_like[i - 1]["y"]
                          for i in range(1, len(table_like)))
        y_gap_threshold = max(spacings[len(spacings) // 2] * 3, 150.0)
    y_gap_threshold = min(y_gap_threshold, (page_height or 1e9) * 0.2)

    def row_extent(r):
        ls = [lines[j].bbox.left for j in r["idx"]]
        rs = [lines[j].bbox.right for j in r["idx"]]
        return min(ls), max(rs)

    candidates: list[dict] = []
    run_start = 0
    for i in range(1, len(table_like) + 1):
        is_cont = False
        if i < len(table_like):
            gap = table_like[i]["y"] - table_like[i - 1]["y"]
            if gap < y_gap_threshold:
                is_cont = True
            else:
                l0, r0 = row_extent(table_like[i - 1])
                l1, r1 = row_extent(table_like[i])
                left, right = min(l0, l1), max(r0, r1)
                bracket = set(table_like[i - 1]["idx"]) | \
                    set(table_like[i]["idx"])
                is_cont = _bridge_ok(
                    lines, table_like[i - 1]["y"], table_like[i]["y"],
                    bracket, left, right, right - left, y_gap_threshold)
        if is_cont:
            continue

        run = table_like[run_start:i]
        run_start = i
        has_any_numbers = any(r["has_numbers"] for r in run)
        min_rows = 3 if has_any_numbers else 4
        if len(run) < min_rows:
            continue

        # x-overlap union-find clustering (multi-column pages).
        extents = [row_extent(r) for r in run]
        parent = list(range(len(run)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a in range(len(run)):
            for b in range(a + 1, len(run)):
                if extents[a][1] > extents[b][0] + 10 and \
                        extents[b][1] > extents[a][0] + 10:
                    parent[find(a)] = find(b)
        clusters: dict[int, list[dict]] = {}
        for j in range(len(run)):
            clusters.setdefault(find(j), []).append(run[j])

        for cluster in clusters.values():
            if len(cluster) < min_rows:
                continue
            cluster.sort(key=lambda r: r["y"])
            c_left = min(lines[j].bbox.left
                         for r in cluster for j in r["idx"])
            c_right = max(lines[j].bbox.right
                          for r in cluster for j in r["idx"])
            c_width = c_right - c_left

            # In-cluster gap re-check with cluster-specific dimensions.
            split_points = [0]
            for k in range(1, len(cluster)):
                if cluster[k]["y"] - cluster[k - 1]["y"] <= y_gap_threshold:
                    continue
                bracket = set(cluster[k - 1]["idx"]) | \
                    set(cluster[k]["idx"])
                if not _bridge_ok(lines, cluster[k - 1]["y"],
                                  cluster[k]["y"], bracket, c_left,
                                  c_right, c_width, y_gap_threshold):
                    split_points.append(k)
            split_points.append(len(cluster))

            for si in range(len(split_points) - 1):
                sub = cluster[split_points[si]:split_points[si + 1]]
                if len(sub) < min_rows:
                    continue
                all_idx = [j for r in sub for j in r["idx"]]
                bbox = BBox(
                    min(lines[j].bbox.left for j in all_idx),
                    min(lines[j].bbox.top for j in all_idx),
                    max(lines[j].bbox.right for j in all_idx),
                    max(lines[j].bbox.bottom for j in all_idx))
                candidates.append({"bbox": bbox, "rows": sub})
    return candidates


def validate_candidate(cand, lines) -> bool:
    """Phase 4 checks 1-6 (detectPdfTables.js:1914-2062)."""
    rows = cand["rows"]

    def row_multi_seg(r):
        return len(r["idx"]) >= 2 or (
            len(r["idx"]) == 1 and
            is_right_clustered_numeric(lines[r["idx"][0]].words))

    multi_seg = [r for r in rows if row_multi_seg(r)]
    if len(multi_seg) < 3:
        return False

    # Check 2: column alignment (left+right edges at 5pt grid).
    left_counts: dict[int, int] = {}
    right_counts: dict[int, int] = {}
    for r in rows:
        for j in r["idx"]:
            lx = js_round(lines[j].bbox.left / 5) * 5
            rx = js_round(lines[j].bbox.right / 5) * 5
            left_counts[lx] = left_counts.get(lx, 0) + 1
            right_counts[rx] = right_counts.get(rx, 0) + 1
    align_min = max(2, len(rows) * 0.3)
    aligned = sum(1 for c in left_counts.values() if c >= align_min) + \
        sum(1 for c in right_counts.values() if c >= align_min)
    if aligned < 2:
        return False

    # Check 3: segment-count consistency.
    seg_counts: dict[int, int] = {}
    for r in multi_seg:
        n = len(r["idx"])
        seg_counts[n] = seg_counts.get(n, 0) + 1
    if len(multi_seg) >= 10:
        best = 0
        for c in seg_counts:
            cluster = seg_counts.get(c - 1, 0) + seg_counts[c] + \
                seg_counts.get(c + 1, 0)
            best = max(best, cluster)
        if best < len(multi_seg) * 0.4:
            return False
    else:
        if max(seg_counts.values()) < len(multi_seg) * 0.4:
            return False

    # Check 4: tiny-fragment (equation) rejection.
    tiny = total = 0
    for r in rows:
        for j in r["idx"]:
            total += 1
            if lines[j].bbox.right - lines[j].bbox.left < 70:
                tiny += 1
    if total > 0 and tiny / total > 0.7:
        return False

    # Check 5: prose cells (3+ alpha words, zero numeric).
    def cell_is_prose(j):
        words = lines[j].words
        if len(words) < 3:
            return False
        alpha = sum(1 for w in words if _HAS_LETTER_RE.search(w.text))
        numeric = sum(1 for w in words if _is_num_token(w.text)
                      and _HAS_DIGIT_RE.search(w.text))
        return alpha >= 3 and numeric == 0

    prose_rows = 0
    for r in rows:
        if len(r["idx"]) < 2:
            continue
        if sum(1 for j in r["idx"] if cell_is_prose(j)) >= 2:
            prose_rows += 1
    if prose_rows > len(rows) * 0.4:
        return False

    # Check 6: all-narrative rows (no narrow atomic anchor cell).
    def cell_is_text_fragment(j):
        words = lines[j].words
        return len(words) >= 2 and any(
            _HAS_LETTER_RE.search(w.text) for w in words)

    n_multi = sum(1 for r in rows if len(r["idx"]) >= 2)
    if n_multi >= 3:
        narrative = 0
        for r in rows:
            if len(r["idx"]) < 2:
                continue
            widths = [lines[j].bbox.right - lines[j].bbox.left
                      for j in r["idx"]]
            max_w = max(widths)
            all_narr = all(
                cell_is_text_fragment(j) and w >= max_w * 0.5
                for j, w in zip(r["idx"], widths))
            if all_narr:
                narrative += 1
        if narrative > n_multi * 0.5:
            return False
    return True


def extract_column_separators(cand, lines) -> list[float]:
    """Word-level column inference (detectPdfTables.js:2783-3042):
    phrase merge + currency chaining per row (spatial order), greedy
    column-bound clustering, low-coverage column pruning, separators at
    bound midpoints."""
    from .tables import calc_column_bounds

    bbox = cand["bbox"]
    cand_width = bbox.right - bbox.left

    def is_narrative_line(line):
        total = numeric = 0
        for w in line.words:
            if _LEADER_RE.match(w.text):
                continue
            total += 1
            if (_is_num_token(w.text) and _HAS_DIGIT_RE.search(w.text)) \
                    or _CURRENCY_RE.match(w.text):
                numeric += 1
        if total <= 6:
            return False
        return numeric / total < 0.5

    all_bboxes: list[BBox] = []
    for r in cand["rows"]:
        # skip paragraph-like rows (wide + prose line)
        skip = False
        for j in r["idx"]:
            line = lines[j]
            lw = line.bbox.right - line.bbox.left
            if cand_width > 0 and lw > cand_width * 0.5 and \
                    is_narrative_line(line):
                skip = True
                break
        if skip:
            continue
        row_words = []
        h_sum = h_count = 0
        for j in r["idx"]:
            line = lines[j]
            lh = line.bbox.bottom - line.bbox.top
            if lh > 0:
                h_sum += lh
                h_count += 1
            row_words.extend(line.words)
        row_words.sort(key=lambda w: w.bbox.left)
        avg_h = h_sum / h_count if h_count else 20.0
        gap_threshold = avg_h * 0.4

        def expand(box, b):
            return BBox(min(box.left, b.left), min(box.top, b.top),
                        max(box.right, b.right), max(box.bottom, b.bottom))

        w = 0
        while w < len(row_words):
            if _CURRENCY_RE.match(row_words[w].text):
                cur = row_words[w].bbox
                j = w + 1
                while j < len(row_words) and \
                        _CURRENCY_RE.match(row_words[j].text):
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                if j < len(row_words):
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                all_bboxes.append(cur)
                w = j
            else:
                cur = row_words[w].bbox
                cur_has_digit = bool(
                    _HAS_DIGIT_RE.search(row_words[w].text))
                j = w + 1
                while j < len(row_words) and \
                        not _CURRENCY_RE.match(row_words[j].text):
                    t = row_words[j].text
                    if len(t) >= 3 and _LEADER_RE.match(t):
                        cur = expand(cur, row_words[j].bbox)
                        j += 1
                        continue
                    if cur_has_digit or _HAS_DIGIT_RE.search(t):
                        break
                    if row_words[j].bbox.left - cur.right > gap_threshold:
                        break
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                all_bboxes.append(cur)
                w = j

    if len(all_bboxes) < 2:
        return []
    bounds = [list(b) for b in calc_column_bounds(all_bboxes)]

    # Low-coverage column pruning (:2958-3034, header part omitted —
    # this port has no header detection).
    if len(bounds) > 2:
        y_rows: list[dict] = []
        for b in all_bboxes:
            for row in y_rows:
                if abs(b.top - row["y"]) < 10:
                    row["boxes"].append(b)
                    break
            else:
                y_rows.append({"y": b.top, "boxes": [b]})
        floor = max(2, len(y_rows) * 0.25)
        c = len(bounds) - 1
        while c >= 0 and len(bounds) > 2:
            lo, hi = bounds[c]
            here = sum(1 for row in y_rows
                       if any(lo <= (b.left + b.right) / 2 <= hi
                              for b in row["boxes"]))
            if here == 0 or here < floor:
                if c == 0:
                    bounds[1][0] = bounds[0][0]
                else:
                    bounds[c - 1][1] = bounds[c][1]
                bounds.pop(c)
            c -= 1

    return [(bounds[i][1] + bounds[i + 1][0]) / 2
            for i in range(len(bounds) - 1)]


def _is_data_value_token(t: str) -> bool:
    return _is_num_token(t) and bool(_HAS_DIGIT_RE.search(t)) and \
        not re.match(r"^(?:19|20)\d\d$", t)


def detect_headers(cand, lines):
    """Header-band detection above the first data row
    (detectPdfTables.js:2470-2725 detectHeaders): walk non-data lines
    upward grouping by y, pick the densest all-text row's cell centers
    as column anchors (or the stacked 2-cell cross-row rule), filter
    anchors by data-row alignment, and report the header band
    [band_top, first_data_row) with a strong/weak confidence."""
    rows = cand["rows"]
    if not rows:
        return None
    ys = sorted(r["y"] for r in rows)
    avg_row_h = 50.0
    if len(ys) > 1:
        spacings = sorted(ys[i] - ys[i - 1] for i in range(1, len(ys)))
        avg_row_h = spacings[len(spacings) // 2]
    first_y = ys[0]
    lookback = first_y - avg_row_h * 10
    in_table = {j for r in rows for j in r["idx"]}
    bbox = cand["bbox"]

    above = [(i, ln) for i, ln in enumerate(lines)
             if i not in in_table and lookback <= ln.bbox.top < first_y
             and ln.bbox.right >= bbox.left and ln.bbox.left <= bbox.right]
    if not above:
        return None

    y_groups: list[dict] = []
    for i, ln in above:
        for g in y_groups:
            if abs(g["y"] - ln.bbox.top) < 5:
                g["items"].append(ln)
                break
        else:
            y_groups.append({"y": ln.bbox.top, "items": [ln]})

    def extract_cells(items):
        words = [w for ln in items for w in ln.words]
        if not words:
            return []
        words.sort(key=lambda w: w.bbox.left)
        avg_h = sum(w.bbox.bottom - w.bbox.top for w in words) / len(words)
        # looser than data rows: header phrases are often wide-spaced
        gap_threshold = avg_h * 0.6
        cells = [{"left": words[0].bbox.left, "right": words[0].bbox.right,
                  "words": [words[0]]}]
        for w in words[1:]:
            if w.bbox.left - cells[-1]["right"] < gap_threshold:
                cells[-1]["right"] = max(cells[-1]["right"], w.bbox.right)
                cells[-1]["words"].append(w)
            else:
                cells.append({"left": w.bbox.left, "right": w.bbox.right,
                              "words": [w]})
        return cells

    y_groups.sort(key=lambda g: -g["y"])  # near-data upward
    annotated = []
    for g in y_groups:
        cells = extract_cells(g["items"])
        alpha = data = 0
        for c in cells:
            for w in c["words"]:
                if _is_data_value_token(w.text):
                    data += 1
                elif _HAS_LETTER_RE.search(w.text):
                    alpha += 1
        annotated.append({"y": g["y"], "cells": cells,
                          "all_text": data == 0,
                          "mostly_text": alpha > data})

    best = None
    for a in annotated:
        if a["all_text"] and len(a["cells"]) >= 3 and \
                (best is None or len(a["cells"]) > len(best["cells"])):
            best = a

    def count_alpha(cell):
        return sum(1 for w in cell["words"]
                   if _HAS_LETTER_RE.search(w.text))

    def header_like(a):
        if len(a["cells"]) >= 2:
            return a["all_text"]
        if len(a["cells"]) == 1:
            return a["mostly_text"] and count_alpha(a["cells"][0]) <= 4
        return False

    band_top = first_y
    last_y = first_y
    for a in annotated:
        if not header_like(a):
            continue
        if last_y - a["y"] > avg_row_h * 2:
            break
        band_top = a["y"]
        last_y = a["y"]

    # Rule 2: stacked 2-cell headers sharing x-positions across rows.
    from_stacked = False
    best_cells = best["cells"] if best else None
    if best_cells is None:
        two_cell = [a for a in annotated
                    if a["all_text"] and len(a["cells"]) == 2]
        if len(two_cell) >= 2:
            x_tol = (bbox.right - bbox.left) * 0.15
            ref = two_cell[0]["cells"]
            ref_lc = (ref[0]["left"] + ref[0]["right"]) / 2
            ref_rc = (ref[1]["left"] + ref[1]["right"]) / 2
            sum_l = sum_r = match = 0
            for a in two_cell:
                lc = (a["cells"][0]["left"] + a["cells"][0]["right"]) / 2
                rc = (a["cells"][1]["left"] + a["cells"][1]["right"]) / 2
                if abs(lc - ref_lc) < x_tol and abs(rc - ref_rc) < x_tol:
                    sum_l += lc
                    sum_r += rc
                    match += 1
            if match >= 2:
                from_stacked = True
                best_cells = [
                    {"left": sum_l / match - 50,
                     "right": sum_l / match + 50, "words": []},
                    {"left": sum_r / match - 50,
                     "right": sum_r / match + 50, "words": []},
                ]

    if best_cells is None:
        if band_top >= first_y:
            return None
        return {"column_anchors": [], "band_top": band_top,
                "band_bottom": first_y, "confidence": "weak"}

    # keep only cells aligned with some data-row word center
    aligned = []
    for c in best_cells:
        hit = False
        for r in rows:
            for j in r["idx"]:
                for w in lines[j].words:
                    wc = (w.bbox.left + w.bbox.right) / 2
                    if c["left"] - 5 <= wc <= c["right"] + 5:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                break
        if hit:
            aligned.append(c)
    anchors = [(c["left"] + c["right"]) / 2 for c in aligned]
    min_anchors = 2 if from_stacked else 4
    confidence = "strong" if (len(anchors) >= min_anchors and
                              len(aligned) >= len(best_cells) * 0.5) \
        else "weak"
    return {"column_anchors": anchors, "band_top": band_top,
            "band_bottom": first_y, "confidence": confidence}


def _header_separators(headers, cand, lines):
    """Strong header anchors → candidate separators at anchor midpoints,
    plus a synthesized label-column separator when data extends clearly
    left of the first anchor (extractStructure:2742-2781)."""
    if not headers or headers["confidence"] != "strong" \
            or len(headers["column_anchors"]) < 2:
        return None
    anchors = sorted(headers["column_anchors"])
    seps = [(anchors[i] + anchors[i + 1]) / 2
            for i in range(len(anchors) - 1)]
    left_guard = anchors[0] - 10
    has_label = any(lines[j].bbox.right < left_guard
                    for r in cand["rows"] for j in r["idx"])
    if has_label:
        half = (anchors[1] - anchors[0]) / 2
        label_sep = anchors[0] - half
        if label_sep > cand["bbox"].left + 5 and \
                anchors[0] - cand["bbox"].left > half * 2:
            seps.insert(0, label_sep)
    return sorted(seps)


def detect_text_tables(page) -> list[dict]:
    """Page → borderless table regions [{bbox, col_separators, method}]
    (the text-candidate path of detectPdfTables.js detectTableRegions)."""
    lines = page.lines
    table_like = find_table_like_rows(lines)
    if not table_like:
        return []
    candidates = group_rows_into_candidates(
        table_like, lines, getattr(page, "height", None))
    out = []
    for cand in candidates:
        if not validate_candidate(cand, lines):
            continue
        seps = extract_column_separators(cand, lines)
        headers = detect_headers(cand, lines)
        hseps = _header_separators(headers, cand, lines)
        if hseps is not None:
            # Header-anchor override (extractStructure:3049-3060): take
            # the header's separators when word clustering under-counts
            # (sparse tables) or over-splits by ≥2×.
            sparse_under = len(hseps) > len(seps) and len(seps) < 3
            over_split = 2 <= len(hseps) <= len(seps) * 0.5
            if sparse_under or over_split:
                seps = hseps
        b = cand["bbox"]
        top = b.top
        if headers and headers["confidence"] == "strong" \
                and headers["band_top"] < top:
            # Extend the region over the header band so header rows
            # render inside the table — STRONG confidence only; a weak
            # band (e.g. a stray short prose line) falls through and the
            # text stays body copy (refineTableTop,
            # detectPdfTables.js:3095-3123, incl. its 5pt margin).
            top = headers["band_top"] - 5
        out.append({
            "bbox": {"left": b.left, "top": top,
                     "right": b.right, "bottom": b.bottom},
            "col_separators": seps,
            "method": "text",
        })
    return out
