"""Faithful port of the reference's table-detection pipeline
(``/root/reference/js/pdf/detectPdfTables.js`` detectTableRegions,
:66-770, plus every helper it reaches).

The pipeline arbitrates FIVE detection methods over one page:

- ``grid-strong``  — fully bordered vector grids (outer rectangle +
  every row/column separator drawn, all connected)       (:2169-2409)
- ``segmented-hline`` — column structure encoded by SEGMENTS of
  horizontal rules (financial statements whose per-column underlines
  repeat row after row)                                  (:2411-2468, :3647-3772)
- ``header-rule``  — a single ruling row of 3+ disjoint column
  underlines anchoring an up-header / down-data scan     (:3354-3600)
- ``text``         — borderless column-aligned text candidates
  (phases 0-4 live in ``stages/text_tables.py``)         (:72-1127, :1914-2062)
- ``row-band``     — alternating row-shading fills       (:1542-1715, :802-880)

plus the integration phases: grid-over-text override, row-band
attach/split/synthesize, header detection (:2470-2725), column
structure extraction (:2728-3093), top-boundary refinement
(:3095-3352), table titles (:3775-3817), multi-column filtering,
adjacent-content extension (:3827-4016), rule-cluster column
refinement (:3602-3645) and stream-order validation (:4018-4056).

Inputs are our ``PaintedPath`` objects (PDF points, y-up) and the
assembled page (line bboxes in display pixels, y-down); ``scale`` and
``visual_height_pts`` convert between the two exactly like the
reference (boxOrigin is already folded into our path CTMs, so it is 0
here).  Output rows are ``{"bbox": {...}, "col_separators": [...],
"method": ..., "title": ...}`` — the exact surface parsePdfDoc.js
:3263-3279 hands to LayoutDataTable.
"""

from __future__ import annotations

import re

from ..text_tables import (find_table_like_rows, group_lines_into_rows,
                           group_rows_into_candidates, validate_candidate)

MAX_TABLE_DETECTION_PATHS = 20000

_NUM_TOKEN_RE = re.compile(r"^[\d,$%.()+-]+$")
_HAS_DIGIT_RE = re.compile(r"\d")
_HAS_LETTER_RE = re.compile(r"[a-zA-Z]")
_CURRENCY_RE = re.compile(r"^[$€£¥¢]+$")
_LEADER_RE = re.compile(r"^[*.]+$")
_YEAR_RE = re.compile(r"^(?:19|20)\d\d$")
_FOOTNOTE_MARKER_RE = re.compile(r"^\(\d\)$")
_TABLE_TITLE_RE = re.compile(r"^Table\s+\d+", re.I)


def _is_num_word(t: str) -> bool:
    return bool(_NUM_TOKEN_RE.match(t)) and bool(_HAS_DIGIT_RE.search(t))


# ---------------------------------------------------------------------------
# small geometry utilities (detectPdfTables.js:4059-4193)


def bbox_overlap(a, b) -> float:
    """Overlap area over the SMALLER box's area (:4080-4097)."""
    ol = max(a["left"], b["left"])
    ot = max(a["top"], b["top"])
    orr = min(a["right"], b["right"])
    ob = min(a["bottom"], b["bottom"])
    if orr <= ol or ob <= ot:
        return 0.0
    overlap = (orr - ol) * (ob - ot)
    a_area = (a["right"] - a["left"]) * (a["bottom"] - a["top"])
    b_area = (b["right"] - b["left"]) * (b["bottom"] - b["top"])
    min_area = min(a_area, b_area)
    return overlap / min_area if min_area > 0 else 0.0


def cluster_values(values, tolerance):
    """Proximity clusters keyed on the running MEDIAN; returns each
    cluster's median (:4179-4193)."""
    if not values:
        return []
    s = sorted(values)
    clusters = [[s[0]]]
    for v in s[1:]:
        last = clusters[-1]
        if v - last[len(last) // 2] <= tolerance:
            last.append(v)
        else:
            clusters.append([v])
    return [c[len(c) // 2] for c in clusters]


def cluster_values_local(values, tol):
    """Consecutive-gap clusters; returns each cluster's median
    (:2251-2274)."""
    if not values:
        return []
    s = sorted(values)
    clusters = [[s[0]]]
    for v in s[1:]:
        if v - clusters[-1][-1] <= tol:
            clusters[-1].append(v)
        else:
            clusters.append([v])
    return [c[len(c) // 2] for c in clusters]


def union_spans_fully(segs, left, right, tol) -> bool:
    """Sorted segments cover [left,right] with no gap > tol
    (:2276-2296)."""
    if not segs:
        return False
    if segs[0]["left"] > left + tol:
        return False
    furthest = segs[0]["right"]
    for s in segs[1:]:
        if s["left"] > furthest + tol:
            return False
        if s["right"] > furthest:
            furthest = s["right"]
    return furthest >= right - tol


def split_cluster_by_y_gap(cluster):
    """Recursive split at outlier y-gaps (>4-5× median) (:4099-4137)."""
    s = sorted(cluster, key=lambda h: h["y"])
    uniq = []
    for i, h in enumerate(s):
        if i == 0 or h["y"] - s[i - 1]["y"] > 2:
            uniq.append((h["y"], i))
    if len(uniq) < 2:
        return [cluster]
    gaps = [(uniq[i][0] - uniq[i - 1][0], uniq[i][1])
            for i in range(1, len(uniq))]
    sorted_gaps = sorted(gaps, key=lambda g: g[0])
    median_gap = sorted_gaps[(len(sorted_gaps) - 1) // 2][0]
    max_gap, max_idx = sorted_gaps[-1]
    limit = 4 if len(uniq) >= 10 else 5
    if median_gap <= 0 or max_gap <= median_gap * limit:
        return [cluster]
    return (split_cluster_by_y_gap(s[:max_idx])
            + split_cluster_by_y_gap(s[max_idx:]))


def cluster_hlines_by_x_extent(hlines):
    """Cluster hLines by >50% x-overlap against the cluster's union
    extent, or adjacency (gap < 15) (:4139-4177)."""
    clusters = []
    for hl in hlines:
        for c in clusters:
            ol = max(hl["left"], c["left"])
            orr = min(hl["right"], c["right"])
            overlap = max(0.0, orr - ol)
            min_w = min(hl["right"] - hl["left"], c["right"] - c["left"])
            gap = ol - orr
            if (min_w > 0 and overlap / min_w > 0.5) or (0 <= gap < 15):
                c["lines"].append(hl)
                c["left"] = min(c["left"], hl["left"])
                c["right"] = max(c["right"], hl["right"])
                break
        else:
            clusters.append({"lines": [hl], "left": hl["left"],
                             "right": hl["right"]})
    return [c["lines"] for c in clusters]


def _group_by_position(items, key, tol):
    """First-member proximity grouping (:1865-1882)."""
    groups = []
    for item in items:
        for g in groups:
            if abs(item[key] - g[0][key]) <= tol:
                g.append(item)
                break
        else:
            groups.append([item])
    return groups


def merge_collinear_segments(segments, pos_key, start_key, end_key,
                             tolerance, gap_tolerance=None):
    """Merge same-position segments along the extent axis, keeping the
    pre-merge parts in ``"segments"`` — the segmented-hline detector's
    column evidence (:1717-1782)."""
    extent_gap = gap_tolerance if gap_tolerance is not None else tolerance
    if not segments:
        return segments
    groups = []
    for seg in segments:
        for g in groups:
            if abs(seg[pos_key] - g["pos"]) <= tolerance:
                g["segs"].append(seg)
                break
        else:
            groups.append({"pos": seg[pos_key], "segs": [seg]})
    result = []
    for g in groups:
        g["segs"].sort(key=lambda s: s[start_key])
        current = dict(g["segs"][0])
        parts = [{start_key: current[start_key], end_key: current[end_key]}]
        for seg in g["segs"][1:]:
            if seg[start_key] <= current[end_key] + extent_gap:
                if seg[end_key] > current[end_key]:
                    current[end_key] = seg[end_key]
                parts.append({start_key: seg[start_key],
                              end_key: seg[end_key]})
            else:
                current["segments"] = parts
                result.append(current)
                current = dict(seg)
                parts = [{start_key: seg[start_key],
                          end_key: seg[end_key]}]
        current["segments"] = parts
        result.append(current)
    return result


def compute_bbox_from_line_indices(indices, lines):
    return {
        "left": min(lines[i].bbox.left for i in indices),
        "top": min(lines[i].bbox.top for i in indices),
        "right": max(lines[i].bbox.right for i in indices),
        "bottom": max(lines[i].bbox.bottom for i in indices),
    }


# ---------------------------------------------------------------------------
# path flattening adapter


def _flat_cmds(path):
    """Our PaintedPath ``(op, pts)`` commands → the reference's flat
    ``{type, x, y}`` stream (curves keep their endpoint — table
    classification only reads M/L/Z and bbox extents)."""
    out = []
    for op, pts in path.commands:
        if op == "Z":
            out.append(("Z", 0.0, 0.0))
        elif op == "C":
            # the reference's bbox loop reads only cmd.x/cmd.y (the
            # curve ENDPOINT), so control points are dropped here too
            out.append(("C", pts[-1][0], pts[-1][1]))
        else:
            for p in pts:
                out.append((op, p[0], p[1]))
    return out


# ---------------------------------------------------------------------------
# classifyPaths (:1139-1540)


def _is_achromatic_color(color) -> bool:
    if not color:
        return True
    if len(color) == 1:
        return True
    if len(color) == 3:
        return max(color) - min(color) < 0.15
    if len(color) == 4:
        return color[0] < 0.15 and color[1] < 0.15 and color[2] < 0.15
    return True


def _is_path_achromatic(path) -> bool:
    return _is_achromatic_color(path.stroke_color if path.stroke
                                else path.fill_color)


def _is_row_band_color(color) -> bool:
    if _is_achromatic_color(color):
        return True
    if not color:
        return False
    if len(color) == 3:
        return color[0] >= 0.5 and color[1] >= 0.5 and color[2] >= 0.5
    return False


def classify_paths(paths, scale, visual_height_pts, page):
    """Paths → merged hLines (with segments), merged vLines,
    filledRects, headerFills — display-pixel space (:1139-1540)."""
    page_height = page.height
    line_heights = sorted(
        (ln.bbox.bottom - ln.bbox.top) / scale
        for ln in page.lines
        if 2 < (ln.bbox.bottom - ln.bbox.top) / scale < 100)
    min_hline_w_pts = (line_heights[len(line_heights) // 2]
                       if line_heights else 30)

    # Pre-pass: stroked rectangles that TILE with a neighbor (:1184-1225).
    tiling = set()
    rect_bounds = []
    flats = [(_flat_cmds(p), p) for p in paths]
    for pi, (cmds, path) in enumerate(flats):
        if not path.stroke:
            continue
        if len(cmds) != 5 or cmds[0][0] != "M" or cmds[4][0] != "Z":
            continue
        xs = [c[1] for c in cmds if c[0] != "Z"]
        ys = [c[2] for c in cmds if c[0] != "Z"]
        if max(xs) - min(xs) > 10 and max(ys) - min(ys) > 5:
            rect_bounds.append({"idx": pi, "left": min(xs),
                                "right": max(xs), "top": min(ys),
                                "bottom": max(ys)})
    for i in range(len(rect_bounds)):
        a = rect_bounds[i]
        # the reference skips rects already marked tiling, so a chain
        # A-B-C marks only {A,B} — the B-C pair is never examined
        # (detectPdfTables.js:1210)
        if a["idx"] in tiling:
            continue
        for j in range(i + 1, len(rect_bounds)):
            b = rect_bounds[j]
            x_ov = min(a["right"], b["right"]) - max(a["left"], b["left"])
            y_ov = min(a["bottom"], b["bottom"]) - max(a["top"], b["top"])
            shared_h = x_ov > 5 and (abs(a["top"] - b["bottom"]) < 2
                                     or abs(a["bottom"] - b["top"]) < 2)
            shared_v = y_ov > 5 and (abs(a["left"] - b["right"]) < 2
                                     or abs(a["right"] - b["left"]) < 2)
            if shared_h or shared_v:
                tiling.add(a["idx"])
                tiling.add(b["idx"])

    h_lines = []
    v_lines = []
    filled_rects = []
    header_fills = []

    def emit_h(x1, y1, x2, y2):
        seg_y = (visual_height_pts - (y1 + y2) / 2) * scale
        if seg_y < page_height * 0.05 or seg_y > page_height * 0.95:
            return
        h_lines.append({"left": min(x1, x2) * scale,
                        "right": max(x1, x2) * scale, "y": seg_y})

    def emit_v(x1, y1, x2, y2):
        top = (visual_height_pts - max(y1, y2)) * scale
        bot = (visual_height_pts - min(y1, y2)) * scale
        if bot - top > page_height * 0.8:
            return
        v_lines.append({"top": top, "bottom": bot,
                        "x": (x1 + x2) / 2 * scale})

    for pi, (cmds, path) in enumerate(flats):
        if not path.fill and not path.stroke:
            continue
        pts = [(c[1], c[2]) for c in cmds if c[0] != "Z"]
        if not pts:
            continue
        min_x = min(p[0] for p in pts)
        max_x = max(p[0] for p in pts)
        min_y = min(p[1] for p in pts)
        max_y = max(p[1] for p in pts)
        w = max_x - min_x
        h = max_y - min_y

        # Many-M-L stroked grids decompose into per-segment lines
        # (:1253-1293).
        if path.stroke and len(cmds) >= 4:
            ml = sum(1 for k in range(len(cmds) - 1)
                     if cmds[k][0] == "M" and cmds[k + 1][0] == "L")
            if ml >= 6 and _is_path_achromatic(path):
                for k in range(len(cmds) - 1):
                    if cmds[k][0] not in ("M", "L"):
                        continue
                    if cmds[k + 1][0] != "L":
                        continue
                    x1, y1 = cmds[k][1], cmds[k][2]
                    x2, y2 = cmds[k + 1][1], cmds[k + 1][2]
                    seg_w = abs(x2 - x1)
                    seg_h = abs(y2 - y1)
                    if seg_h < 2 and seg_w >= min_hline_w_pts:
                        emit_h(x1, y1, x2, y2)
                    elif seg_w < 2 and seg_h > 10:
                        emit_v(x1, y1, x2, y2)
                continue

        # Batched fills decompose into per-cell FilledRects (:1297-1352).
        if path.fill and len(cmds) >= 10 \
                and _is_row_band_color(path.fill_color):
            sub_rects = []
            k = 0
            while k + 4 < len(cmds):
                if cmds[k][0] != "M" or cmds[k + 1][0] != "L" \
                        or cmds[k + 2][0] != "L" or cmds[k + 3][0] != "L" \
                        or cmds[k + 4][0] != "Z":
                    k += 1
                    continue
                p0, p1, p2, p3 = (cmds[k + o] for o in range(4))
                tol = 0.01
                horiz = (abs(p0[2] - p1[2]) < tol
                         and abs(p2[2] - p3[2]) < tol
                         and abs(p0[1] - p3[1]) < tol
                         and abs(p1[1] - p2[1]) < tol)
                vert = (abs(p0[1] - p1[1]) < tol
                        and abs(p2[1] - p3[1]) < tol
                        and abs(p0[2] - p3[2]) < tol
                        and abs(p1[2] - p2[2]) < tol)
                if not horiz and not vert:
                    k += 1
                    continue
                xs = [p0[1], p1[1], p2[1], p3[1]]
                ys = [p0[2], p1[2], p2[2], p3[2]]
                sub_rects.append((min(xs), min(ys), max(xs), max(ys)))
                k += 5
            if len(sub_rects) >= 2:
                for (sx0, sy0, sx1, sy1) in sub_rects:
                    sw = sx1 - sx0
                    sh = sy1 - sy0
                    if sw <= min_hline_w_pts:
                        continue
                    if sh <= min_hline_w_pts * 0.3 \
                            or sh >= min_hline_w_pts * 5:
                        continue
                    filled_rects.append({
                        "left": sx0 * scale,
                        "top": (visual_height_pts - sy1) * scale,
                        "right": sx1 * scale,
                        "bottom": (visual_height_pts - sy0) * scale,
                        "color": path.fill_color or []})
                continue

        # Tiling stroked rectangles decompose into 4 edges (:1356-1391).
        if path.stroke and len(cmds) == 5 \
                and cmds[0][0] == "M" and cmds[1][0] == "L" \
                and cmds[2][0] == "L" and cmds[3][0] == "L" \
                and cmds[4][0] == "Z" and w > 10 and h > 5 \
                and pi in tiling:
            corners = [(c[1], c[2]) for c in cmds[:4]]
            for k in range(4):
                x1, y1 = corners[k]
                x2, y2 = corners[(k + 1) % 4]
                seg_w = abs(x2 - x1)
                seg_h = abs(y2 - y1)
                if seg_h < 2 and seg_w >= min_hline_w_pts:
                    emit_h(x1, y1, x2, y2)
                elif seg_w < 2 and seg_h > 10:
                    emit_v(x1, y1, x2, y2)
            continue

        display_left = min_x * scale
        display_right = max_x * scale
        display_top = (visual_height_pts - max_y) * scale
        display_bottom = (visual_height_pts - min_y) * scale

        if h < 2 and w >= min_hline_w_pts and _is_path_achromatic(path):
            display_y = (visual_height_pts - (min_y + max_y) / 2) * scale
            if display_y < page_height * 0.05 \
                    or display_y > page_height * 0.95:
                continue
            h_lines.append({"left": display_left, "right": display_right,
                            "y": display_y})
        elif w < 2 and h > 10 and _is_path_achromatic(path):
            if display_bottom - display_top > page_height * 0.8:
                continue
            v_lines.append({"top": display_top, "bottom": display_bottom,
                            "x": (min_x + max_x) / 2 * scale})
        elif path.fill and w > min_hline_w_pts \
                and min_hline_w_pts * 0.5 < h < min_hline_w_pts * 5 \
                and _is_row_band_color(path.fill_color):
            filled_rects.append({
                "left": display_left, "top": display_top,
                "right": display_right, "bottom": display_bottom,
                "color": path.fill_color or []})
        elif path.fill and w > min_hline_w_pts * 5 \
                and min_hline_w_pts * 3 <= h < page_height * 0.3 \
                and _is_path_achromatic(path):
            # header background fill (:1423-1433); the JS compares h
            # (pts) against pageHeight (PX) * 0.3 — a mixed-unit quirk
            # kept verbatim for parity (it makes the bound ~4x looser
            # than a same-unit comparison would be)
            header_fills.append({
                "left": display_left, "top": display_top,
                "right": display_right, "bottom": display_bottom,
                "color": path.fill_color or []})

    _reconstitute_dashed_lines(paths, flats, h_lines, v_lines, scale,
                               visual_height_pts, page_height)

    # Ruling-row members are exempt from the underline filter (:1447-1473).
    ruling_members = set()
    y_groups = []
    for idx, hl in enumerate(h_lines):
        for g in y_groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["idx"].append(idx)
                g["y"] = sum(h_lines[i]["y"] for i in g["idx"]) \
                    / len(g["idx"])
                break
        else:
            y_groups.append({"y": hl["y"], "idx": [idx]})
    for g in y_groups:
        if len(g["idx"]) < 2:
            continue
        srt = sorted(g["idx"], key=lambda i: h_lines[i]["left"])
        disjoint = all(
            h_lines[srt[i]]["left"] >= h_lines[srt[i - 1]]["right"] - 1
            for i in range(1, len(srt)))
        if disjoint:
            ruling_members.update(srt)

    # Underline filter: hline matching a single text line's extent
    # directly above it (:1475-1492).
    filtered = []
    for idx, hl in enumerate(h_lines):
        if idx in ruling_members:
            filtered.append(hl)
            continue
        is_underline = False
        for ln in page.lines:
            if abs(hl["y"] - ln.bbox.bottom) > 5:
                continue
            if abs(hl["left"] - ln.bbox.left) < 10 \
                    and abs(hl["right"] - ln.bbox.right) < 10:
                is_underline = True
                break
        if not is_underline:
            filtered.append(hl)

    merged_h = merge_collinear_segments(filtered, "y", "left", "right",
                                        5, 10)
    merged_v = merge_collinear_segments(v_lines, "x", "top", "bottom",
                                        5, 10)
    return {"h_lines": merged_h, "v_lines": merged_v,
            "filled_rects": filled_rects, "header_fills": header_fills}


def _reconstitute_dashed_lines(paths, flats, h_lines, v_lines, scale,
                               visual_height_pts, page_height):
    """Dash trains (5+ collinear 2-cmd strokes, median gap < 2pt) →
    one reconstituted line (:1784-1862)."""
    v_cand = []
    h_cand = []
    for cmds, path in flats:
        if not path.stroke:
            continue
        if len(cmds) != 2 or cmds[0][0] != "M" or cmds[1][0] != "L":
            continue
        w = abs(cmds[1][1] - cmds[0][1])
        h = abs(cmds[1][2] - cmds[0][2])
        if w < 2 and 1 < h <= 10:
            v_cand.append({"x": (cmds[0][1] + cmds[1][1]) / 2,
                           "y1": min(cmds[0][2], cmds[1][2]),
                           "y2": max(cmds[0][2], cmds[1][2])})
        elif h < 2 and 1 < w <= 30:
            h_cand.append({"y": (cmds[0][2] + cmds[1][2]) / 2,
                           "x1": min(cmds[0][1], cmds[1][1]),
                           "x2": max(cmds[0][1], cmds[1][1])})

    if len(v_cand) >= 5:
        for group in _group_by_position(v_cand, "x", 2):
            if len(group) < 5:
                continue
            group.sort(key=lambda g: g["y1"])
            gaps = sorted(group[i]["y1"] - group[i - 1]["y2"]
                          for i in range(1, len(group)))
            med = gaps[len(gaps) // 2]
            if med < 0 or med >= 2:
                continue
            top = (visual_height_pts - group[-1]["y2"]) * scale
            bot = (visual_height_pts - group[0]["y1"]) * scale
            if bot - top > page_height * 0.8:
                continue
            v_lines.append({
                "top": top, "bottom": bot,
                "x": sum(g["x"] for g in group) / len(group) * scale})

    if len(h_cand) >= 5:
        for group in _group_by_position(h_cand, "y", 2):
            if len(group) < 5:
                continue
            group.sort(key=lambda g: g["x1"])
            gaps = sorted(group[i]["x1"] - group[i - 1]["x2"]
                          for i in range(1, len(group)))
            med = gaps[len(gaps) // 2]
            if med < 0 or med >= 2:
                continue
            y = (visual_height_pts
                 - sum(g["y"] for g in group) / len(group)) * scale
            if y < page_height * 0.05 or y > page_height * 0.95:
                continue
            h_lines.append({"left": group[0]["x1"] * scale,
                            "right": group[-1]["x2"] * scale, "y": y})


# ---------------------------------------------------------------------------
# strict grids (:2079-2409)


def extract_grid_segments(paths, flats, scale, visual_height_pts):
    """Looser extraction for strict-grid detection: EVERY stroked-rect
    edge decomposes (no tiling check), thin fills become single
    segments (:2079-2155)."""
    h_lines = []
    v_lines = []

    def add_seg(x1, y1, x2, y2):
        seg_w = abs(x2 - x1)
        seg_h = abs(y2 - y1)
        if seg_h < 2 and seg_w > 5:
            h_lines.append({
                "left": min(x1, x2) * scale,
                "right": max(x1, x2) * scale,
                "y": (visual_height_pts - (y1 + y2) / 2) * scale})
        elif seg_w < 2 and seg_h > 5:
            v_lines.append({
                "x": (x1 + x2) / 2 * scale,
                "top": (visual_height_pts - max(y1, y2)) * scale,
                "bottom": (visual_height_pts - min(y1, y2)) * scale})

    for cmds, path in flats:
        if not path.fill and not path.stroke:
            continue
        if path.stroke and len(cmds) == 5 \
                and cmds[0][0] == "M" and cmds[1][0] == "L" \
                and cmds[2][0] == "L" and cmds[3][0] == "L" \
                and cmds[4][0] == "Z":
            corners = [(c[1], c[2]) for c in cmds[:4]]
            for k in range(4):
                x1, y1 = corners[k]
                x2, y2 = corners[(k + 1) % 4]
                add_seg(x1, y1, x2, y2)
            continue
        if path.stroke:
            for k in range(len(cmds) - 1):
                if cmds[k][0] in ("M", "L") and cmds[k + 1][0] == "L":
                    add_seg(cmds[k][1], cmds[k][2],
                            cmds[k + 1][1], cmds[k + 1][2])
            continue
        if path.fill:
            pts = [(c[1], c[2]) for c in cmds if c[0] != "Z"]
            if not pts:
                continue
            min_x = min(p[0] for p in pts)
            max_x = max(p[0] for p in pts)
            min_y = min(p[1] for p in pts)
            max_y = max(p[1] for p in pts)
            w = max_x - min_x
            h = max_y - min_y
            if h < 5 and w > 5:
                add_seg(min_x, (min_y + max_y) / 2,
                        max_x, (min_y + max_y) / 2)
            elif w < 5 and h > 5:
                add_seg((min_x + max_x) / 2, min_y,
                        (min_x + max_x) / 2, max_y)
    return {"h_lines": h_lines, "v_lines": v_lines}


def try_detect_strict_grid(hs, vs, page):
    """Strict grid: outer border + closed strips + canonical column set
    (header subset allowed) → 'grid-strong' (:2298-2409)."""
    if len(hs) < 3:
        return None
    left = min(h["left"] for h in hs)
    right = max(h["right"] for h in hs)
    if right - left < page.width * 0.3:
        return None
    ys = cluster_values_local([h["y"] for h in hs], 5)
    if len(ys) < 3:
        return None
    min_y, max_y = ys[0], ys[-1]

    segs_by_y = {}
    for py in ys:
        segs = sorted(
            ({"left": h["left"], "right": h["right"]}
             for h in hs if abs(h["y"] - py) < 5),
            key=lambda s: s["left"])
        segs_by_y[py] = segs

    strips = []
    for i in range(len(ys) - 1):
        top, bot = ys[i], ys[i + 1]
        strip_vs = [v for v in vs
                    if v["top"] <= top + 10 and v["bottom"] >= bot - 10]
        xs = cluster_values_local([v["x"] for v in strip_vs], 10)
        if len(xs) < 2 or abs(xs[0] - left) > 15 \
                or abs(xs[-1] - right) > 15:
            return None
        if not union_spans_fully(segs_by_y[top], left, right, 15):
            return None
        if not union_spans_fully(segs_by_y[bot], left, right, 15):
            return None
        strips.append({"top": top, "bottom": bot, "xs": xs})
    if len(strips) < 2:
        return None

    max_cols = max(len(s["xs"]) for s in strips)
    data_strips = [s for s in strips if len(s["xs"]) == max_cols]
    if len(data_strips) < 2:
        return None
    canonical = data_strips[0]["xs"]
    for s in data_strips:
        if len(s["xs"]) != len(canonical):
            return None
        for a, b in zip(s["xs"], canonical):
            if abs(a - b) >= 10:
                return None
    for s in strips:
        if len(s["xs"]) == max_cols:
            continue
        for x in s["xs"]:
            if not any(abs(cx - x) < 10 for cx in canonical):
                return None

    col_separators = canonical[1:-1]
    bbox = {"left": left, "top": min_y - 5, "right": right,
            "bottom": max_y + 5}
    rows = []
    for strip in strips:
        idxs = [i for i, ln in enumerate(page.lines)
                if strip["top"] - 5 <= (ln.bbox.top + ln.bbox.bottom) / 2
                <= strip["bottom"] + 5
                and ln.bbox.left >= bbox["left"] - 10
                and ln.bbox.right <= bbox["right"] + 10]
        if not idxs:
            continue
        y_mean = sum(page.lines[i].bbox.top for i in idxs) / len(idxs)
        rows.append({"idx": idxs, "y": y_mean})
    if len(rows) < 2:
        return None
    return {"bbox": bbox, "rows": rows,
            "col_separators": list(col_separators),
            "h_lines": hs, "v_lines": vs, "method": "grid-strong"}


def detect_strict_grids(page, paths, flats, scale, visual_height_pts):
    """Connected components of grid segments → strict grids
    (:2169-2243)."""
    raw = extract_grid_segments(paths, flats, scale, visual_height_pts)
    h_lines = merge_collinear_segments(raw["h_lines"], "y", "left",
                                       "right", 5, 10)
    v_lines = merge_collinear_segments(raw["v_lines"], "x", "top",
                                       "bottom", 5, 10)
    if len(h_lines) < 3 or len(v_lines) < 2:
        return []

    TOL = 6
    n = len(h_lines) + len(v_lines)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for i, a in enumerate(h_lines):
        for j in range(i + 1, len(h_lines)):
            b = h_lines[j]
            if abs(a["y"] - b["y"]) <= TOL and \
                    min(a["right"], b["right"]) >= \
                    max(a["left"], b["left"]) - TOL:
                union(i, j)
        for j, v in enumerate(v_lines):
            if a["left"] - TOL <= v["x"] <= a["right"] + TOL \
                    and v["top"] - TOL <= a["y"] <= v["bottom"] + TOL:
                union(i, len(h_lines) + j)
    for i in range(len(v_lines)):
        a = v_lines[i]
        for j in range(i + 1, len(v_lines)):
            b = v_lines[j]
            if abs(a["x"] - b["x"]) <= TOL and \
                    min(a["bottom"], b["bottom"]) >= \
                    max(a["top"], b["top"]) - TOL:
                union(len(h_lines) + i, len(h_lines) + j)

    comps = {}
    for i in range(len(h_lines)):
        comps.setdefault(find(i), {"hs": [], "vs": []})["hs"].append(
            h_lines[i])
    for i in range(len(v_lines)):
        comps.setdefault(find(len(h_lines) + i),
                         {"hs": [], "vs": []})["vs"].append(v_lines[i])

    results = []
    for comp in comps.values():
        if len(comp["hs"]) < 3 or len(comp["vs"]) < 2:
            continue
        t = try_detect_strict_grid(comp["hs"], comp["vs"], page)
        if t:
            results.append(t)
    return results


# ---------------------------------------------------------------------------
# segmented-hline tables (:2411-2468, :3647-3772)


def detect_segmented_hline_grids(page, path_data):
    """hLine clusters without ≥3 region vLines → segmented tables
    (:2411-2445).  ``path_data`` is a classify_paths result (the JS
    re-runs classifyPaths here; we pass the shared one — identical
    inputs, identical output)."""
    if len(path_data["h_lines"]) < 3:
        return []
    processed = []
    for cluster in cluster_hlines_by_x_extent(path_data["h_lines"]):
        if len(cluster) < 3:
            continue
        for sub in split_cluster_by_y_gap(cluster):
            if len(sub) >= 3:
                processed.append(sub)
    tables = []
    for cluster in processed:
        c_left = min(h["left"] for h in cluster)
        c_right = max(h["right"] for h in cluster)
        c_top = min(h["y"] for h in cluster)
        c_bottom = max(h["y"] for h in cluster)
        region_vs = [v for v in path_data["v_lines"]
                     if c_left - 5 <= v["x"] <= c_right + 5
                     and v["top"] <= c_bottom + 5
                     and v["bottom"] >= c_top - 5]
        if len(region_vs) >= 3:
            continue
        tables.extend(detect_segmented_hline_tables(
            cluster, path_data["header_fills"], page))
    return tables


def detect_segmented_hline_tables(cluster, header_fills, page):
    """Break-pattern groups of segmented hlines → 'segmented-hline'
    tables (:3647-3772)."""
    row_breaks = []
    for hl in cluster:
        segs = hl.get("segments")
        if not segs or len(segs) < 2:
            continue
        s = sorted(segs, key=lambda x: x["left"])
        # Math.round is half-UP; Python's built-in round is banker's — a
        # .5 break point must land like the JS (found by fuzz seed 28).
        from ...functions.stats import js_round
        breaks = [js_round(s[i]["right"]) for i in range(len(s) - 1)]
        row_breaks.append({"y": hl["y"], "breaks": breaks,
                           "left": s[0]["left"], "right": s[-1]["right"],
                           "hl": hl})
    if len(row_breaks) < 3:
        return []

    break_groups = []
    for rb in row_breaks:
        for group in break_groups:
            ref = group[0]["breaks"]
            if len(ref) != len(rb["breaks"]):
                continue
            if all(abs(ref[j] - rb["breaks"][j]) <= 5
                   for j in range(len(ref))):
                group.append(rb)
                break
        else:
            break_groups.append([rb])

    results = []
    for group in break_groups:
        if len(group) < 3 or len(group[0]["breaks"]) < 2:
            continue
        n_breaks = len(group[0]["breaks"])
        col_separators = [
            sum(rb["breaks"][j] for rb in group) / len(group)
            for j in range(n_breaks)]
        g_left = min(rb["left"] for rb in group)
        g_right = max(rb["right"] for rb in group)
        g_top = min(rb["y"] for rb in group)
        g_bottom = max(rb["y"] for rb in group)
        if g_right - g_left < page.width * 0.3:
            continue
        group_hls = [rb["hl"] for rb in group]

        header_fill = None
        for fill in header_fills:
            if abs(fill["left"] - g_left) > 15:
                continue
            if abs(fill["right"] - g_right) > 15:
                continue
            if fill["bottom"] > g_top + 5:
                continue
            if fill["bottom"] < g_top - 200:
                continue
            header_fill = dict(fill)
            break

        typical_row_h = (g_bottom - g_top) / max(1, len(group) - 1)
        bbox_top = (header_fill["top"] - 5 if header_fill
                    else g_top - typical_row_h * 1.5)
        bbox = {"left": g_left, "top": max(0, bbox_top),
                "right": g_right, "bottom": g_bottom + 5}

        region_idx = [i for i, ln in enumerate(page.lines)
                      if ln.bbox.top >= bbox["top"] - 5
                      and ln.bbox.bottom <= bbox["bottom"] + 5
                      and ln.bbox.left >= bbox["left"] - 10
                      and ln.bbox.right <= bbox["right"] + 10]
        if len(region_idx) < 2:
            continue
        region_lines = [page.lines[i] for i in region_idx]
        rows = [{"idx": [region_idx[j] for j in rg["idx"]], "y": rg["y"]}
                for rg in group_lines_into_rows(region_lines)]
        if len(rows) < 2:
            continue
        if sum(1 for r in rows if len(r["idx"]) >= 2) < 2:
            continue
        results.append({"bbox": bbox, "rows": rows,
                        "col_separators": sorted(col_separators),
                        "h_lines": group_hls, "v_lines": [],
                        "method": "segmented-hline",
                        "header_fill": header_fill})
    return results


# ---------------------------------------------------------------------------
# header-rule tables (:3354-3600) + rule clusters (:3602-3645)


def detect_header_rule_tables(h_lines, page):
    """Ruling rows (3+ disjoint rules, ≥30% width) → header-rule tables
    with up-header / down-data scans and numeric validation
    (:3354-3600)."""
    lines = page.lines
    if not lines:
        return []
    y_groups = []
    for hl in h_lines:
        for g in y_groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["lines"].append(hl)
                g["y"] = sum(x["y"] for x in g["lines"]) / len(g["lines"])
                break
        else:
            y_groups.append({"y": hl["y"], "lines": [hl]})

    ruling_rows = []
    for g in y_groups:
        if len(g["lines"]) < 3:
            continue
        s = sorted(g["lines"], key=lambda x: x["left"])
        if any(s[i]["left"] < s[i - 1]["right"] - 1
               for i in range(1, len(s))):
            continue
        if s[-1]["right"] - s[0]["left"] < page.width * 0.3:
            continue
        ruling_rows.append({
            "y": g["y"],
            "cols": [{"left": x["left"], "right": x["right"]} for x in s],
            "h_lines": s})
    if not ruling_rows:
        return []
    ruling_rows.sort(key=lambda r: r["y"])

    def subset_geom(sub, primary, tol):
        return all(any(abs(c["left"] - pc["left"]) < tol
                       and abs(c["right"] - pc["right"]) < tol
                       for pc in primary["cols"]) for c in sub["cols"])

    primary_idx = []
    for ri, rr in enumerate(ruling_rows):
        if not any(subset_geom(rr, ruling_rows[pi], 5)
                   for pi in primary_idx):
            primary_idx.append(ri)

    primaries = []
    for ri in primary_idx:
        rule = ruling_rows[ri]
        rl = rule["cols"][0]["left"]
        rr_ = rule["cols"][-1]["right"]
        primaries.append({"rule": rule, "rule_left": rl,
                          "rule_right": rr_,
                          "x_slack": max(20, (rr_ - rl) * 0.02),
                          "header_top": rule["y"], "header_idx": []})

    # Pass 1: upward header scan (:3440-3474).
    for pii, p in enumerate(primaries):
        upper = primaries[pii - 1]["rule"]["y"] + 5 if pii > 0 else 0
        above = [(i, ln) for i, ln in enumerate(lines)
                 if ln.bbox.bottom <= p["rule"]["y"]
                 and ln.bbox.bottom >= upper
                 and ln.bbox.left >= p["rule_left"] - p["x_slack"]
                 and ln.bbox.right <= p["rule_right"] + p["x_slack"]]
        above.sort(key=lambda t: -t[1].bbox.top)
        tops = sorted((ln.bbox.top for _, ln in above[:8]), reverse=True)
        spac = sorted(tops[i - 1] - tops[i] for i in range(1, len(tops)))
        med = spac[len(spac) // 2] if spac else 30
        gap_limit = max(med * 1.5, 45)
        prev_top = p["rule"]["y"]
        for i, ln in above:
            if prev_top - ln.bbox.top > gap_limit:
                break
            p["header_idx"].append(i)
            p["header_top"] = ln.bbox.top
            prev_top = ln.bbox.top

    # Pass 2: downward data scan + numeric validation (:3476-3598).
    results = []
    for pii, p in enumerate(primaries):
        lower = (primaries[pii + 1]["header_top"] - 1
                 if pii + 1 < len(primaries) else page.height)
        below = [(i, ln) for i, ln in enumerate(lines)
                 if p["rule"]["y"] <= ln.bbox.top <= lower
                 and ln.bbox.left >= p["rule_left"] - p["x_slack"]
                 and ln.bbox.right <= p["rule_right"] + p["x_slack"]]
        below.sort(key=lambda t: t[1].bbox.top)
        if len(below) < 2:
            continue
        early_n = min(len(below) - 1, 5)
        early = sorted(below[i][1].bbox.top - below[i - 1][1].bbox.top
                       for i in range(1, early_n + 1))
        med = early[len(early) // 2] if early else 30
        data_gap_limit = max(med * 2.5, 80)
        data_idx = []
        prev_top = p["rule"]["y"]
        for i, ln in below:
            if data_idx and ln.bbox.top - prev_top > data_gap_limit:
                break
            data_idx.append(i)
            prev_top = ln.bbox.top
        if len(data_idx) < 2:
            continue
        data_idx.extend(p["header_idx"])

        cols = p["rule"]["cols"]
        col_seps = [(cols[i - 1]["right"] + cols[i]["left"]) / 2
                    for i in range(1, len(cols))]
        bbox_bottom = max([p["rule"]["y"]]
                          + [lines[i].bbox.bottom for i in data_idx])
        region_lines = [lines[i] for i in data_idx]
        rows = [{"idx": [data_idx[j] for j in rg["idx"]], "y": rg["y"]}
                for rg in group_lines_into_rows(region_lines)]
        if len(rows) < 3:
            continue

        bounds = [p["rule_left"], *col_seps, p["rule_right"]]
        n_cols = len(bounds) - 1
        col_hits = [0] * n_cols
        multi = 0
        for row in rows:
            hit = set()
            for j in row["idx"]:
                for w in lines[j].words:
                    if not _is_num_word(w.text):
                        continue
                    cx = (w.bbox.left + w.bbox.right) / 2
                    for ci in range(n_cols):
                        if bounds[ci] <= cx < bounds[ci + 1]:
                            hit.add(ci)
                            break
            if len(hit) >= 2:
                multi += 1
            for ci in hit:
                col_hits[ci] += 1
        if multi < 5:
            continue
        if not any(col_hits[ci] >= len(rows) * 0.5
                   for ci in range(1, n_cols)):
            continue
        results.append({
            "bbox": {"left": p["rule_left"], "right": p["rule_right"],
                     "top": p["header_top"], "bottom": bbox_bottom},
            "rows": rows, "col_separators": col_seps,
            "h_lines": p["rule"]["h_lines"], "v_lines": [],
            "method": "header-rule"})
    return results


def find_disjoint_rule_clusters(h_lines, page):
    """y-bands of ≥2 disjoint rules spanning ≥20% width (:3602-3645)."""
    y_groups = []
    for hl in h_lines:
        for g in y_groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["lines"].append(hl)
                g["y"] = sum(x["y"] for x in g["lines"]) / len(g["lines"])
                break
        else:
            y_groups.append({"y": hl["y"], "lines": [hl]})
    clusters = []
    for g in y_groups:
        if len(g["lines"]) < 2:
            continue
        s = sorted(g["lines"], key=lambda x: x["left"])
        if any(s[i]["left"] < s[i - 1]["right"] - 1
               for i in range(1, len(s))):
            continue
        if s[-1]["right"] - s[0]["left"] < page.width * 0.2:
            continue
        clusters.append({"y": g["y"],
                         "cols": [{"left": x["left"], "right": x["right"]}
                                  for x in s]})
    return clusters


# ---------------------------------------------------------------------------
# row-band structure (:1542-1715) + candidates (:774-880)


def extract_row_band_structure(filled_rects):
    """Filled rects → row-band regions with dominant-anchor column
    evidence (:1542-1715)."""
    if not filled_rects or len(filled_rects) < 3:
        return []
    y_groups = []
    for f in filled_rects:
        for g in y_groups:
            if abs(g["top"] - f["top"]) < 2 \
                    and abs(g["bottom"] - f["bottom"]) < 2:
                g["items"].append(f)
                break
        else:
            y_groups.append({"top": f["top"], "bottom": f["bottom"],
                             "items": [f]})

    row_candidates = []
    for g in y_groups:
        g["items"].sort(key=lambda f: f["left"])
        ranges = []
        cells = []
        for f in g["items"]:
            cells.append({"left": f["left"], "right": f["right"]})
            if ranges and f["left"] <= ranges[-1]["right"] + 0.5:
                ranges[-1]["right"] = max(ranges[-1]["right"], f["right"])
            else:
                ranges.append({"left": f["left"], "right": f["right"]})
        row_candidates.append({"top": g["top"], "bottom": g["bottom"],
                               "ranges": ranges, "cells": cells})

    bands = [c for c in row_candidates
             if c["ranges"]
             and c["ranges"][-1]["right"] - c["ranges"][0]["left"] > 50]
    if len(bands) < 3:
        return []
    bands.sort(key=lambda b: b["top"])

    regions = []
    for b in bands:
        b_left = b["ranges"][0]["left"]
        b_right = b["ranges"][-1]["right"]
        for r in regions:
            last = r[-1]
            gap = b["top"] - last["bottom"]
            vert_close = gap <= max(
                (last["bottom"] - last["top"]) * 2, 10)
            h_overlap = (b_right > last["ranges"][0]["left"]
                         and b_left < last["ranges"][-1]["right"])
            if vert_close and h_overlap:
                r.append(b)
                break
        else:
            regions.append([b])

    results = []
    for region in regions:
        if len(region) < 3:
            continue
        anchor_tol = 3

        def cluster(values):
            values.sort()
            clusters = []
            for v in values:
                if clusters and v - clusters[-1]["mean"] < anchor_tol:
                    clusters[-1]["values"].append(v)
                    clusters[-1]["mean"] = (
                        sum(clusters[-1]["values"])
                        / len(clusters[-1]["values"]))
                else:
                    clusters.append({"values": [v], "mean": v})
            return clusters

        lefts = [c["left"] for b in region for c in b["cells"]]
        rights = [c["right"] for b in region for c in b["cells"]]
        min_count = -(-len(region) // 2)
        dom_l = sorted(c["mean"] for c in cluster(lefts)
                       if len(c["values"]) >= min_count)
        dom_r = sorted(c["mean"] for c in cluster(rights)
                       if len(c["values"]) >= min_count)
        if not dom_l:
            continue
        col_xs = []
        for i in range(len(dom_l) - 1):
            if i < len(dom_r):
                col_xs.append((dom_r[i] + dom_l[i + 1]) / 2)
        results.append({
            "left": dom_l[0],
            "right": dom_r[-1] if dom_r else dom_l[-1],
            "top": region[0]["top"], "bottom": region[-1]["bottom"],
            "col_xs": col_xs,
            "row_ys": [{"top": b["top"], "bottom": b["bottom"]}
                       for b in region]})
    return results


def collect_rows_in_bbox(bbox, lines):
    """(:774-794)"""
    region_idx = [i for i, ln in enumerate(lines)
                  if ln.bbox.top >= bbox["top"] - 5
                  and ln.bbox.bottom <= bbox["bottom"] + 5
                  and ln.bbox.left >= bbox["left"] - 10
                  and ln.bbox.right <= bbox["right"] + 10]
    region_lines = [lines[i] for i in region_idx]
    return [{"idx": [region_idx[j] for j in rg["idx"]], "y": rg["y"]}
            for rg in group_lines_into_rows(region_lines)]


def make_row_band_candidates(rbr, base_cand, lines):
    """Synthesized row-band candidates, split at big y-gaps
    (:802-880)."""
    left = (min(base_cand["bbox"]["left"], rbr["left"]) if base_cand
            else rbr["left"])
    right = (max(base_cand["bbox"]["right"], rbr["right"]) if base_cand
             else rbr["right"])
    bbox = {"left": left, "top": rbr["top"], "right": right,
            "bottom": rbr["bottom"]}
    rows = collect_rows_in_bbox(bbox, lines)

    def mk(bb, rws):
        return {"bbox": bb, "rows": rws, "col_separators": [],
                "h_lines": [], "v_lines": [], "method": "row-band",
                "row_band_region": rbr}

    if len(rows) < 3:
        return [mk(bbox, rows)]
    s = sorted(rows, key=lambda r: r["y"])
    spacings = [s[i]["y"] - s[i - 1]["y"] for i in range(1, len(s))]
    med = sorted(spacings)[len(spacings) // 2]
    groups = [{"start": 0, "end": 0}]
    for i in range(1, len(s)):
        if spacings[i - 1] > med * 2 and spacings[i - 1] > 50:
            groups.append({"start": i, "end": i})
        else:
            groups[-1]["end"] = i
    if len(groups) == 1:
        return [mk(bbox, rows)]
    out = []
    for g in groups:
        if g["end"] - g["start"] < 2:
            continue
        g_rows = s[g["start"]:g["end"] + 1]
        g_bottom = max(lines[li].bbox.bottom
                       for r in g_rows for li in r["idx"])
        sub = {"left": left,
               "top": bbox["top"] if g["start"] == 0
               else g_rows[0]["y"],
               "right": right,
               "bottom": bbox["bottom"] if g["end"] == len(s) - 1
               else g_bottom + 5}
        out.append(mk(sub, collect_rows_in_bbox(sub, lines)))
    return out


def correlate_paths_with_candidate(candidate, path_data):
    """(:1884-1911)"""
    b = candidate["bbox"]
    for hl in path_data["h_lines"]:
        if hl["y"] < b["top"] - 15 or hl["y"] > b["bottom"] + 15:
            continue
        overlap = max(0.0, min(hl["right"], b["right"])
                      - max(hl["left"], b["left"]))
        w = hl["right"] - hl["left"]
        if w > 0 and overlap / w > 0.3:
            candidate["h_lines"].append(hl)
    for vl in path_data["v_lines"]:
        if vl["x"] < b["left"] - 5 or vl["x"] > b["right"] + 5:
            continue
        ot = max(vl["top"], b["top"])
        ob = min(vl["bottom"], b["bottom"])
        if ob - ot > (b["bottom"] - b["top"]) * 0.2:
            candidate["v_lines"].append(vl)


# ---------------------------------------------------------------------------
# header detection adapter + column structure (:2470-3093)


class _Box:
    __slots__ = ("left", "top", "right", "bottom")

    def __init__(self, d):
        self.left = d["left"]
        self.top = d["top"]
        self.right = d["right"]
        self.bottom = d["bottom"]


def _detect_headers(table, lines):
    from ..text_tables import detect_headers
    return detect_headers({"rows": table["rows"],
                           "bbox": _Box(table["bbox"])}, lines)


def extract_structure(table, lines):
    """Column/row structure for a validated table (:2728-3093): vLine
    columns, strong-header separators, word clustering with header-row
    exclusion and low-coverage pruning, header/fill overrides."""
    from ..tables import calc_column_bounds

    if table["col_separators"]:
        return

    # vLine-based columns (:2733-2741).
    if len(table["v_lines"]) >= 2:
        xs = cluster_values([v["x"] for v in table["v_lines"]], 10)
        interior = [x for x in xs
                    if table["bbox"]["left"] + 5 < x
                    < table["bbox"]["right"] - 5]
        if interior:
            table["col_separators"] = sorted(interior)
            return

    # Strong-header separators, decision deferred (:2743-2781).
    header_seps = None
    headers = table.get("headers")
    if headers and headers["confidence"] == "strong" \
            and len(headers["column_anchors"]) >= 2:
        anchors = sorted(headers["column_anchors"])
        seps = [(anchors[i] + anchors[i + 1]) / 2
                for i in range(len(anchors) - 1)]
        left_guard = anchors[0] - 10
        has_label = any(lines[i].bbox.right < left_guard
                        for r in table["rows"] for i in r["idx"])
        if has_label:
            half = (anchors[1] - anchors[0]) / 2
            label_sep = anchors[0] - half
            if label_sep > table["bbox"]["left"] + 5 \
                    and anchors[0] - table["bbox"]["left"] > half * 2:
                seps.insert(0, label_sep)
        header_seps = sorted(seps)

    cand_width = table["bbox"]["right"] - table["bbox"]["left"]

    def is_narrative_line(line):
        total = numeric = 0
        for w in line.words:
            if _LEADER_RE.match(w.text):
                continue
            total += 1
            if _is_num_word(w.text) or _CURRENCY_RE.match(w.text):
                numeric += 1
        if total <= 6:
            return False
        return numeric / total < 0.5

    def is_data_value_word(t):
        return _is_num_word(t) and not _YEAR_RE.match(t) \
            and not _FOOTNOTE_MARKER_RE.match(t)

    # First data row: ≥2 non-year data values or a currency symbol
    # (:2847-2864); rows above it are headers, excluded from clustering.
    first_data_row = -1
    for ri, r in enumerate(table["rows"]):
        data_count = 0
        has_currency = False
        for i in r["idx"]:
            for w in lines[i].words:
                if is_data_value_word(w.text):
                    data_count += 1
                if _CURRENCY_RE.match(w.text):
                    has_currency = True
        if data_count >= 2 or has_currency:
            first_data_row = ri
            break

    all_bboxes = []
    for ri, r in enumerate(table["rows"]):
        if 0 <= first_data_row and ri < first_data_row:
            continue

        def line_is_pure_text(line):
            for w in line.words:
                if _is_num_word(w.text) or _CURRENCY_RE.match(w.text):
                    return False
            return True

        has_narr = False
        for i in r["idx"]:
            line = lines[i]
            lw = line.bbox.right - line.bbox.left
            if cand_width > 0 and lw > cand_width * 0.5 \
                    and is_narrative_line(line):
                # pure-text wide segment next to a numeric sibling is a
                # merged label, not prose (:2884-2898)
                if len(r["idx"]) > 1 and line_is_pure_text(line):
                    other_numeric = any(
                        _is_num_word(w.text) or _CURRENCY_RE.match(w.text)
                        for j in r["idx"] if j != i
                        for w in lines[j].words)
                    if other_numeric:
                        continue
                has_narr = True
                break
        if has_narr:
            continue

        row_words = []
        h_sum = h_count = 0
        for i in r["idx"]:
            line = lines[i]
            lh = line.bbox.bottom - line.bbox.top
            if lh > 0:
                h_sum += lh
                h_count += 1
            row_words.extend(line.words)
        row_words.sort(key=lambda w: w.bbox.left)
        avg_h = h_sum / h_count if h_count else 20
        gap_threshold = avg_h * 0.4

        def expand(box, b):
            return {"left": min(box["left"], b.left),
                    "top": min(box["top"], b.top),
                    "right": max(box["right"], b.right),
                    "bottom": max(box["bottom"], b.bottom)}

        def box_of(w):
            return {"left": w.bbox.left, "top": w.bbox.top,
                    "right": w.bbox.right, "bottom": w.bbox.bottom}

        w_i = 0
        while w_i < len(row_words):
            if _CURRENCY_RE.match(row_words[w_i].text):
                cur = box_of(row_words[w_i])
                j = w_i + 1
                while j < len(row_words) \
                        and _CURRENCY_RE.match(row_words[j].text):
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                if j < len(row_words):
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                all_bboxes.append(cur)
                w_i = j
            else:
                cur = box_of(row_words[w_i])
                cur_digit = bool(
                    _HAS_DIGIT_RE.search(row_words[w_i].text))
                j = w_i + 1
                while j < len(row_words) \
                        and not _CURRENCY_RE.match(row_words[j].text):
                    t = row_words[j].text
                    if len(t) >= 3 and _LEADER_RE.match(t):
                        cur = expand(cur, row_words[j].bbox)
                        j += 1
                        continue
                    if cur_digit or _HAS_DIGIT_RE.search(t):
                        break
                    if row_words[j].bbox.left - cur["right"] \
                            > gap_threshold:
                        break
                    cur = expand(cur, row_words[j].bbox)
                    j += 1
                all_bboxes.append(cur)
                w_i = j

    if len(all_bboxes) >= 2:
        from ...model import BBox
        bounds = [list(b) for b in calc_column_bounds(
            [BBox(b["left"], b["top"], b["right"], b["bottom"])
             for b in all_bboxes])]

        # Low-coverage pruning with header-row counting (:2958-3034).
        if len(bounds) > 2:
            y_tol = 10
            y_rows = []
            for b in all_bboxes:
                for row in y_rows:
                    if abs(b["top"] - row["y"]) < y_tol:
                        row["boxes"].append(b)
                        break
                else:
                    y_rows.append({"y": b["top"], "boxes": [b]})
            header_y_rows = []

            def add_header_word(w):
                for row in header_y_rows:
                    if abs(w.bbox.top - row["y"]) < y_tol:
                        row["boxes"].append(
                            {"left": w.bbox.left, "right": w.bbox.right})
                        break
                else:
                    header_y_rows.append(
                        {"y": w.bbox.top,
                         "boxes": [{"left": w.bbox.left,
                                    "right": w.bbox.right}]})

            if first_data_row > 0:
                for ri in range(first_data_row):
                    if len(table["rows"][ri]["idx"]) < 2:
                        continue
                    for i in table["rows"][ri]["idx"]:
                        for w in lines[i].words:
                            add_header_word(w)
            if headers and headers.get("band_top") is not None \
                    and headers.get("band_bottom") is not None:
                h_top = headers["band_top"]
                h_bottom = headers["band_bottom"]
                for line in lines:
                    if not (h_top <= line.bbox.top < h_bottom):
                        continue
                    if line.bbox.top >= table["bbox"]["top"]:
                        continue
                    if line.bbox.right < table["bbox"]["left"] \
                            or line.bbox.left > table["bbox"]["right"]:
                        continue
                    for w in line.words:
                        add_header_word(w)

            floor = max(2, len(y_rows) * 0.25)

            def col_contains(col, b):
                c = (b["left"] + b["right"]) / 2
                return col[0] <= c <= col[1]

            c = len(bounds) - 1
            while c >= 0:
                if len(bounds) <= 2:
                    break
                data_here = sum(
                    1 for row in y_rows
                    if any(col_contains(bounds[c], b)
                           for b in row["boxes"]))
                header_here = sum(
                    1 for row in header_y_rows
                    if any(col_contains(bounds[c], b)
                           for b in row["boxes"]))
                if data_here == 0 or data_here + header_here < floor:
                    if c == 0:
                        bounds[1][0] = bounds[0][0]
                    else:
                        bounds[c - 1][1] = bounds[c][1]
                    bounds.pop(c)
                c -= 1

        table["col_separators"] = [
            (bounds[i][1] + bounds[i + 1][0]) / 2
            for i in range(len(bounds) - 1)]

    # Header-separator overrides (:3044-3063).
    if header_seps is not None:
        seps = table["col_separators"]
        sparse_under = len(header_seps) > len(seps) and len(seps) < 3
        over_split = (len(header_seps) < len(seps)
                      and len(header_seps) >= 2
                      and len(header_seps) <= len(seps) * 0.5)
        row_band_over = (table["method"] == "row-band"
                         and len(header_seps) >= 2
                         and len(header_seps) < len(seps))
        if sparse_under or over_split or row_band_over:
            table["col_separators"] = header_seps

    # Fill-anchor override on narrow text outliers (:3065-3092).
    rbr = table.get("row_band_region")
    if rbr and rbr["col_xs"] and table["col_separators"]:
        fill_seps = sorted(rbr["col_xs"])
        widths = []
        prev = table["bbox"]["left"]
        for s in table["col_separators"]:
            widths.append(s - prev)
            prev = s
        widths.append(table["bbox"]["right"] - prev)
        widths.sort()
        median_w = widths[len(widths) // 2]
        if median_w > 0 and widths[0] < median_w * 0.3 \
                and len(fill_seps) + 1 >= 3:
            table["col_separators"] = fill_seps


def refine_table_top(table, lines, top_floor=0.0):
    """Header-aware top-boundary refinement (:3095-3352)."""
    rows = table["rows"]
    if not rows:
        return
    headers = table.get("headers")
    if headers and headers["confidence"] == "strong":
        strong_top = max(top_floor, headers["band_top"] - 5)
        first_data_y = sorted(rows, key=lambda r: r["y"])[0]["y"]
        for line in lines:
            if line.bbox.top < strong_top \
                    or line.bbox.top >= first_data_y:
                continue
            if line.bbox.right < table["bbox"]["left"] \
                    or line.bbox.left > table["bbox"]["right"]:
                continue
            last = line.words[-1].text if line.words else ""
            if last == "follows:" and line.bbox.bottom > strong_top:
                strong_top = line.bbox.bottom + 1
        table["bbox"]["top"] = strong_top
        return

    sorted_rows = sorted(rows, key=lambda r: r["y"])
    cand_width = table["bbox"]["right"] - table["bbox"]["left"]
    first_idx = 0
    while first_idx < len(sorted_rows) - 1:
        r = sorted_rows[first_idx]
        if len(r["idx"]) != 1:
            break
        line = lines[r["idx"][0]]
        last = line.words[-1].text if line.words else ""
        last_numeric = (_is_num_word(last)
                        and bool(re.search(r"[\d)%]$", last)))
        if last_numeric:
            break
        wide = (line.bbox.right - line.bbox.left) > cand_width * 0.5
        sentence_end = bool(re.search(r"[.!?:]$", last)) \
            and len(line.words) >= 3
        if not wide and not sentence_end:
            break
        first_idx += 1
    first_row_y = sorted_rows[first_idx]["y"]
    avg_row_h = 50.0
    if len(sorted_rows) > 1:
        spac = sorted(sorted_rows[i]["y"] - sorted_rows[i - 1]["y"]
                      for i in range(1, len(sorted_rows)))
        avg_row_h = spac[len(spac) // 2]
    in_table = {i for r in rows for i in r["idx"]}

    scan_anchor = first_row_y
    if table["h_lines"]:
        limit = first_row_y - avg_row_h * 1.5
        for hl in table["h_lines"]:
            if limit < hl["y"] < first_row_y:
                if scan_anchor == first_row_y or hl["y"] > scan_anchor:
                    scan_anchor = hl["y"]

    data_left = min((lines[i].bbox.left for r in rows for i in r["idx"]),
                    default=float("inf"))

    header_top = scan_anchor
    above = []
    for li, line in enumerate(lines):
        if li in in_table:
            continue
        if line.bbox.top >= first_row_y:
            continue
        if line.bbox.bottom <= top_floor:
            continue
        if line.bbox.right < table["bbox"]["left"] \
                or line.bbox.left > table["bbox"]["right"]:
            continue
        above.append((li, line))
    above.sort(key=lambda t: -t[1].bbox.top)

    single_seg_range = None
    for li, line in above:
        line_width = line.bbox.right - line.bbox.left
        is_multi = False
        for lj, other in enumerate(lines):
            if lj == li:
                continue
            if abs(other.bbox.top - line.bbox.top) < 5 \
                    and other.bbox.right >= table["bbox"]["left"] \
                    and other.bbox.left <= table["bbox"]["right"]:
                is_multi = True
                break
        last_text = line.words[-1].text if line.words else ""
        if last_text == "follows:":
            break
        gap = header_top - line.bbox.bottom
        if is_multi:
            if gap > avg_row_h * 2.5:
                break
            header_top = min(header_top, line.bbox.top)
            single_seg_range = None
            continue
        if gap > avg_row_h * 0.45:
            continue
        if line_width > cand_width * 0.6:
            break
        if line.bbox.left < data_left - 20:
            break
        if single_seg_range and (
                line.bbox.right < single_seg_range[0]
                or line.bbox.left > single_seg_range[1]):
            break
        header_top = min(header_top, line.bbox.top)
        if line_width <= cand_width * 0.5:
            if single_seg_range is None:
                single_seg_range = [line.bbox.left, line.bbox.right]
            else:
                single_seg_range[0] = min(single_seg_range[0],
                                          line.bbox.left)
                single_seg_range[1] = max(single_seg_range[1],
                                          line.bbox.right)

    final_top = max(top_floor, header_top - 5)

    pushed = True
    while pushed:
        pushed = False
        for li, line in enumerate(lines):
            if li in in_table:
                continue
            if line.bbox.right < table["bbox"]["left"] \
                    or line.bbox.left > table["bbox"]["right"]:
                continue
            if line.bbox.bottom <= final_top \
                    or line.bbox.top >= first_row_y:
                continue
            if line.bbox.top < final_top:
                final_top = line.bbox.bottom + 1
                pushed = True
                continue
            last = line.words[-1].text if line.words else ""
            if last == "follows:":
                final_top = line.bbox.bottom + 1
                pushed = True
                continue
            line_width = line.bbox.right - line.bbox.left
            is_multi = False
            for lj, other in enumerate(lines):
                if lj == li:
                    continue
                if abs(other.bbox.top - line.bbox.top) < 5 \
                        and other.bbox.right >= table["bbox"]["left"] \
                        and other.bbox.left <= table["bbox"]["right"]:
                    is_multi = True
                    break
            if not is_multi and line_width > cand_width * 0.6:
                final_top = line.bbox.bottom + 1
                pushed = True

    for r in sorted_rows:
        if r["y"] > final_top + avg_row_h * 1.5:
            break
        all_follows = bool(r["idx"])
        for i in r["idx"]:
            words = lines[i].words
            if words and words[-1].text != "follows:":
                all_follows = False
                break
        if all_follows and r["idx"]:
            row_bot = max(lines[i].bbox.bottom for i in r["idx"])
            if row_bot > final_top:
                final_top = row_bot + 1
        else:
            break

    table["bbox"]["top"] = final_top


def detect_table_title(table, lines):
    """'Table N' line above or at the top of the table (:3775-3817)."""
    best = None
    for line in lines:
        if line.bbox.bottom > table["bbox"]["top"]:
            continue
        if line.bbox.bottom < table["bbox"]["top"] - 50:
            continue
        if line.bbox.right < table["bbox"]["left"] \
                or line.bbox.left > table["bbox"]["right"]:
            continue
        text = " ".join(w.text for w in line.words)
        if not _TABLE_TITLE_RE.match(text):
            continue
        dist = table["bbox"]["top"] - line.bbox.bottom
        if best is None or dist < best[0]:
            best = (dist, text)
    if best:
        return best[1]
    first_inside = None
    for line in lines:
        if not (table["bbox"]["top"] <= line.bbox.top
                <= table["bbox"]["bottom"]):
            continue
        if line.bbox.right < table["bbox"]["left"] \
                or line.bbox.left > table["bbox"]["right"]:
            continue
        if first_inside is None \
                or line.bbox.top < first_inside.bbox.top:
            first_inside = line
    if first_inside:
        text = " ".join(w.text for w in first_inside.words)
        if _TABLE_TITLE_RE.match(text):
            return text
    return None


def extend_table_to_adjacent_content(table, lines, siblings):
    """Unstroked label columns, label-column headings, continuation
    rows below the grid (:3827-4016)."""
    if len(table["rows"]) < 2:
        return
    sorted_rows = sorted(table["rows"], key=lambda r: r["y"])
    spacings = sorted(sorted_rows[i]["y"] - sorted_rows[i - 1]["y"]
                      for i in range(1, len(sorted_rows)))
    median_spacing = spacings[len(spacings) // 2] if spacings else 50
    y_match = max(10, median_spacing * 0.4)
    in_table = {i for r in table["rows"] for i in r["idx"]}
    bbox = table["bbox"]
    bbox_width = bbox["right"] - bbox["left"]

    left_adj = {}
    overlap_adj = {}
    for i, line in enumerate(lines):
        if i in in_table:
            continue
        if line.bbox.left >= bbox["left"] - 10:
            continue
        matched = None
        for r in table["rows"]:
            if abs(line.bbox.top - r["y"]) <= y_match:
                matched = r["y"]
                break
        if matched is None:
            continue
        lw = line.bbox.right - line.bbox.left
        clearly_left = line.bbox.right < bbox["left"] - 10
        if clearly_left and lw < bbox_width * 0.5:
            left_adj.setdefault(matched, []).append((i, line))
        elif not clearly_left:
            overlap_adj.setdefault(matched, []).append((i, line))

    extended_left = False
    old_left = bbox["left"]
    if len(left_adj) > len(table["rows"]) * 0.5 and len(left_adj) >= 2:
        new_left = float("inf")
        max_right = float("-inf")
        alphabetic = 0
        for arr in left_adj.values():
            for _, line in arr:
                new_left = min(new_left, line.bbox.left)
                max_right = max(max_right, line.bbox.right)
                if any(_HAS_LETTER_RE.search(w.text)
                       for w in line.words):
                    alphabetic += 1
        if alphabetic == 0:
            return
        if max_right - new_left >= bbox_width * 0.5:
            return
        if new_left < old_left - 10:
            table["col_separators"] = sorted(
                [old_left] + table["col_separators"])
            bbox["left"] = new_left
            for row_y, arr in left_adj.items():
                r = next((row for row in table["rows"]
                          if row["y"] == row_y), None)
                if r:
                    for i, _ in arr:
                        if i not in r["idx"]:
                            r["idx"].append(i)
            for row_y, arr in overlap_adj.items():
                r = next((row for row in table["rows"]
                          if row["y"] == row_y), None)
                if r:
                    for i, _ in arr:
                        if i not in r["idx"]:
                            r["idx"].append(i)
            extended_left = True

    if extended_left:
        label_right = table["col_separators"][0]
        label_left = bbox["left"]
        top_limit = bbox["top"] - median_spacing * 2
        for i, line in enumerate(lines):
            if i in in_table:
                continue
            if line.bbox.top >= bbox["top"] or line.bbox.top < top_limit:
                continue
            if line.bbox.left < label_left - 5 \
                    or line.bbox.right > label_right + 5:
                continue
            if line.bbox.top < bbox["top"]:
                bbox["top"] = line.bbox.top

    col_bounds = [bbox["left"], *table["col_separators"], bbox["right"]]
    below_limit = bbox["bottom"] + median_spacing * 1.5
    if siblings:
        for other in siblings:
            if other is table or not other.get("rows"):
                continue
            if other["bbox"]["right"] < bbox["left"] \
                    or other["bbox"]["left"] > bbox["right"]:
                continue
            other_first = min(r["y"] for r in other["rows"])
            if other_first > bbox["bottom"] \
                    and other_first - 5 < below_limit:
                below_limit = other_first - 5

    below_by_y = {}
    for i, line in enumerate(lines):
        if i in in_table:
            continue
        ly = line.bbox.top
        if ly <= bbox["bottom"] or ly > below_limit:
            continue
        if line.bbox.right < bbox["left"] \
                or line.bbox.left > bbox["right"]:
            continue
        matched = None
        for y in below_by_y:
            if abs(ly - y) < 5:
                matched = y
                break
        below_by_y.setdefault(matched if matched is not None else ly,
                              []).append((i, line))

    for y in sorted(below_by_y):
        arr = below_by_y[y]
        if len(arr) < 2:
            continue
        col_hits = 0
        for _, line in arr:
            for c in range(len(col_bounds) - 1):
                if line.bbox.right > col_bounds[c] \
                        and line.bbox.left < col_bounds[c + 1]:
                    col_hits += 1
                    break
        if col_hits < 2:
            break
        for _, line in arr:
            if line.bbox.bottom > bbox["bottom"]:
                bbox["bottom"] = line.bbox.bottom
        table["rows"].append({"y": y, "idx": [i for i, _ in arr]})


def validate_stream_order(table, lines):
    """Drop rows whose spatial order contradicts stream order; keep
    column-major rows (:4018-4056)."""
    for i in range(len(table["rows"]) - 1, -1, -1):
        row = table["rows"][i]
        if len(row["idx"]) < 2:
            continue
        max_gap = max(row["idx"][k] - row["idx"][k - 1]
                      for k in range(1, len(row["idx"])))
        if max_gap > 2:
            continue
        s = sorted(row["idx"], key=lambda a: lines[a].bbox.left)
        if any(s[j] < s[j - 1] for j in range(1, len(s))):
            table["rows"].pop(i)
    return len(table["rows"]) >= 3


# ---------------------------------------------------------------------------
# orchestrator (:66-770)


def _path_only_fallback(page, paths, flats, scale, visual_height_pts,
                        path_data=None):
    """Strict grid + segmented-hline + header-rule, each yielding to
    stronger overlaps (:98-120, :227-247, :252-272)."""
    strict = [t for t in detect_strict_grids(page, paths, flats, scale,
                                             visual_height_pts)
              if t["col_separators"]]
    if path_data is None:
        path_data = classify_paths(paths, scale, visual_height_pts, page)
    for st in detect_segmented_hline_grids(page, path_data):
        if not any(bbox_overlap(v["bbox"], st["bbox"]) > 0.3
                   for v in strict):
            strict.append(st)
    for ht in detect_header_rule_tables(path_data["h_lines"], page):
        if not any(bbox_overlap(v["bbox"], ht["bbox"]) > 0.3
                   for v in strict):
            strict.append(ht)
    return strict


def detect_table_regions(page, paths, scale, visual_height_pts):
    """The full arbitrated pipeline (detectPdfTables.js:66-770).
    Returns table dicts with bbox/col_separators/method/title."""
    lines = page.lines
    if len(lines) < 3:
        return []
    if len(paths) > MAX_TABLE_DETECTION_PATHS:
        paths = []
    flats = [(_flat_cmds(p), p) for p in paths]

    # Phases 0-1 (text_tables port); None = quick bail-out or no rows.
    table_like = find_table_like_rows(lines)
    if table_like is None:
        return _path_only_fallback(page, paths, flats, scale,
                                   visual_height_pts)

    candidates_raw = group_rows_into_candidates(table_like, lines,
                                                page.height)
    if not candidates_raw:
        return _path_only_fallback(page, paths, flats, scale,
                                   visual_height_pts)

    # Convert + the Phase-2 generous top expansion (:1105-1109).
    candidates = []
    for c in candidates_raw:
        b = c["bbox"]
        avg_row_h = (b.bottom - b.top) / len(c["rows"])
        candidates.append({
            "bbox": {"left": b.left,
                     "top": max(0, b.top - avg_row_h * 3),
                     "right": b.right, "bottom": b.bottom},
            "rows": [dict(r) for r in c["rows"]],
            "col_separators": [], "h_lines": [], "v_lines": [],
        })

    # Phase 3: path classification + correlation.
    path_data = classify_paths(paths, scale, visual_height_pts, page)
    for cand in candidates:
        correlate_paths_with_candidate(cand, path_data)

    # Phase 3.5: row-band regions.
    row_band_regions = extract_row_band_structure(
        path_data["filled_rects"])

    # Phase 4: validation (text_tables port takes BBox-shaped cand).
    validated = [c for c in candidates
                 if validate_candidate(
                     {"rows": c["rows"], "bbox": _Box(c["bbox"])}, lines)]

    # Grid override (:297-316).
    strict_grids = [t for t in detect_strict_grids(
        page, paths, flats, scale, visual_height_pts)
        if t["col_separators"]]
    grid_tables = list(strict_grids)
    for st in detect_segmented_hline_grids(page, path_data):
        if not any(bbox_overlap(v["bbox"], st["bbox"]) > 0.3
                   for v in strict_grids):
            grid_tables.append(st)
    for gt in grid_tables:
        validated = [v for v in validated
                     if bbox_overlap(v["bbox"], gt["bbox"]) <= 0.3]
        validated.append(gt)

    for t in validated:
        t.setdefault("method", "text")

    # Row-band attach / split / synthesize (:322-445).
    usable_rbr = [r for r in row_band_regions
                  if r["right"] - r["left"] >= page.width * 0.3]
    region_matches = []
    for rbr in usable_rbr:
        rb = {"left": rbr["left"], "top": rbr["top"],
              "right": rbr["right"], "bottom": rbr["bottom"]}
        matches = [c for c in validated
                   if bbox_overlap(c["bbox"], rb) > 0.3]
        region_matches.append((rbr, matches))
    cand_regions = {}
    for rbr, cands in region_matches:
        for c in cands:
            cand_regions.setdefault(id(c), (c, []))[1].append(rbr)

    def attach_region(cand, rbr):
        if cand["method"] == "grid-strong":
            return
        cand["row_band_region"] = rbr
        b = cand["bbox"]
        prev = dict(b)
        b["top"] = min(b["top"], rbr["top"])
        b["bottom"] = max(b["bottom"], rbr["bottom"])
        b["left"] = min(b["left"], rbr["left"])
        b["right"] = max(b["right"], rbr["right"])
        if b["left"] < prev["left"] - 5 and cand["method"] in (
                "header-rule", "segmented-hline"):
            seps = sorted(cand["col_separators"] + [prev["left"]])
            cand["col_separators"] = seps
        if b["top"] < prev["top"] or b["bottom"] > prev["bottom"] \
                or b["left"] < prev["left"] - 5 \
                or b["right"] > prev["right"] + 5:
            cand["rows"] = collect_rows_in_bbox(b, lines)

    cands_to_remove = []
    cands_to_add = []
    for cand, regions in cand_regions.values():
        if len(regions) == 1:
            attach_region(cand, regions[0])
    for cand, regions in cand_regions.values():
        if len(regions) < 2:
            continue
        all_five = all(len(r["row_ys"]) >= 5 for r in regions)
        all_two = all(len(r["row_ys"]) >= 2 for r in regions)
        sorted_by_top = sorted(regions, key=lambda r: r["top"])
        should_split = False
        if len(regions) >= 3 and all_five:
            should_split = True
        elif all_two:
            all_header_sep = True
            for ri in range(1, len(sorted_by_top)):
                gap_top = sorted_by_top[ri - 1]["bottom"]
                gap_bottom = sorted_by_top[ri]["top"]
                y_groups = []
                for line in lines:
                    if not (gap_top <= line.bbox.top < gap_bottom):
                        continue
                    if line.bbox.right < cand["bbox"]["left"] \
                            or line.bbox.left > cand["bbox"]["right"]:
                        continue
                    for g in y_groups:
                        if abs(g["y"] - line.bbox.top) < 5:
                            g["count"] += 1
                            break
                    else:
                        y_groups.append({"y": line.bbox.top, "count": 1})
                if not any(g["count"] >= 2 for g in y_groups):
                    all_header_sep = False
                    break
            if all_header_sep:
                should_split = True
        if should_split:
            cands_to_remove.append(cand)
            for rbr in regions:
                cands_to_add.extend(
                    make_row_band_candidates(rbr, cand, lines))
    for rbr, cands in region_matches:
        if not cands and len(rbr["row_ys"]) >= 8:
            cands_to_add.extend(
                make_row_band_candidates(rbr, None, lines))
    for c in cands_to_remove:
        if c in validated:
            validated.remove(c)
    validated.extend(cands_to_add)

    # Header detection, then structure (:457-464).
    for t in validated:
        t["headers"] = _detect_headers(t, lines)
    for t in validated:
        extract_structure(t, lines)

    # Header-rule arbitration (:467-516).
    def has_narrow_text_col(t):
        seps = [t["bbox"]["left"], *t["col_separators"],
                t["bbox"]["right"]]
        return any(seps[i] - seps[i - 1] < 100
                   for i in range(1, len(seps)))

    for ht in detect_header_rule_tables(path_data["h_lines"], page):
        blocked = False
        overlapping_text = []
        for v in validated:
            if v["method"] in ("grid-strong", "segmented-hline"):
                if bbox_overlap(v["bbox"], ht["bbox"]) > 0.3:
                    blocked = True
                    break
            elif bbox_overlap(v["bbox"], ht["bbox"]) > 0.3:
                overlapping_text.append(v)
        if blocked:
            continue
        if overlapping_text:
            ht_cols = len(ht["col_separators"]) + 1
            max_text = max(len(t["col_separators"]) + 1
                           for t in overlapping_text)
            any_narrow = any(has_narrow_text_col(t)
                             for t in overlapping_text)
            if max_text > ht_cols and not any_narrow:
                continue
        validated = [v for v in validated
                     if v["method"] in ("grid-strong", "segmented-hline")
                     or bbox_overlap(v["bbox"], ht["bbox"]) <= 0.3]
        validated.append(ht)

    # Phase 5.4: row-band re-attach (:518-553).
    for cand in validated:
        if cand.get("row_band_region"):
            continue
        matches = [rbr for rbr in row_band_regions
                   if bbox_overlap(cand["bbox"],
                                   {"left": rbr["left"],
                                    "top": rbr["top"],
                                    "right": rbr["right"],
                                    "bottom": rbr["bottom"]}) > 0.3]
        if len(matches) == 1:
            attach_region(cand, matches[0])

    # Sibling split of band-attached candidates on "Total" rows
    # (:555-641).
    split_work = []
    for cand in validated:
        if not cand.get("row_band_region"):
            continue
        if not cand["rows"] or len(cand["rows"]) < 4:
            continue
        s = sorted(cand["rows"], key=lambda r: r["y"])
        spacings = [s[i]["y"] - s[i - 1]["y"] for i in range(1, len(s))]
        median = sorted(spacings)[len(spacings) // 2]
        groups = [{"start": 0, "end": 0}]
        for i in range(1, len(s)):
            if spacings[i - 1] > median * 2 and spacings[i - 1] > 50:
                groups.append({"start": i, "end": i})
            else:
                groups[-1]["end"] = i
        if len(groups) != 2:
            continue

        def ends_in_total(row_spec):
            for li in row_spec["idx"]:
                text = " ".join(w.text
                                for w in lines[li].words).strip()
                if re.match(r"^Total\b", text, re.I):
                    return True
            return False

        if not ends_in_total(s[groups[0]["end"]]) \
                or not ends_in_total(s[groups[1]["end"]]):
            continue
        splits = []
        for gi, g in enumerate(groups):
            if g["end"] - g["start"] < 1:
                continue
            g_rows = s[g["start"]:g["end"] + 1]
            g_top = (cand["bbox"]["top"] if gi == 0
                     else g_rows[0]["y"])
            if gi == len(groups) - 1:
                g_bottom = cand["bbox"]["bottom"]
            else:
                g_bottom = max(lines[li].bbox.bottom
                               for r in g_rows for li in r["idx"]) + 5
            splits.append({
                "bbox": {"left": cand["bbox"]["left"], "top": g_top,
                         "right": cand["bbox"]["right"],
                         "bottom": g_bottom},
                "rows": g_rows,
                "col_separators": list(cand["col_separators"]),
                "h_lines": cand.get("h_lines") or [],
                "v_lines": cand.get("v_lines") or [],
                "method": cand["method"],
                "row_band_region": cand["row_band_region"],
                "headers": cand.get("headers"),
                "split_top_locked": gi > 0})
        if len(splits) >= 2:
            split_work.append((cand, splits))
    for cand, splits in split_work:
        idx = validated.index(cand)
        validated[idx:idx + 1] = splits

    # Phase 5.5: refine tops (:645-684).
    for t in validated:
        has_band = bool(t.get("row_band_region"))
        if t.get("split_top_locked"):
            continue
        if t["method"] == "grid-strong":
            continue
        if not has_band and t["method"] == "segmented-hline":
            continue
        if not has_band and t["method"] == "header-rule":
            continue
        my_first = (min(r["y"] for r in t["rows"]) if t["rows"]
                    else t["bbox"]["top"])
        top_floor = 0.0
        for other in validated:
            if other is t:
                continue
            if other["bbox"]["bottom"] <= my_first \
                    and other["bbox"]["bottom"] > top_floor \
                    and other["bbox"]["right"] >= t["bbox"]["left"] \
                    and other["bbox"]["left"] <= t["bbox"]["right"]:
                top_floor = other["bbox"]["bottom"]
        refine_table_top(t, lines, top_floor)

    # Phase 5.55: titles.
    for t in validated:
        t["title"] = detect_table_title(t, lines)

    # Multi-column filter w/ sliver rejection for text tables
    # (:692-708).
    multi_col = []
    for t in validated:
        if not t["col_separators"]:
            continue
        if t["method"] != "text":
            multi_col.append(t)
            continue
        seps = [t["bbox"]["left"], *t["col_separators"],
                t["bbox"]["right"]]
        if all(seps[i] - seps[i - 1] >= 30
               for i in range(1, len(seps))):
            multi_col.append(t)

    # Phase 5.6: adjacent-content extension (:710-730).
    for t in multi_col:
        if t["method"] in ("grid-strong", "segmented-hline",
                           "header-rule"):
            continue
        extend_table_to_adjacent_content(t, lines, multi_col)

    # Phase 5.7: rule-cluster column refinement for text tables
    # (:732-763).
    rule_clusters = find_disjoint_rule_clusters(path_data["h_lines"],
                                                page)
    for t in multi_col:
        if t["method"] != "text":
            continue
        best = None
        for cluster in rule_clusters:
            if cluster["y"] < t["bbox"]["top"] - 30 \
                    or cluster["y"] > t["bbox"]["bottom"] + 30:
                continue
            rl = cluster["cols"][0]["left"]
            rr = cluster["cols"][-1]["right"]
            if rl < t["bbox"]["left"] - 30:
                continue
            if rr > t["bbox"]["right"] + 30:
                continue
            if best is None or len(cluster["cols"]) > len(best["cols"]):
                best = cluster
        if best is None:
            continue
        would_label = t["bbox"]["left"] < best["cols"][0]["left"] - 20
        new_count = len(best["cols"]) + (1 if would_label else 0)
        if len(t["col_separators"]) + 1 > new_count:
            continue
        new_seps = []
        if would_label:
            new_seps.append(best["cols"][0]["left"])
        for i in range(1, len(best["cols"])):
            new_seps.append((best["cols"][i - 1]["right"]
                             + best["cols"][i]["left"]) / 2)
        t["col_separators"] = sorted(new_seps)

    # Phase 6: stream-order validation (:765-769).
    return [t for t in multi_col
            if t["method"] == "grid-strong"
            or validate_stream_order(t, lines)]
