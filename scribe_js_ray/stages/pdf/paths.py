"""PDF vector-path extraction + graphics harvesting (SURVEY M28/M27/D4).

From-scratch analog of the reference's path machinery:

- ``execute_path_operators`` — walk a content stream tracking CTM /
  color / line-width state, emitting painted paths in device space
  (parsePdfPaths.js:193-596, with Form-XObject inlining :72-150)
- ``harvest_page_graphics`` — classify painted paths into underline /
  separator-rule rects, empty checkbox squares, and vertical ruling
  segments (parsePdfDoc.js:843-1008)
- ``detect_ruled_tables`` — ruled-grid table regions from the
  horizontal + vertical rulings (core of detectPdfTables.js:66; the
  whitespace-column text method lives in stages/tables.py)

The per-page cost cap mirrors the reference: streams over 2 MB skip
path parsing entirely (parsePdfDoc.js:35 GRAPHICS_HEAVY_STREAM_BYTES).
"""

from __future__ import annotations

import re

from .content import _mat_mul, tokenize_content
from .objects import StreamObj

GRAPHICS_HEAVY_STREAM_BYTES = 2_000_000


class PaintedPath:
    __slots__ = ("commands", "fill", "stroke", "fill_color", "fill_space",
                 "stroke_color", "stroke_space", "line_width")

    def __init__(self, commands, fill, stroke, fill_color, fill_space,
                 stroke_color, stroke_space, line_width):
        self.commands = commands          # list of ('M'|'L'|'C'|'Z', pts)
        self.fill = fill
        self.stroke = stroke
        self.fill_color = fill_color
        self.fill_space = fill_space
        self.stroke_color = stroke_color
        self.stroke_space = stroke_space
        self.line_width = line_width


_PAINT_OPS = {
    "S": (False, True), "s": (False, True),
    "f": (True, False), "F": (True, False), "f*": (True, False),
    "B": (True, True), "B*": (True, True),
    "b": (True, True), "b*": (True, True),
}


def execute_path_operators(pdf, content: bytes, xobjects=None,
                           base_ctm=(1, 0, 0, 1, 0, 0),
                           depth: int = 0,
                           tokens=None) -> list[PaintedPath]:
    """Painted paths of one content stream, coordinates in device space.
    ``tokens``: pre-tokenized stream shared with the text pass."""
    if len(content) > GRAPHICS_HEAVY_STREAM_BYTES:
        return []
    out: list[PaintedPath] = []
    ctm = base_ctm
    gs_stack = []
    cur: list = []          # current path commands, untransformed
    start_pt = None
    cur_pt = None
    fill_color, fill_space = [0.0], "gray"
    stroke_color, stroke_space = [0.0], "gray"
    line_width = 1.0

    def xf(x, y):
        return (ctm[0] * x + ctm[2] * y + ctm[4],
                ctm[1] * x + ctm[3] * y + ctm[5])

    def emit(fill, stroke):
        if not cur:
            return
        cmds = []
        for op, pts in cur:
            cmds.append((op, [xf(x, y) for x, y in pts]))
        out.append(PaintedPath(cmds, fill, stroke,
                               list(fill_color), fill_space,
                               list(stroke_color), stroke_space,
                               line_width * ((ctm[0] ** 2 + ctm[1] ** 2)
                                             ** 0.5 or 1.0)))

    for operands, op in (tokens if tokens is not None
                         else tokenize_content(content)):
        try:
            if op == "q":
                gs_stack.append((ctm, list(fill_color), fill_space,
                                 list(stroke_color), stroke_space,
                                 line_width))
            elif op == "Q":
                if gs_stack:
                    (ctm, fill_color, fill_space, stroke_color,
                     stroke_space, line_width) = gs_stack.pop()
            elif op == "cm" and len(operands) == 6:
                ctm = _mat_mul(tuple(float(v) for v in operands), ctm)
            elif op == "m" and len(operands) >= 2:
                x, y = float(operands[-2]), float(operands[-1])
                cur.append(("M", [(x, y)]))
                start_pt = cur_pt = (x, y)
            elif op == "l" and len(operands) >= 2:
                x, y = float(operands[-2]), float(operands[-1])
                cur.append(("L", [(x, y)]))
                cur_pt = (x, y)
            elif op == "c" and len(operands) >= 6:
                pts = [(float(operands[i]), float(operands[i + 1]))
                       for i in range(0, 6, 2)]
                cur.append(("C", pts))
                cur_pt = pts[-1]
            elif op in ("v", "y") and len(operands) >= 4:
                pts = [(float(operands[i]), float(operands[i + 1]))
                       for i in range(0, 4, 2)]
                if cur_pt is not None:
                    ctrl = [cur_pt] + pts if op == "v" \
                        else [pts[0], pts[1], pts[1]]
                    cur.append(("C", ctrl[:3]))
                cur_pt = pts[-1]
            elif op == "re" and len(operands) >= 4:
                x, y, w, h = (float(v) for v in operands[-4:])
                cur.append(("M", [(x, y)]))
                cur.append(("L", [(x + w, y)]))
                cur.append(("L", [(x + w, y + h)]))
                cur.append(("L", [(x, y + h)]))
                cur.append(("Z", []))
                start_pt = cur_pt = (x, y)
            elif op == "h":
                cur.append(("Z", []))
                if start_pt is not None:
                    cur_pt = start_pt
            elif op in _PAINT_OPS:
                fill, stroke = _PAINT_OPS[op]
                emit(fill, stroke)
                cur = []
            elif op == "n":
                cur = []
            elif op == "w" and operands:
                line_width = float(operands[0])
            elif op == "g" and operands:
                fill_color, fill_space = [float(operands[0])], "gray"
            elif op == "G" and operands:
                stroke_color, stroke_space = [float(operands[0])], "gray"
            elif op == "rg" and len(operands) >= 3:
                fill_color = [float(v) for v in operands[-3:]]
                fill_space = "rgb"
            elif op == "RG" and len(operands) >= 3:
                stroke_color = [float(v) for v in operands[-3:]]
                stroke_space = "rgb"
            elif op == "k" and len(operands) >= 4:
                fill_color = [float(v) for v in operands[-4:]]
                fill_space = "cmyk"
            elif op == "K" and len(operands) >= 4:
                stroke_color = [float(v) for v in operands[-4:]]
                stroke_space = "cmyk"
            elif op in ("sc", "scn"):
                nums = [float(v) for v in operands
                        if isinstance(v, (int, float))]
                if nums:
                    fill_color = nums
                    fill_space = {1: "gray", 3: "rgb", 4: "cmyk"}.get(
                        len(nums), "other")
            elif op in ("SC", "SCN"):
                nums = [float(v) for v in operands
                        if isinstance(v, (int, float))]
                if nums:
                    stroke_color = nums
                    stroke_space = {1: "gray", 3: "rgb", 4: "cmyk"}.get(
                        len(nums), "other")
            elif op == "Do" and operands and xobjects and depth < 8:
                xo = pdf.resolve(xobjects.get(str(operands[0])))
                if isinstance(xo, StreamObj) and \
                        str(pdf.resolve(xo.dict.get("Subtype", ""))) == \
                        "Form":
                    matrix = pdf.resolve(xo.dict.get("Matrix")) \
                        or [1, 0, 0, 1, 0, 0]
                    res = pdf.resolve(xo.dict.get("Resources")) or {}
                    sub_xobjs = pdf.resolve(res.get("XObject")) or {}
                    sub_ctm = _mat_mul(
                        tuple(float(v) for v in matrix), ctm)
                    try:
                        out.extend(execute_path_operators(
                            pdf, pdf.stream_bytes(xo), sub_xobjs,
                            sub_ctm, depth + 1))
                    except Exception:
                        pass
        except Exception:
            continue
    return out


def _ink_fill(path: PaintedPath) -> bool:
    """A dark/colored fill is ink (can mark a checkbox), not an empty box
    (parsePdfDoc.js:874-884 color-space semantics)."""
    if not path.fill:
        return False
    fc = path.fill_color
    cs = path.fill_space
    if len(fc) == 4:
        return max(fc) > 0.15
    if len(fc) == 1:
        return fc[0] < 0.85 if cs == "gray" else fc[0] > 0.15
    if len(fc) == 3:
        if any(v > 1.5 for v in fc):   # Lab-style lightness triple
            return fc[0] < 85
        return min(fc) < 0.85
    return False


def harvest_page_graphics(paths: list[PaintedPath], height_pt: float,
                          scale: float = 1.0) -> dict:
    """Classify painted paths into text-relevant rects, coordinates in
    top-down scaled pixel space (matching line bboxes):

    - ``underline_rects``: thin (h<2pt) wide (w>10pt) horizontal bars —
      underline candidates / separator rules
    - ``fill_squares``: small unfilled squares (checkbox candidates, D4)
    - ``v_segments``: thin tall vertical bars (table column rulings)
    """
    underline_rects = []
    fill_squares = []
    v_segments = []

    def to_px_y(y):
        return (height_pt - y) * scale

    for path in paths:
        if not path.fill and not path.stroke:
            continue
        color = path.stroke_color if path.stroke else path.fill_color
        ink = _ink_fill(path)
        has_curve = any(op == "C" for op, _ in path.commands)
        if has_curve:
            continue
        # Per-subpath classification (a multi-bar separator packs several
        # thin rects into one path, parsePdfDoc.js:925-940).
        subpaths: list[list] = []
        for op, pts in path.commands:
            if op == "M":
                subpaths.append(list(pts))
            elif op == "L" and subpaths:
                subpaths[-1].extend(pts)
        for pts in subpaths:
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            min_x, max_x = min(xs), max(xs)
            min_y, max_y = min(ys), max(ys)
            w = max_x - min_x
            h = max_y - min_y
            axis_rect = 4 <= len(pts) <= 5 and all(
                abs(pts[i][0] - pts[(i + 1) % len(pts)][0]) <= 0.01
                or abs(pts[i][1] - pts[(i + 1) % len(pts)][1]) <= 0.01
                for i in range(len(pts)))
            # A bare 2-point stroked line also rules/underlines.
            thin_h = h < 2 and w > 10 and (axis_rect or len(pts) == 2)
            thin_v = w < 2 and h > 10 and (axis_rect or len(pts) == 2)
            if thin_h:
                underline_rects.append({
                    "left": min_x * scale, "right": max_x * scale,
                    "y": to_px_y(max_y), "color": color,
                    "is_underline": False})
            elif thin_v:
                # filled thin rects count too — a 0.5pt `re f` bar is
                # the common way producers draw column rulings
                # (detectPdfTables.js:1392 takes w<2 fills OR strokes);
                # page-spanning margin rules (>80% of page height) are
                # not column rulings (:1398), and chromatic bars are
                # chart/decor content (isPathAchromatic, :1172).
                if h <= height_pt * 0.8 and _is_achromatic(color):
                    v_segments.append({
                        "x": (min_x + max_x) / 2 * scale,
                        "top": to_px_y(max_y), "bottom": to_px_y(min_y)})
            elif axis_rect and 5 <= w <= 24 and 5 <= h <= 24 \
                    and 0.7 < (w / h if h else 0) < 1.43 \
                    and len(fill_squares) < 200 and not ink:
                fill_squares.append({
                    "left": min_x * scale, "top": to_px_y(max_y),
                    "right": max_x * scale, "bottom": to_px_y(min_y),
                    "stroke": bool(path.stroke)})

    # Collapse white-fill + stroke twin squares (parsePdfDoc.js:986-996).
    by_key = {}
    for sq in fill_squares:
        key = (round(sq["left"]), round(sq["top"]),
               round(sq["right"]), round(sq["bottom"]))
        prev = by_key.get(key)
        if prev:
            prev["stroke"] = prev["stroke"] or sq["stroke"]
        else:
            by_key[key] = sq
    _reconstitute_dashed_lines(paths, height_pt, scale,
                               underline_rects, v_segments)

    return {"underline_rects": underline_rects,
            "fill_squares": list(by_key.values()),
            "v_segments": v_segments,
            "band_fills": _collect_band_fills(paths, height_pt, scale)}


def _group_by_position(items, key, tol):
    """Cluster items whose ``key`` value sits within ``tol`` of the
    group's first member (detectPdfTables.js:1869-1883)."""
    groups: list[list] = []
    for item in items:
        for g in groups:
            if abs(item[key] - g[0][key]) <= tol:
                g.append(item)
                break
        else:
            groups.append([item])
    return groups


def _reconstitute_dashed_lines(paths, height_pt, scale,
                               underline_rects, v_segments):
    """Rebuild dashed/dotted rules drawn as many discrete short stroked
    segments (detectPdfTables.js:1784-1862): 5+ collinear 2-point
    segments (position within 2pt) whose median gap is in [0, 2) merge
    into one full-length rule, feeding the ruled-grid detector the same
    way a solid line would."""
    v_cand, h_cand = [], []
    for path in paths:
        if not path.stroke:
            continue
        cmds = path.commands
        if len(cmds) != 2 or cmds[0][0] != "M" or cmds[1][0] != "L":
            continue
        x1, y1 = cmds[0][1][0]
        x2, y2 = cmds[1][1][0]
        w, h = abs(x2 - x1), abs(y2 - y1)
        if w < 2 and 1 < h <= 10:
            v_cand.append({"x": (x1 + x2) / 2, "y1": min(y1, y2),
                           "y2": max(y1, y2)})
        elif h < 2 and 1 < w <= 30:
            h_cand.append({"y": (y1 + y2) / 2, "x1": min(x1, x2),
                           "x2": max(x1, x2)})

    page_h_px = height_pt * scale

    if len(v_cand) >= 5:
        for group in _group_by_position(v_cand, "x", 2):
            if len(group) < 5:
                continue
            group.sort(key=lambda g: g["y1"])
            gaps = sorted(group[i]["y1"] - group[i - 1]["y2"]
                          for i in range(1, len(group)))
            median_gap = gaps[len(gaps) // 2]
            if median_gap < 0 or median_gap >= 2:
                continue
            min_y = group[0]["y1"]
            max_y = group[-1]["y2"]
            avg_x = sum(g["x"] for g in group) / len(group)
            top = (height_pt - max_y) * scale
            bottom = (height_pt - min_y) * scale
            if bottom - top > page_h_px * 0.8:   # page-spanning margin
                continue
            v_segments.append({"x": avg_x * scale,
                               "top": top, "bottom": bottom})

    if len(h_cand) >= 5:
        for group in _group_by_position(h_cand, "y", 2):
            if len(group) < 5:
                continue
            group.sort(key=lambda g: g["x1"])
            gaps = sorted(group[i]["x1"] - group[i - 1]["x2"]
                          for i in range(1, len(group)))
            median_gap = gaps[len(gaps) // 2]
            if median_gap < 0 or median_gap >= 2:
                continue
            y_px = (height_pt
                    - sum(g["y"] for g in group) / len(group)) * scale
            if y_px < page_h_px * 0.05 or y_px > page_h_px * 0.95:
                continue
            underline_rects.append({
                "left": group[0]["x1"] * scale,
                "right": group[-1]["x2"] * scale,
                "y": y_px, "color": [0.0], "is_underline": False})


def _is_achromatic(color) -> bool:
    """Achromatic = gray-scale (all RGB components roughly equal) or
    near-black CMYK (detectPdfTables.js:1161-1171).  Table grid lines
    are black/gray; chromatic bars are chart/decor content that must
    not form phantom grids."""
    if not color or len(color) == 1:
        return True
    if len(color) == 3:
        return max(color) - min(color) < 0.15
    if len(color) == 4:
        return color[0] < 0.15 and color[1] < 0.15 and color[2] < 0.15
    return True


def _is_band_color(color) -> bool:
    """Achromatic, or light (every RGB component ≥ 0.5) — the fills that
    shade table rows (detectPdfTables.js:1174-1180)."""
    if not color:
        return True
    if len(color) == 1:
        return True
    if len(color) == 3:
        if max(color) - min(color) < 0.15:
            return True
        return all(v >= 0.5 for v in color)
    if len(color) == 4:
        return color[0] < 0.15 and color[1] < 0.15 and color[2] < 0.15
    return True


def _collect_band_fills(paths, height_pt, scale) -> list[dict]:
    """Candidate row-shading fills in display space, with pts sizes kept
    for the adaptive (body-line-height) filter applied after page
    assembly (detectPdfTables.js:1292-1352, 1401-1412).  Batched fill
    paths holding many M-L-L-L-Z sub-rectangles (alternating-row
    shading drawn as ONE path) decompose into per-cell rects."""
    out = []

    def add(min_x, min_y, max_x, max_y):
        w, h = max_x - min_x, max_y - min_y
        if w < 5 or h < 1 or h > 200:
            return
        out.append({"left": min_x * scale,
                    "top": (height_pt - max_y) * scale,
                    "right": max_x * scale,
                    "bottom": (height_pt - min_y) * scale,
                    "w_pt": w, "h_pt": h})

    for path in paths:
        if not path.fill or not _is_band_color(path.fill_color):
            continue
        cmds = path.commands
        pts_all = [p for _, pts in cmds for p in pts]
        if not pts_all:
            continue
        # Batched sub-rect decomposition: runs of M-L-L-L-Z axis rects.
        sub_rects = []
        if len(cmds) >= 10:
            k = 0
            while k + 4 < len(cmds):
                if cmds[k][0] != "M":
                    k += 1
                    continue
                if (cmds[k + 1][0] != "L" or cmds[k + 2][0] != "L"
                        or cmds[k + 3][0] != "L" or cmds[k + 4][0] != "Z"):
                    k += 1
                    continue
                p0 = cmds[k][1][0]
                p1 = cmds[k + 1][1][0]
                p2 = cmds[k + 2][1][0]
                p3 = cmds[k + 3][1][0]
                tol = 0.01
                horiz_first = (abs(p0[1] - p1[1]) < tol
                               and abs(p2[1] - p3[1]) < tol
                               and abs(p0[0] - p3[0]) < tol
                               and abs(p1[0] - p2[0]) < tol)
                vert_first = (abs(p0[0] - p1[0]) < tol
                              and abs(p2[0] - p3[0]) < tol
                              and abs(p0[1] - p3[1]) < tol
                              and abs(p1[1] - p2[1]) < tol)
                if not horiz_first and not vert_first:
                    k += 1
                    continue
                xs = [p0[0], p1[0], p2[0], p3[0]]
                ys = [p0[1], p1[1], p2[1], p3[1]]
                sub_rects.append((min(xs), min(ys), max(xs), max(ys)))
                k += 5
        if len(sub_rects) >= 2:
            for r in sub_rects:
                add(*r)
        else:
            xs = [p[0] for p in pts_all]
            ys = [p[1] for p in pts_all]
            add(min(xs), min(ys), max(xs), max(ys))
    return out


def extract_row_band_regions(band_fills, body_h_pt: float,
                             scale: float = 1.0) -> list[dict]:
    """Row-band structure from shading fills
    (detectPdfTables.js:1550-1703 extractRowBandStructure): group fills
    by y-interval (tol 2), merge touching cells into disjoint ranges,
    keep bands wider than 50, cluster bands into contiguous regions
    (gap ≤ max(2×band height, 10), x-overlap), then accept regions of
    3+ bands whose per-cell left/right anchors repeat in ≥ half the
    bands — the dominant anchors yield the column separators (midpoints
    of adjacent right/left pairs).

    ``body_h_pt``: median text line height in pts; a fill only counts as
    a row band when its pts size fits the adaptive window
    (w > body_h, 0.3×body_h < h < 5×body_h — :1326-1329)."""
    min_h = body_h_pt if body_h_pt > 0 else 30.0
    fills = [f for f in band_fills
             if f["w_pt"] > min_h
             and min_h * 0.3 < f["h_pt"] < min_h * 5]
    if len(fills) < 3:
        return []

    # Step 1: y-interval groups (display space, tol 2).
    y_groups: list[dict] = []
    for f in fills:
        for g in y_groups:
            if abs(g["top"] - f["top"]) < 2 and \
                    abs(g["bottom"] - f["bottom"]) < 2:
                g["items"].append(f)
                break
        else:
            y_groups.append({"top": f["top"], "bottom": f["bottom"],
                             "items": [f]})

    # Step 2: merged disjoint ranges + raw per-cell extents per band.
    bands = []
    for g in y_groups:
        g["items"].sort(key=lambda f: f["left"])
        ranges: list[list] = []
        cells = []
        for f in g["items"]:
            cells.append((f["left"], f["right"]))
            if ranges and f["left"] <= ranges[-1][1] + 0.5:
                ranges[-1][1] = max(ranges[-1][1], f["right"])
            else:
                ranges.append([f["left"], f["right"]])
        if not ranges or ranges[-1][1] - ranges[0][0] <= 50:
            continue
        bands.append({"top": g["top"], "bottom": g["bottom"],
                      "ranges": ranges, "cells": cells})
    if len(bands) < 3:
        return []

    # Step 3: contiguous vertical regions.
    bands.sort(key=lambda b: b["top"])
    regions: list[list] = []
    for b in bands:
        b_left = b["ranges"][0][0]
        b_right = b["ranges"][-1][1]
        for r in regions:
            last = r[-1]
            last_h = last["bottom"] - last["top"]
            vert_close = b["top"] - last["bottom"] <= max(last_h * 2, 10)
            h_overlap = b_right > last["ranges"][0][0] and \
                b_left < last["ranges"][-1][1]
            if vert_close and h_overlap:
                r.append(b)
                break
        else:
            regions.append([b])

    # Step 4: dominant-anchor column inference.
    def cluster(values, tol=3.0):
        values.sort()
        clusters: list[dict] = []
        for v in values:
            if clusters and v - clusters[-1]["mean"] < tol:
                clusters[-1]["values"].append(v)
                clusters[-1]["mean"] = (sum(clusters[-1]["values"])
                                        / len(clusters[-1]["values"]))
            else:
                clusters.append({"values": [v], "mean": v})
        return clusters

    results = []
    for region in regions:
        if len(region) < 3:
            continue
        lefts = [c[0] for b in region for c in b["cells"]]
        rights = [c[1] for b in region for c in b["cells"]]
        min_count = -(-len(region) // 2)     # ceil
        dom_l = sorted(c["mean"] for c in cluster(lefts)
                       if len(c["values"]) >= min_count)
        dom_r = sorted(c["mean"] for c in cluster(rights)
                       if len(c["values"]) >= min_count)
        if not dom_l:
            continue
        col_xs = [(dom_r[i] + dom_l[i + 1]) / 2
                  for i in range(len(dom_l) - 1) if i < len(dom_r)]
        results.append({
            "left": dom_l[0], "right": dom_r[-1] if dom_r else dom_l[-1],
            "top": region[0]["top"], "bottom": region[-1]["bottom"],
            "col_xs": col_xs,
            "row_ys": [(b["top"], b["bottom"]) for b in region],
        })
    return results


def detect_ruled_tables(underline_rects, v_segments, min_cols: int = 2,
                        min_rows: int = 2, tol: float = 3.0) -> list[dict]:
    """Ruled-grid tables: >=min_rows horizontal rules crossed by
    >=min_cols+1 vertical rulings over a shared span → a table region
    with column separators at the interior vertical positions
    (detectPdfTables.js ruled-line method, core)."""
    # Chromatic bars never contribute grid lines (:1384 gates hLines on
    # isPathAchromatic; the gate sits here, not in the harvest, because
    # underline_rects also feed the text-underline match, which must
    # keep colored rules).
    underline_rects = [r for r in underline_rects
                       if _is_achromatic(r.get("color"))]
    if len(underline_rects) < min_rows or len(v_segments) < min_cols + 1:
        return []
    tables = []
    used = [False] * len(v_segments)
    # Group vertical segments by overlapping y-span.
    groups = []
    for i, v in enumerate(v_segments):
        if used[i]:
            continue
        group = [v]
        used[i] = True
        for j in range(i + 1, len(v_segments)):
            if used[j]:
                continue
            u = v_segments[j]
            if u["top"] < group[0]["bottom"] + tol \
                    and u["bottom"] > group[0]["top"] - tol:
                group.append(u)
                used[j] = True
        if len(group) >= min_cols + 1:
            groups.append(group)
    for group in groups:
        xs = sorted(v["x"] for v in group)
        top = min(v["top"] for v in group)
        bottom = max(v["bottom"] for v in group)
        left, right = xs[0], xs[-1]
        h_in = [r for r in underline_rects
                if r["y"] >= top - tol and r["y"] <= bottom + tol
                and r["left"] < right + tol and r["right"] > left - tol]
        if len(h_in) < min_rows:
            continue
        # dedupe near-equal x (double-struck borders)
        cols = []
        for x in xs:
            if not cols or x - cols[-1] > tol:
                cols.append(x)
        if len(cols) < min_cols + 1:
            continue
        tables.append({
            "bbox": {"left": left, "top": top, "right": right,
                     "bottom": bottom},
            "col_separators": cols[1:-1],
            "method": "ruled"})
    return tables


def detect_header_rule_tables(underline_rects, page) -> list[dict]:
    """Tables anchored to a "ruling row" — a y-band of 3+ horizontal
    rules with mutually disjoint x-extents (one per column, the classic
    financial-statement header separator).  Decision surface of
    detectPdfTables.js:3354 detectHeaderRuleTables:

    - y-band grouping (±3), ≥3 disjoint segments spanning ≥30% of page
      width; subset-geometry bands (subtotal rules) fold into the
      primary above them
    - upward header scan bounded by the previous primary's rule, gap
      limit 1.5× median header spacing (min 45)
    - downward data scan bounded by the next primary's header top, gap
      limit 2.5× median early-row spacing (min 80)
    - numeric validation: ≥5 rows hitting 2+ distinct columns with
      numeric words AND some non-label column numeric in ≥50% of rows
    """
    from ..text_tables import group_lines_into_rows
    lines = page.lines
    if not lines or not underline_rects:
        return []

    groups: list[dict] = []
    for hl in underline_rects:
        for g in groups:
            if abs(g["y"] - hl["y"]) <= 3:
                g["segs"].append(hl)
                g["y"] = sum(s["y"] for s in g["segs"]) / len(g["segs"])
                break
        else:
            groups.append({"y": hl["y"], "segs": [hl]})

    ruling = []
    for g in groups:
        if len(g["segs"]) < 3:
            continue
        segs = sorted(g["segs"], key=lambda s: s["left"])
        if any(segs[i]["left"] < segs[i - 1]["right"] - 1
               for i in range(1, len(segs))):
            continue
        if segs[-1]["right"] - segs[0]["left"] < page.width * 0.3:
            continue
        ruling.append({"y": g["y"],
                       "cols": [(s["left"], s["right"]) for s in segs]})
    if not ruling:
        return []
    ruling.sort(key=lambda r: r["y"])

    def subset_of(sub, primary, tol=5):
        return all(any(abs(c[0] - pc[0]) < tol and abs(c[1] - pc[1]) < tol
                       for pc in primary["cols"]) for c in sub["cols"])

    primaries = []
    for r in ruling:
        if not any(subset_of(r, p["rule"]) for p in primaries):
            left = r["cols"][0][0]
            right = r["cols"][-1][1]
            primaries.append({
                "rule": r, "left": left, "right": right,
                "slack": max(20.0, (right - left) * 0.02),
                "header_top": r["y"], "header_idx": []})

    # Pass 1: upward header scan.
    for pi, p in enumerate(primaries):
        upper = primaries[pi - 1]["rule"]["y"] + 5 if pi > 0 else 0
        above = [(i, ln) for i, ln in enumerate(lines)
                 if ln.bbox.bottom <= p["rule"]["y"]
                 and ln.bbox.bottom >= upper
                 and ln.bbox.left >= p["left"] - p["slack"]
                 and ln.bbox.right <= p["right"] + p["slack"]]
        above.sort(key=lambda t: -t[1].bbox.top)
        tops = sorted((ln.bbox.top for _, ln in above[:8]), reverse=True)
        spac = sorted(tops[i - 1] - tops[i] for i in range(1, len(tops)))
        med = spac[len(spac) // 2] if spac else 30.0
        gap_limit = max(med * 1.5, 45.0)
        prev_top = p["rule"]["y"]
        for i, ln in above:
            if prev_top - ln.bbox.top > gap_limit:
                break
            p["header_idx"].append(i)
            p["header_top"] = ln.bbox.top
            prev_top = ln.bbox.top

    # Pass 2: downward data scan + numeric validation.
    results = []
    for pi, p in enumerate(primaries):
        lower = primaries[pi + 1]["header_top"] - 1 \
            if pi + 1 < len(primaries) else page.height
        below = [(i, ln) for i, ln in enumerate(lines)
                 if ln.bbox.top >= p["rule"]["y"]
                 and ln.bbox.top <= lower
                 and ln.bbox.left >= p["left"] - p["slack"]
                 and ln.bbox.right <= p["right"] + p["slack"]]
        below.sort(key=lambda t: t[1].bbox.top)
        if len(below) < 2:
            continue
        early = sorted(below[i][1].bbox.top - below[i - 1][1].bbox.top
                       for i in range(1, min(len(below), 6)))
        med = early[len(early) // 2] if early else 30.0
        data_gap_limit = max(med * 2.5, 80.0)
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
        col_seps = [(cols[i - 1][1] + cols[i][0]) / 2.0
                    for i in range(1, len(cols))]
        bottom = max(p["rule"]["y"],
                     max(lines[i].bbox.bottom for i in data_idx))
        region = [lines[i] for i in data_idx]
        rows = group_lines_into_rows(region)
        if len(rows) < 3:
            continue

        bounds = [p["left"], *col_seps, p["right"]]
        n_cols = len(bounds) - 1
        col_hits = [0] * n_cols
        multi_col_rows = 0
        for row in rows:
            hit = set()
            for j in row["idx"]:
                for w in region[j].words:
                    t = w.text
                    if not re.search(r"\d", t) or \
                            not re.fullmatch(r"[\d,$%.()+-]+", t):
                        continue
                    cx = (w.bbox.left + w.bbox.right) / 2.0
                    for ci in range(n_cols):
                        if bounds[ci] <= cx < bounds[ci + 1]:
                            hit.add(ci)
                            break
            if len(hit) >= 2:
                multi_col_rows += 1
            for ci in hit:
                col_hits[ci] += 1
        if multi_col_rows < 5:
            continue
        if not any(col_hits[ci] >= len(rows) * 0.5
                   for ci in range(1, n_cols)):
            continue

        results.append({
            "bbox": {"left": p["left"], "right": p["right"],
                     "top": p["header_top"], "bottom": bottom},
            "col_separators": col_seps,
            "method": "header-rule"})
    return results
