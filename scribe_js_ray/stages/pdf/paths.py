"""PDF vector-path extraction + graphics harvesting (SURVEY M28/M27/D4).

From-scratch analog of the reference's path machinery:

- ``execute_path_operators`` — walk a content stream tracking CTM /
  color / line-width state, emitting painted paths in device space
  (parsePdfPaths.js:193-596, with Form-XObject inlining :72-150)
- ``harvest_page_graphics`` — classify painted paths into underline /
  separator-rule rects, empty checkbox squares, and vertical ruling
  segments (parsePdfDoc.js:843-1008)

Table detection lives in ``tabledetect.py`` (the faithful
detectPdfTables.js pipeline); this module supplies it raw paths and
keeps the underline/rule/checkbox harvest (parsePdfDoc.js:843-1008 has
no dash or table logic — those are detectPdfTables-internal).

The per-page cost cap mirrors the reference: streams over 2 MB skip
path parsing entirely (parsePdfDoc.js:35 GRAPHICS_HEAVY_STREAM_BYTES).
"""

from __future__ import annotations

import re

from ...functions.stats import js_round
from .content import _mat_mul, tokenize_content
from .objects import Ref, StreamObj

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
                           tokens=None,
                           form_visited=None) -> list[PaintedPath]:
    """Painted paths of one content stream, coordinates in device space.
    ``tokens``: pre-tokenized stream shared with the text pass.
    ``form_visited``: per-page set of form object numbers — the
    reference inlines each Form XObject's paths at most ONCE per page
    (inlineFormXObjects parsePdfPaths.js:83-132 visited set); a repeat
    Do survives as an opaque placement, contributing no paths."""
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
                ref = xobjects.get(str(operands[0]))
                xo = pdf.resolve(ref)
                if isinstance(xo, StreamObj) and \
                        str(pdf.resolve(xo.dict.get("Subtype", ""))) == \
                        "Form":
                    if form_visited is None:
                        form_visited = set()
                    num = ref.num if isinstance(ref, Ref) else id(xo)
                    if num in form_visited:
                        continue
                    form_visited.add(num)
                    matrix = pdf.resolve(xo.dict.get("Matrix")) \
                        or [1, 0, 0, 1, 0, 0]
                    res = pdf.resolve(xo.dict.get("Resources")) or {}
                    sub_xobjs = pdf.resolve(res.get("XObject")) or {}
                    sub_ctm = _mat_mul(
                        tuple(float(v) for v in matrix), ctm)
                    try:
                        out.extend(execute_path_operators(
                            pdf, pdf.stream_bytes(xo), sub_xobjs,
                            sub_ctm, depth + 1,
                            form_visited=form_visited))
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
    - ``fill_squares``: small unfilled squares — the fillSquares raw
      surface parsePdfDoc.js:844-847 carries per page ("raw material
      for fillable-area detection"; the context gates live in the
      detector, not here)

    Table-detection geometry (h/v rulings, dash trains, band fills) is
    NOT harvested here — tabledetect.py classifies raw paths itself,
    mirroring the reference's split between the parsePdfDoc harvest
    and detectPdfTables' classifyPaths.
    """
    underline_rects = []
    fill_squares = []

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
                pass  # vertical rulings are tabledetect's concern
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
        key = (js_round(sq["left"]), js_round(sq["top"]),
               js_round(sq["right"]), js_round(sq["bottom"]))
        prev = by_key.get(key)
        if prev:
            prev["stroke"] = prev["stroke"] or sq["stroke"]
        else:
            by_key[key] = sq
    return {"underline_rects": underline_rects,
            "fill_squares": list(by_key.values())}


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
