"""Reading-order operators (SURVEY §2 M30).

* ``reorder_ocr_page`` — /root/reference/js/modifyOCR.js:195-237: stable
  re-sort of a page's lines by layout-region priority (regions with
  ``type='order'`` carry priority 0-99; unmatched lines fall to 100;
  ``type='exclude'`` regions drop lines entirely).
* ``reorder_two_columns`` — automatic variant of the column pass
  (analyzeLayout.js detectColumns consumer): detect a dominant vertical
  gutter and re-emit lines column-major (left column top-to-bottom, then
  right) — fixes raster-order interleave from line-oriented OCR sources.
"""

from __future__ import annotations

from .combine import _box_overlap


def reorder_ocr_page(page, layout_boxes: list, apply_exclude: bool = True):
    """layout_boxes: [{"coords": BBox, "type": "order"|"exclude",
    "order": int}] — mutates page.lines order in place."""
    if not layout_boxes:
        return page
    order_arr = [100] * len(page.lines)
    for i, line in enumerate(page.lines):
        for box in layout_boxes:
            if _box_overlap(line.bbox, box["coords"]) > 0.5:
                if box.get("type") == "order":
                    order_arr[i] = box.get("order", 100)
                elif box.get("type") == "exclude" and apply_exclude:
                    order_arr[i] = 101
    lines_new = []
    for prio in range(101):
        for j, o in enumerate(order_arr):
            if o == prio:
                lines_new.append(page.lines[j])
    page.lines = lines_new
    return page


def detect_column_gutter(page, min_lines: int = 6):
    """Returns the x of a dominant vertical gutter splitting the page into
    two columns, or None.  A gutter is a vertical band near mid-page that
    no line crosses, with enough lines fully on each side."""
    lines = [ln for ln in page.lines if ln.words]
    if len(lines) < min_lines:
        return None
    mid_lo = page.width * 0.35
    mid_hi = page.width * 0.65
    # candidate gutters: midpoints between right edges (left col) and
    # left edges (right col)
    candidates = set()
    for ln in lines:
        if mid_lo < ln.bbox.right < mid_hi:
            candidates.add(ln.bbox.right + 1)
        if mid_lo < ln.bbox.left < mid_hi:
            candidates.add(ln.bbox.left - 1)
    best = None
    for x in candidates:
        left = [ln for ln in lines if ln.bbox.right <= x]
        right = [ln for ln in lines if ln.bbox.left >= x]
        if len(left) + len(right) < len(lines):  # a line crosses the gutter
            continue
        if len(left) >= min_lines // 2 and len(right) >= min_lines // 2:
            balance = min(len(left), len(right))
            if best is None or balance > best[1]:
                best = (x, balance)
    return best[0] if best else None


def reorder_two_columns(page):
    """Detect a two-column layout and re-sort lines column-major.
    No-op when no clean gutter exists."""
    gutter = detect_column_gutter(page)
    if gutter is None:
        return page
    left = [ln for ln in page.lines if ln.bbox.right <= gutter]
    right = [ln for ln in page.lines if ln.bbox.left >= gutter]
    left.sort(key=lambda ln: ln.bbox.top)
    right.sort(key=lambda ln: ln.bbox.top)
    page.lines = left + right
    return page
