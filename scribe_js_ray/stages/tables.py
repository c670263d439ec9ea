"""OCR-side table detection + content extraction (SURVEY §2 M27, OCR path).

References:
* ``split_line_aggressively`` — /root/reference/js/utils/ocrUtils.js:142-175:
  split a line wherever the inter-word gap exceeds the line height.
* ``detect_tables_in_page`` — /root/reference/js/utils/detectTables.js:61-285:
  group lines into rows by vertical proximity (threshold 10), detect runs of
  ≥4 numeric rows with compatible column counts (±1 or no 2-to-1 word
  overlap), extend through interleaved non-numeric rows when the next two
  rows continue the table, attach up to two compatible header rows; returns
  table bboxes.
* ``calc_column_bounds`` — detectTables.js:12-55: greedy horizontal
  clustering with ±5 px tolerance, adjacent bounds expanded to touch.
* ``make_table_from_bbox`` / ``extract_table_content`` — detectTables.js:287-322
  + /root/reference/js/extractTables.js:11-319 (simplified: words assigned to
  columns by bbox center, rows by line grouping).

Per-page pure functions (map_batches-friendly).  Detected table regions
feed the layout pass's numeric-furniture suppression and the markdown
table renderer in later rounds.
"""

from __future__ import annotations

import re

from ..functions.stats import mean50
from ..model import BBox, Line, Page, bbox_union, update_line_bbox

_NUM_RE = re.compile(r"[0-9]")


def split_line_aggressively(line: Line) -> list[Line]:
    """Split on inter-word gaps wider than the line height."""
    if not line.words:
        return [line]
    line_height = line.bbox.bottom - line.bbox.top
    lines_out: list[Line] = []
    word_prev = line.words[0]

    def new_line(first_word):
        ln = Line(line.page, line.bbox.copy(), list(line.baseline),
                  line.asc_height, line.x_height)
        ln.orientation = line.orientation
        ln.par = line.par
        ln.words = [first_word]
        return ln

    current = new_line(line.words[0])
    for word in line.words[1:]:
        if word.bbox.left - word_prev.bbox.right > line_height:
            lines_out.append(current)
            current = new_line(word)
        else:
            current.words.append(word)
        word_prev = word
    lines_out.append(current)
    for ln in lines_out:
        update_line_bbox(ln)
    return lines_out


def calc_column_bounds(bounding_boxes) -> list[tuple[float, float]]:
    """Greedy horizontal clustering of bboxes into column bounds."""
    tolerance = 5
    bounds: list[list[float]] = []
    for box in sorted(bounding_boxes, key=lambda b: b.left):
        for col in bounds:
            if box.left <= col[1] + tolerance and \
                    box.right >= col[0] - tolerance:
                col[0] = min(col[0], box.left)
                col[1] = max(col[1], box.right)
                break
        else:
            bounds.append([box.left, box.right])
    for i in range(len(bounds) - 1):
        mid = (bounds[i][1] + bounds[i + 1][0]) / 2
        bounds[i][1] = mid
        bounds[i + 1][0] = mid
    return [(lo, hi) for lo, hi in bounds]


def _horizontal_overlap(a: BBox, b: BBox) -> float:
    return max(0.0, min(a.right, b.right) - max(a.left, b.left))


def detect_tables_in_page(page: Page) -> list[BBox]:
    """Returns bboxes of detected table regions."""
    lines = sorted(page.lines, key=lambda ln: ln.bbox.top)
    row_threshold = 10

    rows: list[dict] = []
    for item in lines:
        for row in rows:
            if abs(item.bbox.top - row["avg_top"]) <= row_threshold:
                row["items"].append(item)
                row["avg_top"] = sum(x.bbox.top for x in row["items"]) / \
                    len(row["items"])
                break
        else:
            rows.append({"avg_top": item.bbox.top, "items": [item]})
    for row in rows:
        row["items"].sort(key=lambda ln: ln.bbox.left)

    def contains_numbers(row) -> bool:
        n = sum(1 for ln in row["items"] for w in ln.words
                if _NUM_RE.search(w.text))
        return n >= 4

    def split_row(row):
        items = []
        for ln in row["items"]:
            items.extend(split_line_aggressively(ln))
        return {"avg_top": row["avg_top"], "items": items}

    def has_word_overlap(lines_a, lines_b) -> bool:
        for line_i in lines_a:
            overlap_lines = []
            for line_j in lines_b:
                if line_i.bbox.right < line_j.bbox.left:
                    break
                if _horizontal_overlap(line_i.bbox, line_j.bbox) > 0:
                    overlap_lines.append(line_j)
            if len(overlap_lines) > 1:
                words_j = [w for ln in overlap_lines for w in ln.words]
                for word_i in line_i.words:
                    count = 0
                    for word_j in words_j:
                        if _horizontal_overlap(word_i.bbox,
                                               word_j.bbox) > 0:
                            count += 1
                            if count >= 2:
                                return True
        return False

    def is_compat(table_rows, row) -> bool:
        if not table_rows:
            return False
        expected = mean50([len(x["items"]) for x in table_rows])
        existing = [ln for x in table_rows for ln in x["items"]]
        if abs(expected - len(row["items"])) <= 1:
            return True
        if has_word_overlap(existing, row["items"]) or \
                has_word_overlap(row["items"], existing):
            return False
        return True

    min_rows = 4
    tables: list[list] = []
    current: list = []
    current_compat: list = []
    start_index = 0
    rows_split = [split_row(r) for r in rows]

    def header_rows_for():
        headers = []
        prev1 = rows_split[start_index - 1] if start_index >= 1 else None
        in_last = tables and prev1 in tables[-1]
        if prev1 and not in_last and is_compat(current_compat, prev1):
            headers.append(prev1)
            prev2 = rows_split[start_index - 2] if start_index >= 2 else None
            in_last2 = tables and prev2 in tables[-1]
            if prev2 and not in_last2 and is_compat(current_compat, prev2):
                headers.append(prev2)
        return headers

    i = 0
    while i < len(rows_split):
        row_split = rows_split[i]
        if contains_numbers(row_split):
            if current:
                if is_compat(current_compat, row_split):
                    current.append(row_split)
                    current_compat.append(row_split)
                elif len(current) >= min_rows:
                    tables.append(header_rows_for() + current)
                    current = [row_split]
                    current_compat = [row_split]
                    start_index = i
                else:
                    current = [row_split]
                    current_compat = [row_split]
                    start_index = i
            else:
                current.append(row_split)
                current_compat.append(row_split)
                start_index = i
        elif current:
            nxt = rows_split[i + 1] if i + 1 < len(rows_split) else None
            nxt2 = rows_split[i + 2] if i + 2 < len(rows_split) else None
            if nxt and nxt2 and contains_numbers(nxt) and \
                    contains_numbers(nxt2) and \
                    is_compat(current_compat, nxt) and \
                    is_compat(current_compat, nxt2):
                current.append(row_split)
                i += 1
                continue
            if len(current) >= min_rows:
                tables.append(header_rows_for() + current)
            current = []
            current_compat = []
        i += 1
    if len(current) >= min_rows:
        tables.append(header_rows_for() + current)

    return [bbox_union(
        bbox_union(it.bbox for it in row["items"]) for row in table)
        for table in tables]


def _overlap_frac(a: BBox, b) -> float:
    """Intersection area over box A's area (miscUtils.js:27-42
    calcBoxOverlap)."""
    left = max(a.left, b[0])
    top = max(a.top, b[1])
    right = min(a.right, b[2])
    bottom = min(a.bottom, b[3])
    w = right - left
    h = bottom - top
    if w < 0 or h < 0:
        return 0.0
    area_a = (a.bottom - a.top) * (a.right - a.left)
    return (w * h) / area_a if area_a > 0 else 0.0


def extract_table_content(page: Page, table_bbox: BBox,
                          col_separators=None):
    """Table bbox → rows of column-ordered cell TEXTS (consumption
    order — the markdown/text surfaces join here).  The word-level view
    is :func:`extract_table_words` (the xlsx writer re-sorts each cell
    by bbox.left exactly like writeTabular.js:97)."""
    return [[" ".join(w.text for w in cell) for cell in row]
            for row in extract_table_words(page, table_bbox,
                                           col_separators)]


def extract_table_words(page: Page, table_bbox: BBox,
                        col_separators=None):
    """Table bbox → rows of per-cell WORD lists — the reference's
    word-level extraction (extractTables.js:26-222
    extractSingleTableContent, inclusionLevel='word' /
    inclusionRule='majority' as detection-created columns carry): each
    word joins the leftmost column box its bbox majority-overlaps; rows
    build greedily from the highest unassigned word's bottom, pulling
    every column's next words whose boxes majority-overlap the row band
    (multiple hOCR lines on one visual baseline land in one row).

    ``col_separators`` (from the detector) take precedence over
    re-derived bounds; the column boxes span the full table height like
    parsePdfDoc.js:3268-3274."""
    if col_separators:
        edges = [table_bbox.left] + sorted(col_separators) + \
            [table_bbox.right]
        bounds = list(zip(edges[:-1], edges[1:]))
    else:
        lines = [ln for ln in page.lines
                 if _overlap_frac(ln.bbox,
                                  (table_bbox.left, table_bbox.top,
                                   table_bbox.right,
                                   table_bbox.bottom)) > 0.5]
        split_lines = []
        for ln in lines:
            split_lines.extend(split_line_aggressively(ln))
        bounds = calc_column_bounds([ln.bbox for ln in split_lines])
    if not bounds:
        return []
    col_boxes = [(lo, table_bbox.top, hi, table_bbox.bottom)
                 for lo, hi in bounds]

    # Word → leftmost majority-overlapping column (:89-130).
    cols: list[list] = [[] for _ in bounds]
    for ln in page.lines:
        if ln.bbox.left > table_bbox.right \
                or ln.bbox.right < table_bbox.left \
                or ln.bbox.top > table_bbox.bottom \
                or ln.bbox.bottom < table_bbox.top:
            continue
        for w in ln.words:
            for ci, cb in enumerate(col_boxes):
                if _overlap_frac(w.bbox, cb) > 0.5:
                    cols[ci].append(w)
                    break
    for c in cols:
        c.sort(key=lambda w: w.bbox.bottom)

    # Greedy spatial row construction (:180-219).
    idx = [0] * len(cols)
    out = []
    while any(idx[i] < len(cols[i]) for i in range(len(cols))):
        comp_bottom = min(cols[i][idx[i]].bbox.bottom
                          for i in range(len(cols))
                          if idx[i] < len(cols[i]))
        row_box = (0.0, 0.0, 5000.0, comp_bottom)
        cells = []
        consumed = 0
        for i in range(len(cols)):
            words = []
            j = idx[i]
            while j < len(cols[i]):
                if _overlap_frac(cols[i][j].bbox, row_box) > 0.5:
                    words.append(cols[i][j])
                    idx[i] += 1
                    j += 1
                    consumed += 1
                else:
                    break
            cells.append(words)
        if consumed == 0:
            # Progress guard: a word whose box lies outside the 5000px
            # row band (e.g. a >5000px-wide 600-dpi page) can never
            # reach >0.5 overlap; force-consume the band-defining word
            # so the loop terminates (the JS shares the 5000 constant
            # and the latent hang, extractTables.js:196).
            for i in range(len(cols)):
                if idx[i] < len(cols[i]) \
                        and cols[i][idx[i]].bbox.bottom == comp_bottom:
                    cells[i] = [cols[i][idx[i]]]
                    idx[i] += 1
                    break
        out.append(cells)
    return out
