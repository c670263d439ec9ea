"""OCR-side table detection (detectTables.js analog)."""

from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.tables import (
    calc_column_bounds, detect_tables_in_page, extract_table_content,
    split_line_aggressively)

from tests.test_formats import make_alto


def _numeric_table_page(n_rows=6):
    """Page with a title line + an n-row, 3-column numeric table.
    Columns are separated by wide gaps (wider than line height)."""
    lines = [[("Quarterly", {}), ("Report", {})]]
    for r in range(n_rows):
        lines.append([(f"r{r}c0v1", {}), (f"{100 + r}", {}),
                      (f"{200 + r}", {}), (f"{300 + r}", {})])
    xml = make_alto(lines)
    page, _ = parse_alto_page(xml, 0)
    # widen gaps: words are laid out tightly by make_alto; move words of
    # each table line into 3 clusters with ~500px gaps
    for ln in page.lines[1:]:
        xs = [150, 900, 1400, 1800]
        for w, x in zip(ln.words, xs):
            width = w.bbox.right - w.bbox.left
            w.bbox.left = x
            w.bbox.right = x + width
        from scribe_js_ray.model import update_line_bbox
        update_line_bbox(ln)
    return page


def test_split_line_aggressively():
    page = _numeric_table_page()
    parts = split_line_aggressively(page.lines[1])
    assert len(parts) >= 3  # wide gaps split the line
    total_words = sum(len(p.words) for p in parts)
    assert total_words == len(page.lines[1].words)


def test_calc_column_bounds():
    page = _numeric_table_page()
    split = []
    for ln in page.lines[1:]:
        split.extend(split_line_aggressively(ln))
    bounds = calc_column_bounds([ln.bbox for ln in split])
    assert len(bounds) >= 3
    # bounds touch (no empty space between columns)
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo


def test_detect_numeric_table():
    page = _numeric_table_page(6)
    bboxes = detect_tables_in_page(page)
    assert len(bboxes) == 1
    tb = bboxes[0]
    # the table region covers the numeric rows, not the title
    assert tb.top > page.lines[0].bbox.top


def test_no_table_in_prose():
    xml = make_alto([[("just", {}), ("words", {}), ("here", {})]
                     for _ in range(8)])
    page, _ = parse_alto_page(xml, 0)
    assert detect_tables_in_page(page) == []


def test_extract_table_content():
    page = _numeric_table_page(5)
    bboxes = detect_tables_in_page(page)
    rows = extract_table_content(page, bboxes[0])
    assert len(rows) >= 5
    # each row has ≥3 non-empty cells
    non_empty = [sum(1 for c in r if c) for r in rows]
    assert all(n >= 3 for n in non_empty)
    assert any("100" in c for c in rows[0])


def test_ruled_pdf_table_renders_in_markdown():
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    from scribe_js_ray.stages.pdf import parse_pdf_document
    from scribe_js_ray.stages.exports import write_markdown

    rows = ["1 w"]
    data = [("alpha", "beta"), ("gamma", "delta"), ("epsilon", "zeta")]
    for i, (a, b) in enumerate(data):
        y = 680 - i * 30
        rows.append(f"BT /F1 10 Tf 110 {y} Td ({a}) Tj ET")
        rows.append(f"BT /F1 10 Tf 260 {y} Td ({b}) Tj ET")
    for yy in (650, 680, 712):
        rows.append(f"100 {yy} m 400 {yy} l S")
    for xx in (100, 250, 400):
        rows.append(f"{xx} 590 m {xx} 712 l S")
    rows.append("BT /F1 12 Tf 72 750 Td "
                "(Preamble paragraph text with plenty of characters to "
                "clear the page threshold here) Tj ET")
    pages, _ = parse_pdf_document(_make_pdf([" ".join(rows)],
                                            {"F1": "Helvetica"}))
    assert pages[0].table_boxes  # ruled grid detected
    md = write_markdown(pages, detect_tables=True)
    assert "| alpha | beta |" in md.replace("  ", " ")


# ---------------- borderless (text-alignment) tables: stages/text_tables


def _page_with_cell_lines(rows, title=None, width=2000, height=3000,
                          y0=300, pitch=40):
    """Page whose table cells are SEPARATE Line objects at shared y
    (the multi-segment-row shape of detectPdfTables.js Phase 1)."""
    from scribe_js_ray.model import BBox, Line, Page, Word
    page = Page(0, width, height)
    y = y0
    if title is not None:
        ln = Line(page, BBox(150, y, 150 + 60 * len(title.split()), y + 24),
                  [0.0, 0.0])
        for k, t in enumerate(title.split()):
            ln.words.append(Word(ln, f"t{k}", t,
                                 BBox(150 + 60 * k, y, 150 + 60 * k + 50,
                                      y + 24)))
        page.lines.append(ln)
        y += pitch * 3
    for r, cells in enumerate(rows):
        xs = [150, 900, 1400, 1800]
        for c, text in enumerate(cells):
            x = xs[c]
            ln = Line(page, BBox(x, y, x, y + 24), [0.0, 0.0])
            wx = x
            for k, tok in enumerate(text.split()):
                ww = 14 * max(len(tok), 3)
                ln.words.append(Word(ln, f"w{r}_{c}_{k}", tok,
                                     BBox(wx, y, wx + ww, y + 24)))
                wx += ww + 8
            ln.bbox.right = wx - 8
            page.lines.append(ln)
        y += pitch
    return page


def test_text_tables_multiline_rows():
    from scribe_js_ray.stages.text_tables import detect_text_tables
    rows = [["Alpha", "1,234", "5,678", "9,012"],
            ["Beta", "2,345", "6,789", "123"],
            ["Gamma", "3,456", "7,890", "234"],
            ["Delta", "4,567", "8,901", "345"]]
    page = _page_with_cell_lines(rows, title="Annual results table")
    out = detect_text_tables(page)
    assert len(out) == 1
    t = out[0]
    # 4 columns → 3 interior separators between the x-clusters
    assert len(t["col_separators"]) == 3
    assert t["method"] == "text"
    # region covers the data rows, not the title
    assert t["bbox"]["top"] > page.lines[0].bbox.top


def test_text_tables_single_line_rows_right_clustered():
    """Financial-statement shape: each visual row is ONE line (label +
    right-clustered numerics), rows within a <300-unit cluster — the
    dot-leader path of Phase 0 (detectPdfTables.js:83-96)."""
    from scribe_js_ray.model import BBox, Line, Page, Word
    from scribe_js_ray.stages.text_tables import detect_text_tables
    page = Page(0, 2000, 3000)
    y = 300
    for r in range(6):
        toks = [f"item{r}", f"{1000 + r}", f"{2000 + r}", f"{3000 + r}"]
        ln = Line(page, BBox(150, y, 150, y + 24), [0.0, 0.0])
        xs = [150, 900, 1400, 1800]
        for k, (tok, x) in enumerate(zip(toks, xs)):
            ln.words.append(Word(ln, f"w{r}_{k}", tok,
                                 BBox(x, y, x + 14 * len(tok), y + 24)))
        ln.bbox.right = xs[-1] + 14 * len(toks[-1])
        page.lines.append(ln)
        y += 40
    out = detect_text_tables(page)
    assert len(out) == 1


def test_text_tables_reject_prose():
    from scribe_js_ray.stages.text_tables import detect_text_tables
    xml = make_alto([[("plain", {}), ("prose", {}), ("words", {}),
                      ("flowing", {}), ("along", {})] for _ in range(8)])
    page, _ = parse_alto_page(xml, 0)
    assert detect_text_tables(page) == []


def test_text_tables_reject_narrative_cells():
    """Address-block style rows (all wide narrative cells) must not
    become a table (validateCandidate check 6)."""
    from scribe_js_ray.stages.text_tables import detect_text_tables
    rows = [["Contact the office", "Write us a letter soon",
             "Visit the branch today", "Call the number listed"]
            for _ in range(5)]
    page = _page_with_cell_lines(rows)
    assert detect_text_tables(page) == []


def test_borderless_pdf_table_renders_in_markdown():
    """End-to-end: a borderless numeric table in a synthetic PDF lands
    in page.table_boxes and the markdown export renders a pipe table."""
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    from scribe_js_ray.stages.exports import write_markdown
    from scribe_js_ray.stages.pdf import parse_pdf_document

    ops = ["BT /F1 12 Tf 72 740 Td (Production volumes by region for "
           "the preceding fiscal periods) Tj ET"]
    data = [("North", "1,234", "5,678", "9,012"),
            ("South", "2,345", "6,789", "1,023"),
            ("East", "3,456", "7,890", "2,034"),
            ("West", "4,567", "8,901", "3,045")]
    xs = (72, 250, 350, 450)
    for i, cells in enumerate(data):
        y = 690 - i * 22
        for x, cell in zip(xs, cells):
            ops.append(f"BT /F1 10 Tf {x} {y} Td ({cell}) Tj ET")
    pages, _ = parse_pdf_document(
        _make_pdf([" ".join(ops)], {"F1": "Helvetica"}))
    assert pages[0].table_boxes  # borderless region detected
    md = write_markdown(pages, detect_tables=True)
    assert "| North | 1,234" in md.replace("  ", " ")


def test_header_band_detected_and_rendered():
    """A 4-cell all-text header row above the data band is detected with
    strong confidence, the region extends over it, and the markdown
    export renders it as the pipe-table header."""
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    from scribe_js_ray.stages.exports import write_markdown
    from scribe_js_ray.stages.pdf import parse_pdf_document
    from scribe_js_ray.stages.text_tables import detect_headers, \
        detect_text_tables, find_table_like_rows, \
        group_rows_into_candidates, validate_candidate

    ops = ["BT /F1 12 Tf 72 750 Td (A preamble paragraph of prose that "
           "sits well above the data region) Tj ET"]
    # stacked 2-cell headers over the two numeric columns (Rule 2,
    # detectPdfTables.js:2609-2664) — 2-cell textual rows are NOT
    # table-like, so they sit above the candidate
    for y, (ha, hb) in ((716, ("Alpha", "Beta")),
                        (704, ("Units", "Units"))):
        ops.append(f"BT /F1 9 Tf 250 {y} Td ({ha}) Tj ET")
        ops.append(f"BT /F1 9 Tf 350 {y} Td ({hb}) Tj ET")
    data = [("North", "1,234", "5,678"),
            ("South", "2,345", "6,789"),
            ("East", "3,456", "7,890"),
            ("West", "4,567", "8,901")]
    xs = (72, 250, 350)
    for i, cells in enumerate(data):
        y = 690 - i * 22
        for x, cell in zip(xs, cells):
            ops.append(f"BT /F1 10 Tf {x} {y} Td ({cell}) Tj ET")
    pages, _ = parse_pdf_document(
        _make_pdf([" ".join(ops)], {"F1": "Helvetica"}))
    page = pages[0]
    tl = find_table_like_rows(page.lines)
    cands = group_rows_into_candidates(tl, page.lines, page.height)
    cand = next(c for c in cands if validate_candidate(c, page.lines))
    h = detect_headers(cand, page.lines)
    assert h is not None and h["confidence"] == "strong"
    assert len(h["column_anchors"]) == 2   # stacked-rule anchors
    regions = detect_text_tables(page)
    assert regions
    # region extends over the header band
    assert regions[0]["bbox"]["top"] <= h["band_top"] + 1
    md = write_markdown(pages, detect_tables=True)
    flat = md.replace("  ", " ")
    assert "Alpha | Beta" in flat          # header rows inside the table
    assert "| North | 1,234" in flat


def test_extract_table_content_terminates_beyond_row_band():
    """A word whose bbox lies entirely right of the 5000px row band can
    never majority-overlap the greedy row box; the progress guard must
    force-consume it instead of spinning forever (600-dpi pages exceed
    5000px width; the reference shares the 5000 constant and the
    latent hang, extractTables.js:196)."""
    from scribe_js_ray.model import BBox, Line, Page, Word
    from scribe_js_ray.stages.tables import extract_table_content

    page = Page(0, 6000, 4000)
    ln = Line(page, BBox(100, 100, 5600, 130), [0, -4], 20, None)
    for i, (x0, x1, t) in enumerate([(100, 300, "label"),
                                     (5100, 5300, "far1"),
                                     (5400, 5600, "far2")]):
        w = Word(ln, f"w{i}", t, BBox(x0, 100, x1, 130))
        w.conf = 95
        ln.words.append(w)
    page.lines.append(ln)
    rows = extract_table_content(page, BBox(50, 50, 5700, 200),
                                 col_separators=[4000.0])
    flat = " ".join(c for r in rows for c in r if c)
    assert "label" in flat and "far1" in flat and "far2" in flat
