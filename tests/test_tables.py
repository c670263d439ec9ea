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
