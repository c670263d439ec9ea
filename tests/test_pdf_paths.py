"""PDF vector paths (SURVEY M28/M27/D4): painted-path execution,
underline/rule/checkbox harvesting, ruled-grid table detection."""

from scribe_js_ray.model import page_text
from scribe_js_ray.sources.synth_pdf import _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.paths import (
    detect_ruled_tables, harvest_page_graphics)

F = {"F1": "Helvetica"}


def _page(stream: str):
    pages, _ = parse_pdf_document(_make_pdf([stream], F))
    return pages[0]


def test_underlined_word_flagged():
    # "Underlined" at 72,700 (12pt); a 0.8pt-tall bar just below the
    # baseline spanning the word.
    stream = ("BT /F1 12 Tf 72 700 Td (Underlined word) Tj ET "
              "72 697.5 60 0.8 re f")
    page = _page(stream)
    words = {w.text: w for ln in page.lines for w in ln.words}
    assert words["Underlined"].style.underline
    assert not words["word"].style.underline
    # the consumed rect is NOT carried as a separator rule
    assert page.rules == []


def test_separator_rule_carried_on_page():
    # A full-width rule far from any text baseline stays a page rule.
    stream = ("BT /F1 12 Tf 72 700 Td (Heading text) Tj ET "
              "72 600 468 0.7 re f")
    page = _page(stream)
    assert len(page.rules) == 1
    r = page.rules[0]
    assert r["right"] - r["left"] > 400 * (300 / 72) * 0.9


def test_stroked_line_is_rule_too():
    stream = ("BT /F1 12 Tf 72 700 Td (Body) Tj ET "
              "1 w 72 600 m 540 600 l S")
    page = _page(stream)
    assert len(page.rules) == 1


def test_ruled_grid_table_detected():
    # 3 vertical rulings + 3 horizontal rules → one 2-column table box.
    rows = ["%d w" % 1]
    for y in (500, 540, 580):
        rows.append(f"100 {y} m 400 {y} l S")
    for x in (100, 250, 400):
        rows.append(f"{x} 500 m {x} 580 l S")
    stream = "BT /F1 12 Tf 72 700 Td (Caption) Tj ET " + " ".join(rows)
    page = _page(stream)
    assert len(page.table_boxes) == 1
    tb = page.table_boxes[0]
    s = 300 / 72
    assert abs(tb["left"] - 100 * s) < 2 * s
    assert abs(tb["right"] - 400 * s) < 2 * s


def test_checkbox_squares_harvested():
    from scribe_js_ray.stages.pdf.objects import PdfFile
    from scribe_js_ray.stages.pdf.paths import execute_path_operators
    data = _make_pdf(["1 w 100 500 12 12 re S 100 500 12 12 re f "
                      "0 0 0 rg 300 500 12 12 re f"], F)
    pdf = PdfFile(data)
    from scribe_js_ray.stages.pdf.doc import _walk_pages
    info = _walk_pages(pdf)[0]
    content = pdf.stream_bytes(info["_node"]["Contents"])
    paths = execute_path_operators(pdf, content)
    g = harvest_page_graphics(paths, 792.0, 1.0)
    # stroked + white-filled twin collapse to ONE candidate; the black
    # (ink) fill at x=300 is never a checkbox candidate
    assert len(g["fill_squares"]) == 1
    assert g["fill_squares"][0]["stroke"]


def test_table_region_suppresses_line_number_rule():
    # A bordered table whose first column is 1..10 must NOT read as a
    # line-number margin (in_table gate).
    body = []
    for p in range(3):
        rows = []
        for i in range(10):
            y = 700 - i * 20
            rows.append(f"BT /F1 10 Tf 80 {y} Td ({i + 1}) Tj ET")
            rows.append(f"BT /F1 10 Tf 160 {y} Td (data value here) Tj ET")
        # grid: verticals at 280 span + horizontals
        for yy in (520, 600, 712):
            rows.append(f"70 {yy} m 300 {yy} l S")
        for xx in (70, 150, 300):
            rows.append(f"{xx} 520 m {xx} 712 l S")
        body.append(" ".join(rows))
    pages, _ = parse_pdf_document(_make_pdf(body, F))
    from scribe_js_ray.stages.layout import analyze_layout
    analyze_layout(pages)
    # the numbers survive extraction (not stripped as linenum furniture)
    assert "3" in page_text(pages[0])
    for page in pages:
        for par in page.pars:
            assert par.type != "linenum"


def test_detect_ruled_tables_unit():
    h = [{"left": 0, "right": 200, "y": y, "color": None}
         for y in (10, 50, 90)]
    v = [{"x": x, "top": 8, "bottom": 92} for x in (0, 100, 200)]
    tables = detect_ruled_tables(h, v)
    assert len(tables) == 1
    assert tables[0]["col_separators"] == [100]


def test_separator_rule_splits_paragraph():
    # Two tightly-pitched line groups with a drawn rule between them:
    # without the rule they'd reflow into one paragraph.
    rows = []
    for i, y in enumerate((700, 686, 672)):
        rows.append(f"BT /F1 12 Tf 72 {y} Td "
                    f"(first block line {i} words here) Tj ET")
    rows.append("72 664 200 0.7 re f")
    for i, y in enumerate((658, 644, 630)):
        rows.append(f"BT /F1 12 Tf 72 {y} Td "
                    f"(second block line {i} words here) Tj ET")
    pages, _ = parse_pdf_document(_make_pdf([" ".join(rows)], F))
    from scribe_js_ray.stages.layout import analyze_layout
    analyze_layout(pages)
    pars = pages[0].pars
    assert len(pars) >= 2
    reasons = {p.reason for p in pars}
    assert "separator rule" in reasons


def test_footnote_rule_marks_note_region():
    # Body lines, then a short left-anchored rule low on the page, then
    # smaller note text below — the rule corroborates a footnote region.
    rows = []
    for i in range(6):
        y = 700 - 18 * i
        rows.append(f"BT /F1 12 Tf 72 {y} Td "
                    f"(body paragraph line number {i} with many more "
                    f"words of content) Tj ET")
    rows.append("72 200 60 0.7 re f")  # short separator
    rows.append("BT /F1 8 Tf 72 185 Td "
                "(1 note text in smaller print here) Tj ET")
    rows.append("BT /F1 8 Tf 72 170 Td "
                "(continuing the small note content) Tj ET")
    pages, _ = parse_pdf_document(_make_pdf([" ".join(rows)], F))
    from scribe_js_ray.stages.layout import analyze_layout
    analyze_layout(pages)
    note_pars = [p for p in pages[0].pars if p.type == "footnote"]
    assert note_pars
    note_text = " ".join(w.text for p in note_pars for ln in p.lines
                         for w in ln.words)
    assert "note" in note_text
    assert "body paragraph" not in note_text
