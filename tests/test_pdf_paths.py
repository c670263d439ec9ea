"""PDF vector paths (SURVEY M28/M27/D4): painted-path execution,
underline/rule/checkbox harvesting, ruled-grid table detection."""

from scribe_js_ray.model import page_text
from scribe_js_ray.sources.synth_pdf import _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.paths import harvest_page_graphics

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
    """A fully bordered grid WITH cell text detects as grid-strong with
    the drawn column separator; an empty grid (no text rows inside)
    detects nothing — both verified against the live reference."""
    rows = ["1 w"]
    ys = [700, 670, 640, 610, 580]
    xs = [100, 400, 700]
    for y in ys:
        rows.append(f"{xs[0]} {y} m {xs[-1]} {y} l S")
    for x in xs:
        rows.append(f"{x} {ys[-1]} m {x} {ys[0]} l S")
    for i in range(4):
        y = ys[i] - 22
        rows.append(f"BT /F1 10 Tf 110 {y} Td (name{i}) Tj ET")
        rows.append(f"BT /F1 10 Tf 410 {y} Td ({100 + i}.50) Tj ET")
    rows.append("BT /F1 12 Tf 72 750 Td (Intro paragraph text with "
                "plenty of characters here) Tj ET")
    page = _page(" ".join(rows))
    assert [t["method"] for t in page.table_boxes] == ["grid-strong"]
    tb = page.table_boxes[0]
    s = 300 / 72
    assert len(tb["col_separators"]) == 1
    assert abs(tb["col_separators"][0] - 400 * s) < 2 * s

    # empty grid: no text rows inside → no table (reference parity)
    rows2 = ["1 w"]
    for y in (500, 540, 580):
        rows2.append(f"100 {y} m 400 {y} l S")
    for x in (100, 250, 400):
        rows2.append(f"{x} 500 m {x} 580 l S")
    page2 = _page("BT /F1 12 Tf 72 700 Td (Caption) Tj ET "
                  + " ".join(rows2))
    assert page2.table_boxes == []
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
    # A bordered NUMERIC table whose first column is 1..10 must NOT
    # read as a line-number margin (in_table gate).  The gate requires
    # the region to be predominantly numeric (parsePdfDoc.js:1240-1250)
    # — a transcript-like region of prose cells stays ELIGIBLE for the
    # line-number rules (its margin numbers are real furniture).
    body = []
    for p in range(3):
        rows = []
        for i in range(10):
            y = 700 - i * 20
            rows.append(f"BT /F1 10 Tf 80 {y} Td ({i + 1}) Tj ET")
            rows.append(f"BT /F1 10 Tf 160 {y} Td ({i * 7}.25) Tj ET")
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


def test_strict_grid_rejects_narrow_and_empty():
    """try_detect_strict_grid: a grid narrower than 30% of the page, or
    one without 2+ data strips of line content, returns None
    (detectPdfTables.js:2298-2340)."""
    from scribe_js_ray.model import Page
    from scribe_js_ray.stages.pdf.tabledetect import try_detect_strict_grid
    page = Page(0, 2550, 3300)
    hs = [{"left": 100, "right": 300, "y": y} for y in (500, 560, 620)]
    vs = [{"x": x, "top": 500, "bottom": 620} for x in (100, 200, 300)]
    assert try_detect_strict_grid(hs, vs, page) is None  # 200px < 30%
def test_separator_rule_splits_paragraph():
    # Reference-verified pair (tests/refharness): a rule drawn in a REAL
    # inter-line gap splits (decideBreak strict rule.y > prev.bottom);
    # one inside the previous line's descender band does NOT.
    def build(rule_y, second_ys):
        rows = []
        for i, y in enumerate((700, 686, 672)):
            rows.append(f"BT /F1 12 Tf 72 {y} Td "
                        f"(first block line {i} words here) Tj ET")
        rows.append(f"72 {rule_y} 200 0.7 re f")
        for i, y in enumerate(second_ys):
            rows.append(f"BT /F1 12 Tf 72 {y} Td "
                        f"(second block line {i} words here) Tj ET")
        return _make_pdf([" ".join(rows)], F)

    from scribe_js_ray.stages.layout import analyze_layout
    pages, _ = parse_pdf_document(build(655, (640, 626, 612)))
    analyze_layout(pages)
    assert len(pages[0].pars) >= 2
    assert any(p.reason == "separator rule" for p in pages[0].pars)
    pages2, _ = parse_pdf_document(build(664, (658, 644, 630)))
    analyze_layout(pages2)
    assert len(pages2[0].pars) == 1  # rule inside the descender band


def test_footnote_rule_marks_note_region():
    # Body lines (one carrying a glued symbol reference "content*"), a
    # short left-anchored separator rule, then smaller note text below
    # opening with the matching glued marker "*note ...".  The note
    # rules are evidence-gated (analyzeLayout.js:2910-2912: there is
    # deliberately NO markerless "everything under the rule" sweep) —
    # the in-text reference plus the separator admit the note.
    rows = []
    for i in range(6):
        y = 700 - 18 * i
        tail = "words of content*" if i == 2 else "words of content"
        rows.append(f"BT /F1 12 Tf 72 {y} Td "
                    f"(body paragraph line number {i} with many more "
                    f"{tail}) Tj ET")
    rows.append("72 200 60 0.7 re f")  # short separator
    rows.append("BT /F1 8 Tf 72 185 Td "
                "(*note text in smaller print here) Tj ET")
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


def test_unreferenced_small_text_below_rule_stays_body():
    """Without per-instance evidence (no in-text reference, no active
    sup-ref run) small text below a separator stays body — the
    reference's deliberate miss (analyzeLayout.js:2910-2912)."""
    rows = []
    for i in range(6):
        y = 700 - 18 * i
        rows.append(f"BT /F1 12 Tf 72 {y} Td "
                    f"(body paragraph line number {i} with many more "
                    f"words of content) Tj ET")
    rows.append("72 200 60 0.7 re f")
    rows.append("BT /F1 8 Tf 72 185 Td "
                "(1 note text in smaller print here) Tj ET")
    pages, _ = parse_pdf_document(_make_pdf([" ".join(rows)], F))
    from scribe_js_ray.stages.layout import analyze_layout
    analyze_layout(pages)
    assert not [p for p in pages[0].pars if p.type == "footnote"]


# ---------------- dashed-line reconstruction + row-band fills
# (detectPdfTables.js:1784-1862 reconstituteDashedLines,
#  :1550-1703 extractRowBandStructure)


def _dashes_h(y, x0, x1, seg=18.0, gap=1.5):
    out = []
    x = x0
    while x + seg <= x1:
        out.append(f"{x:.1f} {y} m {x + seg:.1f} {y} l S")
        x += seg + gap
    return out


def _dashes_v(x, y0, y1, seg=9.0, gap=1.0):
    out = []
    y = y0
    while y + seg <= y1:
        out.append(f"{x} {y:.1f} m {x} {y + seg:.1f} l S")
        y += seg + gap
    return out


def test_dashed_grid_detected_as_table():
    """A grid drawn as dash trains: the dash SEGMENTS of each
    horizontal rule encode per-segment columns, so the reference (and
    this port) classify it as a segmented-hline table whose break
    pattern sets the column structure — verified byte-identical vs the
    live reference (sink15 fuzz)."""
    rows = ["1 w"]
    data = [("alpha", "beta"), ("gamma", "delta"), ("epsilon", "zeta")]
    for i, (a, b) in enumerate(data):
        y = 680 - i * 30
        rows.append(f"BT /F1 10 Tf 110 {y} Td ({a}) Tj ET")
        rows.append(f"BT /F1 10 Tf 260 {y} Td ({b}) Tj ET")
    for yy in (650, 680, 712):
        rows.extend(_dashes_h(yy, 100, 400))
    for xx in (100, 250, 400):
        rows.extend(_dashes_v(xx, 590, 712))
    rows.append("BT /F1 12 Tf 72 750 Td "
                "(Preamble paragraph text with plenty of characters to "
                "clear the page threshold here) Tj ET")
    page = _page(" ".join(rows))
    assert [t["method"] for t in page.table_boxes] == ["segmented-hline"]
    # 16 dash segments per rule → 15 interior break columns
    assert len(page.table_boxes[0]["col_separators"]) == 15

def test_sparse_dashes_not_reconstituted():
    """Fewer than 5 collinear segments, or wide gaps, must not invent a
    rule (the 5-segment / median-gap<2 signature)."""
    rows = ["1 w"]
    # 4 segments only
    rows.extend(_dashes_h(650, 100, 180))
    # 8 segments but 12pt gaps (dotted leader spacing, not a dash)
    rows.extend(_dashes_h(600, 100, 360, seg=18.0, gap=12.0))
    rows.append("BT /F1 12 Tf 72 750 Td "
                "(Prose page with dots and a few dashes but no table "
                "grid anywhere) Tj ET")
    page = _page(" ".join(rows))
    assert not page.table_boxes


def test_row_band_shading_synthesizes_table():
    """Pure shading with NO text content synthesizes a row-band
    candidate, but with no words its column structure stays empty and
    the multi-column filter drops it — the reference detects nothing
    on this fixture (verified live); the attach path below covers the
    text-bearing case."""
    rows = []
    rows.append("BT /F1 12 Tf 72 750 Td "
                "(Heading paragraph text with plenty of printable "
                "characters to clear the gate) Tj ET")
    cells = [(100, 200), (210, 310), (320, 420)]
    for i in range(8):
        y = 680 - i * 16
        for x0, x1 in cells:
            rows.append(f"0.9 g {x0} {y} {x1 - x0} 12 re f")
    page = _page(" ".join(rows))
    assert page.table_boxes == []

def test_row_band_extends_text_table():
    """Alternating shading under a text-detected table attaches the
    band region and extends the table bbox to the band extent
    (detectPdfTables.js:352-383 single-region attach)."""
    rows = []
    rows.append("BT /F1 12 Tf 72 750 Td "
                "(Heading paragraph text with plenty of printable "
                "characters to clear the gate) Tj ET")
    cells = [(100, 200), (210, 310), (320, 420)]
    for i in range(8):
        y = 680 - i * 16
        if i % 2 == 0:     # alternating shading
            for x0, x1 in cells:
                rows.append(f"0.9 g {x0} {y} {x1 - x0} 12 re f")
        for c, (x0, _) in enumerate(cells):
            rows.append(f"BT /F1 9 Tf {x0 + 2} {y + 3} Td "
                        f"(v{i}c{c}) Tj ET")
    page = _page(" ".join(rows))
    assert page.table_boxes
    tb = page.table_boxes[0]
    scale = 300.0 / 72.0
    # bbox reaches the fill edges (100pt / 420pt), beyond the text
    # extent (text starts at x0+2 and ends well before each cell right)
    assert tb["left"] <= 100 * scale + 0.1
    assert tb["right"] >= 420 * scale - 0.1


def test_extract_row_band_structure_unit():
    """Display-space row-band structure: 4 bands x 3 cells at repeated
    anchors -> one region with 2 column separators
    (detectPdfTables.js:1542-1715)."""
    from scribe_js_ray.stages.pdf.tabledetect import (
        extract_row_band_structure)
    fills = []
    for i in range(4):
        top = 100 + i * 30
        for x0, x1 in ((100, 300), (320, 520), (540, 740)):
            fills.append({"left": x0, "top": top, "right": x1,
                          "bottom": top + 24, "color": []})
    regions = extract_row_band_structure(fills)
    assert len(regions) == 1
    assert len(regions[0]["col_xs"]) == 2
    assert len(regions[0]["row_ys"]) == 4
    # sub-3-band evidence -> nothing
    assert extract_row_band_structure(fills[:6]) == []
def test_header_rule_table_detected():
    """A financial-statement ruling row — 3 disjoint column rules in
    one y-band — anchors a table: header scanned up, data down
    (detectPdfTables.js:3354 detectHeaderRuleTables)."""
    ops = ["BT /F1 11 Tf 80 710 Td (Statement of Operations) Tj ET",
           "BT /F1 11 Tf 80 696 Td (Item) Tj ET",
           "BT /F1 11 Tf 240 696 Td (FY23) Tj ET",
           "BT /F1 11 Tf 400 696 Td (FY24) Tj ET",
           "1 w 72 682 m 180 682 l S",
           "1 w 220 682 m 330 682 l S",
           "1 w 370 682 m 480 682 l S"]
    labels = ["Revenue", "Cost", "Gross", "Opex", "Other", "Tax", "Net"]
    for i, lab in enumerate(labels):
        y = 668 - 14 * i
        ops.append(f"BT /F1 11 Tf 80 {y} Td ({lab}) Tj ET")
        ops.append(f"BT /F1 11 Tf 240 {y} Td (1,{100 + i:03d}) Tj ET")
        ops.append(f"BT /F1 11 Tf 400 {y} Td (2,{200 + i:03d}) Tj ET")
    page = _page(" ".join(ops))
    hdr = [t for t in page.table_boxes if t.get("method") == "header-rule"]
    assert len(hdr) == 1
    t = hdr[0]
    assert len(t["col_separators"]) == 2
    s = 300 / 72
    assert abs(t["col_separators"][0] - 200 * s) < 2 * s
    assert abs(t["col_separators"][1] - 350 * s) < 2 * s
    # Header rows above the rule are inside the region.
    assert t["top"] < 682 * s and t["bottom"] > t["top"]


def test_header_rule_rejects_prose_below_decorative_rules():
    """Three disjoint decorative rules over prose (at most one number
    per row) must NOT become a table — the numeric-column validation
    rejects it."""
    ops = ["1 w 72 682 m 180 682 l S",
           "1 w 220 682 m 330 682 l S",
           "1 w 370 682 m 480 682 l S"]
    prose = ["The quarter closed without notable items to report",
             "and operations continued in the ordinary course of",
             "business with 1 exception noted by the committee",
             "which is described in the following paragraphs of",
             "this report and in the accompanying notes thereto",
             "prepared according to the standards of the board"]
    for i, ln in enumerate(prose):
        ops.append(f"BT /F1 11 Tf 80 {668 - 14 * i} Td ({ln}) Tj ET")
    page = _page(" ".join(ops))
    assert not [t for t in page.table_boxes
                if t.get("method") == "header-rule"]
