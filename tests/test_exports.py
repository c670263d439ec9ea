"""Structural export tests: hOCR round-trip, markdown formatting."""

from scribe_js_ray.model import page_text
from scribe_js_ray.stages.exports import write_hocr, write_markdown
from scribe_js_ray.stages.hocr import parse_hocr_page

from tests.test_formats import make_alto
from scribe_js_ray.stages.alto import parse_alto_page


def _pages_from_alto():
    xml = make_alto([
        [("Hello", {"WC": "0.96"}), ("world", {})],
        [("Bold", {"STYLE": "bold"}), ("words", {})],
    ])
    page, _ = parse_alto_page(xml, 0)
    return [page]


def test_hocr_roundtrip_preserves_text():
    pages = _pages_from_alto()
    hocr = write_hocr(pages)
    assert "class='ocr_page'" in hocr
    assert "x_wconf 96" in hocr
    # re-parse our own hOCR with our own hOCR parser → identical text
    reparsed, _ = parse_hocr_page(hocr, 0)
    assert page_text(reparsed) == page_text(pages[0])
    # bold style survives the round trip
    bold_words = [w for ln in reparsed.lines for w in ln.words
                  if w.style.bold]
    assert [w.text for w in bold_words] == ["Bold"]


def test_hocr_escapes_xml():
    xml = make_alto([[("a&lt;b", {})]])
    page, _ = parse_alto_page(xml, 0)
    # ALTO parse unescapes to 'a<b'; hOCR writer must re-escape
    assert page.lines[0].words[0].text == "a<b"
    hocr = write_hocr([page])
    assert "a&lt;b</span>" in hocr
    reparsed, _ = parse_hocr_page(hocr, 0)
    assert reparsed.lines[0].words[0].text == "a<b"


def test_markdown_styles_and_page_breaks():
    pages = _pages_from_alto() + _pages_from_alto()
    md = write_markdown(pages)
    assert "**Bold**" in md
    assert "\n\n---\n\n" in md  # page break between pages
    assert md.startswith("Hello world")


def test_markdown_escapes_special_chars():
    xml = make_alto([[("a*b", {}), ("c_d", {})]])
    page, _ = parse_alto_page(xml, 0)
    md = write_markdown([page])
    assert md == r"a\*b c\_d"


def test_markdown_no_formatting_mode():
    pages = _pages_from_alto()
    md = write_markdown(pages, apply_formatting=False)
    assert "**" not in md
    assert "Bold words" in md


def test_markdown_renders_detected_table():
    from tests.test_tables import _numeric_table_page
    page = _numeric_table_page(5)
    md = write_markdown([page], detect_tables=True)
    assert "| --- |" in md or "| --- | --- |" in md.replace("--- | ---", "--- | ---")
    assert md.count("|") > 10          # pipe table present
    assert "Quarterly Report" in md.replace("\n", " ")
    # table source lines are not duplicated as prose
    assert md.count("100") == 1


def test_alto_roundtrip_preserves_text():
    from scribe_js_ray.stages.exports import write_alto
    pages = _pages_from_alto()
    alto = write_alto(pages)
    assert 'xmlns="http://www.loc.gov/standards/alto/ns-v2#"' in alto
    assert "<SP WIDTH=" in alto
    # our own ALTO parser reads it back with identical text
    reparsed, _ = parse_alto_page(alto, 0)
    assert page_text(reparsed) == page_text(pages[0])
    # bold style round-trips via the STYLE attribute
    bold = [w.text for ln in reparsed.lines for w in ln.words
            if w.style.bold]
    assert bold == ["Bold"]
    # font family round-trips via Styles/STYLEREFS
    pages[0].lines[0].words[0].style.font = "Georgia"
    alto2 = write_alto(pages)
    reparsed2, _ = parse_alto_page(alto2, 0)
    assert reparsed2.lines[0].words[0].style.font == "Georgia"


def test_html_semantic_export():
    from scribe_js_ray.stages.exports import write_html
    from scribe_js_ray.stages.layout import analyze_layout
    pages = _pages_from_alto()
    analyze_layout(pages)
    html = write_html(pages)
    assert html.startswith("<!DOCTYPE html>")
    assert "<b>Bold</b>" in html
    assert "Hello world" in html.replace("</p>", "").replace("<p>", "")
    assert '<section class="page" data-page="0">' in html
    # XML-escapes content
    pages[0].lines[0].words[0].text = "a<b"
    html2 = write_html(pages)
    assert "a&lt;b" in html2


def test_debug_csv_export():
    """exportDebugCsv parity: one header row, quoted/JSON fields,
    doubled quotes."""
    import csv
    import io

    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.stages.exports import write_debug_csv
    from scribe_js_ray.stages.textlayout import parse_text_pages

    pages = parse_text_pages('He said "hi" there.\n\nSecond page-ish.')
    out = write_debug_csv(pages)
    rows = list(csv.reader(io.StringIO(out)))
    # the reference's OcrWord field order (byte-parity pinned live in
    # tests/test_ref_parity.py::test_debug_csv_parity)
    assert rows[0][:4] == ["text", "textAlt", "style", "styleRuns"]
    assert len(rows) == 1 + sum(len(ln.words) for p in pages
                                for ln in p.lines)
    texts = [r[0] for r in rows[1:]]
    assert '"hi"' in texts          # embedded quotes survive the escaping
    import json
    bbox_col = rows[0].index("bbox")
    box = json.loads(rows[1][bbox_col])
    assert set(box) == {"left", "top", "right", "bottom"}

    res = extract_document("u://csv", b"", "plain words here", "eng",
                           emit_format="debug_csv")
    assert res["error"] == ""
    assert res["extracted_text"].startswith("text,textAlt,style")


def test_line_numbers_prefix_matches_reference_format():
    """writeText.js:63-74: lineNumbers prepends `g:h  ` after the
    newline each line emits (including the leading one) and disables
    reflow."""
    import random

    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.sources.synth import make_hocr_simple

    payload = make_hocr_simple(random.Random(3)).encode()
    plain = extract_document("u", payload, "", "eng")["extracted_text"]
    numbered = extract_document(
        "u", payload, "", "eng",
        emit_opts={"line_numbers": True})["extracted_text"]
    assert numbered.startswith("\n0:0  ")
    for ln in numbered.strip("\n").split("\n"):
        assert ln.split("  ", 1)[0].count(":") == 1
    # words survive unprefixed
    strip = " ".join(ln.split("  ", 1)[1]
                     for ln in numbered.strip("\n").split("\n"))
    assert set(strip.split()) == set(plain.split())


def test_scribe_char_boxes_opt_out():
    """export.js:152 pageForScribe: includeCharBoxes=False deletes
    word.chars (the CLI extract default; roughly halves file size)."""
    import random

    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.sources.synth import make_hocr_charlevel

    payload = make_hocr_charlevel(random.Random(3)).encode()
    full = extract_document("u", payload, "", "eng",
                            emit_format="scribe")["extracted_text"]
    lean = extract_document(
        "u", payload, "", "eng", emit_format="scribe",
        emit_opts={"char_boxes": False})["extracted_text"]
    assert '"chars"' in full and '"chars"' not in lean
    assert len(lean) < len(full) * 0.6
    # text surface identical either way
    from scribe_js_ray.stages.emit import write_text
    from scribe_js_ray.stages.scribe_fmt import parse_scribe
    assert write_text(parse_scribe(lean.encode())) \
        == write_text(parse_scribe(full.encode()))


def test_xlsx_filename_and_page_columns():
    """writeTabular prepends filename + 1-based page-number columns by
    default (writeTabular.js:205-215, scribeDocDefaults
    xlsxFilenameColumn/xlsxPageNumberColumn); both are opt-out."""
    import io
    import zipfile

    from scribe_js_ray.pipelines.extract import extract_document

    # title + 6 rows x 4 widely-spaced columns so the OCR-side
    # whitespace-column detector fires.
    def word(t, x, y):
        return (f"<span class='ocrx_word' title='bbox {x} {y} "
                f"{x + 12 * len(t)} {y + 20}; x_wconf 96'>{t}</span>")

    rows_html = [
        "<span class='ocr_line' title='bbox 150 60 400 80; "
        "baseline 0 -4; x_size 24'>" + word("Quarterly", 150, 60)
        + word("Report", 280, 60) + "</span>"]
    for i in range(6):
        y = 100 + i * 30
        xs = [150, 900, 1400, 1800]
        texts = [f"r{i}c0v1", f"{100 + i}", f"{200 + i}", f"{300 + i}"]
        cells = "".join(word(t, x, y) for t, x in zip(texts, xs))
        rows_html.append(
            f"<span class='ocr_line' title='bbox 150 {y} 1900 {y + 20}; "
            f"baseline 0 -4; x_size 24'>{cells}</span>")
    payload = ("<html><body><div class='ocr_page' title='image \"p\"; "
               "bbox 0 0 2200 2800; ppageno 0'>"
               + "".join(rows_html) + "</div></body></html>").encode()

    def sheet_of(out):
        raw = out["extracted_text"].encode("latin-1")
        with zipfile.ZipFile(io.BytesIO(raw)) as z:
            return z.read("xl/worksheets/sheet1.xml").decode()

    out = extract_document("docs/report.hocr", payload, "", "eng",
                           emit_format="xlsx")
    sheet = sheet_of(out)
    assert out["error"] == ""
    assert "docs/report.hocr" in sheet
    # 1-based page number rides the second column of every row
    assert ">1</t>" in sheet

    # opt-out drops both lead columns
    out2 = extract_document("docs/report.hocr", payload, "", "eng",
                            emit_format="xlsx",
                            emit_opts={"xlsx_filename_column": False,
                                       "xlsx_page_number_column": False})
    assert "docs/report.hocr" not in sheet_of(out2)
