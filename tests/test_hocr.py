"""hOCR parser golden tests (convertPageHocr.js parity style: exact values
at tree coordinates, mirroring the reference's importPdfText.spec.js)."""

from scribe_js_ray.stages.hocr import parse_hocr_page

HOCR = """<html><body>
<div class='ocr_page' title='image "p"; bbox 0 0 1000 1400; ppageno 0'>
<p class='ocr_par' lang='eng'>
<span class='ocr_line' title='bbox 100 100 520 140; baseline 0 -8; x_size 40; x_ascenders 12; x_descenders 8'>
<span class='ocrx_word' id='w1' title='bbox 100 100 200 140; x_wconf 96'>Hello</span>
<span class='ocrx_word' id='w2' title='bbox 220 100 340 140; x_wconf 91'>&quot;quoted&quot;</span>
<span class='ocrx_word' id='w3' title='bbox 360 100 520 140; x_wconf 88' style='font-style:italic'>ﬁne</span>
</span>
<span class='ocr_line' title='bbox 100 160 560 200; baseline 0 -8; x_size 40; x_ascenders 12; x_descenders 8'>
<span class='ocrx_word' id='w4' title='bbox 100 160 220 200; x_wconf 95'>world's</span>
<span class='ocrx_word' id='w5' title='bbox 240 160 330 200; x_wconf 94'><sup>2</sup></span>
</span>
</p>
</div></body></html>"""


def test_parse_basic_structure():
    page, langs = parse_hocr_page(HOCR, 0)
    assert page.width == 1000 and page.height == 1400
    assert len(page.lines) == 2
    assert [w.text for w in page.lines[0].words] == ["Hello", "“quoted”", "fine"]
    assert page.lines[0].words[2].style.italic
    assert page.lines[0].words[0].conf == 96
    assert langs == {"eng"}


def test_smart_quotes_and_apostrophe():
    page, _ = parse_hocr_page(HOCR, 0)
    # pass3: opening/closing quotes curled; apostrophe between letters curled.
    assert page.lines[0].words[1].text == "“quoted”"
    assert page.lines[1].words[0].text == "world’s"


def test_sup_flag():
    page, _ = parse_hocr_page(HOCR, 0)
    assert page.lines[1].words[1].style.sup
    assert page.lines[1].words[1].text == "2"


def test_line_metrics():
    page, _ = parse_hocr_page(HOCR, 0)
    line = page.lines[0]
    # x_size 40, descenders 8 → asc 32; ascenders 12 → x-height 20.
    assert line.asc_height == 32.0
    assert line.x_height == 20.0
    assert line.baseline == [0.0, -8.0]


def test_missing_dims_raises():
    import pytest
    with pytest.raises(ValueError):
        parse_hocr_page("<html><body>no page here</body></html>", 0)


def test_char_level_mode():
    hocr = """<div class='ocr_page' title='bbox 0 0 800 600'>
<span class='ocr_line' title='bbox 10 10 200 50; baseline 0 -8; x_size 40; x_ascenders 10; x_descenders 8'>
<span class='ocrx_word' id='cw1' title='bbox 10 10 100 50; x_wconf 90'>
<span class='ocrx_cinfo' title='x_bboxes 10 10 40 50'>A</span>
<span class='ocrx_cinfo' title='x_bboxes 40 10 70 50'>b</span>
<span class='ocrx_cinfo' title='x_bboxes 70 20 100 50'>c</span>
</span>
</span></div>"""
    page, _ = parse_hocr_page(hocr, 0)
    assert len(page.lines) == 1
    word = page.lines[0].words[0]
    assert word.text == "Abc"
    assert word.chars is not None and len(word.chars) == 3
    assert word.chars[0].bbox.left == 10
    # Line bbox recomputed from words by pass2.
    assert page.lines[0].bbox.left == 10


def test_hocr_layout_meta_roundtrip():
    """write_hocr embeds the scribeocr layout/layout-data-table meta;
    our reimport restores table_boxes (+col_separators) and parses in
    scribeMode (importOCR.js:196-219, import.js:407-418, :716)."""
    from scribe_js_ray.model import Page
    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.stages.exports import write_hocr
    from scribe_js_ray.stages.hocr import (apply_hocr_layout_meta,
                                           parse_hocr_layout_meta)

    src = """<html><body><div class='ocr_page' title='bbox 0 0 2000 2000'>
<span class='ocr_line' title='bbox 100 100 900 130; baseline 0 -4; x_size 30'>
<span class='ocrx_word' title='bbox 100 100 220 130; x_wconf 95'>alpha</span>
<span class='ocrx_word' title='bbox 600 100 700 130; x_wconf 95'>42</span>
</span></div></body></html>"""
    from scribe_js_ray.stages.hocr import parse_hocr_page
    page, _ = parse_hocr_page(src, 0)
    page.table_boxes.append({"left": 90, "top": 90, "right": 950,
                             "bottom": 140, "col_separators": [500.0]})
    hocr = write_hocr([page])
    assert "ocr-system' content='scribeocr'" in hocr
    meta = parse_hocr_layout_meta(hocr)
    assert meta and meta["tables"], "meta must parse back"

    fresh = Page(0, 2000, 2000)
    apply_hocr_layout_meta([fresh], meta)
    tb = fresh.table_boxes[0]
    assert (tb["left"], tb["right"]) == (90, 950)
    assert tb["col_separators"] == [500.0]

    # end-to-end: reimported hOCR keeps the table through xlsx emit
    import io
    import zipfile
    out = extract_document("t.hocr", hocr.encode(), "", "eng",
                           emit_format="xlsx")
    assert out["error"] == ""
    sheet = zipfile.ZipFile(io.BytesIO(
        out["extracted_text"].encode("latin1"))).read(
        "xl/worksheets/sheet1.xml").decode()
    assert "alpha" in sheet and "42" in sheet


def test_hocr_meta_non_scribe_ignored():
    from scribe_js_ray.stages.hocr import parse_hocr_layout_meta
    assert parse_hocr_layout_meta(
        "<html><head><meta name='ocr-system' content='tesseract'/>"
        "</head><body></body></html>") is None
