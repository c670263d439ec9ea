"""Parsed-page save/restore round trip (.scribe analog, SURVEY S10/F3)."""

import pyarrow as pa
import pyarrow.parquet as pq

from scribe_js_ray.model import page_text
from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.emit import write_text_spans
from scribe_js_ray.stages.hocr import parse_hocr_page
from scribe_js_ray.stages.layout import analyze_layout
from scribe_js_ray.stages.serialize import (
    PAGES_T, column_to_pages, pages_column, pages_to_py, py_to_pages)
from scribe_js_ray.sources.synth import make_payload

from tests.test_formats import make_alto


def _parsed_pages(doc_id=3):
    stratum, payload, text, lang = make_payload(42, doc_id)
    raw = payload.decode()
    import re
    chunks = [c for c in re.split(r"(?=<div class=.ocr_page)", raw)
              if "ocr_page" in c[:200]]
    pages = []
    for i, c in enumerate(chunks):
        try:
            page, _ = parse_hocr_page(c, i)
            pages.append(page)
        except ValueError:
            pass
    analyze_layout(pages)
    return pages


def test_roundtrip_identical_text_and_spans():
    pages = _parsed_pages()
    assert pages
    restored = py_to_pages(pages_to_py(pages))
    t1, s1 = write_text_spans(pages, reflow_text=True, drop_furniture=True)
    t2, s2 = write_text_spans(restored, reflow_text=True,
                              drop_furniture=True)
    assert t1 == t2
    assert s1 == s2


def test_roundtrip_preserves_styles_and_pars():
    xml = make_alto([[("Bold", {"STYLE": "bold"}), ("plain", {})]])
    page, _ = parse_alto_page(xml, 0)
    analyze_layout([page])
    restored = py_to_pages(pages_to_py([page]))[0]
    assert restored.lines[0].words[0].style.bold
    assert not restored.lines[0].words[1].style.bold
    assert len(restored.pars) == len(page.pars)
    assert restored.pars[0].type == page.pars[0].type
    assert restored.lines[0].par is restored.pars[0]


def test_parquet_roundtrip(tmp_path):
    docs = [_parsed_pages(d) for d in (1, 3)]  # hOCR strata doc ids
    assert all(docs)
    tbl = pa.table({
        "url": pa.array([f"u{d}" for d in (1, 3)]),
        "pages": pages_column(docs),
    })
    path = str(tmp_path / "parsed.parquet")
    pq.write_table(tbl, path)
    back = pq.read_table(path)
    assert back.schema.field("pages").type == PAGES_T
    restored_docs = column_to_pages(back["pages"].combine_chunks())
    for orig, rest in zip(docs, restored_docs):
        assert page_text(rest[0]) == page_text(orig[0])
        assert len(rest) == len(orig)


def test_rules_and_table_boxes_roundtrip():
    from scribe_js_ray.stages.serialize import pages_to_py, py_to_pages
    from scribe_js_ray.model import Page
    page = Page(0, 612, 792)
    page.rules = [{"y": 400.0, "left": 72.0, "right": 300.0}]
    page.table_boxes = [{"left": 100.0, "top": 200.0,
                         "right": 500.0, "bottom": 400.0}]
    restored = py_to_pages(pages_to_py([page]))[0]
    assert restored.rules == page.rules
    # r3: table_boxes gained col_separators/method keys; the original
    # 4-float geometry must survive exactly
    for got, want in zip(restored.table_boxes, page.table_boxes):
        assert {k: got[k] for k in want} == want


# ------------- reference .scribe format interop (stages/scribe_fmt.py)


def _fixture_pages():
    import random
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.hocr import parse_hocr_page
    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(7)), 0)
    return [page]


def _pages_text(pages):
    from scribe_js_ray.stages.emit import write_text
    return write_text(pages, reflow_text=False)


def test_scribe_roundtrip_segmented_gzip():
    from scribe_js_ray.stages.scribe_fmt import parse_scribe, write_scribe
    pages = _fixture_pages()
    data = write_scribe(pages, segmented=True, gzip_out=True)
    assert data[:2] == b"\x1f\x8b"          # gzip magic
    back = parse_scribe(data)
    assert len(back) == len(pages)
    assert _pages_text(back) == _pages_text(pages)   # byte-identical text


def test_scribe_roundtrip_whole_file():
    from scribe_js_ray.stages.scribe_fmt import parse_scribe, write_scribe
    pages = _fixture_pages()
    data = write_scribe(pages, segmented=False)
    assert data.startswith(b"{")
    back = parse_scribe(data)
    assert _pages_text(back) == _pages_text(pages)


def test_scribe_format_shape_matches_reference():
    """The written JSON uses the reference's serialized OcrPage shape:
    camelCase fields, {left,top,right,bottom} bboxes, parId/lineIds
    instead of circular refs (ocrObjects.js:1033-1101)."""
    import json
    from scribe_js_ray.stages.scribe_fmt import write_scribe
    pages = _fixture_pages()
    data = write_scribe(pages, segmented=True)
    lines = data.split(b"\n")
    header = json.loads(lines[0])
    assert header["scribeSegments"] == 1
    assert header["pageCount"] == len(pages)
    rec = json.loads(lines[1])
    assert rec["i"] == 0
    page = rec["ocr"]
    assert set(page["dims"]) == {"width", "height"}
    line = page["lines"][0]
    assert "bbox" in line and "left" in line["bbox"]
    word = line["words"][0]
    assert "smallCaps" in word["style"]
    if page["pars"]:
        assert "lineIds" in page["pars"][0]
        assert line.get("parId") == page["pars"][0]["id"] or "parId" in line


def test_scribe_styles_and_pars_survive():
    from scribe_js_ray.stages.scribe_fmt import parse_scribe, write_scribe
    pages = _fixture_pages()
    # tag a style so we can see it survive
    pages[0].lines[0].words[0].style.bold = True
    pages[0].lines[0].words[0].style.small_caps = True
    back = parse_scribe(write_scribe(pages))
    w = back[0].lines[0].words[0]
    assert w.style.bold and w.style.small_caps
    assert len(back[0].pars) == len(pages[0].pars)
    # par membership restored (line.par backref)
    if pages[0].pars:
        assert back[0].lines[0].par is not None


def test_marks_and_separators_roundtrip():
    """r3 model additions (annotation marks, table col_separators) must
    survive the native save/restore like rules/table_boxes do."""
    from scribe_js_ray.model import Page
    from scribe_js_ray.stages.serialize import pages_to_py, py_to_pages
    page = Page(0, 612, 792)
    page.table_boxes = [{"left": 10.0, "top": 20.0, "right": 300.0,
                         "bottom": 120.0, "col_separators": [80.0, 190.0],
                         "method": "text"}]
    page.marks = [{"type": "link",
                   "bbox": {"left": 1.0, "top": 2.0,
                            "right": 3.0, "bottom": 4.0},
                   "contents": "", "uri": "https://example.test/a"},
                  {"type": "highlight",
                   "bbox": {"left": 5.0, "top": 6.0,
                            "right": 7.0, "bottom": 8.0},
                   "contents": "note"}]
    restored = py_to_pages(pages_to_py([page]))[0]
    assert restored.table_boxes[0]["col_separators"] == [80.0, 190.0]
    assert restored.table_boxes[0]["method"] == "text"
    assert restored.marks[0]["uri"] == "https://example.test/a"
    assert restored.marks[1]["type"] == "highlight"
    assert restored.marks[1]["contents"] == "note"
    assert "uri" not in restored.marks[1]


def test_redaction_survives_malformed_sibling_annotation():
    """A malformed widget annotation must not disable a /Redact in the
    same /Annots array (review r3 finding: shared failure domain)."""
    from tests.test_pdf_annots import _annotated_pdf
    from scribe_js_ray.stages.pdf import parse_pdf_document
    data = _annotated_pdf(
        "6 0 R 7 0 R",
        [b"<< /Type /Annot /Subtype /Widget /FT /Tx /V (v) "
         b"/Rect [0 (bogus) 1 1] >>",      # malformed rect entry
         b"<< /Type /Annot /Subtype /Redact /Rect [165 690 225 712] >>"])
    pages, _ = parse_pdf_document(data)
    text = " ".join(w.text for ln in pages[0].lines for w in ln.words)
    assert "SECRET" not in text
    assert "Public" in text


def test_scribe_session_annotations_and_edits_roundtrip():
    """.scribe interop carries annotations + textEdits (import.js
    :220-241, :292-313) in both layouts."""
    from scribe_js_ray.model import BBox
    from scribe_js_ray.stages.scribe_fmt import (parse_scribe_session,
                                                 write_scribe)
    from scribe_js_ray.stages.textlayout import parse_text_pages

    pages = parse_text_pages("Some words to carry over.")
    pages[0].marks = [{"type": "highlight",
                       "bbox": BBox(10, 20, 110, 40),
                       "color": "#ffff00"}]
    edits = [[{"type": "deleteText",
               "rects": [{"left": 1, "top": 2, "right": 3,
                          "bottom": 4}]}]]
    for segmented in (True, False):
        data = write_scribe(pages, segmented=segmented,
                            text_edits=edits, outline=[])
        back, extras = parse_scribe_session(data)
        assert len(back) == 1
        (mark,) = back[0].marks
        assert mark["type"] == "highlight"
        assert mark["bbox"].right == 110 and mark["color"] == "#ffff00"
        assert extras["textEdits"] == edits
        assert extras["outline"] == []
    # pre-outline session: key absent → None (PDF bookmarks win)
    data = write_scribe(pages, segmented=True)
    _, extras = parse_scribe_session(data)
    assert extras["outline"] is None


def test_scribe_include_extra_text():
    """includeExtraTextScribe analog: page/par/line 'text' fields with
    the reference's plain joins (ocrObjects.js:402-433 getters,
    :1030-1070 removeCircularRefsOcr includeText); off by default."""
    import gzip as _g
    import json
    import random

    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.stages.layout import analyze_layout
    from scribe_js_ray.stages.scribe_fmt import parse_scribe, write_scribe

    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(1)), 0)
    analyze_layout([page])

    blob = write_scribe([page], segmented=False, include_text=True)
    obj = json.loads(blob)
    pj = obj["ocr"][0]
    exp_lines = [" ".join(w.text for w in ln.words) for ln in page.lines]
    assert pj["text"] == "\n".join(exp_lines)
    assert [ld["text"] for ld in pj["lines"]] == exp_lines
    assert pj["pars"], "layout should have assigned pars"
    for pd in pj["pars"]:
        by_id = {ld["id"]: ld["text"] for ld in pj["lines"]}
        assert pd["text"] == " ".join(by_id[i] for i in pd["lineIds"])

    # default emits no text fields; either form round-trips
    plain = json.loads(write_scribe([page], segmented=False))
    assert "text" not in plain["ocr"][0]
    rt = parse_scribe(blob)
    assert [" ".join(w.text for w in ln.words) for ln in rt[0].lines] \
        == exp_lines
