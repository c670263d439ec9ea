"""Furniture/role classification tests over synthetic documents."""

from scribe_js_ray.pipelines.extract import extract_document
from scribe_js_ray.sources.synth import make_payload


def _extract(doc_id, **kw):
    stratum, payload, text, lang = make_payload(42, doc_id)
    return stratum, extract_document(f"d{doc_id}", payload, text, lang, **kw)


def test_running_header_and_folio_dropped():
    # Reference default (verified vs the live reference, writeText.js
    # has no furniture filter): headers and folios EMIT.  Main-content
    # mode (our corpus feature) drops them on request.
    stratum, res = _extract(1)
    assert stratum == "hocr-furniture"
    assert "JOURNAL" in res["extracted_text"]
    assert res["error"] == ""
    _, res2 = _extract(1, drop_furniture=True)
    assert "JOURNAL" not in res2["extracted_text"]
    assert "-1-" not in res2["extracted_text"]


def test_linenum_column_dropped():
    import re
    stratum, res = _extract(2, drop_furniture=True)
    assert stratum == "hocr-linenum"
    # No standalone 1..12 integer lines survive.
    assert not re.search(r"^\d{1,2}$", res["extracted_text"], re.M)
    assert res["extracted_text"]  # body text retained


def test_heading_title_span():
    stratum, res = _extract(3, drop_furniture=True)
    assert stratum == "hocr-paragraphs"
    types = [s["type"] for s in res["spans"]]
    assert "title" in types
    assert "footnote" in types
    # Title is the first span and covers the first line.
    assert types[0] == "title"


def test_footnote_continuation_inherits_role():
    stratum, res = _extract(3, drop_furniture=True)
    types = [s["type"] for s in res["spans"]]
    # No body span after the first footnote span (notes close the page).
    first_fn = types.index("footnote")
    assert all(t == "footnote" for t in types[first_fn:])


def test_html_boilerplate_stripped():
    stratum, res = _extract(5)
    assert stratum == "html-article"
    t = res["extracted_text"]
    assert "Copyright 2024" not in t
    assert "Privacy" not in t
    assert "Related" not in t
    assert len(t) > 200
    assert [s["type"] for s in res["spans"]][0] == "title"


def test_spans_offsets_consistent():
    for doc_id in range(8):
        _, res = _extract(doc_id)
        data = res["extracted_text"].encode()
        for s in res["spans"]:
            assert 0 <= s["start"] <= s["end"] <= len(data)
            seg = data[s["start"]:s["end"]].decode()
            assert seg.strip() != "" or s["start"] == s["end"]


def test_error_column_on_poison_payload():
    res = extract_document("u", b"%PDF-1.4 garbage without structure", "", "eng")
    assert res["payload_kind"] == "pdf"
    assert res["error"] != "" or res["extracted_text"] == ""
