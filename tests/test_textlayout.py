"""Plain-text synthetic typesetting (convertPageText analog)."""

from scribe_js_ray.model import line_text, page_text
from scribe_js_ray.pipelines.extract import extract_document
from scribe_js_ray.stages.emit import write_text_spans
from scribe_js_ray.stages.layout import analyze_layout
from scribe_js_ray.stages.textlayout import (
    FONT_SIZE, MARGIN_HORIZONTAL, parse_text_pages, _split_tokens)


def test_split_tokens_preserves_whitespace():
    toks = _split_tokens("a  bb c")
    assert toks == [("a", False), ("  ", True), ("bb", False),
                    (" ", True), ("c", False)]


def test_short_text_single_line():
    pages = parse_text_pages("hello world")
    assert len(pages) == 1
    assert len(pages[0].lines) == 1
    assert line_text(pages[0].lines[0]) == "hello world"
    assert len(pages[0].pars) == 1
    w = pages[0].lines[0].words[0]
    assert w.bbox.left == MARGIN_HORIZONTAL
    assert w.style.font == "Times New Roman"


def test_long_line_wraps():
    text = " ".join(["word"] * 60)  # far wider than 572 pt
    pages = parse_text_pages(text)
    assert len(pages[0].lines) > 1
    # all wrapped lines belong to ONE paragraph (source line = par)
    assert len(pages[0].pars) == 1
    # reflow joins the wrap points back → byte-identical round trip
    analyze_layout(pages)
    out, _ = write_text_spans(pages, reflow_text=True)
    assert out == text


def test_source_lines_become_paragraphs():
    pages = parse_text_pages("first para\nsecond para")
    assert len(pages[0].pars) == 2
    # No analyze_layout: source newlines are authoritative par breaks.
    out, _ = write_text_spans(pages, reflow_text=True)
    assert out == "first para\nsecond para"


def test_page_overflow_creates_pages():
    text = "\n".join(f"line {i}" for i in range(120))  # > 50 lines/page
    pages = parse_text_pages(text)
    assert len(pages) >= 2
    assert all(p.lines for p in pages)


def test_oversized_word_force_placed():
    text = "x" * 400  # wider than the page
    pages = parse_text_pages(text)
    assert page_text(pages[0]) == text


def test_extract_document_text_roundtrip():
    body = " ".join(["alpha", "beta", "gamma"] * 40)
    res = extract_document("u", b"", body, "eng")
    assert res["payload_kind"] == "text"
    assert res["extracted_text"] == body
    assert res["doc_type"] == "text"
    assert res["n_pages"] >= 1
