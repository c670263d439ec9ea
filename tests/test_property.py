"""Property-based tests (hypothesis) for parser/emit invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from scribe_js_ray.model import page_text
from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.emit import write_text_spans
from scribe_js_ray.stages.exports import write_hocr, write_markdown
from scribe_js_ray.stages.hocr import parse_hocr_page
from scribe_js_ray.stages.serialize import pages_to_py, py_to_pages
from scribe_js_ray.stages.textlayout import parse_text_pages

from tests.test_formats import make_alto

_WORD = st.text(alphabet=string.ascii_letters + string.digits,
                min_size=1, max_size=12)
_WORDS = st.lists(_WORD, min_size=1, max_size=60)


@settings(max_examples=40, deadline=None)
@given(_WORDS)
def test_textlayout_reflow_roundtrip(words):
    """Single-spaced text survives typeset → reflow byte-identically."""
    text = " ".join(words)
    pages = parse_text_pages(text)
    out, spans = write_text_spans(pages, reflow_text=True)
    assert out == text
    if spans:
        blob = out.encode("utf-8")
        for s in spans:
            assert 0 <= s["start"] <= s["end"] <= len(blob)


@settings(max_examples=30, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=5))
def test_textlayout_paragraphs_roundtrip(lines):
    text = "\n".join(" ".join(ws) for ws in lines)
    pages = parse_text_pages(text)
    out, _ = write_text_spans(pages, reflow_text=True)
    assert out == text


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_alto_hocr_roundtrip_chain(lines):
    """ALTO parse → hOCR write → hOCR parse preserves text exactly."""
    xml = make_alto([[(w, {}) for w in ws] for ws in lines])
    page, _ = parse_alto_page(xml, 0)
    hocr = write_hocr([page])
    reparsed, _ = parse_hocr_page(hocr, 0)
    assert page_text(reparsed) == page_text(page)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_serialize_roundtrip_any_page(lines):
    xml = make_alto([[(w, {}) for w in ws] for ws in lines])
    page, _ = parse_alto_page(xml, 0)
    restored = py_to_pages(pages_to_py([page]))
    assert page_text(restored[0]) == page_text(page)


@settings(max_examples=30, deadline=None)
@given(_WORDS)
def test_markdown_never_raises_and_escapes(words):
    xml = make_alto([[(w, {}) for w in words[:8]]])
    page, _ = parse_alto_page(xml, 0)
    md = write_markdown([page])
    assert isinstance(md, str)
    # unescaped markdown metacharacters never leak from word text
    for token in md.split():
        assert not token.startswith("**") or token.count("*") % 2 == 0
