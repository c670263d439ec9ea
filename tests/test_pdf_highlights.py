"""Markup-annotation injection (addHighlights + writePdfAnnots +
createHighlightedPdf behavior)."""

from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.annots import (markup_spans,
                                             parse_page_annotations)
from scribe_js_ray.stages.pdf.doc import _walk_pages
from scribe_js_ray.stages.pdf.highlights import (
    create_highlighted_pdf, matching_words_in_line,
    matching_words_in_page)
from scribe_js_ray.stages.pdf.objects import PdfFile


def _pdf():
    ts = _Typesetter()
    ts.line("the quick brown fox jumps")
    ts.line("over the lazy dog today")
    ts.line("and then sleeps soundly")
    ts2 = _Typesetter()
    ts2.line("second page content here")
    return _make_pdf([ts.stream(), ts2.stream()], {"F1": "Helvetica"})


def test_quote_matching_is_case_insensitive_sliding_window():
    pages, _ = parse_pdf_document(_pdf())
    line = pages[0].lines[0]
    m = matching_words_in_line("Quick Brown", line)
    assert [w.text for w in m] == ["quick", "brown"]
    assert matching_words_in_line("quick dog", line) == []
    # Cross-line page-wide match spans the line break.
    m2 = matching_words_in_page("jumps over the", pages[0])
    assert [w.text for _, w in m2] == ["jumps", "over", "the"]


def test_highlight_quote_creates_annot_with_quads():
    src = _pdf()
    out, stats = create_highlighted_pdf(
        src, [{"page": 0, "text": "quick brown",
               "comment": "key phrase"}])
    assert stats["highlightsApplied"] == 1
    pdf = PdfFile(out)
    infos = _walk_pages(pdf)
    annots = parse_page_annotations(pdf, infos[0]["_node"])
    hl = [a for a in annots if a.get("subtype") == "Highlight"]
    assert len(hl) == 1
    # Text layer unchanged.
    pages, _ = parse_pdf_document(out)
    assert "quick brown" in " ".join(
        w.text for ln in pages[0].lines for w in ln.words)
    # The carried-marks lift sees the new highlight.
    spans = markup_spans(annots, pages[0].height,
                         pages[0].height / 792.0)
    assert any(s["type"] == "highlight" for s in spans)


def test_line_mode_spans_multiple_lines_with_snippets():
    src = _pdf()
    out, stats = create_highlighted_pdf(
        src, [{"page": 0, "startLine": 0, "endLine": 1,
               "text": "brown fox jumps over the lazy",
               "markup": "underline"}])
    assert stats["totalLinesHighlighted"] == 2
    pdf = PdfFile(out)
    annots = parse_page_annotations(pdf, _walk_pages(pdf)[0]["_node"])
    ul = [a for a in annots if a.get("subtype") == "Underline"]
    assert len(ul) == 1
    # Two quads (one per line) = 16 QuadPoints numbers.
    assert len(ul[0].get("quad_points") or []) == 16


def test_page_selection_subsets_output():
    src = _pdf()
    out, _ = create_highlighted_pdf(
        src, [{"page": 1, "text": "second page"}], pages=[1])
    pages, _ = parse_pdf_document(out)
    assert len(pages) == 1
    assert "second page" in " ".join(
        w.text for ln in pages[0].lines for w in ln.words)
    pdf = PdfFile(out)
    annots = parse_page_annotations(pdf, _walk_pages(pdf)[0]["_node"])
    assert any(a.get("subtype") == "Highlight" for a in annots)


def test_unmatched_quote_applies_nothing():
    out, stats = create_highlighted_pdf(
        _pdf(), [{"page": 0, "text": "no such words present"}])
    assert stats["highlightsApplied"] == 0
    pdf = PdfFile(out)
    annots = parse_page_annotations(pdf, _walk_pages(pdf)[0]["_node"])
    assert annots == []
