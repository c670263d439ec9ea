"""Paragraph reflow + text emission goldens (exact expected bytes,
detectParagraph.spec.js / exportText.spec.js style)."""

from scribe_js_ray.model import BBox, Line, Page, Word
from scribe_js_ray.stages.emit import write_text, write_text_spans
from scribe_js_ray.stages.reflow import assign_paragraphs


def _page(line_specs, n=0, w=1000, h=1400):
    """line_specs: list of (words_with_boxes, ...) where each line is a list
    of (text, l, t, r, b)."""
    page = Page(n, w, h)
    for spec in line_specs:
        boxes = [BBox(l, t, r, b) for (_, l, t, r, b) in spec]
        bbox = BBox(min(b.left for b in boxes), min(b.top for b in boxes),
                    max(b.right for b in boxes), max(b.bottom for b in boxes))
        line = Line(page, bbox, [0, -8], 32, 20)
        for (text, l, t, r, b) in spec:
            line.words.append(Word(line, f"w{len(page.lines)}_{len(line.words)}",
                                   text, BBox(l, t, r, b)))
        page.lines.append(line)
    return page


def _flow_lines(texts, left=100, width=800, top=100, pitch=60, height=40,
                indent_first=60):
    """Uniform justified-ish block: all lines same left except optional
    first-line indent."""
    specs = []
    y = top
    for i, words in enumerate(texts):
        x = left + (indent_first if i == 0 else 0)
        spec = []
        for wtext in words:
            w_w = len(wtext) * 18
            spec.append((wtext, x, y, x + w_w, y + height))
            x += w_w + 18
        specs.append(spec)
        y += pitch
    return specs


def test_single_paragraph_reflow():
    texts = [["aa", "bb", "cc"], ["dd", "ee", "ff"], ["gg", "hh"]]
    page = _page(_flow_lines(texts, indent_first=0))
    assign_paragraphs(page, 0)
    assert len(page.pars) == 1
    out = write_text([page], reflow_text=True)
    assert out == "aa bb cc dd ee ff gg hh"


def test_non_reflow_line_breaks():
    texts = [["aa", "bb"], ["cc", "dd"]]
    page = _page(_flow_lines(texts, indent_first=0))
    out = write_text([page], reflow_text=False)
    # writeText.js quirk: non-reflow output leads with a newline per line.
    assert out == "\naa bb\ncc dd"


def test_indent_starts_new_paragraph():
    texts = [
        ["one", "two", "three", "four"],
        ["five", "six", "seven", "eight"],
        ["nine", "ten", "eleven", "twelve."],
    ]
    specs = _flow_lines(texts, indent_first=0)
    # Indented 4th line followed by flush 5th line → 'indentation' break
    # (prev line ends terminal, new par starts capitalized, so the
    # lowercase-continuation override does not suppress it).
    specs += _flow_lines(
        [["Alpha", "beta", "gamma"], ["delta", "epsilon", "zeta"]],
        top=100 + 3 * 60, indent_first=80)
    page = _page(specs)
    assign_paragraphs(page, 0)
    assert len(page.pars) == 2
    assert page.pars[1].reason == "indentation"
    out = write_text([page], reflow_text=True)
    assert out == ("one two three four five six seven eight nine ten eleven "
                   "twelve.\nAlpha beta gamma delta epsilon zeta")


def test_large_space_break():
    specs = _flow_lines([["aa", "bb"], ["cc", "dd"]], indent_first=0)
    specs += _flow_lines([["ee", "ff"], ["gg", "hh"]], top=100 + 60 * 4,
                         indent_first=0)
    page = _page(specs)
    assign_paragraphs(page, 0)
    assert len(page.pars) == 2
    assert "large space" in page.pars[1].reason


def test_bullet_list_items_split():
    specs = _flow_lines([["Intro", "line", "ends."]], indent_first=0)
    specs += _flow_lines([["•", "first", "item."]], top=160, indent_first=0)
    specs += _flow_lines([["•", "second", "item."]], top=220, indent_first=0)
    page = _page(specs)
    assign_paragraphs(page, 0)
    reasons = [p.reason for p in page.pars]
    # (The first par's reason is 'large space (absolute)', not 'first line':
    # JS computes the first line space as `bottom - null` = bottom, which
    # trips the absolute-space rule — quirk preserved.)
    assert len(page.pars) == 3
    assert "bullet/list item" in reasons[1:]


def test_multi_page_newline_and_spans():
    p0 = _page(_flow_lines([["aa", "bb"]], indent_first=0), n=0)
    p1 = _page(_flow_lines([["cc", "dd"]], indent_first=0), n=1)
    for p in (p0, p1):
        assign_paragraphs(p, 0)
    text, spans = write_text_spans([p0, p1], reflow_text=True)
    assert text == "aa bb\ncc dd"
    assert [s["type"] for s in spans] == ["body", "body"]
    assert spans[0]["start"] == 0 and spans[0]["end"] == 5
    assert spans[1]["start"] == 6 and spans[1]["end"] == 11


def test_span_offsets_utf8():
    page = _page([[("héllo", 100, 100, 200, 140)]])
    assign_paragraphs(page, 0)
    text, spans = write_text_spans([page], reflow_text=True)
    assert text == "héllo"
    assert spans[0]["end"] == len("héllo".encode()) == 6


def test_superscript_footnote_break():
    specs = _flow_lines([["body", "text", "here."],
                         ["more", "body", "text."]], indent_first=0)
    specs += _flow_lines([["1", "note", "text."]], top=1300, indent_first=0)
    page = _page(specs)
    page.lines[2].words[0].style.sup = True
    assign_paragraphs(page, 0)
    assert len(page.pars) >= 2
    assert any(p.reason == "superscript/footnote" for p in page.pars) or \
        any("space" in p.reason for p in page.pars[1:])


def test_preserve_spacing_columns():
    """preserve_spacing pads words by horizontal position (writeText.js
    :39-89): two-column rows keep their visual gap in plain text."""
    from tests.test_reorder import _two_column_page
    from scribe_js_ray.stages.emit import write_text_spans
    page = _two_column_page()
    text, _ = write_text_spans([page], preserve_spacing=True)
    lines = [ln for ln in text.split("\n") if ln]
    # right-column words start far right of left-column ones
    left_cols = [ln for ln in lines if ln.lstrip().startswith("w0")]
    right_cols = [ln for ln in lines if ln.lstrip().startswith("w1")]
    assert left_cols and right_cols
    assert (len(right_cols[0]) - len(right_cols[0].lstrip())) > \
        (len(left_cols[0]) - len(left_cols[0].lstrip())) + 20
    # reflow+preserve_spacing: spacing wins (doReflow disabled, like ref)
    text2, _ = write_text_spans([page], reflow_text=True,
                                preserve_spacing=True)
    assert text2 == text


def test_emit_dispatch_all_formats():
    """exportData dispatch (S7): every emit format produces non-empty
    output for a parsed page; binary formats round the latin-1 column
    trip back to valid containers."""
    import random
    from scribe_js_ray.pipelines.extract import _emit
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.hocr import parse_hocr_page

    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(11)), 0)
    pages = [page]
    for fmt, sig in [("text", None), ("markdown", None), ("hocr", "<"),
                     ("alto", "<"), ("html", "<!DOCTYPE"),
                     ("docx", "PK\x03\x04"), ("xlsx", "PK\x03\x04"),
                     ("scribe", '{"scribeSegments"')]:
        out, _spans = _emit(pages, fmt, True, True)
        assert out, fmt
        if sig:
            assert out.startswith(sig), fmt
    # .scribe emit round-trips through the reference-format reader
    from scribe_js_ray.stages.emit import write_text
    from scribe_js_ray.stages.scribe_fmt import parse_scribe
    blob, _ = _emit(pages, "scribe", True, True)
    assert write_text(parse_scribe(blob.encode())) == write_text(pages)
    import pytest
    with pytest.raises(ValueError):
        _emit(pages, "nope", True, True)
