"""combine_ocr_page / build_consensus_page (SURVEY J1-J2)."""

from scribe_js_ray.model import line_text, page_text
from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.combine import build_consensus_page, \
    combine_ocr_page

from tests.test_formats import make_alto


def _page(lines):
    xml = make_alto(lines)
    page, _ = parse_alto_page(xml, 0)
    return page


def test_combine_merges_overlapping_line():
    # base line at y=200; new layer has an extra word on the same line
    base = _page([[("Hello", {}), ("world", {})]])
    extra = _page([[("Hello", {}), ("world", {}), ("again", {})]])
    # keep only the extra word in layer A (positioned after 'world')
    a_line = extra.lines[0]
    a_line.words = [w for w in a_line.words if w.text == "again"]
    combine_ocr_page(extra, base)
    assert line_text(base.lines[0]) == "Hello world again"


def test_combine_inserts_word_in_x_order():
    base = _page([[("alpha", {}), ("gamma", {})]])
    layer = _page([[("alpha", {}), ("beta", {}), ("gamma", {})]])
    mid = layer.lines[0]
    mid.words = [w for w in mid.words if w.text == "beta"]
    combine_ocr_page(layer, base)
    assert line_text(base.lines[0]) == "alpha beta gamma"


def test_combine_adds_new_line_when_no_match():
    base = _page([[("First", {}), ("line", {})]])
    # second page's line sits far below (y offset via a second fixture line)
    other = _page([[("x", {})], [("New", {}), ("row", {})]])
    new_line_page = other
    new_line_page.lines = [other.lines[1]]
    combine_ocr_page(new_line_page, base)
    texts = [line_text(ln) for ln in base.lines]
    assert "First line" in texts
    assert "New row" in texts
    assert len(base.lines) == 2


def test_consensus_unanimous_high_conf():
    base = _page([[("same", {}), ("words", {})]])
    comps = [_page([[("same", {}), ("words", {})]]) for _ in range(2)]
    stats = build_consensus_page(base, comps)
    assert stats == {"total": 2, "high": 2, "medium": 0, "low": 0,
                     "replaced": 0}
    assert all(w.conf == 100 for ln in base.lines for w in ln.words)


def test_consensus_plurality_replaces_base():
    base = _page([[("tyop", {})]])
    comps = [_page([[("typo", {})]]) for _ in range(2)]
    stats = build_consensus_page(base, comps)
    assert stats["replaced"] == 1
    assert page_text(base) == "typo"
    assert base.lines[0].words[0].conf == 50


def test_consensus_partial_agreement_medium():
    base = _page([[("word", {})]])
    comps = [_page([[("word", {})]]), _page([[("wird", {})]])]
    stats = build_consensus_page(base, comps)
    assert stats["medium"] == 1
    assert base.lines[0].words[0].conf == 80
    assert page_text(base) == "word"  # not replaced


def test_consensus_tie_does_not_replace():
    base = _page([[("aaa", {})]])
    comps = [_page([[("bbb", {})]]), _page([[("ccc", {})]])]
    stats = build_consensus_page(base, comps)
    assert stats["replaced"] == 0
    assert page_text(base) == "aaa"
