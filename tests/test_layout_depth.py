"""analyzeLayout long-tail passes (SURVEY M20): case-B line numbers,
endnote sections, blockquote, hang markers, enumerator schemes, columns."""

from scribe_js_ray.model import BBox, Line, Page, Word
from scribe_js_ray.stages import layout
from scribe_js_ray.stages.layout import analyze_layout


def _mk_line(page, y, words_spec, size=12.0):
    """words_spec: list of (text, left, right[, sup])."""
    line = Line(page, BBox(words_spec[0][1], y, words_spec[-1][2], y + size),
                [0.0, -2.0], size * 0.75, size * 0.5)
    for spec in words_spec:
        text, left, right = spec[0], spec[1], spec[2]
        w = Word(line, f"w{y}_{left}", text, BBox(left, y, right, y + size))
        w.conf = 100
        w.style.size = size
        if len(spec) > 3 and spec[3]:
            w.style.sup = True
        line.words.append(w)
    page.lines.append(line)
    return line


def _body_words(left, y, n=8):
    """n plain body words starting at x=left."""
    out = []
    x = left
    for k in range(n):
        out.append((f"word{k}", x, x + 40))
        x += 48
    return out


def test_case_b_line_numbers_split_prefix():
    # 2 pages, each with lines "N body text..." fused (case B).
    pages = []
    for p in range(3):
        page = Page(p, 612, 792)
        for i in range(10):
            y = 80 + i * 24
            spec = [(str(i + 1), 40, 52)] + _body_words(90, y)
            _mk_line(page, y, spec)
        pages.append(page)
    analyze_layout(pages)
    # fused case-B numbers are SPLIT into standalone linenum lines
    # inserted before their body lines (analyzeLayout.js:2091-2128):
    # page.lines alternates number-line / body-line
    for page in pages:
        assert len(page.lines) == 20
        for k, ln in enumerate(page.lines):
            if k % 2 == 0:
                assert all(w.line_num for w in ln.words), ln.words[0].text
            else:
                assert not any(w.line_num for w in ln.words)
    # split number lines form linenum pars; body lines stay body
    for page in pages:
        types = {par.type for par in page.pars}
        assert "linenum" in types and "body" in types
        for par in page.pars:
            if par.type == "body":
                assert not any(w.line_num for ln in par.lines
                               for w in ln.words)


def test_case_b_rejected_for_numeric_table():
    # Leading integers followed by mostly-numeric first content words →
    # a data table, NOT line numbers.
    pages = []
    for p in range(3):
        page = Page(p, 612, 792)
        for i in range(10):
            y = 80 + i * 24
            spec = [(str(i + 1), 40, 52),
                    (f"{1000 + i * 7}", 90, 140),
                    ("acme", 160, 200), ("widgets", 210, 270)]
            _mk_line(page, y, spec)
        pages.append(page)
    analyze_layout(pages)
    flagged = sum(1 for page in pages for ln in page.lines
                  if ln.words[0].line_num)
    assert flagged == 0


def test_endnote_section_detected():
    # Body pages with in-text sup references, then 2 note-dominated pages
    # of sup-marker entries → endnote role.
    pages = []
    for p in range(2):
        page = Page(p, 612, 792)
        for i in range(12):
            y = 80 + i * 24
            spec = _body_words(72, y, 7)
            if i == 3:
                spec.append((str(p * 6 + 1), 430, 438, True))  # sup ref
            _mk_line(page, y, spec)
        pages.append(page)
    for p in (2, 3):
        page = Page(p, 612, 792)
        for i in range(6):
            y = 80 + i * 40
            v = (p - 2) * 6 + i + 1
            spec = [(str(v), 72, 80, True)] + _body_words(95, y, 6)
            _mk_line(page, y, spec)
            _mk_line(page, y + 20, _body_words(95, y + 20, 6))
        pages.append(page)
    analyze_layout(pages)
    en_types = [par.type for par in pages[2].pars] \
        + [par.type for par in pages[3].pars]
    assert "endnote" in en_types
    # body pages keep body
    assert any(par.type == "body" for par in pages[0].pars)


def test_blockquote_inset_par():
    # Realistic sentence shapes: the quote rules carry the reference's
    # startsContinuation veto (a lowercase line after an unterminated
    # prev is a wrap, analyzeLayout.js:2737-2758), so the lead-in must
    # end terminally and the quote must open capitalized.
    def words(left, y, n, capital=False, terminal=False):
        out = _body_words(left, y, n)
        if capital:
            t, lo, hi = out[0]
            out[0] = (t.capitalize(), lo, hi)
        if terminal:
            t, lo, hi = out[-1]
            out[-1] = (t + ".", lo, hi)
        return out

    page = Page(0, 612, 792)
    for i in range(4):
        _mk_line(page, 80 + i * 24,
                 words(72, 80 + i * 24, 9, capital=(i == 0),
                       terminal=(i == 3)))
    # inset quote block: both margins in by ~60pt
    for i in range(3):
        y = 200 + i * 24
        _mk_line(page, y, words(132, y, 7, capital=(i == 0),
                                terminal=(i == 2)))
    for i in range(4):
        y = 300 + i * 24
        _mk_line(page, y, words(72, y, 9, capital=(i == 0),
                                terminal=(i == 3)))
    analyze_layout([page])
    types = [par.type for par in page.pars]
    assert "blockquote" in types
    assert "body" in types
    reasons = {p.reason for p in page.pars}
    assert "block quote" in reasons and "block quote end" in reasons


def test_enumerator_schemes():
    page = Page(0, 612, 792)
    _mk_line(page, 80, [("(a)", 72, 95)] + _body_words(110, 80, 4))
    _mk_line(page, 110, [("(b)", 72, 95)] + _body_words(110, 110, 4))
    feats = layout._features([page])
    schemes = layout._detect_numbering_schemes(feats)
    assert schemes["paren-alpha"]["active"]  # strong form: 2-run activates
    assert feats[0].enumerator["scheme"] == "paren-alpha"
    assert feats[0].enumerator["value"] == 1


def test_num_dot_needs_three():
    page = Page(0, 612, 792)
    _mk_line(page, 80, [("1.", 72, 85)] + _body_words(100, 80, 4))
    _mk_line(page, 110, [("2.", 72, 85)] + _body_words(100, 110, 4))
    feats = layout._features([page])
    schemes = layout._detect_numbering_schemes(feats)
    assert not schemes["num-dot"]["active"]  # weak form: needs a 3-run
    _mk_line(page, 140, [("3.", 72, 85)] + _body_words(100, 140, 4))
    feats = layout._features([page])
    assert layout._detect_numbering_schemes(feats)["num-dot"]["active"]


def test_detect_columns_two_column_page():
    page = Page(0, 612, 792)
    for i in range(10):
        y = 80 + i * 24
        _mk_line(page, y, _body_words(50, y, 5))    # left col ~50-280
        _mk_line(page, y, _body_words(330, y, 5))   # right col ~330-560
    feats = layout._features([page])
    for f in feats:
        f.size_ratio = 1.0
    cols = layout._detect_columns(feats, 12.0)
    assert cols is not None and len(cols) == 2
    assert cols[0]["left"] < 100 < 300 < cols[1]["left"]


def test_hang_markers_flagged():
    # Q./A. speaker labels outdented left of the body column with the
    # testimony on the same row.
    page = Page(0, 612, 792)
    for i in range(12):
        y = 80 + i * 24
        label = "Q." if i % 2 == 0 else "A."
        _mk_line(page, y, [(label, 40, 55)])
        _mk_line(page, y, _body_words(90, y, 7))
    feats = layout._features([page])
    for f in feats:
        f.size_ratio = 1.0
    layout._pass_hang_markers([page], feats, {}, 12.0)
    marked = [f for f in feats if f.hang_marker]
    assert len(marked) >= 6
    assert all(f.text in ("Q.", "A.") for f in marked)


def _mk_styled_line(page, y, words_spec, size=12.0, bold=False,
                    font="Body"):
    line = _mk_line(page, y, words_spec, size=size)
    for w in line.words:
        w.style.bold = bold
        w.style.font = font
    return line


def test_heading_signature_promotes_recurring_style():
    # Bold short labels at BODY SIZE recur above substantial prose —
    # the signature model promotes them where geometry alone cannot
    # (size_ratio == 1.0, not centered, not short enough for 2.5x).
    page = Page(0, 612, 792)
    y = 60
    for k in range(4):
        _mk_styled_line(page, y, [(f"Heading{k}", 72, 180),
                                  ("Label", 190, 250)], bold=True,
                        font="HeadFace")
        y += 24
        for i in range(4):
            _mk_styled_line(page, y, _body_words(72, y, 9), bold=False)
            y += 24
        y += 6
    analyze_layout([page])
    types = [par.type for par in page.pars]
    assert "title" in types
    heads = [p for p in page.pars if p.type == "title"]
    assert all("Heading" in p.lines[0].words[0].text for p in heads)
    assert len(heads) == 4


def test_bold_prose_not_promoted():
    # A document set mostly in bold must NOT promote bold lines.
    page = Page(0, 612, 792)
    for i in range(12):
        y = 60 + i * 24
        _mk_styled_line(page, y, _body_words(72, y, 9), bold=True)
    analyze_layout([page])
    assert all(par.type == "body" for par in page.pars)


def test_concordance_page_suppresses_notes():
    # A word-index page ("term (12)" entries) with a raised leading
    # marker low on the page must NOT open a footnote region.
    page = Page(0, 612, 792)
    for i in range(14):
        y = 80 + i * 24
        _mk_line(page, y, [(f"term{i}", 72, 130), (f"({i + 1})", 140, 175),
                           ("12:34", 190, 230), ("56:7", 240, 270)])
    # raised small marker line at the bottom (would be a footnote opener)
    _mk_line(page, 700, [("3", 72, 78, True)] + _body_words(90, 700, 4),
             size=8.0)
    analyze_layout([page])
    assert all(par.type != "footnote" for par in page.pars)
    feats = layout._features([page])
    assert layout._concordance_pages(feats) == {0}


def test_enumerated_list_items_split_paragraphs():
    # "a) ..." / "b) ..." / "c) ..." items at tight pitch would reflow
    # into one paragraph; the active enumeration splits them.
    page = Page(0, 612, 792)
    for i, marker in enumerate(("a)", "b)", "c)")):
        y = 80 + i * 14
        _mk_line(page, y, [(marker, 72, 88)] + _body_words(95, y, 6))
    analyze_layout([page])
    assert len(page.pars) == 3
    assert all(len(p.lines) == 1 for p in page.pars)


def test_body_ref_labels_cjk_and_marker_cluster_gates():
    """In-text label collection gates (analyzeLayout.js:687-700):
    CJK lines never source digit labels (Unicode-sup or sup-styled);
    symbol markers survive; a uniform-size preceding sup word means a
    marker cluster, not a reference, and is skipped — but the tiny
    '0F' bookmark (<0.5x size) is stepped over."""
    from scribe_js_ray.stages.layout import _collect_body_ref_labels

    page = Page(0, 612, 792)
    # CJK line with a literal Unicode superscript digit → no label
    _mk_line(page, 80, [("東京は", 100, 160), ("大きい¹", 170, 230)])
    # CJK line with a sup-styled digit marker → no label
    _mk_line(page, 110, [("東京", 100, 140), ("5", 145, 152, True)])
    # CJK line with a sup-styled SYMBOL marker → label kept
    _mk_line(page, 140, [("東京", 100, 140), ("d†", 145, 158, True)])
    # Latin line: sup marker cluster "8 9" (uniform size) — the FIRST
    # cluster word follows running text and is collected; followers
    # are skipped by the walk-back
    _mk_line(page, 170, [("text", 100, 140), ("8", 145, 150, True),
                         ("9", 155, 160, True)])
    # Latin line: tiny bookmark (size 3) then real sup ref → kept
    ln = _mk_line(page, 200, [("body", 100, 140), ("0F", 145, 147, True),
                              ("7", 150, 155, True)])
    ln.words[1].style.size = 3.0
    # plain Latin Unicode-sup digit → kept
    _mk_line(page, 230, [("flow", 100, 140), ("rate²", 145, 190)])

    labels, by_page = _collect_body_ref_labels([page])
    assert "†" in labels
    assert "7" in labels
    assert "2" in labels      # from rate² (Latin line)
    assert "8" in labels      # first word of the cluster
    assert "9" not in labels  # cluster follower gated
    assert "5" not in labels  # sup-styled digit on a CJK line gated
    assert "1" not in labels  # Unicode-sup digit on a CJK line gated
    assert by_page[0] == labels
