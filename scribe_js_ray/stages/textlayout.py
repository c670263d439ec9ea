"""Plain text → synthetic typeset pages (reference:
/root/reference/js/import/convertPageText.js:1-299), plus the run-styled
variant the DOCX import uses (convertDocDocx.js:700-870).

Semantics mirrored: letter-size pages (612×792), Times 14 pt, 14.4 pt line
height, 30/20 pt margins; whitespace-preserving tokenization (:62-87);
greedy word wrap against the available width with the
leading-whitespace-must-fit and oversized-word force-place rules
(:150-265); one source text line → one paragraph (possibly page-spanning);
page breaks on vertical overflow including on blank lines (:131-143).

The styled variant adds the DOCX typesetter's run semantics: per-word
bold/italic/smallCaps/underline/superscript flags, per-run font size
(w:sz ÷ 2 with pStyle → docDefaults inheritance) driving widths and
word boxes (convertDocDocx.js:776-830 runFontSize), superscripts at
0.6× the run size with a raised box (:817-843), DOCX-only single-space
whitespace advance (:777), and cross-run word merging gated on sup AND
raw size agreeing (:787-790 stylesMatch).

Metrics (r5): widths, bearings and asc/desc heights come from the SAME
built-in NimbusRoman face the reference measures with — the numeric
registry dump in ``stages/fontregistry.py`` — so both the layout
decisions AND the emitted coordinates are byte-identical to the
reference's (pinned live in tests/test_html_viewer.py; the shipped
faces carry no kerning tables, verified).
"""

from __future__ import annotations

import re

from ..model import BBox, Line, Page, Par, Word

FONT_FAMILY = "Times New Roman"
FONT_SIZE = 14
LINE_HEIGHT = 14.4
MARGIN_VERTICAL = 30
MARGIN_HORIZONTAL = 20
_SUP_RATIO = 0.6   # superscript render size (convertDocDocx.js:818)

_WS_RE = re.compile(r"\s")

# Abbreviations that end in a period without ending a sentence
# (convertDocDocx.js:16-27 SENTENCE_ABBREVS).
_SENT_ABBREVS = frozenset((
    "mr", "mrs", "ms", "dr", "prof", "rev", "sr", "jr",
    "etc", "vs", "vol", "no",
    "eg", "ie", "al", "cf",
    "p", "pp", "pg", "sec", "ch", "art", "cl", "fig", "tab", "ex",
    "us", "uk",
))

_SENT_TRAIL_RE = re.compile(r"^(.+[.!?])([\"')\]}>]*)$")


def _is_sentence_ending(word: str) -> bool:
    """Sentence-ending word test for lineSplitMode='sentence'
    (convertDocDocx.js:34-58 isSentenceEnding): trailing close-quotes/
    brackets are peeled, '!'/'?' always end, ellipses / single-initial
    'A.' / digit-period / known abbreviations never do."""
    m = _SENT_TRAIL_RE.match(word)
    if not m and not re.search(r"[.!?]$", word):
        return False
    core = m.group(1) if m else word
    if re.search(r"[!?]$", core):
        return True
    if re.search(r"\.{2,}$", core):
        return False
    if re.match(r"^[A-Z]\.$", core):
        return False
    if re.search(r"\d\.$", core):
        return False
    if core[:-1].lower() in _SENT_ABBREVS:
        return False
    if core.replace(".", "").lower() in _SENT_ABBREVS:
        return False
    return True

_PLAIN_STYLE = {"bold": False, "italic": False, "small_caps": False,
                "underline": False, "sup": False, "font": None,
                "size": None}


def _split_tokens(line: str):
    """Whitespace-preserving tokenization (convertPageText.js:62-87)."""
    tokens = []
    current = ""
    in_ws = False
    for ch in line:
        ch_ws = bool(_WS_RE.match(ch))
        if ch_ws != in_ws:
            if current:
                tokens.append((current, in_ws))
                current = ""
            in_ws = ch_ws
        current += ch
    if current:
        tokens.append((current, in_ws))
    return tokens


def typeset_styled_paragraphs(paragraphs, page_dims=None,
                              text_source: str = "text",
                              line_split_mode: str = "width") -> list[Page]:
    """Typeset ``(par_type, runs)`` paragraphs into synthetic pages.

    ``runs`` is a list of ``(text, styles)`` — ``styles`` a dict with
    bold/italic/small_caps/underline/sup keys, or None for plain.  A
    paragraph of ``None`` runs is a blank source line (vertical advance
    only).  Word wrap / page break rules are convertPageText.js's; run
    styles ride each word; a non-whitespace run boundary merges into
    the previous word only when the sup flag agrees
    (convertDocDocx.js:787-790).

    ``line_split_mode``: 'width' (default) wraps against the page
    width; 'sentence' disables the width checks and breaks the line at
    the whitespace after each sentence-ending word instead — the
    reference's docxLineSplitMode option (convertDocDocx.js:609-611,
    :772-775, :872-874; scribeDocDefaults.js:42)."""
    from .fontregistry import get_font, js_round

    class _St:
        font = FONT_FAMILY
        bold = italic = False

    face = get_font(_St())
    if page_dims is None:
        page_dims = (612, 792)  # letter
    width, height = page_dims
    asc_h = face.ascender * (FONT_SIZE / face.units_per_em)
    desc_h = face.descender * (FONT_SIZE / face.units_per_em)
    docx_mode = text_source == "docx"
    sentence_mode = line_split_mode == "sentence"

    page_index = 0
    page = Page(page_index, width, height)
    page.text_source = text_source
    pages = [page]

    available_width = width - MARGIN_HORIZONTAL * 2
    current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    def new_page():
        nonlocal page, page_index, current_y
        page_index += 1
        page = Page(page_index, width, height)
        page.text_source = text_source
        pages.append(page)
        current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    any_content = False
    for entry in paragraphs:
        par_type, runs = entry[0], entry[1]
        par_footnote_id = entry[2] if len(entry) > 2 else None
        par_footnote_index = entry[3] if len(entry) > 3 else None
        # Page-break check happens once per PARAGRAPH — the reference's
        # docx flow has no mid-paragraph page breaks; long paragraphs
        # spill past the bottom margin (convertDocDocx.js:711-722).
        if current_y + FONT_SIZE > height - MARGIN_VERTICAL:
            new_page()

        if runs is None:  # blank source line: one wordless line iteration
            current_y += LINE_HEIGHT
            continue

        # Flatten runs into a styled token stream.  run_start marks the
        # first token of each run (the cross-run merge candidate).
        tokens = []  # (text, is_ws, styles, run_start)
        for text, styles in runs:
            st = styles or _PLAIN_STYLE
            for ti, (tok, is_ws) in enumerate(_split_tokens(text)):
                tokens.append((tok, is_ws, st, ti == 0))
        if not tokens:
            # empty-text runs still run one wordless line iteration
            # (convertDocDocx.js:735-902: words=[''] all skipped,
            # currentY advances once)
            current_y += LINE_HEIGHT
            continue
        any_content = True

        par_lines: list[Line] = []
        par_right = MARGIN_HORIZONTAL

        def close_par():
            nonlocal par_lines, par_right
            if par_lines:
                par = Par(page, BBox(
                    MARGIN_HORIZONTAL, par_lines[0].bbox.top,
                    par_right, par_lines[-1].bbox.bottom))
                par.lines = list(par_lines)
                par.type = par_type
                if par_footnote_id is not None:
                    # the footnote index IS the parNum for docx-sourced
                    # notes (convertDocDocx.js:915-919)
                    par.par_num = str(par_footnote_index)
                    par.footnote_ref = par_footnote_id  # resolved later
                for ln in par_lines:
                    ln.par = par
                page.pars.append(par)
            par_lines = []
            par_right = MARGIN_HORIZONTAL

        def run_size(st):
            # per-run w:sz (half-points/2) with FONT_SIZE fallback
            # (convertDocDocx.js:776 runFontSize)
            return st.get("size") or FONT_SIZE

        def word_size(st):
            # superscripts render at 0.6x the RUN size
            # (convertDocDocx.js:818-820 effectiveFontSize)
            rs = run_size(st)
            return rs * _SUP_RATIO if st["sup"] else rs

        def apply_style(word, st):
            word.style.font = st.get("font") or FONT_FAMILY
            word.style.bold = st["bold"]
            word.style.italic = st["italic"]
            word.style.small_caps = st["small_caps"]
            word.style.underline = st["underline"]
            if st.get("footnote_id"):
                # Stash the source footnote id; the DOCX importer
                # resolves it to the footnote Par after typesetting
                # (convertDocDocx.js:924-929 link).
                word.footnote_par = st["footnote_id"]
            # style.size carries the RAW nullable run fontSize, exactly
            # like the reference (convertDocDocx.js:861 wordObj.style.size
            # = run.styles.fontSize) — null when no w:sz anywhere.
            word.style.size = st.get("size")
            if st["sup"]:
                word.style.sup = True

        idx = 0
        while idx < len(tokens):
            baseline = [0, desc_h]
            line_top = js_round(current_y - asc_h)
            # MINUS the (negative) descender: the docx typesetter's line
            # bottom sits below the baseline (convertDocDocx.js:738),
            # unlike convertPageText's `currentY + DESCENDER_HEIGHT`.
            line_bottom = js_round(current_y - desc_h)
            current_x = float(MARGIN_HORIZONTAL)
            line = Line(page, BBox(MARGIN_HORIZONTAL, line_top,
                                   MARGIN_HORIZONTAL, line_bottom),
                        baseline, asc_h, None)
            last_was_ws = True

            def place(tok_text, st, wbox_left, tok_width):
                # per-word vertical extent at the RUN size (the
                # reference recomputes asc/desc from runFontSize per
                # word, convertDocDocx.js:828-830)
                rs = run_size(st)
                word_asc = face.ascender * (rs / face.units_per_em)
                word_desc = face.descender * (rs / face.units_per_em)
                if st["sup"]:
                    # raised box at the reduced size, bottom at the
                    # x-height (convertDocDocx.js:832-843)
                    sup_height = word_asc * _SUP_RATIO
                    w_bottom = js_round(current_y - word_asc * 0.7)
                    w_top = js_round(w_bottom - sup_height)
                else:
                    w_top = js_round(current_y - word_asc)
                    w_bottom = js_round(current_y - word_desc)
                wbox = BBox(js_round(wbox_left), w_top,
                            js_round(wbox_left + tok_width), w_bottom)
                wid = (f"word_{page_index + 1}_"
                       f"{len(page.lines) + 1}_{len(line.words) + 1}")
                word = Word(line, wid, tok_text, wbox)
                word.conf = 100
                if docx_mode:
                    # convertDocDocx.js:865 clears visualCoords; the plain
                    # txt import (convertPageText.js) leaves the default.
                    word.visual_coords = False
                apply_style(word, st)
                line.words.append(word)
                return word

            last_consumed = idx
            pending_sentence_end = False
            for j in range(idx, len(tokens)):
                tok_text, is_ws, st, run_start = tokens[j]
                if is_ws:
                    # sentence mode: the whitespace AFTER a sentence-
                    # ending word completes the line, unconsumed
                    # (convertDocDocx.js:772-775)
                    if sentence_mode and pending_sentence_end:
                        break
                    # One space width at the run size per whitespace
                    # token, consumed unconditionally — the docx flow
                    # has no leading-whitespace fit rule
                    # (convertDocDocx.js:776-780).
                    current_x += _ref_text_width(" ", run_size(st), face)
                    last_consumed = j + 1
                    last_was_ws = True
                    continue
                # cross-run merge: first token of a run directly after
                # a word (no whitespace) with sup AND raw size agreeing
                # (convertDocDocx.js:788 stylesMatch)
                if (run_start and not last_was_ws and line.words
                        and j > idx
                        and line.words[-1].style.sup == st["sup"]
                        and line.words[-1].style.size == st.get("size")):
                    prev_w = line.words[-1]
                    merged = prev_w.text + tok_text
                    # the combined width is measured at the merging
                    # run's PLAIN size — no sup ratio — exactly like
                    # the reference (convertDocDocx.js:792)
                    merged_width = _ref_text_width(merged, run_size(st),
                                                   face)
                    if not sentence_mode and \
                            prev_w.bbox.left + merged_width > \
                            MARGIN_HORIZONTAL + available_width:
                        break
                    # intra-word style change → styleRun delta vs the
                    # word's base style (convertDocDocx.js:800-812)
                    tail = prev_w.style
                    if prev_w.style_runs:
                        from ..model import get_word_style_segments
                        tail = get_word_style_segments(prev_w)[-1][2]
                    if (tail.bold != st["bold"]
                            or tail.italic != st["italic"]
                            or tail.small_caps != st["small_caps"]):
                        delta = {}
                        if st["bold"] != prev_w.style.bold:
                            delta["bold"] = st["bold"]
                        if st["italic"] != prev_w.style.italic:
                            delta["italic"] = st["italic"]
                        if st["small_caps"] != prev_w.style.small_caps:
                            delta["small_caps"] = st["small_caps"]
                        prev_w.style_runs = prev_w.style_runs or []
                        prev_w.style_runs.append(
                            {"i": len(prev_w.text), "style": delta})
                    prev_w.text = merged
                    prev_w.bbox = BBox(prev_w.bbox.left, prev_w.bbox.top,
                                       js_round(prev_w.bbox.left
                                                + merged_width),
                                       prev_w.bbox.bottom)
                    # currentX snaps to the ROUNDED right edge
                    # (convertDocDocx.js:815 currentX = lastWord.bbox.right)
                    current_x = float(prev_w.bbox.right)
                    last_consumed = j + 1
                    last_was_ws = False
                    continue
                tok_width = _ref_text_width(tok_text, word_size(st), face)
                if not sentence_mode and line.words and \
                        current_x + tok_width > \
                        MARGIN_HORIZONTAL + available_width:
                    break  # wrap before this word
                place(tok_text, st, current_x, tok_width)
                current_x += tok_width
                last_consumed = j + 1
                last_was_ws = False
                if sentence_mode and _is_sentence_ending(tok_text):
                    pending_sentence_end = True

            if line.words:
                # line bbox right = last word's ROUNDED right edge
                # (convertDocDocx.js:888-894), unlike convertPageText's
                # Math.round(currentX) incl. trailing whitespace.
                line.bbox = BBox(line.words[0].bbox.left, line_top,
                                 line.words[-1].bbox.right, line_bottom)
                page.lines.append(line)
                par_lines.append(line)
                par_right = max(par_right, line.bbox.right)
            # advance even for wordless iterations (whitespace-only or
            # empty-text tails, convertDocDocx.js:901)
            current_y += LINE_HEIGHT
            if last_consumed == idx and not line.words:
                # nothing consumed and nothing placed: all remaining
                # tokens were unplaceable — cannot occur in the
                # reference's run-walk, so just stop rather than spin
                break
            idx = last_consumed

        close_par()

    if not any_content and len(pages) == 1:
        page.angle = 0
        return pages
    for p in pages:
        p.angle = 0
    return pages


def _ref_text_width(text: str, size: float, face) -> float:
    """convertPageText.js getTextWidth: advance sum minus first/last side
    bearings, in px (CHAR_SPACING is 0)."""
    advance_total = 0
    for ch in text:
        advance_total = advance_total + face.glyph(ch)[0]
    last_g = face.glyph(text[-1])
    first_g = face.glyph(text[0])
    left_bearing = first_g[1] if (first_g[1] == first_g[1]
                                  and first_g[1] != 0) else 0
    last_max = last_g[2] if (last_g[2] == last_g[2]
                             and last_g[2] != 0) else 0
    right_bearing = face.glyph(text[-1])[0] - last_max
    word_width1 = advance_total + 0 - left_bearing - right_bearing
    return word_width1 * (size / face.units_per_em)


def parse_text_pages(text_str: str, page_dims=None) -> list[Page]:
    """Raw text → list of synthetic Page trees — exact port of
    convertPageText.js:94-299 measured against the real built-in
    NimbusRoman metrics (fontregistry), byte-parity with the reference's
    positioned output: one source line per paragraph, blank lines advance
    the cursor, greedy wrap with the leading-whitespace-must-fit and
    oversized-word force-place rules, page breaks on vertical overflow."""
    from .fontregistry import get_font, js_round

    class _St:
        font = FONT_FAMILY
        bold = italic = False

    face = get_font(_St())
    asc_h = face.ascender * (FONT_SIZE / face.units_per_em)
    desc_h = face.descender * (FONT_SIZE / face.units_per_em)

    if page_dims is None:
        page_dims = (612, 792)
    page_w, page_h = page_dims

    lines = re.split(r"\r?\n", text_str)
    page_index = 0
    page = Page(page_index, page_w, page_h)
    page.text_source = "text"
    if not lines or all(not ln.strip() for ln in lines):
        return [page]

    pages = [page]
    available_width = page_w - MARGIN_HORIZONTAL * 2
    current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    def new_page():
        nonlocal page, page_index, current_y
        page_index += 1
        page = Page(page_index, page_w, page_h)
        page.text_source = "text"
        pages.append(page)
        current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    for line_text in lines:
        if not line_text or not line_text.strip():
            current_y += LINE_HEIGHT
            if current_y + FONT_SIZE > page_h - MARGIN_VERTICAL:
                new_page()
            continue

        word_tokens = _split_tokens(line_text)

        par_lines: list[Line] = []
        par_right = MARGIN_HORIZONTAL

        def close_par():
            nonlocal par_lines, par_right
            if par_lines:
                par = Par(par_lines[0].page,
                          BBox(MARGIN_HORIZONTAL, par_lines[0].bbox.top,
                               par_right, par_lines[-1].bbox.bottom))
                par.lines = list(par_lines)
                for ln in par_lines:
                    ln.par = par
                par_lines[0].page.pars.append(par)
                par_lines = []
                par_right = MARGIN_HORIZONTAL

        idx = 0
        while idx < len(word_tokens):
            if current_y + FONT_SIZE > page_h - MARGIN_VERTICAL:
                close_par()
                new_page()

            line_top = js_round(current_y - asc_h)
            line_bottom = js_round(current_y + desc_h)
            line = Line(page, BBox(MARGIN_HORIZONTAL, line_top,
                                   MARGIN_HORIZONTAL, line_bottom),
                        [0, desc_h], asc_h, None)

            current_x = float(MARGIN_HORIZONTAL)
            width_so_far = 0.0
            last_consumed = idx

            for j in range(idx, len(word_tokens)):
                tok_text, is_ws = word_tokens[j]
                tok_width = _ref_text_width(tok_text, FONT_SIZE, face)
                if is_ws:
                    if not line.words:
                        # leading whitespace allowed only if it fits
                        if width_so_far + tok_width > available_width:
                            break
                        current_x += tok_width
                        width_so_far += tok_width
                        last_consumed = j + 1
                    else:
                        # trailing/middle whitespace always consumed
                        current_x += tok_width
                        width_so_far += tok_width
                        last_consumed = j + 1
                else:
                    if line.words and \
                            width_so_far + tok_width > available_width:
                        break  # wrap before this word
                    wid = (f"word_{page_index + 1}_"
                           f"{len(page.lines) + 1}_{len(line.words) + 1}")
                    word = Word(line, wid, tok_text,
                                BBox(js_round(current_x), line_top,
                                     js_round(current_x + tok_width),
                                     line_bottom))
                    word.conf = 100
                    word.style.font = FONT_FAMILY
                    line.words.append(word)
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = j + 1

            if not line.words:
                # Force-place a single oversized word; oversized leading
                # whitespace drops the rest of the source line
                # (convertPageText.js:240-264).
                nxt = word_tokens[idx] if idx < len(word_tokens) else None
                if nxt and not nxt[1]:
                    tok_text = nxt[0]
                    tok_width = _ref_text_width(tok_text, FONT_SIZE, face)
                    wid = (f"word_{page_index + 1}_"
                           f"{len(page.lines) + 1}_{len(line.words) + 1}")
                    word = Word(line, wid, tok_text,
                                BBox(js_round(current_x), line_top,
                                     js_round(current_x + tok_width),
                                     line_bottom))
                    word.conf = 100
                    word.style.font = FONT_FAMILY
                    line.words.append(word)
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = idx + 1
                else:
                    break

            if line.words:
                line.bbox = BBox(line.words[0].bbox.left, line_top,
                                 js_round(current_x), line_bottom)
                page.lines.append(line)
                par_lines.append(line)
                par_right = max(par_right, line.bbox.right)
                current_y += LINE_HEIGHT
                idx = last_consumed

        close_par()

    return pages
