"""Glyph-run → word → line assembly.

Subset of the reference's ``groupCharsIntoPage``
(/root/reference/js/pdf/parsePdfDoc.js:1972-3287) covering the decisions
that drive text bytes on horizontal text:

- stream-order line cutting: y-jump beyond half the font size, or a
  backward x-jump past the line start (:2110-2315 core rules)
- word splitting on inter-glyph gaps > 0.24 em (space-equivalent), style
  or >20% size change (:2522-2637 core rules)
- per-line x-sort of words (:2640)
- line bbox / baseline / asc-height metrics (:2961-3026, flat baselines)
- double-render exact dedup by (text, position bucket) (:1995-2057)

Rotated/vertical text, drop caps, small-caps restore and the superscript
merge rules are later-round work; the synthetic corpus exercises the
horizontal path.
"""

from __future__ import annotations

from ...model import BBox, Line, Page, Word

# Fraction of em treated as a word gap (space advance ≈ 0.25-0.28 em in the
# base-14 faces; kerning artifacts are an order of magnitude smaller).
WORD_GAP_EM = 0.24
LINE_Y_JUMP = 0.5   # × font size
ASC_FRAC = 0.75     # glyph box above baseline
DESC_FRAC = 0.25    # glyph box below baseline


def group_chars_into_page(chars, n: int, width: float, height: float,
                          scale: float = 1.0) -> Page:
    """chars: PositionedChar list in stream order, PDF device space
    (origin bottom-left).  scale: device → output pixel scale."""
    page = Page(n, int(round(width * scale)), int(round(height * scale)))
    if not chars:
        return page

    # Exact double-render dedup (text + quantized position).
    seen = set()
    deduped = []
    for c in chars:
        if c.invisible:
            continue
        key = (c.text, c.font, round(c.x * 2), round(c.y * 2),
               round(c.font_size, 1))
        if key in seen:
            continue
        seen.add(key)
        deduped.append(c)
    chars = deduped
    if not chars:
        return page

    # Line cutting in stream order.
    lines_raw = []
    cur = [chars[0]]
    for c in chars[1:]:
        prev = cur[-1]
        size = max(prev.font_size, 1e-6)
        y_jump = abs(c.y - prev.y) > LINE_Y_JUMP * size
        backward = c.x < cur[0].x - 0.5 * size and c.y < prev.y + 0.5 * size
        if y_jump or backward:
            lines_raw.append(cur)
            cur = [c]
        else:
            cur.append(c)
    lines_raw.append(cur)

    for line_chars in lines_raw:
        # Word splitting on gaps / style changes.
        words_raw = []
        wcur = [line_chars[0]]
        for c in line_chars[1:]:
            prev = wcur[-1]
            gap = c.x - (prev.x + prev.width)
            size = max(prev.font_size, 1e-6)
            style_change = (c.font != prev.font
                            or abs(c.font_size - prev.font_size) > 0.2 * size)
            if gap > WORD_GAP_EM * size or style_change:
                words_raw.append(wcur)
                wcur = [c]
            else:
                wcur.append(c)
        words_raw.append(wcur)

        baseline_y = sorted(c.y for c in line_chars)[len(line_chars) // 2]
        sizes = sorted(c.font_size for c in line_chars)
        line_size = sizes[len(sizes) // 2]
        top = (height - baseline_y) * scale - ASC_FRAC * line_size * scale
        bottom = (height - baseline_y) * scale + DESC_FRAC * line_size * scale

        line = Line(None, BBox(0, 0, 0, 0), [0.0, -DESC_FRAC * line_size * scale],
                    ASC_FRAC * line_size * scale, 0.5 * line_size * scale)
        line.page = page

        for wchars in words_raw:
            text = "".join(c.text for c in wchars)
            if not text.strip():
                continue
            left = min(c.x for c in wchars) * scale
            right = max(c.x + c.width for c in wchars) * scale
            w_top = (height - max(c.y for c in wchars)) * scale \
                - ASC_FRAC * wchars[0].font_size * scale
            w_bottom = (height - min(c.y for c in wchars)) * scale \
                + DESC_FRAC * wchars[0].font_size * scale
            word = Word(line, f"w{n}_{len(page.lines)}_{len(line.words)}",
                        text, BBox(left, w_top, right, w_bottom))
            word.conf = 100
            word.style.font = wchars[0].font
            word.style.bold = wchars[0].bold
            word.style.italic = wchars[0].italic
            word.style.size = round(wchars[0].font_size * scale, 2)
            # Superscript: raised baseline + smaller size vs line median.
            w_base = sorted(c.y for c in wchars)[len(wchars) // 2]
            if wchars[0].font_size < line_size * 0.8 \
                    and w_base > baseline_y + 0.15 * line_size:
                word.style.sup = True
            line.words.append(word)

        if not line.words:
            continue
        line.words.sort(key=lambda w: w.bbox.left)
        line.bbox = BBox(
            min(w.bbox.left for w in line.words),
            min(w.bbox.top for w in line.words),
            max(w.bbox.right for w in line.words),
            max(w.bbox.bottom for w in line.words))
        # Keep the main-text vertical band (sup words distort the union).
        line.bbox.top = min(line.bbox.top, top)
        line.bbox.bottom = max(bottom, line.bbox.top + 1)
        page.lines.append(line)

    # Reading order: sort lines by top, then left (stream order is usually
    # already correct; this stabilizes multi-column synthetic layouts).
    page.lines.sort(key=lambda ln: (round(ln.bbox.top, 1), ln.bbox.left))
    return page
