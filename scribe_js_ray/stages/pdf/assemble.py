"""Glyph-run → word → line assembly.

Python reimplementation of the reference's ``groupCharsIntoPage``
(/root/reference/js/pdf/parsePdfDoc.js:1972-3290) covering the full
behavioral surface that drives text bytes:

- whitespace normalization + double-render dedup: same-Tm re-emission and
  the 1-5pt offset stroke/fill ("fake bold") overlap (:1995-2057)
- rotated/vertical text via virtual-horizontal coordinates (:2059-2080)
  and rotation-aware grouping along the average text direction (:2082-2108)
- stream-order line cutting with a superscript-tolerant anchor baseline:
  space-bridge cuts, reduced-script / leading-marker exemptions, the
  no-overlap body-band invariant, y-jump / backward-x / forward-x cuts,
  persistent-size-change lookahead and bridged baseline drift (:2110-2315)
- orphan single-char merge: same-size punctuation and drop caps
  (:2317-2397)
- superscript-split line-fragment merge (:2399-2460) and out-of-order
  reference-marker reattachment (:2462-2520)
- word splitting: kerning-artifact space removal, sentence-terminal
  em-dash, leading bullets, bold/italic and font-family changes, gap /
  baseline / backward-jump cuts, oversized ornamental glyphs and dot
  leaders (:2522-2637)
- per-line x-sort, small-caps boundary merge, CJK char-per-word
  (:2640-2682)
- in-word superscript segmentation, stacked footnote-ref splitting,
  iterative word-level sup detection with the size-transition guard,
  drop-cap flagging (:2684-2900)
- fake small caps detection + lowercase restoration (:2915-2959, 3202-3218)
- line bbox from non-sup chars, baseline slope from the text-direction
  vector, page angle from the mean50 of line slopes (:2961-3026, 3255-3263)

Not carried over (no consumer in this engine yet): nativeText pen
positions, fill-glyph ink boxes, struct-tag word signals.
"""

from __future__ import annotations

import math
import re

from ...functions.stats import js_hypot, js_round, round3, round6
from ...functions.textnorm import calc_lang, replace_ligatures
from ...model import BBox, Char, Line, Page, Word
from .colorfns import color_to_rgb, rgb_to_hex

# Glyph box above/below the baseline comes from each char's OWN font
# metrics (parsePdfDoc char bbox: y - fontInfo.ascent/1000*size,
# y - fontInfo.descent/1000*size) — the registry defaults 800/-200
# (parsePdfFonts.js:1444-1445) with FontDescriptor /Ascent//Descent and
# Type3 FontBBox overrides applied in build_font; _G.asc/_G.desc carry
# the em-fractions (desc positive).

_SYMBOL_FONT_RE = re.compile(
    r"^(?:Webdings|Wingdings|ZapfDingbats|Dingbats|Symbol|SymbolMT|Quivira)"
    r"(?:[-\s].*)?$", re.I)
_SYMBOL_CHAR_RE = re.compile(r"[•‣⁃∙─-➿]")
_BULLET_CHAR_RE = re.compile(r"[·•‣⁃∙"
                             r"■-◿・]")
_MATH_FONT_RE = re.compile(
    r"^(?:CM(?:MI|SY|EX)|lm(?:mi|sy|ex)|MS[AB]M|EUF[MB]|EUS[MB]|RSFS|"
    r"MT(?:MI|SY|EX))|MathJax|[A-Za-z]*Math\b", re.I)
_MATH_CHAR_RE = re.compile(
    "[ℂℏℑℕ℘ℚℜℝℤℵ"
    "∀-⋿⟀-⟯⦀-⧿⨀-⫿"
    "\U0001d400-\U0001d7ff]")
_RADICAL_RE = re.compile(r"^[√∛∜]$")
_REF_MARKER_RE = re.compile(r"^[0-9,]+$|^[®*†‡§]+$")
_PAREN_RUN_RE = re.compile(r"^(\(\d+\))+$")
_BRACKET_RUN_RE = re.compile(r"^(\[\d+\])+$")
_REF_WORD_RE = re.compile(r"^[(\[]\d+[)\]]$")
_FN_MARKER_RE = re.compile(r"^FN\d{1,3}$")


_symbol_font_cache: dict = {}


def _is_symbol_font(family: str) -> bool:
    hit = _symbol_font_cache.get(family)
    if hit is None:
        if len(_symbol_font_cache) > 4096:
            _symbol_font_cache.clear()
        hit = bool(family) and bool(_SYMBOL_FONT_RE.match(family))
        _symbol_font_cache[family] = hit
    return hit


_math_font_cache: dict = {}
_SUBSET_PREFIX_RE = re.compile(r"^[A-Z]{6}\+")


def _is_math_font(font: str) -> bool:
    # Key on the subset-stripped name: raw BaseFonts carry a random
    # per-document ABCDEF+ tag that would grow the per-worker cache
    # without bound over a corpus run.
    base = _SUBSET_PREFIX_RE.sub("", font or "")
    hit = _math_font_cache.get(base)
    if hit is None:
        if len(_math_font_cache) > 4096:
            _math_font_cache.clear()
        hit = bool(_MATH_FONT_RE.match(base))
        _math_font_cache[base] = hit
    return hit


_UPPER_RE = re.compile(r"[A-Z]")
_LOWER_RE = re.compile(r"[a-z]")
_ALNUM_ASCII_RE = re.compile(r"[A-Za-z0-9]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_CAPS_PAIR_RE = re.compile(r"[A-Z].?[A-Z]")
_TERMINAL_SET = ".!?"


class _G:
    """Mutable working glyph in top-down page coordinates."""
    __slots__ = ("text", "x", "y", "width", "size", "font", "family",
                 "bold", "italic", "smallcaps", "invisible", "orientation",
                 "dir_x", "dir_y", "perp", "artifact", "mcid", "alpha",
                 "color", "asc", "desc")

    def __init__(self, c, height, scale=1.0):
        self.text = c.text
        # px space at creation, exactly like the reference's chars
        # (parsePdfDoc.js:1925-1929: x = pageX*scale,
        # y = (pageHeightPts - pageY)*scale) — every downstream
        # heuristic and Math.round then sees the same floats.
        self.x = c.x * scale
        self.y = (height - c.y) * scale   # top-down
        self.width = c.width * scale
        self.size = c.font_size * scale
        self.font = c.font
        self.family = getattr(c, "family", None) or c.font
        self.bold = c.bold
        self.italic = c.italic
        self.smallcaps = getattr(c, "smallcaps", False)
        self.invisible = c.invisible
        self.orientation = getattr(c, "orientation", 0)
        self.dir_x = getattr(c, "dir_x", 1.0)
        self.dir_y = getattr(c, "dir_y", 0.0)
        self.perp = None
        self.artifact = getattr(c, "artifact", False)
        self.mcid = getattr(c, "mcid", None)
        self.alpha = getattr(c, "alpha", 1.0)
        self.color = getattr(c, "color", None)
        self.asc = getattr(c, "asc", 0.8)
        self.desc = getattr(c, "desc", 0.2)

    @property
    def py(self):
        return self.perp if self.perp is not None else self.y


def _dedup(glyphs: list[_G]) -> list[_G]:
    """Drop glyphs double-rendered as separate stroke + fill passes:
    exact same position (bounded lookback), or a slight offset overlap
    used for fake bold (parsePdfDoc.js:1995-2057; D1/D2)."""
    result: list[_G] = []
    pos_index: dict[tuple, int] = {}
    LOOKBACK = 500
    for g in glyphs:
        key = (g.text, g.font, js_round(g.x * 100), js_round(g.y * 100),
               g.orientation)
        hit = pos_index.get(key)
        dupe = hit if hit is not None and len(result) - hit <= LOOKBACK \
            else None
        overlap_dupe = False
        if dupe is None:
            for j in range(len(result) - 1, max(-1, len(result) - 9), -1):
                p = result[j]
                if p.text != g.text or p.font != g.font \
                        or p.orientation != g.orientation:
                    continue
                if abs(p.size - g.size) < g.size * 0.05 \
                        and abs(p.y - g.y) < g.size * 0.2:
                    x_ov = min(p.x + p.width, g.x + g.width) \
                        - max(p.x, g.x)
                    mw = min(p.width, g.width)
                    if x_ov > 0 and mw > 0 and x_ov / mw > 0.5:
                        dupe = j
                        overlap_dupe = True
                        break
        if dupe is not None:
            p = result[dupe]
            if g.bold:
                p.bold = True
            if not g.invisible:
                p.invisible = False
            if overlap_dupe:
                # Keep the fill pass's (later) position: the stroke is
                # the offset outline.
                p.x, p.y, p.width, p.size = g.x, g.y, g.width, g.size
            continue
        pos_index[key] = len(result)
        result.append(g)
    return result


def _virtualize(glyphs: list[_G], width: float, height: float) -> None:
    """Map rotated orientations into a virtual-horizontal frame so one
    grouping pass serves all four orientations (parsePdfDoc.js:2059-2080,
    top-down coordinate variant)."""
    for g in glyphs:
        if g.orientation == 1:      # reading downward on screen
            g.x, g.y = g.y, width - g.x
        elif g.orientation == 2:    # leftward
            g.x = width - g.x
            g.y = height - g.y
        elif g.orientation == 3:    # upward
            g.x, g.y = height - g.y, g.x


def _perp_distances(glyphs: list[_G]) -> None:
    """Perpendicular distance from the page's average text direction —
    groups glyphs along tilted baselines (parsePdfDoc.js:2082-2108)."""
    sx = sy = 0.0
    k = 0
    for g in glyphs:
        if g.orientation == 0:
            sx += g.dir_x
            sy += g.dir_y
            k += 1
    mag = js_hypot(sx, sy)
    if k == 0 or mag == 0:
        sx, sy = 1.0, 0.0
    else:
        sx, sy = sx / mag, sy / mag
    for g in glyphs:
        if g.orientation == 0:
            g.perp = -g.x * sy + g.y * sx


def _page_has_math(glyphs: list[_G]) -> bool:
    """parsePdfDoc.js:657-663: math-font glyph count or math-codepoint
    density gates the built-up-math grouping exemptions."""
    font_hits = char_hits = printable = 0
    for g in glyphs:
        if g.invisible or not g.text.strip():
            continue
        cp = ord(g.text[0])
        if _is_math_font(g.font):
            font_hits += 1
        if (cp >= 0x2100 or len(g.text) > 1) \
                and _MATH_CHAR_RE.search(g.text):
            char_hits += 1
        if (33 <= cp <= 127) or (cp >= 161 and not 0xE000 <= cp <= 0xF8FF):
            printable += 1
    return font_hits >= 8 or (char_hits >= 6
                              and char_hits >= printable * 0.0008)


def _cut_lines(glyphs: list[_G], page_has_math: bool) -> list[list[_G]]:
    """Stream-order line cutting (parsePdfDoc.js:2110-2315)."""
    lines: list[list[_G]] = []
    cur = [glyphs[0]]
    anchor_y = glyphs[0].py
    anchor_size = glyphs[0].size
    body_y = None if glyphs[0].text == " " else glyphs[0].py
    body_size = 0.0 if glyphs[0].text == " " else glyphs[0].size

    for i in range(1, len(glyphs)):
        g = glyphs[i]

        if g.text == " ":
            # A space at a new size AND a y-jump opens the next line;
            # bridged spaces otherwise join the current one.
            last = next((c for c in reversed(cur) if c.text != " "), None)
            if last is not None:
                mx = max(g.size, last.size)
                if abs(g.size - last.size) > mx * 0.1:
                    ygap = abs(g.py - last.py)
                    mn = min(g.size, last.size)
                    if ygap > mx * 0.7 or ygap > mn * 1.5:
                        lines.append(cur)
                        cur = [g]
                        anchor_y, anchor_size = g.py, g.size
                        body_y, body_size = None, 0.0
                        continue
            cur.append(g)
            continue

        prev = glyphs[i - 1]
        if prev.text == " ":
            prev = next((c for c in reversed(cur) if c.text != " "), prev)

        gy, py = g.py, prev.py
        ygap = gy - py
        if ygap < 0:
            ygap = -ygap
        xgap = g.x - (prev.x + prev.width)
        # Type3-style collapsed sizes: floor at the advance width.
        gsize = g.size if g.size >= g.width else g.width
        psize = prev.size if prev.size >= prev.width else prev.width
        if gsize >= psize:
            max_f, min_f = gsize, psize
        else:
            max_f, min_f = psize, gsize
        ratio = g.size / prev.size if prev.size else 1.0

        symbol_boundary = _is_symbol_font(g.family) \
            or _is_symbol_font(prev.family)
        inline_symbol = symbol_boundary and ygap < max_f * 0.5 \
            and -max_f * 0.2 < xgap < max_f

        # Inline-math exemptions (scripts, radicals, built-up stacks).
        reduced_script = g.size < anchor_size * 0.85 \
            and gy - g.size * 0.8 < anchor_y + anchor_size * 0.2 \
            and gy + g.size * 0.2 > anchor_y - anchor_size * 0.8
        radical = (prev.text in ("√", "∛", "∜")
                   or g.text in ("√", "∛", "∜"))
        radical_radicand = radical and 0.8 < ratio < 1.25 \
            and -max_f * 0.2 < xgap < max_f * 0.5 and ygap < max_f * 1.1
        math_ctx = bool(_is_math_font(g.font)
                        or _is_math_font(prev.font)
                        or radical
                        or g.size < anchor_size * 0.85
                        or prev.size < anchor_size * 0.85
                        or (0.8 < ratio < 1.25
                            and abs(gy - anchor_y) < anchor_size * 0.35))
        built_up = page_has_math and math_ctx \
            and abs(gy - anchor_y) < anchor_size * 1.3 \
            and -anchor_size * 1.5 < xgap < max_f * 4
        inline_math = reduced_script or radical_radicand or built_up

        # A full-size resume after a smaller leading marker ("¹ The ...").
        leading_marker = anchor_size < g.size * 0.85 \
            and -max_f * 0.3 < xgap < max_f * 0.8 and ygap < max_f * 0.8

        cut = False
        if g.orientation != prev.orientation and not inline_symbol:
            cut = True
        # No-overlap body-band invariant: a reduced glyph clearly outside
        # the body band is on another visual line regardless of sup rules.
        elif body_size > 0 and not leading_marker and not built_up \
                and g.size < body_size * 0.85 \
                and (gy - body_y > body_size * 0.4
                     or gy - body_y < -body_size * 0.9):
            cut = True
        elif (ygap > max_f * 0.7 or ygap > min_f * 1.5) \
                and not inline_math and not leading_marker:
            cut = True
        elif xgap < -max_f * 2 and not built_up:
            cut = True
        elif xgap > max_f * 4:
            cut = True
        elif not inline_math and not leading_marker and 0.8 < ratio < 1.25 \
                and (xgap < -max_f * 0.1 or xgap > max_f * 0.5
                     or ygap > min_f * 0.5) \
                and ygap > (min_f * 0.2 if xgap > max_f else min_f * 0.3):
            cut = True
        elif not inline_symbol and not built_up and ygap > min_f * 0.1 \
                and (ratio > 1.75 or ratio < 1 / 1.75) \
                and (xgap < -max_f * 0.1 or xgap > max_f * 0.5):
            cut = True
        elif not inline_symbol and not built_up and ygap > min_f * 0.1 \
                and (ratio < 0.8 or ratio > 1.25):
            # Persistent size change (heading → sub-heading): look ahead
            # for 3 chars continuing at the smaller size.
            target = min(g.size, prev.size)
            persist = 0
            for j in range(i + 1, len(glyphs)):
                if persist >= 3:
                    break
                if glyphs[j].text == " ":
                    continue
                if abs(glyphs[j].size - target) < target * 0.15:
                    persist += 1
                else:
                    break
            if persist >= 3:
                cut = True

        # Bridged baseline drift: same-size glyph off the anchor after an
        # intervening superscript.
        if not cut and not built_up \
                and anchor_size * 0.8 <= g.size <= anchor_size * 1.25 \
                and abs(gy - anchor_y) > anchor_size * 0.3 \
                and xgap > max_f * 0.5:
            cut = True

        if cut:
            lines.append(cur)
            cur = [g]
            anchor_y, anchor_size = gy, g.size
            body_y, body_size = gy, g.size
        else:
            cur.append(g)
            if g.size >= anchor_size * 0.8 and not (
                    page_has_math and gy < anchor_y - anchor_size * 0.25):
                anchor_y = gy
            if g.text != " " and (body_size == 0
                                  or g.size >= body_size * 0.95):
                body_size = max(body_size, g.size)
                body_y = gy
    if cur:
        lines.append(cur)
    return lines


def _merge_orphans(lines: list[list[_G]]) -> None:
    """Single-glyph lines re-homed into the line they visually belong to:
    (a) same-size punctuation emitted out of stream order, (b) drop caps
    (parsePdfDoc.js:2317-2397)."""
    extents = []
    for lc in lines:
        min_x = min(c.x for c in lc)
        max_r = max(c.x + c.width for c in lc)
        max_s = max(c.size for c in lc)
        extents.append([min_x, max_r, max_s])

    for li in range(len(lines) - 1, -1, -1):
        if len(lines[li]) != 1:
            continue
        o = lines[li][0]
        o_right = o.x + o.width
        o_top = o.y - o.asc * o.size
        merged = False
        for lj in range(len(lines)):
            if lj == li or merged:
                continue
            ext = extents[lj]
            slack = max(o.size, ext[2]) * 0.1
            if o_right < ext[0] - slack or o.x > ext[1] + slack:
                continue
            for ch in lines[lj]:
                if o.family != ch.family:
                    continue
                max_f = max(o.size, ch.size)
                min_f = min(o.size, ch.size)
                same_size = abs(o.size - ch.size) < max_f * 0.1
                x_adj = (o_right >= ch.x - max_f * 0.1
                         and o.x <= ch.x + ch.width + max_f * 0.1)
                ok = False
                if same_size and x_adj and abs(o.y - ch.y) < max_f * 0.5:
                    ok = True
                elif not same_size and o.size > ch.size * 2 \
                        and _UPPER_RE.search(o.text) and x_adj:
                    ch_top = ch.y - ch.asc * ch.size
                    if abs(o_top - ch_top) < min_f * 0.25:
                        ok = True
                if ok:
                    tgt = lines[lj]
                    idx = next((k for k, c in enumerate(tgt)
                                if c.x > o.x), len(tgt))
                    tgt.insert(idx, o)
                    ext[0] = min(ext[0], o.x)
                    ext[1] = max(ext[1], o_right)
                    ext[2] = max(ext[2], o.size)
                    del lines[li]
                    del extents[li]
                    merged = True
                    break


def _line_anchor(lc: list[_G]):
    """Dominant-size anchor of a line: size, family, median baseline of
    full-size glyphs, x extent (parsePdfDoc.js:2401-2427)."""
    max_size = 0.0
    family = None
    for c in lc:
        if c.text != " " and c.size > max_size:
            max_size = c.size
            family = c.family
    if max_size == 0:
        return None
    ys = sorted(c.py for c in lc
                if c.text != " " and c.size >= max_size * 0.8)
    if not ys:
        return None
    xs = [c.x for c in lc if c.text != " "]
    rs = [c.x + c.width for c in lc if c.text != " "]
    return {"size": max_size, "family": family,
            "baseline": ys[len(ys) // 2],
            "left": min(xs), "right": max(rs)}


def _merge_sup_fragments(lines: list[list[_G]]) -> None:
    """Adjacent fragments split by an inline superscript's y-shift merge
    back into one line; the sup-size boundary is the gating signal
    (parsePdfDoc.js:2399-2460)."""
    for li in range(len(lines) - 2, -1, -1):
        a = _line_anchor(lines[li])
        b = _line_anchor(lines[li + 1])
        if not a or not b:
            continue
        anchor = max(a["size"], b["size"])
        gap = b["left"] - a["right"]
        if gap < -anchor * 0.1 or gap > anchor:
            continue
        smaller_a = a["size"] < b["size"] * 0.85
        smaller_b = b["size"] < a["size"] * 0.85
        sup_cont = abs(gap) < anchor * 0.1 and (
            (smaller_a and a["baseline"] < b["baseline"])
            or (smaller_b and b["baseline"] < a["baseline"]))
        tol = anchor * 0.5 if sup_cont else anchor * 0.25
        if abs(a["baseline"] - b["baseline"]) > tol:
            continue
        last_a = next((c for c in reversed(lines[li]) if c.text != " "),
                      None)
        first_b = next((c for c in lines[li + 1] if c.text != " "), None)
        sup_boundary = (last_a is not None and last_a.size < anchor * 0.85) \
            or (first_b is not None and first_b.size < anchor * 0.85)
        if not sup_boundary:
            continue
        lines[li] = lines[li] + lines[li + 1]
        del lines[li + 1]


def _reattach_ref_markers(lines: list[list[_G]]) -> None:
    """Trailing-block reference markers (print-to-PDF emits a page's sup
    markers at stream end) re-homed into the full-size line whose band
    and x-extent they occupy (parsePdfDoc.js:2462-2520)."""
    anchors = [_line_anchor(lc) for lc in lines]
    for li in range(len(lines) - 1, -1, -1):
        frag = [c for c in lines[li] if c.text != " "]
        if not frag or len(frag) > 6:
            continue
        text = "".join(c.text for c in frag)
        is_fn = bool(_FN_MARKER_RE.match(text))
        if not _REF_MARKER_RE.match(text) and not is_fn:
            continue
        size = max(c.size for c in frag)
        family = max(frag, key=lambda c: c.size).family
        left = min(c.x for c in frag)
        baseline = frag[-1].py
        best, best_dist = -1, float("inf")
        for lj in range(len(lines)):
            if lj == li:
                continue
            host = anchors[lj]
            if not host:
                continue
            if is_fn:
                if not host["size"] * 0.7 <= size <= host["size"] * 1.15:
                    continue
            elif size >= host["size"] * 0.85 or size < host["size"] * 0.4:
                continue
            if host["family"] != family:
                continue
            drop = host["baseline"] - baseline
            if drop < -host["size"] * 0.1 or drop > host["size"] * 0.8:
                continue
            if left < host["left"] - host["size"] * 0.5 \
                    or left > host["right"] + host["size"]:
                continue
            if abs(drop) < best_dist:
                best_dist, best = abs(drop), lj
        if best < 0:
            continue
        tgt = lines[best]
        idx = next((k for k, c in enumerate(tgt) if c.x > left), len(tgt))
        tgt[idx:idx] = lines[li]
        anchors[best] = _line_anchor(tgt)
        del lines[li]
        del anchors[li]


def _split_words(lc: list[_G]) -> list[list[_G]]:
    """Space / gap / style word splitting with kerning-artifact space
    removal, em-dash, bullet, dot-leader and ornamental-glyph rules
    (parsePdfDoc.js:2522-2637)."""
    words: list[list[_G]] = []
    cur: list[_G] = []
    for i, g in enumerate(lc):
        if g.text == " ":
            if cur:
                nxt = next((c for c in lc[i + 1:] if c.text != " "), None)
                if nxt is not None:
                    prev = cur[-1]
                    visual_gap = nxt.x - (prev.x + prev.width)
                    adj_tol = prev.size * 0.15
                    pos_tol = max(prev.size * 0.01, g.width * 0.1)
                    if -adj_tol <= visual_gap < pos_tol \
                            and prev.text != ",":
                        # TJ kerning artifact, not a word gap.
                        continue
                words.append(cur)
                cur = []
            continue
        if cur:
            prev = cur[-1]
            gap = g.x - (prev.x + prev.width)
            min_f = min(g.size, prev.size)
            split = False
            if g.text == "—" and prev.text[:1] in _TERMINAL_SET:
                # Sentence-terminal em-dash is its own word.
                words.append(cur)
                words.append([g])
                cur = []
                continue
            if len(cur) == 1 and _BULLET_CHAR_RE.match(prev.text) \
                    and _ALNUM_ASCII_RE.match(g.text):
                words.append(cur)
                cur = [g]
                continue
            trailing_punct = g.text in ",.;:!?)]}”’" \
                and gap <= min_f * 0.15
            dash_adj = (g.text in "—–"
                        or prev.text in "—–") \
                and gap <= min_f * 0.15
            if (g.bold != prev.bold or g.italic != prev.italic) \
                    and not trailing_punct and not dash_adj:
                split = True
            elif g.family != prev.family and (
                    gap > min_f * 0.15
                    or _is_symbol_font(g.family)
                    or _is_symbol_font(prev.family)
                    or _SYMBOL_CHAR_RE.search(g.text)
                    or _SYMBOL_CHAR_RE.search(prev.text)):
                split = True
            elif prev.text == "”" and _ALPHA_RE.match(g.text):
                split = True
            elif gap > g.size * 0.15:
                split = True
            elif min_f > 0 and abs(g.y - prev.y) > min_f * 0.25:
                split = True
            elif gap < -g.size * 0.5 and g.x < prev.x:
                split = True
            elif gap < -min_f * 0.1 and min_f > 0 \
                    and g.size > prev.size * 1.1:
                split = True
            elif min_f > 0 and max(g.size, prev.size) >= min_f * 2:
                split = True
            elif g.text == "." and prev.text != ".":
                dots = 0
                for c in lc[i:]:
                    if c.text != ".":
                        break
                    dots += 1
                if dots >= 5:
                    split = True
            if split:
                words.append(cur)
                cur = []
        cur.append(g)
    if cur:
        words.append(cur)
    return words


def _merge_small_caps(words: list[list[_G]]) -> list[list[_G]]:
    """A lone capital + adjacent smaller all-caps word in the same family
    is one small-caps word (parsePdfDoc.js:2644-2668)."""
    out: list[list[_G]] = []
    i = 0
    while i < len(words):
        cur = words[i]
        nxt = words[i + 1] if i + 1 < len(words) else None
        if len(cur) == 1 and _UPPER_RE.search(cur[0].text) and nxt \
                and _UPPER_RE.search(nxt[0].text) \
                and cur[0].family == nxt[0].family \
                and nxt[0].size < cur[0].size * 0.95 \
                and abs(nxt[0].y - cur[0].y) \
                / max(min(nxt[0].size, cur[0].size), 1e-6) < 0.15:
            gap = nxt[0].x - (cur[-1].x + cur[-1].width)
            if gap <= nxt[0].size * 0.3:
                out.append(cur + nxt)
                i += 2
                continue
        out.append(cur)
        i += 1
    return out


class _W:
    __slots__ = ("chars", "sup", "dropcap", "sc_alt", "sc_title", "sc_size")

    def __init__(self, chars, sup=False):
        self.chars = chars
        self.sup = sup
        self.dropcap = False
        self.sc_alt = False
        self.sc_title = False
        self.sc_size = 0.0


def _structure_words(word_groups: list[list[_G]]) -> list[_W]:
    """In-word superscript segmentation + stacked footnote-ref splitting
    (parsePdfDoc.js:2684-2790)."""
    words: list[_W] = []
    for wi, wc in enumerate(word_groups):
        splits = []
        for ci in range(1, len(wc)):
            p, c = wc[ci - 1], wc[ci]
            min_f = min(p.size, c.size)
            if min_f == 0:
                continue
            b_delta = (c.y - p.y) / min_f
            s_delta = (c.size - p.size) / min_f
            if (b_delta < -0.25 and s_delta < -0.05) \
                    or (b_delta > 0.25 and s_delta > 0.05):
                splits.append((ci, s_delta))
        force_sup = False
        if not splits and len(wc) > 4:
            text = "".join(c.text for c in wc)
            oc = None
            if _PAREN_RUN_RE.match(text):
                oc = ("(", ")")
            elif _BRACKET_RUN_RE.match(text):
                oc = ("[", "]")
            if oc:
                for ci in range(1, len(wc)):
                    if wc[ci - 1].text == oc[1] and wc[ci].text == oc[0]:
                        splits.append((ci, 0.0))
                w_size = wc[0].size
                prev_n = word_groups[wi - 1] if wi > 0 else None
                next_n = word_groups[wi + 1] \
                    if wi + 1 < len(word_groups) else None
                pf = prev_n[0].size if prev_n else 0.0
                nf = next_n[0].size if next_n else 0.0
                if (pf > 0 and w_size < pf * 0.95) \
                        or (nf > 0 and w_size < nf * 0.95):
                    force_sup = True
        if not splits:
            words.append(_W(wc))
            continue
        start = 0
        prev_sup = False
        for ci, s_delta in splits:
            if ci > start:
                if force_sup:
                    seg_sup = True
                elif s_delta > 0:
                    seg_sup = prev_sup
                else:
                    seg_sup = s_delta < 0
                words.append(_W(wc[start:ci], sup=seg_sup))
                prev_sup = seg_sup
            start = ci
            prev_sup = True if force_sup else s_delta < 0
        if start < len(wc):
            words.append(_W(wc[start:], sup=prev_sup))
    return words


def _detect_word_sups(words: list[_W]) -> None:
    """Iterative word-level sup detection with the size-transition guard,
    drop caps, and the FN marker convention (parsePdfDoc.js:2797-2913)."""
    # Drop caps first: lone char >2x the next word's size, lower baseline.
    for i in range(len(words)):
        if words[i].sup or len(words[i].chars) != 1:
            continue
        if i + 1 >= len(words) or not words[i + 1].chars:
            continue
        dc, nx = words[i].chars[0], words[i + 1].chars[0]
        if dc.size > nx.size * 2 and dc.y > nx.y:
            words[i].dropcap = True

    def _avg(ws, attr):
        vals = [getattr(c, attr) for c in ws.chars]
        return sum(vals) / len(vals)

    changed = True
    while changed:
        changed = False
        for i in range(len(words)):
            w = words[i]
            if w.sup or w.dropcap or not w.chars:
                continue
            if len(w.chars) > 4:
                text = "".join(c.text for c in w.chars)
                if not _REF_WORD_RE.match(text):
                    continue
            w_size = _avg(w, "size")
            w_base = _avg(w, "y")

            fi = i + 1
            while fi < len(words) and (words[fi].sup or words[fi].dropcap):
                fi += 1
            size_transition = False
            if fi < len(words) and words[fi].chars:
                f_size = _avg(words[fi], "size")
                size_transition = abs(w_size - f_size) \
                    < max(w_size, f_size) * 0.1

            def _try(other):
                nonlocal changed
                o_size = _avg(other, "size")
                o_base = _avg(other, "y")
                min_f = min(w_size, o_size)
                if min_f <= 0:
                    return False
                s_delta = (w_size - o_size) / min_f
                b_delta = (w_base - o_base) / min_f
                if (s_delta < -0.05 and b_delta < -0.25) \
                        or (s_delta < -0.3 and b_delta < -0.05):
                    w.sup = True
                    changed = True
                    return True
                return False

            pi = i - 1
            while pi >= 0 and (words[pi].sup or words[pi].dropcap):
                pi -= 1
            if not size_transition and pi >= 0 and words[pi].chars \
                    and _try(words[pi]):
                continue
            ni = i + 1
            while ni < len(words) and (words[ni].sup or words[ni].dropcap):
                ni += 1
            if ni < len(words) and words[ni].chars:
                _try(words[ni])

    # FN-convention markers: full size, raised baseline.
    normal_base = next((w.chars[0].y for w in words
                        if not w.sup and not w.dropcap and w.chars), None)
    if normal_base is not None:
        for w in words:
            if w.sup or w.dropcap or not w.chars:
                continue
            if not _FN_MARKER_RE.match("".join(c.text for c in w.chars)):
                continue
            if w.chars[0].y < normal_base - w.chars[0].size * 0.2:
                w.sup = True


def _detect_fake_small_caps(words: list[_W]) -> None:
    """Mixed-size all-caps words are fake small caps; the continuation
    state lets following same-size words inherit it
    (parsePdfDoc.js:2915-2959)."""
    active = False
    base_size = 0.0
    for w in words:
        if w.sup:
            continue
        wc = w.chars
        if len(wc) < 2:
            continue
        max_s = max(c.size for c in wc)
        min_s = min(c.size for c in wc)
        mixed = max_s > 0 and min_s < max_s * 0.95
        if mixed:
            text = "".join(c.text for c in wc)
            if not _LOWER_RE.search(text) and _UPPER_RE.search(text):
                large = next((c for c in wc if c.size >= max_s * 0.95),
                             None)
                small = next((c for c in wc if c.size <= min_s * 1.05),
                             None)
                b_delta = abs(small.y - large.y) / min_s \
                    if (large and small and min_s) else 0.0
                if b_delta < 0.15:
                    w.sc_alt = True
                    w.sc_size = max_s
                    first_alpha = next(
                        (c for c in wc if _UPPER_RE.match(c.text)), None)
                    if first_alpha and first_alpha.size >= max_s * 0.95:
                        w.sc_title = True
                    active = True
                    base_size = max_s
        elif active:
            min_f = min(wc[0].size, wc[1].size)
            s_delta = (wc[1].size - wc[0].size) / min_f if min_f else 0.0
            if s_delta > 0.05:
                active = False
            else:
                w.sc_alt = True
                w.sc_size = base_size


def group_chars_into_page(chars, n: int, width: float, height: float,
                          scale: float = 1.0,
                          underline_rects=None) -> Page:
    """chars: PositionedChar list in stream order, PDF device space
    (origin bottom-left).  scale: device → output pixel scale.
    underline_rects: thin horizontal bars (top-down scaled space) matched
    against words as underlines; consumed rects get is_underline=True
    (parsePdfDoc.js:3142-3172)."""
    page_w_px = int(js_round(width * scale))
    page_h_px = int(js_round(height * scale))
    page = Page(n, page_w_px, page_h_px)
    if not chars:
        return page

    glyphs = [_G(c, height, scale) for c in chars]
    for g in glyphs:
        if g.text.isspace():
            g.text = " "

    # Remove chars outside the visible page bounds (printer slug
    # metadata above the CropBox, rows running off the page edge) with
    # a 1-fontSize margin so slight overhangs survive — runs BEFORE
    # dedup, exactly like the reference (parsePdfDoc.js:585-595).
    glyphs = [g for g in glyphs
              if not (g.x + g.size < 0 or g.x > page_w_px + g.size
                      or g.y + g.size < 0 or g.y > page_h_px + g.size)]

    glyphs = _dedup(glyphs)
    # Invisible (Tr 3) glyphs are KEPT: a scanned PDF's OCR overlay is
    # entirely invisible text and is exactly what extraction must read
    # (the reference carries them with opacity 0, parsePdfDoc.js:3106).
    if not glyphs:
        return page

    has_math = _page_has_math(glyphs)
    # virtual-horizontal frame uses the px page dims (the reference's
    # groupCharsIntoPage receives pageWidth/pageHeight in px).
    _virtualize(glyphs, page_w_px, page_h_px)
    _perp_distances(glyphs)

    raw_lines = _cut_lines(glyphs, has_math)
    _merge_orphans(raw_lines)
    _merge_sup_fragments(raw_lines)
    _reattach_ref_markers(raw_lines)

    slopes: list[float] = []
    for lc in raw_lines:
        word_groups = _split_words(lc)
        word_groups.sort(key=lambda w: w[0].x)
        word_groups = _merge_small_caps(word_groups)

        # CJK: every char its own word (parsePdfDoc.js:2671-2682).
        cjk_groups: list[list[_G]] = []
        for wc in word_groups:
            if calc_lang("".join(c.text for c in wc)) == "chi_sim":
                cjk_groups.extend([c] for c in wc)
            else:
                cjk_groups.append(wc)
        if not cjk_groups:
            continue

        words = _structure_words(cjk_groups)
        _detect_word_sups(words)
        _detect_fake_small_caps(words)

        # Line bbox from non-sup chars (sup boxes distort the band).
        all_chars = [c for w in words for c in w.chars]
        non_sup = [c for w in words if not w.sup for c in w.chars]
        box_chars = non_sup or all_chars
        # Integer-rounded bboxes, per char BEFORE the min/max — the
        # reference's OCR coordinate convention (parsePdfDoc.js:
        # 2976-2985).  Downstream layout thresholds (leading multiples,
        # gap regimes) are knife-edge sensitive to this quantization.
        l_left = min(js_round(c.x) for c in box_chars)
        l_right = max(js_round(c.x + c.width) for c in box_chars)
        l_top = min(js_round(c.y - c.asc * c.size)
                    for c in box_chars)
        l_bottom = max(js_round(c.y + c.desc * c.size)
                       for c in box_chars)

        normal_base = next((w.chars[0].y for w in words
                            if not w.sup and not w.dropcap and w.chars),
                           all_chars[0].y)
        baseline_off = js_round(normal_base - l_bottom)
        anchor_char = box_chars[0]

        # Baseline slope from the summed UNNORMALIZED per-char direction
        # vectors, V8-hypot normalized at line level
        # (parsePdfDoc.js:2996-3022; chars carry raw m0/−m1).
        sdx = sum(c.dir_x for c in box_chars)
        sdy = sum(c.dir_y for c in box_chars)
        mag = js_hypot(sdx, sdy)
        slope = 0.0
        orientation = all_chars[0].orientation
        if mag > 0:
            ndx, ndy = sdx / mag, sdy / mag
            if orientation == 1:
                slope = -ndx
            elif orientation == 2:
                slope = -ndy
            elif orientation == 3:
                slope = ndx
            elif abs(ndx) > 0.01:
                slope = ndy
        slope = round6(slope)

        # ascHeight = px fontSize × 0.6, x-height NOT inferred for PDF
        # lines (parsePdfDoc.js:3020-3022 passes null).
        line = Line(page, BBox(l_left, l_top, l_right, l_bottom),
                    [slope, baseline_off],
                    anchor_char.size * 0.6,
                    None)
        line.orientation = orientation

        for wi, w in enumerate(words):
            text = "".join(c.text for c in w.chars)
            if not text.strip():
                continue
            wc = w.chars
            # first/last char edges, per-char rounded tops/bottoms
            # (parsePdfDoc.js:3039-3042)
            w_left = js_round(wc[0].x)
            w_right = js_round(wc[-1].x + wc[-1].width)
            w_top = min(js_round(c.y - c.asc * c.size)
                        for c in wc)
            w_bottom = max(js_round(c.y + c.desc * c.size)
                           for c in wc)
            # Reference id scheme (parsePdfDoc.js:3048): the word index is
            # the loop position INCLUDING whitespace-skipped specs, and the
            # line component counts lines already appended to the page.
            word = Word(line,
                        f"word_{n + 1}_{len(page.lines) + 1}_{wi + 1}",
                        text, BBox(w_left, w_top, w_right, w_bottom))
            word.conf = 100
            # PDF glyph bboxes come from font metrics, bearings included
            # (parsePdfDoc.js:3070).
            word.visual_coords = False
            word.lang = calc_lang(text)
            word.artifact = any(c.artifact for c in wc)
            mcids = [c.mcid for c in wc if c.mcid is not None]
            if mcids:
                word.mcid = max(set(mcids), key=mcids.count)
            first_alpha = next(
                (c for c in wc if _ALNUM_ASCII_RE.match(c.text)), wc[0])
            word.style.font = first_alpha.family
            word.style.bold = first_alpha.bold
            word.style.italic = first_alpha.italic
            # Fill color → hex; opacity 0 for Tr-3 else the draw-time
            # fill alpha (parsePdfDoc.js:3104-3112).  Alpha-0 text is
            # KEPT (like Tr-3: it is the OCR layer extraction must
            # read); opacity marks it hidden downstream.
            if first_alpha.color is not None:
                rgb = color_to_rgb(first_alpha.color)
                if rgb is not None:
                    word.style.color = rgb_to_hex(rgb)
            if first_alpha.invisible:
                word.style.opacity = 0
            else:
                word.style.opacity = first_alpha.alpha
            if w.sup:
                word.style.size = round3(wc[0].size)
                word.style.sup = True
            elif w.dropcap:
                word.style.size = round3(wc[0].size)
                word.style.dropcap = True
            else:
                word.style.size = round3(first_alpha.size)

            if first_alpha.smallcaps:
                word.style.small_caps = True
            elif w.sc_alt and not _LOWER_RE.search(text) \
                    and _CAPS_PAIR_RE.search(text):
                word.style.small_caps = True
                if w.sc_size > 0:
                    word.style.size = round3(w.sc_size)

            # Char objects; sup char boxes normalize onto the body line.
            # Math.round per component and a pre-rounded sup offset
            # (parsePdfDoc.js:3179-3191).
            chars_out = []
            for c in wc:
                c_top = js_round(c.y - c.asc * c.size)
                c_bottom = js_round(c.y + c.desc * c.size)
                if w.sup:
                    off = js_round(c.y - normal_base)
                    c_top -= off
                    c_bottom -= off
                chars_out.append(Char(c.text, BBox(
                    js_round(c.x), c_top,
                    js_round(c.x + c.width), c_bottom)))

            # Fake-small-caps lowercase restoration
            # (parsePdfDoc.js:3202-3218).
            if word.style.small_caps and w.sc_alt:
                if w.sc_size > 0:
                    for co, c in zip(chars_out, wc):
                        if c.size < w.sc_size * 0.95:
                            co.text = co.text.lower()
                elif w.sc_title:
                    for co in chars_out[1:]:
                        co.text = co.text.lower()
                else:
                    for co in chars_out:
                        co.text = co.text.lower()
                word.text = "".join(co.text for co in chars_out)

            # Underline: a thin bar overlapping the word just below its
            # baseline, pinned within the line's extent (+0.5 em stroke
            # overhang) so a table-row divider passing under the word
            # does not read as an underline.
            if underline_rects and orientation == 0:
                base_y = wc[0].y
                sz = wc[0].size
                overhang = sz * 0.5
                for rect in underline_rects:
                    if rect["right"] > w_left and rect["left"] < w_right \
                            and base_y - sz * 0.1 <= rect["y"] \
                            <= base_y + sz * 0.35 \
                            and rect["left"] >= l_left - overhang \
                            and rect["right"] <= l_right + overhang:
                        # Color gate: a saturated rule whose hue differs
                        # from the text is a decorative rule, not an
                        # underline; grayscale rules and dark-on-dark
                        # pairs are exempt (parsePdfDoc.js:3155-3167).
                        r_rgb = color_to_rgb(rect.get("color"))
                        c_rgb = color_to_rgb(wc[0].color)
                        if r_rgb is not None and c_rgb is not None:
                            rect_gray = max(r_rgb) - min(r_rgb) < 0.1
                            both_dark = all(v < 0.3 for v in r_rgb) and \
                                all(v < 0.3 for v in c_rgb)
                            if not both_dark and not rect_gray and any(
                                    abs(rv - cv) > 0.1
                                    for rv, cv in zip(r_rgb, c_rgb)):
                                continue
                        word.style.underline = True
                        rect["is_underline"] = True
                        break

            word.chars = chars_out
            word.text = replace_ligatures(word.text)
            # Intra-word style runs (parsePdfDoc.js:3223-3241): run
            # indices count ligature-EXPANDED text; a word whose first
            # char's style differs from the word style is skipped (a
            # run cannot express a styled prefix).
            if (wc[0].bold == word.style.bold
                    and wc[0].italic == word.style.italic
                    and wc[0].smallcaps == word.style.small_caps):
                text_off = len(replace_ligatures(wc[0].text))
                for ci in range(1, len(wc)):
                    pch, cch = wc[ci - 1], wc[ci]
                    if (cch.bold != pch.bold or cch.italic != pch.italic
                            or cch.smallcaps != pch.smallcaps):
                        delta = {}
                        if cch.bold != word.style.bold:
                            delta["bold"] = cch.bold
                        if cch.italic != word.style.italic:
                            delta["italic"] = cch.italic
                        if cch.smallcaps != word.style.small_caps:
                            delta["small_caps"] = cch.smallcaps
                        word.style_runs = word.style_runs or []
                        word.style_runs.append(
                            {"i": text_off, "style": delta})
                    text_off += len(replace_ligatures(cch.text))
            line.words.append(word)

        if not line.words:
            continue
        # updateLineBbox (parsePdfDoc.js:3249, ocrObjects.js:609-617):
        # the final line bbox is the union of ALL word bboxes — sup
        # words included — overriding the non-sup-only assembly box
        # above (which still anchored the baseline/ascHeight math);
        # the baseline offset shifts with the bottom so the rendered
        # baseline is unchanged.
        u_left = min(w.bbox.left for w in line.words)
        u_top = min(w.bbox.top for w in line.words)
        u_right = max(w.bbox.right for w in line.words)
        u_bottom = max(w.bbox.bottom for w in line.words)
        line.baseline[1] += line.bbox.bottom - u_bottom
        line.bbox = BBox(u_left, u_top, u_right, u_bottom)
        page.lines.append(line)
        if orientation == 0 and abs(slope) < 0.3:
            slopes.append(slope)

    # Page angle from the mean of the middle 50% of line slopes
    # (parsePdfDoc.js:3255-3263).
    if slopes:
        from ...functions.stats import mean50
        rise = mean50(slopes) or 0.0
        page.angle = math.degrees(math.asin(max(-1.0, min(1.0, rise))))

    # Reading order IS content-stream order: the reference never re-sorts
    # page lines (parsePdfDoc.js keeps cut order; reflowPars/decideBreak
    # assume it, SURVEY §2.9).  A y-sort here breaks two-column docs,
    # whose streams paint the left column fully before the right.
    return page
