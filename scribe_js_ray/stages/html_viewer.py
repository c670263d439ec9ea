"""Positioned-viewer HTML export — port of the reference's writeHtml
(/root/reference/js/export/writeHtml.js:1-449, exportData dispatch
export/export.js:644-689 with the default no-image path).

Every word is emitted as an absolutely-positioned ``scribe-word`` span whose
baseline/left/letter-spacing/word-spacing are computed from the built-in
raw font registry metrics (``stages/fontregistry.py``), byte-identical to
the reference's output (verified live in tests/test_html_viewer.py).

Semantics pinned from the reference source:

- ``reflowText`` is hardcoded false inside writeHtml (writeHtml.js:100),
  so every line starts a new ``scribe-line`` div regardless of paragraphs.
- pages with no lines are skipped entirely and do NOT advance the running
  ``top`` offset (writeHtml.js:132-134).
- ``displayMode`` 'ebook' paints black/opaque; 'invis' yields
  ``color:transparent;opacity:1`` so text stays selectable
  (writeHtml.js:250-257, ocrObjects.js:990-1023).
- word text is inserted RAW — writeHtml performs no HTML escaping.
- the inter-word ``scribe-space`` span's style attribute is UNQUOTED in the
  reference template string (writeHtml.js:345); mirrored bug-for-bug.
- font programs are referenced via the published CDN @font-face URLs when
  ``embed_fonts`` is false (the default, scribeDocDefaults.js:108).
"""

from __future__ import annotations

import math
import re

from .fontregistry import (Face, calc_font_metrics, calc_word_metrics,
                           format_num, get_font, js_num, js_round)
from ..model import get_word_style_segments

_SMALLCAPS_SPLIT_RE = re.compile(r"([a-z]+)|([^a-z]+)")


def _make_small_caps_divs(text: str, font_size_small_caps: float) -> str:
    """writeHtml.js makeSmallCapsDivs."""
    parts = _SMALLCAPS_SPLIT_RE.findall(text)
    if not parts:
        return ""
    out = []
    for lower_part, other_part in parts:
        x = lower_part or other_part
        lower = re.search(r"[a-z]", x) is not None
        style_str = (f'style="font-size:{js_num(font_size_small_caps)}px"'
                     if lower else "")
        out.append(f'<span class="input-sub" {style_str}>{x}</span>')
    return "".join(out)


def _get_word_fill_opacity(word, display_mode: str, conf_thresh_med: int,
                           conf_thresh_high: int, overlay_opacity: int):
    """ocrObjects.js getWordFillOpacity."""
    if word.conf > conf_thresh_high:
        fill_color_hex = "#00ff7b"
    elif word.conf > conf_thresh_med:
        fill_color_hex = "#ffc800"
    else:
        fill_color_hex = "#ff0000"
    fill_color_hex_match = "#00ff7b" if getattr(word, "match_truth", None) \
        else "#ff0000"
    if display_mode == "invis":
        return "black", 0
    if display_mode == "annot":
        return "black", 1
    if display_mode == "ebook":
        return "black", 1
    if display_mode == "eval":
        return fill_color_hex_match, overlay_opacity / 100
    return fill_color_hex, overlay_opacity / 100


def write_html_viewer(pages, display_mode: str = "ebook",
                      conf_thresh_high: int = 85, conf_thresh_med: int = 75,
                      overlay_opacity: int = 80, kerning: bool = True,
                      ligatures: bool = False, remove_margins: bool = False,
                      embed_fonts: bool = False) -> str:
    """writeHtml.js writeHtml over our Page tree (no image layer)."""
    fonts_used: dict[Face, None] = {}

    body_str = "<body>\n"

    # addLine() closure state (writeHtml.js:107-127).
    active = {"left": 0, "y1": 0, "max_asc": 0, "words": ""}
    body_parts = [body_str]

    def add_line():
        if active["words"] != "":
            top_html = js_round((active["y1"] - active["max_asc"]) * 1000) \
                / 1000
            body_parts.append(
                f'    <div class="scribe-line" style="left:'
                f'{js_num(active["left"])}px;top:{js_num(top_html)}px;">\n')
            body_parts.append("        ")
            body_parts.append(active["words"])
            body_parts.append("<br>\n")
            body_parts.append("    </div>\n")
        active["words"] = ""
        active["max_asc"] = 0
        active["y1"] = 0
        active["left"] = 0

    top = 0

    for g, page in enumerate(pages):
        if page is None or not page.lines:
            continue

        min_left = 0
        min_top = 0
        max_bottom = 0
        if remove_margins:
            for line in page.lines:
                for w in line.words:
                    if min_left == 0 or w.bbox.left < min_left:
                        min_left = w.bbox.left
                    if min_top == 0 or w.bbox.top < min_top:
                        min_top = w.bbox.top
                    if w.bbox.bottom > max_bottom:
                        max_bottom = w.bbox.bottom

        body_parts.append(f'  <div class="scribe-page" id="page{g}" '
                          f'style="position:absolute;top:{js_num(top)}px;">\n')

        if remove_margins:
            top += min((max_bottom - min_top) + 200, page.height + 10)
        else:
            top += page.height + 10

        word_prev = None
        advance_diff_prev = 0
        right_side_bearing_prev = 0
        char_spacing_html_prev = 0

        for line in page.lines:
            new_line = True
            underline_prev = False

            for i, word in enumerate(line.words):
                if not word or not word.text:
                    continue

                # calcWordMetrics is called (twice in the reference) with
                # identical inputs; once here, reused.
                m = calc_word_metrics(word, ligatures=ligatures,
                                      kerning=kerning)

                if new_line:
                    word_prev = None
                    add_line()
                    scale = 1
                    active["y1"] = (word.line.bbox.bottom
                                    + word.line.baseline[1] - min_top)
                    active["left"] = word.bbox.left - min_left
                    if getattr(word, "visual_coords", True):
                        active["left"] -= m.left_side_bearing * scale

                new_line = False

                scale = 1
                angle = 0

                font = m.font
                fonts_used.setdefault(font)

                word_str = "".join(m.char_arr)
                char_spacing_html = m.char_spacing * scale
                y1 = (word.line.bbox.bottom + word.line.baseline[1]
                      - min_top)
                font_size_html = m.font_size * scale
                asc, desc = calc_font_metrics(font, font_size_html)
                font_size_small_caps = (m.font_size * scale
                                        * font.small_caps_mult)

                if asc > active["max_asc"]:
                    active["max_asc"] = asc

                style_str = ""
                style_str += f"font-size:{js_num(font_size_html)}px;"
                style_str += f"font-family:{font.font_face_name};"

                # angle is hardcoded 0 in writeHtml's word loop
                # (writeHtml.js:214), so the rotate branch never runs.

                fill, opacity = _get_word_fill_opacity(
                    word, display_mode, conf_thresh_med, conf_thresh_high,
                    overlay_opacity)

                if opacity == 0:
                    style_str += "color:transparent;"
                    style_str += "opacity:1;"
                else:
                    style_str += f"color:{fill};"
                    style_str += f"opacity:{js_num(opacity)};"

                if word.style.small_caps:
                    style_str += "text-transform:uppercase;"
                    inner_html = _make_small_caps_divs(word_str,
                                                       font_size_small_caps)
                else:
                    segments = get_word_style_segments(word)
                    if segments:
                        seg_parts = []
                        for start, end, seg_style in segments:
                            seg_font = get_font(seg_style,
                                                word.lang or "eng")
                            seg_parts.append(
                                f'<span style="font-style:'
                                f'{seg_font.font_face_style};font-weight:'
                                f'{seg_font.font_face_weight};">'
                                f'{word_str[start:end]}</span>')
                        inner_html = "".join(seg_parts)
                    else:
                        inner_html = word_str

                left_pad = 0
                if word_prev is not None:
                    if getattr(word, "visual_coords", True):
                        space_adj = (m.left_side_bearing
                                     + right_side_bearing_prev)
                    else:
                        space_adj = advance_diff_prev
                    left_pad = ((word.bbox.left - word_prev.bbox.right
                                 - space_adj - char_spacing_html_prev)
                                / math.cos(angle))

                style_str += (f"letter-spacing:"
                              f"{format_num(char_spacing_html)}px;")
                style_str += f"font-weight:{font.font_face_weight};"
                style_str += f"font-style:{font.font_face_style};"
                style_str += f"line-height:{js_num(asc + desc)}px;"

                if word.style.sup:
                    sup_offset = js_round(word.line.bbox.bottom
                                          + word.line.baseline[1]
                                          - word.bbox.bottom)
                    style_str += f"vertical-align:{js_num(sup_offset)}px;"

                if word.style.underline and opacity != 0:
                    style_str += "text-decoration:underline;"
                    style_str += f"text-decoration-color:{fill};"
                    style_str += (f"text-decoration-thickness:"
                                  f"{js_num(math.ceil(font_size_html / 12))}px;")
                    style_str += (f"text-underline-offset:"
                                  f"{js_num(math.ceil(font_size_html / 12) + math.ceil(font_size_html / 24))}px;")

                if i > 0:
                    style_str_space = ""
                    space_advance = font.space_advance()
                    space_advance_px = space_advance / font.units_per_em
                    font_size_html_space = left_pad / space_advance_px
                    if font_size_html_space > font_size_html * 3:
                        style_str_space += (f"font-size:"
                                            f"{js_num(font_size_html)}px;")
                        left_pad_final = (left_pad
                                          - space_advance_px * font_size_html)
                        style_str_space += (f"padding-left:"
                                            f"{js_num(left_pad_final)}px;")
                    else:
                        style_str_space += (f"font-size:"
                                            f"{js_num(font_size_html)}px;")
                        left_pad_final = (left_pad
                                          - space_advance_px * font_size_html)
                        style_str_space += (f"word-spacing:"
                                            f"{format_num(left_pad_final)}px;")

                    style_str_space += f"font-family:{font.font_face_name};"
                    style_str_space += f"font-style:{font.font_face_style};"
                    style_str_space += f"font-weight:{font.font_face_weight};"

                    if underline_prev and opacity != 0:
                        style_str_space += f"color:{fill};"
                        style_str_space += f"opacity:{js_num(opacity)};"
                        style_str_space += "text-decoration:underline;"
                        style_str_space += f"text-decoration-color:{fill};"
                        style_str_space += (f"text-decoration-thickness:"
                                            f"{js_num(math.ceil(font_size_html / 12))}px;")
                        style_str_space += (f"text-underline-offset:"
                                            f"{js_num(math.ceil(font_size_html / 12) + math.ceil(font_size_html / 24))}px;")

                    # Unquoted style attribute: mirrors the reference
                    # template literal exactly (writeHtml.js:345).
                    active["words"] += (f'<span class="scribe-space" '
                                        f'style={style_str_space}> </span>')

                active["words"] += (f'<span class="scribe-word" '
                                    f'id="{word.id}" style="{style_str}">'
                                    f'{inner_html}</span>')

                underline_prev = word.style.underline

                advance_total_html = (sum_js(m.advance_arr)
                                      + sum_js(m.kerning_arr)
                                      + char_spacing_html
                                      * (len(m.char_arr) - 1))
                advance_diff_prev = advance_total_html - (word.bbox.right
                                                          - word.bbox.left)

                word_prev = word
                right_side_bearing_prev = m.right_side_bearing
                char_spacing_html_prev = char_spacing_html

        add_line()
        body_parts.append("  </div>\n")

    style_str = "<style>\n  .scribe-word {\n"
    style_str += "    z-index:1;\n"
    style_str += "    white-space:nowrap;\n"
    if kerning:
        style_str += "    font-kerning:normal;\n"
    else:
        style_str += "    font-kerning:none;\n"
    style_str += "  }\n"
    style_str += "  .scribe-line {\n"
    style_str += "    position:absolute;\n"
    style_str += "    white-space:nowrap;\n"
    style_str += "  }\n"
    style_str += "  .scribe-page {\n"
    style_str += "    text-decoration-skip-ink:none;\n"
    style_str += "  }\n"
    style_str += "  .scribe-image {\n"
    style_str += "    position:absolute;\n"
    style_str += "    user-select:none;\n"
    style_str += "    pointer-events:none;\n"
    style_str += "  }\n"

    for font in fonts_used:
        # embed_fonts=true needs the raw font bytes, which this metrics-only
        # registry intentionally does not carry; the reference's default is
        # CDN references (scribeDocDefaults.js:108).
        cdn_path = "https://cdn.jsdelivr.net/npm/scribe.js-ocr@0.8.0/fonts/all/"
        style_title_case = "Regular"
        if font.style == "italic":
            style_title_case = "Italic"
        elif font.style == "bold":
            style_title_case = "Bold"
        elif font.style == "boldItalic":
            style_title_case = "BoldItalic"
        font_src = f"url('{cdn_path}{font.family}-{style_title_case}.woff')"
        style_str += f"""  @font-face {{
    font-family: '{font.font_face_name}';
    font-style: {font.font_face_style};
    font-weight: {font.font_face_weight};
    src: {font_src};
  }}\n"""

    style_str += "</style>\n"

    body_parts.append("</body>\n")
    body_str = "".join(body_parts)

    meta_str = '<meta charset="UTF-8">\n'
    return (f"<!doctype html>\n<html>\n<head>\n{meta_str}{style_str}</head>\n"
            f"{body_str}</html>")


def sum_js(arr):
    """Left-fold sum starting at 0, matching Array.reduce((a,b)=>a+b, 0)
    float association order."""
    total = 0
    for x in arr:
        total = total + x
    return total
