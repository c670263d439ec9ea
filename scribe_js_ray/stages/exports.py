"""Structural exporters: page trees → hOCR and Markdown strings.

References:
* ``write_hocr`` — /root/reference/js/export/writeHocr.js:17-152 (line/word
  spans with bbox+baseline+x_wconf titles, x_font/x_fsize extensions,
  style attr for bold/italic/small-caps, <sup>/ocr_dropcap nesting).
  The font-state meta block is emitted with the fontContainer.js:468-478
  defaults (our flows never run font optimization/recognition).
* ``write_markdown`` — /root/reference/js/export/writeMarkdown.js:12-257
  (markdown escaping, consecutive same-style word grouping with
  **bold**/*italic* wrappers, <sup> for superscripts, ``---`` page
  breaks, paragraph-aware reflow).  Table rendering is omitted (layout
  tables are out of scope this round).

Both run per document inside the final ``map_batches`` stage — pure
functions over the in-task page tree.
"""

from __future__ import annotations

import re

from ..functions.stats import js_round, round6
from .fontregistry import js_num as _jsn
from ..functions.textnorm import escape_xml
from ..model import get_word_style_segments

_MD_ESCAPE_RE = re.compile(r"([\\`*_\[\]])")


def _js_json(v) -> str:
    """JSON.stringify parity: compact separators, ECMA number
    formatting (12 not 12.0), insertion-ordered keys."""
    import json
    from .fontregistry import js_num
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"),
                                                     float("-inf"))):
            return "null"  # JSON.stringify(NaN/Infinity) === 'null'
        return js_num(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_js_json(x) for x in v) + "]"
    if isinstance(v, dict):
        import json as _j
        return "{" + ",".join(
            _j.dumps(str(k), ensure_ascii=False) + ":" + _js_json(x)
            for k, x in v.items()) + "}"
    raise TypeError(f"not JSON-serializable: {type(v)}")


def _layout_meta_json(pages) -> tuple[str, str]:
    """(layout, layout-data-table) meta payloads in the reference's
    serialized shapes (layoutObjects.js LayoutPage/LayoutDataTablePage;
    scribeDoc.js:956-968 serializeLayoutDataTables) so a scribeocr
    reimport restores our detected tables (importOCR.js:212-219,
    import.js:407-418)."""
    layout_pages = []
    table_pages = []
    for page in pages:
        restored = getattr(page, "layout_meta", None) or {}
        if restored.get("layout") is not None:
            # scribeocr reimport: re-serialize the restored page dict
            # VERBATIM (ids, default flags) like the reference, which
            # exports the same deserialized objects.
            layout_pages.append(restored["layout"])
        else:
            regions = getattr(page, "layout_regions", None) or {}
            layout_pages.append({"n": page.n, "default": not regions,
                                 "boxes": regions})
        if restored.get("tables") is not None:
            table_pages.append(restored["tables"])
            continue
        tables = []
        for ti, tb in enumerate(getattr(page, "table_boxes", None) or []):
            seps = sorted(tb.get("col_separators") or [])
            edges = [tb["left"]] + [s for s in seps
                                    if tb["left"] < s < tb["right"]] \
                + [tb["right"]]
            boxes = []
            for ci in range(len(edges) - 1):
                boxes.append({
                    "id": f"col_{page.n + 1}_{ti + 1}_{ci + 1}",
                    "coords": {"left": edges[ci], "top": tb["top"],
                               "right": edges[ci + 1],
                               "bottom": tb["bottom"]},
                    "inclusionRule": "majority",
                    "inclusionLevel": "word",
                    "type": "dataColumn",
                })
            tables.append({"id": f"table_{page.n + 1}_{ti + 1}",
                           "boxes": boxes, "rowBounds": None,
                           "detectionMethod": tb.get("method") or "text",
                           "title": None})
        # LayoutDataTablePage.default stays TRUE even with detected
        # tables — nothing in the reference ever clears it
        # (layoutObjects.js:59,102; only a restored meta can carry
        # false).  Our table/column ids are deterministic where the
        # reference's are getRandomAlphanum — an adjudicated
        # divergence (theirs are unreproducible run to run).
        table_pages.append({"n": page.n, "default": True,
                            "tables": tables})
    return _js_json(layout_pages), _js_json(table_pages)


def write_hocr(pages, char_metrics: dict | None = None,
               default_font: str = "SerifDefault") -> str:
    """Page trees → one hOCR document string (writeHocr.js:42-151),
    including the scribeocr-dialect layout/layout-data-table meta and
    the 'ocr-system scribeocr' marker that gates the reference's
    layout-restoring reimport path (writeHocr.js:32-57,
    importOCR.js:196)."""
    layout_json, tables_json = _layout_meta_json(pages)
    out = []
    out.append('<?xml version="1.0" encoding="UTF-8"?>\n'
               '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 '
               'Transitional//EN"\n'
               '    "http://www.w3.org/TR/xhtml1/DTD/'
               'xhtml1-transitional.dtd">\n'
               '<html xmlns="http://www.w3.org/1999/xhtml" '
               'xml:lang="en" lang="en">')
    out.append("<head>")
    out.append("\n\t<title></title>")
    # Font-state meta block (writeHocr.js:32-40,52-55): our supported
    # flows never run font optimization/recognition, so charMetrics is
    # empty and the fontContainer.js:468-478 state defaults hold
    # (setDefaultAuto only runs with recognition char metrics).
    cm_json = _js_json(char_metrics) if char_metrics else "{}"
    out.append(f"\n\t<meta name='font-metrics' content='{cm_json}'>"
               f"</meta>")
    out.append(f"\n\t<meta name='default-font' content='{default_font}'>"
               f"</meta>")
    out.append("\n\t<meta name='sans-font' content='NimbusSans'></meta>")
    out.append("\n\t<meta name='serif-font' content='NimbusRoman'>"
               "</meta>")
    out.append("\n\t<meta name='enable-opt' content='false'></meta>")
    out.append(f"\n\t<meta name='layout' content='{layout_json}'>"
               f"</meta>")
    out.append(f"\n\t<meta name='layout-data-table' content='"
               f"{tables_json}'></meta>")
    out.append('\n\t<meta http-equiv="Content-Type" '
               'content="text/html;charset=utf-8"/>')
    out.append("\n\t<meta name='ocr-system' content='scribeocr' />")
    out.append("\n\t<meta name='ocr-capabilities' content='ocr_page "
               "ocr_carea ocr_par ocr_line ocrx_word ocrp_wconf ocrp_lang "
               "ocrp_dir ocrp_font ocrp_fsize'/>")
    out.append("\n</head>")
    out.append("\n<body>")

    for page in pages:
        out.append(f"\n\t<div class='ocr_page' title='bbox 0 0 "
                   f"{_jsn(page.width)} {_jsn(page.height)}'>")
        for line in page.lines:
            out.append(
                f"\n\t\t<span class='ocr_line' title=\"bbox "
                f"{_jsn(line.bbox.left)} {_jsn(line.bbox.top)} "
                f"{_jsn(line.bbox.right)} {_jsn(line.bbox.bottom)}")
            out.append(f"; baseline {_jsn(round6(line.baseline[0]))} "
                       f"{_jsn(js_round(line.baseline[1]))}")
            if line.x_height:
                out.append(f"; x_x_height {_jsn(line.x_height)}")
            if line.asc_height:
                out.append(f"; x_asc_height {_jsn(line.asc_height)}")
            out.append('">')
            for word in line.words:
                out.append(f"\n\t\t\t<span class='ocrx_word' "
                           f"id='{word.id}' title='")
                out.append(f"bbox {js_round(word.bbox.left)} "
                           f"{js_round(word.bbox.top)} "
                           f"{js_round(word.bbox.right)} "
                           f"{js_round(word.bbox.bottom)}")
                out.append(f";x_wconf {_jsn(word.conf)}")
                if word.style.font and word.style.font != "Default":
                    out.append(f";x_font {word.style.font}")
                if word.style.size:
                    out.append(f";x_fsize {_jsn(word.style.size)}")
                out.append("'")
                if word.lang:
                    out.append(f" lang='{word.lang}'")
                style = word.style
                if style.bold or style.italic or style.small_caps or \
                        (style.font and style.font != "Default"):
                    parts = [" style='"]
                    if style.italic:
                        parts.append("font-style:italic;")
                    if style.bold:
                        parts.append("font-weight:bold;")
                    if style.small_caps:
                        parts.append("font-variant:small-caps;")
                    if style.font and style.font != "Default":
                        parts.append(f"font-family:{style.font}")
                    parts.append("'>")
                    out.append("".join(parts))
                else:
                    out.append(">")
                if style.sup:
                    out.append(f"<sup>{escape_xml(word.text)}</sup>")
                elif style.dropcap:
                    out.append(f"<span class='ocr_dropcap'>"
                               f"{escape_xml(word.text)}</span>")
                else:
                    out.append(escape_xml(word.text))
                out.append("</span>")
            out.append("\n\t\t</span>")
        out.append("\n\t</div>")

    out.append("\n</body>\n</html>")
    return "".join(out)


def _escape_markdown(text: str) -> str:
    return _MD_ESCAPE_RE.sub(r"\\\1", text)


def _style_wrapper(text: str, style_key: str) -> str:
    if style_key == "bi":
        return f"***{text}***"
    if style_key == "b":
        return f"**{text}**"
    if style_key == "i":
        return f"*{text}*"
    return text


def _render_markdown_table(rows) -> str:
    """Cell-text rows → pipe table with a separator after the header
    (writeMarkdown.js renderMarkdownTable:50-100, style grouping omitted
    since extract_table_content returns plain cell text)."""
    if not rows:
        return ""
    n_cols = max(len(r) for r in rows)
    out = []
    for r, cells in enumerate(rows):
        cells = [(_MD_ESCAPE_RE.sub(r"\\\1", c).replace("|", "\\|"))
                 for c in list(cells) + [""] * (n_cols - len(cells))]
        out.append("| " + " | ".join(cells) + " |\n")
        if r == 0:
            out.append("| " + " | ".join(["---"] * n_cols) + " |\n")
    return "".join(out)


def write_markdown(pages, reflow_text: bool = False,
                   apply_formatting: bool = True,
                   detect_tables: bool = False) -> str:
    """Page trees → markdown (writeMarkdown.js:115-256).  With
    ``detect_tables``, numeric table regions render as pipe tables and
    their source lines are skipped (writeMarkdown.js:165-188)."""
    md = []
    new_line = False
    is_first_content = True

    for g, page in enumerate(pages):
        if not page.lines:
            continue
        # reflowPars fallback for pages with no paragraph assignment
        # (writeMarkdown.js:134) — OCR imports reach the exporters with
        # pars unset now that analyzeLayout is PDF-only
        if reflow_text and not page.pars:
            from .reflow import assign_paragraphs
            assign_paragraphs(page, page.angle or 0)
        if not is_first_content and g > 0:
            md.append("\n\n---\n\n")

        table_bboxes = []
        tables_rendered = set()
        from .combine import _box_overlap
        from .tables import extract_table_content
        # (bbox, detector-provided col separators or None).  The
        # reference's writeMarkdown consumes layoutPage.tables
        # UNCONDITIONALLY when the layout has them
        # (writeMarkdown.js:144-188) — page.table_boxes (ruled-grid +
        # borderless regions stamped by the PDF parse / analyze_layout,
        # M27) is our analog, so it renders without a flag.
        detected = []
        if detect_tables:
            # OCR whitespace-column detection is OUR extra surface for
            # imports that never ran the PDF-side detectors; opt-in.
            from .tables import detect_tables_in_page
            detected = [(d, None) for d in detect_tables_in_page(page)]
        from ..model import BBox as _BBox
        for tb in getattr(page, "table_boxes", None) or []:
            rb = _BBox(tb["left"], tb["top"], tb["right"],
                       tb["bottom"])
            if not any(_box_overlap(rb, d) > 0.5 for d, _ in detected):
                detected.append((rb, tb.get("col_separators")))
        table_bboxes = list(enumerate(detected))

        par_current = page.lines[0].par
        current_style_key = None
        styled_words: list[str] = []

        def flush():
            nonlocal styled_words
            if not styled_words:
                return
            text = " ".join(styled_words)
            md.append(_style_wrapper(text, current_style_key)
                      if apply_formatting else text)
            styled_words = []

        for h, line in enumerate(page.lines):
            if table_bboxes:
                inside = None
                for ti, (tb, seps) in table_bboxes:
                    if _box_overlap(line.bbox, tb) > 0.5:
                        inside = (ti, tb, seps)
                        break
                if inside is not None:
                    ti, tb, seps = inside
                    if ti not in tables_rendered:
                        tables_rendered.add(ti)
                        rows = extract_table_content(
                            page, tb, col_separators=seps)
                        if rows:
                            if not is_first_content:
                                md.append("\n\n")
                            md.append(_render_markdown_table(rows))
                            is_first_content = False
                    continue  # in-table lines are consumed by the table

            if reflow_text:
                if (h == 0 and not is_first_content) or \
                        line.par is not par_current:
                    new_line = True
                par_current = line.par
            else:
                new_line = True

            for word in line.words:
                # Intra-word style runs render as separate pieces
                # (writeMarkdown.js:217-246, getWordStyleSegments).
                segments = get_word_style_segments(word) \
                    if apply_formatting else None
                if segments:
                    pieces = [(word.text[s:e], st)
                              for s, e, st in segments]
                else:
                    pieces = [(word.text, word.style)]

                for p, (ptext, style) in enumerate(pieces):
                    style_key = ((("b" if style.bold else "") +
                                  ("i" if style.italic else ""))
                                 if apply_formatting else "")
                    word_text = _escape_markdown(ptext)
                    if apply_formatting and style.sup:
                        word_text = f"<sup>{word_text}</sup>"

                    if style_key != current_style_key and styled_words:
                        flush()

                    if p == 0:
                        if new_line and not is_first_content:
                            flush()
                            md.append("\n")
                        elif not is_first_content and not styled_words:
                            md.append(" ")
                        new_line = False
                        is_first_content = False

                    current_style_key = style_key
                    styled_words.append(word_text)

            flush()

    return "".join(md)


_TESS_TO_ISO = {
    "eng": "en-US", "fra": "fr-FR", "deu": "de-DE", "spa": "es-ES",
    "ita": "it-IT", "por": "pt-PT", "nld": "nl-NL", "rus": "ru-RU",
    "pol": "pl-PL", "ces": "cs-CZ", "slk": "sk-SK", "ukr": "uk-UA",
    "hun": "hu-HU", "ron": "ro-RO", "hrv": "hr-HR", "srp": "sr-RS",
    "bul": "bg-BG", "slv": "sl-SI", "cat": "ca-ES", "dan": "da-DK",
    "fin": "fi-FI", "nor": "no-NO", "swe": "sv-SE", "tur": "tr-TR",
    "ell": "el-GR", "ara": "ar-SA", "heb": "he-IL", "hin": "hi-IN",
    "jpn": "ja-JP", "kor": "ko-KR", "chi_sim": "zh-CN",
    "chi_tra": "zh-TW", "tha": "th-TH", "vie": "vi-VN",
}  # writeAlto.js:7-45


def _utc_date() -> str:
    """Today as YYYY-MM-DD in UTC (writeAlto.js:110
    ``new Date().toISOString().split('T')[0]``)."""
    import datetime
    return datetime.datetime.now(datetime.timezone.utc) \
        .strftime("%Y-%m-%d")


def write_alto(pages) -> str:
    """Page trees → ALTO XML v2.0 (writeAlto.js:61-322): shared <Styles>
    section keyed by font+size; TextBlock per paragraph with dominant
    style/language refs; TextLine/String geometry; explicit <SP> spacing
    elements; word STYLE attrs (bold/italic/underline/superscript/
    smallCaps); WC confidence.  processingDateTime stamps the current
    UTC date exactly as the reference does (writeAlto.js:110
    ``new Date().toISOString().split('T')[0]``) and the
    softwareCreator/softwareName identity strings match writeAlto.js
    :113-114 so downstream consumers keyed on them keep working."""
    styles_map: dict[str, dict] = {}

    def style_id(font, size):
        key = f"{font or 'Default'}_{size or 10}"
        if key not in styles_map:
            styles_map[key] = {"id": f"font{len(styles_map)}",
                               "font": font or "Default",
                               "size": size or 10}
        return styles_map[key]["id"]

    for page in pages:
        for line in page.lines:
            for w in line.words:
                if w.style.font or w.style.size:
                    style_id(w.style.font, w.style.size)

    out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
           '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#" '
           'xmlns:xlink="http://www.w3.org/1999/xlink" '
           'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
           'xsi:schemaLocation="http://www.loc.gov/standards/alto/ns-v2# '
           'http://www.loc.gov/standards/alto/alto-v2.0.xsd">\n'
           '<Description>\n<MeasurementUnit>pixel</MeasurementUnit>\n'
           '<OCRProcessing ID="IdOcr"><ocrProcessingStep>'
           f'<processingDateTime>{_utc_date()}</processingDateTime>'
           '<processingSoftware>'
           '<softwareCreator>scribeocr</softwareCreator>'
           '<softwareName>scribe.js</softwareName>'
           '</processingSoftware>'
           '</ocrProcessingStep></OCRProcessing>\n</Description>\n']
    if styles_map:
        out.append("<Styles>")
        for st in styles_map.values():
            out.append(f'<TextStyle ID="{st["id"]}" '
                       f'FONTFAMILY="{escape_xml(st["font"])}" '
                       f'FONTSIZE="{_jsn(st["size"])}"/>')
        out.append("\n</Styles>\n")
    out.append("<Layout>\n")

    for pi, page in enumerate(pages):
        out.append(f'<Page ID="Page{pi + 1}" PHYSICAL_IMG_NR="{pi + 1}" '
                   f'HEIGHT="{_jsn(page.height)}" WIDTH="{_jsn(page.width)}">\n')
        if not page.lines:
            out.append("</Page>\n")
            continue
        out.append(f'<PrintSpace HEIGHT="{_jsn(page.height)}" '
                   f'WIDTH="{_jsn(page.width)}" VPOS="0" HPOS="0">\n')

        par_current = None
        block_index = 0
        block_style_ref = None
        block_lang = None
        for li, line in enumerate(page.lines):
            if not line.words:
                continue
            if block_index == 0 or line.par is not par_current:
                if block_index > 0:
                    out.append("</TextBlock>\n")
                par_current = line.par
                bl = js_round(line.bbox.left)
                bt = js_round(line.bbox.top)
                br = js_round(line.bbox.right)
                bb = js_round(line.bbox.bottom)
                style_counts: dict[str, int] = {}
                lang_counts: dict[str, int] = {}
                for j in range(li, len(page.lines)):
                    nxt = page.lines[j]
                    if not nxt.words:
                        continue
                    if j > li and nxt.par is not par_current:
                        break
                    if j > li:
                        bl = min(bl, js_round(nxt.bbox.left))
                        bt = min(bt, js_round(nxt.bbox.top))
                        br = max(br, js_round(nxt.bbox.right))
                        bb = max(bb, js_round(nxt.bbox.bottom))
                    for w in nxt.words:
                        if w.style.font or w.style.size:
                            sid = style_id(w.style.font or "",
                                           w.style.size or 0)
                            style_counts[sid] = style_counts.get(sid, 0) + 1
                        if w.lang:
                            lang_counts[w.lang] = \
                                lang_counts.get(w.lang, 0) + 1
                block_style_ref = max(style_counts, key=style_counts.get) \
                    if style_counts else None
                block_lang = max(lang_counts, key=lang_counts.get) \
                    if lang_counts else None
                out.append(f'<TextBlock ID="Page{pi + 1}_Block'
                           f'{block_index + 1}" HEIGHT="{bb - bt}" '
                           f'WIDTH="{br - bl}" VPOS="{bt}" HPOS="{bl}"')
                if block_lang:
                    out.append(f' language='
                               f'"{_TESS_TO_ISO.get(block_lang, block_lang)}"')
                if block_style_ref:
                    out.append(f' STYLEREFS="{block_style_ref}"')
                out.append(">\n")
                block_index += 1

            lt, ll = js_round(line.bbox.top), js_round(line.bbox.left)
            lr, lb = js_round(line.bbox.right), js_round(line.bbox.bottom)
            out.append(f'<TextLine HEIGHT="{lb - lt}" WIDTH="{lr - ll}" '
                       f'VPOS="{lt}" HPOS="{ll}">')
            for wi, w in enumerate(line.words):
                wl, wt = js_round(w.bbox.left), js_round(w.bbox.top)
                wr, wb = js_round(w.bbox.right), js_round(w.bbox.bottom)
                attrs = []
                if w.style.bold:
                    attrs.append("bold")
                if w.style.italic:
                    attrs.append("italic")
                if w.style.underline:
                    attrs.append("underline")
                if w.style.sup:
                    attrs.append("superscript")
                if w.style.small_caps:
                    attrs.append("smallCaps")
                style_attr = f' STYLE="{" ".join(attrs)}"' if attrs else ""
                refs_attr = ""
                if w.style.font or w.style.size:
                    sid = style_id(w.style.font or "", w.style.size or 0)
                    if sid != block_style_ref:
                        refs_attr = f' STYLEREFS="{sid}"'
                lang_attr = ""
                if w.lang and w.lang != block_lang:
                    lang_attr = (f' language='
                                 f'"{_TESS_TO_ISO.get(w.lang, w.lang)}"')
                wc_attr = f' WC="{w.conf / 100:.2f}"' \
                    if w.conf is not None else ""
                out.append(f"<String{style_attr}{lang_attr}{wc_attr}"
                           f"{refs_attr} CONTENT=\"{escape_xml(w.text)}\" "
                           f'HEIGHT="{wb - wt}" WIDTH="{wr - wl}" '
                           f'VPOS="{wt}" HPOS="{wl}"/>')
                if wi < len(line.words) - 1:
                    nxt_w = line.words[wi + 1]
                    sp = js_round(nxt_w.bbox.left) - wr - 2
                    if sp > 0:
                        out.append(f'<SP WIDTH="{sp}" VPOS="{wt}" '
                                   f'HPOS="{wr + 1}"/>')
            out.append("</TextLine>\n")
        if block_index > 0:
            out.append("</TextBlock>\n")
        out.append("</PrintSpace>\n</Page>\n")
    out.append("</Layout>\n</alto>\n")
    return "".join(out)


def write_html(pages, reflow_text: bool = True) -> str:
    """Page trees → semantic HTML.

    The reference's writeHtml (/root/reference/js/export/writeHtml.js:74+)
    produces an absolutely-positioned visual facsimile that depends on
    canvas-equivalent font metrics; this engine has no font files, so we
    emit the SEMANTIC variant instead: paragraph roles map to elements
    (title→h1, blockquote→blockquote, furniture→aside, body→p) with
    b/i/sup inline styling — the structure writeMarkdown.js encodes with
    markdown syntax, in HTML."""
    role_tag = {"title": "h1", "blockquote": "blockquote", "body": "p",
                "footnote": "aside", "endnote": "aside"}
    out = ["<!DOCTYPE html>\n<html>\n<head>"
           '<meta charset="utf-8"/></head>\n<body>\n']
    for g, page in enumerate(pages):
        if not page.lines:
            continue
        out.append(f'<section class="page" data-page="{g}">\n')
        # OCR imports arrive with no pars (analyzeLayout is PDF-only);
        # the semantic variant needs paragraphs, so assign reflow pars
        # at export like writeDocx.js:113 does under reflowText.
        if reflow_text and not page.pars:
            from .reflow import assign_paragraphs
            assign_paragraphs(page, page.angle or 0)
        pars = page.pars if page.pars else []
        emitted = set()

        # Carried annotation overlays (pdf/annots.py markup_spans):
        # highlight→<mark>, link→<a href>; a word is wrapped when its
        # bbox center falls inside the mark's device-space rect.
        marks = getattr(page, "marks", None) or []

        def mark_of(word):
            cx = (word.bbox.left + word.bbox.right) / 2
            cy = (word.bbox.top + word.bbox.bottom) / 2
            for m in marks:
                b = m["bbox"]
                if b["left"] <= cx <= b["right"] and \
                        b["top"] <= cy <= b["bottom"]:
                    return m
            return None

        def emit_line_words(line):
            parts = []
            for w in line.words:
                t = escape_xml(w.text)
                if w.style.sup:
                    t = f"<sup>{t}</sup>"
                if w.style.bold:
                    t = f"<b>{t}</b>"
                if w.style.italic:
                    t = f"<i>{t}</i>"
                m = mark_of(w) if marks else None
                if m is not None:
                    if m["type"] == "link" and m.get("uri"):
                        t = (f'<a href="{escape_xml(m["uri"])}">{t}</a>')
                    elif m["type"] == "highlight":
                        t = f"<mark>{t}</mark>"
                parts.append(t)
            return " ".join(parts)

        for par in pars:
            tag = role_tag.get(par.type)
            if tag is None:  # furniture roles
                tag = "aside"
            sep = " " if reflow_text else "<br/>\n"
            body = sep.join(emit_line_words(ln) for ln in par.lines
                            if ln.words)
            cls = f' class="{par.type}"' if par.type != "body" else ""
            out.append(f"<{tag}{cls}>{body}</{tag}>\n")
            emitted.update(id(ln) for ln in par.lines)
        orphans = [ln for ln in page.lines
                   if id(ln) not in emitted and ln.words]
        if orphans:
            sep = " " if reflow_text else "<br/>\n"
            out.append("<p>" + sep.join(
                emit_line_words(ln) for ln in orphans) + "</p>\n")
        out.append("</section>\n")
    out.append("</body>\n</html>\n")
    return "".join(out)


# ---------------------------------------------------------------------------
# Debug CSV (exportDebugCsv.js:13-72): every word of every page in one
# tabular listing — a review surface for the parsed model, distinct from
# the data-table exports.


_CSV_UNDEFINED = object()  # JS `undefined`: bare empty field in the CSV


def _csv_field(v) -> str:
    """escapeCsvField (exportDebugCsv.js:13-22): objects (including
    null) JSON-stringified then quoted with doubled quotes, strings
    quoted, numbers/booleans bare, ``undefined`` empty."""
    if v is _CSV_UNDEFINED:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        from .fontregistry import js_num
        return js_num(v)
    if isinstance(v, str):
        return '"' + v.replace('"', '""') + '"'
    return '"' + _js_json(v).replace('"', '""') + '"'


def _style_record(style) -> dict:
    """The OcrWord style shape in declaration order
    (ocrObjects.js:167-178); a parse-attached link rides after, like a
    dynamic JS property would."""
    out = {"font": style.font, "size": style.size,
           "bold": bool(style.bold), "italic": bool(style.italic),
           "underline": bool(style.underline),
           "smallCaps": bool(style.small_caps), "sup": bool(style.sup),
           "dropcap": bool(style.dropcap),
           # OcrWord initializes color '#000000' (ocrObjects.js:176);
           # our model keeps None for "default black".
           "color": style.color if style.color is not None
           else "#000000",
           "opacity": style.opacity}
    if getattr(style, "link", None) is not None:
        out["link"] = style.link
    return out


def _word_record(w) -> dict:
    """One CSV row in the OcrWord field order minus ``line``
    (cloneWord + delete, exportDebugCsv.js:51-56)."""
    from ..model import get_word_style_segments
    box = {"left": w.bbox.left, "top": w.bbox.top,
           "right": w.bbox.right, "bottom": w.bbox.bottom}
    chars = ([{"text": c.text,
               "bbox": {"left": c.bbox.left, "top": c.bbox.top,
                        "right": c.bbox.right, "bottom": c.bbox.bottom}}
              for c in w.chars] if w.chars else None)
    runs = _CSV_UNDEFINED
    if w.style_runs:
        runs = [{"i": r["i"],
                 "style": {_SNAKE_TO_REF.get(k, k): v
                           for k, v in r["style"].items()}}
                for r in w.style_runs]
    return {"text": w.text, "textAlt": w.text_alt,
            "style": _style_record(w.style), "styleRuns": runs,
            "lang": w.lang, "conf": w.conf, "bbox": box,
            "compTruth": False, "matchTruth": False,
            "lineNum": bool(w.line_num), "id": w.id, "chars": chars,
            "visualCoords": bool(w.visual_coords),
            "debug": {"raw": w.raw_src},
            "footnoteParId": None if w.footnote_par is None
            else "linked"}


_SNAKE_TO_REF = {"small_caps": "smallCaps"}


def write_debug_csv(pages) -> str:
    """Pages → one CSV string, byte-identical to the reference's
    writeDebugCsv (exportDebugCsv.js:47-71): per-page convertToCsv
    blocks concatenated, with each non-first page's header row replaced
    by the retained leading newline.  A wordless page contributes
    nothing (convertToCsv returns ''), so a wordless FIRST page means
    the header never appears — the reference's quirk, kept.
    footnoteParId is a random id in the reference, so a LINKED word
    serializes as the stable sentinel "linked" instead."""
    out = []
    for i, page in enumerate(pages):
        records = [_word_record(w) for ln in page.lines
                   for w in ln.words]
        if not records:
            continue
        block = [",".join(records[0].keys())] if i == 0 else [""]
        block += [",".join(_csv_field(v) for v in r.values())
                  for r in records]
        out.append("\n".join(block))
    return "".join(out)
