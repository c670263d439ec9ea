"""DOCX import/export (SURVEY §2 M15/S9 remainder).

* ``parse_docx`` — reference /root/reference/js/import/convertDocDocx.js:
  unzip (stdlib ``zipfile``), regex-scan ``word/document.xml`` for
  ``<w:p>`` paragraphs and ``<w:r>`` runs (:466-570), run style from
  ``<w:b/>``/``<w:i/>``/``vertAlign`` plus per-run ``w:sz``/``w:rFonts``
  (:355-390), size/font inheritance run → ``w:pStyle`` → docDefaults
  from ``word/styles.xml`` (:290-336, :551-560; FootnoteText size for
  footnote bodies :573-592), heading level from
  ``<w:pStyle w:val="HeadingN"/>`` (:495); the text is then typeset into
  synthetic Times pages by the same layout engine as plain text
  (convertPageText pathway — the reference does the same via its font
  machinery).
* ``write_docx`` — reference /root/reference/js/export/writeDocx.js:
  minimal-but-valid OOXML package ([Content_Types], rels, document.xml)
  with one ``<w:p>`` per paragraph (reflow) or per line, Heading1/Quote
  paragraph styles by par role, b/i/vertAlign run properties (:122-156).

Both are pure per-document functions usable inside map_batches.
"""

from __future__ import annotations

import io
import re
import zipfile

from ..functions.textnorm import escape_xml, unescape_xml
from ..model import Page

_W_P_RE = re.compile(r"<w:p(?:\s[^>]*)?>(.*?)</w:p>", re.S)
_W_R_RE = re.compile(r"<w:r(?:\s[^>]*)?>(.*?)</w:r>", re.S)
_W_T_RE = re.compile(r"<w:t[^>]*>([^<]*)</w:t>")
_PSTYLE_RE = re.compile(r"<w:pStyle\s+w:val=\"([^\"]+)\"")
_BOLD_RE = re.compile(r"<w:b(?:\s*/|\s[^>]*/)>")
_ITALIC_RE = re.compile(r"<w:i(?:\s*/|\s[^>]*/)>")
_VERTALIGN_RE = re.compile(r"<w:vertAlign\s+w:val=\"superscript\"")
_FOOTNOTE_RE = re.compile(
    r"<w:footnote\s+[^>]*w:id=\"([^\"]+)\"[^>]*>(.*?)</w:footnote>", re.S)
_FOOTNOTE_REF_RE = re.compile(r"<w:footnoteReference\s+[^>]*w:id=\"([^\"]+)\"")
_FOOTNOTE_MARK_RE = re.compile(r"<w:footnoteRef\s*/>")


_RFONTS_ASCII_RE = re.compile(r"<w:rFonts\s+[^>]*w:ascii=\"([^\"]+)\"")
_RFONTS_HANSI_RE = re.compile(r"<w:rFonts\s+[^>]*w:hAnsi=\"([^\"]+)\"")
_SZ_RE = re.compile(r"<w:sz\s+w:val=\"(\d+)\"")


def _run_styles(run_xml: str) -> dict:
    """Run-level style flags + per-run font/size (convertDocDocx.js
    parseRunElement :355-390) — bold/italic/smallCaps/underline/
    superscript, ``font`` from rFonts ascii→hAnsi, ``size`` in points
    (w:sz half-points ÷ 2), both None when absent."""
    def flag(tag):
        return bool(re.search(
            rf"<w:{tag}\s*/>|<w:{tag}\s+w:val=\"(?:true|1)\"", run_xml))

    underline = bool(re.search(r"<w:u\s+w:val=\"single\"", run_xml)) \
        or (bool(re.search(r"<w:u\s*/>", run_xml))
            and not re.search(r"<w:u\s+w:val=\"none\"", run_xml))
    font = None
    fm = _RFONTS_ASCII_RE.search(run_xml) or _RFONTS_HANSI_RE.search(run_xml)
    if fm:
        font = unescape_xml(fm.group(1))
    size = None
    sm = _SZ_RE.search(run_xml)
    if sm:
        size = int(sm.group(1)) / 2
    return {
        "bold": flag("b"),
        "italic": flag("i"),
        "small_caps": flag("smallCaps"),
        "underline": underline,
        "sup": bool(_VERTALIGN_RE.search(run_xml)),
        "font": font,
        "size": size,
    }


_STYLE_RE = re.compile(
    r"<w:style\s+[^>]*w:styleId=\"([^\"]+)\"[^>]*>(.*?)</w:style>", re.S)
_DOC_DEFAULTS_RE = re.compile(r"<w:docDefaults>.*?</w:docDefaults>", re.S)


def _parse_styles(styles_xml: str):
    """word/styles.xml → ({styleId: {size, font}}, default size) —
    docDefaults w:sz plus per-style sz/rFonts ascii
    (convertDocDocx.js parseStyles :290-336)."""
    styles: dict = {}
    default_size = None
    dm = _DOC_DEFAULTS_RE.search(styles_xml)
    if dm:
        sm = _SZ_RE.search(dm.group(0))
        if sm:
            default_size = int(sm.group(1)) / 2
    for m in _STYLE_RE.finditer(styles_xml):
        content = m.group(2)
        info = {"size": None, "font": None}
        sm = _SZ_RE.search(content)
        if sm:
            info["size"] = int(sm.group(1)) / 2
        fm = _RFONTS_ASCII_RE.search(content)
        if fm:
            info["font"] = unescape_xml(fm.group(1))
        styles[m.group(1)] = info
    return styles, default_size


def _run_text(run_xml: str) -> str:
    return "".join(unescape_xml(m.group(1))
                   for m in _W_T_RE.finditer(run_xml))


def _par_type(style_id: str) -> str:
    """Paragraph style → par type (convertDocDocx.js:495-506)."""
    s = (style_id or "").lower()
    if s == "title" or s.startswith("heading") or s.startswith("toc"):
        return "title"
    if s.startswith("quote") or s == "intensequote":
        return "blockquote"
    return "body"


def _parse_footnotes(footnotes_xml: str) -> dict:
    """word/footnotes.xml → {id: [(text, styles)]}, skipping the
    separator footnotes (ids -1/0) and <w:footnoteRef/> marker runs
    (convertDocDocx.js parseFootnotes :402-441)."""
    out: dict = {}
    for m in _FOOTNOTE_RE.finditer(footnotes_xml):
        fid, content = m.group(1), m.group(2)
        if fid in ("-1", "0"):
            continue
        runs = []
        for rm in _W_R_RE.finditer(content):
            run = rm.group(0)
            if _FOOTNOTE_MARK_RE.search(run):
                continue
            text = _run_text(run)
            if text:
                runs.append((text, _run_styles(run)))
        if runs:
            out[fid] = runs
    return out


def parse_docx(data: bytes, line_split_mode: str = "width") -> list[Page]:
    """DOCX bytes → typeset synthetic pages.

    Faithful decision surface (convertDocDocx.js): per-run style flags
    (:351-390), title/quote/toc paragraph typing (:495-506), inline
    footnote-reference markers emitted as superscript index words in
    first-reference order (:525-547), and footnote bodies appended as
    'footnote' paragraphs after the main flow (:572-595).  Word merging
    across run boundaries follows the typesetter's stylesMatch rule
    (:787-790: merge only when the sup flag agrees)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        doc_xml = z.read("word/document.xml").decode("utf-8", "replace")
        try:
            fn_xml = z.read("word/footnotes.xml").decode("utf-8",
                                                         "replace")
        except KeyError:
            fn_xml = ""
        try:
            styles_xml = z.read("word/styles.xml").decode("utf-8",
                                                          "replace")
        except KeyError:
            styles_xml = ""

    footnotes = _parse_footnotes(fn_xml) if fn_xml else {}
    footnote_order: list[str] = []
    styles_map, default_size = (_parse_styles(styles_xml)
                                if styles_xml else ({}, None))

    paragraphs = []  # (par_type, [(text, styles)])
    for pm in _W_P_RE.finditer(doc_xml):
        content = pm.group(1)
        style_m = _PSTYLE_RE.search(content)
        style_id = style_m.group(1) if style_m else ""
        par_type = _par_type(style_id)
        par_style = styles_map.get(style_id)
        runs = []
        for rm in _W_R_RE.finditer(content):
            run = rm.group(0)
            fr = _FOOTNOTE_REF_RE.search(run)
            if fr:
                fid = fr.group(1)
                if fid not in footnotes:
                    continue
                if fid not in footnote_order:
                    footnote_order.append(fid)
                idx = footnote_order.index(fid) + 1
                runs.append((str(idx), {
                    "bold": False, "italic": False, "small_caps": False,
                    "underline": False, "sup": True,
                    "font": None, "size": None, "footnote_id": fid}))
                continue
            text = _run_text(run)
            if text:
                st = _run_styles(run)
                # size/font inherit paragraph style → docDefaults
                # (convertDocDocx.js:551-560)
                if st["size"] is None:
                    if par_style and par_style["size"] is not None:
                        st["size"] = par_style["size"]
                    elif default_size is not None:
                        st["size"] = default_size
                if st["font"] is None and par_style \
                        and par_style["font"] is not None:
                    st["font"] = par_style["font"]
                runs.append((text, st))
        if runs:
            paragraphs.append((par_type, runs))

    # Footnote bodies inherit the FootnoteText style size → docDefaults
    # (convertDocDocx.js:573-592).
    fn_style = styles_map.get("FootnoteText")
    fn_size = (fn_style["size"] if fn_style
               and fn_style["size"] is not None else default_size)
    for fi, fid in enumerate(footnote_order):
        fruns = []
        for text, st in footnotes[fid]:
            if st.get("size") is None and fn_size is not None:
                st = dict(st, size=fn_size)
            fruns.append((text, st))
        paragraphs.append(("footnote", fruns, fid, fi + 1))

    from .textlayout import typeset_styled_paragraphs
    pages = typeset_styled_paragraphs(paragraphs, text_source="docx",
                                      line_split_mode=line_split_mode)
    # Resolve footnote-reference links to the typeset objects — the
    # bidirectional par.footnoteRefId <-> word.footnoteParId pairing of
    # convertDocDocx.js:924-929 (ids became object refs in our model).
    par_by_fid = {}
    for page in pages:
        for par in page.pars:
            if par.type == "footnote" and \
                    isinstance(par.footnote_ref, str):
                par_by_fid[par.footnote_ref] = par
                par.footnote_ref = None
    for page in pages:
        for line in page.lines:
            for w in line.words:
                if isinstance(w.footnote_par, str):
                    par = par_by_fid.get(w.footnote_par)
                    w.footnote_par = par
                    if par is not None and par.footnote_ref is None:
                        par.footnote_ref = w.id
    return pages


_DOC_START = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/'
    'wordprocessingml/2006/main"><w:body>')
_DOC_END = "</w:body></w:document>"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.'
    'main+xml"/></Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="word/document.xml"/></Relationships>')


_REF_PARTS = None


def _ref_parts() -> dict:
    """Static Word-package parts + document/footnotes envelopes,
    captured from the live reference's own .docx output (the same
    artifact-derivation approach as data/ref_font_metrics.json.gz) —
    writeDocx.js packages documentStart+body+documentEnd,
    footnotesStart+footnotesXml+footnotesEnd, and the fixed
    resources/docxFiles.js parts."""
    global _REF_PARTS
    if _REF_PARTS is None:
        import gzip
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "docx_ref_parts.json.gz")
        with gzip.open(path, "rt") as f:
            _REF_PARTS = json.load(f)
    return _REF_PARTS


def _style_xml(style) -> str:
    """writeDocx.js:60-69 styleXml — property order is part of the
    byte-stable surface."""
    s = ""
    if style.bold:
        s += "<w:b/>"
    if style.italic:
        s += "<w:i/>"
    if style.small_caps:
        s += "<w:smallCaps/>"
    if style.underline:
        s += '<w:u w:val="single"/>'
    if style.sup:
        s += '<w:vertAlign w:val="superscript"/>'
    if style.font:
        fn = escape_xml(style.font)
        s += f'<w:rFonts w:ascii="{fn}" w:hAnsi="{fn}"/>'
    return s


def _text_run(word, lead: str) -> str:
    """writeDocx.js:73-84 textRun: one <w:r> per style segment, the
    inter-word lead INSIDE the first segment's <w:t>."""
    from ..model import get_word_style_segments
    segments = get_word_style_segments(word) or \
        [(0, len(word.text), word.style)]
    runs = []
    for idx, (start, end, style) in enumerate(segments):
        sx = _style_xml(style)
        rpr = f"<w:rPr>{sx}</w:rPr>" if sx else ""
        lead_seg = lead if idx == 0 else ""
        runs.append(
            f'<w:r>{rpr}<w:t xml:space="preserve">{lead_seg}'
            f"{escape_xml(word.text[start:end])}</w:t></w:r>")
    return "".join(runs)


_FN_LEADER_RE = re.compile(r"^[\d*†‡]{1,3}[.)\]]?$")


def write_docx_content(pages, reflow_text: bool = True) -> tuple[str, str]:
    """(body, footnotesXml) — writeDocxContent (writeDocx.js:24-160):
    footnote paragraphs numbered in in-text reference order move to
    word/footnotes.xml with their leading marker stripped; body
    paragraphs open lazily per par (reflow) or per line, a linked
    reference marker becomes a real <w:footnoteReference>."""
    # Footnote ids in in-text reference order (:36-57).
    footnote_id: dict[int, str] = {}   # id(par) -> "1"...
    footnote_pars: list = []
    for page in pages:
        if reflow_text and not page.pars:
            from .reflow import assign_paragraphs
            assign_paragraphs(page, page.angle or 0)
        for line in page.lines:
            for w in line.words:
                fn_par = w.footnote_par
                if fn_par is None or id(fn_par) in footnote_id \
                        or fn_par.type not in ("footnote", "endnote"):
                    continue
                footnote_id[id(fn_par)] = str(len(footnote_pars) + 1)
                footnote_pars.append(fn_par)

    footnotes_xml = []
    for par in footnote_pars:
        runs = []
        first = True
        stripping = True
        for line in par.lines:
            for w in line.words:
                # Drop the note's own leading marker — Word renders the
                # number from <w:footnoteRef/> (:94-99).
                if stripping and w.style.sup and \
                        _FN_LEADER_RE.match((w.text or "").strip()):
                    continue
                stripping = False
                runs.append(_text_run(
                    w, " " if first else ("" if w.style.sup else " ")))
                first = False
        footnotes_xml.append(
            f'<w:footnote w:id="{footnote_id[id(par)]}"><w:p><w:pPr>'
            f'<w:pStyle w:val="FootnoteText"/></w:pPr><w:r><w:rPr>'
            f'<w:rStyle w:val="FootnoteReference"/></w:rPr>'
            f"<w:footnoteRef/></w:r>{''.join(runs)}</w:p></w:footnote>")

    body = []
    open_key = None
    first_in_par = True
    for page in pages:
        if not page.lines:
            continue
        for line in page.lines:
            par = line.par
            if par is not None and id(par) in footnote_id:
                continue
            key = id(par) if (reflow_text and par is not None) else id(line)
            for w in line.words:
                if key != open_key:
                    if open_key is not None:
                        body.append("</w:p>")
                    if par is not None and par.type == "title":
                        ppr = '<w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                    elif par is not None and par.type == "blockquote":
                        ppr = '<w:pPr><w:pStyle w:val="Quote"/></w:pPr>'
                    else:
                        ppr = ""
                    body.append(f"<w:p>{ppr}")
                    open_key = key
                    first_in_par = True
                fn_par = w.footnote_par
                if fn_par is not None and id(fn_par) in footnote_id:
                    body.append(
                        '<w:r><w:rPr><w:rStyle w:val="FootnoteReference"/>'
                        '<w:vertAlign w:val="superscript"/></w:rPr>'
                        f'<w:footnoteReference w:id='
                        f'"{footnote_id[id(fn_par)]}"/></w:r>')
                    first_in_par = False
                    continue
                body.append(_text_run(
                    w, "" if first_in_par
                    else ("" if w.style.sup else " ")))
                first_in_par = False
    if open_key is not None:
        body.append("</w:p>")
    return "".join(body), "".join(footnotes_xml)


def write_docx(pages, reflow_text: bool = True) -> bytes:
    """Page trees → the reference's full Word package (writeDocx.js
    :162-209): document.xml and footnotes.xml between the captured
    envelopes plus the fixed resource parts — every part's bytes equal
    the reference's (the zip CONTAINER differs: zip.js vs zipfile)."""
    parts = _ref_parts()
    body, footnotes_xml = write_docx_content(pages, reflow_text)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml",
                   parts["document_start"] + body + parts["document_end"])
        z.writestr("word/footnotes.xml",
                   parts["footnotes_start"] + footnotes_xml
                   + parts["footnotes_end"])
        for name, content in parts["static_parts"].items():
            if name != "word/footnotes.xml":
                z.writestr(name, content)
    return buf.getvalue()


_XLSX_REF_PARTS = None


def _xlsx_ref_parts() -> dict:
    global _XLSX_REF_PARTS
    if _XLSX_REF_PARTS is None:
        import gzip
        import json
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "xlsx_ref_parts.json.gz")
        with gzip.open(path, "rt") as f:
            _XLSX_REF_PARTS = json.load(f)
    return _XLSX_REF_PARTS


def _col_ref(index: int) -> str:
    """0-based column index → Excel column letters (writeTabular.js
    :10-18 colIndexToRef)."""
    ref = ""
    n = index
    while True:
        ref = chr(65 + (n % 26)) + ref
        n = n // 26 - 1
        if n < 0:
            return ref


def _xlsx_cells_single(row_words, extra_cols, start_row) -> str:
    """One table's rows → <row>/<c> XML (writeTabular.js:58-155
    createCellsSingle, xlsxMode): empty cells omitted, cell words
    re-sorted by bbox.left, style runs split per the reference's exact
    rule — ``fontStylePrev`` is never updated, so every STYLED word
    opens a new run while an unstyled word after the first rides the
    previous run with a plain leading space."""
    out = []
    for i, row in enumerate(row_words):
        rnum = str(start_row + i + 1)
        out.append(f'<row r="{rnum}">')
        for j, col_txt in enumerate(extra_cols):
            out.append(f'<c r="{_col_ref(j)}{rnum}" t="inlineStr"><is>'
                       f'<r><t xml:space="preserve">'
                       f"{escape_xml(col_txt)}</t></r></is></c>")
        for j, words in enumerate(row):
            if not words:
                continue
            words = sorted(words, key=lambda w: w.bbox.left)
            out.append(f'<c r="{_col_ref(j + len(extra_cols))}{rnum}" '
                       f't="inlineStr"><is>')
            for k, w in enumerate(words):
                font_style = ""
                if w.style.bold:
                    font_style += "<b/>"
                if w.style.italic:
                    font_style += "<i/>"
                if w.style.small_caps:
                    font_style += "<smallCaps/>"
                if font_style != "" or k == 0:
                    style_str = f"<rPr>{font_style}</rPr>" \
                        if font_style else ""
                    if k == 0:
                        out.append(f'<r>{style_str}'
                                   f'<t xml:space="preserve">')
                    else:
                        out.append(f' </t></r><r>{style_str}'
                                   f'<t xml:space="preserve">')
                else:
                    out.append(" ")
                out.append(escape_xml(w.text))
            out.append("</t></r></is></c>")
        out.append("</row>")
    return "".join(out)


def write_xlsx_tabular(page_tables, extra_cols_per_page) -> bytes:
    """Detected tables → the reference's full xlsx package (writeXlsx,
    writeTabular.js:188-224): sheet1.xml between the captured
    preamble/close envelopes plus the fixed resource parts, row numbers
    continuous across pages and tables.

    ``page_tables``: per page, a list of tables, each rows×cols of
    word lists (extract_table_words).  ``extra_cols_per_page``: lead
    column texts per page (filename / 1-based page number)."""
    parts = _xlsx_ref_parts()
    cells = []
    row_count = 0
    for tables, extra in zip(page_tables, extra_cols_per_page):
        for rows in tables:
            cells.append(_xlsx_cells_single(rows, extra, row_count))
            row_count += len(rows)
    sheet = (parts["sheet_preamble"] + "<sheetData>" + "".join(cells)
             + "</sheetData>" + parts["sheet_close"])
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        for name, content in parts["static_parts"].items():
            z.writestr(name, content)
    return buf.getvalue()


def write_xlsx(rows: list[list[str]], sheet_name: str = "Sheet1") -> bytes:
    """Cell-text rows → minimal XLSX (writeTabular analog, inline strings)."""
    def col_name(i):
        name = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            name = chr(65 + rem) + name
        return name

    cells = []
    for r, row in enumerate(rows, start=1):
        cs = "".join(
            f'<c r="{col_name(ci)}{r}" t="inlineStr"><is><t>'
            f"{escape_xml(str(v))}</t></is></c>"
            for ci, v in enumerate(row))
        cells.append(f'<row r="{r}">{cs}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(cells) + "</sheetData></worksheet>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>')
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/'
        'officeDocument" Target="xl/workbook.xml"/></Relationships>')
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>')
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><sheets>'
        f'<sheet name="{escape_xml(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
