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
                    "font": None, "size": None}))
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
    for fid in footnote_order:
        fruns = []
        for text, st in footnotes[fid]:
            if st.get("size") is None and fn_size is not None:
                st = dict(st, size=fn_size)
            fruns.append((text, st))
        paragraphs.append(("footnote", fruns))

    from .textlayout import typeset_styled_paragraphs
    return typeset_styled_paragraphs(paragraphs, text_source="docx",
                                     line_split_mode=line_split_mode)


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


def _run_xml(word) -> str:
    props = []
    if word.style.bold:
        props.append("<w:b/>")
    if word.style.italic:
        props.append("<w:i/>")
    if word.style.sup:
        props.append('<w:vertAlign w:val="superscript"/>')
    rpr = f"<w:rPr>{''.join(props)}</w:rPr>" if props else ""
    return (f"<w:r>{rpr}<w:t xml:space=\"preserve\">"
            f"{escape_xml(word.text)}</w:t></w:r>")


def write_docx(pages, reflow_text: bool = True) -> bytes:
    """Page trees → DOCX bytes (writeDocx.js:122-200 analog)."""
    body = []
    for page in pages:
        # OCR imports skip the PDF-only analyzeLayout pass and arrive
        # with no pars; the reference assigns reflow paragraphs at
        # export when reflowText is on (writeDocx.js:113).
        if reflow_text and not page.pars:
            from .reflow import assign_paragraphs
            assign_paragraphs(page, page.angle or 0)
        pars = page.pars or []
        emitted = set()
        for par in pars:
            if par.type == "title":
                ppr = '<w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
            elif par.type == "blockquote":
                ppr = '<w:pPr><w:pStyle w:val="Quote"/></w:pPr>'
            else:
                ppr = ""
            if reflow_text:
                runs = []
                first = True
                for line in par.lines:
                    for w in line.words:
                        if not first:
                            runs.append('<w:r><w:t xml:space="preserve">'
                                        " </w:t></w:r>")
                        runs.append(_run_xml(w))
                        first = False
                if runs:
                    body.append(f"<w:p>{ppr}{''.join(runs)}</w:p>")
            else:
                for line in par.lines:
                    runs = []
                    for wi, w in enumerate(line.words):
                        if wi:
                            runs.append('<w:r><w:t xml:space="preserve">'
                                        " </w:t></w:r>")
                        runs.append(_run_xml(w))
                    if runs:
                        body.append(f"<w:p>{ppr}{''.join(runs)}</w:p>")
            emitted.update(id(ln) for ln in par.lines)
        orphans = [ln for ln in page.lines
                   if id(ln) not in emitted and ln.words]
        for line in orphans:
            runs = []
            for wi, w in enumerate(line.words):
                if wi:
                    runs.append('<w:r><w:t xml:space="preserve"> '
                                "</w:t></w:r>")
                runs.append(_run_xml(w))
            body.append(f"<w:p>{''.join(runs)}</w:p>")

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml",
                   _DOC_START + "".join(body) + _DOC_END)
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
