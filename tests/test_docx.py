"""DOCX import/export + XLSX export round trips."""

import io
import zipfile

from scribe_js_ray.model import page_text
from scribe_js_ray.stages.docx import parse_docx, write_docx, write_xlsx
from scribe_js_ray.stages.emit import write_text_spans
from scribe_js_ray.stages.layout import analyze_layout

from tests.test_formats import make_alto
from scribe_js_ray.stages.alto import parse_alto_page


def _make_docx(paragraphs):
    """paragraphs: list of (style, [(text, bold)]) tuples."""
    body = []
    for style, runs in paragraphs:
        ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        rs = "".join(
            f"<w:r>{'<w:rPr><w:b/></w:rPr>' if bold else ''}"
            f'<w:t xml:space="preserve">{t}</w:t></w:r>'
            for t, bold in runs)
        body.append(f"<w:p>{ppr}{rs}</w:p>")
    doc = ('<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
           'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
           + "".join(body) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def test_parse_docx_text_and_headings():
    data = _make_docx([
        ("Heading1", [("The Title", False)]),
        ("", [("Body text ", False), ("here", True)]),
    ])
    pages = parse_docx(data)
    assert pages
    text, _ = write_text_spans(pages, reflow_text=True)
    assert text == "The Title\nBody text here"
    assert pages[0].pars[0].type == "title"
    assert pages[0].pars[1].type == "body"


def test_docx_roundtrip():
    xml = make_alto([[("Round", {}), ("trip", {"STYLE": "bold"})],
                     [("second", {}), ("line", {})]])
    page, _ = parse_alto_page(xml, 0)
    analyze_layout([page])
    blob = write_docx([page])
    # valid zip with OOXML parts
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels",
            "word/document.xml"} <= names
    # our own importer reads our own export back
    pages2 = parse_docx(blob)
    text, _ = write_text_spans(pages2, reflow_text=True)
    assert "Round trip" in text
    assert "second line" in text


def test_write_xlsx_valid_package():
    blob = write_xlsx([["h1", "h2"], ["a", "1"], ["b", "2"]])
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert '<c r="A1" t="inlineStr"><is><t>h1</t></is></c>' in sheet
    assert '<c r="B3"' in sheet


def test_docx_through_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    payload = _make_docx([("Heading1", [("Doc Title", False)]),
                          ("", [("docx body content", False)])])
    tbl = pa.table({"url": ["d0"], "html": [payload],
                    "text": [""], "lang": ["eng"]})
    out = build_extract_pipeline(rd.from_arrow(tbl)).to_pandas()
    assert out["payload_kind"].iloc[0] == "docx"
    assert "Doc Title" in out["extracted_text"].iloc[0]
    assert "docx body content" in out["extracted_text"].iloc[0]


def test_docx_heading_after_pagebreak_spanning_paragraph():
    """A paragraph splitting across a page break must not shift styles of
    later paragraphs (review finding)."""
    long_body = " ".join(["filler"] * 3500)  # spans >1 page
    data = _make_docx([
        ("", [(long_body, False)]),
        ("Heading1", [("Real Heading", False)]),
    ])
    pages = parse_docx(data)
    flat = [p for pg in pages for p in pg.pars]
    titles = [p for p in flat if p.type == "title"]
    assert len(titles) == 1
    assert " ".join(w.text for ln in titles[0].lines
                    for w in ln.words) == "Real Heading"
