"""ALTO / Abbyy / stext parser tests (golden-value style, SURVEY §5)."""

import pyarrow as pa

from scribe_js_ray.model import line_text, page_text
from scribe_js_ray.sources.classify import classify_payload
from scribe_js_ray.stages.abbyy import parse_abbyy_page, split_abbyy_pages
from scribe_js_ray.stages.alto import parse_alto_page, split_alto_pages
from scribe_js_ray.stages.stext import parse_stext_page, split_stext_pages


# ---------------------------------------------------------------------------
# fixture builders


def make_alto(words_per_line, page_w=2000, page_h=3000, styles=""):
    """words_per_line: list of lines, each a list of (text, attrs-dict)."""
    y = 200
    blocks = []
    lines_xml = []
    for words in words_per_line:
        x = 150
        strs = []
        for text, attrs in words:
            w = 90 * len(text)
            extra = "".join(
                f" {k}=\"{v}\"" for k, v in attrs.items())
            strs.append(
                f'<String CONTENT="{text}" HPOS="{x}" VPOS="{y}" '
                f'WIDTH="{w}" HEIGHT="100"{extra}/>')
            x += w + 40
        lines_xml.append(
            f'<TextLine HPOS="150" VPOS="{y}" WIDTH="{x - 190}" '
            f'HEIGHT="120">{"".join(strs)}</TextLine>')
        y += 150
    blocks.append("<TextBlock>" + "".join(lines_xml) + "</TextBlock>")
    return (
        '<?xml version="1.0"?><alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">'
        f"<Styles>{styles}</Styles><Layout>"
        f'<Page WIDTH="{page_w}" HEIGHT="{page_h}" PHYSICAL_IMG_NR="1">'
        + "".join(blocks) + "</Page></Layout></alto>")


def _abbyy_char(ch, x, y, w=40, h=60, fmt=None, suspicious=False):
    f = fmt or ""
    susp = " suspicious=\"1\"" if suspicious else ""
    return (f"{f}<charParams l=\"{x}\" t=\"{y}\" r=\"{x + w}\" "
            f"b=\"{y + h}\"{susp}>{ch}</charParams>")


def make_abbyy(lines, page_w=2000, page_h=3000):
    """lines: list of word-lists; each word is (text, fmt_attrs_str|None)."""
    y = 200
    lines_xml = []
    for words in lines:
        x = 150
        parts = []
        for wi, (text, fmt) in enumerate(words):
            if wi > 0:
                parts.append(_abbyy_char(" ", x, y))  # space splits words
                x += 45
            fmt_tag = f'<formatting{fmt}>' if fmt is not None else ""
            for ci, ch in enumerate(text):
                parts.append(_abbyy_char(
                    ch, x, y, fmt=fmt_tag if ci == 0 else None))
                x += 45
        lines_xml.append(
            f'<line baseline="{y + 60}" l="150" t="{y}" r="{x}" '
            f'b="{y + 60}">' + "".join(parts) + "</line>")
        y += 100
    body = "".join(lines_xml)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<document xmlns="http://www.abbyy.com/FineReader_xml/'
            'FineReader10-schema-v1.xml" version="1.0">'
            f'<page width="{page_w}" height="{page_h}" rotation="Normal">'
            f"<text><par>{body}</par></text></page></document>")


def _stext_char(ch, x, y, w=40, h=60):
    # quad = ulx uly urx ury llx lly lrx lry
    return (f'<char quad="{x} {y - h} {x + w} {y - h} {x} {y} {x + w} {y}" '
            f'x="{x}" y="{y}" c="{ch}"/>')


def make_stext(lines, page_w=2000, page_h=3000, font="Times-Roman", size=12):
    y = 200
    lines_xml = []
    for words in lines:
        x = 150
        parts = [f'<font name="{font}" size="{size}">']
        for wi, text in enumerate(words):
            if wi > 0:
                parts.append(_stext_char(" ", x, y))
                x += 45
            for ch in text:
                parts.append(_stext_char(ch, x, y))
                x += 45
        parts.append("</font>")
        lines_xml.append(
            f'<line bbox="150 {y - 70} {x} {y + 10}" dir="1 0">'
            + "".join(parts) + "</line>")
        y += 100
    return ('<?xml version="1.0"?>'
            '<document name="x"><page id="page0" width="%d" height="%d">'
            '<block bbox="0 0 100 100">%s</block></page></document>'
            % (page_w, page_h, "".join(lines_xml)))


# ---------------------------------------------------------------------------
# classification


def test_classify_formats():
    assert classify_payload(make_alto([[("hi", {})]]).encode()) == "alto"
    assert classify_payload(make_abbyy([[("hi", None)]]).encode()) == "abbyy"
    assert classify_payload(make_stext([["hi"]]).encode()) == "stext"
    assert classify_payload(b"%PDF-1.4 xyz") == "pdf"


# ---------------------------------------------------------------------------
# ALTO


def test_alto_basic_parse():
    xml = make_alto([
        [("Hello", {"WC": "0.96"}), ("world", {})],
        [("Second", {}), ("line", {})],
    ])
    page, _ = parse_alto_page(xml, 0)
    assert page.width == 2000 and page.height == 3000
    assert len(page.lines) == 2
    assert line_text(page.lines[0]) == "Hello world"
    assert page.lines[0].words[0].conf == 96
    assert len(page.pars) == 1  # one TextBlock → one paragraph


def test_alto_styles():
    styles = '<TextStyle ID="f1" FONTFAMILY="Georgia" FONTSIZE="12"/>'
    xml = make_alto(
        [[("Styled", {"STYLE": "bold italic", "STYLEREFS": "f1"})]],
        styles=styles)
    page, _ = parse_alto_page(xml, 0)
    w = page.lines[0].words[0]
    assert w.style.bold and w.style.italic
    assert w.style.font == "Georgia"
    assert w.style.size is None  # FONTSIZE intentionally unused


def test_alto_baseline_and_xheight():
    # "acemnor" is x-height-only → x_height = word height
    xml = make_alto([[("acemnor", {}), ("dog", {})]])
    page, _ = parse_alto_page(xml, 0)
    ln = page.lines[0]
    assert ln.x_height == 100
    # "dog" has a descender; convertPageAlto computes -20 against the
    # DECLARED TextLine bottom (320), then pass2's updateLineBbox shrinks
    # the bbox to the word union (bottom 300) and shifts the offset by
    # the same amount (ocrObjects.js updateLineBbox adjustBaseline) → 0.
    # Live-verified: the reference's hOCR export prints `baseline 0 0`.
    assert ln.baseline[1] == 0
    assert ln.bbox.bottom == 300


def test_alto_multipage_split():
    one = make_alto([[("pg", {})]])
    # crude two-page doc: duplicate Page element inside Layout
    two = one.replace("</Page></Layout>",
                      '</Page><Page WIDTH="2000" HEIGHT="3000">'
                      "</Page></Layout>")
    parts = split_alto_pages(two)
    assert len(parts) == 2
    assert "<Styles>" in parts[1]  # styles prepended to every page


# ---------------------------------------------------------------------------
# Abbyy


def test_abbyy_basic_parse():
    xml = make_abbyy([
        [("Hello", None), ("world", None)],
        [("Second", None), ("line", None)],
    ])
    page, _ = parse_abbyy_page(xml, 0)
    assert len(page.lines) == 2
    assert line_text(page.lines[0]) == "Hello world"
    assert page.lines[0].words[0].conf == 100
    assert len(page.pars) == 1


def test_abbyy_styles_and_sup():
    xml = make_abbyy([[
        ("Plain", ' ff="Arial"'),
        ("Bold", ' bold="1"'),
        ("2", ' superscript="1"'),
    ]])
    page, _ = parse_abbyy_page(xml, 0)
    words = page.lines[0].words
    assert [w.text for w in words] == ["Plain", "Bold", "2"]
    assert words[1].style.bold
    assert words[2].style.sup


def test_abbyy_suspicious_conf():
    xml = make_abbyy([[("Iffy", ' ')]])
    xml = xml.replace(">I</charParams>", ">I</charParams>", 1)
    # mark first char suspicious
    xml = xml.replace('<charParams l="150"', '<charParams suspicious="1" l="150"', 1)
    page, _ = parse_abbyy_page(xml, 0)
    # suspicious chars exist but regex requires l= first; conf still set
    assert page.lines[0].words[0].conf in (0, 100)


def test_abbyy_no_charparams_returns_empty():
    xml = ('<page width="100" height="100" rotation="Normal">'
           "<text><par><line>word-level only</line></par></text></page> abbyy")
    page, langs = parse_abbyy_page(xml, 0)
    assert page.lines == []


# ---------------------------------------------------------------------------
# stext


def test_stext_basic_parse():
    xml = make_stext([["Hello", "world"], ["Second", "line"]])
    pages = split_stext_pages(xml)
    assert len(pages) == 1
    page, langs = parse_stext_page(pages[0], 0)
    assert len(page.lines) == 2
    assert line_text(page.lines[0]) == "Hello world"
    w = page.lines[0].words[0]
    assert w.conf == 100
    # familyCurrent comes from the raw font-change name (suffix kept;
    # only the line-level fallback strips it — convertPageStext.js:78,245)
    assert w.style.font == "Times-Roman"
    assert w.style.size == 12
    assert "eng" in langs


def test_stext_bold_italic_fonts():
    xml = make_stext([["Styled"]], font="Helvetica-BoldOblique")
    page, _ = parse_stext_page(xml, 0)
    w = page.lines[0].words[0]
    assert w.style.bold and w.style.italic


def test_stext_cjk_char_per_word():
    xml = make_stext([["中文"]])
    page, langs = parse_stext_page(xml, 0)
    assert "chi_sim" in langs
    assert [w.text for w in page.lines[0].words] == ["中", "文"]


def test_stext_full_pipeline_roundtrip(ray_session):
    import ray.data as rd

    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    payloads = [make_alto([[("Alto", {}), ("doc", {})]]).encode(),
                make_abbyy([[("Abbyy", None), ("doc", None)]]).encode(),
                make_stext([["Stext", "doc"]]).encode()]
    tbl = pa.table({
        "url": [f"u{i}" for i in range(3)],
        "html": payloads,
        "text": [""] * 3,
        "lang": ["eng"] * 3,
    })
    out = build_extract_pipeline(rd.from_arrow(tbl), batch_size=4) \
        .to_pandas().set_index("url")
    assert out.loc["u0", "payload_kind"] == "alto"
    assert out.loc["u1", "payload_kind"] == "abbyy"
    assert out.loc["u2", "payload_kind"] == "stext"
    assert out.loc["u0", "extracted_text"] == "Alto doc"
    assert out.loc["u1", "extracted_text"] == "Abbyy doc"
    assert out.loc["u2", "extracted_text"] == "Stext doc"
    assert (out["error"] == "").all()


def test_scribe_payload_classified_and_extracted():
    """A reference-format .scribe payload routes through the extract
    pipeline (sortInputFiles .scribe branch, import.js:77-142)."""
    import random
    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.sources.classify import classify_payload
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.emit import write_text
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.stages.scribe_fmt import write_scribe

    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(3)), 0)
    expected = write_text([page])
    for gz in (False, True):
        blob = write_scribe([page], segmented=True, gzip_out=gz)
        assert classify_payload(blob) == "scribe"
        out = extract_document("u", blob, "", "en", reflow=False)
        assert out["error"] == ""
        assert out["payload_kind"] == "scribe"
        assert out["extracted_text"] == expected
    # whole-file (non-segmented) form sniffs too
    assert classify_payload(write_scribe([page], segmented=False)) \
        == "scribe"
