"""write_pdf (SURVEY S9): text-layer PDF export round-trips through this
engine's own parser."""

from scribe_js_ray.model import page_text
from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf_export import write_pdf


def _sample_pages():
    ts = _Typesetter()
    ts.line("The quick brown fox jumps", font="F1")
    ts.line("over the lazy dog again", font="F1")
    ts2 = _Typesetter()
    ts2.line("Second page content here", font="F1")
    data = _make_pdf([ts.stream(), ts2.stream()], {"F1": "Helvetica"})
    pages, _ = parse_pdf_document(data)
    return pages


def test_roundtrip_ebook_mode():
    pages = _sample_pages()
    blob = write_pdf(pages, text_mode="ebook")
    assert blob.startswith(b"%PDF-")
    re_pages, doc_type = parse_pdf_document(blob)
    assert doc_type == "text"
    assert len(re_pages) == 2
    assert page_text(re_pages[0]) == page_text(pages[0])
    assert page_text(re_pages[1]) == page_text(pages[1])


def test_invis_mode_is_ocr_type():
    pages = _sample_pages()
    blob = write_pdf(pages, text_mode="invis")
    re_pages, doc_type = parse_pdf_document(blob)
    # Tr 3 text is invisible → doc-type scoring sees a scan overlay…
    assert doc_type in ("ocr", "image")
    # …but the text layer is still extractable per the OCR-overlay path
    all_chars_invisible = b"3 Tr" in __import__("zlib").decompress(
        blob[blob.index(b"stream\n") + 7:blob.index(b"\nendstream")])
    assert all_chars_invisible


def test_styles_map_to_base14_variants():
    pages = _sample_pages()
    w = pages[0].lines[0].words[0]
    w.style.bold = True
    w2 = pages[0].lines[0].words[1]
    w2.style.italic = True
    w2.style.font = "Times New Roman"
    blob = write_pdf(pages)
    assert b"/Helvetica-Bold" in blob
    assert b"/Times-Italic" in blob
    re_pages, _ = parse_pdf_document(blob)
    rw = re_pages[0].lines[0].words[0]
    assert rw.style.bold


def test_unencodable_chars_degrade():
    pages = _sample_pages()
    pages[0].lines[0].words[0].text = "你好"
    blob = write_pdf(pages)
    re_pages, _ = parse_pdf_document(blob)
    assert "??" in page_text(re_pages[0])
