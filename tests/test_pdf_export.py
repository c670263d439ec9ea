"""write_pdf (SURVEY S9): text-layer PDF export round-trips through this
engine's own parser."""

from scribe_js_ray.model import page_text
from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf_export import write_pdf


def _sample_pages():
    ts = _Typesetter()
    ts.line("The quick brown fox jumps over the lazy dog and keeps", font="F1")
    ts.line("running through the quiet forest until morning light", font="F1")
    ts.line("appears slowly over the eastern ridge of the valley", font="F1")
    ts2 = _Typesetter()
    ts2.line("Second page content here with enough printable words", font="F1")
    ts2.line("to clear the hundred-character page-score threshold", font="F1")
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


def _blank_pdf():
    """A PDF with pages but no text (scan-like)."""
    from scribe_js_ray.sources.synth_pdf import PdfWriter
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 4 0 R >>")
    stream = b"q Q"
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")
    return w.build()


def test_overlay_invisible_text_on_blank_pdf():
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.sources.synth import hocr_from_text
    from scribe_js_ray.stages.pdf_export import overlay_pdf_text

    payload = hocr_from_text("recognized words from the scan layer", 7)
    page, _ = parse_hocr_page(payload.decode(), 0)
    # default scale: px → pt via the parse-time raster scale.  (An
    # explicit scale=1.0 would place the 2480px-wide OCR coords off the
    # 612pt page, and off-page chars are clipped on re-extraction
    # exactly like the reference, parsePdfDoc.js:585-595.)
    out = overlay_pdf_text(_blank_pdf(), [page], text_mode="invis")
    assert out.startswith(b"%PDF-")
    re_pages, doc_type = parse_pdf_document(out)
    text = page_text(re_pages[0])
    assert "recognized" in text and "scan" in text
    # Tr 3 text → doc types as an OCR overlay, not text-native
    assert doc_type in ("ocr", "image")


def test_overlay_preserves_original_text():
    pages = _sample_pages()
    original = _make_pdf([
        __import__("scribe_js_ray.sources.synth_pdf",
                   fromlist=["_Typesetter"])._Typesetter().stream()],
        {"F1": "Helvetica"})
    ts = __import__("scribe_js_ray.sources.synth_pdf",
                    fromlist=["_Typesetter"])._Typesetter()
    ts.line("Original printed words", font="F1")
    original = _make_pdf([ts.stream()], {"F1": "Helvetica"})
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.sources.synth import hocr_from_text
    from scribe_js_ray.stages.pdf_export import overlay_pdf_text
    ov_page, _ = parse_hocr_page(
        hocr_from_text("overlay layer text", 3).decode(), 0)
    out = overlay_pdf_text(original, [ov_page], scale=1.0)
    re_pages, _ = parse_pdf_document(out)
    text = page_text(re_pages[0])
    assert "Original printed words" in text
    assert "overlay" in text


def test_overlay_rejects_encrypted():
    import pytest
    from scribe_js_ray.stages.pdf_export import overlay_pdf_text
    from tests.test_pdf_crypto import _encrypt_pdf_rc4, _sample_pdf
    with pytest.raises(ValueError):
        overlay_pdf_text(_encrypt_pdf_rc4(_sample_pdf()), [None])


def test_extract_document_pdf_overlay_mode():
    from scribe_js_ray.pipelines.extract import extract_document
    ts = __import__("scribe_js_ray.sources.synth_pdf",
                    fromlist=["_Typesetter"])._Typesetter()
    ts.line("Printed page body text with enough characters to", font="F1")
    ts.line("pass the page score threshold for the text type", font="F1")
    ts.line("and a third line of running prose to be safe ok", font="F1")
    original = _make_pdf([ts.stream()], {"F1": "Helvetica"})
    res = extract_document("u", original, "", "",
                           emit_format="pdf_overlay")
    assert res["error"] == ""
    blob = res["extracted_text"].encode("latin-1")
    assert blob.startswith(b"%PDF-")
    re_pages, _ = parse_pdf_document(blob)
    text = page_text(re_pages[0])
    # original text survives AND the recognized layer is re-embedded
    assert text.count("Printed page body") >= 1


def test_overlay_handles_floats_and_indirect_contents():
    """Review-3 regressions: tiny floats must serialize fixed-point (no
    exponent notation) and an indirect /Contents ARRAY must flatten."""
    from scribe_js_ray.sources.synth_pdf import PdfWriter
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.sources.synth import hocr_from_text
    from scribe_js_ray.stages.pdf_export import overlay_pdf_text

    ts = __import__("scribe_js_ray.sources.synth_pdf",
                    fromlist=["_Typesetter"])._Typesetter()
    ts.line("Original body words here", font="F1")
    stream = ts.stream().encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    # tiny float in the page dict + /Contents -> indirect ref to an ARRAY
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/UserUnit 0.00005 "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>")
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"[4 0 R]")  # indirect contents array
    original = w.build()
    pages0, _ = parse_pdf_document(original)
    assert "Original body" in page_text(pages0[0])

    ov, _ = parse_hocr_page(hocr_from_text("layer words", 3).decode(), 0)
    out = overlay_pdf_text(original, [ov], scale=1.0)
    assert b"5e-05" not in out and b"E-05" not in out
    re_pages, _ = parse_pdf_document(out)
    text = page_text(re_pages[0])
    assert "Original body" in text    # flattened contents kept original
    assert "layer" in text            # overlay present


def test_standardize_page_size():
    """standardizePageSize: all exported pages take the document max
    dims (export.js:406-412 dimsLimit → outputDims) — and the text
    still round-trips through our own parser."""
    from scribe_js_ray.model import BBox, Line, Page, Word
    from scribe_js_ray.stages.pdf import parse_pdf_document
    from scribe_js_ray.stages.pdf_export import write_pdf

    pages = []
    for n, (w, h) in enumerate([(400, 500), (612, 792)]):
        page = Page(n, w, h)
        line = Line(page, BBox(50, 100, 200, 120), [0, -4], 15, None)
        word = Word(line, f"w{n}", f"page{n}", BBox(50, 100, 200, 120))
        word.conf = 100
        line.words.append(word)
        page.lines.append(line)
        pages.append(page)

    data = write_pdf(pages, standardize_page_size=True)
    rt, _, _ = parse_pdf_document(data, with_outline=True)
    assert len(rt) == 2
    # the parser reports 300-dpi pixel dims; both pages take the max
    # (612x792 pt -> 2550x3300 px)
    assert all(int(p.width) == 2550 and int(p.height) == 3300
               for p in rt)
    assert "page0" in " ".join(w.text for ln in rt[0].lines
                               for w in ln.words)

    # default keeps per-page dims (page 0 smaller than page 1)
    rt2, _, _ = parse_pdf_document(write_pdf(pages), with_outline=True)
    assert int(rt2[0].width) < int(rt2[1].width) == 2550
