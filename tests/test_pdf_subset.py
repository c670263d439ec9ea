"""Page-subset / metadata-scrub rebuild (subsetPdf.js behavior tests)."""

from scribe_js_ray.sources.synth_pdf import PdfWriter
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.objects import PdfFile, StreamObj
from scribe_js_ray.stages.pdf.subset import (
    serialize_obj, strip_metadata_pdf, subset_pdf)


def _page_text(data: bytes) -> list[str]:
    pages, _ = parse_pdf_document(data)
    return [" ".join(w.text for ln in p.lines for w in ln.words)
            for p in pages]


def _fixture() -> bytes:
    """3 pages; /FU defined but never used; page 1 has a link annot to
    page 3, page 3 a link to page 1 and a markup comment; /Info,
    catalog /Metadata + /Lang."""
    w = PdfWriter()
    w.add(b"placeholder-catalog")                      # 1 (rewritten below)
    w.add(b"<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R] /Count 3 >>")  # 2
    fonts = "/F1 9 0 R /FU 10 0 R"
    streams = [
        "BT /F1 11 Tf 72 700 Td (alpha page one) Tj ET",
        "BT /F1 11 Tf 72 700 Td (bravo page two) Tj ET",
        "BT /F1 11 Tf 72 700 Td (charlie page three) Tj ET",
    ]
    for i, s in enumerate(streams):
        extra = b""
        if i == 0:
            extra = b" /Annots [12 0 R]"
        elif i == 2:
            extra = b" /Annots [13 0 R 14 0 R]"
        w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              b"/Resources << /Font << " + fonts.encode() + b" >> >> "
              b"/Contents " + str(4 + 2 * i).encode() + b" 0 R" + extra
              + b" >>")
        data = s.encode()
        w.add(b"<< /Length " + str(len(data)).encode() + b" >>\nstream\n"
              + data + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")            # 9
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
          b"/Encoding /WinAnsiEncoding >>")            # 10 (unused)
    w.add(b"<< /Title (secret draft.pdf) /Author (Jordan) "
          b"/Producer (scribetest) >>")                # 11 info
    # 12: link on page 1 -> page 3 (kept in the [0,2] subset)
    w.add(b"<< /Type /Annot /Subtype /Link /Rect [10 10 60 20] "
          b"/Dest [7 0 R /XYZ 0 792 null] >>")
    # 13: link on page 3 -> page 2 (dropped in the [0,2] subset)
    w.add(b"<< /Type /Annot /Subtype /Link /Rect [10 30 60 40] "
          b"/A << /S /GoTo /D [5 0 R /Fit] >> >>")
    # 14: markup comment with reviewer identity
    w.add(b"<< /Type /Annot /Subtype /Text /Rect [10 50 60 60] "
          b"/T (Reviewer Jordan) /CreationDate (D:20240101) "
          b"/Contents (looks fine) >>")
    xmp = b"<x:xmpmeta>creator-tool leak</x:xmpmeta>"
    w.add(b"<< /Type /Metadata /Subtype /XML /Length "
          + str(len(xmp)).encode() + b" >>\nstream\n" + xmp
          + b"\nendstream")                            # 15
    w.objects[0] = (b"<< /Type /Catalog /Pages 2 0 R /Lang (en-US) "
                    b"/Metadata 15 0 R >>")
    out = w.build()
    return out.replace(b"/Root 1 0 R", b"/Root 1 0 R /Info 11 0 R")


def test_subset_keeps_selected_pages_in_order():
    src = _fixture()
    assert _page_text(src) == ["alpha page one", "bravo page two",
                               "charlie page three"]
    out = subset_pdf(src, [0, 2])
    assert _page_text(out) == ["alpha page one", "charlie page three"]
    out_rev = subset_pdf(src, [2, 0])
    assert _page_text(out_rev) == ["charlie page three", "alpha page one"]


def test_unused_font_pruned_and_dropped_page_orphans():
    out = subset_pdf(_fixture(), [0, 2])
    pdf = PdfFile(out)
    from scribe_js_ray.stages.pdf.doc import _walk_pages
    for info in _walk_pages(pdf):
        fonts = pdf.resolve(pdf.resolve(info["Resources"]).get("Font"))
        assert set(map(str, fonts)) == {"F1"}
    # The dropped page's content stream text must not ship at all.
    assert b"bravo page two" not in out
    assert b"Courier" not in out


def test_orphan_link_annot_dropped_surviving_link_kept():
    src = _fixture()
    out = subset_pdf(src, [0, 2])
    pdf = PdfFile(out)
    from scribe_js_ray.stages.pdf.doc import _walk_pages
    pages = _walk_pages(pdf)
    a0 = pdf.resolve(pages[0]["_node"].get("Annots"))
    assert len(a0) == 1          # link to kept page 3 survives
    a2 = pdf.resolve(pages[1]["_node"].get("Annots"))
    # GoTo to dropped page 2 is removed; the markup comment stays.
    assert len(a2) == 1
    assert str(pdf.resolve(a2[0]).get("Subtype")) == "Text"


def test_identity_subset_roundtrips_info_and_lang():
    src = _fixture()
    out = subset_pdf(src, [0, 1, 2])
    assert _page_text(out) == _page_text(src)
    pdf = PdfFile(out)
    info = pdf.resolve(pdf.trailer.get("Info"))
    assert info and info.get("Author") == b"Jordan"
    root = pdf.resolve(pdf.trailer.get("Root"))
    assert root.get("Lang") == b"en-US"


def test_scrub_strips_info_metadata_and_reviewer_identity():
    out = strip_metadata_pdf(_fixture())
    assert _page_text(out) == ["alpha page one", "bravo page two",
                               "charlie page three"]
    assert b"Jordan" not in out
    assert b"creator-tool leak" not in out
    assert b"secret draft.pdf" not in out
    pdf = PdfFile(out)
    assert pdf.trailer.get("Info") is None
    root = pdf.resolve(pdf.trailer.get("Root"))
    assert "Metadata" not in root
    assert root.get("Lang") == b"en-US"   # non-identifying keys kept
    from scribe_js_ray.stages.pdf.doc import _walk_pages
    page3 = _walk_pages(pdf)[2]["_node"]
    annots = pdf.resolve(page3.get("Annots"))
    comment = next(a for a in (pdf.resolve(x) for x in annots)
                   if str(a.get("Subtype")) == "Text")
    assert "T" not in comment and "CreationDate" not in comment
    assert comment.get("Contents") == b"looks fine"


def test_serialize_obj_roundtrips_through_lexer():
    from scribe_js_ray.stages.pdf.objects import Lexer, Name, Ref
    obj = {Name("A"): [1, -2.5, Ref(7), Name("Weird#Name ()"),
                       b"\x00byte\xffs", True, None],
           Name("Nested"): {Name("K"): b"v"}}
    data = serialize_obj(obj)
    back = Lexer(data, 0).parse_object()
    assert back["A"][0] == 1 and back["A"][1] == -2.5
    assert back["A"][2].num == 7
    assert str(back["A"][3]) == "Weird#Name ()"
    assert back["A"][4] == b"\x00byte\xffs"
    assert back["A"][5] is True and back["A"][6] is None
    assert back["Nested"]["K"] == b"v"
    stream = StreamObj({Name("Filter"): Name("FlateDecode")}, b"payload")
    s = serialize_obj(stream)
    assert b"/Length 7" in s and s.endswith(b"endstream")


def test_out_of_range_and_empty_indices_raise():
    src = _fixture()
    import pytest
    with pytest.raises(ValueError):
        subset_pdf(src, [])
    with pytest.raises(IndexError):
        subset_pdf(src, [5])


def _second_pdf() -> bytes:
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    data = b"BT /F1 11 Tf 72 700 Td (delta other doc) Tj ET"
    w.add(b"<< /Length " + str(len(data)).encode() + b" >>\nstream\n"
          + data + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    return w.build()


def test_merge_concatenates_pages_in_input_order():
    from scribe_js_ray.stages.pdf.subset import merge_pdfs
    out = merge_pdfs([_fixture(), _second_pdf()])
    assert _page_text(out) == ["alpha page one", "bravo page two",
                               "charlie page three", "delta other doc"]
    out2 = merge_pdfs([_second_pdf(), _second_pdf()])
    assert _page_text(out2) == ["delta other doc", "delta other doc"]


def test_merge_keeps_first_sources_info_only():
    from scribe_js_ray.stages.pdf.subset import merge_pdfs
    out = merge_pdfs([_fixture(), _second_pdf()])
    pdf = PdfFile(out)
    info = pdf.resolve(pdf.trailer.get("Info"))
    assert info and info.get("Author") == b"Jordan"
    out2 = merge_pdfs([_second_pdf(), _fixture()])
    pdf2 = PdfFile(out2)
    assert pdf2.resolve(pdf2.trailer.get("Info")) is None


def test_merge_rewrites_cross_refs_per_source():
    """Both sources' font objects must resolve post-renumbering."""
    from scribe_js_ray.stages.pdf.doc import _walk_pages
    from scribe_js_ray.stages.pdf.subset import merge_pdfs
    out = merge_pdfs([_second_pdf(), _second_pdf(), _second_pdf()])
    pdf = PdfFile(out)
    pages = _walk_pages(pdf)
    assert len(pages) == 3
    for info in pages:
        fonts = pdf.resolve(pdf.resolve(info["Resources"]).get("Font"))
        f1 = pdf.resolve(fonts.get("F1"))
        assert str(f1.get("BaseFont")) == "Helvetica"


def test_merge_empty_inputs_raise():
    import pytest
    from scribe_js_ray.stages.pdf.subset import merge_pdfs
    with pytest.raises(ValueError):
        merge_pdfs([])
