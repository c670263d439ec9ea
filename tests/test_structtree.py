"""Tagged-PDF struct tree + marked content (SURVEY M21/J4): MCID role
maps, heading/blockquote overlays, /Artifact furniture."""

from scribe_js_ray.model import page_text
from scribe_js_ray.sources.synth_pdf import PdfWriter, _Typesetter
from scribe_js_ray.stages.layout import analyze_layout
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.objects import PdfFile
from scribe_js_ray.stages.pdf.structtree import parse_struct_tree


def _tagged_pdf():
    """One page: H1-tagged heading (MCID 0), P body (MCID 1), BlockQuote
    (MCID 2); role map aliases 'Heading1' → H1."""
    stream = (
        "/Heading1 <</MCID 0>> BDC "
        "BT /F1 12 Tf 72 700 Td (Chapter Title Here) Tj ET EMC "
        "/P <</MCID 1>> BDC "
        "BT /F1 12 Tf 72 660 Td (Plain body sentence words here) Tj ET "
        "BT /F1 12 Tf 72 640 Td (and another body line of text) Tj ET EMC "
        "/BlockQuote <</MCID 2>> BDC "
        "BT /F1 12 Tf 72 600 Td (a quoted passage set inline) Tj ET "
        "BT /F1 12 Tf 72 580 Td (continuing the quoted text) Tj ET EMC "
    ).encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")  # 1
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")                # 2
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")  # 3
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")                                   # 4
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")                            # 5
    w.add(b"<< /Type /StructTreeRoot /K [7 0 R 8 0 R 9 0 R] "
          b"/RoleMap << /Heading1 /H1 >> >>")                          # 6
    w.add(b"<< /Type /StructElem /S /Heading1 /Pg 3 0 R /K 0 >>")      # 7
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K 1 >>")             # 8
    w.add(b"<< /Type /StructElem /S /BlockQuote /Pg 3 0 R /K 2 >>")    # 9
    return w.build()


def test_struct_tree_parse_with_rolemap():
    pdf = PdfFile(_tagged_pdf())
    roles = parse_struct_tree(pdf)
    assert roles == {3: {0: "H1", 1: "P", 2: "BlockQuote"}}


def test_struct_overlay_heading_and_blockquote():
    pages, _ = parse_pdf_document(_tagged_pdf())
    assert pages[0].mcid_roles == {0: "H1", 1: "P", 2: "BlockQuote"}
    analyze_layout(pages)
    types = [par.type for par in pages[0].pars]
    assert "title" in types       # H1 → heading → 'title'
    assert "blockquote" in types  # struct BlockQuote, no geometry needed
    # The P-element body lines absorb into the quote paragraph: the
    # quote's first line starts lowercase after an unterminated body
    # line, which the reference's struct branch reads as a sentence
    # continuation ACROSS the element boundary (analyzeLayout.js:2369
    # 'struct continuation') — so no separate body paragraph survives.
    quote_par = next(p for p in pages[0].pars if p.type == "blockquote")
    assert "quoted" in " ".join(w.text for ln in quote_par.lines
                                for w in ln.words)


def test_artifact_band_is_furniture():
    stream = (
        "/Artifact <</Type /Pagination>> BDC "
        "BT /F1 10 Tf 72 770 Td (Running Head Stamp) Tj ET EMC "
    ) + " ".join(
        f"BT /F1 12 Tf 72 {700 - 20 * i} Td "
        f"(body line {i} with several words here) Tj ET"
        for i in range(8))
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    data = stream.encode("latin-1")
    w.add(b"<< /Length " + str(len(data)).encode() + b" >>\nstream\n"
          + data + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    pages, _ = parse_pdf_document(w.build())
    analyze_layout(pages)
    head_par = next(p for p in pages[0].pars
                    if "Stamp" in " ".join(w_.text for ln in p.lines
                                           for w_ in ln.words))
    assert head_par.type == "header"


def test_artifact_unreliable_producer_ignored():
    # EVERYTHING tagged artifact → the flag is useless; body stays body.
    lines = " ".join(
        f"BT /F1 12 Tf 72 {700 - 20 * i} Td "
        f"(body line {i} with several words here) Tj ET"
        for i in range(8))
    stream = f"/Artifact BMC {lines} EMC"
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    data = stream.encode("latin-1")
    w.add(b"<< /Length " + str(len(data)).encode() + b" >>\nstream\n"
          + data + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    pages, _ = parse_pdf_document(w.build())
    analyze_layout(pages)
    assert all(par.type == "body" for par in pages[0].pars)
    assert "body line 3" in page_text(pages[0])


def _two_p_pdf(gap_small=True):
    """Two /P elements whose lines sit close enough that geometry alone
    would keep them in one paragraph (same left, tight leading)."""
    y2 = 660
    stream = (
        "/P <</MCID 0>> BDC "
        "BT /F1 12 Tf 72 700 Td (First paragraph sentence runs along "
        "here.) Tj ET "
        "BT /F1 12 Tf 72 680 Td (It wraps onto a second line cleanly.) "
        "Tj ET EMC "
        "/P <</MCID 1>> BDC "
        f"BT /F1 12 Tf 72 {y2} Td (Second paragraph starts with a "
        "capital.) Tj ET "
        f"BT /F1 12 Tf 72 {y2 - 20} Td (and continues with more words "
        "after.) Tj ET EMC "
    ).encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /StructTreeRoot /K [7 0 R 8 0 R] >>")
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K [0] >>")
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K [1] >>")
    return w.build()


def test_struct_elem_ids_parsed():
    pdf = PdfFile(_two_p_pdf())
    roles, elems = parse_struct_tree(pdf, with_elems=True)
    assert roles == {3: {0: "P", 1: "P"}}
    # two sibling /P elements → two DISTINCT instance ids
    ids = elems[3]
    assert ids[0] != ids[1]


def test_struct_element_boundary_splits_geometric_merge():
    """Two /P elements at uniform leading split at the element boundary
    (decideBreak 'struct element') even though geometry reads them as
    one paragraph."""
    pages, _ = parse_pdf_document(_two_p_pdf())
    analyze_layout(pages)
    pars = [p for p in pages[0].pars if p.lines]
    assert len(pars) == 2
    first_text = " ".join(w.text for ln in pars[0].lines
                          for w in ln.words)
    second_text = " ".join(w.text for ln in pars[1].lines
                           for w in ln.words)
    assert "wraps onto" in first_text
    assert second_text.startswith("Second paragraph")


def test_struct_continuation_not_split():
    """A lowercase line after an unterminated line merges despite the
    element boundary (decideBreak 'struct continuation')."""
    stream = (
        "/P <</MCID 0>> BDC "
        "BT /F1 12 Tf 72 700 Td (A sentence the producer broke without) "
        "Tj ET EMC "
        "/P <</MCID 1>> BDC "
        "BT /F1 12 Tf 72 680 Td (terminating punctuation or a capital.) "
        "Tj ET EMC "
    ).encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /StructTreeRoot /K [7 0 R 8 0 R] >>")
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K [0] >>")
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K [1] >>")
    pages, _ = parse_pdf_document(w.build())
    analyze_layout(pages)
    pars = [p for p in pages[0].pars if p.lines]
    assert len(pars) == 1


def test_same_element_merges_geometric_oversplit():
    """One /P element whose second line is indented (a geometric
    'indentation' break) stays ONE paragraph — the producer's grouping
    beats the weak geometric split (decideBreak 'struct element
    (same)')."""
    stream = (
        "/P <</MCID 0>> BDC "
        "BT /F1 12 Tf 72 700 Td (A paragraph line with regular margin "
        "words.) Tj ET "
        "BT /F1 12 Tf 100 680 Td (An indented wrap the producer still "
        "tags inside.) Tj ET "
        "BT /F1 12 Tf 72 660 Td (Back at the margin for the last "
        "line.) Tj ET EMC "
    ).encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /StructTreeRoot /K [7 0 R] >>")
    w.add(b"<< /Type /StructElem /S /P /Pg 3 0 R /K [0] >>")
    pages, _ = parse_pdf_document(w.build())
    analyze_layout(pages)
    pars = [p for p in pages[0].pars if p.lines]
    assert len(pars) == 1
    assert len(pars[0].lines) == 3
