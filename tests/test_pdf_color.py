"""Fill-alpha (ExtGState /ca) + Separation/DeviceN tint-color parity.

Mirrors the reference's gstate/color tracking
(/root/reference/js/pdf/parsePdfDoc.js:77-132 parseFillAlphaExtGStates,
:273-324 parseTextColorSpaces, :1692-1768 color/gs operators,
:3086-3112 word styling) and its PDF function evaluator
(/root/reference/js/pdf/pdfColorFunctions.js) over synthetic PDFs:
alpha-0 hidden OCR layers stay extractable but carry opacity 0; tint
fills resolve through type 0/2/3/4 functions to hex colors.
"""

import pytest

from scribe_js_ray.sources.synth_pdf import PdfWriter
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf import colorfns as cf

PAGE_W, PAGE_H = 612, 792

BODY = ("Enough printable body characters to satisfy the page score "
        "gate of the type detector, spread across several words")


def _build(content: str, extgstate: str = "", colorspace: str = "",
           extra_objs=None):
    """Single-page PDF: obj 1 catalog, 2 pages, 3 page, 4 contents,
    5 font, 6+ extra (functions etc.)."""
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    res = "<< /Font << /F1 5 0 R >>"
    if extgstate:
        res += f" /ExtGState {extgstate}"
    if colorspace:
        res += f" /ColorSpace {colorspace}"
    res += " >>"
    w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
           f"{PAGE_H}] /Resources {res} /Contents 4 0 R >>").encode())
    data = content.encode("latin-1")
    w.add(f"<< /Length {len(data)} >>\nstream\n".encode() + data
          + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    for body in (extra_objs or []):
        w.add(body if isinstance(body, bytes) else body.encode())
    return w.build()


def _words(pages):
    return [w for p in pages for ln in p.lines for w in ln.words]


# ---------------------------------------------------------------------------
# ExtGState fill alpha


def test_alpha_zero_text_extracted_with_opacity_zero():
    """An OCR layer hidden via /ca 0 still extracts (like Tr 3) but
    every word carries opacity 0 (parsePdfDoc.js:1754-1768 + 3110)."""
    content = (f"/GS0 gs BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    data = _build(content, extgstate="<< /GS0 << /ca 0 >> >>")
    pages, _ = parse_pdf_document(data)
    words = _words(pages)
    assert words and " ".join(w.text for w in words).startswith("Enough")
    assert all(w.style.opacity == 0 for w in words)


def test_alpha_restored_by_Q():
    """q/Q brackets the alpha change: text after Q is opaque again
    (parsePdfDoc.js:1448-1479 q/Q save set includes fillAlpha)."""
    content = ("q /GS0 gs BT /F1 12 Tf 72 700 Td (hidden layer words here) "
               "Tj ET Q "
               f"BT /F1 12 Tf 72 650 Td ({BODY}) Tj ET")
    data = _build(content, extgstate="<< /GS0 << /ca 0 >> >>")
    pages, _ = parse_pdf_document(data)
    by_op = {}
    for w in _words(pages):
        by_op.setdefault(w.style.opacity, []).append(w.text)
    assert "hidden" in by_op.get(0, [])
    assert any(t.startswith("Enough") for t in by_op.get(1.0, []))


def test_gs_without_ca_leaves_alpha():
    """A /gs whose dict lacks /ca must not reset the alpha
    (parsePdfDoc.js:1760-1764: only a present fillAlpha updates)."""
    content = ("/GS0 gs /GS1 gs "
               f"BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    data = _build(
        content, extgstate="<< /GS0 << /ca 0.5 >> /GS1 << /LW 2 >> >>")
    pages, _ = parse_pdf_document(data)
    words = _words(pages)
    assert words and all(w.style.opacity == 0.5 for w in words)


def test_alpha_zero_keeps_page_type_text():
    """Alpha-hidden text does NOT count as invisible for the type
    detector (reference scorePageChars keys on tr==3 only,
    parsePdfDoc.js:395): classification matches the plain fixture."""
    body = " ".join(
        f"BT /F1 12 Tf 72 {700 - 16 * i} Td ({BODY}) Tj ET"
        for i in range(4))
    _, plain_type = parse_pdf_document(_build(body))
    _, hidden_type = parse_pdf_document(
        _build("/GS0 gs " + body, extgstate="<< /GS0 << /ca 0 >> >>"))
    assert plain_type == "text"
    assert hidden_type == plain_type


# ---------------------------------------------------------------------------
# Device color operators


def test_rg_fill_color_to_hex():
    content = (f"BT /F1 12 Tf 1 0 0 rg 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(_build(content))
    assert all(w.style.color == "#ff0000" for w in _words(pages))


def test_default_fill_is_black():
    content = f"BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET"
    pages, _ = parse_pdf_document(_build(content))
    assert all(w.style.color == "#000000" for w in _words(pages))


def test_cmyk_pure_k_gray_bypass():
    """0 0 0 0.5 k → neutral gray via the pure-K bypass
    (pdfColorFunctions.js:597-608), not the SWOP polynomial."""
    content = (f"BT /F1 12 Tf 0 0 0 0.5 k 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(_build(content))
    w = _words(pages)[0]
    assert w.style.color == "#808080"


# ---------------------------------------------------------------------------
# Separation / DeviceN tint transforms


def test_separation_type2_white_fill():
    """Tint 1 through an exponential function to RGB white: words carry
    #ffffff (the white-ink OCR-hiding pattern the verdict flagged)."""
    cs = ("[/Separation /White /DeviceRGB << /FunctionType 2 "
          "/Domain [0 1] /C0 [0 0 0] /C1 [1 1 1] /N 1 >>]")
    content = (f"/CS0 cs 1 scn BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>"))
    words = _words(pages)
    assert words and all(w.style.color == "#ffffff" for w in words)
    # Still extracted, still "visible" (alpha untouched).
    assert all(w.style.opacity == 1.0 for w in words)


def test_separation_type2_cmyk_alt():
    """Separation over DeviceCMYK: tint 1 → full cyan ink through the
    SWOP polynomial (pdfColorFunctions.js:609-653)."""
    cs = ("[/Separation /Cyan /DeviceCMYK << /FunctionType 2 "
          "/Domain [0 1] /C0 [0 0 0 0] /C1 [1 0 0 0] /N 1 >>]")
    content = (f"/CS0 cs 1 scn BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>"))
    r, g, b = cf.cmyk_to_rgb(1, 0, 0, 0)
    expect = f"#{r:02x}{g:02x}{b:02x}"
    assert all(w.style.color == expect for w in _words(pages))


def test_separation_type4_ps_calculator():
    """A {1 exch sub dup dup} tint program: tint 0 → RGB (1,1,1)."""
    ps = b"{ 1 exch sub dup dup }"
    fn = (f"<< /FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1] "
          f"/Length {len(ps)} >>\nstream\n").encode() + ps + b"\nendstream"
    cs = "[/Separation /Inv /DeviceRGB 6 0 R]"
    content = (f"/CS0 cs 0 scn BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>", extra_objs=[fn]))
    assert all(w.style.color == "#ffffff" for w in _words(pages))


def test_devicen_two_ink():
    """DeviceN with 2 colorants and a type-4 transform taking both."""
    ps = b"{ add 2 div dup dup }"
    fn = (f"<< /FunctionType 4 /Domain [0 1 0 1] /Range [0 1 0 1 0 1] "
          f"/Length {len(ps)} >>\nstream\n").encode() + ps + b"\nendstream"
    cs = "[/DeviceN [/A /B] /DeviceRGB 6 0 R]"
    content = (f"/CS0 cs 1 1 scn BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>", extra_objs=[fn]))
    assert all(w.style.color == "#ffffff" for w in _words(pages))


def test_scn_arity_mismatch_falls_back_raw():
    """Components not matching nInputs bypass the tint fn and read as
    raw color (parsePdfDoc.js:1719-1729 resolved || raw)."""
    cs = ("[/Separation /S /DeviceRGB << /FunctionType 2 "
          "/Domain [0 1] /C0 [0 0 0] /C1 [1 1 1] /N 1 >>]")
    content = (f"/CS0 cs 0.2 0.4 0.6 scn BT /F1 12 Tf 72 700 Td "
               f"({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>"))
    w = _words(pages)[0]
    assert w.style.color == cf.rgb_to_hex((0.2, 0.4, 0.6))


def test_rg_deselects_tint_space():
    """g/rg/k reset the named space (parsePdfDoc.js:1692-1697): scn
    after rg uses raw components again only via cs re-selection."""
    cs = ("[/Separation /W /DeviceRGB << /FunctionType 2 "
          "/Domain [0 1] /C0 [0 0 0] /C1 [1 1 1] /N 1 >>]")
    content = ("/CS0 cs 1 scn 0 0 1 rg "
               f"BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET")
    pages, _ = parse_pdf_document(
        _build(content, colorspace=f"<< /CS0 {cs} >>"))
    assert all(w.style.color == "#0000ff" for w in _words(pages))


# ---------------------------------------------------------------------------
# Function evaluator unit surface (pdfColorFunctions.js parity)


class _StubPdf:
    """Minimal resolve/stream_bytes host for standalone function dicts."""

    def resolve(self, o, depth=0):
        return o

    def stream_bytes(self, o):
        return o.data


def test_ps_roll_copy_index():
    toks = cf.tokenize_ps("{ 3 copy }")
    assert cf.evaluate_ps(toks, [1.0, 2.0, 3.0]) == [1, 2, 3, 1, 2, 3]
    toks = cf.tokenize_ps("{ 3 1 roll }")
    assert cf.evaluate_ps(toks, [1.0, 2.0, 3.0]) == [3, 1, 2]
    toks = cf.tokenize_ps("{ 2 index }")
    assert cf.evaluate_ps(toks, [7.0, 8.0, 9.0]) == [7, 8, 9, 7]


def test_ps_ifelse_and_trig():
    toks = cf.tokenize_ps("{ dup 0.5 lt { 0 } { 1 } ifelse }")
    assert cf.evaluate_ps(toks, [0.2])[-1] == 0
    assert cf.evaluate_ps(toks, [0.8])[-1] == 1
    toks = cf.tokenize_ps("{ sin }")
    assert cf.evaluate_ps(toks, [90.0])[-1] == pytest.approx(1.0)
    toks = cf.tokenize_ps("{ atan }")  # num den → degrees in [0,360)
    assert cf.evaluate_ps(toks, [-1.0, 0.0])[-1] == pytest.approx(270.0)


def test_type2_exponential():
    pdf = _StubPdf()
    fn = cf.parse_function(pdf, {
        "FunctionType": 2, "Domain": [0, 1],
        "C0": [0.0], "C1": [1.0], "N": 2})
    assert cf.evaluate_function(fn, [0.5]) == [0.25]
    # input clipped to domain
    assert cf.evaluate_function(fn, [2.0]) == [1.0]


def test_type3_stitching():
    pdf = _StubPdf()
    fn = cf.parse_function(pdf, {
        "FunctionType": 3, "Domain": [0, 1], "Bounds": [0.5],
        "Encode": [0, 1, 0, 1],
        "Functions": [
            {"FunctionType": 2, "Domain": [0, 1], "C0": [0.0],
             "C1": [0.5], "N": 1},
            {"FunctionType": 2, "Domain": [0, 1], "C0": [0.5],
             "C1": [1.0], "N": 1},
        ]})
    assert cf.evaluate_function(fn, [0.25])[0] == pytest.approx(0.25)
    assert cf.evaluate_function(fn, [0.75])[0] == pytest.approx(0.75)


def test_type0_sampled_interpolation():
    from scribe_js_ray.stages.pdf.objects import StreamObj
    s = StreamObj.__new__(StreamObj)
    s.dict = {"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1],
              "Size": [2], "BitsPerSample": 8}
    pdf = _StubPdf()
    pdf.stream_bytes = lambda o: bytes([0, 255])
    fn = cf.parse_function(pdf, s)
    assert cf.evaluate_function(fn, [0.0])[0] == pytest.approx(0.0)
    assert cf.evaluate_function(fn, [1.0])[0] == pytest.approx(1.0)
    assert cf.evaluate_function(fn, [0.5])[0] == pytest.approx(0.5)


def test_lab_alt_space_white():
    # L*=100, a*=b*=0 → white
    assert cf.alt_cs_to_rgb({"type": "Lab"}, [100, 0, 0]) == \
        (255, 255, 255)
    assert cf.alt_cs_to_rgb({"type": "Lab"}, [0, 0, 0]) == (0, 0, 0)


def test_color_to_rgb_norms():
    assert cf.color_to_rgb((0.5,)) == (0.5, 0.5, 0.5)
    assert cf.color_to_rgb((1, 0, 0)) == (1, 0, 0)
    r, g, b = cf.color_to_rgb((0, 0, 0, 1))
    assert (r, g, b) == (0, 0, 0)
    assert cf.color_to_rgb(None) is None


# ---------------------------------------------------------------------------
# Underline color gate (parsePdfDoc.js:3155-3167)


def test_decorative_colored_rule_not_underline():
    """A saturated red bar under black text is a decorative rule, not an
    underline; a black bar IS an underline."""
    bar = "1 0 0 rg 72 696 100 1 re f"
    content = (f"BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET " + bar)
    pages, _ = parse_pdf_document(_build(content))
    assert not any(w.style.underline for w in _words(pages))

    bar_black = "0 g 72 696 100 1 re f"
    content = (f"BT /F1 12 Tf 72 700 Td ({BODY}) Tj ET " + bar_black)
    pages, _ = parse_pdf_document(_build(content))
    assert any(w.style.underline for w in _words(pages))
