"""Text→vector-path PDF export (convertTextRegionsToPaths.js behavior):
glyf outline parsing (simple, quadratic, composite) and region/full-page
conversion in write_pdf."""

import struct as st

from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.fonts_embedded import GlyphSource
from scribe_js_ray.stages.pdf.objects import PdfFile, StreamObj
from scribe_js_ray.stages.pdf_export import write_pdf

from test_pdf_embed_export import (
    _build_full_truetype, _charset, _source_pdf)


def _content_text(data: bytes) -> str:
    pdf = PdfFile(data)
    out = []
    for num in sorted(set(pdf.offsets) | set(pdf.compressed)):
        obj = pdf.get_object(num)
        if isinstance(obj, StreamObj) and "Length1" not in obj.dict:
            try:
                out.append(pdf.stream_bytes(obj).decode("latin-1"))
            except Exception:
                pass
    return "\n".join(out)


def test_glyph_source_square_outline():
    ttf = _build_full_truetype("ab")
    gs = GlyphSource(ttf)
    assert gs.ok and gs.units_per_em == 1000
    out = gs.outline(1)           # 'a', a 4-point square
    assert out[0][0] == "m" and out[-1] == ("z",)
    xs = [c[1] for c in out if c[0] in ("m", "l")]
    ys = [c[2] for c in out if c[0] in ("m", "l")]
    assert min(xs) == 50 and max(xs) == 450
    assert min(ys) == 0 and max(ys) == 700
    assert gs.outline(0) == []    # .notdef is empty


def _quad_glyf_font():
    """A font whose single glyph is one on-curve point + one off-curve
    control + one on-curve end (a quadratic wedge)."""
    n_glyphs = 2
    glyf_parts = [b""]
    data = st.pack(">hhhhh", 1, 0, 0, 400, 400)
    data += st.pack(">H", 2)          # endPt
    data += st.pack(">H", 0)          # no instructions
    data += bytes([0x01, 0x00, 0x01])  # on, OFF, on
    data += st.pack(">hhh", 0, 200, 200)     # x: 0, 200, 400
    data += st.pack(">hhh", 0, 400, -400)    # y: 0, 400, 0
    if len(data) % 2:
        data += b"\x00"
    glyf_parts.append(data)
    glyf = b"".join(glyf_parts)
    offs = [0]
    for p in glyf_parts:
        offs.append(offs[-1] + len(p))
    loca = b"".join(st.pack(">H", o // 2) for o in offs)
    head = st.pack(">IIIIHHQQhhhhHHhhh",
                   0x00010000, 0, 0, 0x5F0F3CF5, 0, 1000, 0, 0,
                   0, 0, 400, 400, 0, 8, 2, 0, 0)
    maxp = st.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26
    tables = [(b"glyf", glyf), (b"head", head), (b"loca", loca),
              (b"maxp", maxp)]
    n = len(tables)
    out = st.pack(">IHHHH", 0x00010000, n, 16, 0, 0)
    off = 12 + 16 * n
    recs, body = b"", b""
    for tag, tdata in tables:
        pad = (-len(tdata)) % 4
        recs += tag + st.pack(">III", 0, off, len(tdata))
        body += tdata + b"\x00" * pad
        off += len(tdata) + pad
    return out + recs + body


def test_glyph_source_quadratic_and_implied_midpoints():
    gs = GlyphSource(_quad_glyf_font())
    assert gs.ok
    out = gs.outline(1)
    quads = [c for c in out if c[0] == "q"]
    assert quads and quads[0][1:] == (200, 400, 400, 0)


def test_full_page_path_conversion_removes_text():
    ttf = _build_full_truetype(_charset())
    pages, _ = parse_pdf_document(_source_pdf(ttf))
    out = write_pdf(pages, path_pages={0})
    # No text survives: all words became filled paths.
    pages2, _ = parse_pdf_document(out)
    assert not any(ln.words for ln in pages2[0].lines)
    content = _content_text(out)
    assert "\nf" in content or " f\n" in content
    assert "Tj" not in content
    # And the (unused) embedded font objects are not shipped.
    assert b"/FontFile2" not in out


def test_region_path_conversion_is_selective():
    ttf = _build_full_truetype(_charset())
    pages, _ = parse_pdf_document(_source_pdf(ttf))
    words = [w for ln in pages[0].lines for w in ln.words]
    target = words[0]
    region = (target.bbox.left, target.bbox.top,
              target.bbox.right, target.bbox.bottom)
    out = write_pdf(pages, path_regions={0: [region]})
    pages2, _ = parse_pdf_document(out)
    out_words = [w.text for ln in pages2[0].lines for w in ln.words]
    assert target.text not in out_words       # converted word gone
    kept = [w.text for w in words if w.text != target.text]
    for t in kept[:5]:
        assert t in out_words                 # others still text
    assert b"/FontFile2" in out               # rest still embedded


def test_path_ops_position_and_scale():
    """A 700-unit-tall square at 12pt lands ~8.4pt above the baseline."""
    ttf = _build_full_truetype("x")
    from scribe_js_ray.stages.pdf.fonts_embedded import truetype_metrics
    from scribe_js_ray.stages.pdf_export import _glyph_path_ops
    gs = GlyphSource(ttf)
    ops = _glyph_path_ops(gs, truetype_metrics(ttf), "x", 100.0, 500.0,
                          12.0)
    assert ops[-1] == "f"
    ys = [float(o.split()[1]) for o in ops if o.endswith(" l")
          or o.endswith(" m")]
    assert max(ys) == 508.4 and min(ys) == 500.0
    xs = [float(o.split()[0]) for o in ops if o.endswith(" l")
          or o.endswith(" m")]
    assert min(xs) == 100.6   # 50/1000 * 12
