"""Glyph-outline PDF export: re-embedding the source document's
TrueType program (writePdfFonts.js:292 createEmbeddedFontType0 +
subsetPdf.js raw-bytes carry) and round-tripping through this engine's
own parser."""

import struct as st

from scribe_js_ray.sources.synth_pdf import PdfWriter
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.fonts_embedded import (
    parse_truetype_encoding, truetype_metrics)
from scribe_js_ray.stages.pdf_export import write_pdf

PAGE_W, PAGE_H = 612, 792


def _build_full_truetype(chars: str, family: str = "TestFam",
                         advance=lambda gid: 500):
    """A COMPLETE minimal TrueType: head/hhea/maxp/hmtx/cmap(4)/glyf/
    loca/name/post with one real square-outline glyph per char.
    GID 0 = .notdef (empty), GID i+1 = chars[i]."""
    n_glyphs = len(chars) + 1

    # glyf: gid0 empty; others a 1-contour square outline.
    glyf_parts = [b""]
    for i in range(len(chars)):
        x0, y0, x1, y1 = 50, 0, 450 + 10 * i, 700
        data = st.pack(">hhhhh", 1, x0, y0, x1, y1)
        data += st.pack(">H", 3)           # endPtsOfContours[0]
        data += st.pack(">H", 0)           # instructionLength
        data += bytes([0x01] * 4)          # flags: on-curve
        # x deltas (int16 via flag bit clear): x0, w, 0, -w
        w = x1 - x0
        data += st.pack(">hhhh", x0, w, 0, -w)
        data += st.pack(">hhhh", y0, 0, y1 - y0, 0)
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
                   0, -200, 1000, 800, 0, 8, 2, 0, 0)
    hhea = st.pack(">IhhhHhhhhhhhhhhhH",
                   0x00010000, 800, -200, 0, 600, 0, 0, 0, 1, 0, 0, 0,
                   0, 0, 0, 0, n_glyphs)
    maxp = st.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26
    hmtx = b"".join(st.pack(">Hh", advance(g), 50)
                    for g in range(n_glyphs))

    # cmap format 4: one segment per char + terminator.
    codes = sorted(ord(c) for c in chars)
    gid_of = {ord(c): i + 1 for i, c in enumerate(chars)}
    segs = [(c, c, gid_of[c]) for c in codes] + [(0xFFFF, 0xFFFF, 0)]
    seg_count = len(segs)
    sub = st.pack(">HHHHHHH", 4, 16 + 8 * seg_count, 0,
                  seg_count * 2, 1, 0, 0)
    sub += b"".join(st.pack(">H", s[1]) for s in segs)
    sub += b"\x00\x00"
    sub += b"".join(st.pack(">H", s[0]) for s in segs)
    def _delta(s):
        d = (s[2] - s[0]) & 0xFFFF if s[2] else 1
        return d - 0x10000 if d >= 0x8000 else d
    sub += b"".join(st.pack(">h", _delta(s)) for s in segs)
    sub += b"\x00" * (2 * seg_count)     # idRangeOffset = 0
    cmap = st.pack(">HH", 0, 1) + st.pack(">HHI", 3, 1, 12) + sub

    ps = f"{family}-PS".encode("latin-1")
    name_rec = st.pack(">HHHHHH", 1, 0, 0, 6, len(ps), 0)
    name = st.pack(">HHH", 0, 1, 6 + 12) + name_rec + ps
    post = st.pack(">IihhIIIII", 0x00030000, 0, 0, 0, 0, 0, 0, 0, 0)

    tables = [(b"cmap", cmap), (b"glyf", glyf), (b"head", head),
              (b"hhea", hhea), (b"hmtx", hmtx),
              (b"loca", loca), (b"maxp", maxp), (b"name", name),
              (b"post", post)]
    n = len(tables)
    search = 16 * (2 ** (n.bit_length() - 1))
    out = st.pack(">IHHHH", 0x00010000, n, search,
                  n.bit_length() - 1, 16 * n - search)
    off = 12 + 16 * n
    recs = b""
    body = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        recs += tag + st.pack(">III", 0, off, len(data))
        body += data + b"\x00" * pad
        off += len(data) + pad
    return out + recs + body


BODY = ("The quick brown fox jumps over the lazy dog and keeps the "
        "page score gate satisfied with printable words")


def _source_pdf(ttf: bytes, family: str = "TestFam"):
    """Single-page PDF using the embedded TrueType as a simple font."""
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} "
           f"{PAGE_H}] /Resources << /Font << /F1 5 0 R >> >> "
           f"/Contents 4 0 R >>").encode())
    content = "\n".join(
        f"BT /F1 12 Tf 72 {720 - 16 * i} Td ({ln}) Tj ET"
        for i, ln in enumerate((BODY[:55], BODY[55:])))
    data = content.encode("latin-1")
    w.add(f"<< /Length {len(data)} >>\nstream\n".encode() + data
          + b"\nendstream")
    widths = " ".join("500" for _ in range(32, 127))
    w.add((f"<< /Type /Font /Subtype /TrueType /BaseFont /{family} "
           f"/FirstChar 32 /LastChar 126 /Widths [{widths}] "
           f"/Encoding /WinAnsiEncoding /FontDescriptor 6 0 R >>"
           ).encode())
    w.add((f"<< /Type /FontDescriptor /FontName /{family} /Flags 32 "
           f"/FontBBox [0 -200 1000 800] /ItalicAngle 0 /Ascent 800 "
           f"/Descent -200 /CapHeight 700 /StemV 80 "
           f"/FontFile2 7 0 R >>").encode())
    w.add(f"<< /Length {len(ttf)} /Length1 {len(ttf)} >>\nstream\n"
          .encode() + ttf + b"\nendstream")
    return w.build()


def _charset():
    return "".join(sorted(set(BODY)))


def test_truetype_metrics_parses_fixture():
    ttf = _build_full_truetype(_charset())
    m = truetype_metrics(ttf)
    assert m is not None
    assert m["units_per_em"] == 1000
    assert m["ps_name"] == "TestFam-PS"
    assert m["uni_to_gid"][ord("T")] > 0
    # per-gid advances scaled to /1000 units
    assert m["advances"][0] == 500
    assert m["ascent"] == 800 and m["descent"] == -200


def test_export_embeds_source_font_and_roundtrips():
    """Parse a PDF with an embedded TrueType → export → the exported
    PDF carries a /FontFile2 whose program parses, and this engine's
    parser reads back identical text (the verdict's done-bar)."""
    ttf = _build_full_truetype(_charset())
    pages, _ = parse_pdf_document(_source_pdf(ttf))
    src_text = " ".join(w.text for ln in pages[0].lines
                        for w in ln.words)
    assert "quick" in src_text
    assert pages[0].font_programs    # program captured at parse

    out = write_pdf(pages)
    assert b"/FontFile2" in out
    assert b"/Identity-H" in out

    pages2, _ = parse_pdf_document(out)
    rt_text = " ".join(w.text for ln in pages2[0].lines
                       for w in ln.words)
    assert rt_text == src_text

    # The re-embedded program itself parses in fonts_embedded.
    from scribe_js_ray.stages.pdf.objects import PdfFile
    pdf = PdfFile(out)
    found = None
    for num in sorted(set(pdf.offsets) | set(pdf.compressed)):
        obj = pdf.get_object(num)
        d = getattr(obj, "dict", None)
        if isinstance(d, dict) and "Length1" in d:
            found = pdf.stream_bytes(obj)
            break
    assert found is not None
    assert truetype_metrics(found) is not None
    assert parse_truetype_encoding(found) is not None


def test_export_without_programs_falls_back_base14():
    """Pages from non-PDF sources (no font_programs) still export as
    base-14 text."""
    ttf = _build_full_truetype(_charset())
    pages, _ = parse_pdf_document(_source_pdf(ttf))
    for p in pages:
        p.font_programs = {}
    out = write_pdf(pages)
    assert b"/FontFile2" not in out
    pages2, _ = parse_pdf_document(out)
    rt_text = " ".join(w.text for ln in pages2[0].lines
                       for w in ln.words)
    assert "quick" in rt_text


def test_embed_widths_from_hmtx():
    """Per-gid advances read from hmtx (and scaled to /1000 units) feed
    the exported /W array, not the base-14 tables."""
    ttf = _build_full_truetype("ab", advance=lambda g: 500 + 10 * g)
    m = truetype_metrics(ttf)
    assert m["advances"][1] == 510 and m["advances"][2] == 520
