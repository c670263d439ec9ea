"""PDF export: page model → searchable text PDF (SURVEY S9 writePdf).

Core of the reference's writePdf (/root/reference/js/export/pdf/
writePdf.js:49 + writePdfText.js ocrPageToPDFStream), re-scoped to the
text layer this engine owns:

- ``text_mode='ebook'``  — visible black text (the reborn-document mode)
- ``text_mode='invis'``  — invisible text (Tr 3) for scan overlays
- one PDF page per model Page at its pixel dims (1 px = 1 pt, the OCR
  overlay convention); each word positioned at its baseline with its
  style size; bold/italic via the base-14 family variants
- WinAnsi text encoding (unencodable codepoints degrade to '?'),
  FlateDecode content streams, classic xref

Round-trips through this engine's own parser (tests) — the structural
guarantee the reference gets from its vitest PDF round-trip suite.
"""

from __future__ import annotations

import zlib

_BASE14 = {
    ("Helvetica", False, False): "Helvetica",
    ("Helvetica", True, False): "Helvetica-Bold",
    ("Helvetica", False, True): "Helvetica-Oblique",
    ("Helvetica", True, True): "Helvetica-BoldOblique",
    ("Times", False, False): "Times-Roman",
    ("Times", True, False): "Times-Bold",
    ("Times", False, True): "Times-Italic",
    ("Times", True, True): "Times-BoldItalic",
    ("Courier", False, False): "Courier",
    ("Courier", True, False): "Courier-Bold",
    ("Courier", False, True): "Courier-Oblique",
    ("Courier", True, True): "Courier-BoldOblique",
}


def _family_of(name) -> str:
    low = (name or "").lower()
    if "courier" in low or "mono" in low:
        return "Courier"
    if "times" in low or "serif" in low and "sans" not in low:
        return "Times"
    return "Helvetica"


def _font_key(word) -> str:
    fam = _family_of(word.style.font)
    return _BASE14[(fam, bool(word.style.bold), bool(word.style.italic))]


def _esc_winansi(s: str) -> bytes:
    out = bytearray()
    data = s.encode("cp1252", "replace")
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
        out.append(b)
    return bytes(out)


def write_pdf(pages, text_mode: str = "ebook") -> bytes:
    """pages: list of model Pages → PDF bytes."""
    if text_mode not in ("ebook", "invis"):
        raise ValueError(f"unsupported text_mode: {text_mode}")
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    n_pages = len(pages)
    # Object layout: 1 catalog, 2 pages, then [page, contents]×n, fonts.
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(b"")  # pages node placeholder (filled below)

    used_fonts: dict[str, str] = {}   # base name -> resource tag

    def tag_for(base: str) -> str:
        if base not in used_fonts:
            used_fonts[base] = f"F{len(used_fonts) + 1}"
        return used_fonts[base]

    page_obj_ids = []
    page_bodies = []
    for page in pages:
        w_px = max(int(round(page.width or 612)), 1)
        h_px = max(int(round(page.height or 792)), 1)
        parts = ["BT"]
        if text_mode == "invis":
            parts.append("3 Tr")
        for line in page.lines:
            base_y = line.bbox.bottom + (line.baseline[1] or 0)
            for word in line.words:
                size = word.style.size or \
                    ((line.asc_height or 9) / 0.75)
                size = max(round(float(size), 2), 1)
                base = _font_key(word)
                tag = tag_for(base)
                x = round(word.bbox.left, 2)
                y = round(h_px - base_y, 2)
                txt = _esc_winansi(word.text).decode("latin-1")
                parts.append(f"/{tag} {size:g} Tf")
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm")
                parts.append(f"({txt}) Tj")
        parts.append("ET")
        page_bodies.append(("\n".join(parts)).encode("latin-1"),)
        page_obj_ids.append(None)  # assigned after font count known

    first_page_obj = 3
    font_obj_start = first_page_obj + 2 * n_pages
    # Pre-assign font tags by scanning already done via tag_for above.
    font_refs = " ".join(
        f"/{tag} {font_obj_start + i} 0 R"
        for i, (base, tag) in enumerate(used_fonts.items()))

    for i, page in enumerate(pages):
        w_px = max(int(round(page.width or 612)), 1)
        h_px = max(int(round(page.height or 792)), 1)
        page_id = add(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w_px} {h_px}] "
             f"/Resources << /Font << {font_refs} >> >> "
             f"/Contents {first_page_obj + 2 * i + 1} 0 R >>").encode())
        assert page_id == first_page_obj + 2 * i
        comp = zlib.compress(page_bodies[i])
        add(b"<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + comp
            + b"\nendstream")
    for i, base in enumerate(used_fonts):
        fid = add(f"<< /Type /Font /Subtype /Type1 /BaseFont /{base} "
                  f"/Encoding /WinAnsiEncoding >>".encode())
        assert fid == font_obj_start + i

    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = (f"<< /Type /Pages /Kids [{kids}] "
                  f"/Count {n_pages} >>").encode()

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)
