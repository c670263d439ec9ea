"""Deterministic synthetic text-native PDFs (uncompressed, base-14 fonts).

Self-contained writer used only by the fixture generator: catalog → pages →
page → content stream with BT/Tf/Td/Tj/TJ/ET operators, classic xref table.
Exercises the PDF parse path (tokenizer, xref, text operators, TJ kerning,
style changes) per FIXTURES.md strata pdf-simple / pdf-tj-kerning /
pdf-styles.
"""

from __future__ import annotations

import random

_PAGE_W, _PAGE_H = 612, 792
_MARGIN = 72
_BODY_PT = 11
_PITCH = 14


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PdfWriter:
    def __init__(self):
        self.objects: list[bytes] = []

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def build(self) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(self.objects, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objects) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
                f"startxref\n{xref_pos}\n%%EOF\n").encode()
        return bytes(out)


def _make_pdf(page_streams: list[str], fonts: dict[str, str]) -> bytes:
    w = PdfWriter()
    n_pages = len(page_streams)
    # Object layout: 1=catalog, 2=pages, then per page (page, contents),
    # then fonts.
    catalog = w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    first_page_obj = 3
    font_obj_start = first_page_obj + 2 * n_pages
    font_refs = " ".join(
        f"/{name} {font_obj_start + i} 0 R"
        for i, name in enumerate(fonts))
    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    pages = w.add(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, stream in enumerate(page_streams):
        data = stream.encode("latin-1")
        w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
               f"{_PAGE_H}] /Resources << /Font << {font_refs} >> >> "
               f"/Contents {first_page_obj + 2 * i + 1} 0 R >>").encode())
        w.add(f"<< /Length {len(data)} >>\nstream\n".encode() + data
              + b"\nendstream")
    for base in fonts.values():
        w.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /{base} "
              f"/Encoding /WinAnsiEncoding >>".encode())
    assert catalog == 1 and pages == 2
    return w.build()


class _Typesetter:
    """Greedy line filler in PDF points using the shared width tables."""

    def __init__(self):
        from ..stages.pdf.widths import base14_widths, char_width
        self._w = {"F1": base14_widths("Helvetica"),
                   "F2": base14_widths("Helvetica-Bold"),
                   "F3": base14_widths("Times-Roman")}
        self._cw = char_width
        self.ops: list[str] = []
        self.y = _PAGE_H - _MARGIN

    def text_width(self, s: str, font: str, size: float) -> float:
        t = self._w[font]
        return sum(self._cw(t, ch) for ch in s) * size / 1000.0

    def line(self, s: str, x: float = _MARGIN, size: float = _BODY_PT,
             font: str = "F1", dy: float = _PITCH):
        self.y -= dy
        self.ops.append(
            f"BT /{font} {size} Tf {x:.2f} {self.y:.2f} Td ({_esc(s)}) Tj ET")

    def line_tj(self, pieces, x: float = _MARGIN, size: float = _BODY_PT,
                font: str = "F1", dy: float = _PITCH):
        """pieces: list of str (shown) or numbers (TJ advance, 1/1000 em)."""
        self.y -= dy
        arr = "".join(
            f"({_esc(p)})" if isinstance(p, str) else f" {p} "
            for p in pieces)
        self.ops.append(
            f"BT /{font} {size} Tf {x:.2f} {self.y:.2f} Td [{arr}] TJ ET")

    def flow(self, words, x=_MARGIN, width=_PAGE_W - 2 * _MARGIN,
             size=_BODY_PT, font="F1", indent=18.0):
        cur, cur_w = [], 0.0
        first = True
        space_w = self.text_width(" ", font, size)
        for word in words:
            ww = self.text_width(word, font, size)
            avail = width - (indent if first else 0.0)
            if cur and cur_w + space_w + ww > avail:
                self.line(" ".join(cur), x=x + (indent if first else 0.0),
                          size=size, font=font)
                cur, cur_w = [], 0.0
                first = False
            cur.append(word)
            cur_w += (space_w if cur_w else 0.0) + ww
        if cur:
            self.line(" ".join(cur), x=x + (indent if first else 0.0),
                      size=size, font=font)

    def stream(self) -> str:
        return "\n".join(self.ops)


def make_pdf_simple(r: random.Random) -> bytes:
    from .synth import _paragraph_words
    pages = []
    for _ in range(r.randint(1, 2)):
        ts = _Typesetter()
        for _ in range(r.randint(2, 4)):
            ts.flow(_paragraph_words(r, r.randint(2, 4)))
            ts.y -= 8
        pages.append(ts.stream())
    return _make_pdf(pages, {"F1": "Helvetica", "F2": "Helvetica-Bold",
                             "F3": "Times-Roman"})


def make_pdf_images(r: random.Random) -> bytes:
    """Text page that also embeds image XObjects across the extraction
    matrix: Flate DeviceRGB raster, 4-bit Indexed with a hex-string
    palette, DCTDecode passthrough, 1-bit ImageMask stencil, and a
    DeviceGray image with an 8-bit /SMask — the fixture for
    stages/pdf/images.py (parsePdfImages.js surface)."""
    import zlib

    import numpy as np

    from .synth import _paragraph_words

    seed = r.randint(0, 2 ** 31)  # drawn first so rasters are
    rng = np.random.default_rng(seed)  # reproducible from the doc rng

    ts = _Typesetter()
    for _ in range(3):
        ts.flow(_paragraph_words(r, 3))
        ts.y -= 8
    text_stream = ts.stream()

    # Im1: 8x6 DeviceRGB gradient (FlateDecode).
    w1, h1 = 8, 6
    im1 = (np.arange(h1 * w1 * 3, dtype=np.uint32) * 37 + seed) % 256
    im1 = im1.astype(np.uint8).reshape(h1, w1, 3)
    # Im2: 16x8 Indexed 4-bit, 6-color palette (rows byte-aligned).
    w2, h2 = 16, 8
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, (h2, w2), dtype=np.uint8)
    packed2 = bytearray()
    for y in range(h2):
        for x in range(0, w2, 2):
            packed2.append((idx[y, x] << 4)
                           | (idx[y, x + 1] if x + 1 < w2 else 0))
    # Im3: 16x16 baseline JPEG (DCTDecode passthrough).
    from ..stages.jpeg import jpeg_encode
    im3 = np.full((16, 16, 3), (seed % 200) + 20, np.uint8)
    jpg = jpeg_encode(im3, quality=90)
    # Im4: 10x10 1-bit stencil mask (checker).
    w4, h4 = 10, 10
    bits4 = bytearray()
    for y in range(h4):
        row = 0
        for x in range(w4):
            row = (row << 1) | ((x + y) & 1)
        bits4 += int.to_bytes(row << (16 - w4), 2, "big")
    # Im5: 8x8 DeviceGray + Im6 SMask alpha ramp.
    w5, h5 = 8, 8
    gray = (np.arange(h5 * w5, dtype=np.uint32) * 11 % 256) \
        .astype(np.uint8)
    alpha = (np.arange(h5 * w5, dtype=np.uint32) * 4 % 256) \
        .astype(np.uint8)

    w = PdfWriter()
    catalog = w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages = w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")

    draws = []
    for i, (iw, ih, x, y) in enumerate(
            [(w1, h1, 72, 600), (w2, h2, 200, 600), (16, 16, 320, 600),
             (w4, h4, 440, 600), (w5, h5, 72, 520)], start=1):
        draws.append(f"q {iw * 4} 0 0 {ih * 4} {x} {y} cm /Im{i} Do Q")
    content = (text_stream + "\n" + "\n".join(draws)).encode("latin-1")

    page = w.add(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> /XObject << "
        b"/Im1 6 0 R /Im2 7 0 R /Im3 8 0 R /Im4 9 0 R /Im5 10 0 R "
        b">> >> /Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")

    def img_obj(body_dict: bytes, raster: bytes) -> int:
        z = zlib.compress(raster)
        return w.add(body_dict
                     + f" /Filter /FlateDecode /Length {len(z)} "
                     f">>\nstream\n".encode()
                     + z + b"\nendstream")

    img_obj(f"<< /Type /XObject /Subtype /Image /Width {w1} "
            f"/Height {h1} /BitsPerComponent 8 /ColorSpace /DeviceRGB"
            .encode(), im1.tobytes())
    pal_hex = pal.tobytes().hex()
    img_obj(f"<< /Type /XObject /Subtype /Image /Width {w2} "
            f"/Height {h2} /BitsPerComponent 4 /ColorSpace "
            f"[/Indexed /DeviceRGB 5 <{pal_hex}>]".encode(),
            bytes(packed2))
    w.add(f"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 "
          f"/BitsPerComponent 8 /ColorSpace /DeviceRGB "
          f"/Filter /DCTDecode /Length {len(jpg)} >>\nstream\n".encode()
          + jpg + b"\nendstream")
    img_obj(f"<< /Type /XObject /Subtype /Image /Width {w4} "
            f"/Height {h4} /ImageMask true /BitsPerComponent 1"
            .encode(), bytes(bits4))
    img_obj(f"<< /Type /XObject /Subtype /Image /Width {w5} "
            f"/Height {h5} /BitsPerComponent 8 /ColorSpace /DeviceGray "
            f"/SMask 11 0 R".encode(), gray.tobytes())
    img_obj(f"<< /Type /XObject /Subtype /Image /Width {w5} "
            f"/Height {h5} /BitsPerComponent 8 /ColorSpace /DeviceGray"
            .encode(), alpha.tobytes())

    assert catalog == 1 and pages == 2 and page == 3
    return w.build()


def make_pdf_styles(r: random.Random) -> bytes:
    """Bold heading, body with a TJ-kerned line and an italic-free styled
    word run; exercises style-change word splits + kerning suppression."""
    from .synth import _paragraph_words, _sentence
    ts = _Typesetter()
    heading = " ".join(w.capitalize() for w in _sentence(r, 3)[:-1])
    hw = ts.text_width(heading, "F2", 18)
    ts.line(heading, x=(_PAGE_W - hw) / 2, size=18, font="F2", dy=26)
    ts.y -= 10
    ts.flow(_paragraph_words(r, 2))
    # Kerned line: small negative TJ offsets inside words must not split.
    w1, w2 = r.choice(["kerning", "tracking"]), r.choice(["artifact", "offset"])
    ts.line_tj([w1[:3], -18, w1[3:], " ", w2[:4], -22, w2[4:], " ",
                "remains", " ", "whole."], dy=_PITCH + 6)
    ts.y -= 4
    ts.flow(_paragraph_words(r, 2), font="F3")
    return _make_pdf([ts.stream()], {"F1": "Helvetica", "F2": "Helvetica-Bold",
                                     "F3": "Times-Roman"})


def make_pdf_textstate(r: random.Random) -> bytes:
    """Aggressive text-state fuzz: randomized Tz (horizontal scaling),
    Ts (rise), Tc/Tw (char/word spacing), TL+T*, TD, Tm-with-scale and
    mixed TJ arrays — the operator combinations whose per-glyph float-op
    ORDER the interpreter reproduces bit-exactly (showLiteralString,
    parseContent.js; see stages/pdf/content.py _show docstring).  Built
    for the live-reference parity battery: every page stays a plain
    WinAnsi base-14 document the reference's native-text path accepts."""
    from .synth import _sentence
    words = lambda n: " ".join(_sentence(r, n)[:-1])
    ops = []
    y = _PAGE_H - _MARGIN
    fonts = ["F1", "F2", "F3"]

    # 1. Tz chain: scale changes mid-line (raw-Tz factorization path).
    y -= 24
    tz_a, tz_b = r.choice([50, 75, 80, 120, 150]), r.choice([90, 110, 130])
    ops.append(
        f"BT /F1 12 Tf {tz_a} Tz {_MARGIN:.2f} {y:.2f} Td "
        f"({_esc(words(3))}) Tj {tz_b} Tz ( {_esc(words(2))}) Tj "
        f"100 Tz ET")

    # 2. Ts rise markers: superscript/subscript runs inside a line.
    y -= 22
    rise = r.choice([2.5, 3.0, 3.5])
    base = words(2)
    ops.append(
        f"BT /F1 12 Tf {_MARGIN:.2f} {y:.2f} Td ({_esc(base)}) Tj "
        f"{rise} Ts /F1 8 Tf ({r.randint(1, 24)}) Tj 0 Ts /F1 12 Tf "
        f"( {_esc(words(2))}) Tj "
        f"{-rise} Ts /F1 8 Tf (n{r.randint(0, 9)}) Tj 0 Ts ET")

    # 3. Tc/Tw spacing: tracked heading + word-spaced body line.
    y -= 26
    tc = round(r.uniform(0.4, 1.6), 2)
    ops.append(
        f"BT /F2 14 Tf {tc} Tc {_MARGIN:.2f} {y:.2f} Td "
        f"({_esc(words(2).upper())}) Tj 0 Tc ET")
    y -= 18
    tw = round(r.uniform(1.0, 4.0), 2)
    ops.append(
        f"BT /F1 11 Tf {tw} Tw {_MARGIN:.2f} {y:.2f} Td "
        f"({_esc(words(5))}) Tj 0 Tw ET")

    # 4. TL + T* flow with a TD (negative-leading setter) interruption.
    y -= 24
    tl = r.choice([13.0, 14.5, 16.0])
    body = [words(r.randint(3, 6)) for _ in range(3)]
    ops.append(
        f"BT /F1 11 Tf {tl} TL {_MARGIN:.2f} {y:.2f} Td "
        f"({_esc(body[0])}) Tj T* ({_esc(body[1])}) Tj "
        f"12 {-tl - 2:.1f} TD ({_esc(body[2])}) Tj ET")
    y -= 3 * tl + 10

    # 5. Tm with non-unit scale (font size inherited through the matrix)
    #    + a TJ array mixing kern offsets and spacing.
    sc = r.choice([0.75, 1.25, 1.5])
    f = r.choice(fonts)
    w1, w2 = _sentence(r, 2)[0], _sentence(r, 2)[0]
    ops.append(
        f"BT /{f} 10 Tf {sc} 0 0 {sc} {_MARGIN + 8:.2f} {y:.2f} Tm "
        f"[({_esc(w1[:2])}) {r.randint(-30, -8)} ({_esc(w1[2:])}) "
        f"-260 ({_esc(w2)}) {r.randint(40, 90)} ({_esc(words(1))})] TJ ET")
    y -= 20 * sc + 6

    # 6. ' and " show-with-newline operators.
    ops.append(
        f"BT /F1 11 Tf 14 TL {_MARGIN:.2f} {y:.2f} Td "
        f"({_esc(words(3))}) Tj ({_esc(words(3))}) ' "
        f"{round(r.uniform(0.5, 2.0), 2)} {round(r.uniform(0.05, 0.3), 2)} "
        f"({_esc(words(3))}) \" ET")

    return _make_pdf(["\n".join(ops)],
                     {"F1": "Helvetica", "F2": "Helvetica-Bold",
                      "F3": "Times-Roman"})


# AGL names for the character classes the Type3 zoo page emits.
_AGL_NAME = {**{c: c for c in "abcdefghijklmnopqrstuvwxyz"},
             ".": "period", ",": "comma"}


def _wrap_words(text: str, width: int) -> list[str]:
    """Greedy word-boundary wrap into lines of at most ``width`` chars."""
    lines, cur = [], ""
    for w in text.split():
        cand = f"{cur} {w}" if cur else w
        if len(cand) > width and cur:
            lines.append(cur)
            cur = w
        else:
            cur = cand
    if cur:
        lines.append(cur)
    return lines


def make_pdf_fontzoo(r: random.Random) -> bytes:
    """Font-zoo fuzz document for the live-parity battery: one page per
    exotic font family the decision surface must route identically —
    (1) a Type3 font (CharProcs + FontMatrix + /Differences AGL names,
    d0 advances; parsePdfFonts Type3 path), (2) a Type0/Identity-H CID
    font decoded via /ToUnicode with /W widths, and (3) a base-14 face
    whose /Encoding dict remaps high codes via /Differences.  Every
    page carries >=100 letters so determinePdfType reaches the 'text'
    verdict through both engines."""
    from .synth import _paragraph_words

    def para(n):
        return " ".join(_paragraph_words(r, n)).lower()

    wrap_w = r.choice([40, 44, 48])
    size = r.choice([10, 11, 12])
    pitch = size + r.choice([3, 4, 5])

    def line_ops(lines, fmt=None):
        ops, y = [], _PAGE_H - _MARGIN
        for ln in lines:
            body = fmt(ln) if fmt else f"({_esc(ln)})"
            ops.append(f"BT /F1 {size} Tf {_MARGIN} {y} Td {body} Tj ET")
            y -= pitch
        return "\n".join(ops).encode("latin-1")

    w = PdfWriter()
    # fixed skeleton: 1 catalog, 2 pages, (3,4) (5,6) (7,8) page+content
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R 5 0 R 7 0 R] /Count 3 >>")

    def page(font_obj, content):
        w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
               f"{_PAGE_H}] /Resources << /Font << /F1 {font_obj} 0 R >> "
               f">> /Contents {len(w.objects) + 2} 0 R >>").encode())
        w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
              + content + b"\nendstream")

    # --- page 1: Type3 ---------------------------------------------------
    t3_text = para(r.randint(3, 4))
    t3_text = "".join(c for c in t3_text if c in _AGL_NAME or c == " ")
    t3_chars = sorted(set(t3_text) - {" "})
    t3_font = 9
    n_glyphs = len(t3_chars)
    # obj t3_font: font, +1 charprocs, +2.. glyph streams, last = space
    page(t3_font, line_ops(_wrap_words(t3_text, wrap_w)))

    # --- page 2: Type0 / Identity-H --------------------------------------
    t0_text = para(r.randint(3, 4))
    t0_uniq = sorted(set(t0_text))
    cid = {c: i + 1 for i, c in enumerate(t0_uniq)}
    t0_font = t3_font + 2 + n_glyphs + 1

    def hexline(ln):
        return "<" + "".join(f"{cid[c]:04x}" for c in ln) + ">"

    page(t0_font, line_ops(_wrap_words(t0_text, wrap_w), fmt=hexline))

    # --- page 3: /Differences remap over a base-14 face ------------------
    d_font = t0_font + 3
    d_text = para(r.randint(3, 4))
    remap = r.sample("ABCDEFGHIJKLMNOPQRSTUVWXYZ", r.randint(3, 6))
    base_code = r.choice([180, 200, 220])
    run = "".join(chr(base_code + i) for i in range(len(remap)))
    d_lines = _wrap_words(d_text, wrap_w)
    d_lines.insert(r.randrange(len(d_lines) + 1), f"{run} marker zone")
    page(d_font, line_ops(d_lines))

    # --- font objects -----------------------------------------------------
    scale = r.choice(["0.01", "0.008", "0.012"])
    adv = r.choice([45, 50, 55])
    names = [(ord(c), f"/{_AGL_NAME[c]}") for c in t3_chars]
    difftxt = "32 /space " + " ".join(f"{cp} {nm}" for cp, nm in names)
    last = max(cp for cp, _ in names)
    assert w.add((
        f"<< /Type /Font /Subtype /Type3 /FontMatrix [{scale} 0 0 {scale} "
        f"0 0] /FontBBox [0 0 60 60] /FirstChar 32 /LastChar {last} "
        f"/Encoding << /Differences [{difftxt}] >> "
        f"/CharProcs {t3_font + 1} 0 R >>").encode()) == t3_font
    glyph_base = t3_font + 2
    w.add(("<< " + " ".join(f"{nm} {glyph_base + i} 0 R"
                            for i, (_, nm) in enumerate(names))
           + f" /space {glyph_base + n_glyphs} 0 R >>").encode())
    glyph = f"{adv} 0 d0 5 5 m 40 55 l S".encode()
    for _ in range(n_glyphs):
        w.add(f"<< /Length {len(glyph)} >>\nstream\n".encode()
              + glyph + b"\nendstream")
    blank = b"30 0 d0"
    w.add(f"<< /Length {len(blank)} >>\nstream\n".encode()
          + blank + b"\nendstream")

    dw = r.choice([550, 600, 650])
    wlist = " ".join(str(300 if c == " " else r.choice([440, 500, 520]))
                     for c in t0_uniq)
    bf = "\n".join(f"<{cid[c]:04x}> <{ord(c):04x}>" for c in t0_uniq)
    cmap = (f"/CIDInit /ProcSet findresource begin\nbegincmap\n"
            f"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            f"{len(t0_uniq)} beginbfchar\n{bf}\nendbfchar\nendcmap\nend"
            ).encode()
    assert w.add((
        f"<< /Type /Font /Subtype /Type0 /BaseFont /ZooSans "
        f"/Encoding /Identity-H /DescendantFonts [{t0_font + 1} 0 R] "
        f"/ToUnicode {t0_font + 2} 0 R >>").encode()) == t0_font
    w.add((f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /ZooSans "
           f"/DW {dw} /W [1 [{wlist}]] >>").encode())
    w.add(f"<< /Length {len(cmap)} >>\nstream\n".encode() + cmap
          + b"\nendstream")

    diff_names = " ".join(f"/{c}" for c in remap)
    assert w.add((
        f"<< /Type /Font /Subtype /Type1 /BaseFont /"
        f"{r.choice(['Helvetica', 'Times-Roman'])} "
        f"/Encoding << /BaseEncoding /WinAnsiEncoding /Differences "
        f"[{base_code} {diff_names}] >> >>").encode()) == d_font
    return w.build()


def make_pdf_xobjects(r: random.Random) -> bytes:
    """Form-XObject + inline-image fuzz document for the live-parity
    battery (M7 routing): page text around q/cm-placed Do invocations of
    a form (own font resources, optional nested form), a REPEATED Do of
    the same form (executes once per page — extractFormXObjectText's
    visited set), text state set before a Do (the form inherits
    tc/tw/tz per findDoOperators), an inline BI/ID/EI image between
    text runs, and an Image XObject Do."""
    from .synth import _paragraph_words

    def para(n):
        return " ".join(_paragraph_words(r, n))

    size = r.choice([10, 11, 12])
    pitch = size + 4

    def flow(text, x, y, font="F1", fsize=None):
        ops, fs = [], fsize or size
        for ln in _wrap_words(text, r.choice([40, 44, 48])):
            ops.append(f"BT /{font} {fs} Tf {x} {y} Td ({_esc(ln)}) Tj ET")
            y -= pitch
        return "\n".join(ops), y

    # form 2 (innermost): plain text with the page font
    f2_ops, _ = flow(para(1), _MARGIN, 640, font="F1")
    form2 = f2_ops.encode("latin-1")

    # form 1: own bold font + optional nested Do of form 2
    f1_ops, f1_y = flow(para(r.randint(1, 2)), _MARGIN, 690, font="F2")
    nest = r.random() < 0.8
    if nest:
        dx, dy = r.randint(-20, 20), -r.randint(10, 40)
        f1_ops += f"\nq 1 0 0 1 {dx} {dy} cm /Fm2 Do Q"
    form1 = f1_ops.encode("latin-1")

    img = bytes(range(16)) * 4  # EI-free payload

    parts = []
    top, y = flow(para(2), _MARGIN, _PAGE_H - _MARGIN)
    parts.append(top)
    sx = r.choice(["1", "0.9", "0.75"])
    ty = -r.randint(30, 90)
    # text state before the Do: the form inherits it
    pre_tz = r.choice(["", f"BT {r.choice([110, 120, 80])} Tz ET\n"])
    parts.append(f"{pre_tz}q {sx} 0 0 {sx} 0 {ty} cm /Fm1 Do Q")
    if r.random() < 0.7:
        parts.append(f"BI /W 8 /H 8 /CS /G /BPC 8 ID {img.decode('latin-1')} EI")
    if r.random() < 0.8:  # repeat Do: must NOT re-emit form text
        parts.append(f"q 0.8 0 0 0.8 {r.randint(0, 60)} {ty - 180} cm /Fm1 Do Q")
    parts.append(f"q 2 0 0 2 {r.randint(60, 120)} {r.randint(200, 260)} cm /Im1 Do Q")
    bot, _ = flow(para(2), _MARGIN, y - 320)
    parts.append(bot)
    page = "\n".join(parts).encode("latin-1")

    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
           f"{_PAGE_H}] /Resources << /Font << /F1 5 0 R >> "
           f"/XObject << /Fm1 6 0 R /Im1 8 0 R >> >> "
           f"/Contents 4 0 R >>").encode())
    w.add(f"<< /Length {len(page)} >>\nstream\n".encode() + page
          + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add((f"<< /Type /XObject /Subtype /Form /BBox [0 0 {_PAGE_W} "
           f"{_PAGE_H}] /Resources << /Font << /F1 5 0 R /F2 7 0 R >> "
           f"/XObject << /Fm2 9 0 R >> >> /Length {len(form1)} "
           f">>\nstream\n").encode() + form1 + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
          b"/Encoding /WinAnsiEncoding >>")
    imgdata = bytes(64)
    w.add((f"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
           f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
           f"/Length {len(imgdata)} >>\nstream\n").encode()
          + imgdata + b"\nendstream")
    w.add((f"<< /Type /XObject /Subtype /Form /BBox [0 0 {_PAGE_W} "
           f"{_PAGE_H}] /Length {len(form2)} >>\nstream\n").encode()
          + form2 + b"\nendstream")
    return w.build()


def _segment_objects(data: bytes) -> dict[int, bytes]:
    """Raw byte-scan object segmentation for the deterministic fixtures
    this module generates: ``{num: body}`` with stream payloads skipped
    so binary bytes can never masquerade as object headers."""
    import re as _re
    objs: dict[int, bytes] = {}
    pat = _re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
    pos = 0
    while True:
        m = pat.search(data, pos)
        if not m:
            break
        start = m.end()
        s_idx = data.find(b"stream", start)
        e_idx = data.find(b"endobj", start)
        if e_idx == -1:
            break
        if s_idx != -1 and s_idx < e_idx:
            es = data.find(b"endstream", s_idx)
            e_idx = data.find(b"endobj", es)
        objs[int(m.group(1))] = data[start:e_idx].strip()
        pos = e_idx + 6
    return objs


def _is_stream_body(body: bytes) -> bool:
    import re as _re
    return _re.search(rb">>\s*stream\r?\n", body) is not None


def repack_modern(data: bytes, *, compress: bool = True,
                  predictor: bool = True, split_index: bool = False,
                  junk_prefix: bytes = b"", hybrid: bool = False,
                  encrypt=None) -> bytes:
    """Repack a classic-xref synthetic PDF into PDF 1.5 "modern" file
    structure: every non-stream object moves into ONE FlateDecode
    ``/ObjStm`` container, stream objects stay direct (their payloads
    optionally Flate-compressed), and the cross-reference becomes an
    ``/XRef`` stream (optionally PNG Up-predictor-coded, optionally
    with a split ``/Index``).  Content is untouched, so extraction must
    be byte-identical to the classic twin.  ``junk_prefix`` prepends
    bytes before ``%PDF`` (offsets stay relative to the header — the
    parser must header-adjust).  ``hybrid`` emits a hybrid-reference
    file (ISO 32000-1 §7.5.8.4): a classic xref table at the end lists
    only the direct stream objects, its trailer's ``/XRefStm`` points
    at the companion stream carrying the type-2 entries — legacy-reader
    layout, Acrobat 6 style.  ``encrypt`` = ``(enc_fn, enc_dict,
    id_part)`` (the test_pdf_crypto material shape): every direct
    stream payload AND the ObjStm container are encrypted AFTER
    compression with the per-object key, the /XRef stream is never
    encrypted (§7.5.8.2), strings inside the ObjStm are NOT separately
    encrypted (§7.6.2 — container decryption covers them), and the
    /Encrypt dict is stored as a direct plain object."""
    import re as _re
    import zlib

    root_m = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if not root_m:
        raise ValueError("no /Root in source")
    root = int(root_m.group(1))

    objs = _segment_objects(data)
    is_stream = _is_stream_body

    enc_fn, enc_dict, id_part = encrypt if encrypt else (None, None, None)

    def _set_length(body: bytes, new_payload: bytes) -> bytes:
        m2 = _re.search(rb"stream\r?\n", body)
        lm = _re.search(rb"/Length\s+(\d+)", body)
        head = body[:m2.start()].replace(
            b"/Length " + lm.group(1),
            b"/Length %d" % len(new_payload), 1)
        return head + b"stream\n" + new_payload + b"\nendstream"

    def prep_stream(num: int, body: bytes) -> bytes:
        m2 = _re.search(rb"stream\r?\n", body)
        lm = _re.search(rb"/Length\s+(\d+)", body)
        if not m2 or not lm:
            return body
        payload = body[m2.end():m2.end() + int(lm.group(1))]
        if compress and b"/Filter" not in body:
            payload = zlib.compress(payload)
            body = body[:m2.start()].replace(
                b"/Length " + lm.group(1),
                b"/Length %d /Filter /FlateDecode" % len(payload), 1
            ) + b"stream\n" + payload + b"\nendstream"
        if enc_fn is not None:
            payload = enc_fn(num, 0, payload)
            body = _set_length(body, payload)
        return body

    plain = sorted(n for n, b in objs.items() if not is_stream(b))
    streams = sorted(n for n, b in objs.items() if is_stream(b))
    objstm_num = max(objs) + 1
    enc_num = objstm_num + 1 if enc_fn is not None else None
    xref_num = objstm_num + (2 if enc_fn is not None else 1)

    # ObjStm container: "<num> <offset> ..." header then the bodies.
    offs, parts, cur = [], [], 0
    for n in plain:
        body = objs[n]
        offs.append(f"{n} {cur}")
        parts.append(body + b"\n")
        cur += len(body) + 1
    header = (" ".join(offs) + "\n").encode()
    stm_payload = zlib.compress(header + b"".join(parts))
    if enc_fn is not None:
        stm_payload = enc_fn(objstm_num, 0, stm_payload)
    objstm_body = (
        f"<< /Type /ObjStm /N {len(plain)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(stm_payload)} >>\n"
        f"stream\n").encode() + stm_payload + b"\nendstream"

    out = bytearray(junk_prefix + b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    base = len(junk_prefix)  # stored offsets are header-relative
    positions: dict[int, int] = {}
    for n in streams:
        positions[n] = len(out) - base
        out += f"{n} 0 obj\n".encode() + prep_stream(n, objs[n]) \
            + b"\nendobj\n"
    positions[objstm_num] = len(out) - base
    out += f"{objstm_num} 0 obj\n".encode() + objstm_body + b"\nendobj\n"
    if enc_num is not None:
        positions[enc_num] = len(out) - base
        out += f"{enc_num} 0 obj\n".encode() + enc_dict + b"\nendobj\n"
    xref_pos = len(out) - base

    size = xref_num + 1
    wo = 3 if max(positions.values(), default=0) > 0xFFFF or \
        xref_pos > 0xFFFF else 2
    stm_index = {n: i for i, n in enumerate(plain)}
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 0xFFFF
        elif num in stm_index:
            t, f2, f3 = 2, objstm_num, stm_index[num]
        elif num in positions:
            t, f2, f3 = 1, positions[num], 0
        elif num == xref_num:
            t, f2, f3 = 1, xref_pos, 0
        else:
            t, f2, f3 = 0, 0, 0
        rows.append(t)
        rows += f2.to_bytes(wo, "big") + f3.to_bytes(2, "big")
    colw = 1 + wo + 2
    if predictor:
        # PNG Up filter: 0x02 tag + (row - previous row) per row.
        prev = bytes(colw)
        enc = bytearray()
        for i in range(0, len(rows), colw):
            row = bytes(rows[i:i + colw])
            enc.append(2)
            enc += bytes((row[j] - prev[j]) & 0xFF for j in range(colw))
            prev = row
        xref_payload = zlib.compress(bytes(enc))
        parms = (f" /DecodeParms << /Predictor 12 /Colors 1 "
                 f"/BitsPerComponent 8 /Columns {colw} >>")
    else:
        xref_payload = zlib.compress(bytes(rows))
        parms = ""
    if split_index:
        k = max(1, size // 2)
        index = f" /Index [0 {k} {k} {size - k}]"
    else:
        index = ""
    extra = ""
    if enc_num is not None:
        extra = (f" /Encrypt {enc_num} 0 R "
                 + id_part.decode("latin-1"))
    out += (f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} "
            f"/W [1 {wo} 2] /Root {root} 0 R{extra} /Filter /FlateDecode"
            f"{parms}{index} /Length {len(xref_payload)} >>\n"
            f"stream\n").encode() + xref_payload + b"\nendstream\nendobj\n"
    if hybrid:
        # Classic table at the end: obj 0 free + the DIRECT objects
        # only; compressed objects are absent (legacy readers skip
        # them), the trailer's /XRefStm supplies their type-2 entries.
        classic_pos = len(out) - base
        direct = {0: None}
        for n in positions:
            direct[n] = positions[n]
        direct[xref_num] = xref_pos
        table = bytearray(b"xref\n")
        nums = sorted(direct)
        i = 0
        while i < len(nums):
            j = i
            while j + 1 < len(nums) and nums[j + 1] == nums[j] + 1:
                j += 1
            table += b"%d %d\n" % (nums[i], j - i + 1)
            for k in range(i, j + 1):
                n = nums[k]
                if n == 0:
                    table += b"0000000000 65535 f \n"
                else:
                    table += b"%010d 00000 n \n" % direct[n]
            i = j + 1
        out += bytes(table)
        out += (f"trailer\n<< /Size {size} /Root {root} 0 R "
                f"/XRefStm {xref_pos} >>\n"
                f"startxref\n{classic_pos}\n%%EOF\n").encode()
    else:
        out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def linearize(data: bytes) -> bytes:
    """Rearrange a classic-xref synthetic PDF into the linearized
    ("fast web view") file TOPOLOGY of ISO 32000-1 Annex F: a
    /Linearized parameter dict right after the header, a first-page
    xref table near the front whose trailer /Prev points to the main
    xref table at the end, a dummy ``startxref 0`` terminating the
    front section, and the file-end ``startxref`` pointing BACK at the
    front table.  A parser that grabs the FIRST startxref reads
    garbage; the reference uses the LAST (findXrefOffset,
    parsePdfUtils.js:22 byteLastIndexOf).  Hint streams are not
    emitted — neither engine reads them.  Content untouched, so
    extraction must be byte-identical to the source."""
    import re as _re

    root_m = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if not root_m:
        raise ValueError("no /Root in source")
    root = int(root_m.group(1))

    objs = _segment_objects(data)
    lin_num = max(objs) + 1
    size = lin_num + 1
    # Front group = odd object numbers (stands in for "first-page
    # objects"), tail group = even; both xref sections carry real
    # entries so the /Prev chain is genuinely exercised.
    front = sorted(n for n in objs if n % 2 == 1)
    tail = sorted(n for n in objs if n % 2 == 0)

    def table_for(nums: list[int], pos_of: dict[int, int],
                  free0: bool) -> bytes:
        t = bytearray(b"xref\n")
        ns = ([0] if free0 else []) + nums
        i = 0
        while i < len(ns):
            j = i
            while j + 1 < len(ns) and ns[j + 1] == ns[j] + 1:
                j += 1
            t += b"%d %d\n" % (ns[i], j - i + 1)
            for k in range(i, j + 1):
                if ns[k] == 0:
                    t += b"0000000000 65535 f \n"
                else:
                    t += b"%010d 00000 n \n" % pos_of[ns[k]]
            i = j + 1
        return bytes(t)

    # Two-pass fixpoint: offsets feed the tables whose width is
    # offset-dependent only through the startxref digits and /Prev
    # digits, so a second pass always stabilizes on these fixtures.
    prev_guess = 0
    for _ in range(4):
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        pos: dict[int, int] = {}
        pos[lin_num] = len(out)
        out += (f"{lin_num} 0 obj\n<< /Linearized 1 /L 0 /O {root} "
                f"/E 0 /N 1 /T {prev_guess} >>\nendobj\n").encode()
        for n in front:
            pos[n] = len(out)
            out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
        front_xref = len(out)
        out += table_for(front + [lin_num], pos, free0=False)
        out += (f"trailer\n<< /Size {size} /Root {root} 0 R "
                f"/Prev {prev_guess} >>\nstartxref\n0\n%%EOF\n").encode()
        for n in tail:
            pos[n] = len(out)
            out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
        main_xref = len(out)
        if main_xref == prev_guess:
            out += table_for(tail, pos, free0=True)
            out += (f"trailer\n<< /Size {size} >>\n"
                    f"startxref\n{front_xref}\n%%EOF\n").encode()
            return bytes(out)
        prev_guess = main_xref
    raise RuntimeError("linearize layout did not stabilize")
