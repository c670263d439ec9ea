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
