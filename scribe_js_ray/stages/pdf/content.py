"""Content-stream interpretation → positioned glyphs.

Implements the text-showing subset of the reference's
``executeTextOperators`` (/root/reference/js/pdf/parsePdfDoc.js:1386-1970)
and its content-stream lexer (contentStream.js:47-373), from scratch:

- graphics state: q/Q stack, cm CTM composition
- text state: BT/ET, Tf/Tc/Tw/TL/Tz/Ts/Tm/Td/TD/T*, Tj/TJ/'/" (Tr tracked)
- fonts: width tables + simple-font byte decoding (latin-1 / Differences)

Output: a flat list of PositionedChar tuples in stream order (the order
the line-cutting rules depend on — SURVEY §2.9).
"""

from __future__ import annotations

import math
import re

from .objects import Lexer, Name, Ref, StreamObj


class PositionedChar:
    """One placed glyph (parsePdfDoc.js:1350-1372 PositionedChar analog).

    ``orientation`` is the quarter-turn of the advance direction on
    screen (0 rightward, 1 downward, 2 leftward, 3 upward);
    ``dir_x``/``dir_y`` are the unit advance direction in SCREEN coords
    (y grows downward) for rotation-aware line grouping and baseline
    slope.  ``family``/``smallcaps`` come from the font name."""

    __slots__ = ("text", "x", "y", "width", "font_size", "font", "bold",
                 "italic", "invisible", "orientation", "dir_x", "dir_y",
                 "family", "smallcaps", "artifact", "mcid", "alpha",
                 "color", "asc", "desc")

    def __init__(self, text, x, y, width, font_size, font, bold, italic,
                 invisible, orientation=0, dir_x=1.0, dir_y=0.0,
                 family=None, smallcaps=False, artifact=False, mcid=None,
                 alpha=1.0, color=None, asc=0.8, desc=0.2):
        self.text = text
        self.x = x
        self.y = y
        self.width = width
        self.font_size = font_size
        self.font = font
        self.bold = bold
        self.italic = italic
        self.invisible = invisible
        self.orientation = orientation
        self.dir_x = dir_x
        self.dir_y = dir_y
        self.family = family if family is not None else font
        self.smallcaps = smallcaps
        self.artifact = artifact
        self.mcid = mcid
        # Non-stroking alpha (ExtGState /ca via `gs`) and raw fill color
        # (1/3/4 components, or resolved 0-1 RGB for tint spaces) at
        # show time — parsePdfDoc.js:1784-1785 char tagging.  alpha == 0
        # suppresses the word's native-text (editable) entry and sets
        # style.opacity; color feeds style.color + underline matching.
        self.alpha = alpha
        self.color = color
        # Em-fractions above/below the baseline from the FONT's metrics
        # (parsePdfDoc char bbox: y - fontInfo.ascent/1000*size,
        # y - fontInfo.descent/1000*size; defaults 800/-200,
        # parsePdfFonts.js:1444-1445).  desc is stored POSITIVE.
        self.asc = asc
        self.desc = desc


def _mat_mul(a, b):
    """Row-vector convention: result = a × b (both 6-tuples)."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")

_WS = b"\x00\t\n\x0c\r "


def _skip_inline_image(data: bytes, pos: int) -> int:
    """Position after the EI of a BI...ID...EI inline image starting just
    past BI.  A bare ``find(b"EI")`` false-matches inside binary sample
    data, so mirror the reference tokenizer's two-stage scan
    (contentStream.js:264-331): for unfiltered images compute the exact
    data length from /W //H //BPC //CS (abbreviated or full names) and
    require EI at that offset; otherwise scan for a whitespace-preceded
    EI followed by whitespace///end."""
    n = len(data)
    # dict runs until an ID bounded by whitespace on both sides
    i = pos
    id_pos = None
    while i + 1 < n:
        if data[i:i + 2] == b"ID" and (i == 0 or data[i - 1] in _WS) \
                and (i + 2 >= n or data[i + 2] in _WS):
            id_pos = i
            break
        i += 1
    if id_pos is None:
        return n
    dict_text = data[pos:id_pos]
    data_start = id_pos + 3  # ID + one whitespace byte
    if not re.search(rb"/(?:F|Filter)\b", dict_text):
        wm = re.search(rb"/(?:W|Width)\s+(\d+)", dict_text)
        hm = re.search(rb"/(?:H|Height)\s+(\d+)", dict_text)
        bm = re.search(rb"/(?:BPC|BitsPerComponent)\s+(\d+)", dict_text)
        if wm and hm:
            w, h = int(wm.group(1)), int(hm.group(1))
            bpc = int(bm.group(1)) if bm else 8
            if re.search(rb"/CS\s*/(?:RGB|DeviceRGB|CalRGB)\b", dict_text):
                n_comp = 3
            elif re.search(rb"/CS\s*/(?:CMYK|DeviceCMYK)\b", dict_text):
                n_comp = 4
            elif re.search(rb"/CS\s*/(?:G|DeviceGray|CalGray)\b",
                           dict_text) \
                    or re.search(rb"/(?:IM|ImageMask)\s+true\b",
                                 dict_text):
                n_comp = 1
            else:
                n_comp = 0  # Indexed / named CS — fall back to the scan
            if n_comp:
                end = data_start + ((w * n_comp * bpc + 7) // 8) * h
                if data[end:end + 2] == b"EI" and \
                        (end + 2 >= n or data[end + 2] in _WS + b"/"):
                    return end + 2
    i = data_start
    while i + 1 < n:
        if data[i:i + 2] == b"EI" and i > data_start \
                and data[i - 1] in _WS \
                and (i + 2 >= n or data[i + 2] in _WS + b"/"):
            return i + 2
        i += 1
    return n


def tokenize_content(data: bytes):
    """Yield (operands, operator) pairs from a content stream."""
    lex = Lexer(data, 0)
    operands = []
    n = len(data)
    while lex.pos < n:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if c in b"/(<[+-.0123456789":
            operands.append(lex.parse_object())
            continue
        m = _OP_RE.match(data, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group(0).decode("latin-1")
        lex.pos = m.end()
        if op == "BI":
            lex.pos = _skip_inline_image(data, lex.pos)
            operands = []
            # Emitted so the interpreter can score the placement like a
            # Do-image (parsePdfDoc.js:680 treats inlineImage tokens as
            # image draws for largestImageFrac).
            yield [], "INLINE_IMG"
            continue
        yield operands, op
        operands = []


class SimpleFont:
    """A font: code → unicode + widths.  ``two_byte`` marks Type0/CID
    fonts with Identity-H/V encodings (2-byte codes, widths from the
    descendant CIDFont's /W array with /DW default — parsePdfFonts.js
    Type0 handling analog)."""

    __slots__ = ("name", "widths_table", "first_char", "widths_arr",
                 "to_unicode", "differences", "bold", "italic",
                 "two_byte", "cid_widths", "default_width",
                 "family", "smallcaps", "base_encoding",
                 "embedded_encoding", "to_unicode_broken", "is_type3",
                 "embedded_bytes", "widths_map", "ascent", "descent")

    def __init__(self, name, widths_table, first_char=None, widths_arr=None,
                 to_unicode=None, differences=None, two_byte=False,
                 cid_widths=None, default_width=1000.0, base_encoding=None,
                 embedded_encoding=None):
        self.name = name or "Helvetica"
        self.widths_table = widths_table
        self.first_char = first_char
        self.widths_arr = widths_arr
        self.to_unicode = to_unicode
        self.differences = differences
        self.two_byte = two_byte
        self.cid_widths = cid_widths
        self.default_width = default_width
        # Name-derived style flags (parsePdfFonts.js:844-849) over the
        # subset-prefix-stripped base name.
        base = re.sub(r"^[A-Z]{6}\+", "", self.name)
        self.bold = bool(re.search(r"bold|black", base, re.I))
        self.italic = bool(re.search(
            r"italic|oblique|-\w*ital|-it$", base, re.I))
        self.smallcaps = bool(re.search(
            r"(small\W?cap)|(sc(?=[-+]|$))|(caps(?=[-+]|$))", base, re.I))
        # familyName = base minus "-Style" / ",Style" suffixes
        # (parsePdfFonts.js:849 cleanFamilyName analog).
        self.family = re.sub(r",.*", "", re.sub(r"-.+", "", base)) or base
        if base_encoding is None and not two_byte:
            from .encodings import builtin_encoding_for_font
            base_encoding = builtin_encoding_for_font(base)
        self.base_encoding = base_encoding
        self.embedded_encoding = embedded_encoding
        # Raw /FontFile2 TrueType program, kept so the PDF export can
        # re-embed the document's own glyph outlines (the rawFontBytes
        # path of writePdfFonts.js:292 createEmbeddedFontType0).
        self.embedded_bytes = None
        from .fonts_embedded import to_unicode_is_broken
        self.to_unicode_broken = to_unicode_is_broken(to_unicode)
        self.is_type3 = False
        # Registry defaults (parsePdfFonts.js:1444-1445); build_font
        # overrides from the FontDescriptor / Type3 FontBBox.
        self.ascent = 800.0
        self.descent = -200.0
        # charCode -> advance map for simple fonts without a /Widths
        # array: the standard-font fill + remaps of parsePdfFonts.js
        # 1468-1540 (built by build_font; None keeps the legacy
        # char-keyed fallback).
        self.widths_map = None

    def decode_byte(self, b: int) -> str:
        if self.differences and b in self.differences:
            ch = self.differences[b]
            # A /Differences glyph name that failed to resolve (subset
            # names like "g42" → U+FFFD) must not shadow a valid ToUnicode
            # entry: the reference prefers toUnicodeValue || encodingValue
            # (parsePdfDoc.js:1863-1866). Fall through to the rest of the
            # chain only when the Differences resolution is unusable.
            if ch != "�":
                return ch
        # A producer-garbage ToUnicode (PUA/U+FFFD-heavy) loses to the
        # embedded font program's own glyph names (M5 broken-ToUnicode).
        if self.to_unicode and not self.to_unicode_broken \
                and b in self.to_unicode:
            return self.to_unicode[b]
        # base_encoding is the merged effective table: explicit /Encoding
        # entries over embedded-program names over built-in guesses
        # (ISO 32000-1 §9.6.6 precedence; merge happens in build_font).
        if self.embedded_encoding is not None:
            ch = self.embedded_encoding.get(b)
            if ch is not None:
                return ch
        if self.base_encoding is not None:
            ch = self.base_encoding.get(b)
            if ch is not None:
                return ch
        if self.to_unicode and b in self.to_unicode:
            return self.to_unicode[b]
        if self.two_byte:
            # Identity mapping fallback: CID == unicode is wrong in
            # general, but deterministic; real text needs the ToUnicode.
            return chr(b) if 32 <= b < 0xD800 else "�"
        try:
            return bytes([b]).decode("latin-1")
        except Exception:
            return "�"

    def width_of(self, b: int, ch: str) -> float:
        """Advance in 1/1000 em — font.widths.get(widthKey) ?? defaultWidth
        (parsePdfDoc.js:1893-1894; widthKey is the charCode for simple
        fonts)."""
        if self.two_byte:
            if self.cid_widths is not None and b in self.cid_widths:
                return self.cid_widths[b]
            return self.default_width
        if self.widths_arr is not None and self.first_char is not None:
            idx = b - self.first_char
            if 0 <= idx < len(self.widths_arr):
                # Zero entries stay zero: the reference keeps declared
                # 0-advances (parsePdfFonts.js:1457-1459 stores them;
                # the ?? fallback only fires on a MISSING code).
                return self.widths_arr[idx]
            return self.default_width
        if self.is_type3:
            # A Type3 char outside the encoding has no glyph: it
            # advances nothing, not an average width
            # (parsePdfFonts.js:2205 defaultWidth = 0).
            return self.default_width
        if self.widths_map is not None:
            w = self.widths_map.get(b)
            return w if w is not None else self.default_width
        from .widths import char_width
        return char_width(self.widths_table, ch)


def parse_tounicode_cmap(data: bytes) -> dict:
    """Minimal ToUnicode CMap: bfchar + bfrange entries."""
    out = {}
    text = data.decode("latin-1", "replace")
    for m in re.finditer(r"beginbfchar(.*?)endbfchar", text, re.S):
        for e in re.finditer(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                             m.group(1)):
            src = int(e.group(1), 16)
            dst_hex = e.group(2)
            dst = "".join(chr(int(dst_hex[i:i + 4], 16))
                          for i in range(0, len(dst_hex), 4))
            out[src] = dst
    for m in re.finditer(r"beginbfrange(.*?)endbfrange", text, re.S):
        for e in re.finditer(
                r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                m.group(1)):
            lo, hi, dst = (int(e.group(i), 16) for i in (1, 2, 3))
            for k in range(lo, hi + 1):
                out[k] = chr(dst + (k - lo))
    return out


# CharProc metrics: "wx wy d0" / "wx wy llx lly urx ury d1" lead the
# glyph stream (parsePdfFonts.js:544-570 parseGlyphStream).
_D1_RE = re.compile(
    r"([\d.+-]+)\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+"
    r"\s+d1(?![0-9A-Za-z])")
_D0_RE = re.compile(r"([\d.+-]+)\s+[\d.+-]+\s+d0(?![0-9A-Za-z])")
# Operators that provably leave no marks (parsePdfFonts.js:391-402) —
# a CharProc of only these draws nothing, so its glyph maps to a space.
_NON_MARKING_OPS = frozenset(
    "d0 d1 d q Q cm gs w J j M ri i g G rg RG k K cs CS sc SC scn SCN "
    "W W* n BMC BDC EMC MP DP BX EX".split())
_TEX_GLYPH_RE = re.compile(r"^a(\d+)$")
_OPS_RE = re.compile(r"[A-Za-z*]+[0-9]?")


def _build_type3_font(pdf, d) -> SimpleFont:
    """Type3 fonts: glyphs are content-stream CharProcs scaled by
    /FontMatrix (parsePdfFonts.js:409-540 parseType3Font + the
    augmentation at :2179-2226).  Extraction surface only — advances
    come from each CharProc's d0/d1 operator (× FontMatrix[0] × 1000 to
    reach 1/1000-em space), unresolved glyph names fall back to PUA
    placeholders (U+E000+code, so charCode 32 is never mistaken for a
    space), and provably-non-marking CharProcs map to ' '.  TeX names
    like /a192 carry the codepoint in the digits (:1253-1260)."""
    from .glyphnames import glyph_to_unicode
    fm = pdf.resolve(d.get("FontMatrix"))
    fm0 = 0.001
    if isinstance(fm, list) and fm:
        try:
            fm0 = float(pdf.resolve(fm[0]))
        except (TypeError, ValueError):
            fm0 = 0.001

    differences: dict[int, str] = {}
    code_names: dict[int, str] = {}
    enc = pdf.resolve(d.get("Encoding"))
    if isinstance(enc, dict) and "Differences" in enc:
        code = 0
        for item in pdf.resolve(enc["Differences"]) or []:
            item = pdf.resolve(item)
            if isinstance(item, (int, float)):
                code = int(item)
            elif isinstance(item, Name):
                name = str(item)
                code_names[code] = name
                ch = glyph_to_unicode(name)
                if ch == "�":
                    tex = _TEX_GLYPH_RE.match(name)
                    if tex and 0 < int(tex.group(1)) <= 0xFFFF:
                        ch = chr(int(tex.group(1)))
                differences[code] = ch
                code += 1

    to_unicode = None
    if "ToUnicode" in d:
        try:
            to_unicode = parse_tounicode_cmap(pdf.stream_bytes(d["ToUnicode"]))
        except Exception:
            to_unicode = None
    to_unicode = to_unicode or {}

    # Per-spec the /Widths values are glyph-space (× FontMatrix); the
    # CharProc d0/d1 advance overrides them per encoded glyph, exactly
    # like the reference (:2187).
    first_char = pdf.resolve(d.get("FirstChar"))
    widths = pdf.resolve(d.get("Widths"))
    widths_arr = [float(pdf.resolve(w) or 0) * fm0 * 1000.0
                  for w in widths] if isinstance(widths, list) else None

    charprocs = pdf.resolve(d.get("CharProcs"))
    if isinstance(charprocs, dict):
        fc = int(first_char) if isinstance(first_char, (int, float)) else 0
        for cc, gname in code_names.items():
            if gname not in charprocs:
                continue
            try:
                stream = pdf.stream_bytes(charprocs[gname]) \
                    .decode("latin-1", "replace")
            except Exception:
                # Unreadable CharProc: not provably empty; space-map the
                # text (reference :478-481 keeps the glyph, text falls
                # back) but leave the width alone.
                if cc not in to_unicode and \
                        differences.get(cc, "�") == "�":
                    to_unicode[cc] = " "
                continue
            m = _D1_RE.search(stream) or _D0_RE.search(stream)
            if m:
                try:
                    wx = float(m.group(1)) * fm0 * 1000.0
                except ValueError:
                    wx = 0.0
                if wx > 0:
                    if widths_arr is None:
                        widths_arr = []
                        fc = 0
                    idx = cc - fc
                    if idx >= 0:
                        while len(widths_arr) <= idx:
                            widths_arr.append(0.0)
                        widths_arr[idx] = wx
            if cc not in to_unicode and \
                    differences.get(cc, "�") == "�":
                ops = set(_OPS_RE.findall(re.sub(r"%[^\r\n]*", "", stream)))
                if ops and ops <= _NON_MARKING_OPS:
                    to_unicode[cc] = " "
                else:
                    # PUA placeholder: scores as non-printable in page
                    # stats, never as a space/letter.
                    to_unicode[cc] = chr(0xE000 + cc)
        first_char_out = fc if widths_arr is not None else None
    else:
        first_char_out = int(first_char) \
            if isinstance(first_char, (int, float)) else None

    name = str(pdf.resolve(d.get("BaseFont"))
               or pdf.resolve(d.get("Name")) or "Unknown")
    from .widths import base14_widths
    font = SimpleFont(
        name, base14_widths("Helvetica"),
        first_char=first_char_out, widths_arr=widths_arr,
        to_unicode=to_unicode or None, differences=differences or None,
        default_width=0.0)
    font.is_type3 = True
    # FontDescriptor override first (nonzero rule, :1962-1963 — Type3
    # only skips the FontFile extraction, not the metrics), then the
    # FontBBox×FontMatrix[3] override when the em-height is sane
    # ("some Type3 fonts carry a placeholder FontBBox",
    # parsePdfFonts.js:2211-2219).
    fdesc = pdf.resolve(d.get("FontDescriptor"))
    if isinstance(fdesc, dict):
        av = pdf.resolve(fdesc.get("Ascent"))
        if isinstance(av, (int, float)) and av != 0:
            font.ascent = float(av)
        dv = pdf.resolve(fdesc.get("Descent"))
        if isinstance(dv, (int, float)) and dv != 0:
            font.descent = float(dv)
    fb = pdf.resolve(d.get("FontBBox"))
    fm3 = None
    if isinstance(fm, list) and len(fm) >= 4:
        try:
            fm3 = float(pdf.resolve(fm[3]))
        except (TypeError, ValueError):
            fm3 = None
    if isinstance(fb, list) and len(fb) >= 4 and fm3 is not None \
            and fm3 == fm3 and not math.isinf(fm3):
        try:
            fb1 = float(pdf.resolve(fb[1]))
            fb3 = float(pdf.resolve(fb[3]))
            em_h = abs((fb3 - fb1) * fm3)
            if em_h == em_h and 0.2 < em_h < 3:
                font.ascent = fb3 * fm3 * 1000.0
                font.descent = fb1 * fm3 * 1000.0
        except (TypeError, ValueError):
            pass
    # The PUA placeholders above are INTENTIONAL (one per unresolvable
    # CharProc), not a producer-garbage ToUnicode: without this a
    # Symbol-/Dingbats-named Type3 font would trip to_unicode_is_broken
    # and let the builtin symbolic base encoding decode unmapped glyphs
    # as printable Greek/dingbat letters.
    font.to_unicode_broken = False
    return font


def build_font(pdf, font_dict) -> SimpleFont:
    from .widths import base14_widths
    d = pdf.resolve(font_dict)
    if not isinstance(d, dict):
        return SimpleFont("Helvetica", base14_widths("Helvetica"))
    subtype = str(d.get("Subtype", ""))
    if subtype == "Type3":
        return _build_type3_font(pdf, d)
    base = str(pdf.resolve(d.get("BaseFont")) or "Helvetica")
    if subtype == "Type0":
        # CID fonts: 2-byte Identity-H/V codes, ToUnicode for text,
        # widths from the descendant CIDFont /W + /DW.
        tu = None
        if "ToUnicode" in d:
            try:
                tu = parse_tounicode_cmap(pdf.stream_bytes(d["ToUnicode"]))
            except Exception:
                tu = None
        enc_name = str(pdf.resolve(d.get("Encoding")) or "")
        # Identity-H/V, plus predefined Unicode CMaps where the 2-byte
        # charCode IS the BMP codepoint (parsePdfFonts.js:2230-2243
        # unicodeCMap) — decode_byte's identity fallback is then exact.
        two_byte = enc_name.startswith("Identity") or \
            bool(re.search(r"UTF16|UCS2", enc_name))
        cid_widths = None
        default_width = 1000.0
        desc = pdf.resolve(d.get("DescendantFonts"))
        if isinstance(desc, list) and desc:
            cidfont = pdf.resolve(desc[0])
            if isinstance(cidfont, dict):
                dw = pdf.resolve(cidfont.get("DW"))
                if isinstance(dw, (int, float)):
                    default_width = float(dw)
                w_arr = pdf.resolve(cidfont.get("W"))
                if isinstance(w_arr, list):
                    cid_widths = {}
                    i = 0
                    items = [pdf.resolve(x) for x in w_arr]
                    while i < len(items):
                        c = items[i]
                        nxt = items[i + 1] if i + 1 < len(items) else None
                        if isinstance(nxt, list):
                            # c [w1 w2 ...]
                            for j, w in enumerate(nxt):
                                w = pdf.resolve(w)
                                if isinstance(w, (int, float)):
                                    cid_widths[int(c) + j] = float(w)
                            i += 2
                        elif isinstance(nxt, (int, float)) and \
                                i + 2 < len(items):
                            # c1 c2 w
                            w = items[i + 2]
                            if isinstance(w, (int, float)):
                                for cid in range(int(c), int(nxt) + 1):
                                    cid_widths[cid] = float(w)
                            i += 3
                        else:
                            break
        font = SimpleFont(base, base14_widths(base), to_unicode=tu,
                          two_byte=two_byte, cid_widths=cid_widths,
                          default_width=default_width)
        # Descendant CIDFontType2's /FontFile2 — kept for re-embedding.
        if isinstance(desc, list) and desc:
            cidfont = pdf.resolve(desc[0])
            if isinstance(cidfont, dict):
                fd = pdf.resolve(cidfont.get("FontDescriptor"))
                if isinstance(fd, dict):
                    if "FontFile2" in fd:
                        try:
                            font.embedded_bytes = pdf.stream_bytes(
                                fd["FontFile2"])
                        except Exception:
                            pass
                    # CID rule: a PRESENT /Ascent //Descent key applies
                    # even when 0 (parsePdfFonts.js:1639-1640
                    # `if (ascentVal || /\/Ascent\s/.test(fdText))`).
                    for key, attr in (("Ascent", "ascent"),
                                      ("Descent", "descent")):
                        v = pdf.resolve(fd.get(key))
                        v = float(v) if isinstance(v, (int, float)) else 0.0
                        if v or key in fd:
                            setattr(font, attr, v)
        return font
    first_char = pdf.resolve(d.get("FirstChar"))
    widths = pdf.resolve(d.get("Widths"))
    widths_arr = [float(pdf.resolve(w) or 0) for w in widths] \
        if isinstance(widths, list) else None
    to_unicode = None
    if "ToUnicode" in d:
        try:
            to_unicode = parse_tounicode_cmap(pdf.stream_bytes(d["ToUnicode"]))
        except Exception:
            to_unicode = None
    differences = None
    differences_names = {}
    base_encoding = None
    enc = pdf.resolve(d.get("Encoding"))
    from .encodings import encoding_by_name
    if isinstance(enc, Name) or isinstance(enc, str):
        base_encoding = encoding_by_name(str(enc))
    elif isinstance(enc, dict):
        be = pdf.resolve(enc.get("BaseEncoding"))
        if be is not None:
            base_encoding = encoding_by_name(str(be))
        if "Differences" in enc:
            differences = {}
            differences_names = {}
            code = 0
            from .glyphnames import glyph_to_unicode
            for item in pdf.resolve(enc["Differences"]) or []:
                item = pdf.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, Name):
                    differences[code] = glyph_to_unicode(str(item))
                    differences_names[code] = str(item)
                    code += 1
    # Embedded font program → code-to-unicode via its own glyph names;
    # the recovery path for subset fonts without (or with broken)
    # ToUnicode (M5; reference parsePdfFonts.js:695 + font-parser).
    embedded = None
    embedded_bytes = None
    desc = pdf.resolve(d.get("FontDescriptor"))
    if isinstance(desc, dict):
        from .fonts_embedded import parse_cff_encoding, parse_type1_encoding
        try:
            if "FontFile3" in desc:
                embedded = parse_cff_encoding(
                    pdf.stream_bytes(desc["FontFile3"]))
            elif "FontFile" in desc:
                embedded = parse_type1_encoding(
                    pdf.stream_bytes(desc["FontFile"]))
            elif "FontFile2" in desc:
                from .fonts_embedded import parse_truetype_encoding
                embedded_bytes = pdf.stream_bytes(desc["FontFile2"])
                embedded = parse_truetype_encoding(embedded_bytes)
        except Exception:
            embedded = None
    # Precedence merge (ISO 32000-1 §9.6.6): explicit /Encoding entries
    # override the embedded program's built-in names, which override
    # nothing-at-all; the merged table feeds decode_byte.
    if embedded and base_encoding:
        embedded = {**embedded, **base_encoding}
        base_encoding = None

    # --- advance-width assembly (parsePdfFonts.js:1440-1541 standard
    # fill + remaps, 1986-1990 MissingWidth, 2286-2305 sanity clamp) ---
    first_char_out = int(first_char) \
        if isinstance(first_char, (int, float)) else None
    default_width = 1000.0
    widths_map = None
    if widths_arr is not None and not widths_arr:
        # An empty /Widths array falls through to the standard fill
        # exactly like a missing one (widths.size === 0 gate).
        widths_arr = None
    if widths_arr is not None:
        if first_char_out is None:
            # /FirstChar is required by the spec but some generators omit
            # it while supplying /Widths + /LastChar
            # (parsePdfFonts.js:1452-1456).
            last_char = pdf.resolve(d.get("LastChar"))
            first_char_out = max(0, int(last_char) - len(widths_arr) + 1) \
                if isinstance(last_char, (int, float)) else 0
        if widths_arr:
            default_width = sum(widths_arr) / len(widths_arr)
    else:
        from .widths import (std_widths_by_code, standard_ligature_width,
                             dingbats_glyph_width)
        std, avg = std_widths_by_code(base)
        widths_map = dict(std) if std is not None else {}
        if avg is not None:
            default_width = avg
        if std is not None:
            from .encodings import WIN_ANSI, MAC_ROMAN

            def _uni_to_width():
                out = {}
                for code in range(32, 256):
                    w = widths_map.get(code)
                    if w is not None:
                        wch = WIN_ANSI.get(code)
                        if wch:
                            out[wch] = w
                return out

            # /Encoding /MacRomanEncoding remaps each high charCode's
            # width to that of its MacRoman glyph
            # (parsePdfFonts.js:1475-1494).
            if isinstance(enc, (Name, str)) \
                    and "MacRomanEncoding" in str(enc) and widths_map:
                uni_w = _uni_to_width()
                for code in range(128, 256):
                    mc = MAC_ROMAN.get(code)
                    if mc:
                        w = uni_w.get(mc)
                        if w is not None:
                            widths_map[code] = w
                        else:
                            widths_map.pop(code, None)
            # /Differences remaps each code's width to its mapped
            # glyph's WinAnsi width (parsePdfFonts.js:1496-1512).
            if differences and widths_map:
                uni_w = _uni_to_width()
                for code, uni in differences.items():
                    if uni:
                        w = uni_w.get(uni[0])
                        if w is not None:
                            widths_map[code] = w
            # fi/fl ligature advances are absent from WinAnsi coding, so
            # any encoding entry resolving to the precomposed ligature
            # gets the AFM ligature width (parsePdfFonts.js:1514-1521).
            _LIG = {"ﬁ": "fi", "ﬂ": "fl"}
            for src in (base_encoding, embedded):
                if not src:
                    continue
                for code, uni in src.items():
                    g = _LIG.get(uni)
                    if g:
                        w = standard_ligature_width(base, g)
                        if w is not None:
                            widths_map[code] = w
            for code, gname in differences_names.items():
                if gname in ("fi", "fl"):
                    w = standard_ligature_width(base, gname)
                    if w is not None:
                        widths_map[code] = w
        # Dingbats /Differences typically remap codes below 32, which the
        # 32-plus standard fill leaves without widths
        # (parsePdfFonts.js:1524-1536).
        if re.search(r"ZapfDingbats", base, re.I) and differences_names:
            for code, gname in differences_names.items():
                if code not in widths_map:
                    w = dingbats_glyph_width(gname)
                    if w is not None:
                        widths_map[code] = w
            if widths_map and default_width == 1000.0:
                default_width = sum(widths_map.values()) / len(widths_map)

    # MissingWidth from the FontDescriptor becomes defaultWidth for
    # uncovered charCodes — spec default 0 (parsePdfFonts.js:1986-1990).
    if isinstance(desc, dict) and (widths_arr or widths_map):
        mw = pdf.resolve(desc.get("MissingWidth"))
        default_width = float(mw) if isinstance(mw, (int, float)) and mw \
            else 0.0

    # Sanity clamp: packed/garbage width values poison bbox math
    # (parsePdfFonts.js:2286-2305; Type3 exempt).
    _SANE_MAX = 4000
    vals = widths_arr if widths_arr is not None else \
        list(widths_map.values()) if widths_map else []
    sane = [w for w in vals
            if isinstance(w, (int, float)) and w == w and 0 <= w <= _SANE_MAX]
    if len(sane) != len(vals):
        from ...functions.stats import js_round
        fallback = js_round(sum(sane) / len(sane)) if sane else 1000
        if widths_arr is not None:
            widths_arr = [w if (w == w and 0 <= w <= _SANE_MAX) else fallback
                          for w in widths_arr]
        elif widths_map:
            widths_map = {c: (w if (w == w and 0 <= w <= _SANE_MAX)
                              else fallback)
                          for c, w in widths_map.items()}
        if not (default_width == default_width
                and 0 <= default_width <= _SANE_MAX):
            default_width = fallback

    font = SimpleFont(
        base, base14_widths(base),
        first_char=first_char_out,
        widths_arr=widths_arr, to_unicode=to_unicode, differences=differences,
        base_encoding=base_encoding, embedded_encoding=embedded,
        default_width=default_width)
    font.widths_map = widths_map
    font.embedded_bytes = embedded_bytes
    # FontDescriptor /Ascent //Descent override the 800/-200 registry
    # defaults — simple-font rule: nonzero only (parsePdfFonts.js
    # :1962-1963 `if (ascentVal !== 0)`).
    if isinstance(desc, dict):
        av = pdf.resolve(desc.get("Ascent"))
        if isinstance(av, (int, float)) and av != 0:
            font.ascent = float(av)
        dv = pdf.resolve(desc.get("Descent"))
        if isinstance(dv, (int, float)) and dv != 0:
            font.descent = float(dv)
    return font


def parse_ext_gstates(pdf, resources) -> dict:
    """/ExtGState → {name: fill_alpha-or-None} from a page or form
    Resources dict (parsePdfDoc.js:77-132 parseFillAlphaExtGStates;
    only /ca — the non-stroking alpha — is read)."""
    out = {}
    if not isinstance(resources, dict):
        return out
    gs_dict = pdf.resolve(resources.get("ExtGState"))
    if not isinstance(gs_dict, dict):
        return out
    for name, body in gs_dict.items():
        body = pdf.resolve(body)
        if isinstance(body, StreamObj):
            body = body.dict
        if not isinstance(body, dict):
            continue
        ca = pdf.resolve(body.get("ca"))
        out[str(name)] = float(ca) if isinstance(ca, (int, float)) else None
    return out


def parse_text_color_spaces(pdf, resources) -> dict:
    """/ColorSpace Separation/DeviceN entries → {name: parsed tint CS}
    (parsePdfDoc.js:273-324 parseTextColorSpaces); these are the spaces
    a text fill can select via ``cs`` + ``scn``."""
    out = {}
    if not isinstance(resources, dict):
        return out
    cs_dict = pdf.resolve(resources.get("ColorSpace"))
    if not isinstance(cs_dict, dict):
        return out
    from .colorfns import parse_tint_color_space
    for name, cs in cs_dict.items():
        try:
            parsed = parse_tint_color_space(pdf, cs)
        except Exception:
            parsed = None
        if parsed is not None:
            out[str(name)] = parsed
    return out


class TextInterpreter:
    """Executes one page's content stream(s), emitting PositionedChars."""

    def __init__(self, pdf, fonts: dict, base_ctm,
                 ext_gstates=None, color_spaces=None,
                 init_text_state=None):
        self.pdf = pdf
        self.fonts = fonts
        self.base_ctm = base_ctm
        self.ext_gstates = ext_gstates or {}
        self.color_spaces = color_spaces or {}
        self.chars: list[PositionedChar] = []
        # Image placements as |CTM|-derived areas (parsePdfDoc.js:664-780
        # image-placement merge → largestImageFrac page stat).
        self.image_areas: list[float] = []
        # Form-XObject Do events captured during run(), executed later by
        # run_form_pass() — the reference extracts form text as a
        # SEPARATE pass whose chars append AFTER the container's
        # (parsePdfDoc.js:580 extractFormXObjectText), not inline at the
        # Do position.  Each entry: (objnum, StreamObj, ctm-at-Do,
        # text-state-at-Do) per findDoOperators (:169-196).
        self.form_dos: list = []
        # Inherited text state for a form sub-run (doOp.textState:
        # tc/tw/tl/tz/trise + the /Artifact flag at the Do point).
        self.init_text_state = init_text_state or {}

    def run(self, content: bytes, xobjects=None, depth=0, tokens=None):
        """``tokens``: pre-tokenized (operands, op) list for this stream —
        pass when the caller also feeds the same stream to the path
        executor so the content is lexed once, not twice."""
        pdf = self.pdf
        ctm = self.base_ctm
        gs_stack = []
        font = None
        font_size = 0.0
        its = self.init_text_state
        char_spacing = float(its.get("tc", 0.0))
        word_spacing = float(its.get("tw", 0.0))
        leading = float(its.get("tl", 0.0))
        tz = float(its.get("tz", 100.0))  # Tz horizontal scaling, raw %
        rise = float(its.get("trise", 0.0))
        inherited_artifact = bool(its.get("artifact"))
        render_mode = 0
        # Fill (non-stroking) color state: raw components from g/rg/k,
        # or tint-resolved 0-1 RGB from cs+scn; fill_alpha from
        # ExtGState /ca via `gs` (parsePdfDoc.js:1393-1397).
        text_color = (0.0,)
        fill_tint = None
        fill_alpha = 1.0
        tm = (1, 0, 0, 1, 0, 0)
        tlm = tm
        # Marked-content stack: (/Artifact nesting depth, current MCID)
        # — feeds the struct-tree role overlay (M21) and artifact-aware
        # furniture handling (parsePdfDoc.js /Artifact + MCID tracking).
        mc_stack = []

        def show_string(s: bytes):
            nonlocal tm
            if font is None:
                return
            if font.two_byte:
                # CID strings: 2 bytes per code; word spacing applies
                # only to single-byte code 32 per spec → never here.
                codes = [(s[i] << 8) | s[i + 1]
                         for i in range(0, len(s) - 1, 2)]
            else:
                codes = list(s)
            # Per-RUN constants — the trm's linear part is fixed within
            # one show op; positions/advances below reproduce the
            # reference's per-glyph float operations IN ORDER
            # (parsePdfDoc.js:1842-1955 showLiteralString), because the
            # positioned exports round Math.round-adjacent values where
            # a different association flips knife-edge .5 coordinates.
            from ...functions.stats import js_hypot
            c0, c1, c2, c3, c4, c5 = ctm
            tm0, tm1, tm2, tm3, tm4, tm5 = tm
            m0 = tm0 * c0 + tm1 * c2
            m1 = tm0 * c1 + tm1 * c3
            m2 = tm2 * c0 + tm3 * c2
            m3 = tm2 * c1 + tm3 * c3
            h_run = js_hypot(m0, m1)     # hScale
            v_run = js_hypot(m2, m3)     # vScale
            # abs((fs*v)*scale) == abs(fs*v)*scale for the positive DPI
            # scale applied later in assembly.
            eff_size = abs(font_size * v_run)
            dir_x = m0
            dir_y = -(m1)
            dir_mag = js_hypot(dir_x, dir_y)
            orient = 0
            if dir_mag > 0.001:
                ndx = dir_x / dir_mag
                ndy = dir_y / dir_mag
                if abs(ndx) < 0.5 and ndy >= 0.5:
                    orient = 1
                elif ndx <= -0.5 and abs(ndy) < 0.5:
                    orient = 2
                elif abs(ndx) < 0.5 and ndy <= -0.5:
                    orient = 3
            artifact = inherited_artifact or \
                any(t == "Artifact" for t, _ in mc_stack)
            mcid = next((m for _, m in reversed(mc_stack)
                         if m is not None), None)
            invisible = render_mode == 3
            for b in codes:
                ch = font.decode_byte(b)
                glyph_width = font.width_of(b, ch) / 1000 * font_size
                if ch:
                    ox = tm2 * rise + tm4
                    oy = tm3 * rise + tm5
                    page_x = c0 * ox + c2 * oy + c4
                    page_y = c1 * ox + c3 * oy + c5
                    self.chars.append(PositionedChar(
                        ch, page_x, page_y,
                        abs(glyph_width * tz / 100) * h_run, eff_size,
                        font.name, font.bold, font.italic,
                        invisible, orientation=orient,
                        dir_x=dir_x, dir_y=dir_y,
                        family=font.family, smallcaps=font.smallcaps,
                        artifact=artifact, mcid=mcid,
                        alpha=fill_alpha, color=text_color,
                        asc=font.ascent / 1000.0,
                        desc=-font.descent / 1000.0))
                adv = (glyph_width + char_spacing
                       + (word_spacing if (b == 0x20 and
                                           not font.two_byte) else 0.0)
                       ) * tz / 100
                tm4 += adv * tm0
                tm5 += adv * tm1
            tm = (tm0, tm1, tm2, tm3, tm4, tm5)

        for operands, op in (tokens if tokens is not None
                             else tokenize_content(content)):
            try:
                if op == "q":
                    # Full graphics-state save: text state, font, fill
                    # color/alpha are graphics-state parameters too
                    # (parsePdfDoc.js:1448-1479 q/Q push/pop set).
                    gs_stack.append((ctm, render_mode, char_spacing,
                                     word_spacing, tz, leading, rise,
                                     font, font_size, text_color,
                                     fill_tint, fill_alpha))
                elif op == "Q":
                    if gs_stack:
                        saved = gs_stack.pop()
                        (ctm, render_mode, char_spacing, word_spacing,
                         tz, leading, rise, font, font_size,
                         text_color, fill_tint, fill_alpha) = saved
                elif op == "cm" and len(operands) == 6:
                    ctm = _mat_mul(tuple(float(v) for v in operands), ctm)
                elif op == "BT":
                    tm = (1, 0, 0, 1, 0, 0)
                    tlm = tm
                elif op == "ET":
                    pass
                elif op == "BMC" and operands:
                    mc_stack.append((str(operands[-1]), None))
                elif op == "BDC" and len(operands) >= 2:
                    props = operands[-1]
                    mcid = None
                    if isinstance(props, dict):
                        v = props.get("MCID")
                        if isinstance(v, (int, float)):
                            mcid = int(v)
                    mc_stack.append((str(operands[0]), mcid))
                elif op == "EMC":
                    if mc_stack:
                        mc_stack.pop()
                elif op == "Tf" and len(operands) == 2:
                    fname = str(operands[0])
                    font = self.fonts.get(fname)
                    font_size = float(operands[1])
                elif op == "Td" and len(operands) == 2:
                    tlm = _mat_mul((1, 0, 0, 1, float(operands[0]),
                                    float(operands[1])), tlm)
                    tm = tlm
                elif op == "TD" and len(operands) == 2:
                    leading = -float(operands[1])
                    tlm = _mat_mul((1, 0, 0, 1, float(operands[0]),
                                    float(operands[1])), tlm)
                    tm = tlm
                elif op == "Tm" and len(operands) == 6:
                    tlm = tuple(float(v) for v in operands)
                    tm = tlm
                elif op == "T*":
                    tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                    tm = tlm
                elif op == "TL" and operands:
                    leading = float(operands[0])
                elif op == "Tc" and operands:
                    char_spacing = float(operands[0])
                elif op == "Tw" and operands:
                    word_spacing = float(operands[0])
                elif op == "Tz" and operands:
                    tz = float(operands[0])
                elif op == "Ts" and operands:
                    rise = float(operands[0])
                elif op == "Tr" and operands:
                    render_mode = int(operands[0])
                elif op == "Tj" and operands:
                    if isinstance(operands[0], bytes):
                        show_string(operands[0])
                elif op == "'" and operands:
                    tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                    tm = tlm
                    if isinstance(operands[-1], bytes):
                        show_string(operands[-1])
                elif op == '"' and len(operands) == 3:
                    word_spacing = float(operands[0])
                    char_spacing = float(operands[1])
                    tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                    tm = tlm
                    if isinstance(operands[2], bytes):
                        show_string(operands[2])
                elif op in ("g", "rg", "k"):
                    # Device fill color; deselects any named tint space
                    # (parsePdfDoc.js:1692-1697).
                    text_color = tuple(float(v) for v in operands
                                       if isinstance(v, (int, float)))
                    fill_tint = None
                elif op == "cs" and operands:
                    fill_tint = self.color_spaces.get(str(operands[-1]))
                elif op in ("sc", "scn"):
                    # Tint components → 0-1 RGB through the Separation/
                    # DeviceN transform when the arity matches; raw
                    # components otherwise (parsePdfDoc.js:1719-1731).
                    comps = [float(v) for v in operands
                             if isinstance(v, (int, float))]
                    resolved = None
                    if fill_tint is not None and \
                            len(comps) == fill_tint["n_inputs"]:
                        from .colorfns import tint_components_to_rgb
                        rgb = tint_components_to_rgb(fill_tint, comps)
                        if rgb is not None:
                            resolved = (rgb[0] / 255, rgb[1] / 255,
                                        rgb[2] / 255)
                    text_color = resolved if resolved is not None \
                        else tuple(comps)
                elif op == "gs" and operands:
                    # ExtGState: only a present /ca updates the alpha
                    # (parsePdfDoc.js:1754-1768).
                    ca = self.ext_gstates.get(str(operands[-1]))
                    if ca is not None:
                        fill_alpha = ca
                elif op == "TJ" and operands and isinstance(operands[0], list):
                    for item in operands[0]:
                        if isinstance(item, bytes):
                            show_string(item)
                        elif isinstance(item, (int, float)):
                            # ref TJ kern: tm[4] -= adj*tm[0] etc., with
                            # the exact (v/1000*fontSize*tz)/100 chain
                            # (parsePdfDoc.js:1639-1642)
                            adj = item / 1000 * font_size * tz / 100
                            t0_, t1_, t2_, t3_, t4_, t5_ = tm
                            tm = (t0_, t1_, t2_, t3_,
                                  t4_ - adj * t0_, t5_ - adj * t1_)
                elif op == "Do" and operands and xobjects:
                    # Form XObjects are NOT executed inline: the
                    # reference collects Do events (findDoOperators
                    # parsePdfDoc.js:169-196 — ctm + tc/tw/tl/tz/trise +
                    # /Artifact flag at the Do) and extracts each form's
                    # text in a separate pass appended AFTER the page's
                    # own chars (:580) — see run_form_pass().
                    ref = xobjects.get(str(operands[0]))
                    xo = pdf.resolve(ref)
                    if isinstance(xo, StreamObj):
                        subtype = str(pdf.resolve(
                            xo.dict.get("Subtype", "")))
                        if subtype == "Form":
                            num = ref.num if isinstance(ref, Ref) \
                                else id(xo)
                            self.form_dos.append((num, xo, ctm, {
                                "tc": char_spacing, "tw": word_spacing,
                                "tl": leading, "tz": tz, "trise": rise,
                                "artifact": inherited_artifact or any(
                                    t == "Artifact"
                                    for t, _ in mc_stack)}))
                        elif subtype == "Image":
                            # Unit square × CTM → placed area (pts²).
                            self.image_areas.append(
                                abs(ctm[0] * ctm[3] - ctm[1] * ctm[2]))
                elif op == "INLINE_IMG":
                    # BI..EI draws score like Do-images
                    # (parsePdfDoc.js:680).
                    self.image_areas.append(
                        abs(ctm[0] * ctm[3] - ctm[1] * ctm[2]))
            except Exception:
                continue

    def run_form_pass(self, visited=None, depth=0):
        """Execute the Form XObject Do events captured by run(), in Do
        order, appending each form's chars AFTER the container's
        (extractFormXObjectText parsePdfDoc.js:329-372): each form
        OBJECT runs at most once per page (the shared ``visited`` set —
        the first Do's ctm/text-state win, later Dos of the same form
        are skipped), fonts/ExtGStates/ColorSpaces merge parent-then-
        form, the form seeds the Do-point text state, and nesting
        recurses depth-first after the form's own chars.  A Do of an
        already-visited form records a unit-square image placement
        instead, matching the surviving-Do rule of the paths walk
        (parsePdfPaths.js:305-309)."""
        pdf = self.pdf
        if visited is None:
            visited = set()
        pending, self.form_dos = self.form_dos, []
        for num, xo, ctm, tstate in pending:
            if num in visited:
                self.image_areas.append(
                    abs(ctm[0] * ctm[3] - ctm[1] * ctm[2]))
                continue
            visited.add(num)
            d = xo.dict
            matrix = pdf.resolve(d.get("Matrix")) or [1, 0, 0, 1, 0, 0]
            res = pdf.resolve(d.get("Resources")) or {}
            fdict = pdf.resolve(res.get("Font")) or {}
            fonts = dict(self.fonts)
            for k, v in fdict.items():
                try:
                    fonts[str(k)] = build_font(pdf, v)
                except Exception:
                    continue
            xobjs = pdf.resolve(res.get("XObject")) or {}
            # Form-local /ExtGState and /ColorSpace entries shadow the
            # parent's; fill alpha itself resets to 1 inside the form
            # (parsePdfDoc.js:348-366 merged maps + executeTextOperators'
            # fillAlpha init).
            gstates = dict(self.ext_gstates)
            gstates.update(parse_ext_gstates(pdf, res))
            cspaces = dict(self.color_spaces)
            cspaces.update(parse_text_color_spaces(pdf, res))
            sub = TextInterpreter(
                pdf, fonts,
                _mat_mul(tuple(float(v) for v in matrix), ctm),
                ext_gstates=gstates, color_spaces=cspaces,
                init_text_state=tstate)
            try:
                sub.run(pdf.stream_bytes(xo), xobjects=xobjs,
                        depth=depth + 1)
            except Exception:
                pass
            if depth < 32:
                sub.run_form_pass(visited, depth + 1)
            self.chars.extend(sub.chars)
            self.image_areas.extend(sub.image_areas)
