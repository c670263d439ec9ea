"""PDF simple-font base encodings: code → unicode tables.

From-scratch construction of the tables the reference ships as literal
data (/root/reference/js/pdf/fonts/standardEncodings.js):

- ``WIN_ANSI``  — WinAnsiEncoding = CP1252; per ISO 32000-1 Annex D
  unused codes map to bullet.
- ``MAC_ROMAN`` — MacRomanEncoding via the mac_roman codec.
- ``STANDARD``  — Adobe StandardEncoding (ASCII with quote slots swapped
  plus the named high region).
- ``PDF_DOC``   — PDFDocEncoding (CP1252-ish with the 0x18-0x1F accents
  region); used for outline titles / metadata strings.
- ``SYMBOL``    — the Symbol font's built-in Greek/math encoding.
- ``ZAPF``      — ZapfDingbats' built-in encoding (U+2700 block).
"""

from __future__ import annotations

from .glyphnames import glyph_to_unicode


def _decode_single(b: int, codec: str) -> str | None:
    try:
        return bytes([b]).decode(codec)
    except UnicodeDecodeError:
        return None


WIN_ANSI: dict[int, str] = {}
for _b in range(256):
    _ch = _decode_single(_b, "cp1252")
    # Annex D says unassigned WinAnsi codes RENDER as bullet, but that is
    # a display rule, not a text semantic — leaving the five undefined
    # codes (0x81/0x8D/0x8F/0x90/0x9D) unmapped lets the embedded font
    # program's own glyph names fill them instead of a placeholder
    # shadowing the M5 recovery path.
    if _ch is not None:
        WIN_ANSI[_b] = _ch

MAC_ROMAN: dict[int, str] = {}
for _b in range(256):
    _ch = _decode_single(_b, "mac_roman")
    if _ch is not None:
        MAC_ROMAN[_b] = _ch

# StandardEncoding: ASCII 0x20-0x7E except 0x27→quoteright, 0x60→quoteleft;
# high region by glyph name (ISO 32000-1 Annex D.2).
_STD_HIGH = {
    0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling", 0xA4: "fraction",
    0xA5: "yen", 0xA6: "florin", 0xA7: "section", 0xA8: "currency",
    0xA9: "quotesingle", 0xAA: "quotedblleft", 0xAB: "guillemotleft",
    0xAC: "guilsinglleft", 0xAD: "guilsinglright", 0xAE: "fi", 0xAF: "fl",
    0xB1: "endash", 0xB2: "dagger", 0xB3: "daggerdbl",
    0xB4: "periodcentered", 0xB6: "paragraph", 0xB7: "bullet",
    0xB8: "quotesinglbase", 0xB9: "quotedblbase", 0xBA: "quotedblright",
    0xBB: "guillemotright", 0xBC: "ellipsis", 0xBD: "perthousand",
    0xBF: "questiondown", 0xC1: "grave", 0xC2: "acute", 0xC3: "circumflex",
    0xC4: "tilde", 0xC5: "macron", 0xC6: "breve", 0xC7: "dotaccent",
    0xC8: "dieresis", 0xCA: "ring", 0xCB: "cedilla", 0xCD: "hungarumlaut",
    0xCE: "ogonek", 0xCF: "caron", 0xD0: "emdash", 0xE1: "AE",
    0xE3: "ordfeminine", 0xE8: "Lslash", 0xE9: "Oslash", 0xEA: "OE",
    0xEB: "ordmasculine", 0xF1: "ae", 0xF5: "dotlessi", 0xF8: "lslash",
    0xF9: "oslash", 0xFA: "oe", 0xFB: "germandbls",
}
STANDARD: dict[int, str] = {}
for _b in range(0x20, 0x7F):
    STANDARD[_b] = chr(_b)
STANDARD[0x27] = "’"   # quoteright
STANDARD[0x60] = "‘"   # quoteleft
for _b, _name in _STD_HIGH.items():
    STANDARD[_b] = glyph_to_unicode(_name)

# PDFDocEncoding: latin-1-like with 0x18-0x1F accent glyphs and a CP1252
# 0x80-0x9F region (subset that matters for outline/metadata strings).
PDF_DOC: dict[int, str] = dict(WIN_ANSI)
for _b in range(0x20, 0x7F):
    PDF_DOC[_b] = chr(_b)
for _b in range(0xA0, 0x100):
    PDF_DOC[_b] = chr(_b)

# Symbol font built-in encoding (Greek + operators; the slots that carry
# text meaning — unlisted codes fall back to bullet-free latin-1).
SYMBOL: dict[int, str] = {
    0x20: " ", 0x21: "!", 0x22: "∀", 0x23: "#", 0x24: "∃", 0x25: "%",
    0x26: "&", 0x27: "∋", 0x28: "(", 0x29: ")", 0x2A: "∗", 0x2B: "+",
    0x2C: ",", 0x2D: "−", 0x2E: ".", 0x2F: "/",
    0x3A: ":", 0x3B: ";", 0x3C: "<", 0x3D: "=", 0x3E: ">", 0x3F: "?",
    0x40: "≅",
    0x41: "Α", 0x42: "Β", 0x43: "Χ", 0x44: "Δ", 0x45: "Ε", 0x46: "Φ",
    0x47: "Γ", 0x48: "Η", 0x49: "Ι", 0x4A: "ϑ", 0x4B: "Κ", 0x4C: "Λ",
    0x4D: "Μ", 0x4E: "Ν", 0x4F: "Ο", 0x50: "Π", 0x51: "Θ", 0x52: "Ρ",
    0x53: "Σ", 0x54: "Τ", 0x55: "Υ", 0x56: "ς", 0x57: "Ω", 0x58: "Ξ",
    0x59: "Ψ", 0x5A: "Ζ", 0x5B: "[", 0x5C: "∴", 0x5D: "]", 0x5E: "⊥",
    0x5F: "_", 0x60: "‾",
    0x61: "α", 0x62: "β", 0x63: "χ", 0x64: "δ", 0x65: "ε", 0x66: "φ",
    0x67: "γ", 0x68: "η", 0x69: "ι", 0x6A: "ϕ", 0x6B: "κ", 0x6C: "λ",
    0x6D: "μ", 0x6E: "ν", 0x6F: "ο", 0x70: "π", 0x71: "θ", 0x72: "ρ",
    0x73: "σ", 0x74: "τ", 0x75: "υ", 0x76: "ϖ", 0x77: "ω", 0x78: "ξ",
    0x79: "ψ", 0x7A: "ζ", 0x7B: "{", 0x7C: "|", 0x7D: "}", 0x7E: "∼",
    0xA2: "′", 0xA3: "≤", 0xA4: "⁄", 0xA5: "∞", 0xA6: "ƒ", 0xA7: "♣",
    0xA8: "♦", 0xA9: "♥", 0xAA: "♠", 0xAB: "↔", 0xAC: "←", 0xAD: "↑",
    0xAE: "→", 0xAF: "↓", 0xB0: "°", 0xB1: "±", 0xB2: "″", 0xB3: "≥",
    0xB4: "×", 0xB5: "∝", 0xB6: "∂", 0xB7: "•", 0xB8: "÷", 0xB9: "≠",
    0xBA: "≡", 0xBB: "≈", 0xBC: "…", 0xBF: "↵",
    0xC0: "ℵ", 0xC1: "ℑ", 0xC2: "ℜ", 0xC3: "℘", 0xC4: "⊗", 0xC5: "⊕",
    0xC6: "∅", 0xC7: "∩", 0xC8: "∪", 0xC9: "⊃", 0xCA: "⊇", 0xCB: "⊄",
    0xCC: "⊂", 0xCD: "⊆", 0xCE: "∈", 0xCF: "∉", 0xD0: "∠", 0xD1: "∇",
    0xD5: "∏", 0xD6: "√", 0xD7: "⋅", 0xD8: "¬", 0xD9: "∧", 0xDA: "∨",
    0xDB: "⇔", 0xDC: "⇐", 0xDD: "⇑", 0xDE: "⇒", 0xDF: "⇓",
    0xE5: "∑",
    0xF2: "∫",
}
for _b in range(0x30, 0x3A):  # digits
    SYMBOL[_b] = chr(_b)

# ZapfDingbats: 0x21-0x7E maps onto the U+2700 block sequentially (the
# handful of exceptions are decorative variants irrelevant to text).
ZAPF: dict[int, str] = {0x20: " "}
for _b in range(0x21, 0x7F):
    ZAPF[_b] = chr(0x2700 + _b - 0x20)

_BY_NAME = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "MacExpertEncoding": STANDARD,   # expert sets carry no plain text
    "StandardEncoding": STANDARD,
    "PDFDocEncoding": PDF_DOC,
}


def encoding_by_name(name: str) -> dict[int, str] | None:
    return _BY_NAME.get(name)


def builtin_encoding_for_font(base_name: str) -> dict[int, str] | None:
    """Symbolic base-14 faces carry their own built-in encoding."""
    low = (base_name or "").lower()
    if low.startswith("symbol"):
        return SYMBOL
    if "zapfdingbats" in low or low.startswith("dingbats"):
        return ZAPF
    return None
