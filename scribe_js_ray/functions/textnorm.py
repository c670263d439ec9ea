"""Text normalization scalar functions.

Behavioral ports of the reference's string helpers:
- unescape_xml           — miscUtils.js:157-170 (incl. soft-hyphen→hyphen)
- escape_xml             — ocrObjects.js:592-598
- replace_ligatures      — ocrObjects.js:539-573
- remove_superscript     — miscUtils.js:559-566
- calc_lang              — miscUtils.js:180-222 (han→chi_sim, cyrillic→rus)
- get_text_script        — miscUtils.js (han/latin char counts)

All are plain Python scalar functions used inside vectorized batch loops;
they compile their regexes once at module import.
"""

from __future__ import annotations

import re

_LIGATURE_MAP = {
    "Ĳ": "IJ", "ĳ": "ij", "ŉ": "ʼn",
    "Ǳ": "DZ", "ǲ": "Dz", "ǳ": "dz",
    "Ǆ": "DŽ", "ǅ": "Dž", "ǆ": "dž",
    "Ǉ": "LJ", "ǈ": "Lj", "ǉ": "lj",
    "Ǌ": "NJ", "ǋ": "Nj", "ǌ": "nj",
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl",
    "ﬃ": "ffi", "ﬄ": "ffl", "ﬅ": "ſt", "ﬆ": "st",
}
_LIGATURE_RE = re.compile("[" + "".join(_LIGATURE_MAP) + "]")

_SUPERSCRIPT_MAP = {
    "⁰": "0", "¹": "1", "²": "2", "³": "3", "⁴": "4",
    "⁵": "5", "⁶": "6", "⁷": "7", "⁸": "8", "⁹": "9",
    "ᵃ": "a", "ᵇ": "b", "ᶜ": "c", "ᵈ": "d", "ᵉ": "e", "ᶠ": "f", "ᵍ": "g",
    "ʰ": "h", "ⁱ": "i", "ʲ": "j", "ᵏ": "k", "ˡ": "l", "ᵐ": "m", "ⁿ": "n",
    "ᵒ": "o", "ᵖ": "p", "ʳ": "r", "ˢ": "s", "ᵗ": "t", "ᵘ": "u", "ᵛ": "v",
    "ʷ": "w", "ˣ": "x", "ʸ": "y", "ᶻ": "z",
    "ᴬ": "A", "ᴮ": "B", "ᴰ": "D", "ᴱ": "E", "ᴳ": "G", "ᴴ": "H", "ᴵ": "I",
    "ᴶ": "J", "ᴷ": "K", "ᴸ": "L", "ᴹ": "M", "ᴺ": "N", "ᴼ": "O", "ᴾ": "P",
    "ᴿ": "R", "ᵀ": "T", "ᵁ": "U", "ⱽ": "V", "ᵂ": "W",
    "⁺": "+", "⁻": "-", "⁼": "=", "⁽": "(", "⁾": ")",
}
SUPERSCRIPT_CHARS = "".join(_SUPERSCRIPT_MAP)
_SUPERSCRIPT_RE = re.compile("[" + SUPERSCRIPT_CHARS + "]")

_HEX_ENT_RE = re.compile(r"&#x([0-9a-f]+);")

# Characters the reference treats as ascender-height / x-height evidence
# (miscUtils.js:5-7).
ASC_CHARS = frozenset("ABCDEFGHIKLMNOPRSTUVWXYZbdhklt0123456789")
X_CHARS = frozenset("acemnorsuvwxz")
DESC_CHARS = frozenset("gjpqy")


def unescape_xml(s: str) -> str:
    """miscUtils.js:157-170; replacement order preserved."""
    if "&" not in s and "\u00ad" not in s:
        return s
    s = s.replace("&amp;", "&")
    s = s.replace("&quot;", '"')
    s = s.replace("&apos;", "'")
    s = s.replace("&lt;", "<")
    s = s.replace("&gt;", ">")
    s = s.replace("&#39;", "'")
    s = s.replace("&#34;", '"')
    s = _HEX_ENT_RE.sub(lambda m: chr(int(m.group(1), 16)), s)
    # Soft hyphen → regular hyphen, applied to all inputs.
    return s.replace("­", "-")


def escape_xml(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace('"', "&quot;").replace("'", "&apos;")
        .replace("<", "&lt;").replace(">", "&gt;")
    )


def replace_ligatures(text: str) -> str:
    if not _LIGATURE_RE.search(text):
        return text
    return _LIGATURE_RE.sub(lambda m: _LIGATURE_MAP[m.group(0)], text)


def remove_superscript(text: str) -> str:
    return _SUPERSCRIPT_RE.sub(lambda m: _SUPERSCRIPT_MAP.get(m.group(0), m.group(0)), text)


def _is_han(code: int) -> bool:
    return (
        0x4E00 <= code <= 0x9FFF or 0x3400 <= code <= 0x4DBF
        or 0x20000 <= code <= 0x2A6DF or 0x2A700 <= code <= 0x2B73F
        or 0x2B740 <= code <= 0x2B81F or 0x2B820 <= code <= 0x2CEAF
        or 0xF900 <= code <= 0xFAFF or 0x2F800 <= code <= 0x2FA1F
    )


def calc_lang(s: str) -> str:
    """First decisive non-ASCII script wins: han→chi_sim, cyrillic→rus."""
    for ch in s:
        code = ord(ch)
        if code <= 127:
            continue
        if _is_han(code):
            return "chi_sim"
        if 0x0400 <= code <= 0x052F or code in (0x1C80, 0x1C81):
            return "rus"
    return "eng"


def get_text_script(chars) -> dict:
    """Counts of han vs latin characters in an iterable of 1-char strings."""
    han = latin = 0
    for ch in chars:
        if not ch:
            continue
        code = ord(ch[0])
        if _is_han(code):
            han += 1
        elif (0x41 <= code <= 0x5A) or (0x61 <= code <= 0x7A):
            latin += 1
    return {"han": han, "latin": latin}
