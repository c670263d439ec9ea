"""Adobe glyph name → unicode.

The reference carries the full AGL as literal data
(/root/reference/js/pdf/fonts/standardEncodings.js, 5464 LoC); this engine
resolves names GENERATIVELY instead:

1. a curated table of the non-derivable names (punctuation, ligatures,
   publishing symbols, Greek);
2. ``uniXXXX`` / ``uXXXX[XX]`` hex forms;
3. accented-letter names composed from a base letter + diacritic suffix
   (``eacute`` → ``é``) via unicodedata lookup;
4. Unicode character-name lookup for spelled-out names;
5. variant suffixes (``.sc``, ``.alt1``, ``small``) stripped and retried.

Unknown names fall back to U+FFFD.
"""

from __future__ import annotations

import re
import unicodedata

_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ", "longs": "ſ",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "section": "§", "paragraph": "¶",
    "cent": "¢", "sterling": "£", "yen": "¥", "Euro": "€",
    "currency": "¤", "florin": "ƒ", "fraction": "⁄", "perthousand": "‰",
    "exclamdown": "¡", "questiondown": "¿", "periodcentered": "·",
    "brokenbar": "¦", "logicalnot": "¬", "macron": "¯", "micro": "µ",
    "middot": "·", "cedilla": "¸", "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "ordfeminine": "ª", "ordmasculine": "º",
    "acute": "´", "dieresis": "¨", "circumflex": "ˆ", "tilde": "˜",
    "breve": "˘", "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "caron": "ˇ", "hungarumlaut": "˝",
    "softhyphen": "­", "minus": "−", "multiply": "×", "divide": "÷",
    "nbspace": " ", "dotlessi": "ı", "dotlessj": "ȷ",
    "germandbls": "ß", "ae": "æ", "AE": "Æ", "oe": "œ", "OE": "Œ",
    "oslash": "ø", "Oslash": "Ø", "lslash": "ł", "Lslash": "Ł",
    "thorn": "þ", "Thorn": "Þ", "eth": "ð", "Eth": "Ð",
    "aring": "å", "Aring": "Å",
    # Greek (the Symbol-font names)
    "Alpha": "Α", "Beta": "Β", "Gamma": "Γ", "Delta": "Δ",
    "Epsilon": "Ε", "Zeta": "Ζ", "Eta": "Η", "Theta": "Θ", "Iota": "Ι",
    "Kappa": "Κ", "Lambda": "Λ", "Mu": "Μ", "Nu": "Ν", "Xi": "Ξ",
    "Omicron": "Ο", "Pi": "Π", "Rho": "Ρ", "Sigma": "Σ", "Tau": "Τ",
    "Upsilon": "Υ", "Phi": "Φ", "Chi": "Χ", "Psi": "Ψ", "Omega": "Ω",
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ",
    "epsilon": "ε", "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι",
    "kappa": "κ", "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ",
    "omicron": "ο", "pi": "π", "rho": "ρ", "sigma": "σ", "sigma1": "ς",
    "tau": "τ", "upsilon": "υ", "phi": "φ", "phi1": "ϕ", "chi": "χ",
    "psi": "ψ", "omega": "ω", "omega1": "ϖ", "theta1": "ϑ",
    # math / arrows
    "infinity": "∞", "integral": "∫", "summation": "∑", "product": "∏",
    "radical": "√", "partialdiff": "∂", "gradient": "∇", "element": "∈",
    "notelement": "∉", "intersection": "∩", "union": "∪",
    "propersubset": "⊂", "propersuperset": "⊃", "reflexsubset": "⊆",
    "reflexsuperset": "⊇", "notsubset": "⊄", "emptyset": "∅",
    "lessequal": "≤", "greaterequal": "≥", "notequal": "≠",
    "equivalence": "≡", "approxequal": "≈", "congruent": "≅",
    "proportional": "∝", "therefore": "∴", "perpendicular": "⊥",
    "angle": "∠", "logicaland": "∧", "logicalor": "∨",
    "arrowleft": "←", "arrowup": "↑", "arrowright": "→",
    "arrowdown": "↓", "arrowboth": "↔", "arrowdblleft": "⇐",
    "arrowdblup": "⇑", "arrowdblright": "⇒", "arrowdbldown": "⇓",
    "arrowdblboth": "⇔", "carriagereturn": "↵",
    "universal": "∀", "existential": "∃", "suchthat": "∋",
    "asteriskmath": "∗", "minute": "′", "second": "″", "similar": "∼",
    "aleph": "ℵ", "Ifraktur": "ℑ", "Rfraktur": "ℜ", "weierstrass": "℘",
    "circlemultiply": "⊗", "circleplus": "⊕", "dotmath": "⋅",
    "club": "♣", "diamond": "♦", "heart": "♥", "spade": "♠",
    "lozenge": "◊", "overscore": "‾",
    # legacy 'commaaccent' forms (AGL maps these to cedilla/comma-below)
    "Scommaaccent": "Ș", "scommaaccent": "ș",
    "Tcommaaccent": "Ț", "tcommaaccent": "ț",
}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")
_CID_RE = re.compile(r"^cid(\d+)$", re.I)

# Diacritic suffix → Unicode name fragment for the composed-letter rule.
_DIACRITICS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "tilde": "TILDE", "dieresis": "DIAERESIS", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
    "ogonek": "OGONEK", "caron": "CARON", "slash": "STROKE",
    "dotaccent": "DOT ABOVE", "hungarumlaut": "DOUBLE ACUTE",
    "commaaccent": "COMMA BELOW",
}

_CACHE: dict[str, str] = {}


def _compose(name: str) -> str | None:
    """``eacute`` / ``Zcaron`` → the composed letter via unicodedata."""
    if len(name) < 4 or not name[0].isalpha():
        return None
    base, rest = name[0], name[1:]
    frag = _DIACRITICS.get(rest)
    if not frag or not base.isascii():
        return None
    case = "CAPITAL" if base.isupper() else "SMALL"
    try:
        return unicodedata.lookup(
            f"LATIN {case} LETTER {base.upper()} WITH {frag}")
    except KeyError:
        return None


def glyph_to_unicode(name: str) -> str:
    if len(name) == 1:
        return name
    hit = _CACHE.get(name)
    if hit is not None:
        return hit
    out = _resolve(name)
    _CACHE[name] = out
    return out


def _resolve(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    m = _UNI_RE.match(name)
    if m:
        # uniXXXX or uniXXXXYYYY (multiple BMP codepoints concatenated)
        hexes = re.findall(r"[0-9A-Fa-f]{4}", name[3:])
        if hexes and len("".join(hexes)) == len(name) - 3:
            return "".join(chr(int(h, 16)) for h in hexes)
        return chr(int(m.group(1), 16))
    m = _U_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    if _CID_RE.match(name):
        return "�"
    composed = _compose(name)
    if composed:
        return composed
    # variant suffixes: Asmall → a; x.sc / x.alt1 / x.pnum → x
    if "." in name:
        return _resolve(name.split(".", 1)[0])
    if name.endswith("small") and len(name) > 5:
        base = _resolve(name[:-5])
        if base != "�":
            return base.lower()
    if name.endswith(("inferior", "superior")):
        base = _resolve(name[:-8])
        if base != "�":
            return base
    return "�"
