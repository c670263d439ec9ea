"""Built-in raw font registry + word-metrics calculation.

Port of the reference's font containers and metric math for the
positioned-HTML export:

- ``GlobalFonts.getFont`` family/style resolution incl. the alias chain and
  ``determineSansSerif`` fallback (fontContainer.js:360-430,
  miscUtils.js:410-456).
- ``calcWordMetrics`` / ``calcWordCharMetrics`` / ``addLigatures``
  (fontUtils.js:223-351).
- ``calcWordFontSize`` / ``calcLineFontSize`` / ``getFontSize`` /
  ``calcWordFontSizePrecise`` (fontUtils.js:105-474) with the prev-line
  recursion (ocrObjects.js getPrevLine).

The numeric font data itself (``data/ref_font_metrics.json.gz``) is a table
of glyph advances/extents, cmaps and OS/2 fields dumped from the reference's
own open-licensed built-in fonts (URW Nimbus/Carlito/Caladea(Century)/
EB Garamond/P052(Palatino)/URW Gothic) via
``tests/refharness/dump_font_metrics.mjs`` — pure data, no code.  Notably the
shipped faces carry NO kern/GPOS tables, so ``getKerningValue`` is always 0
in the reference runtime (verified live); the table still carries a (empty)
pair dict so a future font swap keeps working.

All arithmetic mirrors the JS expression order so float64 results are
bit-identical.
"""

from __future__ import annotations

import gzip
import json
import math
import os
import re
from typing import Optional

_DATA_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "data", "ref_font_metrics.json.gz")

_REGISTRY = None

NAN = float("nan")


def js_div(a: float, b: float) -> float:
    """JS division: x/0 -> ±Infinity, 0/0 -> NaN (Python raises instead)."""
    if b == 0:
        if a != a or a == 0:
            return NAN
        return math.inf if (a > 0) == (math.copysign(1, b) > 0) else -math.inf
    return a / b


def js_round(x: float) -> float:
    """Math.round: half-up toward +Infinity (unlike Python's banker's)."""
    if x != x or math.isinf(x):
        return x
    return math.floor(x + 0.5)


def js_num(x) -> str:
    """ECMA-262 Number::toString(10) — JS's shortest-roundtrip decimal
    formatting, which differs from Python ``repr`` for integral floats
    ("12" vs "12.0") and small magnitudes ("0.000001" vs "1e-06")."""
    if isinstance(x, int):
        return str(x)
    if x != x:
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    if x == 0:
        return "0"
    sign = "-" if (x < 0 or (x == 0 and math.copysign(1, x) < 0)) else ""
    a = abs(x)
    r = repr(a)
    # Extract the shortest digit string `digits` and exponent `k` such that
    # a == 0.digits * 10**k  (ECMA's s * 10**(k-n) form with n=len(digits)).
    if "e" in r or "E" in r:
        # repr always emits one nonzero digit before the point here, so
        # a == d.ddd * 10**exp == 0.dddd * 10**(exp+1).
        mant, _, exp = r.partition("e")
        exp = int(exp)
        if "." in mant:
            ip, fp = mant.split(".")
        else:
            ip, fp = mant, ""
        digits = ip + fp
        k = exp + 1
    else:
        if "." in r:
            ip, fp = r.split(".")
        else:
            ip, fp = r, ""
        if ip != "0" and ip != "":
            digits = (ip + fp)
            k = len(ip)
        else:
            stripped = fp.lstrip("0")
            digits = stripped
            k = -(len(fp) - len(stripped))
    digits = digits.rstrip("0") or "0"
    n = len(digits)
    if n <= k <= 21:
        return sign + digits + "0" * (k - n)
    if 0 < k <= 21:
        return sign + digits[:k] + "." + digits[k:]
    if -6 < k <= 0:
        return sign + "0." + "0" * (-k) + digits
    # Exponent form
    e = k - 1
    mant = digits[0] + ("." + digits[1:] if n > 1 else "")
    return f"{sign}{mant}e{'+' if e >= 0 else '-'}{abs(e)}"


def format_num(num: float) -> str:
    """writeHtml.js formatNum: toFixed(5) then strip trailing zeros/dot."""
    s = js_to_fixed(num, 5)
    return re.sub(r"\.?0+$", "", s)


def js_to_fixed(x: float, digits: int) -> str:
    """Number.prototype.toFixed — round-half-away-from-zero on the decimal
    representation of the double (ECMA: pick n with n/10^f - x exactly
    representable tie going to larger n)."""
    if x != x:
        return "NaN"
    neg = x < 0
    a = abs(x)
    # ECMA toFixed picks integer n minimizing |n / 10**f - a|, ties -> the
    # larger n.  Exact Fraction arithmetic avoids double rounding:
    # n = floor(a * 10**f + 1/2), with an exact .5 landing on the larger n.
    from fractions import Fraction
    n = (Fraction(a) * Fraction(10) ** digits + Fraction(1, 2)).__floor__()
    s = str(n)
    if digits == 0:
        out = s
    else:
        s = s.rjust(digits + 1, "0")
        out = s[:-digits] + "." + s[-digits:]
    return ("-" if neg else "") + out


class Face:
    """One raw built-in face: metrics-only analog of FontContainerFont +
    its opentype.Font (fontContainer.js:199-240)."""

    __slots__ = ("family", "style", "font_face_name", "font_face_style",
                 "font_face_weight", "small_caps_mult", "type",
                 "units_per_em", "ascender", "descender", "os2",
                 "cmap", "glyphs", "kern")

    def __init__(self, rec: dict):
        self.family = rec["family"]
        self.style = rec["style"]
        self.font_face_name = rec["fontFaceName"]
        self.font_face_style = rec["fontFaceStyle"]
        self.font_face_weight = rec["fontFaceWeight"]
        self.small_caps_mult = rec["smallCapsMult"]
        self.type = rec["type"]
        self.units_per_em = rec["unitsPerEm"]
        self.ascender = rec["ascender"]
        self.descender = rec["descender"]
        self.os2 = rec["os2"]
        self.cmap = {int(k): v for k, v in rec["cmap"].items()}
        # gid -> (advance, xMin, xMax, yMin, yMax, hasPath); null -> NaN to
        # mirror opentype.js undefined-metric comparisons.
        self.glyphs = {
            int(k): tuple(NAN if v is None else v for v in vals)
            for k, vals in rec["glyphs"].items()
        }
        self.kern = {tuple(int(x) for x in k.split(",")): v
                     for k, v in rec["kern"].items()}

    def char_to_gid(self, ch: str) -> int:
        return self.cmap.get(ord(ch), 0)

    def glyph(self, ch: str):
        return self.glyphs[self.cmap.get(ord(ch), 0)]

    def advance(self, ch: str) -> float:
        a = self.glyph(ch)[0]
        return a

    def kerning(self, ch_l: str, ch_r: str) -> float:
        if not self.kern:
            return 0
        return self.kern.get((self.char_to_gid(ch_l), self.char_to_gid(ch_r)), 0)

    def has_glyph_path(self, ch: str) -> bool:
        gid = self.cmap.get(ord(ch), 0)
        g = self.glyphs.get(gid)
        return bool(g and gid > 0 and g[5])

    def space_advance(self) -> float:
        """writeHtml.js:316: charToGlyph(' ').advanceWidth || upm*0.35."""
        a = self.glyph(" ")[0]
        if a == a and a != 0:
            return a
        return self.units_per_em * 0.35


def _load_registry() -> dict:
    global _REGISTRY
    if _REGISTRY is None:
        with gzip.open(_DATA_PATH, "rb") as f:
            raw = json.load(f)
        _REGISTRY = {}
        for key, rec in raw["fonts"].items():
            fam, style = key.split("/")
            _REGISTRY.setdefault(fam, {})[style] = Face(rec)
    return _REGISTRY


# --- family classification (miscUtils.js:407-456) -------------------------

_SERIF_FONTS = ["SerifDefault", "Archer", "Baskerville", "Bembo", "Bodoni",
                "Bookman", "C059", "Calibri", "Cambria", "Century",
                "Cheltenham", "Courier", "Garamond", "Georgia",
                "LucidaBright", "Minion", "NimbusMono", "Optima", "P052",
                "Palatino", "Times"]
_SANS_FONTS = ["SansDefault", "Amplitude", "Avenir", "Arial", "Calibri",
               "Candara", "Carlito", "Clarika", "Comic", "Franklin",
               "Frutiger", "Futura", "Gotham", "Gothic", "Halvorsen",
               "Helvetica", "Impact", "Interstate", "Kievit", "Lato",
               "Myriad", "Segoe", "Tahoma", "Trebuchet", "Univers",
               "Verdana"]
_SYMBOL_FONTS = ["SymbolDefault", "Dingbats", "Wingdings", "Webdings",
                 "ZapfDingbats", "Symbol", "SymbolMT", "Quivira"]

_serif_re = re.compile("|".join(_SERIF_FONTS), re.I)
_sans_re = re.compile("|".join(_SANS_FONTS), re.I)
_symbol_re = re.compile("|".join(_SYMBOL_FONTS), re.I)


def determine_sans_serif(font_name: Optional[str]) -> str:
    """miscUtils.js determineSansSerif."""
    if font_name:
        font_name = re.sub(r"[_\s]", "", font_name, flags=re.I)
    family = "Default"
    if font_name and font_name not in ("Default", "GlyphLessFont",
                                       "HiddenHorzOCR"):
        if _symbol_re.search(font_name):
            family = "SymbolDefault"
        elif re.search(r"(^|\W|_)sans($|\W|_)", font_name, re.I):
            family = "SansDefault"
        elif re.search(r"(^|\W|_)serif($|\W|_)", font_name, re.I):
            family = "SerifDefault"
        elif _serif_re.search(font_name):
            family = "SerifDefault"
        elif _sans_re.search(font_name):
            family = "SansDefault"
        elif font_name != "Default Metrics Font":
            if re.search(r"serif|rom", font_name, re.I) and \
                    not re.search(r"sans", font_name, re.I):
                family = "SerifDefault"
            elif re.search(r"san", font_name, re.I):
                family = "SansDefault"
    return family


def get_style_lookup(style) -> str:
    """miscUtils.js getStyleLookup."""
    if style.bold and style.italic:
        return "boldItalic"
    if style.bold:
        return "bold"
    if style.italic:
        return "italic"
    return "normal"


# Default font-selection state (fontContainer.js:471-478).
DEFAULT_FONT_NAME = "SerifDefault"
SERIF_DEFAULT_NAME = "NimbusRoman"
SANS_DEFAULT_NAME = "NimbusSans"

_ALIASES = [
    (re.compile(r"NimbusRom", re.I), "NimbusRoman"),
    (re.compile(r"Times", re.I), "NimbusRoman"),
    (re.compile(r"NimbusSan", re.I), "NimbusSans"),
    (re.compile(r"Helvetica", re.I), "NimbusSans"),
    (re.compile(r"Arial", re.I), "NimbusSans"),
    (re.compile(r"CenturySch", re.I), "Century"),
    (re.compile(r"Palatino", re.I), "Palatino"),
    (re.compile(r"Garamond", re.I), "Garamond"),
    (re.compile(r"CenturyGothic", re.I), "Gothic"),
    (re.compile(r"AvantGarde", re.I), "Gothic"),
    (re.compile(r"Carlito", re.I), "Carlito"),
    (re.compile(r"Calibri", re.I), "Carlito"),
    (re.compile(r"Courier|NimbusMono", re.I), "NimbusMono"),
]


def get_font(style, lang: str = "eng") -> Face:
    """GlobalFonts.getFont (fontContainer.js:360-430) against the raw
    built-in registry (doc/opt fonts don't exist in this export path —
    writeHtml sets enableOpt=false and PDF-embedded fonts are never
    registered as doc fonts, fontContainer.js:499-502)."""
    raw = _load_registry()
    family = getattr(style, "font", None) or DEFAULT_FONT_NAME
    style_lookup = get_style_lookup(style)

    if not raw.get(family, {}).get(style_lookup):
        for pat, target in _ALIASES:
            if pat.search(family):
                family = target
                break

    if not raw.get(family, {}).get(style_lookup):
        family = determine_sans_serif(family)

    if family in ("Default", "SymbolDefault"):
        family = DEFAULT_FONT_NAME
    if family == "SerifDefault":
        family = SERIF_DEFAULT_NAME
    if family == "SansDefault":
        family = SANS_DEFAULT_NAME

    face = raw.get(family, {}).get(style_lookup)
    if face is None:
        raise KeyError(f"Font container does not contain {family} "
                       f"({style_lookup}).")
    return face


def get_word_font(word) -> Face:
    return get_font(word.style, getattr(word, "lang", "eng") or "eng")


# --- font size (fontUtils.js:105-474) --------------------------------------

def get_font_size(face: Face, height_actual: float, text: str) -> float:
    """fontUtils.js getFontSize: compare measured height against the glyph
    extents of `text`."""
    y_min = y_max = NAN
    for i, ch in enumerate(text):
        g = face.glyph(ch)
        if i == 0:
            y_min, y_max = g[3], g[4]
        else:
            # NaN comparisons are false in both languages, matching JS's
            # undefined-metric behavior.
            if g[3] < y_min:
                y_min = g[3]
            if g[4] > y_max:
                y_max = g[4]
    text_height = (y_max - y_min) * (1 / face.units_per_em)
    return js_round(js_div(height_actual, text_height))


_ALNUM_RE = re.compile(r"[A-Za-z0-9]")


def _quantile(arr, ntile):
    """miscUtils.js quantile: sorted[floor(n*q)]."""
    if not arr:
        return None
    arr1 = sorted(arr)
    mid = math.floor(len(arr) * ntile)
    return arr1[mid]


def calc_word_font_size_precise(word_arr, face: Face,
                                non_latin: bool = False):
    """fontUtils.js calcWordFontSizePrecise."""
    if word_arr[0].chars:
        char_arr = [c for w in word_arr for c in (w.chars or [])]
        if non_latin:
            filtered = [c for c in char_arr
                        if c and (c.bbox.bottom - c.bbox.top) > 5]
        else:
            filtered = [c for c in char_arr if c and _ALNUM_RE.search(c.text)]
        sizes = [get_font_size(face, c.bbox.bottom - c.bbox.top, c.text)
                 for c in filtered]
        return _quantile(sizes, 0.5)
    if non_latin:
        filtered = [w for w in word_arr
                    if w and (w.bbox.bottom - w.bbox.top) > 5]
    else:
        filtered = [w for w in word_arr if w and _ALNUM_RE.search(w.text)]
    sizes = [get_font_size(face, w.bbox.bottom - w.bbox.top, w.text)
             for w in filtered]
    return _quantile(sizes, 0.5)


def _get_prev_line(line):
    """ocrObjects.js getPrevLine (index-1 in page.lines)."""
    try:
        idx = line.page.lines.index(line)
    except ValueError:
        return None
    if idx < 1:
        return None
    return line.page.lines[idx - 1]


def calc_line_font_size(line) -> float:
    """fontUtils.js calcLineFontSize."""
    non_latin = bool(line.words) and \
        (getattr(line.words[0], "lang", "eng") == "chi_sim")
    face = get_word_font(line.words[0])

    if (len(line.words) <= 3 and line.words[0].chars) or non_latin:
        size_calc = calc_word_font_size_precise(line.words, face, non_latin)
        if size_calc and size_calc > 0:
            return size_calc

    asc = getattr(line, "asc_height", None)
    xh = getattr(line, "x_height", None)
    if asc and xh:
        size1 = get_font_size(face, asc, "A")
        size2 = get_font_size(face, xh, "o")
        size_final = math.floor((size1 + size2) / 2)
        if js_div(max(size1, size2), min(size1, size2)) > 1.2:
            line_prev = _get_prev_line(line)
            if line_prev:
                size_last = calc_line_font_size(line_prev)
                if size_last and (
                        js_div(max(size1, size_last),
                               min(size1, size_last)) <= 1.2
                        or js_div(max(size_last, size2),
                                  min(size_last, size2)) <= 1.2):
                    if abs(size_last - size2) < abs(size_last - size1):
                        size_final = math.floor((size_last + size2) / 2)
                    else:
                        size_final = math.floor((size_last + size1) / 2)
        return size_final

    if not asc and xh:
        return get_font_size(face, xh, "o")
    if asc and not xh:
        return get_font_size(face, asc, "A")

    line_prev = _get_prev_line(line)
    if line_prev:
        return calc_line_font_size(line_prev)
    return 15


def calc_word_font_size(word) -> float:
    """fontUtils.js calcWordFontSize."""
    face = get_word_font(word)
    if word.style.sup or word.style.dropcap:
        if getattr(word, "visual_coords", True):
            return get_font_size(face, word.bbox.bottom - word.bbox.top,
                                 word.text)
        if word.style.size:
            return word.style.size
        return (word.bbox.bottom - word.bbox.top) * (
            face.units_per_em / (face.ascender - face.descender))
    if word.style.size:
        return word.style.size
    line_font_size = calc_line_font_size(word.line)
    if line_font_size:
        return line_font_size
    return 12


# --- word metrics (fontUtils.js:160-351) ------------------------------------

def add_ligatures(word, ligatures: bool = False):
    """fontUtils.js addLigatures: collapse f-f/f-i/f-l when the face has the
    ligature glyph.  Default off (scribeDocDefaults.js:12)."""
    if word.style.small_caps or getattr(word, "style_runs", None) \
            or not ligatures:
        return list(word.text)
    face = get_word_font(word)
    out = []
    text = word.text
    i = 0
    while i < len(text):
        ch = text[i]
        nxt = text[i + 1] if i + 1 < len(text) else None
        if ch == "f" and nxt:
            lig = {"f": "ﬀ", "i": "ﬁ", "l": "ﬂ"}.get(nxt)
            if lig and face.has_glyph_path(lig):
                out.append(lig)
                i += 2
                continue
        out.append(ch)
        i += 1
    return out


def calc_word_char_metrics(char_arr, face: Face, kerning: bool = True):
    """fontUtils.js calcWordCharMetrics — font units."""
    advance_arr = []
    kerning_arr = []
    for i, ch in enumerate(char_arr):
        advance_arr.append(face.glyph(ch)[0])
        if i + 1 < len(char_arr):
            kerning_arr.append(
                face.kerning(ch, char_arr[i + 1]) if kerning else 0)
    return advance_arr, kerning_arr


class WordMetrics:
    __slots__ = ("visual_width", "left_side_bearing", "right_side_bearing",
                 "advance_arr", "kerning_arr", "char_spacing", "font",
                 "font_size", "char_arr")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def calc_word_metrics(word, angle: float = 0, ligatures: bool = False,
                      kerning: bool = True) -> WordMetrics:
    """fontUtils.js calcWordMetrics — px-space word metrics."""
    face = get_word_font(word)
    font_size = calc_word_font_size(word)
    char_arr = add_ligatures(word, ligatures)
    if word.style.small_caps:
        char_arr2 = [c.upper() for c in char_arr]
    else:
        char_arr2 = char_arr

    advance_arr, kerning_arr = calc_word_char_metrics(char_arr2, face,
                                                      kerning)

    if word.style.small_caps:
        for i in range(len(char_arr2)):
            if char_arr2[i] != char_arr[i]:
                advance_arr[i] *= face.small_caps_mult
                if i < len(kerning_arr) and kerning_arr[i]:
                    kerning_arr[i] *= face.small_caps_mult

    advance_total = 0
    for a in advance_arr:
        advance_total = advance_total + a
    kerning_total = 0
    for k in kerning_arr:
        kerning_total = kerning_total + k

    word_width1 = advance_total + kerning_total

    def _or0(v):
        # JS `v || 0`: 0/NaN/undefined -> 0.
        return v if (v == v and v != 0) else 0

    last_g = face.glyph(char_arr2[-1])
    first_g = face.glyph(char_arr2[0])
    word_left_bearing = _or0(first_g[1])
    last_glyph_max = _or0(last_g[2])
    if word.style.small_caps and char_arr2[-1] != char_arr[-1]:
        last_glyph_max *= face.small_caps_mult
    word_right_bearing = advance_arr[-1] - last_glyph_max
    if word.style.small_caps and char_arr2[0] != char_arr[0]:
        word_left_bearing *= face.small_caps_mult
    if word.style.small_caps and char_arr2[-1] != char_arr[-1]:
        word_right_bearing *= face.small_caps_mult

    if getattr(word, "visual_coords", True):
        word_width = word_width1 - word_right_bearing - word_left_bearing
    else:
        word_width = word_width1
    upm = face.units_per_em
    word_width_px = word_width * (font_size / upm)
    word_left_bearing_px = word_left_bearing * (font_size / upm)
    word_right_bearing_px = word_right_bearing * (font_size / upm)

    advance_arr_px = [x * (font_size / upm) for x in advance_arr]
    kerning_arr_px = [x * (font_size / upm) for x in kerning_arr]

    char_spacing = 0
    if len(char_arr2) > 1:
        cos_angle = math.cos(angle * (math.pi / 180))
        actual_width = (word.bbox.right - word.bbox.left) / cos_angle
        char_spacing = js_round(
            (actual_width - word_width_px) / (len(char_arr2) - 1) * 1e6) / 1e6

    return WordMetrics(
        visual_width=word_width_px,
        left_side_bearing=word_left_bearing_px,
        right_side_bearing=word_right_bearing_px,
        advance_arr=advance_arr_px,
        kerning_arr=kerning_arr_px,
        char_spacing=char_spacing,
        font=face,
        font_size=font_size,
        char_arr=char_arr,
    )


def calc_font_metrics(face: Face, font_size: float):
    """writeHtml.js calcFontMetrics: canvas-equivalent font bounding box."""
    os2 = face.os2
    upm = face.units_per_em
    if (os2["fsSelection"] >> 7) & 1:
        return (js_round(os2["sTypoAscender"] * (font_size / upm)),
                abs(js_round(os2["sTypoDescender"] * (font_size / upm))))
    return (js_round(os2["usWinAscent"] * (font_size / upm)),
            js_round(os2["usWinDescent"] * (font_size / upm)))
