"""Adobe glyph name → unicode (compact subset of the public AGL).

The reference carries full standard-encoding tables
(/root/reference/js/pdf/fonts/standardEncodings.js, 5464 LoC of data); this
engine ships the subset covering Latin text, punctuation, ligatures and the
common publishing symbols — unknown names fall back to single-char names or
``uniXXXX`` forms.
"""

from __future__ import annotations

import re

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
    "quotedblright": "”", "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "eacute": "é", "egrave": "è", "agrave": "à", "ccedilla": "ç",
    "germandbls": "ß", "oslash": "ø", "aring": "å", "ae": "æ",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "section": "§", "paragraph": "¶",
    "cent": "¢", "sterling": "£", "yen": "¥", "Euro": "€",
    "softhyphen": "­", "minus": "−", "multiply": "×", "divide": "÷",
    "nbspace": " ",
}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _AGL:
        return _AGL[name]
    m = _UNI_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    return "�"
