"""Document-level character metrics from char-level OCR boxes.

Port of the reference's font-statistics pass
(/root/reference/js/fontStatistics.js:19-333 calcCharMetricsFromPages /
calcCharMetricsPage / unionCharMetricsFont / calculateCharMetrics):
per-(family, style) medians of char width/height and adjacent-pair
kerning observations, normalized by the line's x-height (ascender
height for digits).  The result feeds the hOCR export's
``font-metrics`` meta and the auto default-font selection
(fontContainerMain.js:425-437 setDefaultAuto) — the reference computes
it at import for every XML OCR format whose char boxes are visually
accurate (import.js:716-727: hOCR and Abbyy; stext and the cloud
formats are excluded).

JSON-shape notes (the meta is hash-compared byte-for-byte against
JSON.stringify): charcode-keyed dicts serialize with integer-like keys
in ASCENDING numeric order (JS property ordering), "a,b" bigram keys in
insertion order; a kerning2 entry whose second char has no width median
yields NaN → ``null``.
"""

from __future__ import annotations

import re

from ..functions.stats import quantile, round6
from .fontregistry import determine_sans_serif, get_style_lookup

_STYLES = ("normal", "italic", "smallCaps", "bold")
_DIGIT_RE = re.compile(r"\d")


def _new_raw_font() -> dict:
    return {"width": {}, "height": {}, "kerning": {}, "kerning2": {},
            "obs": 0}


def _new_raw_family() -> dict:
    return {s: _new_raw_font() for s in _STYLES}


def calc_char_metrics_page(page) -> dict:
    """One page's raw observations (calcCharMetricsPage,
    fontStatistics.js:242-333)."""
    raw: dict = {}
    for line in page.lines:
        asc_h = line.asc_height
        x_h = line.x_height
        for word in line.words:
            family = determine_sans_serif(word.style.font) or "Default"
            chars = word.chars
            if chars and len(chars) != len(word.text):
                continue
            if (word.conf or 0) < 80 or word.lang == "chi_sim" \
                    or word.style.sup or word.style.small_caps:
                continue
            if not chars:
                continue
            style = get_style_lookup(word.style)
            if style not in ("normal", "italic", "bold"):
                continue
            fam = raw.get(family)
            for k, ch in enumerate(chars):
                h = ch.bbox.bottom - ch.bbox.top
                w = ch.bbox.right - ch.bbox.left
                norm = asc_h if _DIGIT_RE.search(ch.text[:1]) else x_h
                if not norm:
                    continue
                key = str(ord(ch.text[0]))
                if fam is None:
                    fam = raw[family] = _new_raw_family()
                sf = fam[style]
                if key not in sf["width"]:
                    sf["width"][key] = []
                    sf["height"][key] = []
                sf["width"][key].append(w / norm)
                sf["height"][key].append(h / norm)
                sf["obs"] += 1
                if k + 1 < len(chars):
                    nxt = chars[k + 1]
                    trailing = nxt.bbox.left - ch.bbox.right
                    w_next = nxt.bbox.right - nxt.bbox.left
                    # Only record when text moves forward (duplicate
                    # detections can run backwards).
                    if trailing + w_next > 0:
                        bigram = f"{key},{ord(nxt.text[0])}"
                        if bigram not in sf["kerning"]:
                            sf["kerning"][bigram] = []
                            sf["kerning2"][bigram] = []
                        sf["kerning"][bigram].append(trailing / norm)
                        sf["kerning2"][bigram].append(
                            (trailing + w_next) / norm)
    return raw


def _finalize_font(raw_font: dict) -> dict:
    """calculateCharMetrics (fontStatistics.js:113-166): medians,
    heightCaps, digit renormalization, kerning2 width subtraction.
    Charcode-keyed dicts come out numerically sorted to match JS
    integer-like property ordering under JSON.stringify."""
    out = {"width": {}, "widthObs": {}, "height": {}, "kerning": {},
           "kerning2": {}, "variants": {}, "heightCaps": 1.3,
           "obs": 0, "obsCaps": 0}
    for prop in ("width", "height", "kerning", "kerning2"):
        src = raw_font[prop]
        keys = sorted(src, key=int) if prop in ("width", "height") \
            else list(src)
        for key in keys:
            vals = src[key]
            if vals:
                out[prop][key] = round6(quantile(vals, 0.5))
                if prop == "width":
                    out["widthObs"][key] = len(vals)

    caps = []
    for key, vals in raw_font["height"].items():
        if re.search(r"[A-Z]", chr(int(key))):
            caps.extend(vals)
    med = quantile(caps, 0.5)
    out["heightCaps"] = round6(med) if med is not None else 0
    out["obsCaps"] = len(caps)
    out["obs"] = raw_font["obs"]

    # Digits were normalized by ascHeight; restandardize to x-height
    # units by multiplying by heightCaps (:141-150).
    for prop in ("width", "height", "kerning", "kerning2"):
        for key in raw_font[prop]:
            first = re.match(r"\w+", key).group(0)
            if _DIGIT_RE.search(chr(int(first))):
                out[prop][key] *= out["heightCaps"]

    # kerning2 carries end-of-char-1 → end-of-char-2; subtract char 2's
    # width median (undefined → NaN → JSON null, :152-164).
    for key, vals in raw_font["kerning2"].items():
        if vals:
            second = re.search(r"\w+$", key).group(0)
            w2 = out["width"].get(second)
            out["kerning2"][key] = out["kerning2"][key] - w2 \
                if w2 is not None else float("nan")
    return out


def calc_char_metrics_from_pages(pages) -> dict:
    """calcCharMetricsFromPages (fontStatistics.js:19-40)."""
    if not pages:
        return {}
    merged: dict = {}
    for page in pages:
        page_raw = calc_char_metrics_page(page)
        for family, fam_raw in page_raw.items():
            if family not in merged and any(
                    fam_raw[s]["width"] for s in _STYLES):
                merged[family] = _new_raw_family()
        for family, fam in merged.items():
            src = page_raw.get(family)
            if not src:
                continue
            for style in _STYLES:
                a, b = fam[style], src[style]
                a["obs"] += b["obs"]
                for prop in ("width", "height", "kerning", "kerning2"):
                    for key, vals in b[prop].items():
                        a[prop].setdefault(key, []).extend(vals)
    out: dict = {}
    for family, fam_raw in merged.items():
        fam_out: dict = {}
        total = 0
        for style in _STYLES:
            fam_out[style] = _finalize_font(fam_raw[style])
            total += fam_out[style]["obs"]
        fam_out["obs"] = total
        out[family] = fam_out
    return out


def default_font_auto(char_metrics: dict) -> str:
    """setDefaultAuto + checkMultiFontMode (fontContainerMain.js
    :425-437, fontContainer.js:32-41): with named-font observations
    outnumbering Default ones, the default family follows whichever of
    Serif/Sans was observed more; otherwise 'SerifDefault' stands."""
    default_obs = (char_metrics.get("Default") or {}).get("obs") or 0
    named_obs = ((char_metrics.get("SerifDefault") or {}).get("obs") or 0) \
        + ((char_metrics.get("SansDefault") or {}).get("obs") or 0)
    if named_obs <= default_obs:
        return "SerifDefault"
    serif = (char_metrics.get("SerifDefault") or {}).get("obs") or 0
    sans = (char_metrics.get("SansDefault") or {}).get("obs") or 0
    return "SerifDefault" if serif > sans else "SansDefault"
