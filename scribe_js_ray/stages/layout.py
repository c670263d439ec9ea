"""Document-level layout analysis: furniture roles + headings + footnotes.

Reimplementation of the decision surface of
/root/reference/js/import/analyzeLayout.js (3454 LoC) that drives text
extraction over Common-Crawl style corpora:

- line-number columns, case A standalone AND case B fused-prefix
  (analyzeLayout.js:189-333) with the table/list discrimination gates
- folio sequence tracking + edge folios    (classifyRole, :2869-2905)
- running header/footer recurrence         (:1119-1235)
- enumerator classification + numbering-scheme activation
  (lineEnumerator :3240, detectNumberingSchemes :3298)
- in-text note-reference label collection  (:652-706)
- endnote sections vs footnote blocks via note-dominated page runs
  (:1270-1350)
- column detection                          (detectColumns :3173)
- hanging speaker/label markers             (:1882-1910)
- footnote start via superscript marker    (:2938-2960, simplified)
- heading via size ratio / centering       (:3000-3070, simplified)
- body-size document style model           (:171-188)
- blockquote via both-side inset pars      (:2212-2237)

Roles map to par types as in analyzeLayout.js:2175-2181 (heading → 'title').

- heading-signature style model       (:1573-1629, :2997-3003)
- footnote separator rules             (:931-990)
- struct-tree role overlay (H*/BlockQuote/Artifact via MCIDs, M21)
- concordance pages                    (``_concordance_pages`` below)

Paragraph construction itself lives in ``stages/parbreaks.py`` (the
doc-level decideBreak pass, r4) — this module supplies the roles,
schemes and column geometry it consumes, then applies the struct-tree
overlay and blockquote re-tag on the rebuilt paragraphs.

This pass needs all pages of one document together; with doc = row it runs
per-row inside ``map_batches`` — no shuffle required.
"""

from __future__ import annotations

import re

from ..functions.stats import js_round, quantile
from ..model import Page, Par, bbox_union
from .reflow import assign_paragraphs

_INT_RE = re.compile(r"^\d{1,4}$")
_FOLIO_RE = re.compile(r"^[\d.\-—–]{1,5}$")
_ROMAN_RE = re.compile(
    r"^m{0,3}(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$", re.I)
_N_OF_M_RE = re.compile(r"^\d{1,3}\s+of\s+\d{1,3}$")
_SUP_MARKER_RE = re.compile(r"^[\d*†‡]{1,3}$")
# analyzeLayout.js:6 — digit-convention note sites skip CJK lines
_CJK_RE = re.compile(r"[ᄀ-ᇿ　-鿿가-힯"
                     r"豈-﫿＀-￯]")
_INF = float("inf")
_LETTER_RE = re.compile(r"[A-Za-z]")
_ENDS_TERMINAL_RE = re.compile(r"[.!?:][\"')”’]?\s*$")
_STARTS_LOWER_RE = re.compile(r"[a-z]")

LN_LEFT_FRAC = 0.4
LN_GATE_RUN = 8
LN_CONF_RUN = 6
LN_RESCUE_RUN = 4
LN_MAX_RUN = 35        # case B: a longer merged numeric column is a table
LN_MAX_START = 30
LN_LOCK_PAGES = 3
LN_MAX_NUMFIRST = 0.5  # case B: mostly-numeric first content word = table
LN_MIN_PITCHREG = 0.85
LN_CASEB_MIN_RIGHTFRAC = 0.35
LN_CASEB_MIN_DENSITY = 0.6

# Transcript line numbers may be decorated with leader dots (never ASCII
# '.', so a list marker "1." does not match) — analyzeLayout.js:3108-3131.
_LN_LEADER_RE = re.compile(r"^[·•∙⋅‧․]+$")
_LN_INT_RE = re.compile(r"^[·•∙⋅‧․]*(\d{1,4})[·•∙⋅‧․]*$")


class _Feat:
    __slots__ = ("page", "line_idx", "line", "left", "right", "width", "top",
                 "bottom", "center", "size", "text", "n_char", "all_caps",
                 "ends_terminal", "starts_lower", "first_word_sup",
                 "top_frac", "bottom_frac", "role", "size_ratio", "line_num",
                 "folio", "ln_split", "enumerator", "endnote",
                 "footnote_block", "hang_marker", "orientation", "in_table",
                 "struct_role", "struct_elem", "artifact_frac", "bold",
                 "family", "sig_key", "below_nchar",
                 "first_word_width", "below_feat", "drop_cap",
                 "in_inset_run", "family_distinct", "list_confirmed",
                 "color", "color_distinct", "gap_above", "row_fragment",
                 "block_region", "footnote_opener", "italic")

    def __init__(self):
        self.role = "body"
        self.size_ratio = 1.0
        self.line_num = False
        self.folio = False
        self.ln_split = False
        self.enumerator = None
        self.endnote = False
        self.footnote_block = False
        self.hang_marker = False
        self.orientation = 0
        self.in_table = False
        self.struct_role = None
        self.struct_elem = None
        self.artifact_frac = 0.0
        self.bold = 0.0
        self.family = ""
        self.sig_key = ""
        self.below_nchar = 0
        self.first_word_width = 0.0
        self.below_feat = None
        self.drop_cap = False
        self.in_inset_run = False
        self.family_distinct = False
        self.list_confirmed = False
        self.color = "#000000"
        self.color_distinct = False
        self.gap_above = float("inf")
        self.row_fragment = False
        self.block_region = None
        self.footnote_opener = False
        self.italic = 0.0


def _line_size(line) -> float:
    """Dominant size proxy: explicit word style size when present, else the
    line's ascender height (hOCR carries metrics, not font sizes)."""
    sizes = {}
    for w in line.words:
        if w.style.size:
            wl = len(w.text) or 1
            sizes[w.style.size] = sizes.get(w.style.size, 0) + wl
    if sizes:
        return max(sizes.items(), key=lambda kv: (kv[1], kv[0]))[0]
    if line.asc_height:
        return round(line.asc_height, 1)
    return round(line.bbox.bottom - line.bbox.top, 1)


def _features(pages) -> list:
    import math
    feats = []
    for p, page in enumerate(pages):
        angle = page.angle or 0
        sin_a = math.sin(angle * (math.pi / 180))
        cos_a = math.cos(angle * (math.pi / 180))
        page_h = page.height or 0
        gated_boxes = _gated_table_boxes(page)
        for i, line in enumerate(page.lines):
            if not line.words:
                continue
            b = line.bbox
            f = _Feat()
            f.page = p
            f.line_idx = i
            f.line = line
            f.left = b.left * cos_a - sin_a * b.bottom
            f.right = b.right * cos_a - sin_a * b.bottom
            f.width = f.right - f.left
            f.top = b.top
            f.bottom = b.bottom
            f.center = (f.left + f.right) / 2
            f.size = _line_size(line)
            f.text = " ".join(w.text for w in line.words)
            n_char = 0
            letters = upper = 0
            n_bold = n_ital = 0
            fam_w: dict = {}
            col_w: dict = {}
            for w in line.words:
                wl = len(w.text)
                n_char += wl
                if w.style.bold:
                    n_bold += wl or 1
                if getattr(w.style, "italic", False):
                    n_ital += wl or 1
                fam = w.style.font or ""
                fam_w[fam] = fam_w.get(fam, 0) + (wl or 1)
                col = getattr(w.style, "color", None) or "#000000"
                col_w[col] = col_w.get(col, 0) + (wl or 1)
            for c in f.text:
                if c.isascii():
                    if "a" <= c <= "z":
                        letters += 1
                    elif "A" <= c <= "Z":
                        letters += 1
                        upper += 1
            f.n_char = n_char
            f.bold = n_bold / n_char if n_char else 0.0
            f.italic = n_ital / n_char if n_char else 0.0
            f.family = max(fam_w.items(), key=lambda kv: kv[1])[0] \
                if fam_w else ""
            f.color = max(col_w.items(), key=lambda kv: kv[1])[0] \
                if col_w else "#000000"
            f.all_caps = letters >= 2 and upper / letters >= 0.8
            last = line.words[-1].text if line.words else ""
            f.ends_terminal = bool(_ENDS_TERMINAL_RE.search(last))
            f.starts_lower = bool(_STARTS_LOWER_RE.match(line.words[0].text))
            f.first_word_sup = bool(line.words[0].style.sup)
            f.first_word_width = (line.words[0].bbox.right
                                  - line.words[0].bbox.left) or 0
            f.drop_cap = bool(getattr(line.words[0].style,
                                      "dropcap", False))
            f.top_frac = b.top / page_h if page_h else 0
            f.bottom_frac = b.bottom / page_h if page_h else 0
            f.orientation = getattr(line, "orientation", 0) or 0
            f.enumerator = _line_enumerator(line)
            # Char-weighted dominant struct-tree tag (tagged PDFs, M21):
            # resolved only when >=60% of the line's chars agree.
            mcid_roles = getattr(page, "mcid_roles", None) or {}
            if mcid_roles:
                tag_w: dict = {}
                n_art = 0
                for w in line.words:
                    wl = len(w.text) or 1
                    if getattr(w, "artifact", False):
                        n_art += wl
                    tag = mcid_roles.get(getattr(w, "mcid", None))
                    if tag:
                        tag_w[tag] = tag_w.get(tag, 0) + wl
                if tag_w and f.n_char:
                    best_tag, best_w = max(tag_w.items(),
                                           key=lambda kv: kv[1])
                    if best_w / f.n_char >= 0.6:
                        f.struct_role = best_tag
                f.artifact_frac = n_art / f.n_char if f.n_char else 0.0
                # Owning paragraph-element instance (decideBreak
                # structId): dominant elem id under the same 60% bar.
                mcid_elems = getattr(page, "mcid_elems", None) or {}
                if mcid_elems:
                    el_w: dict = {}
                    for w in line.words:
                        el = mcid_elems.get(getattr(w, "mcid", None))
                        if el is not None:
                            el_w[el] = el_w.get(el, 0) + (len(w.text) or 1)
                    if el_w and f.n_char:
                        best_el, best_w = max(el_w.items(),
                                              key=lambda kv: kv[1])
                        if best_w / f.n_char >= 0.6:
                            f.struct_elem = best_el
            elif any(getattr(w, "artifact", False) for w in line.words):
                n_art = sum(len(w.text) or 1 for w in line.words
                            if getattr(w, "artifact", False))
                f.artifact_frac = n_art / f.n_char if f.n_char else 0.0
            cx, cy = (b.left + b.right) / 2, (b.top + b.bottom) / 2
            # in_table keys on the NUMERIC-GATED boxes, not the full
            # export set: the reference's pageObj.tableBoxes is a
            # filtered copy of the dataTables (parsePdfDoc.js:1228-1252)
            # — an under-50%-numeric region (e.g. a table whose bbox
            # swallowed intro prose) must not suppress furniture rules
            # or pin classifyRole to body.
            for tb in gated_boxes:
                if tb["left"] <= cx <= tb["right"] \
                        and tb["top"] <= cy <= tb["bottom"]:
                    f.in_table = True
                    break
            feats.append(f)
    return feats


def _gated_table_boxes(page) -> list:
    """page.table_boxes filtered to predominantly-numeric regions
    (≥6 words inside, ≥50% numeric) — parsePdfDoc.js:1228-1252; cached
    per page object per analyze call."""
    boxes = getattr(page, "table_boxes", None) or []
    if not boxes:
        return []
    out = []
    for tb in boxes:
        numeric = total = 0
        for ln in page.lines:
            for w in ln.words:
                cx = (w.bbox.left + w.bbox.right) / 2
                cy = (w.bbox.top + w.bbox.bottom) / 2
                if not (tb["left"] <= cx <= tb["right"]
                        and tb["top"] <= cy <= tb["bottom"]):
                    continue
                total += 1
                wt = w.text.strip()
                if any(c.isdigit() for c in wt) \
                        and re.match(r"^[\d.,%()$/-]+$", wt):
                    numeric += 1
        if total >= 6 and numeric / total >= 0.5:
            out.append(tb)
    return out


_ROMAN_VAL = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500,
              "m": 1000}


def _roman_to_int(s: str):
    t = s.lower()
    total = 0
    for i, c in enumerate(t):
        cur = _ROMAN_VAL.get(c)
        if not cur:
            return None
        nxt = _ROMAN_VAL.get(t[i + 1]) if i + 1 < len(t) else None
        total += -cur if (nxt and cur < nxt) else cur
    return total or None


_BULLET_SET_RE = re.compile(r"^[•◦▪▫●○◼◻➢»■□◾◽▶▸‣➤➔–—-]$")


def _line_enumerator(line):
    """Leading enumerator classification (analyzeLayout.js:3240-3296)."""
    if not line.words:
        return None
    w0 = line.words[0].text or ""
    w1 = line.words[1].text if len(line.words) > 1 else ""
    if line.words[0].style.sup and re.match(r"^\d{1,3}$", w0):
        return {"scheme": "sup-ref", "value": int(w0), "raw": w0}
    m = re.match(r"^FN(\d{1,3})[.)]?$", w0)
    if m:
        return {"scheme": "sup-ref", "value": int(m.group(1)), "raw": w0}
    if re.match(r"^(Sec\.?|SEC\.?|Section|SECTION|Article|ARTICLE|§)$", w0):
        nm = re.match(r"^(\d{1,4})", w1)
        if nm:
            return {"scheme": "section", "value": int(nm.group(1)),
                    "raw": f"{w0} {w1}".strip()}
        rm = re.match(r"^([ivxlcdm]+)[.)]?$", w1, re.I)
        if rm:
            return {"scheme": "section", "value": _roman_to_int(rm.group(1)),
                    "raw": f"{w0} {w1}".strip()}
        return None
    m = re.match(r"^\((\d{1,3}|[a-z]{1,3}|[ivxlcdm]+)\)$", w0, re.I)
    if m:
        inner = m.group(1)
        if inner.isdigit():
            return {"scheme": "paren-num", "value": int(inner), "raw": w0}
        if re.match(r"^[ivxlcdm]+$", inner, re.I) and len(inner) > 1:
            return {"scheme": "paren-roman", "value": _roman_to_int(inner),
                    "raw": w0}
        if re.match(r"^[a-z]$", inner, re.I):
            return {"scheme": "paren-alpha",
                    "value": ord(inner.lower()) - 96, "raw": w0}
        return {"scheme": "paren-alpha", "value": None, "raw": w0}
    m = re.match(r"^\[(\d{1,3})\]$", w0)
    if m:
        return {"scheme": "bracket-num", "value": int(m.group(1)), "raw": w0}
    m = re.match(r"^(\d{1,3})[.)]$", w0)
    if m:
        return {"scheme": "num-dot", "value": int(m.group(1)), "raw": w0}
    m = re.match(r"^([ivxlcdm]{2,})\)$", w0, re.I)
    if m:
        return {"scheme": "roman-paren", "value": _roman_to_int(m.group(1)),
                "raw": w0}
    m = re.match(r"^([ivxlcdm]{2,})\.$", w0, re.I)
    if m:
        return {"scheme": "roman-dot", "value": _roman_to_int(m.group(1)),
                "raw": w0}
    m = re.match(r"^([a-z])\)$", w0, re.I)
    if m:
        return {"scheme": "alpha-paren", "value": ord(m.group(1).lower()) - 96,
                "raw": w0}
    m = re.match(r"^([a-z])\.$", w0, re.I)
    if m:
        return {"scheme": "alpha-dot", "value": ord(m.group(1).lower()) - 96,
                "raw": w0}
    if _BULLET_SET_RE.match(w0):
        return {"scheme": "bullet", "value": None, "raw": w0}
    cps = list(w0)
    if len(cps) == 1 and ord(cps[0]) >= 0x80 \
            and re.match(r"[\W]", cps[0]) and not cps[0].isalnum():
        import unicodedata
        cat = unicodedata.category(cps[0])
        if cat.startswith("S") or cat.startswith("C"):
            return {"scheme": "bullet", "value": None, "raw": w0}
    return None


def _detect_numbering_schemes(feats) -> dict:
    """Per-scheme activation: an increasing run and 'value has a numeric
    neighbour' membership (analyzeLayout.js:3298-3343)."""
    seq: dict = {}
    for f in feats:
        e = f.enumerator
        if not e or e["value"] is None:
            continue
        seq.setdefault(e["scheme"], []).append(e["value"])
    out = {}
    for scheme, vals in seq.items():
        vset = set(vals)
        seq_vals = {v for v in vset if v - 1 in vset or v + 1 in vset}
        asc = sorted(vset)
        run = max_run = 1
        for i in range(1, len(asc)):
            if asc[i] == asc[i - 1] + 1:
                run += 1
                max_run = max(max_run, run)
            else:
                run = 1
        splittable = scheme not in ("alpha-dot", "roman-dot")
        strong = scheme == "section" or scheme.startswith("paren-") \
            or scheme in ("alpha-paren", "roman-paren", "bracket-num")
        out[scheme] = {"active": splittable
                       and max_run >= (2 if strong else 3),
                       "max_run": max_run, "sequence_values": seq_vals}
    glyph_counts: dict = {}
    for f in feats:
        e = f.enumerator
        if e and e["scheme"] == "bullet":
            glyph_counts[e["raw"]] = glyph_counts.get(e["raw"], 0) + 1
    bullet_max = max(glyph_counts.values()) if glyph_counts else 0
    if bullet_max >= 3:
        out["bullet"] = {"active": True, "max_run": bullet_max,
                         "sequence_values": set()}
    return out


def _leading_line_number(line):
    """(value, prefix_words, standalone) of a leading line number,
    tolerating leader-dot decoration (analyzeLayout.js:3119-3131)."""
    words = line.words
    if not words:
        return None
    i = 0
    while i < len(words) and _LN_LEADER_RE.match((words[i].text or "").strip()):
        i += 1
    if i >= len(words):
        return None
    m = _LN_INT_RE.match((words[i].text or "").strip())
    if not m:
        return None
    pfx = i + 1
    while pfx < len(words) \
            and _LN_LEADER_RE.match((words[pfx].text or "").strip()):
        pfx += 1
    return {"value": int(m.group(1)), "prefix_words": pfx,
            "standalone": pfx >= len(words)}


def _body_size(feats) -> float:
    """analyzeLayout.js:171-188 — largest size holding >=30% of chars."""
    size_chars = {}
    total = 0
    for f in feats:
        if not f.size:
            continue
        size_chars[f.size] = size_chars.get(f.size, 0) + f.n_char
        total += f.n_char
    mode, mode_chars, body = 0, -1, 0
    for sz, c in size_chars.items():
        if c > mode_chars:
            mode_chars, mode = c, sz
        if total > 0 and c / total >= 0.30 and sz > body:
            body = sz
    if not body:
        body = mode
    if not body:
        body = quantile([f.size for f in feats if f.size], 0.5) or 10
    return body


def _page_body_size(feats, body_size) -> dict:
    """Per-page body size: largest size covering >=30% of the page's
    chars; the doc body size wins when present >=10% on the page
    (analyzeLayout.js:355-383 — footnotes can out-mass the body)."""
    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    out: dict = {}
    for p, pf in by_page.items():
        wts: dict = {}
        total = 0
        for f in pf:
            if not f.size:
                continue
            wts[f.size] = wts.get(f.size, 0) + f.n_char
            total += f.n_char
        chosen = dominant = 0.0
        dom_c = -1
        doc_body_chars = 0
        for sz, c in wts.items():
            if c > dom_c:
                dom_c, dominant = c, sz
            if total > 0 and c / total >= 0.30 and sz > chosen:
                chosen = sz
            if abs(sz - body_size) <= body_size * 0.05:
                doc_body_chars += c
        pb = chosen or dominant or body_size
        if body_size > pb and total > 0 \
                and doc_body_chars / total >= 0.10:
            pb = body_size
        out[p] = pb
    return out


def _style_distinct_pass(feats, page_body_size, body_size) -> dict:
    """Per-line colorDistinct/familyDistinct + per-page style-char
    fractions (analyzeLayout.js:386-634).

    - sizeRatio becomes PAGE-relative (:385): meaningful in small-type
      sections.
    - colorDistinct (:610-620): only when one color dominates the doc
      (>=60% of chars); judged against the line's own page body color.
    - familyDistinct (:622-634): likewise for the font family.
    - pageStyleChars (:420-430): bold/caps char mass among BODY-ratio
      lines per page — the boldDistinct/capsDistinct denominators.
    Returns the pageStyleChars map {page: {tot, bold, caps}}."""
    for f in feats:
        pb = page_body_size.get(f.page) or body_size
        f.size_ratio = (f.size / pb) if (f.size and pb) else 1.0

    doc_col: dict = {}
    doc_fam: dict = {}
    doc_total = 0
    page_col: dict = {}
    page_fam: dict = {}
    for f in feats:
        if not f.n_char:
            continue
        doc_total += f.n_char
        doc_col[f.color] = doc_col.get(f.color, 0) + f.n_char
        doc_fam[f.family] = doc_fam.get(f.family, 0) + f.n_char
        pc = page_col.setdefault(f.page, {})
        pc[f.color] = pc.get(f.color, 0) + f.n_char
        pf_ = page_fam.setdefault(f.page, {})
        pf_[f.family] = pf_.get(f.family, 0) + f.n_char
    color_heading = doc_total > 0 \
        and max(doc_col.values()) / doc_total >= 0.6
    family_heading = doc_total > 0 \
        and max(doc_fam.values()) / doc_total >= 0.6
    body_font_family = max(doc_fam.items(), key=lambda kv: kv[1])[0] \
        if doc_fam else ""
    page_body_color = {p: max(cw.items(), key=lambda kv: kv[1])[0]
                       for p, cw in page_col.items()}
    page_body_family = {p: max(fw.items(), key=lambda kv: kv[1])[0]
                        for p, fw in page_fam.items()}
    for f in feats:
        f.color_distinct = color_heading and \
            f.color != page_body_color.get(f.page, "#000000")
        f.family_distinct = family_heading and bool(f.family) and \
            f.family != (page_body_family.get(f.page) or body_font_family)

    page_style_chars: dict = {}
    for f in feats:
        if f.size_ratio < 0.92 or f.size_ratio > 1.08:
            continue
        acc = page_style_chars.setdefault(
            f.page, {"tot": 0, "bold": 0, "caps": 0})
        acc["tot"] += f.n_char
        if f.bold > 0.6:
            acc["bold"] += f.n_char
        if f.all_caps:
            acc["caps"] += f.n_char
    return page_style_chars


def _gap_below_pass(feats, leading) -> None:
    """gapAbove + belowFeat per line (analyzeLayout.js:1552-1570):
    nearest horizontally-overlapping neighbour within 3.5 leadings;
    same-row fragments are skipped; the 80-line window bounds
    fragment-dense pages."""
    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    for arr in by_page.values():
        arr.sort(key=lambda f: f.top)
        for i, f in enumerate(arr):
            f.gap_above = float("inf")
            f.below_feat = None
            f.below_nchar = 0
            for j in range(i - 1, max(i - 81, -1), -1):
                g = arr[j]
                if f.top - g.top <= min(f.bottom - f.top,
                                        g.bottom - g.top) * 0.5:
                    continue  # same row (other column/fragment)
                if f.top - g.top > leading * 3.5:
                    break
                if g.left < f.right and f.left < g.right:
                    f.gap_above = f.top - g.bottom
                    break
            for j in range(i + 1, min(i + 81, len(arr))):
                g = arr[j]
                if g.top - f.top <= min(f.bottom - f.top,
                                        g.bottom - g.top) * 0.5:
                    continue
                if g.top - f.top > leading * 3.5:
                    break
                if g.left < f.right and f.left < g.right:
                    f.below_feat = g
                    f.below_nchar = g.n_char
                    break


def _cluster_peaks(values, tol):
    """Greedy 1-D clustering: sorted sweep, new cluster when gap > tol."""
    if not values:
        return []
    vals = sorted(values)
    clusters = []
    cur = [vals[0]]
    for v in vals[1:]:
        if v - cur[-1] <= tol:
            cur.append(v)
        else:
            clusters.append(cur)
            cur = [v]
    clusters.append(cur)
    return [{"center": sum(c) / len(c), "count": len(c)} for c in clusters]


def _pass_line_numbers(pages, feats, body_size):
    """Left-margin line-number columns, case A (standalone) and case B
    (number fused into the body line) with the table/list discrimination
    gates (analyzeLayout.js:189-333)."""
    by_page = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)

    page_runs = {}
    gate_fired = False
    for p, pf in by_page.items():
        page_w = pages[p].width or 0
        if not page_w:
            continue
        left_edge = page_w * LN_LEFT_FRAC
        cands = []
        for f in pf:
            if f.left >= left_edge:
                continue
            lead = _leading_line_number(f.line)
            if not lead:
                continue
            # A table's leading index column recurs at a fixed x exactly
            # like a line-number margin (analyzeLayout.js:216).
            if f.in_table:
                continue
            cands.append({"f": f, "value": lead["value"],
                          "prefix_words": lead["prefix_words"],
                          "standalone": lead["standalone"],
                          "x": f.left, "top": f.top})
        if len(cands) < LN_RESCUE_RUN:
            continue
        best_run = []
        for peak in _cluster_peaks([c["x"] for c in cands], body_size):
            col = sorted((c for c in cands
                          if abs(c["x"] - peak["center"]) <= body_size),
                         key=lambda c: c["top"])
            cur = []
            for c in col:
                prev = cur[-1] if cur else None
                if prev and prev["value"] < c["value"] <= prev["value"] + 5:
                    cur.append(c)
                else:
                    cur = [c]
                if len(cur) > len(best_run):
                    best_run = list(cur)
        if len(best_run) < LN_RESCUE_RUN:
            continue
        xs = sorted(c["x"] for c in best_run)
        col_x = xs[len(xs) // 2]

        # ln-like gates (analyzeLayout.js:237-278)
        sa_frac = sum(1 for c in best_run if c["standalone"]) / len(best_run)
        member_set = {id(c["f"]) for c in best_run}
        prose_lefts = [f.left for f in pf if id(f) not in member_set
                       and (f.right - f.left) > body_size * 8]
        body_peaks = sorted(_cluster_peaks(prose_lefts, body_size * 0.6),
                            key=lambda q: -q["count"])
        page_body_left = body_peaks[0]["center"] if body_peaks else col_x
        indent_ok = col_x <= page_body_left + body_size * 2
        body_lines = [f for f in pf if id(f) not in member_set
                      and _LETTER_RE.search(f.text or "")]
        body_bottom = max((f.top for f in body_lines), default=float("inf"))
        body_overlap = len(body_lines) < 4 \
            or any(c["top"] <= body_bottom for c in best_run)
        ln_like_core = best_run[0]["value"] <= LN_MAX_START \
            and (sa_frac >= 0.5 or len(best_run) <= LN_MAX_RUN)
        if ln_like_core and sa_frac < 0.5:
            # Case B discrimination: data tables / numbered lists.
            num_first = have_content = 0
            for c in best_run:
                ws = c["f"].line.words
                if c["prefix_words"] >= len(ws):
                    continue
                fw = ws[c["prefix_words"]]
                have_content += 1
                t = (fw.text or "").strip()
                if re.search(r"\d", t) and re.match(r"^[\d.,$%()-]+$", t):
                    num_first += 1
            num_first_frac = num_first / have_content if have_content else 0
            tops = [c["top"] for c in best_run]
            gaps = [tops[k] - tops[k - 1] for k in range(1, len(tops))]
            med_gap = sorted(gaps)[len(gaps) // 2] if gaps else 1
            pitch_reg = (sum(1 for g in gaps
                             if 0.5 * med_gap <= g <= 1.75 * med_gap)
                         / len(gaps)) if gaps else 1
            rights = sorted(c["f"].right for c in best_run)
            med_right_frac = rights[len(rights) // 2] / page_w
            span_top, span_bot = tops[0], tops[-1]
            in_span = sum(1 for f in pf
                          if span_top - 1 <= f.top <= span_bot + 1)
            density = len(best_run) / in_span if in_span else 1
            ln_like_core = num_first_frac < LN_MAX_NUMFIRST \
                and pitch_reg >= LN_MIN_PITCHREG \
                and med_right_frac >= LN_CASEB_MIN_RIGHTFRAC \
                and density >= LN_CASEB_MIN_DENSITY
        ln_like = ln_like_core and indent_ok and body_overlap

        page_runs[p] = {"run": len(best_run), "members": best_run,
                        "col_x": col_x, "cands": cands, "ln_like": ln_like,
                        "indent_ok": indent_ok,
                        "start_val": best_run[0]["value"]}
        if len(best_run) >= LN_GATE_RUN and ln_like:
            gate_fired = True

    if not gate_fired:
        return

    recur = [(p, r) for p, r in page_runs.items()
             if r["run"] >= LN_CONF_RUN and r["start_val"] <= LN_MAX_START
             and r["indent_ok"]]
    ln_ceil = 0
    for _, r in page_runs.items():
        if not r["ln_like"]:
            continue
        for c in r["members"]:
            ln_ceil = max(ln_ceil, c["value"])
    if not ln_ceil:
        ln_ceil = 28
    lock_peaks = [q for q in _cluster_peaks([r["col_x"] for _, r in recur],
                                            body_size)
                  if q["count"] >= LN_LOCK_PAGES]
    for peak in lock_peaks:
        at_x = sorted(p for p, r in recur
                      if abs(r["col_x"] - peak["center"]) <= body_size)
        conf_min, conf_max = min(at_x) - 1, max(at_x) + 1
        conf_set = set(at_x)
        for p, r in page_runs.items():
            if abs(r["col_x"] - peak["center"]) > body_size:
                continue
            accept = p in conf_set or (
                r["run"] >= LN_RESCUE_RUN and r["start_val"] <= LN_MAX_START
                and conf_min <= p <= conf_max)
            if not accept:
                continue
            for c in r["cands"]:
                if abs(c["x"] - peak["center"]) <= body_size \
                        and 1 <= c["value"] <= ln_ceil:
                    if c["standalone"]:
                        c["f"].line_num = True
                    else:
                        ws = c["f"].line.words
                        for w in ws[:c["prefix_words"]]:
                            w.line_num = True
                        c["f"].ln_split = True

    # Refresh features frozen on the stripped digit (analyzeLayout.js:325-
    # 344): startsLower/enumerator must read the first CONTENT word, and a
    # margin sup-ref digit must not feed the footnote scheme.
    for f in feats:
        if f.line_num:
            f.enumerator = None
            continue
        ws = f.line.words
        if not ws or not ws[0].line_num:
            continue
        j = 0
        while j < len(ws) and ws[j].line_num:
            j += 1
        if j < len(ws):
            f.starts_lower = bool(re.match(r"[a-z]", ws[j].text or ""))

            class _L:  # minimal line view over the content words
                words = ws[j:]
            f.enumerator = _line_enumerator(_L)
            f.first_word_sup = bool(ws[j].style.sup)
            # f.left must point at the first CONTENT word too
            # (analyzeLayout.js:345-349): the layout model's bodyLeft
            # and decideBreak's sameColumn otherwise key on the fused
            # margin digit's x, skewing the whole column model left
            # (found by sink20 — a table beside a fused transcript then
            # reads as the same column and never column-shifts).
            f.left = ws[j].bbox.left
            f.first_word_width = (ws[j].bbox.right
                                  - ws[j].bbox.left) or 0
        else:
            f.enumerator = None


def _pass_folios(pages, feats):
    """Sequence-tracking folios: a lone number whose value tracks the page
    index across a contiguous run of >=3 pages → 'pagenum'."""
    cands = {}
    for f in feats:
        t = re.sub(r"\s+", "", f.text)
        if _FOLIO_RE.match(t) and re.search(r"\d", t):
            digits = re.sub(r"\D", "", t)
            if digits:
                cands.setdefault(f.page, []).append((f, int(digits)))
    # Offsets: value - page_index; a stable offset across a run means folio.
    offsets = {}
    for p, lst in cands.items():
        for f, v in lst:
            offsets.setdefault(v - p, []).append((p, f))
    for off, entries in offsets.items():
        pages_seen = sorted(set(p for p, _ in entries))
        # longest contiguous run
        best, cur = [], []
        for p in pages_seen:
            if cur and p == cur[-1] + 1:
                cur.append(p)
            else:
                cur = [p]
            if len(cur) > len(best):
                best = list(cur)
        if len(best) >= 3:
            run = set(best)
            for p, f in entries:
                if p in run:
                    f.folio = True


def _detect_columns(pf, body_size):
    """Column layout of one page from its body lines, or None when
    single-column (analyzeLayout.js:3173-3210)."""
    body = [f for f in pf
            if f.n_char >= 4 and not f.all_caps and f.orientation == 0
            and (0.92 <= f.size_ratio <= 1.08
                 or abs(f.size - body_size) <= body_size * 0.1)]
    if len(body) < 8:
        return None
    peaks = sorted(
        (pk for pk in _cluster_peaks([f.left for f in body], body_size * 0.5)
         if pk["count"] >= max(3, len(body) * 0.08)),
        key=lambda pk: pk["center"])
    cols = []
    prev_peak = None
    for pk in peaks:
        # Clusters within ~7 em chain as one column's flush/indent family.
        chained = prev_peak is not None \
            and pk["center"] - prev_peak < body_size * 7
        prev_peak = pk["center"]
        if chained:
            continue
        cols.append({"left": pk["center"], "rights": []})
    if len(cols) < 2:
        return None
    for f in body:
        best = cols[0]
        for c in cols:
            if f.left >= c["left"] - body_size * 0.5:
                best = c
        best["rights"].append(f.right)
    out = []
    for c in cols:
        if len(c["rights"]) < 3:
            continue
        right = quantile(c["rights"], 0.9) or max(c["rights"])
        out.append({"left": c["left"], "right": right,
                    "width": right - c["left"]})
    return out if len(out) >= 2 else None


def _column_for(left, pcols, body_size):
    if not pcols or len(pcols) < 2:
        return None
    c = pcols[0]
    for cc in pcols:
        if left >= cc["left"] - body_size * 0.5:
            c = cc
    return c


_SUP_DIGITS = {"⁰": "0", "¹": "1", "²": "2", "³": "3", "⁴": "4", "⁵": "5",
               "⁶": "6", "⁷": "7", "⁸": "8", "⁹": "9"}


def _collect_body_ref_labels(pages):
    """In-text note-reference labels: glued symbol markers, FN+digits,
    Unicode superscript digits, and sup-styled marker words (word 0 of a
    line is skipped — a note's own opener is not a reference)
    (analyzeLayout.js:652-706).  Returns ``(doc_set, per_page)`` — the
    reference keeps both: classifyRole anchors each note claim on a
    SAME-PAGE reference (bodyRefLabels.get(page), :708-710) while the
    endnote pass keys on the doc-wide set (bodyRefLabelsDoc, :794)."""
    labels = set()
    by_page: dict[int, set] = {}

    def _add(p, label):
        labels.add(label)
        by_page.setdefault(p, set()).add(label)

    for p, page in enumerate(pages):
        for line in page.lines:
            ws = line.words
            line_cjk = any(_CJK_RE.search(w.text or "") for w in ws)
            for wi in range(1, len(ws)):
                wt = (ws[wi].text or "").strip()
                if not wt:
                    continue
                m = re.search(r"[A-Za-z0-9][*†‡∗]{1,3}$", wt)
                if m:
                    _add(p, m.group(0)[1:])
                m = re.search(r"FN(\d{1,3})$", wt)
                if m:
                    _add(p, m.group(1))
                m = re.search(r"[⁰¹²³⁴-⁹]{1,4}$", wt)
                # Ordinary digits in CJK text get spuriously flagged
                # superscript, so CJK lines never source labels here
                # (analyzeLayout.js:687).
                if m and not line_cjk:
                    _add(p, "".join(_SUP_DIGITS.get(c, "")
                                    for c in m.group(0)))
                if ws[wi].style.sup:
                    # A preceding raised word means a uniform-size marker
                    # cluster, not a reference after running text; the
                    # walk-back first steps over Word's tiny "0F"
                    # cross-reference bookmarks (<0.5x of the marker's
                    # size) (analyzeLayout.js:692-698).
                    pi = wi - 1
                    w_size = ws[wi].style.size or 0
                    while pi > 0 and ws[pi].style.sup \
                            and (ws[pi].style.size or 0) < w_size * 0.5:
                        pi -= 1
                    if ws[pi].style.sup:
                        continue
                    label = re.sub(r"[.)\]/]+$", "", wt)
                    if not re.match(r"^[\d*†‡∗]{1,3}$", label):
                        continue
                    # Plain-digit markers are rejected on CJK lines;
                    # symbol markers survive (analyzeLayout.js:700).
                    if line_cjk and not re.search(r"[*†‡∗]", label):
                        continue
                    _add(p, label)
    return labels, by_page


def _pass_endnotes(pages, feats, schemes, body_ref_labels, body_size,
                   furniture_ids):
    """Endnote sections vs footnote blocks: note-dominated pages (sup-ref
    entry blocks covering >60% of content lines) form runs — runs >= 2
    pages are endnotes, an isolated dominated page is a footnote block
    (analyzeLayout.js:1270-1350)."""
    sup = schemes.get("sup-ref")
    if not sup or not sup["active"]:
        return
    # Leading (median pitch) for the continuation-gap gate.
    tops_by_page: dict = {}
    for f in feats:
        tops_by_page.setdefault(f.page, []).append(f.top)
    gaps = []
    for tops in tops_by_page.values():
        tops.sort()
        gaps += [b - a for a, b in zip(tops, tops[1:]) if b - a > 0]
    leading = sorted(gaps)[len(gaps) // 2] if gaps else body_size * 1.2

    def opens_entry(f):
        return f.first_word_sup and f.enumerator \
            and f.enumerator["scheme"] == "sup-ref" \
            and not f.line_num and not f.folio \
            and id(f) not in furniture_ids \
            and f.enumerator["value"] in sup["sequence_values"]

    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    page_notes = {}
    for p, pf in by_page.items():
        note_lines, values = [], []
        i = 0
        while i < len(pf):
            if not opens_entry(pf[i]):
                i += 1
                continue
            start = pf[i]
            note_lines.append(start)
            values.append(start.enumerator["value"])
            j = i + 1
            while j < len(pf):
                g = pf[j]
                if opens_entry(g) or id(g) in furniture_ids:
                    break
                dx = g.left - start.left
                if g.size_ratio >= 1.15 or dx < -body_size * 0.6 \
                        or dx > body_size * 2.5:
                    break
                if g.top - pf[j - 1].top > leading * 2.2:
                    break
                note_lines.append(g)
                j += 1
            i += 1
        if not note_lines:
            continue
        content = sum(1 for f in pf if id(f) not in furniture_ids)
        page_notes[p] = {
            "note_lines": note_lines, "values": sorted(values),
            "dominated": content > 0 and len(note_lines) / content > 0.6}

    dom_pages = sorted(p for p, d in page_notes.items() if d["dominated"])
    runs = []
    for p in dom_pages:
        if runs and runs[-1][-1] == p - 1:
            runs[-1].append(p)
        else:
            runs.append([p])
    endnote_pages, block_pages = set(), set()
    for run in runs:
        referenced = any(str(v) in body_ref_labels
                         for p in run for v in page_notes[p]["values"])
        if not referenced:
            continue
        if len(run) >= 2:
            endnote_pages.update(run)
        else:
            block_pages.add(run[0])
    # Extend a >=3-page run onto value-contiguous neighbours.
    for run in runs:
        if len(run) < 3:
            continue
        first_vals = page_notes[run[0]]["values"]
        before = page_notes.get(run[0] - 1)
        if before and not before["dominated"] and first_vals \
                and before["values"] \
                and before["values"][-1] + 1 == first_vals[0]:
            endnote_pages.add(run[0] - 1)
        last_vals = page_notes[run[-1]]["values"]
        after = page_notes.get(run[-1] + 1)
        if after and not after["dominated"] and last_vals \
                and after["values"] and after["values"][0] - 1 == last_vals[-1]:
            endnote_pages.add(run[-1] + 1)
    for p, d in page_notes.items():
        if p in endnote_pages:
            for f in d["note_lines"]:
                f.endnote = True
        elif p in block_pages:
            for f in d["note_lines"]:
                f.footnote_block = True


def _pass_hang_markers(pages, feats, page_columns, body_size):
    """Recurring outdent column of short leads with same-row body text at
    the body column: transcript speaker markers / hanging-list labels
    (analyzeLayout.js:1882-1910).

    ``bodyTextLeft`` is the MAJORITY body-line left peak over prose-like
    features (sizeRatio 0.92-1.08, not all-caps, 4+ chars) — never a
    plain median, which a data table's numeric columns would drag
    rightward and turn its label column into phantom markers
    (analyzeLayout.js:448-460)."""
    body_feats = [f for f in feats
                  if 0.92 <= f.size_ratio <= 1.08 and not f.all_caps
                  and f.n_char >= 4]
    body_lefts = [f.left for f in body_feats]
    left_peaks = [pk for pk in _cluster_peaks(body_lefts, body_size * 0.3)
                  if pk["count"] >= max(3, len(body_feats) * 0.05)]
    if left_peaks:
        body_text_left = max(left_peaks,
                             key=lambda pk: pk["count"])["center"]
    else:
        # fallback = bodyLeft = quantile(bodyLefts, 0.5) || 0 — never
        # an all-features median (analyzeLayout.js:455-459); with no
        # prose-like lines this is 0 and no line qualifies as a marker
        body_text_left = quantile(body_lefts, 0.5) or 0
    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    cands = []
    for p, arr in by_page.items():
        if page_columns.get(p):
            continue
        arr = sorted(arr, key=lambda f: f.top)
        for i, f in enumerate(arr):
            if f.line_num or f.left >= body_text_left - body_size:
                continue
            cwc = sum(1 for w in f.line.words if not w.line_num)
            if cwc > 2:
                continue
            has_body = False
            height = f.bottom - f.top
            for j in range(i + 1, len(arr)):
                g = arr[j]
                if g.top - f.top >= min(height, g.bottom - g.top) * 0.5:
                    break
                if not g.line_num and g.left > f.right \
                        and abs(g.left - body_text_left) <= body_size:
                    has_body = True
                    break
            for j in range(i - 1, -1, -1):
                if has_body:
                    break
                g = arr[j]
                if f.top - g.top >= min(height, g.bottom - g.top) * 0.5:
                    break
                if not g.line_num and g.left > f.right \
                        and abs(g.left - body_text_left) <= body_size:
                    has_body = True
                    break
            if has_body:
                cands.append(f)
    peaks = sorted(_cluster_peaks([f.left for f in cands], body_size * 0.5),
                   key=lambda q: -q["count"])
    if peaks and peaks[0]["count"] >= max(6, len(feats) * 0.02):
        for f in cands:
            if abs(f.left - peaks[0]["center"]) <= body_size:
                f.hang_marker = True


_CONC_REF_RE = re.compile(r"\b\d{1,3}:\d{1,3}\b")
_CONC_ENTRY_RE = re.compile(r"(^|\s)\S+\s\(\d{1,3}\)")
_WORD_RUN_RE = re.compile(r"[A-Za-z]{2,}")


def _concordance_pages(feats) -> set:
    """Word-index (concordance) pages: most lines are 'headword (count)'
    or 'page:line' reference entries (analyzeLayout.js:1094-1116).  The
    footnote machinery is suppressed on these pages — their numbered
    entries are not notes."""
    stats: dict = {}
    for f in feats:
        t = (f.text or "").strip()
        if len(t) < 2:
            continue
        st = stats.setdefault(f.page, [0, 0])
        st[0] += 1
        refs = len(_CONC_REF_RE.findall(t))
        words = len(_WORD_RUN_RE.findall(t))
        if _CONC_ENTRY_RE.search(t) or (refs >= 2 and refs >= words):
            st[1] += 1
    return {p for p, (tot, conc) in stats.items()
            if tot >= 8 and conc / tot >= 0.5}


_SUBSET_PREFIX_RE = re.compile(r"^[A-Z]{6}\+")


def _heading_signature_model(feats, body_size, page_columns, col_width,
                             furniture_ids=None, page_style_chars=None):
    """Doc-wide heading style signatures (analyzeLayout.js:1570-1629):
    per style-tuple stats over content lines; a tuple qualifies when its
    instances are mostly short, mostly strongly-styled, letter-dominated,
    rarely lowercase-starting, and usually head substantial text.

    ``page_style_chars`` (from ``_style_distinct_pass``): bold/caps are
    heading evidence only on a page whose BODY is not itself bold/caps
    (:1588-1590 judges against the page's body-ratio char mass, so a
    bold note block cannot mask its own tuple)."""
    furniture_ids = furniture_ids or set()
    page_style_chars = page_style_chars or {}
    stats: dict = {}
    for f in feats:
        flags = ("b" if f.bold > 0.6 else "") \
            + ("i" if f.italic > 0.6 else "") \
            + ("c" if f.all_caps else "")
        fam = _SUBSET_PREFIX_RE.sub("", f.family)
        f.sig_key = f"{js_round(f.size * 2) / 2}|{flags}|{fam}|{f.color}"
        if f.line_num or f.folio or f.in_table or f.endnote \
                or f.footnote_block or f.artifact_frac > 0.6 \
                or id(f) in furniture_ids:
            continue
        st = stats.setdefault(f.sig_key, {
            "n": 0, "short": 0, "strong": 0, "weak": 0, "weak_big": 0,
            "enum_led": 0, "letter_dom": 0, "lower_start": 0,
            "heads_body": 0})
        st["n"] += 1
        col = _column_for(f.left, page_columns.get(f.page), body_size)
        frame_w = col["width"] if col else col_width
        if f.width < frame_w * 0.85:
            st["short"] += 1
        psc = page_style_chars.get(f.page)
        bold_distinct = f.bold > 0.6 and (
            not psc or not psc["tot"] or psc["bold"] / psc["tot"] < 0.3)
        caps_distinct = f.all_caps and (
            not psc or not psc["tot"] or psc["caps"] / psc["tot"] < 0.3)
        if f.size_ratio >= 1.15 or bold_distinct or caps_distinct:
            st["strong"] += 1
        elif (f.family_distinct or f.color_distinct) \
                and f.size_ratio >= 0.95:
            st["weak"] += 1
            if f.size_ratio >= 1.02:
                st["weak_big"] += 1
        enum_led = bool(f.enumerator
                        and f.enumerator["scheme"] not in ("sup-ref",
                                                           "bullet"))
        if enum_led:
            st["enum_led"] += 1
        text = f.text.strip()
        if enum_led and text.startswith(f.enumerator["raw"]):
            text = text[len(f.enumerator["raw"]):]
        letters = sum(1 for c in text
                      if ("a" <= c <= "z") or ("A" <= c <= "Z"))
        digits = sum(1 for c in text if c.isdigit() and c.isascii())
        if (letters >= digits) if enum_led \
                else (letters >= 2 and letters >= digits):
            st["letter_dom"] += 1
        if f.starts_lower and not enum_led:
            st["lower_start"] += 1
        # A subtitle can separate a heading from its body, so
        # substantial text two rows down also qualifies (:1611-1613).
        b1 = f.below_feat
        if b1 is not None and (b1.n_char >= 30
                               or (b1.below_feat is not None
                                   and b1.below_feat.n_char >= 30)):
            st["heads_body"] += 1

    qualified = set()
    for key, st in stats.items():
        n = st["n"]
        if n < 2:
            continue
        if (st["strong"] + st["weak"]) / n < 0.7:
            continue
        if st["short"] / n < 0.5:
            continue
        if st["letter_dom"] / n < 0.5:
            continue
        if st["lower_start"] / n > 0.4:
            continue
        if st["heads_body"] / n < 0.25:
            continue
        if not st["strong"] and st["weak_big"] / n < 0.5 \
                and st["enum_led"] / n < 0.5:
            continue
        qualified.add(key)
    # doc-level bold rarity: the boldHeading fallback when no par model
    # is supplied (analyze_layout always passes one)
    tot_chars = sum(f.n_char for f in feats) or 1
    bold_rare = sum(f.n_char for f in feats if f.bold > 0.6) \
        / tot_chars < 0.3
    return qualified, stats, bold_rare


def _pass_running_furniture(pages, feats):
    """Recurring margin-band lines across pages → header/footer
    (analyzeLayout.js:1119-1235, recurrence gates simplified)."""
    n_pages = len(pages)
    if n_pages < 3:
        return set()
    keys = {}
    for f in feats:
        in_top = f.top_frac < 0.12
        in_bottom = f.bottom_frac > 0.88
        if not in_top and not in_bottom:
            continue
        # The reference's margin key strips digits ENTIRELY and keeps
        # only letters, then requires 3+ of them — so a data table's
        # pure-numeric rows near a page edge can never key a running-
        # header group (analyzeLayout.js:1134-1136; found by sink19).
        norm = re.sub(r"[^a-z]+", " ", re.sub(r"\d+", "",
                                              f.text.lower())).strip()
        if len(norm) < 3 or len(norm) > 80:
            continue
        band = "t" if in_top else "b"
        keys.setdefault((norm, band), []).append(f)
    furniture = set()
    for (norm, band), fs in keys.items():
        pages_with = len(set(f.page for f in fs))
        if pages_with < 3:
            continue
        # Positive evidence beyond recurrence: short mark, caps, or digit-
        # bearing stamp — not wrapped prose (which ends terminal + lowercase).
        sample = fs[0]
        prose = sample.ends_terminal and not sample.all_caps \
            and sample.n_char > 60
        if prose:
            continue
        furniture.update(id(f) for f in fs)
    return furniture


_BARE_MARKER_RE = re.compile(r"^[\d*†‡∗⁰¹²³⁴-⁹]{1,3}$")


def _absorb_note_continuations(feats, body_size, leading, fn_rule_y,
                               page_flush_m, body_left, furniture_ids):
    """Note-continuation absorption (analyzeLayout.js:1636-1719).

    Each footnote/endnote anchor absorbs following body lines in its own
    column at matching size into the note role; a bare marker line first
    absorbs its row-mate text (the marker hangs left of the note column,
    so the size/column regime comes from the text, not the marker).  A
    final sandwich pass rescues a note-interior line (e.g. a block
    quote's attribution) that sits right of every anchor's window."""
    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    for pf in by_page.values():
        srt = sorted(pf, key=lambda f: (f.top, f.left))
        for i, start in enumerate(srt):
            if start.role not in ("footnote", "endnote"):
                continue
            start_bare = bool(_BARE_MARKER_RE.match(
                re.sub(r"[.)\]/]+$", "", (start.text or "").strip())))
            size_ref = start.size
            cur = start
            col_right = start.left
            fy = fn_rule_y.get(start.page)
            region_note = fy is not None and start.top > fy
            if start_bare:
                mate = None
                for g in srt:
                    if g is start or g.role != "body" \
                            or g.top >= start.top or g.bottom <= start.top \
                            or g.left <= start.left:
                        continue
                    if id(g) in furniture_ids or g.line_num or g.folio \
                            or g.in_table:
                        continue
                    if mate is None or g.left < mate.left:
                        mate = g
                if mate is not None and mate.size >= start.size * 0.9 \
                        and (mate.size_ratio <= 1.08
                             or mate.size <= body_size * 1.08) \
                        and not (mate.bold >= 0.9 and start.bold < 0.6):
                    mate.role = start.role
                    size_ref = mate.size
                    col_right = max(col_right, mate.left)
                    cur = mate
            for j in range(i + 1, min(i + 81, len(srt))):
                g = srt[j]
                if g.role in ("footnote", "endnote"):
                    break
                # A bare tabbed-in marker's wrapped lines return to the
                # page flush; that widening needs a visibly-small note
                # or a separator-backed region (:1684-1687).
                if start_bare and cur is not start \
                        and (size_ref <= body_size * 0.88 or region_note):
                    left_min = min(start.left,
                                   page_flush_m.get(start.page, body_left))
                else:
                    left_min = start.left
                left_min -= body_size * 0.6
                if g.left < left_min or g.left - col_right > body_size \
                        * (3.5 if (start_bare and cur is start) else 2.5):
                    continue
                if g.role != "body":
                    break  # heading/furniture in the note's own column
                if id(g) in furniture_ids or g.line_num or g.folio \
                        or g.in_table:
                    break
                if g.top - cur.top > leading * 2.2:
                    break
                if start_bare and cur is start:
                    if g.size < start.size * 0.9 \
                            or not (g.size_ratio <= 1.08
                                    or g.size <= body_size * 1.08):
                        break
                    size_ref = g.size
                    col_right = max(col_right, g.left)
                elif abs(g.size - size_ref) > size_ref * 0.12:
                    break
                if g.bold >= 0.9 and start.bold < 0.6:
                    break
                g.role = start.role
                cur = g
        # sandwich rescue (:1706-1719)
        for i in range(1, len(srt) - 1):
            f = srt[i]
            if f.role != "body" or id(f) in furniture_ids or f.line_num \
                    or f.folio or f.in_table:
                continue
            up, dn = srt[i - 1], srt[i + 1]
            if up.role != dn.role or up.role not in ("footnote",
                                                     "endnote"):
                continue
            if f.top - up.top > leading * 2.2 \
                    or dn.top - f.top > leading * 2.2:
                continue
            if abs(f.size - up.size) > up.size * 0.12:
                continue
            if f.bold >= 0.9 and up.bold < 0.6:
                continue
            if f.left < min(up.left, dn.left) - body_size * 0.6 \
                    or f.right > max(up.right, dn.right) + body_size * 0.6:
                continue
            f.role = up.role


def classify_roles(pages, feats, body_size, furniture_ids=None,
                   page_columns=None, schemes=None, heading_model=None,
                   concordance=None, par_model=None, body_ref_pages=None,
                   suppress_notes=False):
    n_pages = len(pages)
    if furniture_ids is None:
        furniture_ids = _pass_running_furniture(pages, feats)
    page_columns = page_columns or {}
    schemes = schemes or {}

    # Body frame: the par model's peak-based bodyLeft / q0.9 bodyRight
    # (analyzeLayout.js:448-461) — the quantile fallback only covers a
    # par-model-less direct call (tests).
    if par_model is not None:
        body_left = par_model["bodyLeft"]
        body_right = par_model["bodyRight"]
        col_width = max(par_model["colWidth"], 1)
    else:
        body_left = quantile([f.left for f in feats], 0.25) or 0
        body_right = quantile([f.right for f in feats], 0.75) or 0
        col_width = max(body_right - body_left, 1)

    # size_ratio / color_distinct / family_distinct / gap_above were
    # assigned by _style_distinct_pass + _gap_below_pass in
    # analyze_layout (page-relative, analyzeLayout.js:355-634,
    # 1552-1570); classify_roles only consumes them.
    leading = par_model["leading"] if par_model is not None \
        else body_size * 1.2

    # Footnote separator rules (analyzeLayout.js:929-984): a short,
    # left-anchored drawn rule whose below-lines corroborate a note
    # region.  Lower-half rules corroborate on small text or an
    # active-scheme enumerator; an above-midline rule is trusted only
    # on an active-sequence superscript marker below it (:975-983).
    # The rule's y feeds the EVIDENCE-GATED note rules below — there is
    # deliberately no markerless "everything under the rule is a note"
    # re-tag (:2910-2912: mistyping body as a note is far worse).
    fn_rule_y: dict = {}
    by_page_fr: dict = {}
    for f in feats:
        by_page_fr.setdefault(f.page, []).append(f)
    sup_sc = (schemes or {}).get("sup-ref")
    page_flush_m = par_model["pageFlush"] if par_model else {}
    body_ref_pages = body_ref_pages or {}
    raw_sep_any: dict = {}
    for p, pf in by_page_fr.items():
        if suppress_notes:
            continue
        rules = getattr(pages[p], "rules", None) or []
        page_h = pages[p].height or 0
        if not rules or not page_h:
            continue
        flush = page_flush_m.get(p)
        if flush is None:
            flush = quantile([g.left for g in pf], 0.25) or body_left
        y = y_any = None
        for r in rules:
            if r["left"] > flush + body_size:
                continue
            # Union collinear segments before the width test: a
            # segmented table border still reads full-width and rejects.
            u_l, u_r = r["left"], r["right"]
            for q in rules:
                if abs(q["y"] - r["y"]) <= body_size * 0.3:
                    u_l = min(u_l, q["left"])
                    u_r = max(u_r, q["right"])
            if u_r - u_l > col_width * 0.6:
                continue
            # A rule inside a line's bbox is an underline, not a
            # separator.
            if any(g.top <= r["y"] <= g.bottom and r["left"] < g.right
                   and r["right"] > g.left for g in pf):
                continue
            if y_any is None or r["y"] < y_any:
                y_any = r["y"]
            if r["y"] < page_h * 0.5:
                continue
            if y is None or r["y"] < y:
                y = r["y"]
        if y_any is not None:
            raw_sep_any[p] = y_any
        if y is not None:
            corroborated = False
            for g in pf:
                if g.top <= y:
                    continue
                if g.size_ratio <= 0.86 \
                        and re.search(r"[A-Za-z]{2,}", g.text):
                    corroborated = True
                    break
                e = g.enumerator
                sc = schemes.get(e["scheme"]) if e else None
                if e and e["value"] is not None and sc and sc["active"] \
                        and e["value"] in sc["sequence_values"]:
                    corroborated = True
                    break
            if corroborated:
                fn_rule_y[p] = y
        elif y_any is not None:
            marker_below = False
            for g in pf:
                if g.top <= y_any or not g.first_word_sup \
                        or not g.enumerator \
                        or g.enumerator["value"] is None:
                    continue
                sc = schemes.get(g.enumerator["scheme"])
                if sc and sc["active"] \
                        and g.enumerator["value"] in sc["sequence_values"]:
                    marker_below = True
                    break
            if marker_below:
                fn_rule_y[p] = y_any

    # Cross-page footnote continuation (analyzeLayout.js:989-1084): a
    # footnote continued over a page break has no marker and sits at
    # body size, so classifyRole would leave it 'body'.  The open-note
    # test presumes notes normally end punctuated, measured first on
    # provably-complete notes (a note followed by another marker on the
    # same page cannot be open).
    fn_continues: dict = {}
    if not suppress_notes and len(pages) > 1:
        def _note_left_max(q):
            return page_flush_m.get(q, body_left) + body_size * 4

        def _active_marker(g):
            return (not g.line_num and g.first_word_sup and g.enumerator
                    and g.enumerator["scheme"] == "sup-ref"
                    and sup_sc is not None and sup_sc["active"]
                    and g.enumerator["value"] is not None
                    and g.enumerator["value"] in sup_sc["sequence_values"])

        def _marker_on_row(feats2, zone_top, g):
            # a standalone raised marker is its own letterless fragment
            # beside the note's first text line (:1047-1052)
            return any(m is not g and m.top >= zone_top
                       and m.top < g.bottom and m.bottom > g.top
                       and m.left < g.left and _active_marker(m)
                       for m in feats2)

        _TERM_RE = re.compile(r"[.!?)”’\"']\s*$")
        completed = completed_unpunct = 0
        for q, pfq in by_page_fr.items():
            if not (pages[q].height or 0):
                continue
            openers = sorted(
                (g for g in pfq if g.bottom_frac > 0.5
                 and _active_marker(g)), key=lambda g: g.top)
            for k in range(len(openers) - 1):
                zone = [g for g in pfq if not g.in_table and not g.line_num
                        and g.left < _note_left_max(q)
                        and openers[k].top <= g.top < openers[k + 1].top]
                if not zone:
                    continue
                last = max(zone, key=lambda g: g.top)
                completed += 1
                if not _TERM_RE.search((last.text or "").strip()):
                    completed_unpunct += 1
        notes_end_unpunct = completed >= 2 \
            and completed_unpunct * 2 > completed

        for p in range(1, len(pages)):
            sep_cur = raw_sep_any.get(p)
            if sep_cur is None:
                continue
            prev_h = pages[p - 1].height or 0
            if not prev_h:
                continue
            pf_prev = by_page_fr.get(p - 1, [])
            prev_note_top = raw_sep_any.get(p - 1, _INF)
            for g in pf_prev:
                if g.bottom / prev_h > 0.5 and _active_marker(g):
                    prev_note_top = min(prev_note_top, g.top)
            if prev_note_top == _INF:
                continue
            prev_notes = [g for g in pf_prev
                          if g.top >= prev_note_top and not g.in_table
                          and not g.all_caps
                          and re.search(r"[A-Za-z]{2,}", g.text)
                          and g.left < _note_left_max(p - 1)]
            if not prev_notes:
                continue
            prev_refs = body_ref_pages.get(p - 1)
            real_notes = []
            for g in prev_notes:
                if _active_marker(g) \
                        or _marker_on_row(pf_prev, prev_note_top, g):
                    real_notes.append(g)
                    continue
                if not prev_refs:
                    continue
                ws_ = g.line.words
                lead = re.sub(r"[.)\]]+$", "",
                              ((ws_[0].text or "") if ws_ else "").strip())
                if not re.fullmatch(r"[\d*†‡]{1,3}", lead) \
                        or lead not in prev_refs:
                    continue
                # a lowercase second word means the marker is running
                # body text, not a note opener (:1077-1078)
                if len(ws_) > 1 and re.match(r"[a-z]", ws_[1].text or ""):
                    continue
                real_notes.append(g)
            if not real_notes:
                continue
            last_prev = max(prev_notes, key=lambda g: g.bottom)
            if notes_end_unpunct or last_prev.bottom / prev_h <= 0.8 \
                    or _TERM_RE.search((last_prev.text or "").strip()):
                continue
            # a last line much larger than the real notes is body text
            # that reached the page bottom via a column break (:1066)
            if last_prev.size > max(g.size for g in real_notes) * 1.15:
                continue
            pf_cur = by_page_fr.get(p, [])
            cur_notes = [g for g in pf_cur
                         if g.top > sep_cur and not g.in_table
                         and not g.all_caps
                         and re.search(r"[A-Za-z]{2,}", g.text)
                         and g.left < _note_left_max(p)]
            if not cur_notes:
                continue
            cur_h = pages[p].height or 0
            if not cur_h \
                    or max(g.bottom for g in cur_notes) / cur_h < 0.75:
                continue
            opener = min(cur_notes, key=lambda g: g.top)
            if _active_marker(opener) \
                    or _marker_on_row(pf_cur, sep_cur, opener):
                continue  # a new note, not a continuation
            fn_continues[p] = last_prev.size
            # the continuation corroborates this page's separator
            fn_rule_y.setdefault(p, sep_cur)

    # Note-style profile (:1490-1537): doc-level gate for the full-size
    # leading-number note rule, plus the size/weight envelope note
    # claims are judged against.  Collected from evidence-confirmed
    # note lines, never from the envelope itself.
    baseline_marker_notes = 0
    for f in feats:
        if f.first_word_sup or f.bottom_frac <= 0.5:
            continue
        rp = body_ref_pages.get(f.page)
        if not rp:
            continue
        ws = f.line.words
        lead = re.sub(r"[.)\]/]+$", "",
                      (ws[0].text or "").strip() if ws else "")
        if not re.fullmatch(r"\d{1,3}", lead) or lead not in rp:
            continue
        fy = fn_rule_y.get(f.page)
        if fy is None or f.top <= fy:
            continue
        if f.left <= page_flush_m.get(f.page, body_left) + body_size * 2:
            baseline_marker_notes += 1
    uses_baseline_marker = baseline_marker_notes >= 1

    note_style_lines = []
    for f in feats:
        if f.endnote or f.footnote_block:
            note_style_lines.append(f)
            continue
        if f.bottom_frac <= 0.5:
            continue
        if sup_sc and sup_sc["active"] and f.first_word_sup \
                and f.enumerator and f.enumerator["scheme"] == "sup-ref" \
                and f.enumerator["value"] is not None \
                and f.enumerator["value"] in sup_sc["sequence_values"]:
            note_style_lines.append(f)
            continue
        rp = body_ref_pages.get(f.page)
        if not rp or f.all_caps:
            continue
        fy = fn_rule_y.get(f.page)
        bound = body_size * (2 if (fy is not None and f.top > fy) else 1)
        if f.left > page_flush_m.get(f.page, body_left) + bound:
            continue
        ws = f.line.words
        w0t = (ws[0].text or "").strip() if ws else ""
        lead = re.sub(r"[.)\]/]+$", "", w0t)
        glued = re.match(r"([*†‡∗]{1,3})[A-Za-z0-9(“\"'‘]", w0t)
        if ((re.fullmatch(r"[*†‡∗]{1,3}", lead) and lead in rp)
                or (glued and glued.group(1) in rp)
                or (re.fullmatch(r"\d{1,3}", lead) and lead in rp
                    and uses_baseline_marker)):
            note_style_lines.append(f)
    note_sizes = sorted(f.size for f in note_style_lines if f.size)
    np_opener_size = (quantile(note_sizes, 0.9) or 0) if note_sizes else 0
    np_notes_bold = len(note_style_lines) >= 2 and sum(
        1 for f in note_style_lines if f.bold > 0.6) \
        / len(note_style_lines) >= 0.5

    for fi, f in enumerate(feats):
        # prev = previous same-page line in reading order, already
        # classified (the reference classifies in reading order so each
        # line sees the line above it — analyzeLayout.js:1632-1635)
        prev = feats[fi - 1] if fi > 0 and feats[fi - 1].page == f.page \
            else None
        if f.line_num:
            f.role = "linenum"
            continue
        if f.folio:
            f.role = "pagenum"
            continue
        # Struct-tree overlay (tagged PDFs, M21): an H*/Title element is
        # a heading regardless of geometric evidence.
        if f.struct_role in ("H", "H1", "H2", "H3", "H4", "H5", "H6",
                             "Title"):
            f.role = "heading"
            continue
        t = f.text.strip()
        t_nospace = re.sub(r"\s+", "", t)
        at_edge = f.top_frac < 0.08 or f.bottom_frac > 0.92
        if at_edge and f.size_ratio >= 0.5 and _FOLIO_RE.match(t_nospace) \
                and re.search(r"\d", t_nospace):
            val = int(re.sub(r"\D", "", t_nospace) or "0")
            if val <= n_pages + 3:
                f.role = "pagenum"
                continue
        if at_edge:
            roman = re.sub(r"[\s\-—–]", "", t)
            if roman and _ROMAN_RE.match(roman):
                f.role = "pagenum"
                continue
        if _N_OF_M_RE.match(t) and at_edge:
            f.role = "pagenum"
            continue
        if id(f) in furniture_ids:
            f.role = "header" if (f.top_frac + f.bottom_frac) / 2 < 0.5 \
                else "footer"
            continue
        # A producer-tagged table cell is body before the footnote rules
        # can claim a wide table's small low cells (:2906-2907).
        if f.struct_role in ("TD", "TH"):
            f.role = "body"
            continue
        # Note rules (classifyRole :2909-2968), every one gated on
        # per-instance evidence — an in-text reference, an active
        # superscript-marker sequence, or the endnote/footnoteBlock
        # passes — never on geometry alone (:2910-2912: mistyping body
        # as a note is far worse than a deliberate miss).  The
        # cross-page footnoteContinues arm (:2926-2929, fed by the
        # :989-1084 continuation machinery) is not ported.
        skip_notes = bool(concordance and f.page in concordance)
        fn_y = None if skip_notes else fn_rule_y.get(f.page)
        note_envelope = ((f.size_ratio <= 1.08
                          or f.size <= body_size * 1.08
                          or (np_opener_size > 0
                              and f.size <= np_opener_size * 1.08))
                         and (f.bold < 0.9 or np_notes_bold))
        page_refs = body_ref_pages.get(f.page, ())
        flush_p = page_flush_m.get(f.page, body_left)
        # Isolated bare-digit marker below the separator whose value is
        # referenced in this page's text (:2920-2923).
        if (fn_y is not None and note_envelope and f.top > fn_y
                and f.bottom_frac > 0.5 and f.size_ratio <= 0.86
                and re.fullmatch(r"\d{1,3}", t)
                and f.left <= flush_p + body_size
                and t in page_refs):
            f.role = "footnote"
            continue
        # Cross-page continuation of an open footnote (:2926-2929):
        # the left bound reaches 4x bodySize to admit the note indent
        # while staying left of a centred folio; the size ceiling is
        # the OPEN note's own size.
        if (f.page in fn_continues and fn_y is not None and note_envelope
                and f.top > fn_y and not f.all_caps and not f.in_table
                and re.search(r"[A-Za-z]{2,}", t)
                and f.size <= (fn_continues[f.page] or 0) * 1.15
                and f.left < flush_p + body_size * 4):
            f.role = "footnote"
            continue
        # Endnote / footnote-block passes, envelope-gated so a bold
        # display heading inside a note-dominated block stays a heading
        # (:2930-2934).
        if not skip_notes and f.endnote and note_envelope:
            f.role = "endnote"
            continue
        if not skip_notes and f.footnote_block and note_envelope:
            f.role = "footnote"
            continue
        # Superscript-marker note opener in an active, reference-
        # corroborated sup-ref sequence (:2935-2944).
        if (not skip_notes and note_envelope and sup_sc
                and sup_sc["active"]
                and (f.bottom_frac > 0.5
                     or (fn_y is not None and f.top > fn_y))
                and not _CJK_RE.search(t)
                and f.first_word_sup and f.enumerator
                and f.enumerator["scheme"] == "sup-ref"
                and f.enumerator["value"] is not None
                and f.enumerator["value"] in sup_sc["sequence_values"]):
            f.role = "footnote"
            continue
        # Westlaw "FN"+number opener (:2945-2950).
        if (not skip_notes and note_envelope and sup_sc
                and sup_sc["active"] and f.enumerator
                and f.enumerator["scheme"] == "sup-ref"
                and re.match(r"FN\d", f.enumerator.get("raw") or "")
                and f.enumerator["value"] is not None
                and f.enumerator["value"] in sup_sc["sequence_values"]):
            f.role = "footnote"
            continue
        # Body-size footnote: leading label matches an in-text
        # reference on the SAME page (:2951-2968).
        if (not skip_notes and note_envelope and f.bottom_frac > 0.5
                and not f.all_caps and page_refs
                and f.left <= flush_p + body_size
                * (2 if (fn_y is not None and f.top > fn_y) else 1)):
            ws0 = f.line.words
            w0t = (ws0[0].text or "").strip() if ws0 else ""
            lead = re.sub(r"[.)\]/]+$", "", w0t)
            glued = re.match(r"([*†‡∗]{1,3})[A-Za-z0-9(“\"'‘]", w0t)
            if (lead in page_refs
                    or (glued and glued.group(1) in page_refs)):
                if re.fullmatch(r"[*†‡∗]{1,3}", lead) or glued:
                    f.role = "footnote"
                    continue
                if re.fullmatch(r"\d{1,3}", lead) and uses_baseline_marker:
                    f.role = "footnote"
                    continue
        # A definition-list item's bold lead term, and any table-region
        # line, stay body before the heading logic (:2970-2972).
        if f.struct_role == "LI" or f.in_table:
            f.role = "body"
            continue
        # Heading classification (classifyRole, analyzeLayout.js:
        # 2995-3063): signature membership / full-bold / display
        # singleton promote; the run-in and all-caps-only demotions
        # below then rescue wrapped prose the promotion paths misread.
        letters = sum(1 for c in t if c.isalpha() and c.isascii())
        digits = sum(1 for c in t if c.isdigit())
        letter_dom = letters >= 2 and letters >= digits
        # An all-marker heading ("IV.", "b.") is under-lettered: re-judge
        # on the text after a sequence-corroborated enumerator, whose
        # letters-vs-digits test still keeps digit junk out (:2979-2992).
        en_ = f.enumerator
        if not letter_dom and en_ \
                and en_["scheme"] not in ("sup-ref", "bullet") \
                and en_.get("value") is not None \
                and en_["value"] in schemes.get(en_["scheme"], {}).get(
                    "sequence_values", ()):
            rest = t[len(en_["raw"]):] if t.startswith(en_["raw"]) else t
            rl = sum(1 for c in rest
                     if ("a" <= c <= "z") or ("A" <= c <= "Z"))
            rd = sum(1 for c in rest if c.isdigit() and c.isascii())
            letter_dom = rl >= rd
        own_col = _column_for(f.left, page_columns.get(f.page), body_size)
        frame_left = own_col["left"] if own_col else body_left
        frame_right = own_col["right"] if own_col else body_right
        frame_w = max(frame_right - frame_left, 1)
        short = f.width < frame_w * 0.85
        sig_member = full_bold_heading = False
        if heading_model is not None and letter_dom:
            sigs, sig_stats, bold_rare = heading_model
            # A full-width line matching a bold heading tuple promotes
            # only when uniformly bold (:2998-2999).
            sig_member = f.sig_key in sigs \
                and (short or f.bold <= 0.6 or f.bold >= 0.9)
            # A fully-bold line is a heading even at body size only
            # under model.boldHeading (>=8 body lines, <20% of them
            # bold — :3000-3006), unless its style tuple is
            # prose-shaped.  The doc-wide flag, NOT the sig model's
            # char-fraction bold_rare: a short doc (<8 body lines)
            # never promotes on weight alone.
            ts_ = sig_stats.get(f.sig_key)
            tuple_prose = bool(ts_ and ts_["n"] >= 2
                               and ts_["lower_start"] / ts_["n"] > 0.4
                               and ts_["short"] / ts_["n"] < 0.5)
            bold_heading_ok = par_model["boldHeading"] \
                if par_model is not None else bold_rare
            full_bold_heading = (not sig_member and not tuple_prose
                                 and f.bold >= 0.9 and bold_heading_ok
                                 and f.n_char <= 200)
        display_singleton = False
        if not sig_member and f.size_ratio >= 1.15 and f.n_char <= 200 \
                and letter_dom:
            li = f.left - frame_left
            ri = frame_right - f.right
            centered = li > body_size and ri > body_size \
                and abs(li - ri) < max(body_size * 1.5, min(li, ri) * 0.6)
            # a display line preceded by a real gap (or nothing above)
            # promotes even at full width (:3016-3017)
            display_singleton = short or centered \
                or f.gap_above > leading * 1.2 or f.size_ratio >= 2.5
        # Form-based sub-heading: a heading face the signature model
        # cannot qualify because the doc sets prose in it too; the
        # deep-indent gate separates it from a flush citation connector
        # (:3021-3027).
        enum_set_off = False
        if not sig_member and en_ \
                and en_["scheme"] not in ("bullet", "sup-ref") \
                and f.family_distinct and par_model is not None:
            own_col_l = own_col["left"] if own_col else \
                par_model["pageFlush"].get(f.page, par_model["bodyLeft"])
            enum_set_off = f.left > own_col_l \
                + max(par_model["indentDelta"], 0) + body_size \
                and letters >= 2 and letters >= digits
        if sig_member or full_bold_heading or display_singleton \
                or enum_set_off:
            # Demotions (:3030-3063) — the promotion paths cannot see
            # flow context; these rescue wrapped prose and in-prose
            # all-caps designations using the previous line.
            prev_prose = prev is not None and prev.role in (
                "body", "footnote", "endnote")
            # Bold emphasis phrase wrapped so its tail lands
            # majority-bold: prev's last word bold + unfinished
            # sentence → continuation, not a heading (:3032-3039).
            bold_only = f.size_ratio < 1.15 and not f.all_caps \
                and f.bold > 0.6
            enum_led = bool(f.enumerator and f.enumerator["scheme"]
                            not in ("bullet", "sup-ref"))
            prev_last_bold = bool(
                prev is not None and prev.line.words
                and prev.line.words[-1].style.bold)
            if bold_only and prev_prose and not prev.ends_terminal \
                    and prev_last_bold and not enum_led:
                f.role = "body"
                continue
            # An all-caps body-size, non-bold, body-family line is an
            # in-prose designation, not a title (:3040-3055): a /P tag
            # is positive producer evidence; otherwise judge by the
            # page's gap regime / the running sentence.
            all_caps_only = f.all_caps and f.size_ratio < 1.15 \
                and f.bold <= 0.6 and not f.color_distinct \
                and not f.family_distinct
            if all_caps_only and f.struct_role == "P":
                f.role = "body"
                continue
            if all_caps_only and prev_prose and par_model is not None:
                gap_before = par_model["pageParaGap"].get(
                    f.page, par_model["paraGapThresh"])
                import math as _math
                if _math.isfinite(gap_before) \
                        and f.top - prev.top < gap_before:
                    f.role = "body"
                    continue
                if not _math.isfinite(gap_before) \
                        and not prev.ends_terminal:
                    f.role = "body"
                    continue
            # Weak all-caps acronym stranded at the hang column of a
            # hanging-indent document (:3056-3062).
            if par_model is not None and f.size_ratio < 1.15 \
                    and not f.color_distinct \
                    and not f.family_distinct and prev_prose \
                    and not prev.ends_terminal:
                at_hang = par_model["bodyTextLeft"] > \
                    par_model["bodyLeft"] + body_size * 0.5 \
                    and abs(f.left - par_model["bodyTextLeft"]) \
                    < body_size * 0.5
                if at_hang:
                    f.role = "body"
                    continue
            f.role = "heading"
            continue
        f.role = "body"

    # Note-continuation absorption (analyzeLayout.js:1636-1719): a
    # note's wrapped lines carry no marker, so identify them by column
    # position + matching style, never extraction-order adjacency.
    _absorb_note_continuations(feats, body_size, leading, fn_rule_y,
                               page_flush_m, body_left, furniture_ids)

    # Producer /Artifact tagging: artifact-dominated margin-band lines are
    # furniture — unless the producer tags body content artifact too
    # (artifactUnreliable, analyzeLayout.js model.artifactUnreliable).
    art_chars = sum(f.n_char for f in feats if f.artifact_frac > 0.6)
    all_chars = sum(f.n_char for f in feats) or 1
    if 0 < art_chars / all_chars <= 0.5:
        for f in feats:
            if f.role != "body" or f.artifact_frac <= 0.6:
                continue
            if f.top_frac < 0.15:
                f.role = "header"
            elif f.bottom_frac > 0.88:
                f.role = "footer"

    # Bare-integer note-marker chains (analyzeLayout.js:2057-2088):
    # markers with no trailing dot and no superscript carry no
    # enumerator, so geometricBreak's numbering rule never splits the
    # note block.  A >=2-member +1 chain of leading integers among a
    # page's footnote lines flags each chain member footnoteOpener; the
    # chain's missing first note (misclassified body, bare digit equal
    # to firstVal-1 just above the block) is rescued.
    by_page_fo: dict = {}
    for f in feats:
        by_page_fo.setdefault(f.page, []).append(f)
    fo_leading = par_model["leading"] if par_model else body_size * 1.2
    for p, pf in by_page_fo.items():
        fn = sorted((f for f in pf if f.role == "footnote"),
                    key=lambda f: f.top)
        if len(fn) < 2:
            continue
        lead_vals = []
        for f in fn:
            m = re.match(r"(\d{1,3})(?=\D|$)", (f.text or "").strip())
            lead_vals.append(int(m.group(1)) if m else None)
        best: list = []
        for a in range(len(fn)):
            if lead_vals[a] is None:
                continue
            seq = [a]
            expected = lead_vals[a] + 1
            for j in range(a + 1, len(fn)):
                if lead_vals[j] == expected:
                    seq.append(j)
                    expected += 1
            if len(seq) > len(best):
                best = seq
        if len(best) < 2:
            continue
        for idx in best:
            fn[idx].footnote_opener = True
        first_val = lead_vals[best[0]]
        top_fn = fn[0].top
        flush_max = page_flush_m.get(p, body_left) + body_size
        for f in pf:
            if f.role != "body" or f.top >= top_fn \
                    or top_fn - f.top > fo_leading * 3:
                continue
            if f.size_ratio > 0.86 or f.left > flush_max:
                continue
            if re.fullmatch(r"\d{1,3}", (f.text or "").strip()) \
                    and int(f.text.strip()) == first_val - 1:
                f.role = "footnote"
                f.footnote_opener = True


def _pass_list_confirm(feats, body_size, body_text_left, schemes) -> None:
    """Local-list confirmation (analyzeLayout.js:1802-1872): 'alpha-dot'
    and 'roman-dot' stay non-splittable doc-wide (a bare line-leading
    "a."/"ii." is usually an initial or citation fragment); a
    contiguous, consecutively-valued, column-aligned run of >=2 markers
    recovers the genuine list — runs of >=3 confirm anywhere, runs of 2
    only at an indented column a >=3 run already proved.  A lone dash
    doubles as inline punctuation, so dash bullets confirm only in
    >=3-aligned runs."""
    for scheme in ("alpha-dot", "roman-dot"):
        runs: list = []
        run: list = []
        run_col = 0.0
        broken = False

        def close_run():
            if len(run) >= 2:
                runs.append({"members": list(run), "column": run_col})
            run.clear()

        for f in feats:
            en = f.enumerator
            is_marker = bool(en and en["scheme"] == scheme
                             and en.get("value") is not None
                             and f.role == "body")
            if is_marker:
                if run and not broken \
                        and en["value"] == run[-1].enumerator["value"] + 1 \
                        and abs(f.left - run_col) <= body_size * 0.5:
                    run.append(f)
                else:
                    close_run()
                    run.append(f)
                    run_col = f.left
                    broken = False
            elif run and not broken:
                # only structural interveners break a run: a heading (a
                # new section) or a marker of a different ACTIVE scheme
                if f.role in ("heading", "title"):
                    broken = True
                elif en and en["scheme"] != scheme \
                        and schemes.get(en["scheme"], {}).get("active"):
                    broken = True
        close_run()
        proven = [r["column"] for r in runs if len(r["members"]) >= 3]
        for r in runs:
            indented = r["column"] > body_text_left + body_size * 0.5
            if len(r["members"]) >= 3 or (
                    indented and any(abs(c - r["column"]) <= body_size * 0.5
                                     for c in proven)):
                for m in r["members"]:
                    m.list_confirmed = True

    # dash-bullet runs (>=3 aligned)
    runs2: list = []
    run2: list = []
    run_col = 0.0
    broken = False

    def is_dash(f):
        return bool(f.enumerator and f.enumerator["scheme"] == "bullet"
                    and re.fullmatch(r"[–—-]", f.enumerator["raw"] or ""))

    def close_run2():
        if len(run2) >= 3:
            runs2.append(list(run2))
        run2.clear()

    for f in feats:
        if is_dash(f) and f.role == "body":
            if run2 and not broken \
                    and abs(f.left - run_col) <= body_size * 0.5:
                run2.append(f)
            else:
                close_run2()
                run2.append(f)
                run_col = f.left
                broken = False
        elif run2 and not broken:
            en = f.enumerator
            if f.role in ("heading", "title"):
                broken = True
            elif en and en["scheme"] == "bullet":
                broken = True  # a different bullet glyph: a new list
            elif en and schemes.get(en["scheme"], {}).get("active"):
                broken = True
    close_run2()
    for r in runs2:
        for m in r:
            m.list_confirmed = True


_ROLE_TO_TYPE = {
    "heading": "title", "footnote": "footnote", "endnote": "endnote",
    "pagenum": "pagenum", "header": "header", "footer": "footer",
    "linenum": "linenum", "body": "body",
}


# Geometric break reasons that may split even inside one structure
# element — breaks that cannot occur mid-paragraph in wrapped prose
# (decideBreak isStrongBreak, analyzeLayout.js:2380-2391, mapped onto
# this repo's reflow reason strings).
def _is_strong_break(reason: str) -> bool:
    """Geometric breaks that cannot occur mid-paragraph in wrapped prose,
    so they may split even inside one structure element (isStrongBreak,
    analyzeLayout.js:2380-2391; the indentStrong arm is applied by the
    caller, which knows the model)."""
    return (reason in ("paragraph gap", "separator rule",
                       "footnote marker", "bullet", "drop cap",
                       "hanging marker", "new column", "page wrap",
                       "orientation change", "line-number boundary")
            or reason.startswith("numbering")
            or reason.startswith("role change"))


def _apply_struct_elements(pages, feats, indent_strong=False) -> None:
    """Struct-element paragraph overlay (decideBreak struct branch,
    analyzeLayout.js:2307-2371): on tagged pages, when adjacent lines
    both carry a trustworthy owning element,

    - the SAME element means one paragraph — merge a geometric split
      back unless its reason is a strong break (producer grouping beats
      geometric over-splitting, which is what the tags exist to fix);
    - DIFFERENT elements mark a producer-authored boundary — split a
      geometric merge unless the second line reads as a sentence
      continuation (starts lowercase after an unterminated line).

    Scope-honest subset: the element-faithful / indent-regime
    refinements (:2337-2357) are not modeled; role-boundary splits are
    preserved by never merging across differing par types."""
    elem_of = {id(f.line): f.struct_elem for f in feats
               if f.struct_elem is not None}
    if not elem_of:
        return
    feat_of = {id(f.line): f for f in feats}
    for page in pages:
        if not page.pars:
            continue
        # 1) split inside pars at element boundaries
        new_pars = []
        for par in page.pars:
            groups = [[par.lines[0]]] if par.lines else []
            for prev_ln, ln in zip(par.lines, par.lines[1:]):
                ea, eb = elem_of.get(id(prev_ln)), elem_of.get(id(ln))
                split = ea is not None and eb is not None and ea != eb
                if split:
                    fb = feat_of.get(id(ln))
                    # A lowercase start continues the previous sentence
                    # regardless of its punctuation (the reference's
                    # default struct path merges on startsLower ALONE,
                    # analyzeLayout.js:2369) — except a lowercase
                    # close-paren enumerator ("a)", "i)"), which is a
                    # real sibling list item (:2358-2360).
                    if fb is not None and fb.starts_lower and not (
                            fb.enumerator and
                            str(fb.enumerator.get("raw", ""))
                            .endswith(")")):
                        split = False  # struct continuation
                if split:
                    groups.append([ln])
                else:
                    groups[-1].append(ln)
            if len(groups) <= 1:
                new_pars.append(par)
                continue
            for gi, lns in enumerate(groups):
                np_ = Par(page, bbox_union([x.bbox for x in lns]))
                np_.lines = lns
                np_.type = par.type
                np_.reason = par.reason if gi == 0 else "struct element"
                for x in lns:
                    x.par = np_
                new_pars.append(np_)
        # 2) merge adjacent pars whose boundary lines share an element
        merged: list = []
        for par in new_pars:
            if merged and par.lines and merged[-1].lines:
                prev = merged[-1]
                ea = elem_of.get(id(prev.lines[-1]))
                eb = elem_of.get(id(par.lines[0]))
                if ea is not None and ea == eb \
                        and prev.type == par.type \
                        and not (_is_strong_break(par.reason or "")
                                 or (indent_strong and (par.reason or "")
                                     == "first-line indent")):
                    prev.lines.extend(par.lines)
                    for x in par.lines:
                        x.par = prev
                    prev.bbox = bbox_union([x.bbox for x in prev.lines])
                    prev.reason = prev.reason or "struct element (same)"
                    continue
            merged.append(par)
        page.pars = merged


def analyze_layout(pages: list, outline_titles=None,
                   pdf_type=None) -> None:
    """Assign paragraphs + semantic roles across all pages of one document.

    Mutates each page: sets page.pars (geometric breaks from
    assign_paragraphs, split further at role boundaries) with par.type.

    ``outline_titles``: document bookmark titles (PDF outline) — a line
    whose normalized text equals a title is a heading regardless of the
    geometric evidence (outline-heading overlay, the outlineIndex.js:151
    structural signal consumed by applyDocParagraphLayout).

    ``pdf_type``: 'text'|'ocr'|'image' origin of the pages — the
    scanned-transcript note-suppression gate (analyzeLayout.js:635-648)
    applies only to OCR-origin data.
    """
    # Stamp text-detected data-table regions (numeric-dominated only —
    # a transcript's line-number margin also reads as a columnar table
    # and must stay eligible for the furniture rules,
    # parsePdfDoc.js:1224-1252) so in_table can suppress folio/linenum
    # rules inside genuine tables on OCR-imported pages.  PDF-parsed
    # pages (text_source None) are EXCLUDED: their tables come solely
    # from the faithful detectPdfTables pipeline, and layering the
    # OCR-side whitespace detector on top adds regions the reference
    # never detects (found by sink15 seed 68).
    from .tables import detect_tables_in_page
    for page in pages:
        if getattr(page, "text_source", None) is None:
            continue
        try:
            detected = detect_tables_in_page(page)
        except Exception:
            # detection is best-effort; the stamping below must not be
            # silently disabled by an unrelated per-page error
            detected = []
        if detected:
            existing = {(js_round(t["left"]), js_round(t["top"]))
                        for t in page.table_boxes}
            for bb in detected:
                numeric = total = 0
                for ln in page.lines:
                    for w in ln.words:
                        cx = (w.bbox.left + w.bbox.right) / 2
                        cy = (w.bbox.top + w.bbox.bottom) / 2
                        if not (bb.left <= cx <= bb.right
                                and bb.top <= cy <= bb.bottom):
                            continue
                        total += 1
                        wt = w.text.strip()
                        if any(c.isdigit() for c in wt) \
                                and re.match(r"^[\d.,%()$/-]+$", wt):
                            numeric += 1
                if total < 6 or numeric / total < 0.5:
                    continue
                key = (js_round(bb.left), js_round(bb.top))
                if key not in existing:
                    existing.add(key)
                    page.table_boxes.append({
                        "left": bb.left, "top": bb.top,
                        "right": bb.right, "bottom": bb.bottom})

    feats = _features(pages)
    if not feats:
        for page in pages:
            if not page.pars:
                assign_paragraphs(page, page.angle or 0)
        return
    body_size = _body_size(feats)
    for f in feats:
        f.size_ratio = (f.size / body_size) if body_size else 1.0
    _pass_line_numbers(pages, feats, body_size)
    # Page-relative size ratios + color/family distinction + the
    # per-page bold/caps body fractions (analyzeLayout.js:355-634) —
    # after the line-number pass (its stale-feature refresh), before
    # every consumer of sizeRatio.
    page_body_size = _page_body_size(feats, body_size)
    page_style_chars = _style_distinct_pass(feats, page_body_size,
                                            body_size)
    _pass_folios(pages, feats)
    furniture_ids = _pass_running_furniture(pages, feats)
    schemes = _detect_numbering_schemes(feats)

    # Note suppression on scanned line-numbered transcripts
    # (analyzeLayout.js:635-648): OCR-baked margin line numbers read as
    # note markers and would cascade testimony pages into 'footnote'.
    suppress_notes = False
    if pdf_type in ("ocr", "image"):
        locked = leading_ln = 0
        for f in feats:
            if f.line_num:
                locked += 1
                continue
            ws = f.line.words
            w0 = (ws[0].text or "") if ws else ""
            if re.fullmatch(r"\d{1,2}", w0) and 1 <= int(w0) <= 35:
                leading_ln += 1
        suppress_notes = locked >= 10 or leading_ln >= len(feats) * 0.2

    if suppress_notes:
        body_ref_labels, body_ref_pages = set(), {}
    else:
        body_ref_labels, body_ref_pages = _collect_body_ref_labels(pages)

    # sup-ref corroboration (analyzeLayout.js:789-812): the scheme's
    # sequence values are the would-be note openers, so a run of them is
    # self-corroborating — an independent in-text reference must confirm
    # it.  Conversely a line-leading superscript integer matching an
    # in-text reference is strong evidence on its own, so the scheme
    # activates for exactly those anchored values even without a >=3 run.
    sup_run = schemes.get("sup-ref")
    if sup_run:
        if suppress_notes:
            sup_run["active"] = False
        if sup_run["active"] and not any(
                str(v) in body_ref_labels
                for v in sup_run["sequence_values"]):
            sup_run["active"] = False
        if not suppress_notes and not sup_run["active"]:
            anchored = set()
            for f in feats:
                # A line number carries the same raised-digit sup-ref
                # enumerator as a note marker (:803-806).
                if f.line_num or _CJK_RE.search(f.text):
                    continue
                if f.first_word_sup and f.enumerator \
                        and f.enumerator["scheme"] == "sup-ref" \
                        and f.enumerator["value"] is not None \
                        and str(f.enumerator["value"]) in body_ref_labels:
                    anchored.add(f.enumerator["value"])
            if anchored:
                sup_run["active"] = True
                sup_run["sequence_values"] = anchored

    _pass_endnotes(pages, feats, schemes, body_ref_labels, body_size,
                   furniture_ids)
    by_page: dict = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    page_columns = {p: _detect_columns(pf, body_size)
                    for p, pf in by_page.items()}
    _pass_hang_markers(pages, feats, page_columns, body_size)
    concordance = _concordance_pages(feats)
    body_left_hm = quantile([f.left for f in feats], 0.25) or 0
    body_right_hm = quantile([f.right for f in feats], 0.75) or 0
    # The layout model (gap regimes, leading, indent convention) is
    # role-independent and the reference builds it (Phase 2) BEFORE role
    # classification (Phase 3) — classifyRole's heading demotions consume
    # pageParaGap/leading/bodyTextLeft (analyzeLayout.js:3030-3063).
    from .parbreaks import build_par_model, rebuild_pars
    model = build_par_model(pages, feats, body_size, page_columns,
                            schemes)
    # gapAbove + belowFeat (:1552-1570) feed both the sig model's
    # headsBody stat and classifyRole's display-singleton gap arm.
    _gap_below_pass(feats, model["leading"])
    heading_model = _heading_signature_model(
        feats, body_size, page_columns,
        max(body_right_hm - body_left_hm, 1),
        furniture_ids=furniture_ids, page_style_chars=page_style_chars)
    classify_roles(pages, feats, body_size, furniture_ids=furniture_ids,
                   page_columns=page_columns, schemes=schemes,
                   heading_model=heading_model, concordance=concordance,
                   par_model=model, body_ref_pages=body_ref_pages,
                   suppress_notes=suppress_notes)

    if outline_titles:
        import re as _re
        norm = {_re.sub(r"\s+", " ", t).strip().lower()
                for t in outline_titles if t}
        for f in feats:
            text = " ".join(w.text for w in f.line.words)
            if _re.sub(r"\s+", " ", text).strip().lower() in norm:
                f.role = "heading"

    # Doc-level paragraph re-grouping (analyzeLayout.js:2133-2200): the
    # decideBreak pass overwrites the per-page reflow grouping with
    # document-informed break decisions (indent convention, justified
    # ends-early, gap regimes).  assign_paragraphs stays the fallback
    # for feature-less pages, mirroring the reference's in-worker
    # provisional result.
    _pass_list_confirm(feats, body_size, model["bodyTextLeft"], schemes)
    # Row fragments + block-quote inset regions (analyzeLayout.js:
    # 1931-2045) — after role classification, the reference's phase
    # order, so the region walk sees final body roles.
    from .parbreaks import assign_block_regions
    assign_block_regions(pages, feats, model, page_columns, body_size)
    feats = _split_fused_line_numbers(pages, feats)
    rebuild_pars(pages, feats, model, _ROLE_TO_TYPE)

    _apply_struct_elements(pages, feats,
                           indent_strong=model["indentStrong"])

    # Blockquote re-tag: a body paragraph of >=2 lines inset symmetrically
    # from BOTH doc body margins (analyzeLayout.js:2212-2237).  Hanging-
    # marker and split-line-number paragraphs are excluded — their bbox
    # shift reads as a false inset.
    body_left = quantile([f.left for f in feats], 0.25) or 0
    body_right = quantile([f.right for f in feats], 0.75) or 0
    col_width = max(body_right - body_left, 1)
    skip_pars = set()
    quote_pars = set()
    for f in feats:
        if (f.hang_marker or f.ln_split) and f.line.par is not None:
            skip_pars.add(id(f.line.par))
        if f.struct_role in ("BlockQuote", "Quote") \
                and f.line.par is not None:
            quote_pars.add(id(f.line.par))
    for page in pages:
        for par in page.pars:
            if par.type != "body" or id(par) in skip_pars:
                continue
            left_indent = par.bbox.left - body_left
            right_inset = body_right - par.bbox.right
            geo = len(par.lines) >= 2 \
                and left_indent > col_width * 0.035 \
                and right_inset > col_width * 0.035 \
                and abs(left_indent - right_inset) < col_width * 0.06
            if id(par) in quote_pars or geo:
                par.type = "blockquote"

    _link_footnotes(pages)


_FN_MARKER_LINK_RE = re.compile(r"^[\d*†‡]{1,3}$")


def _fn_label(t: str) -> str:
    return re.sub(r"[.)\]]+$", "", (t or "").strip())


def _link_footnotes(pages):
    """Footnote linking (analyzeLayout.js:2239-2281): pair each
    footnote/endnote paragraph with the nearest PRECEDING unlinked
    in-text superscript marker carrying the same label, in reading
    order — the same par.footnoteRefId <-> word.footnoteParId link the
    .docx importer produces, so exporters emit real Word footnotes."""
    body_markers = []  # (order, word, label) ascending by reading order
    for p, page in enumerate(pages):
        for li, line in enumerate(page.lines):
            if line.par is not None and \
                    line.par.type in ("footnote", "endnote"):
                continue  # a marker inside a note is not a body ref
            for word in line.words:
                if not word.style.sup:
                    continue
                label = _fn_label(word.text)
                if _FN_MARKER_LINK_RE.match(label):
                    body_markers.append((p * 100000 + li, word, label))
    for p, page in enumerate(pages):
        for par in page.pars:
            if par.type not in ("footnote", "endnote") \
                    or par.footnote_ref is not None:
                continue
            label = None
            if par.par_num and _FN_MARKER_LINK_RE.match(
                    _fn_label(par.par_num)):
                label = _fn_label(par.par_num)
            if not label:
                w0 = par.lines[0].words[0] \
                    if par.lines and par.lines[0].words else None
                if w0 is not None and w0.style.sup and \
                        _FN_MARKER_LINK_RE.match(_fn_label(w0.text)):
                    label = _fn_label(w0.text)
            if not label:
                continue
            try:
                fn_line_idx = page.lines.index(par.lines[0])
            except (ValueError, IndexError):
                fn_line_idx = 99999
            fn_order = p * 100000 + fn_line_idx
            best = None
            for order, word, mlabel in body_markers:
                if order >= fn_order:
                    break
                if word.footnote_par is not None or mlabel != label:
                    continue
                best = word
            if best is not None:
                par.footnote_ref = best.id
                best.footnote_par = par


def _split_fused_line_numbers(pages, feats):
    """Split a fused case-B margin number off its body line into a
    standalone linenum LINE inserted into page.lines in reading order
    (analyzeLayout.js:2091-2128): the body line then opens with its
    real first word and regroups through the inline-line-number
    transparency, and writeText emits the number as its own line like
    the reference.  Returns the (possibly extended) feats list."""
    from ..model import Line, bbox_union
    out = []
    for f in feats:
        ws = f.line.words
        j = 0
        if not f.line_num and ws and ws[0].line_num:
            while j < len(ws) and ws[j].line_num:
                j += 1
        if not (0 < j < len(ws)):
            out.append(f)
            continue
        ln_words = ws[:j]
        ln_line = Line(f.line.page, bbox_union(w.bbox for w in ln_words),
                       list(f.line.baseline), f.line.asc_height,
                       f.line.x_height)
        ln_line.words = list(ln_words)
        ln_line.orientation = f.line.orientation
        lf = _Feat()
        for slot in _Feat.__slots__:
            try:
                setattr(lf, slot, getattr(f, slot))
            except AttributeError:
                pass
        lf.line = ln_line
        lf.line_num = True
        lf.role = "linenum"
        lf.hang_marker = False
        lf.folio = False
        lf.left = ln_line.bbox.left
        lf.right = ln_line.bbox.right
        lf.text = " ".join(w.text for w in ln_words)
        lf.n_char = sum(len(w.text) or 1 for w in ln_words)
        f.line.words = ws[j:]
        f.line.bbox = bbox_union(w.bbox for w in f.line.words)
        f.text = " ".join(w.text for w in f.line.words)
        f.left = f.line.bbox.left
        f.right = f.line.bbox.right
        f.ln_split = True
        page = pages[f.page]
        try:
            li = page.lines.index(f.line)
            page.lines.insert(li, ln_line)
        except ValueError:
            pass
        out.append(lf)
        out.append(f)
    return out
