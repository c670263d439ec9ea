"""Document-level layout analysis: furniture roles + headings + footnotes.

A documented subset of /root/reference/js/import/analyzeLayout.js (3454 LoC);
this engine ports the passes that drive text extraction over Common-Crawl
style corpora and defers the long tail (struct-tree overlays, numbering
schemes, concordance pages, hanging markers) to later rounds:

- line-number columns, case A standalone   (analyzeLayout.js:189-333)
- folio sequence tracking + edge folios    (classifyRole, :2869-2905)
- running header/footer recurrence         (:1119-1235)
- footnote start via superscript marker    (:2938-2960, simplified)
- heading via size ratio / centering       (:3000-3070, simplified)
- body-size document style model           (:171-188)

Roles map to par types as in analyzeLayout.js:2175-2181 (heading → 'title').

This pass needs all pages of one document together; with doc = row it runs
per-row inside ``map_batches`` — no shuffle required.
"""

from __future__ import annotations

import re

from ..functions.stats import quantile
from ..model import Page, Par, bbox_union
from .reflow import assign_paragraphs

_INT_RE = re.compile(r"^\d{1,4}$")
_FOLIO_RE = re.compile(r"^[\d.\-—–]{1,5}$")
_ROMAN_RE = re.compile(
    r"^m{0,3}(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$", re.I)
_N_OF_M_RE = re.compile(r"^\d{1,3}\s+of\s+\d{1,3}$")
_SUP_MARKER_RE = re.compile(r"^[\d*†‡]{1,3}$")
_LETTER_RE = re.compile(r"[A-Za-z]")

LN_LEFT_FRAC = 0.4
LN_GATE_RUN = 8
LN_CONF_RUN = 6
LN_RESCUE_RUN = 4
LN_MAX_START = 30
LN_LOCK_PAGES = 3


class _Feat:
    __slots__ = ("page", "line_idx", "line", "left", "right", "width", "top",
                 "bottom", "center", "size", "text", "n_char", "all_caps",
                 "ends_terminal", "starts_lower", "first_word_sup",
                 "top_frac", "bottom_frac", "role", "size_ratio", "line_num",
                 "folio")

    def __init__(self):
        self.role = "body"
        self.size_ratio = 1.0
        self.line_num = False
        self.folio = False


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
            f.n_char = sum(len(w.text) for w in line.words)
            letters = sum(1 for c in f.text if c.isalpha() and c.isascii())
            upper = sum(1 for c in f.text if c.isupper() and c.isascii())
            f.all_caps = letters >= 2 and upper / letters >= 0.8
            last = line.words[-1].text if line.words else ""
            f.ends_terminal = bool(re.search(r"[.!?:][\"')”’]?\s*$", last))
            f.starts_lower = bool(re.match(r"[a-z]", line.words[0].text))
            f.first_word_sup = bool(line.words[0].style.sup)
            f.top_frac = b.top / page_h if page_h else 0
            f.bottom_frac = b.bottom / page_h if page_h else 0
            feats.append(f)
    return feats


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
    """Case A standalone left-margin integer columns
    (analyzeLayout.js:189-322, case B omitted this round)."""
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
            t = f.text.strip()
            if not _INT_RE.match(t):
                continue
            cands.append({"f": f, "value": int(t), "x": f.left, "top": f.top})
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
        start_ok = best_run[0]["value"] <= LN_MAX_START
        page_runs[p] = {"run": len(best_run), "members": best_run,
                        "col_x": col_x, "cands": cands,
                        "start_val": best_run[0]["value"]}
        if len(best_run) >= LN_GATE_RUN and start_ok:
            gate_fired = True

    if not gate_fired:
        return

    recur = [(p, r) for p, r in page_runs.items()
             if r["run"] >= LN_CONF_RUN and r["start_val"] <= LN_MAX_START]
    ln_ceil = 0
    for _, r in page_runs.items():
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
                    c["f"].line_num = True


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


def _pass_running_furniture(pages, feats):
    """Recurring margin-band lines across pages → header/footer
    (analyzeLayout.js:1119-1235, recurrence gates simplified)."""
    n_pages = len(pages)
    if n_pages < 3:
        return set()
    keys = {}
    for f in feats:
        in_top = f.top_frac < 0.15
        in_bottom = f.bottom_frac > 0.88
        if not in_top and not in_bottom:
            continue
        norm = re.sub(r"\d+", "#", re.sub(r"\s+", " ", f.text)).strip().lower()
        if not norm or len(norm) > 80:
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


def classify_roles(pages, feats, body_size):
    n_pages = len(pages)
    furniture_ids = _pass_running_furniture(pages, feats)

    # Page flush margins for centering tests.
    lefts = [f.left for f in feats]
    rights = [f.right for f in feats]
    body_left = quantile(lefts, 0.25) or 0
    body_right = quantile(rights, 0.75) or 0
    col_width = max(body_right - body_left, 1)

    for f in feats:
        f.size_ratio = (f.size / body_size) if body_size else 1.0

    for f in feats:
        if f.line_num:
            f.role = "linenum"
            continue
        if f.folio:
            f.role = "pagenum"
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
        # Footnote start: bottom-half line opening with a superscript marker.
        if f.first_word_sup and f.bottom_frac > 0.5 \
                and _SUP_MARKER_RE.match(f.line.words[0].text):
            f.role = "footnote"
            continue
        # Heading: display size + short/centered + letters dominate.
        letters = sum(1 for c in t if c.isalpha() and c.isascii())
        digits = sum(1 for c in t if c.isdigit())
        letter_dom = letters >= 2 and letters >= digits
        if f.size_ratio >= 1.15 and f.n_char <= 200 and letter_dom:
            short = f.width < col_width * 0.85
            li = f.left - body_left
            ri = body_right - f.right
            centered = li > body_size and ri > body_size \
                and abs(li - ri) < max(body_size * 1.5, min(li, ri) * 0.6)
            if short or centered or f.size_ratio >= 2.5:
                f.role = "heading"
                continue
        f.role = "body"

    # Footnote region: once a sup-marker note opens at the bottom of a page,
    # body lines at or below it on that page are its continuation
    # (analyzeLayout.js footnote-region machinery, simplified).
    note_top = {}
    for f in feats:
        if f.role == "footnote" and (f.page not in note_top
                                     or f.top < note_top[f.page]):
            note_top[f.page] = f.top
    for f in feats:
        if f.role == "body" and f.page in note_top \
                and f.top >= note_top[f.page]:
            f.role = "footnote"


_ROLE_TO_TYPE = {
    "heading": "title", "footnote": "footnote", "endnote": "endnote",
    "pagenum": "pagenum", "header": "header", "footer": "footer",
    "linenum": "linenum", "body": "body",
}


def analyze_layout(pages: list, outline_titles=None) -> None:
    """Assign paragraphs + semantic roles across all pages of one document.

    Mutates each page: sets page.pars (geometric breaks from
    assign_paragraphs, split further at role boundaries) with par.type.

    ``outline_titles``: document bookmark titles (PDF outline) — a line
    whose normalized text equals a title is a heading regardless of the
    geometric evidence (outline-heading overlay, the outlineIndex.js:151
    structural signal consumed by applyDocParagraphLayout).
    """
    feats = _features(pages)
    if not feats:
        for page in pages:
            if not page.pars:
                assign_paragraphs(page, page.angle or 0)
        return
    body_size = _body_size(feats)
    _pass_line_numbers(pages, feats, body_size)
    _pass_folios(pages, feats)
    classify_roles(pages, feats, body_size)

    if outline_titles:
        import re as _re
        norm = {_re.sub(r"\s+", " ", t).strip().lower()
                for t in outline_titles if t}
        for f in feats:
            text = " ".join(w.text for w in f.line.words)
            if _re.sub(r"\s+", " ", text).strip().lower() in norm:
                f.role = "heading"

    role_by_line = {id(f.line): f.role for f in feats}

    for page in pages:
        assign_paragraphs(page, page.angle or 0)
        new_pars = []
        for par in page.pars:
            groups = []
            for line in par.lines:
                role = role_by_line.get(id(line), "body")
                if groups and groups[-1][0] == role:
                    groups[-1][1].append(line)
                else:
                    groups.append((role, [line]))
            if len(groups) == 1:
                par.type = _ROLE_TO_TYPE[groups[0][0]]
                new_pars.append(par)
            else:
                for role, lns in groups:
                    np_ = Par(page, bbox_union([ln.bbox for ln in lns]))
                    np_.lines = lns
                    np_.type = _ROLE_TO_TYPE[role]
                    np_.reason = par.reason
                    for ln in lns:
                        ln.par = np_
                    new_pars.append(np_)
        page.pars = new_pars
