"""Document-level paragraph segmentation (the decideBreak pass).

Reimplements the reference's paragraph-regrouping machinery — the pass
that OVERWRITES the per-page reflow grouping with document-informed
break decisions (/root/reference/js/import/analyzeLayout.js:2133-2200
application loop, :2296-2380 decideBreak, :2395-2830 geometricBreak,
model assembly :355-925).  Our per-page ``reflow.assign_paragraphs``
(reflowPars.js port) remains the fallback for pages with no usable
features, mirroring the reference's in-worker provisional grouping.

Ported rule set (reference order preserved; line-range citations per
rule below).  Block-quote inset regions (blockRegion, :1954-2045) and
the row-fragment flags that keep the region walk top-monotonic
(:1931-1952) are assigned by ``assign_block_regions`` after role
classification, exactly the reference's phase order.  The citation-link
continuation (:2680-2685) reads the /Link membership the PDF annot pass
stamps on word styles (parsePdfDoc.js:1055-1063 analog in
stages/pdf/doc.py).
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, quantile
from .layout import _cluster_peaks, _column_for

_INF = math.inf

# analyzeLayout.js:588 — monospace body families are excluded from the
# justified model (a transcript's right edges cluster like justification)
_MONO_RE = re.compile(
    r"courier|mono|consol|typewriter|fixedsys|andale|inconsolata|menlo"
    r"|lucida.?cons|sourcecode|firacode|nimbusmono|liberationmono"
    r"|prestige|letter.?gothic|ocr[ab]\b", re.I)

# :2416 bare-word line end (letter/digit end, not a punctuated footnote
# reference tail)
_BARE_WORD_END_RE = re.compile(r"[^\W_]$", re.UNICODE)
_PUNCT_REF_TAIL_RE = re.compile(r"[.!?:;,][\"')”’]?\s*\d{1,3}$")

# :2366 dot-leader entry form (solid or spaced)
_LEADER_RE = re.compile(r"(?:\.\s*){3,}\d{1,4}$")


def _height(f) -> float:
    return f.bottom - f.top


def _gap_threshold(pitches, fallback_leading) -> float:
    """analyzeLayout.js:3093-3106 gapThreshold."""
    if len(pitches) < 3:
        return _INF
    lead = quantile(pitches, 0.5) or fallback_leading
    cut = lead * 1.35
    big = [x for x in pitches if x > cut]
    if len(big) < 3 or len(big) < len(pitches) * 0.08:
        return _INF
    isolated = 0
    for i, x in enumerate(pitches):
        if x <= cut:
            continue
        if i + 1 >= len(pitches) or pitches[i + 1] <= cut:
            isolated += 1
    if isolated < len(big) * 0.5:
        return _INF
    return (lead + quantile(big, 0.5)) / 2


def build_par_model(pages, feats, body_size, page_columns, schemes):
    """Document layout model for decideBreak (analyzeLayout.js:355-925
    subset; field names kept 1:1 with the reference's LayoutModel so
    the rules below can be checked line-by-line)."""
    by_page: dict[int, list] = {}
    for f in feats:
        by_page.setdefault(f.page, []).append(f)
    for arr in by_page.values():
        arr.sort(key=lambda f: f.top)

    # per-page body size: largest size covering >=30% of page chars
    # (:355-383); doc body size wins when present >=10%
    page_body_size: dict[int, float] = {}
    for p, pf in by_page.items():
        wts: dict[float, int] = {}
        total = 0
        for f in pf:
            if not f.size:
                continue
            wts[f.size] = wts.get(f.size, 0) + f.n_char
            total += f.n_char
        chosen = 0.0
        dominant = 0.0
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
        if body_size > pb and total > 0 and doc_body_chars / total >= 0.10:
            pb = body_size
        page_body_size[p] = pb

    # per-page flush margin (:433-446)
    page_flush: dict[int, float] = {}
    doc_left_median = None
    for p, pf in by_page.items():
        pb = page_body_size.get(p, body_size)
        pl = [f.left for f in pf
              if f.n_char >= 4 and abs(f.size - pb) <= pb * 0.08]
        pk = [c for c in _cluster_peaks(pl, pb * 0.3)
              if c["count"] >= max(2, len(pl) * 0.08)]
        if pk:
            page_flush[p] = pk[0]["center"]
        elif pl:
            page_flush[p] = min(pl)
        else:
            if doc_left_median is None:
                doc_left_median = quantile([f.left for f in feats], 0.5) or 0
            page_flush[p] = doc_left_median

    # body features (:448-461): page-relative size ratio, the nChar
    # floor keeps margin fragments out of the model
    def _ratio(f):
        pb = page_body_size.get(f.page, body_size)
        return (f.size / pb) if (f.size and pb) else 1.0

    body_feats = [f for f in feats
                  if 0.92 <= _ratio(f) <= 1.08 and not f.all_caps
                  and f.n_char >= 4]
    body_lefts = [f.left for f in body_feats]
    body_rights = [f.right for f in body_feats]
    left_peaks = [pk for pk in _cluster_peaks(body_lefts, body_size * 0.3)
                  if pk["count"] >= max(3, len(body_feats) * 0.05)]
    body_left = left_peaks[0]["center"] if left_peaks \
        else (quantile(body_lefts, 0.5) or 0)
    body_text_left = max(left_peaks, key=lambda c: c["count"])["center"] \
        if left_peaks else body_left
    body_right = quantile(body_rights, 0.9) or 0
    col_width = body_right - body_left

    # line pitch (:464-482)
    pitches: list[float] = []
    pitches_by_page: dict[int, list[float]] = {}
    for k in range(1, len(feats)):
        a, b = feats[k - 1], feats[k]
        if a.page != b.page:
            continue
        if abs(a.size - b.size) > body_size * 0.1:
            continue
        rb = _ratio(b)
        if rb < 0.92 or rb > 1.08:
            continue
        dy = b.top - a.top
        if dy <= 0 or dy > body_size * 4:
            continue
        pitches.append(dy)
        pitches_by_page.setdefault(a.page, []).append(dy)
    leading = quantile(pitches, 0.5) if pitches else body_size * 1.2

    # first-line-indent detection by pop-back (:484-543): an indented
    # line whose in-column continuation below returns leftward
    body_set = set(id(f) for f in body_feats)

    def _body_like(f):
        return id(f) in body_set or (
            abs(f.size - body_size) <= body_size * 0.1
            and not f.all_caps and f.n_char >= 4)

    rel_indents: list[float] = []
    page_rel_indents: dict[int, list[float]] = {}
    for p, arr in by_page.items():
        advs = [arr[i].top - arr[i - 1].top for i in range(1, len(arr))
                if arr[i].top - arr[i - 1].top > body_size * 0.5]
        loose_cl = [c for c in _cluster_peaks(advs, leading * 0.5)
                    if c["count"] >= max(4, len(advs) * 0.2)]
        page_pitch = max(quantile(advs, 0.5) or 0,
                         loose_cl[-1]["center"] if loose_cl else 0)
        nb_window = max(body_size * 2.2, leading * 1.5, page_pitch * 1.5)
        for i, f in enumerate(arr):
            if not _body_like(f):
                continue
            above = below = None
            for j in range(i - 1, -1, -1):
                g = arr[j]
                if f.top - g.top <= body_size * 0.2:
                    continue
                if f.top - g.top > nb_window:
                    break
                if g.left < f.right and f.left < g.right:
                    above = g
                    break
            for j in range(i + 1, len(arr)):
                g = arr[j]
                if g.top - f.top <= body_size * 0.2:
                    continue
                if g.top - f.top > nb_window:
                    break
                if g.left < f.right and f.left < g.right:
                    below = g
                    break
            if below is None or not _body_like(below):
                continue
            d = f.left - below.left
            if d <= body_size * 0.4 or d >= body_size * 6.5:
                continue
            if above is not None and abs(above.left - f.left) \
                    < body_size * 0.4:
                continue
            rel_indents.append(d)
            page_rel_indents.setdefault(f.page, []).append(d)

    indent_clusters = sorted(_cluster_peaks(rel_indents, body_size * 0.3),
                             key=lambda c: -c["count"])
    indent_pk = indent_clusters[0] if indent_clusters else None
    indent_active = bool(indent_pk) and (
        (indent_pk["count"] >= 6
         and indent_pk["count"] >= len(body_feats) * 0.03)
        or (len(body_feats) < 80 and indent_pk["count"] >= 3
            and indent_pk["count"] >= len(rel_indents) * 0.6))
    indent_delta = indent_pk["center"] if indent_active else 0.0
    indent_deltas = []
    if indent_active:
        seen = {indent_delta}
        indent_deltas.append(indent_delta)
        for c in indent_clusters:
            if (c["count"] >= 6 and c["count"] >= len(body_feats) * 0.03
                    and body_size * 0.8 <= c["center"] <= body_size * 3.5
                    and c["center"] not in seen):
                seen.add(c["center"])
                indent_deltas.append(c["center"])
    indent_col = body_left + indent_delta if indent_active else 0.0

    # per-page indent regime (:520-578)
    page_indent_deltas: dict[int, list[float]] = {}
    doc_indent_coherent = len(rel_indents) < 6 or (
        bool(indent_pk) and indent_pk["count"] >= len(rel_indents) * 0.6)
    if doc_indent_coherent:
        for p, ds in page_rel_indents.items():
            cls = sorted(_cluster_peaks(ds, body_size * 0.3),
                         key=lambda c: -c["count"])
            cl = cls[0] if cls else None
            enough = bool(cl) and (
                cl["count"] >= len(ds) * 0.6 if cl["count"] >= 3
                else (cl["count"] == 2 and len(ds) == 2))
            cap_mult = 6 if (cl and cl["count"] >= 3) else 3.5
            if enough and body_size * 0.8 <= cl["center"] \
                    <= body_size * cap_mult:
                page_indent_deltas[p] = [cl["center"]]
    indent_strong = indent_active and indent_pk["count"] >= max(
        12, len(body_feats) * 0.06)

    # justified model (:585-604) with monospace exclusion
    fam_wts: dict[str, int] = {}
    for f in body_feats:
        fam_wts[f.family] = fam_wts.get(f.family, 0) + f.n_char
    body_font_family = max(fam_wts, key=fam_wts.get) if fam_wts else ""
    monospace_body = bool(_MONO_RE.search(body_font_family or ""))
    full_lines = sum(1 for r in body_rights
                     if r >= body_right - col_width * 0.10)
    justified = (not monospace_body and len(body_rights) >= 8
                 and full_lines / len(body_rights) >= 0.5)
    page_justified: dict[int, bool] = {}
    page_rights: dict[int, list[float]] = {}
    for f in body_feats:
        page_rights.setdefault(f.page, []).append(f.right)
    for p, rights in page_rights.items():
        if len(rights) < 8:
            continue
        full = sum(1 for r in rights if r >= body_right - col_width * 0.10)
        page_justified[p] = full / len(rights) >= 0.5

    # bold-heading eligibility (:607-608)
    bold_body = sum(1 for f in body_feats if f.bold > 0.6)
    bold_heading = len(body_feats) >= 8 \
        and bold_body / len(body_feats) < 0.2

    # paragraph-gap thresholds (:818-868)
    big_pitches = [x for x in pitches if x > leading * 1.35]
    spaced_active = len(big_pitches) >= 3 \
        and len(big_pitches) >= len(pitches) * 0.08
    para_gap_thresh = (leading + quantile(big_pitches, 0.5)) / 2 \
        if spaced_active else _INF
    page_para_gap: dict[int, float] = {}
    for p, ps in pitches_by_page.items():
        if len(ps) >= 8:
            page_para_gap[p] = _gap_threshold(ps, leading)
        else:
            med = quantile(ps, 0.5) or 0
            page_para_gap[p] = max(para_gap_thresh, med * 1.3)
    page_body_pitch: dict[int, float] = {}
    for p, ps in pitches_by_page.items():
        med = quantile(ps, 0.5) or 0
        loose = [c for c in _cluster_peaks(ps, leading * 0.5)
                 if c["count"] >= max(4, len(ps) * 0.2)]
        page_body_pitch[p] = max(med, loose[-1]["center"] if loose else 0)

    # block-paragraph fallback gap (:843-868)
    block_para_gap = _INF
    if not indent_active and para_gap_thresh == _INF:
        bins: dict[int, int] = {}
        for x in pitches:
            b = js_round(x / 5) * 5
            bins[b] = bins.get(b, 0) + 1
        body_pitch = max(bins, key=bins.get) if bins else 0
        big_in_band = isolated_in_band = 0
        if body_pitch > 0:
            for k in range(1, len(feats)):
                a, b = feats[k - 1], feats[k]
                if a.page != b.page:
                    continue
                if abs(a.size - b.size) > body_size * 0.1:
                    continue
                rb = _ratio(b)
                if rb < 0.92 or rb > 1.08:
                    continue
                dy = b.top - a.top
                if dy <= body_pitch * 1.4 or dy > body_pitch * 3.2:
                    continue
                big_in_band += 1
                c = feats[k + 1] if k + 1 < len(feats) else None
                next_dy = (c.top - b.top) if (
                    c is not None and c.page == b.page
                    and abs(b.size - c.size) <= body_size * 0.1
                    and 0.92 <= _ratio(c) <= 1.08) else 0
                if next_dy <= body_pitch * 1.4:
                    isolated_in_band += 1
        if isolated_in_band >= 6 and isolated_in_band >= big_in_band * 0.6:
            block_para_gap = body_pitch * 1.35

    # dot-leader entry counts per page (:904-915)
    page_leader_count: dict[int, int] = {}
    for f in feats:
        if f.orientation != 0:
            continue
        if _LEADER_RE.search((f.text or "").strip()):
            page_leader_count[f.page] = page_leader_count.get(f.page, 0) + 1

    # drawn separator rules per page (geometricBreak :2407-2420);
    # page.rules carries PDF-lifted horizontal rules as dicts
    page_rules: dict[int, list] = {}
    for p_idx, page in enumerate(pages):
        rules = getattr(page, "rules", None) or []
        if rules:
            page_rules[p_idx] = rules

    # inInsetRun (:1917-1928): >=2 consecutive same-column lines at one
    # left edge — separates a block quote from a lone first-line indent
    # for the per-line quote rules.  Uses reading order, not top-sorted.
    rd_by_page: dict[int, list] = {}
    for f in feats:
        rd_by_page.setdefault(f.page, []).append(f)
    for p, pf in rd_by_page.items():
        pcols = (page_columns or {}).get(p)
        line_col = [_column_for(ln.left, pcols, body_size) for ln in pf]

        def _same_col(a, b):
            if a is None and b is None:
                return True
            if a is None or b is None:
                return False
            return a is b or a == b

        for k, f in enumerate(pf):
            prev_same = k > 0 and _same_col(line_col[k - 1], line_col[k]) \
                and abs(pf[k - 1].left - f.left) < body_size * 0.5
            next_same = k + 1 < len(pf) \
                and _same_col(line_col[k + 1], line_col[k]) \
                and abs(pf[k + 1].left - f.left) < body_size * 0.5
            f.in_inset_run = prev_same or next_same

    # belowFeat: nearest in-column line below (:1555-1566), consumed by
    # the first-line-indent pop-back witness (:2773)
    for p, arr in by_page.items():
        for i, f in enumerate(arr):
            f.below_feat = None
            for j in range(i + 1, len(arr)):
                g = arr[j]
                if g.top - f.top <= body_size * 0.2:
                    continue
                if g.top - f.top > max(body_size * 2.2, leading * 1.5):
                    break
                if g.left < f.right and f.left < g.right:
                    f.below_feat = g
                    break

    return {
        "bodySize": body_size,
        "bodyFontFamily": body_font_family,
        "bodyLeft": body_left,
        "bodyTextLeft": body_text_left,
        "bodyRight": body_right,
        "colWidth": col_width,
        "pageFlush": page_flush,
        "pageBodySize": page_body_size,
        "indentActive": indent_active,
        "indentStrong": indent_strong,
        "indentCol": indent_col,
        "indentDelta": indent_delta,
        "indentDeltas": indent_deltas,
        "pageIndentDeltas": page_indent_deltas,
        "leading": leading,
        "justified": justified,
        "pageJustified": page_justified,
        "boldHeading": bold_heading,
        "paraGapThresh": para_gap_thresh,
        "blockParaGap": block_para_gap,
        "pageParaGap": page_para_gap,
        "pageBodyPitch": page_body_pitch,
        "pageLeaderCount": page_leader_count,
        "pageRules": page_rules,
        "pageColumns": page_columns or {},
        "schemes": schemes or {},
        "pageCount": len(pages),
    }


def _col_eq(a, b) -> bool:
    """columnFor identity compare (the reference compares column object
    references; our columns are stable dicts per page)."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a is b or a == b


# :1945 raised-marker fragment form ("[34]", "12", "*")
_FRAG_RE = re.compile(r"\[?[\d*†‡]{1,3}\]?")


def assign_block_regions(pages, feats, model, page_columns, body_size):
    """Row fragments + layout regions (analyzeLayout.js:1931-2045).

    Row fragments (:1931-1952): a raised reference marker the line
    grouper emitted as its own "line" is invisible to the region walk
    (it would break the top-monotonic advance) and rides its row's
    region afterwards (:2040-2044).

    Regions (:1954-2045): a run of >=2 body lines sharing one indented
    left margin at a homogeneous pitch, also inset on the right, gets a
    frame {left,right,width,pitch,justified_local} that decideBreak
    judges interior lines against.  Runs after role classification,
    the reference's phase order (classifyRole applies at :1634)."""
    by_page: dict[int, list] = {}
    for f in feats:
        f.row_fragment = False
        f.block_region = None
        by_page.setdefault(f.page, []).append(f)

    for p, pf_all in by_page.items():
        # row fragments: raised, small, bare-marker lines on the
        # previous flow line's row (:1934-1952)
        last_flow = None
        for f in pf_all:
            if last_flow is not None:
                overlap = min(f.bottom, last_flow.bottom) \
                    - max(f.top, last_flow.top)
                if (overlap >= _height(f) * 0.5
                        and _height(f) < _height(last_flow) * 0.8
                        and f.left > last_flow.left + body_size
                        and f.left < last_flow.right + body_size * 2
                        and _FRAG_RE.fullmatch((f.text or "").strip())):
                    f.row_fragment = True
                    continue
            last_flow = f

        pf = [ln for ln in pf_all if not ln.row_fragment]
        page_flush_p = model["pageFlush"].get(p, model["bodyLeft"])
        pcols = (page_columns or {}).get(p)
        page_gap = model["pageParaGap"].get(p)
        gap_b = page_gap if (page_gap is not None and page_gap != _INF) \
            else model["paraGapThresh"]
        advance_cap = min(gap_b, body_size * 4)
        k = 0
        while k < len(pf):
            anchor = pf[k]
            col = _column_for(anchor.left, pcols, body_size)
            flush_here = col["left"] if col else page_flush_p
            right_here = col["right"] if col else model["bodyRight"]
            if anchor.role != "body" or anchor.artifact_frac > 0.6 \
                    or anchor.left <= flush_here + body_size * 0.4:
                k += 1
                continue
            j = k + 1
            while (j < len(pf) and pf[j].role == "body"
                   and pf[j].artifact_frac <= 0.6
                   and abs(pf[j].left - anchor.left) < body_size * 0.5
                   and _col_eq(_column_for(pf[j].left, pcols, body_size),
                               col)
                   and pf[j].top - pf[j - 1].top > 0
                   and pf[j].top - pf[j - 1].top <= advance_cap):
                j += 1
            # split the same-left run at pitch seams (:1983-1989)
            advances = [pf[i].top - pf[i - 1].top for i in range(k + 1, j)]
            min_adv = min(advances) if advances else 0
            seg_start = k
            for seg_end in range(k + 1, j + 1):
                if seg_end < j and pf[seg_end].top - pf[seg_end - 1].top \
                        <= min_adv * 1.3:
                    continue
                if seg_end - seg_start >= 2:
                    run = pf[seg_start:seg_end]
                    left = min(ln.left for ln in run)
                    right = max(ln.right for ln in run)
                    # a real quotation is also right-inset and wraps a
                    # non-final line mid-sentence (:1994-1998)
                    both_sides = right_here - right \
                        >= (left - flush_here) * 0.5
                    flows = any(not ln.ends_terminal for ln in run[:-1])
                    if both_sides and flows:
                        seg_adv = sorted(run[i + 1].top - run[i].top
                                         for i in range(len(run) - 1))
                        interior = run[:-1]
                        full_count = sum(
                            1 for ln in interior
                            if ln.right >= right - (right - left) * 0.10)
                        region = {
                            "left": left, "right": right,
                            "width": right - left,
                            "pitch": seg_adv[len(seg_adv) // 2],
                            "justified_local": len(interior) >= 3
                            and full_count / len(interior) >= 0.5,
                        }
                        for ln in run:
                            ln.block_region = region
                        # absorb an off-margin opener directly above
                        # into membership, never the frame (:2012-2032)
                        member_top = run[0]
                        for _a in range(3):
                            idx = pf.index(member_top)
                            above = pf[idx - 1] if idx > 0 else None
                            if not (above is not None
                                    and above.block_region is None
                                    and above.role == "body"
                                    and above.artifact_frac <= 0.6
                                    and not above.ends_terminal
                                    and _col_eq(_column_for(
                                        above.left, pcols, body_size), col)
                                    and member_top.top - above.top > 0
                                    and member_top.top - above.top
                                    <= region["pitch"] * 1.3
                                    and (above.left > run[0].left
                                         + body_size * 0.4
                                         or (above.left < run[0].left
                                             - body_size * 0.4
                                             and model["bodyTextLeft"]
                                             > model["bodyLeft"]
                                             + body_size * 0.5
                                             and abs(run[0].left
                                                     - model["bodyTextLeft"])
                                             < body_size * 0.5))):
                                break
                            above.block_region = region
                            member_top = above
                seg_start = seg_end
            k = j
        # a fragment rides its row's line (:2040-2044)
        last_real = None
        for ln in pf_all:
            if ln.row_fragment:
                if last_real is not None \
                        and last_real.block_region is not None:
                    ln.block_region = last_real.block_region
                continue
            last_real = ln


def geometric_break(f, prev, model, cur_par_first):
    """analyzeLayout.js:2395-2830 geometricBreak, rules in reference
    order.  Returns (new_par, reason)."""
    body_size = model["bodySize"]
    if f.top < prev.top - _height(f) * 0.5:
        return True, "new column"
    if f.top_frac - prev.top_frac > 0.5:
        return True, "page wrap"
    if f.hang_marker:
        return True, "hanging marker"

    # separator rule drawn in the inter-line gap (:2407-2420)
    if prev.page == f.page:
        for rule in model["pageRules"].get(f.page, ()):
            ry = rule.get("y") if isinstance(rule, dict) \
                else getattr(rule, "y", None)
            rl = rule.get("left") if isinstance(rule, dict) \
                else getattr(rule, "left", None)
            rr = rule.get("right") if isinstance(rule, dict) \
                else getattr(rule, "right", None)
            if ry is None:
                continue
            span_l = min(prev.left, f.left)
            span_r = max(prev.right, f.right)
            if prev.bottom < ry < f.top and (rr or 0) > span_l \
                    and (rl or 0) < span_r:
                return True, "separator rule"

    # a confirmed bare-integer note opener begins a new note — the
    # break is unconditional and strong (:2422-2424)
    if getattr(f, "footnote_opener", False):
        return True, "footnote marker"

    col_jump = body_size * 1.5
    same_column = (abs(f.left - prev.left) < model["colWidth"] * 0.5
                   or abs(f.left - model["bodyLeft"]) < col_jump
                   or (model["indentActive"]
                       and abs(f.left - model["indentCol"]) < col_jump))

    # syntax-blind bare-word continuation (:2410-2446)
    flow_pitch = max(model["pageBodyPitch"].get(f.page, 0),
                     model["leading"])
    page_flush_here = model["pageFlush"].get(f.page, model["bodyLeft"])
    prev_trim = (prev.text or "").strip()
    bare_word_end = bool(_BARE_WORD_END_RE.search(prev_trim)) \
        and not _PUNCT_REF_TAIL_RE.search(prev_trim)
    prev_words = prev.line.words if prev.line is not None else []
    bare_continuation = (
        prev.role == "body" and f.role == "body"
        and prev.page == f.page and bare_word_end
        and (abs(f.left - prev.left) < body_size * 0.5
             or (prev is cur_par_first
                 and prev.left > f.left + body_size * 0.4
                 and prev.left - f.left <= body_size * 4
                 and (abs(f.left - page_flush_here) < body_size * 0.5
                      or abs(f.left - model["bodyLeft"])
                      < body_size * 0.5))
             or (len(prev_words) >= 2
                 and len(prev_words[0].text) <= 3
                 and prev.left < f.left - body_size * 0.4
                 and abs(prev_words[1].bbox.left - f.left)
                 < body_size * 0.5))
        and f.family == prev.family
        and abs(f.size - prev.size) <= body_size * 0.1
        and f.top - prev.top > 0
        and min(f.top - prev.top,
                (f.top + _height(f)) - (prev.top + _height(prev)))
        <= flow_pitch * 1.3)

    # reference-entry (dot-leader) pages (:2448-2478)
    on_leader_page = model["pageLeaderCount"].get(f.page, 0) >= 3
    if on_leader_page and prev.page == f.page and f.role == "body" \
            and prev.role == "body" and _LEADER_RE.search(prev_trim):
        return True, "reference entry"
    ref_entry_continuation = (
        on_leader_page and prev.page == f.page
        and f.role == "body" and prev.role == "body"
        and not _LEADER_RE.search(prev_trim) and not prev.ends_terminal
        and f.top - prev.top > 0
        and f.top - prev.top <= flow_pitch * 1.3)

    # enumerator rules (:2480-2502); a confirmed local-list member
    # (layout._pass_list_confirm, :1802-1872) splits even when its
    # dot-form scheme is non-splittable doc-wide — the contiguous
    # aligned run already disambiguated it from a prose initial.
    if f.enumerator:
        e = f.enumerator
        sc = model["schemes"].get(e["scheme"])
        confirmed = bool(getattr(f, "list_confirmed", False))
        dash_marker = e["scheme"] == "bullet" \
            and re.fullmatch(r"[–—-]", e["raw"] or "")
        strong_scheme = (e["scheme"] == "section"
                         or e["scheme"].startswith("paren-")
                         or e["scheme"] in ("alpha-paren", "roman-paren",
                                            "bracket-num")
                         or (e["scheme"] == "bullet" and not dash_marker)
                         or confirmed)
        follows_complete = strong_scheme or prev.ends_terminal \
            or prev.role != "body" or prev.role != f.role
        wrapped_mid_item = bare_continuation and cur_par_first is not None \
            and f.left > cur_par_first.left + body_size * 0.5
        if ((sc and sc.get("active")) or confirmed) and follows_complete \
                and not wrapped_mid_item:
            if e["scheme"] == "bullet":
                return True, "bullet"
            if e.get("value") is not None \
                    and (confirmed
                         or e["value"] in sc.get("sequence_values", ())):
                return True, f"numbering ({e['scheme']} {e['raw']})"

    # bold / heading-face run-in lead-in (:2509-2531)
    if model["boldHeading"] and prev.role == "body" and f.role == "body":
        words = f.line.words if f.line is not None else []
        k = 0
        while k < len(words) and words[k].style and words[k].style.bold:
            k += 1
        lead = words[:k]
        lead_all_caps = k >= 2 and all(
            re.search(r"[A-Z]", (w.text or "").strip())
            and (w.text or "").strip()
            == (w.text or "").strip().upper() for w in lead)
        body_after = k < len(words) and not (
            words[k].style and words[k].style.bold)
        prev_complete = prev.ends_terminal \
            or f.top - prev.top > model["leading"] * 1.3
        # familyHeading lead-face arm needs the heading-face model our
        # heading pass owns; the all-caps arm covers the common case
        if lead_all_caps and body_after and prev_complete:
            return True, "heading-face run-in lead-in"

    # role-change splits (:2536-2549)
    if f.role != prev.role and not (f.role == "heading"
                                    and prev.role == "heading"):
        fr, pr = f.role, prev.role
        heading_or_furniture = fr in ("heading", "pagenum", "header",
                                      "footer", "linenum") \
            or pr in ("heading", "pagenum", "header", "footer", "linenum")
        size_change = abs(f.size - prev.size) > body_size * 0.1
        endnote_transition = (fr == "endnote") != (pr == "endnote")
        if heading_or_furniture or size_change or endnote_transition:
            return True, f"role change ({pr}->{fr})"

    # heading runs (:2552-2596)
    if f.role == "heading" and prev.role == "heading":
        head_cols = model["pageColumns"].get(f.page)

        def insets_of(line_f):
            col = _column_for(line_f.left, head_cols, body_size)
            lm = col["left"] if col else model["pageFlush"].get(
                line_f.page, model["bodyLeft"])
            rm = col["right"] if col else model["bodyRight"]
            return line_f.left - lm, rm - line_f.right

        def symmetric(li, ri):
            return abs(li - ri) < max(body_size * 1.5,
                                      min(li, ri) * 0.5)

        def clearly_centered(li, ri):
            return symmetric(li, ri) and min(li, ri) > body_size

        p_li, p_ri = insets_of(prev)
        f_li, f_ri = insets_of(f)
        title_evidence = clearly_centered(p_li, p_ri) \
            or clearly_centered(f_li, f_ri)
        same_center = abs((prev.left + prev.right) / 2
                          - (f.left + f.right) / 2) < body_size * 1.5
        same_left = abs(prev.left - f.left) < body_size * 0.5 \
            and abs(f.top - prev.top) < max(_height(prev),
                                            _height(f)) * 1.8
        section_marker = re.match(
            r"^\s*(?:[A-Z]|[0-9]{1,2}|[IVXLC]{1,4})[.)]\s", prev.text or "")
        hanging_heading = bool(section_marker) \
            and prev.left < f.left - body_size * 0.5 \
            and abs(f.top - prev.top) < max(_height(prev),
                                            _height(f)) * 1.8
        if title_evidence and (same_center or same_left
                               or hanging_heading):
            return False, ""
        if title_evidence and not same_center:
            return True, "heading alignment change"
        if abs(f.size - prev.size) > body_size * 0.1:
            return True, "heading size change"
        return False, ""

    # notes early-return (:2598-2602)
    if f.role in ("footnote", "endnote"):
        if f.first_word_sup:
            return True, "footnote marker"
        return False, ""

    if getattr(f, "drop_cap", False):
        return True, "drop cap"

    # per-line column frame (:2607-2620); two lines inside one block
    # region are judged against the region's own edges
    pcols = model["pageColumns"].get(prev.page)
    prev_col = _column_for(prev.left, pcols, body_size)
    f_col = _column_for(f.left, pcols, body_size)
    prev_region = getattr(prev, "block_region", None)
    f_region = getattr(f, "block_region", None)
    block = prev_region if (prev_region is not None
                            and prev_region is f_region) else None
    end_right = block["right"] if block \
        else (prev_col["right"] if prev_col else model["bodyRight"])
    end_width = block["width"] if block \
        else (prev_col["width"] if prev_col else model["colWidth"])
    flush = block["left"] if block \
        else (f_col["left"] if f_col
              else model["pageFlush"].get(f.page, model["bodyLeft"]))

    # centered run (:2624-2640); margins read the line's own frame,
    # most specific first: region, then column, then page
    def centered_line(line_f, col):
        region = getattr(line_f, "block_region", None)
        lm = region["left"] if region \
            else (col["left"] if col
                  else model["pageFlush"].get(line_f.page,
                                              model["bodyLeft"]))
        rm = region["right"] if region \
            else (col["right"] if col else model["bodyRight"])
        li = line_f.left - lm
        ri = rm - line_f.right
        max_indent = max(model["indentDeltas"]) \
            if (model["indentActive"] and model["indentDeltas"]) else 0
        return (li > max_indent + body_size and ri > body_size * 1.5
                and abs(li - ri) < max(body_size * 1.5,
                                       min(li, ri) * 0.6))

    if prev.page == f.page and f.top - prev.top < model["leading"] * 1.5 \
            and centered_line(prev, prev_col) and centered_line(f, f_col):
        return False, ""

    # hanging continuation machinery (:2643-2682)
    page_gap_thresh = model["pageParaGap"].get(f.page,
                                               model["paraGapThresh"])
    no_para_gap_before = prev.page == f.page \
        and page_gap_thresh != _INF \
        and f.top - prev.top < page_gap_thresh
    hangs_deeper = cur_par_first is not None \
        and f.left > cur_par_first.left + body_size * 0.5
    page_deltas = model["pageIndentDeltas"].get(f.page, [])
    indent_active_here = model["indentActive"] or len(page_deltas) > 0
    indent_deltas_here = (model["indentDeltas"] + page_deltas) \
        if page_deltas else model["indentDeltas"]
    prev_in_hanging_entry = prev is cur_par_first \
        or prev.left > flush + body_size * 0.5
    markerless_hang = (hangs_deeper and cur_par_first is not None
                       and not cur_par_first.enumerator
                       and no_para_gap_before and indent_active_here
                       and prev_in_hanging_entry
                       and abs(cur_par_first.left - flush)
                       < body_size * 0.5
                       and any(abs(f.left - (flush + d)) < body_size * 0.5
                               for d in indent_deltas_here))
    prev_is_hang = (cur_par_first is not None and prev is not cur_par_first
                    and prev.left > cur_par_first.left + body_size * 0.5
                    and (no_para_gap_before or page_gap_thresh == _INF))

    def at_hang_body_column(line_f):
        return (model["bodyTextLeft"] > model["bodyLeft"]
                + body_size * 0.5
                and abs(line_f.left - model["bodyTextLeft"])
                < body_size * 0.5)

    hanging_continuation = ((cur_par_first is not None
                             and cur_par_first.enumerator and hangs_deeper
                             and (not prev.ends_terminal
                                  or no_para_gap_before or prev_is_hang
                                  or at_hang_body_column(f)
                                  or cur_par_first.enumerator["scheme"]
                                  == "bracket-num"))
                            or markerless_hang)
    prev_ended_para = prev.role != "body" or prev.ends_terminal \
        or prev.right < end_right - end_width * 0.12
    starts_continuation = f.starts_lower and not prev.ends_terminal \
        and not f.enumerator

    # Citation-link continuation (:2680-2685): a hyperlinked case
    # citation reserves a sliver of extra leading (~1.4x), tripping
    # the gap rule at every wrapped citation; suppress when the
    # continuation carries a /Link (word.style.link, stamped by the
    # PDF annot pass) and the pitch is citation-pad-sized.
    citation_lead_continuation = (
        prev.page == f.page and prev.role == "body" and f.role == "body"
        and any(getattr(w.style, "link", None) for w in f.line.words)
        and f.top - prev.top < model["leading"] * 1.6)

    # region-scoped continuation gate (:2691-2698): two same-margin
    # lines inside one region, advancing at the region's own pitch,
    # with prev not ending terminally, are one flowing paragraph
    tight_continuation = (block is not None
                          and prev.role == "body" and f.role == "body"
                          and not prev.ends_terminal
                          and abs(f.left - prev.left) < body_size * 0.5
                          and f.top - prev.top > 0
                          and f.top - prev.top <= block["pitch"] * 1.15
                          and f.family == prev.family
                          and abs(f.size - prev.size) <= body_size * 0.1)

    # per-line block-quote start/end (:2737-2758): both-side-inset runs
    # where the region pass is absent; gated to justified docs
    quote_inset = model["colWidth"] * 0.035

    def both_side_inset(line_f):
        li = line_f.left - model["bodyLeft"]
        ri = model["bodyRight"] - line_f.right
        return (li > quote_inset and ri > quote_inset
                and abs(li - ri) < model["colWidth"] * 0.06)

    def below_hang_body_column(line_f):
        return (model["bodyTextLeft"] > model["bodyLeft"]
                + body_size * 0.5
                and line_f.left > model["bodyTextLeft"]
                + body_size * 0.5)

    # Region transitions (:2714-2727): where the region pass has spoken,
    # quote boundaries are region boundaries; interior lines (same
    # region both sides) skip this block.  Off inside note paragraphs;
    # a bare-word same-margin wrap is a wrapped sentence whatever the
    # region tags say.
    if ((f_region is not None or prev_region is not None)
            and f_region is not prev_region
            and prev.page == f.page
            and f.role == "body" and prev.role == "body"
            and (cur_par_first is None
                 or cur_par_first.role not in ("footnote", "endnote"))
            and not starts_continuation and not tight_continuation
            and not bare_continuation):
        if f_region is not None and prev_region is not None:
            return True, "paragraph gap"
        if f_region is not None and not hanging_continuation \
                and not at_hang_body_column(f):
            return True, "block quote"
        if prev_region is not None and not hanging_continuation \
                and not at_hang_body_column(prev):
            return True, "block quote end"

    # same-margin-no-gap veto (:2730-2735): a justified left-inset
    # quote must not shred itself on its own interior lines
    same_margin_no_gap = (prev.page == f.page
                          and abs(f.left - prev.left) < body_size * 0.5
                          and prev.left > page_flush_here + body_size * 0.4
                          and f.top - prev.top < body_size * 1.5)

    # Per-line quote start/end (:2737-2758): the fallback for runs the
    # region pass rejected; !block keeps an interior pair of one region
    # (an absorbed off-margin opener) from re-splitting here.
    if (model["justified"] and f_col is None and prev_col is None
            and block is None
            and f.role == "body" and prev.role == "body"
            and prev.page == f.page and not starts_continuation
            and not tight_continuation and not bare_continuation
            and (not hanging_continuation or below_hang_body_column(f))
            and both_side_inset(f) and not both_side_inset(prev)
            and not at_hang_body_column(f)
            and getattr(f, "in_inset_run", False)
            and not same_margin_no_gap):
        return True, "block quote"

    if (model["justified"] and f_col is None and prev_col is None
            and block is None
            and f.role == "body" and prev.role == "body"
            and prev.page == f.page and not starts_continuation
            and not tight_continuation and not hanging_continuation
            and not bare_continuation
            and both_side_inset(prev)
            and getattr(prev, "in_inset_run", False)
            and not at_hang_body_column(prev)
            and f.right >= model["bodyRight"] - quote_inset
            and not same_margin_no_gap):
        return True, "block quote end"

    # list outdent (:2760-2764)
    if (cur_par_first is not None and cur_par_first.enumerator
            and cur_par_first.enumerator["scheme"] == "bullet"
            and not starts_continuation
            and f.left < cur_par_first.left - body_size * 0.5):
        return True, "list outdent"

    # first-line indent (:2766-2778)
    if (indent_active_here and not hanging_continuation
            and prev_ended_para and not starts_continuation
            and not tight_continuation and not bare_continuation
            and not ref_entry_continuation
            and (cur_par_first is None
                 or cur_par_first.role not in ("footnote", "endnote"))
            and (prev.ends_terminal or f.below_feat is None
                 or f.below_feat.left < f.left - body_size * 0.4)
            and any(abs(f.left - (flush + d)) < body_size * 0.5
                    for d in indent_deltas_here)
            and f.left > flush + body_size * 0.4):
        return True, "first-line indent"

    # same-baseline right fragment (:2780-2787)
    if prev.page == f.page and f.left > prev.right \
            and abs(f.top - prev.top) < min(_height(f),
                                            _height(prev)) * 0.5:
        return False, ""

    # size increase note->body (:2789-2797)
    if (prev.page == f.page and f.role == "body" and prev.role == "body"
            and prev.ends_terminal
            and prev.size < body_size * 0.9
            and f.size >= body_size * 0.95):
        return True, "size increase (note->body)"

    # prev ends early (justified) (:2799-2808)
    pj = model["pageJustified"].get(f.page, model["justified"])
    page_gap = model["pageParaGap"].get(f.page)
    page_just = model["justified"] \
        if not (pj is False and page_gap is not None
                and page_gap != _INF) else False
    # inside a region the region's own right-edge coherence licenses
    # the ends-early rule, never the document flag (:2800-2802)
    just_here = block["justified_local"] if block else page_just
    if (just_here and prev.page == f.page and prev.role == "body"
            and f.role == "body" and not hanging_continuation
            and not tight_continuation and not bare_continuation
            and not ref_entry_continuation
            and prev.right < end_right - end_width * 0.12
            and not starts_continuation
            and getattr(f, "first_word_width", 0) > 0
            and f.first_word_width < (end_right - prev.right)):
        return True, "prev ends early (justified)"

    # paragraph gap (:2810-2832)
    if prev.page == f.page:
        thresh = model["pageParaGap"].get(f.page,
                                          model["paraGapThresh"])
        if thresh == _INF and model["paraGapThresh"] != _INF:
            thresh = max(model["paraGapThresh"],
                         model["pageBodyPitch"].get(f.page, 0) * 1.3)
        if thresh == _INF and model["blockParaGap"] != _INF:
            thresh = max(model["blockParaGap"],
                         model["pageBodyPitch"].get(f.page, 0) * 1.3)
        if (thresh != _INF and f.top - prev.top > thresh
                and not starts_continuation and not hanging_continuation
                and not tight_continuation and not bare_continuation
                and not ref_entry_continuation
                and not citation_lead_continuation):
            return True, "paragraph gap"

    if not same_column:
        return True, "column shift"
    return False, ""


def decide_break(f, prev, model, cur_par_first):
    """analyzeLayout.js:2296-2380 decideBreak.  The structural overlay
    branch stays in layout._apply_struct_elements (it runs after the
    geometric rebuild, same net ordering)."""
    if prev is None:
        return True, "first line"
    if f.orientation != prev.orientation:
        return True, "orientation change"
    if bool(f.line_num) != bool(prev.line_num):
        return True, "line-number boundary"
    # NOTE: the lowercase-enumerator split (:2357-2359) lives ONLY in
    # the struct branch; on geometry-only pages the enumerator rule in
    # geometric_break (with its followsComplete/wrappedMidItem gates)
    # owns list-item splits.
    return geometric_break(f, prev, model, cur_par_first)


def rebuild_pars(pages, feats, model, role_to_type):
    """Paragraph re-grouping from decide_break — the application loop at
    analyzeLayout.js:2133-2200.  Standalone margin line numbers are
    separate lines here (case A); an inline number on a body line's own
    row is judged through the last real body neighbour (inlineLN), and
    a continuing body line reattaches to the current body paragraph
    across an interleaved line-number paragraph."""
    from ..model import Par, bbox_union

    by_page: dict[int, list] = {}
    for f in feats:  # reading order (page.lines order), NOT top-sorted
        by_page.setdefault(f.page, []).append(f)

    for p, page in enumerate(pages):
        pf = by_page.get(p, [])
        if not pf:
            if not page.pars:
                from .reflow import assign_paragraphs
                assign_paragraphs(page, page.angle or 0)
            continue
        par_arr: list = []
        cur_par_first = None
        cur_body_par = None
        cur_body_first = None
        prev_body = None
        for k, f in enumerate(pf):
            imm_prev = pf[k - 1] if k > 0 else None
            inline_ln = (not f.line_num and imm_prev is not None
                         and imm_prev.line_num
                         and abs(f.top - imm_prev.top)
                         < min(_height(f), _height(imm_prev)) * 0.5)
            prev = prev_body if inline_ln else imm_prev
            new_par, reason = decide_break(
                f, prev, model,
                cur_body_first if inline_ln else cur_par_first)
            if not f.line_num and not new_par and cur_body_par is not None:
                par = cur_body_par
            elif new_par or not par_arr:
                cur_par_first = f
                par = Par(page, bbox_union([f.line.bbox]))
                par.reason = reason
                par.type = role_to_type.get(f.role, "body")
                # The paragraph/list enumerator rides the par
                # (analyzeLayout.js:2183) — footnote linking matches
                # note labels against it.
                if f.enumerator:
                    par.par_num = f.enumerator["raw"]
                par.lines = []
                par_arr.append(par)
            else:
                par = par_arr[-1]
            par.lines.append(f.line)
            f.line.par = par
            if not f.line_num:
                cur_body_par = par
                # PARITY PIN: after a reattach across an interleaved
                # line-number paragraph, cur_par_first still names the
                # line-number par's first line and is copied here — the
                # reference does exactly the same (analyzeLayout.js:2194
                # `curBodyFirst = curParFirst` with curParFirst left at
                # the interleaved par).  Do not "fix" without breaking
                # byte-parity on line-numbered transcript pages.
                cur_body_first = cur_par_first
                prev_body = f
        # any line the feature pass skipped (wordless) rides with the
        # nearest preceding paragraph so exporters never see par=None
        feat_lines = {id(f.line) for f in pf}
        last_par = None
        leading: list = []  # wordless lines before the first real line
        for line in page.lines:
            if id(line) in feat_lines:
                last_par = line.par
            elif last_par is not None:
                last_par.lines.append(line)
                line.par = last_par
            elif par_arr:
                leading.append(line)
                line.par = par_arr[0]
        if leading:
            par_arr[0].lines[:0] = leading
        for par in par_arr:
            par.bbox = bbox_union([ln.bbox for ln in par.lines])
        page.pars = par_arr
