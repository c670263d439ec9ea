"""Fill & sign: typed-text placement and fillable-area detection
(fillSign.js).

Two portable halves of the reference module:

* **Fill-text lifting** (fillSign.js:44-125 syncFillText / addFillText):
  a typed free-text row is laid out into synthetic OCR lines (Helvetica
  metrics, 1.2-em line height, 0.8/0.2 asc/desc split, 0.278-em space
  advance) and inserted into the page's line list y-ordered, so search
  and text exports see the fill immediately.  The id shape
  ``word_<page>_txt...`` must not collide with form-field lifted ids
  (``word_<page>_f...``) — regenerating one feature's lifted words must
  never delete the other's (fillSign.js:31-33).
* **Deterministic fillable-area detection** (fillSign.js:240-609
  detectFillTargets): finds checkboxes and blanks a form draws as plain
  page content.  Three disjoint arms — empty-checkbox glyph codepoints
  (size/aspect gates, glued-placeholder and covered/marked kills),
  underscore-run blanks (run merge, occupied / TOC-leader /
  pleading-divider / caption-paren / standalone-rule kills, caption-row
  segmentation into per-caption fields), and the "( )" area-code slot
  of a labelled phone row.  Detection is recomputed on every use and
  never stored: persisting it would freeze detection mistakes into
  users' files.

Ink/stamp placement keeps the row-validation semantics
(fillSign.js:155-218); their raster appearance is the render path.
"""

from __future__ import annotations

import re

from ..functions.textnorm import calc_lang
from ..functions.stats import js_round
from ..model import BBox, Line, Page, Word
from .pdf.widths import base14_widths, char_width

# fillSign.js:246-287 DETECT — pt thresholds convert through the page's
# px-per-pt scale, em thresholds scale by the candidate's own height.
DETECT = {
    "boxMinPt": 5, "boxMaxPt": 24,
    "boxAspectMin": 0.55, "boxAspectMax": 1.8,
    "boxGluedGapEm": 0.2, "boxCoverFrac": 0.15,
    "fullPageImageFrac": 0.8,
    "runMergeGapEm": 0.5,
    "occupiedMidlineFrac": 0.4, "occupiedMinOverlapPx": 6,
    "occupiedOverlapFrac": 0.1,
    "leaderPageNumGapEm": 2, "capParenGapEm": 0.5,
    "standaloneRuleWidthFrac": 0.4,
    "stackGapMinEm": 0.45, "stackGapMaxEm": 4.6, "stackMinMates": 2,
    "promptLookbackEm": 2.5,
    "segCaptionBandEm": 2.2, "segClusterGapEm": 1.6,
    "segMaxClusterWords": 5, "segMaxClusterChars": 42,
    "segRowToleranceEm": 0.5, "segMinSegmentPx": 30,
    "parensMinAspectOfHeight": 1, "parensFilledMidlineFrac": 0.4,
}

# fillSign.js:289-301 — words naming a telephone field (substring match
# is deliberate: "Telephone" carries "phone", "Cellular" carries "cell").
PHONE_LABEL = re.compile(
    r"phone|fax|facsimile|mobile|\bcell|\btel\b|\bdaytime\b|\bevening\b",
    re.I)

# fillSign.js:303-315 — codepoints that render as an EMPTY checkbox;
# checked-box glyphs are deliberately absent so a checked box is never
# a target.
CHECKBOX_CODES = frozenset([
    0x2610, 0x25A1, 0x25A2, 0x25FB, 0x274F, 0x2751, 0x2752,
    0x1F78E, 0x1F78F,
    0x2468, 0x2469, 0x2785, 0x2787, 0x2788, 0x2789,
    0xF06F, 0xF0A8, 0xF071,
])

_LIFTED_ID_RE = re.compile(r"^word_\d+_(txt|f)")
_FILL_TEXT_ID_RE = re.compile(r"^word_\d+_txt")
_RUN_RE = re.compile(r"_{3,}")

_HELV = base14_widths("Helvetica")


def _helv_width(text: str, size: float) -> float:
    return sum(char_width(_HELV, c) for c in text) / 1000.0 * size


def is_fill_text_line(line: Line) -> bool:
    return bool(line.words) and all(_FILL_TEXT_ID_RE.match(w.id)
                                    for w in line.words)


_fill_text_seq = [0]


def sync_fill_text(page: Page, row: dict, prev_bbox: BBox | None = None):
    """Regenerate a fill-text row's bbox and lifted words from its
    contents (fillSign.js:44-125); stale lifted lines inside the row's
    current or previous extent are swept first."""
    pad = 2

    def inside(line: Line, b) -> bool:
        return b is not None and line.bbox.left >= b.left - pad \
            and line.bbox.right <= b.right + pad \
            and line.bbox.top >= b.top - pad \
            and line.bbox.bottom <= b.bottom + pad

    rb = row["bbox"]
    page.lines = [ln for ln in page.lines
                  if not (is_fill_text_line(ln)
                          and (inside(ln, rb) or inside(ln, prev_bbox)))]

    font_size = row["fontSize"]
    line_h = font_size * 1.2
    asc = font_size * 0.8
    desc = font_size * 0.2
    text_lines = re.split(r"\r\n|\r|\n", str(row.get("contents") or ""))
    left, top = rb.left, rb.top
    max_right = left
    _fill_text_seq[0] += 1
    seq = _fill_text_seq[0]
    lift_idx = 0
    new_lines = []
    n = page.n
    for li, raw in enumerate(text_lines):
        line_top = top + li * line_h
        baseline_y = line_top + asc
        tokens = re.findall(r"\S+", raw)
        if not tokens:
            continue
        lift_idx += 1
        line_obj = Line(page, BBox(left, js_round(line_top), left,
                                   js_round(line_top + line_h)),
                        [0, js_round(baseline_y) - js_round(line_top + line_h)],
                        asc_height=asc)
        x = float(left)
        space_adv = font_size * 0.278
        lead_ws = len(re.match(r"\s*", raw).group(0))
        x += lead_ws * space_adv
        for wi, tok in enumerate(tokens):
            w = Word(line_obj, f"word_{n + 1}_txt{seq}e{lift_idx}_{wi + 1}",
                     tok, BBox(js_round(x), js_round(line_top), js_round(x) + 1,
                               js_round(line_top + line_h)))
            w.conf = 100
            w.lang = calc_lang(tok)
            w.style.font = "Helvetica"
            w.visual_coords = False  # fillSign.js:83
            w.style.size = js_round(font_size * 1000) / 1000
            width = _helv_width(tok, font_size)
            w.bbox = BBox(js_round(x), js_round(baseline_y - asc),
                          js_round(x + width), js_round(baseline_y + desc))
            line_obj.words.append(w)
            x += width + space_adv
        line_obj.bbox.right = js_round(x - space_adv)
        max_right = max(max_right, line_obj.bbox.right)
        new_lines.append(line_obj)

    row["bbox"] = BBox(left, top,
                       max(max_right, left + js_round(font_size)),
                       js_round(top + max(1, len(text_lines)) * line_h))
    for line_obj in new_lines:
        at = next((i for i, ln in enumerate(page.lines)
                   if ln.bbox.top > line_obj.bbox.top), None)
        if at is None:
            page.lines.append(line_obj)
        else:
            page.lines.insert(at, line_obj)


def add_fill_text(page: Page, item: dict) -> dict:
    """Place a typed-text item anchored at its top-left corner
    (fillSign.js:133-153)."""
    if not item or not (float(item.get("fontSize", 0)) > 0):
        raise ValueError("add_fill_text requires a positive fontSize.")
    fs = float(item["fontSize"])
    row = {"type": "freetext",
           "bbox": BBox(item["x"], item["y"], item["x"] + fs,
                        item["y"] + fs * 1.2),
           "contents": str(item.get("contents") or ""),
           "fontSize": fs,
           "textColor": item.get("textColor") or "#000000",
           "opacity": 1}
    # doc.annotations.pages analog (fillSign.js:144-147): the row rides
    # page.marks so a .scribe save round-trips the annotation, not just
    # its lifted words.
    page.marks.append(row)
    sync_fill_text(page, row)
    return row


def add_ink(item: dict) -> dict:
    """Validate + build a drawn-strokes row (fillSign.js:162-188)."""
    strokes = item.get("strokes") if item else None
    if not isinstance(strokes, list) or not strokes \
            or any(not isinstance(s, list) or not s for s in strokes):
        raise ValueError("add_ink requires at least one stroke with at "
                         "least one point.")
    width = float(item.get("width") or 0)
    width = width if width > 0 else 4
    xs = [p[0] for s in strokes for p in s]
    ys = [p[1] for s in strokes for p in s]
    pad = -(-width // 2)  # ceil
    return {"type": "ink",
            "strokes": [[list(p) for p in s] for s in strokes],
            "width": width, "color": item.get("color") or "#000000",
            "bbox": BBox(min(xs) - pad, min(ys) - pad,
                         max(xs) + pad, max(ys) + pad)}


def add_stamp(item: dict) -> dict:
    """Validate + build an image row (fillSign.js:196-218)."""
    if not item or not re.match(r"^data:image/(png|jpeg);base64,",
                                item.get("imageData") or ""):
        raise ValueError("add_stamp requires a PNG or JPEG data URL.")
    b = item.get("bbox")
    if not b or not (b["right"] > b["left"]) \
            or not (b["bottom"] > b["top"]):
        raise ValueError("add_stamp requires a bbox with positive width "
                         "and height.")
    return {"type": "stamp",
            "bbox": BBox(b["left"], b["top"], b["right"], b["bottom"]),
            "imageData": item["imageData"]}


def _over_area(a, b) -> float:
    return max(0.0, min(a.right, b.right) - max(a.left, b.left)) * \
        max(0.0, min(a.bottom, b.bottom) - max(a.top, b.top))


def detect_fill_targets(page: Page, page_size_pt: float | None = None,
                        shapes: dict | None = None,
                        rejects: list | None = None) -> list[dict]:
    """Detect fillable areas from the page's own content
    (fillSign.js:326-609).  Returns targets in reading order:
    ``{kind: 'checkbox'|'blank', bbox, source}``."""
    D = DETECT
    px_per_pt = (page.width / page_size_pt
                 if page_size_pt and page_size_pt > 0 else 300 / 72)
    targets: list[dict] = []

    def kill(arm, rule, bbox):
        if rejects is not None:
            rejects.append({"arm": arm, "rule": rule, "bbox": bbox})

    shapes = shapes or {}
    marks = shapes.get("marks") or []
    images = shapes.get("images") or []
    glyph_ink = {g["id"]: g["bbox"] for g in shapes.get("glyphBoxes")
                 or []}
    page_area = page.width * page.height

    # Lifted fill-text and form-field values are our own output, never
    # detection targets.
    content_lines = [ln for ln in page.lines
                     if ln.words and not _LIFTED_ID_RE.match(
                         ln.words[0].id)]
    words = [w for ln in page.lines for w in ln.words]

    def box_marked(b: BBox) -> bool:
        area = (b.right - b.left) * (b.bottom - b.top)
        if any(_over_area(m, b) >= area * D["boxCoverFrac"]
               for m in marks):
            return True
        return any(_over_area(im, b) >= area * D["boxCoverFrac"]
                   and (im.right - im.left) * (im.bottom - im.top)
                   < page_area * D["fullPageImageFrac"]
                   for im in images)

    # Arm 1 — glyph checkboxes.
    for line in content_lines:
        for word in line.words:
            if len(word.text) > 2:
                continue
            cps = list(word.text)
            if len(cps) != 1:
                continue
            if ord(cps[0]) not in CHECKBOX_CODES:
                continue
            w = word.bbox.right - word.bbox.left
            h = word.bbox.bottom - word.bbox.top
            size_ok = (D["boxMinPt"] * px_per_pt <= w
                       <= D["boxMaxPt"] * px_per_pt
                       and D["boxMinPt"] * px_per_pt <= h
                       <= D["boxMaxPt"] * px_per_pt
                       and D["boxAspectMin"] <= w / h
                       <= D["boxAspectMax"])
            if not size_ok:
                kill("glyph", "size", word.bbox)
                continue

            def tight(test, word=word, line=line, h=h):
                return any(o is not word
                           and o.bbox.top < word.bbox.bottom
                           and word.bbox.top < o.bbox.bottom and test(o)
                           for o in line.words)
            glued = tight(lambda o: abs(o.bbox.left - word.bbox.right)
                          < D["boxGluedGapEm"] * h) \
                and tight(lambda o: abs(word.bbox.left - o.bbox.right)
                          < D["boxGluedGapEm"] * h)
            if glued:
                kill("glyph", "glued", word.bbox)
                continue
            drawn_box = glyph_ink.get(word.id, word.bbox)
            covered = any(
                o is not word
                and _over_area(o.bbox, word.bbox)
                >= w * h * D["boxCoverFrac"]
                and not (len(list(o.text)) == 1
                         and ord(list(o.text)[0]) in CHECKBOX_CODES)
                for o in words) or box_marked(drawn_box)
            if covered:
                kill("glyph", "covered", drawn_box)
                continue
            targets.append({"kind": "checkbox", "bbox": drawn_box.copy(),
                            "source": "glyph"})

    # Arm 2 — underscore blanks.
    underscore_only_tops = [ln.bbox.top for ln in page.lines
                            if len(ln.words) == 1
                            and re.fullmatch(r"_{3,}",
                                             ln.words[0].text)]
    for line in content_lines:
        runs = []
        for word in line.words:
            if not _RUN_RE.search(word.text):
                continue
            w = word.bbox.right - word.bbox.left
            h = word.bbox.bottom - word.bbox.top
            for m in _RUN_RE.finditer(word.text):
                if word.chars and len(word.chars) == len(word.text):
                    left = word.chars[m.start()].bbox.left
                    right = word.chars[m.end() - 1].bbox.right
                else:
                    left = word.bbox.left + m.start() / len(word.text) * w
                    right = word.bbox.left + m.end() / len(word.text) * w
                if not right > left:
                    continue
                # run continuing with ")" = pleading-caption divider
                if m.end() < len(word.text) and word.text[m.end()] == ")":
                    kill("underscore", "pleading-divider",
                         BBox(left, word.bbox.top, right,
                              word.bbox.bottom))
                    continue
                runs.append({"left": left, "right": right,
                             "top": word.bbox.top,
                             "bottom": word.bbox.bottom, "h": h})
        runs.sort(key=lambda r: r["left"])
        cur = None

        def judge(line=line):
            nonlocal cur
            if cur is None:
                return
            run, cur = cur, None
            run_w = run["right"] - run["left"]
            bbox = BBox(js_round(run["left"]), run["top"],
                        js_round(run["right"]), run["bottom"])
            mid = (run["top"] + run["bottom"]) / 2
            occupied = any(
                o.bbox.top < run["bottom"]
                - D["occupiedMidlineFrac"] * run["h"]
                and o.bbox.bottom > mid
                and min(o.bbox.right, run["right"])
                - max(o.bbox.left, run["left"])
                > max(D["occupiedMinOverlapPx"],
                      run_w * D["occupiedOverlapFrac"])
                and o not in line.words and not _RUN_RE.search(o.text)
                for o in words)
            if occupied:
                kill("underscore", "occupied", bbox)
                return

            def in_band(o):
                return o.bbox.top < run["bottom"] \
                    and o.bbox.bottom > run["top"]
            right_word = any(
                in_band(o) and o.bbox.left >= run["right"] - 2
                and o.bbox.left - run["right"]
                < D["leaderPageNumGapEm"] * run["h"]
                and re.fullmatch(r"[0-9]{1,4}[.)]?", o.text)
                for o in words)
            left_text = any(in_band(o) and o.bbox.right <= run["left"] + 2
                            and not re.fullmatch(r"_{3,}", o.text)
                            for o in words)
            if right_word and left_text:
                kill("underscore", "toc-leader", bbox)
                return
            cap_paren = any(
                in_band(o) and re.fullmatch(r"\)[.,;:]?", o.text)
                and o.bbox.left >= run["right"] - 2
                and o.bbox.left - run["right"]
                < D["capParenGapEm"] * run["h"]
                for o in words)
            if cap_paren:
                kill("underscore", "caption-paren", bbox)
                return
            if len(line.words) == 1 and run_w >= page.width \
                    * D["standaloneRuleWidthFrac"]:
                stacked = sum(
                    1 for t in underscore_only_tops
                    if D["stackGapMinEm"] * run["h"]
                    <= abs(t - run["top"])
                    <= D["stackGapMaxEm"] * run["h"]) \
                    >= D["stackMinMates"]
                prompt = False
                best_bottom = -float("inf")
                best_last = None
                for ln2 in page.lines:
                    if ln2 is line or ln2.bbox.bottom > run["top"] \
                            or run["top"] - ln2.bbox.bottom \
                            > D["promptLookbackEm"] * run["h"]:
                        continue
                    if ln2.bbox.bottom > best_bottom and ln2.words:
                        best_bottom = ln2.bbox.bottom
                        best_last = ln2.words[-1]
                if best_last is not None \
                        and re.search(r"[:?)]$", best_last.text):
                    prompt = True
                if not stacked and not prompt:
                    kill("underscore", "standalone-rule", bbox)
                    return
            # caption-row segmentation: one run above several short
            # captions is one field per caption.
            band_lines = []
            row_top = float("inf")
            for ln2 in page.lines:
                if ln2 is line or not ln2.words:
                    continue
                cy = (ln2.bbox.top + ln2.bbox.bottom) / 2
                if cy <= run["bottom"] or ln2.bbox.top \
                        > run["bottom"] + D["segCaptionBandEm"] * run["h"]:
                    continue
                band_lines.append(ln2)
                row_top = min(row_top, ln2.bbox.top)
            below = []
            for ln2 in band_lines:
                if ln2.bbox.top - row_top \
                        > D["segRowToleranceEm"] * run["h"]:
                    continue
                for o in ln2.words:
                    if _RUN_RE.search(o.text):
                        continue
                    cx = (o.bbox.left + o.bbox.right) / 2
                    if run["left"] <= cx <= run["right"]:
                        below.append(o)
            if len(below) >= 2:
                below.sort(key=lambda o: o.bbox.left)
                clusters = [[below[0]]]
                for o in below[1:]:
                    if o.bbox.left - clusters[-1][-1].bbox.right \
                            > D["segClusterGapEm"] * run["h"]:
                        clusters.append([])
                    clusters[-1].append(o)

                def caption_like(c):
                    if len(c) > D["segMaxClusterWords"]:
                        return False
                    t = " ".join(w.text for w in c)
                    return len(t) <= D["segMaxClusterChars"] \
                        and re.match(r"^[(A-Z]", t)
                if len(clusters) >= 2 and all(caption_like(c)
                                              for c in clusters):
                    cuts = []
                    for i in range(1, len(clusters)):
                        prev_right = max(w.bbox.right
                                         for w in clusters[i - 1])
                        next_left = min(w.bbox.left for w in clusters[i])
                        cuts.append((prev_right + next_left) / 2)
                    edges = [run["left"], *cuts, run["right"]]
                    segments = [(edges[i], edges[i + 1])
                                for i in range(len(edges) - 1)]
                    if all(r - l >= D["segMinSegmentPx"]
                           for l, r in segments):
                        for l, r in segments:
                            targets.append({
                                "kind": "blank",
                                "bbox": BBox(js_round(l), run["top"],
                                             js_round(r), run["bottom"]),
                                "source": "underscore"})
                        return
            targets.append({"kind": "blank", "bbox": bbox,
                            "source": "underscore"})

        for run in runs:
            if cur is not None and run["left"] - cur["right"] \
                    <= cur["h"] * D["runMergeGapEm"]:
                cur["right"] = max(cur["right"], run["right"])
                cur["top"] = min(cur["top"], run["top"])
                cur["bottom"] = max(cur["bottom"], run["bottom"])
            else:
                judge()
                cur = dict(run)
        judge()

    # Arm 3 — phone-parens slots.
    for line in content_lines:
        open_paren = None
        for word in line.words:
            if word.text == "(":
                open_paren = word
                continue
            if word.text != ")" or open_paren is None:
                open_paren = None
                continue
            slot = BBox(open_paren.bbox.right, open_paren.bbox.top,
                        word.bbox.left, open_paren.bbox.bottom)
            pair_open, open_paren = open_paren, None
            slot_h = slot.bottom - slot.top
            if slot.right - slot.left \
                    < slot_h * D["parensMinAspectOfHeight"]:
                kill("parens", "interior", slot)
                continue
            labelled = False
            for o in line.words:
                if o is pair_open:
                    break
                if PHONE_LABEL.search(o.text):
                    labelled = True
                    break
            if not labelled:
                kill("parens", "no-phone-label", slot)
                continue
            filled = any(
                o not in line.words
                and o.bbox.top < slot.bottom
                - D["parensFilledMidlineFrac"] * slot_h
                and o.bbox.bottom > (slot.top + slot.bottom) / 2
                and min(o.bbox.right, slot.right)
                - max(o.bbox.left, slot.left) > 0
                for o in words)
            if filled:
                kill("parens", "filled", slot)
                continue
            targets.append({"kind": "blank", "bbox": slot,
                            "source": "parens"})

    targets.sort(key=lambda t: (t["bbox"].top, t["bbox"].left))
    return targets
