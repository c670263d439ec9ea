"""PDF annotations + outline parsing (SURVEY §2 M28, extraction subset).

References:
* form-field value lifting — /root/reference/js/pdf/parsePdfDoc.js:1100-1176:
  visible /Widget annots with /FT Tx|Ch and a non-empty /V are typeset as
  synthetic lines at the field rect (Helvetica), inserted y-ordered into
  the page, and counted toward the text-native verdict.
* field-type decoding — same range: Ch→choice, Sig→signature, Btn→
  button/radio/checkbox by /Ff bits; hidden when /F bit 2 or 32.
* outline — /root/reference/js/pdf/parseOutline.js: walk /Outlines
  First/Next chain, decode titles, track depth.

Field-value typesetting runs through the shared ``fieldlayout`` port
(multiline wrap, comb cells, quadding, /DA font size); field attrs
resolve up the /Parent chain with the dotted fully-qualified name.
Checkbox/radio on-states scan the /AP /N appearance dict and choice
/Opt pairs surface their display strings, like the reference.
Simplifications vs the reference (documented): annotation replies,
highlights and shapes are summarized (subtype/rect/contents) rather
than modeled."""

from __future__ import annotations

import re

from ...model import BBox, Line, Word
from .objects import Ref

# Lifted-word id prefix shared by every field (parse + edit lifts);
# the bbox test is what scopes removal to one widget (formFields.js:30).
_LIFTED_ID_RE = re.compile(r"^word_\d+_f")


def decode_pdf_string(b) -> str:
    """UTF-16BE with BOM, else PDFDocEncoding (≈ latin-1)."""
    if isinstance(b, str):
        return b
    if not isinstance(b, (bytes, bytearray)):
        return ""
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be", "replace")
        except Exception:
            pass
    return b.decode("latin-1", "replace")


def _field_type(ft: str, ff: int) -> str:
    if ft == "Ch":
        return "choice"
    if ft == "Sig":
        return "signature"
    if ft == "Btn":
        if ff & 0x10000:
            return "button"
        if ff & 0x8000:
            return "radio"
        return "checkbox"
    return "text"


def parse_page_annotations(pdf, page_dict: dict) -> list[dict]:
    """Page /Annots → flat summaries (type/subtype/rect/contents/value).
    Per-annotation isolation: ONE malformed annotation must never drop
    the rest of the array — a pending /Redact elsewhere in it still has
    to remove its content (parsePdfAnnots.js:110-111)."""
    out = []
    annots = pdf.resolve(page_dict.get("Annots"))
    if not isinstance(annots, list):
        return out
    for a_ref in annots:
        try:
            out.extend(_parse_one_annotation(pdf, a_ref))
        except Exception:
            continue
    return out


def _parse_one_annotation(pdf, a_ref) -> list[dict]:
    obj_num = a_ref.num if isinstance(a_ref, Ref) else None
    a = pdf.resolve(a_ref)
    if not isinstance(a, dict):
        return []
    subtype = str(pdf.resolve(a.get("Subtype")) or "")
    rect = [float(pdf.resolve(x) or 0)
            for x in (pdf.resolve(a.get("Rect")) or [0, 0, 0, 0])]
    flags = int(pdf.resolve(a.get("F")) or 0)
    entry = {
        "subtype": subtype,
        "rect": rect,
        "obj_num": obj_num,
        "hidden": bool(flags & 2 or flags & 32),
        "contents": decode_pdf_string(pdf.resolve(a.get("Contents"))),
    }
    # Text-markup + redaction geometry: QuadPoints quads (8 numbers
    # per quad) override /Rect (parsePdfAnnots.js:497-510, :583-588).
    if subtype in ("Redact", "Highlight", "Underline", "StrikeOut",
                   "Squiggly", "Link"):
        qp = pdf.resolve(a.get("QuadPoints"))
        if isinstance(qp, list) and len(qp) >= 8:
            entry["quad_points"] = [float(pdf.resolve(x) or 0)
                                    for x in qp]
        if subtype == "Link":
            action = pdf.resolve(a.get("A")) or {}
            uri = pdf.resolve(action.get("URI")) \
                if isinstance(action, dict) else None
            if uri is not None:
                entry["uri"] = decode_pdf_string(uri)
    if subtype == "Widget":
        # Field attrs resolve up the /Parent chain (16 levels,
        # cycle-guarded) and the fully-qualified name is every level's
        # own /T joined root-to-leaf with '.'
        # (parsePdfAnnots.js:327-378).
        chain = [a]
        seen_parents = {obj_num} if obj_num is not None else set()
        cur = a
        for _ in range(16):
            pref = cur.get("Parent")
            pnum = pref.num if isinstance(pref, Ref) else None
            if pnum is not None:
                if pnum in seen_parents:
                    break
                seen_parents.add(pnum)
            parent = pdf.resolve(pref)
            if not isinstance(parent, dict):
                break
            chain.append(parent)
            cur = parent

        def chain_get(key):
            for d in chain:
                if key in d:
                    return pdf.resolve(d.get(key))
            return None

        ft = str(chain_get("FT") or "")
        ff = int(chain_get("Ff") or 0)
        name_parts = [decode_pdf_string(pdf.resolve(d["T"]))
                      for d in chain if "T" in d]
        name = ".".join(reversed(name_parts)) if name_parts \
            else "(unnamed)"
        raw_v = chain_get("V")
        value = None
        if raw_v is not None:
            if ft == "Btn":
                value = str(raw_v) if isinstance(raw_v, str) \
                    else decode_pdf_string(raw_v)
            elif ft == "Sig":
                if isinstance(raw_v, dict):
                    entry["signed"] = True
            elif isinstance(raw_v, list):
                # Multi-select choice: '; '-joined decoded entries
                # (parsePdfAnnots.js:373-377).
                parts = [decode_pdf_string(pdf.resolve(x))
                         for x in raw_v]
                value = "; ".join(parts) if parts else None
            else:
                value = decode_pdf_string(raw_v)
            if value and value[0] == "\ufeff":
                value = value[1:]
        if ft == "Btn" and value == "Off":
            value = None
        entry.update({
            "type": "field",
            "field_type": _field_type(ft, ff),
            "ft": ft,
            "name": name,
            "value": value if value is not None else "",
        })
        # Appearance attrs for the field-value layout
        # (parsePdfDoc.js:1113-1121: Ff bit 13 multiline, bit 25 comb
        # — Tx only; /MaxLen only meaningful with comb; /Q quadding;
        # /DA default-appearance string whose Tf size wins).
        if ft == "Tx" and (ff & 0x1000):
            entry["multiline"] = True
        if ft == "Tx" and (ff & 0x1000000):
            entry["comb"] = True
            max_len = chain_get("MaxLen")
            if max_len:
                entry["max_len"] = int(max_len)
        q = chain_get("Q")
        if q:
            entry["quadding"] = int(q)
        da = chain_get("DA")
        if da is not None:
            entry["da"] = decode_pdf_string(da)
        if ff & 1:
            entry["read_only"] = True
        if ff & 2:
            entry["required"] = True
        # Checkbox/radio on-state: scan the /AP /N appearance dict for
        # its non-Off state name; a /N carrying /BBox is a single
        # appearance stream, not a state dict (parsePdfAnnots.js:393-404).
        if ft == "Btn" and not (ff & 0x10000):
            on_state = None
            ap = pdf.resolve(a.get("AP"))
            n = pdf.resolve(ap.get("N")) if isinstance(ap, dict) else None
            if isinstance(n, dict) and "BBox" not in n:
                for k in n:
                    if str(k) != "Off":
                        on_state = str(k)
                        break
            if on_state is None and value:
                on_state = value
            if on_state is not None and entry["field_type"] in (
                    "checkbox", "radio"):
                entry["on_state"] = on_state
        # Choice options: /Opt strings, or [export, display] pairs whose
        # LAST string is the user-visible text (parsePdfAnnots.js:407-427).
        if ft == "Ch":
            opt_arr = chain_get("Opt")
            if isinstance(opt_arr, list):
                options = []
                for o in opt_arr:
                    o = pdf.resolve(o)
                    if isinstance(o, list):
                        strs = [pdf.resolve(x) for x in o]
                        strs = [x for x in strs
                                if isinstance(x, (str, bytes, bytearray))]
                        if not strs:
                            continue
                        o = strs[-1]
                    if isinstance(o, (str, bytes, bytearray)):
                        s = decode_pdf_string(o)
                        if s and s[0] == "\ufeff":
                            s = s[1:]
                        options.append(s)
                if options:
                    entry["options"] = options
    else:
        entry["type"] = subtype.lower() or "annotation"
    return [entry]


def lift_one_field(page, a: dict, page_height_dev: float, scale: float,
                   field_idx=None, id_tag: str | None = None) -> int:
    """Typeset ONE visible Tx/Ch field's value as synthetic lines via
    the shared field layout (parsePdfDoc.js:1127-1176 geometry mapping:
    /Rect-local layout points → device space through the page scale and
    y-flip; asc/desc = fontSize·0.8/0.2; Helvetica; y-ordered insert).
    Returns printable chars lifted."""
    from ...functions.stats import js_round, round3
    from ...functions.textnorm import calc_lang
    from .fieldlayout import layout_field_value

    value = (a.get("value") or "")
    if not value.strip():
        return 0
    rect = a["rect"]
    llx, lly = min(rect[0], rect[2]), min(rect[1], rect[3])
    rect_w = abs(rect[2] - rect[0])
    rect_h = abs(rect[3] - rect[1])
    if rect_w <= 0 or rect_h <= 0:
        return 0
    layout = layout_field_value(
        value, rect_w, rect_h, multiline=bool(a.get("multiline")),
        comb=bool(a.get("comb")), max_len=a.get("max_len"),
        quadding=int(a.get("quadding") or 0), da=a.get("da"))
    font_size = layout["font_size"]
    asc, desc = font_size * 0.8, font_size * 0.2

    def map_pt(x_pt: float, y_pt: float) -> tuple[float, float]:
        # device space: top-left origin, y = page_height - pdf_y
        return x_pt * scale, page_height_dev - y_pt * scale

    # Word-id "f" chunk: parse-time lift numbers fields sequentially
    # ("f{idx}_{line}_{wi}", parsePdfDoc.js:1162); the edit verb uses
    # the widget object ref with an "e" marker ("f{src}e{line}_{wi}",
    # formFields.js:71) so re-lifted words occupy their own namespace.
    tag = id_tag if id_tag is not None else f"{field_idx}_"
    printable = 0
    lift_line_idx = 0
    for ll in layout["lines"]:
        if not ll["words"]:
            continue
        lift_line_idx += 1
        word_specs = []
        for lw in ll["words"]:
            ax, ay = map_pt(llx + lw["x0"], lly + ll["y"] + asc)
            bx, by = map_pt(llx + lw["x1"], lly + ll["y"] - desc)
            word_specs.append((lw["text"], BBox(
                js_round(min(ax, bx)), js_round(min(ay, by)),
                js_round(max(ax, bx)), js_round(max(ay, by)))))
        line_bbox = BBox(min(s[1].left for s in word_specs),
                         min(s[1].top for s in word_specs),
                         max(s[1].right for s in word_specs),
                         max(s[1].bottom for s in word_specs))
        _, base_y = map_pt(llx + ll["x"], lly + ll["y"])
        line = Line(page, line_bbox,
                    [0, js_round(base_y) - line_bbox.bottom],
                    asc * scale, None)
        for wi, (wt, wb) in enumerate(word_specs):
            word = Word(line, f"word_{page.n + 1}_f{tag}"
                        f"{lift_line_idx}_{wi + 1}", wt, wb)
            word.conf = 100
            word.visual_coords = False  # parsePdfDoc.js:1163
            word.lang = calc_lang(wt)
            word.style.font = "Helvetica"
            word.style.size = round3(font_size * scale)
            line.words.append(word)
            printable += len(wt)
        # keep page lines y-ordered (parsePdfDoc.js:1172-1174)
        insert_at = next(
            (i for i, ln in enumerate(page.lines)
             if ln.bbox.top > line.bbox.top), None)
        if insert_at is None:
            page.lines.append(line)
        else:
            page.lines.insert(insert_at, line)
    return printable


def lift_field_values(page, annotations: list[dict],
                      page_height: float, scale: float = 1.0) -> int:
    """Insert visible Tx/Ch field values as synthetic lines; returns the
    number of printable characters lifted (feeds pageStats.printableVis,
    parsePdfDoc.js:1172-1174).

    ``page_height`` is in PDF points; ``scale`` is the page's raster
    scale (group_chars_into_page multiplied every real line's coords by
    it), so lifted geometry is scaled identically.  The per-field
    typesetting runs through the shared ``layout_field_value`` port
    (multiline wrap, comb cells, quadding, /DA font size)."""
    printable = 0
    field_idx = 0
    page_height_dev = page_height * scale
    for a in annotations:
        if a.get("type") != "field" or a.get("hidden"):
            continue
        if a.get("ft") not in ("Tx", "Ch"):
            continue
        if not (a.get("value") or "").strip():
            continue
        rect = a["rect"]
        if abs(rect[2] - rect[0]) <= 0 or abs(rect[3] - rect[1]) <= 0:
            continue  # fieldIdx only advances for liftable rects
        field_idx += 1
        printable += lift_one_field(page, a, page_height_dev, scale,
                                    field_idx)
    return printable


def set_form_value(pages, name: str, value) -> int:
    """Set a form field's value by fully-qualified name across the doc's
    pages; the field's lifted words in the page text are regenerated so
    extracted text and exports stay in sync (formFields.js:15-87).
    ``''``/None clears; for checkboxes/radios, the on-state name or
    ``'Off'``.  Returns the number of widget rows updated.

    Field rows live on ``page.annots`` (attached at parse,
    doc.annotations.pages analog) with their /Rect in PDF points plus
    the page's device scale, so removal scopes by the widget's
    device-space bbox ± 2 px and the re-lift reuses the shared
    ``layout_field_value`` typesetting."""
    updated = 0
    for page in pages:
        for row in getattr(page, "annots", None) or []:
            if row.get("type") != "field" or row.get("name") != name:
                continue
            is_toggle = row.get("field_type") in ("checkbox", "radio")
            cleared = value is None or value == "" or \
                (is_toggle and value == "Off")
            row["value"] = None if cleared else value
            updated += 1

            scale = float(row.get("_scale") or 1.0)
            page_h = float(row.get("_page_h_dev") or page.height)
            rect = row.get("rect") or [0, 0, 0, 0]
            llx, lly = min(rect[0], rect[2]), min(rect[1], rect[3])
            urx, ury = max(rect[0], rect[2]), max(rect[1], rect[3])
            dev = BBox(llx * scale, page_h - ury * scale,
                       urx * scale, page_h - lly * scale)
            pad = 2

            def keep(line) -> bool:
                lifted = bool(line.words) and all(
                    _LIFTED_ID_RE.match(w.id or "") for w in line.words)
                if not lifted:
                    return True
                # Known parity limit shared with the reference
                # (formFields.js:30-36): a lifted value typeset WIDER
                # than its rect extends past the +pad test and its old
                # words survive a re-set.  Kept bug-for-bug until the
                # reference changes its inside-test.
                inside = (line.bbox.left >= dev.left - pad
                          and line.bbox.right <= dev.right + pad
                          and line.bbox.top >= dev.top - pad
                          and line.bbox.bottom <= dev.bottom + pad)
                return not inside

            page.lines = [ln for ln in page.lines if keep(ln)]

            if row.get("hidden") or \
                    row.get("field_type") not in ("text", "choice"):
                continue
            if not row["value"] or not str(row["value"]).strip():
                continue
            src = row.get("obj_num")
            lift_one_field(page, row, page_h, scale,
                           id_tag=f"{src if src is not None else 'x'}e")
    return updated


def _quads_to_device_rects(a: dict, page_height: float,
                           scale: float) -> list[BBox]:
    """Annotation geometry → device-space rects (top-left origin, raster
    scale): one rect per QuadPoints quad, else one from /Rect
    (pdfRedactToAnnotations, parsePdfAnnots.js:627-675)."""
    rects = []
    qp = a.get("quad_points")
    if qp:
        for i in range(0, len(qp) - 7, 8):
            xs = qp[i:i + 8:2]
            ys = qp[i + 1:i + 8:2]
            rects.append(BBox(
                min(xs) * scale, page_height * scale - max(ys) * scale,
                max(xs) * scale, page_height * scale - min(ys) * scale))
    else:
        r = a.get("rect") or [0, 0, 0, 0]
        llx, urx = min(r[0], r[2]), max(r[0], r[2])
        lly, ury = min(r[1], r[3]), max(r[1], r[3])
        if urx > llx and ury > lly:
            rects.append(BBox(llx * scale,
                              (page_height - ury) * scale,
                              urx * scale,
                              (page_height - lly) * scale))
    return rects


def redaction_rects(annotations: list[dict], page_height: float,
                    scale: float = 1.0) -> list[BBox]:
    """Device-space redaction marks from /Redact annotations.  A hidden
    redaction still applies — a pending mark must remove its content at
    export regardless of visibility flags (parsePdfAnnots.js:110-111)."""
    out = []
    for a in annotations:
        if a.get("subtype") == "Redact":
            out.extend(_quads_to_device_rects(a, page_height, scale))
    return out


def apply_redactions(page, rects: list[BBox]) -> int:
    """Drop every word whose bbox STRICTLY overlaps a redaction rect —
    all-or-nothing per word, over-redaction beats a leak
    (export.js:336-353).  Empty lines are removed; returns the number of
    words dropped."""
    if not rects:
        return 0
    dropped = 0
    kept_lines = []
    for line in page.lines:
        kept = []
        for w in line.words:
            b = w.bbox
            hit = any(b.left < r.right and b.right > r.left and
                      b.top < r.bottom and b.bottom > r.top
                      for r in rects)
            if hit:
                dropped += 1
            else:
                kept.append(w)
        if kept:
            if len(kept) != len(line.words):
                line.words = kept
                line.bbox = BBox(min(w.bbox.left for w in kept),
                                 min(w.bbox.top for w in kept),
                                 max(w.bbox.right for w in kept),
                                 max(w.bbox.bottom for w in kept))
            kept_lines.append(line)
    if dropped:
        page.lines = kept_lines
    return dropped


def markup_spans(annotations: list[dict], page_height: float,
                 scale: float = 1.0) -> list[dict]:
    """Highlight / Underline / StrikeOut / Link annotations → carried
    device-space marks [{type, bbox, contents, uri?}] (the reference
    models these as overlay annotations, parsePdfAnnots.js:583-598;
    /Squiggly stays a passthrough, :115)."""
    out = []
    for a in annotations:
        sub = a.get("subtype")
        if sub not in ("Highlight", "Underline", "StrikeOut", "Link") \
                or a.get("hidden"):
            continue
        for r in _quads_to_device_rects(a, page_height, scale):
            mark = {"type": sub.lower(),
                    "bbox": {"left": r.left, "top": r.top,
                             "right": r.right, "bottom": r.bottom},
                    "contents": a.get("contents") or ""}
            if a.get("uri"):
                mark["uri"] = a["uri"]
            out.append(mark)
    return out


def parse_outline(pdf) -> list[dict]:
    """Document /Outlines → [{title, level}] in document order."""
    root = pdf.resolve(pdf.trailer.get("Root")) or {}
    outlines = pdf.resolve(root.get("Outlines"))
    out: list[dict] = []
    if not isinstance(outlines, dict):
        return out

    seen = set()

    def walk(node_ref, level):
        node = pdf.resolve(node_ref)
        while isinstance(node, dict):
            key = id(node)
            if key in seen or len(out) > 10000:
                return
            seen.add(key)
            title = decode_pdf_string(pdf.resolve(node.get("Title")))
            if title:
                out.append({"title": title, "level": level})
            first = node.get("First")
            if first is not None:
                walk(first, level + 1)
            node = pdf.resolve(node.get("Next"))

    walk(outlines.get("First"), 0)
    return out
