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

Simplifications vs the reference (documented): single-font (Helvetica AFM)
field layout without the comb/quadding/DA machinery; annotation replies,
highlights and shapes are summarized (subtype/rect/contents) rather than
modeled."""

from __future__ import annotations

from ...model import BBox, Line, Word
from .objects import Ref
from .widths import base14_widths

_HELV = base14_widths("Helvetica")


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
    """Page /Annots → flat summaries (type/subtype/rect/contents/value)."""
    out = []
    annots = pdf.resolve(page_dict.get("Annots"))
    if not isinstance(annots, list):
        return out
    for a_ref in annots:
        obj_num = a_ref.num if isinstance(a_ref, Ref) else None
        a = pdf.resolve(a_ref)
        if not isinstance(a, dict):
            continue
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
        if subtype == "Widget":
            # field attrs may live on the widget or its /Parent
            parent = pdf.resolve(a.get("Parent")) or {}
            ft = str(pdf.resolve(a.get("FT")) or
                     pdf.resolve(parent.get("FT")) or "")
            ff = int(pdf.resolve(a.get("Ff")) or
                     pdf.resolve(parent.get("Ff")) or 0)
            value = pdf.resolve(a.get("V"))
            if value is None:
                value = pdf.resolve(parent.get("V"))
            entry.update({
                "type": "field",
                "field_type": _field_type(ft, ff),
                "ft": ft,
                "name": decode_pdf_string(pdf.resolve(a.get("T")) or
                                          pdf.resolve(parent.get("T"))),
                "value": decode_pdf_string(value),
            })
        else:
            entry["type"] = subtype.lower() or "annotation"
        out.append(entry)
    return out


def lift_field_values(page, annotations: list[dict],
                      page_height: float, scale: float = 1.0) -> int:
    """Insert visible Tx/Ch field values as synthetic lines; returns the
    number of printable characters lifted (feeds pageStats.printableVis,
    parsePdfDoc.js:1172-1174).

    ``page_height`` is in PDF points; ``scale`` is the page's raster
    scale (group_chars_into_page multiplied every real line's coords by
    it), so lifted geometry is scaled identically."""
    printable = 0
    field_idx = 0
    page_height = page_height * scale
    for a in annotations:
        if a.get("type") != "field" or a.get("hidden"):
            continue
        if a.get("ft") not in ("Tx", "Ch"):
            continue
        value = (a.get("value") or "").strip()
        if not value:
            continue
        rect = [v * scale for v in a["rect"]]
        llx, lly = min(rect[0], rect[2]), min(rect[1], rect[3])
        urx, ury = max(rect[0], rect[2]), max(rect[1], rect[3])
        rect_w, rect_h = urx - llx, ury - lly
        if rect_w <= 0 or rect_h <= 0:
            continue
        field_idx += 1
        font_size = min(10.0 * scale, rect_h * 0.8)
        asc, desc = font_size * 0.8, font_size * 0.2
        # device space: top-left origin, y = page_height - pdf_y
        for lift_idx, text_line in enumerate(value.split("\n")):
            words_text = text_line.split()
            if not words_text:
                continue
            top = page_height - ury + lift_idx * font_size * 1.2
            bottom = top + asc + desc
            line = Line(page, BBox(llx, top, llx, bottom), [0, 0],
                        asc, None)
            x = llx
            for wi, wt in enumerate(words_text):
                width = sum(_HELV.get(c, 500) for c in wt) * \
                    font_size / 1000.0
                word = Word(line, f"word_{page.n + 1}_f{field_idx}_"
                            f"{lift_idx + 1}_{wi + 1}", wt,
                            BBox(round(x), round(top),
                                 round(x + width), round(bottom)))
                word.conf = 100
                word.style.font = "Helvetica"
                word.style.size = font_size
                line.words.append(word)
                printable += len(wt)
                x += width + font_size * 0.28
            line.bbox = BBox(min(w.bbox.left for w in line.words),
                             round(top),
                             max(w.bbox.right for w in line.words),
                             round(bottom))
            # keep page lines y-ordered (parsePdfDoc.js:1172-1174)
            insert_at = next(
                (i for i, ln in enumerate(page.lines)
                 if ln.bbox.top > line.bbox.top), None)
            if insert_at is None:
                page.lines.append(line)
            else:
                page.lines.insert(insert_at, line)
    return printable


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
