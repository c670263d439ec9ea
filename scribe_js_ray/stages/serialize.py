"""Parsed-page serialization: Page trees ↔ nested Arrow (the ``.scribe``
save/restore analog, /root/reference/js/import/import.js:168-365 +
removeCircularRefsOcr/addCircularRefsOcr ocrObjects.js:1033-1184).

The reference saves a circular-ref-stripped JSON of the page tree; we save
the FIXTURES.md §F3 nested Arrow schema instead — a ``pages`` column a
``write_parquet`` can persist directly, restorable to identical Page trees
(ids regenerated deterministically; reference ids are random and excluded
from parity surfaces by design).
"""

from __future__ import annotations

import pyarrow as pa

from ..model import BBox, Char, Line, Page, Par, Word

_BBOX_T = pa.struct([("l", pa.float64()), ("t", pa.float64()),
                     ("r", pa.float64()), ("b", pa.float64())])
_CHAR_T = pa.struct([("text", pa.string()), ("bbox", _BBOX_T)])
_WORD_T = pa.struct([
    ("text", pa.string()), ("bbox", _BBOX_T),
    ("font", pa.string()), ("size", pa.float64()),
    ("bold", pa.bool_()), ("italic", pa.bool_()),
    ("underline", pa.bool_()), ("small_caps", pa.bool_()),
    ("sup", pa.bool_()), ("dropcap", pa.bool_()),
    ("conf", pa.int16()), ("lang", pa.string()),
    ("line_num", pa.bool_()),
    ("visual_coords", pa.bool_()),
    ("chars", pa.list_(_CHAR_T)),
])
_LINE_T = pa.struct([
    ("bbox", _BBOX_T),
    ("baseline", pa.list_(pa.float64())),
    ("asc_height", pa.float64()), ("x_height", pa.float64()),
    ("orientation", pa.int8()), ("par_idx", pa.int32()),
    ("words", pa.list_(_WORD_T)),
])
_PAR_T = pa.struct([("bbox", _BBOX_T), ("type", pa.string()),
                    ("reason", pa.string())])
_RULE_T = pa.struct([("y", pa.float64()), ("left", pa.float64()),
                     ("right", pa.float64())])
_TBOX_T = pa.struct([("left", pa.float64()), ("top", pa.float64()),
                     ("right", pa.float64()), ("bottom", pa.float64()),
                     ("col_separators", pa.list_(pa.float64())),
                     ("method", pa.string())])
_TBOX_PLAIN_T = pa.struct([("left", pa.float64()), ("top", pa.float64()),
                           ("right", pa.float64()),
                           ("bottom", pa.float64())])
# r3: annotation overlays (highlight/underline/strikeout/link marks with
# contents + link URIs, pdf/annots.py markup_spans)
_MARK_T = pa.struct([
    ("type", pa.string()),
    ("bbox", _TBOX_PLAIN_T),
    ("contents", pa.string()),
    ("uri", pa.string()),
])
PAGE_T = pa.struct([
    ("n", pa.int32()), ("width", pa.int32()), ("height", pa.int32()),
    ("angle", pa.float64()), ("text_source", pa.string()),
    ("lines", pa.list_(_LINE_T)), ("pars", pa.list_(_PAR_T)),
    # r2 model additions: drawn separator rules + detected table regions
    # (ocrObjects.js:22-34) must survive a save/restore or re-running
    # layout on the restored tree diverges.
    ("rules", pa.list_(_RULE_T)), ("table_boxes", pa.list_(_TBOX_T)),
    ("marks", pa.list_(_MARK_T)),
])
PAGES_T = pa.list_(PAGE_T)


def _bbox_py(b: BBox):
    return {"l": float(b.left), "t": float(b.top),
            "r": float(b.right), "b": float(b.bottom)}


def pages_to_py(pages: list[Page]) -> list[dict]:
    """Page trees → plain nested dicts matching PAGE_T."""
    out = []
    for page in pages:
        par_idx = {id(par): i for i, par in enumerate(page.pars)}
        lines = []
        for ln in page.lines:
            words = []
            for w in ln.words:
                words.append({
                    "text": w.text, "bbox": _bbox_py(w.bbox),
                    "font": w.style.font, "size": w.style.size,
                    "bold": w.style.bold, "italic": w.style.italic,
                    "underline": w.style.underline,
                    "small_caps": w.style.small_caps,
                    "sup": w.style.sup, "dropcap": w.style.dropcap,
                    "conf": int(w.conf), "lang": w.lang,
                    "line_num": w.line_num,
                    "visual_coords": w.visual_coords,
                    "chars": [{"text": c.text, "bbox": _bbox_py(c.bbox)}
                              for c in w.chars] if w.chars else None,
                })
            lines.append({
                "bbox": _bbox_py(ln.bbox),
                "baseline": [float(x) for x in ln.baseline],
                "asc_height": float(ln.asc_height)
                if ln.asc_height is not None else None,
                "x_height": float(ln.x_height)
                if ln.x_height is not None else None,
                "orientation": ln.orientation,
                "par_idx": par_idx.get(id(ln.par), -1),
                "words": words,
            })
        out.append({
            "n": page.n, "width": page.width, "height": page.height,
            "angle": float(page.angle),
            "text_source": page.text_source,
            "lines": lines,
            "pars": [{"bbox": _bbox_py(p.bbox), "type": p.type,
                      "reason": p.reason} for p in page.pars],
            "rules": [{"y": float(r["y"]), "left": float(r["left"]),
                       "right": float(r["right"])}
                      for r in (page.rules or [])],
            "table_boxes": [{"left": float(t["left"]),
                             "top": float(t["top"]),
                             "right": float(t["right"]),
                             "bottom": float(t["bottom"]),
                             "col_separators": [
                                 float(s) for s in
                                 (t.get("col_separators") or [])],
                             "method": t.get("method")}
                            for t in (page.table_boxes or [])],
            "marks": [{"type": m["type"],
                       "bbox": {"left": float(m["bbox"]["left"]),
                                "top": float(m["bbox"]["top"]),
                                "right": float(m["bbox"]["right"]),
                                "bottom": float(m["bbox"]["bottom"])},
                       "contents": m.get("contents") or "",
                       "uri": m.get("uri")}
                      for m in (getattr(page, "marks", None) or [])],
        })
    return out


def py_to_pages(page_dicts: list[dict]) -> list[Page]:
    """Inverse of pages_to_py, restoring par backrefs."""
    pages = []
    for d in page_dicts:
        page = Page(d["n"], d["width"], d["height"])
        page.angle = d["angle"]
        page.text_source = d.get("text_source")
        page.rules = [dict(r) for r in d.get("rules") or []]
        page.table_boxes = [dict(t) for t in d.get("table_boxes") or []]
        page.marks = []
        for m in d.get("marks") or []:
            mark = {"type": m["type"], "bbox": dict(m["bbox"]),
                    "contents": m.get("contents") or ""}
            if m.get("uri"):
                mark["uri"] = m["uri"]
            page.marks.append(mark)
        for pd in d["pars"] or []:
            b = pd["bbox"]
            par = Par(page, BBox(b["l"], b["t"], b["r"], b["b"]))
            par.type = pd["type"]
            par.reason = pd["reason"] or ""
            page.pars.append(par)
        for ld in d["lines"] or []:
            b = ld["bbox"]
            line = Line(page, BBox(b["l"], b["t"], b["r"], b["b"]),
                        ld["baseline"], ld["asc_height"], ld["x_height"])
            line.orientation = ld["orientation"] or 0
            pi = ld["par_idx"]
            if pi is not None and 0 <= pi < len(page.pars):
                line.par = page.pars[pi]
                line.par.lines.append(line)
            wid_n = 0
            for wd in ld["words"] or []:
                wb = wd["bbox"]
                word = Word(line, f"word_{d['n'] + 1}_"
                            f"{len(page.lines) + 1}_{wid_n + 1}",
                            wd["text"],
                            BBox(wb["l"], wb["t"], wb["r"], wb["b"]))
                word.style.font = wd["font"]
                word.style.size = wd["size"]
                word.style.bold = wd["bold"]
                word.style.italic = wd["italic"]
                word.style.underline = wd["underline"]
                word.style.small_caps = wd["small_caps"]
                word.style.sup = wd["sup"]
                word.style.dropcap = wd["dropcap"]
                word.conf = wd["conf"]
                word.lang = wd["lang"]
                word.line_num = wd["line_num"]
                vc = wd.get("visual_coords")
                word.visual_coords = True if vc is None else vc
                if wd["chars"]:
                    word.chars = [
                        Char(cd["text"],
                             BBox(cd["bbox"]["l"], cd["bbox"]["t"],
                                  cd["bbox"]["r"], cd["bbox"]["b"]))
                        for cd in wd["chars"]]
                line.words.append(word)
                wid_n += 1
            page.lines.append(line)
        pages.append(page)
    return pages


def pages_column(list_of_page_lists) -> pa.Array:
    """[[Page,...], ...] → Arrow ListArray of PAGE_T (one row per doc)."""
    return pa.array([pages_to_py(p) for p in list_of_page_lists], PAGES_T)


def column_to_pages(arr) -> list[list[Page]]:
    return [py_to_pages(row) for row in arr.to_pylist()]
