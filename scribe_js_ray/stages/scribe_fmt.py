"""Reference ``.scribe`` session-format interop (read + write).

The reference persists sessions as JSON in two layouts
(``js/import/import.js:168-365`` restore, ``js/export/export.js:190-220``
segmented writer), optionally gzipped (sniffed by the 1F 8B magic):

- whole-file: one JSON object ``{"ocr": [<page>...], ...}``
- segmented (GB-scale files): first line a header
  ``{"scribeSegments": 1, "pageCount": N, ...}``, then one
  ``{"i": n, "ocr": <page>}`` record per line — readable without ever
  holding the whole document as one string.

Pages are the circular-ref-stripped OcrPage JSON
(``ocrObjects.js:1033-1101 removeCircularRefsOcr``): ``par.lineIds`` +
``line.parId`` replace the object cycles, bboxes are
``{left, top, right, bottom}``, fields are camelCase (``ascHeight``,
``xHeight``, ``smallCaps``, ``textSource``).

This module maps that shape to/from this repo's Page model so users can
migrate reference sessions in and write sessions the reference can open.
The repo's own (columnar parquet) session format stays in
``serialize.py`` — this is the interchange path, not the native one.
"""

from __future__ import annotations

import gzip
import json

from ..model import BBox, Char, Line, Page, Par, Word

_GZIP_MAGIC = b"\x1f\x8b"
_SEG_HEAD = b'{"scribeSegments"'


def _bbox_json(b: BBox) -> dict:
    return {"left": float(b.left), "top": float(b.top),
            "right": float(b.right), "bottom": float(b.bottom)}


def _page_json(page: Page, char_boxes: bool = True,
               include_text: bool = False) -> dict:
    par_ids = {id(p): f"par_{page.n + 1}_{i + 1}"
               for i, p in enumerate(page.pars)}
    par_lines: dict[str, list[str]] = {pid: [] for pid in par_ids.values()}
    lines = []
    for li, ln in enumerate(page.lines):
        line_id = f"line_{page.n + 1}_{li + 1}"
        words = []
        for wi, w in enumerate(ln.words):
            wd = {
                # preserve real ids (the reference carries word.id in
                # .scribe; lifted-field words are recognized by their
                # word_N_f… namespace on restore)
                "id": w.id or f"word_{page.n + 1}_{li + 1}_{wi + 1}",
                "text": w.text,
                "bbox": _bbox_json(w.bbox),
                "style": {
                    "font": w.style.font, "size": w.style.size,
                    "bold": bool(w.style.bold),
                    "italic": bool(w.style.italic),
                    "underline": bool(w.style.underline),
                    "smallCaps": bool(w.style.small_caps),
                    "sup": bool(w.style.sup),
                    "dropcap": bool(w.style.dropcap),
                    "color": w.style.color,
                    "opacity": w.style.opacity,
                },
                "conf": int(w.conf), "lang": w.lang,
                "visualCoords": bool(w.visual_coords),
            }
            if w.line_num:
                wd["lineNum"] = True
            if w.chars and char_boxes:
                wd["chars"] = [{"text": c.text, "bbox": _bbox_json(c.bbox)}
                               for c in w.chars]
            words.append(wd)
        ld = {
            "id": line_id,
            "bbox": _bbox_json(ln.bbox),
            "baseline": [float(x) for x in ln.baseline],
            "ascHeight": float(ln.asc_height)
            if ln.asc_height is not None else None,
            "xHeight": float(ln.x_height)
            if ln.x_height is not None else None,
            "orientation": int(ln.orientation or 0),
            "words": words,
        }
        if include_text:
            # plain space-join, the reference's getLineText
            # (ocrObjects.js:402-409)
            ld["text"] = " ".join(w.text or "" for w in ln.words)
        pid = par_ids.get(id(ln.par))
        if pid is not None:
            ld["parId"] = pid
            par_lines[pid].append(line_id)
        lines.append(ld)
    pars = []
    for i, p in enumerate(page.pars):
        pid = par_ids[id(p)]
        pd = {"id": pid, "bbox": _bbox_json(p.bbox),
              "type": p.type, "reason": p.reason or "",
              "lineIds": par_lines[pid]}
        if include_text:
            # getParText: space-joined line texts (ocrObjects.js:414-421)
            pd["text"] = " ".join(
                " ".join(w.text or "" for w in ln.words)
                for ln in p.lines)
        pars.append(pd)
    out = {
        "n": page.n,
        "dims": {"width": page.width, "height": page.height},
        "angle": float(page.angle or 0.0),
        "textSource": page.text_source,
        "lines": lines,
        "pars": pars,
    }
    if include_text:
        # getPageText: newline-joined line texts (ocrObjects.js:426-433)
        out["text"] = "\n".join(
            " ".join(w.text or "" for w in ln.words)
            for ln in page.lines)
    return out


def _annots_json(pages: list[Page]) -> list:
    """Per-page annotation rows in the reference's doc.annotations.pages
    shape (import.js:299-301): our carried marks map 1:1, and form-field
    rows (page.annots) ride in the same list with a device-space bbox
    like the reference's field rows, plus open ``rect``/``scale``
    extension fields so our own round-trip is lossless."""
    out = []
    for page in pages:
        rows = []
        for m in (page.marks if page else []) or []:
            if not isinstance(m, dict):
                continue
            row = {k: v for k, v in m.items() if k != "bbox"}
            row["bbox"] = _bbox_json(m["bbox"]) \
                if isinstance(m.get("bbox"), BBox) else m.get("bbox")
            rows.append(row)
        for f in (getattr(page, "annots", None) if page else []) or []:
            if not isinstance(f, dict) or f.get("type") != "field":
                continue
            row = {k: v for k, v in f.items()
                   if not k.startswith("_")}
            # reference field-row key names (parsePdfDoc.js:1108-1121)
            if "field_type" in row:
                row["fieldType"] = row.pop("field_type")
            if "obj_num" in row:
                row["srcRef"] = row.pop("obj_num")
            scale = float(f.get("_scale") or 1.0)
            page_h = float(f.get("_page_h_dev")
                           or (page.height if page else 0))
            rect = f.get("rect") or [0, 0, 0, 0]
            llx, lly = min(rect[0], rect[2]), min(rect[1], rect[3])
            urx, ury = max(rect[0], rect[2]), max(rect[1], rect[3])
            row["bbox"] = {"left": llx * scale,
                           "top": page_h - ury * scale,
                           "right": urx * scale,
                           "bottom": page_h - lly * scale}
            row["scale"] = scale
            rows.append(row)
        out.append(rows)
    return out


def write_scribe(pages: list[Page], segmented: bool = True,
                 gzip_out: bool = False, outline: list | None = None,
                 text_edits: list | None = None,
                 char_boxes: bool = True,
                 include_text: bool = False,
                 font_state: dict | None = None) -> bytes:
    """Page trees → reference-format ``.scribe`` bytes.  Carried marks
    ride as ``annotations`` (header field in the segmented layout,
    import.js:220-227); ``text_edits`` (per-page edit-record lists from
    stages/textedits.py) ride in ``session.textEdits`` — segmented: one
    ``textEdits`` field per page record (import.js:240).
    ``char_boxes=False`` drops per-char bounding boxes (export.js:152
    pageForScribe includeCharBoxes; the reference CLI's --char-boxes
    default, roughly halving file size).  ``include_text=True`` adds
    plain-join ``text`` fields at page/par/line level
    (includeExtraTextScribe, export.js:294 →
    ocrObjects.js:1030-1070 removeCircularRefsOcr includeText)."""
    annots = _annots_json(pages)
    has_annots = any(annots)
    if segmented:
        header: dict = {"scribeSegments": 1, "pageCount": len(pages)}
        if font_state is not None:
            # Doc font state rides the header (export.js:196
            # scribeSegmentChunks); the reference restore applies it via
            # objectAssignDefined and re-derives the default font +
            # optimization from charMetrics (import.js:288-289,380-389).
            header["fontState"] = font_state
        if has_annots:
            header["annotations"] = annots
        if outline is not None:
            header["outline"] = outline
        if text_edits is not None:
            header["session"] = {}
        chunks = [json.dumps(header)]
        for i, page in enumerate(pages):
            rec: dict = {"i": i, "ocr": _page_json(page, char_boxes, include_text) if page
                         else None}
            if text_edits is not None and i < len(text_edits) \
                    and text_edits[i]:
                rec["textEdits"] = text_edits[i]
            chunks.append("\n" + json.dumps(rec))
        data = "".join(chunks).encode("utf-8")
    else:
        obj: dict = {"ocr": [_page_json(p, char_boxes, include_text) if p else None
                             for p in pages]}
        if font_state is not None:
            obj["fontState"] = font_state
        if has_annots:
            obj["annotations"] = annots
        if outline is not None:
            obj["outline"] = outline
        if text_edits is not None:
            obj["session"] = {"textEdits": text_edits}
        data = json.dumps(obj).encode("utf-8")
    return gzip.compress(data) if gzip_out else data


def _bbox_of(d) -> BBox:
    d = d or {}
    return BBox(float(d.get("left", 0)), float(d.get("top", 0)),
                float(d.get("right", 0)), float(d.get("bottom", 0)))


def _page_from_json(pd: dict) -> Page:
    dims = pd.get("dims") or {}
    page = Page(int(pd.get("n", 0)),
                int(dims.get("width", 0)), int(dims.get("height", 0)))
    page.angle = float(pd.get("angle") or 0.0)
    page.text_source = pd.get("textSource")
    pars_by_id: dict[str, Par] = {}
    for p in pd.get("pars") or []:
        par = Par(page, _bbox_of(p.get("bbox")))
        par.type = p.get("type") or "body"
        par.reason = p.get("reason") or ""
        page.pars.append(par)
        if p.get("id"):
            pars_by_id[p["id"]] = par
    for ld in pd.get("lines") or []:
        line = Line(page, _bbox_of(ld.get("bbox")),
                    ld.get("baseline") or [0.0, 0.0],
                    ld.get("ascHeight"), ld.get("xHeight"))
        line.orientation = int(ld.get("orientation") or 0)
        par = pars_by_id.get(ld.get("parId"))
        if par is not None:
            line.par = par
            par.lines.append(line)
        for wi, wd in enumerate(ld.get("words") or []):
            word = Word(line, wd.get("id") or f"w{wi}",
                        wd.get("text") or "", _bbox_of(wd.get("bbox")))
            st = wd.get("style") or {}
            word.style.font = st.get("font")
            word.style.size = st.get("size")
            word.style.bold = bool(st.get("bold"))
            word.style.italic = bool(st.get("italic"))
            word.style.underline = bool(st.get("underline"))
            word.style.small_caps = bool(st.get("smallCaps"))
            word.style.sup = bool(st.get("sup"))
            word.style.dropcap = bool(st.get("dropcap"))
            word.style.color = st.get("color")
            op = st.get("opacity")
            word.style.opacity = op if op is not None else 1
            conf = wd.get("conf")
            word.conf = int(conf) if conf is not None else 100
            word.lang = wd.get("lang")
            word.line_num = bool(wd.get("lineNum"))
            vc = wd.get("visualCoords")
            word.visual_coords = True if vc is None else bool(vc)
            chars = wd.get("chars")
            if chars:
                word.chars = [Char(c.get("text") or "",
                                   _bbox_of(c.get("bbox")))
                              for c in chars]
            line.words.append(word)
        page.lines.append(line)
    return page


def _attach_annotations(pages: list[Page], annots) -> None:
    """Field rows route to page.annots (the set_form_value surface);
    everything else to page.marks.  A reference-written field row has
    only the device bbox — its /Rect reconstructs through the
    reference's fixed 300/72 px-per-pt (formFields.js:5)."""
    for i, rows in enumerate(annots or []):
        if not (0 <= i < len(pages)) or not rows:
            continue
        page = pages[i]
        marks = []
        fields = []
        for row in rows:
            m = dict(row)
            if m.get("type") == "field" or "fieldType" in m \
                    or "field_type" in m:
                bbox = m.pop("bbox", None)
                scale = float(m.pop("scale", 0) or (300 / 72))
                page_h = float(page.height or 0)
                if "rect" not in m and isinstance(bbox, dict):
                    m["rect"] = [bbox["left"] / scale,
                                 (page_h - bbox["bottom"]) / scale,
                                 bbox["right"] / scale,
                                 (page_h - bbox["top"]) / scale]
                if "fieldType" in m and "field_type" not in m:
                    m["field_type"] = m.pop("fieldType")
                if "srcRef" in m and "obj_num" not in m:
                    m["obj_num"] = m.pop("srcRef")
                m.setdefault("type", "field")
                m["_scale"] = scale
                m["_page_h_dev"] = page_h
                fields.append(m)
                continue
            if isinstance(m.get("bbox"), dict):
                m["bbox"] = _bbox_of(m["bbox"])
            marks.append(m)
        page.marks = marks
        if fields:
            page.annots = fields


def parse_scribe_session(data: bytes):
    """Reference ``.scribe`` bytes (plain or gzip, whole or segmented)
    → (Page trees, extras).  Segmented files are split on newline BYTES
    before decoding — 0x0A cannot occur inside a multi-byte UTF-8
    character (import.js:246-283), so GB-scale files never join into
    one string.  ``extras`` carries the session fields the restore path
    consumes beyond pages (import.js:292-363): ``annotations`` (also
    attached to ``page.marks``), ``textEdits``, ``outline`` (None when
    the key is absent — pre-outline sessions let the PDF's own
    bookmarks win, import.js:359-363)."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)
    if not data.lstrip()[:32].startswith(_SEG_HEAD):
        obj = json.loads(data.decode("utf-8"))
        pages = [(_page_from_json(p) if p else Page(i, 0, 0))
                 for i, p in enumerate(obj.get("ocr") or [])]
        _attach_annotations(pages, obj.get("annotations"))
        session = obj.get("session") or {}
        extras = {"annotations": obj.get("annotations"),
                  "textEdits": session.get("textEdits"),
                  "outline": (obj.get("outline") or [])
                  if "outline" in obj else None,
                  "fontState": obj.get("fontState")}
        return pages, extras
    lines = data.split(b"\n")
    header = json.loads(lines[0].decode("utf-8"))
    n = int(header.get("pageCount") or 0)
    pages: list[Page | None] = [None] * n
    text_edits: list = [None] * n
    saw_edits = "session" in header
    for raw in lines[1:]:
        raw = raw.strip()
        if not raw:
            continue
        rec = json.loads(raw.decode("utf-8"))
        i = int(rec.get("i", -1))
        if 0 <= i < n:
            pages[i] = _page_from_json(rec["ocr"]) if rec.get("ocr") \
                else None
            if rec.get("textEdits") is not None:
                text_edits[i] = rec["textEdits"]
                saw_edits = True
    pages = [(p if p is not None else Page(i, 0, 0))
             for i, p in enumerate(pages)]
    _attach_annotations(pages, header.get("annotations"))
    extras = {"annotations": header.get("annotations"),
              "textEdits": text_edits if saw_edits else None,
              "outline": (header.get("outline") or [])
              if "outline" in header else None,
              "fontState": header.get("fontState")}
    return pages, extras


def parse_scribe(data: bytes) -> list[Page]:
    """Pages-only view of :func:`parse_scribe_session` (annotations are
    still attached to ``page.marks``)."""
    return parse_scribe_session(data)[0]
