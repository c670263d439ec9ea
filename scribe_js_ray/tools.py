"""Document tool registry — the reference's MCP extension surface
(/root/reference/mcp/tools.js + mcp/index.js) minus the JSON-RPC stdio
server (no MCP transport in this sandbox; the registry + dispatch is
exposed as ``python -m scribe_js_ray.cli tools list|call`` instead).

Semantics mirrored from the reference handlers:

- one CURRENT document per session, swapped atomically
  (tools.js:44-66 ensureFileLoaded)
- ``list_documents``: supported-extension walk + companion data-file
  discovery by stem prefix, optional dataDir subdirectory (:100-160)
- ``extract_document_text``: ``page:line``-prefixed lines for
  referencing, startPage/maxChars pagination that stops BEFORE the
  overflowing page (unless nothing was emitted yet), optional
  paragraph-boundary annotations ``--- par:<id> [type] ---``
  (:160-300 extractDocumentText/buildStructuredPageText)
- ``subset_pdf`` / ``merge_pdfs``: thin wrappers over
  ``stages/pdf/subset.py`` (per-file page selection = subset-then-
  merge, tools.js merge_pdfs schema)
- ``define_tables`` / ``extract_tables``: pre-structured cell rows
  overwrite a page's tables; extraction falls back to the detected
  ``table_boxes`` cells; optional xlsx export (:948-1014)
- ``convert_docx_to_json``: docx → reference-format ``.scribe.json``
- ``batch_extract_text``: per-directory extraction to ``.mtxt`` files
  with metadata (the distributed form of this verb is
  ``pipelines/runner.py``; this tool is the reference's driver-side
  loop for interactive use)

- ``create_highlighted_pdf``: markup annots (Highlight/Underline/
  StrikeOut with per-line QuadPoints) injected into an identity or
  page-selected rebuild (``stages/pdf/highlights.py``)

Out of scope with the render/OCR paths: ``recognize``, ``render_page``
(raster appearance).
"""

from __future__ import annotations

import json
import os

SUPPORTED_EXTENSIONS = [".pdf", ".png", ".jpg", ".jpeg", ".gif", ".webp",
                        ".bmp", ".tiff", ".tif", ".docx"]
DATA_EXTENSIONS = [".scribe.json", ".json", ".json.gz", ".hocr", ".xml",
                   ".stext", ".txt", ".docx", ".scribe"]

_state: dict = {"file": None, "data_file": None, "pages": None,
                "defined_tables": {}}


def reset_state():
    _state.update(file=None, data_file=None, pages=None,
                  defined_tables={})


def _load_pages(payload: bytes):
    """Parse any supported payload into Page trees with layout applied
    (the openDocument import path, pages only)."""
    from .pipelines.extract import _parse_paged_payload
    from .sources.classify import classify_payload
    from .stages.layout import analyze_layout

    kind = classify_payload(payload or b"")
    if kind == "pdf":
        from .stages.pdf import parse_pdf_document
        pages, doc_type, outline = parse_pdf_document(
            payload, with_outline=True)
        # Native-text only (extractPDFText.js:100-110): an 'ocr'-type
        # PDF keeps its per-page reflow paragraphs.
        if doc_type == "text":
            analyze_layout(pages,
                           outline_titles=[o["title"] for o in outline],
                           pdf_type=doc_type)
    elif kind == "scribe":
        from .stages.scribe_fmt import parse_scribe
        pages = parse_scribe(payload)
    elif kind in ("hocr", "alto", "abbyy", "stext"):
        pages = _parse_paged_payload(kind, payload)
        analyze_layout(pages, pdf_type="ocr")
    elif kind in ("textract", "google_vision", "google_doc_ai",
                  "azure_doc_intel"):
        from .stages import cloud
        raw = payload.decode("utf-8", "replace")
        pages = {"textract": cloud.parse_textract_doc,
                 "google_doc_ai": cloud.parse_google_doc_ai,
                 "azure_doc_intel": cloud.parse_azure_doc_intel,
                 }.get(kind, lambda r: [
                     cloud.parse_google_vision_page(r, 0)])(raw)
        analyze_layout(pages, pdf_type="ocr")
    elif kind == "docx":
        from .stages.docx import parse_docx
        pages = parse_docx(payload)
    elif kind == "text":
        from .stages.textlayout import parse_text_pages
        pages = parse_text_pages(
            (payload or b"").decode("utf-8", "replace").strip())
    else:
        pages = []
    return pages


def _ensure_loaded(file: str | None, data_file: str | None = None):
    if file is None:
        if _state["file"] is None:
            raise ValueError(
                "No file specified and no document is currently loaded. "
                "Use load_document first or provide a file path.")
        return _state["pages"]
    file = os.path.abspath(file)
    # Reuse the current companion when re-addressing the same file
    # without one (tools.js:52-55).
    if data_file is None and _state["file"] == file:
        data_file = _state["data_file"]
    data_file = os.path.abspath(data_file) if data_file else None
    if _state["file"] == file and _state["data_file"] == data_file \
            and _state["pages"] is not None:
        return _state["pages"]
    with open(file, "rb") as f:
        payload = f.read()
    pages = _load_pages(payload)
    if data_file:
        with open(data_file, "rb") as f:
            data_payload = f.read()
        data_pages = _load_pages(data_payload)
        # Companion OCR data supplies the text layer when it has any.
        if any(ln.words for p in data_pages for ln in p.lines):
            pages = data_pages
    _state.update(file=file, data_file=data_file, pages=pages,
                  defined_tables={})
    return pages


def _has_data_extension(name: str) -> bool:
    low = name.lower()
    return any(low.endswith(ext) for ext in DATA_EXTENSIONS)


def list_documents(directory: str, dataDir: str | None = None) -> dict:
    d = os.path.abspath(directory)
    try:
        names = sorted(os.listdir(d))
    except OSError:
        return {"error": f"Cannot read directory: {d}"}
    file_names = [n for n in names
                  if os.path.isfile(os.path.join(d, n))]
    data_dir_files = []
    if dataDir:
        dd = os.path.join(d, dataDir)
        try:
            data_dir_files = sorted(
                n for n in os.listdir(dd)
                if os.path.isfile(os.path.join(dd, n)))
        except OSError:
            pass
    docs = []
    for name in file_names:
        ext = os.path.splitext(name)[1].lower()
        if ext not in SUPPORTED_EXTENSIONS:
            continue
        full = os.path.join(d, name)
        stem = os.path.splitext(name)[0].lower()
        companions = []
        for fn in file_names:
            if fn != name and fn.lower().startswith(stem) and \
                    _has_data_extension(fn):
                companions.append({"path": os.path.join(d, fn),
                                   "name": fn})
        for fn in data_dir_files:
            if fn.lower().startswith(stem) and _has_data_extension(fn):
                companions.append({"path": os.path.join(d, dataDir, fn),
                                   "name": f"{dataDir}/{fn}"})
        entry = {"path": full, "name": name,
                 "sizeKb": round(os.path.getsize(full) / 1024),
                 "extension": ext}
        if companions:
            entry["companionDataFiles"] = companions
        docs.append(entry)
    return {"documents": docs, "count": len(docs)}


def load_document(file: str, dataFile: str | None = None) -> dict:
    path = os.path.abspath(file)
    if not os.path.exists(path):
        return {"error": f"File not found: {path}"}
    if dataFile and not os.path.exists(os.path.abspath(dataFile)):
        return {"error": f"Data file not found: "
                         f"{os.path.abspath(dataFile)}"}
    pages = _ensure_loaded(path, dataFile)
    has_ocr = any(ln.words for p in pages for ln in p.lines)
    return {"file": path,
            "dataFile": os.path.abspath(dataFile) if dataFile else None,
            "pageCount": len(pages), "loaded": True,
            "hasOcrData": has_ocr}


def _page_lines_text(page, page_idx: int, par_annots: bool) -> str:
    out = []
    current_par = None
    for h, line in enumerate(page.lines):
        if not line.words:
            continue
        par = getattr(line, "par", None)
        if par_annots and par is not current_par:
            pid = f"{page_idx}-{page.lines.index(line)}" \
                if par is None else f"{page_idx}-{id(par) & 0xFFFF:04x}"
            ptype = getattr(par, "type", None) or "body"
            out.append(f"\n--- par:{pid} [{ptype}] ---")
            current_par = par
        text = " ".join(w.text for w in line.words)
        out.append(f"\n{page_idx}:{h}  {text}")
    return "".join(out)


def extract_document_text(file: str | None = None,
                          dataFile: str | None = None,
                          startPage: int = 0, maxChars: int = 20000,
                          parAnnots: bool = False,
                          outputPath: str | None = None) -> dict:
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    page_count = len(pages)
    if outputPath:
        text = "".join(_page_lines_text(p, i, parAnnots)
                       for i, p in enumerate(pages))
        out = os.path.abspath(outputPath)
        with open(out, "w") as f:
            f.write(text)
        return {"outputPath": out, "pageCount": page_count,
                "charCount": len(text), "file": _state["file"]}
    text = ""
    end_page = startPage
    for p in range(startPage, page_count):
        page_text = _page_lines_text(pages[p], p, parAnnots)
        if text and len(text) + len(page_text) > maxChars:
            break
        text += page_text
        end_page = p
    return {"pageCount": page_count, "startPage": startPage,
            "endPage": end_page, "hasMore": end_page < page_count - 1,
            "text": text}


def subset_pdf_tool(file: str, outputPath: str, pages: list) -> dict:
    from .stages.pdf.subset import subset_pdf
    with open(file, "rb") as f:
        data = f.read()
    out = subset_pdf(data, [int(p) for p in pages])
    out_path = os.path.abspath(outputPath)
    with open(out_path, "wb") as f:
        f.write(out)
    return {"outputPath": out_path, "pageCount": len(pages),
            "bytes": len(out)}


def merge_pdfs_tool(files: list, outputPath: str) -> dict:
    from .stages.pdf.subset import merge_pdfs, subset_pdf
    inputs = []
    total_pages = 0
    for spec in files:
        path = spec["file"] if isinstance(spec, dict) else spec
        with open(path, "rb") as f:
            data = f.read()
        sel = spec.get("pages") if isinstance(spec, dict) else None
        if sel:
            data = subset_pdf(data, [int(p) for p in sel])
            total_pages += len(sel)
        else:
            from .stages.pdf.doc import _walk_pages
            from .stages.pdf.objects import PdfFile
            total_pages += len(_walk_pages(PdfFile(data)))
        inputs.append(data)
    out = merge_pdfs(inputs)
    out_path = os.path.abspath(outputPath)
    with open(out_path, "wb") as f:
        f.write(out)
    return {"outputPath": out_path, "inputCount": len(files),
            "pageCount": total_pages, "bytes": len(out)}


def create_highlighted_pdf_tool(file: str, outputPath: str,
                                highlights: list,
                                pages: list | None = None) -> dict:
    from .stages.pdf.highlights import create_highlighted_pdf
    path = os.path.abspath(file)
    if not os.path.exists(path):
        return {"error": f"File not found: {path}"}
    with open(path, "rb") as f:
        data = f.read()
    out, stats = create_highlighted_pdf(data, highlights, pages=pages)
    out_path = os.path.abspath(outputPath)
    with open(out_path, "wb") as f:
        f.write(out)
    return {"outputPath": out_path, **stats}


def edit_text(edits: list, file: str | None = None,
              dataFile: str | None = None) -> dict:
    """Delete or retype lines of the loaded document's text layer
    (textEdits.js deleteTextLines / replaceTextLine).  Each edit names a
    page and a 0-indexed line; an empty/absent newText deletes the
    line (superimposed alpha-0 duplicates are swept with it)."""
    from .stages.textedits import delete_text_lines, replace_text_line
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    results = []
    # Line numbers resolve against each page's pre-edit line list so an
    # earlier delete cannot shift later edits onto the wrong line.
    snapshots: dict = {}
    for e in edits or []:
        n = e.get("page", 0)
        li = e.get("line")
        if not (0 <= n < len(pages)):
            results.append({"error": f"Page {n} out of range."})
            continue
        page = pages[n]
        snap = snapshots.setdefault(n, list(page.lines))
        if li is None or not (0 <= li < len(snap)):
            results.append({"error": f"Line {li} out of range on "
                                     f"page {n}."})
            continue
        line = snap[li]
        if line not in page.lines:
            results.append({"error": f"Line {li} on page {n} was "
                                     "removed by an earlier edit."})
            continue
        before = " ".join(w.text for w in line.words)
        try:
            new_text = e.get("newText") or ""
            if new_text.strip():
                rec = replace_text_line(page, line, new_text,
                                        e.get("wordStyles"))
            else:
                rec = delete_text_lines(page, [line])
        except ValueError as exc:
            results.append({"error": str(exc)})
            continue
        results.append({
            "page": n, "line": li, "before": before,
            "after": " ".join(w.text for w in line.words)
            if rec and rec["type"] == "replaceText" else "",
            "op": rec["type"] if rec else "noop",
            "rects": len(rec["rects"]) if rec else 0})
    return {"edits": results,
            "pageCount": len(pages), "file": _state["file"]}


def set_form_value_tool(name: str, value: str | None = None,
                        file: str | None = None,
                        dataFile: str | None = None) -> dict:
    """Set a form field's value by fully-qualified name; the field's
    lifted words in the page text are regenerated so extracted text and
    exports stay in sync (doc.setFormValue, formFields.js:15-87).
    Empty/absent value clears; checkboxes/radios take the on-state name
    or 'Off'."""
    from .stages.pdf.annots import set_form_value
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    updated = set_form_value(pages, name, value)
    fields = sorted({r.get("name") for p in pages
                     for r in (getattr(p, "annots", None) or [])
                     if r.get("type") == "field" and r.get("name")})
    if not updated:
        return {"updated": 0, "error": f"No field named {name!r}.",
                "fields": fields}
    return {"updated": updated, "name": name,
            "value": value if value not in ("", None) else None,
            "file": _state["file"]}


def list_form_fields(file: str | None = None,
                     dataFile: str | None = None) -> dict:
    """List the loaded document's form fields (name, type, value, page,
    flags) from the per-page annotation rows."""
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    out = []
    for p in pages:
        for r in getattr(p, "annots", None) or []:
            if r.get("type") != "field":
                continue
            row = {"page": p.n, "name": r.get("name"),
                   "fieldType": r.get("field_type"),
                   "value": r.get("value")}
            for k in ("multiline", "comb", "read_only", "required",
                      "hidden"):
                if r.get(k):
                    row[k] = True
            if r.get("on_state"):
                row["onState"] = r["on_state"]
            if r.get("options"):
                row["options"] = r["options"]
            out.append(row)
    return {"fields": out, "file": _state["file"]}


def detect_fill_targets_tool(page: int, file: str | None = None,
                             dataFile: str | None = None,
                             includeRejects: bool = False) -> dict:
    """Deterministic fillable-area detection (fillSign.js
    detectFillTargets): checkbox glyphs, underscore blanks, phone-paren
    slots, recomputed from the page on every call."""
    from .stages.fillsign import detect_fill_targets
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    if not (0 <= page < len(pages)):
        return {"error": f"Page {page} out of range."}
    rejects: list | None = [] if includeRejects else None
    targets = detect_fill_targets(pages[page], rejects=rejects)

    def box(b):
        return {"left": b.left, "top": b.top, "right": b.right,
                "bottom": b.bottom}
    out = {"page": page,
           "targets": [{"kind": t["kind"], "source": t["source"],
                        "bbox": box(t["bbox"])} for t in targets]}
    if includeRejects:
        out["rejects"] = [{"arm": r["arm"], "rule": r["rule"],
                           "bbox": box(r["bbox"])} for r in rejects]
    return out


def fill_text_tool(page: int, x: float, y: float, contents: str,
                   fontSize: float = 12, textColor: str | None = None,
                   file: str | None = None,
                   dataFile: str | None = None) -> dict:
    """Place typed fill text on a page (fillSign.js addFillText); the
    lifted words join the page's text layer immediately."""
    from .stages.fillsign import add_fill_text
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    if not (0 <= page < len(pages)):
        return {"error": f"Page {page} out of range."}
    try:
        row = add_fill_text(pages[page],
                            {"x": x, "y": y, "contents": contents,
                             "fontSize": fontSize,
                             "textColor": textColor})
    except ValueError as exc:
        return {"error": str(exc)}
    b = row["bbox"]
    return {"page": page, "bbox": {"left": b.left, "top": b.top,
                                   "right": b.right, "bottom": b.bottom},
            "liftedWords": sum(
                1 for ln in pages[page].lines for w in ln.words
                if w.id.startswith(f"word_{page + 1}_txt"))}


def define_tables(page: int, tables: list, file: str | None = None,
                  dataFile: str | None = None) -> dict:
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    if not 0 <= page < len(pages):
        return {"error": f"Page {page} out of range (0-{len(pages) - 1})"}
    _state["defined_tables"][page] = [
        {"rows": [[str(c) for c in row] for row in t["rows"]]}
        for t in tables]
    return {"page": page, "tableCount": len(tables)}


def _detected_tables(page) -> list[dict]:
    from .model import BBox
    from .stages.tables import extract_table_content
    out = []
    for tb in getattr(page, "table_boxes", None) or []:
        bbox = BBox(tb["left"], tb["top"], tb["right"], tb["bottom"])
        rows = extract_table_content(
            page, bbox, col_separators=tb.get("col_separators"))
        if rows:
            out.append({"rows": [[str(c) for c in r] for r in rows]})
    return out


def extract_tables(file: str | None = None, page: int | None = None,
                   dataFile: str | None = None,
                   outputPath: str | None = None) -> dict:
    try:
        pages = _ensure_loaded(file, dataFile)
    except (OSError, ValueError) as exc:
        return {"error": str(exc)}
    page_idxs = [page] if page is not None else range(len(pages))
    result = []
    for p in page_idxs:
        if not 0 <= p < len(pages):
            return {"error": f"Page {p} out of range "
                             f"(0-{len(pages) - 1})"}
        tables = _state["defined_tables"].get(p) or \
            _detected_tables(pages[p])
        for t in tables:
            result.append({"page": p, "rows": t["rows"]})
    out = {"tables": result, "count": len(result)}
    if outputPath and result:
        from .stages.docx import write_xlsx
        rows = []
        for t in result:
            rows.extend(t["rows"])
            rows.append([])
        out_path = os.path.abspath(outputPath)
        with open(out_path, "wb") as f:
            f.write(write_xlsx(rows[:-1]))
        out["outputPath"] = out_path
    return out


def convert_docx_to_json(file: str, outputPath: str | None = None,
                         lineSplitMode: str = "width") -> dict:
    from .stages.docx import parse_docx
    from .stages.scribe_fmt import write_scribe
    path = os.path.abspath(file)
    if not os.path.exists(path):
        return {"error": f"File not found: {path}"}
    if lineSplitMode == "sentence":
        return {"error": "lineSplitMode=sentence is not supported; "
                         "use width (the default)"}
    with open(path, "rb") as f:
        pages = parse_docx(f.read())
    blob = write_scribe(pages, segmented=True, gzip_out=False)
    out_path = os.path.abspath(outputPath) if outputPath else \
        os.path.splitext(path)[0] + ".scribe.json"
    with open(out_path, "wb") as f:
        f.write(blob)
    return {"outputPath": out_path, "pageCount": len(pages),
            "bytes": len(blob)}


def batch_extract_text(directory: str, outputDir: str,
                       dataDir: str | None = None,
                       files: list | None = None,
                       parAnnots: bool = False) -> dict:
    listing = list_documents(directory, dataDir)
    if "error" in listing:
        return listing
    os.makedirs(outputDir, exist_ok=True)
    selected = listing["documents"]
    if files:
        want = set(files)
        selected = [d for d in selected if d["name"] in want]
    results = []
    for doc in selected:
        companion = (doc.get("companionDataFiles") or [{}])[0].get("path")
        res = extract_document_text(doc["path"], dataFile=companion,
                                    parAnnots=parAnnots,
                                    outputPath=os.path.join(
                                        outputDir,
                                        os.path.splitext(doc["name"])[0]
                                        + ".mtxt"))
        res["name"] = doc["name"]
        results.append(res)
    return {"documents": results, "count": len(results),
            "outputDir": os.path.abspath(outputDir)}


def _schema(props: dict, required: list) -> dict:
    return {"type": "object", "properties": props, "required": required}


TOOLS = [
    {"name": "list_documents",
     "description": "List PDF and image documents in a directory. "
                    "Discovers companion data files (OCR exports, "
                    ".scribe.json) that can be loaded alongside "
                    "documents.",
     "inputSchema": _schema(
         {"directory": {"type": "string"},
          "dataDir": {"type": "string"}}, ["directory"])},
    {"name": "load_document",
     "description": "Load a document into memory for subsequent "
                    "operations. Returns page count, file info, and "
                    "whether OCR data is available.",
     "inputSchema": _schema(
         {"file": {"type": "string"},
          "dataFile": {"type": "string"}}, ["file"])},
    {"name": "extract_document_text",
     "description": "Extract text from a document. Returns text with "
                    "page:line number prefixes (e.g. \"0:5  some "
                    "text\") so lines can be referenced.",
     "inputSchema": _schema(
         {"file": {"type": "string"}, "dataFile": {"type": "string"},
          "startPage": {"type": "integer"},
          "maxChars": {"type": "integer"},
          "parAnnots": {"type": "boolean"},
          "outputPath": {"type": "string"}}, [])},
    {"name": "subset_pdf",
     "description": "Create a new PDF containing only the specified "
                    "pages (0-indexed, any order).",
     "inputSchema": _schema(
         {"file": {"type": "string"}, "outputPath": {"type": "string"},
          "pages": {"type": "array", "items": {"type": "integer"}}},
         ["file", "outputPath", "pages"])},
    {"name": "merge_pdfs",
     "description": "Merge multiple PDF files into one; optionally "
                    "select pages from each input.",
     "inputSchema": _schema(
         {"files": {"type": "array"},
          "outputPath": {"type": "string"}},
         ["files", "outputPath"])},
    {"name": "create_highlighted_pdf",
     "description": "Create a PDF with specified passages highlighted, "
                    "underlined, or struck through. Each highlight "
                    "names a page and either startLine/endLine (with "
                    "optional narrowing text) or a quote-only text "
                    "searched across the page.",
     "inputSchema": _schema(
         {"file": {"type": "string"},
          "outputPath": {"type": "string"},
          "highlights": {"type": "array", "items": {
              "type": "object",
              "properties": {
                  "page": {"type": "integer"},
                  "startLine": {"type": "integer"},
                  "endLine": {"type": "integer"},
                  "text": {"type": "string"},
                  "markup": {"type": "string",
                             "enum": ["highlight", "underline",
                                      "strikeout"]},
                  "color": {"type": "string"},
                  "comment": {"type": "string"}},
              "required": ["page"]}},
          "pages": {"type": "array", "items": {"type": "integer"}}},
         ["file", "outputPath", "highlights"])},
    {"name": "edit_text",
     "description": "Delete or retype lines of the document's text "
                    "layer. Each edit names a page and a 0-indexed "
                    "line; an empty newText deletes the line "
                    "(superimposed duplicate layers are swept too).",
     "inputSchema": _schema(
         {"edits": {"type": "array", "items": {
             "type": "object",
             "properties": {
                 "page": {"type": "integer"},
                 "line": {"type": "integer"},
                 "newText": {"type": "string"},
                 "wordStyles": {"type": "array"}},
             "required": ["page", "line"]}},
          "file": {"type": "string"},
          "dataFile": {"type": "string"}},
         ["edits"])},
    {"name": "detect_fill_targets",
     "description": "Detect fillable areas (empty checkboxes, "
                    "underscore blanks, phone area-code slots) drawn "
                    "as plain page content.",
     "inputSchema": _schema(
         {"page": {"type": "integer"},
          "file": {"type": "string"},
          "dataFile": {"type": "string"},
          "includeRejects": {"type": "boolean"}},
         ["page"])},
    {"name": "fill_text",
     "description": "Place typed fill text at a page position; the "
                    "text joins the document's text layer.",
     "inputSchema": _schema(
         {"page": {"type": "integer"},
          "x": {"type": "number"}, "y": {"type": "number"},
          "contents": {"type": "string"},
          "fontSize": {"type": "number"},
          "textColor": {"type": "string"},
          "file": {"type": "string"},
          "dataFile": {"type": "string"}},
         ["page", "x", "y", "contents"])},
    {"name": "list_form_fields",
     "description": "List the loaded document's form fields (name, "
                    "type, current value, page, flags).",
     "inputSchema": _schema(
         {"file": {"type": "string"},
          "dataFile": {"type": "string"}}, [])},
    {"name": "set_form_value",
     "description": "Set a form field's value by fully-qualified name; "
                    "the field's words in the page text regenerate so "
                    "extracted text and exports stay in sync. Empty "
                    "value clears; checkboxes/radios take the on-state "
                    "name or 'Off'.",
     "inputSchema": _schema(
         {"name": {"type": "string"},
          "value": {"type": "string"},
          "file": {"type": "string"},
          "dataFile": {"type": "string"}}, ["name"])},
    {"name": "define_tables",
     "description": "Define tables on a page with pre-structured cell "
                    "content; overwrites existing tables for the page.",
     "inputSchema": _schema(
         {"file": {"type": "string"}, "page": {"type": "integer"},
          "tables": {"type": "array"}}, ["page", "tables"])},
    {"name": "extract_tables",
     "description": "Get structured table data for a page (or all "
                    "pages): defined tables first, else detected table "
                    "regions. Optionally exports xlsx.",
     "inputSchema": _schema(
         {"file": {"type": "string"}, "page": {"type": "integer"},
          "outputPath": {"type": "string"}}, [])},
    {"name": "convert_docx_to_json",
     "description": "Convert a .docx file to .scribe.json format.",
     "inputSchema": _schema(
         {"file": {"type": "string"}, "outputPath": {"type": "string"},
          "lineSplitMode": {"type": "string",
                            "enum": ["width", "sentence"]}}, ["file"])},
    {"name": "batch_extract_text",
     "description": "Extract text from every document in a directory "
                    "to .mtxt files; returns per-document metadata.",
     "inputSchema": _schema(
         {"directory": {"type": "string"},
          "outputDir": {"type": "string"},
          "dataDir": {"type": "string"},
          "files": {"type": "array", "items": {"type": "string"}},
          "parAnnots": {"type": "boolean"}},
         ["directory", "outputDir"])},
]

_HANDLERS = {
    "list_documents": list_documents,
    "load_document": load_document,
    "extract_document_text": extract_document_text,
    "create_highlighted_pdf": create_highlighted_pdf_tool,
    "edit_text": edit_text,
    "detect_fill_targets": detect_fill_targets_tool,
    "fill_text": fill_text_tool,
    "subset_pdf": subset_pdf_tool,
    "merge_pdfs": merge_pdfs_tool,
    "list_form_fields": list_form_fields,
    "set_form_value": set_form_value_tool,
    "define_tables": define_tables,
    "extract_tables": extract_tables,
    "convert_docx_to_json": convert_docx_to_json,
    "batch_extract_text": batch_extract_text,
}


def call_tool(name: str, args: dict) -> dict:
    """Dispatch one tool call; unknown tools and handler errors come
    back as {"error": ...} like the reference server."""
    fn = _HANDLERS.get(name)
    if fn is None:
        return {"error": f"Unknown tool: {name}"}
    try:
        return fn(**(args or {}))
    except TypeError as exc:
        return {"error": f"Invalid arguments for {name}: {exc}"}
    except Exception as exc:
        return {"error": f"{type(exc).__name__}: {exc}"}


def main_tools(argv) -> int:
    """`tools list` / `tools call <name> [--json ARGS]`."""
    if not argv or argv[0] == "list":
        print(json.dumps({"tools": TOOLS}, indent=2))
        return 0
    if argv[0] == "call" and len(argv) >= 2:
        args = {}
        if "--json" in argv:
            args = json.loads(argv[argv.index("--json") + 1])
        print(json.dumps(call_tool(argv[1], args)))
        return 0
    print(json.dumps({"error": "usage: tools list | tools call <name> "
                               "[--json '{...}']"}))
    return 1
