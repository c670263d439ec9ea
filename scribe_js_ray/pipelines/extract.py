"""The flagship extraction pipeline: pages table → extracted text + spans.

Per-document flow (scribe.extractText analog, fused into ONE map_batches
stage so parse trees never cross a stage boundary — SURVEY §4 memory rule):

    classify payload → parse (hocr | pdf | html | text) →
    [PDF only: analyze_layout — roles + decideBreak paragraph pass,
    parsePdfDoc.js:1259 is its sole reference call site; OCR formats
    reflow per page at emit, or run layout opt-in for main-content
    mode] → reflow → emit text+spans

Ray mapping: ``ds.map_batches(ExtractDocuments, batch_format="pyarrow",
batch_size=B, concurrency=N)`` — a callable class so regex/width tables are
warm per worker (actor pool for stateful parse, input_hint requirement).
Per-row failures land in the ``error`` column and never kill the job
(extractTextDir.js:198-242 behavior).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sources.classify import classify_payload
from ..stages.emit import write_text_spans
from ..stages.hocr import parse_hocr_page
from ..stages.html import extract_html_document
from ..stages.layout import analyze_layout

SPAN_TYPE = pa.list_(pa.struct([
    ("par_idx", pa.int32()),
    ("type", pa.string()),
    ("start", pa.int64()),
    ("end", pa.int64()),
]))

RESULT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("extracted_text", pa.large_string()),
    ("spans", SPAN_TYPE),
    ("n_pages", pa.int32()),
    ("doc_type", pa.string()),
    ("payload_kind", pa.string()),
    ("error", pa.string()),
])

_HOCR_SPLIT = None  # lazily-compiled page splitter


def _split_hocr_pages(s: str):
    global _HOCR_SPLIT
    import re
    if _HOCR_SPLIT is None:
        _HOCR_SPLIT = re.compile(r"(?=<div\s+class=[\"']ocr_page)", re.I)
    # The lookahead split leaves the document head as parts[0]; every
    # real page part STARTS with the ocr_page div.  (A containment test
    # over the first 200 chars would false-keep a short head whose
    # ocr-capabilities meta mentions "ocr_page", shifting page indices
    # by one vs the reference's page array.)
    parts = [p for p in _HOCR_SPLIT.split(s)
             if re.match(r"<div\s+class=[\"']ocr_page", p, re.I)]
    return parts if parts else [s]


def _parse_paged_payload(kind: str, payload: bytes):
    """hocr/alto/abbyy/stext payload → list of Page trees."""
    raw = payload.decode("utf-8", "replace")
    if kind == "hocr":
        splitter, parser = _split_hocr_pages, parse_hocr_page
        # scribeocr-produced hOCR parses in scribeMode (x_fsize /
        # x_asc_height / x_x_height metrics) — the reference threads
        # reimportHocrMode into convertPageHocr (import.js:716,
        # convertPageHocr.js:122).  Detection reuses the faithful
        # getMeta matcher so reimport parsing and layout-meta restore
        # can never disagree on the same header.
        from ..stages.hocr import parse_hocr_layout_meta
        if parse_hocr_layout_meta(raw) is not None:
            def parser(chunk, i):  # noqa: E306
                return parse_hocr_page(chunk, i, scribe_mode=True)
    elif kind == "alto":
        from ..stages.alto import parse_alto_page, split_alto_pages
        splitter, parser = split_alto_pages, parse_alto_page
    elif kind == "abbyy":
        from ..stages.abbyy import parse_abbyy_page, split_abbyy_pages
        splitter, parser = split_abbyy_pages, parse_abbyy_page
    else:
        from ..stages.stext import parse_stext_page, split_stext_pages
        splitter, parser = split_stext_pages, parse_stext_page
    pages = []
    for i, chunk in enumerate(splitter(raw)):
        try:
            page, _ = parser(chunk, i)
            pages.append(page)
        except ValueError:
            continue
    return pages


def _apply_edits(pages, edits) -> None:
    """Apply a document's text edits to its parsed pages before emit —
    the distributed form of the editor (stages/textedits.py): each edit
    names a page and 0-indexed line; empty/absent newText deletes the
    line (and its superimposed duplicates).  Out-of-range edits are
    skipped: a stale edit table must never poison extraction."""
    from ..stages.textedits import delete_text_lines, replace_text_line
    # Line numbers resolve against each page's PRE-edit line list (one
    # snapshot per page), so an earlier delete cannot shift a later
    # edit onto the wrong line.
    snapshots: dict = {}
    for e in edits:
        n = e.get("page", 0)
        li = e.get("line")
        if not (0 <= n < len(pages)) or li is None:
            continue
        page = pages[n]
        snap = snapshots.setdefault(n, list(page.lines))
        if not (0 <= li < len(snap)):
            continue
        line = snap[li]
        if line not in page.lines:  # removed by an earlier edit
            continue
        new_text = e.get("newText") or ""
        if new_text.strip():
            replace_text_line(page, line, new_text)
        else:
            delete_text_lines(page, [line])


def _emit(pages, emit_format, reflow, drop_furniture, edits=None,
          emit_opts=None):
    """Page trees → (text, spans) in the requested output format — the
    exportData dispatch (export.js:630-729); binary formats ride the
    string column via a latin-1 round-trip."""
    if edits:
        _apply_edits(pages, edits)
    if emit_format not in ("text", "markdown", "hocr", "alto", "html",
                           "html_viewer", "docx", "xlsx", "pdf", "scribe",
                           "debug_csv"):
        # pdf_overlay is handled in the pdf branch only; anything else
        # must fail into the error column rather than silently emitting
        # plain text
        raise ValueError(f"unsupported emit_format: {emit_format}")
    if emit_format == "markdown":
        from ..stages.exports import write_markdown
        return write_markdown(pages, reflow_text=reflow), []
    if emit_format == "hocr":
        from ..stages.exports import write_hocr
        opts = emit_opts or {}
        return write_hocr(
            pages, char_metrics=opts.get("_char_metrics"),
            default_font=opts.get("_default_font", "SerifDefault")), []
    if emit_format == "alto":
        from ..stages.exports import write_alto
        return write_alto(pages), []
    if emit_format == "html":
        from ..stages.exports import write_html
        return write_html(pages, reflow_text=reflow), []
    if emit_format == "html_viewer":
        # The reference's exportData('html') positioned-viewer document
        # (writeHtml.js) — byte-parity surface; our semantic HTML stays
        # available as plain 'html'.
        from ..stages.html_viewer import write_html_viewer
        opts = emit_opts or {}
        kw = {k: opts[k] for k in
              ("display_mode", "conf_thresh_high", "conf_thresh_med",
               "overlay_opacity", "kerning", "ligatures", "remove_margins",
               "embed_fonts") if k in opts}
        return write_html_viewer(pages, **kw), []
    if emit_format == "debug_csv":
        from ..stages.exports import write_debug_csv
        return write_debug_csv(pages), []
    if emit_format == "docx":
        from ..stages.docx import write_docx
        return write_docx(pages).decode("latin-1"), []
    if emit_format == "xlsx":
        # writeTabular: detected data-table regions → sheet rows, with
        # the reference's default filename + 1-based page-number lead
        # columns (writeTabular.js:205-215 extraCols;
        # scribeDocDefaults.js xlsxFilenameColumn/xlsxPageNumberColumn
        # both default true)
        from ..model import BBox
        from ..stages.docx import write_xlsx_tabular
        from ..stages.tables import (detect_tables_in_page,
                                     extract_table_words)
        opts = emit_opts or {}
        fname = (str(opts.get("xlsx_filename", ""))
                 if opts.get("xlsx_filename_column", True) else None)
        page_col = bool(opts.get("xlsx_page_number_column", True))
        page_tables: list = []
        extra_cols: list = []
        for i, page in enumerate(pages):
            extra_cols.append(([fname] if fname is not None else [])
                              + ([str(i + 1)] if page_col else []))
            tables: list = []
            boxes = getattr(page, "table_boxes", None) or []
            for tb in boxes:
                tables.append(extract_table_words(
                    page,
                    BBox(tb["left"], tb["top"], tb["right"],
                         tb["bottom"]),
                    col_separators=tb.get("col_separators")))
            if not boxes:
                # pages that never went through the layout stamping
                # (text/docx branches) fall back to the OCR detector;
                # stamped pages already carry every qualifying region
                for bb in detect_tables_in_page(page):
                    tables.append(extract_table_words(page, bb))
            page_tables.append(tables)
        return write_xlsx_tabular(page_tables, extra_cols) \
            .decode("latin-1"), []
    if emit_format == "scribe":
        # Emits the reference's UNCOMPRESSED segmented form (the CLI's
        # 'scribe.json', extract.js:56-58 compressScribe:false): the
        # payload rides in a parquet column that is already compressed,
        # so the gzipped '.scribe' variant (write_scribe gzip_out=True,
        # used by the session round-trip) would just re-deflate.
        from ..stages.scribe_fmt import write_scribe
        return write_scribe(
            pages,
            char_boxes=bool((emit_opts or {}).get("char_boxes", True)),
            include_text=bool(
                (emit_opts or {}).get("include_extra_text")),
            font_state=(emit_opts or {}).get("_font_state"),
        ).decode("utf-8"), []
    if emit_format == "pdf":
        from ..stages.pdf_export import write_pdf
        # binary export: latin-1 round-trip keeps it a string column
        return write_pdf(
            pages,
            standardize_page_size=bool(
                (emit_opts or {}).get("standardize_page_size")),
        ).decode("latin-1"), []
    return write_text_spans(
        pages, reflow_text=reflow, drop_furniture=drop_furniture,
        # Reference parity: writeText emits every line — headers, folios
        # and margin line numbers included (writeText.js:50-95 has no
        # furniture or lineNum filter; verified against the live
        # reference via tests/refharness).  drop_furniture stays an
        # opt-in knob for main-content corpus extraction.
        drop_line_num_words=drop_furniture,
        line_numbers=bool((emit_opts or {}).get("line_numbers")))


def extract_document(url: str, payload: bytes, text: str, lang: str,
                     reflow: bool = True, drop_furniture: bool = False,
                     emit_format: str = "text", edits: list | None = None,
                     emit_opts: dict | None = None,
                     source_payload: bytes | None = None,
                     _retry: bool = True):
    """Pure per-document extraction; returns a flat result dict.

    ``emit_format``: "text" (byte-identical golden surface, default),
    "markdown", "hocr", "pdf" (fresh text PDF) or "pdf_overlay"
    (invisible layer onto the original PDF pages) — S7-S9.
    ``emit_opts``: format-specific switches mirroring the reference
    CLI (extract.js): ``line_numbers`` prepends page:line prefixes
    (txt only), ``char_boxes=False`` drops per-char boxes from
    .scribe output.
    ``source_payload``: optional paired image/PDF supplying page
    metrics for OCR-JSON payloads — the reference's two-file import
    (import.js:716 passes doc.pageMetrics from the PDF into
    convertOCR; Textract/Azure require it, recognizeConvert.js:549)."""
    kind = classify_payload(payload or b"", text or "")
    out = {"url": url, "extracted_text": "", "spans": [], "n_pages": 0,
           "doc_type": "image", "payload_kind": kind, "error": ""}
    if emit_format == "xlsx":
        # the xlsx filename lead column carries the input name
        # (writeTabular.js:207-212 inputData.inputFileNames)
        emit_opts = dict(emit_opts or {})
        emit_opts.setdefault("xlsx_filename", url)
    try:
        if kind == "pdf":
            from ..stages.pdf import parse_pdf_document
            pages, doc_type, outline = parse_pdf_document(
                payload, with_outline=True)
            # Native-text only (extractPDFText.js:100-110:
            # "analyzeLayout is not yet validated on OCR text"): an
            # 'ocr'-type PDF keeps its per-page reflow paragraphs.
            # Main-content mode still needs roles to drop — our opt-in
            # corpus feature, same as the hOCR/cloud import branches.
            if doc_type == "text" or (doc_type == "ocr" and drop_furniture):
                analyze_layout(pages,
                               outline_titles=[o["title"]
                                               for o in outline],
                               pdf_type=doc_type)
            if emit_format == "pdf_overlay":
                # searchable-scan product: invisible text layer merged
                # back onto the ORIGINAL pages (S9 writePdfOverlay)
                from ..stages.pdf_export import overlay_pdf_text
                txt = overlay_pdf_text(payload, pages).decode("latin-1")
                spans = []
            elif doc_type == "image":
                # usePDFText routing (extractPDFText.js:125-138 +
                # scribeDocDefaults.js:50-53): only 'text' (native.main)
                # and 'ocr' (ocr.main) layers become active data — an
                # image-native PDF's sparse text is never used, the
                # reference emits an empty export (its CLI writes an
                # empty file; --skip-image-based exists for this).
                # The structural exporters still emit a document
                # SKELETON over the page metrics: writeHtml's doctype +
                # style block with an empty body (page loop over no
                # active pages), writeHocr's per-page empty ocr_page
                # divs sized from pageMetrics (writeHocr.js:67-71
                # !pageObj branch), writeAlto's empty <Page> elements,
                # and a valid .scribe session with empty pages — all
                # verified against the live reference.  text/markdown
                # stay empty.
                if emit_format == "html_viewer":
                    txt, spans = _emit([], emit_format, reflow,
                                       drop_furniture, edits, emit_opts)
                elif emit_format in ("hocr", "alto", "scribe"):
                    from ..model import Page as _Page
                    stubs = [_Page(p.n, p.width, p.height) for p in pages]
                    txt, spans = _emit(stubs, emit_format, reflow,
                                       drop_furniture, edits, emit_opts)
                else:
                    txt, spans = "", []
            else:
                txt, spans = _emit(pages, emit_format, reflow,
                                   drop_furniture, edits, emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages), doc_type=doc_type)
        elif kind == "scribe":
            # Reference .scribe session restore (S10): pages come in
            # already parsed/laid out — straight to emit.  A restored
            # fontState (charMetrics + defaultFontName) re-emits through
            # the hOCR metas and persists through scribe re-export
            # (import.js:288-289 objectAssignDefined, :383-389).
            from ..stages.scribe_fmt import parse_scribe_session
            pages, extras = parse_scribe_session(payload)
            fs = extras.get("fontState")
            if isinstance(fs, dict) and fs.get("charMetrics"):
                from ..stages.fontstats import default_font_auto
                cm = fs["charMetrics"]
                emit_opts = dict(emit_opts or {})
                emit_opts["_char_metrics"] = cm
                # setDefaultAuto re-runs over the restored metrics; in
                # single-font mode it returns early and the RESTORED
                # name stands (fontContainerMain.js:425-431).
                default_obs = (cm.get("Default") or {}).get("obs") or 0
                named_obs = \
                    ((cm.get("SerifDefault") or {}).get("obs") or 0) + \
                    ((cm.get("SansDefault") or {}).get("obs") or 0)
                emit_opts["_default_font"] = \
                    default_font_auto(cm) if named_obs > default_obs \
                    else (fs.get("defaultFontName") or "SerifDefault")
                emit_opts["_font_state"] = fs
            txt, spans = _emit(pages, emit_format, reflow, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages), doc_type="ocr")
        elif kind in ("hocr", "alto", "abbyy", "stext"):
            # Reference parity: analyzeLayout runs ONLY inside the PDF
            # parse (parsePdfDoc.js:1259 is its sole call site).  OCR
            # imports get per-page reflowPars paragraphs at emit time
            # (writeText.js:49 assignParagraphs fallback) and carry no
            # roles — headers/folios/margin numbers all emit.
            pages = _parse_paged_payload(kind, payload)
            if kind == "hocr":
                # scribeocr reimport: restore layout data tables (and
                # user regions) from the header meta so table-aware
                # exports reproduce (importOCR.js:196-219,
                # import.js:407-418)
                from ..stages.hocr import (apply_hocr_layout_meta,
                                           parse_hocr_layout_meta)
                apply_hocr_layout_meta(
                    pages,
                    parse_hocr_layout_meta(
                        payload.decode("utf-8", "replace")))
            if source_payload:
                # Paired image/PDF import: OCR pages beyond the image
                # page count are dropped (import.js:604 slices hocrRaw
                # for every format except textract/google_doc_ai).
                from ..stages import cloud
                n_img = len(cloud.paired_page_dims(source_payload))
                if len(pages) > n_img:
                    pages = pages[:n_img]
            if drop_furniture:
                # main-content mode is OUR corpus feature (north-rule
                # boilerplate strip): roles are needed to drop, so the
                # doc-level layout pass runs only when asked
                analyze_layout(pages, pdf_type="ocr")
            if emit_format in ("hocr", "scribe") and kind != "stext":
                # Import-time char metrics: every visually-accurate XML
                # OCR format (import.js:716-727 — stext and the cloud
                # formats are excluded); they ride the hOCR export's
                # font-metrics meta, pick the auto default font, and
                # persist through .scribe's fontState header.
                from ..stages.fontstats import (calc_char_metrics_from_pages,
                                                default_font_auto)
                cm = calc_char_metrics_from_pages(pages)
                if cm:
                    emit_opts = dict(emit_opts or {})
                    emit_opts["_char_metrics"] = cm
                    emit_opts["_default_font"] = default_font_auto(cm)
                    emit_opts["_font_state"] = {
                        "enableOpt": False, "forceOpt": False,
                        "defaultFontName": emit_opts["_default_font"],
                        "serifDefaultName": "NimbusRoman",
                        "sansDefaultName": "NimbusSans",
                        "glyphSet": None, "charMetrics": cm}
            txt, spans = _emit(pages, emit_format, reflow, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages), doc_type="ocr")
        elif kind in ("textract", "google_vision", "google_doc_ai",
                      "azure_doc_intel"):
            raw = payload.decode("utf-8", "replace")
            from ..stages import cloud
            page_dims = (cloud.paired_page_dims(source_payload)
                         if source_payload else None)
            if kind == "textract":
                pages = cloud.parse_textract_doc(raw, page_dims=page_dims)
            elif kind == "google_vision":
                # Batch Vision JSON carries a "responses" array — one
                # page per response, sorted by context.pageNumber
                # (importOCR.js:128-134)
                chunks = [raw]
                if '"responses"' in raw[:500]:
                    import json
                    try:
                        resp = json.loads(raw).get("responses")
                    except ValueError:
                        resp = None
                    if isinstance(resp, list) and resp:
                        resp.sort(key=lambda r: (
                            (r.get("context") or {}).get("pageNumber")
                            or 0) if isinstance(r, dict) else 0)
                        chunks = [json.dumps(r) for r in resp]
                pages = [cloud.parse_google_vision_page(
                    c, i, page_dims[i]
                    if page_dims and i < len(page_dims) else None)
                    for i, c in enumerate(chunks)]
            elif kind == "google_doc_ai":
                pages = cloud.parse_google_doc_ai(raw, page_dims=page_dims)
            else:
                pages = cloud.parse_azure_doc_intel(raw,
                                                    page_dims=page_dims)
            if drop_furniture:
                analyze_layout(pages, pdf_type="ocr")
            txt, spans = _emit(pages, emit_format, reflow, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages), doc_type="ocr")
        elif kind == "tess_blocks":
            # Tesseract block-JSON (one recognized page per payload,
            # convertPageBlocks.js) — same layout/emit path as the
            # XML OCR formats.
            from ..stages.blocks import parse_blocks_page
            raw = payload.decode("utf-8", "replace")
            pages = [parse_blocks_page(raw, 0)]
            if drop_furniture:
                analyze_layout(pages, pdf_type="ocr")
            txt, spans = _emit(pages, emit_format, reflow, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages), doc_type="ocr")
        elif kind == "html":
            raw = payload.decode("utf-8", "replace")
            txt, spans, _ = extract_html_document(raw)
            out.update(extracted_text=txt, spans=spans, n_pages=1,
                       doc_type="html")
        elif kind == "docx":
            from ..stages.docx import parse_docx
            # docxLineSplitMode: 'width' (default) or 'sentence'
            # (scribeDocDefaults.js:42, recognizeConvert.js:546)
            pages = parse_docx(payload, line_split_mode=str(
                (emit_opts or {}).get("docx_line_split_mode", "width")))
            txt, spans = _emit(pages, emit_format, True, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages) if txt else 0, doc_type="text")
        elif kind == "text":
            # Typeset like the reference (convertPageText.js): raw text →
            # synthetic Times pages → same layout/reflow/emit path as every
            # other format.  Reflow re-joins the wrap points, so single-
            # spaced source text round-trips byte-identically.
            from ..stages.textlayout import parse_text_pages
            body = text if text else (payload or b"").decode("utf-8",
                                                             "replace")
            # No analyze_layout here: source newlines are authoritative
            # paragraph breaks (the reference's text import keeps
            # convertPageText's pars; applyDocParagraphLayout is the
            # PDF-only doc-level pass, extractPDFText.js:100-110).
            # No strip: the reference feeds the raw string straight to
            # convertPageText, so leading whitespace indents the first
            # line and leading/trailing blank lines advance the cursor.
            pages = parse_text_pages(body)
            txt, spans = _emit(pages, emit_format, True, drop_furniture, edits,
                               emit_opts)
            out.update(extracted_text=txt, spans=spans,
                       n_pages=len(pages) if txt else 0, doc_type="text")
        else:  # empty
            out.update(doc_type="image")
    except Exception as exc:  # poison documents must never kill the job
        if _retry:
            # Deterministic-output contract: a TRANSIENT fault (fd/
            # memory pressure on a loaded host) must not turn into a
            # per-row error and change downstream counts between two
            # runs over identical input.  One recompute heals
            # transients; genuinely poison documents fail identically
            # twice (they're cheap — the parse aborts early) and land
            # in the error column as before.
            return extract_document(url, payload, text, lang,
                                    reflow=reflow,
                                    drop_furniture=drop_furniture,
                                    emit_format=emit_format, edits=edits,
                                    emit_opts=emit_opts,
                                    source_payload=source_payload,
                                    _retry=False)
        out["error"] = f"{type(exc).__name__}: {exc}"[:500]
        out["extracted_text"] = ""
        out["spans"] = []
    return out


_EDITS_CACHE: dict = {}


def _edits_lookup(edits_ref):
    """Resolve the broadcast edit table once per worker process (ray.put
    on the driver, ray.get + cache here — plasma-shared, never re-shipped
    per batch)."""
    if edits_ref is None:
        return None
    key = edits_ref.hex() if hasattr(edits_ref, "hex") else id(edits_ref)
    if key not in _EDITS_CACHE:
        import ray
        _EDITS_CACHE.clear()  # one edit table live per job
        _EDITS_CACHE[key] = ray.get(edits_ref) \
            if hasattr(edits_ref, "hex") else edits_ref
    return _EDITS_CACHE[key]


def _extract_batch(batch: pa.Table, reflow: bool = True,
                   drop_furniture: bool = False,
                   emit_format: str = "text",
                   edits_ref=None,
                   emit_opts: dict | None = None) -> pa.Table:
    """Arrow in → Arrow out (zero-copy reads).  Parser state (compiled
    regexes, encoding/width tables) lives in module globals, warmed once
    per worker PROCESS on first import — Ray task workers are long-lived,
    so tasks get the same warm-cache behavior as actors without the pool
    ramp-up cost."""
    edits_by_url = _edits_lookup(edits_ref)
    urls = batch.column("url").to_pylist()
    payloads = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist() \
        if "text" in batch.column_names else [""] * len(urls)
    langs = batch.column("lang").to_pylist() \
        if "lang" in batch.column_names else ["eng"] * len(urls)

    cols = {name: [] for name in RESULT_SCHEMA.names}
    for url, payload, text, lang in zip(urls, payloads, texts, langs):
        res = extract_document(url, payload, text, lang,
                               reflow=reflow, drop_furniture=drop_furniture,
                               emit_format=emit_format,
                               edits=edits_by_url.get(url)
                               if edits_by_url else None,
                               emit_opts=emit_opts)
        for name in cols:
            cols[name].append(res[name])
    arrays = [pa.array(cols[f.name], f.type) for f in RESULT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)


class ExtractDocuments:
    """Actor-pool batch callable for deployments whose per-worker state is
    too heavy for module-level warm-up (e.g. large learned font models):
    ``__init__`` runs once per actor, ``__call__`` per batch."""

    def __init__(self, reflow: bool = True, drop_furniture: bool = False,
                 emit_format: str = "text", edits_ref=None,
                 emit_opts: dict | None = None):
        self.reflow = reflow
        self.drop_furniture = drop_furniture
        self.emit_format = emit_format
        self.edits_ref = edits_ref
        self.emit_opts = emit_opts
        # Warm the parser modules once per actor (regex compile, width
        # tables) — not once per batch.
        from ..stages.pdf import parse_pdf_document  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract_batch(batch, self.reflow, self.drop_furniture,
                              self.emit_format, self.edits_ref,
                              self.emit_opts)


def build_extract_pipeline(ds, reflow=True, drop_furniture=False,
                           batch_size: int | None = None, concurrency=None,
                           compute: str = "tasks",
                           emit_format: str = "text",
                           edits_by_url: dict | None = None,
                           emit_opts: dict | None = None):
    """pages Dataset → extraction results Dataset (lazy; streams).

    ``batch_size=None`` processes whole blocks per UDF call — Ray Data's
    sub-block re-batching measurably halves throughput at 32 CPUs for
    this workload; granularity is controlled by BLOCK size instead
    (``override_num_blocks`` at the read / ``DataContext.
    target_max_block_size`` at 100 TB, where multi-MB rows cap a block at
    ~128 MB anyway).  ``compute="tasks"`` (default) runs stateless tasks
    on Ray's prewarmed worker pool; ``compute="actors"`` uses the
    ExtractDocuments actor pool (measured ~35% slower here due to pool
    ramp-up, but the right shape for heavyweight per-actor state).
    """
    edits_ref = None
    if edits_by_url:
        # Broadcast the edit table once (ray.put); workers ray.get it
        # from plasma on first use — never re-shipped per batch.  In a
        # Ray session the ObjectRef rides fn_kwargs un-resolved (it is
        # inside our kwargs dict, not a top-level task arg).
        import ray
        edits_ref = ray.put(edits_by_url) if ray.is_initialized() \
            else edits_by_url
    if compute == "tasks":
        kwargs = {}
        if concurrency is not None:
            # cap concurrent tasks (callers throttling a shared cluster)
            kwargs["concurrency"] = concurrency[1] \
                if isinstance(concurrency, tuple) else concurrency
        return ds.map_batches(
            _extract_batch,
            fn_kwargs={"reflow": reflow, "drop_furniture": drop_furniture,
                       "emit_format": emit_format, "edits_ref": edits_ref,
                       "emit_opts": emit_opts},
            batch_format="pyarrow",
            batch_size=batch_size,
            **kwargs,
        )
    if concurrency is None:
        # Autoscaling actor pool sized to the session CPUs (callable-class
        # transforms require an explicit pool in Ray Data 2.49).
        import ray
        try:
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            n_cpus = 8
        concurrency = (1, max(2, n_cpus))
    return ds.map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={"reflow": reflow,
                               "drop_furniture": drop_furniture,
                               "emit_format": emit_format,
                               "edits_ref": edits_ref,
                               "emit_opts": emit_opts},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
