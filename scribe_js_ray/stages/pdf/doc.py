"""PDF document driver: page tree walk → per-page parse → Page list.

Analog of the reference's parseSinglePage / extractInternalPDFText flow
(/root/reference/js/pdf/parsePdfDoc.js:464-1181,
 /root/reference/js/extractPDFText.js:24-143), including:
- MediaBox/CropBox + /Rotate handling via the base CTM
- per-page raster scale with the 3500px width cap
  (parsePdfDoc.js:503-506 behavior)
- char-class scoring → doc type text/ocr/image (determinePdfType,
  parsePdfDoc.js:417-444 thresholds)
"""

from __future__ import annotations

from .assemble import group_chars_into_page
from .content import TextInterpreter, build_font, _mat_mul
from .objects import PdfFile, Ref, StreamObj

MAX_RASTER_W = 3500
DEFAULT_DPI_SCALE = 300.0 / 72.0


def _catalog_and_pages(pdf: PdfFile):
    """Catalog discovery for the page walk (findCatalogAndPages,
    parsePdfUtils.js:1044-1069): the /Root number comes from the RAW
    byte scan only — no startxref keyword means the document errors
    even when the xref itself is recoverable (findRootObjNum
    :925-926).  A named Catalog without a top-level /Pages forces the
    xref repair, then any other /Type /Catalog object with /Pages
    serves instead."""
    from .objects import _find_root_obj_num
    root_num = _find_root_obj_num(pdf.data)
    if not root_num:
        raise ValueError("Could not find PDF Catalog")
    root = pdf.resolve(Ref(root_num, 0))
    if isinstance(root, StreamObj):
        root = root.dict
    if isinstance(root, dict) and isinstance(root.get("Pages"), Ref):
        return root["Pages"]
    pdf._ensure_repaired()
    for num in list(pdf.offsets) + list(pdf.compressed):
        if num == root_num:
            continue
        try:
            obj = pdf.get_object(num)
        except Exception:
            continue
        d = obj.dict if isinstance(obj, StreamObj) else obj
        if isinstance(d, dict) and str(d.get("Type", "")) == "Catalog" \
                and isinstance(d.get("Pages"), Ref):
            return d["Pages"]
    raise ValueError("Could not find /Pages reference in Catalog")


def _walk_pages(pdf: PdfFile):
    pages_ref = _catalog_and_pages(pdf)
    out = []

    def walk(node_ref, inherited):
        node = pdf.resolve(node_ref)
        if not isinstance(node, dict):
            return
        inh = dict(inherited)
        for key in ("Resources", "MediaBox", "CropBox", "Rotate"):
            if key in node:
                inh[key] = node[key]
        ntype = str(node.get("Type", ""))
        if ntype == "Pages" or "Kids" in node:
            for kid in pdf.resolve(node.get("Kids")) or []:
                walk(kid, inh)
        else:
            merged = dict(inh)
            merged["_node"] = node
            merged["_ref_num"] = node_ref.num \
                if isinstance(node_ref, Ref) else None
            out.append(merged)

    walk(pages_ref, {})
    return out


def parse_pdf_page(pdf: PdfFile, page_info: dict, n: int,
                   seen_annots: set | None = None):
    node = page_info["_node"]
    media = [float(pdf.resolve(v)) for v in
             (pdf.resolve(page_info.get("CropBox"))
              or pdf.resolve(page_info.get("MediaBox"))
              or [0, 0, 612, 792])]
    x0, y0, x1, y1 = media
    width_pt = abs(x1 - x0)
    height_pt = abs(y1 - y0)
    rotate = int(pdf.resolve(page_info.get("Rotate")) or 0) % 360

    res = pdf.resolve(page_info.get("Resources")) or {}
    font_dicts = pdf.resolve(res.get("Font")) or {}
    fonts = {str(k): build_font(pdf, v) for k, v in font_dicts.items()}
    xobjects = pdf.resolve(res.get("XObject")) or {}

    contents = node.get("Contents")
    contents = pdf.resolve(contents)
    parts = []
    if isinstance(contents, list):
        for c in contents:
            try:
                parts.append(pdf.stream_bytes(c))
            except Exception:
                pass
    elif contents is not None:
        try:
            parts.append(pdf.stream_bytes(contents))
        except Exception:
            pass
    content = b"\n".join(parts)

    # Base CTM: translate CropBox origin to (0,0); apply /Rotate so output
    # coordinates are upright (parsePdfDoc.js:464-509 analog).
    # /Rotate only affects display; the natural reading frame of a uniformly
    # rotated page is its unrotated content space, so glyphs are grouped
    # there (the reference instead detects per-line orientation and works in
    # a virtual-horizontal space — parsePdfDoc.js:2059-2080; per-line mixed
    # orientation is deferred to a later round).
    base = (1, 0, 0, 1, -x0, -y0)

    # Tokenize the page stream ONCE; the text interpreter and the path
    # executor share the list (r2 review: double-lexing every page).
    # Heavy streams skip paths, so don't materialize tokens for them.
    from .content import tokenize_content
    from .paths import GRAPHICS_HEAVY_STREAM_BYTES
    shared_tokens = list(tokenize_content(content)) \
        if len(content) <= GRAPHICS_HEAVY_STREAM_BYTES else None
    # /ExtGState fill-alpha map + Separation/DeviceN tint spaces: text
    # hidden via alpha-0 (or drawn in a tint-resolved color) is tagged
    # per char, feeding style.opacity/color and native-text suppression
    # (parsePdfDoc.js:574-576).
    from .content import parse_ext_gstates, parse_text_color_spaces
    ext_gstates = parse_ext_gstates(pdf, res)
    color_spaces = parse_text_color_spaces(pdf, res)
    interp = TextInterpreter(pdf, fonts, base,
                             ext_gstates=ext_gstates,
                             color_spaces=color_spaces)
    interp.run(content, xobjects=xobjects, tokens=shared_tokens)
    # Form-XObject text: separate appended pass, once per form object
    # per page (extractFormXObjectText parsePdfDoc.js:580).
    interp.run_form_pass()

    scale = min(DEFAULT_DPI_SCALE,
                MAX_RASTER_W / width_pt if width_pt else DEFAULT_DPI_SCALE)

    # Vector paths → underline/rule rects, checkbox squares, column
    # rulings (M28; parsePdfDoc.js:843-1008).  Heavy streams skip this
    # (the 2 MB guard lives in execute_path_operators).
    graphics = {"underline_rects": [], "fill_squares": []}
    paths = []
    try:
        from .paths import execute_path_operators, harvest_page_graphics
        paths = execute_path_operators(pdf, content, xobjects, base,
                                       tokens=shared_tokens)
        graphics = harvest_page_graphics(paths, height_pt, scale)
    except Exception:
        pass

    page = group_chars_into_page(interp.chars, n, width_pt, height_pt, scale,
                                 underline_rects=graphics["underline_rects"])
    # Source TrueType programs by family: the export's glyph-outline
    # re-embedding source (subsetPdf.js carries the original font files;
    # writePdfFonts.js:292 rawFontBytes).  First program per family wins.
    for f in fonts.values():
        if f.embedded_bytes and f.family not in page.font_programs:
            page.font_programs[f.family] = f.embedded_bytes
    # Unconsumed thin rules become paragraph separators; ruled grids
    # become table regions that suppress furniture rules inside them
    # (ocrObjects.js:22-34 rules/tableBoxes).
    page.rules = [{"y": r["y"], "left": r["left"], "right": r["right"]}
                  for r in graphics["underline_rects"]
                  if not r.get("is_underline")]
    # The full arbitrated table-detection pipeline (M27): strict vector
    # grids, segmented-hline, header-rule, borderless text candidates,
    # and row-band shading, integrated exactly like the reference
    # (detectPdfTables.js:66-770; consumption shape parsePdfDoc.js:
    # 3263-3279).  table_boxes entries carry col_separators + method
    # alongside the bbox keys so exports reuse the detector's column
    # evidence instead of re-deriving it from the bbox alone.
    try:
        from .tabledetect import detect_table_regions
        page.table_boxes = [
            dict(t["bbox"], col_separators=list(t["col_separators"]),
                 method=t["method"], title=t.get("title"))
            for t in detect_table_regions(page, paths, scale, height_pt)]
    except Exception:
        page.table_boxes = []

    # Form-field value lift + annotation summaries (M28 subset,
    # parsePdfDoc.js:1100-1176).
    lifted_chars = 0
    annotations = []
    try:
        from .annots import parse_page_annotations
        annotations = parse_page_annotations(pdf, node)
        # D3: a widget shared by reference across several pages lifts its
        # value once — doc-level dedup by annotation object number.
        if seen_annots is not None:
            fresh = []
            for a in annotations:
                num = a.get("obj_num")
                if num is not None and a.get("type") == "field":
                    if num in seen_annots:
                        continue
                    seen_annots.add(num)
                fresh.append(a)
            annotations = fresh
    except Exception:
        annotations = []
    try:
        if annotations:
            from .annots import lift_field_values
            lifted_chars = lift_field_values(page, annotations, height_pt,
                                             scale=scale)
        # Field rows stay on the page (doc.annotations.pages analog)
        # so set_form_value can re-lift later (formFields.js:15-87);
        # geometry context rides with each row.
        page.annots = [dict(a, _scale=scale,
                            _page_h_dev=height_pt * scale)
                       for a in annotations if a.get("type") == "field"]
    except Exception:
        pass
    # /Redact marks remove overlapping words outright (word-level
    # all-or-nothing, export.js:336-353); highlight/underline/strikeout/
    # link overlays are carried as page marks.  Own try/except: a
    # failure in field lifting above must NEVER skip redaction —
    # "a pending mark must remove its content regardless"
    # (parsePdfAnnots.js:110-111; over-redaction beats a leak).
    try:
        if annotations:
            from .annots import (apply_redactions, markup_spans,
                                 redaction_rects)
            rects = redaction_rects(annotations, height_pt, scale=scale)
            apply_redactions(page, rects)
            marks = markup_spans(annotations, height_pt, scale=scale)
            if rects:
                # An overlay that intersects a redaction leaks its
                # location/content — drop it (export.js:356-365).
                marks = [m for m in marks if not any(
                    m["bbox"]["left"] < r.right and
                    m["bbox"]["right"] > r.left and
                    m["bbox"]["top"] < r.bottom and
                    m["bbox"]["bottom"] > r.top for r in rects)]
            page.marks = marks
            # URI-link stamping (parsePdfDoc.js:1055-1063): a word
            # whose center sits in a /Link URI box carries the link on
            # its style — decideBreak's citation-lead continuation
            # consumes it.
            uri_boxes = [m for m in marks
                         if m.get("type") == "link" and m.get("uri")]
            if uri_boxes:
                for line in page.lines:
                    for w in line.words:
                        cx = (w.bbox.left + w.bbox.right) / 2
                        cy = (w.bbox.top + w.bbox.bottom) / 2
                        for b in uri_boxes:
                            bb = b["bbox"]
                            if bb["left"] <= cx <= bb["right"] \
                                    and bb["top"] <= cy <= bb["bottom"]:
                                w.style.link = b["uri"]
                                break
    except Exception:
        pass

    # Per-page char-class stats for doc-type detection
    # (parsePdfDoc.js:630-656 pageStats): printable = cp 33-127 or >=161
    # excluding the PUA; invisible text counts toward the OCR-overlay
    # verdict; lifted field values count as visible printable text
    # (:1172).  Space glyphs never count.
    printable_vis = invisible_chars = control = control_vis = 0
    for c in interp.chars:
        if not c.text:
            continue
        cp = ord(c.text[0])
        if cp == 32:
            continue
        # U+FFFD (replacement char from unmapped glyphs) scores as control
        # (weight -5), matching scorePageChars parsePdfDoc.js:383-410 which
        # checks codePoint===65533 in the control bucket — a PDF full of
        # unmappable glyphs must classify 'image', not 'text'.
        is_printable = ((33 <= cp <= 127) or
                        (cp >= 161 and not 0xE000 <= cp <= 0xF8FF)) and \
            cp != 0xFFFD
        # invisibleTextChars counts only PRINTABLE-class invisible glyphs
        # (reference: printable - printableVis, parsePdfDoc.js:383-410) —
        # PUA/control invisible glyphs must not inflate the OCR score.
        if is_printable:
            if c.invisible:
                invisible_chars += 1
            else:
                printable_vis += 1
        if cp < 32 or cp == 0xFFFD:
            control += 1
            if not c.invisible:
                control_vis += 1
    printable_vis += lifted_chars
    page_area = width_pt * height_pt
    largest_image_frac = (max(interp.image_areas) / page_area) \
        if interp.image_areas and page_area else 0.0
    stats = {"printable_vis": printable_vis,
             "invisible_chars": invisible_chars,
             "control": control, "control_vis": control_vis,
             "largest_image_frac": min(largest_image_frac, 1.0)}
    return page, stats


def determine_pdf_type(page_stats: list) -> str:
    """parsePdfDoc.js:417-444, faithful: per-page scores from
    (invisible + visible-printable) − 5·control; 'text' needs ≥100
    chars/page on average, ≥90% of the score visible, and visible-texty
    pages on ≥half the pages; 'ocr' (a scan with an invisible overlay)
    needs only the total score; else 'image'."""
    if not page_stats:
        return "image"
    n = len(page_stats)
    letter_total = letter_vis = 0
    pages_total_text = pages_vis_text = 0
    for s in page_stats:
        printable = s["invisible_chars"] + s["printable_vis"]
        score_total = printable - 5 * s["control"]
        score_vis = s["printable_vis"] - 5 * s["control_vis"]
        letter_total += score_total
        letter_vis += score_vis
        if score_total >= 100:
            pages_total_text += 1
        if score_vis >= 100:
            pages_vis_text += 1
    if letter_total >= n * 100 and letter_vis >= letter_total * 0.9 \
            and pages_vis_text >= n / 2:
        return "text"
    if letter_total >= n * 100 and pages_total_text >= n / 2:
        return "ocr"
    return "image"


def parse_pdf_document(data: bytes, with_outline: bool = False):
    """bytes → (pages, doc_type[, outline]).  Raises ValueError on
    undecodable files."""
    pdf = PdfFile(data)
    if pdf.trailer.get("Encrypt") is not None and pdf.crypt is None:
        # Non-standard handler or unsupported revision (R5/6 raises from
        # the handler itself with a clearer message).
        raise ValueError("encrypted PDF: unsupported security handler")
    infos = _walk_pages(pdf)
    # Tagged-PDF structure tree → per-page mcid role maps (M21).
    try:
        from .structtree import parse_struct_tree
        struct_roles, struct_elems = parse_struct_tree(pdf,
                                                       with_elems=True)
    except Exception:
        struct_roles, struct_elems = {}, {}
    pages = []
    stats = []
    seen_annots: set = set()
    for n, info in enumerate(infos):
        page, st = parse_pdf_page(pdf, info, n, seen_annots=seen_annots)
        if struct_roles and info.get("_ref_num") is not None:
            page.mcid_roles = struct_roles.get(info["_ref_num"], {})
            page.mcid_elems = struct_elems.get(info["_ref_num"], {})
        pages.append(page)
        stats.append(st)
    if with_outline:
        from .annots import parse_outline
        try:
            outline = parse_outline(pdf)
        except Exception:
            outline = []
        return pages, determine_pdf_type(stats), outline
    return pages, determine_pdf_type(stats)
