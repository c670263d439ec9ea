"""Cloud-OCR JSON → Page parsers (SURVEY §2 M14).

Doc-level converters (one JSON may hold many pages → ``flat_map``-shaped):

* AWS Textract — /root/reference/js/import/convertDocTextract.js:50-204:
  PAGE/LINE/WORD blocks + CHILD relationships; normalized 0-1 geometry ×
  page dims; LAYOUT_* blocks → paragraphs, remainder grouped into a
  catch-all par.  Rotation handling ported for orientation 0 (horizontal).
* Google Vision — convertPageGoogleVision.js:21-205: fullTextAnnotation
  blocks → paragraphs → words with detectedBreak line splits; metrics from
  median word height (ascHeight = 2/3·h, baseline −h/3).
* Google Document AI — convertDocGoogleDocAI.js:25-220: tokens/lines
  matched by textAnchor segment containment against the shared fullText;
  line-poly height metrics (asc 3/4·h); paragraphs from textAnchor ranges.
* Azure Document Intelligence — convertDocAzureDocIntel.js:20-165:
  analyzeResult.pages words matched to lines by span containment; polygon
  bboxes; baseline slope from line polygon; asc = 3/5·line height.

Tables and non-horizontal orientations are deferred (same as the parse-
side ⏳ items in SURVEY §2.11).
"""

from __future__ import annotations

import json
import math

from ..functions.stats import js_round, mean50
from ..functions.textnorm import ASC_CHARS, DESC_CHARS, X_CHARS
from ..model import BBox, Line, Page, Par, Word, bbox_union
from .shared import pass3, split_unicode_superscripts

DEFAULT_PAGE_DIMS = (612, 792)


def pdf_page_dims_300(payload: bytes) -> list[tuple[int, int]]:
    """Per-page pixel dims the reference derives from a paired PDF for
    Textract/Azure imports (imageContainer.js:890-920): visual mediaBox
    points (post-/Rotate) × 300/72, re-scaled so width caps at 3500."""
    from .pdf.doc import _walk_pages
    from .pdf.objects import PdfFile
    pdf = PdfFile(payload)
    dims = []
    for info in _walk_pages(pdf):
        mb = [float(pdf.resolve(v)) for v in
              (pdf.resolve(info.get("MediaBox")) or [0, 0, 612, 792])]
        width_pts = abs(mb[2] - mb[0])
        height_pts = abs(mb[3] - mb[1])
        rotate = int(pdf.resolve(info.get("Rotate")) or 0) % 360
        if rotate in (90, 270):
            width_pts, height_pts = height_pts, width_pts
        w300 = js_round(width_pts * 300 / 72)
        h300 = js_round(height_pts * 300 / 72)
        dpi = 300 * min(w300, 3500) / w300 if w300 else 300
        dims.append((js_round(w300 * dpi / 300), js_round(h300 * dpi / 300)))
    return dims


def paired_page_dims(source_payload: bytes) -> list[tuple[int, int]]:
    """Page pixel dims from a paired source: a PDF contributes one entry
    per page via the 300-dpi rule above; a raster image is one page at
    its natural pixel dims (the reference's pageMetrics come from the
    decoded bitmap for image pairs, imageContainer.js:449-501)."""
    if source_payload[:5] == b"%PDF-":
        return pdf_page_dims_300(source_payload)
    from .codecs import image_dims
    return [image_dims(source_payload)]


# ---------------------------------------------------------------------------
# AWS Textract


def _detect_poly_orientation(poly) -> int:
    """convertDocTextract.js:22-40 — orientation from the PAGE polygon."""
    if poly[0]["X"] > poly[2]["X"] and poly[0]["Y"] < poly[2]["Y"]:
        return 1  # 90° clockwise
    if poly[0]["X"] > poly[2]["X"] and poly[0]["Y"] > poly[2]["Y"]:
        return 2  # 180°
    if (poly[0]["X"] < poly[2]["X"] and poly[1]["X"] < poly[3]["X"]
            and poly[0]["Y"] > poly[2]["Y"]):
        return 3  # 90° counter-clockwise
    return 0


def _convert_bbox(tb, w, h) -> BBox:
    """convertDocTextract.js:419-426 — normalized 0-1 bbox → pixel BBox."""
    return BBox(js_round(tb["Left"] * w), js_round(tb["Top"] * h),
                js_round((tb["Left"] + tb["Width"]) * w),
                js_round((tb["Top"] + tb["Height"]) * h))


# Polygon corner-index remap per page orientation
# (convertDocTextract.js:435-457): (tl, tr, br, bl) source indices.
_POLY_IDX = {0: (0, 1, 2, 3), 1: (3, 0, 1, 2), 2: (2, 3, 0, 1),
             3: (1, 2, 3, 0)}


def _convert_polygon(tp, w, h, orientation) -> dict:
    """convertDocTextract.js:435-476 — polygon points → pixel corners."""
    tl, tr, br, bl = _POLY_IDX.get(orientation, _POLY_IDX[0])
    pt = lambda k: (js_round(tp[k]["X"] * w), js_round(tp[k]["Y"] * h))  # noqa: E731
    return {"tl": pt(tl), "tr": pt(tr), "br": pt(br), "bl": pt(bl)}


def _convert_line_textract(lb, block_map, rel_map, page, page_num,
                           line_index, w, h, page_orientation):
    """convertDocTextract.js:205-411 — one LINE block → Line with
    polygon-derived baseline/x-height/asc-height metrics."""
    if not lb.get("Text") or not lb.get("Geometry"):
        return None
    bbox_line = _convert_bbox(lb["Geometry"]["BoundingBox"], w, h)
    poly0 = _convert_polygon(lb["Geometry"]["Polygon"], w, h,
                             page_orientation)
    poly_line = dict(poly0)

    line = Line(page, bbox_line, [0, 0])
    baseline = line.baseline  # shared list, mutated in place like the JS

    child_ids = rel_map.get(lb.get("Id")) or []
    word_blocks = [block_map.get(cid) for cid in child_ids]
    word_blocks = [x for x in word_blocks
                   if x and x.get("BlockType") == "WORD"]

    word_polys: dict[str, dict] = {}
    for wi, wb in enumerate(word_blocks):
        wbox = _convert_bbox(wb["Geometry"]["BoundingBox"], w, h)
        wid = f"word_{page_num + 1}_{line_index + 1}_{wi + 1}"
        word_polys[wid] = _convert_polygon(wb["Geometry"]["Polygon"], w, h,
                                           page_orientation)
        # Text may be absent on malformed WORD blocks; coerce to "" so
        # the regex/char scans below never see None (the JS tolerates
        # undefined, convertDocTextract.js:229).
        word = Word(line, wid, wb.get("Text") or "", wbox)
        word.conf = wb.get("Confidence") or 100
        line.words.append(word)

    if not word_blocks or not line.words:
        return None

    line_orientation = (word_blocks[0]["Geometry"].get("RotationAngle")
                        or 0) / 90
    orient = page_orientation - line_orientation
    if orient < 0:
        orient += 4
    line.orientation = orient

    def _remap_bbox(b, fn):
        return BBox(*fn(b))

    if orient == 1:
        # convertDocTextract.js:248-274 (uses pageDims.width, as the JS)
        fn = lambda b: (b.top, w - b.right, b.bottom, w - b.left)  # noqa: E731
        pfn = lambda p: {  # noqa: E731
            "tl": (p["tr"][1], w - p["tr"][0]),
            "tr": (p["br"][1], w - p["br"][0]),
            "br": (p["bl"][1], w - p["bl"][0]),
            "bl": (p["tl"][1], w - p["tl"][0])}
    elif orient == 2:
        fn = lambda b: (w - b.right, h - b.bottom, w - b.left, h - b.top)  # noqa: E731
        pfn = lambda p: {  # noqa: E731
            "tl": (w - p["br"][0], h - p["br"][1]),
            "tr": (w - p["bl"][0], h - p["bl"][1]),
            "br": (w - p["tl"][0], h - p["tl"][1]),
            "bl": (w - p["tr"][0], h - p["tr"][1])}
    elif orient == 3:
        fn = lambda b: (h - b.bottom, b.left, h - b.top, b.right)  # noqa: E731
        pfn = lambda p: {  # noqa: E731
            "tl": (h - p["bl"][1], p["bl"][0]),
            "tr": (h - p["tl"][1], p["tl"][0]),
            "br": (h - p["tr"][1], p["tr"][0]),
            "bl": (h - p["br"][1], p["br"][0])}
    else:
        fn = pfn = None
    if fn is not None:
        line.bbox = _remap_bbox(line.bbox, fn)
        for word in line.words:
            word.bbox = _remap_bbox(word.bbox, fn)
        for wid in list(word_polys):
            word_polys[wid] = pfn(word_polys[wid])
        poly_line = pfn(poly0)

    # Baseline slope from the line polygon (convertDocTextract.js:333-335);
    # set BEFORE the per-word delta pass below, which reads it.
    if poly_line["br"][0] != poly_line["bl"][0]:
        baseline[0] = ((poly_line["br"][1] - poly_line["bl"][1])
                       / (poly_line["br"][0] - poly_line["bl"][0]))

    split_unicode_superscripts(line, word_polys)

    desc_words = []
    non_desc_polys = []
    x_only_words, x_only_polys = [], []
    asc_only_words, asc_only_polys = [], []
    for word in line.words:
        wp = word_polys.get(word.id)
        t = word.text
        has_desc = any(c in DESC_CHARS for c in t)
        has_x = any(c in X_CHARS for c in t)
        has_asc = any(c in ASC_CHARS for c in t)
        if has_desc:
            desc_words.append(word)
        if not has_desc and (has_x or has_asc):
            non_desc_polys.append(wp)
        # `f`/`i` excluded from x-only evidence like the JS
        # (convertDocTextract.js:363-370).
        if (has_x and not has_asc and not has_desc
                and "f" not in t and "i" not in t):
            x_only_words.append(word)
            x_only_polys.append(wp)
        if has_asc and not has_desc:
            asc_only_words.append(word)
            asc_only_polys.append(wp)

    def poly_h(wp):
        return ((wp["bl"][1] - wp["tl"][1]) + (wp["br"][1] - wp["tr"][1])) / 2

    x_height = mean50([poly_h(wp) for wp in x_only_polys])
    asc_height = mean50([poly_h(wp) for wp in asc_only_polys])
    if x_height and asc_height and x_height > asc_height * 0.8:
        if len(asc_only_words) > len(x_only_words):
            x_height = None

    deltas = []
    for wp in non_desc_polys:
        word_bottom_mid = js_round((wp["bl"][1] + wp["br"][1]) / 2)
        word_x_mid = js_round((wp["bl"][0] + wp["br"][0]) / 2)
        offset = word_x_mid - line.bbox.left
        expected = poly_line["bl"][1] + baseline[0] * offset
        deltas.append(word_bottom_mid - expected)
    non_desc_delta = mean50(deltas)

    line_height = ((poly_line["br"][1] - poly_line["tr"][1])
                   + (poly_line["bl"][1] - poly_line["tl"][1])) / 2
    # Bug-for-bug: the delta (not an absolute y) is compared against
    # bbox.bottom, exactly as convertDocTextract.js:398 does.
    if (non_desc_delta is not None and math.isfinite(non_desc_delta)
            and non_desc_delta < line.bbox.bottom
            and non_desc_delta < line_height / 2):
        baseline[1] = non_desc_delta - (line.bbox.bottom
                                        - poly_line["bl"][1])
    else:
        baseline[1] = (line_height * -1 / 3
                       - (line.bbox.bottom - poly_line["bl"][1]))

    # Negative metrics are skipped (reference TODO for rotated text).
    if x_height and x_height > 0:
        line.x_height = x_height
    if asc_height and asc_height > 0:
        line.asc_height = asc_height
    return line


def parse_textract_doc(ocr_str: str, page_dims=None,
                       page_num=None) -> list[Page]:
    """convertDocTextract.js:50-192 — Textract JSON → pages.

    ``page_dims``: per-page pixel dims (the reference REQUIRES these,
    supplied by a paired image/PDF import via pageMetrics,
    recognizeConvert.js:549; pair with :func:`pdf_page_dims_300`).
    Falls back to US-Letter points when absent (our extension — the
    reference cannot import standalone Textract at all)."""
    data = json.loads(ocr_str)
    blocks = data.get("Blocks")
    if not isinstance(blocks, list):
        raise ValueError("Invalid Textract JSON: expected Blocks array.")

    rel_map = {}
    block_map = {}
    for b in blocks:
        block_map[b.get("Id")] = b
        for rel in b.get("Relationships") or []:
            if rel.get("Type") == "CHILD":
                rel_map[b.get("Id")] = rel.get("Ids") or []

    page_blocks = [b for b in blocks if b.get("BlockType") == "PAGE"]
    by_page: dict[int, dict] = {}
    for b in blocks:
        n = b.get("Page") or 1
        d = by_page.setdefault(n, {"lines": [], "layouts": []})
        bt = b.get("BlockType") or ""
        if bt == "LINE":
            d["lines"].append(b)
        elif bt.startswith("LAYOUT_"):
            d["layouts"].append(b)

    pages = []
    for i, page_block in enumerate(page_blocks):
        # page_num is a CHUNK OFFSET: Textract JSON arrives in arbitrary
        # multi-page chunks (import.js:602-603), so a caller stitching
        # chunks passes the running page count of prior chunks.
        n = (page_num or 0) + i
        dims = (page_dims[i] if page_dims and i < len(page_dims)
                else DEFAULT_PAGE_DIMS)
        w, h = dims
        page_poly = (page_block.get("Geometry") or {}).get("Polygon")
        if not page_poly:
            raise ValueError(f"No page polygon data for page {n + 1}.")
        page_orientation = _detect_poly_orientation(page_poly)

        page = Page(n, w, h)
        page.text_source = "textract"
        pdata = by_page.get(i + 1, {"lines": [], "layouts": []})
        if not pdata["lines"]:
            pages.append(page)
            continue

        line_obj_map = {}
        for li, lb in enumerate(pdata["lines"]):
            line = _convert_line_textract(lb, block_map, rel_map, page, n,
                                          li, w, h, page_orientation)
            if line is not None:
                page.lines.append(line)
                line_obj_map[lb.get("Id")] = line

        # LAYOUT_* blocks → paragraphs (createParagraphsFromLayout,
        # convertDocTextract.js:486-540).  No par-dedup filter: a line
        # claimed by two layout blocks re-parents (last wins), exactly
        # like the JS — the reorder pass then detects the mismatch.
        for lay in pdata["layouts"]:
            par_lines = [line_obj_map[cid]
                         for cid in (rel_map.get(lay.get("Id")) or [])
                         if cid in line_obj_map]
            if not par_lines:
                continue
            par = Par(page, bbox_union(ln.bbox for ln in par_lines))
            par.reason = lay.get("BlockType") or "LAYOUT_UNKNOWN"
            par.lines = par_lines
            for ln in par_lines:
                ln.par = par
            page.pars.append(par)
        unassigned = [ln for ln in page.lines if ln.par is None]
        if unassigned:
            par = Par(page, bbox_union(ln.bbox for ln in unassigned))
            par.reason = "UNASSIGNED_LINES"
            par.lines = unassigned
            for ln in unassigned:
                ln.par = par
            page.pars.append(par)

        # Reorder lines to paragraph reading order — Textract does not
        # (convertDocTextract.js:173-184); skipped on count mismatch.
        lines2 = [ln for p in page.pars for ln in p.lines]
        if len(lines2) == len(page.lines):
            page.lines = lines2

        pass3(page)
        pages.append(page)
    return pages


# ---------------------------------------------------------------------------
# Google Vision


def parse_google_vision_page(ocr_str: str, n: int = 0,
                             page_dims=None) -> Page:
    """convertPageGoogleVision.js:21-220 — fullTextAnnotation → Page.

    ``page_dims``: paired image/PDF page size; coordinates scale by
    pageDims/visionDims like the reference (js:43-44)."""
    data = json.loads(ocr_str)
    if isinstance(data, list):
        result = data[0] if data else None
    elif data.get("fullTextAnnotation"):
        result = data
    elif (data.get("responses") or [{}])[0].get("fullTextAnnotation"):
        result = data["responses"][0]
    else:
        result = None
    if not isinstance(result, dict):
        result = None
    if not result or not result.get("fullTextAnnotation"):
        raise ValueError("Failed to parse Google Vision OCR data.")

    page_vision = result["fullTextAnnotation"]["pages"][0]
    w = page_vision.get("width")
    h = page_vision.get("height")
    if not w or not h:
        raise ValueError("Failed to parse page dimensions.")
    scale_x = page_dims[0] / w if page_dims else 1
    scale_y = page_dims[1] / h if page_dims else 1
    out_w, out_h = page_dims if page_dims else (w, h)

    def vertices(bp):
        if bp.get("vertices"):
            return [((v.get("x") or 0) * scale_x, (v.get("y") or 0) * scale_y)
                    for v in bp["vertices"]]
        if bp.get("normalizedVertices"):
            return [((v.get("x") or 0) * w * scale_x,
                     (v.get("y") or 0) * h * scale_y)
                    for v in bp["normalizedVertices"]]
        raise ValueError("No vertices found in bounding box.")

    page = Page(n, out_w, out_h)
    page.text_source = "google_vision"

    for bi, block in enumerate(page_vision.get("blocks") or []):
        for pi, par_v in enumerate(block.get("paragraphs") or []):
            words_v = par_v.get("words") or []
            if not words_v:
                continue
            vs = vertices(par_v["boundingBox"])
            par = Par(page, BBox(min(x for x, _ in vs),
                                 min(y for _, y in vs),
                                 max(x for x, _ in vs),
                                 max(y for _, y in vs)))
            par.reason = str(block.get("blockType") or "TEXT")

            line = Line(page, BBox(0, 0, 0, 0), [0, 0])
            line_index = 0
            for wi, word_v in enumerate(words_v):
                symbols = word_v.get("symbols") or []
                if not symbols:
                    continue
                wvs = vertices(word_v["boundingBox"])
                wbox = BBox(min(x for x, _ in wvs), min(y for _, y in wvs),
                            max(x for x, _ in wvs), max(y for _, y in wvs))
                wid = (f"word_{n + 1}_{bi + 1}_{pi + 1}_"
                       f"{line_index + 1}_{wi + 1}")
                word = Word(line, wid,
                            "".join(s.get("text") or "" for s in symbols),
                            wbox)
                # Unrounded, like the JS (js:153).
                word.conf = (word_v.get("confidence") or 0) * 100
                line.words.append(word)

                has_break = any(
                    (s.get("property") or {}).get("detectedBreak", {})
                    .get("type") in ("LINE_BREAK", "EOL_SURE_SPACE")
                    for s in symbols)
                if has_break or wi == len(words_v) - 1:
                    if line.words:
                        line.bbox = bbox_union(wd.bbox for wd in line.words)
                        heights = sorted(wd.bbox.bottom - wd.bbox.top
                                         for wd in line.words)
                        med = heights[len(heights) // 2]
                        line.asc_height = med * 2 / 3
                        line.baseline[1] = -med / 3
                        page.lines.append(line)
                        par.lines.append(line)
                        line.par = par
                        line_index += 1
                    if wi != len(words_v) - 1:
                        line = Line(page, BBox(0, 0, 0, 0), [0, 0])
            if par.lines:
                page.pars.append(par)

    for line in page.lines:
        line.bbox = bbox_union(wd.bbox for wd in line.words)
    pass3(page)
    return page


# ---------------------------------------------------------------------------
# Google Document AI


def parse_google_doc_ai(ocr_str: str, page_dims=None) -> list[Page]:
    data = json.loads(ocr_str)
    if not data.get("pages"):
        raise ValueError("Invalid Google Document AI format: missing pages.")
    full_text = data.get("text") or ""

    pages = []
    for i, pd in enumerate(data["pages"]):
        dim = pd.get("dimension") or {}
        w, h = dim.get("width"), dim.get("height")
        if not w or not h:
            raise ValueError(f"Failed to parse page dimensions for page {i}.")
        dims_n = (page_dims[i] if page_dims and i < len(page_dims)
                  else None)
        scale_x = dims_n[0] / w if dims_n else 1
        scale_y = dims_n[1] / h if dims_n else 1
        page = Page(i, *(dims_n if dims_n else (w, h)))
        page.text_source = "google_doc_ai"
        tokens = pd.get("tokens") or []
        lines_v = pd.get("lines") or []
        if not tokens or not lines_v:
            pages.append(page)
            continue

        def seg_of(layout):
            seg = ((layout or {}).get("textAnchor") or {}) \
                .get("textSegments", [{}])[0]
            return (int(seg.get("startIndex") or 0),
                    int(seg.get("endIndex") or 0))

        def verts(layout):
            # Absolute vertices preferred only when some point carries a
            # coordinate (convertDocGoogleDocAI.js:241-255).
            bp = (layout or {}).get("boundingPoly") or {}
            vv = bp.get("vertices")
            if vv and any("x" in v or "y" in v for v in vv):
                return [((v.get("x") or 0) * scale_x,
                         (v.get("y") or 0) * scale_y) for v in vv]
            return [((v.get("x") or 0) * w * scale_x,
                     (v.get("y") or 0) * h * scale_y)
                    for v in bp.get("normalizedVertices") or []]

        line_ranges = []
        for line_v in lines_v:
            layout = line_v.get("layout")
            ls, le = seg_of(layout)
            vs = verts(layout)
            if len(vs) < 4:
                continue
            lbox = BBox(min(x for x, _ in vs), min(y for _, y in vs),
                        max(x for x, _ in vs), max(y for _, y in vs))
            baseline = [0.0, 0.0]
            tl, tr, br, bl = vs[0], vs[1], vs[2], vs[3]
            if br[0] != bl[0]:
                baseline[0] = (br[1] - bl[1]) / (br[0] - bl[0])
            line = Line(page, lbox, baseline)

            line_tokens = [t for t in tokens
                           if ls <= seg_of(t.get("layout"))[0]
                           and seg_of(t.get("layout"))[1] <= le]
            if not line_tokens:
                continue
            for li, tok in enumerate(line_tokens):
                t_layout = tok.get("layout")
                t0, t1 = seg_of(t_layout)
                word_text = full_text[t0:t1].strip()
                if not word_text:
                    continue
                tvs = verts(t_layout)
                wbox = BBox(min(x for x, _ in tvs),
                            min(y for _, y in tvs),
                            max(x for x, _ in tvs),
                            max(y for _, y in tvs))
                word = Word(line, f"word_{i + 1}_"
                            f"{len(page.lines) + 1}_{li + 1}",
                            word_text, wbox)
                word.conf = js_round(((t_layout or {}).get("confidence")
                                      or 0) * 100)
                line.words.append(word)
            if line.words:
                split_unicode_superscripts(line)
                line.bbox = bbox_union(wd.bbox for wd in line.words)
                line_height = ((br[1] - tr[1]) + (bl[1] - tl[1])) / 2
                line.asc_height = line_height * 3 / 4
                line.baseline[1] = (-line_height / 4 -
                                    (line.bbox.bottom - bl[1]))
                line_ranges.append((ls, le))
                page.lines.append(line)

        # Paragraphs from textAnchor ranges; the unassigned-line fallback
        # par exists ONLY when the JSON carries paragraphs at all —
        # otherwise pars stay empty and the text export reflows
        # (convertDocGoogleDocAI.js:186-219 scoping).
        paragraphs = pd.get("paragraphs") or []
        for par_v in paragraphs:
            ps, pe = seg_of(par_v.get("layout"))
            # No par-claimed filter: a line matching two ranges
            # re-parents, exactly like the JS (js:193-204).
            par_lines = [page.lines[k] for k, (ls, le)
                         in enumerate(line_ranges)
                         if ls >= ps and le <= pe]
            if not par_lines:
                continue
            par = Par(page, bbox_union(ln.bbox for ln in par_lines))
            par.lines = par_lines
            for ln in par_lines:
                ln.par = par
            page.pars.append(par)
        if paragraphs:
            unassigned = [ln for ln in page.lines if ln.par is None]
            if unassigned:
                par = Par(page, bbox_union(ln.bbox for ln in unassigned))
                par.lines = unassigned
                for ln in unassigned:
                    ln.par = par
                page.pars.append(par)

        pass3(page)
        pages.append(page)
    return pages


# ---------------------------------------------------------------------------
# Azure Document Intelligence


def parse_azure_doc_intel(ocr_str: str, page_dims=None) -> list[Page]:
    data = json.loads(ocr_str)
    ar = data.get("analyzeResult") or {}
    if not ar.get("pages"):
        raise ValueError("Invalid Azure Document Intelligence format.")

    pages = []
    for n, pd in enumerate(ar["pages"]):
        pw, ph = pd.get("width"), pd.get("height")
        if not pw or not ph:
            raise ValueError("Failed to parse page dimensions.")
        dims_n = (page_dims[n] if page_dims and n < len(page_dims)
                  else None)
        if pd.get("unit") != "pixel":
            if dims_n:
                dims = dims_n
                mult_w, mult_h = dims[0] / pw, dims[1] / ph
            else:
                # No target dims: scale inches/points to 72 dpi pixels
                # (our standalone extension; the reference throws,
                # convertDocAzureDocIntel.js:48-49).
                mult_w = mult_h = 72.0 if pd.get("unit") == "inch" else 1.0
                dims = (js_round(pw * mult_w), js_round(ph * mult_h))
        else:
            # Pixel-unit coordinates stay unscaled, but the paired page
            # metrics still set the page size (js:37 uses pageDimsN
            # unconditionally).
            mult_w = mult_h = 1.0
            dims = dims_n if dims_n else (js_round(pw), js_round(ph))
        page = Page(n, dims[0], dims[1])
        page.text_source = "azure_doc_intel"
        words_pd = pd.get("words") or []
        if not words_pd:
            # Reference quirk: the zero-word early result is pushed
            # WITHOUT a continue, so the same page object appears twice
            # in the output and shifts later page indices
            # (convertDocAzureDocIntel.js:40-45).
            pages.append(page)

        def scaled_poly(poly):
            return [v * (mult_w if i % 2 == 0 else mult_h)
                    for i, v in enumerate(poly or [])]

        for i, line_v in enumerate(pd.get("lines") or []):
            line_words = []
            for span in line_v.get("spans") or []:
                off, ln_len = span.get("offset", 0), span.get("length", 0)
                for wv in words_pd:
                    ws = wv.get("span") or {}
                    if ws.get("offset", 0) >= off and \
                            ws.get("offset", 0) + ws.get("length", 0) <= \
                            off + ln_len:
                        line_words.append(wv)
            if not line_words:
                continue
            polys = [scaled_poly(wv.get("polygon")) for wv in line_words]
            all_x = [v for p in polys for v in p[0::2]]
            all_y = [v for p in polys for v in p[1::2]]
            line = Line(page, BBox(min(all_x), min(all_y),
                                   max(all_x), max(all_y)), [0, 0])
            for j, (wv, poly) in enumerate(zip(line_words, polys)):
                content = wv.get("content")
                if not content or not content.strip():
                    continue
                wx, wy = poly[0::2], poly[1::2]
                # Untrimmed content, like the JS (js:100-113).
                word = Word(line, f"word_{n + 1}_"
                            f"{len(page.lines) + 1}_{j + 1}", content,
                            BBox(min(wx), min(wy), max(wx), max(wy)))
                word.conf = js_round((wv.get("confidence") or 0) * 100)
                line.words.append(word)
            if line.words:
                lp = scaled_poly(line_v.get("polygon"))
                if len(lp) >= 8:
                    tl, tr = (lp[0], lp[1]), (lp[2], lp[3])
                    br, bl = (lp[4], lp[5]), (lp[6], lp[7])
                    if br[0] != bl[0]:
                        line.baseline[0] = (br[1] - bl[1]) / (br[0] - bl[0])
                    line_height = ((br[1] - tr[1]) + (bl[1] - tl[1])) / 2
                    line.baseline[1] = (-line_height / 4 -
                                        (line.bbox.bottom - bl[1]))
                    if line_height * 3 / 5 > 0:
                        line.asc_height = line_height * 3 / 5
                page.lines.append(line)

        page.angle = pd.get("angle") or 0
        pass3(page)
        pages.append(page)
    return pages
