"""Markup-annotation injection: highlight / underline / strikeout
quoted passages of a PDF's text layer.

Decision surface from the reference's highlight pipeline:

- word selection (js/addHighlights.js:68-153 addHighlights): a spec
  gives ``startLine``/``endLine`` (0-indexed page lines, with optional
  text snippets narrowing the first/last line) or quote-only ``text``
  searched across the whole page; case-insensitive sliding-window word
  matching (js/objects/ocrObjects.js:854-910 getMatchingWords /
  getMatchingWordsInLine)
- annotation objects (js/export/pdf/writePdfAnnots.js:55
  buildHighlightAnnotObjects): /Subtype Highlight|Underline|StrikeOut,
  /Rect = group bbox, /QuadPoints one quad per line, /C from hex
  color, /CA opacity (0.4 default for highlight fills, 1 for strokes),
  /F 4, /Contents as UTF-16BE hex
- output assembly: identity (or page-selected) rebuild with the new
  annots appended to each page's /Annots (the displayMode:'annot'
  download of mcp/tools.js:428 createHighlightedPdf)
"""

from __future__ import annotations

from .objects import Name
from .subset import subset_pdf


def _norm_tokens(text: str) -> list[str]:
    return text.strip().lower().split()


def matching_words_in_line(text: str, line) -> list:
    """Sliding-window case-insensitive match inside one line
    (ocrObjects.js:885)."""
    toks = _norm_tokens(text)
    if not toks:
        return []
    words = line.words
    out = []
    for i in range(len(words) - len(toks) + 1):
        if toks[0] not in words[i].text.lower():
            continue
        cand = words[i:i + len(toks)]
        if " ".join(toks) in " ".join(w.text for w in cand).lower():
            out.extend(cand)
    return out


def matching_words_in_page(text: str, page) -> list:
    """Cross-line page-wide match (ocrObjects.js:854); returns
    (line, word) pairs in reading order."""
    toks = _norm_tokens(text)
    if not toks:
        return []
    flat = [(ln, w) for ln in page.lines for w in ln.words]
    out = []
    for i in range(len(flat) - len(toks) + 1):
        if toks[0] not in flat[i][1].text.lower():
            continue
        cand = flat[i:i + len(toks)]
        if " ".join(toks) in " ".join(w.text for _, w in cand).lower():
            out.extend(cand)
    return out


def _select_words(page, spec: dict) -> list:
    """(line, word) pairs a highlight spec selects (addHighlights
    line-mode narrowing + quote-only mode)."""
    start_line = spec.get("startLine")
    text = spec.get("text")
    if start_line is None and not text:
        raise ValueError(
            "Each highlight must specify either startLine or text.")
    if start_line is None:
        return matching_words_in_page(text, page)
    end_line = spec.get("endLine", start_line)
    toks = _norm_tokens(text or "")
    start_snip = " ".join(toks[:3]) if toks else None
    end_snip = " ".join(toks[-3:]) if toks else None
    out = []
    for idx in range(start_line, end_line + 1):
        if not 0 <= idx < len(page.lines):
            continue
        line = page.lines[idx]
        words = list(line.words)
        if idx == start_line and start_snip:
            m = matching_words_in_line(start_snip, line)
            if m:
                words = line.words[line.words.index(m[0]):]
        if idx == end_line and end_snip:
            m = matching_words_in_line(end_snip, line)
            if m:
                first = line.words.index(words[0]) if words else 0
                words = line.words[first:line.words.index(m[-1]) + 1]
        out.extend((line, w) for w in words)
    return out


def _hex_color(color: str):
    h = (color or "#ffe93b").lstrip("#")
    return tuple(round(int(h[i:i + 2], 16) / 255, 4) for i in (0, 2, 4))


def build_highlight_annot(selected, sy: float, height_pt: float,
                          spec: dict) -> dict | None:
    """(line, word) pairs → one parsed annot dict, QuadPoints per line
    (writePdfAnnots.js:55-99; px top-down → pt bottom-up via 1/sy)."""
    if not selected:
        return None
    markup = spec.get("markup", "highlight")
    subtype = {"underline": "Underline",
               "strikeout": "StrikeOut"}.get(markup, "Highlight")
    opacity = spec.get("opacity",
                       0.4 if subtype == "Highlight" else 1)
    by_line: dict[int, list] = {}
    for line, w in selected:
        by_line.setdefault(id(line), []).append(w)
    quads = []
    for ws in by_line.values():
        left = min(w.bbox.left for w in ws) / sy
        right = max(w.bbox.right for w in ws) / sy
        top = height_pt - min(w.bbox.top for w in ws) / sy
        bottom = height_pt - max(w.bbox.bottom for w in ws) / sy
        quads.append((left, top, right, bottom))
    rect = [min(q[0] for q in quads), min(q[3] for q in quads),
            max(q[2] for q in quads), max(q[1] for q in quads)]
    qp = []
    for left, top, right, bottom in quads:
        qp.extend([left, top, right, top, left, bottom, right, bottom])
    annot = {Name("Type"): Name("Annot"),
             Name("Subtype"): Name(subtype),
             Name("Rect"): [round(v, 2) for v in rect],
             Name("QuadPoints"): [round(v, 2) for v in qp],
             Name("C"): list(_hex_color(spec.get("color"))),
             Name("CA"): opacity,
             Name("F"): 4}
    if spec.get("comment"):
        # PDF UTF-16 text strings need the BOM (toUtf16BeHex,
        # pdfPrimitives.js:922-928) or viewers fall back to
        # PDFDocEncoding on the raw bytes.
        annot[Name("Contents")] = b"\xfe\xff" + \
            spec["comment"].encode("utf-16-be")
    return annot


def create_highlighted_pdf(data: bytes, highlights: list,
                           pages: list | None = None):
    """Source PDF + highlight specs → (new PDF bytes, stats dict).
    ``pages``: optional output page selection (0-indexed, any order);
    omitted = all pages."""
    from . import parse_pdf_document
    from .doc import _walk_pages
    from .objects import PdfFile

    parsed, _ = parse_pdf_document(data)
    pdf = PdfFile(data)
    infos = _walk_pages(pdf)
    extra: dict[int, list] = {}
    applied = 0
    lines_hit = 0
    for spec in highlights:
        p = spec.get("page", 0)
        if not 0 <= p < len(parsed):
            continue
        page = parsed[p]
        selected = _select_words(page, spec)
        if not selected:
            continue
        # /MediaBox (and its entries) may be indirect references
        box = pdf.resolve(infos[p].get("MediaBox")) or [0, 0, 612, 792]
        box = [pdf.resolve(v) for v in box]
        height_pt = abs(float(box[3]) - float(box[1]))
        sy = page.height / height_pt if height_pt else 1.0
        annot = build_highlight_annot(selected, sy, height_pt, spec)
        if annot is not None:
            extra.setdefault(p, []).append(annot)
            applied += 1
            lines_hit += len({id(ln) for ln, _ in selected})
    out = subset_pdf(data,
                     pages if pages else list(range(len(parsed))),
                     extra_annots=extra)
    return out, {"highlightsApplied": applied,
                 "totalLinesHighlighted": lines_hit}
