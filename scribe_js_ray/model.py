"""The in-task document model: Page → Par → Line → Word → Char.

Analog of the reference's OcrPage/OcrPar/OcrLine/OcrWord/OcrChar tree
(/root/reference/js/objects/ocrObjects.js:11-230), minus debug fields and
random ids.  Ids are deterministic (``{url}#{page}#{line}#{word}``), assigned
at emit time; the tree itself lives only inside one map_batches invocation —
only flat Arrow columns cross Ray stage boundaries.
"""

from __future__ import annotations

from typing import Optional


class BBox:
    __slots__ = ("left", "top", "right", "bottom")

    def __init__(self, left: float, top: float, right: float, bottom: float):
        self.left = left
        self.top = top
        self.right = right
        self.bottom = bottom

    @property
    def width(self):
        return self.right - self.left

    @property
    def height(self):
        return self.bottom - self.top

    def copy(self) -> "BBox":
        return BBox(self.left, self.top, self.right, self.bottom)

    def __repr__(self):
        return f"BBox({self.left},{self.top},{self.right},{self.bottom})"


def bbox_union(boxes) -> BBox:
    """miscUtils.js calcBboxUnion."""
    it = iter(boxes)
    first = next(it)
    l, t, r, b = first.left, first.top, first.right, first.bottom
    for bx in it:
        if bx.left < l:
            l = bx.left
        if bx.top < t:
            t = bx.top
        if bx.right > r:
            r = bx.right
        if bx.bottom > b:
            b = bx.bottom
    return BBox(l, t, r, b)


class Style:
    __slots__ = ("font", "size", "bold", "italic", "underline", "small_caps",
                 "sup", "dropcap", "color", "opacity", "link")

    def __init__(self):
        self.font = None
        self.size = None
        self.bold = False
        self.italic = False
        self.underline = False
        self.small_caps = False
        self.sup = False
        self.dropcap = False
        self.color = None
        # /Link-annotation URI the word sits under (parsePdfDoc.js:1061)
        self.link = None
        # 0 for Tr-3 invisible words, else the fill alpha at draw time
        # (ocrObjects.js:177 default 1; parsePdfDoc.js:3108-3112).
        self.opacity = 1


class Char:
    __slots__ = ("text", "bbox")

    def __init__(self, text: str, bbox: BBox):
        self.text = text
        self.bbox = bbox


class Word:
    __slots__ = ("text", "bbox", "style", "lang", "conf", "chars", "line",
                 "line_num", "id", "mcid", "artifact", "text_alt",
                 "style_runs", "visual_coords", "footnote_par",
                 "raw_src")

    def __init__(self, line: "Line", wid: str, text: str, bbox: BBox):
        self.line = line
        self.id = wid
        self.text = text
        self.bbox = bbox
        self.style = Style()
        self.lang = "eng"
        self.conf = 0
        self.chars: Optional[list] = None
        # Transcript line number fused into the start of a body line
        # (ocrObjects.js:194-198); dropped by reflowed text exports.
        self.line_num = False
        # Marked-content id + /Artifact flag (PDF path only, M21).
        self.mcid = None
        self.artifact = False
        # Higher-confidence alternative recognition (textAlt,
        # ocrObjects.js word field; set by the blocks import).
        self.text_alt = None
        # Intra-word style changes: [{"i": offset, "style": delta-dict}]
        # (ocrObjects.js word.styleRuns; set by the PDF/DOCX paths when
        # a word spans runs of differing bold/italic/smallCaps).
        self.style_runs = None
        # True when the bbox traces visible pixels (OCR imports); False
        # when it comes from font metrics and includes side bearings
        # (PDF-native, stext, DOCX, lifted form/fill words —
        # ocrObjects.js:209 default true; parsePdfDoc.js:3070,
        # convertPageStext.js:544/575, convertDocDocx.js:862,
        # fillSign.js:83, formFields.js:74 clear it).
        self.visual_coords = True
        # Linked footnote/endnote paragraph for an in-text reference
        # marker (ocrObjects.js:217 word.footnoteParId; set by the
        # layout footnote-linking pass and the DOCX import) — we link
        # by object, the reference by random par id.
        self.footnote_par = None
        # Raw source markup for char-level hOCR words (the reference's
        # word.debug.raw, convertPageHocr.js:251 under debugMode=true);
        # surfaces in the debug-CSV export.
        self.raw_src = None


def get_word_style_segments(word: "Word"):
    """Resolve a word's style runs into contiguous (start, end, style)
    segments; None for uniform words (ocrObjects.js:835-847)."""
    runs = getattr(word, "style_runs", None)
    if not runs:
        return None

    def overlay(delta):
        st = Style()
        for f in ("font", "size", "bold", "italic", "underline",
                  "small_caps", "sup", "dropcap", "color", "opacity",
                  "link"):
            setattr(st, f, getattr(word.style, f))
        for k, v in delta.items():
            setattr(st, k, v)
        return st

    segments = []
    start = 0
    style = word.style
    for run in runs:
        segments.append((start, run["i"], style))
        start = run["i"]
        style = overlay(run["style"])
    segments.append((start, len(word.text), style))
    return [s for s in segments if s[1] > s[0]]


class Line:
    __slots__ = ("bbox", "baseline", "asc_height", "x_height", "words",
                 "page", "par", "orientation")

    def __init__(self, page: "Page", bbox: BBox, baseline,
                 asc_height=None, x_height=None):
        self.page = page
        self.bbox = bbox
        self.baseline = list(baseline)  # [slope, offset-from-bbox-bottom]
        self.asc_height = asc_height
        self.x_height = x_height
        self.words: list[Word] = []
        self.par: Optional[Par] = None
        self.orientation = 0


# Paragraph semantic roles (ocrObjects.js:39-47).
PAR_TYPES = ("title", "body", "footnote", "endnote", "pagenum", "blockquote",
             "header", "footer", "linenum")
FURNITURE_TYPES = frozenset(("pagenum", "header", "footer", "linenum"))


class Par:
    __slots__ = ("bbox", "lines", "type", "reason", "page", "par_num",
                 "footnote_ref")

    def __init__(self, page: "Page", bbox: BBox):
        self.page = page
        self.bbox = bbox
        self.lines: list[Line] = []
        self.type = "body"
        self.reason = ""
        # Paragraph/list enumerator raw text (reference par.parNum,
        # analyzeLayout.js:2183) and the linked in-text reference word
        # id for footnote/endnote pars (par.footnoteRefId, :2278).
        self.par_num = None
        self.footnote_ref = None


def par_is_furniture(par: Optional[Par]) -> bool:
    """ocrObjects.js:54-56."""
    return par is not None and par.type in FURNITURE_TYPES


class Page:
    __slots__ = ("n", "width", "height", "angle", "lines", "pars",
                 "text_source", "rules", "table_boxes", "mcid_roles",
                 "mcid_elems", "marks", "font_programs", "annots",
                 "layout_regions", "layout_meta")

    def __init__(self, n: int, width: int, height: int):
        self.n = n
        self.width = width
        self.height = height
        self.angle = 0.0
        self.lines: list[Line] = []
        self.pars: list[Par] = []
        self.text_source = None
        # Thin drawn horizontal separator rules (ocrObjects.js:22-27) and
        # detected table regions that suppress furniture rules inside
        # them (ocrObjects.js:28-34); both in line-bbox pixel space.
        self.rules: list = []
        self.table_boxes: list = []
        # Tagged-PDF struct-tree roles keyed by marked-content id (M21).
        self.mcid_roles: dict = {}
        # mcid → paragraph-element instance id (decideBreak structId)
        self.mcid_elems: dict = {}
        # Carried annotation overlays (highlight/underline/strikeout/link
        # device-space marks); redactions are APPLIED, never carried.
        self.marks: list = []
        # Source-document TrueType programs by family name, for the PDF
        # export's glyph-outline re-embedding (never serialized into
        # .scribe — in-task only, like the reference's DocFonts).
        self.font_programs: dict = {}
        # Form-field annotation rows (doc.annotations.pages analog) —
        # the set_form_value edit surface (formFields.js:15-87).
        self.annots: list = []
        # User layout regions restored from a scribeocr reimport
        # (doc.layoutRegions.pages analog, import.js:407-411); applied
        # only by the opt-in reorder stage, matching the reference's
        # enableLayout default-off.
        self.layout_regions: dict = {}
        # Raw restored layout/table meta page dicts from a scribeocr
        # hOCR reimport (importOCR getMeta) — re-serialized VERBATIM on
        # export so restored ids/defaults survive the round trip.
        self.layout_meta = None

    @property
    def dims(self):
        return {"width": self.width, "height": self.height}


def update_line_bbox(line: Line, adjust_baseline: bool = True) -> None:
    """Recompute the line bbox from word bboxes and keep the baseline at
    the same absolute y by shifting its bottom-relative offset
    (ocrObjects.js updateLineBbox; every reference call site uses the
    adjusting default except the rotation arm, which does its own
    baseline math)."""
    if not line.words:
        return
    bottom_orig = line.bbox.bottom
    line.bbox = bbox_union(w.bbox for w in line.words)
    if adjust_baseline:
        line.baseline[1] += bottom_orig - line.bbox.bottom


def calc_word_bbox(word: Word) -> None:
    if word.chars:
        word.bbox = bbox_union(c.bbox for c in word.chars)


def line_text(line: Line) -> str:
    return " ".join(w.text for w in line.words)


def page_text(page: Page) -> str:
    return "\n".join(line_text(ln) for ln in page.lines)


def calc_conf(pages, conf_thresh_high: int = 85) -> tuple[int, int]:
    """Count words above the high-confidence threshold across pages
    (ocrUtils.js:11-23; default threshold scribeDocDefaults.js:8).
    Returns (high_conf, total)."""
    total = 0
    high = 0
    for page in pages:
        for line in page.lines:
            for w in line.words:
                total += 1
                if (w.conf or 0) > conf_thresh_high:
                    high += 1
    return high, total
