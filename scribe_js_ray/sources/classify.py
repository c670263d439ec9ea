"""Payload-kind classification (sortInputFiles + detectOcrFormat analogs,
import.js:77-142, importOCR.js:17-79).

Sniffs the ``html`` binary column: %PDF- magic → pdf; ALTO/Abbyy/stext XML
markers → their parsers; hOCR class markers → hocr; any markup → html;
else text/empty.  Runs as a cheap per-batch pass producing a
``payload_kind`` dispatch column.
"""

from __future__ import annotations

import re

_HOCR_RE = re.compile(rb"class=[\"']ocr_page[\"']")
_HTML_RE = re.compile(rb"<\s*(?:!doctype\s+)?html|<body|<div|<p[\s>]", re.I)
# detectOcrFormat sniffs (importOCR.js:28-44)
_ALTO_RE = re.compile(rb"<alto[\s>]", re.I)
_ALTO_NS_RE = re.compile(
    rb"xmlns=\"http://www\.loc\.gov/standards/alto", re.I)
_FIRST_NODE_RE = re.compile(rb">([^>]+)")
_ABBYY_RE = re.compile(rb"abbyy", re.I)
_STEXT_DOC_RE = re.compile(rb"<document name")
# Cloud-OCR JSON sniffs (importOCR.js:45-63)
_TEXTRACT_RE = re.compile(
    rb"\"(?:DetectDocumentTextModelVersion|AnalyzeDocumentModelVersion)\"",
    re.I)
_GV_PAGES_RE = re.compile(rb"\"pages\"", re.I)
_GV_FTA_RE = re.compile(rb"\"fullTextAnnotation\"", re.I)
_GDAI_ANCHOR_RE = re.compile(rb"\"textAnchor\"", re.I)
_GDAI_TOKENS_RE = re.compile(rb"\"tokens\"", re.I)
_TESS_BLOCKS_RE = re.compile(rb"\"rowAttributes\"")
_TESS_PARS_RE = re.compile(rb"\"paragraphs\"")
_AZURE_RE = re.compile(rb"\"createdDateTime\"", re.I)
_AZURE_AR_RE = re.compile(rb"\"analyzeResult\"", re.I)
_AZURE_MODEL_RE = re.compile(rb"\"modelId\"", re.I)


_SCRIBE_SEG_HEAD = b'{"scribeSegments"'


def _scribe_sniff(payload: bytes) -> bool:
    """Reference .scribe session payloads (import.js:183-206): gzip is
    sniffed by magic and the decompressed head checked; plain JSON by
    the segmented header or a leading "ocr" page array."""
    head = payload[:64]
    if payload[:2] == b"\x1f\x8b":
        import zlib
        try:
            head = zlib.decompressobj(wbits=31).decompress(
                payload[:4096], 64)
        except Exception:
            return False
    stripped = head.lstrip()
    return stripped.startswith(_SCRIBE_SEG_HEAD) or \
        bool(re.match(rb'\{\s*"ocr"\s*:\s*\[', stripped))


def classify_payload(payload: bytes, text: str = "") -> str:
    if payload is None or len(payload) == 0:
        return "text" if text else "empty"
    if payload[:5] == b"%PDF-":
        return "pdf"
    if _scribe_sniff(payload):
        return "scribe"
    if payload[:4] == b"PK\x03\x04":
        if b"word/document.xml" in payload:
            return "docx"
        return "zip"
    head = payload[:65536]
    if _ALTO_RE.search(head) and _ALTO_NS_RE.search(head):
        return "alto"
    node2 = _FIRST_NODE_RE.search(head[:500])
    if node2:
        if _ABBYY_RE.search(node2.group(1)):
            return "abbyy"
        if _STEXT_DOC_RE.search(node2.group(1)):
            return "stext"
    # JSON payloads can contain '>' inside quoted OCR text, so the cloud
    # sniffs run for any JSON-looking head, not only when node2 is absent
    # (stricter than importOCR.js:45-55, which would misroute such files).
    json_like = head.lstrip()[:1] in (b"{", b"[")
    if not node2 or json_like:
        if _TEXTRACT_RE.search(head):
            return "textract"
        if _GV_PAGES_RE.search(head) and _GV_FTA_RE.search(head):
            return "google_vision"
        if _GV_PAGES_RE.search(head) and _GDAI_ANCHOR_RE.search(head) \
                and _GDAI_TOKENS_RE.search(head):
            return "google_doc_ai"
        if _TESS_BLOCKS_RE.search(head) and _TESS_PARS_RE.search(head):
            return "tess_blocks"
    if _AZURE_RE.search(head) and _AZURE_AR_RE.search(head) \
            and _AZURE_MODEL_RE.search(head):
        return "azure_doc_intel"
    if _HOCR_RE.search(head):
        return "hocr"
    if _HTML_RE.search(head):
        return "html"
    if b"%PDF-" in payload[:1024]:
        # Junk before the header: every real reader tolerates a %PDF
        # within the first 1024 bytes, and the reference — which routes
        # by .pdf extension (import.js:108) — header-adjusts all xref
        # offsets for exactly this case (parsePdfUtils.js parseXref
        # :127-129).  Checked LAST so a structured sniff above always
        # wins; without an extension column this deep scan is the only
        # way such corpus payloads reach the PDF engine at all.
        return "pdf"
    if payload.strip() == b"":
        return "empty"
    return "text"
