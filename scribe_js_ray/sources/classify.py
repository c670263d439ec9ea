"""Payload-kind classification (sortInputFiles analog, import.js:77-142).

Sniffs the ``html`` binary column: %PDF- magic → pdf; hOCR class markers →
hocr; any markup → html; else text/empty.  Vectorizable: runs as a cheap
per-batch pass producing a ``payload_kind`` dispatch column.
"""

from __future__ import annotations

import re

_HOCR_RE = re.compile(rb"class=[\"']ocr_page[\"']")
_HTML_RE = re.compile(rb"<\s*(?:!doctype\s+)?html|<body|<div|<p[\s>]", re.I)


def classify_payload(payload: bytes, text: str = "") -> str:
    if payload is None or len(payload) == 0:
        return "text" if text else "empty"
    if payload[:5] == b"%PDF-":
        return "pdf"
    head = payload[:65536]
    if _HOCR_RE.search(head):
        return "hocr"
    if _HTML_RE.search(head):
        return "html"
    if payload.strip() == b"":
        return "empty"
    return "text"
