"""scribe_js_ray — a Ray-Data-native document text-extraction engine.

A from-scratch reimplementation of the text-extraction capabilities of
scribeocr/scribe.js (reference at /root/reference, studied for behavior only)
expressed as Ray Data pipelines over Parquet tables of Common-Crawl-style
web pages: ``(url, warc_ts, html, text, lang)``.

Layout:
- ``model``      — the page→par→line→word document model (ocrObjects.js analog)
- ``functions``  — scalar/stat helpers (quantile, mean50, text normalization)
- ``stages``     — per-document parsers and transforms (hOCR, HTML, PDF,
                   pass3 normalizer, paragraph reflow, layout roles, emit)
- ``sources``    — payload classification + deterministic synthetic corpus
- ``pipelines``  — Ray Data pipeline builders (extraction, corpus ops)
"""

__version__ = "0.1.0"
