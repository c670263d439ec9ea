"""Deterministic synthetic pages corpus (seed-keyed, no external data).

Generates the authoritative input table shape (BASELINE.json input_hint):
``url:string | warc_ts:timestamp[us] | html:binary | text:string |
lang:string`` with a stratified payload mix per FIXTURES.md §F1:
hOCR documents (simple / char-level / furniture / paragraphs), synthetic
text-native PDFs, generic-HTML articles with boilerplate, and edge cases.

Every payload derives from ``(seed, doc_id)`` only, so tables regenerate
byte-identically at any scale — goldens stay stable across machines/runs.
"""

from __future__ import annotations

import random

import pyarrow as pa

_WORD_BANK = (
    "the of and to in is was for that with his this they from have not had "
    "her she which were can there an all when who been would their one will "
    "them more about out up into than its time only could other new some "
    "these two may then do first any my now such like our over man even most "
    "made after also did many before must through years where much your way "
    "well down should because each just those people how too little state "
    "good very make world still own see men work long get here between both "
    "life being under never day same another know while last might great old "
    "year off come since against go came right used take three"
).split()

_PAGE_W, _PAGE_H = 2480, 3508
_MARGIN = 300
_BODY_SIZE = 42          # ascender height in px at ~12pt/300dpi
_X_HEIGHT = 30
_DESC = 12
_LINE_PITCH = 62
_CHAR_W = 22             # average advance per character


def _rng(seed: int, doc_id: int) -> random.Random:
    return random.Random((seed * 1_000_003 + doc_id * 2_654_435_761) % 2**63)


def _sentence(r: random.Random, n_words: int) -> list[str]:
    ws = [r.choice(_WORD_BANK) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    ws[-1] += "."
    return ws


def _paragraph_words(r: random.Random, n_sentences: int) -> list[str]:
    out = []
    for _ in range(n_sentences):
        out.extend(_sentence(r, r.randint(6, 14)))
    return out


class HocrBuilder:
    """Lays words onto hOCR lines with simple deterministic metrics."""

    def __init__(self, page_w=_PAGE_W, page_h=_PAGE_H):
        self.page_w = page_w
        self.page_h = page_h
        self.pages = []
        self._cur = None
        self._y = _MARGIN
        self._ids = 0

    def new_page(self):
        self._cur = []
        self.pages.append(self._cur)
        self._y = _MARGIN

    def _word_span(self, text, l, t, rr, b, conf=95, style=None, sup=False):
        self._ids += 1
        attrs = f"title='bbox {l} {t} {rr} {b}; x_wconf {conf}'"
        sty = f" style='{style}'" if style else ""
        body = f"<sup>{text}</sup>" if sup else text
        return (f"<span class='ocrx_word' id='word_1_{self._ids}' "
                f"{attrs}{sty}>{body}</span>")

    def line(self, words, left=None, size=_BODY_SIZE, x_height=_X_HEIGHT,
             gap=0, align="left", right_edge=None, sup_first=False,
             style=None, y=None, char_w=None):
        """Emit one ocr_line of ``words`` at the current y cursor."""
        if y is not None:
            self._y = y
        self._y += gap
        cw = char_w if char_w is not None else max(10, int(_CHAR_W * size / _BODY_SIZE))
        text_w = sum(len(w) * cw for w in words) + (len(words) - 1) * cw
        if left is None:
            left = _MARGIN
        if align == "center":
            left = (self.page_w - text_w) // 2
        elif align == "right":
            left = (right_edge or (self.page_w - _MARGIN)) - text_w
        top = self._y
        bottom = top + size + _DESC
        spans = []
        x = left
        for i, w in enumerate(words):
            w_w = len(w) * cw
            spans.append(self._word_span(
                w, x, top, x + w_w, bottom, style=style,
                sup=(sup_first and i == 0)))
            x += w_w + cw
        line_right = x - cw
        title = (f"bbox {left} {top} {line_right} {bottom}; "
                 f"baseline 0 -{_DESC}; x_size {size + _DESC}; "
                 f"x_ascenders {size - x_height}; x_descenders {_DESC}")
        self._cur.append(
            f"<span class='ocr_line' title='{title}'>"
            + "".join(spans) + "</span>")
        self._y = bottom + (_LINE_PITCH - (size + _DESC)) \
            if size + _DESC < _LINE_PITCH else bottom + 8
        return left, top, line_right, bottom

    def skip(self, px: int):
        self._y += px

    @property
    def y(self):
        return self._y

    def build(self) -> str:
        pages_html = []
        for i, lines in enumerate(self.pages):
            pages_html.append(
                f"<div class='ocr_page' id='page_{i + 1}' "
                f"title='image \"p{i + 1}\"; bbox 0 0 {self.page_w} "
                f"{self.page_h}; ppageno {i}'>\n" + "\n".join(lines)
                + "\n</div>")
        return ("<html><head><meta charset='utf-8'/></head><body>\n"
                + "\n".join(pages_html) + "\n</body></html>")


def _flow_paragraph(b: HocrBuilder, words, left=_MARGIN, indent=60,
                    width=None, size=_BODY_SIZE, justify_last=False):
    """Greedy line fill with a first-line indent, mirroring print layout."""
    if width is None:
        width = b.page_w - 2 * _MARGIN
    cw = max(10, int(_CHAR_W * size / _BODY_SIZE))
    cur, cur_w = [], 0
    first = True
    for w in words:
        w_w = len(w) * cw
        line_w = width - (indent if first else 0)
        if cur and cur_w + cw + w_w > line_w:
            b.line(cur, left=left + (indent if first else 0), size=size)
            cur, cur_w = [], 0
            first = False
        cur.append(w)
        cur_w += (cw if cur_w else 0) + w_w
    if cur:
        b.line(cur, left=left + (indent if first else 0), size=size)


def make_hocr_simple(r: random.Random) -> str:
    b = HocrBuilder()
    b.new_page()
    for _ in range(r.randint(2, 4)):
        _flow_paragraph(b, _paragraph_words(r, r.randint(2, 5)))
        b.skip(30)
    return b.build()


def make_hocr_furniture(r: random.Random, with_linenum=False) -> str:
    b = HocrBuilder()
    n_pages = r.randint(3, 5)
    header = ["JOURNAL", "OF", "SYNTHETIC", "STUDIES"]
    for p in range(n_pages):
        b.new_page()
        b.line(header, y=120, size=36, align="center")
        b.skip(80)
        if with_linenum:
            # Left-margin standalone line-number column 1..N, one per body
            # line, plus the body lines at an indented margin.
            n_lines = 12
            body_words = _paragraph_words(r, 8)
            y0 = b.y
            for i in range(n_lines):
                y = y0 + i * 90
                b.line([str(i + 1)], left=160, y=y)
            idx = 0
            for i in range(n_lines):
                y = y0 + i * 90
                take = body_words[idx:idx + 8]
                idx += 8
                if not take:
                    break
                b.line(take, left=420, y=y)
        else:
            for _ in range(r.randint(2, 3)):
                _flow_paragraph(b, _paragraph_words(r, r.randint(2, 4)))
                b.skip(30)
        # Centered folio footer "- N -".
        b.line([f"-{p + 1}-"], y=_PAGE_H - 160, size=36, align="center")
    return b.build()


def make_hocr_paragraphs(r: random.Random) -> str:
    b = HocrBuilder()
    b.new_page()
    b.line([w.capitalize() for w in _sentence(r, 4)[:-1]] or ["Heading"],
           size=64, x_height=44, align="center")
    b.skip(60)
    para = _paragraph_words(r, 3)
    # In-text note reference ("word¹"): the reference's footnote rules
    # are evidence-gated (analyzeLayout.js:789-812) — a note marker
    # anchors the sup-ref scheme only when a body word carries the
    # matching superscript reference.
    if len(para) > 2:
        para[2] += "¹"
    _flow_paragraph(b, para)
    b.skip(20)
    for i in range(r.randint(2, 4)):
        item = ["•"] + _sentence(r, r.randint(5, 9))
        b.line(item, left=_MARGIN + 80)
    b.skip(20)
    _flow_paragraph(b, _paragraph_words(r, 2))
    # Footnote block at the bottom with a superscript marker.
    y_note = _PAGE_H - 420
    note = _sentence(r, r.randint(8, 12))
    b.line(["1"] + note[:6], left=_MARGIN, size=30, x_height=22,
           y=y_note, sup_first=True)
    if len(note) > 6:
        b.line(note[6:], left=_MARGIN, size=30, x_height=22)
    return b.build()


def make_hocr_charlevel(r: random.Random) -> str:
    """hOCR with ocrx_cinfo char spans for a couple of lines."""
    b = HocrBuilder()
    b.new_page()
    lines = []
    y = _MARGIN
    for _ in range(r.randint(3, 5)):
        words = _sentence(r, r.randint(5, 9))
        x = _MARGIN
        word_spans = []
        for w in words:
            chars = []
            wx = x
            for ch in w:
                chars.append(
                    f"<span class='ocrx_cinfo' title='x_bboxes {wx} {y} "
                    f"{wx + _CHAR_W} {y + _BODY_SIZE}'>{ch}</span>")
                wx += _CHAR_W
            word_spans.append(
                f"<span class='ocrx_word' id='w_{len(lines)}_{len(word_spans)}' "
                f"title='bbox {x} {y} {wx} {y + _BODY_SIZE}; x_wconf 92'>"
                + "".join(chars) + "</span>")
            x = wx + _CHAR_W
        title = (f"bbox {_MARGIN} {y} {x - _CHAR_W} {y + _BODY_SIZE + _DESC}; "
                 f"baseline 0 -{_DESC}; x_size {_BODY_SIZE + _DESC}; "
                 f"x_ascenders {_BODY_SIZE - _X_HEIGHT}; x_descenders {_DESC}")
        lines.append("<span class='ocr_line' title='" + title + "'>"
                     + "".join(word_spans) + "</span>")
        y += 90
    page = (f"<div class='ocr_page' title='bbox 0 0 {_PAGE_W} {_PAGE_H}'>"
            + "".join(lines) + "</div>")
    return f"<html><body>{page}</body></html>"


def make_html_article(r: random.Random) -> str:
    """Generic web page: nav/boilerplate chrome around real article text.

    Three variants round-robin by a leading draw (so existing doc-id →
    stratum routing stays stable): (a) semantic-tag page
    (nav/header/main/aside/footer), (b) div-soup page where chrome is
    only identifiable via class/id hints and the article has no <main>
    plus a trailing comments section, (c) semantic page whose article
    contains short one-line paragraphs that only block fusion keeps.
    """
    variant = r.randint(0, 2)
    title = " ".join(w.capitalize() for w in _sentence(r, 5)[:-1])
    paras = ["<p>" + " ".join(_paragraph_words(r, r.randint(3, 6))) + "</p>"
             for _ in range(r.randint(3, 7))]
    nav_links = "".join(f"<li><a href='/{w}'>{w}</a></li>"
                        for w in r.sample(_WORD_BANK, 8))
    related = "".join(f"<li><a href='/p/{i}'>"
                      + " ".join(_sentence(r, 4)[:-1]) + "</a></li>"
                      for i in range(5))
    copyright_p = ("<p>Copyright 2024 Example Corp. All rights reserved. "
                   "<a href='/privacy'>Privacy</a> "
                   "<a href='/terms'>Terms</a></p>")
    head = ("<html><head><title>" + title + "</title>"
            "<script>var x=1;</script><style>p{margin:0}</style></head>"
            "<body>")

    if variant == 1:
        # Div-soup: no semantic tags anywhere; chrome carries class/id
        # hints; no h1 (title must fall back to <head><title>); a
        # comments section follows the article text.
        comments = "".join(
            "<div class='comment-body'><p>"
            + " ".join(_paragraph_words(r, 2)) + "</p></div>"
            for _ in range(r.randint(2, 4)))
        return (
            head
            + "<div id='topnav' class='menu'><ul>" + nav_links + "</ul></div>"
            + "<div class='content'>" + "".join(paras) + "</div>"
            + "<div id='comments' class='comments-area'>"
              "<div class='comment-count'>" + str(r.randint(2, 40))
            + " Comments</div>" + comments + "</div>"
            + "<div class='sidebar'><ul>" + related + "</ul></div>"
            + "<div class='site-footer'>" + copyright_p + "</div>"
            "</body></html>")

    if variant == 2:
        # Fusion bait: short zero-link lines between full paragraphs
        # (pull-quote / list-item shaped) that only the context pass
        # keeps; same chrome as the semantic variant.
        short_lines = "".join(
            "<p>" + " ".join(_sentence(r, r.randint(3, 5))) + "</p>"
            for _ in range(r.randint(1, 3)))
        body = paras[0] + short_lines + "".join(paras[1:])
        return (
            head
            + "<nav><ul>" + nav_links + "</ul></nav>"
            "<header><h1>" + title + "</h1></header>"
            "<div>" + body + "</div>"
            "<aside><h3>Related</h3><ul>" + related + "</ul></aside>"
            "<footer>" + copyright_p + "</footer>"
            "</body></html>")

    return (
        head
        + "<nav><ul>" + nav_links + "</ul></nav>"
        "<header><h1>" + title + "</h1></header>"
        "<main><article>" + "".join(paras) + "</article></main>"
        "<aside><h3>Related</h3><ul>" + related + "</ul></aside>"
        "<footer>" + copyright_p + "</footer>"
        "</body></html>")


STRATA = (
    "hocr-simple", "hocr-furniture", "hocr-linenum", "hocr-paragraphs",
    "hocr-charlevel", "html-article", "pdf-simple", "pdf-styles",
    "edge-empty", "edge-space",
)


def make_payload(seed: int, doc_id: int) -> tuple[str, bytes, str, str]:
    """Returns (stratum, html_bytes, text, lang) for one doc."""
    r = _rng(seed, doc_id)
    stratum = STRATA[doc_id % len(STRATA)]
    text = ""
    lang = "eng"
    if stratum == "hocr-simple":
        payload = make_hocr_simple(r).encode()
    elif stratum == "hocr-furniture":
        payload = make_hocr_furniture(r, with_linenum=False).encode()
    elif stratum == "hocr-linenum":
        payload = make_hocr_furniture(r, with_linenum=True).encode()
    elif stratum == "hocr-paragraphs":
        payload = make_hocr_paragraphs(r).encode()
    elif stratum == "hocr-charlevel":
        payload = make_hocr_charlevel(r).encode()
    elif stratum == "html-article":
        payload = make_html_article(r).encode()
    elif stratum == "pdf-simple":
        from .synth_pdf import make_pdf_simple
        payload = make_pdf_simple(r)
    elif stratum == "pdf-styles":
        from .synth_pdf import make_pdf_styles
        payload = make_pdf_styles(r)
    elif stratum == "edge-empty":
        payload = b""
        text = " ".join(_sentence(r, 12))
    else:  # edge-space
        payload = b"   \n  \t "
    return stratum, payload, text, lang


def hocr_from_text(text: str, doc_id: int) -> bytes:
    """Deterministically typeset plain text as a single-page hOCR payload
    (used to derive a pages corpus from the driver's documents table)."""
    b = HocrBuilder()
    b.new_page()
    words = text.split()
    if words:
        _flow_paragraph(b, words, indent=60 if doc_id % 2 else 0)
    return b.build().encode()


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, ...) → pages(url, warc_ts, html, text,
    lang) batch transform; runs distributed inside map_batches."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names \
        else ["eng"] * len(doc_ids)
    payloads = [hocr_from_text(t or "", d) for d, t in zip(doc_ids, texts)]
    return pa.table({
        "url": pa.array([f"https://docs.test/{d:08d}" for d in doc_ids],
                        pa.string()),
        "warc_ts": pa.array([1_600_000_000_000_000 + d for d in doc_ids],
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary()),
        "text": pa.array(["" for _ in doc_ids], pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def generate_pages_table(n_docs: int, seed: int = 42) -> pa.Table:
    urls, ts, payloads, texts, langs = [], [], [], [], []
    for doc_id in range(n_docs):
        stratum, payload, text, lang = make_payload(seed, doc_id)
        urls.append(f"https://fix.test/doc/{doc_id:06d}")
        ts.append(1_600_000_000_000_000 + doc_id * 1_000_000)
        payloads.append(payload)
        texts.append(text)
        langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(payloads, pa.large_binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_parquet(path: str, n_docs: int, seed: int = 42,
                        rows_per_file: int = 2000) -> str:
    """Write the synthetic corpus as a directory of parquet part files
    (one per shard → resumable, parallel-readable)."""
    import os

    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n_docs, rows_per_file):
        n = min(rows_per_file, n_docs - start)
        tbl_rows = []
        urls, ts, payloads, texts, langs = [], [], [], [], []
        for doc_id in range(start, start + n):
            stratum, payload, text, lang = make_payload(seed, doc_id)
            urls.append(f"https://fix.test/doc/{doc_id:06d}")
            ts.append(1_600_000_000_000_000 + doc_id * 1_000_000)
            payloads.append(payload)
            texts.append(text)
            langs.append(lang)
        tbl = pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return path


# ---------------------------------------------------------------- media

def synth_image_payload(media_id: int) -> bytes:
    """Deterministic REAL image bytes keyed off the id: ids cycle
    PNG → BMP → GIF → JPEG → TIFF (exercising all five stdlib decoders).  The
    pixel pattern is closed-form in (x, y, media_id); PNG/BMP payloads
    decode to it exactly, the GIF variant quantizes to a coarse palette
    (lossless round-trip of the quantized pixels), and JPEG is lossy —
    exact-pixel assertions must use PNG/BMP ids only."""
    import numpy as np

    from ..stages.codecs import (bmp_encode, gif_encode, png_encode,
                                 tiff_encode)
    from ..stages.jpeg import jpeg_encode
    h, w = 24 + (media_id % 3) * 8, 32 + (media_id % 5) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([
        (xx * 3 + media_id) % 256,
        (yy * 5 + media_id * 7) % 256,
        ((xx ^ yy) + media_id * 13) % 256,
    ], axis=2).astype(np.uint8)
    kind = media_id % 5
    if kind == 0:
        return png_encode(px, filter_type=(media_id // 5) % 5)
    if kind == 1:
        return bmp_encode(px)
    if kind == 2:
        return gif_encode(px & 0xC0)  # 2 bits/channel → ≤64 colors
    if kind == 3:
        return jpeg_encode(px, quality=85, subsample=media_id % 10 == 8)
    return tiff_encode(px, "packbits" if media_id % 2 else "none")


def synth_audio_payload(media_id: int) -> bytes:
    """Deterministic REAL 16-bit PCM WAV: two sinusoids whose frequencies
    derive from the id, 0.25 s at 8 kHz."""
    import numpy as np

    from ..stages.codecs import wav_encode
    rate = 8000
    t = np.arange(rate // 4, dtype=np.float64) / rate
    f1 = 200.0 + (media_id % 16) * 50.0
    f2 = 900.0 + (media_id % 7) * 130.0
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + \
        0.25 * np.sin(2 * np.pi * f2 * t)
    return wav_encode(wave, sample_rate=rate)


def synth_video_payload(media_id: int, n_frames: int = 6) -> bytes:
    """Deterministic REAL MPNG container: n_frames 8×8 PNG frames whose
    pattern shifts per frame (so sampled frames provably differ)."""
    import numpy as np

    from ..stages.codecs import mpng_encode
    frames = []
    yy, xx = np.mgrid[0:8, 0:8]
    for f in range(n_frames):
        frames.append(np.stack([
            (xx * 16 + f * 40 + media_id) % 256,
            (yy * 16 + f * 11) % 256,
            ((xx + yy) * 8 + media_id * 3 + f * 29) % 256,
        ], axis=2).astype(np.uint8))
    return mpng_encode(frames, fps=10)
