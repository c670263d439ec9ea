"""Byte-parity against the LIVE reference (node runs the actual
scribe.js at /root/reference — zero runtime deps, verified importable).

The strongest possible correctness evidence for the north rule's
byte-identical target: the same fixture bytes through both engines must
produce identical reflowed text.  Skipped when node or the reference
checkout is unavailable (CI sandboxes without them still run the frozen
goldens, which this battery regenerated and cross-checked)."""

import random
import shutil
import subprocess

import pytest

from scribe_js_ray.pipelines.extract import extract_document

HARNESS = "/root/repo/tests/refharness/extract_text.mjs"
REF = "/root/reference/scribe.js"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not __import__("os").path.exists(REF),
    reason="node or reference checkout unavailable")


def _ref_extract(path: str) -> str:
    r = subprocess.run(["node", HARNESS, path], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def _check(payload: bytes, ext: str, tmp_path, name: str):
    p = tmp_path / f"{name}.{ext}"
    p.write_bytes(payload)
    ref = _ref_extract(str(p))
    ours = extract_document("u", payload, "", "eng")["extracted_text"]
    assert ours == ref, f"{name}: ours {len(ours)}B != ref {len(ref)}B"


@pytest.mark.parametrize("seed", [0, 3, 5, 7])
def test_pdf_parity(seed, tmp_path):
    from scribe_js_ray.sources.synth_pdf import (make_pdf_simple,
                                                 make_pdf_styles)
    _check(make_pdf_simple(random.Random(seed)), "pdf", tmp_path,
           f"simple{seed}")
    _check(make_pdf_styles(random.Random(seed)), "pdf", tmp_path,
           f"styles{seed}")


@pytest.mark.parametrize("seed", [1, 4])
def test_hocr_parity(seed, tmp_path):
    from scribe_js_ray.sources.synth import (make_hocr_charlevel,
                                             make_hocr_furniture,
                                             make_hocr_paragraphs,
                                             make_hocr_simple)
    _check(make_hocr_simple(random.Random(seed)).encode(), "hocr",
           tmp_path, f"hsimple{seed}")
    _check(make_hocr_furniture(random.Random(seed),
                               with_linenum=True).encode(), "hocr",
           tmp_path, f"hln{seed}")
    _check(make_hocr_paragraphs(random.Random(seed)).encode(), "hocr",
           tmp_path, f"hpara{seed}")
    _check(make_hocr_charlevel(random.Random(seed)).encode(), "hocr",
           tmp_path, f"hchar{seed}")


def test_image_pdf_parity(tmp_path):
    from scribe_js_ray.sources.synth_pdf import make_pdf_images
    _check(make_pdf_images(random.Random(7)), "pdf", tmp_path, "imgs")


def test_alto_roundtrip_parity(tmp_path):
    """Our ALTO export parsed by BOTH engines → identical text."""
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.exports import write_alto
    from scribe_js_ray.stages.hocr import parse_hocr_page
    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(2)), 0)
    _check(write_alto([page]).encode(), "xml", tmp_path, "alto")


def test_scribe_session_parity(tmp_path):
    """Our .scribe bytes (plain and gzip) read by the reference."""
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.stages.scribe_fmt import write_scribe
    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(3)), 0)
    _check(write_scribe([page], segmented=True), "scribe", tmp_path, "sp")
    _check(write_scribe([page], segmented=True, gzip_out=True), "scribe",
           tmp_path, "sg")


def _ref_fmt(path: str, fmt: str) -> str:
    harness = HARNESS.replace("extract_text.mjs", "export_fmt.mjs")
    r = subprocess.run(["node", harness, path, fmt], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


@pytest.mark.parametrize("seed", [0, 5])
def test_markdown_parity(seed, tmp_path):
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    for payload, ext, name in (
            (make_pdf_styles(random.Random(seed)), "pdf", f"mdp{seed}"),
            (make_hocr_paragraphs(random.Random(seed)).encode(), "hocr",
             f"mdh{seed}")):
        p = tmp_path / f"{name}.{ext}"
        p.write_bytes(payload)
        ref = _ref_fmt(str(p), "md")
        ours = extract_document("u", payload, "", "eng",
                                emit_format="markdown")["extracted_text"]
        assert ours == ref, f"{name}: ours {len(ours)}B != ref {len(ref)}B"


def test_txt_import_parity(tmp_path):
    """Plain-text import: our Times-AFM synthetic layout reproduces the
    reference's typeset-then-reflow byte-for-byte (the reference runs in
    worker mode here — its font registry only reaches import workers
    when the scheduler exists)."""
    from scribe_js_ray.sources.synth import _paragraph_words
    r = random.Random(11)
    text = "\n\n".join(" ".join(_paragraph_words(r, 2)) for _ in range(3))
    _check(text.encode(), "txt", tmp_path, "plain")


def test_docx_import_parity(tmp_path):
    """Our DOCX export read by both engines → identical text."""
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.docx import write_docx
    from scribe_js_ray.stages.hocr import parse_hocr_page
    page, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(1)), 0)
    _check(write_docx([page]), "docx", tmp_path, "docx")


def test_stext_abbyy_import_parity(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_formats import make_abbyy, make_stext
    _check(make_stext([["Hello", "world."],
                       ["Second", "line", "here."]]).encode(),
           "stext", tmp_path, "st")
    _check(make_abbyy([[("Hello", None), ("world.", None)],
                       [("Second", None), ("line", None),
                        ("here.", None)]]).encode(),
           "xml", tmp_path, "ab")


def _stress_pdfs(seed):
    """Adversarial decideBreak shapes: double-spaced, enumerated list,
    centered heading run, footnotes, hanging indents, inset quote,
    TWO-COLUMN (content-stream reading order), small-print note."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import _MARGIN, _make_pdf, _Typesetter
    r = random.Random(seed)
    out = {}

    ts = _Typesetter()
    for _ in range(4):
        ts.flow(_paragraph_words(r, 2))
        ts.y -= 26
    out["double_spaced"] = _make_pdf([ts.stream()], {"F1": "Helvetica"})

    ts = _Typesetter()
    ts.flow(_paragraph_words(r, 2))
    ts.y -= 8
    for i in range(1, 5):
        ts.line(f"{i}. " + " ".join(_sentence(r, 6)), dy=18)
    ts.y -= 8
    ts.flow(_paragraph_words(r, 2))
    out["enum_list"] = _make_pdf([ts.stream()], {"F1": "Helvetica"})

    ts = _Typesetter()
    for i in range(1, 4):
        ts.line(f"[{i}] " + " ".join(_sentence(r, 8)), x=_MARGIN, dy=16)
        for _ in range(2):
            ts.line(" ".join(_sentence(r, 7)), x=_MARGIN + 24, dy=14)
        ts.y -= 6
    out["hanging"] = _make_pdf([ts.stream()], {"F1": "Helvetica"})

    ts = _Typesetter()
    colw = (612 - 2 * _MARGIN - 24) / 2
    y0 = ts.y
    ts.flow(_paragraph_words(r, 3), x=_MARGIN, width=colw)
    ts.y = y0
    ts.flow(_paragraph_words(r, 3), x=_MARGIN + colw + 24, width=colw)
    out["two_col"] = _make_pdf([ts.stream()], {"F1": "Helvetica"})
    return out


@pytest.mark.parametrize("seed", [0, 2])
def test_stress_pdf_parity(seed, tmp_path):
    for name, data in _stress_pdfs(seed).items():
        _check(data, "pdf", tmp_path, f"{name}{seed}")


def test_hyphen_and_image_routing_parity(tmp_path):
    """Two named north-star behaviors: hyphen-dehyphenation at reflow,
    and usePDFText routing (an image-native PDF's sparse text never
    becomes active data — the reference exports empty)."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import _make_pdf, _Typesetter
    r = random.Random(5)
    ts = _Typesetter()
    ts.line("The committee considered the recommen-", dy=14)
    ts.line("dation carefully before the final deci-", dy=14)
    ts.line("sion was reached by all members there.", dy=14)
    ts.y -= 10
    ts.flow(_paragraph_words(r, 2))
    _check(_make_pdf([ts.stream()], {"F1": "Helvetica"}), "pdf",
           tmp_path, "hyph")
    # sparse text page -> doc type 'image' -> empty export both sides
    stream = ("BT /F1 11 Tf 72 700 Td (tiny) Tj ET "
              "q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
              + "\x00\x00\x00\x00" + " EI Q")
    _check(_make_pdf([stream], {"F1": "Helvetica"}), "pdf",
           tmp_path, "imgnative")


def test_superscript_marker_parity(tmp_path):
    """Raised footnote marker via Ts text rise inside a text-native
    body (M16-M18 superscript split path)."""
    from scribe_js_ray.sources.synth import _paragraph_words
    from scribe_js_ray.sources.synth_pdf import _make_pdf, _Typesetter
    r = random.Random(1)
    ts = _Typesetter()
    for _ in range(3):
        ts.flow(_paragraph_words(r, 3))
        ts.y -= 8
    stream = ts.stream() + (
        "\nBT /F1 11 Tf 72 300 Td (The cited evidence supports it) Tj "
        "4 Ts /F1 7 Tf (12) Tj 0 Ts /F1 11 Tf "
        "( and more follows here.) Tj ET")
    _check(_make_pdf([stream], {"F1": "Helvetica"}), "pdf",
           tmp_path, "supmark")


def test_scanned_product_parity(tmp_path):
    """Scanned-PDF products: an invisible Tr-3 overlay ('ocr' type, the
    north star's core case) and the ExtGState ca=0 variant both extract
    identically to the reference."""
    from scribe_js_ray.sources.synth import _paragraph_words
    from scribe_js_ray.sources.synth_pdf import (PdfWriter, _make_pdf,
                                                 _Typesetter)
    r = random.Random(2)
    ts = _Typesetter()
    for _ in range(3):
        ts.flow(_paragraph_words(r, 3))
        ts.y -= 8
    stream = ("q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
              + "\x00\x00\x00\x00" + " EI Q\n"
              + ts.stream().replace("BT /F1", "BT 3 Tr /F1"))
    _check(_make_pdf([stream], {"F1": "Helvetica"}), "pdf",
           tmp_path, "tr3")

    content = ("q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
               + "\x00\x00\x00\x00" + " EI Q\n/GS0 gs\n"
               + ts.stream()).encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> "
          b"/ExtGState << /GS0 6 0 R >> >> /Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /ExtGState /ca 0 >>")
    _check(w.build(), "pdf", tmp_path, "alpha0")


def test_multipage_export_roundtrip_parity(tmp_path):
    """Two-page ALTO and hOCR exports of OUR writer read by both
    engines → identical reflowed text."""
    from scribe_js_ray.sources.synth import (make_hocr_paragraphs,
                                             make_hocr_simple)
    from scribe_js_ray.stages.exports import write_alto, write_hocr
    from scribe_js_ray.stages.hocr import parse_hocr_page
    p1, _ = parse_hocr_page(make_hocr_paragraphs(random.Random(0)), 0)
    p2, _ = parse_hocr_page(make_hocr_simple(random.Random(50)), 1)
    _check(write_alto([p1, p2]).encode(), "xml", tmp_path, "alto2")
    _check(write_hocr([p1, p2]).encode(), "hocr", tmp_path, "hocr2")


def test_row_fragment_marker_parity(tmp_path):
    """Raised same-row reference markers emitted as separate content-
    stream blocks (the reference's rowFragment shapes,
    analyzeLayout.js:1930-1951): both engines must route the marker
    into its row and keep the following paragraph-gap decision intact.
    Pinned for text AND markdown — paragraph grouping shows in md."""
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    variants = {
        "frag_lastline": (
            "BT /F1 11 Tf 72 700 Td (First line of the opening "
            "paragraph runs along) Tj ET\n"
            "BT /F1 11 Tf 72 686 Td (second line ends with a "
            "citation) Tj ET\n"
            "BT /F1 7 Tf 245 691 Td ([34]) Tj ET\n"
            "BT /F1 11 Tf 72 650 Td (A new paragraph begins after a "
            "clear vertical gap) Tj ET\n"),
        "frag_midpar": (
            "BT /F1 11 Tf 72 700 Td (First line of the opening "
            "paragraph runs along) Tj ET\n"
            "BT /F1 7 Tf 310 706 Td (12) Tj ET\n"
            "BT /F1 11 Tf 72 686 Td (continuation line in the very "
            "same paragraph here) Tj ET\n"
            "BT /F1 11 Tf 72 650 Td (A new paragraph begins after a "
            "clear vertical gap) Tj ET\n"),
    }
    for name, stream in variants.items():
        pdf = _make_pdf([stream], {"F1": "Helvetica"})
        p = tmp_path / f"{name}.pdf"
        p.write_bytes(pdf)
        ref_t = _ref_extract(str(p))
        ours_t = extract_document("u", pdf, "", "eng")["extracted_text"]
        assert ours_t == ref_t, name
        ref_m = _ref_fmt(str(p), "md")
        ours_m = extract_document("u", pdf, "", "eng",
                                  emit_format="markdown")["extracted_text"]
        assert ours_m == ref_m, name


def _sink_pdf(r):
    """Kitchen-sink page mix: folios, running headers, headings,
    variable-pitch paragraphs, lists, hanging indents, TJ kerning,
    raised markers, footnote blocks, small print, 1-2 pages.  Seed 66
    found the all-caps-only heading demotion gap (classifyRole
    analyzeLayout.js:3040-3055) — an 8pt caps running header on a
    2-page doc promoted via the caps signature where the reference
    demotes it back to body through the page's gap regime."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _make_pdf, _Typesetter)
    pages = []
    n_pages = 1 + (r.random() < 0.3)
    for pg in range(n_pages):
        ts = _Typesetter()
        extra = []
        if r.random() < 0.4:
            ts.line(f"{pg + 1}", x=_PAGE_W / 2 - 4, size=9, dy=14)
            ts.y -= 10
        if r.random() < 0.3:
            ts.line("JOURNAL OF SYNTHETIC RESULTS", x=_MARGIN, size=8,
                    dy=12)
            ts.y -= 12
        if r.random() < 0.6:
            heading = " ".join(w.capitalize() for w in _sentence(r, 3)[:-1])
            hw = ts.text_width(heading, "F2", 16)
            ts.line(heading, x=(_PAGE_W - hw) / 2, size=16, font="F2",
                    dy=24)
            ts.y -= 8
        dbl = r.random() < 0.25
        for _ in range(r.randint(1, 3)):
            ts.flow(_paragraph_words(r, r.randint(1, 3)))
            ts.y -= (26 if dbl else 8)
        if r.random() < 0.35:
            for i in range(1, r.randint(3, 5)):
                ts.line(f"{i}. " + " ".join(_sentence(r, 5)), dy=16)
            ts.y -= 8
        if r.random() < 0.25:
            for i in range(1, 3):
                ts.line(f"[{i}] " + " ".join(_sentence(r, 6)), x=_MARGIN,
                        dy=15)
                ts.line(" ".join(_sentence(r, 5)), x=_MARGIN + 22, dy=14)
            ts.y -= 6
        if r.random() < 0.3:
            ts.line_tj(["ker", -15, "ned", " ", "wo", -20, "rd", " ",
                        "here."], dy=18)
        if r.random() < 0.3:
            extra.append(
                f"BT /F1 6 Tf {_MARGIN + r.randint(150, 300)}"
                f" {ts.y + 18:.1f} Td ([{r.randint(1, 40)}]) Tj ET")
        if r.random() < 0.35:
            ts.y = 120
            ts.line("1 " + " ".join(_sentence(r, 8)), size=8, dy=11)
            ts.line(" ".join(_sentence(r, 6)), size=8, dy=11)
        if r.random() < 0.2:
            ts.y = 90
            ts.line(" ".join(_sentence(r, 5)), size=7, dy=10)
        pages.append(ts.stream() + "\n" + "\n".join(extra))
    return _make_pdf(pages, {"F1": "Helvetica", "F2": "Helvetica-Bold",
                             "F3": "Times-Roman"})


@pytest.mark.parametrize("seed", [7, 31, 66, 107, 150])
def test_kitchen_sink_parity(seed, tmp_path):
    _check(_sink_pdf(random.Random(seed)), "pdf", tmp_path,
           f"sink{seed}")


def _sink2_pdf(r):
    """Round-2 kitchen-sink: bold lead-in runs, centered multi-line
    display titles, inset quotes (tight pitch, both-side indent),
    line-numbered transcript blocks, italic-family tail blocks.  Seed 8
    found the fullBoldHeading gate gap: a bold lead line in a SHORT doc
    (<8 body lines) promoted on weight alone where the reference's
    model.boldHeading flag never activates (classifyRole
    analyzeLayout.js:3000-3006)."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _make_pdf, _Typesetter)
    ts = _Typesetter()
    if r.random() < 0.4:
        for _k in range(r.randint(1, 3)):
            t = " ".join(w.upper() for w in _sentence(r, r.randint(2, 4))[:-1])
            size = r.choice([14, 16, 18])
            w = ts.text_width(t, "F2", size)
            ts.line(t, x=(_PAGE_W - w) / 2, size=size, font="F2",
                    dy=size + 6)
        ts.y -= 12
    if r.random() < 0.5:
        words = _paragraph_words(r, 2)
        lead = " ".join(_sentence(r, 2)[:-1])
        ts.line_tj([], dy=0)
        ts.line(lead, size=11, font="F2", dy=16)
        ts.flow(words)
        ts.y -= 8
    dbl = r.random() < 0.3
    for _ in range(r.randint(1, 2)):
        ts.flow(_paragraph_words(r, 2))
        ts.y -= (26 if dbl else 8)
    if r.random() < 0.5:
        for _ in range(r.randint(2, 4)):
            ts.line(" ".join(_sentence(r, 6)), x=_MARGIN + 36, dy=13,
                    size=10)
        ts.y -= 8
        ts.flow(_paragraph_words(r, 1))
        ts.y -= 8
    if r.random() < 0.35:
        y0 = ts.y
        for _i in range(1, r.randint(4, 7)):
            ts.line(" ".join(_sentence(r, 7)), x=_MARGIN + 30, dy=15)
        yb = ts.y
        parts = [ts.stream()]
        yy = y0 - 15
        i = 1
        while yy > yb:
            parts.append(f"BT /F1 9 Tf {_MARGIN - 18} "
                         f"{yy + 15 - 11:.1f} Td ({i}) Tj ET")
            yy -= 15
            i += 1
        stream = "\n".join(parts)
    else:
        stream = ts.stream()
    if r.random() < 0.3:
        extra = [f"BT /F3 10 Tf {_MARGIN} {150 - k * 13} Td "
                 f"({' '.join(_sentence(r, 6))}) Tj ET" for k in range(2)]
        stream += "\n" + "\n".join(extra)
    return _make_pdf([stream], {"F1": "Helvetica", "F2": "Helvetica-Bold",
                                "F3": "Times-Italic"})


@pytest.mark.parametrize("seed", [8, 15, 26, 44, 71])
def test_kitchen_sink2_parity(seed, tmp_path):
    _check(_sink2_pdf(random.Random(seed)), "pdf", tmp_path,
           f"sink2_{seed}")


def _sink3_pdf(r):
    """Round-3 kitchen-sink: ruled tables drawn as thin `re f` fills,
    dot-leader TOC pages, roman/alpha/paren enumerator lists.  Found
    three gaps: (1) roman-dot lists never split (listConfirmed local-run
    machinery, analyzeLayout.js:1802-1872, was unported); (2) markdown
    gated layout tables behind a flag where writeMarkdown.js:144-188
    renders them unconditionally; (3) vertical 0.5pt FILLED rects were
    not harvested as column rulings (detectPdfTables.js:1392 takes
    fills too)."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _make_pdf, _Typesetter)
    ROMAN = ["i", "ii", "iii", "iv", "v", "vi"]
    ALPHA = "abcdef"
    ts = _Typesetter()
    kind = r.choice(["table", "toc", "enum", "mix"])
    parts = []
    if kind == "toc":
        ts.line("CONTENTS", x=_PAGE_W / 2 - 30, size=14, font="F2", dy=22)
        ts.y -= 10
        for i in range(r.randint(4, 8)):
            title = " ".join(_sentence(r, r.randint(2, 4))[:-1]).title()
            page_no = str((i + 1) * r.randint(3, 9))
            tw = ts.text_width(title, "F1", 11)
            dots = "." * max(3, int((380 - tw) / 3))
            ts.line(f"{title} {dots} {page_no}", dy=16)
        ts.y -= 10
        ts.flow(_paragraph_words(r, 1))
    elif kind == "enum":
        ts.flow(_paragraph_words(r, 1))
        ts.y -= 8
        scheme = r.choice(["roman", "alpha", "decimal-dot", "paren"])
        for i in range(r.randint(3, 6)):
            mark = (f"{ROMAN[i]}." if scheme == "roman"
                    else f"({ALPHA[i]})" if scheme == "alpha"
                    else f"2.{i + 1}" if scheme == "decimal-dot"
                    else f"{i + 1})")
            ts.line(f"{mark} " + " ".join(_sentence(r, r.randint(4, 8))),
                    x=_MARGIN + (12 if scheme == "paren" else 0), dy=16)
        ts.y -= 8
        ts.flow(_paragraph_words(r, 1))
    elif kind == "table":
        ts.flow(_paragraph_words(r, 1))
        ts.y -= 12
        rows, cols = r.randint(3, 5), r.randint(2, 4)
        x0, y0 = _MARGIN, ts.y
        cw, rh = (_PAGE_W - 2 * _MARGIN - 60) / cols, 18
        for ri in range(rows + 1):
            parts.append(f"{x0} {y0 - ri * rh} {cols * cw:.1f} 0.5 re f")
        for ci in range(cols + 1):
            parts.append(f"{x0 + ci * cw:.1f} {y0 - rows * rh} 0.5 "
                         f"{rows * rh} re f")
        for ri in range(rows):
            for ci in range(cols):
                val = str(r.randint(1, 999)) if ri else f"Col{ci + 1}"
                parts.append(f"BT /F1 9 Tf {x0 + ci * cw + 4:.1f} "
                             f"{y0 - ri * rh - 13:.1f} Td ({val}) Tj ET")
        ts.y = y0 - rows * rh - 24
        ts.flow(_paragraph_words(r, 1))
    else:
        ts.flow(_paragraph_words(r, 2))
        ts.y -= 8
        ts.line("See note", dy=14, size=9)
        ts.y -= 6
        ts.flow(_paragraph_words(r, 1))
    stream = ts.stream() + ("\n" + "\n".join(parts) if parts else "")
    return _make_pdf([stream], {"F1": "Helvetica", "F2": "Helvetica-Bold"})


@pytest.mark.parametrize("seed", [6, 7, 10, 19, 29, 55])
def test_kitchen_sink3_parity(seed, tmp_path):
    pdf = _sink3_pdf(random.Random(seed))
    p = tmp_path / f"sink3_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink3_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink3_{seed} md"


def _sink4_pdf(r):
    """Round-4 kitchen-sink: Ts superscript runs, WinAnsi smart quotes/
    em-dashes, hyphenated wraps, two-column blocks, rotated margin
    stamps.  Found no divergence (0/180 seeds) — pinned as regression
    cover for the rotation/superscript/ligature paths."""
    from scribe_js_ray.sources.synth import _paragraph_words, _sentence
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _make_pdf, _Typesetter)

    def esc(s):
        return s.replace("\\", r"\\").replace("(", r"\(") \
            .replace(")", r"\)")

    ts = _Typesetter()
    parts = []
    ts.flow(_paragraph_words(r, 1))
    ts.y -= 8
    if r.random() < 0.5:
        y = ts.y
        parts.append(
            f"BT /F1 11 Tf {_MARGIN} {y} Td "
            f"({esc(' '.join(_sentence(r, 5))[:-1])}) Tj "
            f"{r.choice([3, 4, 5])} Ts /F1 7 Tf ({r.randint(1, 30)}) Tj "
            f"0 Ts /F1 11 Tf ( {esc(' '.join(_sentence(r, 4)))}) Tj ET")
        ts.y -= 16
    if r.random() < 0.4:
        ts.line("The \\223first\\224 figure\\227offset by fl and fi"
                " ligatures\\222 look.", dy=16)
    if r.random() < 0.5:
        w1 = " ".join(_sentence(r, 6))[:-1]
        ts.line(w1 + " estab-", dy=15)
        ts.line("lishment " + " ".join(_sentence(r, 4)), dy=15)
        ts.y -= 8
    if r.random() < 0.5:
        colw = (_PAGE_W - 2 * _MARGIN - 24) / 2
        y0 = ts.y
        ts.flow(_paragraph_words(r, 2), x=_MARGIN, width=colw)
        y_left = ts.y
        ts.y = y0
        ts.flow(_paragraph_words(r, 2), x=_MARGIN + colw + 24, width=colw)
        ts.y = min(ts.y, y_left) - 10
    if r.random() < 0.35:
        t = "FILED " + str(r.randint(1000, 9999))
        parts.append(f"BT /F1 8 Tf 0 1 -1 0 24 "
                     f"{300 + r.randint(-60, 60)} Tm ({esc(t)}) Tj ET")
    ts.flow(_paragraph_words(r, 1))
    stream = ts.stream() + ("\n" + "\n".join(parts) if parts else "")
    return _make_pdf([stream], {"F1": "Helvetica", "F2": "Helvetica-Bold"})


@pytest.mark.parametrize("seed", [1, 12, 33, 57])
def test_kitchen_sink4_parity(seed, tmp_path):
    pdf = _sink4_pdf(random.Random(seed))
    p = tmp_path / f"sink4_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink4_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink4_{seed} md"


def test_classify_role_promotion_paths_parity(tmp_path):
    """Positive-case pins for the classifyRole branches ported in r4:
    gapAbove display-singleton (:3016), marker-only enumerator re-judge
    (:2979-2992), colorDistinct demotion veto (:3044).  Text+markdown
    byte-parity vs the live reference."""
    from scribe_js_ray.sources.synth_pdf import _make_pdf

    body = (
        "BT /F1 11 Tf 72 600 Td (The committee reviewed all of the "
        "evidence and made findings) Tj ET\n"
        "BT /F1 11 Tf 72 586 Td (that are discussed at length in the "
        "following short sections.) Tj ET\n"
        "BT /F1 11 Tf 72 572 Td (Some more ordinary body prose "
        "continues here for ballast now) Tj ET\n"
        "BT /F1 11 Tf 72 558 Td (and again continues with more plain "
        "text for the page body.) Tj ET\n"
        "BT /F1 11 Tf 72 544 Td (Still more prose in the body color "
        "and face to dominate chars) Tj ET\n"
        "BT /F1 11 Tf 72 530 Td (so that the distinct styles below are "
        "judged against it all.) Tj ET\n")
    cases = {
        "gapabove": (
            "BT /F1 14 Tf 72 700 Td (A Full Width Display Title Line "
            "That Spans Nearly The Whole Column Width Here) Tj ET\n"
            + body),
        "colorhead": (
            body
            + "BT /F1 11 Tf 1 0 0 rg 72 500 Td (SECTION HEADING IN RED "
            "CAPS) Tj 0 0 0 rg ET\n"
            "BT /F1 11 Tf 72 486 Td (following body paragraph resumes "
            "in black prose right after) Tj ET\n"),
    }
    for name, stream in cases.items():
        pdf = _make_pdf([stream], {"F1": "Helvetica"})
        p = tmp_path / f"{name}.pdf"
        p.write_bytes(pdf)
        assert extract_document("u", pdf, "", "eng")["extracted_text"] \
            == _ref_extract(str(p)), f"{name} text"
        assert extract_document(
            "u", pdf, "", "eng",
            emit_format="markdown")["extracted_text"] \
            == _ref_fmt(str(p), "md"), f"{name} md"


def _sink5_pdf(r):
    """Round-5 sink: multi-page cross-boundary paragraph continuation,
    drop caps, stroked footnote separator rules, word-level Td
    positioning, right-aligned blocks, centered verse.  Drove the
    integer bbox-rounding + 800/-200 ascent port in pdf/assemble.py."""
    from scribe_js_ray.sources.synth import (_paragraph_words,
                                             _sentence)
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _PAGE_H, _make_pdf,
                                                 _Typesetter)

    def esc(s):
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def _gen(r):
        pages = []
        extra1, extra2 = [], []
        two_page = r.random() < 0.55

        ts = _Typesetter()
        # optional running header + folio
        if r.random() < 0.35:
            ts.line("ANNUAL REVIEW OF FINDINGS", x=_MARGIN, size=8, dy=12)
            ts.y -= 10
        # drop cap paragraph: big initial glyph + indented smaller lines
        if r.random() < 0.4:
            y0 = ts.y
            extra1.append(f"BT /F1 33 Tf {_MARGIN} {y0 - 33:.1f} Td (T) Tj ET")
            ts.line("he opening paragraph begins with an enlarged",
                    x=_MARGIN + 26, dy=15)
            ts.line("initial letter set over two full lines of the",
                    x=_MARGIN + 26, dy=14)
            ts.line("running text which then resumes the normal measure here.",
                    dy=14)
            ts.y -= 8
        # right-aligned block (date / address)
        if r.random() < 0.4:
            for t in (f"March {r.randint(1, 28)}, 19{r.randint(10, 99)}",
                      "Office of the Registrar"):
                w = ts.text_width(t, "F1", 11)
                ts.line(t, x=_PAGE_W - _MARGIN - w, dy=15)
            ts.y -= 8
        # body paragraphs
        for _ in range(r.randint(1, 2)):
            ts.flow(_paragraph_words(r, 2))
            ts.y -= 8
        # centered verse block
        if r.random() < 0.35:
            for _ in range(r.randint(2, 4)):
                t = " ".join(_sentence(r, r.randint(3, 5)))[:-1]
                w = ts.text_width(t, "F1", 11)
                ts.line(t, x=(_PAGE_W - w) / 2, dy=15)
            ts.y -= 8
        # word-level Td positioning: each word its own BT block on one row
        if r.random() < 0.5:
            words = _sentence(r, r.randint(5, 8))
            y = ts.y - 15
            x = _MARGIN
            sp = ts.text_width(" ", "F1", 11)
            for wd in words:
                extra1.append(f"BT /F1 11 Tf {x:.2f} {y:.2f} Td"
                              f" ({esc(wd)}) Tj ET")
                x += ts.text_width(wd, "F1", 11) + sp
            ts.y = y - 8
        # cross-page paragraph: long paragraph, split across the page break
        carry = None
        if two_page:
            words = _paragraph_words(r, 4)
            # typeset fully to count lines, then re-typeset the split
            probe = _Typesetter()
            probe.flow(words)
            n_lines = len(probe.ops)
            if n_lines >= 4:
                split = r.randint(2, n_lines - 2)
                sub = _Typesetter()
                sub.y = ts.y
                sub.flow(words)
                ts.ops.extend(sub.ops[:split])
                carry = sub.ops[split:]
        # footnote block with stroked separator rule
        if r.random() < 0.5:
            yr = 130
            extra1.append(f"{_MARGIN} {yr} m {_MARGIN + 150} {yr} l"
                          f" 0.6 w S")
            f = _Typesetter()
            f.y = yr - 2
            f.line(f"{r.randint(1, 9)} " + " ".join(_sentence(r, 8)),
                   size=8, dy=11)
            f.line(" ".join(_sentence(r, 6)), size=8, dy=11)
            extra1.append(f.stream())
        pages.append(ts.stream() + "\n" + "\n".join(extra1))

        if two_page:
            t2 = _Typesetter()
            if r.random() < 0.5:
                t2.line(f"{2}", x=_PAGE_W / 2 - 4, size=9, dy=14)
                t2.y -= 10
            if carry:
                # re-anchor the carried lines to the top of page 2
                top = t2.y
                for i, op in enumerate(carry):
                    # ops carry absolute y; rewrite y to flow from top
                    parts = op.split()
                    yi = float(parts[5])
                    if i == 0:
                        dy0 = top - 14 - yi
                    parts[5] = f"{yi + dy0:.2f}"
                    t2.ops.append(" ".join(parts))
                t2.y = float(t2.ops[-1].split()[5]) if t2.ops else top
                t2.y -= 10
            for _ in range(r.randint(1, 2)):
                t2.flow(_paragraph_words(r, 2))
                t2.y -= 8
            pages.append(t2.stream() + "\n" + "\n".join(extra2))

        return _make_pdf(pages, {"F1": "Helvetica", "F2": "Helvetica-Bold",
                                 "F3": "Times-Roman"})

    return _gen(r)


def _sink6_pdf(r):
    """Round-6 sink: evidence-gated footnotes — in-text superscript
    references, glued symbol markers, FN markers, bare-integer note
    chains, separator rules, note-profile envelopes, block-quote
    inset regions.  Seed 1 drove the per-page pageStyleChars heading
    signature fix; seed 71 drove the note-continuation absorption
    pass (analyzeLayout.js:1636-1719)."""
    from scribe_js_ray.sources.synth import (_paragraph_words,
                                             _sentence)
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _PAGE_H, _make_pdf,
                                                 _Typesetter)

    def esc(s):
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def body_with_ref(ts, r, words, marker, symbol=False, glued=False):
        """Flow a paragraph; attach the note reference to a mid-paragraph
        word — superscript raised digit, or a glued symbol in the text run."""
        if glued:
            k = r.randrange(max(1, len(words) - 2))
            words = list(words)
            words[k] += marker
            ts.flow(words)
            return
        # superscript: typeset the flow, then a raised small glyph after a
        # word on the FIRST line
        pre = len(ts.ops)
        ts.flow(words)
        first_op = ts.ops[pre]
        # parse x,y and text of that line
        parts = first_op.split()
        size = float(parts[2])
        x0, y0 = float(parts[4]), float(parts[5])
        txt = first_op[first_op.index("(") + 1:first_op.rindex(")")]
        # place the sup after the 2nd word
        ws = txt.split(" ")
        cut = " ".join(ws[:min(2, len(ws))])
        xs = x0 + ts.text_width(cut, "F1", size)
        ss = round(size * 0.6, 1)
        ts.ops.append(f"BT /F1 {ss} Tf {xs:.2f} {y0 + size * 0.35:.2f} Td"
                      f" ({esc(marker)}) Tj ET")

    def _gen(r):
        ts = _Typesetter()
        extra = []
        mode = r.choice(["sup", "glued", "baseline", "fn", "none", "mixed"])
        n_notes = r.randint(1, 3)
        sym = "*"  # latin-1 PDF streams: daggers need a WinAnsi mapping
        bold_notes = r.random() < 0.3

        # optional running header
        if r.random() < 0.3:
            ts.line("QUARTERLY REVIEW", x=_MARGIN, size=8, dy=12)
            ts.y -= 8

        # optional heading
        if r.random() < 0.5:
            t = " ".join(w.capitalize() for w in _sentence(r, 3))[:-1]
            ts.line(t, size=15, font="F2", dy=24)
            ts.y -= 6

        # body paragraphs, some carrying the references
        refs_placed = 0
        for i in range(r.randint(2, 3)):
            words = _paragraph_words(r, 2)
            if refs_placed < n_notes and mode != "none":
                m = mode if mode != "mixed" else r.choice(["sup", "glued",
                                                           "baseline"])
                if m == "sup" or m == "fn" or m == "baseline":
                    # baseline-number notes still need an in-text sup ref to
                    # anchor the scheme / usesBaselineMarker
                    body_with_ref(ts, r, words, str(refs_placed + 1))
                else:
                    body_with_ref(ts, r, words, sym, glued=True)
                refs_placed += 1
            else:
                ts.flow(words)
            ts.y -= 8

        # optional block-quote inset region
        if r.random() < 0.4:
            inset = r.uniform(30, 55)
            qw = _PAGE_W - 2 * _MARGIN - 2 * inset
            ts.flow(_sentence(r, r.randint(22, 32)), x=_MARGIN + inset,
                    width=qw, indent=0.0)
            ts.y -= 8
            ts.flow(_paragraph_words(r, 1))
            ts.y -= 8

        # footnote block at the bottom
        if mode != "none":
            y_rule = r.choice([150, 170, 190])
            if r.random() < 0.75:
                if r.random() < 0.5:
                    extra.append(f"{_MARGIN} {y_rule} m "
                                 f"{_MARGIN + r.randint(90, 160)} {y_rule} l "
                                 f"0.6 w S")
                else:
                    extra.append(f"{_MARGIN} {y_rule - 0.4} "
                                 f"{r.randint(90, 160)} 0.8 re f")
            f = _Typesetter()
            f.y = y_rule - 2
            nf = "F2" if bold_notes else "F1"
            for k in range(n_notes):
                note = " ".join(_sentence(r, r.randint(6, 10)))
                if mode == "glued" or (mode == "mixed" and k == 0
                                       and r.random() < 0.5):
                    f.line(f"{sym}{note}", size=8.5, dy=11, font=nf)
                elif mode == "fn":
                    f.line(f"FN{k + 1}. {note}", size=8.5, dy=11, font=nf)
                elif mode == "baseline":
                    f.line(f"{k + 1} {note}", size=8.5, dy=11, font=nf)
                else:  # sup marker opener
                    f.y -= 11
                    f.ops.append(f"BT /{nf} 5.5 Tf {_MARGIN} {f.y + 3:.2f} Td"
                                 f" ({k + 1}) Tj ET")
                    f.ops.append(f"BT /{nf} 8.5 Tf {_MARGIN + 6} {f.y:.2f} Td"
                                 f" ({esc(note)}) Tj ET")
                # wrapped continuation line sometimes
                if r.random() < 0.5:
                    f.line(" ".join(_sentence(r, 5)), size=8.5, dy=11, font=nf)
            extra.append(f.stream())

        # folio
        if r.random() < 0.4:
            ts_f = f"BT /F1 9 Tf {_PAGE_W / 2 - 3:.1f} 60 Td (1) Tj ET"
            extra.append(ts_f)

        return _make_pdf([ts.stream() + "\n" + "\n".join(extra)],
                         {"F1": "Helvetica", "F2": "Helvetica-Bold",
                          "F3": "Times-Roman"})

    return _gen(r)


@pytest.mark.parametrize("seed", [3, 17, 28, 41])
def test_kitchen_sink5_parity(seed, tmp_path):
    pdf = _sink5_pdf(random.Random(seed))
    p = tmp_path / f"sink5_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink5_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink5_{seed} md"


@pytest.mark.parametrize("seed", [1, 7, 44, 71])
def test_kitchen_sink6_parity(seed, tmp_path):
    pdf = _sink6_pdf(random.Random(seed))
    p = tmp_path / f"sink6_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink6_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink6_{seed} md"


def _sink7_pdf(r):
    """Round-7 sink: cross-page footnote continuations — an open note on
    page 1 continuing below page 2's separator (footnoteContinues,
    analyzeLayout.js:989-1084), with terminated / marker-opened
    negative variants.  Seed 16 drove the updateLineBbox port (line
    bbox re-union INCLUDING sup words, parsePdfDoc.js:3249); seed 33
    drove the peak-based bodyLeft / q0.9 bodyRight colWidth fix in
    classify_roles."""
    from scribe_js_ray.sources.synth import (_paragraph_words,
                                             _sentence)
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _PAGE_H, _make_pdf,
                                                 _Typesetter)

    def esc(s):
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def sup_ref_line(ts, r, words, marker):
        pre = len(ts.ops)
        ts.flow(words)
        op = ts.ops[pre]
        parts = op.split()
        size = float(parts[2])
        x0, y0 = float(parts[4]), float(parts[5])
        txt = op[op.index("(") + 1:op.rindex(")")]
        ws = txt.split(" ")
        cut = " ".join(ws[:min(2, len(ws))])
        xs = x0 + ts.text_width(cut, "F1", size)
        ts.ops.append(f"BT /F1 {round(size * 0.6, 1)} Tf {xs:.2f} "
                      f"{y0 + size * 0.35:.2f} Td ({esc(marker)}) Tj ET")

    def note_open(f, marker, text, bold=False, sup_marker=True):
        nf = "F2" if bold else "F1"
        f.y -= 11
        if sup_marker:
            f.ops.append(f"BT /{nf} 5.5 Tf {_MARGIN} {f.y + 3:.2f} Td"
                         f" ({marker}) Tj ET")
            f.ops.append(f"BT /{nf} 8.5 Tf {_MARGIN + 6} {f.y:.2f} Td"
                         f" ({esc(text)}) Tj ET")
        else:
            f.ops.append(f"BT /{nf} 8.5 Tf {_MARGIN} {f.y:.2f} Td"
                         f" ({marker} {esc(text)}) Tj ET")

    def _gen(r):
        continues = r.random() < 0.6
        terminated = r.random() < 0.35      # note ends punctuated: no open note
        second_is_marker = r.random() < 0.3  # p2 zone opens with its own marker
        n_notes = r.randint(1, 2)

        # --- page 1
        ts = _Typesetter()
        for k in range(n_notes):
            words = _paragraph_words(r, 2)
            sup_ref_line(ts, r, words, str(k + 1))
            ts.y -= 8

        yr = 200
        extra = [f"{_MARGIN} {yr} m {_MARGIN + 140} {yr} l 0.6 w S"]
        f = _Typesetter()
        f.y = yr - 2
        for k in range(n_notes):
            note_open(f, str(k + 1), " ".join(_sentence(r, 7)))
        # the open note: fill to the page bottom, last line unterminated
        # unless the 'terminated' variant
        n_fill = r.randint(8, 11)
        for i in range(n_fill):
            t = " ".join(_sentence(r, 7))
            if i == n_fill - 1 and not terminated:
                t = t.rstrip(".")
            f.line(t, size=8.5, dy=11)
            if f.y < 60:
                break
        extra.append(f.stream())
        p1 = ts.stream() + "\n" + "\n".join(extra)

        # --- page 2
        t2 = _Typesetter()
        for _ in range(r.randint(1, 2)):
            t2.flow(_paragraph_words(r, 2))
            t2.y -= 8
        p2_extra = []
        if continues:
            yr2 = r.choice([170, 200, 420])
            p2_extra.append(f"{_MARGIN} {yr2} m {_MARGIN + 140} {yr2} l"
                            f" 0.6 w S")
            g = _Typesetter()
            g.y = yr2 - 2
            if second_is_marker:
                note_open(g, str(n_notes + 1), " ".join(_sentence(r, 7)))
                # needs an anchoring in-text ref for the new marker: absent
                # on purpose half the time (tests the sequence gate)
            else:
                g.line(" ".join(_sentence(r, 7)), size=8.5, dy=11)
            # fill to the bottom so the zone is bottom-anchored
            while g.y > 80:
                g.line(" ".join(_sentence(r, 6)), size=8.5, dy=11)
            p2_extra.append(g.stream())
        p2 = t2.stream() + ("\n" + "\n".join(p2_extra) if p2_extra else "")

        return _make_pdf([p1, p2], {"F1": "Helvetica", "F2": "Helvetica-Bold",
                                    "F3": "Times-Roman"})

    return _gen(r)


@pytest.mark.parametrize("seed", [5, 16, 33, 48])
def test_kitchen_sink7_parity(seed, tmp_path):
    pdf = _sink7_pdf(random.Random(seed))
    p = tmp_path / f"sink7_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink7_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink7_{seed} md"


def test_citation_link_continuation_parity(tmp_path):
    """The /Link URI stamping (parsePdfDoc.js:1055-1063) +
    decideBreak's citation-lead continuation veto (:2680-2685): a
    hyperlinked citation line at citation-pad pitch (1.4x leading)
    groups identically to the live reference with and without the
    annotation."""
    from scribe_js_ray.sources.synth_pdf import (PdfWriter, _PAGE_W,
                                                 _PAGE_H, _esc)

    def build(with_link):
        w = PdfWriter()
        w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
        w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        annots = " /Annots [6 0 R]" if with_link else ""
        w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
               f"{_PAGE_H}] /Resources << /Font << /F1 5 0 R >> >> "
               f"/Contents 4 0 R{annots} >>").encode())
        lines = []
        y = 700
        for t in [
            "The court considered the matter at length during the term",
            "and issued a ruling that covered all of the claims presented",
            "by the parties during the hearing on the merits of this case",
            "as reported in Smith v. Jones, 123 F.3d 456, 9th Circuit",
        ]:
            lines.append((y, t))
            y -= 15
        y -= 6  # citation pad: pitch 21 (1.4x the 15pt leading)
        cite_y = y
        lines.append((y, "2001, and later proceedings in the docket."))
        y -= 15
        y -= 11  # real paragraph gap: pitch 26
        for t in [
            "A new paragraph follows the citation and continues with the",
            "ordinary body text of the opinion for several further lines",
            "so the gap model sees the usual pitch of the document here.",
        ]:
            lines.append((y, t))
            y -= 15
        y -= 11
        for t in [
            "Still another paragraph closes out the page with ordinary",
            "body prose to anchor the spacing model of this document.",
        ]:
            lines.append((y, t))
            y -= 15
        content = " ".join(
            f"BT /F1 11 Tf 72 {yy} Td ({_esc(t)}) Tj ET"
            for yy, t in lines).encode()
        w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
              + content + b"\nendstream")
        w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
              b"/Encoding /WinAnsiEncoding >>")
        if with_link:
            w.add((f"<< /Type /Annot /Subtype /Link /Rect [72 {cite_y - 3} "
                   f"380 {cite_y + 12}] "
                   f"/A << /S /URI /URI (https://law.test/smith) >> >>"
                   ).encode())
        return w.build()

    from scribe_js_ray.stages.pdf import parse_pdf_document
    for with_link in (True, False):
        pdf = build(with_link)
        p = tmp_path / f"cite_{with_link}.pdf"
        p.write_bytes(pdf)
        assert extract_document("u", pdf, "", "eng")["extracted_text"] \
            == _ref_extract(str(p)), f"cite link={with_link}"
    # the stamping itself: words under the /Link carry the URI
    pages, _ = parse_pdf_document(build(True))
    assert any(w.style.link == "https://law.test/smith"
               for ln in pages[0].lines for w in ln.words)


def _sink8_pdf(r):
    """Round-8 sink: endnote sections vs footnote blocks — dominated
    page runs (endnotes), isolated dominated pages (footnoteBlock),
    unreferenced self-referential runs (stay body), and run
    extension via value contiguity (analyzeLayout.js:1272-1348).
    0/180 seeds diverged — pinned as regression cover."""
    from scribe_js_ray.sources.synth import (_paragraph_words,
                                             _sentence)
    from scribe_js_ray.sources.synth_pdf import (_MARGIN, _PAGE_W,
                                                 _PAGE_H, _make_pdf,
                                                 _Typesetter)

    def esc(s):
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    def sup_ref_line(ts, r, words, marker):
        pre = len(ts.ops)
        ts.flow(words)
        op = ts.ops[pre]
        parts = op.split()
        size = float(parts[2])
        x0, y0 = float(parts[4]), float(parts[5])
        txt = op[op.index("(") + 1:op.rindex(")")]
        ws = txt.split(" ")
        cut = " ".join(ws[:min(2, len(ws))])
        xs = x0 + ts.text_width(cut, "F1", size)
        ts.ops.append(f"BT /F1 {round(size * 0.6, 1)} Tf {xs:.2f} "
                      f"{y0 + size * 0.35:.2f} Td ({esc(marker)}) Tj ET")

    def note_entry(f, r, marker, wrap=True, bold_head=False):
        """One sup-marker note entry, optionally wrapped."""
        f.y -= 13
        f.ops.append(f"BT /F1 6 Tf {_MARGIN} {f.y + 3.5:.2f} Td"
                     f" ({marker}) Tj ET")
        f.ops.append(f"BT /F1 9.5 Tf {_MARGIN + 8} {f.y:.2f} Td"
                     f" ({esc(' '.join(_sentence(r, r.randint(6, 10))))}) Tj ET")
        if wrap and r.random() < 0.5:
            f.line(" ".join(_sentence(r, r.randint(4, 8))), size=9.5, dy=12)

    def _gen(r):
        kind = r.choice(["endnotes", "fnblock", "unreferenced", "extension"])
        n_refs = r.randint(4, 8)

        # page 1: body with in-text sup references 1..n
        ts = _Typesetter()
        if r.random() < 0.4:
            t = " ".join(w.capitalize() for w in _sentence(r, 3))[:-1]
            ts.line(t, size=15, font="F2", dy=24)
            ts.y -= 6
        placed = 0
        while placed < n_refs:
            words = _paragraph_words(r, 1)
            if kind != "unreferenced":
                sup_ref_line(ts, r, words, str(placed + 1))
            else:
                ts.flow(words)
            placed += 1
            ts.y -= 6
        pages = [ts.stream()]

        # note pages
        if kind == "endnotes":
            # 2 dominated pages: entries 1..k, k+1..n
            half = n_refs // 2
            for rng in (range(1, half + 1), range(half + 1, n_refs + 1)):
                f = _Typesetter()
                if r.random() < 0.5:
                    f.line("NOTES", size=11, font="F2", dy=20)
                    f.y -= 4
                for k in rng:
                    note_entry(f, r, str(k))
                pages.append(f.stream())
        elif kind == "extension":
            # page 2: report tail + opening entries (non-dominated),
            # pages 3-5: dominated run continuing the values
            f = _Typesetter()
            for _ in range(3):
                f.flow(_paragraph_words(r, 2))
                f.y -= 8
            note_entry(f, r, "1")
            note_entry(f, r, "2")
            pages.append(f.stream())
            vals = iter(range(3, n_refs + 1))
            for _ in range(3):
                g = _Typesetter()
                took = False
                for k in vals:
                    note_entry(g, r, str(k))
                    took = True
                    if r.random() < 0.4:
                        break
                if not took:
                    break
                pages.append(g.stream())
        else:
            # one dominated page (fnblock / unreferenced)
            f = _Typesetter()
            for k in range(1, n_refs + 1):
                note_entry(f, r, str(k))
            pages.append(f.stream())

        return _make_pdf(pages, {"F1": "Helvetica", "F2": "Helvetica-Bold",
                                 "F3": "Times-Roman"})

    return _gen(r)


@pytest.mark.parametrize("seed", [2, 11, 25, 52])
def test_kitchen_sink8_parity(seed, tmp_path):
    pdf = _sink8_pdf(random.Random(seed))
    p = tmp_path / f"sink8_{seed}.pdf"
    p.write_bytes(pdf)
    assert extract_document("u", pdf, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink8_{seed} text"
    assert extract_document("u", pdf, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink8_{seed} md"


def test_ocr_type_reflow_routing_parity(tmp_path):
    """An 'ocr'-type PDF (invisible Tr-3 layer over an image) keeps its
    per-page reflow paragraphs — the reference runs
    applyDocParagraphLayout for NATIVE text only
    (extractPDFText.js:100-110: "analyzeLayout is not yet validated on
    OCR text").  A scanned line-numbered transcript page pins the
    routing: with the doc-level pass, the margin-number column would
    classify and regroup; without it each row stays its own reflow
    paragraph, byte-identical to the reference."""
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    img = ("q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
           + "\x00\x00\x00\x00" + " EI Q\n")
    rows = []
    y = 720
    for i in range(1, 23):
        rows.append(f"BT 3 Tr /F1 7 Tf 40 {y + 2} Td ({i}) Tj ET")
        rows.append(f"BT 3 Tr /F1 11 Tf 90 {y} Td "
                    f"(Q. And what did you observe at the scene "
                    f"number {i}) Tj ET")
        y -= 28
    rows.append("BT 3 Tr /F1 8 Tf 90 60 Td (CERTIFIED SHORTHAND "
                "REPORTER TRANSCRIPT PAGE) Tj ET")
    pdf = _make_pdf([img + "\n".join(rows)], {"F1": "Helvetica"})
    p = tmp_path / "transcript_ocr.pdf"
    p.write_bytes(pdf)
    res = extract_document("u", pdf, "", "eng")
    assert res["doc_type"] == "ocr"
    assert res["extracted_text"] == _ref_extract(str(p))


def _sink10_doc(r):
    """Round-10 sink: per-page reflow (reflowPars) via randomized hOCR
    — mixed sizes, indents, gaps, centered verse, sup-led small
    print, multi-page.  hOCR imports never run analyzeLayout, so
    this isolates assign_paragraphs parity.  0/200 seeds diverged."""
    from scribe_js_ray.sources.synth import (HocrBuilder, _MARGIN,
                                             _flow_paragraph,
                                             _paragraph_words,
                                             _sentence)

    def _gen(r):
        b = HocrBuilder()
        for _ in range(r.randint(1, 2)):
            b.new_page()
            # optional centered heading at a random display size
            if r.random() < 0.5:
                t = [w.capitalize() for w in _sentence(r, r.randint(2, 4))[:-1]]
                b.line(t or ["Heading"], size=r.choice([48, 64, 80]),
                       x_height=40, align="center")
                b.skip(r.randint(10, 80))
            for _ in range(r.randint(2, 5)):
                kind = r.random()
                if kind < 0.45:
                    # flowed paragraph with first-line indent
                    _flow_paragraph(b, _paragraph_words(r, r.randint(1, 3)),
                                    indent=r.choice([0, 60, 90]))
                elif kind < 0.6:
                    # indented block (quote-ish)
                    inset = r.randint(80, 160)
                    for _ in range(r.randint(2, 4)):
                        b.line(_sentence(r, r.randint(4, 7)),
                               left=_MARGIN + inset)
                elif kind < 0.75:
                    # centered lines (verse)
                    for _ in range(r.randint(2, 3)):
                        b.line(_sentence(r, r.randint(3, 5)), align="center")
                elif kind < 0.9:
                    # small-print block (notes)
                    for _ in range(r.randint(1, 3)):
                        b.line(_sentence(r, r.randint(5, 9)), size=30,
                               x_height=22,
                               sup_first=(r.random() < 0.4))
                else:
                    # ragged short lines at body size
                    for _ in range(r.randint(2, 4)):
                        b.line(_sentence(r, r.randint(2, 4)))
                b.skip(r.choice([0, 8, 30, 60, 110]))
        return b.build().encode()
    return _gen(r)


@pytest.mark.parametrize("seed", [4, 19, 47, 83])
def test_kitchen_sink10_parity(seed, tmp_path):
    data = _sink10_doc(random.Random(seed))
    p = tmp_path / f"sink10_{seed}.hocr"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink10_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink10_{seed} md"


def _sink11_doc(r):
    """Round-11 sink: raw randomized ALTO — TextBlock STYLEREFS
    fallbacks, String STYLE flags, WC confidences, descender/
    ascender baseline + xHeight estimation, skipped elements with
    missing positional attrs, multi-page.  0/160 seeds diverged."""
    from scribe_js_ray.sources.synth import (HocrBuilder, _MARGIN,
                                             _flow_paragraph,
                                             _paragraph_words,
                                             _sentence)
    W, H = 2480, 3508
    CHAR_W = 22

    def word_box(x, y, text, size=40, desc=False):
        wdt = len(text) * CHAR_W * size // 40
        hgt = size + (10 if desc else 0)
        return x, y, wdt, hgt

    def _gen(r):
        styles = []
        style_ids = []
        for i, fam in enumerate(["Times New Roman", "Arial", "Courier New"]):
            sid = f"font{i}"
            style_ids.append(sid)
            styles.append(f'<TextStyle ID="{sid}" FONTFAMILY="{fam}" '
                          f'FONTSIZE="{r.choice([9, 10, 11, 12])}"/>')
        pages = []
        for pi in range(r.randint(1, 2)):
            blocks = []
            y = 300
            for _ in range(r.randint(2, 4)):
                block_style = (f' STYLEREFS="{r.choice(style_ids)}"'
                               if r.random() < 0.5 else "")
                tlines = []
                for _ in range(r.randint(1, 5)):
                    words = _sentence(r, r.randint(3, 9))
                    size = r.choice([36, 40, 40, 40, 64])
                    x = 300 + r.choice([0, 0, 0, 120])
                    strs = []
                    x0 = x
                    for wi, wd in enumerate(words):
                        desc = any(c in "gjpqy" for c in wd)
                        _, _, wdt, hgt = word_box(x, y, wd, size, desc)
                        attrs = (f'CONTENT="{wd}" HPOS="{x}" VPOS="{y}" '
                                 f'WIDTH="{wdt}" HEIGHT="{hgt}"')
                        if r.random() < 0.4:
                            attrs += f' WC="{r.uniform(0.3, 0.99):.2f}"'
                        if r.random() < 0.15:
                            st = r.choice(["bold", "italics", "bold italics",
                                           "superscript", "smallcaps"])
                            attrs += f' STYLE="{st}"'
                        if r.random() < 0.2:
                            attrs += f' STYLEREFS="{r.choice(style_ids)}"'
                        if r.random() < 0.04:
                            # missing positional attr: element skipped
                            attrs = attrs.replace(f'VPOS="{y}" ', "")
                        strs.append(f"<String {attrs}/>")
                        x += wdt + CHAR_W
                    lw = x - CHAR_W - x0
                    tline = (f'<TextLine HPOS="{x0}" VPOS="{y}" '
                             f'WIDTH="{lw}" HEIGHT="{size + 12}">'
                             + "".join(strs) + "</TextLine>")
                    if r.random() < 0.03:
                        tline = tline.replace(f'VPOS="{y}" ', "", 1)
                    tlines.append(tline)
                    y += r.choice([52, 52, 52, 90])
                blocks.append(f"<TextBlock{block_style}>"
                              + "".join(tlines) + "</TextBlock>")
                y += r.choice([0, 60, 140])
            pages.append(f'<Page WIDTH="{W}" HEIGHT="{H}" PHYSICAL_IMG_NR='
                         f'"{pi + 1}"><PrintSpace>'
                         + "".join(blocks) + "</PrintSpace></Page>")
        return ('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">'
                "<Styles>" + "".join(styles) + "</Styles>"
                "<Layout>" + "".join(pages) + "</Layout></alto>").encode()
    return _gen(r)


@pytest.mark.parametrize("seed", [1, 23, 58, 71])
def test_kitchen_sink11_parity(seed, tmp_path):
    data = _sink11_doc(random.Random(seed))
    p = tmp_path / f"sink11_{seed}.xml"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink11_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink11_{seed} md"


def _sink12_docx(r):
    """Round-12 sink: raw randomized DOCX — run styles (b/i/smallCaps/
    u/vertAlign), Heading/Title/TOC/Quote paragraph styles,
    footnote references (repeats + unknown ids), mid-word run
    splits (the stylesMatch merge + intra-word styleRuns in md),
    xml escapes.  Seeds 0-14 drove the rich parse_docx port
    (footnote markers/bodies, styled typesetting, word styleRuns)."""
    import io
    import zipfile

    from scribe_js_ray.sources.synth import _sentence

    W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    CT = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
     '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
     '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
     '<Default Extension="xml" ContentType="application/xml"/>'
     '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
     '</Types>')
    RELS = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
     '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
     '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>')

    def esc(s):
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def run_xml(text, r, allow_sup=True):
        props = []
        if r.random() < 0.18:
            props.append(r.choice(['<w:b/>', '<w:b w:val="true"/>',
                                   '<w:b w:val="1"/>']))
        if r.random() < 0.12:
            props.append('<w:i/>')
        if r.random() < 0.06:
            props.append('<w:smallCaps/>')
        if r.random() < 0.06:
            props.append(r.choice(['<w:u w:val="single"/>',
                                   '<w:u w:val="none"/>']))
        if allow_sup and r.random() < 0.06:
            props.append('<w:vertAlign w:val="superscript"/>')
        rpr = f"<w:rPr>{''.join(props)}</w:rPr>" if props else ""
        return (f'<w:r>{rpr}<w:t xml:space="preserve">{esc(text)}</w:t>'
                f'</w:r>')

    def _gen(r):
        n_footnotes = r.randint(0, 3)
        fn_ids = [str(i + 2) for i in range(n_footnotes)]
        pars = []
        used_refs = []
        for _ in range(r.randint(3, 8)):
            kind = r.random()
            ppr = ""
            if kind < 0.15:
                ppr = ('<w:pPr><w:pStyle w:val="%s"/></w:pPr>'
                       % r.choice(["Heading1", "Heading2", "Title", "TOC1",
                                   "Quote", "IntenseQuote", "Normal"]))
            text = " ".join(_sentence(r, r.randint(4, 14)))
            # split the paragraph text into 1-4 runs, sometimes mid-word
            runs = []
            pieces = [text]
            for _ in range(r.randint(0, 3)):
                k = r.randrange(len(pieces))
                s = pieces[k]
                if len(s) < 4:
                    continue
                cut = r.randrange(1, len(s))
                pieces[k:k + 1] = [s[:cut], s[cut:]]
            for p_ in pieces:
                runs.append(run_xml(p_, r))
            # sprinkle a footnote reference
            if fn_ids and r.random() < 0.5:
                fid = r.choice(fn_ids + (["99"] if r.random() < 0.2 else []))
                if fid != "99":
                    used_refs.append(fid)
                at = r.randrange(len(runs) + 1)
                runs.insert(at, '<w:r><w:rPr><w:vertAlign w:val='
                                '"superscript"/></w:rPr>'
                                f'<w:footnoteReference w:id="{fid}"/></w:r>')
            pars.append(f"<w:p>{ppr}{''.join(runs)}</w:p>")
        body = "".join(pars)
        doc = (f'<?xml version="1.0"?><w:document {W}><w:body>{body}'
               f'</w:body></w:document>')

        files = {"[Content_Types].xml": CT, "_rels/.rels": RELS,
                 "word/document.xml": doc}
        if n_footnotes:
            fns = ['<w:footnote w:id="-1"><w:p><w:r><w:separator/></w:r>'
                   '</w:p></w:footnote>',
                   '<w:footnote w:id="0"><w:p><w:r><w:continuationSeparator/>'
                   '</w:r></w:p></w:footnote>']
            for fid in fn_ids:
                body_runs = ('<w:r><w:rPr><w:vertAlign w:val="superscript"/>'
                             '</w:rPr><w:footnoteRef/></w:r>')
                for _ in range(r.randint(1, 2)):
                    body_runs += run_xml(" ".join(_sentence(r, r.randint(4, 9))),
                                         r, allow_sup=False)
                fns.append(f'<w:footnote w:id="{fid}"><w:p>{body_runs}'
                           f'</w:p></w:footnote>')
            files["word/footnotes.xml"] = (f'<?xml version="1.0"?>'
                                           f'<w:footnotes {W}>'
                                           + "".join(fns) + "</w:footnotes>")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for name, content in files.items():
                z.writestr(name, content)
        return buf.getvalue()

    return _gen(r)


@pytest.mark.parametrize("seed", [0, 3, 4, 27])
def test_kitchen_sink12_parity(seed, tmp_path):
    data = _sink12_docx(random.Random(seed))
    p = tmp_path / f"sink12_{seed}.docx"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink12_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink12_{seed} md"


def _sink13_stext(r):
    """Round-13 sink: raw randomized stext — mid-line font changes
    (word splits on formatting), size changes through the running-
    size model, trailing raised reduced-size markers, multi-block
    multi-page.  0/160 seeds diverged — pinned as regression cover."""
    from scribe_js_ray.sources.synth import _sentence

    FONTS = ["Times-Roman", "Helvetica", "Courier",
             "TimesNewRoman-Bold", "Arial-ItalicMT"]

    def char_xml(ch, x, y, size):
        # quad: x0 y0 x1 y1 x2 y2 x3 y3 (top-left, top-right, bot-left, bot-right)
        w = size * 0.55
        asc, desc = size * 0.8, size * 0.25
        return (f'<char quad="{x:.1f} {y - asc:.1f} {x + w:.1f} {y - asc:.1f} '
                f'{x:.1f} {y + desc:.1f} {x + w:.1f} {y + desc:.1f}" '
                f'x="{x:.1f}" y="{y:.1f}" c="{ch}"/>'), w

    def _gen(r):
        pages = []
        for _ in range(r.randint(1, 2)):
            y = 200.0
            blocks = []
            for _ in range(r.randint(2, 4)):
                lines_xml = []
                for _ in range(r.randint(1, 5)):
                    base_size = r.choice([10, 12, 12, 12, 18])
                    font = r.choice(FONTS[:3])
                    x = 150.0
                    x0 = x
                    parts = [f'<font name="{font}" size="{base_size}">']
                    words = _sentence(r, r.randint(3, 9))
                    for wi, text in enumerate(words):
                        if wi > 0:
                            cx, w = char_xml(" ", x, y, base_size)
                            parts.append(cx)
                            x += w
                        # mid-line font/size change sometimes
                        if r.random() < 0.18:
                            nf = r.choice(FONTS)
                            ns = base_size if r.random() < 0.5 \
                                else round(base_size * r.choice([0.6, 1.5]), 1)
                            parts.append(f'<font name="{nf}" size="{ns}">')
                            cur_size = ns
                        else:
                            cur_size = base_size
                        # raised superscript digit glued to a word
                        if r.random() < 0.08:
                            text += ""
                        for ch in text:
                            if ch in "<>&\"'":
                                continue
                            cx, w = char_xml(ch, x, y, cur_size)
                            parts.append(cx)
                            x += w
                        if r.random() < 0.06:
                            # trailing raised marker at reduced size
                            sup_size = round(base_size * 0.6, 1)
                            sy = y - base_size * 0.35
                            for ch in str(r.randint(1, 9)):
                                cx, w = char_xml(ch, x, sy, sup_size)
                                parts.append(
                                    cx.replace(f'size="{cur_size}"', ""))
                                x += w
                    parts.append("</font>")
                    asc = base_size * 0.9
                    lines_xml.append(
                        f'<line bbox="{x0:.1f} {y - asc:.1f} {x:.1f} '
                        f'{y + base_size * 0.3:.1f}" dir="1 0">'
                        + "".join(parts) + "</line>")
                    y += base_size * r.choice([1.2, 1.2, 1.2, 2.4])
                blocks.append(f'<block bbox="100 100 1800 {y:.0f}">'
                              + "".join(lines_xml) + "</block>")
                y += r.choice([0, 30, 80])
            pages.append('<page id="page0" width="2000" height="3000">'
                         + "".join(blocks) + "</page>")
        return ('<?xml version="1.0"?><document name="x">'
                + "".join(pages) + "</document>").encode()

    return _gen(r)


@pytest.mark.parametrize("seed", [6, 31, 49, 77])
def test_kitchen_sink13_parity(seed, tmp_path):
    data = _sink13_stext(random.Random(seed))
    p = tmp_path / f"sink13_{seed}.stext"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink13_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink13_{seed} md"


def _sink14_abbyy(r):
    """Round-14 sink: raw randomized Abbyy — formatting splits (bold/
    italic/smallcaps/superscript ff attrs), suspicious chars, blank
    charParams beside formatting changes, size-only formatting
    churn, multi-par multi-page.  0/160 seeds diverged — pinned."""
    from scribe_js_ray.sources.synth import _sentence

    def char_xml(ch, x, y, w=42, h=56, fmt=None, suspicious=False):
        sus = ' suspicious="1"' if suspicious else ""
        pre = fmt or ""
        return (f'{pre}<charParams l="{x}" t="{y}" r="{x + w}" '
                f'b="{y + h}"{sus}>{ch}</charParams>')

    def fmt_tag(r, base_size=12):
        attrs = [f' lang="EnglishUnitedStates" ff="Times New Roman"']
        size = base_size
        if r.random() < 0.3:
            size = r.choice([8, 10, 12, 12, 16])
        attrs.append(f' fs="{size}."')
        for name, p in (("bold", 0.2), ("italic", 0.12), ("smallcaps", 0.05),
                        ("superscript", 0.06), ("underline", 0.05)):
            if r.random() < p:
                attrs.append(f' {name}="true"')
        return f'<formatting{"".join(attrs)}>', size

    def _gen(r):
        pages = []
        for _ in range(r.randint(1, 2)):
            pars = []
            y = 200
            for _ in range(r.randint(2, 5)):
                lines_xml = []
                for _ in range(r.randint(1, 4)):
                    x = 150 + r.choice([0, 0, 120])
                    x0 = x
                    parts = []
                    open_fmt, _ = fmt_tag(r)
                    parts.append(open_fmt)
                    words = _sentence(r, r.randint(3, 9))
                    for wi, text in enumerate(words):
                        if wi > 0:
                            parts.append(char_xml(" ", x, y))
                            x += 42
                        if r.random() < 0.2:
                            # mid-line formatting change (closes + reopens)
                            parts.append("</formatting>")
                            nf, _ = fmt_tag(r)
                            parts.append(nf)
                            if r.random() < 0.3:
                                # blank charParams beside the change
                                parts.append(char_xml(" ", x, y))
                                x += 42
                        for ch in text:
                            if ch in "<>&\"'":
                                continue
                            parts.append(char_xml(
                                ch, x, y, suspicious=(r.random() < 0.04)))
                            x += 42
                    parts.append("</formatting>")
                    lines_xml.append(
                        f'<line baseline="{y + 56}" l="{x0}" t="{y}" '
                        f'r="{x}" b="{y + 60}">' + "".join(parts) + "</line>")
                    y += r.choice([72, 72, 72, 130])
                pars.append("<par>" + "".join(lines_xml) + "</par>")
                y += r.choice([0, 40, 90])
            pages.append('<page width="2000" height="3000" rotation="Normal">'
                         "<text>" + "".join(pars) + "</text></page>")
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<document xmlns="http://www.abbyy.com/FineReader_xml/'
                'FineReader10-schema-v1.xml" version="1.0">'
                + "".join(pages) + "</document>").encode()

    return _gen(r)


@pytest.mark.parametrize("seed", [9, 36, 61, 74])
def test_kitchen_sink14_parity(seed, tmp_path):
    data = _sink14_abbyy(random.Random(seed))
    p = tmp_path / f"sink14_{seed}.xml"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink14_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink14_{seed} md"


# ---------------------------------------------------------------------
# Textract paired import (convertDocTextract.js): JSON + blank PDF for
# page metrics (recognizeConvert.js:549 requires pageMetrics; the PDF
# supplies pdfDims300, imageContainer.js:890-920).

PAIR_HARNESS = "/root/repo/tests/refharness/extract_pair.mjs"

_TX_VOCAB = ("the quick brown fox jumps over lazy dog pack my box with "
             "five dozen liquor jugs amazingly few discotheques provide "
             "jukeboxes Heavy Boxes perform Quick waltzes and jigs B2B "
             "offering 3.5% growth (net) [sic] e.g. qty. James' "
             "party-goers").split()
_TX_SUPS = ["word¹", "note²", "cited³", "ref⁴"]


def _gen_textract(seed):
    """Random multi-line/multi-page Textract JSON: sloped word/line
    polygons (baseline + x/asc-height metrics), LAYOUT_* paragraph
    blocks incl. shuffled order (line-reorder path) and unassigned
    tails, unicode superscripts, falsy-zero confidences, Text-less
    lines."""
    import json as _json
    r = random.Random(seed)
    n_pages = r.choice([1, 1, 2])
    blocks = []
    for p in range(n_pages):
        line_ids = []
        y = r.uniform(0.04, 0.10)
        for li in range(r.randint(3, 9)):
            lid = f"l{p}_{li}"
            words = []
            for _ in range(r.randint(1, 7)):
                t = r.choice(_TX_VOCAB)
                if r.random() < 0.08:
                    t = r.choice(_TX_SUPS)
                if r.random() < 0.1:
                    t += r.choice([".", ",", ":", "?"])
                words.append(t)
            slope = r.uniform(-0.004, 0.004)
            x = r.uniform(0.06, 0.14)
            h = r.uniform(0.012, 0.020)
            wids, wblocks = [], []
            for wi, t in enumerate(words):
                ww = 0.011 * len(t) + r.uniform(0, 0.004)
                has_desc = any(c in "gjpqy" for c in t)
                has_asc = any(
                    c in "ABCDEFGHIKLMNOPRSTUVWXYZbdhklt0123456789"
                    for c in t)
                top = y - (h * 0.55 if has_asc else h * 0.30)
                bot = y + (h * 0.28 if has_desc else h * 0.02)
                dy = slope * (x - 0.06)
                poly = [{"X": x, "Y": top + dy},
                        {"X": x + ww, "Y": top + dy + slope * ww},
                        {"X": x + ww, "Y": bot + dy + slope * ww},
                        {"X": x, "Y": bot + dy}]
                xs = [pt["X"] for pt in poly]
                ys = [pt["Y"] for pt in poly]
                wid = f"w{p}_{li}_{wi}"
                wblocks.append({
                    "BlockType": "WORD", "Id": wid, "Page": p + 1,
                    "Text": t,
                    "Confidence": r.choice([99.21, 87.5, 100.0, 0.0,
                                            65.3]),
                    "Geometry": {"BoundingBox": {
                        "Left": min(xs), "Top": min(ys),
                        "Width": max(xs) - min(xs),
                        "Height": max(ys) - min(ys)}, "Polygon": poly}})
                wids.append(wid)
                x += ww + r.uniform(0.004, 0.012)
            lx0, lx1 = 0.06, x
            lt, lb_ = y - h * 0.55, y + h * 0.28
            lpoly = [{"X": lx0, "Y": lt},
                     {"X": lx1, "Y": lt + slope * (lx1 - lx0)},
                     {"X": lx1, "Y": lb_ + slope * (lx1 - lx0)},
                     {"X": lx0, "Y": lb_}]
            lys = [pt["Y"] for pt in lpoly]
            lblock = {"BlockType": "LINE", "Id": lid, "Page": p + 1,
                      "Text": " ".join(words),
                      "Geometry": {"BoundingBox": {
                          "Left": lx0, "Top": min(lys),
                          "Width": lx1 - lx0,
                          "Height": max(lys) - min(lys)},
                          "Polygon": lpoly},
                      "Relationships": [{"Type": "CHILD", "Ids": wids}]}
            if r.random() < 0.04:
                del lblock["Text"]
            blocks.append(lblock)
            blocks.extend(wblocks)
            line_ids.append(lid)
            y += r.uniform(0.025, 0.045)
        layout_ids = []
        if r.random() < 0.85:
            i, runs = 0, []
            while i < len(line_ids):
                k = min(r.randint(1, 4), len(line_ids) - i)
                runs.append(line_ids[i:i + k])
                i += k
            if r.random() < 0.25 and len(runs) > 1:
                runs = runs[:-1]
            order = list(range(len(runs)))
            if r.random() < 0.3:
                r.shuffle(order)
            for oi in order:
                lay_id = f"lay{p}_{oi}"
                blocks.append({
                    "BlockType": "LAYOUT_TITLE"
                    if oi == 0 and r.random() < 0.3 else "LAYOUT_TEXT",
                    "Id": lay_id, "Page": p + 1,
                    "Geometry": {"BoundingBox": {
                        "Left": 0.05, "Top": 0.05, "Width": 0.9,
                        "Height": 0.9}, "Polygon": [
                        {"X": 0.05, "Y": 0.05}, {"X": 0.95, "Y": 0.05},
                        {"X": 0.95, "Y": 0.95}, {"X": 0.05, "Y": 0.95}]},
                    "Relationships": [{"Type": "CHILD",
                                       "Ids": runs[oi]}]})
                layout_ids.append(lay_id)
        blocks.append({
            "BlockType": "PAGE", "Id": f"page{p}", "Page": p + 1,
            "Geometry": {"Polygon": [
                {"X": 0, "Y": 0}, {"X": 1, "Y": 0},
                {"X": 1, "Y": 1}, {"X": 0, "Y": 1}]},
            "Relationships": [{"Type": "CHILD",
                               "Ids": line_ids + layout_ids}]})
    return _json.dumps({"DetectDocumentTextModelVersion": "1.0",
                        "Blocks": blocks}), n_pages


_TX_PAGE_POLY = {0: [(0, 0), (1, 0), (1, 1), (0, 1)],
                 1: [(1, 0), (1, 1), (0, 1), (0, 0)],
                 2: [(1, 1), (0, 1), (0, 0), (1, 0)],
                 3: [(0, 1), (0, 0), (1, 0), (1, 1)]}


def _rotate_textract(js, orient, rotation_angle=0.0):
    """Re-express an orientation-0 fixture as a page scanned rotated by
    90°×orient (PAGE polygon + all geometry mapped into image space)."""
    import json as _json

    def rot(x, y):
        if orient == 1:
            return 1 - y, x
        if orient == 2:
            return 1 - x, 1 - y
        if orient == 3:
            return y, 1 - x
        return x, y

    data = _json.loads(js)
    for b in data["Blocks"]:
        g = b.get("Geometry") or {}
        if b["BlockType"] == "PAGE":
            g["Polygon"] = [{"X": float(x), "Y": float(y)}
                            for x, y in _TX_PAGE_POLY[orient]]
            continue
        if "Polygon" in g:
            pts = [rot(pt["X"], pt["Y"]) for pt in g["Polygon"]]
            g["Polygon"] = [{"X": x, "Y": y} for x, y in pts]
            xs = [x for x, _ in pts]
            ys = [y for _, y in pts]
            g["BoundingBox"] = {"Left": min(xs), "Top": min(ys),
                                "Width": max(xs) - min(xs),
                                "Height": max(ys) - min(ys)}
        if b["BlockType"] == "WORD" and rotation_angle:
            g["RotationAngle"] = rotation_angle
    return _json.dumps(data)


def _ref_pair(fmt, *paths):
    r = subprocess.run(["node", PAIR_HARNESS, fmt, *paths],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def _check_textract_pair(js, n_pages, tmp_path, name, fmts=("text", "md"),
                         page_wh=(612, 792)):
    from scribe_js_ray.sources import synth_pdf
    ow, oh = synth_pdf._PAGE_W, synth_pdf._PAGE_H
    synth_pdf._PAGE_W, synth_pdf._PAGE_H = page_wh
    try:
        pdf = synth_pdf._make_pdf([""] * n_pages, {})
    finally:
        synth_pdf._PAGE_W, synth_pdf._PAGE_H = ow, oh
    jp = tmp_path / f"{name}.json"
    pp = tmp_path / f"{name}.pdf"
    jp.write_text(js)
    pp.write_bytes(pdf)
    for fmt in fmts:
        ref = _ref_pair(fmt, str(pp), str(jp))
        ours = extract_document(
            "u", js.encode(), "", "eng", source_payload=pdf,
            emit_format="markdown" if fmt == "md" else "text")
        assert not ours["error"], ours["error"]
        assert ours["extracted_text"] == ref, f"{name} {fmt}"


@pytest.mark.parametrize("seed", [3, 10, 22, 31])
def test_textract_pair_parity(seed, tmp_path):
    js, n_pages = _gen_textract(seed)
    _check_textract_pair(js, n_pages, tmp_path, f"tx{seed}")


@pytest.mark.parametrize("seed,orient,page_wh,rot", [
    (41, 1, (842, 1191), 0.0),
    (43, 3, (1000, 500), 0.0),   # width300 > 3500 → DPI-cap dims path
    (46, 2, (612, 792), 0.0),
    (45, 1, (612, 792), 90.0),   # word RotationAngle → line orientation
])
def test_textract_rotated_parity(seed, orient, page_wh, rot, tmp_path):
    js, n_pages = _gen_textract(seed)
    js = _rotate_textract(js, orient, rot)
    _check_textract_pair(js, n_pages, tmp_path, f"txr{seed}",
                         fmts=("text",), page_wh=page_wh)


# ---------------------------------------------------------------------
# Google Vision / Google Doc AI / Azure Document Intelligence paired
# imports (convertPageGoogleVision.js / convertDocGoogleDocAI.js /
# convertDocAzureDocIntel.js) — same two-file harness as Textract.


def _cf_words(r, lo=1, hi=7, sups=False):
    out = []
    for _ in range(r.randint(lo, hi)):
        t = r.choice(_TX_VOCAB)
        if sups and r.random() < 0.08:
            t = r.choice(_TX_SUPS)
        if r.random() < 0.1:
            t += r.choice([".", ",", ":", "?"])
        out.append(t)
    return out


def _gen_google_vision(seed):
    """blocks→paragraphs→words→symbols with detectedBreak line splits,
    absolute + normalized vertices, missing-coordinate points, empty
    symbol lists, numeric blockType, all three envelope shapes."""
    import json as _json
    r = random.Random(seed)
    W, H = r.choice([(1000, 1400), (2480, 3508)])
    blocks = []
    y = r.randint(60, 140)
    for _ in range(r.randint(1, 4)):
        paragraphs = []
        for _ in range(r.randint(1, 3)):
            par_words = []
            n_lines = r.randint(1, 4)
            top0 = y
            for ln in range(n_lines):
                words = _cf_words(r)
                x = r.randint(80, 160)
                h = r.randint(24, 40)
                for wi, t in enumerate(words):
                    ww = int(h * 0.55) * len(t)
                    vs = [(x, y), (x + ww, y), (x + ww, y + h),
                          (x, y + h)]
                    if r.random() < 0.15:
                        bb = {"normalizedVertices": [
                            {"x": vx / W, "y": vy / H} for vx, vy in vs]}
                    else:
                        bb = {"vertices": [{"x": vx, "y": vy}
                                           for vx, vy in vs]}
                        if r.random() < 0.1:
                            bb["vertices"][0] = {"y": y}
                    symbols = [{"text": c} for c in t]
                    if wi == len(words) - 1 and ln != n_lines - 1:
                        symbols[-1]["property"] = {"detectedBreak": {
                            "type": r.choice(["LINE_BREAK",
                                              "EOL_SURE_SPACE"])}}
                    w_v = {"boundingBox": bb, "symbols": symbols,
                           "confidence": r.choice([0.97, 0.5, 0.0,
                                                   0.8312])}
                    if r.random() < 0.03:
                        w_v["symbols"] = []
                    par_words.append(w_v)
                    x += ww + r.randint(8, 16)
                y += h + r.randint(8, 20)
            paragraphs.append({"boundingBox": {"vertices": [
                {"x": 70, "y": top0}, {"x": x, "y": top0},
                {"x": x, "y": y}, {"x": 70, "y": y}]},
                "words": par_words})
            y += r.randint(10, 30)
        blocks.append({"blockType": r.choice(["TEXT", "TEXT", 1]),
                       "paragraphs": paragraphs})
        y += r.randint(20, 50)
    doc = {"fullTextAnnotation": {
        "pages": [{"width": W, "height": H, "blocks": blocks}],
        "text": "x"}}
    shape = r.random()
    if shape < 0.33:
        doc = {"responses": [doc]}
    elif shape < 0.5:
        doc = [doc]
    return _json.dumps(doc), 1


def _gen_google_doc_ai(seed):
    """Shared-fullText token/line/paragraph textAnchors (zero
    startIndex omitted like real Doc AI), sloped line polys, unicode
    superscripts (split path), unassigned-line fallback par, and the
    no-paragraphs variant (reflow path)."""
    import json as _json
    r = random.Random(seed)
    n_pages = r.choice([1, 1, 2])
    full, pos, pages = [], 0, []
    for _p in range(n_pages):
        W, H = r.choice([(1000, 1400), (2480, 3508)])
        tokens, lines_v, paragraphs = [], [], []
        y = r.randint(60, 120)
        for _par in range(r.randint(1, 4)):
            par_start = pos
            for _ln in range(r.randint(1, 4)):
                words = _cf_words(r, sups=True)
                line_start = pos
                x = r.randint(70, 150)
                h = r.randint(26, 40)
                for t in words:
                    ww = int(h * 0.55) * len(t)
                    seg = {"endIndex": str(pos + len(t) + 1)}
                    if pos:
                        seg["startIndex"] = str(pos)
                    vs = [(x, y), (x + ww, y), (x + ww, y + h),
                          (x, y + h)]
                    if r.random() < 0.2:
                        bp = {"normalizedVertices": [
                            {"x": vx / W, "y": vy / H} for vx, vy in vs]}
                    else:
                        bp = {"vertices": [{"x": vx, "y": vy}
                                           for vx, vy in vs]}
                    tokens.append({"layout": {
                        "textAnchor": {"textSegments": [seg]},
                        "confidence": r.choice([0.99, 0.5, 0.0, 0.731]),
                        "boundingPoly": bp}})
                    full.append(t + " ")
                    pos += len(t) + 1
                    x += ww + r.randint(8, 16)
                full[-1] = full[-1][:-1] + "\n"
                lseg = {"endIndex": str(pos)}
                if line_start:
                    lseg["startIndex"] = str(line_start)
                slope = r.uniform(-3, 3)
                lines_v.append({"layout": {
                    "textAnchor": {"textSegments": [lseg]},
                    "boundingPoly": {"vertices": [
                        {"x": 70, "y": y}, {"x": x, "y": y + slope},
                        {"x": x, "y": y + h + slope},
                        {"x": 70, "y": y + h}]}}})
                y += h + r.randint(8, 18)
            pseg = {"endIndex": str(pos)}
            if par_start:
                pseg["startIndex"] = str(par_start)
            paragraphs.append({"layout": {
                "textAnchor": {"textSegments": [pseg]}}})
            y += r.randint(10, 30)
        if r.random() < 0.2:
            paragraphs = paragraphs[:-1]
        if r.random() < 0.15:
            paragraphs = []
        pages.append({"dimension": {"width": W, "height": H,
                                    "unit": "pixels"},
                      "tokens": tokens, "lines": lines_v,
                      "paragraphs": paragraphs})
    return _json.dumps({"text": "".join(full), "pages": pages}), n_pages


def _gen_azure(seed):
    """analyzeResult pages in inch AND pixel units, sloped 8-point
    polygons, span-matched words, fractional/zero confidences."""
    import json as _json
    r = random.Random(seed)
    n_pages = r.choice([1, 1, 2])
    pages = []
    for p in range(n_pages):
        unit = r.choice(["inch", "pixel"])
        W, H, k = (8.5, 11.0, 1 / 150.0) if unit == "inch" \
            else (2550, 3300, 1.0)
        words_pd, lines_pd = [], []
        offset = 0
        y = 300 * k
        for _ln in range(r.randint(2, 8)):
            words = _cf_words(r)
            x = r.uniform(200, 400) * k
            h = r.uniform(28, 44) * k
            lw, l0, x0 = [], offset, x
            slope = r.uniform(-2, 2) * k
            for t in words:
                ww = h * 0.55 * len(t)
                poly = [x, y, x + ww, y + slope, x + ww, y + h + slope,
                        x, y + h]
                words_pd.append({
                    "content": t,
                    "polygon": [round(v, 4) for v in poly],
                    "confidence": r.choice([0.993, 0.5, 0.0, 0.8213]),
                    "span": {"offset": offset, "length": len(t)}})
                lw.append(t)
                offset += len(t) + 1
                x += ww + r.uniform(8, 16) * k
            lines_pd.append({
                "content": " ".join(lw),
                "polygon": [round(v, 4) for v in
                            [x0, y, x, y + slope, x, y + h + slope,
                             x0, y + h]],
                "spans": [{"offset": l0, "length": offset - l0 - 1}]})
            y += h + r.uniform(10, 25) * k
        pages.append({"pageNumber": p + 1, "angle": r.choice([0, 0.12]),
                      "width": W, "height": H, "unit": unit,
                      "words": words_pd, "lines": lines_pd})
    return _json.dumps(
        {"status": "succeeded",
         "createdDateTime": "2024-01-01T00:00:00Z",
         "analyzeResult": {"apiVersion": "2023-07-31",
                           "modelId": "prebuilt-read",
                           "content": "", "pages": pages}}), n_pages


def _check_cloud_pair(gen, seed, tmp_path):
    import json as _json  # noqa: F401
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    js, n_pages = gen(seed)
    pdf = _make_pdf([""] * n_pages, {})
    name = f"{gen.__name__}_{seed}"
    jp = tmp_path / f"{name}.json"
    pp = tmp_path / f"{name}.pdf"
    jp.write_text(js)
    pp.write_bytes(pdf)
    for fmt in ("text", "md"):
        ref = _ref_pair(fmt, str(pp), str(jp))
        ours = extract_document(
            "u", js.encode(), "", "eng", source_payload=pdf,
            emit_format="markdown" if fmt == "md" else "text")
        assert not ours["error"], ours["error"]
        assert ours["extracted_text"] == ref, f"{name} {fmt}"


@pytest.mark.parametrize("seed", [2, 4, 9])
def test_google_vision_pair_parity(seed, tmp_path):
    _check_cloud_pair(_gen_google_vision, seed, tmp_path)


@pytest.mark.parametrize("seed", [1, 6, 11])
def test_google_doc_ai_pair_parity(seed, tmp_path):
    _check_cloud_pair(_gen_google_doc_ai, seed, tmp_path)


@pytest.mark.parametrize("seed", [0, 5, 10])
def test_azure_pair_parity(seed, tmp_path):
    _check_cloud_pair(_gen_azure, seed, tmp_path)


# ---------------------------------------------------------------------
# Mixed-source pairs: an OCR upload owns the active text layer even
# when the paired PDF carries its own native text (import.js:716
# mainData=true), and OCR pages beyond the image page count are
# dropped (import.js:604 slicing).


def test_mixed_pair_ocr_wins(tmp_path):
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.sources.synth_pdf import _make_pdf, make_pdf_simple
    for seed in (0, 2):
        pdf_text = make_pdf_simple(random.Random(seed))
        js, n_pages = _gen_textract(seed + 60)
        pdf = pdf_text if n_pages <= pdf_text.count(b"/Type /Page ") \
            else _make_pdf([""] * n_pages, {})
        _check_textract_pair(js, n_pages, tmp_path, f"mixtx{seed}",
                             fmts=("text",))
        # text-native PDF + hOCR: the hOCR layer is exported, not the
        # PDF's own text
        hocr = make_hocr_paragraphs(random.Random(seed)).encode()
        pp = tmp_path / f"mixh{seed}.pdf"
        hp = tmp_path / f"mixh{seed}.hocr"
        pp.write_bytes(pdf_text)
        hp.write_bytes(hocr)
        ref = _ref_pair("text", str(pp), str(hp))
        ours = extract_document("u", hocr, "", "eng",
                                source_payload=pdf_text)
        assert ours["extracted_text"] == ref, f"mixh{seed}"


def test_mixed_pair_page_slicing(tmp_path):
    """2-page hOCR + 1-page PDF: only the first OCR page survives."""
    import re
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    h1 = make_hocr_paragraphs(random.Random(1))
    h2 = make_hocr_paragraphs(random.Random(2))
    m = re.search(r"(<div class='ocr_page'.*</div>)\s*</body>", h2, re.S) \
        or re.search(r'(<div class="ocr_page".*</div>)\s*</body>', h2, re.S)
    two = h1.replace("</body>", m.group(1) + "</body>")
    pdf = _make_pdf([""], {})
    pp = tmp_path / "one.pdf"
    hp = tmp_path / "two.hocr"
    pp.write_bytes(pdf)
    hp.write_text(two)
    ref = _ref_pair("text", str(pp), str(hp))
    ours = extract_document("u", two.encode(), "", "eng",
                            source_payload=pdf)
    assert ours["extracted_text"] == ref
    # And unpaired, both pages emit (no slicing without image data).
    unpaired = extract_document("u", two.encode(), "", "eng")
    assert unpaired["n_pages"] == 2


def _sink14_docx(r):
    """Round-14 sink: DOCX with per-run w:sz / w:rFonts and a
    word/styles.xml carrying docDefaults + paragraph-style sizes
    (Heading/Quote/FootnoteText) — exercises the size-inheritance
    chain (run → pStyle → docDefaults, convertDocDocx.js:290-336,
    :551-560, :573-592), the per-run-size typeset widths/wraps, and
    the stylesMatch size term in cross-run word merging (:788).
    Seeds 0-59 fuzzed clean against the live reference on the first
    run of the w:sz port."""
    import io
    import zipfile

    from scribe_js_ray.sources.synth import _sentence

    W = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/'
         '2006/main"')
    CT = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/word/document.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.'
          'wordprocessingml.document.main+xml"/></Types>')
    RELS = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships"><Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/officeDocument" Target="word/document.xml"/>'
            '</Relationships>')

    def esc(s):
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def run_xml(text, r, allow_sup=True):
        props = []
        if r.random() < 0.15:
            props.append('<w:b/>')
        if r.random() < 0.10:
            props.append('<w:i/>')
        if allow_sup and r.random() < 0.06:
            props.append('<w:vertAlign w:val="superscript"/>')
        if r.random() < 0.45:
            sz = r.choice([16, 18, 20, 22, 24, 28, 32, 36, 44])
            props.append(f'<w:sz w:val="{sz}"/>')
        if r.random() < 0.2:
            font = r.choice(["Calibri", "Arial", "Georgia &amp; Co"])
            props.append(f'<w:rFonts w:ascii="{font}" w:hAnsi="{font}"/>')
        rpr = f"<w:rPr>{''.join(props)}</w:rPr>" if props else ""
        return (f'<w:r>{rpr}<w:t xml:space="preserve">{esc(text)}</w:t>'
                f'</w:r>')

    n_footnotes = r.randint(0, 3)
    fn_ids = [str(i + 2) for i in range(n_footnotes)]
    pars = []
    for _ in range(r.randint(3, 8)):
        ppr = ""
        if r.random() < 0.25:
            ppr = ('<w:pPr><w:pStyle w:val="%s"/></w:pPr>'
                   % r.choice(["Heading1", "Heading2", "Title", "Quote",
                               "Normal", "BigBody"]))
        text = " ".join(_sentence(r, r.randint(4, 14)))
        pieces = [text]
        for _ in range(r.randint(0, 3)):
            k = r.randrange(len(pieces))
            s = pieces[k]
            if len(s) < 4:
                continue
            cut = r.randrange(1, len(s))
            pieces[k:k + 1] = [s[:cut], s[cut:]]
        runs = [run_xml(p_, r) for p_ in pieces]
        if fn_ids and r.random() < 0.5:
            fid = r.choice(fn_ids)
            at = r.randrange(len(runs) + 1)
            runs.insert(at, '<w:r><w:rPr><w:vertAlign w:val='
                            '"superscript"/></w:rPr>'
                            f'<w:footnoteReference w:id="{fid}"/></w:r>')
        pars.append(f"<w:p>{ppr}{''.join(runs)}</w:p>")
    doc = (f'<?xml version="1.0"?><w:document {W}><w:body>'
           + "".join(pars) + '</w:body></w:document>')

    files = {"[Content_Types].xml": CT, "_rels/.rels": RELS,
             "word/document.xml": doc}

    if r.random() < 0.8:
        parts = []
        if r.random() < 0.6:
            dsz = r.choice([20, 22, 24])
            parts.append(f'<w:docDefaults><w:rPrDefault><w:rPr>'
                         f'<w:sz w:val="{dsz}"/></w:rPr></w:rPrDefault>'
                         f'</w:docDefaults>')
        for sid, szs in (("Heading1", [28, 32, 36]),
                         ("Quote", [20, 22]),
                         ("BigBody", [26, 30]),
                         ("FootnoteText", [16, 18, 20])):
            if r.random() < 0.6:
                sz = r.choice(szs)
                font = ('<w:rFonts w:ascii="Cambria"/>'
                        if r.random() < 0.3 else "")
                parts.append(f'<w:style w:type="paragraph" '
                             f'w:styleId="{sid}"><w:rPr>{font}'
                             f'<w:sz w:val="{sz}"/></w:rPr></w:style>')
        if parts:
            files["word/styles.xml"] = (f'<?xml version="1.0"?>'
                                        f'<w:styles {W}>'
                                        + "".join(parts) + "</w:styles>")

    if n_footnotes:
        fns = ['<w:footnote w:id="-1"><w:p><w:r><w:separator/></w:r>'
               '</w:p></w:footnote>',
               '<w:footnote w:id="0"><w:p><w:r>'
               '<w:continuationSeparator/></w:r></w:p></w:footnote>']
        for fid in fn_ids:
            body_runs = ('<w:r><w:rPr><w:vertAlign w:val="superscript"/>'
                         '</w:rPr><w:footnoteRef/></w:r>')
            for _ in range(r.randint(1, 2)):
                body_runs += run_xml(
                    " ".join(_sentence(r, r.randint(4, 9))), r,
                    allow_sup=False)
            fns.append(f'<w:footnote w:id="{fid}"><w:p>{body_runs}'
                       f'</w:p></w:footnote>')
        files["word/footnotes.xml"] = (f'<?xml version="1.0"?>'
                                       f'<w:footnotes {W}>'
                                       + "".join(fns) + "</w:footnotes>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in files.items():
            z.writestr(name, content)
    return buf.getvalue()


@pytest.mark.parametrize("seed", [0, 2, 7, 31, 44])
def test_kitchen_sink14_docx_parity(seed, tmp_path):
    data = _sink14_docx(random.Random(seed))
    p = tmp_path / f"sink14_{seed}.docx"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink14_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink14_{seed} md"


def _ref_sentence(path: str, fmt: str) -> str:
    """Reference run with docxLineSplitMode='sentence'
    (scribeDocDefaults.js:42 → recognizeConvert.js:546)."""
    import os
    harness = HARNESS if fmt == "text" \
        else HARNESS.replace("extract_text.mjs", "export_fmt.mjs")
    args = ["node", harness, path] + ([] if fmt == "text" else [fmt])
    env = dict(os.environ, DOCX_LINE_SPLIT_MODE="sentence")
    r = subprocess.run(args, capture_output=True, text=True, timeout=120,
                       env=env)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_docx_sentence_split_parity(seed, tmp_path):
    """lineSplitMode='sentence': width wrapping off, lines break at the
    whitespace after sentence-ending words (convertDocDocx.js:34-58
    isSentenceEnding incl. abbreviation/initial/ellipsis vetoes,
    :772-775, :872-874).  28 fuzz seeds (sink12+sink14) ran clean on
    the first try of the port."""
    for gen, tag in ((_sink12_docx, "s12"), (_sink14_docx, "s14")):
        data = gen(random.Random(seed))
        p = tmp_path / f"sent_{tag}_{seed}.docx"
        p.write_bytes(data)
        opts = {"docx_line_split_mode": "sentence"}
        assert extract_document(
            "u", data, "", "eng",
            emit_opts=opts)["extracted_text"] \
            == _ref_sentence(str(p), "text"), f"{tag}_{seed} text"
        assert extract_document(
            "u", data, "", "eng", emit_format="markdown",
            emit_opts=opts)["extracted_text"] \
            == _ref_sentence(str(p), "md"), f"{tag}_{seed} md"


def test_hocr_table_meta_reference_restore(tmp_path):
    """The reference's reimport path (ocr-system scribeocr,
    importOCR.js:196-219) restores our layout-data-table meta: its
    xlsx export emits the table cells our detector found."""
    import base64
    import io
    import zipfile

    from scribe_js_ray.stages.exports import write_hocr
    from scribe_js_ray.stages.hocr import parse_hocr_page
    from scribe_js_ray.stages.tables import detect_tables_in_page

    def word(t, x, y):
        return (f"<span class='ocrx_word' title='bbox {x} {y} "
                f"{x + 12 * len(t)} {y + 20}; x_wconf 96'>{t}</span>")

    rows_html = [
        "<span class='ocr_line' title='bbox 150 60 400 80; "
        "baseline 0 -4; x_size 24'>" + word("Quarterly", 150, 60)
        + word("Report", 280, 60) + "</span>"]
    for i in range(6):
        y = 100 + i * 30
        xs = [150, 900, 1400, 1800]
        texts = [f"r{i}c0v1", f"{100 + i}", f"{200 + i}", f"{300 + i}"]
        cells = "".join(word(t, x, y) for t, x in zip(texts, xs))
        rows_html.append(
            f"<span class='ocr_line' title='bbox 150 {y} 1900 "
            f"{y + 20}; baseline 0 -4; x_size 24'>{cells}</span>")
    src = ("<html><body><div class='ocr_page' title='image \"p\"; "
           "bbox 0 0 2200 2800; ppageno 0'>"
           + "".join(rows_html) + "</div></body></html>")
    page, _ = parse_hocr_page(src, 0)
    for bb in detect_tables_in_page(page):
        page.table_boxes.append({
            "left": bb.left, "top": bb.top, "right": bb.right,
            "bottom": bb.bottom, "col_separators": [880, 1390, 1790]})
    assert page.table_boxes

    p = tmp_path / "reimport.hocr"
    p.write_text(write_hocr([page]))
    raw = base64.b64decode(_ref_fmt(str(p), "xlsx"))
    z = zipfile.ZipFile(io.BytesIO(raw))
    sheets = "".join(z.read(n).decode("utf-8", "replace")
                     for n in z.namelist() if n.endswith(".xml"))
    assert "r3c0v1" in sheets, "reference did not restore the table"


def _gen_google_vision_batch(seed):
    """Multi-page batch Vision JSON: one response per page wrapped in
    {"responses": [...]}, each tagged context.pageNumber, emitted in
    SHUFFLED order — the reference re-sorts by page number before
    splitting (importOCR.js:128-134)."""
    import json as _json
    r = random.Random(seed)
    n = r.choice([2, 3])
    responses = []
    for k in range(n):
        js, _ = _gen_google_vision(seed * 100 + k + 1)
        doc = _json.loads(js)
        if isinstance(doc, list):
            doc = doc[0]
        if "responses" in doc:
            doc = doc["responses"][0]
        doc["context"] = {"pageNumber": k + 1}
        responses.append(doc)
    order = list(range(n))
    r.shuffle(order)
    return _json.dumps({"responses": [responses[i] for i in order]}), n


@pytest.mark.parametrize("seed", [0, 5, 7])
def test_google_vision_batch_parity(seed, tmp_path):
    """10 fuzz seeds ran clean on the first try of the split port."""
    _check_cloud_pair(_gen_google_vision_batch, seed, tmp_path)


def _sink15_pdf(r):
    """Round-15 sink: randomized table-SIGNAL pages — solid grids,
    dashed-segment grids, row-band shading fills, header-rule column
    underlines — mixed with prose.  Drove the faithful port of the
    full detectPdfTables pipeline (stages/pdf/tabledetect.py): strict
    grids, segmented-hline break-pattern columns (seeds 1/5), word-
    level table-content extraction (extractTables.js), header-rule
    numeric validation vs the prose-median hangMarker bodyTextLeft fix
    (seed 3), grid-strong strip validation (seed 8), and the
    Math.round-vs-banker's break-point fix (seed 28)."""
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import _make_pdf, _Typesetter

    WORDS = ["alpha", "beta", "gamma", "delta", "total", "net", "rate",
             "count", "items", "price"]

    def dashes_h(y, x0, x1, seg=18.0, gap=1.5):
        out, x = [], x0
        while x + seg <= x1:
            out.append(f"{x:.1f} {y} m {x + seg:.1f} {y} l S")
            x += seg + gap
        return out

    def dashes_v(x, y0, y1, seg=9.0, gap=1.0):
        out, y = [], y0
        while y + seg <= y1:
            out.append(f"{x} {y:.1f} m {x} {y + seg:.1f} l S")
            y += seg + gap
        return out

    t = _Typesetter()
    extra = ["1 w"]
    for _ in range(r.randint(1, 3)):
        t.flow(_sentence(r, r.randint(10, 25)))
        t.y -= r.randint(6, 14)

    for _ in range(r.randint(1, 2)):
        kind = r.choice(["solid", "dashed", "rowband", "headrule"])
        n_rows = r.randint(3, 6)
        n_cols = r.randint(2, 4)
        col_w = r.choice([110, 130, 150])
        x0 = r.choice([90, 100, 120])
        row_h = r.choice([24, 30])
        top = t.y - 6
        ys = [top - i * row_h for i in range(n_rows + 1)]
        xs = [x0 + c * col_w for c in range(n_cols + 1)]
        for i in range(n_rows):
            y = ys[i] - row_h + 8
            for c in range(n_cols):
                if c == 0 and kind != "rowband":
                    cell = r.choice(WORDS)
                else:
                    cell = f"{r.randint(1, 999)}.{r.randint(0, 99):02d}"
                t.ops.append(f"BT /F1 9 Tf {xs[c] + 8} {y:.1f} Td "
                             f"({cell}) Tj ET")
        if kind == "solid":
            for y in ys:
                extra.append(f"{xs[0]} {y:.1f} m {xs[-1]} {y:.1f} l S")
            for x in xs:
                extra.append(f"{x} {ys[-1]:.1f} m {x} {ys[0]:.1f} l S")
        elif kind == "dashed":
            for y in ys:
                extra.extend(dashes_h(y, xs[0], xs[-1]))
            for x in xs:
                extra.extend(dashes_v(x, ys[-1], ys[0]))
        elif kind == "rowband":
            for i in range(0, n_rows, 2):
                for c in range(n_cols):
                    extra.append(
                        f"0.92 0.92 0.95 rg {xs[c] + 2} "
                        f"{ys[i + 1] + 2:.1f} {col_w - 4} {row_h - 4} "
                        f"re f 0 0 0 rg")
        else:
            for c in range(n_cols):
                extra.append(f"{xs[c] + 2} {ys[1] + row_h - 4:.1f} m "
                             f"{xs[c] + col_w - 6} "
                             f"{ys[1] + row_h - 4:.1f} l S")
        t.y = ys[-1] - r.randint(18, 40)
        t.flow(_sentence(r, r.randint(8, 20)))
        t.y -= r.randint(8, 16)

    stream = t.stream() + " " + " ".join(extra)
    return _make_pdf([stream], {"F1": "Helvetica"})


@pytest.mark.parametrize("seed", [1, 3, 5, 8, 28, 44])
def test_kitchen_sink15_parity(seed, tmp_path):
    data = _sink15_pdf(random.Random(seed))
    p = tmp_path / f"sink15_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink15_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink15_{seed} md"


_S16_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net", "rate",
              "count", "items", "price", "assets", "cash"]
_S16_HDRS = ["Revenue", "Expenses", "Margin", "Change", "Balance", "Units"]


def _sink16_pdf(r):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import (_make_pdf,
                                                 _Typesetter)
    t = _Typesetter()
    extra = ["1 w"]
    for _ in range(r.randint(1, 2)):
        t.flow(_sentence(r, r.randint(10, 22)))
        t.y -= r.randint(6, 14)

    feature = r.choice(["titled_grid", "follows_table", "header_band",
                        "label_grid", "stacked_total", "two_bands"])

    n_rows = r.randint(4, 7)
    n_cols = r.randint(2, 3)
    col_w = r.choice([120, 140])
    x0 = r.choice([100, 130])
    row_h = r.choice([22, 26])

    if feature == "titled_grid":
        # "Table N" title line above a bordered grid
        t.line(f"Table {r.randint(1, 9)} Summary of results", dy=18)
        t.y -= 6
    elif feature == "follows_table":
        t.line("The results were as follows:", dy=18)
        t.y -= 6
    elif feature == "header_band":
        # header label row(s) above the data (no rules)
        y = t.y - 14
        for c in range(n_cols):
            t.ops.append(f"BT /F1 9 Tf {x0 + (c + 1) * col_w + 8} "
                         f"{y:.1f} Td ({r.choice(_S16_HDRS)}) Tj ET")
        t.y = y - 4
        n_cols += 1  # label column in data below

    top = t.y - 6
    ys = [top - i * row_h for i in range(n_rows + 1)]
    xs = [x0 + c * col_w for c in range(n_cols + 1)]

    if feature == "label_grid":
        # grid borders drawn only around the NUMERIC columns; the label
        # column sits unstroked to the left (extend pass)
        gx = xs[1:]
        for y in ys:
            extra.append(f"{gx[0]} {y:.1f} m {gx[-1]} {y:.1f} l S")
        for x in gx:
            extra.append(f"{x} {ys[-1]:.1f} m {x} {ys[0]:.1f} l S")
    elif feature == "stacked_total":
        # one header rule row; two data groups each ending in Total
        for c in range(n_cols):
            extra.append(f"{xs[c] + 2} {ys[0] - 2:.1f} m "
                         f"{xs[c] + col_w - 6} {ys[0] - 2:.1f} l S")
    elif feature == "two_bands":
        pass
    else:
        for y in ys:
            extra.append(f"{xs[0]} {y:.1f} m {xs[-1]} {y:.1f} l S")
        for x in xs:
            extra.append(f"{x} {ys[-1]:.1f} m {x} {ys[0]:.1f} l S")

    gap_row = n_rows // 2 if feature == "stacked_total" else -1
    for i in range(n_rows):
        y = ys[i] - row_h + 7
        if feature == "stacked_total" and i in (gap_row, n_rows - 1):
            t.ops.append(f"BT /F1 9 Tf {xs[0] + 8} {y:.1f} Td "
                         f"(Total) Tj ET")
            for c in range(1, n_cols):
                t.ops.append(
                    f"BT /F1 9 Tf {xs[c] + 8} {y:.1f} Td "
                    f"({r.randint(100, 999)}.{r.randint(0, 99):02d}) "
                    f"Tj ET")
            continue
        for c in range(n_cols):
            if c == 0:
                cell = r.choice(_S16_WORDS)
            else:
                cell = f"{r.randint(1, 999)}.{r.randint(0, 99):02d}"
            t.ops.append(f"BT /F1 9 Tf {xs[c] + 8} {y:.1f} Td "
                         f"({cell}) Tj ET")
        if feature == "two_bands" and i % 2 == 0:
            for c in range(n_cols):
                extra.append(
                    f"0.9 0.92 0.95 rg {xs[c] + 2} {ys[i + 1] + 2:.1f} "
                    f"{col_w - 4} {row_h - 4} re f 0 0 0 rg")

    t.y = ys[-1] - r.randint(20, 40)
    t.flow(_sentence(r, r.randint(8, 18)))
    return _make_pdf([t.stream() + " " + " ".join(extra)],
                     {"F1": "Helvetica"}), feature




@pytest.mark.parametrize("seed", [0, 2, 4, 6, 13, 14])
def test_kitchen_sink16_parity(seed, tmp_path):
    """Round-16 sink: table-pipeline INTEGRATION phases — 'Table N'
    titles, 'follows:' intro prose, header bands above data (refine/
    detectHeaders), unstroked label columns beside grids (extend pass),
    stacked sibling groups ending in Total rows (band split), and
    alternating two-band shading (attach).  60 seeds fuzzed clean on
    the first run after the tabledetect port."""
    data, feature = _sink16_pdf(random.Random(seed))
    p = tmp_path / f"sink16_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink16_{seed} {feature} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink16_{seed} {feature} md"


_S17_LABELS = ["Net revenue", "Operating costs", "Interest income",
               "Tax provision", "Capital expenditure", "Deferred assets",
               "Gross margin", "Working capital"]


def _sink17_pdf(r):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import (_make_pdf,
                                                 _Typesetter)
    t = _Typesetter()
    for _ in range(r.randint(1, 2)):
        t.flow(_sentence(r, r.randint(10, 22)))
        t.y -= r.randint(6, 12)

    feature = r.choice(["currency", "dotleader", "yearhdr", "stacked2"])
    n_rows = r.randint(5, 8)
    x_label = r.choice([90, 110])
    col_xs = [330, 450]
    if r.random() < 0.4:
        col_xs.append(570)
    row_h = r.choice([20, 24])

    if feature == "yearhdr":
        # header row of year labels over the numeric columns
        y = t.y - 14
        for c, x in enumerate(col_xs):
            t.ops.append(f"BT /F1 9 Tf {x} {y:.1f} Td "
                         f"({2015 + c}) Tj ET")
        t.y = y - 4
    elif feature == "stacked2":
        for k, texts in enumerate((["As", "at"],
                                   ["March", "June"])):
            y = t.y - 13
            for c, x in enumerate(col_xs[:2]):
                t.ops.append(f"BT /F1 9 Tf {x} {y:.1f} Td "
                             f"({texts[c % len(texts)]}) Tj ET")
            t.y = y - 2
        t.y -= 3

    for i in range(n_rows):
        y = t.y - 6 - i * row_h
        label = r.choice(_S17_LABELS)
        t.ops.append(f"BT /F1 9 Tf {x_label} {y:.1f} Td "
                     f"({label}) Tj ET")
        x_cursor = x_label + len(label) * 5 + 6
        if feature == "dotleader":
            dots = "." * r.randint(8, 20)
            t.ops.append(f"BT /F1 9 Tf {x_cursor} {y:.1f} Td "
                         f"({dots}) Tj ET")
        for c, x in enumerate(col_xs):
            val = f"{r.randint(1, 99)},{r.randint(100, 999)}"
            if feature == "currency" and (c == 0 or r.random() < 0.3):
                t.ops.append(f"BT /F1 9 Tf {x - 12} {y:.1f} Td "
                             f"($) Tj ET")
            t.ops.append(f"BT /F1 9 Tf {x} {y:.1f} Td ({val}) Tj ET")
    t.y -= 6 + n_rows * row_h + r.randint(16, 36)
    t.flow(_sentence(r, r.randint(8, 18)))
    return _make_pdf([t.stream()], {"F1": "Helvetica"}), feature




@pytest.mark.parametrize("seed", [2, 4, 12, 0, 15])
def test_kitchen_sink17_parity(seed, tmp_path):
    """Round-17 sink: financial-statement column inference — $ currency
    chains, dot-leader rows, year header rows, stacked 2-cell headers.
    Seed 15 exposed that in_table must key on the NUMERIC-GATED table
    boxes (parsePdfDoc.js:1228-1252 filters pageObj.tableBoxes), not
    the full export set: a text table whose bbox swallowed intro prose
    pinned that prose to body where the reference sizes it as a title.
    60 seeds clean after the fix."""
    data, feature = _sink17_pdf(random.Random(seed))
    p = tmp_path / f"sink17_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink17_{seed} {feature} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink17_{seed} {feature} md"


_S18_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net",
              "rate"]


def _sink18_pdf(r):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import (_make_pdf,
                                                 _Typesetter)
    t = _Typesetter()
    col_x = [60, 320]
    col_w = 230
    variant = r.choice(["both_tables", "one_table", "table_vs_prose"])

    # interleave column content row-wise to mimic column-major streams
    y_start = t.y - 10
    ys = [y_start, y_start]

    def emit_prose(ci, n_lines):
        y = ys[ci]
        for _ in range(n_lines):
            words = _sentence(r, r.randint(4, 7))
            t.ops.append(f"BT /F1 10 Tf {col_x[ci]} {y:.1f} Td "
                         f"({' '.join(words)[:44]}) Tj ET")
            y -= 14
        ys[ci] = y

    def emit_table(ci, n_rows):
        y = ys[ci] - 6
        for i in range(n_rows):
            label = r.choice(_S18_WORDS)
            t.ops.append(f"BT /F1 9 Tf {col_x[ci]} {y:.1f} Td "
                         f"({label}) Tj ET")
            for c in range(2):
                v = f"{r.randint(1, 99)},{r.randint(100, 999)}"
                t.ops.append(f"BT /F1 9 Tf {col_x[ci] + 90 + c * 70} "
                             f"{y:.1f} Td ({v}) Tj ET")
            y -= r.choice([18, 22])
        ys[ci] = y - 8

    emit_prose(0, r.randint(2, 4))
    emit_prose(1, r.randint(2, 4))
    if variant == "both_tables":
        emit_table(0, r.randint(4, 7))
        emit_table(1, r.randint(4, 7))
    elif variant == "one_table":
        emit_table(0, r.randint(4, 7))
        emit_prose(1, r.randint(4, 7))
    else:
        emit_table(1, r.randint(5, 8))
        emit_prose(0, r.randint(5, 8))
    emit_prose(0, r.randint(2, 3))
    emit_prose(1, r.randint(2, 3))
    return _make_pdf([t.stream()], {"F1": "Helvetica"}), variant




@pytest.mark.parametrize("seed", [1, 5, 7, 10])
def test_kitchen_sink18_parity(seed, tmp_path):
    """Round-18 sink: two-column pages with per-column tables —
    x-overlap union-find clustering, sub-row splitting of same-y rows
    across page columns, column-scoped gap bridging.  60 seeds clean
    on the first run."""
    data, variant = _sink18_pdf(random.Random(seed))
    p = tmp_path / f"sink18_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink18_{seed} {variant} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink18_{seed} {variant} md"


_S19_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net"]


def _s19_page_stream(r, pageno, with_table, with_note):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import _Typesetter
    t = _Typesetter()
    # running folio at top or bottom
    folio_top = r.random() < 0.5
    if folio_top:
        t.ops.append(f"BT /F1 9 Tf 300 755 Td ({pageno}) Tj ET")
    # prose with an inline superscript-ish reference
    t.flow(_sentence(r, r.randint(12, 22)))
    t.y -= r.randint(8, 14)
    if with_table:
        n_rows = r.randint(4, 6)
        x0 = r.choice([100, 130])
        for i in range(n_rows):
            y = t.y - 6 - i * 22
            t.ops.append(f"BT /F1 9 Tf {x0} {y:.1f} Td "
                         f"({r.choice(_S19_WORDS)}) Tj ET")
            for c in range(2):
                v = f"{r.randint(1, 99)},{r.randint(100, 999)}"
                t.ops.append(f"BT /F1 9 Tf {x0 + 160 + c * 90} {y:.1f} "
                             f"Td ({v}) Tj ET")
        t.y -= 6 + n_rows * 22 + r.randint(16, 30)
    t.flow(_sentence(r, r.randint(10, 18)))
    t.y -= r.randint(10, 16)
    if with_note:
        # footnote separator rule + small-print note block at the bottom
        y = 120
        t.ops.append(f"72 {y + 24} m 220 {y + 24} l S")
        t.ops.append(f"BT /F1 7 Tf 72 {y + 8} Td "
                     f"(1 {' '.join(_sentence(r, 8))[:60]}) Tj ET")
        t.ops.append(f"BT /F1 7 Tf 72 {y - 4} Td "
                     f"({' '.join(_sentence(r, 6))[:50]}) Tj ET")
    if not folio_top:
        t.ops.append(f"BT /F1 9 Tf 300 50 Td ({pageno}) Tj ET")
    return t.stream()


def _sink19_pdf(r):
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    n_pages = r.choice([2, 3])
    streams = []
    for p in range(n_pages):
        streams.append(_s19_page_stream(
            r, p + 1,
            with_table=r.random() < 0.8,
            with_note=r.random() < 0.5))
    return _make_pdf(streams, {"F1": "Helvetica"})




@pytest.mark.parametrize("seed", [2, 9, 12, 13])
def test_kitchen_sink19_parity(seed, tmp_path):
    """Round-19 sink: numeric tables x page furniture — folios beside
    tables, footnote blocks below them, multi-page.  Seeds 9/12/13
    exposed that the running-furniture margin key must strip digits and
    require 3+ letters like the reference (analyzeLayout.js:1134-1136)
    — pure-numeric table rows near a page edge were keying phantom
    running-header groups across pages.  60 seeds clean after the
    fix."""
    data = _sink19_pdf(random.Random(seed))
    p = tmp_path / f"sink19_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink19_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink19_{seed} md"


_S20_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net"]


def _s20_page_stream(r, pageno, with_table):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import _Typesetter
    t = _Typesetter()
    n_lines = 18
    y0 = 700
    pitch = 28
    body_x = 120
    fused = r.random() < 0.35  # case B: number fused into the body line
    for i in range(n_lines):
        y = y0 - i * pitch
        if fused:
            words = " ".join(_sentence(r, r.randint(5, 9)))
            t.ops.append(f"BT /F1 11 Tf 70 {y} Td "
                         f"({i + 1} {words[:52]}) Tj ET")
        else:
            t.ops.append(f"BT /F1 11 Tf 70 {y} Td ({i + 1}) Tj ET")
            words = " ".join(_sentence(r, r.randint(5, 9)))
            t.ops.append(f"BT /F1 11 Tf {body_x} {y} Td "
                         f"({words[:52]}) Tj ET")
    if with_table:
        # small numeric table in the lower half, right of the numbers
        x0 = r.choice([200, 240])
        ty0 = y0 - n_lines * pitch - 20
        for i in range(r.randint(4, 6)):
            y = ty0 - i * 20
            t.ops.append(f"BT /F1 9 Tf {x0} {y} Td "
                         f"({r.choice(_S20_WORDS)}) Tj ET")
            for c in range(2):
                v = f"{r.randint(1, 99)},{r.randint(100, 999)}"
                t.ops.append(f"BT /F1 9 Tf {x0 + 140 + c * 80} {y} Td "
                             f"({v}) Tj ET")
    t.ops.append(f"BT /F1 9 Tf 300 40 Td ({pageno}) Tj ET")
    return t.stream()


def _sink20_pdf(r):
    from scribe_js_ray.sources.synth_pdf import _make_pdf
    n_pages = r.choice([2, 3])
    return _make_pdf([_s20_page_stream(r, p + 1, r.random() < 0.6)
                      for p in range(n_pages)], {"F1": "Helvetica"})




@pytest.mark.parametrize("seed", [0, 5, 7, 9, 12])
def test_kitchen_sink20_parity(seed, tmp_path):
    """Round-20 sink: line-numbered transcript pages (standalone and
    case-B fused margin numbers) with embedded numeric tables.  Found
    two divergences: (1) a fused case-B number must be SPLIT into its
    own linenum line inserted into page.lines (analyzeLayout.js:
    2091-2128), so writeText emits it standalone and the body line
    regroups through the inline-LN transparency; (2) the post-flag
    feature refresh must also repoint f.left/firstWordWidth at the
    first CONTENT word (:345-349) — a fused digit's x otherwise skews
    bodyLeft and the sameColumn test, so a table right of a transcript
    never column-shifts.  60 seeds clean after both fixes."""
    data = _sink20_pdf(random.Random(seed))
    p = tmp_path / f"sink20_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink20_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink20_{seed} md"


_S21_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net"]


def _sink21_pdf(r):
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import (_make_pdf,
                                                 _Typesetter)
    t = _Typesetter()
    blocks = r.sample(["toc", "quote", "table", "prose"],
                      k=r.randint(2, 4))
    if "prose" not in blocks:
        blocks.append("prose")
    r.shuffle(blocks)
    for kind in blocks:
        if kind == "prose":
            t.flow(_sentence(r, r.randint(12, 24)))
            t.y -= r.randint(8, 16)
        elif kind == "toc":
            # 4-7 leader entries: "Title words .... 123"
            for i in range(r.randint(4, 7)):
                title = " ".join(_sentence(r, r.randint(2, 5)))[:30]
                dots = ". " * r.randint(6, 14)
                pno = r.randint(1, 99)
                t.line(f"{title} {dots}{pno}", size=11, dy=18)
            t.y -= r.randint(8, 14)
        elif kind == "quote":
            # inset tight-pitch block
            for _ in range(r.randint(2, 4)):
                words = " ".join(_sentence(r, r.randint(5, 9)))
                t.line(words[:44], x=150, size=10, dy=13)
            t.y -= r.randint(8, 14)
        elif kind == "table":
            x0 = r.choice([100, 130])
            n_rows = r.randint(4, 6)
            for i in range(n_rows):
                y = t.y - 6 - i * 20
                t.ops.append(f"BT /F1 9 Tf {x0} {y:.1f} Td "
                             f"({r.choice(_S21_WORDS)}) Tj ET")
                for c in range(2):
                    v = f"{r.randint(1, 99)},{r.randint(100, 999)}"
                    t.ops.append(f"BT /F1 9 Tf {x0 + 150 + c * 80} "
                                 f"{y:.1f} Td ({v}) Tj ET")
            t.y -= 6 + n_rows * 20 + r.randint(14, 26)
    return _make_pdf([t.stream()], {"F1": "Helvetica"})




@pytest.mark.parametrize("seed", [0, 5, 11])
def test_kitchen_sink21_parity(seed, tmp_path):
    """Round-21 sink: dot-leader TOC/reference pages mixed with numeric
    tables and inset block quotes — the leader-page machinery, block
    regions, and tabledetect coexisting on one page.  70 seeds fuzzed
    clean on the first run (regression cover)."""
    data = _sink21_pdf(random.Random(seed))
    p = tmp_path / f"sink21_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink21_{seed} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink21_{seed} md"


_S22_WORDS = ["alpha", "beta", "gamma", "delta", "total", "net", "rate",
              "count", "items", "price", "assets", "cash"]
_S22_HDRS = ["Revenue", "Expenses", "Margin", "Change", "Units"]


def _sink22_pdf(r):
    """Round-22 sink: ONE table region carrying a random COMBINATION of
    vector signals simultaneously — solid grid lines × dashed rules ×
    alternating row-band fills × header underlines × outer border ×
    title — the detectPdfTables arbitration (detectPdfTables.js:66-770)
    when several classifyPaths families fire on the same region."""
    from scribe_js_ray.sources.synth import _sentence
    from scribe_js_ray.sources.synth_pdf import _make_pdf, _Typesetter

    def dashes_h(y, x0, x1, seg=18.0, gap=1.5):
        out, x = [], x0
        while x + seg <= x1:
            out.append(f"{x:.1f} {y:.1f} m {x + seg:.1f} {y:.1f} l S")
            x += seg + gap
        return out

    def dashes_v(x, y0, y1, seg=9.0, gap=1.0):
        out, y = [], y0
        while y + seg <= y1:
            out.append(f"{x:.1f} {y:.1f} m {x:.1f} {y + seg:.1f} l S")
            y += seg + gap
        return out

    t = _Typesetter()
    extra = ["1 w"]
    for _ in range(r.randint(1, 2)):
        t.flow(_sentence(r, r.randint(10, 22)))
        t.y -= r.randint(6, 14)

    signals = r.sample(["outer", "solid_h", "solid_v", "dashed_h",
                        "dashed_v", "rowband", "headrule"],
                       k=r.randint(2, 3))
    with_title = r.random() < 0.5
    with_header_row = r.random() < 0.6

    n_rows = r.randint(3, 6)
    n_cols = r.randint(2, 4)
    col_w = r.choice([110, 130, 150])
    x0 = r.choice([90, 100, 120])
    row_h = r.choice([24, 30])

    if with_title:
        t.ops.append(f"BT /F1 11 Tf {x0} {t.y - 4:.1f} Td "
                     f"(Table {r.randint(1, 9)}) Tj ET")
        t.y -= 22

    top = t.y - 6
    body_rows = n_rows + (1 if with_header_row else 0)
    ys = [top - i * row_h for i in range(body_rows + 1)]
    xs = [x0 + c * col_w for c in range(n_cols + 1)]
    ri = 0
    if with_header_row:
        y = ys[0] - row_h + 8
        for c in range(n_cols):
            t.ops.append(f"BT /F1 9 Tf {xs[c] + 8} {y:.1f} Td "
                         f"({r.choice(_S22_HDRS)}) Tj ET")
        ri = 1
    for i in range(n_rows):
        y = ys[ri + i] - row_h + 8
        for c in range(n_cols):
            cell = r.choice(_S22_WORDS) if c == 0 else \
                f"{r.randint(1, 999)}.{r.randint(0, 99):02d}"
            t.ops.append(f"BT /F1 9 Tf {xs[c] + 8} {y:.1f} Td "
                         f"({cell}) Tj ET")

    if "outer" in signals:
        extra.append(f"{xs[0]} {ys[-1]:.1f} {xs[-1] - xs[0]} "
                     f"{ys[0] - ys[-1]:.1f} re S")
    if "solid_h" in signals:
        for y in ys:
            extra.append(f"{xs[0]} {y:.1f} m {xs[-1]} {y:.1f} l S")
    if "solid_v" in signals:
        for x in xs:
            extra.append(f"{x} {ys[-1]:.1f} m {x} {ys[0]:.1f} l S")
    if "dashed_h" in signals:
        for y in ys:
            extra.extend(dashes_h(y, xs[0], xs[-1]))
    if "dashed_v" in signals:
        for x in xs:
            extra.extend(dashes_v(x, ys[-1], ys[0]))
    if "rowband" in signals:
        for i in range(0, body_rows, 2):
            for c in range(n_cols):
                extra.append(
                    f"0.92 0.92 0.95 rg {xs[c] + 2} "
                    f"{ys[i + 1] + 2:.1f} {col_w - 4} {row_h - 4} "
                    f"re f 0 0 0 rg")
    if "headrule" in signals:
        for c in range(n_cols):
            extra.append(f"{xs[c] + 2} {ys[1] + row_h - 4:.1f} m "
                         f"{xs[c] + col_w - 6} "
                         f"{ys[1] + row_h - 4:.1f} l S")

    t.y = ys[-1] - r.randint(18, 40)
    t.flow(_sentence(r, r.randint(8, 20)))
    stream = t.stream() + " " + " ".join(extra)
    return _make_pdf([stream], {"F1": "Helvetica"}), "+".join(
        sorted(signals)) + ("/hdr" if with_header_row else "") + (
        "/title" if with_title else "")


@pytest.mark.parametrize("seed", [0, 2, 3, 7, 13, 21])
def test_kitchen_sink22_parity(seed, tmp_path):
    """Round-22 sink (VERDICT r4 #6): combined vector-signal tables —
    100 seeds fuzzed byte-identical vs the live reference on the first
    run (regression cover for the classifyPaths arbitration)."""
    data, feature = _sink22_pdf(random.Random(seed))
    p = tmp_path / f"sink22_{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"sink22_{seed} {feature} text"
    assert extract_document("u", data, "", "eng",
                            emit_format="markdown")["extracted_text"] \
        == _ref_fmt(str(p), "md"), f"sink22_{seed} {feature} md"


def _gen_textract_table(seed):
    """Textract JSON whose LINE/WORD geometry forms a numeric TABLE
    (label column + column-aligned decimal cells) sandwiched between
    prose paragraphs — the cloud-import × table-detection interaction
    (convertDocTextract.js × detectTables.js) the r4 batteries never
    mixed.  Optional LAYOUT_TEXT grouping over the prose only."""
    import json as _json
    r = random.Random(seed)
    blocks, line_ids = [], []
    y = r.uniform(0.05, 0.09)

    def add_line(words_xs, li):
        nonlocal y
        lid = f"l{li}"
        wids, wblocks = [], []
        x_left = min(x for x, _ in words_xs)
        x_right = 0.0
        h = 0.016
        for wi, (x, t) in enumerate(words_xs):
            ww = 0.0105 * len(t)
            poly = [{"X": x, "Y": y - h * 0.55},
                    {"X": x + ww, "Y": y - h * 0.55},
                    {"X": x + ww, "Y": y + h * 0.28},
                    {"X": x, "Y": y + h * 0.28}]
            wid = f"w{li}_{wi}"
            wblocks.append({
                "BlockType": "WORD", "Id": wid, "Page": 1, "Text": t,
                "Confidence": 99.0,
                "Geometry": {"BoundingBox": {
                    "Left": x, "Top": y - h * 0.55, "Width": ww,
                    "Height": h * 0.83}, "Polygon": poly}})
            wids.append(wid)
            x_right = max(x_right, x + ww)
        blocks.append({
            "BlockType": "LINE", "Id": lid, "Page": 1,
            "Text": " ".join(t for _, t in words_xs),
            "Geometry": {"BoundingBox": {
                "Left": x_left, "Top": y - h * 0.55,
                "Width": x_right - x_left, "Height": h * 0.83},
                "Polygon": [
                    {"X": x_left, "Y": y - h * 0.55},
                    {"X": x_right, "Y": y - h * 0.55},
                    {"X": x_right, "Y": y + h * 0.28},
                    {"X": x_left, "Y": y + h * 0.28}]},
            "Relationships": [{"Type": "CHILD", "Ids": wids}]})
        blocks.extend(wblocks)
        line_ids.append(lid)

    li = 0
    prose_ids = []
    for _ in range(r.randint(2, 4)):
        words, x = [], r.uniform(0.07, 0.10)
        for t in [r.choice(_TX_VOCAB) for _ in range(r.randint(5, 9))]:
            words.append((x, t))
            x += 0.0105 * len(t) + 0.008
        add_line(words, li)
        prose_ids.append(f"l{li}")
        li += 1
        y += r.uniform(0.022, 0.032)

    y += r.uniform(0.015, 0.03)
    n_rows = r.randint(4, 7)
    n_cols = r.randint(2, 3)
    x0 = r.uniform(0.08, 0.14)
    col_pitch = r.choice([0.16, 0.20])
    for _ in range(n_rows):
        cells = [(x0, r.choice(["alpha", "beta", "gamma", "delta",
                                "total", "net"]))]
        for c in range(n_cols):
            v = f"{r.randint(1, 99)},{r.randint(100, 999)}"
            cells.append((x0 + 0.12 + c * col_pitch, v))
        add_line(cells, li)
        li += 1
        y += r.choice([0.024, 0.03])

    y += r.uniform(0.02, 0.04)
    for _ in range(r.randint(1, 3)):
        words, x = [], r.uniform(0.07, 0.10)
        for t in [r.choice(_TX_VOCAB) for _ in range(r.randint(5, 9))]:
            words.append((x, t))
            x += 0.0105 * len(t) + 0.008
        add_line(words, li)
        prose_ids.append(f"l{li}")
        li += 1
        y += r.uniform(0.022, 0.032)

    layout_ids = []
    if r.random() < 0.5:
        blocks.append({
            "BlockType": "LAYOUT_TEXT", "Id": "lay0", "Page": 1,
            "Geometry": {"BoundingBox": {
                "Left": 0.05, "Top": 0.03, "Width": 0.9, "Height": 0.9},
                "Polygon": [{"X": 0.05, "Y": 0.03},
                            {"X": 0.95, "Y": 0.03},
                            {"X": 0.95, "Y": 0.93},
                            {"X": 0.05, "Y": 0.93}]},
            "Relationships": [{"Type": "CHILD", "Ids": prose_ids}]})
        layout_ids.append("lay0")
    blocks.append({
        "BlockType": "PAGE", "Id": "page0", "Page": 1,
        "Geometry": {"Polygon": [
            {"X": 0, "Y": 0}, {"X": 1, "Y": 0},
            {"X": 1, "Y": 1}, {"X": 0, "Y": 1}]},
        "Relationships": [{"Type": "CHILD",
                           "Ids": line_ids + layout_ids}]})
    return _json.dumps({"DetectDocumentTextModelVersion": "1.0",
                        "Blocks": blocks}), 1


@pytest.mark.parametrize("seed", [0, 4, 9, 17])
def test_textract_table_parity(seed, tmp_path):
    """Cloud-import × table interaction (VERDICT r4 #6): 24 seeds
    fuzzed byte-identical (txt + md) vs the live reference via the
    paired-PDF harness on the first run."""
    js, n_pages = _gen_textract_table(seed)
    _check_textract_pair(js, n_pages, tmp_path, f"txt{seed}")


# ---------------------------------------------------------------------
# Google Vision paired import (convertPageGoogleVision.js:21-220): JSON
# + blank PDF for page metrics.  Fuzz axes: wrapper variants (bare /
# responses[] incl. pageNumber-sorted multi-page / bare array),
# vertices vs normalizedVertices (falsy-zero coordinate keys omitted),
# detectedBreak line cutting (LINE_BREAK / EOL_SURE_SPACE cut; SPACE /
# SURE_SPACE / HYPHEN do not), blockType -> par.reason, falsy-zero and
# missing confidences, empty paragraphs / symbol-less words /
# paragraph-less blocks (all skipped), median-height asc/baseline
# metrics, pageDims scaling vs the paired PDF.


def _gen_gvision(seed):
    """Random Google Vision fullTextAnnotation JSON (absolute-pixel or
    normalized vertices) + its page count."""
    import json as _json
    r = random.Random(seed)
    n_pages = r.choice([1, 1, 2])
    vis_w, vis_h = r.choice([(1000, 1400), (2550, 3300), (816, 1056)])
    use_norm = r.random() < 0.35

    def bbox_obj(x0, y0, x1, y1):
        pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        if use_norm:
            return {"normalizedVertices":
                    [{"x": round(x / vis_w, 6), "y": round(y / vis_h, 6)}
                     for x, y in pts]}
        out = []
        for x, y in pts:
            v = {}
            xi, yi = int(round(x)), int(round(y))
            if xi:                       # falsy-zero keys omitted
                v["x"] = xi
            if yi:
                v["y"] = yi
            out.append(v)
        return {"vertices": out}

    responses = []
    for p in range(n_pages):
        blocks = []
        y = r.uniform(0.06, 0.10) * vis_h
        for _bi in range(r.randint(1, 3)):
            if r.random() < 0.05:
                blocks.append({"blockType": "PICTURE"})  # no paragraphs
                continue
            paragraphs = []
            for _pi in range(r.randint(1, 3)):
                words = []
                wboxes = []
                for li in range(r.randint(1, 4)):
                    x = r.uniform(0.06, 0.12) * vis_w
                    h = r.uniform(0.014, 0.020) * vis_h
                    n_words = r.randint(1, 6)
                    for wi in range(n_words):
                        t = r.choice(_TX_VOCAB)
                        if r.random() < 0.08:
                            t = r.choice(_TX_SUPS)
                        if r.random() < 0.1:
                            t += r.choice([".", ",", ":", "?"])
                        ww = (0.011 * len(t) + r.uniform(0, 0.004)) * vis_w
                        has_desc = any(c in "gjpqy" for c in t)
                        has_asc = any(
                            c in "ABCDEFGHIKLMNOPRSTUVWXYZbdhklt0123456789"
                            for c in t)
                        top = y - (h * 0.55 if has_asc else h * 0.30)
                        bot = y + (h * 0.28 if has_desc else h * 0.02)
                        cw = ww / len(t)
                        last_of_line = wi == n_words - 1
                        symbols = []
                        for ci, ch in enumerate(t):
                            s = {"text": ch,
                                 "boundingBox": bbox_obj(
                                     x + ci * cw, top,
                                     x + (ci + 1) * cw, bot)}
                            if ci == len(t) - 1:
                                if last_of_line:
                                    br = r.choice(["LINE_BREAK",
                                                   "LINE_BREAK",
                                                   "EOL_SURE_SPACE"])
                                elif r.random() < 0.9:
                                    br = r.choice(["SPACE", "SPACE",
                                                   "SURE_SPACE",
                                                   "HYPHEN"])
                                else:
                                    br = None
                                if br:
                                    s["property"] = {
                                        "detectedBreak": {"type": br}}
                            symbols.append(s)
                        word = {"boundingBox": bbox_obj(x, top,
                                                        x + ww, bot),
                                "symbols": symbols}
                        c = r.choice([None, 0.0, 0.87, 0.9934, 1.0])
                        if c is not None:
                            word["confidence"] = c
                        if r.random() < 0.03:
                            word = {"boundingBox": word["boundingBox"],
                                    "symbols": []}     # skipped
                        else:
                            wboxes.append((x, top, x + ww, bot))
                        words.append(word)
                        x += ww + r.uniform(0.004, 0.012) * vis_w
                    y += r.uniform(0.025, 0.045) * vis_h
                if not wboxes:
                    continue
                px0 = min(b[0] for b in wboxes)
                py0 = min(b[1] for b in wboxes)
                px1 = max(b[2] for b in wboxes)
                py1 = max(b[3] for b in wboxes)
                paragraphs.append({"boundingBox": bbox_obj(px0, py0,
                                                           px1, py1),
                                   "words": words})
                if r.random() < 0.06:
                    paragraphs.append({
                        "boundingBox": bbox_obj(px0, py1 + 5,
                                                px1, py1 + 25),
                        "words": []})                  # skipped
                y += r.uniform(0.01, 0.03) * vis_h
            block = {"paragraphs": paragraphs}
            bt = r.choice([None, "TEXT", "TEXT", "TABLE"])
            if bt:
                block["blockType"] = bt
            blocks.append(block)
        page = {"width": vis_w, "height": vis_h, "blocks": blocks}
        responses.append({
            "fullTextAnnotation": {"pages": [page], "text": ""},
            "context": {"pageNumber": p + 1}})

    if n_pages > 1:
        order = list(range(n_pages))
        r.shuffle(order)               # importOCR.js:130-133 re-sorts
        js = _json.dumps({"responses": [responses[i] for i in order]})
    else:
        wrapper = r.choice(["bare", "responses", "array"])
        if wrapper == "bare":
            js = _json.dumps({"fullTextAnnotation":
                              responses[0]["fullTextAnnotation"]})
        elif wrapper == "responses":
            js = _json.dumps({"responses": responses})
        else:
            js = _json.dumps([{"fullTextAnnotation":
                               responses[0]["fullTextAnnotation"]}])
    return js, n_pages


def _check_gvision_pair(js, n_pages, tmp_path, name,
                        fmts=("text", "md"), page_wh=(612, 792)):
    from scribe_js_ray.sources import synth_pdf
    ow, oh = synth_pdf._PAGE_W, synth_pdf._PAGE_H
    synth_pdf._PAGE_W, synth_pdf._PAGE_H = page_wh
    try:
        pdf = synth_pdf._make_pdf([""] * n_pages, {})
    finally:
        synth_pdf._PAGE_W, synth_pdf._PAGE_H = ow, oh
    jp = tmp_path / f"{name}.json"
    pp = tmp_path / f"{name}.pdf"
    jp.write_text(js)
    pp.write_bytes(pdf)
    for fmt in fmts:
        ref = _ref_pair(fmt, str(pp), str(jp))
        ours = extract_document(
            "u", js.encode(), "", "eng", source_payload=pdf,
            emit_format="markdown" if fmt == "md" else "text")
        assert not ours["error"], ours["error"]
        assert ours["extracted_text"] == ref, f"{name} {fmt}"


@pytest.mark.parametrize("seed", [2, 7, 11, 19, 23, 29, 37, 41,
                                  53, 61, 67, 71, 83, 89, 97, 101])
def test_gvision_pair_parity(seed, tmp_path):
    js, n_pages = _gen_gvision(seed)
    _check_gvision_pair(js, n_pages, tmp_path, f"gv{seed}")


def test_gvision_scaled_dims_parity(tmp_path):
    """Vision dims != paired-PDF dims: coordinates scale by
    pageDims/visionDims (convertPageGoogleVision.js:43-44)."""
    js, n_pages = _gen_gvision(7)
    _check_gvision_pair(js, n_pages, tmp_path, "gvs",
                        fmts=("text",), page_wh=(842, 1191))


@pytest.mark.parametrize("seed", [0, 7, 13, 21, 28])
def test_textstate_fuzz_parity(seed, tmp_path):
    """Aggressive text-state operator fuzz (sink23): Tz scale chains,
    Ts rise runs, Tc/Tw spacing, TL+T*/TD flows, scaled Tm + mixed TJ
    arrays, '/" show operators — text AND markdown byte-identical vs
    the live reference (30-seed sweep clean at pin time)."""
    from scribe_js_ray.sources.synth_pdf import make_pdf_textstate
    import random as _random
    data = make_pdf_textstate(_random.Random(seed))
    p = tmp_path / f"ts{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"ts{seed} text"
    ours = extract_document("u", data, "", "eng", emit_format="markdown")
    assert ours["extracted_text"] == _ref_fmt(str(p), "md"), f"ts{seed} md"


@pytest.mark.parametrize("rot", [90, 180, 270])
def test_page_rotate_parity(rot, tmp_path):
    """/Rotate N pages: the base CTM un-rotates into the natural reading
    frame (parsePdfDoc.js:476, doc.py base-CTM comment) — reflowed text
    byte-identical vs the live reference (12-case sweep clean at pin
    time: rot 0/90/180/270 x 3 seeds)."""
    import random as _random

    from scribe_js_ray.sources.synth import _paragraph_words
    from scribe_js_ray.sources.synth_pdf import (_PAGE_H, _PAGE_W,
                                                 PdfWriter, _Typesetter)
    r = _random.Random(rot)
    ts = _Typesetter()
    ts.flow(_paragraph_words(r, 2))
    ts.y -= 10
    ts.flow(_paragraph_words(r, 1), font="F2", size=14)
    data = ts.stream().encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
           f"{_PAGE_H}] /Rotate {rot} /Resources << /Font "
           f"<< /F1 5 0 R /F2 6 0 R >> >> /Contents 4 0 R >>").encode())
    w.add(f"<< /Length {len(data)} >>\nstream\n".encode() + data
          + b"\nendstream")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
          b"/Encoding /WinAnsiEncoding >>")
    payload = w.build()
    p = tmp_path / f"rot{rot}.pdf"
    p.write_bytes(payload)
    assert extract_document("u", payload, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"rot{rot}"


@pytest.mark.parametrize("seed", [2, 9])
def test_encrypted_pdf_parity(seed, tmp_path):
    """Encrypted PDFs (sink24): RC4 R3, AES-128 V4/AESV2 and AES-256
    R5/R6 with the real-world indirect trailer ``/Encrypt N 0 R`` must
    extract byte-identically to their plaintext twin through BOTH
    engines; an INLINE trailer /Encrypt dict is ignored by the
    reference (pdfCrypto.js findEncryptRef :843 requires the N G R
    suffix), the streams stay ciphertext, and both engines export
    blank."""
    from test_pdf_crypto import (_encrypt_pdf_aes256, _encrypt_pdf_aesv2,
                                 _encrypt_pdf_rc4)

    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    plain = make_pdf_styles(random.Random(seed))
    pp = tmp_path / f"enc{seed}_plain.pdf"
    pp.write_bytes(plain)
    want = _ref_extract(str(pp))
    assert want, "plaintext twin must extract non-blank"
    variants = {
        "rc4": _encrypt_pdf_rc4(plain),
        "aesv2": _encrypt_pdf_aesv2(plain),
        "a5": _encrypt_pdf_aes256(plain, r=5),
        "a6": _encrypt_pdf_aes256(plain, r=6),
    }
    for name, enc in variants.items():
        p = tmp_path / f"enc{seed}_{name}.pdf"
        p.write_bytes(enc)
        assert _ref_extract(str(p)) == want, f"{name}: ref != plain ref"
        ours = extract_document("u", enc, "", "eng")
        assert ours["extracted_text"] == want, f"{name}: ours != ref"
        assert not ours.get("error"), f"{name}: {ours.get('error')}"
    inline = _encrypt_pdf_rc4(plain, indirect=False)
    p = tmp_path / f"enc{seed}_inline.pdf"
    p.write_bytes(inline)
    assert _ref_extract(str(p)) == ""
    assert extract_document("u", inline, "", "eng")["extracted_text"] \
        == ""


@pytest.mark.parametrize("seed", [0, 4, 9, 13])
def test_fontzoo_parity(seed, tmp_path):
    """Font-zoo battery (sink25): one page each of Type3 (CharProcs +
    FontMatrix + AGL /Differences), Type0/Identity-H via /ToUnicode,
    and a base-14 face with high-code /Differences remaps — text AND
    markdown byte-identical vs the live reference (16-seed sweep clean
    at pin time).  Previously these font families had only unit
    coverage (test_pdf.py)."""
    from scribe_js_ray.sources.synth_pdf import make_pdf_fontzoo
    data = make_pdf_fontzoo(random.Random(seed))
    p = tmp_path / f"zoo{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"zoo{seed} text"
    ours = extract_document("u", data, "", "eng", emit_format="markdown")
    assert ours["extracted_text"] == _ref_fmt(str(p), "md"), \
        f"zoo{seed} md"


@pytest.mark.parametrize("seed", [1, 3, 8, 17])
def test_xobject_parity(seed, tmp_path):
    """Form-XObject battery (sink26): q/cm-placed Do forms with own
    font resources, nested forms, a REPEATED Do (form executes once per
    page, chars append AFTER the page's own — extractFormXObjectText
    parsePdfDoc.js:329-372), Do-point text-state inheritance, inline
    BI/ID/EI images and an Image XObject — text AND markdown
    byte-identical vs the live reference (20-seed sweep clean at pin
    time).  Pinned with the r5 rewrite that replaced inline-at-Do
    recursion with the reference's separate appended form pass."""
    from scribe_js_ray.sources.synth_pdf import make_pdf_xobjects
    data = make_pdf_xobjects(random.Random(seed))
    p = tmp_path / f"xo{seed}.pdf"
    p.write_bytes(data)
    assert extract_document("u", data, "", "eng")["extracted_text"] \
        == _ref_extract(str(p)), f"xo{seed} text"
    ours = extract_document("u", data, "", "eng", emit_format="markdown")
    assert ours["extracted_text"] == _ref_fmt(str(p), "md"), \
        f"xo{seed} md"


@pytest.mark.parametrize("seed", [0, 3])
def test_modern_structure_parity(seed, tmp_path):
    """Modern-file-structure battery (sink27): the classic fixtures
    repacked into PDF 1.5 form — ObjStm container for every non-stream
    object, FlateDecode content, /XRef stream with and without the PNG
    Up predictor, split /Index, and junk before %PDF (header-adjusted
    offsets, parsePdfUtils.js parseXref:127) — must extract
    byte-identically to the live reference AND to their classic twins
    (40-case sweep clean at pin time)."""
    from scribe_js_ray.sources.synth_pdf import (make_pdf_fontzoo,
                                                 make_pdf_styles,
                                                 make_pdf_textstate,
                                                 make_pdf_xobjects,
                                                 repack_modern)
    for gen in (make_pdf_styles, make_pdf_fontzoo, make_pdf_xobjects,
                make_pdf_textstate):
        plain = gen(random.Random(seed))
        want = extract_document("u", plain, "", "eng")["extracted_text"]
        for name, kw in (("default", {}),
                         ("nopred", dict(predictor=False)),
                         ("split", dict(split_index=True)),
                         ("junk", dict(junk_prefix=b"JUNK\n%x\n"))):
            m = repack_modern(plain, **kw)
            p = tmp_path / f"{gen.__name__}_{name}.pdf"
            p.write_bytes(m)
            ref = _ref_extract(str(p))
            assert ref == want, f"{gen.__name__}/{name}: ref != classic"
            ours = extract_document("u", m, "", "eng")["extracted_text"]
            assert ours == ref, f"{gen.__name__}/{name}: ours != ref"


def _rewrite_startxref(data: bytes, new_value: int) -> bytes:
    import re as _re
    m = _re.search(rb"startxref\s*\n(\d+)", data)
    assert m
    return data[:m.start(1)] + str(new_value).encode() + data[m.end(1):]


@pytest.mark.parametrize("seed", [1, 6])
def test_xref_damage_parity(seed, tmp_path):
    """Damaged/unusual xref battery (sink28) vs the live reference:
    junk before %PDF on a CLASSIC table; startxref off by a few bytes
    (snap window, findXrefOffset:45-64); a bare xref table with no
    keyword/subsection header (parseBareXrefTable); a missing
    startxref (last-standalone-xref fallback); an incremental update
    whose newest section must shadow the original entry; the same
    update with a WRONG new offset (lazy whole-file repair,
    objectCache.js _repairXref); and a free-tombstone update whose
    deleted object the repair resurrects because the body is still
    live in the file."""
    import re as _re

    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    plain = make_pdf_styles(random.Random(seed))
    want = extract_document("u", plain, "", "eng")["extracted_text"]
    assert want

    cases: dict[str, bytes] = {}
    # 1. junk before %PDF, classic table (offsets header-relative)
    cases["junk_classic"] = b"NOISE\n%not-pdf\n" + plain
    # 2. startxref off by +6 / -5 (within the reference's 16-byte snap)
    m = _re.search(rb"startxref\s*\n(\d+)", plain)
    xref_pos = int(m.group(1))
    cases["offby_plus"] = _rewrite_startxref(plain, xref_pos + 6)
    cases["offby_minus"] = _rewrite_startxref(plain, xref_pos - 5)
    # 3. bare xref table: drop the "xref\n0 N\n" header lines; entries
    #    now begin exactly at the old keyword offset
    hm = _re.search(rb"xref\n0 \d+\n", plain)
    cases["bare"] = plain[:hm.start()] + plain[hm.end():]
    for name, payload in cases.items():
        p = tmp_path / f"{name}.pdf"
        p.write_bytes(payload)
        ref = _ref_extract(str(p))
        assert ref == want, f"{name}: ref broke ({len(ref)}B)"
        ours = extract_document("u", payload, "", "eng")["extracted_text"]
        assert ours == ref, f"{name}: ours != ref"
    # 4. no startxref at all: the reference ERRORS ("Could not find PDF
    #    Catalog") because findRootObjNum requires the keyword
    #    (parsePdfUtils.js:925-926) even though findXrefOffset's
    #    last-standalone-xref fallback could locate the table.  We
    #    mirror the error into the corpus error column.
    sm = _re.search(rb"startxref\s*\n\d+\n", plain)
    payload = plain[:sm.start()] + plain[sm.end():]
    p = tmp_path / "no_startxref.pdf"
    p.write_bytes(payload)
    r = subprocess.run(["node", HARNESS, str(p)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode != 0 and "Could not find PDF Catalog" in r.stderr
    row = extract_document("u", payload, "", "eng")
    assert row["extracted_text"] == ""
    assert "Could not find PDF Catalog" in row["error"]


@pytest.mark.parametrize("seed", [0, 5])
def test_file_topology_parity(seed, tmp_path):
    """File-topology battery (sink29) vs the live reference: the same
    document bytes routed through five real-world file layouts —
    linearized (two startxrefs, dummy ``startxref 0`` in the front
    section, /Prev chain from the front table to the end table),
    hybrid-reference (classic table whose trailer /XRefStm supplies the
    type-2 entries, ISO 32000-1 §7.5.8.4), RC4- and AESV2-encrypted
    modern structure (encrypted ObjStm container + direct streams,
    unencrypted /XRef stream per §7.5.8.2, /Encrypt ref in the xref
    stream dict), and encrypted hybrid.  All must extract
    byte-identically to the classic plaintext twin through BOTH
    engines (10-seed × styles/fontzoo sweep clean at pin time)."""
    from test_pdf_crypto import aesv2_material, rc4_material

    from scribe_js_ray.sources.synth_pdf import (linearize,
                                                 make_pdf_fontzoo,
                                                 make_pdf_styles,
                                                 repack_modern)
    for gen in (make_pdf_styles, make_pdf_fontzoo):
        plain = gen(random.Random(seed))
        want = extract_document("u", plain, "", "eng")["extracted_text"]
        assert want
        for name, payload in (
                ("linearized", linearize(plain)),
                ("hybrid", repack_modern(plain, hybrid=True)),
                ("enc_rc4", repack_modern(plain, encrypt=rc4_material())),
                ("enc_aesv2",
                 repack_modern(plain, encrypt=aesv2_material())),
                ("hybrid_enc", repack_modern(plain, hybrid=True,
                                             encrypt=rc4_material()))):
            p = tmp_path / f"{gen.__name__}_{name}.pdf"
            p.write_bytes(payload)
            ref = _ref_extract(str(p))
            assert ref == want, f"{gen.__name__}/{name}: ref != classic"
            ours = extract_document("u", payload, "", "eng")
            assert ours["extracted_text"] == ref, \
                f"{gen.__name__}/{name}: ours != ref ({ours['error']!r})"


def _ref_fmt_file(path: str, fmt: str) -> str:
    harness = HARNESS.replace("extract_text.mjs", "export_fmt.mjs")
    r = subprocess.run(["node", harness, path, fmt], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-400:]
    return r.stdout


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_hocr_alto_export_parity(seed, tmp_path):
    """Structural-export battery (sink31a): hOCR and ALTO exports are
    byte-identical to the live reference — full writeHocr head (font-
    state metas with the fontContainer.js:468-478 defaults, compact
    JSON.stringify layout metas), ECMA number formatting throughout,
    writeAlto processingDateTime/software identity — across the
    styles, fontzoo (Type3/Type0 with FontBBox-derived metrics) and
    textstate generators."""
    from scribe_js_ray.sources.synth_pdf import (make_pdf_fontzoo,
                                                 make_pdf_styles,
                                                 make_pdf_textstate)
    for gen in (make_pdf_styles, make_pdf_fontzoo, make_pdf_textstate):
        plain = gen(random.Random(seed))
        p = tmp_path / f"{gen.__name__}.pdf"
        p.write_bytes(plain)
        for fmt in ("hocr", "alto"):
            ref = _ref_fmt_file(str(p), fmt)
            ours = extract_document("u", plain, "", "eng",
                                    emit_format=fmt)["extracted_text"]
            assert ours == ref, f"{gen.__name__}/{fmt}"


def _fd_metrics_pdf(asc: int, desc: int, with_fd: bool = True,
                    n_words: int = 40) -> bytes:
    """Simple TrueType font with a FontDescriptor /Ascent //Descent —
    exercises the per-font metrics override (parsePdfFonts.js
    :1962-1963 nonzero rule) against the 800/-200 registry defaults."""
    from scribe_js_ray.sources.synth_pdf import (_PAGE_H, _PAGE_W,
                                                 PdfWriter)
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    words = " ".join(f"word{i}" for i in range(n_words))
    ops = []
    y = 700
    for i in range(0, n_words, 8):
        chunk = " ".join(f"word{j}" for j in range(i, min(i + 8, n_words)))
        ops.append(f"BT /F1 24 Tf 72 {y} Td ({chunk}) Tj ET")
        y -= 40
    stream = "\n".join(ops).encode()
    w.add(f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
          f"{_PAGE_H}] /Resources << /Font << /F1 5 0 R >> >> "
          f"/Contents 4 0 R >>".encode())
    w.add(b"<< /Length %d >>\nstream\n" % len(stream) + stream
          + b"\nendstream")
    wid = " ".join(["500"] * 95)
    fdref = " /FontDescriptor 6 0 R" if with_fd else ""
    w.add((f"<< /Type /Font /Subtype /TrueType /BaseFont /TestSans "
           f"/FirstChar 32 /LastChar 126 /Widths [{wid}]{fdref} "
           f">>").encode())
    if with_fd:
        w.add(f"<< /Type /FontDescriptor /FontName /TestSans /Flags 32 "
              f"/Ascent {asc} /Descent {desc} /ItalicAngle 0 /StemV 80 "
              f"/FontBBox [0 {desc} 600 {asc}] >>".encode())
    return w.build()


@pytest.mark.parametrize("asc,desc,with_fd", [
    (600, -300, True),   # explicit override
    (0, 0, True),        # zero values: nonzero rule keeps 800/-200
    (0, 0, False),       # no descriptor: registry defaults
])
def test_font_descriptor_metrics_parity(asc, desc, with_fd, tmp_path):
    """sink31b: FontDescriptor /Ascent //Descent drive every char/word/
    line bbox — text AND hOCR byte-identical to the live reference for
    override, zero-value and missing-descriptor cases."""
    payload = _fd_metrics_pdf(asc, desc, with_fd)
    p = tmp_path / "fd.pdf"
    p.write_bytes(payload)
    ref_txt = _ref_extract(str(p))
    row = extract_document("u", payload, "", "eng")
    assert row["extracted_text"] == ref_txt
    ref_hocr = _ref_fmt_file(str(p), "hocr")
    ours = extract_document("u", payload, "", "eng",
                            emit_format="hocr")["extracted_text"]
    assert ours == ref_hocr


def test_image_doc_skeleton_parity(tmp_path):
    """sink31c: an image-classified PDF (too little text for the
    native-text route) still exports the hOCR/ALTO page SKELETON —
    per-page empty containers sized from pageMetrics (writeHocr.js
    :67-71 !pageObj branch) — byte-identical to the live reference,
    and a VALID .scribe session with empty pages instead of an empty
    file."""
    payload = _fd_metrics_pdf(600, -300, True, n_words=5)
    p = tmp_path / "img.pdf"
    p.write_bytes(payload)
    row = extract_document("u", payload, "", "eng")
    assert row["doc_type"] == "image"
    for fmt in ("hocr", "alto"):
        ref = _ref_fmt_file(str(p), fmt)
        ours = extract_document("u", payload, "", "eng",
                                emit_format=fmt)["extracted_text"]
        assert ours == ref, fmt
    sc = extract_document("u", payload, "", "eng",
                          emit_format="scribe")["extracted_text"]
    from scribe_js_ray.stages.scribe_fmt import parse_scribe
    pages = parse_scribe(sc.encode("latin-1"))
    assert len(pages) == 1 and not pages[0].lines


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_char_metrics_meta_parity(seed, tmp_path):
    """sink31d: the hOCR export's ``font-metrics`` meta — the T5 char-
    metrics surface (fontStatistics.js calcCharMetricsFromPages) —
    byte-identical to the live reference for char-box-bearing imports:
    char-level hOCR ("Default" family) and Abbyy (named families with
    italic/bold splits).  Covers the per-(family,style) width/height/
    kerning medians, x-height vs ascender normalization, heightCaps
    renormalization of digits, kerning2 width subtraction, and the
    auto default-font pick."""
    import test_ref_parity  # noqa: F401  (harness path shared)

    from scribe_js_ray.sources.synth import make_hocr_charlevel
    for name, payload in (
            ("hocrchar", make_hocr_charlevel(random.Random(seed)).encode()),
            ("abbyy", _sink14_abbyy(random.Random(seed)))):
        data = payload if isinstance(payload, bytes) else payload.encode()
        p = tmp_path / f"{name}{'.hocr' if name == 'hocrchar' else '.xml'}"
        p.write_bytes(data)
        ref = _ref_fmt_file(str(p), "hocr")
        ours = extract_document("u", data, "", "eng",
                                emit_format="hocr")["extracted_text"]
        assert ours == ref, name
        assert "font-metrics" in ours and '"width"' in ours


@pytest.mark.parametrize("seed", [0, 1])
def test_scribe_fontstate_interop(seed, tmp_path):
    """sink31e: fontState (charMetrics + defaultFontName) persists
    through the .scribe session in BOTH directions, live: (a) our
    .scribe of an Abbyy import is read by the reference and its hOCR
    export byte-equals our scribe-restore → hOCR; (b) a reference-
    written .scribe restored by us re-emits the same hOCR as the
    reference restoring its own file (import.js:288-289,380-389)."""
    import base64

    abbyy = _sink14_abbyy(random.Random(seed))
    p = tmp_path / "in.xml"
    p.write_bytes(abbyy)

    sc = extract_document("u", abbyy, "", "eng",
                          emit_format="scribe")["extracted_text"]
    assert '"fontState"' in sc[:400]
    p2 = tmp_path / "ours.scribe"
    p2.write_bytes(sc.encode())
    ref_hocr = _ref_fmt_file(str(p2), "hocr")
    ours_hocr = extract_document("u", sc.encode(), "", "eng",
                                 emit_format="hocr")["extracted_text"]
    assert ours_hocr == ref_hocr
    assert '"width"' in ours_hocr  # metrics actually survived

    ref_scribe = base64.b64decode(_ref_fmt_file(str(p), "scribe"))
    p3 = tmp_path / "ref.scribe"
    p3.write_bytes(ref_scribe)
    ref_hocr2 = _ref_fmt_file(str(p3), "hocr")
    ours_hocr2 = extract_document("u", ref_scribe, "", "eng",
                                  emit_format="hocr")["extracted_text"]
    assert ours_hocr2 == ref_hocr2


def _docx_parts_equal(payload: bytes, suf: str, tmp_path) -> None:
    import base64
    import io
    import zipfile
    p = tmp_path / f"in{suf}"
    p.write_bytes(payload)
    ref = zipfile.ZipFile(io.BytesIO(
        base64.b64decode(_ref_fmt_file(str(p), "docx"))))
    ours = zipfile.ZipFile(io.BytesIO(
        extract_document("u", payload, "", "eng", emit_format="docx")
        ["extracted_text"].encode("latin-1")))
    assert set(ref.namelist()) == set(ours.namelist())
    for n in ref.namelist():
        assert ref.read(n) == ours.read(n), n


@pytest.mark.parametrize("seed", [0, 2])
def test_docx_export_parity(seed, tmp_path):
    """sink32a: the DOCX export is the reference's full Word package —
    every part's bytes equal the reference's (document.xml between the
    captured envelopes, footnotes.xml, the 10 fixed resource parts;
    only the zip container differs).  21-case sweep over 7 generators
    clean at pin time."""
    from scribe_js_ray.sources.synth_pdf import (make_pdf_styles,
                                                 make_pdf_textstate)
    _docx_parts_equal(make_pdf_styles(random.Random(seed)), ".pdf",
                      tmp_path)
    _docx_parts_equal(make_pdf_textstate(random.Random(seed)), ".pdf",
                      tmp_path)
    _docx_parts_equal(_sink14_abbyy(random.Random(seed)), ".xml",
                      tmp_path)


def test_docx_footnote_roundtrip_parity(tmp_path):
    """sink32b: a Word document with REAL footnotes imports with the
    bidirectional marker<->note link (convertDocDocx.js:924-929) and
    re-exports byte-identical through both engines — the
    footnoteReference run, the renumbered word/footnotes.xml entry,
    and the reflowed text/markdown all match the live reference."""
    import gzip as _gzip
    import json as _json
    import zipfile
    import io
    parts = _json.load(_gzip.open(
        "/root/repo/scribe_js_ray/data/docx_ref_parts.json.gz", "rt"))
    body = (
        '<w:p><w:r><w:t xml:space="preserve">Body text with a note'
        '</w:t></w:r><w:r><w:rPr><w:rStyle w:val="FootnoteReference"/>'
        '<w:vertAlign w:val="superscript"/></w:rPr>'
        '<w:footnoteReference w:id="1"/></w:r>'
        '<w:r><w:t xml:space="preserve"> and more text after.</w:t>'
        '</w:r></w:p><w:p><w:r><w:t xml:space="preserve">Second '
        'paragraph of body.</w:t></w:r></w:p>')
    fn = ('<w:footnote w:id="1"><w:p><w:pPr><w:pStyle '
          'w:val="FootnoteText"/></w:pPr><w:r><w:rPr><w:rStyle '
          'w:val="FootnoteReference"/></w:rPr><w:footnoteRef/></w:r>'
          '<w:r><w:t xml:space="preserve"> The footnote body text here.'
          '</w:t></w:r></w:p></w:footnote>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml",
                   parts["document_start"] + body + parts["document_end"])
        z.writestr("word/footnotes.xml",
                   parts["footnotes_start"] + fn + parts["footnotes_end"])
        for n, c in parts["static_parts"].items():
            if n != "word/footnotes.xml":
                z.writestr(n, c)
    docx_in = buf.getvalue()
    _docx_parts_equal(docx_in, ".docx", tmp_path)
    # the re-export really carries a linked footnote
    ours = extract_document("u", docx_in, "", "eng",
                            emit_format="docx")["extracted_text"]
    oz = zipfile.ZipFile(io.BytesIO(ours.encode("latin-1")))
    assert "footnoteReference" in oz.read("word/document.xml").decode()
    p = tmp_path / "in.docx"
    for fmt, ours_fmt in (("text", "text"), ("md", "markdown")):
        ref = _ref_fmt_file(str(p), fmt)
        got = extract_document("u", docx_in, "", "eng",
                               emit_format=ours_fmt)["extracted_text"]
        assert got == ref, fmt


@pytest.mark.parametrize("genname,seed", [("_sink15_pdf", 0),
                                          ("_sink16_pdf", 1),
                                          ("_sink22_pdf", 0)])
def test_xlsx_export_parity(genname, seed, tmp_path):
    """sink32c: the XLSX export is the reference's full package —
    sheet1.xml between the captured writeTabular envelopes with the
    exact cell/run semantics (empty cells omitted, per-cell left sort,
    the never-updated fontStylePrev run-splitting rule, continuous row
    numbers across pages and tables) plus the 8 fixed parts, every
    part byte-identical (8-case sweep clean at pin time)."""
    import base64
    import io
    import zipfile
    payload = globals()[genname](random.Random(seed))
    if isinstance(payload, tuple):
        payload = payload[0]
    p = tmp_path / "in.pdf"
    p.write_bytes(payload)
    ref = zipfile.ZipFile(io.BytesIO(
        base64.b64decode(_ref_fmt_file(str(p), "xlsx"))))
    ours = zipfile.ZipFile(io.BytesIO(extract_document(
        "u", payload, "", "eng", emit_format="xlsx",
        emit_opts={"xlsx_filename_column": False})
        ["extracted_text"].encode("latin-1")))
    assert set(ref.namelist()) == set(ours.namelist())
    for n in ref.namelist():
        assert ref.read(n) == ours.read(n), n


@pytest.mark.parametrize("seed", [1, 3])
def test_pdf_export_cross_engine(seed, tmp_path):
    """sink33: cross-engine PDF-export interop — the reference reading
    OUR exported PDF extracts exactly what it extracts from ITS OWN
    export of the same source, and we read the reference's export to
    the same text (the shared invariant; both exports quantize
    geometry, so the roundtrip text is compared engine-to-engine, not
    to the source)."""
    import base64

    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    # Abbyy pinned at seed 1 only: other seeds draw smallCaps words,
    # which the reference's own pdf export mangles in this sandbox
    # (writePdf measures smallCaps against loaded font programs, absent
    # here — its own roundtrip yields "T S T S T T" for such words
    # while ours keeps the text; an environment artifact, not parity).
    gens = [(make_pdf_styles, ".pdf", seed)] + \
        ([(_sink14_abbyy, ".xml", 1)] if seed == 1 else [])
    for gen, suf, gseed in gens:
        src = gen(random.Random(gseed))
        ours_pdf = extract_document(
            "u", src, "", "eng",
            emit_format="pdf")["extracted_text"].encode("latin-1")
        p1 = tmp_path / f"ours_{gen.__name__}.pdf"
        p1.write_bytes(ours_pdf)
        p2 = tmp_path / f"src_{gen.__name__}{suf}"
        p2.write_bytes(src)
        ref_pdf = base64.b64decode(_ref_fmt_file(str(p2), "pdf"))
        p3 = tmp_path / f"ref_{gen.__name__}.pdf"
        p3.write_bytes(ref_pdf)
        ref_rt = _ref_extract(str(p3))
        assert _ref_extract(str(p1)) == ref_rt, \
            f"{gen.__name__}: ref reads ours != ref reads its own"
        got = extract_document("u", ref_pdf, "", "eng")["extracted_text"]
        assert got == ref_rt, f"{gen.__name__}: we read ref-export"


def test_debug_csv_parity(tmp_path):
    """sink34: the debug-CSV export byte-equals the reference's
    writeDebugCsv — the full OcrWord field surface serialized per row
    (field order, escapeCsvField semantics incl. quoted JSON objects
    and bare undefined styleRuns, ECMA numbers, '#000000' default
    color, char-level hOCR words carrying their raw span markup in
    debug.raw).  Harness: tests/refharness/export_debug_csv.mjs
    (8-input sweep clean at pin time)."""
    from scribe_js_ray.sources.synth import make_hocr_charlevel
    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    harness = HARNESS.replace("extract_text.mjs", "export_debug_csv.mjs")
    for name, payload, suf in (
            ("pdf", make_pdf_styles(random.Random(1)), ".pdf"),
            ("abbyy", _sink14_abbyy(random.Random(0)), ".xml"),
            ("hocrchar",
             make_hocr_charlevel(random.Random(0)).encode(), ".hocr")):
        p = tmp_path / f"{name}{suf}"
        p.write_bytes(payload)
        r = subprocess.run(["node", harness, str(p)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr[-300:]
        ours = extract_document("u", payload, "", "eng",
                                emit_format="debug_csv")["extracted_text"]
        assert ours == r.stdout, name


@pytest.mark.parametrize("seed", [4, 9])
def test_torture_mutation_parity(seed, tmp_path):
    """Byte-level torture battery (sink30) vs the live reference:
    \\r-only EOLs in the xref/trailer tail; %-comments between objects
    and inside an (uncompressed) content stream; /Length short and
    long by 10 (both engines re-find ``endstream``); a generation-
    bumped shadowing update (both engines emit the SAME product);
    binary garbage appended after %%EOF; and a tail truncation that
    cuts ``startxref`` mid-trailer — an ERROR through both engines
    ("Could not find PDF Catalog")."""
    import re as _re

    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    plain = make_pdf_styles(random.Random(seed))
    want = extract_document("u", plain, "", "eng")["extracted_text"]
    assert want

    cases: dict[str, bytes] = {}
    m = _re.search(rb"xref\n", plain)
    cases["cr_xref"] = plain[:m.start()] + \
        plain[m.start():].replace(b"\n", b"\r")
    cases["comments"] = plain.replace(
        b"endobj\n", b"endobj\n% interstitial comment\n", 3)
    lm = _re.search(rb"/Length (\d+) >>\nstream\n", plain)
    for name, delta in (("len_short", -10), ("len_long", 10)):
        cases[name] = (plain[:lm.start(1)]
                       + str(int(lm.group(1)) + delta).encode()
                       + plain[lm.end(1):])
    start, ln = lm.end(), int(lm.group(1))
    body = plain[start:start + ln]
    newbody = body.replace(b"BT", b"% op comment\nBT", 1)
    cases["stream_comment"] = (
        plain[:lm.start(1)] + str(len(newbody)).encode()
        + plain[lm.end(1):start] + newbody + plain[start + ln:])
    cases["trailing_garbage"] = plain + \
        b"\x00\xff\xfe garbage after EOF \x80" * 4
    sx = _re.search(rb"startxref\s*\n(\d+)", plain)
    ns = b"BT /F1 11 Tf 72 700 Td (GenTwo body) Tj ET"
    newobj = (b"4 1 obj\n<< /Length %d >>\nstream\n" % len(ns)
              + ns + b"\nendstream\nendobj\n")
    sz = int(_re.search(rb"/Size (\d+)", plain).group(1))
    cases["gen_shadow"] = plain + newobj + (
        b"xref\n4 1\n" + b"%010d 00001 n \n" % len(plain)
        + b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
          b"startxref\n%d\n%%%%EOF\n"
        % (sz, int(sx.group(1)), len(plain) + len(newobj)))

    for name, payload in cases.items():
        p = tmp_path / f"{name}.pdf"
        p.write_bytes(payload)
        ref = _ref_extract(str(p))
        ours = extract_document("u", payload, "", "eng")
        assert ours["extracted_text"] == ref, \
            f"{name}: ours != ref ({ours['error']!r})"

    # tail truncation: error through BOTH engines
    payload = plain[:-40]
    p = tmp_path / "truncated_tail.pdf"
    p.write_bytes(payload)
    r = subprocess.run(["node", HARNESS, str(p)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode != 0
    row = extract_document("u", payload, "", "eng")
    assert row["extracted_text"] == "" and row["error"]


@pytest.mark.parametrize("mode", ["update", "stale", "free"])
def test_incremental_update_parity(mode, tmp_path):
    """Incremental-save battery (sink28b): append a replacement content
    stream + a new xref section with /Prev.  'update' = well-formed
    (newest section wins); 'stale' = the new entry's offset is wrong by
    3 bytes (both engines must lazily repair by whole-file scan and read
    the NEWEST body); 'free' = the update marks the content object free
    — the tombstone shadows the live entry, then repair resurrects the
    object because its body is still in the file (objectCache.js
    _repairXref "trust the file")."""
    import re as _re

    from scribe_js_ray.sources.synth_pdf import (_PAGE_H, _PAGE_W,
                                                 make_pdf_simple)
    plain = make_pdf_simple(random.Random(11))
    # make_pdf_simple: obj 4 is the page's content stream
    new_stream = b"BT /F1 11 Tf 72 720 Td (Replaced body text) Tj ET"
    newobj = (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_stream)
              + new_stream + b"\nendstream\nendobj\n")
    m = _re.search(rb"startxref\s*\n(\d+)", plain)
    old_xref = int(m.group(1))
    base = plain
    new_off = len(base)
    if mode == "stale":
        entry_off = new_off + 3   # wrong: forces the repair scan
    else:
        entry_off = new_off
    size_m = _re.search(rb"/Size (\d+)", plain)
    size = int(size_m.group(1))
    if mode == "free":
        entry = b"0000000000 00001 f \n"
    else:
        entry = b"%010d 00000 n \n" % entry_off
    upd = (newobj + b"xref\n4 1\n" + entry
           + b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
             b"startxref\n%d\n%%%%EOF\n"
           % (size, old_xref, new_off + len(newobj)))
    payload = base + upd
    p = tmp_path / f"incr_{mode}.pdf"
    p.write_bytes(payload)
    ref = _ref_extract(str(p))
    ours = extract_document("u", payload, "", "eng")["extracted_text"]
    assert ours == ref, f"{mode}: ours != ref"
    if mode in ("update", "stale"):
        assert "Replaced body text" in ref, f"{mode}: ref kept old body"
