"""Positioned-viewer HTML export (writeHtml.js port) — byte-parity vs the
LIVE reference plus unit coverage of the metric plumbing.

The html format measures EVERY word against the raw font registry
(advances, bearings, os2 boxes) and interpolates raw float px values into
the style attributes, so byte-identity here pins the whole
fontregistry.py + html_viewer.py stack: family resolution, font-size
inference from asc/x-heights, charSpacing math, JS number formatting."""

import random
import shutil
import subprocess

import pytest

from scribe_js_ray.pipelines.extract import extract_document

HARNESS = "/root/repo/tests/refharness/export_fmt.mjs"
REF = "/root/reference/scribe.js"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not __import__("os").path.exists(REF),
    reason="node or reference checkout unavailable")


def _ref_html(path: str) -> str:
    # REF_OUT file sink: large exports overflow the 64 KiB pipe buffer and
    # worker-thread diagnostics interleave on stdout.
    import os
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as f:
        outp = f.name
    try:
        r = subprocess.run(["node", HARNESS, path, "html"],
                           capture_output=True, text=True, timeout=120,
                           env=dict(os.environ, REF_OUT=outp))
        assert r.returncode == 0, r.stderr[-500:]
        with open(outp) as f:
            return f.read()
    finally:
        os.unlink(outp)


def _check(payload: bytes, ext: str, tmp_path, name: str):
    p = tmp_path / f"{name}.{ext}"
    p.write_bytes(payload)
    ref = _ref_html(str(p))
    res = extract_document("u", payload, "", "eng",
                           emit_format="html_viewer")
    assert not res.get("error"), res.get("error")
    ours = res["extracted_text"]
    assert ours == ref, f"{name}: ours {len(ours)}B != ref {len(ref)}B"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_html_viewer_pdf_parity(seed, tmp_path):
    """Native-text PDFs: ids, base-14 advance metrics, bearings-included
    (visualCoords=false) charSpacing, bold/italic face resolution."""
    from scribe_js_ray.sources.synth_pdf import make_pdf_styles
    _check(make_pdf_styles(random.Random(seed)), "pdf", tmp_path,
           f"hvp{seed}")


def test_html_viewer_sink_pdf_parity(tmp_path):
    """Kitchen-sink PDFs (fractional sizes, superscripts, tables,
    two-column): drove the Math.round (half-up) fixes in assemble —
    banker's rounding had every knife-edge .5 coordinate off by one."""
    import random as _r
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import test_ref_parity as T
    _check(T._sink5_pdf(_r.Random(0)), "pdf", tmp_path, "hvs5")
    _check(T._sink15_pdf(_r.Random(1)), "pdf", tmp_path, "hvs15")
    # sink8 seed 9 pinned the float-op-order port: the 'New' word's
    # right edge lands on an exact .5 px boundary that only the
    # reference-ordered product chain rounds up.
    _check(T._sink8_pdf(_r.Random(9)), "pdf", tmp_path, "hvs8u")
    # image-native PDF: the reference still emits the writeHtml skeleton
    _check(T._sink2_pdf(_r.Random(2)), "pdf", tmp_path, "hvimg")
    for nm, payload in T._stress_pdfs(3).items():
        _check(payload, "pdf", tmp_path, f"hvx_{nm}")


@pytest.mark.parametrize("seed", [0, 3, 7, 11])
def test_html_viewer_hocr_parity(seed, tmp_path):
    """hOCR imports: visualCoords=true bearing trimming, asc/x-height
    font-size inference, source-id preservation."""
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    _check(make_hocr_paragraphs(random.Random(seed)).encode(), "hocr",
           tmp_path, f"hvh{seed}")


def test_html_viewer_txt_parity(tmp_path):
    """Plain-text imports now typeset against the real NimbusRoman
    metrics (exact convertPageText port), so the positioned output is
    byte-identical too — incl. tab .notdef advances, indent-preserving
    leading whitespace, oversized-word force-place, and multi-page flow
    past the 64 KiB pipe limit the harness used to truncate at."""
    import random as _r
    from scribe_js_ray.sources.synth import _paragraph_words
    r = _r.Random(11)
    _check(("\n\n".join(" ".join(_paragraph_words(r, 2))
                        for _ in range(3))).encode(), "txt", tmp_path, "hvt1")
    _check(b"col1\tcol2\tcol3\nind:    four spaces   gap  end",
           "txt", tmp_path, "hvt2")
    _check(("          deeply indented start\n" + " " * 300
            + "oversized-lead rest dropped\n" + "x" * 400).encode(),
           "txt", tmp_path, "hvt3")
    long_doc = "\n\n".join(" ".join(_paragraph_words(r, 6))
                           for _ in range(20))
    _check(long_doc.encode(), "txt", tmp_path, "hvt4")


def test_html_viewer_docx_parity(tmp_path):
    """DOCX imports: the styled typesetter now measures with the real
    registry metrics — per-run w:sz widths, sup boxes, cross-run merges
    and rounded-right-edge currentX snaps all land byte-identical."""
    import random as _r
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from scribe_js_ray.sources.synth import make_hocr_paragraphs
    from scribe_js_ray.stages.docx import write_docx
    from scribe_js_ray.stages.hocr import parse_hocr_page
    import test_ref_parity as T
    page, _ = parse_hocr_page(make_hocr_paragraphs(_r.Random(1)), 0)
    _check(write_docx([page]), "docx", tmp_path, "hvd1")
    _check(T._sink12_docx(_r.Random(0)), "docx", tmp_path, "hvd2")
    _check(T._sink14_docx(_r.Random(1)), "docx", tmp_path, "hvd3")


def test_html_viewer_stext_abbyy_parity(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_formats import make_abbyy, make_stext
    _check(make_stext([["Hello", "world."],
                       ["Second", "line", "here."]]).encode(),
           "stext", tmp_path, "hvst")
    _check(make_abbyy([[("Hello", None), ("world.", None)],
                       [("Second", None), ("line", None),
                        ("here.", None)]]).encode(),
           "xml", tmp_path, "hvab")


@pytest.mark.parametrize("seed", [2, 11])
def test_html_viewer_gvision_pair_parity(seed, tmp_path):
    """Cloud-OCR (Google Vision) paired imports through the pair harness
    (the reference needs the PDF for page metrics; writeHtml needs the
    font registry loaded explicitly on this path)."""
    import os
    import sys
    import tempfile
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import test_ref_parity as T
    from scribe_js_ray.sources import synth_pdf
    js, n_pages = T._gen_gvision(seed)
    pdf = synth_pdf._make_pdf([""] * n_pages, {})
    jp = tmp_path / f"gv{seed}.json"
    pp = tmp_path / f"gv{seed}.pdf"
    jp.write_text(js)
    pp.write_bytes(pdf)
    with tempfile.NamedTemporaryFile(suffix=".out", delete=False) as f:
        outp = f.name
    r = subprocess.run(
        ["node", HARNESS.replace("export_fmt.mjs", "extract_pair.mjs"),
         "html", str(pp), str(jp)],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, REF_OUT=outp))
    assert r.returncode == 0, r.stderr[-500:]
    with open(outp, encoding="utf-8") as f:
        ref = f.read()
    os.unlink(outp)
    res = extract_document("u", js.encode(), "", "eng", source_payload=pdf,
                           emit_format="html_viewer")
    assert not res.get("error"), res.get("error")
    assert res["extracted_text"] == ref


def test_base14_widths_match_reference_afm():
    """Spot-pin the regenerated width tables (the old tables carried
    regular-weight values for the bold faces — parsePdfDoc advances were
    off by up to 55/1000 em per glyph)."""
    from scribe_js_ray.stages.pdf.widths import (base14_widths,
                                                 normalize_base14_name,
                                                 std_widths_by_code)
    hb = base14_widths("Helvetica-Bold")
    assert [hb[c] for c in "Know"] == [722, 611, 611, 778]
    assert base14_widths("Helvetica")["K"] == 667
    cw, dflt = std_widths_by_code("Arial-BoldMT")
    assert cw[ord("A")] == 722
    assert 500 < dflt < 600
    # WinAnsi high range is populated (the old tables stopped at 126).
    assert cw[0x80] == 556  # Euro
    assert normalize_base14_name("TimesNewRomanPS-ItalicMT") == "Times-Italic"
    assert normalize_base14_name("Symbol") == "Symbol"
    assert normalize_base14_name("FooSans") is None
    sym, _ = std_widths_by_code("Symbol")
    assert sym[ord("a")] == 631  # alpha, not Helvetica 'a'


def test_js_num_formatting():
    """ECMA Number::toString vs Python repr differences the byte-parity
    depends on."""
    from scribe_js_ray.stages.fontregistry import (format_num, js_num,
                                                   js_to_fixed)
    assert js_num(12.0) == "12"
    assert js_num(0.000001) == "0.000001"
    assert js_num(1e-7) == "1e-7"
    assert js_num(1e21) == "1e+21"
    assert js_num(-0.0) == "0"
    assert js_num(12.345) == "12.345"
    assert js_num(204.15) == "204.15"
    assert js_to_fixed(-1e-7, 5) == "-0.00000"
    assert format_num(-1e-7) == "-0"
    assert format_num(-0.05) == "-0.05"
    assert format_num(10.0) == "10"
    assert format_num(0.10000) == "0.1"
    assert js_to_fixed(2.675, 2) == "2.67"  # true double is 2.67499999...


def test_update_line_bbox_adjusts_baseline():
    """ocrObjects.js updateLineBbox keeps the baseline at the same
    absolute y when the recomputed bbox bottom moves."""
    from scribe_js_ray.model import BBox, Line, Page, Word, update_line_bbox
    page = Page(0, 1000, 1000)
    line = Line(page, BBox(0, 100, 200, 210), [0, -10])
    w = Word(line, "w1", "Hi", BBox(10, 140, 60, 200))
    line.words.append(w)
    update_line_bbox(line)
    assert line.bbox.bottom == 200
    assert line.baseline[1] == 0


@pytest.mark.parametrize("seed", [1, 9, 15])
def test_html_viewer_textstate_parity(seed, tmp_path):
    """Positioned-HTML parity under the sink23 text-state fuzz — the
    coordinate surface catches per-glyph float divergence the reflowed
    text cannot (16-seed html+md sweep clean at pin time)."""
    from scribe_js_ray.sources.synth_pdf import make_pdf_textstate
    _check(make_pdf_textstate(random.Random(seed)), "pdf", tmp_path,
           f"hvts{seed}")
