"""Property-based tests (hypothesis) for parser/emit invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from scribe_js_ray.model import page_text
from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.emit import write_text_spans
from scribe_js_ray.stages.exports import write_hocr, write_markdown
from scribe_js_ray.stages.hocr import parse_hocr_page
from scribe_js_ray.stages.serialize import pages_to_py, py_to_pages
from scribe_js_ray.stages.textlayout import parse_text_pages

from tests.test_formats import make_alto

_WORD = st.text(alphabet=string.ascii_letters + string.digits,
                min_size=1, max_size=12)
_WORDS = st.lists(_WORD, min_size=1, max_size=60)


@settings(max_examples=40, deadline=None)
@given(_WORDS)
def test_textlayout_reflow_roundtrip(words):
    """Single-spaced text survives typeset → reflow byte-identically."""
    text = " ".join(words)
    pages = parse_text_pages(text)
    out, spans = write_text_spans(pages, reflow_text=True)
    assert out == text
    if spans:
        blob = out.encode("utf-8")
        for s in spans:
            assert 0 <= s["start"] <= s["end"] <= len(blob)


@settings(max_examples=30, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=5))
def test_textlayout_paragraphs_roundtrip(lines):
    text = "\n".join(" ".join(ws) for ws in lines)
    pages = parse_text_pages(text)
    out, _ = write_text_spans(pages, reflow_text=True)
    assert out == text


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_alto_hocr_roundtrip_chain(lines):
    """ALTO parse → hOCR write → hOCR parse preserves text exactly."""
    xml = make_alto([[(w, {}) for w in ws] for ws in lines])
    page, _ = parse_alto_page(xml, 0)
    hocr = write_hocr([page])
    reparsed, _ = parse_hocr_page(hocr, 0)
    assert page_text(reparsed) == page_text(page)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=8),
                min_size=1, max_size=6))
def test_serialize_roundtrip_any_page(lines):
    xml = make_alto([[(w, {}) for w in ws] for ws in lines])
    page, _ = parse_alto_page(xml, 0)
    restored = py_to_pages(pages_to_py([page]))
    assert page_text(restored[0]) == page_text(page)


@settings(max_examples=30, deadline=None)
@given(_WORDS)
def test_markdown_never_raises_and_escapes(words):
    xml = make_alto([[(w, {}) for w in words[:8]]])
    page, _ = parse_alto_page(xml, 0)
    md = write_markdown([page])
    assert isinstance(md, str)
    # unescaped markdown metacharacters never leak from word text
    for token in md.split():
        assert not token.startswith("**") or token.count("*") % 2 == 0


# ---------------------------------------------------------------------------
# r2: glyph-assembly + PDF-parse robustness


_GLYPH = st.tuples(
    st.text(alphabet=st.characters(min_codepoint=0x20,
                                   max_codepoint=0x2FFF),
            min_size=1, max_size=1),
    st.floats(0, 600, allow_nan=False),      # x
    st.floats(0, 790, allow_nan=False),      # y
    st.floats(0.1, 30, allow_nan=False),     # width
    st.floats(1, 40, allow_nan=False),       # size
    st.sampled_from([0, 1, 2, 3]),           # orientation
    st.booleans(),                           # bold
)


@given(st.lists(_GLYPH, max_size=60))
@settings(max_examples=60, deadline=None)
def test_assemble_never_crashes_and_preserves_glyphs(glyphs):
    from scribe_js_ray.stages.pdf.assemble import group_chars_into_page
    from scribe_js_ray.stages.pdf.content import PositionedChar
    from scribe_js_ray.model import page_text

    chars = [PositionedChar(t, x, y, w, s, "F", b, False, False,
                            orientation=o)
             for (t, x, y, w, s, o, b) in glyphs]
    page = group_chars_into_page(chars, 0, 612, 792, 1.0)
    # every page structure is internally consistent
    for ln in page.lines:
        assert ln.words
        for wd in ln.words:
            assert wd.text.strip()
    # no visible glyph text is invented: output chars ⊆ input multiset
    # (ligature expansion can only grow from known ligature inputs,
    # lowercase restore maps A->a, so compare case-insensitively and
    # skip ligature-bearing inputs)
    in_chars = [t for (t, *_rest) in glyphs if not t.isspace()]
    if not any(c in "ﬁﬂﬀﬃﬅﬆﬄ" for c in in_chars):
        out = page_text(page).replace(" ", "").replace("\n", "").lower()
        pool = sorted(c.lower() for c in in_chars)
        assert sorted(out) <= pool or len(out) <= len(pool)


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_pdf_mutation_fuzz_never_escapes(data):
    """Random byte mutations of a valid PDF must land in the error column
    or produce a page tree — never raise out of extract_document."""
    from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
    from scribe_js_ray.pipelines.extract import extract_document

    ts = _Typesetter()
    ts.line("Fuzz seed content line", font="F1")
    pdf = bytearray(_make_pdf([ts.stream()], {"F1": "Helvetica"}))
    n_mut = data.draw(st.integers(1, 12))
    for _ in range(n_mut):
        pos = data.draw(st.integers(0, len(pdf) - 1))
        pdf[pos] = data.draw(st.integers(0, 255))
    res = extract_document("fuzz", bytes(pdf), "", "")
    assert isinstance(res["extracted_text"], str)
    assert isinstance(res["error"], str)


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 24), st.integers(2, 24), st.sampled_from([1, 2, 3, 4]),
       st.sampled_from([0, 1, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, channels, filter_type, seed):
    """Any image, any channel layout, any row filter → bit-exact PNG
    round-trip through the stdlib codec."""
    import numpy as np

    from scribe_js_ray.stages.codecs import png_decode, png_encode
    px = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, channels), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px, filter_type)), px)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1,
                max_size=200),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_property(samples, rate):
    """Any float window round-trips through 16-bit WAV within one
    quantization step."""
    import numpy as np

    from scribe_js_ray.stages.codecs import wav_decode, wav_encode
    out, r = wav_decode(wav_encode(np.array(samples, np.float32), rate))
    assert r == rate
    assert np.allclose(out, np.clip(samples, -1, 32767 / 32768),
                       atol=1.5 / 32768)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_media_decoders_never_escape(data):
    """Garbage bytes must raise ValueError-family errors (caught by the
    stages' error column), never escape as other exceptions."""
    from scribe_js_ray.stages.codecs import (bmp_decode, decode_image,
                                             gif_decode, mpng_info,
                                             png_decode, tiff_decode,
                                             wav_decode)
    from scribe_js_ray.stages.jpeg import jpeg_decode
    for fn in (png_decode, bmp_decode, gif_decode, jpeg_decode,
               tiff_decode, wav_decode, mpng_info, decode_image):
        try:
            fn(data)
        except (ValueError, IndexError, struct_error):
            pass


from struct import error as struct_error  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 255), st.integers(0, 2**32 - 1))
def test_valid_prefix_corruption_never_escapes(offset, delta, seed):
    """Flip one byte ANYWHERE in a valid GIF/JPEG stream: decode must
    either succeed or raise ValueError — never hang-class dictionary
    blowups, KeyError, or StopIteration (review r3 fuzz findings)."""
    import numpy as np

    from scribe_js_ray.stages.codecs import gif_decode
    from scribe_js_ray.stages.codecs import gif_encode
    from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode

    px = np.random.RandomState(seed).randint(
        0, 4, size=(16, 16, 3)).astype(np.uint8) * 80
    for enc, dec in ((gif_encode, gif_decode),
                     (lambda p: jpeg_encode(p, quality=70), jpeg_decode)):
        data = bytearray(enc(px))
        i = offset % len(data)
        data[i] = (data[i] + delta) % 256
        try:
            dec(bytes(data))
        except ValueError:
            pass


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_analyze_layout_never_crashes_on_random_geometry(data):
    """decideBreak/model building must survive arbitrary line geometry:
    random pages (overlapping lines, zero sizes, negative gaps, mixed
    sizes/fonts) through the full layout pass."""
    from scribe_js_ray.model import BBox, Line, Page, Word
    from scribe_js_ray.stages.layout import analyze_layout

    n_pages = data.draw(st.integers(1, 3))
    pages = []
    for p in range(n_pages):
        page = Page(p, 612, 792)
        n_lines = data.draw(st.integers(0, 12))
        for i in range(n_lines):
            left = data.draw(st.floats(0, 500))
            top = data.draw(st.floats(0, 780))
            w = data.draw(st.floats(1, 400))
            h = data.draw(st.floats(1, 40))
            size = data.draw(st.floats(0, 30))
            line = Line(page, BBox(left, top, left + w, top + h),
                        [0.0, -2.0], h * 0.75, h * 0.5)
            n_words = data.draw(st.integers(1, 5))
            x = left
            for k in range(n_words):
                txt = data.draw(st.sampled_from(
                    ["word", "Word.", "1.", "(a)", "•", "item,", "x",
                     "1", "end.", "[2]"]))
                ww = max(1.0, w / n_words - 2)
                word = Word(line, f"w{p}_{i}_{k}", txt,
                            BBox(x, top, x + ww, top + h))
                word.conf = 90
                word.style.size = size if size > 0 else None
                line.words.append(word)
                x += ww + 2
            page.lines.append(line)
        pages.append(page)
    analyze_layout(pages)
    for page in pages:
        for ln in page.lines:
            assert ln.par is not None or not page.pars


def test_tabledetect_survives_arbitrary_geometry():
    """detect_table_regions must never raise on arbitrary line/path
    geometry (doc.py wraps it in try/except, so a crash silently
    disables table detection for the page — make crashes loud here)."""
    import random

    from scribe_js_ray.model import BBox, Line, Page, Word
    from scribe_js_ray.stages.pdf.paths import PaintedPath
    from scribe_js_ray.stages.pdf.tabledetect import detect_table_regions

    def rand_page(r):
        page = Page(0, r.choice([600, 2550]), r.choice([800, 3300]))
        for i in range(r.randint(0, 40)):
            x0 = r.uniform(-50, page.width)
            y0 = r.uniform(-50, page.height)
            w = r.uniform(0, 400)
            h = r.uniform(0, 40)
            ln = Line(page, BBox(x0, y0, x0 + w, y0 + h), [0, -2], 10,
                      None)
            for j in range(r.randint(0, 6)):
                t = r.choice(["word", "123", "45.6", "$", "...", "",
                              "a" * 30, "Total", "follows:", "(1)",
                              "2019"])
                wx = x0 + j * 30
                word = Word(ln, f"w{i}_{j}", t,
                            BBox(wx, y0, wx + 25, y0 + h))
                word.conf = 90
                ln.words.append(word)
            if ln.words:
                page.lines.append(ln)
        return page

    def rand_paths(r):
        out = []
        for _ in range(r.randint(0, 60)):
            kind = r.random()
            cmds = []
            if kind < 0.4:
                x1, y1 = r.uniform(0, 612), r.uniform(0, 792)
                cmds = [("M", [(x1, y1)]),
                        ("L", [(x1 + r.uniform(0, 300),
                                y1 + r.uniform(0, 5))])]
            elif kind < 0.7:
                x, y = r.uniform(0, 612), r.uniform(0, 792)
                w, h = r.uniform(0, 200), r.uniform(0, 200)
                cmds = [("M", [(x, y)]), ("L", [(x + w, y)]),
                        ("L", [(x + w, y + h)]), ("L", [(x, y + h)]),
                        ("Z", [])]
            else:
                for _ in range(r.randint(1, 12)):
                    op = r.choice(["M", "L", "C", "Z"])
                    pts = [] if op == "Z" else \
                        [(r.uniform(-100, 700), r.uniform(-100, 900))
                         for _ in range(3 if op == "C" else 1)]
                    cmds.append((op, pts))
            out.append(PaintedPath(
                cmds, r.random() < 0.5, r.random() < 0.7,
                [r.random() for _ in range(r.choice([1, 3, 4]))],
                "rgb", [0.0], "gray", r.uniform(0, 3)))
        return out

    for seed in range(120):
        r = random.Random(seed)
        detect_table_regions(rand_page(r), rand_paths(r), 300 / 72, 792)
