"""Embedded-image extraction (stages/pdf/images.py — the
parsePdfImages.js decision surface: doc-wide enumeration, color-space
classification, filter chains, palette/mask handling)."""

import random
import zlib

import numpy as np
import pyarrow as pa
import pytest

from scribe_js_ray.sources.synth_pdf import PdfWriter, make_pdf_images
from scribe_js_ray.stages.codecs import png_decode
from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode
from scribe_js_ray.stages.pdf.images import (classify_colorspace,
                                             extract_images, image_codec,
                                             page_image_map,
                                             parse_image_object)
from scribe_js_ray.stages.pdf.objects import PdfFile


@pytest.fixture(scope="module")
def fixture_pdf() -> bytes:
    return make_pdf_images(random.Random(7))


@pytest.fixture(scope="module")
def fixture_images(fixture_pdf):
    return {i["obj_num"]: i for i in extract_images(fixture_pdf)}


def _fixture_rasters(seed_source=7):
    """Recompute the deterministic rasters make_pdf_images embeds (the
    seed is drawn from the doc rng before any text flows)."""
    seed = random.Random(seed_source).randint(0, 2 ** 31)
    rng = np.random.default_rng(seed)
    im1 = ((np.arange(6 * 8 * 3, dtype=np.uint32) * 37 + seed) % 256) \
        .astype(np.uint8).reshape(6, 8, 3)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, (8, 16), dtype=np.uint8)
    jpg = jpeg_encode(np.full((16, 16, 3), (seed % 200) + 20, np.uint8),
                      quality=90)
    gray = (np.arange(64, dtype=np.uint32) * 11 % 256) \
        .astype(np.uint8).reshape(8, 8)
    alpha = (np.arange(64, dtype=np.uint32) * 4 % 256) \
        .astype(np.uint8).reshape(8, 8)
    return im1, pal[idx], jpg, gray, alpha


def test_flate_rgb_pixel_exact(fixture_images):
    im1, _, _, _, _ = _fixture_rasters()
    got = png_decode(fixture_images[6]["data"])
    assert np.array_equal(got, im1)


def test_indexed_palette_expansion(fixture_images):
    _, exp, _, _, _ = _fixture_rasters()
    info = fixture_images[7]
    assert info["color_space"] == "Indexed"
    assert info["bits_per_component"] == 4
    assert info["palette_hival"] == 5
    assert np.array_equal(png_decode(info["data"]), exp)


def test_dct_passthrough_byte_identical(fixture_images):
    _, _, jpg, _, _ = _fixture_rasters()
    info = fixture_images[8]
    assert info["ext"] == "jpg" and info["filter"] == "DCTDecode"
    assert info["data"] == jpg  # codestream untouched
    jpeg_decode(info["data"])  # and it still decodes


def test_stencil_image_mask_unpacked(fixture_images):
    info = fixture_images[9]
    assert info["image_mask"] and info["color_space"] == "DeviceGray"
    got = png_decode(info["data"])
    yy, xx = np.indices((10, 10))
    exp = (((xx + yy) % 2) * 255).astype(np.uint8)
    assert np.array_equal(got[..., 0], exp)


def test_smask_lifted_to_alpha(fixture_images):
    _, _, _, gray, alpha = _fixture_rasters()
    info = fixture_images[10]
    assert info["has_smask"] if "has_smask" in info \
        else info["smask_obj"] is not None
    got = png_decode(info["data"])
    assert got.shape == (8, 8, 4)
    assert np.array_equal(got[..., 0], gray)
    assert np.array_equal(got[..., 3], alpha)


def test_page_image_map_and_text_still_extracts(fixture_pdf):
    pdf = PdfFile(fixture_pdf)
    m = page_image_map(pdf)
    assert set(m) == {6, 7, 8, 9, 10}  # SMask obj 11 is not page-drawn
    assert all(v == 1 for v in m.values())
    from scribe_js_ray.stages.pdf.doc import parse_pdf_document
    pages, doc_type = parse_pdf_document(fixture_pdf)
    assert doc_type == "text" and len(pages) == 1


def _one_image_pdf(img_dict: bytes, raster: bytes,
                   compress=True) -> bytes:
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    content = b"q 10 0 0 10 72 700 cm /Im1 Do Q"
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /XObject << /Im1 5 0 R >> >> "
          b"/Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    z = zlib.compress(raster) if compress else raster
    filt = b" /Filter /FlateDecode" if compress else b""
    w.add(img_dict + filt
          + f" /Length {len(z)} >>\nstream\n".encode() + z
          + b"\nendstream")
    return w.build()


def test_decode_invert_gray():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    data = _one_image_pdf(
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Decode [1 0]",
        g.tobytes())
    (info,) = extract_images(data)
    assert info["decode_invert"]
    assert np.array_equal(png_decode(info["data"])[..., 0], 255 - g)


def test_sixteen_bit_keeps_high_byte():
    hi = np.arange(4, dtype=np.uint8).reshape(2, 2) * 60
    samples = np.zeros((2, 2, 2), np.uint8)
    samples[..., 0] = hi  # big-endian 16-bit: high byte first
    data = _one_image_pdf(
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/BitsPerComponent 16 /ColorSpace /DeviceGray",
        samples.tobytes())
    (info,) = extract_images(data)
    assert np.array_equal(png_decode(info["data"])[..., 0], hi)


def test_corrupt_stream_lands_in_error_column():
    data = _one_image_pdf(
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceRGB",
        b"\x00not-zlib\xff", compress=False)
    # forge a Flate filter over non-zlib bytes
    data = data.replace(b"/ColorSpace /DeviceRGB",
                        b"/ColorSpace /DeviceRGB /Filter /FlateDecode")
    (info,) = extract_images(data)
    assert info["error"] and info["data"] is None
    assert info["width"] == 4  # metadata still reported


def test_colorspace_classification():
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [] /Count 0 >>")
    icc1 = w.add(b"<< /N 1 /Length 0 >>\nstream\n\nendstream")
    icc4 = w.add(b"<< /N 4 /Length 0 >>\nstream\n\nendstream")
    pdf = PdfFile(w.build())
    from scribe_js_ray.stages.pdf.objects import Name, Ref
    assert classify_colorspace(pdf, Name("DeviceGray")) == "DeviceGray"
    assert classify_colorspace(
        pdf, [Name("ICCBased"), Ref(icc1)]) == "DeviceGray"
    assert classify_colorspace(
        pdf, [Name("ICCBased"), Ref(icc4)]) == "DeviceCMYK"
    assert classify_colorspace(
        pdf, [Name("DeviceN"), [Name("Spot1")], Name("DeviceRGB")]) \
        == "Separation"
    assert classify_colorspace(
        pdf, [Name("DeviceN"), [Name("R"), Name("G")],
              Name("DeviceRGB")]) == "DeviceN"
    assert classify_colorspace(pdf, None) == "DeviceRGB"


def test_image_codec_prefers_dct_in_chain():
    assert image_codec(["ASCII85Decode", "DCTDecode"]) == "DCTDecode"
    assert image_codec(["FlateDecode"]) == "FlateDecode"
    assert image_codec([]) is None


def test_form_xobject_recursion_in_page_map():
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    content = b"q /Fm1 Do Q"
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /XObject << /Fm1 5 0 R >> >> "
          b"/Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    form_body = b"q 8 0 0 8 0 0 cm /ImA Do Q"
    w.add(b"<< /Type /XObject /Subtype /Form /BBox [0 0 100 100] "
          b"/Resources << /XObject << /ImA 6 0 R >> >> "
          + f"/Length {len(form_body)} >>\nstream\n".encode()
          + form_body + b"\nendstream")
    z = zlib.compress(bytes(12))
    w.add(b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
          b"/BitsPerComponent 8 /ColorSpace /DeviceRGB "
          b"/Filter /FlateDecode "
          + f"/Length {len(z)} >>\nstream\n".encode() + z
          + b"\nendstream")
    pdf = PdfFile(w.build())
    assert page_image_map(pdf) == {6: 1}
    (info,) = extract_images(pdf)
    assert info["obj_num"] == 6 and info["ext"] == "png"


def test_non_image_objects_skipped(fixture_pdf):
    pdf = PdfFile(fixture_pdf)
    assert parse_image_object(pdf, 1) is None  # catalog
    assert parse_image_object(pdf, 4) is None  # content stream


def test_batch_stage_schema_and_poison(ray_session):
    import ray.data as rd

    from scribe_js_ray.stages.multimodal import pdf_images_pipeline

    good = make_pdf_images(random.Random(3))
    tbl = pa.table({
        "url": pa.array(["https://a.test/good.pdf",
                         "https://a.test/bad.pdf"], pa.string()),
        "payload": pa.array([good, b"%PDF-truncated garbage"],
                            pa.large_binary()),
    })
    out = pdf_images_pipeline(rd.from_arrow(tbl)).to_pandas()
    good_rows = out[out.url.str.endswith("good.pdf")]
    assert len(good_rows) == 6  # 5 drawn images + the SMask object
    assert (good_rows.error == "").all()
    assert set(good_rows.ext) == {"png", "jpg"}
    bad_rows = out[out.url.str.endswith("bad.pdf")]
    # garbage has no image XObjects: either zero rows or one error row
    assert len(bad_rows) <= 1
    if len(bad_rows):
        assert (bad_rows.obj_num == -1).all()


def _pdf_with_content(content: bytes, with_font=True) -> bytes:
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    res = b"/Resources << /Font << /F1 5 0 R >> >> " if with_font else b""
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          + res + b"/Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    if with_font:
        w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
              b"/Encoding /WinAnsiEncoding >>")
    return w.build()


def test_inline_image_with_embedded_ei_bytes():
    """Binary inline-image data containing the bytes 'EI' must not
    truncate the scan (contentStream.js computed-length path)."""
    from scribe_js_ray.stages.pdf.doc import parse_pdf_document
    # 4x2 RGB = 24 bytes; plant 'EI' (0x45 0x49) mid-data
    samples = bytearray(range(24))
    samples[5:7] = b"EI"
    content = (b"q 40 0 0 20 100 700 cm BI /W 4 /H 2 /BPC 8 /CS /RGB ID "
               + bytes(samples) + b" EI Q\n"
               b"BT /F1 12 Tf 72 600 Td (Visible after image) Tj ET")
    pages, _ = parse_pdf_document(_pdf_with_content(content))
    words = [w.text for line in pages[0].lines for w in line.words]
    assert words == ["Visible", "after", "image"]


def test_inline_image_filtered_scan_fallback():
    """Filtered inline data has no computable length; the fallback scan
    requires a whitespace-bounded EI."""
    from scribe_js_ray.stages.pdf.doc import parse_pdf_document
    content = (b"BI /W 2 /H 2 /BPC 8 /CS /G /F /AHx ID "
               b"00112233 > EI\n"
               b"BT /F1 12 Tf 72 600 Td (Still here) Tj ET")
    pages, _ = parse_pdf_document(_pdf_with_content(content))
    words = [w.text for line in pages[0].lines for w in line.words]
    assert words == ["Still", "here"]


def test_inline_image_counts_toward_image_frac():
    """parsePdfDoc.js:680: an inline image is an image draw — a page
    that is one big BI..EI and no text classifies image-native."""
    from scribe_js_ray.stages.pdf.doc import parse_pdf_document
    content = (b"q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
               + bytes(4) + b" EI Q")
    pages, doc_type = parse_pdf_document(
        _pdf_with_content(content, with_font=False))
    assert doc_type == "image"
    assert not pages[0].lines


def test_image_dup_groups(ray_session):
    """Cross-corpus image dedup: md5-exact groups for re-embedded
    rasters, aHash groups collapsing across seeds; only hashes cross
    the exchange (data column dropped map-side)."""
    import random

    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import image_dup_groups
    from scribe_js_ray.stages.multimodal import pdf_images_pipeline

    # 6 docs over 2 seeds -> every seed's images recur 3x; the
    # seed-independent rasters (stencil checker, gray/alpha ramps)
    # recur 6x
    tbl = pa.table({
        "url": pa.array([f"https://t/{i}.pdf" for i in range(6)]),
        "payload": pa.array([make_pdf_images(random.Random(i % 2))
                             for i in range(6)], pa.large_binary()),
    })
    out = image_dup_groups(
        pdf_images_pipeline(rd.from_arrow(tbl))).to_pandas()
    exact = out[out.kind == "exact"]
    assert set(exact.n_copies) == {3, 6}
    assert (exact.n_copies == 6).sum() == 3  # checker + gray + alpha
    assert (exact.n_copies == exact.n_urls).all()
    phash = out[out.kind == "phash"]
    assert len(phash) and (phash.n_copies >= 2).all()


def test_lab_image_decodes_to_neutral_gray():
    """Lab samples map linearly onto L*∈[0,100] and the /Range
    intervals; neutral a*=b*≈0 must land on gray (shared Lab→XYZ→sRGB
    math with the tint path)."""
    lab = np.full((2, 2, 3), 128, np.uint8)
    data = _one_image_pdf(
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/BitsPerComponent 8 /ColorSpace [/Lab << /WhitePoint "
        b"[0.9642 1 0.8249] /Range [-128 127 -128 127] >>]",
        lab.tobytes())
    (info,) = extract_images(data)
    assert info["color_space"] == "Lab" and not info["error"]
    assert info["lab_white_point"] == [0.9642, 1.0, 0.8249]
    got = png_decode(info["data"])
    px = got[0, 0]
    assert abs(int(px[0]) - int(px[1])) <= 2 \
        and abs(int(px[1]) - int(px[2])) <= 3
    assert 100 < px[0] < 140  # L*≈50 → mid gray


def test_color_key_mask_transparency():
    """/Mask [min max] array: raw samples inside the range become
    transparent (parsePdfImages.js color-key masking)."""
    g = np.array([[0, 1], [2, 3]], np.uint8)
    data = _one_image_pdf(
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Mask [1 2]",
        g.tobytes())
    (info,) = extract_images(data)
    assert info["color_key_mask"] == [1, 2]
    got = png_decode(info["data"])
    assert got.shape == (2, 2, 4)
    assert got[..., 3].tolist() == [[255, 0], [0, 255]]


def test_extract_images_never_raises_on_corrupt_pdfs():
    """Flip bytes of a VALID image PDF (random corruption never passes
    the %PDF magic): extract_images must return a list — per-image
    errors land in the error field, never raise."""
    base = make_pdf_images(random.Random(11))
    rng = random.Random(99)
    for _ in range(40):
        data = bytearray(base)
        for _ in range(rng.randint(1, 30)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            out = extract_images(bytes(data))
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(
                f"extract_images raised {type(exc).__name__}: {exc}")
        assert isinstance(out, list)
    # truncations too
    for frac in (0.1, 0.3, 0.5, 0.9):
        out = extract_images(base[:int(len(base) * frac)])
        assert isinstance(out, list)


def test_image_near_dup_pairs(ray_session):
    """Banded-phash LSH: a brightness-nudged twin pairs with its source
    at small Hamming distance; an unrelated random image does not."""
    import numpy as np
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import image_near_dup_pairs
    from scribe_js_ray.stages.codecs import png_encode

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    near = np.clip(base.astype(int) + 9, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    tbl = pa.table({
        "url": pa.array(["base", "near", "other"]),
        "obj_num": pa.array([1, 1, 1], pa.int32()),
        "data": pa.array([png_encode(x) for x in (base, near, other)],
                         pa.large_binary()),
    })
    out = image_near_dup_pairs(rd.from_arrow(tbl)).to_pandas()
    pairs = {tuple(sorted((a, b))) for a, b in zip(out.img_a, out.img_b)}
    assert ("base#1", "near#1") in pairs
    assert not any("other" in a or "other" in b for a, b in pairs)
    assert (out.hamming <= 6).all()


def test_image_near_dup_banding_guarantee(ray_session):
    """A Hamming-5 pair whose mismatched bits land in ALL four 16-bit
    quarters is still found: the max_hamming+1 banding guarantees (by
    pigeonhole) at least one exact-matching band for d <= max_hamming.
    aHash of an 8x8 input is the identity thumbnail, so flipping one
    cell flips exactly one hash bit."""
    import numpy as np
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import image_near_dup_pairs
    from scribe_js_ray.stages.codecs import png_encode

    base = np.zeros((8, 8), dtype=np.uint8)
    base.reshape(-1)[0::2] = 255  # checkerboard: mean 127.5, bits fixed
    # flat cells 2,18,34,50,60 -> hash bits 61,45,29,13,3: one flip in
    # each of the four 16-bit quarters of the old 4-band split
    twin = base.copy()
    for cell in (2, 18, 34, 50, 60):
        r, c = divmod(cell, 8)
        twin[r, c] = 255 - twin[r, c]
    to3 = lambda g: np.repeat(g[:, :, None], 3, axis=2)  # noqa: E731
    tbl = pa.table({
        "url": pa.array(["base", "twin"]),
        "obj_num": pa.array([1, 1], pa.int32()),
        "data": pa.array([png_encode(to3(base)), png_encode(to3(twin))],
                         pa.large_binary()),
    })
    out = image_near_dup_pairs(rd.from_arrow(tbl), max_hamming=6) \
        .to_pandas()
    assert len(out) == 1
    assert int(out.hamming.iloc[0]) == 5
