"""Identifying-metadata inspection (metadataInspect.js / imageMetadata.js
ports) + the pdf-metadata / pdf-type / conf CLI verbs."""

import re

from scribe_js_ray.sources.synth_pdf import PdfWriter
from scribe_js_ray.stages.pdf.imagemeta import (inspect_jpeg_metadata,
                                                inspect_jpx_metadata,
                                                strip_jpeg_metadata,
                                                strip_jpx_metadata)
from scribe_js_ray.stages.pdf.metadata import (format_metadata_report,
                                               get_metadata)
from scribe_js_ray.stages.pdf.subset import strip_metadata_pdf


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _jpeg_with_exif() -> bytes:
    exif = (b"Exif\x00\x00II*\x00" + b"\x25\x88" + b"\x00" * 4
            + b"NIKON D3300\x00" + b"\x00" * 3)
    return (b"\xff\xd8"                          # SOI
            + _seg(0xE0, b"JFIF\x00\x01\x02")    # APP0 (kept)
            + _seg(0xE1, exif)                   # APP1 EXIF (dropped)
            + _seg(0xFE, b"a comment")           # COM (dropped)
            + _seg(0xDB, b"\x00" + bytes(64))    # DQT (kept)
            + b"\xff\xda" + (4).to_bytes(2, "big") + b"\x01\x00"  # SOS
            + b"\x12\x34\x56"                    # scan data
            + b"\xff\xd9")                       # EOI


def _jp2_box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def _jp2_with_xml() -> bytes:
    return (_jp2_box(b"jP  ", b"\r\n\x87\n")
            + _jp2_box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
            + _jp2_box(b"xml ", b"<gps>51.5,-0.1</gps>")
            + _jp2_box(b"uuid", b"\x01" * 16 + b"leak")
            + _jp2_box(b"jp2c", b"\xff\x4f\xff\x51fakecodestream"))


def test_inspect_jpeg_exif_gps_strings():
    j = inspect_jpeg_metadata(_jpeg_with_exif())
    assert j["hasExif"] and j["gpsPresent"]
    assert any("NIKON D3300" in s for s in j["strings"])
    assert not j["hasXmp"] and not j["hasIptc"]


def test_strip_jpeg_drops_exif_keeps_scan():
    out = strip_jpeg_metadata(_jpeg_with_exif())
    assert b"NIKON" not in out and b"a comment" not in out
    assert out.startswith(b"\xff\xd8\xff\xe0")       # JFIF kept
    assert out.endswith(b"\x12\x34\x56\xff\xd9")     # scan verbatim
    # idempotent + non-JPEG passthrough
    assert strip_jpeg_metadata(out) == out
    assert strip_jpeg_metadata(b"not a jpeg") == b"not a jpeg"


def test_inspect_and_strip_jpx_boxes():
    data = _jp2_with_xml()
    x = inspect_jpx_metadata(data)
    assert x["hasXml"] and x["hasUuid"]
    assert x["boxes"] == ["xml", "uuid"]
    out = strip_jpx_metadata(data)
    assert b"<gps>" not in out and b"leak" not in out
    assert b"fakecodestream" in out and out.startswith(b"\x00\x00\x00\x0cjP")
    # raw codestream untouched
    raw = b"\xff\x4f\xff\x51stuff"
    assert strip_jpx_metadata(raw) == raw


def _pdf_fixture() -> bytes:
    """Info + XMP + OCG + Filespec + reviewer annot + custom info dict
    + JS names + an EXIF-bearing DCTDecode image."""
    jpeg = _jpeg_with_exif()
    xmp = b"<x:xmpmeta>creator leak</x:xmpmeta>"
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R /Lang (en-US) "
          b"/Metadata 7 0 R /OpenAction [3 0 R /Fit] "
          b"/Names << /JavaScript << /Names [] >> >> >>")            # 1
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")              # 2
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /XObject << /Im0 8 0 R >> >> "
          b"/Contents 4 0 R /Annots [9 0 R] >>")                     # 3
    stream = b"q 100 0 0 100 0 0 cm /Im0 Do Q"
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")                                 # 4
    w.add(b"<< /Title (draft.pdf) /Author (Casey) "
          b"/Producer (scribetest) >>")                              # 5 info
    w.add(b"<< /Type /OCG /Name (Watermark Layer) >>")               # 6
    w.add(b"<< /Type /Metadata /Subtype /XML /Length "
          + str(len(xmp)).encode() + b" >>\nstream\n" + xmp
          + b"\nendstream")                                          # 7
    w.add(b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
          b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
          b"/Filter /DCTDecode /Length " + str(len(jpeg)).encode()
          + b" >>\nstream\n" + jpeg + b"\nendstream")                # 8
    w.add(b"<< /Type /Annot /Subtype /Text /Rect [0 0 10 10] "
          b"/T (Reviewer Casey) /Contents (note) >>")                # 9
    w.add(b"<< /Type /Filespec /F (attachment.xlsx) >>")             # 10
    w.add(b"<< /Author (HiddenCorp) /Title (old name) >>")           # 11
    out = w.build()
    return out.replace(b"/Root 1 0 R", b"/Root 1 0 R /Info 5 0 R")


def test_get_metadata_report_categories():
    r = get_metadata(_pdf_fixture())
    assert r["info"]["Author"] == "Casey"
    assert "creator leak" in r["xmp"]["catalog"]
    assert r["ocgs"] == [{"objNum": 6, "name": "Watermark Layer"}]
    assert r["embeddedFiles"][0]["name"] == "attachment.xlsx"
    assert r["actions"]["openAction"] and r["actions"]["javascript"]
    assert r["lang"] == "en-US"
    assert [a["author"] for a in r["annotationAuthors"]] \
        == ["Reviewer Casey"]
    # hidden custom info dict (obj 11) flagged, real /Info (obj 5) not
    assert r["customInfo"] == [{"objNum": 11,
                                "keys": ["Author", "Title"]}]
    assert r["images"] and r["images"][0]["hasExif"] \
        and r["images"][0]["gpsPresent"]
    assert r["priorRevisions"] == 1 and not r["encrypted"]
    txt = format_metadata_report(r, "f.pdf")
    assert "Author: Casey" in txt and "Watermark Layer" in txt
    assert "openAction" in txt


def test_prior_revisions_counted():
    data = _pdf_fixture()
    m = re.search(rb"startxref\s+(\d+)", data)
    prev = int(m.group(1))
    tail = (b"\nxref\n0 0\ntrailer\n<< /Size 12 /Root 1 0 R "
            b"/Prev " + str(prev).encode() + b" >>\nstartxref\n")
    off = len(data) + 1          # position of 'xref' after the \n
    data2 = data + tail + str(off).encode() + b"\n%%EOF\n"
    r = get_metadata(data2)
    assert r["priorRevisions"] == 2


def test_scrub_strips_image_exif():
    cleaned = strip_metadata_pdf(_pdf_fixture())
    assert b"NIKON" not in cleaned
    assert b"creator leak" not in cleaned
    r = get_metadata(cleaned)
    assert r["info"] is None and not r["images"]
    assert not r["annotationAuthors"] or \
        r["annotationAuthors"][0]["author"] != "Reviewer Casey"


def test_cli_pdf_type_and_metadata(tmp_path, capsys):
    from tests.test_pdf_annots import _pdf_with_field

    from scribe_js_ray.cli import main

    p = tmp_path / "doc.pdf"
    p.write_bytes(_pdf_with_field())
    assert main(["pdf-type", str(p)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("PDF Type: ")

    mp = tmp_path / "meta.pdf"
    mp.write_bytes(_pdf_fixture())
    assert main(["pdf-metadata", str(mp)]) == 0
    out = capsys.readouterr().out
    assert "Metadata in meta.pdf:" in out and "Casey" in out
    assert main(["pdf-metadata", str(mp), "--json"]) == 0
    import json as _json
    rep = _json.loads(capsys.readouterr().out)
    assert rep["info"]["Author"] == "Casey"


def test_cli_conf(tmp_path, capsys):
    from scribe_js_ray.cli import main

    hocr = (b"<html><body><div class='ocr_page' title='bbox 0 0 100 100'>"
            b"<span class='ocr_line' title='bbox 0 0 100 20; baseline 0 -4;"
            b" x_size 16; x_ascenders 4; x_descenders 4'>"
            b"<span class='ocrx_word' title='bbox 0 0 40 20; x_wconf 96'>"
            b"good</span>"
            b"<span class='ocrx_word' title='bbox 50 0 90 20; x_wconf 30'>"
            b"bad</span></span></div></body></html>")
    p = tmp_path / "page.hocr"
    p.write_bytes(hocr)
    assert main(["conf", str(p)]) == 0
    out = capsys.readouterr().out
    assert out.strip() == "Confidence: 0.5 (1 of 2)"


def test_cli_overlay(tmp_path, capsys):
    import json as _json

    from scribe_js_ray.cli import main
    from scribe_js_ray.sources.synth import generate_pages_table
    from scribe_js_ray.sources.synth_pdf import PdfWriter
    from scribe_js_ray.stages.pdf import parse_pdf_document

    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << >> >>")
    pdf_p = tmp_path / "scan.pdf"
    pdf_p.write_bytes(w.build())

    pages = generate_pages_table(1, seed=7)      # doc 0 is hOCR
    hocr_p = tmp_path / "scan.hocr"
    hocr_p.write_bytes(pages["html"][0].as_py())

    assert main(["overlay", str(pdf_p), str(hocr_p), "-o", str(tmp_path),
                 "--conf"]) == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert out_lines[0].startswith("Confidence: ")
    info = _json.loads(out_lines[-1])
    out_pdf = info["output"]
    parsed, doc_type = parse_pdf_document(open(out_pdf, "rb").read())
    got = " ".join(w_.text for ln in parsed[0].lines for w_ in ln.words)
    assert len(got.split()) >= 5      # OCR words present in the overlay
    assert doc_type == "ocr"          # invisible layer → image + OCR text


def test_cli_strip_metadata(tmp_path, capsys):
    import json as _json

    from scribe_js_ray.cli import main

    p = tmp_path / "dirty.pdf"
    p.write_bytes(_pdf_fixture())
    assert main(["strip-metadata", str(p), str(tmp_path)]) == 0
    info = _json.loads(capsys.readouterr().out)
    assert info["output"].endswith("dirty-clean.pdf")
    cleaned = open(info["output"], "rb").read()
    assert b"Casey" not in cleaned and b"NIKON" not in cleaned
    r = get_metadata(cleaned)
    assert r["info"] is None and not r["customInfo"]


def test_get_metadata_never_raises_on_garbage():
    import random

    rnd = random.Random(7)
    base = _pdf_fixture()
    cases = [b"", b"%PDF-1.4\n", bytes(rnd.randrange(256)
                                       for _ in range(2048)),
             base[:200], base[:len(base) // 2]]
    for _ in range(20):
        b = bytearray(base)
        for _ in range(10):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
        cases.append(bytes(b))
    for c in cases:
        assert isinstance(get_metadata(c), dict)
