"""Cloud-OCR JSON parser tests (Textract / Google Vision / Doc AI / Azure)."""

import json

import pyarrow as pa

from scribe_js_ray.model import line_text, page_text
from scribe_js_ray.sources.classify import classify_payload
from scribe_js_ray.stages.cloud import (
    parse_azure_doc_intel, parse_google_doc_ai, parse_google_vision_page,
    parse_textract_doc)


# ---------------------------------------------------------------------------
# fixture builders


def _tx_geom(left, top, width, height):
    """Geometry dict with BoundingBox + Polygon (real Textract output
    always carries both; the reference requires Polygon)."""
    return {"BoundingBox": {"Left": left, "Top": top,
                            "Width": width, "Height": height},
            "Polygon": [
                {"X": left, "Y": top},
                {"X": left + width, "Y": top},
                {"X": left + width, "Y": top + height},
                {"X": left, "Y": top + height}]}


def make_textract(lines, page=1):
    """lines: list of word-text lists."""
    blocks = [{"BlockType": "PAGE", "Id": "page1", "Page": page,
               "Geometry": {"Polygon": [
                   {"X": 0, "Y": 0}, {"X": 1, "Y": 0},
                   {"X": 1, "Y": 1}, {"X": 0, "Y": 1}]},
               "Relationships": [{"Type": "CHILD", "Ids": [
                   f"line{i}" for i in range(len(lines))]}]}]
    y = 0.1
    for i, words in enumerate(lines):
        wids = [f"w{i}_{j}" for j in range(len(words))]
        blocks.append({
            "BlockType": "LINE", "Id": f"line{i}", "Page": page,
            "Text": " ".join(words),
            "Geometry": _tx_geom(0.1, y, 0.8, 0.03),
            "Relationships": [{"Type": "CHILD", "Ids": wids}]})
        x = 0.1
        for j, wtext in enumerate(words):
            ww = 0.02 * len(wtext)
            blocks.append({
                "BlockType": "WORD", "Id": wids[j], "Page": page,
                "Text": wtext, "Confidence": 99.0,
                "Geometry": _tx_geom(x, y, ww, 0.03)})
            x += ww + 0.01
        y += 0.05
    return json.dumps({"DetectDocumentTextModelVersion": "1.0",
                       "Blocks": blocks})


def make_google_vision(lines):
    words_v = []
    y = 100
    for li, words in enumerate(lines):
        x = 100
        for wi, w in enumerate(words):
            ww = 20 * len(w)
            symbols = [{"text": c} for c in w]
            if wi == len(words) - 1:
                symbols[-1]["property"] = {
                    "detectedBreak": {"type": "LINE_BREAK"}}
            words_v.append({
                "boundingBox": {"vertices": [
                    {"x": x, "y": y}, {"x": x + ww, "y": y},
                    {"x": x + ww, "y": y + 30}, {"x": x, "y": y + 30}]},
                "symbols": symbols,
                "confidence": 0.97})
            x += ww + 10
        y += 50
    par = {"boundingBox": {"vertices": [
        {"x": 100, "y": 100}, {"x": 800, "y": 100},
        {"x": 800, "y": y}, {"x": 100, "y": y}]},
        "words": words_v}
    return json.dumps({"fullTextAnnotation": {"pages": [{
        "width": 1000, "height": 1400,
        "blocks": [{"blockType": "TEXT", "paragraphs": [par]}]}]},
        "pages": True})


def make_google_doc_ai(lines):
    full_text = "\n".join(" ".join(ws) for ws in lines) + "\n"
    tokens, lines_v = [], []
    pos = 0
    y = 100
    for words in lines:
        line_start = pos
        x = 100
        for w in words:
            ww = 20 * len(w)
            tokens.append({"layout": {
                "textAnchor": {"textSegments": [
                    {"startIndex": str(pos),
                     "endIndex": str(pos + len(w) + 1)}]},
                "confidence": 0.9,
                "boundingPoly": {"vertices": [
                    {"x": x, "y": y}, {"x": x + ww, "y": y},
                    {"x": x + ww, "y": y + 30}, {"x": x, "y": y + 30}]}}})
            pos += len(w) + 1
            x += ww + 10
        lines_v.append({"layout": {
            "textAnchor": {"textSegments": [
                {"startIndex": str(line_start), "endIndex": str(pos)}]},
            "boundingPoly": {"vertices": [
                {"x": 100, "y": y}, {"x": x, "y": y},
                {"x": x, "y": y + 30}, {"x": 100, "y": y + 30}]}}})
        y += 50
    return json.dumps({
        "text": full_text,
        "pages": [{"dimension": {"width": 1000, "height": 1400},
                   "tokens": tokens, "lines": lines_v}]})


def make_azure(lines):
    words_v, lines_v = [], []
    pos = 0
    y = 100
    for words in lines:
        spans = []
        x = 100
        line_start = pos
        for w in words:
            ww = 20 * len(w)
            words_v.append({
                "content": w, "confidence": 0.95,
                "span": {"offset": pos, "length": len(w)},
                "polygon": [x, y, x + ww, y, x + ww, y + 30, x, y + 30]})
            pos += len(w) + 1
            x += ww + 10
        lines_v.append({
            "content": " ".join(words),
            "spans": [{"offset": line_start, "length": pos - line_start}],
            "polygon": [100, y, x, y, x, y + 30, 100, y + 30]})
        y += 50
    return json.dumps({
        "createdDateTime": "2024-01-01T00:00:00Z",
        "analyzeResult": {"modelId": "prebuilt-read",
                          "pages": [{"unit": "pixel", "width": 1000,
                                     "height": 1400, "angle": 0,
                                     "words": words_v,
                                     "lines": lines_v}]}})


# ---------------------------------------------------------------------------


def test_classify_cloud_formats():
    assert classify_payload(
        make_textract([["x"]]).encode()) == "textract"
    assert classify_payload(
        make_google_vision([["x"]]).encode()) == "google_vision"
    assert classify_payload(
        make_google_doc_ai([["x"]]).encode()) == "google_doc_ai"
    assert classify_payload(make_azure([["x"]]).encode()) == "azure_doc_intel"


def test_textract_parse():
    pages = parse_textract_doc(
        make_textract([["Hello", "world"], ["Second", "line"]]))
    assert len(pages) == 1
    assert [line_text(ln) for ln in pages[0].lines] == \
        ["Hello world", "Second line"]
    assert pages[0].lines[0].words[0].conf == 99
    assert pages[0].pars  # catch-all paragraph


def test_google_vision_parse():
    page = parse_google_vision_page(
        make_google_vision([["Hello", "world"], ["Second", "line"]]))
    assert [line_text(ln) for ln in page.lines] == \
        ["Hello world", "Second line"]
    assert page.lines[0].words[0].conf == 97
    assert len(page.pars) == 1


def test_google_doc_ai_parse():
    pages = parse_google_doc_ai(
        make_google_doc_ai([["Hello", "world"], ["Second", "line"]]))
    assert len(pages) == 1
    assert [line_text(ln) for ln in pages[0].lines] == \
        ["Hello world", "Second line"]
    assert pages[0].lines[0].words[0].conf == 90


def test_azure_parse():
    pages = parse_azure_doc_intel(
        make_azure([["Hello", "world"], ["Second", "line"]]))
    assert len(pages) == 1
    assert [line_text(ln) for ln in pages[0].lines] == \
        ["Hello world", "Second line"]
    assert pages[0].lines[0].words[0].conf == 95


def test_cloud_through_pipeline(ray_session):
    import ray.data as rd

    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    payloads = [make_textract([["Textract", "doc"]]).encode(),
                make_google_vision([["Vision", "doc"]]).encode(),
                make_google_doc_ai([["DocAI", "doc"]]).encode(),
                make_azure([["Azure", "doc"]]).encode()]
    tbl = pa.table({
        "url": [f"u{i}" for i in range(4)],
        "html": payloads,
        "text": [""] * 4,
        "lang": ["eng"] * 4,
    })
    out = build_extract_pipeline(rd.from_arrow(tbl)) \
        .to_pandas().set_index("url")
    assert out.loc["u0", "extracted_text"] == "Textract doc"
    assert out.loc["u1", "extracted_text"] == "Vision doc"
    assert out.loc["u2", "extracted_text"] == "DocAI doc"
    assert out.loc["u3", "extracted_text"] == "Azure doc"
    assert (out["error"] == "").all()


def test_cloud_json_with_gt_in_text_still_classified():
    """'>' inside quoted OCR text must not break the JSON sniff."""
    blob = make_textract([["a->b", "x"]])
    assert ">" in blob[:500]
    assert classify_payload(blob.encode()) == "textract"


def test_textract_zero_confidence_falsy():
    # Reference quirk: `wordBlock.Confidence || 100` treats a 0.0
    # confidence as missing (convertDocTextract.js:230).
    import json as _json
    data = _json.loads(make_textract([["shaky"]]))
    for b in data["Blocks"]:
        if b["BlockType"] == "WORD":
            b["Confidence"] = 0.0
    pages = parse_textract_doc(_json.dumps(data))
    assert pages[0].lines[0].words[0].conf == 100
    # Fractional confidences pass through unrounded, like the JS.
    pages = parse_textract_doc(make_textract([["solid"]]))
    assert pages[0].lines[0].words[0].conf == 99.0


# ---------------------------------------------------------------------------
# paired-source page dims (image OR PDF) + malformed-block tolerance


def test_textract_word_missing_text_tolerated():
    """A WORD block without Text must not poison the document
    (convertDocTextract.js:229 tolerates undefined word text)."""
    js = json.loads(make_textract([["alpha", "beta", "gamma."]]))
    for b in js["Blocks"]:
        if b.get("BlockType") == "WORD" and b.get("Text") == "beta":
            del b["Text"]
    pages = parse_textract_doc(json.dumps(js))
    txt = page_text(pages[0])
    assert "alpha" in txt and "gamma" in txt


def test_paired_page_dims_image_and_pdf():
    import numpy as np

    from scribe_js_ray.stages.cloud import paired_page_dims
    from scribe_js_ray.stages.codecs import png_encode
    img = png_encode(np.zeros((40, 60, 3), np.uint8))
    assert paired_page_dims(img) == [(60, 40)]


def test_paired_image_textract_import():
    """Image (not PDF) paired payload: page metrics come from the
    raster's pixel dims (imageContainer.js pageMetrics for image
    pairs) — previously crashed in the PDF parser."""
    import numpy as np

    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.stages.codecs import png_encode
    img = png_encode(np.zeros((400, 600, 3), np.uint8))
    out = extract_document(
        "u", make_textract([["hello", "world."]]).encode(), "", "eng",
        source_payload=img)
    assert out["error"] == ""
    assert "hello world." in out["extracted_text"]


def test_paired_image_hocr_page_slice():
    """OCR pages beyond the paired image's page count (1) are dropped
    (import.js:604)."""
    import random as _random

    import numpy as np

    from scribe_js_ray.pipelines.extract import extract_document
    from scribe_js_ray.sources.synth import make_hocr_furniture
    from scribe_js_ray.stages.codecs import png_encode
    hocr = make_hocr_furniture(_random.Random(3)).encode()
    img = png_encode(np.zeros((50, 80, 3), np.uint8))
    full = extract_document("u", hocr, "", "eng")
    sliced = extract_document("u", hocr, "", "eng", source_payload=img)
    assert full["n_pages"] >= 3
    assert sliced["error"] == "" and sliced["n_pages"] == 1
