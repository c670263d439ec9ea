"""Tesseract block-JSON import (convertPageBlocks.js parity)."""

import json

from scribe_js_ray.pipelines.extract import extract_document
from scribe_js_ray.sources.classify import classify_payload
from scribe_js_ray.stages.blocks import parse_blocks_page


def _word(text, x0, y0, x1, y1, conf=95, lang="eng", symbols=None,
          choices=None, font_name="Times_New_Roman"):
    w = {"text": text, "bbox": {"x0": x0, "y0": y0, "x1": x1, "y1": y1},
         "confidence": conf, "language": lang, "choices": choices or [],
         "font_name": font_name, "symbols": symbols or []}
    return w


def _line(words, x0, y0, x1, y1, row_h=24, desc=5, asc=7):
    return {"bbox": {"x0": x0, "y0": y0, "x1": x1, "y1": y1},
            "baseline": {"x0": x0, "y0": y1 - 5, "x1": x1, "y1": y1 - 5},
            "rowAttributes": {"rowHeight": row_h, "descenders": desc,
                              "ascenders": asc},
            "words": words}


def _payload(blocks, **extra):
    return json.dumps(dict({"blocks": blocks}, **extra)).encode()


def _two_par_blocks():
    return [{
        "bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 200},
        "paragraphs": [
            {"bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 130},
             "lines": [_line([_word("Hello", 50, 100, 120, 124),
                              _word("world.", 130, 100, 210, 124)],
                             50, 100, 210, 124)]},
            {"bbox": {"x0": 50, "y0": 230, "x1": 500, "y1": 280},
             "lines": [_line([_word("Second", 50, 240, 140, 264),
                              _word("paragraph", 150, 240, 280, 264)],
                             50, 240, 280, 264)]},
        ]}]


def test_classify_tess_blocks():
    assert classify_payload(_payload(_two_par_blocks(),
                                     width=612, height=792)) \
        == "tess_blocks"


def test_blocks_basic_parse_and_metrics():
    page = parse_blocks_page(_payload(_two_par_blocks(), width=612,
                                      height=792).decode(), 0)
    assert (page.width, page.height) == (612, 792)
    assert len(page.pars) == 2
    assert [w.text for w in page.lines[0].words] == ["Hello", "world."]
    ln = page.lines[0]
    # ascHeight = rowHeight - descenders; xHeight = that - ascenders
    assert ln.asc_height == 24 - 5
    assert ln.x_height == 24 - 5 - 7
    # level baseline 5px above the line bottom
    assert ln.baseline[0] == 0
    assert ln.baseline[1] == -5


def test_blocks_bare_array_and_extent_dims():
    page = parse_blocks_page(json.dumps(_two_par_blocks()), 0)
    assert (page.width, page.height) == (500, 200)
    assert len(page.lines) == 2


def test_blocks_choices_blank_words_and_spaces():
    words = [
        _word("", 50, 100, 60, 124),          # blank: skipped
        _word("recieve", 70, 100, 160, 124, conf=40,
              choices=[{"text": "recieve", "confidence": 40},
                       {"text": "receive", "confidence": 80}],
              symbols=[{"text": "r", "bbox": {"x0": 70, "y0": 100,
                                              "x1": 80, "y1": 124}},
                       {"text": " ", "bbox": {"x0": 80, "y0": 100,
                                              "x1": 82, "y1": 124}},
                       {"text": "e", "bbox": {"x0": 82, "y0": 100,
                                              "x1": 92, "y1": 124}}]),
    ]
    blocks = [{"bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 130},
               "paragraphs": [{"bbox": {"x0": 50, "y0": 90, "x1": 500,
                                        "y1": 130},
                               "lines": [_line(words, 50, 100, 160,
                                               124)]}]}]
    page = parse_blocks_page(_payload(blocks, width=612,
                                      height=792).decode(), 0)
    (w,) = page.lines[0].words
    assert w.text == "recieve"
    assert w.text_alt == "receive"           # higher-conf alternative kept
    assert [c.text for c in w.chars] == ["r", "e"]  # LSTM space dropped


def test_blocks_chinese_symbol_per_word():
    words = [_word("\u4e2d\u6587", 50, 100, 110, 124, lang="chi_sim",
                   symbols=[{"text": "\u4e2d",
                             "bbox": {"x0": 50, "y0": 100, "x1": 78,
                                      "y1": 124}, "confidence": 90},
                            {"text": "\u6587",
                             "bbox": {"x0": 82, "y0": 100, "x1": 110,
                                      "y1": 124}, "confidence": 85}])]
    blocks = [{"bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 130},
               "paragraphs": [{"bbox": {"x0": 50, "y0": 90, "x1": 500,
                                        "y1": 130},
                               "lines": [_line(words, 50, 100, 110,
                                               124)]}]}]
    page = parse_blocks_page(_payload(blocks, width=612,
                                      height=792).decode(), 0)
    assert [w.text for w in page.lines[0].words] == ["\u4e2d", "\u6587"]
    assert page.lines[0].words[0].conf == 90


def test_blocks_italic_gate_and_font():
    words = [_word("slanted", 50, 100, 140, 124,
                   font_name="Times_New_Roman_Italic")]
    blocks = [{"bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 130},
               "paragraphs": [{"bbox": {"x0": 50, "y0": 90, "x1": 500,
                                        "y1": 130},
                               "lines": [_line(words, 50, 100, 140,
                                               124)]}]}]
    raw = _payload(blocks, width=612, height=792).decode()
    assert not parse_blocks_page(raw, 0).lines[0].words[0].style.italic
    w = parse_blocks_page(raw, 0, keep_italic=True).lines[0].words[0]
    assert w.style.italic
    assert w.style.font == "Times_New_Roman_Italic"


def test_blocks_single_word_legacy_baseline():
    # Majority of chars are baseline chars → baseline recomputed from
    # their mean50 bottom (118), overriding the declared segment (−5).
    symbols = [{"text": c, "bbox": {"x0": 50 + i * 20, "y0": 100,
                                    "x1": 68 + i * 20, "y1": 118}}
               for i, c in enumerate("ran")]
    words = [_word("ran", 50, 100, 110, 124, symbols=symbols)]
    blocks = [{"bbox": {"x0": 50, "y0": 90, "x1": 500, "y1": 130},
               "paragraphs": [{"bbox": {"x0": 50, "y0": 90, "x1": 500,
                                        "y1": 130},
                               "lines": [_line(words, 50, 100, 110,
                                               124)]}]}]
    raw = _payload(blocks, width=612, height=792).decode()
    assert parse_blocks_page(raw, 0).lines[0].baseline[1] == -5
    legacy = parse_blocks_page(raw, 0, keep_italic=True)
    assert legacy.lines[0].baseline[1] == 118 - 124


def test_blocks_end_to_end_extract():
    res = extract_document("u://blocks", _payload(_two_par_blocks(),
                                                  width=612, height=792),
                           "", "eng")
    assert res["error"] == ""
    assert res["payload_kind"] == "tess_blocks"
    assert res["doc_type"] == "ocr"
    assert res["extracted_text"] == "Hello world.\nSecond paragraph"
