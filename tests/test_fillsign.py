"""Fill & sign: fillable-area detection + fill-text lifting
(fillSign.js parity)."""

import pytest

from scribe_js_ray.model import BBox, Line, Page, Word
from scribe_js_ray.stages.fillsign import (
    add_fill_text, add_ink, add_stamp, detect_fill_targets,
    is_fill_text_line, sync_fill_text)


def _page(width=2550, height=3300):  # 300 dpi letter
    return Page(0, width, height)


def _line(page, words_spec, top, bottom):
    left = min(s[1] for s in words_spec)
    right = max(s[2] for s in words_spec)
    ln = Line(page, BBox(left, top, right, bottom), [0, -3])
    for i, (text, x0, x1) in enumerate(words_spec):
        w = Word(ln, f"word_{page.n}_{len(page.lines)}_{i}", text,
                 BBox(x0, top, x1, bottom))
        w.conf = 100
        ln.words.append(w)
    page.lines.append(ln)
    return ln


# -- Arm 1: checkbox glyphs -------------------------------------------------

def test_checkbox_glyph_detected():
    page = _page()
    # 40px box at 300 dpi ≈ 9.6 pt: inside [5, 24] pt
    _line(page, [("☐", 100, 140), ("Agree", 160, 360)], 100, 140)
    t = detect_fill_targets(page)
    assert len(t) == 1
    assert t[0]["kind"] == "checkbox" and t[0]["source"] == "glyph"


def test_checkbox_size_gate():
    page = _page()
    _line(page, [("☐", 100, 110)], 100, 110)  # 10px ≈ 2.4pt: too small
    rejects = []
    assert detect_fill_targets(page, rejects=rejects) == []
    assert rejects[0]["rule"] == "size"


def test_checkbox_glued_placeholder_killed():
    page = _page()
    # part-number template: G7SA-(box)A(box)B — box glued on both sides
    _line(page, [("G7SA-", 100, 260), ("☐", 262, 302),
                 ("A", 304, 336), ("☐", 338, 378), ("B", 380, 412)],
          100, 140)
    rejects = []
    t = detect_fill_targets(page, rejects=rejects)
    assert t == []
    assert {r["rule"] for r in rejects} == {"glued"}


def test_checkbox_covered_by_mark_killed():
    page = _page()
    _line(page, [("☐", 100, 140)], 100, 140)
    shapes = {"marks": [BBox(105, 105, 135, 135)]}
    rejects = []
    assert detect_fill_targets(page, shapes=shapes,
                               rejects=rejects) == []
    assert rejects[0]["rule"] == "covered"


def test_checked_box_glyph_never_candidate():
    page = _page()
    _line(page, [("☑", 100, 140)], 100, 140)  # checked box
    assert detect_fill_targets(page) == []


# -- Arm 2: underscore blanks -----------------------------------------------

def test_underscore_blank_detected():
    page = _page()
    _line(page, [("Name:", 100, 280), ("________", 300, 900)], 200, 240)
    t = detect_fill_targets(page)
    assert len(t) == 1
    assert t[0]["kind"] == "blank" and t[0]["source"] == "underscore"
    assert t[0]["bbox"].left == 300 and t[0]["bbox"].right == 900


def test_underscore_occupied_killed():
    page = _page()
    _line(page, [("Name:", 100, 280), ("________", 300, 900)], 200, 240)
    # an answer word from another line sits on the blank
    _line(page, [("Alice", 400, 600)], 195, 235)
    rejects = []
    assert detect_fill_targets(page, rejects=rejects) == []
    assert rejects[0]["rule"] == "occupied"


def test_underscore_toc_leader_killed():
    page = _page()
    _line(page, [("Introduction", 100, 500), ("________", 520, 2000),
                 ("3", 2010, 2040)], 200, 240)
    rejects = []
    assert detect_fill_targets(page, rejects=rejects) == []
    assert rejects[0]["rule"] == "toc-leader"


def test_underscore_standalone_rule_killed_without_context():
    page = _page()
    # a wide decorative rule alone on its line, no prompt above
    _line(page, [("_" * 40, 100, 1400)], 1000, 1040)
    rejects = []
    assert detect_fill_targets(page, rejects=rejects) == []
    assert rejects[0]["rule"] == "standalone-rule"


def test_underscore_standalone_rule_kept_after_prompt():
    page = _page()
    _line(page, [("Signature:", 100, 450)], 940, 980)
    _line(page, [("_" * 40, 100, 1400)], 1000, 1040)
    t = detect_fill_targets(page)
    assert len(t) == 1 and t[0]["kind"] == "blank"


def test_underscore_caption_segmentation():
    page = _page()
    # one long blank over (First) (Middle) (Last) captions
    _line(page, [("_" * 60, 300, 1800)], 500, 540)
    _line(page, [("(First)", 400, 600), ("(Middle)", 900, 1120),
                 ("(Last)", 1400, 1580)], 560, 600)
    # a prompt above so the standalone-rule kill does not fire
    _line(page, [("Name:", 100, 280)], 440, 480)
    t = detect_fill_targets(page)
    blanks = [x for x in t if x["source"] == "underscore"]
    assert len(blanks) == 3
    assert blanks[0]["bbox"].left == 300
    assert blanks[2]["bbox"].right == 1800


def test_underscore_run_merge_across_small_gap():
    page = _page()
    # split by word segmentation: two runs 10px apart (h=40 → merge)
    _line(page, [("Name:", 100, 280), ("____", 300, 500),
                 ("____", 510, 700)], 200, 240)
    t = detect_fill_targets(page)
    assert len(t) == 1
    assert t[0]["bbox"].left == 300 and t[0]["bbox"].right == 700


# -- Arm 3: phone parens ----------------------------------------------------

def test_phone_parens_slot():
    page = _page()
    _line(page, [("Phone", 100, 300), ("(", 320, 340), (")", 460, 480),
                 ("-", 500, 520)], 200, 240)
    t = detect_fill_targets(page)
    assert len(t) == 1
    assert t[0]["source"] == "parens"
    assert t[0]["bbox"].left == 340 and t[0]["bbox"].right == 460


def test_parens_without_phone_label_killed():
    page = _page()
    _line(page, [("Notes", 100, 300), ("(", 320, 340), (")", 460, 480)],
          200, 240)
    rejects = []
    assert detect_fill_targets(page, rejects=rejects) == []
    assert rejects[0]["rule"] == "no-phone-label"


# -- Fill-text lifting ------------------------------------------------------

def test_add_fill_text_lifts_lines():
    page = _page(612, 792)
    _line(page, [("Existing", 50, 150)], 50, 70)
    row = add_fill_text(page, {"x": 100, "y": 300,
                               "contents": "Jane Q. Public",
                               "fontSize": 12})
    lifted = [ln for ln in page.lines if is_fill_text_line(ln)]
    assert len(lifted) == 1
    assert [w.text for w in lifted[0].words] == ["Jane", "Q.", "Public"]
    assert all(w.style.font == "Helvetica" for w in lifted[0].words)
    # y-ordered insertion after the existing line
    assert page.lines.index(lifted[0]) == 1
    assert row["bbox"].right > 100


def test_sync_fill_text_replaces_stale_lines():
    page = _page(612, 792)
    row = add_fill_text(page, {"x": 100, "y": 300, "contents": "Old",
                               "fontSize": 12})
    prev = row["bbox"].copy()
    row["contents"] = "New text"
    sync_fill_text(page, row, prev_bbox=prev)
    lifted = [w.text for ln in page.lines if is_fill_text_line(ln)
              for w in ln.words]
    assert lifted == ["New", "text"]


def test_fill_text_ids_distinct_from_field_lift():
    page = _page(612, 792)
    add_fill_text(page, {"x": 100, "y": 300, "contents": "X",
                         "fontSize": 12})
    (w,) = [w for ln in page.lines for w in ln.words]
    assert w.id.startswith("word_1_txt")


def test_add_ink_and_stamp_validation():
    row = add_ink({"strokes": [[[10, 10], [50, 50]]], "width": 4})
    assert row["bbox"].left == 8 and row["bbox"].bottom == 52
    with pytest.raises(ValueError):
        add_ink({"strokes": []})
    with pytest.raises(ValueError):
        add_stamp({"imageData": "data:text/plain;base64,xx",
                   "bbox": {"left": 0, "top": 0, "right": 1,
                            "bottom": 1}})
    row = add_stamp({"imageData": "data:image/png;base64,AAAA",
                     "bbox": {"left": 0, "top": 0, "right": 10,
                              "bottom": 10}})
    assert row["type"] == "stamp"


def test_fill_tools(tmp_path):
    from scribe_js_ray.tools import call_tool
    src = tmp_path / "form.txt"
    src.write_text("Phone ( )  and a blank")
    res = call_tool("fill_text", {"file": str(src), "page": 0,
                                  "x": 100, "y": 300,
                                  "contents": "555-0100"})
    assert "error" not in res and res["liftedWords"] == 1
    out = call_tool("extract_document_text", {"file": str(src)})
    assert "555-0100" in out["text"]
    res = call_tool("detect_fill_targets", {"file": str(src), "page": 0,
                                            "includeRejects": True})
    assert "targets" in res and "rejects" in res
