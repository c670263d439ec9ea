"""Text-edit operations (textEdits.js parity: band rects, duplicate
sweep, markup sweep, line delete, line retype diff/anchoring)."""

from scribe_js_ray.model import BBox, Char, Line, Page, Par, Word
from scribe_js_ray.stages.textedits import (
    bbox_to_page_space, delete_page_words, delete_text_lines,
    find_superimposed_words, remove_markup_on_boxes, replace_text_line,
    word_band_rect)


def _page(width=612, height=792):
    return Page(0, width, height)


def _add_line(page, words_spec, top=100, bottom=124, baseline_pt=-5):
    left = min(s[1] for s in words_spec)
    right = max(s[2] for s in words_spec)
    ln = Line(page, BBox(left, top, right, bottom), [0, baseline_pt])
    for i, (text, x0, x1) in enumerate(words_spec):
        w = Word(ln, f"word_{page.n}_{len(page.lines)}_{i}", text,
                 BBox(x0, top, x1, bottom))
        w.conf = 100
        ln.words.append(w)
    page.lines.append(ln)
    par = Par(page, ln.bbox.copy())
    par.lines = [ln]
    ln.par = par
    page.pars.append(par)
    return ln


def test_word_band_rect_geometry():
    # h=24 → band half-height 3.6 around cy=112; inset min(6, 12.5)=6
    r = word_band_rect(BBox(100, 100, 150, 124), None, 0,
                       {"width": 612, "height": 792})
    assert (r.left, r.right) == (106, 144)
    assert round(r.top, 1) == 108.4 and round(r.bottom, 1) == 115.6


def test_word_band_rect_char_widening():
    chars = [Char("a", BBox(98, 100, 106, 124)),
             Char("b", BBox(140, 100, 152, 124))]
    r = word_band_rect(BBox(100, 100, 150, 124), chars, 0,
                       {"width": 612, "height": 792})
    assert (r.left, r.right) == (102, 146)  # first/last char midpoints


def test_bbox_to_page_space_orientations():
    dims = {"width": 612, "height": 792}
    b = BBox(10, 20, 110, 40)
    assert bbox_to_page_space(b, 0, dims).left == 10
    r1 = bbox_to_page_space(b, 1, dims)
    assert (r1.left, r1.top, r1.right, r1.bottom) == (612 - 40, 10,
                                                      612 - 20, 110)
    r2 = bbox_to_page_space(b, 2, dims)
    assert (r2.left, r2.top) == (612 - 110, 792 - 40)
    r3 = bbox_to_page_space(b, 3, dims)
    assert (r3.left, r3.top) == (20, 792 - 110)


def test_delete_line_sweeps_superimposed_duplicate():
    page = _page()
    visible = _add_line(page, [("Hello", 50, 120), ("world", 130, 210)])
    # alpha-0 duplicate layer at the same position, separate line
    _add_line(page, [("Hello", 51, 121), ("world", 131, 211)])
    # unrelated line far below survives
    _add_line(page, [("Keep", 50, 110)], top=300, bottom=324)
    rec = delete_text_lines(page, [visible])
    assert rec["type"] == "deleteText"
    assert len(rec["rects"]) == 2
    remaining = [w.text for ln in page.lines for w in ln.words]
    assert remaining == ["Keep"]


def test_delete_removes_covered_markup():
    page = _page()
    ln = _add_line(page, [("Hello", 50, 120), ("world", 130, 210)])
    page.marks = [
        {"type": "highlight", "bbox": BBox(50, 100, 210, 124)},
        {"type": "underline", "bbox": BBox(400, 100, 500, 124)},
    ]
    delete_text_lines(page, [ln])
    assert [m["type"] for m in page.marks] == ["underline"]


def test_remove_markup_requires_60pct_coverage():
    page = _page()
    page.marks = [{"type": "highlight", "bbox": BBox(0, 100, 200, 124)}]
    # covers only half the mark's area
    removed = remove_markup_on_boxes(page, [BBox(0, 100, 100, 124)])
    assert removed == [] and len(page.marks) == 1
    removed = remove_markup_on_boxes(page, [BBox(0, 100, 130, 124)])
    assert len(removed) == 1 and page.marks == []


def test_delete_page_words_drops_empty_lines_and_updates_bbox():
    page = _page()
    ln = _add_line(page, [("a", 50, 60), ("b", 70, 80), ("c", 90, 100)])
    delete_page_words(page, [ln.words[2].id])
    assert ln.bbox.right == 80
    delete_page_words(page, [w.id for w in ln.words])
    assert page.lines == [] and page.pars == []


def test_replace_line_noop_returns_none():
    page = _page()
    ln = _add_line(page, [("Hello", 50, 120), ("world", 130, 210)])
    assert replace_text_line(page, ln, "Hello world") is None


def test_replace_middle_word_keeps_prefix_suffix_positions():
    page = _page()
    ln = _add_line(page, [("The", 50, 80), ("quick", 90, 150),
                          ("fox", 160, 190)])
    rec = replace_text_line(page, ln, "The slow fox")
    assert rec["type"] == "replaceText"
    assert [w.text for w in ln.words] == ["The", "slow", "fox"]
    assert ln.words[0].bbox.left == 50       # untouched prefix
    assert ln.words[1].bbox.left == 90       # redrawn at old pen left
    # suffix kept or realigned depending on the new width; identity kept
    assert ln.words[2].id.endswith("_2")


def test_replace_empty_deletes_line():
    page = _page()
    ln = _add_line(page, [("Bye", 50, 90)])
    rec = replace_text_line(page, ln, "   ")
    assert rec["type"] == "deleteText"
    assert page.lines == []


def test_replace_append_anchors_on_last_word():
    page = _page()
    ln = _add_line(page, [("Hello", 50, 120)])
    rec = replace_text_line(page, ln, "Hello there")
    assert [w.text for w in ln.words] == ["Hello", "there"]
    # the last original word is redrawn to anchor the append
    assert len(rec["rects"]) == 1
    assert ln.words[1].bbox.left > ln.words[0].bbox.right


def test_replace_style_toggle_forces_redraw():
    page = _page()
    ln = _add_line(page, [("Hello", 50, 120), ("world", 130, 210)])
    rec = replace_text_line(page, ln, "Hello world",
                            word_styles=[None, {"bold": True}])
    assert rec is not None
    assert ln.words[1].style.bold


def test_edit_text_tool(tmp_path):
    from scribe_js_ray.tools import call_tool
    src = tmp_path / "doc.txt"
    src.write_text("Alpha beta gamma.\n\nSecond paragraph here.")
    res = call_tool("edit_text", {
        "file": str(src),
        "edits": [{"page": 0, "line": 0,
                   "newText": "Alpha delta gamma."},
                  {"page": 0, "line": 1}]})
    assert "error" not in res
    first, second = res["edits"]
    assert first["op"] == "replaceText"
    assert first["after"] == "Alpha delta gamma."
    assert second["op"] == "deleteText"
    out = call_tool("extract_document_text", {"file": str(src)})
    assert "delta" in out["text"] and "Second" not in out["text"]


def test_distributed_edits_pipeline(ray_session, tmp_path):
    """Broadcast edit table applied during extraction (ray.put once,
    per-url lookup inside the batch fn)."""
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    tbl = pa.table({
        "url": ["u://keep", "u://edit"],
        "html": pa.array([b"", b""], pa.binary()),
        "text": ["Alpha beta gamma.\n\nTail paragraph.",
                 "Alpha beta gamma.\n\nTail paragraph."],
        "lang": ["eng", "eng"]})
    edits = {"u://edit": [{"page": 0, "line": 0,
                           "newText": "Alpha DELTA gamma."},
                          {"page": 0, "line": 1}]}
    out = build_extract_pipeline(rd.from_arrow(tbl),
                                 edits_by_url=edits).to_pandas()
    out = out.set_index("url")
    assert out.loc["u://keep", "extracted_text"] == \
        "Alpha beta gamma.\nTail paragraph."
    assert out.loc["u://edit", "extracted_text"] == "Alpha DELTA gamma."
    assert (out["error"] == "").all()


def test_replace_short_word_styles_array_tolerated():
    page = _page()
    ln = _add_line(page, [("alpha", 50, 110), ("beta", 120, 170),
                          ("gamma", 180, 250)])
    rec = replace_text_line(page, ln, "alpha beta NEW",
                            word_styles=[None])
    assert rec["type"] == "replaceText"
    assert [w.text for w in ln.words] == ["alpha", "beta", "NEW"]


def test_replace_pure_tail_deletion_is_delete_record():
    page = _page()
    ln = _add_line(page, [("a", 50, 60), ("b", 70, 80), ("c", 90, 100)])
    rec = replace_text_line(page, ln, "a b")
    assert rec["type"] == "deleteText"
    assert len(rec["rects"]) == 1
    assert [w.text for w in ln.words] == ["a", "b"]


def test_replace_shifted_suffix_sweeps_markup():
    page = _page()
    # retype the first word much wider so the suffix shifts >= 0.5px
    ln = _add_line(page, [("a", 50, 60), ("b", 70, 80), ("c", 90, 100)])
    page.marks = [{"type": "highlight", "bbox": BBox(70, 100, 100, 124)}]
    rec = replace_text_line(page, ln, "WIDEWORD b c")
    assert rec is not None
    assert page.marks == []  # mark on the shifted suffix swept


def test_edit_text_line_numbers_resolve_against_snapshot(tmp_path):
    from scribe_js_ray.tools import call_tool
    src = tmp_path / "doc.txt"
    src.write_text("line one\n\nline two\n\nline three\n\nline four")
    res = call_tool("edit_text", {
        "file": str(src),
        "edits": [{"page": 0, "line": 1}, {"page": 0, "line": 2}]})
    out = call_tool("extract_document_text", {"file": str(src)})
    assert "error" not in res
    assert [e["before"] for e in res["edits"]] == ["line two",
                                                   "line three"]
    assert "line one" in out["text"] and "line four" in out["text"]
    assert "line two" not in out["text"]
    assert "line three" not in out["text"]
