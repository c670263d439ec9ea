"""Reading-order operators: region-priority reorder + column-major fix."""

from scribe_js_ray.model import BBox, line_text
from scribe_js_ray.stages.alto import parse_alto_page
from scribe_js_ray.stages.reorder import (
    detect_column_gutter, reorder_ocr_page, reorder_two_columns)

from tests.test_formats import make_alto


def _two_column_page():
    """6 rows, interleaved raster order: L0 R0 L1 R1 L2 R2."""
    xml = make_alto([[(f"w{i}", {})] for i in range(6)])
    page, _ = parse_alto_page(xml, 0)
    for i, ln in enumerate(page.lines):
        col = i % 2
        row = i // 2
        x = 100 if col == 0 else 1200
        y = 200 + row * 150
        w = ln.words[0]
        width = w.bbox.right - w.bbox.left
        w.bbox = BBox(x, y, x + width, y + 100)
        ln.bbox = BBox(x, y, x + width, y + 100)
    return page


def test_detect_gutter():
    page = _two_column_page()
    g = detect_column_gutter(page)
    assert g is not None
    assert 300 < g < 1300


def test_reorder_two_columns():
    page = _two_column_page()
    reorder_two_columns(page)
    assert [line_text(ln) for ln in page.lines] == \
        ["w0", "w2", "w4", "w1", "w3", "w5"]


def test_no_gutter_no_reorder():
    xml = make_alto([[("full", {}), ("width", {}), ("lines", {}),
                      ("span", {}), ("across", {}), ("everything", {})]
                     for _ in range(6)])
    page, _ = parse_alto_page(xml, 0)
    order_before = [line_text(ln) for ln in page.lines]
    reorder_two_columns(page)
    assert [line_text(ln) for ln in page.lines] == order_before


def test_reorder_by_region_priority():
    page = _two_column_page()
    # region covering the right column gets priority 0; left column 1
    boxes = [
        {"coords": BBox(1100, 0, 2000, 3000), "type": "order", "order": 0},
        {"coords": BBox(0, 0, 1000, 3000), "type": "order", "order": 1},
    ]
    reorder_ocr_page(page, boxes)
    assert [line_text(ln) for ln in page.lines] == \
        ["w1", "w3", "w5", "w0", "w2", "w4"]


def test_exclude_region_drops_lines():
    page = _two_column_page()
    boxes = [
        {"coords": BBox(1100, 0, 2000, 3000), "type": "exclude"},
    ]
    reorder_ocr_page(page, boxes)
    assert [line_text(ln) for ln in page.lines] == ["w0", "w2", "w4"]
