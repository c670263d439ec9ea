"""Unit tests for the generic-HTML boilerplate strip (stages/html.py).

Covers the three heuristic layers: structural/semantic chrome, class-id
chrome hints on div-soup pages, shallow text features (word count + link
density), block fusion, and the <head><title> fallback.
"""

from scribe_js_ray.stages.html import extract_html_document

LONG = ("Alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma.")


def _types(spans):
    return [s["type"] for s in spans]


def test_semantic_chrome_dropped():
    html = ("<html><body><nav><a href='/a'>Home</a> <a href='/b'>About</a>"
            "</nav><main><p>" + LONG + "</p></main>"
            "<footer><p>Copyright 2020 Somebody. All rights reserved "
            "forever and always amen.</p></footer></body></html>")
    text, spans, _ = extract_html_document(html)
    assert LONG in text
    assert "Copyright" not in text
    assert "Home" not in text


def test_h1_in_header_chrome_is_title():
    html = ("<html><body><header><h1>The Headline Here</h1>"
            "<a href='/x'>menu</a></header>"
            "<main><p>" + LONG + "</p></main></body></html>")
    text, spans, _ = extract_html_document(html)
    assert text.startswith("The Headline Here")
    assert _types(spans)[0] == "title"
    assert "menu" not in text


def test_class_hint_chrome_dropped():
    # Div-soup: every block would pass the word-count rule; only the
    # class hints identify the chrome.
    html = ("<html><body>"
            "<div class='content'><p>" + LONG + "</p></div>"
            "<div class='comments-area'><div class='comment-body'><p>"
            "This comment is definitely long enough to pass the word "
            "count rule by itself.</p></div></div>"
            "<div class='sidebar'><p>Sidebar promo text that is also "
            "long enough to pass the plain word count rule.</p></div>"
            "</body></html>")
    text, spans, _ = extract_html_document(html)
    assert LONG in text
    assert "comment" not in text.lower()
    assert "Sidebar" not in text


def test_nested_unhinted_div_does_not_release_hint():
    # An inner plain <div> closing must not end the outer hinted region.
    html = ("<html><body>"
            "<div class='sidebar'><div><p>inner</p></div>"
            "<p>Trailing sidebar text long enough to pass the word "
            "count rule on its own merits.</p></div>"
            "<main><p>" + LONG + "</p></main></body></html>")
    text, _, _ = extract_html_document(html)
    assert "Trailing sidebar" not in text
    assert LONG in text


def test_link_density_kills_listings():
    links = " ".join(f"<a href='/{i}'>item number {i} in the list</a>"
                     for i in range(8))
    html = ("<html><body><div><p>" + links + "</p></div>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, _, _ = extract_html_document(html)
    assert "item number" not in text
    assert LONG in text


def test_block_fusion_keeps_short_middle_block():
    html = ("<html><body><main>"
            "<p>" + LONG + "</p>"
            "<p>Short pull quote.</p>"
            "<p>" + LONG + "</p>"
            "</main></body></html>")
    text, _, _ = extract_html_document(html)
    assert "Short pull quote." in text


def test_block_fusion_requires_body_neighbors():
    # Same short block with chrome before it and nothing after: dropped.
    html = ("<html><body>"
            "<p>Short orphan line.</p>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, _, _ = extract_html_document(html)
    assert "Short orphan line." not in text


def test_head_title_fallback():
    html = ("<html><head><title>Fallback Title</title></head><body>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, spans, _ = extract_html_document(html)
    assert text.startswith("Fallback Title")
    assert _types(spans)[0] == "title"


def test_no_title_fallback_when_h1_present():
    html = ("<html><head><title>Head Title</title></head><body>"
            "<h1>Visible Title</h1>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, spans, _ = extract_html_document(html)
    assert "Head Title" not in text
    assert text.startswith("Visible Title")


def test_empty_and_malformed():
    assert extract_html_document("")[0] == ""
    text, spans, _ = extract_html_document("<div><p>< broken <<>")
    assert isinstance(text, str)


def test_span_offsets_are_byte_offsets():
    html = ("<html><body><main><p>Prefix éé accents here in a "
            "long enough paragraph to keep.</p><p>" + LONG + "</p>"
            "</main></body></html>")
    text, spans, _ = extract_html_document(html)
    data = text.encode()
    for s in spans:
        seg = data[s["start"]:s["end"]].decode()
        assert seg == seg.strip() and seg


def test_svg_title_not_document_title():
    html = ("<html><body>"
            "<svg><title>Chart icon</title><rect/></svg>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, spans, _ = extract_html_document(html)
    assert "Chart icon" not in text
    assert LONG in text


def test_fusion_does_not_skip_rejected_blocks():
    links = " ".join(f"<a href='/{i}'>link {i} here</a>" for i in range(6))
    html = ("<html><body>"
            "<div><p>" + LONG + "</p></div>"
            "<div><p>" + links + "</p></div>"
            "<div><p>Subscribe today for more.</p></div>"
            "<div><p>" + links + "</p></div>"
            "<div><p>" + LONG + "</p></div></body></html>")
    text, _, _ = extract_html_document(html)
    assert "Subscribe today" not in text


def test_fusion_promotes_contiguous_short_run():
    html = ("<html><body><main>"
            "<p>" + LONG + "</p>"
            "<p>First short line.</p>"
            "<p>Second short line.</p>"
            "<p>" + LONG + "</p>"
            "</main></body></html>")
    text, _, _ = extract_html_document(html)
    assert "First short line." in text and "Second short line." in text
