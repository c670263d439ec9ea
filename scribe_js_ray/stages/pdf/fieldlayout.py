"""Form-field value layout inside the widget rect (M28/S14 support).

Faithful decision-surface port of the reference's field-appearance
rules — /root/reference/js/pdf/formFieldLayout.js:32-99 — used both by
the parse-time value lift (parsePdfDoc.js:1127-1176) and the
``set_form_value`` edit verb (formFields.js:15-87):

* font size: the /DA string's ``Tf`` size wins; 0 or absent means
  auto-size (min(12, max(6, rectH-4))), default 10 when no /DA;
* multiline (/Ff bit 13): greedy word wrap at ``(rectW-2*pad)/avgCharW``
  chars, leading = 1.15 em, top-down from ``rectH - pad - fontSize``;
* comb (/Ff bit 25 + /MaxLen): one char per cell of width
  ``rectW/maxLen``, no padding;
* quadding /Q: 0 left, 1 center, 2 right (single-line only).

All geometry is /Rect-local PDF points; ``avgCharW = fontSize * 0.5``
(the reference lays out with a fixed average advance, not real metrics —
byte parity requires copying that choice).
"""

from __future__ import annotations

import re

_TF_RE = re.compile(r"/[\w+-]+\s+([\d.]+)\s+Tf")
_WORD_RE = re.compile(r"\S+")
_EOL_RE = re.compile(r"\r\n|\r|\n")

PAD = 2.0


def _words_of(text: str, line_x: float, char_w: float) -> list[dict]:
    return [{"text": m.group(0),
             "x0": line_x + m.start() * char_w,
             "x1": line_x + (m.start() + len(m.group(0))) * char_w}
            for m in _WORD_RE.finditer(text)]


def layout_field_value(value: str, rect_w: float, rect_h: float, *,
                       multiline: bool = False, comb: bool = False,
                       max_len: int | None = None, quadding: int = 0,
                       da: str | None = None) -> dict:
    """Returns ``{"font_size": float, "lines": [{"text", "x", "y",
    "words": [{"text", "x0", "x1"}]}]}`` with y = baseline height above
    the rect bottom (formFieldLayout.js:32)."""
    m = _TF_RE.search(da) if da else None
    font_size = float(m.group(1)) if m else 10.0
    if not font_size:
        font_size = min(12.0, max(6.0, rect_h - 4.0))
    avg_char_w = font_size * 0.5
    lines: list[dict] = []

    if multiline:
        max_chars = max(1, int((rect_w - 2 * PAD) // avg_char_w))
        wrapped: list[str] = []
        for para in _EOL_RE.split(value):
            words = [w for w in re.split(r"\s+", para) if w]
            if not words:
                wrapped.append("")
                continue
            line = ""
            for w in words:
                if not line:
                    line = w
                elif len(line) + 1 + len(w) <= max_chars:
                    line += " " + w
                else:
                    wrapped.append(line)
                    line = w
            if line:
                wrapped.append(line)
        leading = font_size * 1.15
        y = rect_h - PAD - font_size
        for text in wrapped:
            if text:
                lines.append({"text": text, "x": PAD, "y": y,
                              "words": _words_of(text, PAD, avg_char_w)})
            y -= leading
        return {"font_size": font_size, "lines": lines}

    y = max(PAD, (rect_h - font_size) / 2 + font_size * 0.2)
    if comb and max_len and max_len > 0:
        cell_w = rect_w / max_len
        comb_words = [{"text": m.group(0), "x0": m.start() * cell_w,
                       "x1": (m.start() + len(m.group(0))) * cell_w}
                      for m in _WORD_RE.finditer(value)]
        lines.append({"text": value, "x": 0.0, "y": y,
                      "words": comb_words})
        return {"font_size": font_size, "lines": lines}

    text_w = len(value) * avg_char_w
    x = PAD
    if quadding == 1:
        x = max(PAD, (rect_w - text_w) / 2)
    elif quadding == 2:
        x = max(PAD, rect_w - text_w - PAD)
    lines.append({"text": value, "x": x, "y": y,
                  "words": _words_of(value, x, avg_char_w)})
    return {"font_size": font_size, "lines": lines}
