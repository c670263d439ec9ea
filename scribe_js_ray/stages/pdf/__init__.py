"""PDF text-layer extraction (no rendering, no OCR).

A from-scratch Python implementation of the reference's text-native PDF
path, structured after (not copied from) /root/reference/js/pdf/:
- ``objects``  — xref/object/stream parsing (parsePdfUtils.js analog)
- ``content``  — content-stream lexer + BT/ET text-operator interpreter
                 (contentStream.js / parsePdfDoc.js executeTextOperators)
- ``assemble`` — glyph-run → word → line grouping (groupCharsIntoPage
                 subset: y-jump/backward-x line cuts, gap word splits)
- ``widths``   — base-14 font metrics (standard Type1 widths)

Round-1 scope: uncompressed + FlateDecode streams, base-14 and
embedded-/Widths fonts with StandardEncoding/WinAnsi, Tj/TJ/Td/TD/Tm/T*/
TL/Tc/Tw/Tz/q/Q/cm operators.  Encrypted PDFs, Type0/CID fonts, Form
XObjects and inline images are detected and surfaced as errors, not crashes.
"""

from .doc import parse_pdf_document  # noqa: F401
