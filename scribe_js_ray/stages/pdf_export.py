"""PDF export: page model → searchable text PDF (SURVEY S9 writePdf).

Core of the reference's writePdf (/root/reference/js/export/pdf/
writePdf.js:49 + writePdfText.js ocrPageToPDFStream), re-scoped to the
text layer this engine owns:

- ``text_mode='ebook'``  — visible black text (the reborn-document mode)
- ``text_mode='invis'``  — invisible text (Tr 3) for scan overlays
- one PDF page per model Page at its pixel dims (1 px = 1 pt, the OCR
  overlay convention); each word positioned at its baseline with its
  style size; bold/italic via the base-14 family variants
- WinAnsi text encoding (unencodable codepoints degrade to '?'),
  FlateDecode content streams, classic xref

Round-trips through this engine's own parser (tests) — the structural
guarantee the reference gets from its vitest PDF round-trip suite.
"""

from __future__ import annotations

import zlib

_BASE14 = {
    ("Helvetica", False, False): "Helvetica",
    ("Helvetica", True, False): "Helvetica-Bold",
    ("Helvetica", False, True): "Helvetica-Oblique",
    ("Helvetica", True, True): "Helvetica-BoldOblique",
    ("Times", False, False): "Times-Roman",
    ("Times", True, False): "Times-Bold",
    ("Times", False, True): "Times-Italic",
    ("Times", True, True): "Times-BoldItalic",
    ("Courier", False, False): "Courier",
    ("Courier", True, False): "Courier-Bold",
    ("Courier", False, True): "Courier-Oblique",
    ("Courier", True, True): "Courier-BoldOblique",
}


def _family_of(name) -> str:
    low = (name or "").lower()
    if "courier" in low or "mono" in low:
        return "Courier"
    if "times" in low or "serif" in low and "sans" not in low:
        return "Times"
    return "Helvetica"


def _font_key(word) -> str:
    fam = _family_of(word.style.font)
    return _BASE14[(fam, bool(word.style.bold), bool(word.style.italic))]


def _esc_winansi(s: str) -> bytes:
    out = bytearray()
    data = s.encode("cp1252", "replace")
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.append(0x5C)
        out.append(b)
    return bytes(out)


class _EmbFont:
    """One source TrueType program being re-embedded (the rawFontBytes
    Type0 path of writePdfFonts.js:292 createEmbeddedFontType0)."""

    __slots__ = ("family", "data", "metrics", "tag", "used_gids")

    def __init__(self, family, data, metrics, tag):
        self.family = family
        self.data = data
        self.metrics = metrics
        self.tag = tag
        self.used_gids: dict[int, str] = {}    # gid → unicode shown

    def encode(self, text: str):
        """GID hex string for ``text``, or None if any char is missing
        from the program's cmap (word falls back to base-14)."""
        gids = []
        u2g = self.metrics["uni_to_gid"]
        for ch in text:
            gid = u2g.get(ord(ch))
            if gid is None:
                return None
            gids.append(gid)
        for gid, ch in zip(gids, text):
            self.used_gids.setdefault(gid, ch)
        return "<" + "".join(f"{g:04X}" for g in gids) + ">"


def _ps_name_of(emb: _EmbFont) -> str:
    name = emb.metrics.get("ps_name") or emb.family or "Embedded"
    return "".join(c for c in name if 0x21 <= ord(c) <= 0x7E
                   and c not in "()<>[]{}/%#") or "Embedded"


def _to_unicode_cmap(used_gids: dict[int, str]) -> bytes:
    """bfchar ToUnicode CMap for the used GIDs (createToUnicode
    analog)."""
    entries = "\n".join(
        f"<{gid:04X}> <{ord(ch):04X}>"
        for gid, ch in sorted(used_gids.items()))
    return (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        "/Supplement 0 >> def\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(used_gids)} beginbfchar\n{entries}\nendbfchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\n"
        "end\nend\n").encode("latin-1")


def _bbox_intersects(b, region) -> bool:
    rl, rt, rr, rb = region
    return not (b.right < rl or b.left > rr or b.bottom < rt
                or b.top > rb)


def _glyph_path_ops(src, metrics, text: str, x: float, y: float,
                    size: float) -> list[str] | None:
    """Filled vector-path operators for ``text`` at baseline (x, y) —
    the glyph-to-path core of convertTextRegionsToPaths.js
    (pathCommandsToOps:368: quadratics lifted to cubics because PDF
    has no native quadratic operator; nonzero fill)."""
    upm = src.units_per_em or 1000
    s = size / upm
    u2g = metrics["uni_to_gid"]
    pen = x
    ops: list[str] = []
    any_marks = False
    for ch in text:
        gid = u2g.get(ord(ch))
        if gid is None:
            return None
        outline = src.outline(gid)
        if outline is None:
            return None
        cx = cy = 0.0
        for cmd in outline:
            if cmd[0] == "m":
                cx, cy = cmd[1], cmd[2]
                ops.append(f"{pen + cx * s:.2f} {y + cy * s:.2f} m")
            elif cmd[0] == "l":
                cx, cy = cmd[1], cmd[2]
                ops.append(f"{pen + cx * s:.2f} {y + cy * s:.2f} l")
            elif cmd[0] == "q":
                qx, qy, ex, ey = cmd[1:]
                c1x = cx + 2.0 / 3.0 * (qx - cx)
                c1y = cy + 2.0 / 3.0 * (qy - cy)
                c2x = ex + 2.0 / 3.0 * (qx - ex)
                c2y = ey + 2.0 / 3.0 * (qy - ey)
                ops.append(
                    f"{pen + c1x * s:.2f} {y + c1y * s:.2f} "
                    f"{pen + c2x * s:.2f} {y + c2y * s:.2f} "
                    f"{pen + ex * s:.2f} {y + ey * s:.2f} c")
                cx, cy = ex, ey
            elif cmd[0] == "z":
                ops.append("h")
                any_marks = True
        adv = metrics["advances"][gid] if gid < len(
            metrics["advances"]) else 500
        pen += adv * size / 1000.0
    if any_marks:
        ops.append("f")
    return ops


def write_pdf(pages, text_mode: str = "ebook",
              embed_fonts: bool = True,
              path_regions: dict | None = None,
              path_pages: set | None = None,
              standardize_page_size: bool = False) -> bytes:
    """pages: list of model Pages → PDF bytes.

    ``embed_fonts``: when the source document carried TrueType programs
    (``page.font_programs``), words whose family matches are written as
    Identity-H GID strings against a re-embedded /FontFile2 — the
    exported PDF renders with the document's own glyph outlines
    (convertTextRegionsToPaths.js / writePdfFonts.js parity surface);
    everything else falls back to base-14 text.

    ``path_regions`` ({page_index: [(l, t, r, b), ...]} in page pixel
    coords) and ``path_pages`` (page indices): words intersecting a
    region (or on a listed page) are drawn as FILLED VECTOR PATHS from
    the source font's glyf outlines instead of text operators — they
    no longer extract as text, matching the reference's
    convertRegionsToPaths / convertFullPages rebuild options
    (subsetPdf.js:332-333, convertTextRegionsToPaths.js:538).

    ``standardize_page_size``: every page uses the document's max
    width/height (the reference's standardizePageSize option —
    export.js:406-412 dimsLimit → writePdf.js outputDims)."""
    if text_mode not in ("ebook", "invis"):
        raise ValueError(f"unsupported text_mode: {text_mode}")
    std_w = std_h = None
    if standardize_page_size and pages:
        std_w = max(max(int(round(p.width or 612)), 1) for p in pages)
        std_h = max(max(int(round(p.height or 792)), 1) for p in pages)
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    n_pages = len(pages)
    # Object layout: 1 catalog, 2 pages, then [page, contents]×n, fonts.
    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(b"")  # pages node placeholder (filled below)

    used_fonts: dict[str, str] = {}   # base name -> resource tag

    def tag_for(base: str) -> str:
        if base not in used_fonts:
            used_fonts[base] = f"F{len(used_fonts) + 1}"
        return used_fonts[base]

    emb_fonts: dict[str, _EmbFont] = {}   # family -> embedded record
    emb_failed: set = set()

    def emb_for(page, family):
        if not embed_fonts or not family:
            return None
        rec = emb_fonts.get(family)
        if rec is not None or family in emb_failed:
            return rec
        data = (getattr(page, "font_programs", None) or {}).get(family)
        if data is None:
            return None
        from .pdf.fonts_embedded import truetype_metrics
        metrics = truetype_metrics(data)
        if metrics is None:
            emb_failed.add(family)
            return None
        rec = _EmbFont(family, data, metrics,
                       f"EF{len(emb_fonts) + 1}")
        emb_fonts[family] = rec
        return rec

    glyph_srcs: dict[str, object] = {}    # family -> GlyphSource|None

    def glyph_src_for(page, family):
        if family not in glyph_srcs:
            from .pdf.fonts_embedded import GlyphSource
            data = (getattr(page, "font_programs", None) or {}).get(family)
            src = GlyphSource(data) if data else None
            glyph_srcs[family] = src if src is not None and src.ok \
                else None
        return glyph_srcs[family]

    page_bodies = []
    for page_idx, page in enumerate(pages):
        h_px = std_h or max(int(round(page.height or 792)), 1)
        regions = (path_regions or {}).get(page_idx) or []
        whole_page = bool(path_pages and page_idx in path_pages)
        parts = ["BT"]
        if text_mode == "invis":
            parts.append("3 Tr")
        for line in page.lines:
            base_y = line.bbox.bottom + (line.baseline[1] or 0)
            for word in line.words:
                size = word.style.size or \
                    ((line.asc_height or 9) / 0.75)
                size = max(round(float(size), 2), 1)
                x = round(word.bbox.left, 2)
                y = round(h_px - base_y, 2)
                emb = emb_for(page, word.style.font)
                if (whole_page or any(
                        _bbox_intersects(word.bbox, r)
                        for r in regions)) and emb is not None:
                    src = glyph_src_for(page, word.style.font)
                    ops = _glyph_path_ops(
                        src, emb.metrics, word.text, x, y, size) \
                        if src is not None else None
                    if ops is not None:
                        # Path ops are illegal inside a text object:
                        # close it, draw, reopen (the bounceFlushInBT
                        # move, convertTextRegionsToPaths.js:762).
                        parts.append("ET")
                        parts.extend(ops)
                        parts.append("BT")
                        if text_mode == "invis":
                            parts.append("3 Tr")
                        continue
                shown = emb.encode(word.text) if emb is not None else None
                if shown is not None:
                    parts.append(f"/{emb.tag} {size:g} Tf")
                    parts.append(f"1 0 0 1 {x:g} {y:g} Tm")
                    parts.append(f"{shown} Tj")
                    continue
                base = _font_key(word)
                tag = tag_for(base)
                txt = _esc_winansi(word.text).decode("latin-1")
                parts.append(f"/{tag} {size:g} Tf")
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm")
                parts.append(f"({txt}) Tj")
        parts.append("ET")
        page_bodies.append(("\n".join(parts)).encode("latin-1"),)

    first_page_obj = 3
    font_obj_start = first_page_obj + 2 * n_pages
    # Base-14 fonts: 1 object each.  Embedded fonts: 5 objects each —
    # Type0 dict, CIDFontType2 (W inline), FontDescriptor, FontFile2
    # stream, ToUnicode stream (writePdfFonts.js object layout).
    # A family whose every word was path-converted never shows text:
    # no used GIDs, so the font objects would be dead weight.
    emb_list = [e for e in emb_fonts.values() if e.used_gids]
    emb_obj_start = font_obj_start + len(used_fonts)
    font_refs = " ".join(
        f"/{tag} {font_obj_start + i} 0 R"
        for i, (base, tag) in enumerate(used_fonts.items()))
    emb_refs = " ".join(
        f"/{e.tag} {emb_obj_start + 5 * i} 0 R"
        for i, e in enumerate(emb_list))
    all_refs = " ".join(x for x in (font_refs, emb_refs) if x)

    for i, page in enumerate(pages):
        w_px = std_w or max(int(round(page.width or 612)), 1)
        h_px = std_h or max(int(round(page.height or 792)), 1)
        page_id = add(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w_px} {h_px}] "
             f"/Resources << /Font << {all_refs} >> >> "
             f"/Contents {first_page_obj + 2 * i + 1} 0 R >>").encode())
        assert page_id == first_page_obj + 2 * i
        comp = zlib.compress(page_bodies[i])
        add(b"<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + comp
            + b"\nendstream")
    for i, base in enumerate(used_fonts):
        fid = add(f"<< /Type /Font /Subtype /Type1 /BaseFont /{base} "
                  f"/Encoding /WinAnsiEncoding >>".encode())
        assert fid == font_obj_start + i
    for i, e in enumerate(emb_list):
        m = e.metrics
        base = _ps_name_of(e)
        o_type0 = emb_obj_start + 5 * i
        o_cid = o_type0 + 1
        o_desc = o_type0 + 2
        o_file = o_type0 + 3
        o_tu = o_type0 + 4
        fid = add((f"<< /Type /Font /Subtype /Type0 /BaseFont /{base} "
                   f"/Encoding /Identity-H /DescendantFonts [{o_cid} 0 R] "
                   f"/ToUnicode {o_tu} 0 R >>").encode())
        assert fid == o_type0
        w_entries = " ".join(
            f"{gid} [{m['advances'][gid] if gid < len(m['advances']) else 500}]"
            for gid in sorted(e.used_gids))
        add((f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /{base} "
             f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
             f"/Supplement 0 >> /FontDescriptor {o_desc} 0 R "
             f"/CIDToGIDMap /Identity /DW 1000 "
             f"/W [ {w_entries} ] >>").encode())
        bb = m["bbox"]
        add((f"<< /Type /FontDescriptor /FontName /{base} /Flags 32 "
             f"/FontBBox [{bb[0]} {bb[1]} {bb[2]} {bb[3]}] "
             f"/ItalicAngle {m['italic_angle']:g} "
             f"/Ascent {m['ascent']} /Descent {m['descent']} "
             f"/CapHeight {m['ascent']} /StemV 80 "
             f"/FontFile2 {o_file} 0 R >>").encode())
        comp = zlib.compress(e.data)
        add(b"<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode /Length1 "
            + str(len(e.data)).encode()
            + b" >>\nstream\n" + comp + b"\nendstream")
        tu = _to_unicode_cmap(e.used_gids)
        comp = zlib.compress(tu)
        tid = add(b"<< /Length " + str(len(comp)).encode()
                  + b" /Filter /FlateDecode >>\nstream\n" + comp
                  + b"\nendstream")
        assert tid == o_tu

    kids = " ".join(f"{first_page_obj + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = (f"<< /Type /Pages /Kids [{kids}] "
                  f"/Count {n_pages} >>").encode()

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def _ser_obj(obj) -> bytes:
    """Serialize a parsed PDF object back to bytes (inverse of the
    Lexer's object grammar)."""
    from .pdf.objects import Name, Ref, StreamObj

    if obj is None:
        return b"null"
    if obj is True:
        return b"true"
    if obj is False:
        return b"false"
    if isinstance(obj, Ref):
        # all copied objects are re-emitted at generation 0, so refs are
        # normalized too (a preserved gen>0 ref would dangle)
        return f"{obj.num} 0 R".encode()
    if isinstance(obj, Name):
        out = []
        for ch in str(obj).encode("latin-1", "replace"):
            if ch in b"()<>[]{}/%# \t\r\n" or ch < 0x21 or ch > 0x7E:
                out.append(f"#{ch:02X}".encode())
            else:
                out.append(bytes([ch]))
        return b"/" + b"".join(out)
    if isinstance(obj, bool):
        return b"true" if obj else b"false"
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        # %g emits exponent notation, which is not valid PDF real syntax
        txt = f"{obj:.6f}".rstrip("0").rstrip(".")
        return (txt or "0").encode()
    if isinstance(obj, (bytes, bytearray)):
        return b"<" + bytes(obj).hex().encode() + b">"
    if isinstance(obj, str):
        return b"<" + obj.encode("latin-1", "replace").hex().encode() + b">"
    if isinstance(obj, list):
        return b"[" + b" ".join(_ser_obj(v) for v in obj) + b"]"
    if isinstance(obj, dict):
        body = b" ".join(_ser_obj(Name(k)) + b" " + _ser_obj(v)
                         for k, v in obj.items())
        return b"<< " + body + b" >>"
    if isinstance(obj, StreamObj):
        d = _ser_obj(obj.dict)
        return d + b"\nstream\n" + obj.raw + b"\nendstream"
    raise TypeError(f"unserializable PDF object: {type(obj)}")


def overlay_pdf_text(original: bytes, pages, text_mode: str = "invis",
                     scale: float | None = None) -> bytes:
    """Overlay a recognized text layer onto the ORIGINAL PDF's pages —
    the reference's writePdfOverlay (export/pdf/writePdfOverlay.js)
    re-scoped to the text layer: every original object survives
    (re-serialized through the parsed object model), each page gains an
    extra /Contents stream of positioned (default invisible, Tr 3) text
    plus a base-14 font resource.  ``pages``: one model Page per
    original page, coordinates in the page's pixel space (÷ scale →
    points; defaults to the parse-time 300/72 raster scale capped by
    page width)."""
    import zlib

    from .pdf.doc import DEFAULT_DPI_SCALE, MAX_RASTER_W, _walk_pages
    from .pdf.objects import Name, PdfFile, Ref

    pdf = PdfFile(original)
    if pdf.trailer.get("Encrypt") is not None:
        raise ValueError("overlay onto encrypted PDFs is unsupported")
    infos = _walk_pages(pdf)

    # Copy every reachable object under its original number.
    objects: dict[int, object] = {}
    max_num = 0
    for num in set(pdf.offsets) | set(pdf.compressed):
        obj = pdf.get_object(num)
        if obj is None:
            continue
        objects[num] = obj
        max_num = max(max_num, num)
    next_num = max_num + 1

    font_alias = "ScribeOverlayFont"
    font_num = next_num
    next_num += 1
    objects[font_num] = {
        Name("Type"): Name("Font"), Name("Subtype"): Name("Type1"),
        Name("BaseFont"): Name("Helvetica"),
        Name("Encoding"): Name("WinAnsiEncoding")}

    for info, page in zip(infos, pages):
        num = info.get("_ref_num")
        node = objects.get(num)
        if not isinstance(node, dict) or page is None:
            continue
        media = [float(pdf.resolve(v)) for v in
                 (pdf.resolve(info.get("CropBox"))
                  or pdf.resolve(info.get("MediaBox"))
                  or [0, 0, 612, 792])]
        width_pt = abs(media[2] - media[0]) or 612
        height_pt = abs(media[3] - media[1]) or 792
        sc = scale if scale is not None else min(
            DEFAULT_DPI_SCALE, MAX_RASTER_W / width_pt)
        parts = ["q", "BT"]
        if text_mode == "invis":
            parts.append("3 Tr")
        for line in page.lines:
            base_y = line.bbox.bottom + (line.baseline[1] or 0)
            for word in line.words:
                size = (word.style.size or (line.asc_height or 9) / 0.75)
                size = max(round(float(size) / sc, 2), 1)
                x = round(word.bbox.left / sc + media[0], 2)
                y = round(height_pt - base_y / sc + media[1], 2)
                txt = _esc_winansi(word.text).decode("latin-1")
                parts.append(f"/{font_alias} {size:g} Tf")
                parts.append(f"1 0 0 1 {x:g} {y:g} Tm")
                parts.append(f"({txt}) Tj")
        parts.append("ET")
        parts.append("Q")
        payload = zlib.compress("\n".join(parts).encode("latin-1"))
        from .pdf.objects import StreamObj
        stream_num = next_num
        next_num += 1
        objects[stream_num] = StreamObj(
            {Name("Length"): len(payload),
             Name("Filter"): Name("FlateDecode")}, payload)

        # Append to /Contents (wrapping a single stream into an array)
        # and add the overlay font to the page Resources.
        node = dict(node)
        contents = node.get("Contents")
        resolved = pdf.resolve(contents)
        if isinstance(resolved, list):
            # /Contents may be an indirect ref TO an array — flatten it,
            # a nested array ref is invalid
            node[Name("Contents")] = list(resolved) + [Ref(stream_num, 0)]
        elif contents is None:
            node[Name("Contents")] = [Ref(stream_num, 0)]
        else:
            node[Name("Contents")] = [contents, Ref(stream_num, 0)]
        res = pdf.resolve(node.get("Resources"))
        res = dict(res) if isinstance(res, dict) else {}
        fonts = pdf.resolve(res.get("Font"))
        fonts = dict(fonts) if isinstance(fonts, dict) else {}
        fonts[Name(font_alias)] = Ref(font_num, 0)
        res[Name("Font")] = fonts
        node[Name("Resources")] = res
        objects[num] = node

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + _ser_obj(objects[num]) \
            + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(objects) + 1
    out += f"xref\n0 {maxn}\n".encode() + b"0000000000 65535 f \n"
    for i in range(1, maxn):
        if i in offsets:
            out += f"{offsets[i]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    root = pdf.trailer.get("Root")
    out += (b"trailer\n<< /Size " + str(maxn).encode()
            + b" /Root " + _ser_obj(root) + b" >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)
