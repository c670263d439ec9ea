"""Embedded font-program text recovery (SURVEY M5/T2): CFF charset +
encoding parsing, Type1 cleartext encodings, broken-ToUnicode fallback."""

import struct

from scribe_js_ray.stages.pdf.content import SimpleFont, build_font
from scribe_js_ray.stages.pdf.fonts_embedded import (
    parse_cff_encoding, parse_type1_encoding, to_unicode_is_broken)
from scribe_js_ray.stages.pdf.objects import StreamObj


def _index(items, off_size=1):
    out = struct.pack(">H", len(items))
    if not items:
        return out
    out += bytes([off_size])
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    for o in offs:
        out += o.to_bytes(off_size, "big")
    for it in items:
        out += it
    return out


def _build_cff(codes_names):
    """Minimal CFF: glyphs GID1.. with (code, glyph-name) from
    codes_names; names beyond the standard set go to the String INDEX."""
    std = __import__(
        "scribe_js_ray.stages.pdf.fonts_embedded",
        fromlist=["_CFF_STD"])._CFF_STD
    custom = [n for _, n in codes_names if n not in std]
    sid_of = {}
    for _, n in codes_names:
        sid_of[n] = std.index(n) if n in std else 391 + custom.index(n)

    header = b"\x01\x00\x04\x04"
    name_idx = _index([b"TestFont"])
    string_idx = _index([n.encode() for n in custom])
    n_glyphs = len(codes_names) + 1
    charstrings = _index([b"\x0e"] * n_glyphs)
    charset = b"\x00" + b"".join(
        struct.pack(">H", sid_of[n]) for _, n in codes_names)
    encoding = b"\x00" + bytes([len(codes_names)]) + bytes(
        c for c, _ in codes_names)

    # Top DICT with fixed-width (29 = int32) operands for stable layout.
    def top_dict(cs_off, enc_off, chstr_off):
        d = b"\x1d" + struct.pack(">i", cs_off) + b"\x0f"       # charset
        d += b"\x1d" + struct.pack(">i", enc_off) + b"\x10"     # encoding
        d += b"\x1d" + struct.pack(">i", chstr_off) + b"\x11"   # CharStrings
        return d

    td_len = len(top_dict(0, 0, 0))
    top_idx_overhead = 2 + 1 + 2  # count + offSize + 2 offsets
    pos0 = len(header) + len(name_idx) + top_idx_overhead + td_len \
        + len(string_idx)
    charset_off = pos0
    enc_off = charset_off + len(charset)
    chstr_off = enc_off + len(encoding)
    top_idx = _index([top_dict(charset_off, enc_off, chstr_off)])
    assert len(top_idx) == top_idx_overhead + td_len
    return header + name_idx + top_idx + string_idx + charset + encoding \
        + charstrings


def test_cff_custom_encoding_and_charset():
    data = _build_cff([(65, "A"), (66, "uni4F60"), (67, "eacute")])
    enc = parse_cff_encoding(data)
    assert enc == {65: "A", 66: "你", 67: "é"}


def test_cff_rejects_garbage():
    assert parse_cff_encoding(b"") is None
    assert parse_cff_encoding(b"\x02\x00\x04\x04junk") is None


def test_type1_cleartext_encoding():
    prog = (b"%!PS-AdobeFont-1.0: Foo\n"
            b"/Encoding 256 array\n"
            b"0 1 255 {1 index exch /.notdef put} for\n"
            b"dup 65 /Aacute put\n"
            b"dup 66 /uni0042 put\n"
            b"readonly def\n"
            b"eexec\x00\x01binarystuff")
    enc = parse_type1_encoding(prog)
    assert enc[65] == "Á" and enc[66] == "B"


def test_broken_tounicode_detected_and_bypassed():
    pua = {65: "", 66: "", 67: "", 68: ""}
    assert to_unicode_is_broken(pua)
    assert not to_unicode_is_broken({65: "A", 66: "B", 67: ""})
    f = SimpleFont("Broken", None, to_unicode=pua,
                   embedded_encoding={65: "A", 66: "B"})
    assert f.decode_byte(65) == "A"      # embedded wins over PUA garbage
    assert f.decode_byte(67) == ""  # broken map is last resort
    good = SimpleFont("Good", None, to_unicode={65: "X"},
                      embedded_encoding={65: "A"})
    assert good.decode_byte(65) == "X"   # healthy ToUnicode still wins


class _StubPdf:
    def __init__(self, streams):
        self.streams = streams

    def resolve(self, x):
        return x

    def stream_bytes(self, obj):
        return self.streams[id(obj)]


def test_build_font_uses_fontfile3():
    cff = _build_cff([(65, "Gamma"), (66, "uni4E2D")])
    ff3 = StreamObj({"Subtype": "Type1C"}, cff)
    pdf = _StubPdf({id(ff3): cff})
    font = build_font(pdf, {
        "Subtype": "Type1", "BaseFont": "ABCDEF+SubsetSans",
        "FontDescriptor": {"FontFile3": ff3}})
    assert font.decode_byte(65) == "Γ"
    assert font.decode_byte(66) == "中"
    # codes the program doesn't cover still fall back sanely
    assert font.decode_byte(0x61) == "a"


def _build_truetype(code_name_pairs, cmap_pid_eid=(3, 1)):
    """Minimal sfnt: cmap format 4 (one seg per code) + post 2.0 names."""
    import struct as st
    codes = [c for c, _ in code_name_pairs]
    n_glyphs = len(codes) + 1  # gid 0 = .notdef

    # cmap format 4: one segment per code + terminator
    segs = [(c, c, (i + 1 - c) & 0xFFFF) for i, c in enumerate(codes)]
    segs.append((0xFFFF, 0xFFFF, 1))
    seg_count = len(segs)
    sub = st.pack(">HHHHHHH", 4, 16 + 8 * seg_count, 0,
                  seg_count * 2, 0, 0, 0)
    sub += st.pack(f">{seg_count}H", *[e for _, e, _ in segs])
    sub += b"\x00\x00"  # reservedPad
    sub += st.pack(f">{seg_count}H", *[s for s, _, _ in segs])
    sub += st.pack(f">{seg_count}h",
                   *[d - 0x10000 if d > 0x7FFF else d
                     for _, _, d in segs])
    sub += st.pack(f">{seg_count}H", *([0] * seg_count))
    cmap = st.pack(">HH", 0, 1) + st.pack(">HHI", *cmap_pid_eid, 12) + sub

    # post 2.0: gid0 -> .notdef (mac index 0), others -> custom names
    names = [n for _, n in code_name_pairs]
    idx = [0] + [258 + i for i in range(len(names))]
    post = st.pack(">IIhhIIIIIH", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0,
                   n_glyphs)
    post += st.pack(f">{n_glyphs}H", *idx)
    for n in names:
        post += bytes([len(n)]) + n.encode()

    tables = [(b"cmap", cmap), (b"post", post)]
    out = st.pack(">IHHHH", 0x00010000, len(tables), 0, 0, 0)
    off = 12 + 16 * len(tables)
    recs = b""
    body = b""
    for tag, payload in tables:
        recs += tag + st.pack(">III", 0, off, len(payload))
        body += payload + b"\x00" * (-len(payload) % 4)
        off += len(payload) + (-len(payload) % 4)
    return out + recs + body


def test_truetype_cmap_post_names():
    from scribe_js_ray.stages.pdf.fonts_embedded import (
        parse_truetype_encoding)
    data = _build_truetype([(65, "Gamma"), (66, "uni4E2D"),
                            (0x82, "eacute")])
    enc = parse_truetype_encoding(data)
    assert enc[65] == "Γ" and enc[66] == "中" and enc[0x82] == "é"


def test_truetype_rejects_garbage():
    from scribe_js_ray.stages.pdf.fonts_embedded import (
        parse_truetype_encoding)
    assert parse_truetype_encoding(b"nonsense") is None
    assert parse_truetype_encoding(b"") is None
