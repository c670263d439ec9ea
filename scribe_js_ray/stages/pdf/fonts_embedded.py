"""Embedded font-program parsing for text recovery (SURVEY M5/T2).

When a simple font carries no usable /ToUnicode and no /Differences, the
code→unicode mapping must come from the embedded font program itself —
the reference does this with a vendored opentype.js fork
(/root/reference/js/font-parser, js/pdf/fonts/parsePdfFonts.js:695);
this engine parses just the naming structures it needs:

- CFF (/FontFile3, Subtype /Type1C): header → INDEXes → Top DICT →
  charset (GID→SID→glyph name) + encoding (code→GID), yielding a
  code→glyph-name map resolved through the AGL resolver.  Subset fonts
  name glyphs ``uniXXXX``/standard names, so this recovers real text
  where the latin-1 fallback produced mojibake.
- Type1 (/FontFile): the cleartext header's ``/Encoding`` array
  (``dup <code> /<name> put`` entries).
- OpenType (/FontFile3 /OpenType or /FontFile2 TrueType): cmap table
  (format 4/6/12) mapping unicode→GID, inverted for single-byte codes
  when the font is symbolic with a (3,0) table.

All parsers are defensive: any malformed structure returns ``None`` and
the caller falls back to the base-encoding path.
"""

from __future__ import annotations

import re
import struct

from .glyphnames import glyph_to_unicode

# CFF standard strings, SIDs 0-390 (CFF spec appendix A).
_CFF_STD = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M N "
    "O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q r "
    "s t u v w x y z braceleft bar braceright asciitilde exclamdown cent "
    "sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash "
    "dagger daggerdbl periodcentered paragraph bullet quotesinglbase "
    "quotedblbase quotedblright guillemotright ellipsis perthousand "
    "questiondown grave acute circumflex tilde macron breve dotaccent "
    "dieresis ring cedilla hungarumlaut ogonek caron emdash AE "
    "ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash "
    "oe germandbls onesuperior logicalnot mu trademark Eth onehalf "
    "plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron "
    "exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior "
    "ampersandsmall Acutesmall parenleftsuperior parenrightsuperior "
    "twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle "
    "threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle "
    "eightoldstyle nineoldstyle commasuperior threequartersemdash "
    "periodsuperior questionsmall asuperior bsuperior centsuperior "
    "dsuperior esuperior isuperior lsuperior msuperior nsuperior "
    "osuperior rsuperior ssuperior tsuperior ff ffi ffl "
    "parenleftinferior parenrightinferior Circumflexsmall hyphensuperior "
    "Gravesmall Asmall Bsmall Csmall Dsmall Esmall Fsmall Gsmall Hsmall "
    "Ismall Jsmall Ksmall Lsmall Msmall Nsmall Osmall Psmall Qsmall "
    "Rsmall Ssmall Tsmall Usmall Vsmall Wsmall Xsmall Ysmall Zsmall "
    "colonmonetary onefitted rupiah Tildesmall exclamdownsmall "
    "centoldstyle Lslashsmall Scaronsmall Zcaronsmall Dieresissmall "
    "Brevesmall Caronsmall Dotaccentsmall Macronsmall figuredash "
    "hypheninferior Ogoneksmall Ringsmall Cedillasmall questiondownsmall "
    "oneeighth threeeighths fiveeighths seveneighths onethird twothirds "
    "zerosuperior foursuperior fivesuperior sixsuperior sevensuperior "
    "eightsuperior ninesuperior zeroinferior oneinferior twoinferior "
    "threeinferior fourinferior fiveinferior sixinferior seveninferior "
    "eightinferior nineinferior centinferior dollarinferior "
    "periodinferior commainferior Agravesmall Aacutesmall "
    "Acircumflexsmall Atildesmall Adieresissmall Aringsmall AEsmall "
    "Ccedillasmall Egravesmall Eacutesmall Ecircumflexsmall "
    "Edieresissmall Igravesmall Iacutesmall Icircumflexsmall "
    "Idieresissmall Ethsmall Ntildesmall Ogravesmall Oacutesmall "
    "Ocircumflexsmall Otildesmall Odieresissmall OEsmall Oslashsmall "
    "Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall Yacutesmall "
    "Thornsmall Ydieresissmall 001.000 001.001 001.002 001.003 Black "
    "Bold Book Light Medium Regular Roman Semibold"
).split()


def _read_index(data: bytes, pos: int):
    """CFF INDEX → (items, end_pos)."""
    if pos + 2 > len(data):
        return None
    count = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if off_size < 1 or off_size > 4:
        return None
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size:pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += (count + 1) * off_size
    base = pos - 1
    items = [data[base + offs[i]:base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _parse_dict(data: bytes) -> dict:
    """CFF DICT: {op: [operands]}; two-byte ops keyed as 1200+op2."""
    out = {}
    operands = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b <= 21:
            if b == 12:
                op = 1200 + data[i + 1]
                i += 2
            else:
                op = b
                i += 1
            out[op] = operands
            operands = []
        elif b == 28:
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b == 29:
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b == 30:  # real number
            i += 1
            s = ""
            done = False
            while i < n and not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            try:
                operands.append(float(s or "0"))
            except ValueError:
                operands.append(0.0)
        elif 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def parse_cff_encoding(data: bytes) -> dict[int, str] | None:
    """CFF bytes → {code: unicode string} via encoding + charset."""
    try:
        if len(data) < 4 or data[0] != 1:
            return None
        hdr_size = data[2]
        pos = hdr_size
        r = _read_index(data, pos)          # Name INDEX
        if not r:
            return None
        _, pos = r
        r = _read_index(data, pos)          # Top DICT INDEX
        if not r or not r[0]:
            return None
        top_dicts, pos = r
        top = _parse_dict(top_dicts[0])
        r = _read_index(data, pos)          # String INDEX
        if not r:
            return None
        strings, pos = r
        if 1230 in top:                     # ROS → CIDFont, no encoding
            return None
        charstrings_off = top.get(17, [0])[0]
        r = _read_index(data, int(charstrings_off))
        if not r:
            return None
        n_glyphs = len(r[0])
        if n_glyphs == 0:
            return None

        def sid_name(sid):
            if sid < len(_CFF_STD):
                return _CFF_STD[sid]
            k = sid - len(_CFF_STD)
            if k < len(strings):
                return strings[k].decode("latin-1", "replace")
            return None

        # charset: GID → SID (GID 0 = .notdef)
        charset_off = int(top.get(15, [0])[0])
        gid_to_sid = [0] * n_glyphs
        if charset_off == 0:
            for g in range(n_glyphs):
                gid_to_sid[g] = g  # ISOAdobe: identity
        elif charset_off in (1, 2):
            return None  # Expert charsets carry no plain text
        else:
            fmt = data[charset_off]
            p = charset_off + 1
            if fmt == 0:
                for g in range(1, n_glyphs):
                    gid_to_sid[g] = struct.unpack_from(">H", data, p)[0]
                    p += 2
            elif fmt in (1, 2):
                g = 1
                step = 3 if fmt == 1 else 4
                while g < n_glyphs:
                    first = struct.unpack_from(">H", data, p)[0]
                    n_left = data[p + 2] if fmt == 1 else \
                        struct.unpack_from(">H", data, p + 2)[0]
                    p += step
                    for k in range(n_left + 1):
                        if g >= n_glyphs:
                            break
                        gid_to_sid[g] = first + k
                        g += 1
            else:
                return None

        # encoding: code → GID
        enc_off = int(top.get(16, [0])[0])
        code_to_gid: dict[int, int] = {}
        if enc_off in (0, 1):
            # Standard/Expert encoding: map via glyph NAME against the
            # standard code→name table.
            from .encodings import STANDARD
            name_to_code = {}
            for code, ch in STANDARD.items():
                name_to_code.setdefault(ch, code)
            out = {}
            for g in range(1, n_glyphs):
                name = sid_name(gid_to_sid[g])
                if not name:
                    continue
                uni = glyph_to_unicode(name)
                if uni == "�":
                    continue
                code = name_to_code.get(uni)
                if code is not None:
                    out[code] = uni
            return out or None
        fmt = data[enc_off]
        p = enc_off + 1
        base_fmt = fmt & 0x7F
        if base_fmt == 0:
            n_codes = data[p]
            p += 1
            for g in range(1, n_codes + 1):
                if g >= n_glyphs:
                    break
                code_to_gid[data[p]] = g
                p += 1
        elif base_fmt == 1:
            n_ranges = data[p]
            p += 1
            g = 1
            for _ in range(n_ranges):
                first, n_left = data[p], data[p + 1]
                p += 2
                for k in range(n_left + 1):
                    if g >= n_glyphs:
                        break
                    code_to_gid[first + k] = g
                    g += 1
        else:
            return None
        if fmt & 0x80:  # supplements: code → SID directly
            n_sups = data[p]
            p += 1
            sup_names = {}
            for _ in range(n_sups):
                code = data[p]
                sid = struct.unpack_from(">H", data, p + 1)[0]
                p += 3
                sup_names[code] = sid_name(sid)
            out = {}
            for code, gid in code_to_gid.items():
                name = sid_name(gid_to_sid[gid])
                if name:
                    out[code] = name
            out.update({c: n for c, n in sup_names.items() if n})
            return {c: glyph_to_unicode(n) for c, n in out.items()
                    if glyph_to_unicode(n) != "�"} or None

        out = {}
        for code, gid in code_to_gid.items():
            name = sid_name(gid_to_sid[gid])
            if not name:
                continue
            uni = glyph_to_unicode(name)
            if uni != "�":
                out[code] = uni
        return out or None
    except Exception:
        return None


_MAC_GLYPH_NAMES_HEAD = (
    ".notdef .null nonmarkingreturn space exclam quotedbl numbersign "
    "dollar percent ampersand quotesingle parenleft parenright asterisk "
    "plus comma hyphen period slash zero one two three four five six "
    "seven eight nine colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore grave "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
).split()


def parse_truetype_encoding(data: bytes) -> dict[int, str] | None:
    """TrueType (/FontFile2) → {code: unicode}: cmap subtables
    (3,1)/(3,0)/(1,0) for code→GID, then the post-2.0 table's glyph
    names (falling back to the standard Mac glyph order) resolved
    through the AGL — the text-recovery path for embedded TrueType
    subsets without ToUnicode."""
    try:
        if len(data) < 12:
            return None
        tag = data[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
            return None
        num_tables = struct.unpack_from(">H", data, 4)[0]
        tables = {}
        for i in range(num_tables):
            off = 12 + 16 * i
            if off + 16 > len(data):
                return None
            name = data[off:off + 4]
            t_off, t_len = struct.unpack_from(">II", data, off + 8)
            tables[name] = (t_off, t_len)
        cm = tables.get(b"cmap")
        if not cm:
            return None
        c_off = cm[0]
        n_sub = struct.unpack_from(">H", data, c_off + 2)[0]
        best = None  # (priority, offset)
        for i in range(n_sub):
            pid, eid, sub_off = struct.unpack_from(
                ">HHI", data, c_off + 4 + 8 * i)
            pri = {(3, 1): 0, (0, 3): 0, (3, 0): 1, (1, 0): 2}.get(
                (pid, eid))
            if pri is not None and (best is None or pri < best[0]):
                best = (pri, c_off + sub_off, pid, eid)
        if best is None:
            return None
        _, sub, pid, eid = best
        fmt = struct.unpack_from(">H", data, sub)[0]
        code_to_gid: dict[int, int] = {}

        def _want(code):
            # Simple-font consumers only use byte codes (plus the
            # 0xF000 symbol page) — skipping everything else bounds the
            # work on corrupt/hostile fonts claiming huge code ranges.
            return code < 0x100 or 0xF000 <= code <= 0xF0FF

        if fmt == 4:
            seg_x2 = struct.unpack_from(">H", data, sub + 6)[0]
            segs = seg_x2 // 2
            if segs > 2048:
                return None
            ends = struct.unpack_from(f">{segs}H", data, sub + 14)
            starts = struct.unpack_from(f">{segs}H", data,
                                        sub + 16 + seg_x2)
            deltas = struct.unpack_from(f">{segs}h", data,
                                        sub + 16 + 2 * seg_x2)
            range_off_base = sub + 16 + 3 * seg_x2
            range_offs = struct.unpack_from(f">{segs}H", data,
                                            range_off_base)
            for k in range(segs):
                if starts[k] == 0xFFFF:
                    continue
                # Intersect the claimed range with the byte + symbol-page
                # windows BEFORE iterating: a hostile font claiming
                # 0x0100-0xFFFE per segment must not cost 64k iterations.
                windows = []
                for lo, hi in ((0, 0xFF), (0xF000, 0xF0FF)):
                    a = max(starts[k], lo)
                    b = min(ends[k], hi, 0xFFFE)
                    if a <= b:
                        windows.append((a, b))
                for a, b in windows:
                  for code in range(a, b + 1):
                    if range_offs[k] == 0:
                        gid = (code + deltas[k]) & 0xFFFF
                    else:
                        gi_off = (range_off_base + 2 * k + range_offs[k]
                                  + 2 * (code - starts[k]))
                        if gi_off + 2 > len(data):
                            continue
                        gid = struct.unpack_from(">H", data, gi_off)[0]
                        if gid:
                            gid = (gid + deltas[k]) & 0xFFFF
                    if gid:
                        code_to_gid[code] = gid
        elif fmt == 6:
            first, count = struct.unpack_from(">HH", data, sub + 6)
            gids = struct.unpack_from(f">{count}H", data, sub + 10)
            for i, gid in enumerate(gids):
                if gid and _want(first + i):
                    code_to_gid[first + i] = gid
        elif fmt == 0:
            gids = data[sub + 6:sub + 262]
            for code, gid in enumerate(gids):
                if gid:
                    code_to_gid[code] = gid
        elif fmt == 12:
            n_groups = struct.unpack_from(">I", data, sub + 12)[0]
            for gi in range(min(n_groups, 10000)):
                s0, e0, g0 = struct.unpack_from(
                    ">III", data, sub + 16 + 12 * gi)
                for code in range(s0, min(e0, s0 + 1000) + 1):
                    if _want(code):
                        code_to_gid[code] = g0 + (code - s0)
        if not code_to_gid:
            return None

        # gid → glyph name via post 2.0 (else None).
        gid_names = None
        po = tables.get(b"post")
        if po:
            p_off = po[0]
            version = struct.unpack_from(">I", data, p_off)[0]
            if version == 0x00020000:
                n_glyphs = struct.unpack_from(">H", data, p_off + 32)[0]
                idx = struct.unpack_from(f">{n_glyphs}H", data, p_off + 34)
                names = []
                p = p_off + 34 + 2 * n_glyphs
                end = p_off + po[1]
                while p < end and p < len(data):
                    ln = data[p]
                    names.append(
                        data[p + 1:p + 1 + ln].decode("latin-1", "replace"))
                    p += 1 + ln
                gid_names = []
                for gi in range(n_glyphs):
                    k = idx[gi]
                    if k < 258:
                        gid_names.append(
                            _MAC_GLYPH_NAMES_HEAD[k]
                            if k < len(_MAC_GLYPH_NAMES_HEAD) else None)
                    elif k - 258 < len(names):
                        gid_names.append(names[k - 258])
                    else:
                        gid_names.append(None)

        out = {}
        for code, gid in code_to_gid.items():
            uni = None
            if gid_names and gid < len(gid_names) and gid_names[gid]:
                u = glyph_to_unicode(gid_names[gid])
                if u != "�":
                    uni = u
            if uni is None and (pid, eid) in ((3, 1), (0, 3)):
                # a unicode cmap: the code IS the codepoint
                uni = chr(code) if 0x20 <= code < 0xD800 else None
            if uni is None and (pid, eid) == (3, 0):
                # symbol cmap: codes live at 0xF000+byte
                base = code & 0xFF
                if 0x20 <= base < 0x7F and not gid_names:
                    uni = chr(base)
            if uni is not None:
                # simple-font byte codes: fold 0xF000-page symbol codes
                key = code & 0xFF if (pid, eid) == (3, 0) \
                    and code >= 0xF000 else code
                if 0 <= key < 256:
                    out[key] = uni
        return out or None
    except Exception:
        return None


_T1_ENC_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put")


def parse_type1_encoding(data: bytes) -> dict[int, str] | None:
    """Type1 font program cleartext /Encoding array → {code: unicode}."""
    try:
        # PFB segments: strip 6-byte headers if present.
        if data[:1] == b"\x80":
            out = bytearray()
            pos = 0
            while pos + 6 <= len(data) and data[pos] == 0x80:
                seg_type = data[pos + 1]
                seg_len = struct.unpack_from("<I", data, pos + 2)[0]
                if seg_type == 3:
                    break
                out += data[pos + 6:pos + 6 + seg_len]
                pos += 6 + seg_len
            data = bytes(out)
        head = data.split(b"eexec", 1)[0]
        if b"StandardEncoding" in head and b"dup " not in head:
            from .encodings import STANDARD
            return dict(STANDARD)
        out = {}
        for m in _T1_ENC_RE.finditer(head):
            code = int(m.group(1))
            name = m.group(2).decode("latin-1", "replace")
            uni = glyph_to_unicode(name)
            if 0 <= code < 256 and uni != "�":
                out[code] = uni
        return out or None
    except Exception:
        return None


def to_unicode_is_broken(to_unicode: dict) -> bool:
    """≥3 mapped codes landing in the PUA or U+FFFD, and ≥50% of the map
    (parsePdfDoc.js:518-550) — the ToUnicode is producer garbage and the
    embedded-program path should win."""
    if not to_unicode:
        return False
    mapped = broken = 0
    for s in to_unicode.values():
        mapped += 1
        if not s:
            continue
        cp = ord(s[0])
        if 0xE000 <= cp <= 0xF8FF or cp == 0xFFFD:
            broken += 1
    return broken >= 3 and broken >= mapped * 0.5


def truetype_metrics(data: bytes) -> dict | None:
    """Full-range metrics of a TrueType program for re-embedding on
    export (the raw-bytes path of the reference's
    ``createEmbeddedFontType0``, writePdfFonts.js:292-380): unicode→GID
    from a (3,1)/(0,3) cmap (formats 4/6/12), per-GID advances from
    hhea/hmtx normalized to /1000 units, FontDescriptor numbers from
    head/OS-2/post, and the PostScript name (name ID 6)."""
    try:
        if len(data) < 12 or data[:4] not in (b"\x00\x01\x00\x00", b"true"):
            return None
        num_tables = struct.unpack_from(">H", data, 4)[0]
        tables = {}
        for i in range(num_tables):
            off = 12 + 16 * i
            if off + 16 > len(data):
                return None
            tables[data[off:off + 4]] = struct.unpack_from(
                ">II", data, off + 8)
        for need in (b"cmap", b"head", b"hhea", b"hmtx", b"maxp"):
            if need not in tables:
                return None

        head = tables[b"head"][0]
        units_per_em = struct.unpack_from(">H", data, head + 18)[0] or 1000
        bbox = struct.unpack_from(">4h", data, head + 36)
        maxp = tables[b"maxp"][0]
        n_glyphs = struct.unpack_from(">H", data, maxp + 4)[0]
        hhea = tables[b"hhea"][0]
        ascent, descent = struct.unpack_from(">hh", data, hhea + 4)
        n_hmetrics = struct.unpack_from(">H", data, hhea + 34)[0]
        hmtx = tables[b"hmtx"][0]
        scale = 1000.0 / units_per_em
        advances = []
        last = 0
        for gi in range(n_glyphs):
            if gi < n_hmetrics:
                last = struct.unpack_from(">H", data, hmtx + 4 * gi)[0]
            advances.append(int(round(last * scale)))

        # Unicode cmap, full range (unlike parse_truetype_encoding's
        # byte-window recovery path).
        c_off = tables[b"cmap"][0]
        n_sub = struct.unpack_from(">H", data, c_off + 2)[0]
        best = None
        for i in range(n_sub):
            pid, eid, sub_off = struct.unpack_from(
                ">HHI", data, c_off + 4 + 8 * i)
            pri = {(3, 10): 0, (0, 4): 0, (3, 1): 1, (0, 3): 1}.get(
                (pid, eid))
            if pri is not None and (best is None or pri < best[0]):
                best = (pri, c_off + sub_off)
        if best is None:
            return None
        sub = best[1]
        fmt = struct.unpack_from(">H", data, sub)[0]
        uni_to_gid: dict[int, int] = {}
        if fmt == 4:
            seg_x2 = struct.unpack_from(">H", data, sub + 6)[0]
            segs = seg_x2 // 2
            if segs > 8192:
                return None
            ends = struct.unpack_from(f">{segs}H", data, sub + 14)
            starts = struct.unpack_from(f">{segs}H", data, sub + 16 + seg_x2)
            deltas = struct.unpack_from(f">{segs}h", data,
                                        sub + 16 + 2 * seg_x2)
            ro_base = sub + 16 + 3 * seg_x2
            range_offs = struct.unpack_from(f">{segs}H", data, ro_base)
            for k in range(segs):
                if starts[k] == 0xFFFF:
                    continue
                for code in range(starts[k], min(ends[k], 0xFFFD) + 1):
                    if range_offs[k] == 0:
                        gid = (code + deltas[k]) & 0xFFFF
                    else:
                        gi_off = (ro_base + 2 * k + range_offs[k]
                                  + 2 * (code - starts[k]))
                        if gi_off + 2 > len(data):
                            continue
                        gid = struct.unpack_from(">H", data, gi_off)[0]
                        if gid:
                            gid = (gid + deltas[k]) & 0xFFFF
                    if gid:
                        uni_to_gid[code] = gid
        elif fmt == 6:
            first, count = struct.unpack_from(">HH", data, sub + 6)
            gids = struct.unpack_from(f">{count}H", data, sub + 10)
            for i, gid in enumerate(gids):
                if gid:
                    uni_to_gid[first + i] = gid
        elif fmt == 12:
            n_groups = struct.unpack_from(">I", data, sub + 12)[0]
            for gi in range(min(n_groups, 100000)):
                s0, e0, g0 = struct.unpack_from(
                    ">III", data, sub + 16 + 12 * gi)
                for code in range(s0, min(e0, s0 + 10000) + 1):
                    uni_to_gid[code] = g0 + (code - s0)
        if not uni_to_gid:
            return None

        ps_name = None
        nm = tables.get(b"name")
        if nm:
            n_off = nm[0]
            count, str_off = struct.unpack_from(">HH", data, n_off + 2)
            for i in range(count):
                rec = n_off + 6 + 12 * i
                pid, eid, _lang, nid, ln, so = struct.unpack_from(
                    ">6H", data, rec)
                if nid == 6:
                    raw = data[n_off + str_off + so:
                               n_off + str_off + so + ln]
                    ps_name = (raw.decode("utf-16-be", "replace")
                               if pid in (0, 3) else
                               raw.decode("latin-1", "replace"))
                    break
        italic_angle = 0.0
        po = tables.get(b"post")
        if po:
            raw_angle = struct.unpack_from(">i", data, po[0] + 4)[0]
            italic_angle = raw_angle / 65536.0

        return {
            "uni_to_gid": uni_to_gid,
            "advances": advances,
            "n_glyphs": n_glyphs,
            "units_per_em": units_per_em,
            "bbox": [int(round(v * scale)) for v in bbox],
            "ascent": int(round(ascent * scale)),
            "descent": int(round(descent * scale)),
            "ps_name": ps_name,
            "italic_angle": italic_angle,
        }
    except Exception:
        return None


class GlyphSource:
    """TrueType glyf-outline reader for text→vector-path conversion
    (the glyph-resolution core of the reference's
    convertTextRegionsToPaths.js:175 loadGlyphsForOutlines /
    opentype parseGlyfTable).  Outlines come back as path commands in
    FONT UNITS: ("m",x,y) ("l",x,y) ("q",cx,cy,x,y) ("z",).
    Quadratic segments are kept quadratic here; the PDF writer lifts
    them to cubics (PDF has no native quadratic operator —
    convertTextRegionsToPaths.js:364)."""

    def __init__(self, data: bytes):
        self.data = data
        self.ok = False
        try:
            if len(data) < 12 or \
                    data[:4] not in (b"\x00\x01\x00\x00", b"true"):
                return
            n = struct.unpack_from(">H", data, 4)[0]
            tables = {}
            for i in range(n):
                off = 12 + 16 * i
                tables[data[off:off + 4]] = struct.unpack_from(
                    ">II", data, off + 8)
            for need in (b"head", b"maxp", b"loca", b"glyf"):
                if need not in tables:
                    return
            head = tables[b"head"][0]
            self.units_per_em = struct.unpack_from(
                ">H", data, head + 18)[0] or 1000
            loc_fmt = struct.unpack_from(">h", data, head + 50)[0]
            maxp = tables[b"maxp"][0]
            self.n_glyphs = struct.unpack_from(">H", data, maxp + 4)[0]
            lo, ln = tables[b"loca"]
            if loc_fmt == 0:
                raw = struct.unpack_from(
                    f">{self.n_glyphs + 1}H", data, lo)
                self.loca = [v * 2 for v in raw]
            else:
                self.loca = list(struct.unpack_from(
                    f">{self.n_glyphs + 1}I", data, lo))
            self.glyf_off = tables[b"glyf"][0]
            self._cache: dict[int, list] = {}
            self.ok = True
        except Exception:
            self.ok = False

    def outline(self, gid: int, _depth: int = 0) -> list | None:
        """Path commands for one glyph, or None (missing/malformed).
        An empty glyph (e.g. space) returns []."""
        if not self.ok or not 0 <= gid < self.n_glyphs or _depth > 4:
            return None
        if gid in self._cache:
            return self._cache[gid]
        try:
            start = self.glyf_off + self.loca[gid]
            end = self.glyf_off + self.loca[gid + 1]
            if end <= start:
                self._cache[gid] = []
                return []
            d = self.data
            n_contours = struct.unpack_from(">h", d, start)[0]
            if n_contours < 0:
                cmds = self._composite(start + 10, _depth)
            else:
                cmds = self._simple(start + 10, n_contours)
            self._cache[gid] = cmds
            return cmds
        except Exception:
            self._cache[gid] = None
            return None

    def _simple(self, pos: int, n_contours: int) -> list:
        d = self.data
        ends = struct.unpack_from(f">{n_contours}H", d, pos)
        pos += 2 * n_contours
        n_pts = (ends[-1] + 1) if ends else 0
        ins_len = struct.unpack_from(">H", d, pos)[0]
        pos += 2 + ins_len
        flags = []
        while len(flags) < n_pts:
            f = d[pos]
            pos += 1
            flags.append(f)
            if f & 0x08:                      # REPEAT
                for _ in range(d[pos]):
                    flags.append(f)
                pos += 1
        flags = flags[:n_pts]
        xs, x = [], 0
        for f in flags:
            if f & 0x02:                      # X_SHORT
                dx = d[pos]
                pos += 1
                x += dx if f & 0x10 else -dx
            elif not f & 0x10:
                x += struct.unpack_from(">h", d, pos)[0]
                pos += 2
            xs.append(x)
        ys, y = [], 0
        for f in flags:
            if f & 0x04:                      # Y_SHORT
                dy = d[pos]
                pos += 1
                y += dy if f & 0x20 else -dy
            elif not f & 0x20:
                y += struct.unpack_from(">h", d, pos)[0]
                pos += 2
            ys.append(y)
        on = [bool(f & 0x01) for f in flags]

        cmds = []
        c0 = 0
        for ce in ends:
            pts = [(xs[i], ys[i], on[i]) for i in range(c0, ce + 1)]
            c0 = ce + 1
            if not pts:
                continue
            # Rotate so the contour starts on-curve (synthesizing a
            # midpoint start when every point is off-curve).
            si = next((i for i, p in enumerate(pts) if p[2]), None)
            if si is None:
                mx = (pts[0][0] + pts[-1][0]) / 2.0
                my = (pts[0][1] + pts[-1][1]) / 2.0
                pts = [(mx, my, True)] + pts
            else:
                pts = pts[si:] + pts[:si]
            cmds.append(("m", pts[0][0], pts[0][1]))
            i = 1
            n = len(pts)
            while i <= n:
                px, py, pon = pts[i % n]
                if pon:
                    cmds.append(("l", px, py))
                    i += 1
                    continue
                nx, ny, non = pts[(i + 1) % n]
                if not non:                   # implied on-curve midpoint
                    nx, ny = (px + nx) / 2.0, (py + ny) / 2.0
                    cmds.append(("q", px, py, nx, ny))
                    i += 1
                else:
                    cmds.append(("q", px, py, nx, ny))
                    i += 2
                if i >= n and cmds[-1][0] == "q" and \
                        (cmds[-1][3], cmds[-1][4]) == \
                        (pts[0][0], pts[0][1]):
                    break
            cmds.append(("z",))
        return cmds

    def _composite(self, pos: int, depth: int) -> list:
        d = self.data
        cmds: list = []
        while True:
            flags, comp_gid = struct.unpack_from(">HH", d, pos)
            pos += 4
            if flags & 0x0001:                # ARGS ARE WORDS
                a1, a2 = struct.unpack_from(">hh", d, pos)
                pos += 4
            else:
                a1, a2 = struct.unpack_from(">bb", d, pos)
                pos += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 0x0008:                # WE_HAVE_A_SCALE
                sx = sy = struct.unpack_from(">h", d, pos)[0] / 16384.0
                pos += 2
            elif flags & 0x0040:              # X_AND_Y_SCALE
                sx, sy = (v / 16384.0 for v in
                          struct.unpack_from(">hh", d, pos))
                pos += 4
            elif flags & 0x0080:              # TWO_BY_TWO
                sx, s01, s10, sy = (v / 16384.0 for v in
                                    struct.unpack_from(">hhhh", d, pos))
                pos += 8
            dx, dy = (a1, a2) if flags & 0x0002 else (0, 0)
            sub = self.outline(comp_gid, depth + 1)
            for c in sub or []:
                if c[0] == "z":
                    cmds.append(c)
                    continue
                coords = []
                for k in range(1, len(c), 2):
                    x0, y0 = c[k], c[k + 1]
                    coords.extend((x0 * sx + y0 * s10 + dx,
                                   x0 * s01 + y0 * sy + dy))
                cmds.append((c[0], *coords))
            if not flags & 0x0020:            # MORE_COMPONENTS
                break
        return cmds
