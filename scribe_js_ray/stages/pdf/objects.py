"""PDF file structure: xref tables, indirect objects, streams.

From-scratch implementation covering what text extraction needs
(reference behaviors: parsePdfUtils.js parseXref/findXrefOffset/
extractStream/inflate, objectCache.js lazy object access):

- classic xref tables (``xref`` sections + /Prev chains)
- xref streams (PDF 1.5) with PNG predictors
- a full-file object scan fallback for damaged xref
- object syntax: dicts, arrays, names, numbers, strings (literal+hex),
  references, booleans, null
- stream payloads with /FlateDecode (+ /ASCIIHexDecode), predictors
"""

from __future__ import annotations

import re
import zlib


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num, gen=0):
        self.num = num
        self.gen = gen

    def __hash__(self):
        return hash((self.num, self.gen))

    def __eq__(self, other):
        return isinstance(other, Ref) and other.num == self.num \
            and other.gen == self.gen

    def __repr__(self):
        return f"Ref({self.num} {self.gen})"


class Name(str):
    """A PDF /Name (subclass so it compares equal to plain str keys)."""
    __slots__ = ()


class StreamObj:
    __slots__ = ("dict", "raw")

    def __init__(self, d, raw):
        self.dict = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Lexer:
    """Object-level PDF lexer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                while self.pos < n and data[self.pos] not in (10, 13):
                    self.pos += 1
            else:
                break

    def parse_object(self):
        self._skip_ws()
        data = self.data
        if self.pos >= len(data):
            return None
        c = data[self.pos]
        if c == 0x2F:  # /
            return self._parse_name()
        if c == 0x28:  # (
            return self._parse_literal_string()
        if c == 0x3C:  # <
            if data[self.pos:self.pos + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == 0x5B:  # [
            return self._parse_array()
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        m = re.match(rb"(true|false|null)", data[self.pos:self.pos + 5])
        if m:
            self.pos += len(m.group(1))
            return {b"true": True, b"false": False, b"null": None}[m.group(1)]
        # Unknown token (operator etc.) — consume one token.
        m = re.match(rb"[^\s()<>\[\]{}/%]+", data[self.pos:])
        if m:
            self.pos += m.end()
            return Name(m.group(0).decode("latin-1"))
        self.pos += 1
        return None

    def _parse_name(self):
        self.pos += 1
        m = re.match(rb"[^\s()<>\[\]{}/%]*", self.data[self.pos:])
        raw = m.group(0)
        self.pos += m.end()
        # #xx escapes
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                         lambda mm: bytes([int(mm.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _parse_literal_string(self):
        data = self.data
        self.pos += 1
        depth = 1
        out = bytearray()
        n = len(data)
        while self.pos < n:
            c = data[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = data[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                                0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray()
                    for _ in range(3):
                        if self.pos < n and 0x30 <= data[self.pos] <= 0x37:
                            oct_digits.append(data[self.pos])
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in (10, 13):  # line continuation
                    self.pos += 1
                    if e == 13 and self.pos < n and data[self.pos] == 10:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    break
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _parse_hex_string(self):
        end = self.data.index(b">", self.pos)
        # Lenient like the reference lexer: drop any non-hex byte (spec only
        # allows whitespace, but corrupt files embed arbitrary garbage).
        hex_str = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1:end])
        self.pos = end + 1
        if len(hex_str) % 2:
            hex_str += b"0"
        return bytes.fromhex(hex_str.decode("latin-1"))

    def _parse_array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                break
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                break
            out.append(self.parse_object())
        return out

    def _parse_dict(self):
        self.pos += 2
        d = {}
        while True:
            self._skip_ws()
            if self.data[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                break
            key = self.parse_object()
            if not isinstance(key, Name):
                break
            d[str(key)] = self.parse_object()
        # Stream payload?
        save = self.pos
        self._skip_ws()
        if self.data[self.pos:self.pos + 6] == b"stream":
            self.pos += 6
            if self.data[self.pos:self.pos + 2] == b"\r\n":
                self.pos += 2
            elif self.pos < len(self.data) and self.data[self.pos] in (10, 13):
                self.pos += 1
            start = self.pos
            length = d.get("Length")
            if isinstance(length, int):
                end = start + length
                if self.data[end:end + 20].lstrip(bytes(_WS))[:9] != b"endstream":
                    end = self.data.find(b"endstream", start)
            else:
                end = self.data.find(b"endstream", start)
            raw = self.data[start:end]
            es = self.data.find(b"endstream", end if end >= start else start)
            self.pos = es + 9 if es >= 0 else len(self.data)
            return StreamObj(d, raw)
        self.pos = save
        return d

    def _parse_number_or_ref(self):
        data = self.data
        m = re.match(rb"[+-]?\d*\.?\d+", data[self.pos:])
        tok = m.group(0)
        self.pos += m.end()
        if b"." in tok:
            return float(tok)
        num = int(tok)
        # Lookahead for `gen R` (indirect reference).
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])", data[self.pos:self.pos + 24])
        if m2 and num >= 0:
            self.pos += m2.end()
            return Ref(num, int(m2.group(1)))
        self.pos = save
        return num


def apply_predictor(data: bytes, predictor: int, columns: int,
                    colors: int = 1, bpc: int = 8) -> bytes:
    """PNG predictors (parsePdfUtils.js applyPredictor analog)."""
    if predictor < 10:
        return data
    bpp = max(1, (colors * bpc) // 8)
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data) or (pos < len(data) and pos + 1 <= len(data)):
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos:pos + row_len])
        pos += row_len
        if len(row) < row_len:
            row.extend(b"\x00" * (row_len - len(row)))
        if ft == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out.extend(row)
        prev = row
        if pos >= len(data):
            break
    return bytes(out)


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4; reference port target:
    /root/reference/js/pdf/codecs — text-path subset only)."""
    out = bytearray()
    table = {i: bytes([i]) for i in range(256)}
    next_code = 258
    code_len = 9
    prev = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= code_len:
            nbits -= code_len
            code = (acc >> nbits) & ((1 << code_len) - 1)
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                code_len = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            else:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            out.extend(entry)
            prev = entry
            # Width bump per the xpdf/pdf.js/mupdf convention: the NEXT
            # code to be read needs more bits once next_code+EarlyChange
            # reaches the current capacity.
            if next_code + early_change >= (1 << code_len) and \
                    code_len < 12:
                code_len += 1
    return bytes(out)


def ascii85_decode(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    i = 0
    while i < len(data):
        if data[i:i + 1] == b"z":
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        group = data[i:i + 5]
        pad = 5 - len(group)
        group = group + b"u" * pad
        val = 0
        for c in group:
            val = val * 85 + (c - 33)
        quad = val.to_bytes(4, "big")
        out += quad[:4 - pad]
        i += 5
    return bytes(out)


def run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out += data[i + 1:i + 2 + ln]
            i += 2 + ln
        else:
            out += data[i + 1:i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def filter_names(resolve, d: dict) -> str:
    """Space-joined /Filter name(s) of a stream dict (single name,
    array, or indirect ref) — the one shared test for 'does this
    stream's filter chain include X' (used by both the metadata
    inspect and scrub paths so they can never disagree)."""
    f = resolve(d.get("Filter"))
    if f is None:
        return ""
    if isinstance(f, list):
        return " ".join(str(resolve(x)) for x in f)
    return str(f)


def decode_stream(stream: StreamObj, resolve) -> bytes:
    """Apply /Filter chain to a stream's raw bytes."""
    filters = resolve(stream.dict.get("Filter"))
    if filters is None:
        return stream.raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = resolve(stream.dict.get("DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = stream.raw
    for f, parm in zip(filters, parms):
        fname = str(f)
        if fname == "FlateDecode":
            data = zlib.decompress(data)
            parm = resolve(parm) or {}
            pred = resolve(parm.get("Predictor")) or 1
            if pred >= 10:
                cols = resolve(parm.get("Columns")) or 1
                colors = resolve(parm.get("Colors")) or 1
                bpc = resolve(parm.get("BitsPerComponent")) or 8
                data = apply_predictor(data, pred, cols, colors, bpc)
        elif fname == "ASCIIHexDecode":
            hx = re.sub(rb"[\s>]", b"", data)
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("latin-1"))
        elif fname == "LZWDecode":
            parm = resolve(parm) or {}
            early = resolve(parm.get("EarlyChange"))
            data = lzw_decode(data, 1 if early is None else int(early))
            pred = resolve(parm.get("Predictor")) or 1
            if pred >= 10:
                cols = resolve(parm.get("Columns")) or 1
                colors = resolve(parm.get("Colors")) or 1
                bpc = resolve(parm.get("BitsPerComponent")) or 8
                data = apply_predictor(data, pred, cols, colors, bpc)
        elif fname == "ASCII85Decode":
            data = ascii85_decode(data)
        elif fname == "RunLengthDecode":
            data = run_length_decode(data)
        else:
            raise ValueError(f"unsupported stream filter: {fname}")
    return data


# "/Encrypt" followed by a non-identifier char (rejects /Encryptable),
# PDF whitespace, objnum, gen, 'R' — the raw-byte shape pdfCrypto.js
# findEncryptRef (:843-874) accepts; the LAST occurrence wins.
_ENCRYPT_REF_PAT = re.compile(
    rb"/Encrypt(?![0-9A-Za-z_])[\x00\t\n\x0c\r ]+(\d+)"
    rb"[\x00\t\n\x0c\r ]+\d+[\x00\t\n\x0c\r ]+R")


def _find_encrypt_ref(data: bytes):
    """Object number of the last raw ``/Encrypt N G R``, or None."""
    num = None
    for m in _ENCRYPT_REF_PAT.finditer(data):
        num = int(m.group(1))
    return num


# PDF whitespace (ISO 32000-1 Table 1; reference isPdfWhitespace).
_PDF_WS = b"\x00\t\n\x0c\r "


def _matches_obj_header(data: bytes, pos: int) -> bool:
    """True when ``pos`` starts ``<digits> <digits> obj`` with SINGLE
    0x20 separators — the strict form xref offsets must point at
    (reference matchesObjHeader, pdfPrimitives.js:269)."""
    n = len(data)
    p = pos
    if p >= n or not (48 <= data[p] <= 57):
        return False
    while p < n and 48 <= data[p] <= 57:
        p += 1
    if p >= n or data[p] != 0x20:
        return False
    p += 1
    if p >= n or not (48 <= data[p] <= 57):
        return False
    while p < n and 48 <= data[p] <= 57:
        p += 1
    if p >= n or data[p] != 0x20:
        return False
    return data[p + 1:p + 4] == b"obj"


def _matches_bare_entry(data: bytes, pos: int) -> bool:
    """True when ``pos`` starts ``NNNNNNNNNN NNNNN [fn]`` — an xref
    entry line with no surrounding table syntax (reference
    matchesBareXrefEntry, pdfPrimitives.js:316)."""
    if pos + 18 >= len(data):
        return False
    if not data[pos:pos + 10].isdigit():
        return False
    if data[pos + 10] != 0x20:
        return False
    if not data[pos + 11:pos + 16].isdigit():
        return False
    if data[pos + 16] != 0x20:
        return False
    return data[pos + 17] in b"fn"


def _matches_obj_marker(data: bytes, pos: int, num: int) -> bool:
    """True when ``pos`` starts ``<num> <gen> obj\\b`` for THIS object
    number, any PDF whitespace between fields (reference
    matchesObjMarker, pdfPrimitives.js:290) — the validation gate that
    keeps a stale xref offset from reading a different object."""
    s = str(num).encode()
    n = len(data)
    if data[pos:pos + len(s)] != s:
        return False
    p = pos + len(s)
    if p >= n or data[p] not in _PDF_WS:
        return False
    while p < n and data[p] in _PDF_WS:
        p += 1
    if p >= n or not (48 <= data[p] <= 57):
        return False
    while p < n and 48 <= data[p] <= 57:
        p += 1
    if p >= n or data[p] not in _PDF_WS:
        return False
    while p < n and data[p] in _PDF_WS:
        p += 1
    if data[p:p + 3] != b"obj":
        return False
    after = p + 3
    if after < n:
        c = data[after]
        if 48 <= c <= 57 or 65 <= c <= 90 or 97 <= c <= 122 or c == 95:
            return False
    return True


def _extract_dict_bytes(data: bytes, start: int) -> bytes:
    """Balanced ``<< .. >>`` slice starting at ``start``; literal
    strings are skipped so a raw ``>>`` inside e.g. an /ID binary
    string can't truncate the dict (reference extractDictFromBytes,
    pdfPrimitives.js:230-262)."""
    depth = 0
    i = start
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # literal string
            i += 1
            sd = 1
            while i < n and sd > 0:
                c2 = data[i]
                if c2 == 0x5C:
                    i += 2
                    continue
                if c2 == 0x28:
                    sd += 1
                elif c2 == 0x29:
                    sd -= 1
                i += 1
        elif c == 0x3C and data[i + 1:i + 2] == b"<":
            depth += 1
            i += 2
        elif c == 0x3E and data[i + 1:i + 2] == b">":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:]


_ROOT_REF_PAT = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")


def _find_root_obj_num(data: bytes):
    """/Root object number by RAW byte scan — the reference's ONLY
    Catalog discovery (findRootObjNum, parsePdfUtils.js:923-973):
    requires a ``startxref`` keyword (none → None → the document
    errors with "Could not find PDF Catalog" regardless of how
    recoverable the xref is); then (1) /Root in the last ``trailer``
    before the last ``startxref``, (2) /Root in the xref-stream dict
    at the header-adjusted startxref offset, (3) first ``trailer``
    anywhere with /Root in a 500-byte window."""
    n = len(data)
    sx = data.rfind(b"startxref")
    if sx == -1:
        return None
    tidx = data.rfind(b"trailer", 0, sx)
    if tidx != -1:
        m = _ROOT_REF_PAT.search(data[tidx:sx])
        if m:
            return int(m.group(1))
    p = sx + 9
    while p < n and data[p] in _PDF_WS:
        p += 1
    if p < n and 48 <= data[p] <= 57:
        off = 0
        while p < n and 48 <= data[p] <= 57:
            off = off * 10 + (data[p] - 48)
            p += 1
        if off < n:
            hdr = data.find(b"%PDF")
            adj = off + (hdr if hdr > 0 else 0)
            ds = data.find(b"<<", adj, min(adj + 200, n - 1))
            if ds != -1:
                m = _ROOT_REF_PAT.search(_extract_dict_bytes(data, ds))
                if m:
                    return int(m.group(1))
    search = 0
    while True:
        t = data.find(b"trailer", search)
        if t == -1:
            break
        m = _ROOT_REF_PAT.search(data[t:min(t + 500, n)])
        if m:
            return int(m.group(1))
        search = t + 7
    return None


def _scan_object_headers(data: bytes) -> dict[int, int]:
    """Every ``<num> <gen> obj\\b`` header in the file, LAST occurrence
    per object number (an incremental save's newer body shadows the
    old), with the non-digit-prefix guard so ``12 0 obj`` never also
    registers as object 2 (reference objectCache.js _repairXref
    :179-226, the byte-state-machine port of
    ``/(?:^|[^\\d])(\\d+)\\s+(\\d+)\\s+obj\\b/g``)."""
    out: dict[int, int] = {}
    pat = re.compile(
        rb"(?:^|[^0-9])(\d+)[\x00\t\n\x0c\r ]+\d+[\x00\t\n\x0c\r ]+obj"
        rb"(?![0-9A-Za-z_])")
    for m in pat.finditer(data):
        out[int(m.group(1))] = m.start(1)
    return out


class PdfFile:
    """Parsed PDF: lazy object table with xref + scan fallback."""

    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}
        self.compressed: dict[int, tuple[int, int]] = {}  # num -> (container, idx)
        # Every object number an xref section has spoken for — in-use,
        # compressed, or a classic-table FREE tombstone (an incremental
        # update that deletes an object must shadow the object's older
        # in-use entry; reference parseXrefTable "free entries take
        # precedence too").  Newer sections walk first, first claim wins.
        self._claimed: set[int] = set()
        self._repaired = False
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self.n_revisions = 0
        try:
            self._parse_xref_chain()
        except Exception:
            pass
        if not self.offsets and not self.compressed:
            self._scan_objects()
        if "Root" not in self.trailer:
            self._find_root_by_scan()
        # Standard security handler (empty user password): decrypts stream
        # bytes transparently in get_object.  Discovery mirrors the
        # reference (pdfCrypto.js findEncryptRef :843-874 +
        # setupEncryption :960-): the /Encrypt entry is found by a RAW
        # byte scan for the LAST "/Encrypt N G R" occurrence — only the
        # indirect form counts; an inline trailer dict (`/Encrypt << >>`)
        # is ignored, leaving streams undecrypted exactly as the
        # reference does (the doc then classifies image-type and exports
        # blank).  The raw scan also survives a trailer our xref walk
        # failed to parse.
        self.crypt = None
        self._encrypt_num = None
        enc_num = _find_encrypt_ref(data)
        if enc_num is not None:
            from .crypto import StandardSecurityHandler
            self._encrypt_num = enc_num
            enc = self.resolve(Ref(enc_num, 0))
            ids = self.trailer.get("ID")
            first_id = ids[0] if isinstance(ids, list) and ids else b""
            if isinstance(first_id, str):
                first_id = first_id.encode("latin-1")
            # setupEncryption gates on V ∈ {1,2,4,5} (never /Filter) and
            # returns without decryption when required string entries are
            # absent (warn-and-continue, not an error).
            v = self.resolve(enc.get("V")) if isinstance(enc, dict) \
                else None
            required = ("U", "UE") if v == 5 else ("O",)
            if isinstance(enc, dict) and v in (1, 2, 4, 5) and \
                    all(enc.get(k) is not None for k in required):
                self.crypt = StandardSecurityHandler(
                    enc, first_id, resolve=self.resolve)
                # Objects parsed during init (scan fallback, xref walk)
                # were cached with still-encrypted stream bytes — drop
                # them so re-reads decrypt.
                self._cache.clear()
                self._objstm_cache.clear()

    # -- xref -------------------------------------------------------------
    def _parse_xref_chain(self):
        data = self.data
        # Junk before the %PDF header shifts every stored offset:
        # startxref, /Prev, /XRefStm and type-1 entries are all relative
        # to the header position (parsePdfUtils.js parseXref:127-129).
        hdr = data.find(b"%PDF")
        adjust = hdr if hdr > 0 else 0
        pos = self._find_xref_offset(adjust)
        seen = set()
        while pos is not None and pos not in seen and 0 <= pos < len(data):
            seen.add(pos)
            pos = self._parse_xref_section(pos, adjust)
        # /Prev chain length: >1 means the file retains prior
        # incremental-save revisions that still carry old metadata
        # (metadataInspect.js countXrefRevisions).
        self.n_revisions = len(seen)

    def _find_xref_offset(self, adjust: int) -> int:
        """Locate the newest xref section (reference findXrefOffset,
        parsePdfUtils.js:20-76): the LAST ``startxref`` in the file
        (linearized PDFs carry two), header-adjusted; a ±16-byte snap
        window when the stored value is off by a few bytes; and a
        last-standalone-``xref``-keyword scan when all else fails."""
        data = self.data
        n = len(data)
        idx = data.rfind(b"startxref")
        if idx != -1:
            p = idx + 9
            while p < n and data[p] in _PDF_WS:
                p += 1
            num = 0
            has_digit = False
            while p < n and 48 <= data[p] <= 57:
                num = num * 10 + (data[p] - 48)
                p += 1
                has_digit = True
            if has_digit:
                off = num + adjust
                if off < n:
                    chk = off
                    while chk < n and data[chk] in _PDF_WS:
                        chk += 1
                    if data[chk:chk + 4] == b"xref" or \
                            _matches_obj_header(data, chk) or \
                            _matches_bare_entry(data, chk):
                        return off
                    # Off-by-a-few startxref: snap to a nearby `xref`
                    # keyword or object header before the whole-file
                    # fallback (which on a linearized PDF would land on
                    # the incomplete end-of-file xref).
                    lo = max(0, off - 16)
                    hi = min(n, off + 16)

                    def ws_before(p0: int) -> bool:
                        return p0 == 0 or data[p0 - 1] in _PDF_WS

                    for q in range(off, lo - 1, -1):
                        if data[q:q + 4] == b"xref" and ws_before(q):
                            return q
                    for q in range(off + 1, hi):
                        if data[q:q + 4] == b"xref" and ws_before(q):
                            return q
                    for q in range(off, lo - 1, -1):
                        if _matches_obj_header(data, q) and ws_before(q):
                            return q
        # Fallback: last standalone `xref` keyword (preceded by a
        # newline or at file start — never the tail of `startxref`).
        search = n - 1
        while search >= 0:
            i = data.rfind(b"xref", 0, search + 4)
            if i == -1:
                break
            if i == 0 or data[i - 1] in b"\r\n":
                return i
            search = i - 1
        raise ValueError("no startxref")

    def _parse_xref_section(self, pos: int, adjust: int):
        """Dispatch one xref section (parseXref walk body,
        parsePdfUtils.js:131-163): skip linearized padding, then a
        classic table, an xref stream, or a bare entry list."""
        data = self.data
        n = len(data)
        while pos < n and data[pos] in _PDF_WS:
            pos += 1
        if _matches_obj_header(data, pos):
            return self._parse_xref_stream_at(pos, adjust)
        if data[pos:pos + 4] == b"xref":
            return self._parse_xref_table(pos, adjust, bare=False)
        if _matches_bare_entry(data, pos):
            return self._parse_xref_table(pos, adjust, bare=True)
        return None

    def _parse_xref_table(self, pos: int, adjust: int, bare: bool):
        """Classic (or bare) xref table, line-based with first-seen
        precedence; classic FREE entries claim their slot as tombstones
        (parseXrefTable/parseBareXrefTable, parsePdfUtils.js:196-262).
        Returns the header-adjusted /Prev offset, harvesting a hybrid
        trailer's /XRefStm companion stream along the way."""
        data = self.data
        cap = min(len(data), pos + 256 * 1024)
        tidx = data.find(b"trailer", pos)
        end = tidx + 7 if (tidx != -1 and tidx < cap) else cap
        lines = re.split(rb"\r\n|\n|\r", data[pos:end])
        claimed = self._claimed
        if bare:
            # Entries start directly at the offset, from object 0.
            num = 0
            for raw in lines:
                line = raw.strip()
                if line in (b"trailer", b""):
                    break
                em = re.match(rb"(\d{10})\s+(\d{5})\s+(n|f)$", line)
                if not em:
                    continue
                if num not in claimed:
                    claimed.add(num)
                    if em.group(3) == b"n":
                        self.offsets[num] = int(em.group(1)) + adjust
                num += 1
        else:
            i = 1  # skip the "xref" line
            while i < len(lines):
                line = lines[i].strip()
                if line in (b"trailer", b""):
                    break
                sm = re.match(rb"(\d+)\s+(\d+)$", line)
                if sm:
                    start, count = int(sm.group(1)), int(sm.group(2))
                    for j in range(count):
                        i += 1
                        if i >= len(lines):
                            break
                        em = re.match(rb"(\d+)\s+(\d+)\s+(n|f)$",
                                      lines[i].strip())
                        if not em:
                            continue
                        onum = start + j
                        if onum in claimed:
                            continue
                        claimed.add(onum)
                        if em.group(3) == b"n":
                            self.offsets[onum] = int(em.group(1)) + adjust
                i += 1
        prev = None
        if tidx != -1:
            window = data[tidx:tidx + 1000]
            pm = re.search(rb"/Prev\s+(\d+)", window)
            if pm:
                prev = int(pm.group(1)) + adjust
            if not bare:
                xm = re.search(rb"/XRefStm\s+(\d+)", window)
                if xm:
                    # Hybrid-reference file: harvest the companion
                    # stream's entries (its own /Prev is ignored —
                    # parsePdfUtils.js:151-155).
                    try:
                        self._parse_xref_stream_at(
                            int(xm.group(1)) + adjust, adjust)
                    except Exception:
                        pass
            # Keep the full trailer dict values (Root/ID/Encrypt/Size).
            try:
                lex = Lexer(data, tidx + 7)
                t = lex.parse_object()
                if isinstance(t, dict):
                    for k, v in t.items():
                        self.trailer.setdefault(k, v)
            except Exception:
                pass
        return prev

    def _parse_xref_stream_at(self, pos: int, adjust: int):
        """PDF 1.5 cross-reference stream.  The dict is located as the
        first ``<<`` within 200 bytes — no object header is required
        (parseXrefStream, parsePdfUtils.js:267-275, so an /XRefStm
        offset pointing straight at the dict still parses).  A
        malformed dict or an undecodable payload still follows /Prev
        (:278-303); stream FREE entries do NOT claim (unlike classic
        tables — :328 "type 0 = free entry, skip")."""
        data = self.data
        ds = data.find(b"<<", pos, min(pos + 200, len(data) - 1))
        if ds == -1:
            return None
        lex = Lexer(data, ds)
        obj = lex.parse_object()
        if not isinstance(obj, StreamObj):
            return None
        d = obj.dict
        for k, v in d.items():
            self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        prev = int(prev) + adjust if isinstance(prev, (int, float)) else None
        w = d.get("W")
        size = d.get("Size")
        if not isinstance(w, list) or len(w) != 3 or size is None:
            return prev
        try:
            payload = decode_stream(obj, self._resolve_shallow)
        except Exception:
            return prev
        w = [int(x) for x in w]
        index = d.get("Index", [0, int(size)])
        row = sum(w)
        claimed = self._claimed
        p = 0
        for ii in range(0, len(index), 2):
            start, count = int(index[ii]), int(index[ii + 1])
            for j in range(count):
                if p + row > len(payload):
                    break
                fields = []
                q = p
                for width in w:
                    val = 0
                    for _ in range(width):
                        val = (val << 8) | payload[q]
                        q += 1
                    fields.append(val)
                p += row
                ftype = fields[0] if w[0] else 1
                num = start + j
                if num in claimed:
                    continue
                if ftype == 1:
                    claimed.add(num)
                    self.offsets[num] = fields[1] + adjust
                elif ftype == 2:
                    claimed.add(num)
                    self.compressed[num] = (fields[1], fields[2])
        return prev

    def _scan_objects(self):
        """Init-time fallback when no xref section parsed at all: the
        same whole-file header scan the lazy repair uses (LAST
        occurrence per number — an incremental save's newer body wins)."""
        self._repaired = True
        self.offsets.update(_scan_object_headers(self.data))
        tm = re.search(rb"trailer", self.data)
        if tm:
            lex = Lexer(self.data, tm.end())
            t = lex.parse_object()
            if isinstance(t, dict):
                for k, v in t.items():
                    self.trailer.setdefault(k, v)

    def _ensure_repaired(self):
        """One-time whole-file xref repair (objectCache.js
        ensureXrefRepaired/_repairXref:179-270): scan every object
        header, then (a) install scanned offsets for numbers with no
        entry or only a FREE tombstone — pages frequently reference
        such "free" objects, so trust the file; (b) replace type-1
        offsets that don't point at this object's header; (c) drop
        type-1 entries that validate nowhere.  A broken xref pays the
        scan once; a valid xref never reaches here."""
        if self._repaired:
            return
        self._repaired = True
        data = self.data
        scan = _scan_object_headers(data)
        for num, off in scan.items():
            if num in self.offsets:
                if not _matches_obj_marker(data, self.offsets[num], num):
                    self.offsets[num] = off
            elif num in self.compressed:
                continue
            else:
                self.offsets[num] = off
        for num in [k for k, v in self.offsets.items() if k not in scan]:
            if not _matches_obj_marker(data, self.offsets[num], num):
                del self.offsets[num]
        # Objects that failed to resolve pre-repair may resolve now.
        for k in [k for k, v in self._cache.items() if v is None]:
            del self._cache[k]

    def _find_root_by_scan(self):
        for num in list(self.offsets):
            try:
                obj = self.get_object(num)
            except Exception:
                continue
            d = obj.dict if isinstance(obj, StreamObj) else obj
            if isinstance(d, dict) and str(d.get("Type", "")) == "Catalog":
                self.trailer["Root"] = Ref(num, 0)
                return

    # -- objects ----------------------------------------------------------
    def _resolve_shallow(self, obj):
        return self.resolve(obj)

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        obj = self._read_object_direct(num)
        if obj is None and not self._repaired:
            # Stale or missing xref entry: repair once by scanning the
            # whole file, then retry (objectCache.js getObjectText
            # :283-291).
            self._ensure_repaired()
            obj = self._read_object_direct(num)
        self._cache[num] = obj
        return obj

    def _read_object_direct(self, num: int):
        if num in self.offsets:
            pos = self.offsets[num]
            # A stale offset (an xref not updated by an incremental
            # save) would read a DIFFERENT object verbatim — the header
            # must name THIS object (_readObjectTextDirect:315-321).
            if not _matches_obj_marker(self.data, pos, num):
                return None
            m = re.match(
                rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj",
                self.data[pos:pos + 48])
            lex = Lexer(self.data, pos + (m.end() if m else 0))
            obj = lex.parse_object()
            gen = int(m.group(2)) if m else 0
            # Decrypt stream payloads (XRef streams are never encrypted,
            # but they parse before self.crypt exists, so no special case;
            # the Encrypt dict's own object is exempt per spec).
            if getattr(self, "crypt", None) is not None and \
                    num != self._encrypt_num:
                if isinstance(obj, StreamObj) and \
                        str(obj.dict.get("Type") or "") != "XRef":
                    obj.raw = self.crypt.decrypt(obj.raw, num, gen)
                # String objects (form-field /V, annotation /Contents,
                # outline /Title, ...) are encrypted with the same
                # per-object key as streams (ISO 32000-1 §7.6.2; reference
                # objectCache.js decryptStringBytes). Strings inside object
                # streams are NOT re-encrypted — this branch only runs for
                # directly-stored objects.
                obj = self._decrypt_strings(obj, num, gen)
            return obj
        if num in self.compressed:
            container, idx = self.compressed[num]
            objs = self._load_objstm(container)
            return objs[idx] if idx < len(objs) else None
        return None

    def _decrypt_strings(self, obj, num: int, gen: int):
        """Recursively decrypt every PDF string (parsed to ``bytes``)
        inside a directly-stored object with its per-object key."""
        if isinstance(obj, (bytes, bytearray)):
            try:
                return self.crypt.decrypt(bytes(obj), num, gen)
            except Exception:
                return obj
        if isinstance(obj, StreamObj):
            obj.dict = self._decrypt_strings(obj.dict, num, gen)
            return obj
        if isinstance(obj, dict):
            return {k: self._decrypt_strings(v, num, gen)
                    for k, v in obj.items()}
        if isinstance(obj, list):
            return [self._decrypt_strings(v, num, gen) for v in obj]
        return obj

    def _load_objstm(self, num: int) -> list:
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        stm = self.get_object(num)
        out = []
        if isinstance(stm, StreamObj):
            payload = decode_stream(stm, self.resolve)
            n = int(self.resolve(stm.dict.get("N", 0)) or 0)
            first = int(self.resolve(stm.dict.get("First", 0)) or 0)
            head = payload[:first].split()
            offs = [int(x) for x in head[1:2 * n:2]]
            for off in offs:
                lex = Lexer(payload, first + off)
                out.append(lex.parse_object())
        self._objstm_cache[num] = out
        return out

    def resolve(self, obj, depth=0):
        while isinstance(obj, Ref) and depth < 64:
            obj = self.get_object(obj.num)
            depth += 1
        return obj

    def stream_bytes(self, obj) -> bytes:
        obj = self.resolve(obj)
        if isinstance(obj, StreamObj):
            return decode_stream(obj, self.resolve)
        raise ValueError("not a stream")
