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


class PdfFile:
    """Parsed PDF: lazy object table with xref + scan fallback."""

    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}
        self.compressed: dict[int, tuple[int, int]] = {}  # num -> (container, idx)
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
        m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", self.data[-256:], re.S)
        if not m:
            m = re.search(rb"startxref\s+(\d+)", self.data[-1024:])
        if not m:
            raise ValueError("no startxref")
        pos = int(m.group(1))
        seen = set()
        while pos and pos not in seen and 0 <= pos < len(self.data):
            seen.add(pos)
            pos = self._parse_xref_section(pos)
        # /Prev chain length: >1 means the file retains prior
        # incremental-save revisions that still carry old metadata
        # (metadataInspect.js countXrefRevisions).
        self.n_revisions = len(seen)

    def _parse_xref_section(self, pos: int):
        data = self.data
        if data[pos:pos + 4] == b"xref":
            lex = Lexer(data, pos + 4)
            while True:
                lex._skip_ws()
                if data[lex.pos:lex.pos + 7] == b"trailer":
                    lex.pos += 7
                    trailer = lex.parse_object()
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    prev = trailer.get("Prev")
                    return int(prev) if isinstance(prev, (int, float)) else None
                m = re.match(rb"(\d+)\s+(\d+)\s*", data[lex.pos:])
                if not m:
                    return None
                start, count = int(m.group(1)), int(m.group(2))
                lex.pos += m.end()
                for i in range(count):
                    entry = data[lex.pos:lex.pos + 20]
                    em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", entry)
                    if em:
                        if em.group(3) == b"n":
                            self.offsets.setdefault(start + i, int(em.group(1)))
                        lex.pos += 20 if entry[18:19] in b"\r\n " else 19
                    else:
                        em2 = re.match(rb"\s*(\d+)\s+(\d+)\s+([nf])\s*", entry)
                        if not em2:
                            return None
                        if em2.group(3) == b"n":
                            self.offsets.setdefault(start + i, int(em2.group(1)))
                        lex.pos += em2.end()
        else:
            # xref stream
            lex = Lexer(data, pos)
            m = re.match(rb"(\d+)\s+(\d+)\s+obj", data[pos:pos + 32])
            if not m:
                raise ValueError("bad xref stream header")
            lex.pos = pos + m.end()
            obj = lex.parse_object()
            if not isinstance(obj, StreamObj):
                raise ValueError("xref stream not a stream")
            d = obj.dict
            for k, v in d.items():
                self.trailer.setdefault(k, v)
            payload = decode_stream(obj, self._resolve_shallow)
            w = [int(x) for x in d.get("W", [1, 1, 1])]
            size = int(d.get("Size", 0))
            index = d.get("Index", [0, size])
            row = sum(w)
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
                    if ftype == 1:
                        self.offsets.setdefault(num, fields[1])
                    elif ftype == 2:
                        self.compressed.setdefault(num, (fields[1], fields[2]))
            prev = d.get("Prev")
            return int(prev) if isinstance(prev, (int, float)) else None
        return None

    def _scan_objects(self):
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self.offsets.setdefault(int(m.group(1)), m.start())
        tm = re.search(rb"trailer", self.data)
        if tm:
            lex = Lexer(self.data, tm.end())
            t = lex.parse_object()
            if isinstance(t, dict):
                for k, v in t.items():
                    self.trailer.setdefault(k, v)

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
        if num in self.offsets:
            pos = self.offsets[num]
            m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[pos:pos + 32])
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
        elif num in self.compressed:
            container, idx = self.compressed[num]
            objs = self._load_objstm(container)
            obj = objs[idx] if idx < len(objs) else None
        else:
            obj = None
        self._cache[num] = obj
        return obj

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
