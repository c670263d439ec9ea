"""Identifying-metadata inspection/stripping for embedded PDF images.

Decision-surface port of /root/reference/js/pdf/metadata/imageMetadata.js:
the two embedded-image formats that can carry metadata are JPEG
(DCTDecode marker segments) and JPEG2000 (JPXDecode top-level JP2
boxes).  Stripping is lossless — the entropy-coded scan / codestream is
copied byte-for-byte and only whole metadata segments/boxes are excised;
anything malformed comes back unchanged.
"""

from __future__ import annotations

# JPEG APPn/COM markers that carry ONLY metadata → drop.  APP0 (JFIF),
# APP2 (ICC) and APP14 (Adobe transform, needed for CMYK/YCCK decode)
# are rendering data → keep (imageMetadata.js:16-22).
_JPEG_DROP_MARKERS = frozenset(
    [0xE1, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xEB, 0xEC,
     0xED, 0xEF, 0xFE])

# JP2 box types that carry only metadata (imageMetadata.js:134).
_JPX_DROP_BOXES = frozenset((b"xml ", b"uuid", b"uinf", b"ulst", b"url "))


def _u16(b: bytes, i: int) -> int:
    return (b[i] << 8) | b[i + 1]


def strip_jpeg_metadata(data: bytes) -> bytes:
    """Remove metadata marker segments from a JPEG codestream; returns
    the input unchanged if unparseable or nothing was dropped."""
    if not data or len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return data
    out = [data[:2]]
    i = 2
    dropped = False
    while i + 1 < len(data):
        if data[i] != 0xFF:
            # malformed: stop rather than corrupt
            return b"".join(out) + data[i:] if dropped else data
        m = i + 1
        while m < len(data) and data[m] == 0xFF:
            m += 1
        marker = data[m]
        if marker == 0xDA:       # SOS — copy scan + rest verbatim
            out.append(data[i:])
            break
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            out.append(data[i:m + 1])
            i = m + 1
            continue
        if m + 2 >= len(data):
            out.append(data[i:])
            break
        seg_len = _u16(data, m + 1)
        seg_end = m + 1 + seg_len
        if seg_len < 2 or seg_end > len(data):
            return b"".join(out) + data[i:] if dropped else data
        if marker in _JPEG_DROP_MARKERS:
            dropped = True
        else:
            out.append(data[i:seg_end])
        i = seg_end
    return b"".join(out) if dropped else data


def _printable_runs(b: bytes, min_len: int) -> list[str]:
    runs = []
    cur = []
    for ch in b:
        if 0x20 <= ch <= 0x7E:
            cur.append(chr(ch))
        else:
            if len(cur) >= min_len:
                runs.append("".join(cur))
            cur = []
    if len(cur) >= min_len:
        runs.append("".join(cur))
    return runs


def inspect_jpeg_metadata(data: bytes) -> dict:
    """Flags EXIF/XMP/IPTC segments, a GPS IFD pointer, and printable
    ASCII runs from EXIF (camera make/model/serial are ASCII)."""
    res = {"hasExif": False, "hasXmp": False, "hasIptc": False,
           "gpsPresent": False, "strings": []}
    if not data or len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return res
    i = 2
    while i + 3 < len(data):
        if data[i] != 0xFF:
            break
        m = i + 1
        while m < len(data) and data[m] == 0xFF:
            m += 1
        marker = data[m]
        if marker in (0xDA, 0xD9):
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i = m + 1
            continue
        if m + 2 >= len(data):
            break
        seg_len = _u16(data, m + 1)
        payload = data[m + 3:min(m + 1 + seg_len, len(data))]
        if marker == 0xE1:
            head = payload[:30].decode("latin-1", "replace")
            if head.startswith("Exif"):
                res["hasExif"] = True
                # 0x8825 = GPSInfo IFD tag, either endianness
                if b"\x88\x25" in payload or b"\x25\x88" in payload:
                    res["gpsPresent"] = True
                for s in _printable_runs(payload, 5):
                    if len(res["strings"]) < 20:
                        res["strings"].append(s)
            elif "ns.adobe.com/xap" in head:
                res["hasXmp"] = True
        elif marker == 0xED:
            res["hasIptc"] = True
        if seg_len < 2:
            break
        i = m + 1 + seg_len
    return res


def _read_u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "big")


def _jpx_boxes(data: bytes):
    """Yield (box_type, start, length) for top-level JP2 boxes; stops at
    the first malformed length."""
    i = 0
    while i + 8 <= len(data):
        length = _read_u32(data, i)
        header = 8
        if length == 1:      # 64-bit extended length
            if i + 16 > len(data):
                return
            length = int.from_bytes(data[i + 8:i + 16], "big")
            header = 16
        elif length == 0:    # box extends to end of file
            length = len(data) - i
        if length < header or i + length > len(data):
            return
        yield data[i + 4:i + 8], i, length
        i += length


def strip_jpx_metadata(data: bytes) -> bytes:
    """Remove top-level metadata boxes from a JP2/JPX stream; a raw
    codestream (SOC 0xFF4F) has no boxes and returns unchanged."""
    if not data or len(data) < 8 or (data[0] == 0xFF and data[1] == 0x4F):
        return data
    out = []
    dropped = False
    end = 0
    for btype, start, length in _jpx_boxes(data):
        if btype in _JPX_DROP_BOXES:
            dropped = True
        else:
            out.append(data[start:start + length])
        end = start + length
    if end < len(data):
        out.append(data[end:])
    return b"".join(out) if dropped else data


def inspect_jpx_metadata(data: bytes) -> dict:
    res = {"hasXml": False, "hasUuid": False, "boxes": []}
    if not data or len(data) < 8 or (data[0] == 0xFF and data[1] == 0x4F):
        return res
    for btype, _start, _length in _jpx_boxes(data):
        if btype in _JPX_DROP_BOXES:
            res["boxes"].append(btype.decode("latin-1").strip())
            if btype == b"xml ":
                res["hasXml"] = True
            if btype == b"uuid":
                res["hasUuid"] = True
    return res
