"""Pure-stdlib media codecs: PNG, BMP, WAV-PCM, and an MPNG frame
container for video-shaped payloads.

No external imaging/audio libraries exist in this environment, so the
multimodal stages decode with these stdlib-only (``zlib`` + ``struct`` +
numpy) implementations.  Coverage is the subset a synthetic training-data
corpus needs — it is a REAL decode (bit-exact pixels/samples, verified by
round-trip tests in ``tests/test_codecs.py``), not a stub:

- PNG  (decode + encode): gray / gray+alpha / RGB / RGBA / palette,
  bit depths 1/2/4/8/16 (sub-byte unpacked, 16-bit high-byte
  downscale), all five row filters (None/Sub/Up/Average/Paeth),
  Adam7 interlace (8-bit).
  Spec: W3C PNG (ISO/IEC 15948).  Reference analog: the render path the
  reference keeps in ``js/pdf/codecs/`` is out of scope (SURVEY M29); this
  module exists for the multimodal corpus operators, not PDF rendering.
- BMP  (decode + encode): BITMAPINFOHEADER, 8 (palette) / 24 / 32-bit
  uncompressed (BI_RGB), bottom-up or top-down rows.
- WAV  (decode + encode): RIFF/WAVE PCM 8/16/32-bit plus G.711
  mu-law/A-law companding, any channel count (decode averages to mono
  float32).
- GIF  (decode + encode): 87a/89a, LZW both directions, global/local
  color tables, interlace, multi-frame animation (lossless round-trip
  for <=256-color content).
- MPNG (decode + encode): a minimal deterministic frame container
  (magic + frame table + one PNG per frame) standing in for real video
  containers, whose codecs cannot be implemented stdlib-only; the
  per-frame PIXEL decode is the real PNG path above.  Real deployments
  swap this container parser for pyav/ffmpeg behind the same API.

- TIFF (decode + encode): first-IFD strips, none/LZW/PackBits
  compression, gray/RGB/palette photometrics, horizontal-differencing
  predictor (LZW shared with the PDF filter stack).
- JPEG (decode + encode, ``stages/jpeg.py``): baseline sequential DCT,
  Annex K tables, 4:4:4 + 4:2:0, restart markers; lossy — tested by
  DC-exactness and PSNR bounds rather than bit-identity.

External-library codecs (MP3, H.264, WebP, ...) remain gated behind the
stages' ``real_codecs=True`` flag, which raises until such a library is
wired in.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type: 0=gray, 2=RGB, 3=palette, 4=gray+A, 6=RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filters → (height, width*bpp) uint8 (8-bit
    samples; byte stride = pixel stride)."""
    return _unfilter_bytes(raw, width * bpp, height, bpp)


def _unfilter_bytes(raw: bytes, stride: int, height: int,
                    bpp: int) -> np.ndarray:
    """Reverse PNG row filters over BYTE rows of ``stride`` with filter
    displacement ``bpp`` bytes (spec: bpp = ceil(bits-per-pixel / 8),
    min 1).  None/Up are vectorized; Sub is a per-channel cumsum
    (mod-256 via uint8 overflow); Average/Paeth are inherently
    sequential per pixel."""
    out = np.zeros((height, stride), dtype=np.uint8)
    raw = np.frombuffer(raw, dtype=np.uint8)
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG: truncated image data")
    rows = raw[:height * (stride + 1)].reshape(height, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if ftype == 0:                                   # None
            cur = line
        elif ftype == 1:                                 # Sub
            cur = line.reshape(-1, bpp)
            np.cumsum(cur, axis=0, dtype=np.uint8, out=cur)
            cur = cur.reshape(-1)
        elif ftype == 2:                                 # Up
            cur = line + prev
        elif ftype == 3:                                 # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _deinterlace_adam7(raw: bytes, width: int, height: int,
                       nch: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images concatenated in
    the stream, scattered back onto the full grid (8-bit samples)."""
    out = np.zeros((height, width, nch), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        span = ph * (pw * nch + 1)
        sub = _unfilter(raw[pos:pos + span], pw, ph, nch)
        pos += span
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8.  Palette images expand to RGB;
    gray stays 1-channel, gray+alpha 2, RGBA 4."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("PNG: bad signature")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if not (0 < width <= 16384 and 0 < height <= 16384):
        raise ValueError("PNG: unreasonable dimensions")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace:
        if interlace != 1 or bit_depth != 8:
            raise ValueError("PNG: unsupported interlace method")
        px = _deinterlace_adam7(raw, width, height, nch)
    elif bit_depth == 8:
        px = _unfilter(raw, width, height, nch).reshape(
            height, width, nch)
    elif bit_depth == 16:
        if color_type == 3:
            raise ValueError("PNG: 16-bit palette images are invalid")
        # filters operate on BYTES (bpp = 2×channels); take the high
        # byte after reconstruction — the faithful 16→8 downscale
        wide = _unfilter_bytes(raw, width * nch * 2, height, nch * 2)
        px = wide.reshape(height, width, nch, 2)[:, :, :, 0].copy()
    elif bit_depth in (1, 2, 4):
        if color_type not in (0, 3):
            raise ValueError(
                f"PNG: bit depth {bit_depth} only for gray/palette")
        stride = (width * bit_depth + 7) // 8
        rows = _unfilter_bytes(raw, stride, height, 1)
        bits = np.unpackbits(rows, axis=1)[:, :width * bit_depth]
        vals = bits.reshape(height, width, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        idx = (vals * weights).sum(axis=2).astype(np.uint8)
        if color_type == 0:
            # scale sub-byte gray to full range (1→255, 2→85, 4→17)
            idx = (idx * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
        px = idx[:, :, None]
    else:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth}")
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def png_encode(px: np.ndarray, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """(h, w[, channels]) uint8 → PNG bytes.  ``filter_type`` applies one
    row filter to every row (0 default; 1-4 exist so the decoder's filter
    paths are testable against true encoded input)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = px.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        raw.append(filter_type)
        if filter_type == 0:
            raw += cur.tobytes()
        elif filter_type == 1:
            shifted = np.zeros_like(cur)
            shifted[c:] = cur[:-c]
            raw += (cur - shifted).tobytes()
        elif filter_type == 2:
            raw += (cur - prev).tobytes()
        elif filter_type == 3:
            line = bytearray(stride)
            for x in range(stride):
                left = int(cur[x - c]) if x >= c else 0
                line[x] = (int(cur[x]) - ((left + int(prev[x])) >> 1)) & 0xFF
            raw += line
        elif filter_type == 4:
            line = bytearray(stride)
            for x in range(stride):
                left = int(cur[x - c]) if x >= c else 0
                ul = int(prev[x - c]) if x >= c else 0
                line[x] = (int(cur[x]) -
                           _paeth(left, int(prev[x]), ul)) & 0xFF
            raw += line
        else:
            raise ValueError(f"PNG: unknown filter type {filter_type}")
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw), compress_level)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + \
        chunk(b"IEND", b"")


# ---------------------------------------------------------------- BMP

def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB (alpha of 32-bit images dropped)."""
    if data[:2] != b"BM":
        raise ValueError("BMP: bad signature")
    (offbits,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP: pre-BITMAPINFOHEADER formats unsupported")
    width, height = struct.unpack("<ii", data[18:26])
    bpp, = struct.unpack("<H", data[28:30])
    compression, = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"BMP: compression {compression} unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: {bpp}-bit unsupported")
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        n_colors, = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_raw = np.frombuffer(
            data[14 + hdr_size:14 + hdr_size + 4 * n_colors], np.uint8)
        palette = pal_raw.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA → RGB
    bytes_pp = bpp // 8
    row_size = (width * bytes_pp + 3) & ~3
    px = np.frombuffer(data, np.uint8,
                       count=row_size * height, offset=offbits)
    px = px.reshape(height, row_size)[:, :width * bytes_pp]
    px = px.reshape(height, width, bytes_pp)
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        return np.ascontiguousarray(palette[px[:, :, 0]])
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) → RGB


def bmp_encode(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("BMP encoder takes RGB input")
    row_size = (w * 3 + 3) & ~3
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    body_b = body.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body_b),
                      2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body_b), 0, 0, 14 + 40)
    return hdr + dib + body_b


# ---------------------------------------------------------------- WAV

def _build_mulaw() -> np.ndarray:
    """ITU-T G.711 mu-law expansion table (256 → int16)."""
    out = np.empty(256, np.int16)
    for i in range(256):
        u = ~i & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 7
        mant = u & 0x0F
        mag = ((mant << 3) + 0x84 << exp) - 0x84
        out[i] = -mag if sign else mag
    return out


def _build_alaw() -> np.ndarray:
    """ITU-T G.711 A-law expansion table (256 → int16).  NOTE the A-law
    sign convention is inverted vs mu-law: a SET sign bit means
    POSITIVE (ITU G.711 / sun g711.c alaw2linear)."""
    out = np.empty(256, np.int16)
    for i in range(256):
        a = i ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 7
        mant = a & 0x0F
        if exp == 0:
            mag = (mant << 4) + 8
        else:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        out[i] = mag if sign else -mag
    return out


_MULAW_TABLE = _build_mulaw()
_ALAW_TABLE = _build_alaw()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 samples in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad signature")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = \
                struct.unpack("<HHIIHH", body[:16])
            # 1 = PCM, 6 = A-law, 7 = mu-law (G.711), 0xFFFE = extensible
            if audio_fmt not in (1, 6, 7, 0xFFFE):
                raise ValueError(f"WAV: unsupported format {audio_fmt}")
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt in (6, 7):
        # G.711 companded 8-bit: expand via the 256-entry tables
        table = _ALAW_TABLE if audio_fmt == 6 else _MULAW_TABLE
        arr = table[np.frombuffer(samples, np.uint8)].astype(
            np.float32) / 32768.0
    elif bits == 16:
        arr = np.frombuffer(samples, "<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(samples, np.uint8).astype(np.float32)
               - 128.0) / 128.0
    elif bits == 32:
        arr = np.frombuffer(samples, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"WAV: {bits}-bit unsupported")
    if n_ch > 1:
        arr = arr[:len(arr) - len(arr) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr.astype(np.float32), rate


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float32 mono samples in [-1, 1] → 16-bit PCM WAV bytes (rounded
    quantization, not truncation — half the worst-case error)."""
    pcm = np.round(np.clip(np.asarray(samples, np.float64) * 32767.0,
                           -32768, 32767)).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + \
        b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------- MPNG

_MPNG_MAGIC = b"MPNG\x01"


def mpng_encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (h, w, c) uint8 frames → MPNG container bytes."""
    payloads = [png_encode(f) for f in frames]
    out = bytearray(_MPNG_MAGIC)
    out += struct.pack(">IH", len(payloads), fps)
    for p in payloads:
        out += struct.pack(">I", len(p))
        out += p
    return bytes(out)


def mpng_info(data: bytes) -> tuple[int, int]:
    """→ (n_frames, fps) without decoding any frame."""
    if not data.startswith(_MPNG_MAGIC):
        raise ValueError("MPNG: bad signature")
    n_frames, fps = struct.unpack(">IH", data[5:11])
    return n_frames, fps


def mpng_decode_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode ONE frame by index, scanning the frame table (no decode of
    skipped frames — the point of a seekable container)."""
    n_frames, _ = mpng_info(data)
    if not 0 <= idx < n_frames:
        raise IndexError(f"MPNG: frame {idx} of {n_frames}")
    pos = 11
    for i in range(idx):
        (flen,) = struct.unpack(">I", data[pos:pos + 4])
        pos += 4 + flen
    (flen,) = struct.unpack(">I", data[pos:pos + 4])
    return png_decode(data[pos + 4:pos + 4 + flen])


# ------------------------------------------------------------- helpers

def sniff_image_format(data: bytes) -> str | None:
    if data.startswith(_PNG_SIG):
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode → (h, w, channels) uint8."""
    kind = sniff_image_format(data)
    if kind == "png":
        return png_decode(data)
    if kind == "bmp":
        return bmp_decode(data)
    if kind == "gif":
        return gif_decode(data)
    if kind == "jpeg":
        from .jpeg import jpeg_decode
        return jpeg_decode(data)
    if kind == "tiff":
        return tiff_decode(data)
    raise ValueError(
        "unsupported image format (PNG/BMP/GIF/JPEG/TIFF supported)")


def image_dims(data: bytes) -> tuple[int, int]:
    """(width, height) in pixels from the container header alone — no
    pixel decode.  TIFF falls back to the full decoder (rare; its dims
    live in IFD tags interleaved with the strip layout)."""
    kind = sniff_image_format(data)
    if kind == "png":
        if len(data) < 24:
            raise ValueError("PNG: truncated header")
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    if kind == "bmp":
        if len(data) < 26:
            raise ValueError("BMP: truncated header")
        w, h = struct.unpack("<ii", data[18:26])
        return abs(w), abs(h)
    if kind == "gif":
        if len(data) < 10:
            raise ValueError("GIF: truncated header")
        w, h = struct.unpack("<HH", data[6:10])
        return w, h
    if kind == "jpeg":
        # Walk marker segments to the first frame header (SOF0-SOF15,
        # excluding DHT/JPG/DAC which share the 0xC* range).
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > n:
                    break
                h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                return w, h
            pos += 2 + seg_len
        raise ValueError("JPEG: no frame header found")
    if kind == "tiff":
        px = tiff_decode(data)
        return px.shape[1], px.shape[0]
    raise ValueError(
        "unsupported image format (PNG/BMP/GIF/JPEG/TIFF supported)")


def to_rgb(px: np.ndarray) -> np.ndarray:
    """Any decoded channel layout → (h, w, 3) RGB (gray replicated,
    alpha dropped)."""
    if px.ndim == 2:
        px = px[:, :, None]
    c = px.shape[2]
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure index arithmetic —
    identical output on every worker/platform)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return np.ascontiguousarray(px[ys][:, xs])


# ---------------------------------------------------------------- GIF

def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width,
    clear/EOI codes, dictionary rebuilt on clear."""
    if not 1 <= min_code_size <= 11:
        # spec range is 2-8; anything larger is corrupt and would
        # allocate a 2^n-entry dictionary (hang/OOM, review r3)
        raise ValueError(f"GIF: bad LZW code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def reset():
        return ({i: [i] for i in range(clear)}, min_code_size + 1,
                eoi + 1)

    table, width, next_code = reset()
    prev: list[int] | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError("GIF: corrupt LZW stream")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]
        else:
            raise ValueError("GIF: corrupt LZW stream")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code, width):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    prev: tuple = ()
    for idx in indices:
        cand = prev + (idx,)
        if cand in table:
            prev = cand
            continue
        emit(table[prev], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        prev = (idx,)
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_decode_frames(data: bytes,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """GIF87a/89a bytes → list of (h, w, 3) uint8 RGB frames.  Supports
    global/local color tables, interlace, GCE transparency (transparent
    pixels leave the canvas untouched) and multi-frame (animated)
    streams; disposal semantics are simplified to draw-over-previous.
    ``max_frames`` stops decoding early (the still-image fast path)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if not (0 < sw <= 16384 and 0 < sh <= 16384):
        raise ValueError("GIF: unreasonable dimensions")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    canvas = np.zeros((sh, sw, 3), np.uint8)
    transparent = None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            ext_label = data[pos + 1] if pos + 1 < len(data) else 0
            p = pos + 2
            if ext_label == 0xF9 and p < len(data) and data[p] >= 4:
                gce_flags = data[p + 1]
                transparent = data[p + 4] if gce_flags & 1 else None
            while p < len(data) and data[p]:
                p += 1 + data[p]
            pos = p + 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        fx, fy, fw, fh, lflags = struct.unpack("<HHHHB",
                                               data[pos + 1:pos + 10])
        if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
            raise ValueError("GIF: image block outside logical screen")
        pos += 10
        ct = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            n = data[pos]
            lzw += data[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.array(_lzw_decode(bytes(lzw), min_code),
                       np.uint16)[:fw * fh]
        if len(idx) < fw * fh:
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        px = idx.reshape(fh, fw)
        if lflags & 0x40:  # interlaced rows
            deinterlaced = np.empty_like(px)
            order = list(range(0, fh, 8)) + list(range(4, fh, 8)) + \
                list(range(2, fh, 4)) + list(range(1, fh, 2))
            deinterlaced[order] = px[:len(order)]
            px = deinterlaced
        canvas = canvas.copy()
        rgb = ct[np.clip(px, 0, len(ct) - 1)]
        region = canvas[fy:fy + fh, fx:fx + fw]
        if transparent is not None:
            opaque = px != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        transparent = None  # GCE applies to ONE following image
        frames.append(canvas)
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def gif_decode(data: bytes) -> np.ndarray:
    """First frame only (the still-image surface of decode_image) —
    stops after one image block instead of decoding the animation."""
    return gif_decode_frames(data, max_frames=1)[0]


def gif_encode(frames, fps: int = 10) -> bytes:
    """List of (h, w, 3) uint8 frames (≤256 distinct colors across all
    frames → lossless) → GIF89a bytes."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("GIF encoder: frames must share one shape")
    flat = np.vstack([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF encoder: >256 distinct colors "
                         "(quantize first)")
    depth = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << depth
    pal = np.zeros((table_n, 3), np.uint8)
    pal[:len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    delay = max(1, round(100 / fps))
    n_px = h * w
    offset = 0
    for f in frames:
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        min_code = max(2, depth)
        out.append(min_code)
        data = _lzw_encode(
            inverse[offset:offset + n_px].astype(np.int64).tolist(),
            min_code)
        offset += n_px
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def gif_frame_count(data: bytes) -> int:
    return len(gif_decode_frames(data))


# ---------------------------------------------------------------- TIFF

def tiff_decode(data: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w, channels) uint8: both byte orders, first
    IFD, strips, 8-bit samples, compression 1 (none) / 5 (LZW, the
    MSB-first early-change variant shared with the PDF filter stack) /
    32773 (PackBits), photometric 0/1 (gray, incl. inverted), 2 (RGB),
    3 (palette), optional horizontal differencing predictor (tag 317).
    Tiled/16-bit TIFFs and corrupt structure raise ValueError."""
    try:
        return _tiff_decode_impl(data)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(
            f"TIFF: corrupt stream ({type(exc).__name__})") from exc


def _tiff_decode_impl(data: bytes) -> np.ndarray:
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("TIFF: bad signature")

    def u16(off):
        return struct.unpack(bo + "H", data[off:off + 2])[0]

    def u32(off):
        return struct.unpack(bo + "I", data[off:off + 4])[0]

    ifd = u32(4)
    n_entries = u16(ifd)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n_entries):
        e = ifd + 2 + i * 12
        tag, typ = u16(e), u16(e + 2)
        count = u32(e + 4)
        if typ not in type_size:
            continue
        sz = type_size[typ]
        off = e + 8 if sz * count <= 4 else u32(e + 8)
        # bounds + cap BEFORE materializing: crafted counts otherwise do
        # O(entries × filesize) Python work — a decode-actor DoS
        # (review r3; no legitimate baseline tag needs >2^20 values)
        if off + sz * count > len(data) or count > (1 << 20):
            raise ValueError("TIFF: tag value out of bounds")
        vals = []
        for k in range(count):
            p = off + k * sz
            vals.append(data[p] if sz == 1 else
                        (u16(p) if sz == 2 else u32(p)))
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w, h = one(256), one(257)
    if not w or not h or w > 16384 or h > 16384:
        raise ValueError("TIFF: bad dimensions")
    if 322 in tags or 323 in tags:
        raise ValueError("TIFF: tiled layout unsupported")
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8-bit samples supported")
    compression = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    predictor = one(317, 1)
    if one(284, 1) != 1:
        # planar (RRR...GGG...BBB) data would silently decode with
        # scrambled channels under the interleaved reshape below
        raise ValueError("TIFF: planar configuration unsupported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets:
        raise ValueError("TIFF: missing strip offsets")
    if not counts:
        if len(offsets) > 1:
            raise ValueError("TIFF: multi-strip file without "
                             "StripByteCounts")
        counts = [len(data) - offsets[0]]

    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = data[off:off + cnt]
        if compression == 1:
            raw += strip
        elif compression == 5:
            from .pdf.objects import lzw_decode
            raw += lzw_decode(strip, early_change=1)
        elif compression == 32773:                 # PackBits
            p = 0
            while p < len(strip):
                n = strip[p]
                p += 1
                if n < 128:
                    raw += strip[p:p + n + 1]
                    p += n + 1
                elif n > 128:
                    raw += bytes([strip[p]]) * (257 - n)
                    p += 1
        else:
            raise ValueError(f"TIFF: compression {compression} "
                             "unsupported")
    need = h * w * spp
    if len(raw) < need:
        raise ValueError("TIFF: truncated image data")
    px = np.frombuffer(bytes(raw), np.uint8, need).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: undo per row with a cumulative sum
        px = np.cumsum(px.astype(np.uint16), axis=1).astype(np.uint8)
    if photometric == 0:                            # white-is-zero
        px = 255 - px
    elif photometric == 3:                          # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("TIFF: palette image without color map")
        pal = (np.array(cmap[:3 * 256], np.uint32)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        px = pal[px[:, :, 0]]
    return np.ascontiguousarray(px)


def tiff_encode(px: np.ndarray, compression: str = "packbits") -> bytes:
    """(h, w[, channels]) uint8 → little-endian single-strip TIFF
    (compression "none" or "packbits")."""
    px = np.ascontiguousarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("TIFF encoder: 1 (gray) or 3 (RGB) channels "
                         "only — other layouts need ExtraSamples tags")
    flat = px.tobytes()
    if compression == "packbits":
        comp_code = 32773
        body = bytearray()
        i = 0
        n = len(flat)
        while i < n:
            # literal run up to 128 (simple encoder: no repeat packing
            # except exact byte runs >= 3)
            run = 1
            while i + run < n and run < 128 and \
                    flat[i + run] == flat[i]:
                run += 1
            if run >= 3:
                body.append(257 - run)
                body.append(flat[i])
                i += run
                continue
            lit_start = i
            i += 1
            while i < n and i - lit_start < 128:
                r = 1
                while i + r < n and r < 3 and flat[i + r] == flat[i]:
                    r += 1
                if r >= 3:
                    break
                i += 1
            body.append(i - lit_start - 1)
            body += flat[lit_start:i]
        strip = bytes(body)
    else:
        comp_code = 1
        strip = flat
    photometric = 1 if spp == 1 else 2

    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, spp, None),
        (259, 3, 1, comp_code), (262, 3, 1, photometric),
        (273, 4, 1, None), (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(strip)),
    ]
    # layout: header(8) + IFD + extra values + strip
    ifd_size = 2 + len(entries) * 12 + 4
    extra = bytearray()
    extra_base = 8 + ifd_size
    fields = []
    for tag, typ, count, val in entries:
        if tag == 258:
            if spp == 1:
                fields.append((tag, typ, 1, 8))
            elif spp <= 2:
                fields.append((tag, typ, spp, 8 | (8 << 16)))
            else:
                fields.append((tag, typ, count, extra_base + len(extra)))
                for _ in range(spp):
                    extra += struct.pack("<H", 8)
        elif tag == 273:
            fields.append((tag, typ, 1, 0))  # patched below
        else:
            fields.append((tag, typ, count, val))
    strip_off = extra_base + len(extra)
    fields = [(t, ty, c, strip_off if t == 273 else v)
              for t, ty, c, v in fields]
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(fields))
    for tag, typ, count, val in fields:
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    out += strip
    return bytes(out)
