"""Stdlib media codecs: bit-exact round-trips + known-value decodes.

These are the goldens backing the multimodal stages' claim of REAL
decode: every PNG filter type, palette/gray/alpha layouts, BMP row
padding and orientation, WAV bit depths and channel fold, and the MPNG
frame container."""

import struct
import zlib

import numpy as np
import pytest

from scribe_js_ray.stages.codecs import (
    bmp_decode, bmp_encode, decode_image, mpng_decode_frame, mpng_encode,
    mpng_info, png_decode, png_encode, resize_nearest, sniff_image_format,
    to_rgb, wav_decode, wav_encode)


def _rand_px(h, w, c, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, c), dtype=np.uint8)


# ---------------------------------------------------------------- PNG

@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_filters(filter_type):
    px = _rand_px(13, 17, 3, seed=filter_type)
    data = png_encode(px, filter_type=filter_type)
    assert np.array_equal(png_decode(data), px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip_channel_layouts(channels):
    px = _rand_px(9, 11, channels)
    out = png_decode(png_encode(px))
    assert out.shape == (9, 11, channels)
    assert np.array_equal(out, px)


def test_png_known_pixels():
    # 2×2 RGB with known values survives encode→decode exactly.
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_palette_decode():
    # Hand-built palette PNG: 2×2, palette = [red, green, blue].
    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 2])  # rows: [idx0, idx1], [idx2, idx2]
    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + \
        chunk(b"PLTE", plte) + chunk(b"IDAT", zlib.compress(raw)) + \
        chunk(b"IEND", b"")
    px = png_decode(data)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    assert px[1, 1].tolist() == [0, 0, 255]


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


# ---------------------------------------------------------------- BMP

@pytest.mark.parametrize("w", [4, 5, 6, 7])  # exercises row padding
def test_bmp_round_trip_padding(w):
    px = _rand_px(5, w, 3, seed=w)
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_bmp_top_down_and_32bit():
    # Hand-built 2×2 top-down 32-bit BMP (BGRA order in file).
    pix = [
        [10, 20, 30, 255], [40, 50, 60, 255],   # row 0 (top, BGRA)
        [70, 80, 90, 255], [100, 110, 120, 255],
    ]
    body = b"".join(bytes(p) for p in pix)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(body),
                      0, 0, 0, 0)
    data = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54) + \
        dib + body
    px = bmp_decode(data)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [30, 20, 10]   # BGR → RGB
    assert px[1, 1].tolist() == [120, 110, 100]


def test_bmp_8bit_palette():
    pal = b"".join(bytes([i, 2 * i, 3 * i, 0]) for i in range(4))  # BGRA
    rows = bytes([0, 1, 0, 0]) + bytes([2, 3, 0, 0])  # padded to 4
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(rows),
                      0, 0, 4, 0)
    data = b"BM" + \
        struct.pack("<IHHI", 14 + 40 + 16 + len(rows), 0, 0, 54 + 16) + \
        dib + pal + rows
    px = bmp_decode(data)
    # bottom-up: file row 0 is the BOTTOM row
    assert px[1, 0].tolist() == [0, 0, 0]       # palette 0 (RGB of B,G,R)
    assert px[1, 1].tolist() == [3, 2, 1]       # palette 1
    assert px[0, 0].tolist() == [6, 4, 2]       # palette 2
    assert px[0, 1].tolist() == [9, 6, 3]       # palette 3


# ---------------------------------------------------------------- WAV

def test_wav_round_trip_exact_16bit():
    samples = np.array([0.0, 0.5, -0.5, 0.25, -1.0, 32767 / 32768],
                       dtype=np.float32)
    out, rate = wav_decode(wav_encode(samples, sample_rate=8000))
    assert rate == 8000
    # 16-bit quantization: exact to 1/32768
    assert np.allclose(out, samples, atol=1.0 / 32768)


def test_wav_stereo_folds_to_mono():
    # Hand-built stereo 16-bit WAV: L=[1000, -1000], R=[3000, 1000].
    pcm = struct.pack("<4h", 1000, 3000, -1000, 1000)
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    data = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + \
        b"fmt " + struct.pack("<I", 16) + fmt + \
        b"data" + struct.pack("<I", len(pcm)) + pcm
    out, rate = wav_decode(data)
    assert rate == 16000
    assert np.allclose(out, [2000 / 32768, 0.0])


def test_wav_8bit():
    pcm = bytes([128, 255, 0, 192])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + \
        b"fmt " + struct.pack("<I", 16) + fmt + \
        b"data" + struct.pack("<I", len(pcm)) + pcm
    out, _ = wav_decode(data)
    assert np.allclose(out, [0.0, 127 / 128, -1.0, 0.5])


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    data = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + \
        b"fmt " + struct.pack("<I", 16) + fmt + \
        b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        wav_decode(data)


# ---------------------------------------------------------------- MPNG

def test_mpng_round_trip():
    frames = [_rand_px(6, 8, 3, seed=i) for i in range(5)]
    data = mpng_encode(frames, fps=12)
    assert mpng_info(data) == (5, 12)
    for i, f in enumerate(frames):
        assert np.array_equal(mpng_decode_frame(data, i), f)
    with pytest.raises(IndexError):
        mpng_decode_frame(data, 5)


# ------------------------------------------------------------- helpers

def test_sniff_and_decode_image():
    px = _rand_px(4, 4, 3)
    assert sniff_image_format(png_encode(px)) == "png"
    assert sniff_image_format(bmp_encode(px)) == "bmp"
    assert sniff_image_format(b"junk") is None
    assert np.array_equal(decode_image(bmp_encode(px)), px)


def test_to_rgb_layouts():
    gray = np.full((2, 2), 9, np.uint8)
    assert to_rgb(gray).shape == (2, 2, 3)
    assert to_rgb(gray)[0, 0].tolist() == [9, 9, 9]
    ga = np.dstack([gray, np.full((2, 2), 255, np.uint8)])
    assert to_rgb(ga)[0, 0].tolist() == [9, 9, 9]
    rgba = _rand_px(2, 2, 4)
    assert np.array_equal(to_rgb(rgba), rgba[:, :, :3])


def test_resize_nearest_exact():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(px, 2, 2)
    # (0,0)→src(0,0)=0, (0,1)→src(0,2)=2, (1,0)→src(2,0)=8, (1,1)→10
    assert up[:, :, 0].tolist() == [[0, 2], [8, 10]]


# ---------------------------------------------------------------- GIF

def test_gif_round_trip_single_frame():
    from scribe_js_ray.stages.codecs import gif_decode, gif_encode
    # 6x8, 5 distinct colors → lossless
    px = np.zeros((6, 8, 3), np.uint8)
    px[0] = [255, 0, 0]
    px[1] = [0, 255, 0]
    px[2] = [0, 0, 255]
    px[3] = [10, 20, 30]
    assert np.array_equal(gif_decode(gif_encode(px)), px)


def test_gif_round_trip_animation():
    from scribe_js_ray.stages.codecs import (gif_decode_frames, gif_encode,
                                             gif_frame_count)
    frames = [np.full((4, 5, 3), c, np.uint8) for c in (0, 85, 170, 255)]
    data = gif_encode(frames, fps=5)
    assert data[:6] == b"GIF89a"
    assert gif_frame_count(data) == 4
    for got, want in zip(gif_decode_frames(data), frames):
        assert np.array_equal(got, want)


def test_gif_many_colors_lzw_widths():
    from scribe_js_ray.stages.codecs import gif_decode, gif_encode
    # 256 distinct colors exercises the full LZW code-width ramp
    vals = np.arange(256, dtype=np.uint8)
    px = np.stack([vals, vals[::-1], (vals * 7) % 256],
                  axis=1).reshape(16, 16, 3)
    assert np.array_equal(gif_decode(gif_encode(px)), px)


def test_gif_rejects_too_many_colors():
    from scribe_js_ray.stages.codecs import gif_encode
    px = _rand_px(32, 32, 3)  # ~1024 distinct colors
    with pytest.raises(ValueError):
        gif_encode(px)


def test_gif_sniffed_by_decode_image():
    from scribe_js_ray.stages.codecs import (decode_image, gif_encode,
                                             sniff_image_format)
    px = np.full((3, 3, 3), 7, np.uint8)
    data = gif_encode(px)
    assert sniff_image_format(data) == "gif"
    assert np.array_equal(decode_image(data), px)


def test_gif_video_frame_sampling():
    import pyarrow as pa
    from scribe_js_ray.stages.codecs import gif_encode
    from scribe_js_ray.stages.multimodal import SampleVideoFrames
    frames = [np.full((8, 8, 3), c, np.uint8) for c in (10, 60, 110, 160,
                                                        210, 250)]
    out = SampleVideoFrames(n_frames=3)(pa.table({
        "video_id": pa.array([1], pa.int64()),
        "video": pa.array([gif_encode(frames)], pa.binary()),
    }))
    assert out["src_frame"].to_pylist() == [0, 2, 5]  # even spacing over 6
    px0 = np.asarray(out["frame"][0].as_py(), np.uint8)
    px2 = np.asarray(out["frame"][2].as_py(), np.uint8)
    assert (px0 == 10).all() and (px2 == 250).all()


# ---------------------------------------------------------------- JPEG

def test_jpeg_solid_color_near_exact():
    from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode
    px = np.full((16, 16, 3), 120, np.uint8)
    out = jpeg_decode(jpeg_encode(px, quality=90))
    assert np.abs(out.astype(int) - 120).max() <= 1


@pytest.mark.parametrize("quality,subsample,floor", [
    (50, False, 35.0), (85, False, 40.0), (85, True, 35.0)])
def test_jpeg_round_trip_psnr(quality, subsample, floor):
    from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode
    yy, xx = np.mgrid[0:32, 0:48]
    px = np.stack([xx * 5 % 256, yy * 7 % 256, (xx + yy) * 3 % 256],
                  axis=2).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(px, quality=quality,
                                  subsample=subsample))
    assert out.shape == px.shape
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > floor


def test_jpeg_odd_dimensions_and_gray():
    from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode
    px = _rand_px(13, 21, 3)  # non-multiple-of-8/16 dims
    out = jpeg_decode(jpeg_encode(px, quality=95, subsample=True))
    assert out.shape == (13, 21, 3)
    g = (np.arange(24 * 24) % 256).reshape(24, 24).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=90))
    assert out.shape == (24, 24, 3)


def test_jpeg_rejects_progressive_and_garbage():
    from scribe_js_ray.stages.jpeg import jpeg_decode, jpeg_encode
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    data = bytearray(jpeg_encode(np.zeros((8, 8, 3), np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))


def test_jpeg_sniffed_by_decode_image():
    from scribe_js_ray.stages.codecs import decode_image, sniff_image_format
    from scribe_js_ray.stages.jpeg import jpeg_encode
    px = np.full((9, 9, 3), 200, np.uint8)
    data = jpeg_encode(px)
    assert sniff_image_format(data) == "jpeg"
    out = decode_image(data)
    assert out.shape == (9, 9, 3)
    assert np.abs(out.astype(int) - 200).max() <= 1


def test_wav_mulaw_alaw():
    """G.711 companded WAVs decode through the expansion tables:
    mu-law 0xFF == +0, and a known mu-law byte hits its table value."""
    from scribe_js_ray.stages.codecs import wav_decode

    def g711_wav(fmt_code, payload):
        fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE" +
                b"fmt " + struct.pack("<I", 16) + fmt +
                b"data" + struct.pack("<I", len(payload)) + payload)

    out, rate = wav_decode(g711_wav(7, bytes([0xFF, 0x7F, 0x80])))
    assert rate == 8000
    assert out[0] == 0.0                     # mu-law 0xFF → 0
    assert abs(out[1]) < 0.01                # near-zero negative code
    assert out[2] > 0.9                      # loudest positive code
    out, _ = wav_decode(g711_wav(6, bytes([0x55, 0xD5])))
    assert abs(out[0]) < 0.01                # A-law 0x55 → ±8 (tiny)
    assert abs(out[1]) < 0.01
    assert (out[0] < 0) != (out[1] < 0)      # opposite signs


# ---------------------------------------------------------------- TIFF

@pytest.mark.parametrize("comp", ["none", "packbits"])
def test_tiff_round_trip(comp):
    from scribe_js_ray.stages.codecs import tiff_decode, tiff_encode
    px = _rand_px(13, 17, 3, seed=3)
    assert np.array_equal(tiff_decode(tiff_encode(px, comp)), px)
    g = _rand_px(9, 9, 1, seed=4)[:, :, 0]
    assert np.array_equal(tiff_decode(tiff_encode(g, comp))[:, :, 0], g)


def test_tiff_packbits_repeat_runs():
    from scribe_js_ray.stages.codecs import tiff_decode, tiff_encode
    px = np.full((16, 16, 3), 42, np.uint8)
    data = tiff_encode(px, "packbits")
    assert len(data) < 16 * 16 * 3 // 2     # runs actually compress
    assert np.array_equal(tiff_decode(data), px)


def test_tiff_big_endian_and_white_is_zero():
    """Hand-built MM (big-endian) gray TIFF with photometric 0
    (white-is-zero) inverts on decode."""
    import struct as st
    from scribe_js_ray.stages.codecs import tiff_decode
    strip = bytes([0, 128, 255, 64])  # 2x2 gray
    entries = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 0), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 4)]
    ifd_size = 2 + len(entries) * 12 + 4
    strip_off = 8 + ifd_size
    out = bytearray(b"MM\x00*" + st.pack(">I", 8))
    out += st.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        out += st.pack(">HHI", tag, typ, count)
        if typ == 3:
            out += st.pack(">HH", val, 0)
        else:
            out += st.pack(">I", strip_off if tag == 273 else val)
    out += st.pack(">I", 0)
    out += strip
    px = tiff_decode(bytes(out))
    assert px[:, :, 0].reshape(-1).tolist() == [255, 127, 0, 191]


def test_tiff_sniffed_by_decode_image():
    from scribe_js_ray.stages.codecs import (decode_image, sniff_image_format,
                                             tiff_encode)
    px = _rand_px(5, 7, 3, seed=9)
    data = tiff_encode(px)
    assert sniff_image_format(data) == "tiff"
    assert np.array_equal(decode_image(data), px)


def test_tiff_rejects_garbage_and_tiled():
    from scribe_js_ray.stages.codecs import tiff_decode, tiff_encode
    with pytest.raises(ValueError):
        tiff_decode(b"II*\x00garbage")
    data = bytearray(tiff_encode(np.zeros((4, 4, 3), np.uint8)))
    # corrupting the tag id of entry 0 (width, 256) to 322 (TileWidth)
    import struct as st
    st.pack_into("<H", data, 10, 322)
    with pytest.raises(ValueError):
        tiff_decode(bytes(data))


def test_png_sub_byte_and_16bit_depths():
    """1-bit gray, 4-bit palette and 16-bit gray PNGs decode (scanned
    documents are commonly 1-bit; the 16-bit path takes the high byte)."""
    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    sig = b"\x89PNG\r\n\x1a\n"
    # 1-bit gray 10x2 alternating
    ihdr = struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0)
    raw = b"\x00" + bytes([0b10101010, 0b10000000]) + \
        b"\x00" + bytes([0b01010101, 0b01000000])
    px = png_decode(sig + chunk(b"IHDR", ihdr) +
                    chunk(b"IDAT", zlib.compress(raw)) +
                    chunk(b"IEND", b""))
    assert px[0, :, 0].tolist() == [255, 0] * 5
    assert px[1, :, 0].tolist() == [0, 255] * 5
    # 4-bit palette 4x1
    ihdr = struct.pack(">IIBBBBB", 4, 1, 4, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    raw = b"\x00" + bytes([0x01, 0x23])
    px = png_decode(sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) +
                    chunk(b"IDAT", zlib.compress(raw)) +
                    chunk(b"IEND", b""))
    assert px[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255],
                              [255, 255, 255]]
    # 16-bit gray: high bytes survive
    ihdr = struct.pack(">IIBBBBB", 3, 1, 16, 0, 0, 0, 0)
    raw = b"\x00" + bytes([0x12, 0x34, 0xFF, 0x00, 0x00, 0x01])
    px = png_decode(sig + chunk(b"IHDR", ihdr) +
                    chunk(b"IDAT", zlib.compress(raw)) +
                    chunk(b"IEND", b""))
    assert px[0, :, 0].tolist() == [0x12, 0xFF, 0x00]


def test_tiff_lzw_strip_decodes():
    """Hand-built compression-5 (TIFF LZW, MSB-first early-change)
    strip: Clear, 4 literals, EOI in 9-bit codes."""
    import struct as st
    from scribe_js_ray.stages.codecs import tiff_decode

    codes = [256, 65, 66, 67, 68, 257]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    strip = bytes(out)
    entries = [(256, 3, 1, 4), (257, 3, 1, 1), (258, 3, 1, 8),
               (259, 3, 1, 5), (262, 3, 1, 1), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 3, 1, 1), (279, 4, 1, len(strip))]
    ifd_size = 2 + len(entries) * 12 + 4
    strip_off = 8 + ifd_size
    data = bytearray(b"II*\x00" + st.pack("<I", 8))
    data += st.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        data += st.pack("<HHI", tag, typ, count)
        data += st.pack("<I", strip_off if tag == 273 else val)
    data += st.pack("<I", 0)
    data += strip
    px = tiff_decode(bytes(data))
    assert px[0, :, 0].tolist() == [65, 66, 67, 68]


def test_tiff_rejects_planar_and_oversized_tags():
    import struct as st
    from scribe_js_ray.stages.codecs import tiff_decode, tiff_encode
    base = bytearray(tiff_encode(np.zeros((4, 4, 3), np.uint8)))
    # corrupt entry 0's count field to a huge value → bounds error,
    # fast, instead of a multi-second value-materialization loop
    st.pack_into("<I", base, 8 + 2 + 4, 0x7FFFFFFF)
    with pytest.raises(ValueError):
        tiff_decode(bytes(base))
    with pytest.raises(ValueError):
        tiff_encode(np.zeros((4, 4, 2), np.uint8))  # gray+alpha


def test_png_adam7_interlaced_decode():
    """Adam7: interleave a known image with the spec's pass grid in the
    test, decode, and require exact reconstruction."""
    ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    px = _rand_px(13, 11, 3, seed=21)
    h, w, c = px.shape
    raw = bytearray()
    for x0, y0, dx, dy in ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)            # filter None per sub-image row
            raw += row.tobytes()

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    data = b"\x89PNG\r\n\x1a\n" + \
        chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)) + \
        chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    assert np.array_equal(png_decode(data), px)


def test_image_dims_header_only():
    """image_dims reads container headers without pixel decode."""
    import numpy as np

    from scribe_js_ray.stages.codecs import (bmp_encode, gif_encode,
                                             image_dims, png_encode,
                                             tiff_encode)
    from scribe_js_ray.stages.jpeg import jpeg_encode
    px = np.random.default_rng(0).integers(
        0, 255, (24, 37, 3), dtype=np.uint8)
    flat = np.full((24, 37, 3), 80, dtype=np.uint8)  # GIF needs <=256 colors
    assert image_dims(png_encode(px)) == (37, 24)
    assert image_dims(bmp_encode(px)) == (37, 24)
    assert image_dims(gif_encode([flat])) == (37, 24)
    assert image_dims(jpeg_encode(px)) == (37, 24)
    assert image_dims(tiff_encode(px)) == (37, 24)
    import pytest
    with pytest.raises(ValueError):
        image_dims(b"not an image at all")
    with pytest.raises(ValueError):
        image_dims(b"\x89PNG\r\n\x1a\n\x00")  # truncated header
