"""Encrypted-PDF support: RC4/AES primitives (published test vectors),
standard-security-handler key schedule, end-to-end encrypted extraction."""

import hashlib
import random
import re
import struct

from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.crypto import (
    _PAD, StandardSecurityHandler, aes_cbc_decrypt, rc4)
from scribe_js_ray.stages.pdf.objects import PdfFile
from scribe_js_ray.model import page_text


def test_rc4_vectors():
    # published RC4 test vectors
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    # involution
    assert rc4(b"k", rc4(b"k", b"payload")) == b"payload"


def test_aes_cbc_roundtrip_via_vector():
    from scribe_js_ray.stages.pdf.crypto import _aes_decrypt_block, \
        _expand_key
    key = bytes(range(16))
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")  # FIPS-197
    w, nr = _expand_key(key)
    assert _aes_decrypt_block(ct, w, nr) == bytes.fromhex(
        "00112233445566778899aabbccddeeff")


def _encrypt_pdf_rc4(data: bytes) -> bytes:
    """Post-process a synthetic PDF into an RC4-encrypted one (R3, 128-bit):
    derive /O for empty owner password, file key per Algorithm 2, RC4 every
    stream with its per-object key, append /Encrypt + /ID to the trailer."""
    doc_id = b"\x01\x23\x45\x67\x89\xab\xcd\xef" * 2
    p = -44

    # Algorithm 3 (empty owner + user password): O value
    h = hashlib.md5(_PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:16]
    o_val = rc4(okey, _PAD)
    for i in range(1, 20):
        step = bytes(b ^ i for b in okey)
        o_val = rc4(step, o_val)

    # Algorithm 2: file key (R3, 128-bit)
    md = hashlib.md5()
    md.update(_PAD)
    md.update(o_val[:32])
    md.update(struct.pack("<i", p))
    md.update(doc_id)
    key = md.digest()
    for _ in range(50):
        key = hashlib.md5(key[:16]).digest()
    file_key = key[:16]

    def obj_key(num, gen):
        ext = file_key + bytes([num & 0xFF, (num >> 8) & 0xFF,
                                (num >> 16) & 0xFF, gen & 0xFF,
                                (gen >> 8) & 0xFF])
        return hashlib.md5(ext).digest()[:16]

    # encrypt every stream body in place
    out = bytearray()
    pos = 0
    pattern = re.compile(
        rb"(\d+) (\d+) obj((?:(?!endobj)[\s\S])*?stream\r?\n)"
        rb"([\s\S]*?)(endstream)")
    last = 0
    for m in pattern.finditer(data):
        num, gen = int(m.group(1)), int(m.group(2))
        body = m.group(4)
        enc = rc4(obj_key(num, gen), body)
        out += data[last:m.start(4)]
        out += enc
        last = m.end(4)
    out += data[last:]

    # splice /Encrypt (inline dict) + /ID into the existing trailer —
    # the trailer sits after the xref table, so object offsets and
    # startxref stay valid.
    enc_dict = (f"/Encrypt << /Filter /Standard /V 2 /R 3 /Length 128 "
                f"/P {p} /O <{o_val.hex()}> /U <{bytes(32).hex()}> >> "
                f"/ID [<{doc_id.hex()}> <{doc_id.hex()}>]").encode()
    blob = bytes(out).replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R " + enc_dict + b" >>", 1)
    assert enc_dict in blob
    return blob


def _sample_pdf() -> bytes:
    ts = _Typesetter()
    ts.line("Secret content line one", font="F1")
    ts.line("And a second line", font="F1")
    return _make_pdf([ts.stream()], {"F1": "Helvetica"})


def test_handler_roundtrip_self_consistent():
    data = _encrypt_pdf_rc4(_sample_pdf())
    pdf = PdfFile(data)
    assert pdf.crypt is not None
    assert pdf.crypt.key_len == 16


def test_encrypted_pdf_extracts_text():
    plain = _sample_pdf()
    pages_plain, _ = parse_pdf_document(plain)
    plain_text = page_text(pages_plain[0])
    assert "Secret content" in plain_text

    enc = _encrypt_pdf_rc4(plain)
    assert b"Secret content" not in enc  # stream truly encrypted
    pages_enc, _ = parse_pdf_document(enc)
    assert page_text(pages_enc[0]) == plain_text


def test_r5_rejected_cleanly():
    import pytest
    with pytest.raises(NotImplementedError):
        StandardSecurityHandler({"V": 5, "R": 6, "O": b"x" * 48,
                                 "P": -44}, b"")
