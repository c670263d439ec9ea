"""Encrypted-PDF support: RC4/AES primitives (published test vectors),
standard-security-handler key schedule (R3 RC4, R6 AES-256), string +
stream decryption, end-to-end encrypted extraction."""

import hashlib
import re
import struct

from scribe_js_ray.sources.synth_pdf import (
    PdfWriter, _Typesetter, _make_pdf)
from scribe_js_ray.stages.pdf import parse_pdf_document
from scribe_js_ray.stages.pdf.crypto import (
    _PAD, StandardSecurityHandler, aes_cbc_decrypt, aes_cbc_decrypt_raw,
    aes_cbc_encrypt_raw, hash_r6, rc4)
from scribe_js_ray.stages.pdf.objects import PdfFile
from scribe_js_ray.model import page_text
from scribe_js_ray.stages.layout import analyze_layout


def test_rc4_vectors():
    # published RC4 test vectors
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    # involution
    assert rc4(b"k", rc4(b"k", b"payload")) == b"payload"


def test_aes_block_vectors():
    # FIPS-197 appendix C.1 (AES-128), both directions
    from scribe_js_ray.stages.pdf.crypto import (
        _aes_decrypt_block, _aes_encrypt_block, _expand_key)
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    w, nr = _expand_key(key)
    assert _aes_decrypt_block(ct, w, nr) == pt
    assert _aes_encrypt_block(pt, w, nr) == ct
    # FIPS-197 C.3 (AES-256)
    key256 = bytes(range(32))
    ct256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    w2, nr2 = _expand_key(key256)
    assert _aes_encrypt_block(pt, w2, nr2) == ct256
    assert _aes_decrypt_block(ct256, w2, nr2) == pt


def test_aes_cbc_raw_roundtrip():
    key, iv = bytes(range(32)), bytes(range(16, 32))
    data = bytes(range(256)) * 2  # 512 bytes, 16-aligned
    ct = aes_cbc_encrypt_raw(key, iv, data)
    assert ct != data
    assert aes_cbc_decrypt_raw(key, iv, ct) == data


# ---------------------------------------------------------------------------
# fixture encryptors: re-parse the synthetic writer's object blocks,
# encrypt stream payloads AND literal strings (the reference decrypts
# both — objectCache.js decryptStringBytes), rebuild xref + trailer.

_OBJ_PAT = re.compile(rb"(\d+) (\d+) obj\n?([\s\S]*?)\nendobj\n")
_STR_PAT = re.compile(rb"\((?:[^\\()]|\\.)*\)")


def _unesc(raw: bytes) -> bytes:
    return re.sub(rb"\\([\\()])", rb"\1", raw[1:-1])


def _transform_pdf(data: bytes, enc_stream, enc_string,
                   enc_dict: bytes, id_part: bytes,
                   indirect: bool = True) -> bytes:
    """Rebuild a synthetic PDF, transforming each object's stream payload
    and literal strings with the provided per-object encryptors.

    The encryption dictionary is written as an INDIRECT object with a
    trailer ``/Encrypt N 0 R`` reference — the only form the reference
    honors (pdfCrypto.js findEncryptRef :843 requires the ``N G R``
    suffix) and the form every real-world writer emits.  The Encrypt
    dict's own strings stay plaintext per spec.  ``indirect=False``
    keeps the dict inline in the trailer to exercise the
    ignored-encryption path (both engines then export blank)."""
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for m in _OBJ_PAT.finditer(data):
        num, gen, body = int(m.group(1)), int(m.group(2)), m.group(3)
        sm = re.search(rb"stream\r?\n([\s\S]*?)\nendstream", body)
        if sm:
            head, payload = body[:sm.start()], sm.group(1)
            payload = enc_stream(num, gen, payload)
            head = re.sub(rb"/Length \d+",
                          b"/Length %d" % len(payload), head)
            head = _STR_PAT.sub(
                lambda s: b"<%s>" % enc_string(
                    num, gen, _unesc(s.group(0))).hex().encode(), head)
            body = head + b"stream\n" + payload + b"\nendstream"
        else:
            body = _STR_PAT.sub(
                lambda s: b"<%s>" % enc_string(
                    num, gen, _unesc(s.group(0))).hex().encode(), body)
        offsets[num] = len(out)
        out += b"%d %d obj\n" % (num, gen) + body + b"\nendobj\n"
    if indirect:
        enc_num = max(offsets) + 1
        offsets[enc_num] = len(out)
        out += b"%d 0 obj\n" % enc_num + enc_dict + b"\nendobj\n"
        enc_entry = b"/Encrypt %d 0 R " % enc_num
    else:
        enc_entry = b"/Encrypt " + enc_dict + b" "
    xref_pos = len(out)
    maxn = max(offsets) + 1
    out += b"xref\n0 %d\n" % maxn + b"0000000000 65535 f \n"
    for i in range(1, maxn):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (b"trailer\n<< /Size %d /Root 1 0 R " % maxn + enc_entry
            + id_part + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


def rc4_material():
    """(enc_fn, enc_dict, id_part) for R3 128-bit RC4 with empty
    passwords — shared by the classic fixture encryptor below and the
    modern-structure repacker (synth_pdf.repack_modern encrypt=)."""
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

    enc = lambda num, gen, b: rc4(obj_key(num, gen), b)
    enc_dict = (f"<< /Filter /Standard /V 2 /R 3 /Length 128 "
                f"/P {p} /O <{o_val.hex()}> /U <{bytes(32).hex()}> >>"
                ).encode()
    id_part = f"/ID [<{doc_id.hex()}> <{doc_id.hex()}>]".encode()
    return enc, enc_dict, id_part


def _encrypt_pdf_rc4(data: bytes, indirect: bool = True) -> bytes:
    """RC4-encrypt (R3, 128-bit, empty passwords) streams AND strings."""
    enc, enc_dict, id_part = rc4_material()
    return _transform_pdf(data, enc, enc, enc_dict, id_part,
                          indirect=indirect)


def _encrypt_pdf_aes256(data: bytes, r: int = 6) -> bytes:
    """AES-256-encrypt (V5 R5/R6, empty passwords): /U from the
    validation salt, /UE wrapping a fixed file key."""
    file_key = hashlib.sha256(b"fixture-file-key").digest()
    vsalt, ksalt = b"VSALT##1", b"KSALT##2"
    if r == 6:
        u_hash = hash_r6(b"", vsalt)
        ikey = hash_r6(b"", ksalt)
    else:
        u_hash = hashlib.sha256(vsalt).digest()
        ikey = hashlib.sha256(ksalt).digest()
    u_val = u_hash + vsalt + ksalt
    ue_val = aes_cbc_encrypt_raw(ikey, bytes(16), file_key)
    # /O and /OE are not consulted by the empty-user-password path;
    # fill with plausible 48/32-byte values.
    o_val = hashlib.sha512(b"owner").digest()[:48]
    oe_val = bytes(32)

    iv = bytes(range(16))

    def enc(num, gen, b):
        pad = 16 - len(b) % 16
        return iv + aes_cbc_encrypt_raw(file_key, iv, b + bytes([pad]) * pad)

    enc_dict = (
        f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P -44 "
        f"/O <{o_val.hex()}> /U <{u_val.hex()}> "
        f"/OE <{oe_val.hex()}> /UE <{ue_val.hex()}> >>").encode()
    id_part = f"/ID [<{bytes(16).hex()}> <{bytes(16).hex()}>]".encode()
    return _transform_pdf(data, enc, enc, enc_dict, id_part)


def aesv2_material():
    """(enc_fn, enc_dict, id_part) for V4 R4 /AESV2 with empty
    passwords — RC4-style Algorithm 2 file key + the AES 'sAlT'
    object-key suffix, per-object deterministic IV prefix."""
    doc_id = b"\x01\x23\x45\x67\x89\xab\xcd\xef" * 2
    p = -44
    h = hashlib.md5(_PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:16]
    o_val = rc4(okey, _PAD)
    for i in range(1, 20):
        step = bytes(b ^ i for b in okey)
        o_val = rc4(step, o_val)
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
                                (gen >> 8) & 0xFF]) + b"sAlT"
        return hashlib.md5(ext).digest()[:16]

    def enc(num, gen, b):
        iv = hashlib.md5(b"iv%d:%d" % (num, gen)).digest()
        pad = 16 - len(b) % 16
        return iv + aes_cbc_encrypt_raw(obj_key(num, gen), iv,
                                        b + bytes([pad]) * pad)

    enc_dict = (f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                f"/StmF /StdCF /StrF /StdCF /P {p} "
                f"/O <{o_val.hex()}> /U <{bytes(32).hex()}> >>").encode()
    id_part = f"/ID [<{doc_id.hex()}> <{doc_id.hex()}>]".encode()
    return enc, enc_dict, id_part


def _encrypt_pdf_aesv2(data: bytes) -> bytes:
    """AES-128-CBC encrypt (V4 R4 /CFM /AESV2, empty passwords)."""
    enc, enc_dict, id_part = aesv2_material()
    return _transform_pdf(data, enc, enc, enc_dict, id_part)


def _sample_pdf() -> bytes:
    ts = _Typesetter()
    ts.line("Secret content line one", font="F1")
    ts.line("And a second line", font="F1")
    return _make_pdf([ts.stream()], {"F1": "Helvetica"})


def _sample_pdf_with_field(value="Hidden Field Payload") -> bytes:
    """A page whose extracted text also pulls from a STRING object (a
    text form-field /V) — exercises string decryption, not just streams."""
    ts = _Typesetter()
    ts.line("Label:", font="F1")
    stream = ts.stream().encode("latin-1")
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")                        # 1
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")                # 2
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
          b"/Annots [6 0 R] >>")                                       # 3
    w.add(b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
          + stream + b"\nendstream")                                   # 4
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/Encoding /WinAnsiEncoding >>")                            # 5
    w.add(f"<< /Type /Annot /Subtype /Widget /FT /Tx /T (fld) "
          f"/V ({value}) /F 0 /Ff 0 "
          f"/Rect [150 600 400 620] >>".encode())                      # 6
    return w.build()


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


def test_encrypted_string_objects_decrypted():
    """Form-field /V is a string object; its bytes must decrypt before
    lift_field_values typesets them (ADVICE r1: previously mojibake)."""
    plain = _sample_pdf_with_field()
    pages_plain, _ = parse_pdf_document(plain)
    analyze_layout(pages_plain)
    plain_text = page_text(pages_plain[0])
    assert "Hidden Field Payload" in plain_text

    enc = _encrypt_pdf_rc4(plain)
    assert b"Hidden Field Payload" not in enc  # string truly encrypted
    pages_enc, _ = parse_pdf_document(enc)
    analyze_layout(pages_enc)
    assert page_text(pages_enc[0]) == plain_text


def test_aes256_r6_pdf_extracts_text():
    plain = _sample_pdf_with_field()
    pages_plain, _ = parse_pdf_document(plain)
    analyze_layout(pages_plain)
    plain_text = page_text(pages_plain[0])

    enc = _encrypt_pdf_aes256(plain, r=6)
    assert b"Secret" not in enc and b"Hidden Field Payload" not in enc
    pdf = PdfFile(enc)
    assert pdf.crypt is not None and pdf.crypt.cfm == "AESV3"
    assert pdf.crypt.key_len == 32
    pages_enc, _ = parse_pdf_document(enc)
    analyze_layout(pages_enc)
    assert page_text(pages_enc[0]) == plain_text


def test_aes256_r5_pdf_extracts_text():
    plain = _sample_pdf()
    pages_plain, _ = parse_pdf_document(plain)
    plain_text = page_text(pages_plain[0])

    enc = _encrypt_pdf_aes256(plain, r=5)
    pages_enc, _ = parse_pdf_document(enc)
    assert page_text(pages_enc[0]) == plain_text


def test_wrong_password_rejected():
    import pytest
    # /U validation hash that matches no password → ValueError, which the
    # pipeline catches into the per-row error column.
    bad_u = bytes(32) + b"VSALT##1" + b"KSALT##2"
    with pytest.raises(ValueError):
        StandardSecurityHandler(
            {"V": 5, "R": 6, "O": b"x" * 48, "U": bad_u, "UE": bytes(32),
             "P": -44}, b"")
