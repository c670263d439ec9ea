"""Encrypted-PDF support: standard security handler (SURVEY §2 M4).

Reference: /root/reference/js/pdf/pdfCrypto.js:29-960 (RC4/AES/MD5 and the
per-object key schedule).  Implemented from the public PDF 1.7 spec
(ISO 32000-1 §7.6.3):

* Algorithm 2 — file key from the padded password, /O, /P, first doc ID
  (+R≥3 iteration and /EncryptMetadata handling).
* Algorithm 1 — per-object key: file key + objnum(3 LE) + gen(2 LE)
  (+ b"sAlT" for AESV2), MD5, truncated to len+5 (max 16).
* RC4 (V=1/2 and V=4 with /V2 crypt filter) in pure Python.
* AES-128-CBC (V=4 /AESV2) in pure Python (decrypt-only, IV = first 16
  bytes, PKCS#7 padding stripped).
* AES-256 (V=5, R=5/6, /AESV3) per ISO 32000-2 §7.6.4: Algorithm 2.A
  (file key from /U key salt + /UE) with the R6 iterated hash
  (Algorithm 2.B — AES-128-CBC-encrypt rounds + SHA-256/384/512
  selection).  R5/R6 use the file key directly for every object (no
  per-object key schedule).

Only an EMPTY user password is attempted (the batch-extraction
contract: per-row failures land in the error column, never prompt).
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# pure-Python AES (decrypt-only, 128/192/256 keys, CBC)

_SBOX = None
_INV_SBOX = None


def _build_sboxes():
    global _SBOX, _INV_SBOX
    if _SBOX is not None:
        return
    sbox = [0] * 256
    p = q = 1
    sbox[0] = 0x63
    # generate via multiplicative inverse in GF(2^8)
    for _ in range(255):
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) ^ \
            ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    _SBOX = sbox
    _INV_SBOX = inv


def _xtime(a):
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _gmul(a, b):
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _expand_key(key: bytes):
    _build_sboxes()
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        temp = list(w[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            temp = [_SBOX[b] for b in temp]
        w.append([w[i - nk][j] ^ temp[j] for j in range(4)])
    return w, nr


def _aes_decrypt_block(block: bytes, w, nr) -> bytes:
    state = [list(block[i::4]) for i in range(4)]  # column-major

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                state[r][c] ^= w[4 * rnd + c][r]

    def inv_shift_rows():
        for r in range(1, 4):
            state[r] = state[r][-r:] + state[r][:-r]

    def inv_sub_bytes():
        for r in range(4):
            for c in range(4):
                state[r][c] = _INV_SBOX[state[r][c]]

    def inv_mix_columns():
        for c in range(4):
            a = [state[r][c] for r in range(4)]
            state[0][c] = _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ \
                _gmul(a[2], 13) ^ _gmul(a[3], 9)
            state[1][c] = _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ \
                _gmul(a[2], 11) ^ _gmul(a[3], 13)
            state[2][c] = _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ \
                _gmul(a[2], 14) ^ _gmul(a[3], 11)
            state[3][c] = _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ \
                _gmul(a[2], 9) ^ _gmul(a[3], 14)

    add_round_key(nr)
    for rnd in range(nr - 1, 0, -1):
        inv_shift_rows()
        inv_sub_bytes()
        add_round_key(rnd)
        inv_mix_columns()
    inv_shift_rows()
    inv_sub_bytes()
    add_round_key(0)
    return bytes(state[r][c] for c in range(4) for r in range(4))


# Encryption uses the classic T-table formulation (one 32-bit word per
# column, ShiftRows+SubBytes+MixColumns fused into 4 table lookups) —
# the R6 password hash (Algorithm 2.B) CBC-encrypts ~hundreds of KB, so
# the naive byte-matrix path is too slow in pure Python.
_TE = None


def _build_te():
    global _TE
    if _TE is not None:
        return
    _build_sboxes()
    te0, te1, te2, te3 = [0] * 256, [0] * 256, [0] * 256, [0] * 256
    for x in range(256):
        s = _SBOX[x]
        s2, s3 = _gmul(s, 2), _gmul(s, 3)
        te0[x] = (s2 << 24) | (s << 16) | (s << 8) | s3
        te1[x] = (s3 << 24) | (s2 << 16) | (s << 8) | s
        te2[x] = (s << 24) | (s3 << 16) | (s2 << 8) | s
        te3[x] = (s << 24) | (s << 16) | (s3 << 8) | s2
    _TE = (te0, te1, te2, te3)


def _words(w):
    return [(a << 24) | (b << 16) | (c << 8) | d for a, b, c, d in w]


def _aes_encrypt_words(s0, s1, s2, s3, rk, nr):
    te0, te1, te2, te3 = _TE
    s0 ^= rk[0]
    s1 ^= rk[1]
    s2 ^= rk[2]
    s3 ^= rk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = te0[s0 >> 24] ^ te1[(s1 >> 16) & 255] ^ \
            te2[(s2 >> 8) & 255] ^ te3[s3 & 255] ^ rk[k]
        t1 = te0[s1 >> 24] ^ te1[(s2 >> 16) & 255] ^ \
            te2[(s3 >> 8) & 255] ^ te3[s0 & 255] ^ rk[k + 1]
        t2 = te0[s2 >> 24] ^ te1[(s3 >> 16) & 255] ^ \
            te2[(s0 >> 8) & 255] ^ te3[s1 & 255] ^ rk[k + 2]
        t3 = te0[s3 >> 24] ^ te1[(s0 >> 16) & 255] ^ \
            te2[(s1 >> 8) & 255] ^ te3[s2 & 255] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _SBOX
    r0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16) |
          (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ rk[k]
    r1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16) |
          (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ rk[k + 1]
    r2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16) |
          (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ rk[k + 2]
    r3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16) |
          (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ rk[k + 3]
    return r0, r1, r2, r3


def _aes_encrypt_block(block: bytes, w, nr) -> bytes:
    _build_te()
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    r = _aes_encrypt_words(s0, s1, s2, s3, _words(w), nr)
    return struct.pack(">4I", *r)


def aes_cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC-encrypt without padding (len(data) must be a multiple of 16).

    Used by the R6 Algorithm-2.B hash and by the test-fixture encryptor;
    the IV is NOT prepended to the output."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt_raw needs 16-byte-aligned data")
    _build_te()
    w, nr = _expand_key(key)
    rk = _words(w)
    out = bytearray()
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    unpack, pack = struct.unpack_from, struct.pack
    for off in range(0, len(data), 16):
        d0, d1, d2, d3 = unpack(">4I", data, off)
        p0, p1, p2, p3 = _aes_encrypt_words(
            d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3, rk, nr)
        out += pack(">4I", p0, p1, p2, p3)
    return bytes(out)


def aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC-decrypt without padding removal (IV passed explicitly)."""
    if len(data) % 16 or not data:
        return b""
    w, nr = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        block = data[off:off + 16]
        plain = _aes_decrypt_block(block, w, nr)
        out.extend(bytes(a ^ b for a, b in zip(plain, prev)))
        prev = block
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """data = IV || ciphertext; strips PKCS#7 padding."""
    if len(data) < 32 or len(data) % 16:
        return b""
    w, nr = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for off in range(16, len(data), 16):
        block = data[off:off + 16]
        plain = _aes_decrypt_block(block, w, nr)
        out.extend(bytes(a ^ b for a, b in zip(plain, prev)))
        prev = block
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


# ---------------------------------------------------------------------------


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated password hash.

    Rounds of AES-128-CBC-encrypt over 64 repetitions of
    (password||K||udata), with the digest function for the next round
    chosen by the encrypted output mod 3; terminates when at least 64
    rounds have run and the last byte of E is <= round - 32."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_raw(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardSecurityHandler:
    """PDF standard security handler, empty user password only."""

    def __init__(self, encrypt: dict, first_id: bytes, resolve=None):
        resolve = resolve or (lambda x: x)
        self.v = int(resolve(encrypt.get("V")) or 0)
        self.r = int(resolve(encrypt.get("R")) or 2)
        if self.r >= 5:
            # AES-256 (ISO 32000-2 §7.6.4): recover the file key from the
            # empty user password via /U (48 bytes: hash ||
            # validation-salt || key-salt) and /UE.
            u = resolve(encrypt.get("U"))
            ue = resolve(encrypt.get("UE"))
            u_bytes = u if isinstance(u, (bytes, bytearray)) else b""
            ue_bytes = ue if isinstance(ue, (bytes, bytearray)) else b""
            if len(u_bytes) < 48 or len(ue_bytes) < 32:
                raise ValueError("R%d /U or /UE missing/short" % self.r)
            vsalt, ksalt = u_bytes[32:40], u_bytes[40:48]
            if self.r == 5:  # deprecated Adobe ExtensionLevel 3 variant
                check = hashlib.sha256(vsalt).digest()
                ikey = hashlib.sha256(ksalt).digest()
            else:
                check = hash_r6(b"", vsalt)
                ikey = hash_r6(b"", ksalt)
            if check != u_bytes[:32]:
                raise ValueError("empty user password rejected (R%d)"
                                 % self.r)
            self.key = aes_cbc_decrypt_raw(ikey, bytes(16), ue_bytes[:32])
            self.key_len = 32
            self.cfm = "AESV3"
            self.encrypt_metadata = True
            return
        length = int(resolve(encrypt.get("Length")) or 40)
        self.key_len = length // 8
        o = resolve(encrypt.get("O"))
        p = int(resolve(encrypt.get("P")) or -1)
        self.encrypt_metadata = resolve(
            encrypt.get("EncryptMetadata"))
        if self.encrypt_metadata is None:
            self.encrypt_metadata = True
        o_bytes = o if isinstance(o, (bytes, bytearray)) else \
            str(o or "").encode("latin-1")

        self.cfm = "V2"  # RC4 default
        if self.v == 4:
            cf = resolve(encrypt.get("CF")) or {}
            stmf = str(resolve(encrypt.get("StmF")) or "Identity")
            f = resolve(cf.get(stmf)) or {}
            self.cfm = str(resolve(f.get("CFM")) or "Identity")
            flen = resolve(f.get("Length"))
            if flen:
                flen = int(flen)
                self.key_len = flen if flen > 40 // 8 else flen  # bytes or bits
                if self.key_len > 32:
                    self.key_len //= 8

        # Algorithm 2: file encryption key from the (empty) user password
        md = hashlib.md5()
        md.update(_PAD)  # empty password → pad only
        md.update(o_bytes[:32])
        md.update(struct.pack("<i", p))
        md.update(first_id or b"")
        if self.r >= 4 and not self.encrypt_metadata:
            md.update(b"\xff\xff\xff\xff")
        key = md.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:self.key_len]).digest()
            self.key = key[:self.key_len]
        else:
            self.key = key[:5]

    def object_key(self, num: int, gen: int) -> bytes:
        if self.cfm == "AESV3":  # R5/R6: file key used directly
            return self.key
        ext = self.key + bytes([num & 0xFF, (num >> 8) & 0xFF,
                                (num >> 16) & 0xFF,
                                gen & 0xFF, (gen >> 8) & 0xFF])
        if self.cfm == "AESV2":
            ext += b"sAlT"
        digest = hashlib.md5(ext).digest()
        return digest[:min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int = 0) -> bytes:
        if self.cfm == "Identity":
            return data
        key = self.object_key(num, gen)
        if self.cfm in ("AESV2", "AESV3"):
            return aes_cbc_decrypt(key, data)
        return rc4(key, data)
