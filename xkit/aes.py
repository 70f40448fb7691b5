"""Minimal pure-Python AES (FIPS-197) + CBC mode, stdlib-only.

Exists because encrypted-PDF support (xkit/pdfmini.py) needs AES-128
(/V 4 AESV2 crypt filters) and AES-256 (/V 5, plus the R6 hardened
password hash which runs AES-128-CBC inside its loop) and the sandbox
ships no cipher library. Round-5: the byte-oriented MixColumns walk
was replaced by the standard 32-bit T-table construction (SubBytes +
ShiftRows + MixColumns fused into four 256-entry word tables; the
decryption side uses the equivalent inverse cipher with
InvMixColumns-transformed round keys) — ~15× per block, which is what
makes wrong-password attempts against /R 6 documents (three hardened
2.B hashes each) and corpus-scale AES stream decryption tolerable
without a C cipher. A production deployment would still swap in a
native cipher behind the same three functions.

Verified against the FIPS-197 appendix C vectors (tests/test_pdfmini)
and property-tested CBC round-trips.
"""

from __future__ import annotations

__all__ = ["aes_cbc_decrypt", "aes_cbc_encrypt", "encrypt_block", "decrypt_block"]


def _make_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse in GF(2^8) via exp/log tables (generator 3)
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _make_sbox()


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _make_tables():
    """The classic fused word tables. Encryption: column word
    contribution of the row-r input byte x is MixColumns-matrix column
    r applied to S[x]. Decryption tables fuse InvSubBytes with
    InvMixColumns the same way; ``cmix`` applies plain InvMixColumns
    to a word (for the equivalent-inverse-cipher round keys) via
    Td[S[x]] — the S∘InvS pair cancels."""
    te = [[0] * 256 for _ in range(4)]
    td = [[0] * 256 for _ in range(4)]
    enc_m = (2, 1, 1, 3)  # MixColumns matrix column 0, rows 0..3
    dec_m = (14, 9, 13, 11)  # InvMixColumns matrix column 0
    for x in range(256):
        s, si = _SBOX[x], _INV_SBOX[x]
        for r in range(4):
            # matrix column r is column 0 rotated DOWN by r
            w = 0
            wi = 0
            for row in range(4):
                w = (w << 8) | _mul(s, enc_m[(row - r) % 4])
                wi = (wi << 8) | _mul(si, dec_m[(row - r) % 4])
            te[r][x] = w
            td[r][x] = wi
    return te, td


(_TE0, _TE1, _TE2, _TE3), (_TD0, _TD1, _TD2, _TD3) = _make_tables()


def _inv_mix_word(w: int) -> int:
    return (
        _TD0[_SBOX[(w >> 24) & 255]]
        ^ _TD1[_SBOX[(w >> 16) & 255]]
        ^ _TD2[_SBOX[(w >> 8) & 255]]
        ^ _TD3[_SBOX[w & 255]]
    )


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes((t[0] ^ rcon,)) + t[1:]
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _enc_words(ks: list[bytes]) -> list[list[int]]:
    return [
        [int.from_bytes(rk[i : i + 4], "big") for i in (0, 4, 8, 12)] for rk in ks
    ]


def _dec_words(ks: list[bytes]) -> list[list[int]]:
    """Equivalent-inverse-cipher key schedule: last round key first,
    InvMixColumns applied to every middle one."""
    ew = _enc_words(ks)
    return (
        [ew[-1]]
        + [[_inv_mix_word(w) for w in rk] for rk in ew[-2:0:-1]]
        + [ew[0]]
    )


def _encrypt_int(rkw: list[list[int]], x: int) -> int:
    rk = rkw[0]
    w0 = ((x >> 96) & 0xFFFFFFFF) ^ rk[0]
    w1 = ((x >> 64) & 0xFFFFFFFF) ^ rk[1]
    w2 = ((x >> 32) & 0xFFFFFFFF) ^ rk[2]
    w3 = (x & 0xFFFFFFFF) ^ rk[3]
    T0, T1, T2, T3 = _TE0, _TE1, _TE2, _TE3
    for rk in rkw[1:-1]:
        n0 = T0[w0 >> 24] ^ T1[(w1 >> 16) & 255] ^ T2[(w2 >> 8) & 255] ^ T3[w3 & 255] ^ rk[0]
        n1 = T0[w1 >> 24] ^ T1[(w2 >> 16) & 255] ^ T2[(w3 >> 8) & 255] ^ T3[w0 & 255] ^ rk[1]
        n2 = T0[w2 >> 24] ^ T1[(w3 >> 16) & 255] ^ T2[(w0 >> 8) & 255] ^ T3[w1 & 255] ^ rk[2]
        n3 = T0[w3 >> 24] ^ T1[(w0 >> 16) & 255] ^ T2[(w1 >> 8) & 255] ^ T3[w2 & 255] ^ rk[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    rk = rkw[-1]
    S = _SBOX
    n0 = (S[w0 >> 24] << 24) ^ (S[(w1 >> 16) & 255] << 16) ^ (S[(w2 >> 8) & 255] << 8) ^ S[w3 & 255] ^ rk[0]
    n1 = (S[w1 >> 24] << 24) ^ (S[(w2 >> 16) & 255] << 16) ^ (S[(w3 >> 8) & 255] << 8) ^ S[w0 & 255] ^ rk[1]
    n2 = (S[w2 >> 24] << 24) ^ (S[(w3 >> 16) & 255] << 16) ^ (S[(w0 >> 8) & 255] << 8) ^ S[w1 & 255] ^ rk[2]
    n3 = (S[w3 >> 24] << 24) ^ (S[(w0 >> 16) & 255] << 16) ^ (S[(w1 >> 8) & 255] << 8) ^ S[w2 & 255] ^ rk[3]
    return (n0 << 96) | (n1 << 64) | (n2 << 32) | n3


def _decrypt_int(dkw: list[list[int]], x: int) -> int:
    rk = dkw[0]
    w0 = ((x >> 96) & 0xFFFFFFFF) ^ rk[0]
    w1 = ((x >> 64) & 0xFFFFFFFF) ^ rk[1]
    w2 = ((x >> 32) & 0xFFFFFFFF) ^ rk[2]
    w3 = (x & 0xFFFFFFFF) ^ rk[3]
    D0, D1, D2, D3 = _TD0, _TD1, _TD2, _TD3
    for rk in dkw[1:-1]:
        n0 = D0[w0 >> 24] ^ D1[(w3 >> 16) & 255] ^ D2[(w2 >> 8) & 255] ^ D3[w1 & 255] ^ rk[0]
        n1 = D0[w1 >> 24] ^ D1[(w0 >> 16) & 255] ^ D2[(w3 >> 8) & 255] ^ D3[w2 & 255] ^ rk[1]
        n2 = D0[w2 >> 24] ^ D1[(w1 >> 16) & 255] ^ D2[(w0 >> 8) & 255] ^ D3[w3 & 255] ^ rk[2]
        n3 = D0[w3 >> 24] ^ D1[(w2 >> 16) & 255] ^ D2[(w1 >> 8) & 255] ^ D3[w0 & 255] ^ rk[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    rk = dkw[-1]
    IS = _INV_SBOX
    n0 = (IS[w0 >> 24] << 24) ^ (IS[(w3 >> 16) & 255] << 16) ^ (IS[(w2 >> 8) & 255] << 8) ^ IS[w1 & 255] ^ rk[0]
    n1 = (IS[w1 >> 24] << 24) ^ (IS[(w0 >> 16) & 255] << 16) ^ (IS[(w3 >> 8) & 255] << 8) ^ IS[w2 & 255] ^ rk[1]
    n2 = (IS[w2 >> 24] << 24) ^ (IS[(w1 >> 16) & 255] << 16) ^ (IS[(w0 >> 8) & 255] << 8) ^ IS[w3 & 255] ^ rk[2]
    n3 = (IS[w3 >> 24] << 24) ^ (IS[(w2 >> 16) & 255] << 16) ^ (IS[(w1 >> 8) & 255] << 8) ^ IS[w0 & 255] ^ rk[3]
    return (n0 << 96) | (n1 << 64) | (n2 << 32) | n3


def encrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    return _encrypt_int(
        _enc_words(key_schedule), int.from_bytes(block, "big")
    ).to_bytes(16, "big")


def decrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    return _decrypt_int(
        _dec_words(key_schedule), int.from_bytes(block, "big")
    ).to_bytes(16, "big")


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt; ``data`` must already be a multiple of 16 bytes
    (PDF uses PKCS#7 padding — the caller appends it)."""
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    rkw = _enc_words(_expand_key(key))
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for off in range(0, len(data), 16):
        prev = _encrypt_int(
            rkw, int.from_bytes(data[off : off + 16], "big") ^ prev
        )
        out += prev.to_bytes(16, "big")
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt of block-aligned ``data`` (no padding removal)."""
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    dkw = _dec_words(_expand_key(key))
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for off in range(0, len(data), 16):
        blk = int.from_bytes(data[off : off + 16], "big")
        out += (_decrypt_int(dkw, blk) ^ prev).to_bytes(16, "big")
        prev = blk
    return bytes(out)
