"""Minimal pure-Python AES (FIPS-197) + CBC mode, stdlib-only.

Exists because encrypted-PDF support (xkit/pdfmini.py) needs AES-128
(/V 4 AESV2 crypt filters) and AES-256 (/V 5, plus the R6 hardened
password hash which runs AES-128-CBC inside its loop) and the sandbox
ships no cipher library. Straightforward byte-oriented implementation
— xtime-based MixColumns, no lookup-table cache — correct and fast
enough for dialect-fixture sizes; a corpus-scale encrypted-PDF path
would swap in a C cipher behind the same three functions.

Verified against the FIPS-197 appendix C vectors (tests/test_pdfmini).
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


def _add_round_key(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _shift_rows(s: bytearray, inv: bool = False) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        k = (-r) % 4 if inv else r
        row = row[k:] + row[:k]
        for c in range(4):
            s[r + 4 * c] = row[c]


def _mix_columns(s: bytearray, inv: bool = False) -> None:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            s[4 * c + r] = (
                _mul(col[0], m[(0 - r) % 4])
                ^ _mul(col[1], m[(1 - r) % 4])
                ^ _mul(col[2], m[(2 - r) % 4])
                ^ _mul(col[3], m[(3 - r) % 4])
            )


def encrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, key_schedule[0])
    for rnd in range(1, len(key_schedule) - 1):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s)
        _mix_columns(s)
        _add_round_key(s, key_schedule[rnd])
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s)
    _add_round_key(s, key_schedule[-1])
    return bytes(s)


def decrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_round_key(s, key_schedule[-1])
    for rnd in range(len(key_schedule) - 2, 0, -1):
        _shift_rows(s, inv=True)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_round_key(s, key_schedule[rnd])
        _mix_columns(s, inv=True)
    _shift_rows(s, inv=True)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    _add_round_key(s, key_schedule[0])
    return bytes(s)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt; ``data`` must already be a multiple of 16 bytes
    (PDF uses PKCS#7 padding — the caller appends it)."""
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off : off + 16], prev))
        prev = encrypt_block(ks, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt of block-aligned ``data`` (no padding removal)."""
    if len(data) % 16:
        raise ValueError("CBC data must be block-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(ks, blk), prev))
        prev = blk
    return bytes(out)
