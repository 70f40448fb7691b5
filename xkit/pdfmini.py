"""Minimal fixture-dialect PDF text extraction (SURVEY.md A26).

The north rule requires "PDF/layout parsing" in the pipeline
(BASELINE.json north_star); no PDF library exists in this sandbox
(SURVEY.md §0), so this module implements a from-scratch extractor
for a *documented dialect subset* co-designed with the fixture
generator (:func:`make_fixture_pdf`, FIXTURES.md §6):

* uncompressed streams, plus ``/Filter`` chains of **FlateDecode**
  (stdlib zlib — the filter covering the vast majority of real-world
  PDF content streams), **ASCIIHexDecode**, and **ASCII85Decode**
  (stdlib base64.a85decode; PDF framing: optional ``~>`` terminator,
  whitespace ignored, ``z`` zero-group shortcut) — applied in array
  order, e.g. ``[/ASCII85Decode /FlateDecode]``; a stream with any
  UNKNOWN filter in its chain is skipped, never mis-decoded,
* classic **xref tables** + trailer: pages are discovered by walking
  trailer ``/Root`` → catalog ``/Pages`` → ``/Kids`` → page
  ``/Contents`` (single ref OR array — multiple content streams per
  page concatenate into one stream, so a ``BT`` may open in one and
  close in the next), with incremental-update sections later in the
  file overriding earlier offsets. Streams not reachable from the page
  tree (fonts, images) are SKIPPED. When no usable xref/trailer exists
  the extractor falls back to scanning every stream in byte order.
* content streams using ``BT``/``ET`` text objects with ``Tf``, ``Td``
  and the ``Tj`` / ``TJ`` (array form) / ``'`` / ``"``
  (move-and-show) show-text operators,
* strings in parenthesis form with ``\\(`` ``\\)`` ``\\\\``, named and
  octal escapes, plus ``<hex>`` string form (whitespace-tolerant, odd
  digit padded), WinAnsi/latin-1 bytes.

* **minimal /ToUnicode CMaps** for hex-string text: each page's
  ``/Resources /Font`` entries are followed to their ``/ToUnicode``
  streams; ``bfchar`` pairs and scalar + array-destination ``bfrange`` runs (UTF-16BE
  destinations) are parsed into one code→text map PER FONT NAME, with
  the code width taken from ``begincodespacerange``. The active font
  is tracked through ``Tf`` (round 4): each show-string decodes
  through the CURRENT font's map, so two fonts mapping the same code
  to different characters decode correctly; text before any ``Tf``
  (or under a name missing from the table) uses the page-union
  default, and ``q``/``Q`` save/restore of the text state is out of
  scope (documented — a ``Q`` never restores a previous ``Tf`` here).
  Hex strings on a CMapped page decode through the map (unmapped
  codes fall back to chr(code) below 256, U+FFFD above); pages
  without a CMap keep the latin-1 byte rule. Type0 COMPOSITE fonts
  (round 5): string codes are 2-byte CIDs — the width is forced to 2
  regardless of the ToUnicode codespacerange (real writers emit
  sloppy 1-byte ones), literal ``(…)`` strings pair their unescaped
  bytes into the same CID codes as hex strings, and a Type0 font with
  NO usable ToUnicode (Identity-keyed, predefined CMap, or indirect
  /Encoding) suppresses its strings entirely — bare glyph ids degrade
  to no text, never latin-1 mojibake. CID-keyed font PROGRAM tables
  (glyph data, CIDToGIDMap) remain out of scope: extraction needs
  code→text, not code→glyph.

* **xref STREAMS and object STREAMS** (PDF 1.5+): every object whose
  dict says ``/Type /XRef`` is decoded (its /Filter chain, then the
  ``/DecodeParms`` PNG predictor — None/Sub/Up/Average/Paeth — when
  present), its ``/W``-field binary entries parsed per ``/Index``
  sections; type-1 entries are byte offsets, type-2 entries locate
  objects inside ``/Type /ObjStm`` containers (header of ``/N``
  "objnum offset" pairs after ``/First``). Classic tables and xref
  streams compose (hybrid files); xref-stream entries override
  classic ones of the same object. Files where none of this parses
  still take the byte-order fallback (which also never sees CMaps —
  page↔font association needs the tree walk).

* **Standard-security decryption** (encrypted PDFs), all four handler
  generations. Round 5: non-empty USER and OWNER passwords — a
  caller-supplied password is tried as the user password, then as the
  owner password (algorithm 7: /O unwraps the padded user password
  for R 2–4; /O + /OE validate and unwrap the file key for R 5–6),
  then the empty user password (the common
  owner-locked-but-readable case keeps opening with no password):

  - ``/V 1|2`` + ``/R 2|3`` (40/128-bit RC4): file key per spec
    algorithm 2 (padded password, /O, /P, first /ID element; 50 MD5
    rounds for /R 3), validated against /U (algorithms 4/5) before
    use; per-object keys MD5(key + objnum₃ + gen₂).
  - ``/V 4`` + ``/R 4`` crypt filters: ``/CFM /AESV2`` = AES-128-CBC
    (per-object MD5 key with the ``sAlT`` suffix, IV-prefixed body,
    PKCS#7 strip), ``/CFM /V2`` = RC4 as above, ``/CFM /Identity`` =
    pass-through; unknown methods skip streams.
  - ``/V 5`` + ``/R 5|6`` (AES-256): the file key is unwrapped from
    ``/UE`` with the intermediate key from the key salt (``/U`` bytes
    32-48); /R 6 uses the hardened ISO 32000-2 algorithm 2.B hash
    (SHA-256/384/512 over AES-128-CBC rounds), /R 5 the deprecated
    plain SHA-256. Password validation against ``/U[:32]`` happens
    before any stream is touched.

  The AES core is xkit/aes.py — pure-Python FIPS-197 (T-table form),
  verified against the appendix C vectors. Failing every password
  attempt (/U, and /O when a password is supplied) or any unknown
  scheme degrades to skipped streams, never garbage output. Password
  strings are encoded UTF-8 (exact for /R 6; the spec's
  PDFDocEncoding for legacy revisions and SASLprep normalization are
  documented simplifications — pass bytes for exact control).

Out of scope, documented: full font CMaps (CID-keyed, embedded
program tables), the /Perms integrity check, sub-byte TIFF-predictor
layouts.
(``/EncryptMetadata false`` key derivation and byte-aligned TIFF
predictor 2 ARE handled.)

Layout rule (frozen by tests/golden/pdf_dialect.json): each ``BT…ET``
text object is one output block; ``Tj``/``TJ`` strings within it are
concatenated in stream order, separated by a single space per ``Td``
line move. Real-world PDFs outside this dialect yield no spans rather
than raising (A17 never-fail discipline); the limitation is
documented here and in FIXTURES.md.
"""

from __future__ import annotations

import hashlib
import re
import zlib

from xkit.aes import aes_cbc_decrypt, aes_cbc_encrypt

__all__ = [
    "extract_pdf_text",
    "make_fixture_pdf",
    "make_fixture_pdf_15",
    "make_fixture_pdf_encrypted",
    "make_fixture_pdf_two_fonts",
]

# no EOL requirement before `endstream`: a compressed body whose final
# byte happens to be 0x0D/0x0A would lose it to `\r?\n` and fail to
# inflate (~1/128 of FlateDecode streams, silently). Trailing EOL is
# stripped per-filter below instead.
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# One combined token scan per content stream: strings are matched FIRST
# so an operator-looking substring INSIDE a string ('GET' contains
# 'ET') can never terminate a text object — the old split-on-BT..ET
# approach silently lost such blocks.
_CONTENT_RE = re.compile(
    rb"""(?P<str>\((?P<body>(?:\\.|[^\\()])*)\))
      | (?P<hex><(?P<hexbody>[0-9A-Fa-f\s]*)>)
      | \b(?P<bt>BT)\b
      | \b(?P<et>ET)\b
      | \b(?P<tj>Tj)\b
      | \b(?P<TJ>TJ)\b
      | (?P<quote>['"])
      | (?P<td>-?[0-9.]+\s+-?[0-9.]+\s+Td)\b
      | (?P<tf>/(?P<tfname>[^\s/<>\[\]()]+)\s+-?[0-9.]+\s+Tf)\b
    """,
    re.VERBOSE | re.DOTALL,
)
# single left-to-right pass: octal, named escapes, escaped delimiters,
# and unknown \x (backslash dropped per the PDF rule) — sequential
# .replace() passes corrupted strings like (\\101), resolving the
# octal against an already-escaped backslash
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.DOTALL)
_NAMED_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t"}


def _unescape_pdf_bytes(body: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if len(g) > 1 or g in b"01234567":
            return bytes([int(g, 8) & 0xFF])
        return _NAMED_ESC.get(g, g)

    return _ESC_RE.sub(sub, body)


def _string_text(raw: bytes, cmap: dict | None, width: int) -> str:
    """Decode one shown string's raw bytes under the active font:
    ``width == 0`` is the CID-without-ToUnicode sentinel (the codes are
    glyph ids with no Unicode meaning — suppress rather than emit
    mojibake); no CMap keeps the latin-1 byte rule; otherwise width-byte
    codes map through the font's ToUnicode. Literal ``(...)`` and hex
    ``<...>`` strings share this rule — under a 2-byte (Identity-H)
    font a literal string's bytes pair into CIDs exactly like hex."""
    if width == 0:
        return ""
    if cmap is None:
        return raw.decode("latin-1", errors="replace")
    out = []
    # trailing partial code (len not a multiple of width) is dropped,
    # matching viewers' behavior on truncated CID strings
    for i in range(0, (len(raw) // width) * width, width):
        code = int.from_bytes(raw[i : i + width], "big")
        mapped = cmap.get(code)
        if mapped is None:
            mapped = chr(code) if code < 256 else "�"
        out.append(mapped)
    return "".join(out)


def _hex_string_text(hexbody: bytes, cmap: dict | None, width: int) -> str:
    """Decode one <hex> string (whitespace allowed, odd digit pads 0)."""
    h = re.sub(rb"\s+", b"", hexbody)
    if len(h) % 2:
        h += b"0"
    # h is pure hex by the regex class — fromhex cannot fail
    return _string_text(bytes.fromhex(h.decode("ascii")), cmap, width)


def _scan_content(
    body: bytes,
    blocks: list,
    cmap: dict | None = None,
    code_width: int = 2,
    fonts: dict | None = None,
) -> None:
    """Token-scan ONE (possibly concatenated) content stream, appending
    each non-empty BT…ET text object to ``blocks``. ``fonts`` maps
    normalized font names to per-font ``(cmap, width)``; a ``Tf``
    switches the active map (text-state is stream-global per the PDF
    graphics state — q/Q save/restore of the font is out of scope,
    documented). ``(cmap, code_width)`` is the page default, applied
    before any ``Tf`` and for names missing from the table."""
    in_bt = False
    parts: list[str] = []
    pending: list[str] = []  # strings seen since the last show op
    cur_cmap, cur_width = cmap, code_width
    for m in _CONTENT_RE.finditer(body):
        if m.group("str") is not None:
            if in_bt:
                pending.append(
                    _string_text(
                        _unescape_pdf_bytes(m.group("body")), cur_cmap, cur_width
                    )
                )
        elif m.group("hex") is not None:
            # <48656C6C6F> hex string form; whitespace allowed inside,
            # odd trailing digit pads with 0 (PDF spec rule)
            if in_bt:
                pending.append(
                    _hex_string_text(m.group("hexbody"), cur_cmap, cur_width)
                )
        elif m.group("tf"):
            # font switch applies inside AND outside BT (text state
            # persists across text objects)
            cur_cmap, cur_width = (fonts or {}).get(
                _pdf_name_key(m.group("tfname")), (cmap, code_width)
            )
        elif m.group("bt"):
            in_bt, parts, pending = True, [], []
        elif m.group("et"):
            if in_bt:
                text = "".join(parts).strip()
                if text:
                    blocks.append(text)
            in_bt = False
        elif not in_bt:
            continue
        elif m.group("tj") or m.group("TJ"):
            if pending:
                parts.append("".join(pending))
                pending = []
        elif m.group("quote"):
            # ' and " show-text operators: move to next line, then show
            # (T* + Tj); the line move becomes a space separator
            if pending:
                if parts and not parts[-1].endswith(" "):
                    parts.append(" ")
                parts.append("".join(pending))
                pending = []
        elif m.group("td"):
            if parts and not parts[-1].endswith(" "):
                parts.append(" ")


_FILTER_RE = re.compile(rb"/Filter\s*(?:\[(?P<arr>[^\]]*)\]|/(?P<one>\w+))")
_FILTER_NAME_RE = re.compile(rb"/(\w+)")


def _apply_filters(head: bytes, body: bytes) -> bytes | None:
    """Run the object dict's /Filter chain (array order) over a stream
    body. Supported: FlateDecode, ASCIIHexDecode, ASCII85Decode. Any
    unknown filter (or corrupt data) → None: the stream is skipped,
    never mis-decoded."""
    m = _FILTER_RE.search(head)
    if m is None:
        return body
    if m.group("arr") is not None:
        names = [f.group(1) for f in _FILTER_NAME_RE.finditer(m.group("arr"))]
    else:
        names = [m.group("one")]
    for name in names:
        if name == b"FlateDecode":
            try:
                # decompressobj tolerates the trailing EOL before
                # `endstream` as unused data (plain decompress raises)
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                return None
        elif name == b"ASCIIHexDecode":
            h = re.sub(rb"\s+", b"", body.split(b">", 1)[0])
            if len(h) % 2:
                h += b"0"
            try:
                body = bytes.fromhex(h.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                return None
        elif name == b"ASCII85Decode":
            import base64

            # PDF framing: optional ~> terminator, whitespace ignored
            try:
                body = base64.a85decode(
                    body.split(b"~>", 1)[0], ignorechars=b" \t\n\r\v\f"
                )
            except ValueError:
                return None
        else:
            return None
    return body


_DECODEPARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\s*<<([^>]*)>>")
_PARM_INT_RE = {
    k: re.compile(rb"/%s\s+(\d+)" % k)
    for k in (b"Predictor", b"Columns", b"Colors", b"BitsPerComponent")
}


def _png_predictor_undo(body: bytes, columns: int, colors: int, bits: int) -> bytes:
    """Undo PNG row filters (predictors 10-15): every row is one filter
    type byte + the filtered bytes; None/Sub/Up/Average/Paeth."""
    bpp = max(1, (colors * bits + 7) // 8)
    rowlen = (columns * colors * bits + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(body)
    while i < n:
        ft = body[i]
        i += 1
        row = bytearray(body[i : i + rowlen])
        i += rowlen
        if len(row) < rowlen:
            row.extend(bytes(rowlen - len(row)))
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        # ft == 0: None; unknown types pass through unfiltered
        out += row
        prev = row
    return bytes(out)


def _decode_stream(obj: bytes) -> bytes | None:
    """The stream body of one object slice, run through its /Filter
    chain and /DecodeParms predictor; None when absent, corrupt, or
    using an unknown filter."""
    m = _STREAM_RE.search(obj)
    if m is None:
        return None
    head = obj[: m.start()]
    body = _apply_filters(head, m.group(1))
    if body is None:
        return None
    dp = _DECODEPARMS_RE.search(head)
    if dp is not None:
        parms = {
            k.decode(): int(r.group(1)) if (r := rx.search(dp.group(1))) else None
            for k, rx in _PARM_INT_RE.items()
        }
        pred = parms["Predictor"] or 1
        if pred >= 10:
            body = _png_predictor_undo(
                body,
                parms["Columns"] or 1,
                parms["Colors"] or 1,
                parms["BitsPerComponent"] or 8,
            )
        elif pred == 2:
            body = _tiff_predictor_undo(
                body,
                parms["Columns"] or 1,
                parms["Colors"] or 1,
                parms["BitsPerComponent"] or 8,
            )
        elif pred != 1:
            return None  # unknown predictor: skip, not corrupt
    return body


def _tiff_predictor_undo(body: bytes, columns: int, colors: int, bits: int) -> bytes:
    """Undo TIFF predictor 2 (horizontal differencing): each sample is
    stored as the difference from the same-channel sample to its left,
    per row. Only the byte-aligned ``bits == 8`` layout is handled
    (the form real PDFs use); sub-byte layouts pass through."""
    if bits != 8:
        return body
    rowlen = columns * colors
    out = bytearray(body)
    for r0 in range(0, len(out) - rowlen + 1, rowlen):
        for j in range(colors, rowlen):
            out[r0 + j] = (out[r0 + j] + out[r0 + j - colors]) & 0xFF
    return bytes(out)


# Standard-security-handler decryption (encrypted PDFs).
# Scope: /Filter /Standard, EMPTY user password — the overwhelmingly
# common "owner-locked but world-readable" case — across all four
# generations: /V 1|2 + /R 2|3 (40/128-bit RC4), /V 4 + /R 4 (crypt
# filters: /CFM /AESV2 = AES-128-CBC per-object keys, /CFM /V2 = RC4,
# /CFM /Identity = pass-through), and /V 5 + /R 5|6 (AES-256 with the
# file key recovered from /UE; R6 uses the hardened 2.B hash, which
# runs AES-128-CBC inside its loop — xkit/aes.py, FIPS-197-verified).
# A failed /U check (real user password) or an unknown scheme degrades
# to skipped streams, never garbage. Per spec the xref stream and the
# /Encrypt dict itself are NOT encrypted; ObjStm members inherit their
# container's decryption.

_PDF_PAD = bytes(
    (
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    )
)
_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_ENC_INT_RE = {
    k: re.compile(rb"/%s\s+(-?\d+)" % k) for k in (b"V", b"R", b"P", b"Length")
}
_ENC_STR_RE = {
    k: re.compile(
        rb"/%s\s*(?:\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]*)>)" % k, re.DOTALL
    )
    for k in (b"O", b"U", b"UE", b"OE")
}
_CFM_RE = re.compile(rb"/CFM\s*/(\w+)")
_OCT_ESC_RE = re.compile(rb"\\([0-7]{1,3})")
_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Pure Python — fine at dialect-fixture
    sizes; a corpus-scale encrypted-PDF path would want a C cipher."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pdf_string_bytes(lit: bytes | None, hx: bytes | None) -> bytes | None:
    """Raw bytes of a PDF string: literal form with \\-escapes (named,
    octal, escaped delimiters) or hex form."""
    if hx is not None:
        h = re.sub(rb"\s+", b"", hx)
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii"))
        except (ValueError, UnicodeDecodeError):
            return None
    if lit is None:
        return None
    lit = _OCT_ESC_RE.sub(lambda m: bytes([int(m.group(1), 8) & 0xFF]), lit)
    for esc, raw in (
        (rb"\n", b"\n"), (rb"\r", b"\r"), (rb"\t", b"\t"), (rb"\b", b"\b"),
        (rb"\f", b"\f"), (rb"\(", b"("), (rb"\)", b")"), (rb"\\", b"\\"),
    ):
        lit = lit.replace(esc, raw)
    return lit


def _std_file_key(
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    user_pwd: bytes = b"",
    encrypt_metadata: bool = True,
) -> bytes:
    """Standard-handler algorithm 2: the file encryption key.
    ``/EncryptMetadata false`` (R ≥ 4) appends ffffffff to the hash
    input per spec step f."""
    pad_pwd = (user_pwd + _PDF_PAD)[:32]
    h = hashlib.md5(
        pad_pwd
        + o[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
        + (b"\xff\xff\xff\xff" if r >= 4 and not encrypt_metadata else b"")
    ).digest()
    n = max(5, min(16, length_bits // 8)) if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _std_user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Expected /U prefix for ``key`` (algorithms 4/5)."""
    if r == 2:
        return _rc4(key, _PDF_PAD)
    x = hashlib.md5(_PDF_PAD + id0).digest()
    x = _rc4(key, x)
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x  # 16 bytes; the other 16 of /U are arbitrary padding


def _aes_cbc_strip(key: bytes, body: bytes) -> bytes:
    """PDF AES stream layout: 16-byte IV prefix + CBC blocks + PKCS#7
    padding. Misaligned/truncated ciphertext (corrupt file) decrypts
    to b'' — skipped stream, never an exception."""
    if len(key) not in (16, 32) or len(body) < 32 or (len(body) - 16) % 16:
        return b""
    plain = aes_cbc_decrypt(key, body[:16], body[16:])
    pad = plain[-1]
    return plain[:-pad] if 1 <= pad <= 16 else b""


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (the /R 6 hardened password hash):
    iterate SHA-256/384/512 over AES-128-CBC encryptions of the
    password block until the 64-round floor and the data-dependent
    stop condition are both met."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


class _StdDecryptor:
    """Per-object decryption from a validated file key.

    ``mode``: 'rc4' (V1/V2, and V4 /CFM /V2), 'aesv2' (V4 /CFM /AESV2
    — per-object MD5 key with the sAlT suffix, AES-128-CBC), 'aesv3'
    (V5 — the 256-bit file key used directly, no per-object
    derivation)."""

    def __init__(self, key: bytes, mode: str = "rc4"):
        self._key = key
        self._mode = mode

    def decrypt(self, num: int, gen: int, body: bytes) -> bytes:
        if self._mode == "aesv3":
            return _aes_cbc_strip(self._key, body)
        h = hashlib.md5(
            self._key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
            + (b"sAlT" if self._mode == "aesv2" else b"")
        ).digest()
        k = h[: min(len(self._key) + 5, 16)]
        if self._mode == "aesv2":
            return _aes_cbc_strip(k, body)
        return _rc4(k, body)


def _find_encryption(data: bytes, offsets: dict, password: bytes = b""):
    """_StdDecryptor for an encrypted document, or None (unencrypted,
    or an unsupported/locked scheme — extraction then degrades to
    skipping the undecodable streams). A non-empty ``password`` is
    tried as the USER password, then as the OWNER password (algorithm
    7: unwrap the user password from /O, R 2–4; validate against
    /O + /OE, R 5–6), and finally the empty user password — the order
    real readers use, so a document with an empty user password still
    opens when the caller supplies an unrelated password."""
    ref = None
    for m in _ENCRYPT_REF_RE.finditer(data):  # last trailer wins
        ref = m
    if ref is None:
        return None
    enc = _object_at(data, int(ref.group(1)), offsets)  # never encrypted itself
    if enc is None or re.search(rb"/Filter\s*/Standard\b", enc) is None:
        return None
    ints = {
        k.decode(): int(r.group(1)) if (r := rx.search(enc)) else None
        for k, rx in _ENC_INT_RE.items()
    }
    v, r, p = ints["V"], ints["R"], ints["P"]

    def enc_str(name: bytes) -> bytes | None:
        m = _ENC_STR_RE[name].search(enc)
        return _pdf_string_bytes(m.group(1), m.group(2)) if m else None

    u = enc_str(b"U")

    if v == 5 and r in (5, 6):
        # AES-256: recover the file key from /UE (user path) or /OE
        # (owner path) per algorithm 2.A; R5 is the deprecated
        # plain-SHA-256 variant, R6 the hardened 2.B hash
        ue = enc_str(b"UE")
        if u is None or len(u) < 48 or ue is None or len(ue) < 32:
            return None
        vsalt, ksalt = u[32:40], u[40:48]

        def h5(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
            pwd = pwd[:127]  # ISO 32000-2: at most 127 password bytes
            if r == 6:
                return _hash_2b(pwd, salt, udata)
            return hashlib.sha256(pwd + salt + udata).digest()

        for pwd in dict.fromkeys((password, b"")):  # user attempts
            if h5(pwd, vsalt) == u[:32]:
                key = aes_cbc_decrypt(h5(pwd, ksalt), bytes(16), ue[:32])
                return _StdDecryptor(key, "aesv3")
        if password:
            # owner attempt: the owner hash covers the 48 /U bytes
            o5, oe = enc_str(b"O"), enc_str(b"OE")
            if o5 is not None and len(o5) >= 48 and oe is not None and len(oe) >= 32:
                ovsalt, oksalt = o5[32:40], o5[40:48]
                if h5(password, ovsalt, u[:48]) == o5[:32]:
                    ik = h5(password, oksalt, u[:48])
                    key = aes_cbc_decrypt(ik, bytes(16), oe[:32])
                    return _StdDecryptor(key, "aesv3")
        return None  # wrong password — cannot decrypt

    if v not in (1, 2, 4) or r not in (2, 3, 4) or p is None:
        return None
    mode = "rc4"
    if v == 4:
        # crypt filters: the default /StdCF names the method; only
        # AESV2 / V2 / Identity are meaningful for the standard handler
        cfm = _CFM_RE.search(enc)
        name = cfm.group(1) if cfm else b"V2"
        if name == b"AESV2":
            mode = "aesv2"
        elif name == b"Identity":
            return None  # pass-through: document effectively unencrypted
        elif name != b"V2":
            return None  # unknown method — skip streams, never garbage
    o = enc_str(b"O")
    if o is None or len(o) < 32:
        return None
    id_m = None
    for m in _ID_RE.finditer(data):
        id_m = m
    id0 = _pdf_string_bytes(None, id_m.group(1)) if id_m else b""
    em = re.search(rb"/EncryptMetadata\s+false", enc) is None
    length = ints["Length"] or (128 if v == 4 else 40)

    candidates = list(dict.fromkeys((password, b"")))
    if password:
        # owner attempt (algorithm 7): the owner-derived RC4 key chain
        # unwraps the PADDED user password from /O; feeding that pad
        # back through the user path validates it against /U
        h = hashlib.md5((password + _PDF_PAD)[:32]).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h).digest()
        okey = h[: max(5, min(16, length // 8)) if r >= 3 else 5]
        user_pad = o[:32]
        if r == 2:
            user_pad = _rc4(okey, user_pad)
        else:
            for i in range(19, -1, -1):
                user_pad = _rc4(bytes(b ^ i for b in okey), user_pad)
        candidates.insert(1, user_pad)  # after the user attempt

    for pwd in candidates:
        key = _std_file_key(
            o, p, id0 or b"", r, length, user_pwd=pwd, encrypt_metadata=em
        )
        if u is not None:
            expect = _std_user_check(key, id0 or b"", r)
            if u[: len(expect)] != expect:
                continue  # this candidate fails /U validation
        return _StdDecryptor(key, mode)
    return None  # wrong password — cannot decrypt


# classic xref-table machinery
_XREF_SUB_RE = re.compile(rb"[ \t\r\n]*(\d+)[ \t]+(\d+)[ \t]*[\r\n]+")
_XREF_ENT_RE = re.compile(rb"(\d{10})\s(\d{5})\s([nf])")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]])*)\]")
_CONTENTS_ONE_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:[^\[\]])*)\]")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")


def _parse_xref_tables(data: bytes) -> dict:
    """objnum → byte offset from every classic ``xref`` table section,
    in file order (incremental updates later in the file override)."""
    offsets: dict = {}
    for m in re.finditer(rb"\bxref\b", data):
        i = m.end()
        while True:
            sub = _XREF_SUB_RE.match(data, i)
            if sub is None:
                break
            start, count = int(sub.group(1)), int(sub.group(2))
            if count > 1_000_000:  # corrupt header; don't loop forever
                break
            i = sub.end()
            for k in range(count):
                ent = _XREF_ENT_RE.match(data, i)
                if ent is None:
                    break
                if ent.group(3) == b"n":
                    offsets[start + k] = int(ent.group(1))
                i = ent.end()
                # entries are nominally 20 bytes; tolerate 19/20 by
                # matching each, not striding
                while i < len(data) and data[i : i + 1] in b" \r\n":
                    i += 1
    return offsets


def _object_at(
    data: bytes, objnum: int, offsets: dict, _depth: int = 0, dec=None
) -> bytes | None:
    """Resolve one object: int entries are byte offsets (classic xref /
    xref-stream type 1), tuple entries are ("container", idx) locations
    inside a /Type /ObjStm (xref-stream type 2). With ``dec`` set, the
    object's stream body is RC4-decrypted in place (before any /Filter
    decode) using its (objnum, gen) key."""
    loc = offsets.get(objnum)
    if loc is None:
        return None
    if isinstance(loc, tuple):
        if _depth > 4:  # corrupt self-referential containers
            return None
        return _objstm_object(data, loc[0], loc[1], offsets, _depth + 1, dec)
    if loc >= len(data):
        return None
    m = re.compile(rb"\s*%d\s+(\d+)\s+obj\b" % objnum).match(data, loc)
    if m is None:
        return None
    end = data.find(b"endobj", m.end())
    # an object whose STREAM contains the bytes "endobj" would truncate
    # here; dialect streams never do, and truncation only loses text,
    # never raises
    obj = data[m.end() : end if end >= 0 else len(data)]
    if dec is not None:
        sm = _STREAM_RE.search(obj)
        if sm is not None:
            body = sm.group(1)
            # _STREAM_RE's capture keeps the EOL that separates the body
            # from `endstream`; RC4 is positional, so decrypt only the
            # declared /Length bytes and leave the framing bytes alone
            lm = _LENGTH_DIRECT_RE.search(obj[: sm.start()])
            n = int(lm.group(1)) if lm else len(body)
            n = min(n, len(body))
            plain = dec.decrypt(objnum, int(m.group(1)), body[:n]) + body[n:]
            obj = obj[: sm.start(1)] + plain + obj[sm.end(1) :]
    return obj


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _objstm_object(
    data: bytes, container: int, idx: int, offsets: dict, depth: int, dec=None
) -> bytes | None:
    """Object #idx inside a /Type /ObjStm container: decode the
    container's stream, read its "objnum offset" header pairs, return
    the object body slice (ObjStm members carry no streams)."""
    obj = _object_at(data, container, offsets, depth, dec)
    if obj is None:
        return None
    n_m = _OBJSTM_N_RE.search(obj)
    f_m = _OBJSTM_FIRST_RE.search(obj)
    if n_m is None or f_m is None:
        return None
    body = _decode_stream(obj)
    if body is None:
        return None
    n, first = int(n_m.group(1)), int(f_m.group(1))
    header = body[:first].split()
    if idx < 0 or idx >= n or 2 * idx + 1 >= len(header):
        return None
    try:
        start = int(header[2 * idx + 1])
        end = int(header[2 * idx + 3]) if 2 * idx + 3 < 2 * n else len(body) - first
    except ValueError:
        return None
    return body[first + start : first + end]


_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_INDEX_RE = re.compile(rb"/Index\s*\[((?:\s*\d+)+)\s*\]")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)")


def _balanced_dict(data: bytes, i: int) -> bytes | None:
    """The << ... >> dict slice starting at ``data[i]`` (balanced over
    nested dicts), or None when unbalanced/absent."""
    if data[i : i + 2] != b"<<":
        return None
    depth = 0
    j = i
    n = min(len(data), i + 65536)  # xref/objstm dicts are small; bound the scan
    while j < n - 1:
        two = data[j : j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return data[i:j]
        else:
            j += 1
    return None


def _parse_xref_streams(data: bytes) -> dict:
    """objnum → location from every /Type /XRef stream object, in file
    order (later sections override): type-1 entries become int byte
    offsets, type-2 entries become ("container_objnum", idx) tuples."""
    locs: dict = {}
    for m in _OBJ_HEADER_RE.finditer(data):
        i = m.end()
        while i < len(data) and data[i : i + 1] in b" \t\r\n":
            i += 1
        d = _balanced_dict(data, i)
        if d is None or b"/XRef" not in d:
            continue
        w = _W_RE.search(d)
        size = _SIZE_RE.search(d)
        if w is None or size is None:
            continue
        w1, w2, w3 = (int(w.group(k)) for k in (1, 2, 3))
        width = w1 + w2 + w3
        if width == 0 or width > 32:
            continue
        idx_m = _INDEX_RE.search(d)
        if idx_m is not None:
            nums = [int(x) for x in idx_m.group(1).split()]
            sections = list(zip(nums[0::2], nums[1::2]))
        else:
            sections = [(0, int(size.group(1)))]
        obj_end = data.find(b"endobj", i)
        body = _decode_stream(data[i : obj_end if obj_end >= 0 else len(data)])
        if body is None:
            continue
        pos = 0
        for start, count in sections:
            if count > 1_000_000:  # corrupt header bomb guard
                break
            for k in range(count):
                if pos + width > len(body):
                    break
                row = body[pos : pos + width]
                pos += width
                # a zero-width type field defaults to type 1 (spec)
                t = int.from_bytes(row[:w1], "big") if w1 else 1
                f2 = int.from_bytes(row[w1 : w1 + w2], "big")
                f3 = int.from_bytes(row[w1 + w2 :], "big")
                if t == 1:
                    locs[start + k] = f2
                elif t == 2:
                    locs[start + k] = (f2, f3)
                # t == 0: free entry
    return locs


_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_HEXVAL_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
_BFCHAR_SEC_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_SEC_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CODESPACE_RE = re.compile(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>")


def _parse_tounicode(body: bytes) -> tuple[dict, int]:
    """bfchar pairs + scalar bfrange runs of one ToUnicode CMap →
    ({code: text}, code byte width). Destinations are UTF-16BE hex."""
    cmap: dict = {}
    m = _CODESPACE_RE.search(body)
    width = max(1, len(m.group(1)) // 2) if m else 2

    def _dst_text(dst_hex: bytes) -> str | None:
        h = dst_hex if len(dst_hex) % 4 == 0 else b"00" + dst_hex
        try:
            return bytes.fromhex(h.decode("ascii")).decode("utf-16-be")
        except (ValueError, UnicodeDecodeError):
            return None

    for sec in _BFCHAR_SEC_RE.finditer(body):
        vals = _HEXVAL_RE.findall(sec.group(1))
        for src, dst in zip(vals[0::2], vals[1::2]):
            text = _dst_text(dst)
            if text is not None:
                cmap[int(src, 16)] = text
    for sec in _BFRANGE_SEC_RE.finditer(body):
        # token scan, not a flat triple-zip: the ARRAY destination form
        # `<lo> <hi> [<d0> <d1> …]` would otherwise feed its members in
        # as the lo/hi of later entries and mis-map the whole section
        toks = list(_BFTOK_RE.finditer(sec.group(1)))
        i = 0
        nt = len(toks)
        while i < nt:
            if (
                toks[i].group(1) is None
                or i + 1 >= nt
                or toks[i + 1].group(1) is None
            ):
                i += 1  # stray bracket / malformed entry: resync
                continue
            lo_i = int(toks[i].group(1), 16)
            hi_i = int(toks[i + 1].group(1), 16)
            i += 2
            bad = hi_i < lo_i or hi_i - lo_i > 65535  # corrupt/bomb range
            if i < nt and toks[i].group(2):  # [ array of destinations ]
                i += 1
                c = lo_i
                while i < nt and not toks[i].group(3):
                    if toks[i].group(1) is not None:
                        text = _dst_text(toks[i].group(1))
                        if text is not None and not bad and c <= hi_i:
                            cmap[c] = text
                        c += 1
                    i += 1
                i += 1  # the closing ]
            elif i < nt and toks[i].group(1) is not None:
                text = None if bad else _dst_text(toks[i].group(1))
                i += 1
                if text is None:
                    continue
                if len(text) == 1:
                    base = ord(text)
                    for c in range(lo_i, hi_i + 1):
                        cp = base + (c - lo_i)
                        if cp <= 0x10FFFF:  # never-raise: clamp off-plane runs
                            cmap[c] = chr(cp)
                else:  # multi-char destination only valid for the start code
                    cmap[lo_i] = text
    return cmap, width


_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_NAME_HEX_RE = re.compile(rb"#([0-9A-Fa-f]{2})")


def _pdf_name_key(raw: bytes) -> bytes:
    """Normalize a PDF name's ``#xx`` hex escapes so the /Font dict key
    and the ``Tf`` operand compare equal however the writer escaped
    them."""
    return _NAME_HEX_RE.sub(lambda m: bytes([int(m.group(1), 16)]), raw)


def _page_fonts(
    data: bytes, node: bytes, offsets: dict, dec=None
) -> tuple[dict, tuple[dict | None, int]]:
    """The page's font table (via /Resources — inline dict or indirect
    ref): ``{name: (cmap, width)}`` per ToUnicode-carrying font, plus
    the DEFAULT ``(cmap|None, width)`` — the union of the page's maps —
    used for text shown before any ``Tf`` and for ``Tf`` names missing
    from the table. Pages without any ToUnicode get ``({}, (None, 2))``
    and keep the latin-1 hex rule."""
    scopes = [node]
    res_ref = _RESOURCES_REF_RE.search(node)
    if res_ref is not None:
        res = _object_at(data, int(res_ref.group(1)), offsets, dec=dec)
        if res is not None:
            scopes.append(res)
    fonts: dict = {}
    union: dict = {}
    width = 2
    found = False
    for scope in scopes:
        fd = _FONTDICT_RE.search(scope)
        if fd is None:
            continue
        for entry in _FONT_ENTRY_RE.finditer(fd.group(1)):
            font = _object_at(data, int(entry.group(2)), offsets, dec=dec)
            if font is None:
                continue
            # Type0 (composite/CID) fonts: the string codes ARE 2-byte
            # CIDs under Identity-H/V and the common 2-byte predefined
            # CMaps — force width 2 rather than trusting the ToUnicode
            # codespace (real writers emit sloppy 1-byte codespaces).
            # CIDToGIDMap never matters for text extraction (it maps
            # CID→glyph for RENDERING; ToUnicode maps code→text).
            is_type0 = _TYPE0_RE.search(font) is not None
            tu = _TOUNICODE_RE.search(font)
            body = None
            if tu is not None:
                tu_obj = _object_at(data, int(tu.group(1)), offsets, dec=dec)
                if tu_obj is not None:
                    body = _decode_stream(tu_obj)
            m = {}
            if body is not None:
                m, w = _parse_tounicode(body)
            if not m:
                if is_type0:
                    # ANY composite font with no usable ToUnicode —
                    # Identity-keyed, predefined CMap (/UniGB-UCS2-H),
                    # or an indirect /Encoding ref — shows CID codes
                    # this reader cannot map to text: width-0 sentinel
                    # SUPPRESSES its strings (correct degradation, not
                    # latin-1 mojibake from CID byte pairs)
                    fonts[_pdf_name_key(entry.group(1))] = (None, 0)
                continue
            if is_type0:
                w = 2
            fonts[_pdf_name_key(entry.group(1))] = (m, w)
            union.update(m)
            # page-default width = the FIRST ToUnicode-carrying
            # font's, deterministically (not dict-iteration luck);
            # a page mixing 1- and 2-byte fonts decodes pre-Tf text
            # best-effort with that width — per-Tf tracking is the
            # accurate path once the content names a font
            if not found:
                width = w
            found = True
    return fonts, ((union, width) if found else (None, 2))


def _page_content_objs(data: bytes, offsets: dict, dec=None) -> list | None:
    """Walk trailer /Root → /Pages → /Kids → /Contents; returns
    ``(content_obj_nums, page_node_bytes)`` per page (document order) —
    the node feeds :func:`_page_cmap` — or None when the walk cannot
    complete (→ caller falls back)."""
    root = None
    for m in _ROOT_RE.finditer(data):  # last trailer wins
        root = int(m.group(1))
    if root is None:
        return None
    catalog = _object_at(data, root, offsets, dec=dec)
    if catalog is None:
        return None
    pages_ref = _PAGES_REF_RE.search(catalog)
    if pages_ref is None:
        return None
    pages: list = []
    seen: set = set()

    def walk(objnum: int, depth: int) -> None:
        if depth > 64 or objnum in seen:  # cycle/bomb guard
            return
        seen.add(objnum)
        node = _object_at(data, objnum, offsets, dec=dec)
        if node is None:
            return
        kids = _KIDS_RE.search(node)
        if kids is not None:
            for ref in _REF_RE.finditer(kids.group(1)):
                walk(int(ref.group(1)), depth + 1)
            return
        arr = _CONTENTS_ARR_RE.search(node)
        if arr is not None:
            pages.append(
                ([int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))], node)
            )
            return
        one = _CONTENTS_ONE_RE.search(node)
        if one is not None:
            pages.append(([int(one.group(1))], node))

    walk(int(pages_ref.group(1)), 0)
    return pages if pages else None


def extract_pdf_text(data: bytes | str, password: bytes | str = b"") -> list[str]:
    """Extract ordered text blocks (one per BT…ET object) from PDF bytes.

    Pages come from the xref-table + page-tree walk when possible
    (document order, multi-stream pages concatenated, non-content
    streams skipped); otherwise every stream is scanned in byte order.
    Accepts ``str`` too (the pipeline's ``text`` column is string; the
    fixture dialect is latin-1-safe).

    ``password`` opens standard-security documents with a non-empty
    user or owner password (tried in that order, then the empty user
    password). A str password is encoded UTF-8 — exact for /R 6 and
    for the ASCII passwords that dominate /R ≤ 4 practice (the spec's
    PDFDocEncoding for legacy revisions and SASLprep normalization are
    simplifications documented here; pass bytes to control encoding
    precisely). The wrong password degrades to no spans, never raises.
    """
    if isinstance(data, str):
        data = data.encode("latin-1", errors="replace")
    if isinstance(password, str):
        password = password.encode("utf-8", errors="replace")
    # bounded copy: lstrip() on the full payload would duplicate a
    # multi-MB document to check a 5-byte magic
    if not data[:1024].lstrip()[:5].startswith(b"%PDF-"):
        return []
    blocks: list[str] = []
    offsets = _parse_xref_tables(data)
    # PDF 1.5+ xref streams compose with (and, in hybrid files,
    # override) classic tables; type-2 entries resolve through ObjStm
    offsets.update(_parse_xref_streams(data))
    dec = _find_encryption(data, offsets, password) if offsets else None
    pages = _page_content_objs(data, offsets, dec) if offsets else None
    if pages is not None:
        unresolved = False
        for content_objs, page_node in pages:
            bodies = []
            for objnum in content_objs:
                obj = _object_at(data, objnum, offsets, dec=dec)
                if obj is None:
                    # a REFERENCED content object with a stale/corrupt
                    # xref offset: the walk would silently drop that
                    # page's text — recovery (A17) prefers the whole-doc
                    # byte-order fallback. (A corrupt deflate BODY is a
                    # different class: those bytes are gone either way
                    # and are skipped exactly as the fallback would.)
                    unresolved = True
                    break
                body = _decode_stream(obj)
                if body is not None:
                    bodies.append(body)
            if unresolved:
                break
            if bodies:
                fonts, (cmap, width) = _page_fonts(data, page_node, offsets, dec)
                # PDF semantics: a page's content streams form ONE
                # stream when concatenated (operators may span the
                # boundary); the joining byte keeps tokens separated
                _scan_content(b"\n".join(bodies), blocks, cmap, width, fonts)
        if not unresolved:
            return blocks
        blocks = []
    # fallback: no usable xref/trailer (or xref-stream file) — scan
    # every stream in byte order, classifying /Filter per object by
    # clipping the lookback at the previous object boundary
    for stream in _STREAM_RE.finditer(data):
        head = data[max(0, stream.start() - 512) : stream.start()]
        boundary = max(head.rfind(b"endstream"), head.rfind(b"obj"))
        if boundary >= 0:
            head = head[boundary:]
        body = _apply_filters(head, stream.group(1))
        if body is None:
            continue
        # no page↔font association without a tree walk: hex strings
        # take the latin-1 byte rule in the fallback (module doc)
        _scan_content(body, blocks)
    return blocks


def make_fixture_pdf_15(
    blocks: list[list[str]] | None = None,
    pages: list[list[list[str]]] | None = None,
    use_objstm: bool = True,
    predictor: int = 12,
    compress: bool = True,
) -> str:
    """Build a PDF 1.5-layout fixture: cross-reference STREAM instead
    of a classic table, with the catalog / pages node / page dicts
    optionally packed into a /Type /ObjStm container (type-2 entries).

    * ``predictor`` ≥ 10 applies the PNG Up row filter to the xref
      stream entries (the layout virtually every real writer emits),
      declared via /DecodeParms; < 10 writes raw rows.
    * ``compress`` FlateDecodes the xref/ObjStm streams (content
      streams stay uncompressed — their filters are covered elsewhere).

    Deterministic; latin-1-safe string like :func:`make_fixture_pdf`.
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    if pages is None:
        pages = [blocks or []]
    n_pages = len(pages)
    page_nums = list(range(3, 3 + n_pages))
    content_base = 3 + n_pages

    def page_content(page_blocks: list) -> str:
        parts = []
        y = 700
        for block in page_blocks:
            lines = ["BT", "/F1 12 Tf"]
            for line in block:
                lines.append("0 %d Td" % (-14 if len(lines) > 2 else y))
                lines.append("(%s) Tj" % esc(line))
            lines.append("ET")
            parts.append("\n".join(lines))
            y -= 100
        return "\n".join(parts)

    def raw_stream_obj(num: int, body: bytes, dict_extra: str) -> str:
        s = body.decode("latin-1")
        return "%d 0 obj\n<< /Length %d%s >>\nstream\n%s\nendstream\nendobj" % (
            num, len(s), dict_extra, s,
        )

    content_texts = [page_content(pb) for pb in pages]
    content_nums = list(range(content_base, content_base + n_pages))
    catalog = "<< /Type /Catalog /Pages 2 0 R >>"
    pages_node = "<< /Type /Pages /Kids [%s] /Count %d >>" % (
        " ".join("%d 0 R" % n for n in page_nums), n_pages,
    )
    page_dicts = [
        "<< /Type /Page /Parent 2 0 R /Contents %d 0 R /MediaBox [0 0 612 792] >>"
        % content_nums[i]
        for i in range(n_pages)
    ]
    tree = [(1, catalog), (2, pages_node)] + list(zip(page_nums, page_dicts))

    emit: list = []  # (objnum, full object text) in byte order
    for num, text in zip(content_nums, content_texts):
        emit.append((num, raw_stream_obj(num, text.encode("latin-1"), "")))
    objstm_num = content_base + n_pages
    entry_loc: dict = {n: "T1" for n, _ in emit}
    if use_objstm:
        bodies = [t.encode("latin-1") + b"\n" for _, t in tree]
        offs, pos = [], 0
        for b in bodies:
            offs.append(pos)
            pos += len(b)
        header = " ".join(
            "%d %d" % (num, off) for (num, _), off in zip(tree, offs)
        ).encode("ascii") + b"\n"
        stm = header + b"".join(bodies)
        extra = " /Type /ObjStm /N %d /First %d" % (len(tree), len(header))
        if compress:
            stm = zlib.compress(stm, 6)
            extra += " /Filter /FlateDecode"
        emit.append((objstm_num, raw_stream_obj(objstm_num, stm, extra)))
        entry_loc[objstm_num] = "T1"
        for idx, (num, _) in enumerate(tree):
            entry_loc[num] = ("T2", idx)
        xref_num = objstm_num + 1
    else:
        for num, text in tree:
            emit.append((num, "%d 0 obj\n%s\nendobj" % (num, text)))
            entry_loc[num] = "T1"
        xref_num = objstm_num
    entry_loc[xref_num] = "T1"
    size = xref_num + 1

    out = ["%PDF-1.5"]
    offsets: dict = {}
    pos = len("%PDF-1.5\n")
    for num, text in sorted(emit):
        offsets[num] = pos
        out.append(text)
        pos += len(text) + 1
    offsets[xref_num] = pos

    w1, w2, w3 = 1, 2, 1
    rows = []
    for num in range(size):
        loc = entry_loc.get(num)
        if loc == "T1":
            rows.append(bytes([1]) + offsets[num].to_bytes(w2, "big") + bytes([0]))
        elif isinstance(loc, tuple):
            rows.append(bytes([2]) + objstm_num.to_bytes(w2, "big") + bytes([loc[1]]))
        else:  # object 0 / gaps: free
            rows.append(bytes([0]) + (0).to_bytes(w2, "big") + bytes([255 if num == 0 else 0]))
    width = w1 + w2 + w3
    parms = ""
    if predictor >= 10:
        # PNG Up forward filter: row_out = row - prev, filter byte 2
        filtered, prev = bytearray(), bytes(width)
        for r in rows:
            filtered.append(2)
            filtered.extend((r[j] - prev[j]) & 0xFF for j in range(width))
            prev = r
        body = bytes(filtered)
        parms = " /DecodeParms << /Predictor %d /Columns %d >>" % (predictor, width)
    else:
        body = b"".join(rows)
    extra = " /Type /XRef /Size %d /W [%d %d %d] /Root 1 0 R%s" % (
        size, w1, w2, w3, parms,
    )
    if compress:
        body = zlib.compress(body, 6)
        extra += " /Filter /FlateDecode"
    out.append(raw_stream_obj(xref_num, body, extra))
    out.append("startxref\n%d\n%%%%EOF" % offsets[xref_num])
    return "\n".join(out)


def make_fixture_pdf(
    blocks: list[list[str]] | None = None,
    compress: bool = False,
    pages: list[list[list[str]]] | None = None,
    streams_per_page: int = 1,
    reverse_content: bool = False,
    extra_stream: str | None = None,
    ascii_wrap: str | None = None,
    hex_text: bool = False,
    tounicode: bool = False,
    tounicode_ranges: bool | str = False,
) -> str:
    """Build a dialect PDF: one BT…ET object per block, one Td+Tj per line.

    Deterministic; used by the test goldens and the corpus generator
    (FIXTURES.md §6). Returns latin-1-safe ``str`` suitable for the
    ``spans.text`` column (latin-1 maps bytes 1:1, so a compressed
    stream round-trips through the string column losslessly).

    * ``blocks`` — single-page shorthand (the original surface; default
      arguments produce byte-identical output to the original
      generator, which the frozen goldens embed verbatim).
    * ``pages`` — multi-page form: list of per-page block lists.
    * ``streams_per_page`` > 1 splits each page's content stream into
      that many /Contents array members at LINE granularity — which
      deliberately splits mid-text-object, exercising the concatenation
      rule (a BT in one stream, its ET in the next).
    * ``reverse_content=True`` writes the content objects in reverse
      BYTE order (xref offsets stay correct) — only a page-tree walk
      can then produce document order.
    * ``extra_stream`` adds an unreferenced stream object (fake font
      file) containing text-operator-looking bytes — reachable-only
      extraction must skip it.
    * ``compress=True`` emits every content stream as /FlateDecode.
    * ``ascii_wrap`` ∈ {"hex", "a85"} additionally wraps each stream
      body as ASCIIHexDecode / ASCII85Decode (OUTERMOST filter, so
      combined with ``compress`` the dict reads
      ``[/ASCII85Decode /FlateDecode]`` — decode order).
    * ``hex_text=True`` emits show-text strings in ``<hex>`` form
      (latin-1 bytes, 1-byte codes).
    * ``tounicode=True`` emits hex show strings of 2-byte codes with a
      /Font + /ToUnicode CMap object per document mapping each distinct
      character to a code ≥ 0x0100 (codes deliberately NOT latin-1, so
      only a CMap-aware reader decodes them); ``tounicode_ranges=True``
      writes the map as scalar ``bfrange`` runs instead of ``bfchar``
      pairs, and ``tounicode_ranges="array"`` as the array-destination
      bfrange form ``<lo> <hi> [<d0> <d1> …]``.
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    if pages is None:
        pages = [blocks or []]
    n_pages = len(pages)
    page_nums = list(range(3, 3 + n_pages))
    content_base = 3 + n_pages

    char_code: dict = {}
    if tounicode:
        all_chars = sorted({c for pg in pages for bl in pg for ln in bl for c in ln})
        char_code = {c: 0x0100 + i for i, c in enumerate(all_chars)}

    def show_string(line: str) -> str:
        if tounicode:
            return "<%s> Tj" % "".join("%04X" % char_code[c] for c in line)
        if hex_text:
            return "<%s> Tj" % line.encode("latin-1").hex().upper()
        return "(%s) Tj" % esc(line)

    def page_content(page_blocks: list) -> str:
        body_parts = []
        y = 700
        for block in page_blocks:
            lines = ["BT", "/F1 12 Tf"]
            for line in block:
                lines.append("0 %d Td" % (-14 if len(lines) > 2 else y))
                lines.append(show_string(line))
            lines.append("ET")
            body_parts.append("\n".join(lines))
            y -= 100
        return "\n".join(body_parts)

    def stream_obj(num: int, content: str) -> str:
        body = content.encode("latin-1")
        filters: list = []
        if compress:
            # level fixed for determinism; latin-1 keeps the bytes intact
            body = zlib.compress(body, 6)
            filters.append("/FlateDecode")
        if ascii_wrap == "hex":
            body = body.hex().upper().encode("ascii") + b">"
            filters.insert(0, "/ASCIIHexDecode")
        elif ascii_wrap == "a85":
            import base64

            body = base64.a85encode(body) + b"~>"
            filters.insert(0, "/ASCII85Decode")
        elif ascii_wrap is not None:
            raise ValueError(f"ascii_wrap must be 'hex' or 'a85', got {ascii_wrap!r}")
        if not filters:
            fspec = ""
        elif len(filters) == 1:
            fspec = " /Filter %s" % filters[0]
        else:
            fspec = " /Filter [%s]" % " ".join(filters)
        s = body.decode("latin-1")
        return "%d 0 obj\n<< /Length %d%s >>\nstream\n%s\nendstream\nendobj" % (
            num,
            len(s),
            fspec,
            s,
        )

    page_refs: list = []  # per page: the /Contents refs string
    content_objs: list = []  # (objnum, text)
    next_content = content_base
    for page_blocks in pages:
        content = page_content(page_blocks)
        if streams_per_page <= 1:
            nums = [next_content]
            chunks = [content]
        else:
            lines = content.split("\n")
            k = max(1, -(-len(lines) // streams_per_page))  # ceil
            chunks = [
                "\n".join(lines[i : i + k]) for i in range(0, len(lines), k)
            ] or [""]
            nums = list(range(next_content, next_content + len(chunks)))
        next_content += len(nums)
        for num, chunk in zip(nums, chunks):
            content_objs.append((num, stream_obj(num, chunk)))
        page_refs.append(
            "%d 0 R" % nums[0]
            if len(nums) == 1
            else "[%s]" % " ".join("%d 0 R" % n for n in nums)
        )
    if extra_stream is not None:
        content_objs.append((next_content, stream_obj(next_content, extra_stream)))
        next_content += 1

    resources = ""
    if tounicode:
        font_num, cmap_num = next_content, next_content + 1
        next_content += 2
        if tounicode_ranges:
            # scalar bfrange runs over consecutive (code, char) pairs
            runs: list = []  # (start_code, chars)
            for c, code in sorted(char_code.items(), key=lambda kv: kv[1]):
                if (
                    runs
                    and runs[-1][0] + len(runs[-1][1]) == code
                    and ord(runs[-1][1][-1]) + 1 == ord(c)
                ):
                    runs[-1] = (runs[-1][0], runs[-1][1] + c)
                else:
                    runs.append((code, c))
            if tounicode_ranges == "array":
                # array-destination form: <lo> <hi> [<d0> <d1> …]
                entries = "\n".join(
                    "<%04X> <%04X> [%s]"
                    % (
                        code,
                        code + len(chars) - 1,
                        " ".join(
                            "<%s>" % ch.encode("utf-16-be").hex().upper()
                            for ch in chars
                        ),
                    )
                    for code, chars in runs
                )
            else:
                entries = "\n".join(
                    "<%04X> <%04X> <%04X>"
                    % (code, code + len(chars) - 1, ord(chars[0]))
                    for code, chars in runs
                )
            section = "%d beginbfrange\n%s\nendbfrange" % (len(runs), entries)
        else:
            entries = "\n".join(
                "<%04X> <%s>" % (code, c.encode("utf-16-be").hex().upper())
                for c, code in sorted(char_code.items(), key=lambda kv: kv[1])
            )
            section = "%d beginbfchar\n%s\nendbfchar" % (len(char_code), entries)
        cmap_body = (
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n%s" % section
        )
        content_objs.append((cmap_num, stream_obj(cmap_num, cmap_body)))
        content_objs.append(
            (
                font_num,
                "%d 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                "/ToUnicode %d 0 R >>\nendobj" % (font_num, cmap_num),
            )
        )
        resources = " /Resources << /Font << /F1 %d 0 R >> >>" % font_num

    page_objs = [
        (
            page_nums[pi],
            "%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %s "
            "/MediaBox [0 0 612 792]%s >>\nendobj"
            % (page_nums[pi], page_refs[pi], resources),
        )
        for pi in range(n_pages)
    ]
    kids = " ".join("%d 0 R" % n for n in page_nums)
    numbered = [
        (1, "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj"),
        (2, "2 0 obj\n<< /Type /Pages /Kids [%s] /Count %d >>\nendobj" % (kids, n_pages)),
        *page_objs,
        *(reversed(content_objs) if reverse_content else content_objs),
    ]
    out = ["%PDF-1.4"]
    offsets: dict = {}
    pos = len("%PDF-1.4\n")
    for num, o in numbered:
        offsets[num] = pos
        out.append(o)
        pos += len(o) + 1
    size = next_content  # objects 0..size-1; 0 is the free head
    xref = ["xref", "0 %d" % size, "0000000000 65535 f "]
    xref += ["%010d 00000 n " % offsets[n] for n in range(1, size)]
    out.append("\n".join(xref))
    out.append(
        "trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (size, pos)
    )
    return "\n".join(out)


def make_fixture_pdf_two_fonts(
    f1_text: str = "AB",
    f2_text: str = "xy",
    mixed: bool = True,
    pre_tf: bool = False,
) -> str:
    """Build a two-font fixture whose /F1 and /F2 ToUnicode maps assign
    the SAME code points to DIFFERENT characters (code 0x0100+i means
    ``f1_text[i]`` under F1 but ``f2_text[i]`` under F2) — decodable
    correctly only by a reader that tracks the active font through
    ``Tf``. Emits one block per font, plus (``mixed``) a block that
    switches fonts mid-BT, plus (``pre_tf``) a leading block with NO
    ``Tf`` at all (exercises the page-union default). Deterministic,
    latin-1-safe string like :func:`make_fixture_pdf`."""

    def codes(text: str) -> str:
        return "<%s> Tj" % "".join("%04X" % (0x0100 + i) for i in range(len(text)))

    def cmap_body(text: str) -> str:
        entries = "\n".join(
            "<%04X> <%s>" % (0x0100 + i, c.encode("utf-16-be").hex().upper())
            for i, c in enumerate(text)
        )
        return (
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            "%d beginbfchar\n%s\nendbfchar" % (len(text), entries)
        )

    parts = []
    if pre_tf:
        parts.append("BT\n0 700 Td\n%s\nET" % codes(f1_text))
    parts.append("BT\n/F1 12 Tf\n0 600 Td\n%s\nET" % codes(f1_text))
    parts.append("BT\n/F2 12 Tf\n0 500 Td\n%s\nET" % codes(f2_text))
    if mixed:
        parts.append(
            "BT\n/F1 12 Tf\n0 400 Td\n%s\n0 -14 Td\n/F2 12 Tf\n%s\nET"
            % (codes(f1_text), codes(f2_text))
        )
    content = "\n".join(parts)

    objs = [
        (1, "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj"),
        (2, "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj"),
        (
            3,
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            "/MediaBox [0 0 612 792] /Resources << /Font "
            "<< /F1 5 0 R /F2 7 0 R >> >> >>\nendobj",
        ),
        (
            4,
            "4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj"
            % (len(content), content),
        ),
        (
            5,
            "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            "/ToUnicode 6 0 R >>\nendobj",
        ),
        (
            6,
            "6 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj"
            % (len(cmap_body(f1_text)), cmap_body(f1_text)),
        ),
        (
            7,
            "7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
            "/ToUnicode 8 0 R >>\nendobj",
        ),
        (
            8,
            "8 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj"
            % (len(cmap_body(f2_text)), cmap_body(f2_text)),
        ),
    ]
    out = ["%PDF-1.4"]
    offsets: dict = {}
    pos = len("%PDF-1.4\n")
    for num, o in objs:
        offsets[num] = pos
        out.append(o)
        pos += len(o) + 1
    xref = ["xref", "0 9", "0000000000 65535 f "]
    xref += ["%010d 00000 n " % offsets[n] for n in range(1, 9)]
    out.append("\n".join(xref))
    out.append(
        "trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % pos
    )
    return "\n".join(out)


def make_fixture_pdf_cid(
    text: str = "नमस्ते",
    tounicode: bool = True,
    sloppy_codespace: bool = True,
    literal: bool = False,
    cid_base: int = 0x0C15,
) -> str:
    """Build a Type0 / Identity-H composite-font fixture — the dominant
    real-crawl PDF shape (CID-keyed TrueType, text shown as 2-byte CID
    strings). ``text[i]`` is assigned CID ``cid_base + i``; the
    descendant CIDFontType2 carries NO /CIDToGIDMap entry (extraction
    never needs it — that map is for rendering).

    * ``tounicode=True`` attaches a CID→Unicode CMap; with
      ``sloppy_codespace`` its codespacerange lies (``<00> <FF>``,
      1-byte) the way real writers often do — a reader trusting it
      would split the 2-byte CIDs into garbage bytes; Type0 forces
      width 2.
    * ``tounicode=False`` drops the CMap: the strings are bare glyph
      ids and the page must degrade to NO text (never latin-1 mojibake).
    * ``literal=True`` shows the second half of the text as a LITERAL
      ``(...)`` string whose bytes are the same 2-byte CIDs — literal
      and hex strings share the CID decode rule.

    Deterministic, latin-1-safe string like :func:`make_fixture_pdf`.
    """
    cids = [cid_base + i for i in range(len(text))]
    half = (len(cids) + 1) // 2 if literal else len(cids)
    hex_codes = "".join("%04X" % c for c in cids[:half])
    content_lines = ["BT", "/F1 12 Tf", "0 700 Td", "<%s> Tj" % hex_codes]
    if literal and cids[half:]:
        raw = b"".join(c.to_bytes(2, "big") for c in cids[half:])
        lit = (
            raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        ).decode("latin-1")
        content_lines += ["0 -14 Td", "(%s) Tj" % lit]
    content_lines.append("ET")
    content = "\n".join(content_lines)

    codespace = "<00> <FF>" if sloppy_codespace else "<0000> <FFFF>"
    entries = "\n".join(
        "<%04X> <%s>" % (c, ch.encode("utf-16-be").hex().upper())
        for c, ch in zip(cids, text)
    )
    cmap_body = (
        "1 begincodespacerange\n%s\nendcodespacerange\n"
        "%d beginbfchar\n%s\nendbfchar" % (codespace, len(cids), entries)
    )

    f1 = (
        "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /NotoSans "
        "/Encoding /Identity-H /DescendantFonts [6 0 R]"
        + (" /ToUnicode 7 0 R" if tounicode else "")
        + " >>\nendobj"
    )
    objs = [
        (1, "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj"),
        (2, "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj"),
        (
            3,
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            "/MediaBox [0 0 612 792] /Resources << /Font "
            "<< /F1 5 0 R >> >> >>\nendobj",
        ),
        (
            4,
            "4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj"
            % (len(content), content),
        ),
        (5, f1),
        (
            6,
            "6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
            "/NotoSans /CIDSystemInfo << /Registry (Adobe) /Ordering "
            "(Identity) /Supplement 0 >> >>\nendobj",
        ),
    ]
    if tounicode:
        objs.append(
            (
                7,
                "7 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj"
                % (len(cmap_body), cmap_body),
            )
        )
    out = ["%PDF-1.4"]
    offsets: dict = {}
    pos = len("%PDF-1.4\n")
    for num, o in objs:
        offsets[num] = pos
        out.append(o)
        pos += len(o) + 1
    size = len(objs) + 1
    xref = ["xref", "0 %d" % size, "0000000000 65535 f "]
    xref += ["%010d 00000 n " % offsets[n] for n in range(1, size)]
    out.append("\n".join(xref))
    out.append(
        "trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (size, pos)
    )
    return "\n".join(out)


def _encrypt_dict_obj(
    r: int,
    length_bits: int,
    p: int,
    o: bytes,
    u: bytes,
    oe: bytes | None,
    ue: bytes | None,
    encrypt_metadata: bool = True,
) -> str:
    """The /Encrypt dictionary for each handler generation."""
    v = {2: 1, 3: 2, 4: 4, 5: 5, 6: 5}[r]
    head = "5 0 obj\n<< /Filter /Standard /V %d /R %d /Length %d /P %d" % (
        v, r, length_bits, p,
    )
    if v >= 4:
        cfm = "AESV2" if v == 4 else "AESV3"
        head += (
            " /CF << /StdCF << /CFM /%s /AuthEvent /DocOpen /Length %d >> >>"
            " /StmF /StdCF /StrF /StdCF" % (cfm, length_bits // 8)
        )
    if not encrypt_metadata:
        head += " /EncryptMetadata false"
    head += " /O <%s> /U <%s>" % (o.hex().upper(), u.hex().upper())
    if oe is not None and ue is not None:
        head += " /OE <%s> /UE <%s>" % (oe.hex().upper(), ue.hex().upper())
    return head + " >>\nendobj"


def make_fixture_pdf_encrypted(
    blocks: list[list[str]] | None = None,
    r: int = 3,
    owner_pwd: bytes = b"owner",
    user_pwd: bytes = b"",
    compress: bool = False,
    corrupt_u: bool = False,
    encrypt_metadata: bool = True,
) -> str:
    """Single-page encrypted fixture (standard security handler):
    /R 2 = 40-bit RC4 /V 1, /R 3 = 128-bit RC4 /V 2, /R 4 = /V 4 crypt
    filter /CFM /AESV2 (AES-128-CBC), /R 5|6 = /V 5 AES-256
    (/UE-wrapped file key; R6 uses the hardened 2.B hash).
    /O, /U (and /OE, /UE for V5 — real owner entries, so the owner-
    password path is exercised for every generation) are computed
    exactly per the spec's algorithms, so the extractor's key
    derivation and validation are exercised for real, not against
    hand-picked constants. A non-empty ``user_pwd`` makes the document
    require a password (the extractor must degrade to [] without one
    and open with either ``user_pwd`` or ``owner_pwd``).
    ``corrupt_u`` flips the /U entry — the document then reads as
    user-password-locked and extraction must degrade to [] without
    raising. Deterministic, latin-1-safe string like
    :func:`make_fixture_pdf`.
    """
    if r not in (2, 3, 4, 5, 6):
        raise ValueError(f"r must be in 2..6, got {r}")
    length_bits = {2: 40, 3: 128, 4: 128, 5: 256, 6: 256}[r]
    n = length_bits // 8
    user_pwd, owner_pwd = user_pwd[:127], owner_pwd[:127]  # ISO 32000-2 cap
    id0 = bytes(range(0xA0, 0xB0))  # fixed 16-byte file ID

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    # content stream (same layout rule as make_fixture_pdf)
    body_parts = []
    y = 700
    for block in blocks or []:
        lines = ["BT", "/F1 12 Tf"]
        for line in block:
            lines.append("0 %d Td" % (-14 if len(lines) > 2 else y))
            lines.append("(%s) Tj" % esc(line))
        lines.append("ET")
        body_parts.append("\n".join(lines))
        y -= 100
    content = "\n".join(body_parts).encode("latin-1")
    filt = ""
    if compress:
        content = zlib.compress(content, 6)
        filt = " /Filter /FlateDecode"

    p = -44  # print allowed, modify denied — a typical owner-locked doc

    def aes_stream(k: bytes, plain: bytes) -> bytes:
        iv = bytes(range(0x30, 0x40))  # fixed IV: fixture determinism
        padlen = 16 - len(plain) % 16
        return iv + aes_cbc_encrypt(k, iv, plain + bytes([padlen]) * padlen)

    oe = ue = None
    if r >= 5:
        # AES-256 (V5): /U = 2.A hash + validation/key salts; /UE wraps
        # the file key; /O and /OE are the REAL owner twins (hashes
        # cover the 48 /U bytes per spec)
        vsalt, ksalt = bytes(range(0x10, 0x18)), bytes(range(0x18, 0x20))
        ovsalt, oksalt = bytes(range(0x20, 0x28)), bytes(range(0x28, 0x30))
        key = bytes((i * 7 + 3) & 0xFF for i in range(32))
        if r == 6:
            hsh, ik = _hash_2b(user_pwd, vsalt), _hash_2b(user_pwd, ksalt)
        else:
            hsh = hashlib.sha256(user_pwd + vsalt).digest()
            ik = hashlib.sha256(user_pwd + ksalt).digest()
        u = hsh + vsalt + ksalt
        ue = aes_cbc_encrypt(ik, bytes(16), key)
        if r == 6:
            ohsh = _hash_2b(owner_pwd, ovsalt, u[:48])
            oik = _hash_2b(owner_pwd, oksalt, u[:48])
        else:
            ohsh = hashlib.sha256(owner_pwd + ovsalt + u[:48]).digest()
            oik = hashlib.sha256(owner_pwd + oksalt + u[:48]).digest()
        o = ohsh + ovsalt + oksalt
        oe = aes_cbc_encrypt(oik, bytes(16), key)
        if corrupt_u:
            u = bytes(b ^ 0xFF for b in u)
        enc_body = aes_stream(key, content)
    else:
        # /O (algorithm 3): RC4 of the padded USER password under a key
        # derived from the owner password
        h = hashlib.md5((owner_pwd + _PDF_PAD)[:32]).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h).digest()
        okey = h[:n]
        o = _rc4(okey, (user_pwd + _PDF_PAD)[:32])
        if r >= 3:
            for i in range(1, 20):
                o = _rc4(bytes(b ^ i for b in okey), o)

        key = _std_file_key(
            o, p, id0, r, length_bits, user_pwd=user_pwd,
            encrypt_metadata=encrypt_metadata,
        )
        u = _std_user_check(key, id0, r)
        if r >= 3:
            u += bytes(16)  # /U is 32 bytes; tail is arbitrary padding
        if corrupt_u:
            u = bytes(b ^ 0xFF for b in u)
        if r == 4:
            h4 = hashlib.md5(
                key + (4).to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
            ).digest()
            enc_body = aes_stream(h4[:16], content)
        else:
            enc_body = _StdDecryptor(key).decrypt(4, 0, content)  # RC4: enc == dec

    objs = [
        (1, "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj"),
        (
            2,
            "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj",
        ),
        (
            3,
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            "/MediaBox [0 0 612 792] >>\nendobj",
        ),
        (
            4,
            "4 0 obj\n<< /Length %d%s >>\nstream\n%s\nendstream\nendobj"
            % (len(enc_body), filt, enc_body.decode("latin-1")),
        ),
        (5, _encrypt_dict_obj(r, length_bits, p, o, u, oe, ue, encrypt_metadata)),
    ]
    out = ["%PDF-1.4"]
    offsets: dict = {}
    pos = len("%PDF-1.4\n")
    for num, ob in objs:
        offsets[num] = pos
        out.append(ob)
        pos += len(ob) + 1
    xref = ["xref", "0 6", "0000000000 65535 f "]
    xref += ["%010d 00000 n " % offsets[num] for num in range(1, 6)]
    out.append("\n".join(xref))
    out.append(
        "trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<%s> <%s>] >>\n"
        "startxref\n%d\n%%%%EOF" % (id0.hex().upper(), id0.hex().upper(), pos)
    )
    return "\n".join(out)
