"""Minimal fixture-dialect PDF text extraction (SURVEY.md A26).

The north rule requires "PDF/layout parsing" in the pipeline
(BASELINE.json north_star); no PDF library exists in this sandbox
(SURVEY.md §0), so this module implements a from-scratch extractor
for a *documented dialect subset* co-designed with the fixture
generator (:func:`make_fixture_pdf`, FIXTURES.md §6):

* uncompressed streams, plus ``/Filter /FlateDecode`` streams
  (inflated with stdlib zlib — the filter that covers the vast
  majority of real-world PDF content streams),
* content streams using only ``BT``/``ET`` text objects with ``Tf``,
  ``Td`` and ``Tj``/``TJ`` (array form) show-text operators,
* strings in parenthesis form with ``\\(`` ``\\)`` ``\\\\`` and octal
  escapes, WinAnsi/latin-1 bytes.

Layout rule (frozen by tests/golden/pdf_dialect.json): each ``BT…ET``
text object is one output block; ``Tj``/``TJ`` strings within it are
concatenated in stream order, separated by a single space per ``Td``
line move. Real-world PDFs outside this dialect yield no spans rather
than raising (A17 never-fail discipline); the limitation is
documented here and in FIXTURES.md.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "make_fixture_pdf"]

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
      | \b(?P<bt>BT)\b
      | \b(?P<et>ET)\b
      | \b(?P<tj>Tj)\b
      | \b(?P<TJ>TJ)\b
      | (?P<td>-?[0-9.]+\s+-?[0-9.]+\s+Td)\b
    """,
    re.VERBOSE | re.DOTALL,
)
# single left-to-right pass: octal, named escapes, escaped delimiters,
# and unknown \x (backslash dropped per the PDF rule) — sequential
# .replace() passes corrupted strings like (\\101), resolving the
# octal against an already-escaped backslash
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.DOTALL)
_NAMED_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t"}


def _unescape_pdf_string(body: bytes) -> str:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if len(g) > 1 or g in b"01234567":
            return bytes([int(g, 8) & 0xFF])
        return _NAMED_ESC.get(g, g)

    return _ESC_RE.sub(sub, body).decode("latin-1", errors="replace")


def extract_pdf_text(data: bytes | str) -> list[str]:
    """Extract ordered text blocks (one per BT…ET object) from PDF bytes.

    Accepts ``str`` too (the pipeline's ``text`` column is string; the
    fixture dialect is latin-1-safe).
    """
    if isinstance(data, str):
        data = data.encode("latin-1", errors="replace")
    # bounded copy: lstrip() on the full payload would duplicate a
    # multi-MB document to check a 5-byte magic
    if not data[:1024].lstrip()[:5].startswith(b"%PDF-"):
        return []
    blocks: list[str] = []
    for stream in _STREAM_RE.finditer(data):
        body = stream.group(1)
        # /Filter /FlateDecode in THIS stream's object dict → inflate;
        # corrupt deflate data skips the stream (A17 never-fail). The
        # lookback is clipped at the previous object boundary so an
        # uncompressed stream right after a compressed one is never
        # misclassified by the earlier object's /Filter.
        head = data[max(0, stream.start() - 512) : stream.start()]
        boundary = max(head.rfind(b"endstream"), head.rfind(b"obj"))
        if boundary >= 0:
            head = head[boundary:]
        if b"/FlateDecode" in head:
            try:
                # decompressobj tolerates the trailing EOL before
                # `endstream` as unused data (plain decompress raises)
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        in_bt = False
        parts: list[str] = []
        pending: list[str] = []  # strings seen since the last show op
        for m in _CONTENT_RE.finditer(body):
            if m.group("str") is not None:
                if in_bt:
                    pending.append(_unescape_pdf_string(m.group("body")))
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
            elif m.group("td"):
                if parts and not parts[-1].endswith(" "):
                    parts.append(" ")
    return blocks


def make_fixture_pdf(blocks: list[list[str]], compress: bool = False) -> str:
    """Build a dialect PDF: one BT…ET object per block, one Td+Tj per line.

    Deterministic; used by the test goldens and the corpus generator
    (FIXTURES.md §6). Returns latin-1-safe ``str`` suitable for the
    ``spans.text`` column (latin-1 maps bytes 1:1, so a compressed
    stream round-trips through the string column losslessly).
    ``compress=True`` emits the content stream as /FlateDecode.
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    body_parts = []
    y = 700
    for block in blocks:
        lines = ["BT", "/F1 12 Tf"]
        for line in block:
            lines.append("0 %d Td" % (-14 if len(lines) > 2 else y))
            lines.append("(%s) Tj" % esc(line))
        lines.append("ET")
        body_parts.append("\n".join(lines))
        y -= 100
    content = "\n".join(body_parts)
    if compress:
        # level fixed for determinism; latin-1 keeps the bytes intact
        content = zlib.compress(content.encode("latin-1"), 6).decode("latin-1")
        stream_obj = (
            "4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj"
            % (len(content), content)
        )
    else:
        stream_obj = "4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj" % (
            len(content),
            content,
        )
    objs = [
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj",
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj",
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        "/MediaBox [0 0 612 792] >>\nendobj",
        stream_obj,
    ]
    out = ["%PDF-1.4"]
    offsets = []
    pos = len("%PDF-1.4\n")
    for o in objs:
        offsets.append(pos)
        out.append(o)
        pos += len(o) + 1
    xref = ["xref", "0 5", "0000000000 65535 f "]
    xref += ["%010d 00000 n " % off for off in offsets]
    out.append("\n".join(xref))
    out.append("trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % pos)
    return "\n".join(out)
