"""Minimal fixture-dialect PDF text extraction (SURVEY.md A26).

The north rule requires "PDF/layout parsing" in the pipeline
(BASELINE.json north_star); no PDF library exists in this sandbox
(SURVEY.md §0), so this module implements a from-scratch extractor
for a *documented dialect subset* co-designed with the fixture
generator (:func:`make_fixture_pdf`, FIXTURES.md §6):

* uncompressed streams, plus ``/Filter /FlateDecode`` streams
  (inflated with stdlib zlib — the filter that covers the vast
  majority of real-world PDF content streams),
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

Out of scope, documented: **xref streams and object streams**
(PDF 1.5 cross-reference/compressed-object containers) — those need a
/W-field binary decoder and per-object re-inflation; files using them
simply take the byte-order fallback. Font CMaps / non-Latin encodings
are likewise out of reach without font tables.

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
      | (?P<hex><(?P<hexbody>[0-9A-Fa-f\s]*)>)
      | \b(?P<bt>BT)\b
      | \b(?P<et>ET)\b
      | \b(?P<tj>Tj)\b
      | \b(?P<TJ>TJ)\b
      | (?P<quote>['"])
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


def _scan_content(body: bytes, blocks: list) -> None:
    """Token-scan ONE (possibly concatenated) content stream, appending
    each non-empty BT…ET text object to ``blocks``."""
    in_bt = False
    parts: list[str] = []
    pending: list[str] = []  # strings seen since the last show op
    for m in _CONTENT_RE.finditer(body):
        if m.group("str") is not None:
            if in_bt:
                pending.append(_unescape_pdf_string(m.group("body")))
        elif m.group("hex") is not None:
            # <48656C6C6F> hex string form; whitespace allowed inside,
            # odd trailing digit pads with 0 (PDF spec rule)
            if in_bt:
                h = re.sub(rb"\s+", b"", m.group("hexbody"))
                if len(h) % 2:
                    h += b"0"
                # h is pure hex by the regex class — fromhex cannot fail
                pending.append(bytes.fromhex(h.decode("ascii")).decode("latin-1"))
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


def _decode_stream(obj: bytes) -> bytes | None:
    """The stream body of one object slice, /FlateDecode-inflated when
    the object's own dict says so; None when absent or corrupt."""
    m = _STREAM_RE.search(obj)
    if m is None:
        return None
    body = m.group(1)
    if b"/FlateDecode" in obj[: m.start()]:
        try:
            # decompressobj tolerates the trailing EOL before
            # `endstream` as unused data (plain decompress raises)
            body = zlib.decompressobj().decompress(body)
        except zlib.error:
            return None
    return body


# classic xref-table machinery (xref STREAMS are out of scope — see
# module doc — and simply fail this parse, taking the fallback)
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


def _object_at(data: bytes, objnum: int, offsets: dict) -> bytes | None:
    off = offsets.get(objnum)
    if off is None or off >= len(data):
        return None
    m = re.compile(rb"\s*%d\s+\d+\s+obj\b" % objnum).match(data, off)
    if m is None:
        return None
    end = data.find(b"endobj", m.end())
    # an object whose STREAM contains the bytes "endobj" would truncate
    # here; dialect streams never do, and truncation only loses text,
    # never raises
    return data[m.end() : end if end >= 0 else len(data)]


def _page_content_objs(data: bytes, offsets: dict) -> list | None:
    """Walk trailer /Root → /Pages → /Kids → /Contents; returns the
    content-object numbers grouped per page (document order), or None
    when the walk cannot complete (→ caller falls back)."""
    root = None
    for m in _ROOT_RE.finditer(data):  # last trailer wins
        root = int(m.group(1))
    if root is None:
        return None
    catalog = _object_at(data, root, offsets)
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
        node = _object_at(data, objnum, offsets)
        if node is None:
            return
        kids = _KIDS_RE.search(node)
        if kids is not None:
            for ref in _REF_RE.finditer(kids.group(1)):
                walk(int(ref.group(1)), depth + 1)
            return
        arr = _CONTENTS_ARR_RE.search(node)
        if arr is not None:
            pages.append([int(r.group(1)) for r in _REF_RE.finditer(arr.group(1))])
            return
        one = _CONTENTS_ONE_RE.search(node)
        if one is not None:
            pages.append([int(one.group(1))])

    walk(int(pages_ref.group(1)), 0)
    return pages if pages else None


def extract_pdf_text(data: bytes | str) -> list[str]:
    """Extract ordered text blocks (one per BT…ET object) from PDF bytes.

    Pages come from the xref-table + page-tree walk when possible
    (document order, multi-stream pages concatenated, non-content
    streams skipped); otherwise every stream is scanned in byte order.
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
    offsets = _parse_xref_tables(data)
    pages = _page_content_objs(data, offsets) if offsets else None
    if pages is not None:
        unresolved = False
        for content_objs in pages:
            bodies = []
            for objnum in content_objs:
                obj = _object_at(data, objnum, offsets)
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
                # PDF semantics: a page's content streams form ONE
                # stream when concatenated (operators may span the
                # boundary); the joining byte keeps tokens separated
                _scan_content(b"\n".join(bodies), blocks)
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
        body = stream.group(1)
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        _scan_content(body, blocks)
    return blocks


def make_fixture_pdf(
    blocks: list[list[str]] | None = None,
    compress: bool = False,
    pages: list[list[list[str]]] | None = None,
    streams_per_page: int = 1,
    reverse_content: bool = False,
    extra_stream: str | None = None,
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
    """

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    if pages is None:
        pages = [blocks or []]
    n_pages = len(pages)
    page_nums = list(range(3, 3 + n_pages))
    content_base = 3 + n_pages

    def page_content(page_blocks: list) -> str:
        body_parts = []
        y = 700
        for block in page_blocks:
            lines = ["BT", "/F1 12 Tf"]
            for line in block:
                lines.append("0 %d Td" % (-14 if len(lines) > 2 else y))
                lines.append("(%s) Tj" % esc(line))
            lines.append("ET")
            body_parts.append("\n".join(lines))
            y -= 100
        return "\n".join(body_parts)

    def stream_obj(num: int, content: str) -> str:
        if compress:
            # level fixed for determinism; latin-1 keeps the bytes intact
            content = zlib.compress(content.encode("latin-1"), 6).decode("latin-1")
            return (
                "%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj"
                % (num, len(content), content)
            )
        return "%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj" % (
            num,
            len(content),
            content,
        )

    page_objs: list = []
    content_objs: list = []  # (objnum, text)
    next_content = content_base
    for pi, page_blocks in enumerate(pages):
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
        refs = (
            "%d 0 R" % nums[0]
            if len(nums) == 1
            else "[%s]" % " ".join("%d 0 R" % n for n in nums)
        )
        page_objs.append(
            (
                page_nums[pi],
                "%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %s "
                "/MediaBox [0 0 612 792] >>\nendobj" % (page_nums[pi], refs),
            )
        )
    if extra_stream is not None:
        content_objs.append((next_content, stream_obj(next_content, extra_stream)))
        next_content += 1
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
