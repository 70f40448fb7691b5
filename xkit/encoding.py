"""Charset sniffing + decoding (SURVEY.md A3–A4).

Reference behavior ([P: XHtmlKit.Network/HttpClientExtensions.cs
GetTextReaderAsync] and the encoding helper in XHtmlKit): charset
priority is HTTP header (when present) → BOM → ``<meta>`` sniff of
the first bytes, re-decoding the buffered window when the meta
declaration disagrees with the provisional codec → UTF-8 fallback.

In the batch pipeline the whole payload is available, so "re-decode
the window" degenerates to: pick the winning codec first, decode
once. Decode never raises (errors="replace") — A17's never-fail
discipline extended to bytes.
"""

from __future__ import annotations

import codecs
import re

__all__ = ["sniff", "decode_html_bytes", "SNIFF_WINDOW"]

SNIFF_WINDOW = 4096  # bytes scanned for <meta> declarations (A4)

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:
            charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)
          | content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_\-]+)
         )""",
    re.IGNORECASE | re.VERBOSE,
)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8", 3),
    (codecs.BOM_UTF32_LE, "utf-32-le", 4),  # must test before UTF-16LE
    (codecs.BOM_UTF32_BE, "utf-32-be", 4),
    (codecs.BOM_UTF16_LE, "utf-16-le", 2),
    (codecs.BOM_UTF16_BE, "utf-16-be", 2),
)


def _normalize(label: str) -> str | None:
    label = label.strip().lower()
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff(data: bytes, http_charset: str | None = None) -> tuple[str, int]:
    """Return ``(codec_name, bom_bytes_to_skip)`` for an HTML payload.

    Priority (A3/A4): HTTP header charset → BOM → ``<meta>`` within the
    first ``SNIFF_WINDOW`` bytes → UTF-8 fallback.
    """
    if http_charset:
        codec = _normalize(http_charset)
        if codec:
            # still skip a matching BOM so it never shows up as text
            for bom, bom_codec, skip in _BOMS:
                if data.startswith(bom) and bom_codec.split("-le")[0].split("-be")[0] in codec:
                    return codec, skip
            return codec, 0
    for bom, codec, skip in _BOMS:
        if data.startswith(bom):
            return codec, skip
    m = _META_RE.search(data[:SNIFF_WINDOW])
    if m:
        label = (m.group(1) or m.group(2)).decode("ascii", "ignore")
        codec = _normalize(label)
        if codec and not codec.startswith("utf-16") and not codec.startswith("utf-32"):
            # a meta label can't declare a BOM-less UTF-16/32 doc we just
            # read as ASCII-compatible; ignore such liars (frozen)
            return codec, 0
    return "utf-8", 0


def decode_html_bytes(data: bytes, http_charset: str | None = None) -> str:
    """Sniff + decode; never raises (undecodable bytes → U+FFFD)."""
    codec, skip = sniff(data, http_charset)
    return data[skip:].decode(codec, errors="replace")
