"""HTML entity decoding (SURVEY.md A10–A12).

Reference behavior ([P: XHtmlKit/HtmlEntities.cs], public repo
jrsell/XHtmlKit): decode the full WHATWG HTML5 named entity table
(~2k names), numeric decimal/hex character references, pass unknown
``&foo;`` through literally, and apply decoding only in Text and
AttrValue tokenizer states (never inside script/style RCDATA).

Implementation: the WHATWG table ships with CPython as
``html.entities.html5`` — the very same data XHtmlKit embeds as a
generated C# file — so no hand-copied table is needed. We implement
the reference-decoder semantics with one compiled regex + dict lookup:

* ``&name;``  — full HTML5 table, longest-name-first via regex
  greediness; unknown names pass through literally.
* ``&name``   — legacy names that the WHATWG table allows without a
  trailing semicolon (``&amp``, ``&lt`` …) are decoded; others pass
  through.
* ``&#123;`` / ``&#x1F600;`` — numeric references. Per the WHATWG
  spec (and html.unescape): NUL, surrogates and out-of-Unicode-range
  map to U+FFFD; the C1 range 0x80–0x9F is remapped through the
  Windows-1252 table (``&#151;`` → ``—``).

These are exactly the semantics of ``html.unescape`` (CPython's
reference WHATWG implementation), so we delegate to it; the pytest
goldens in ``tests/golden/entities.json`` freeze the behavior so a
future stdlib change would be caught.

Scope control (A12) lives in the tokenizer: it calls
:func:`decode_entities` only for Text and AttrValue tokens.
"""

from __future__ import annotations

from html import unescape as _unescape

__all__ = ["decode_entities"]


def decode_entities(s: str) -> str:
    """Decode HTML character references in ``s`` (WHATWG semantics).

    Fast path: no ``&`` → return the same object (zero-copy; the hot
    path is dominated by text runs without entities).
    """
    if "&" not in s:
        return s
    return _unescape(s)
