"""Streaming tag-soup HTML tokenizer (SURVEY.md A5–A13).

Re-expresses the reference tokenizer of the public repo
jrsell/XHtmlKit ([P: XHtmlKit/HtmlTextReader.cs,
XHtmlKit/HtmlStreamParser.cs]) as a single forward pass over a
decoded string. The reference is a ParseState machine over a
``TextReader``; here the whole document is in memory (one Arrow batch
row), so the inner scans use C-speed primitives (``str.find``,
compiled ``re``) with Python-level control flow only at token
boundaries — the vectorized analogue of the reference's
small-buffer streaming discipline (SURVEY.md §4.3).

Token forms (plain tuples, cheapest possible):

    ("text",    text)                       entity-decoded unless RAWTEXT
    ("open",    tag, attrs, self_closing)   tag/attr names lowercased
    ("close",   tag)
    ("comment", raw)                        comments, CDATA, <? ... ?>, bogus <!
    ("doctype", raw)

Semantics frozen by ``tests/golden/*`` (authored-as-spec, see
SURVEY.md §0):

* A5  text runs accumulate until ``<``; entities decoded (A10–A12).
* A6  ``<`` + ASCII letter starts a tag; otherwise ``<`` is literal text.
* A7  attributes: ``name``, ``name=value``; single/double/unquoted
      values; valueless → ``""``; duplicates: first wins; entities
      decoded in values.
* A8  ``</name junk>`` → close(name); junk discarded.
* A9  ``<!-- … -->`` comment (unterminated → EOF); ``<!DOCTYPE …>``
      consumed as doctype; ``<![CDATA[…]]>`` / other ``<!``/``<?``
      consumed as comment-like.
* A13 RAWTEXT elements (script, style): raw text until the matching
      ``</tag``, entities NOT decoded. RCDATA (title, textarea):
      same scan, entities ARE decoded.
"""

from __future__ import annotations

import re

from xkit.entities import decode_entities

__all__ = ["tokenize", "RAWTEXT_TAGS", "RCDATA_TAGS"]

# [P: XHtmlKit/HtmlStreamParser.cs] raw-content elements; title/textarea
# are RCDATA per HTML5 (entities decoded, no markup inside).
RAWTEXT_TAGS = frozenset({"script", "style"})
RCDATA_TAGS = frozenset({"title", "textarea"})

_TAG_NAME_RE = re.compile(r"[a-zA-Z][^\t\n\f\r />]*")
# attr name: everything up to ws / '/' / '>' / '='  (HTML5-ish)
_ATTR_NAME_RE = re.compile(r"[^\t\n\f\r /><=]+")
_WS = "\t\n\f\r "


def tokenize(html: str) -> list:
    """Tokenize ``html`` into the token list described above.

    Never raises on malformed input (A17): unterminated constructs are
    consumed to EOF.
    """
    tokens = []
    append = tokens.append
    s = html
    n = len(s)
    s_lower = None  # lazily lowered copy for case-insensitive RCDATA scans
    i = 0
    find = s.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            t = s[i:]
            # inlined decode_entities fast path: text runs without '&'
            # dominate, and the call overhead shows up at this volume
            append(("text", decode_entities(t) if "&" in t else t))
            break
        if lt > i:
            t = s[i:lt]
            append(("text", decode_entities(t) if "&" in t else t))
        i = lt + 1
        if i >= n:  # trailing lone '<'
            append(("text", "<"))
            break
        c = s[i]
        if c == "/":
            # A8: close tag
            m = _TAG_NAME_RE.match(s, i + 1)
            if m is None:
                # '</>' or '</ x>' → bogus, consume to '>' as comment
                gt = find(">", i)
                if gt < 0:
                    append(("comment", s[lt:]))
                    break
                append(("comment", s[lt : gt + 1]))
                i = gt + 1
                continue
            tag = m.group(0).lower()
            gt = find(">", m.end())
            if gt < 0:
                append(("close", tag))
                break
            append(("close", tag))
            i = gt + 1
        elif c == "!" or c == "?":
            i, tok = _read_markup_decl(s, lt)
            append(tok)
        elif ("a" <= c <= "z") or ("A" <= c <= "Z"):
            # A6/A7: open tag
            m = _TAG_NAME_RE.match(s, i)
            tag = m.group(0).lower()
            j = m.end()
            if j < n and s[j] == ">":  # bare tag: <p>, </i>… (majority case)
                i, attrs, self_closing, terminated = j + 1, {}, False, True
            else:
                i, attrs, self_closing, terminated = _read_attrs(s, j)
            append(("open", tag, attrs, self_closing))
            if not terminated:
                break
            if not self_closing and (tag in RAWTEXT_TAGS or tag in RCDATA_TAGS):
                # A13: raw scan to the matching '</tag' (case-insensitive).
                # The name must END there too: '</scriptx>' is still
                # script CONTENT (HTML5: close-tag name must be followed
                # by whitespace, '/' or '>').
                if s_lower is None:
                    s_lower = s.lower()
                end = s_lower.find("</" + tag, i)
                boundary = len(tag) + 2
                while end >= 0:
                    nxt = s_lower[end + boundary : end + boundary + 1]
                    if nxt == "" or nxt in "\t\n\f\r />":
                        break
                    end = s_lower.find("</" + tag, end + 1)
                if end < 0:
                    raw = s[i:]
                    if raw:
                        append(("text", raw if tag in RAWTEXT_TAGS else decode_entities(raw)))
                    break
                raw = s[i:end]
                if raw:
                    append(("text", raw if tag in RAWTEXT_TAGS else decode_entities(raw)))
                i = end  # close tag parsed by the normal path next loop
        else:
            # A6: '<' followed by non-name char is literal text
            append(("text", "<"))
    return tokens


def _read_markup_decl(s: str, lt: int):
    """Parse at ``s[lt] == '<'`` with s[lt+1] in '!?'. Returns (new_i, token)."""
    n = len(s)
    if s.startswith("<!--", lt):
        end = s.find("-->", lt + 4)
        if end < 0:  # A9: unterminated comment runs to EOF
            return n, ("comment", s[lt + 4 :])
        return end + 3, ("comment", s[lt + 4 : end])
    if s.startswith("<![CDATA[", lt):
        end = s.find("]]>", lt + 9)
        if end < 0:
            return n, ("comment", s[lt + 9 :])
        return end + 3, ("comment", s[lt + 9 : end])
    gt = s.find(">", lt)
    if gt < 0:
        body = s[lt:]
        gt_end = n
    else:
        body = s[lt : gt + 1]
        gt_end = gt + 1
    # only a <!doctype form is a doctype; <?doctype ...?> stays a
    # comment-like PI per the documented token forms
    if s[lt + 1] == "!" and len(s) >= lt + 9 and s[lt + 2 : lt + 9].lower() == "doctype":
        return gt_end, ("doctype", body)
    return gt_end, ("comment", body)


def _read_attrs(s: str, i: int):
    """Parse the attribute region of an open tag starting after the name.

    Returns ``(new_i, attrs_dict, self_closing, terminated)``;
    ``terminated`` is False when EOF hit before ``>`` (A17).
    """
    n = len(s)
    attrs: dict = {}
    self_closing = False
    while True:
        while i < n and s[i] in _WS:
            i += 1
        if i >= n:
            return i, attrs, self_closing, False
        c = s[i]
        if c == ">":
            return i + 1, attrs, self_closing, True
        if c == "/":
            if i + 1 < n and s[i + 1] == ">":
                return i + 2, attrs, True, True
            i += 1  # stray '/' inside tag: skipped
            continue
        m = _ATTR_NAME_RE.match(s, i)
        if m is None:
            i += 1  # stray '=' etc.
            continue
        name = m.group(0).lower()
        i = m.end()
        while i < n and s[i] in _WS:
            i += 1
        value = ""
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in _WS:
                i += 1
            if i < n:
                q = s[i]
                if q == '"' or q == "'":
                    end = s.find(q, i + 1)
                    if end < 0:  # unterminated quoted value → EOF (A17)
                        value = s[i + 1 :]
                        i = n
                    else:
                        value = s[i + 1 : end]
                        i = end + 1
                else:
                    # unquoted: up to ws or '>' ('/' is part of the value,
                    # HTML5 rule: <img src=x.png/> → value "x.png/")
                    j = i
                    while j < n and s[j] not in "\t\n\f\r >":
                        j += 1
                    value = s[i:j]
                    i = j
        if name not in attrs:  # A7: duplicate attr — first wins
            attrs[name] = decode_entities(value) if "&" in value else value
    # unreachable
