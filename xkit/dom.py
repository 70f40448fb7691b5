"""Tag-soup repair: token stream → well-nested event stream (SURVEY.md A14–A19).

The reference folds tokens into an ``XmlDocument`` via a DomBuilder
([P: XHtmlKit/HtmlStreamParser.cs, XmlDomBuilder.cs]); the repair
rules (void elements, implicit sibling closes, stray-close handling,
EOF recovery) live in that fold. We produce a *repaired event stream*
instead of an object tree — the downstream extractor (xkit.extract)
is a streaming consumer, so materializing a tree per document would
only cost allocations (SURVEY.md §4.3 allocation discipline).

Events (well-nested by construction):

    ("open",  tag, attrs)    opens always get a matching close
    ("close", tag)
    ("text",  text)
    ("comment", raw) / ("doctype", raw)   passed through (dropped later)

Repair rules (frozen by tests/golden/malformed_markup.json):

* A14 void elements never take children; ``<x/>`` self-close honored
  on any tag.
* A15 implicit sibling closing: a table of "tags auto-closed by a new
  sibling" is consulted on every open; the check walks the top of the
  open stack repeatedly (``<table><tr><td>x<tr>`` pops td then tr).
  ``head`` is closed by any non-head-only tag (lightweight A18).
* A16 stray ``</x>`` with no open ``x`` is dropped; ``</x>`` matching
  a non-top ancestor pops (auto-closes) everything above it.
* A17 EOF closes all still-open elements; parser never raises.
"""

from __future__ import annotations

__all__ = ["repair", "sanitize_xml_name", "serialize", "VOID_TAGS", "CLOSED_BY"]

# [P: XHtmlKit tag metadata] — HTML5 void element set.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_P_CLOSERS = frozenset(
    """address article aside blockquote details div dl fieldset figcaption
       figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p
       pre section table ul""".split()
)

# tag on top of the open stack → set of incoming tags that implicitly
# close it (A15). [P: XHtmlKit/HtmlStreamParser.cs tag metadata],
# rule set frozen by the malformed-markup goldens.
CLOSED_BY = {
    "p": _P_CLOSERS,
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "td": frozenset({"td", "th", "tr", "tbody", "thead", "tfoot"}),
    "th": frozenset({"td", "th", "tr", "tbody", "thead", "tfoot"}),
    "tr": frozenset({"tr", "tbody", "thead", "tfoot"}),
    "thead": frozenset({"tbody", "tfoot"}),
    "tbody": frozenset({"tbody", "tfoot"}),
    "tfoot": frozenset({"tbody"}),
    "option": frozenset({"option", "optgroup"}),
    "optgroup": frozenset({"optgroup"}),
    "caption": frozenset({"thead", "tbody", "tfoot", "tr", "colgroup"}),
}

# head is auto-closed by anything that is not head-only content (A18).
_HEAD_ONLY = frozenset(
    {"title", "meta", "link", "base", "style", "script", "noscript", "template"}
)


def _closes(top: str, tag: str, fragment: bool = False) -> bool:
    if top == "head" and not fragment:
        # full-page A18 rule only: a fragment has no head/body
        # structure, so nothing implicitly closes a literal <head>
        return tag not in _HEAD_ONLY and tag != "head"
    closers = CLOSED_BY.get(top)
    return closers is not None and tag in closers


def repair(tokens: list, fragment: bool = False) -> list:
    """Fold raw tokens into a well-nested event stream (see module doc).

    ``fragment`` disables the full-page head auto-close rule (A18/§3.3)
    for snippet inputs, mirroring ExtractOptions.fragment.
    """
    events: list = []
    append = events.append
    stack: list = []
    for tok in tokens:
        kind = tok[0]
        if kind == "text":
            append(tok)
        elif kind == "open":
            tag = tok[1]
            # A15: implicit sibling closes, repeated on the stack top
            while stack and _closes(stack[-1], tag, fragment):
                append(("close", stack.pop()))
            if tag in VOID_TAGS:
                append(("open", tag, tok[2]))
                append(("close", tag))
            elif tok[3]:  # explicit <x/> self-close (A14)
                append(("open", tag, tok[2]))
                append(("close", tag))
            else:
                append(("open", tag, tok[2]))
                stack.append(tag)
        elif kind == "close":
            tag = tok[1]
            if tag in VOID_TAGS:
                continue  # A16: </br> and friends dropped
            if tag in stack:
                while True:  # A16: pop through to the matching ancestor
                    top = stack.pop()
                    append(("close", top))
                    if top == tag:
                        break
            # else: stray close with no open match → dropped (A16)
        else:  # comment / doctype
            append(tok)
    while stack:  # A17: EOF recovery
        append(("close", stack.pop()))
    return events


def _escape_text(s: str) -> str:
    if "&" in s:
        s = s.replace("&", "&amp;")
    if "<" in s:
        s = s.replace("<", "&lt;")
    if ">" in s:
        s = s.replace(">", "&gt;")
    return s


def sanitize_xml_name(name: str) -> str:
    """A19: coerce a tag-soup tag/attribute name into a valid XML name
    (the reference routes names through System.Xml, which rejects or
    encodes invalid ones — [P: XHtmlKit/XmlDomBuilder.cs]).

    Conservative ASCII rule: ``[A-Za-z_][A-Za-z0-9_.-]*`` — every
    offending character becomes ``_`` and a bad first character gets a
    ``_`` prefix. Deterministic and reversible enough for dedup keys;
    Unicode name characters (XML allows many) are deliberately not
    whitelisted — tokenized tag names are ASCII-led by grammar, and
    attr-name unicode is rare tag soup.
    """
    out = []
    for ch in name:
        if (
            ("a" <= ch <= "z")
            or ("A" <= ch <= "Z")
            or ("0" <= ch <= "9")
            or ch in "_-."
        ):
            out.append(ch)
        else:
            out.append("_")
    s = "".join(out)
    if not s:
        return "_"
    c = s[0]
    if not (("a" <= c <= "z") or ("A" <= c <= "Z") or c == "_"):
        s = "_" + s
    return s


# XML 1.0 forbids C0 controls other than \t\n\r, lone surrogates, and
# U+FFFE/U+FFFF — strip them in xml_safe mode (tag soup carries real
# control bytes; escaping can't make them legal)
import re as _re

_XML_INVALID_RE = _re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]"
)


def _xml_safe_chars(s: str) -> str:
    return _XML_INVALID_RE.sub("", s)


def _xml_safe_comment(raw: str) -> str:
    # XML forbids '--' inside comments and a trailing '-'
    raw = _xml_safe_chars(raw)
    while "--" in raw:
        raw = raw.replace("--", "- -")
    if raw.endswith("-"):
        raw += " "
    return raw


def serialize(events: list, xml_safe: bool = False) -> str:
    """Canonical XHTML-ish serialization of a repaired event stream.

    Mirrors the reference's golden-string test style ([P:
    XHtmlKit.Tests/HtmlParserTests.cs] asserts on ``OuterXml``); used
    by our pytest goldens to pin the repair rules. Attributes keep
    insertion order; values double-quoted with minimal escaping.

    ``xml_safe=True`` additionally enforces A19 + well-formedness:
    tag/attribute names sanitized to valid XML names (duplicates AFTER
    sanitization drop — XML forbids repeated attribute names),
    XML-invalid characters (C0 controls, lone surrogates, U+FFFE/F)
    stripped from text/attribute/comment content, comment bodies made
    XML-legal. The default stays byte-compatible with the frozen
    serialization goldens.
    """
    out = []
    push = out.append
    for ev in events:
        kind = ev[0]
        if kind == "open":
            attrs = ev[2]
            tag = sanitize_xml_name(ev[1]) if xml_safe else ev[1]
            if attrs:
                if xml_safe:
                    clean: dict = {}
                    for k, v in attrs.items():
                        sk = sanitize_xml_name(k)
                        if sk not in clean:  # first wins, like A7
                            clean[sk] = _xml_safe_chars(v)
                    attrs = clean
                push(
                    "<%s %s>"
                    % (
                        tag,
                        " ".join(
                            '%s="%s"' % (k, _escape_text(v).replace('"', "&quot;"))
                            for k, v in attrs.items()
                        ),
                    )
                )
            else:
                push("<%s>" % tag)
        elif kind == "close":
            push("</%s>" % (sanitize_xml_name(ev[1]) if xml_safe else ev[1]))
        elif kind == "text":
            push(_escape_text(_xml_safe_chars(ev[1]) if xml_safe else ev[1]))
        elif kind == "comment":
            push("<!--%s-->" % (_xml_safe_comment(ev[1]) if xml_safe else ev[1]))
        # doctype omitted from canonical form
    return "".join(out)
