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

__all__ = ["repair", "serialize", "VOID_TAGS", "CLOSED_BY"]

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


def repair(tokens: list) -> list:
    """Fold raw tokens into a well-nested event stream (see module doc)."""
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
            while stack and _closes(stack[-1], tag):
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


def serialize(events: list) -> str:
    """Canonical XHTML-ish serialization of a repaired event stream.

    Mirrors the reference's golden-string test style ([P:
    XHtmlKit.Tests/HtmlParserTests.cs] asserts on ``OuterXml``); used
    by our pytest goldens to pin the repair rules. Attributes keep
    insertion order; values double-quoted with minimal escaping.
    """
    out = []
    push = out.append
    for ev in events:
        kind = ev[0]
        if kind == "open":
            attrs = ev[2]
            if attrs:
                push(
                    "<%s %s>"
                    % (
                        ev[1],
                        " ".join(
                            '%s="%s"' % (k, _escape_text(v).replace('"', "&quot;"))
                            for k, v in attrs.items()
                        ),
                    )
                )
            else:
                push("<%s>" % ev[1])
        elif kind == "close":
            push("</%s>" % ev[1])
        elif kind == "text":
            push(_escape_text(ev[1]))
        elif kind == "comment":
            push("<!--%s-->" % ev[1])
        # doctype omitted from canonical form
    return "".join(out)
