"""XPath-lite: the reference's native query idiom over this engine.

XHtmlKit's user-facing query surface is XPath (`SelectNodes` /
`SelectSingleNode` over the repaired tree; [P: XHtmlKit README.md]).
This module accepts the high-frequency XPath subset those queries
actually use and compiles it to the CSS-selector-lite grammar of
``xkit.selector`` — one translator, one evaluator, one set of frozen
semantics (the selector goldens). Anything outside the subset raises
``ValueError`` loudly at parse time, exactly like the selector grammar
does; nothing is silently mis-translated.

Supported subset and its mapping:

    //tag                        → tag          (descendant)
    /html/body/div               → html > body > div   (child steps)
    step//step                   → descendant combinator
    *                            → *
    [@attr]                      → [attr]
    [@attr='v'] / [@attr="v"]    → [attr='v']   (exact match)
    [contains(@attr,'v')]        → [attr*='v']
    [starts-with(@attr,'v')]     → [attr^='v']
    [.//tag]  (final step only)  → :has(tag)    — container filtering
    [N]   (integer literal)      → :nth-of-type(N)  — XPath child::tag[N]
                                   selects the N-th same-tag child of
                                   each parent, which is exactly CSS
                                   nth-of-type; for a ``*`` step it
                                   counts ALL element children, i.e.
                                   :nth-child(N)
    [last()]                     → :last-of-type (``*``: :last-child)
    trailing /@attr              → @attr projection
    trailing /text()             → subtree-text projection (default)
    p1 | p2                      → comma group

Absolute paths anchor exactly: ``/div/p`` → ``div:root > p`` (the
selector grammar's ``:root`` matches elements with no element
ancestors, so a leading ``/`` step only matches the document element —
or each top-level element in fragment mode, mirroring XPath over a
fragment's node-set). Everything else —
other axes (``ancestor::``, ``following-sibling::``),
``..``, ``node()``, ``position()`` arithmetic, nested paths in
predicates — raises ``ValueError`` naming the unsupported construct.
"""

from __future__ import annotations

import re

from xkit.selector import select_html

__all__ = ["xpath_to_selector", "select_html_xpath"]

_NAME = r"[A-Za-z_][A-Za-z0-9_.:-]*"
_NAME_RE = re.compile(_NAME + r"$")
_STEP_RE = re.compile(rf"({_NAME}|\*)")
_PRED_ATTR = re.compile(rf"^@({_NAME})$")
_PRED_ATTR_EQ = re.compile(rf"^@({_NAME})\s*=\s*('([^']*)'|\"([^\"]*)\")$")
_PRED_FN = re.compile(
    rf"^(contains|starts-with)\(\s*@({_NAME})\s*,\s*('([^']*)'|\"([^\"]*)\")\s*\)$"
)
_PRED_INT = re.compile(r"^[0-9]+$")
_PRED_HAS = re.compile(rf"^\.//({_NAME}|\*)$")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on sep outside quotes and brackets."""
    parts, depth, quote, start = [], 0, "", 0
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _quote_val(v: str, xpath: str) -> str:
    if "'" not in v:
        return f"'{v}'"
    if '"' not in v:
        return f'"{v}"'
    raise ValueError(f"unsupported XPath (mixed quotes in value): {xpath!r}")


def _translate_predicate(pred: str, tag: str, xpath: str) -> str:
    pred = pred.strip()
    m = _PRED_ATTR.match(pred)
    if m:
        return f"[{m.group(1)}]"
    m = _PRED_ATTR_EQ.match(pred)
    if m:
        val = m.group(3) if m.group(3) is not None else m.group(4)
        return f"[{m.group(1)}={_quote_val(val, xpath)}]"
    m = _PRED_FN.match(pred)
    if m:
        op = "*=" if m.group(1) == "contains" else "^="
        val = m.group(4) if m.group(4) is not None else m.group(5)
        return f"[{m.group(2)}{op}{_quote_val(val, xpath)}]"
    if _PRED_INT.match(pred):
        kind = "nth-child" if tag == "*" else "nth-of-type"
        return f":{kind}({int(pred)})"
    if pred == "last()":
        return ":last-child" if tag == "*" else ":last-of-type"
    m = _PRED_HAS.match(pred)
    if m:
        return f":has({m.group(1)})"
    raise ValueError(f"unsupported XPath predicate {pred!r} in {xpath!r}")


def _translate_path(path: str, xpath: str) -> str:
    path = path.strip()
    if not path:
        raise ValueError(f"empty XPath path in {xpath!r}")
    # leading axis: '//' = descendant-from-root (selector default);
    # '/' = absolute — the first step anchors to the document element
    # via the selector grammar's :root pseudo
    absolute = False
    if path.startswith("//"):
        rest = path[2:]
    elif path.startswith("/"):
        rest = path[1:]
        absolute = True
    else:
        rest = path  # relative = descendant, like '//'

    # walk steps; '//' between steps = descendant, '/' = child
    out: list[str] = []
    i, n = 0, len(rest)
    combinator = ""  # before the first step
    while i < n:
        if rest.startswith("//", i):
            combinator, i = " ", i + 2
        elif rest.startswith("/", i):
            combinator, i = " > ", i + 1
        # projection steps must be final
        if rest.startswith("@", i):
            name = rest[i + 1 :]
            if not _NAME_RE.match(name):
                raise ValueError(f"unsupported XPath attribute step in {xpath!r}")
            if not out:
                raise ValueError(f"unsupported XPath (bare attribute): {xpath!r}")
            return "".join(out) + f" @{name}"
        if rest.startswith("text()", i):
            if i + 6 != n or not out:
                raise ValueError(f"unsupported XPath text() position in {xpath!r}")
            return "".join(out)  # subtree text is the default projection
        m = _STEP_RE.match(rest, i)
        if not m:
            raise ValueError(f"unsupported XPath step at {rest[i:]!r} in {xpath!r}")
        tag = m.group(1)
        if ":" in tag and tag != "*":
            raise ValueError(f"unsupported XPath axis {tag!r} in {xpath!r}")
        i = m.end()
        preds: list[str] = []
        while i < n and rest[i] == "[":
            depth, j, quote = 1, i + 1, ""
            while j < n and depth:
                ch = rest[j]
                if quote:
                    if ch == quote:
                        quote = ""
                elif ch in "'\"":
                    quote = ch
                elif ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError(f"unterminated predicate in {xpath!r}")
            preds.append(_translate_predicate(rest[i + 1 : j - 1], tag, xpath))
            i = j
        anchor = ":root" if absolute and not out else ""
        out.append(combinator + tag + anchor + "".join(preds))
        combinator = ""
        if i < n and rest[i] not in "/":
            raise ValueError(f"unsupported XPath syntax at {rest[i:]!r} in {xpath!r}")
    if not out:  # bare '/', '//', or all-separator input
        raise ValueError(f"empty XPath path in {xpath!r}")
    # [.//x] compiles to :has(), which the selector grammar accepts on
    # the SUBJECT compound only — reject it on earlier steps here so
    # the translator never emits a selector the evaluator rejects
    if any(":has(" in step for step in out[:-1]):
        raise ValueError(
            f"unsupported XPath ([.//…] only on the final step): {xpath!r}"
        )
    return "".join(out)


def xpath_to_selector(xpath: str) -> str:
    """Compile an XPath-lite expression to the selector grammar.

    Raises ValueError on anything outside the documented subset.
    """
    if not isinstance(xpath, str) or not xpath.strip():
        raise ValueError("empty XPath expression")
    paths = [_translate_path(p, xpath) for p in _split_top(xpath, "|")]
    return ", ".join(paths)


def select_html_xpath(html, xpath: str, options=None):
    """Run an XPath-lite query over a document: translate once, then
    evaluate with the selector engine (same repaired event stream,
    same golden-frozen semantics)."""
    sel = xpath_to_selector(xpath)
    if options is None:
        return select_html(html, sel)
    return select_html(html, sel, options)
