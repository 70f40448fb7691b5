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
    [p1 and p2]                  → both predicates on the compound
    [not(@attr)]                 → :not([attr])
    [text()='v'] / [.='v']       → :text-is('v')   (final step only;
                                   tested on the whitespace-collapsed
                                   SUBTREE text — identical to the
                                   text-node test on leaf elements)
    [contains(text(),'v')]       → :contains('v')  (likewise; also
    [contains(.,'v')]              accepts the . form)
    [N]   (integer literal)      → :nth-of-type(N)  — XPath child::tag[N]
                                   selects the N-th same-tag child of
                                   each parent, which is exactly CSS
                                   nth-of-type; for a ``*`` step it
                                   counts ALL element children, i.e.
                                   :nth-child(N)
    [last()]                     → :last-of-type (``*``: :last-child)
    [last()-K]                   → :nth-last-of-type(K+1)
    [position() OP rhs]          → the an+b forms of the same pseudos:
                                   rhs an integer N → =::nth-of-type(N),
                                   <=:(-n+N), <:(-n+N-1), >=:(n+N),
                                   >:(n+N+1), !=::not(:nth-of-type(N));
                                   rhs ``last()``/``last()-K`` → the
                                   :nth-last-of-type twins (counting
                                   from the end); comparisons that no
                                   position satisfies (position()<1,
                                   position()>last()) compile to the
                                   never-matching :nth-of-type(0) —
                                   exact, silent-empty like XPath
    [position() mod A = B]       → :nth-of-type(An+B) (B≥A: never
                                   matches; A=0 rejected — XPath
                                   division by zero)
                                   — all position()/last() arithmetic
                                   is child-axis only, like [N]
    trailing /@attr              → @attr projection
    trailing /text()             → subtree-text projection (default)
    p1 | p2                      → comma group
    a/following-sibling::b       → a ~ b      (general sibling; prefix
                                   carries over — siblings share every
                                   ancestor; further steps may follow)
    a/preceding-sibling::b       → b:has(~ a) — b with a FOLLOWING
                                   sibling matching the context step;
                                   the context step's own prefix
                                   re-attaches to b verbatim. Final
                                   step only (:has is subject-only)
    a/parent::t,  a/..           → t:has(> a) (／*:has(> a)) — exact
                                   for a single-step prefix; longer
                                   prefixes are rejected (the parent
                                   may BE the prefix element, which
                                   the chain grammar can't express).
                                   Final step only
    a/child::b                   → a > b      (explicit '/' spelling;
                                   [N] keeps nth-of-type meaning)
    a/descendant::b              → a b        (explicit '//' spelling)
    a/ancestor::t                → t:has(a)   — same single-step-prefix
                                   and final-step bounds as parent::
    a/self::t[p]                 → the target compound merged into the
                                   context step (same element, extra
                                   constraints); a different element
                                   NAME can never match → the compound
                                   gains :not(*) (exact empty, like
                                   XPath). Any non-final position
    a/ancestor-or-self::t        → comma-group union of the ancestor::
                                   arm (t:has(a)) and the merged self
                                   arm (dropped when the names can't
                                   coexist); same single-step-prefix +
                                   final-step bounds as ancestor::
    a/descendant-or-self::t      → union of the descendant arm (a t)
                                   and the merged self arm; any prefix,
                                   final step only (+ projections).
                                   Overlapping arms dedupe at emission
                                   — one (element, projection) row
    a/following::t               → t:after(a) — t OPENS after an a
                                   CLOSES (strict event order ≡ the
                                   axis node-set: a's descendants and
                                   ancestors never match); ancestor::
                                   bounds (single-step prefix, final)
    a/preceding::t               → t:before(a) — t CLOSES before an a
                                   OPENS; same bounds
    [normalize-space()='v']      → :text-is('v')  (also (.) / (text());
                                   the collapsed subtree text IS
                                   normalize-space)
    positional predicates ([N], [last()]) are REJECTED on axis steps
    other than child::: there they index the axis node-set, not
    same-tag children

Step names are restricted to the selector-expressible charset
(``[A-Za-z_][A-Za-z0-9_-]*``): a dot or colon in a tag or trailing
``@attr`` projection cannot round-trip through the selector grammar
(both are compound delimiters there), so such names raise ValueError
instead of mis-translating; attribute names inside predicates keep
the wider XML charset (``xml:lang``, ``data.foo``).

Absolute paths anchor exactly: ``/div/p`` → ``div:root > p`` (the
selector grammar's ``:root`` matches elements with no element
ancestors, so a leading ``/`` step only matches the document element —
or each top-level element in fragment mode, mirroring XPath over a
fragment's node-set). All 13 XPath 1.0 axes are now accounted for:
the 11 element axes translate (child, descendant, parent, ancestor,
self, the two -or-self forms, both sibling axes, following,
preceding), the attribute axis is the ``/@attr`` projection, and the
namespace axis is out of scope with XML namespaces themselves.
Everything else — ``node()``, nested paths in predicates,
``position()`` arithmetic beyond the OP/mod/last()-K forms — raises
``ValueError`` naming the unsupported construct.
"""

from __future__ import annotations

import re

from xkit.selector import parse_selector, select_html

__all__ = ["xpath_to_selector", "select_html_xpath"]

# Two name charsets, both narrower than XPath's NCName on purpose:
# the selector grammar terminates tag/projection names at any of
# " .#[@,>+~:" (selector._NAME_END), so a dot or colon in a STEP or a
# trailing @attr projection can never round-trip — reject it here
# rather than emit a selector the evaluator refuses. Attribute names
# inside [brackets] are scanned up to the operator/']' by the selector
# parser, so dots/colons stay legal there (xml:lang, data.foo).
_TAG = r"[A-Za-z_][A-Za-z0-9_-]*"
_ATTR = r"[A-Za-z_][A-Za-z0-9_.:-]*"
_PROJ_RE = re.compile(rf"{_TAG}$")
_STEP_RE = re.compile(rf"({_TAG}|\*)")
_AXIS_RE = re.compile(r"[A-Za-z-]+::")
_PRED_ATTR = re.compile(rf"^@({_ATTR})$")
_PRED_ATTR_EQ = re.compile(rf"^@({_ATTR})\s*=\s*('([^']*)'|\"([^\"]*)\")$")
_PRED_FN = re.compile(
    rf"^(contains|starts-with)\(\s*@({_ATTR})\s*,\s*('([^']*)'|\"([^\"]*)\")\s*\)$"
)
_PRED_INT = re.compile(r"^[0-9]+$")
# position()/last() arithmetic — child-axis only, like [N]. The rhs is
# an integer literal or last() (optionally minus an integer); the full
# XPath numeric expression grammar stays out of scope.
_PRED_LAST_MINUS = re.compile(r"^last\(\)\s*-\s*([0-9]+)$")
_PRED_POS = re.compile(
    r"^position\(\)\s*(!=|<=|>=|=|<|>)\s*"
    r"(?:([0-9]+)|last\(\)(?:\s*-\s*([0-9]+))?)$"
)
_PRED_POS_MOD = re.compile(r"^position\(\)\s*mod\s*([0-9]+)\s*=\s*([0-9]+)$")
_PRED_HAS = re.compile(rf"^\.//({_TAG}|\*)$")
_PRED_NOT = re.compile(rf"^not\(\s*@({_ATTR})\s*\)$")
# [text()='v'] / [.='v'] and [contains(text(),'v')] / [contains(.,'v')]
# — mapped onto the collapsed-subtree-text pseudos (see xkit.selector)
_PRED_TEXT_EQ = re.compile(
    r"^(text\(\)|\.)\s*=\s*('([^']*)'|\"([^\"]*)\")$"
)
_PRED_TEXT_CONTAINS = re.compile(
    r"^contains\(\s*(text\(\)|\.)\s*,\s*('([^']*)'|\"([^\"]*)\")\s*\)$"
)
# [normalize-space()='v'] / [normalize-space(.)='v'] /
# [normalize-space(text())='v'] — the evaluator's :text-is already
# compares the whitespace-COLLAPSED subtree text (strip + runs→single
# space, the Unicode whitespace class), which IS normalize-space()
_PRED_NSPACE_EQ = re.compile(
    r"^normalize-space\(\s*(text\(\)|\.)?\s*\)\s*=\s*('([^']*)'|\"([^\"]*)\")$"
)


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


def _split_and(pred: str) -> list[str]:
    """Split a predicate on top-level ``and`` (outside quotes/parens)."""
    parts, depth, quote, start, i, n = [], 0, "", 0, 0, len(pred)
    while i < n:
        ch = pred[i]
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and pred.startswith("and", i)
            and i > 0
            and pred[i - 1] in " \t"
            and i + 3 < n
            and pred[i + 3] in " \t"
        ):
            parts.append(pred[start:i])
            i += 3
            start = i
            continue
        i += 1
    parts.append(pred[start:])
    return parts


def _translate_predicate(
    pred: str, tag: str, xpath: str, positional_ok: bool = True
) -> str:
    pred = pred.strip()
    conj = _split_and(pred)
    if len(conj) > 1:
        # [p1 and p2] = both hold on the same element → predicate
        # concatenation in the compound grammar
        return "".join(
            _translate_predicate(p, tag, xpath, positional_ok) for p in conj
        )
    if not positional_ok and (
        _PRED_INT.match(pred)
        or pred == "last()"
        or _PRED_LAST_MINUS.match(pred)
        or _PRED_POS.match(pred)
        or _PRED_POS_MOD.match(pred)
    ):
        # positional predicates on an AXIS step index the axis node-set
        # (the N-th preceding sibling, etc.), which is NOT nth-of-type —
        # reject rather than mis-translate
        raise ValueError(
            f"unsupported positional predicate {pred!r} on an axis step "
            f"in {xpath!r}"
        )
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
    # position()/last() arithmetic → the same an+b pseudos (the
    # evaluator's CSS semantics pos = a·k + b, k ≥ 0, makes each
    # comparison a one-liner; comparisons no position satisfies emit
    # the never-matching :nth-of-type(0) — exact, silent-empty)
    kind = "nth-child" if tag == "*" else "nth-of-type"
    lkind = "nth-last-child" if tag == "*" else "nth-last-of-type"
    last1 = ":last-child" if tag == "*" else ":last-of-type"
    m = _PRED_LAST_MINUS.match(pred)
    if m:
        return f":{lkind}({int(m.group(1)) + 1})"
    m = _PRED_POS.match(pred)
    if m:
        op = m.group(1)
        if m.group(2) is not None:
            n_ = int(m.group(2))
            if op == "=":
                return f":{kind}({n_})"
            if op == "!=":
                return f":not(:{kind}({n_}))"
            if op == "<=":
                return f":{kind}(-n+{n_})"
            if op == "<":
                return f":{kind}(-n+{n_ - 1})" if n_ >= 1 else f":{kind}(0)"
            if op == ">=":
                return f":{kind}(n+{n_})"
            return f":{kind}(n+{n_ + 1})"  # >
        k = int(m.group(3) or 0)  # rhs = last() - k
        if op == "=":
            return last1 if k == 0 else f":{lkind}({k + 1})"
        if op == "!=":
            return f":not({last1})" if k == 0 else f":not(:{lkind}({k + 1}))"
        # translate through pos-from-end = total - pos + 1:
        # pos OP total-k  ⇔  pos-from-end inverse-OP k+1
        if op == "<=":
            return f":{lkind}(n+{k + 1})"
        if op == "<":
            return f":{lkind}(n+{k + 2})"
        if op == ">=":
            return f":{lkind}(-n+{k + 1})"
        return f":{lkind}(-n+{k})" if k >= 1 else f":{kind}(0)"  # >
    m = _PRED_POS_MOD.match(pred)
    if m:
        a_, b_ = int(m.group(1)), int(m.group(2))
        if a_ == 0:
            raise ValueError(f"position() mod 0 (division by zero) in {xpath!r}")
        if b_ >= a_:
            return f":{kind}(0)"  # mod result is always < a — never matches
        return f":{kind}({a_}n+{b_})"
    m = _PRED_HAS.match(pred)
    if m:
        return f":has({m.group(1)})"
    m = _PRED_NOT.match(pred)
    if m:
        return f":not([{m.group(1)}])"
    m = _PRED_TEXT_EQ.match(pred)
    if m:
        val = m.group(3) if m.group(3) is not None else m.group(4)
        return f":text-is({_quote_val(val, xpath)})"
    m = _PRED_NSPACE_EQ.match(pred)
    if m:
        val = m.group(3) if m.group(3) is not None else m.group(4)
        return f":text-is({_quote_val(val, xpath)})"
    m = _PRED_TEXT_CONTAINS.match(pred)
    if m:
        val = m.group(3) if m.group(3) is not None else m.group(4)
        if not val:
            raise ValueError(f"empty contains() needle in {xpath!r}")
        return f":contains({_quote_val(val, xpath)})"
    raise ValueError(f"unsupported XPath predicate {pred!r} in {xpath!r}")


def _join_arms(
    out: list[tuple[str, str, str]],
    alt_steps: list[tuple[str, str]] | None,
    proj: str,
) -> str:
    """Serialize the main arm (and the -or-self union arm, when one
    exists) with the projection suffix on each — a comma group in the
    selector grammar; overlapping matches dedupe at emission."""
    main = "".join(c + s for c, s, _ in out) + proj
    if alt_steps is not None:
        main += ", " + "".join(c + s for c, s in alt_steps) + proj
    return main


def _merge_self(prev_comp: str, ttag: str, trest: str) -> str | None:
    """Merge a self-arm target compound (``ttag`` + predicate string
    ``trest``) into the context step's compound — both constrain the
    SAME element. Returns None when the element names can't coexist
    (tag ∩ tag = ∅): the caller drops the arm (union axes) or appends
    the never-matching :not(*) (bare self::)."""
    m = _STEP_RE.match(prev_comp)
    ptag = m.group(1)
    rest_p = prev_comp[m.end() :]
    if ptag == "*":
        stag = ttag
    elif ttag == "*" or ttag.lower() == ptag.lower():
        stag = ptag
    else:
        return None
    return stag + rest_p + trest


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

    # walk steps; '//' between steps = descendant, '/' = child.
    # out entries are (combinator, compound, kind): kind "plain" for
    # ordinary steps, "sib" for following-sibling:: results (a normal
    # compound behind a ~ combinator), "has" for parent::/preceding-
    # sibling:: results (the step folded into a :has(...) subject —
    # final-step-only, since :has lives on the subject compound)
    out: list[tuple[str, str, str]] = []
    # -or-self axes are unions: the main arm lives in `out`, the self
    # arm (context compound merged with the target) here as (comb,
    # compound) steps sharing the prefix. At most one union per path —
    # the main arm's "has" kind makes any further step reject
    alt_steps: list[tuple[str, str]] | None = None
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
            if not _PROJ_RE.match(name):
                raise ValueError(f"unsupported XPath attribute step in {xpath!r}")
            if not out:
                raise ValueError(f"unsupported XPath (bare attribute): {xpath!r}")
            return _join_arms(out, alt_steps, f" @{name}")
        if rest.startswith("text()", i):
            if i + 6 != n or not out:
                raise ValueError(f"unsupported XPath text() position in {xpath!r}")
            # subtree text is the default projection
            return _join_arms(out, alt_steps, "")
        # axes: child:: / descendant:: are the explicit spellings of the
        # '/' and '//' separators; following-sibling:: / preceding-
        # sibling:: / parent:: / '..' / ancestor:: translate onto the
        # sibling combinator and the :has witness modes; anything else
        # axis-shaped stays a loud reject
        axis = None
        if rest.startswith("..", i) and (i + 2 == n or rest[i + 2] in "/["):
            axis, i = "parent", i + 2
            tag = "*"
        else:
            m = _AXIS_RE.match(rest, i)
            if m:
                ax = m.group(0)[:-2]
                if ax not in (
                    "following-sibling", "preceding-sibling", "parent",
                    "child", "descendant", "ancestor", "self",
                    "ancestor-or-self", "descendant-or-self",
                    "following", "preceding",
                ):
                    raise ValueError(
                        f"unsupported XPath axis {m.group(0)!r} in {xpath!r}"
                    )
                axis = ax
                i = m.end()
            m = _STEP_RE.match(rest, i)
            if not m:
                raise ValueError(f"unsupported XPath step at {rest[i:]!r} in {xpath!r}")
            tag = m.group(1)
            i = m.end()
        if axis is not None:
            if not out:
                raise ValueError(
                    f"unsupported XPath ({axis}:: needs a context step): {xpath!r}"
                )
            if combinator != " > ":
                # only the plain '/step/axis::...' separator is defined;
                # '//axis::' (descendant-or-self then axis) is out
                raise ValueError(
                    f"unsupported XPath ('//' before {axis}::): {xpath!r}"
                )
        if out and out[-1][2] == "has":
            # a parent::/preceding-sibling::/ancestor:: result is a :has
            # subject (the evaluator supports :has on the final compound
            # only), and the -or-self unions fix both arms at emission —
            # no step may follow any of them
            raise ValueError(
                "unsupported XPath (parent::/preceding-sibling::/ancestor::"
                "/-or-self:: only on the final step): "
                f"{xpath!r}"
            )
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
            preds.append(
                _translate_predicate(
                    rest[i + 1 : j - 1], tag, xpath,
                    # child:: is the explicit '/' step — [N] keeps its
                    # nth-of-type meaning; every other axis node-set
                    # indexes differently, so positional preds reject
                    positional_ok=axis is None or axis == "child",
                )
            )
            i = j
        if axis == "child":
            # explicit spelling of the '/' separator
            out.append((" > ", tag + "".join(preds), "plain"))
        elif axis == "descendant":
            # a/descendant::b ≡ a//b (the [N] nuance is rejected above:
            # descendant::b[N] indexes the whole descendant node-set,
            # unlike abbreviated //b[N] which is per-parent)
            out.append((" ", tag + "".join(preds), "plain"))
        elif axis == "following-sibling":
            # b after a, same parent — exactly the CSS general-sibling
            # combinator; the prefix carries over untouched (siblings
            # share every ancestor)
            out.append((" ~ ", tag + "".join(preds), "sib"))
        elif axis == "preceding-sibling":
            # b BEFORE a, same parent ⇔ b has a following sibling
            # matching a: fold the context step into :has(~ a). Its own
            # prefix re-attaches to b verbatim — sibling steps keep the
            # ancestor chain, so 'P / a' constraints transfer to b
            prev_comb, prev_comp, prev_kind = out.pop()
            if prev_kind != "plain":
                raise ValueError(
                    f"unsupported XPath (preceding-sibling:: after another "
                    f"axis step): {xpath!r}"
                )
            out.append(
                (prev_comb, f"{tag}{''.join(preds)}:has(~ {prev_comp})", "has")
            )
        elif axis == "parent":
            # t:has(> a) is exact only when a's own relation to the rest
            # of the path is unconstrained — i.e. a single-step prefix
            # ('//a/..'); with a longer prefix the parent may BE the
            # prefix element, which the chain grammar can't express
            if len(out) != 1 or out[0][2] != "plain":
                raise ValueError(
                    f"unsupported XPath (parent::/'..' needs a single-step "
                    f"prefix): {xpath!r}"
                )
            prev_comb, prev_comp, _ = out.pop()
            out.append(
                (prev_comb, f"{tag}{''.join(preds)}:has(> {prev_comp})", "has")
            )
        elif axis in ("ancestor", "ancestor-or-self"):
            # //a/ancestor::div ⇔ div with a DESCENDANT matching a —
            # the plain :has witness; same single-step-prefix bound as
            # parent:: (a longer prefix constrains a's position relative
            # to elements the ancestor may BE). -or-self adds the merged
            # self arm as a union alternative (dropped when the element
            # names can't coexist — that arm is exactly empty)
            if len(out) != 1 or out[0][2] != "plain":
                raise ValueError(
                    f"unsupported XPath ({axis}:: needs a single-step "
                    f"prefix): {xpath!r}"
                )
            prev_comb, prev_comp, _ = out.pop()
            if axis == "ancestor-or-self":
                merged = _merge_self(prev_comp, tag, "".join(preds))
                if merged is not None:
                    alt_steps = [(prev_comb, merged)]
            out.append(
                (prev_comb, f"{tag}{''.join(preds)}:has({prev_comp})", "has")
            )
        elif axis in ("following", "preceding"):
            # //a/following::b ⇔ b:after(a) — b OPENS after an a CLOSES
            # (strict event order: a's descendants and ancestors never
            # match, exactly the axis node-set); //a/preceding::b ⇔
            # b:before(a) — b CLOSES before an a OPENS. Same
            # single-step-prefix + final-step bounds as ancestor:: (the
            # ctx compound can't carry a chain, and :after/:before live
            # on the subject compound)
            if len(out) != 1 or out[0][2] != "plain":
                raise ValueError(
                    f"unsupported XPath ({axis}:: needs a single-step "
                    f"prefix): {xpath!r}"
                )
            prev_comb, prev_comp, _ = out.pop()
            pseudo = "after" if axis == "following" else "before"
            out.append(
                (prev_comb, f"{tag}{''.join(preds)}:{pseudo}({prev_comp})", "has")
            )
        elif axis == "self":
            # a/self::b[p] — the context element itself with extra
            # constraints: merge into the context compound. A different
            # element name can never match → :not(*) (exact empty)
            prev_comb, prev_comp, prev_kind = out.pop()
            merged = _merge_self(prev_comp, tag, "".join(preds))
            if merged is None:
                merged = prev_comp + "".join(preds) + ":not(*)"
            out.append((prev_comb, merged, prev_kind))
        elif axis == "descendant-or-self":
            # //a/descendant-or-self::b ⇔ (a b) ∪ (a that IS b): the
            # descendant arm appends like descendant::, the self arm
            # merges the target into the CONTEXT step, sharing any
            # prefix. Final step only (kind "has" below rejects more
            # steps) — the two arms would diverge under further steps
            prev_comb, prev_comp, prev_kind = out[-1]
            merged = _merge_self(prev_comp, tag, "".join(preds))
            if merged is not None:
                alt_steps = [(c, s) for c, s, _ in out[:-1]] + [
                    (prev_comb, merged)
                ]
            out.append((" ", tag + "".join(preds), "has"))
        else:
            anchor = ":root" if absolute and not out else ""
            out.append((combinator, tag + anchor + "".join(preds), "plain"))
        combinator = ""
        if i < n and rest[i] not in "/":
            raise ValueError(f"unsupported XPath syntax at {rest[i:]!r} in {xpath!r}")
    if not out:  # bare '/', '//', or all-separator input
        raise ValueError(f"empty XPath path in {xpath!r}")
    # [.//x] compiles to :has(), which the selector grammar accepts on
    # the SUBJECT compound only — reject it on earlier steps here so
    # the translator never emits a selector the evaluator rejects
    if any(":has(" in s for _, s, _ in out[:-1]):
        raise ValueError(
            f"unsupported XPath ([.//…] only on the final step): {xpath!r}"
        )
    if any(":contains(" in s or ":text-is(" in s for _, s, _ in out[:-1]):
        raise ValueError(
            f"unsupported XPath (text predicates only on the final step): {xpath!r}"
        )
    return _join_arms(out, alt_steps, "")


def xpath_to_selector(xpath: str) -> str:
    """Compile an XPath-lite expression to the selector grammar.

    Raises ValueError on anything outside the documented subset.
    """
    if not isinstance(xpath, str) or not xpath.strip():
        raise ValueError("empty XPath expression")
    paths = [_translate_path(p, xpath) for p in _split_top(xpath, "|")]
    sel = ", ".join(paths)
    # contract backstop: the translator must never emit a selector the
    # evaluator rejects — re-raise any residual corner as ValueError
    # naming both forms (one extra driver-side parse, never shipped to
    # executors)
    try:
        parse_selector(sel)
    except ValueError as e:
        raise ValueError(
            f"XPath {xpath!r} translates outside the selector subset "
            f"({sel!r}): {e}"
        ) from e
    return sel


def select_html_xpath(html, xpath: str, options=None, emit: str = "text"):
    """Run an XPath-lite query over a document: translate once, then
    evaluate with the selector engine (same repaired event stream,
    same golden-frozen semantics). ``emit="html"`` returns each
    match's outer XHTML — the reference's ``SelectNodes(...)[i]
    .OuterXml``."""
    sel = xpath_to_selector(xpath)
    if options is None:
        return select_html(html, sel, emit=emit)
    return select_html(html, sel, options, emit)
