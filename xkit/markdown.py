"""HTML → Markdown projection over the repaired event stream (A20').

The training-data shape most LLM pipelines actually want from a page
is markdown, not XHTML: headings/lists/tables survive as structure a
tokenizer can learn, while tag soup and attributes disappear. This
module is the markdown twin of :func:`xkit.dom.serialize` — it walks
the SAME well-nested event stream ``repair(tokenize(html))`` produces
(so every tag-soup recovery rule A14–A17 applies for free) and emits
a deterministic CommonMark-flavored string.

Scope (documented, frozen by tests/golden/markdown/):

* headings ``h1..h6`` → ``#``·n lines
* paragraphs / generic blocks → blank-line separated blocks
* ``ul``/``ol``/``li`` → ``-`` / ``1.`` items, nested by 4-space indent
* ``blockquote`` → ``> `` prefix (nestable)
* ``pre`` → fenced code block (whitespace preserved verbatim)
* inline ``code`` → backticks; ``strong``/``b`` → ``**``;
  ``em``/``i`` → ``*``
* ``a[href]`` → ``[text](href)`` (href resolved against ``base_url``
  like media refs, A21); ``img`` → ``![alt](src)``
* ``table``/``tr``/``th``/``td`` → pipe tables (first row with any
  ``th`` becomes the header; ``|`` escaped in cells; nested tables
  flatten into the enclosing cell)
* ``br`` → hard break (backslash-newline); ``hr`` → ``---``; inside
  ``pre`` a ``br`` is a literal newline and ``img`` contributes
  nothing; inside a table cell, ``pre``/``hr`` flatten into the cell
  (no fence/rule block may jump ahead of the table)
* dropped entirely: script/style/noscript/template/head (incl. title)
  subtrees and comments/doctype — this is a CONTENT projection

Whitespace collapses per text segment exactly like extraction (A25's
`` ' '.join(split()) `` rule) except inside ``pre``. Markdown
metacharacters in ordinary text are NOT escaped (this is an
extraction surface, not a round-trip serializer); only table-cell
``|`` is, because it would corrupt row structure.

Pure Python, stdlib only — ships to executors via --py-files like the
rest of xkit; the Spark column stage lives in
xhtmlkit_spark/operators/markdown_stage.py.
"""

from __future__ import annotations

from urllib.parse import urljoin

from xkit.dom import repair
from xkit.options import DEFAULT_OPTIONS, ExtractOptions
from xkit.tokenizer import tokenize

__all__ = ["to_markdown", "html_to_markdown"]

# subtrees whose content never reaches markdown output (projection is
# content-only; nav/footer/aside are KEPT — markdown conversion is a
# faithful structural projection, boilerplate stripping is extract's job)
_MD_DROP = frozenset("script style noscript template head title".split())
# fragment snippets have no document head: title text is content
# (mirrors extract._FRAGMENT_DROP_TAGS, A18/§3.3)
_MD_FRAGMENT_DROP = _MD_DROP - {"head", "title"}

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# block-level elements that flush the current inline run when they
# open or close (subset of extract.BLOCK_TAGS that matters here; the
# structural ones — lists, tables, pre, blockquote, headings — have
# their own handling)
_FLUSH_TAGS = frozenset(
    """html body p div article section header main figure figcaption
       form fieldset address details summary dl dt dd caption""".split()
)

_BOLD_TAGS = frozenset(("strong", "b"))
_EM_TAGS = frozenset(("em", "i"))

_BREAK = "\x00"  # hard-break sentinel inside an inline run


def _collapse_run(raw: str) -> str:
    """A25 whitespace collapse, preserving hard-break sentinels."""
    parts = [" ".join(seg.split()) for seg in raw.split(_BREAK)]
    # drop empty segments at the edges (a <br> before any text or
    # trailing at end of block renders nothing)
    while parts and not parts[0]:
        parts.pop(0)
    while parts and not parts[-1]:
        parts.pop()
    return "\\\n".join(parts)


def to_markdown(
    events: list, base: str | None = None, fragment: bool = False
) -> str:
    """Render a repaired event stream as markdown (module doc has the
    dialect table). ``base`` resolves relative link/image URLs (A21);
    ``fragment`` keeps head/title content (snippets have no document
    head, A18/§3.3).
    """
    drop_tags = _MD_FRAGMENT_DROP if fragment else _MD_DROP
    base_seen = False
    blocks: list[str] = []  # finished blocks, joined with \n\n
    buf: list[str] = []  # current inline run
    drop_depth = 0
    pre_depth = 0
    heading: int = 0  # pending heading level (inside h1..h6)
    bq_depth = 0
    # list stack: ["ul"] or ["ol", counter]; pending_marker set at <li>
    list_stack: list[list] = []
    pending_marker: str | None = None
    href_stack: list[str | None] = []
    # table capture (outermost table only; inner tables flatten)
    table_depth = 0
    table_rows: list[list[str]] = []
    table_has_th = False
    row: list[str] | None = None
    cell: list[str] | None = None

    def prefix() -> str:
        return "> " * bq_depth

    def flush() -> None:
        nonlocal buf, pending_marker, heading
        text = _collapse_run("".join(buf))
        buf = []
        if not text:
            return
        if heading:
            text = "#" * heading + " " + text
        pre = prefix()
        if pending_marker is not None:
            indent = "    " * (len(list_stack) - 1) if list_stack else ""
            first = pre + indent + pending_marker
            cont = pre + indent + " " * len(pending_marker)
            pending_marker = None
        elif list_stack:
            # continuation block inside an open <li>
            indent = "    " * (len(list_stack) - 1)
            mark = "- " if list_stack[-1][0] == "ul" else "%d. " % list_stack[-1][1]
            first = cont = pre + indent + " " * len(mark)
        else:
            first = cont = pre
        lines = text.split("\n")
        blocks.append(
            "\n".join((first if i == 0 else cont) + ln for i, ln in enumerate(lines))
        )

    def emit_block(text: str) -> None:
        """A pre-formed block (fence, rule, table) — prefix every line."""
        pre = prefix()
        indent = "    " * (len(list_stack) - 1) if list_stack else ""
        if pre or indent:
            text = "\n".join(pre + indent + ln for ln in text.split("\n"))
        blocks.append(text)

    def cell_text() -> str:
        raw = "".join(cell or ())
        parts = [" ".join(seg.split()) for seg in raw.split(_BREAK)]
        return " ".join(p for p in parts if p).replace("|", "\\|")

    for ev in events:
        kind = ev[0]
        if kind == "text":
            if drop_depth:
                continue
            if pre_depth:
                buf.append(ev[1])
            elif cell is not None:
                cell.append(ev[1])
            else:
                buf.append(ev[1])
            continue
        if kind == "open":
            tag = ev[1]
            # the first <base href> composes with the caller's base
            # (browser rule) — captured even inside the dropped <head>
            # subtree, BEFORE the drop check; open-time semantics:
            # applies to links/images after it, which in practice is
            # all of them (base precedes body content)
            if tag == "base" and not base_seen:
                bh = ev[2].get("href")
                if bh:
                    base = urljoin(base, bh) if base else bh
                base_seen = True
            if drop_depth or tag in drop_tags:
                # VOID tags never reach here unbalanced: repair emits
                # open+close pairs, so depth counting stays exact
                drop_depth += 1
                continue
            attrs = ev[2]
            if pre_depth:
                # markup inside pre renders as its text only: <br> is a
                # real newline in the fence (never the \x00 hard-break
                # sentinel, which would leak into the code block); <img>
                # has no text content, so it contributes nothing
                if tag == "br":
                    buf.append("\n")
            elif tag == "br":
                (cell if cell is not None else buf).append(_BREAK)
            elif tag == "img":
                src = attrs.get("src") or ""
                if src and base:
                    src = urljoin(base, src)
                alt = " ".join((attrs.get("alt") or "").split())
                (cell if cell is not None else buf).append("![%s](%s)" % (alt, src))
            elif tag == "pre":
                # anywhere inside a table, pre content flattens (into
                # the open cell, or to nothing between cells) — a fence
                # emitted mid-table would be appended to `blocks`
                # BEFORE the table block lands at </table>, the exact
                # reordering the module contract rules out
                if cell is None and table_depth == 0:
                    flush()
                    pre_depth += 1
            elif tag in _HEADINGS:
                flush()
                heading = _HEADINGS[tag]
            elif tag in ("ul", "ol"):
                flush()
                list_stack.append(["ul"] if tag == "ul" else ["ol", 0])
            elif tag == "li":
                flush()
                if list_stack:
                    top = list_stack[-1]
                    if top[0] == "ol":
                        top[1] += 1
                        pending_marker = "%d. " % top[1]
                    else:
                        pending_marker = "- "
                else:  # stray <li> outside any list (tag soup)
                    pending_marker = "- "
            elif tag == "blockquote":
                flush()
                bq_depth += 1
            elif tag == "a":
                href = attrs.get("href")
                if href and base:
                    href = urljoin(base, href)
                href_stack.append(href)
                if href:
                    (cell if cell is not None else buf).append("[")
            elif tag in _BOLD_TAGS:
                (cell if cell is not None else buf).append("**")
            elif tag in _EM_TAGS:
                (cell if cell is not None else buf).append("*")
            elif tag == "code":
                (cell if cell is not None else buf).append("`")
            elif tag == "hr":
                # like pre: an <hr> anywhere inside a table (open cell
                # OR between cells/rows) must not emit a block ahead of
                # the table — it flattens to nothing
                if cell is None and table_depth == 0:
                    flush()
                    emit_block("---")
            elif tag == "table":
                table_depth += 1
                if table_depth == 1:
                    flush()
                    table_rows = []
                    table_has_th = False
                    row = None
                    cell = None
            elif tag == "tr" and table_depth == 1:
                row = []
            elif tag in ("td", "th") and table_depth == 1 and row is not None:
                cell = []
                if tag == "th" and not table_rows:
                    table_has_th = True
            elif tag in _FLUSH_TAGS:
                flush()
            # other inline tags (span, u, small, …): transparent
            continue
        if kind == "close":
            tag = ev[1]
            if drop_depth:
                drop_depth -= 1
                continue
            if pre_depth:
                if tag == "pre":
                    pre_depth -= 1
                    code = "".join(buf).strip("\n")
                    buf = []
                    if code:
                        emit_block("```\n%s\n```" % code)
                continue
            if tag in _HEADINGS:
                flush()
                heading = 0
            elif tag in ("ul", "ol"):
                flush()
                if list_stack:
                    list_stack.pop()
            elif tag == "li":
                flush()
            elif tag == "blockquote":
                flush()
                if bq_depth:
                    bq_depth -= 1
            elif tag == "a":
                href = href_stack.pop() if href_stack else None
                if href:
                    (cell if cell is not None else buf).append("](%s)" % href)
            elif tag in _BOLD_TAGS:
                (cell if cell is not None else buf).append("**")
            elif tag in _EM_TAGS:
                (cell if cell is not None else buf).append("*")
            elif tag == "code":
                (cell if cell is not None else buf).append("`")
            elif tag == "table":
                if table_depth == 1:
                    rows = [r for r in table_rows if r]
                    if rows:
                        width = max(len(r) for r in rows)
                        norm = [r + [""] * (width - len(r)) for r in rows]
                        if table_has_th:
                            head, body = norm[0], norm[1:]
                        else:
                            head, body = [""] * width, norm
                        lines = ["| " + " | ".join(head) + " |"]
                        lines.append("|" + " --- |" * width)
                        lines += ["| " + " | ".join(r) + " |" for r in body]
                        emit_block("\n".join(lines))
                    table_rows = []
                    row = None
                    cell = None
                if table_depth:
                    table_depth -= 1
            elif tag == "tr" and table_depth == 1:
                if row is not None:
                    table_rows.append(row)
                row = None
            elif tag in ("td", "th") and table_depth == 1:
                if row is not None and cell is not None:
                    row.append(cell_text())
                cell = None
            elif tag in _FLUSH_TAGS:
                flush()
            continue
        # comment / doctype: dropped (content projection)
    flush()
    return "\n\n".join(blocks)


def html_to_markdown(raw: str, options: ExtractOptions = DEFAULT_OPTIONS) -> str:
    """Tag soup in, markdown out — tokenize → repair (all tag-soup
    recovery rules apply) → :func:`to_markdown`. ``options.fragment``
    and ``options.base_url`` behave exactly as in extraction."""
    return to_markdown(
        repair(tokenize(raw), fragment=options.fragment),
        base=options.base_url,
        fragment=options.fragment,
    )
