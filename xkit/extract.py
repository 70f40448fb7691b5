"""Boilerplate strip + ordered span emission (SURVEY.md A22–A25).

Streaming consumer of the repaired event stream (xkit.dom.repair):
one forward pass, O(depth) state, no tree allocation — the Spark-side
hot path runs this per document inside an Arrow batch.

Pipeline-spec heuristics (authoritative: BASELINE.json north_star
"boilerplate-strip heuristics (script/style/comment removal,
text-density scoring)"; the reference itself keeps script/style in
the DOM and lets users strip via XPath — [P: XHtmlKit README.md]):

* A22 hard-dropped subtrees: script, style, noscript, template, head,
  title, nav, footer, aside; elements with a ``hidden`` attribute or
  ``aria-hidden="true"``; comments and DOCTYPE.
* A23 text-density scoring per block: ``chars / (1 + inline_tags)``
  must reach ``min_text_density``, and link density
  ``anchor_chars / chars`` must not exceed ``max_link_density``
  (tag-ratio content extraction à la CETR; thresholds frozen by
  tests/golden/boilerplate_density.json).
* A24 ordered emission: text blocks and media (img video audio source
  embed iframe with non-empty ``src``) are emitted in document order;
  media flushes the in-progress text block so interleaving follows
  source order. Relative ``src`` is absolutized against
  ``options.base_url`` when set (A21).
* A25 whitespace: runs of whitespace collapse to a single space,
  blocks trimmed; empty blocks emit nothing.

Blocks are delimited by HTML block-level elements (open or close) and
``<br>``.
"""

from __future__ import annotations

from urllib.parse import urljoin

from xkit.dom import repair
from xkit.options import DEFAULT_OPTIONS, ExtractOptions
from xkit.tokenizer import tokenize

__all__ = ["extract_html", "DROP_TAGS", "BLOCK_TAGS", "MEDIA_TAGS"]

# A22 — subtrees whose content never reaches the output.
DROP_TAGS = frozenset(
    "script style noscript template head title nav footer aside textarea select".split()
)

# Elements that delimit text blocks (open AND close flush the block).
BLOCK_TAGS = frozenset(
    """html body p div li ul ol dl dt dd h1 h2 h3 h4 h5 h6 table thead tbody
       tfoot tr td th caption blockquote pre article section header main
       figure figcaption form fieldset hr br address details summary
       colgroup col option optgroup select textarea""".split()
)

# A24 — media-bearing elements; span's media_ref comes from @src.
MEDIA_TAGS = frozenset("img video audio source embed iframe".split())

def _collapse(s: str) -> str:
    # ' '.join(split()) == regex r'\s+'→' ' + strip (both use the Unicode
    # whitespace definition) but allocates far less in the hot path
    return " ".join(s.split())


def extract_html(html: str, options: ExtractOptions = DEFAULT_OPTIONS) -> list:
    """Extract ordered ``(kind, text, media_ref)`` spans from one HTML doc.

    kind ∈ {"text", "media"}; text spans carry ``media_ref=None``,
    media spans carry ``text=None``.
    """
    out: list = []
    pieces: list = []  # raw text fragments of the in-progress block
    anchor_pieces: list = []  # fragments contributed inside <a>
    inline_tags = 0  # inline opens inside the block (density denominator)
    drop_depth = 0
    anchor_depth = 0
    opt = options
    base = opt.base_url

    def flush() -> None:
        nonlocal pieces, anchor_pieces, inline_tags
        if pieces:
            text = _collapse("".join(pieces))
            if len(text) >= opt.min_block_chars and text:
                chars = len(text)
                density = chars / (1.0 + inline_tags)
                link = (
                    len(_collapse("".join(anchor_pieces))) / chars
                    if anchor_pieces
                    else 0.0
                )
                if density >= opt.min_text_density and link <= opt.max_link_density:
                    out.append(("text", text, None))
        pieces = []
        anchor_pieces = []
        inline_tags = 0

    for ev in repair(tokenize(html)):
        kind = ev[0]
        if kind == "text":
            if drop_depth == 0:
                pieces.append(ev[1])
                if anchor_depth > 0:
                    anchor_pieces.append(ev[1])
        elif kind == "open":
            tag = ev[1]
            attrs = ev[2]
            if drop_depth > 0:
                drop_depth += 1
                continue
            if (
                tag in DROP_TAGS
                or "hidden" in attrs
                or attrs.get("aria-hidden") == "true"
            ):
                flush()
                drop_depth = 1
                continue
            if tag in MEDIA_TAGS:
                src = attrs.get("src", "")
                if src:
                    flush()
                    out.append(("media", None, urljoin(base, src) if base else src))
                if tag == "iframe":
                    drop_depth = 1  # iframe children are fallback-only, never rendered
                continue  # media elements contribute no text block of their own
            if tag in BLOCK_TAGS:
                flush()
            else:
                if tag == "a":
                    anchor_depth += 1
                if pieces:
                    inline_tags += 1
        elif kind == "close":
            tag = ev[1]
            if drop_depth > 0:
                drop_depth -= 1
                continue
            if tag in MEDIA_TAGS:
                continue
            if tag in BLOCK_TAGS:
                flush()
            elif tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
        # comments / doctype dropped (A22)
    flush()
    return out
