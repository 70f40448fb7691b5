"""Tree-selection operator: CSS-selector-lite over the repaired DOM,
as a mapInArrow stage (SURVEY.md A27 analogue).

The reference's query surface is XPath over the repaired tree ([P:
XHtmlKit README.md] SelectNodes); :mod:`xkit.selector` re-expresses
the high-frequency subset ("all ``<table>`` text",
"``meta[property=og:title]``") as a selector evaluated on the event
stream, and this module distributes it with the exact same Arrow
plumbing as extraction: flat child arrays in, list offsets out, no
per-row Python objects at the boundary.

Scale shape = extract_spans' shape: one column-pruned scan, the
optional size-salt shuffle, one MapInArrow node. The selector string
is parsed ON THE DRIVER (a malformed selector fails the job before any
executor spins up), then shipped pre-parsed inside the closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from xhtmlkit_spark.operators.extract_stage import make_doc_stage_fn, run_doc_stage
from xkit.options import DEFAULT_OPTIONS, ExtractOptions
from xkit.selector import parse_selector, select_doc

__all__ = ["select_spans"]


def select_spans(
    df: DataFrame,
    selector: str | None = None,
    options: ExtractOptions = DEFAULT_OPTIONS,
    passthrough: tuple = ("part",),
    xpath: str | None = None,
    emit: str = "text",
) -> DataFrame:
    """Evaluate ``selector`` (or ``xpath``) over every document's html
    spans.

    Input/output shape is identical to
    :func:`~xhtmlkit_spark.operators.extract_stage.extract_spans`:
    ``doc_id, *passthrough, spans`` in, same layout out with one span
    per selector match (document order; see xkit.selector for the
    per-match span rule). ``xpath`` accepts the XPath-lite subset
    (xkit.xpath) — the reference's native query idiom — compiled on
    the driver to the same selector evaluation; pass exactly one of
    the two. ``emit="html"`` yields each match's serialized outer
    XHTML instead of its subtree text (the reference's
    ``SelectNodes(...).OuterXml`` idiom; see xkit.selector) — the
    output rows are corpus-shaped html spans, so a markup selection
    can feed straight back into extract_spans/select_spans as a
    subtree corpus (e.g. harvest every <table> as training markup).
    """
    if (selector is None) == (xpath is None):
        raise ValueError("pass exactly one of selector= or xpath=")
    if xpath is not None:
        from xkit.xpath import xpath_to_selector

        selector = xpath_to_selector(xpath)  # driver-side translation
    parsed = parse_selector(selector)  # driver-side validation
    if emit not in ("text", "html", "inner_html"):  # fail on the driver
        raise ValueError(
            f"emit must be 'text', 'html' or 'inner_html', got {emit!r}"
        )

    def batch_fn(n_pt: int):
        def doc_fn(kinds, texts, refs, offsets):
            return select_doc(kinds, texts, refs, offsets, parsed, options, emit)

        return make_doc_stage_fn(doc_fn, n_pt)

    return run_doc_stage(df, batch_fn, passthrough)
