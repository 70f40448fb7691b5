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

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from xhtmlkit_spark.operators.extract_stage import (
    SPANS_TYPE,
    _PA_SPAN,
    make_doc_stage_fn,
    run_doc_stage,
    unpack_spans,
)
from xkit.options import DEFAULT_OPTIONS, ExtractOptions
from xkit.selector import parse_selector, select_doc, select_doc_multi

__all__ = ["select_spans", "select_multi"]


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


def _parse_query_spec(name: str, spec) -> tuple:
    """Driver-side parse of one select_multi query spec → (groups, emit).

    ``spec`` is a CSS selector string, or a dict with exactly one of
    ``selector``/``xpath`` plus optional ``emit``."""
    if isinstance(spec, str):
        return parse_selector(spec), "text"
    if isinstance(spec, dict):
        sel = spec.get("selector")
        xp = spec.get("xpath")
        if (sel is None) == (xp is None):
            raise ValueError(
                f"query {name!r}: pass exactly one of selector=/xpath="
            )
        if xp is not None:
            from xkit.xpath import xpath_to_selector

            sel = xpath_to_selector(xp)
        emit = spec.get("emit", "text")
        if emit not in ("text", "html", "inner_html"):
            raise ValueError(
                f"query {name!r}: emit must be 'text', 'html' or "
                f"'inner_html', got {emit!r}"
            )
        unknown = set(spec) - {"selector", "xpath", "emit"}
        if unknown:
            raise ValueError(f"query {name!r}: unknown keys {sorted(unknown)}")
        return parse_selector(sel), emit
    raise ValueError(f"query {name!r}: spec must be a string or dict")


def select_multi(
    df: DataFrame,
    queries: dict,
    options: ExtractOptions = DEFAULT_OPTIONS,
    passthrough: tuple = ("part",),
) -> DataFrame:
    """Run N selector/XPath queries over the corpus in ONE scan+parse.

    ``queries`` maps output column name → query spec (a CSS selector
    string, or ``{"selector"|"xpath": ..., "emit": ...}``). Output:
    ``doc_id, *passthrough`` plus one spans column PER QUERY. Each
    document is tokenized and repaired exactly once per batch row; all
    queries evaluate over the shared event list — at 100 TB this is
    the difference between one corpus read and len(queries) corpus
    reads, and the parse (the dominant per-doc cost) is paid once.

    All query strings parse on the driver: a malformed query fails the
    job before any executor spins up. Plan shape is select_spans'
    (pruned scan → optional salt exchange → ONE MapInArrow) with a
    wider output row.
    """
    import pyarrow as pa

    if not queries:
        raise ValueError("select_multi needs at least one query")
    pt = [c for c in passthrough if c in df.columns]
    reserved = {"doc_id", "spans", *pt}
    bad = [n for n in queries if n in reserved or not n.isidentifier()]
    if bad:
        raise ValueError(
            f"query names must be identifiers not in {sorted(reserved)}: {bad}"
        )
    names = list(queries)
    parsed = [_parse_query_spec(n, queries[n]) for n in names]
    n_pt = len(pt)
    nq = len(names)

    def multi_batches(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            spans_idx = n_pt + 1
            offs, kind_l, text_l, ref_l, off_l, nulls, n_rows = unpack_spans(
                batch, spans_idx
            )
            accs = [([], [], [], []) for _ in range(nq)]  # k, t, m, o flats
            list_offs = [[] for _ in range(nq)]
            for i in range(n_rows):
                if nulls is None or nulls[i]:
                    s, e = offs[i], offs[i + 1]
                    per_q = select_doc_multi(
                        kind_l[s:e], text_l[s:e], ref_l[s:e], off_l[s:e],
                        parsed, options,
                    )
                    for q in range(nq):
                        list_offs[q].append(len(accs[q][0]))
                        k, t, m, o = per_q[q]
                        accs[q][0].extend(k)
                        accs[q][1].extend(t)
                        accs[q][2].extend(m)
                        accs[q][3].extend(o)
                else:
                    for q in range(nq):
                        list_offs[q].append(None)  # NULL in → NULL out
            cols = [batch.column(j) for j in range(n_pt + 1)]
            fields = [batch.schema.field(j) for j in range(n_pt + 1)]
            for q in range(nq):
                list_offs[q].append(len(accs[q][0]))
                struct = pa.StructArray.from_arrays(
                    [
                        pa.array(accs[q][0], pa.string()),
                        pa.array(accs[q][1], pa.string()),
                        pa.array(accs[q][2], pa.string()),
                        pa.array(accs[q][3], pa.int32()),
                    ],
                    fields=list(_PA_SPAN),
                )
                cols.append(
                    pa.ListArray.from_arrays(
                        pa.array(list_offs[q], pa.int32()), struct
                    )
                )
                fields.append(pa.field(names[q], pa.list_(_PA_SPAN)))
            yield pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))

    pruned = df.select("doc_id", *pt, "spans")
    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType())]
        + [pruned.schema[c] for c in pt]
        + [T.StructField(n, SPANS_TYPE) for n in names]
    )
    return pruned.mapInArrow(multi_batches, out_schema)
