"""THE hot-path operator: mapInArrow extraction stage (SURVEY.md B26).

Wraps the golden-validated per-document extractor (xkit.doc.extract_doc)
in a ``DataFrame.mapInArrow`` stage. Contract points (BASELINE.json
"no per-row Python anywhere in the hot path"):

* I/O crosses the JVM↔Python boundary as Arrow RecordBatches only;
  no row-wise ``@udf`` exists anywhere in this repo.
* Inside a batch, span columns are accessed as *flat* child arrays
  (one ``to_pylist`` per column per batch — a C-level columnar copy),
  sliced per document by the list offsets; output spans are assembled
  as flat arrays + list offsets via ``pa.ListArray.from_arrays`` —
  no per-row list-of-dict materialization in either direction.
* Passthrough columns (e.g. ``part`` for checkpointing) are copied
  column-wise, untouched by Python.

Column pruning: :func:`extract_spans` selects only
``doc_id, *passthrough, spans`` before the stage, so Catalyst prunes
everything else out of the parquet scan (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xkit.doc import extract_doc
from xkit.options import DEFAULT_OPTIONS, ExtractOptions

__all__ = [
    "SPAN_STRUCT",
    "SPANS_TYPE",
    "extract_spans",
    "make_doc_stage_fn",
    "make_extract_fn",
    "run_doc_stage",
    "span_metrics",
    "unpack_spans",
]

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
SPANS_TYPE = T.ArrayType(SPAN_STRUCT)

_PA_SPAN = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)


def unpack_spans(batch: pa.RecordBatch, spans_idx: int):
    """Flat-column view of a batch's spans ListArray: returns
    ``(offs, kind_l, text_l, ref_l, off_l, nulls, n_rows)``. Handles
    the sliced-batch case (``lists.offset != 0`` — re-materialized so
    ``.offsets`` indexes ``.values``) and the row-validity mask in ONE
    place for every doc-level stage (extract, select, normalize)."""
    lists = batch.column(spans_idx)
    if lists.offset != 0:
        lists = pa.concat_arrays([lists])
    vals = lists.values
    return (
        lists.offsets.to_pylist(),
        vals.field("kind").to_pylist(),
        vals.field("text").to_pylist(),
        vals.field("media_ref").to_pylist(),
        vals.field("offset").to_pylist(),
        lists.is_valid().to_pylist() if lists.null_count else None,
        len(lists),
    )


def make_doc_stage_fn(doc_fn, n_passthrough: int):
    """Build an Arrow-batch mapper around any per-doc parallel-list
    function ``doc_fn(kinds, texts, refs, offsets) -> (k, t, m, o)``
    (extract_doc, selector.select_doc, ...).

    Expects batches with columns ``[doc_id, <n_passthrough cols>, spans]``
    (enforced by :func:`run_doc_stage`'s select) and emits the same
    layout with the function's output spans.
    """

    def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            spans_idx = n_passthrough + 1
            offs, kind_l, text_l, ref_l, off_l, nulls, n_rows = unpack_spans(
                batch, spans_idx
            )
            ok: list = []
            ot: list = []
            om: list = []
            oo: list = []
            # a None start offset marks the row's output list as NULL
            # (pyarrow reads the row's end from the next non-null
            # offset) — NULL input spans stay NULL, not []
            list_offs: list = []
            for i in range(n_rows):
                if nulls is None or nulls[i]:
                    list_offs.append(len(ok))
                    s, e = offs[i], offs[i + 1]
                    k, t, m, o = doc_fn(
                        kind_l[s:e], text_l[s:e], ref_l[s:e], off_l[s:e]
                    )
                    ok += k
                    ot += t
                    om += m
                    oo += o
                else:
                    list_offs.append(None)
            list_offs.append(len(ok))
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(ok, pa.string()),
                    pa.array(ot, pa.string()),
                    pa.array(om, pa.string()),
                    pa.array(oo, pa.int32()),
                ],
                fields=list(_PA_SPAN),
            )
            spans_out = pa.ListArray.from_arrays(
                pa.array(list_offs, pa.int32()), struct
            )
            cols = [batch.column(j) for j in range(spans_idx)] + [spans_out]
            yield pa.RecordBatch.from_arrays(cols, schema=pa.schema(
                [batch.schema.field(j) for j in range(spans_idx)]
                + [pa.field("spans", pa.list_(_PA_SPAN))]
            ))

    return extract_batches


def make_extract_fn(options: ExtractOptions, n_passthrough: int):
    """Arrow-batch mapper for main-content extraction (the flagship
    doc_fn); see :func:`make_doc_stage_fn` for the batch contract."""

    def doc_fn(kinds, texts, refs, offsets):
        return extract_doc(kinds, texts, refs, offsets, options)

    return make_doc_stage_fn(doc_fn, n_passthrough)


def run_doc_stage(df: DataFrame, batch_fn, passthrough: tuple) -> DataFrame:
    """Prune to ``doc_id, *passthrough, spans`` (Catalyst pushes the
    column pruning into the scan) and run an Arrow-batch mapper built
    by :func:`make_doc_stage_fn` over it."""
    pt = [c for c in passthrough if c in df.columns]
    pruned = df.select("doc_id", *pt, "spans")
    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType())]
        + [pruned.schema[c] for c in pt]
        + [T.StructField("spans", SPANS_TYPE)]
    )
    return pruned.mapInArrow(batch_fn(len(pt)), out_schema)


def extract_spans(
    df: DataFrame,
    options: ExtractOptions = DEFAULT_OPTIONS,
    passthrough: tuple = ("part",),
) -> DataFrame:
    """Run main-content extraction over a corpus DataFrame.

    Input: ``doc_id string, spans array<struct<...>>`` (+ any extra
    columns; those named in ``passthrough`` survive, everything else
    is pruned before the Python boundary). Output: same shape with
    extracted spans (kind ∈ {text, media}).
    """
    return run_doc_stage(
        df, lambda n_pt: make_extract_fn(options, n_pt), passthrough
    )


def span_metrics(df: DataFrame) -> DataFrame:
    """JVM-side per-doc metrics over a spans column (no Python):
    n_spans, n_text_spans, n_media_spans, n_chars."""
    spans = F.col("spans")
    zero = F.lit(0).cast("long")
    return df.withColumns(
        {
            "n_spans": F.size(spans),
            "n_text_spans": F.size(F.filter(spans, lambda s: s["kind"] == F.lit("text"))),
            "n_media_spans": F.size(F.filter(spans, lambda s: s["kind"] == F.lit("media"))),
            "n_chars": F.aggregate(
                spans, zero, lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), zero)
            ),
        }
    )
