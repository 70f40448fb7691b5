"""xkit — pure-Python HTML/PDF main-content extraction core.

Spark-free, dependency-free (stdlib only) package implementing the
reference capabilities of the public repo ``jrsell/XHtmlKit`` (a
streaming, tag-soup-tolerant HTML parser for .NET), re-expressed as an
ordered-span extractor per SURVEY.md §2 Layer A and BASELINE.json's
north rule.

NOTE on citations: ``/root/reference`` is empty in this sandbox
(verified — SURVEY.md §0), so reference citations in this package are
at *public-repo file granularity* (``[P: XHtmlKit/HtmlTextReader.cs]``
style) and the pytest golden files under ``tests/golden/`` are the
frozen specification of the exact semantics.

Modules
-------
entities   : HTML5 entity decoding                  (SURVEY A10–A12)
tokenizer  : streaming tag-soup tokenizer            (SURVEY A5–A13)
dom        : token-stream repair (implicit closes)   (SURVEY A14–A19)
extract    : boilerplate strip + ordered span emit   (SURVEY A22–A25)
encoding   : BOM / <meta> charset sniffing           (SURVEY A3–A4)
pdfmini    : fixture-dialect PDF text extraction     (SURVEY A26)
options    : ExtractOptions                          (SURVEY A21)
doc        : per-document span pipeline (the unit of work per row)

This package is shipped to executors via ``spark-submit --py-files
xkit.zip``; it must stay importable with nothing but the stdlib.
"""

from xkit.options import ExtractOptions  # noqa: F401

__version__ = "0.1.0"
