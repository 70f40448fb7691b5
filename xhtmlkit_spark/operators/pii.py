"""PII detection + redaction for training-data pipelines.

Standard corpus-prep hygiene: find emails / NANP-style phone numbers /
IPv4 addresses and replace them with typed placeholder tokens before
text ships to a training corpus. Everything is JVM-side regexp
expressions (`regexp_extract_all` / `regexp_replace`) — row-local, no
shuffle, whole-stage-codegen'd — so the operator costs one scan at any
corpus size.

The patterns deliberately live in the RE2 ∩ java.util.regex common
subset (no lookaround, no backreferences): both engines use
leftmost-first greedy matching for these constructs, so the DuckDB
oracle twin (`__spark_entry__.oracle_sql["pii_redaction"]`) computes
bit-identical results.

Semantics frozen here (mirrored in SQL):

* counts (``n_emails`` / ``n_phones`` / ``n_ips``) are pattern
  frequencies on the RAW text, independent of each other;
* ``redacted`` applies the replacements sequentially email → phone →
  IP (an email is redacted before its digits could feed the phone
  pattern);
* NULL text propagates (NULL counts, NULL redacted) — the caller
  decides whether NULL-text rows were dropped upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["EMAIL_RE", "PHONE_RE", "IPV4_RE", "with_pii_redaction"]

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# NANP-shaped ddd<sep>ddd<sep>dddd with -/. separators; \b keeps it off
# longer digit runs. (A production pipeline would add locale tables —
# the operator shape is what matters here.)
PHONE_RE = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def with_pii_redaction(df: DataFrame, text: str = "text") -> DataFrame:
    """Add ``n_emails``/``n_phones``/``n_ips`` (raw-text match counts,
    BIGINT) and ``redacted`` (text with matches replaced by
    ``<EMAIL>``/``<PHONE>``/``<IP>``, in that order)."""
    c = F.col(text)

    def n(pattern: str):
        return F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("long")

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return df.withColumns(
        {
            "n_emails": n(EMAIL_RE),
            "n_phones": n(PHONE_RE),
            "n_ips": n(IPV4_RE),
            "redacted": redacted,
        }
    )
