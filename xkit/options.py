"""Extraction options (SURVEY.md A21).

The reference exposes ``HtmlParserOptions`` ([P:
XHtmlKit/HtmlParserOptions.cs]) — notably a base URL for resolving
relative links. Our analogue also centralizes every boilerplate
heuristic threshold so the frozen golden semantics live in ONE place
(SURVEY.md §7 "isolate every rule table for cheap re-tuning").
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractOptions:
    """Knobs for xkit.extract; defaults are the golden-file-frozen spec.

    base_url          : absolutize relative media src via urljoin (A21)
    max_link_density  : drop a text block when anchor_chars/chars
                        exceeds this (A23 link-density penalty)
    min_text_density  : drop a block when chars/(1+inline_tags) falls
                        below this (A23 tag-ratio scoring)
    min_block_chars   : drop blocks shorter than this after whitespace
                        collapse (A25)
    fragment          : parse as an HTML SNIPPET, not a full page
                        (A18/§3.3 fragment mode): head/title subtrees
                        are NOT dropped and head is NOT auto-closed by
                        body content — a fragment has no document
                        structure to normalize. Boilerplate heuristics
                        (nav/footer/script, density) still apply.
    pdf_password      : corpus-wide password for standard-security
                        PDFs (A26): tried as the user password, then
                        the owner password, then the empty user
                        password per document — so a mixed corpus of
                        open and protected documents extracts with one
                        setting. Wrong/absent password degrades that
                        document to no spans, never raises.
    """

    base_url: str | None = None
    max_link_density: float = 0.5
    min_text_density: float = 2.0
    min_block_chars: int = 1
    fragment: bool = False
    pdf_password: str = ""


DEFAULT_OPTIONS = ExtractOptions()
