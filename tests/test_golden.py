"""Golden-file correctness gate (BASELINE.json north_rule).

Re-expression of the reference parser-test corpus ([P:
XHtmlKit.Tests/HtmlParserTests.cs] et al., SURVEY.md §5) as frozen
span-sequence goldens: for every case, extraction output must be
span-sequence-equal — (kind, text, media_ref, order) — to the pinned
expectation. Goldens are authored-as-spec (reference dir is empty,
SURVEY.md §0) via scripts/gen_goldens.py and committed.
"""

from __future__ import annotations

import base64
import glob
import json
import os

import pytest

from xkit.doc import extract_doc
from xkit.options import ExtractOptions

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

_ALL_CASES = []
for path in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json"))):
    with open(path) as f:
        data = json.load(f)
    fname = os.path.basename(path)[:-5]
    for case in data["cases"]:
        _ALL_CASES.append(pytest.param(case, id=f"{fname}/{case['name']}"))


def _input_lists(case):
    if "spans" in case:
        spans = case["spans"]
        return (
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
    if "raw_b64" in case:
        return ["html"], [base64.b64decode(case["raw_b64"])], [None], [0]
    return ["html"], [case["html"]], [None], [0]


@pytest.mark.parametrize("case", _ALL_CASES)
def test_golden_span_sequence_equality(case):
    kwargs = dict(case.get("options") or {})
    if case.get("base_url"):
        kwargs["base_url"] = case["base_url"]
    opts = ExtractOptions(**kwargs)
    k, t, m, o = extract_doc(*_input_lists(case), options=opts)
    got = [
        {"kind": k[i], "text": t[i], "media_ref": m[i], "offset": o[i]}
        for i in range(len(k))
    ]
    assert got == case["expected_spans"]


def test_golden_corpus_is_nontrivial():
    # guard against an accidentally emptied golden dir silently passing
    assert len(_ALL_CASES) >= 50
