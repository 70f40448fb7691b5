"""Seeded randomized differential tests: the Spark implementations of
the line/window operators vs obvious pure-Python references over a
randomly generated line-sharing corpus (one Spark job per operator —
the hypothesis-per-example pattern would pay a Spark collect per
example). Complements the planted-case tests and the DuckDB oracle
parity gate with breadth: heavy cross-doc and intra-doc duplication,
normalization collisions, unicode, and ragged window tails."""

from __future__ import annotations

import hashlib
import random

import pytest

pytestmark = pytest.mark.spark

SEED = 20260817


@pytest.fixture(scope="session")
def spark():
    from xhtmlkit_spark.session import get_spark

    return get_spark("local[2]", shuffle_partitions=4, app_name="rand-ref-tests")


def _rand_corpus(n_docs: int = 120) -> list[tuple[int, str]]:
    """Docs made of lines drawn from a small shared pool (heavy
    duplication) plus unique lines, with random case/whitespace noise
    so normalization collisions actually occur."""
    rng = random.Random(SEED)
    pool = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "ε"]) for _ in range(rng.randint(1, 6)))
        for _ in range(25)
    ]
    docs = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.6:
                line = rng.choice(pool)
                if rng.random() < 0.3:
                    line = line.upper()
                if rng.random() < 0.3:
                    line = "  " + line.replace(" ", "   ") + " "
            else:
                line = f"unique {i} {rng.randint(0, 10**6)}"
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    return docs


def _norm_key(line: str) -> str:
    return hashlib.md5(" ".join(line.lower().split()).encode()).hexdigest()


def test_line_dedup_matches_pure_python_reference(spark):
    from xhtmlkit_spark.operators.lines import line_dedup, split_text_lines

    docs = _rand_corpus()
    # pure-Python reference: first occurrence by (doc_id, line_idx)
    seen: set = set()
    expect: dict = {}
    for doc_id, text in docs:
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        if not lines:
            continue
        kept = []
        for ln in lines:
            k = _norm_key(ln)
            if k not in seen:
                seen.add(k)
                kept.append(ln)
        expect[doc_id] = (len(lines), len(kept), "\n".join(kept) or None)

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text"])
        for r in line_dedup(df, split_text_lines("text")).collect()
    }
    assert got == expect
    # sanity: the corpus actually exercised duplication and total drops
    assert sum(v[0] for v in expect.values()) > sum(v[1] for v in expect.values())
    assert any(v[1] == 0 for v in expect.values()) or len(expect) > 50


def test_token_windows_matches_pure_python_reference(spark):
    from xhtmlkit_spark.operators.text_stats import token_windows

    rng = random.Random(SEED + 1)
    docs = [
        (i, " ".join(f"w{rng.randint(0, 30)}" for _ in range(rng.randint(1, 90))))
        for i in range(150)
    ]
    W, S = 16, 11
    expect = {}
    for doc_id, text in docs:
        toks = text.split()
        n_win = 1 + max(0, -(-(len(toks) - W) // S))  # ceil
        for i in range(n_win):
            win = toks[i * S : i * S + W]
            expect[(doc_id, i)] = (
                len(win),
                hashlib.md5(" ".join(win).encode()).hexdigest(),
            )

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
    got = {
        (r["doc_id"], r["win_idx"]): (r["n_win_tokens"], r["win_md5"])
        for r in token_windows(df, window=W, stride=S).collect()
    }
    assert got == expect
    # coverage invariant: the overlap is W-S tokens, so window 0 plus
    # each later window minus its first W-S tokens rebuilds every doc
    for doc_id, text in docs:
        toks = text.split()
        n_win = 1 + max(0, -(-(len(toks) - W) // S))
        wins = [toks[i * S : i * S + W] for i in range(n_win)]
        rebuilt = list(wins[0])
        for w in wins[1:]:
            rebuilt += w[W - S :]
        assert rebuilt == toks, doc_id
