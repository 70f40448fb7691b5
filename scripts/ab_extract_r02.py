"""In-process A/B: r02-commit extractor vs HEAD on the same corpus docs.

Round-3 bench showed extract_spans 6.73 -> 8.99 s (r02 -> r03) while
the host probe improved; the contended scaling re-measure said
"weather" but could not prove it. This harness settles the SINGLE-CORE
question the way PLANS.md's round-3 methodology prescribes: both
implementations loaded in ONE interpreter (no subprocess noise floor),
warmed, randomized execution order per round, per-side minima, and an
identical-copy control to establish the noise floor.

Usage:
    python scripts/ab_extract_r02.py [--ref GITREF] [--rounds N]
                                     [--sample-mod K] [--corpus PATH]

It materializes the ref's xkit/ tree under data/ab_<ref>/ via
`git archive`, imports it with sys.modules juggling (the tree keeps
its internal absolute imports), and times xkit.doc.extract_doc over a
deterministic sample of the bench corpus. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import random
import shutil
import subprocess
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_xkit_tree(root: str):
    """Import the xkit package rooted at ``root`` and return its
    extract_doc, leaving sys.modules exactly as found (the returned
    function keeps working: its module objects stay referenced)."""
    saved = {k: v for k, v in sys.modules.items() if k == "xkit" or k.startswith("xkit.")}
    for k in list(saved):
        del sys.modules[k]
    sys.path.insert(0, root)
    try:
        importlib.invalidate_caches()
        doc = importlib.import_module("xkit.doc")
        fn = doc.extract_doc
        # contamination guard: sys.modules is restored to HEAD's xkit.*
        # in the finally below — BEFORE timing — so a LAZY
        # (function-level) `from xkit... import` executed later inside
        # any module the ref extract path loaded would silently resolve
        # to HEAD code and bias the A/B toward "no regression". Refuse
        # to measure in that case (scan only the transitively-loaded
        # ref modules: an unused module's lazy import is harmless).
        import re as _re

        lazy = _re.compile(r"^[ \t]+(from xkit[.\s]|import xkit)", _re.M)
        for name, mod in list(sys.modules.items()):
            if (name == "xkit" or name.startswith("xkit.")) and getattr(
                mod, "__file__", ""
            ).startswith(root):
                m = lazy.search(open(mod.__file__).read())
                if m:
                    raise SystemExit(
                        f"ref module {mod.__file__} has a function-level xkit "
                        f"import ({m.group(0).strip()!r}) that would resolve to "
                        "HEAD's modules after the sys.modules restore — A/B invalid"
                    )
    finally:
        for k in [k for k in sys.modules if k == "xkit" or k.startswith("xkit.")]:
            del sys.modules[k]
        sys.path.remove(root)
        sys.modules.update(saved)
    return fn


def materialize_ref(ref: str) -> str:
    out = os.path.join(REPO, "data", f"ab_{ref}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    tar = subprocess.run(
        ["git", "-C", REPO, "archive", ref, "xkit"], capture_output=True, check=True
    )
    subprocess.run(["tar", "-x", "-C", out], input=tar.stdout, check=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="5688314")  # round-2 driver commit
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--sample-mod", type=int, default=10)
    ap.add_argument(
        "--corpus", default=os.path.join(REPO, "data", "corpus_sf0.1_120000.parquet")
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq

    t = pq.read_table(args.corpus, columns=["doc_id", "spans"])
    docs = []
    n_chars = 0
    for batch in t.to_batches():
        d = batch.to_pylist()
        for row in d:
            if zlib.crc32(row["doc_id"].encode()) % args.sample_mod:
                continue
            spans = row["spans"] or []
            kinds = [s["kind"] for s in spans]
            texts = [s["text"] for s in spans]
            refs = [s["media_ref"] for s in spans]
            offs = [s["offset"] for s in spans]
            n_chars += sum(len(x) for x in texts if x)
            docs.append((kinds, texts, refs, offs))
    mb = n_chars / 1e6

    ref_root = materialize_ref(args.ref)
    sides = {
        args.ref: load_xkit_tree(ref_root),
        "HEAD": load_xkit_tree(REPO),
        # identical-copy control: HEAD loaded a second time from a
        # copied tree (distinct module objects, same code) — its ratio
        # vs HEAD is the noise floor
        "HEAD-copy": None,
    }
    copy_root = os.path.join(REPO, "data", "ab_head_copy")
    if os.path.exists(copy_root):
        shutil.rmtree(copy_root)
    os.makedirs(copy_root)
    shutil.copytree(
        os.path.join(REPO, "xkit"),
        os.path.join(copy_root, "xkit"),
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    sides["HEAD-copy"] = load_xkit_tree(copy_root)

    def run(fn) -> float:
        t0 = time.perf_counter()
        for kinds, texts, refs, offs in docs:
            fn(kinds, texts, refs, offs)
        return time.perf_counter() - t0

    # equality spot-check: the two sides must produce identical spans
    for kinds, texts, refs, offs in docs[:50]:
        assert sides[args.ref](kinds, texts, refs, offs) == sides["HEAD"](
            kinds, texts, refs, offs
        ), "r02 and HEAD disagree on output spans — not a pure perf delta"

    for fn in sides.values():  # warm
        for d in docs[:100]:
            fn(*d)

    rng = random.Random(7)
    best: dict[str, float] = {k: float("inf") for k in sides}
    walls: dict[str, list] = {k: [] for k in sides}
    for _ in range(args.rounds):
        order = list(sides)
        rng.shuffle(order)
        for name in order:
            w = run(sides[name])
            walls[name].append(round(w, 3))
            best[name] = min(best[name], w)

    out = {
        "docs": len(docs),
        "mb": round(mb, 1),
        "rounds": args.rounds,
        "best_sec": {k: round(v, 3) for k, v in best.items()},
        "mb_per_sec": {k: round(mb / v, 1) for k, v in best.items()},
        "head_vs_ref": round(best["HEAD"] / best[args.ref], 4),
        "noise_floor": round(best["HEAD-copy"] / best["HEAD"], 4),
        "walls": walls,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
