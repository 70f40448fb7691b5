"""Quick shared-host contention probe (~20 s).

The sandbox's co-tenant load comes in multi-minute bursts that crush
wide jobs (see CLAUDE.md). Run this before trusting any wall-clock
measurement: quiet-window reference is ~100 MB/s at mp8 and
~200-270 MB/s at mp32 (2.2-2.5x). Exits 0 when the host looks quiet
(mp32 >= --min-mb32), 1 otherwise — usable as a gate in a retry loop:

    until python scripts/host_probe.py; do sleep 120; done && \
        python scripts/scaling_bench.py
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _work(args):
    from xkit.doc import extract_doc

    n = 0
    for a in args:
        n += len(extract_doc(*a)[0])
    return n


def probe(widths=(8, 32), repeats: int = 3) -> dict:
    import pyarrow.parquet as pq

    from xhtmlkit_spark.datagen import generate_corpus

    # chunk_docs MUST match __spark_entry__._corpus_path: whoever runs
    # first materializes this path, and a single-file corpus silently
    # serializes every later Spark scan of it (CLAUDE.md)
    corpus = generate_corpus(
        os.path.join(REPO, "data", "corpus_sf0.01_2000.parquet"),
        2000,
        seed=42,
        chunk_docs=1000,
    )
    tbl = pq.read_table(corpus, columns=["spans"])
    docs = tbl.column("spans").combine_chunks().to_pylist()[:1000]
    args = [
        (
            [s["kind"] for s in d],
            [s["text"] for s in d],
            [s["media_ref"] for s in d],
            [s["offset"] for s in d],
        )
        for d in docs
        if d
    ]
    mb = sum(len(s["text"] or "") for d in docs for s in d) / 1e6
    out = {}
    for procs in widths:
        with mp.Pool(procs) as pool:
            pool.map(_work, [args[:4]] * procs)  # warm imports
            best = float("inf")
            for _ in range(repeats):
                t0 = time.monotonic()
                pool.map(_work, [args[i::procs * 4] for i in range(procs * 4)])
                best = min(best, time.monotonic() - t0)
        out[f"mp{procs}_mb_per_sec"] = round(mb * 1 / best, 1)
    return out


def main() -> None:
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--min-mb32", type=float, default=150.0)
    ap.add_argument("--widths", default="8,32")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    widths = tuple(int(w) for w in args.widths.split(","))
    r = probe(widths=widths, repeats=args.repeats)
    quiet = r.get("mp32_mb_per_sec", 0) >= args.min_mb32
    print(json.dumps({**r, "quiet": quiet}))
    sys.exit(0 if quiet else 1)


if __name__ == "__main__":
    main()
