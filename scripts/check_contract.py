"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at sf0.01, then compares row count, column
names, and an order-insensitive canonicalized value multiset. Run
before committing contract changes:  python scripts/check_contract.py
[query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from xhtmlkit_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # BIT-EXACT, like the driver's value hash: the old f"{v:.6f}"
        # re-rounded the stored binary, masking last-ulp disagreements
        # between Spark's HALF_UP BigDecimal round and DuckDB's double
        # rounding — exactly the class that shipped three driver-red
        # queries in r04 (VERDICT r04 ask #2). local-green must imply
        # driver-green, so compare the raw bit pattern.
        return struct.pack(">d", v).hex()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = "|".join(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    t_start = time.monotonic()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_q = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"✗ {name}: SPARK ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"– {name}: rows-only ({len(srows)} rows, cols={scols})"
                f" [{time.monotonic() - t_q:.1f}s spark,"
                f" {time.monotonic() - t_start:.0f}s cum]"
            )
            if len(srows) == 0:
                print(f"  ⚠ zero rows from rows-only query")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            print(f"✗ {name}: DUCKDB ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"✗ {name}: COLUMNS spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"✗ {name}: ROWS spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            ms_s = row_multiset(scols, [[r[c] for c in scols] for r in srows])
            ms_d = row_multiset(dcols, drows and [list(r) for r in drows] or [])
            if ms_s != ms_d:
                diff_s = {k: v for k, v in ms_s.items() if ms_d.get(k) != v}
                diff_d = {k: v for k, v in ms_d.items() if ms_s.get(k) != v}
                print(f"✗ {name}: VALUES differ ({len(diff_s)} spark-only keys)")
                for k in list(diff_s)[:3]:
                    print(f"    spark: {k}")
                for k in list(diff_d)[:3]:
                    print(f"    duck : {k}")
                ok = False
        if ok:
            print(
                f"✓ {name}: {len(srows)} rows match"
                f" [{time.monotonic() - t_q:.1f}s,"
                f" {time.monotonic() - t_start:.0f}s cum]"
            )
        else:
            failures += 1
    print(
        f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}"
        f" ({time.monotonic() - t_start:.0f}s total)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
