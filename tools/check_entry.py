"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet, compare row count + order-insensitive values (columns sorted by
name, floats rounded). Usage:

    python tools/check_entry.py [sf_dir] [only_query ...]

Shared inputs are derived ONCE per run (SPARK_GRAFT_CACHE_DERIVED=1:
sources.derived persists each table per session, and the rank family
shares one built graph — VERDICT r3 task 5). Set
SPARK_GRAFT_CACHE_DERIVED=0 to force the per-query cold derivation the
driver's own gate performs. Before/after full-gate wall: see the
"gate replica caching" entry in PROGRESS.jsonl (measured per round).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

os.environ.setdefault("SPARK_GRAFT_CACHE_DERIVED", "1")
if os.environ.get("SPARK_GRAFT_CACHE_DERIVED") == "0":
    del os.environ["SPARK_GRAFT_CACHE_DERIVED"]

import __spark_entry__ as entrymod  # noqa: E402
from ps_projekt_pagerank_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("check-entry")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        dt_spark = time.perf_counter() - t0
        if name not in oracles:
            print(
                f"ok?  {name}: rows-only ({len(srows)} rows, "
                f"{dt_spark:.1f}s, no oracle)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures.append(name)
            continue
        # align duckdb column order to spark names case-insensitively
        sn = normalize(srows, [c.lower() for c in scols])
        dn = normalize(drows, [c.lower() for c in dcols])
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
            failures.append(name)
            continue
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures.append(name)
            continue
        print(f"PASS {name}: {len(sn)} rows ({dt_spark:.1f}s spark)")

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
