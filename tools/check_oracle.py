"""Local differential harness: run every registered query on Spark AND its
DuckDB oracle on the same parquet views; compare row count, column names,
and order-insensitive value hash — a local replica of the driver's
correctness gate so failures surface before a round ends.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402
from distributed_map_reduce_spark.sources import TABLES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        # Keep the float/int distinction: the driver's canonicalizer works on
        # pandas dtypes, so a BIGINT 1 and a DOUBLE 1.0 hash differently there.
        # Collapsing them here (as round 1 did) hides type mismatches that the
        # driver then flags (scalar_math_funcs, CORRECTNESS_r01).
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    qs = registry.all_queries()
    names = args.names or sorted(qs)
    spark = get_spark("check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    failures = []
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            hs, ho = value_hash(srows, scols), value_hash(orows, ocols)
            if hs != ho:
                problems.append(f"hash spark={hs} duck={ho}")
                # print a few differing lines to debug
                sset = {"|".join(_norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
                oset = {"|".join(_norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                for ln in list(sset - oset)[:3]:
                    print(f"       spark-only: {ln[:220]}")
                for ln in list(oset - sset)[:3]:
                    print(f"       duck-only:  {ln[:220]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(srows)} hash match [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
