"""Single-query scale probe: run any registry query at any fixture dir.

Forces the ENTIRE plan the way bench.py's DIGEST_FETCH does — count +
bit_xor(xxhash64(struct(all columns))) — so no column can be pruned and
nothing data-sized crosses the Arrow boundary (the r9 BENCH_sf10 scd2
lesson: collecting a 15M-row result measures the fetch, not the plan).
The digest also gives plan-equivalence evidence across code changes:
same fixture + same digest = same result rows.

Usage:
  python tools/probe_query.py --sf-dir /root/repo/testdata_sf30 \
      dedup_prefix_filter_join [more names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    qs = registry.all_queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("probe_query")
    for name in args.names:
        t0 = time.time()
        df = qs[name].fn(spark, args.sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: summing 64-bit hashes overflows under ANSI
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("digest"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "name": name,
                    "sf_dir": args.sf_dir,
                    "rows": row["n"],
                    "digest": str(row["digest"]),
                    "wall_s": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
