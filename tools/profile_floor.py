"""Decompose the per-query bench floor (VERDICT r10 #4): for a trivial
query, split construction (plan build + parquet listing) from execution
(jobs + collect), and A/B session confs that change the job cadence.

Usage: python tools/profile_floor.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or ["text_wordcount_topn", "q1_pricing_summary", "dedup_exact"]
    spark = get_spark("profile_floor")
    qs = registry.all_queries()
    # warmup
    for name in names:
        qs[name].fn(spark, SF).collect()
    for name in names:
        for i in range(4):
            t0 = time.time()
            df = qs[name].fn(spark, SF)
            t1 = time.time()
            rows = df.collect()
            t2 = time.time()
            print(
                f"{name} pass{i}: construct={t1 - t0:.3f}s execute={t2 - t1:.3f}s"
                f" rows={len(rows)}"
            )


if __name__ == "__main__":
    main()
