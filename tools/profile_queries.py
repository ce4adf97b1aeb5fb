"""Time every registered query at a given SF dir (default sf0.1).

Usage: python tools/profile_queries.py [sf_dir] [name_filter...]

Prints per-query wall seconds (action = count() on the returned DataFrame,
mirroring the driver's materialization) sorted slowest-first, so perf work
targets real outliers rather than guesses.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark()
    qs = registry.all_queries()
    times: dict[str, float] = {}
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            n = q.fn(spark, sf_dir).count()
            times[name] = time.perf_counter() - t0
            print(f"{times[name]:7.2f}s  {name}  rows={n}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  FAIL   {name}: {exc}", flush=True)
    print("\n=== slowest first ===")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:7.2f}s  {name}")
    print(f"\ntotal {sum(times.values()):.1f}s over {len(times)} queries")


if __name__ == "__main__":
    main()
