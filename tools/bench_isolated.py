"""Per-query isolated bench: one fresh JVM per query, run sequentially.

Why this exists (VERDICT r03 perf item): BENCH_r03 showed a ~35% wall-time
regression vs BENCH_r02 on the 18 common headline queries with NO plan,
session-conf, or bench.py changes — per-query plans were re-audited and
unchanged. The shared-JVM suite had grown from 18 to 22 headliners
(22 warmups + 66 timed runs in one local[32] JVM), so the two candidate
causes are (a) cumulative JVM heap/GC/code-cache pressure from suite
growth, or (b) a real per-plan slowdown. Running each query in its OWN
JVM — warmed up and repeated inside that JVM exactly like bench.py does —
removes every suite-level effect; whatever regression remains is the
query's, whatever disappears was the suite's.

Usage:
    python tools/bench_isolated.py [name ...]       # default: all bench set
    SPARK_GRAFT_SF_DIR=... to point at another scale factor.

Prints one JSON line: {"metric": "isolated_query_wall", "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from distributed_map_reduce_spark import registry
from distributed_map_reduce_spark.session import get_spark

name = {name!r}
sf_dir = {sf_dir!r}
spark = get_spark("bench-isolated")
q = registry.all_queries()[name]
warm_dir = "/root/testdata/sf0.001"
q.fn(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir).collect()
best, rows = None, 0
for _ in range(3):
    t0 = time.time()
    rows = len(q.fn(spark, sf_dir).collect())
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"name": name, "sec": round(best, 3), "rows": rows}}))
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        from distributed_map_reduce_spark import registry

        names = sorted(registry.bench_queries())
    timings: dict[str, float] = {}
    for name in names:
        code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(f"# {name} FAILED: {out.stderr[-500:]}", file=sys.stderr)
            continue
        timings[name] = rec["sec"]
        print(f"# {name}: {rec['sec']}s ({rec['rows']} rows)", file=sys.stderr)
    print(json.dumps({"metric": "isolated_query_wall", "queries": timings}))


if __name__ == "__main__":
    main()
