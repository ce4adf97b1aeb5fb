"""Scale-ladder bench: one warmed pass of chosen headline queries at an
arbitrary fixture dir, writing a BENCH_sfN-style JSON artifact.

Exists because the r9 sf10 refresh was an ad-hoc script that collected
full results instead of routing through bench.py's DIGEST_FETCH — so
`temporal_scd2_history` read as 123.6 s when ~118 s of it was Arrow-
fetching 15M rows to Python (VERDICT r9 "What's wrong" #1). This tool
imports bench._execute, so digest handling (and any future additions to
DIGEST_FETCH) can never diverge from the driver-run bench again.

Single pass by default (scale probes answer "does the plan survive and
roughly how does wall grow", not "what is the steady-state minimum");
--passes 3 reproduces bench.py's interleaved-min discipline when a
defensible number is needed.

Usage:
  python tools/bench_scale.py --sf-dir /root/repo/testdata_sf10 \
      --out BENCH_sf10.json [--queries a,b,c] [--passes 1] [--note ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _execute  # noqa: E402  (digest-honoring executor)
from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset; default = the full bench headliner set",
    )
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--note", default=None)
    args = ap.parse_args()

    bench = registry.bench_queries()
    names = sorted(args.queries.split(",") if args.queries else bench)
    unknown = [n for n in names if n not in bench]
    if unknown:
        sys.exit(f"not bench queries: {unknown}")

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1].lstrip("_")
    spark = get_spark("bench_scale")

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            bench[name].fn(
                spark, warm_dir if os.path.isdir(warm_dir) else args.sf_dir
            ).collect()
        except Exception as e:  # pragma: no cover - warmup best-effort
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(args.passes):
        for name in names:
            # GC breather PER QUERY, not per pass (r10): at sf10 the
            # non-digest queries collect up to 4.5M rows each, and
            # accumulated driver/JVM pressure inflated later queries up
            # to 6x in a single-breather run (ann 147.6s vs a 27.6s
            # fresh-JVM probe of the same plan) — the same shared-JVM
            # drift class bench.py's per-round breather bounds at sf0.1,
            # which one breather per 23 sf10 collects cannot.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            df = bench[name].fn(spark, args.sf_dir)
            rows[name] = _execute(df, name)
            dt = time.time() - t0
            timings[name] = round(min(dt, timings.get(name, dt)), 3)
            print(f"# {name}: {timings[name]}s ({rows[name]} rows)", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "passes": args.passes,
    }
    if args.note:
        out["note"] = args.note
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({"written": args.out, "total": out["value"]}))


if __name__ == "__main__":
    main()
