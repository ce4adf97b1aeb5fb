"""Resumable sf1 smoke sweep: execute EVERY registered query at a larger
scale factor (default ./testdata_sf1) in one JVM and record wall time,
row count, and any error to a JSONL ledger — no timing rigor, just
"does the plan survive 10x data".

Why this exists: the round-5 isolated sf1 bench caught two latent
scale bugs correctness at sf0.01 can never see — a bounded-key-space
blocking join whose pair count grew QUADRATICALLY with the corpus
(dedup_edit_distance_block, 75x blowup) and an ANSI bigint moment-sum
overflow (stats_chow_test aborts entirely at sf1 revenue scale). Both
were invisible to the oracle gate and the sf0.1 bench. This sweep runs
the whole registry through the same trap.

Usage:
    python tools/sf1_smoke.py [--sf DIR] [--out LEDGER] [--limit N]

Resumable: names already present in the ledger are skipped, so the
sweep can be re-launched until it completes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from distributed_map_reduce_spark import registry  # noqa: E402
from distributed_map_reduce_spark.session import get_spark  # noqa: E402


# No exclusions (round 8): dedup_prefix_filter_join — the last one —
# was set-factored (Jaccard depends only on the distinct-token SET, so
# the join runs over distinct sets and per-doc degrees expand
# arithmetically; see its docstring) and now runs at any SF of this
# corpus. dedup_mllib_minhash_join stopped skipping in round 6 (capped
# to a fixed 2000-document slab, library-demo posture) after its
# uncapped form measured 619s at sf1.
SKIP: dict[str, str] = {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(REPO, "testdata_sf1"))
    ap.add_argument("--out", default="/tmp/sf1_smoke.jsonl")
    ap.add_argument("--limit", type=int, default=0, help="stop after N new queries")
    args = ap.parse_args()

    done: set[str] = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except (json.JSONDecodeError, KeyError):
                    pass

    spark = get_spark("sf1_smoke")
    queries = registry.all_queries()
    todo = [n for n in sorted(queries) if n not in done]
    print(f"{len(done)} done, {len(todo)} to go", file=sys.stderr)
    ran = 0
    with open(args.out, "a") as out:
        for name in todo:
            t0 = time.monotonic()
            rec: dict = {"name": name}
            if name in SKIP:
                rec["skipped"] = SKIP[name]
                out.write(json.dumps(rec) + "\n")
                out.flush()
                ran += 1
                continue
            try:
                rec["rows"] = queries[name].fn(spark, args.sf).count()
            except Exception as e:  # record and continue — this IS the point
                rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            rec["wall_s"] = round(time.monotonic() - t0, 2)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            ran += 1
            if args.limit and ran >= args.limit:
                break
    print("swept", ran, file=sys.stderr)


if __name__ == "__main__":
    main()
