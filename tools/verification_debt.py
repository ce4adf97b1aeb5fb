"""Verification-debt tracker: which oracled queries have never received
a driver CORRECTNESS row, and is the current _DRIVER_WINDOW well-formed?

The driver oracle-checks only the FIRST 50 entries of ``all_queries()``
each round, so the window in ``registry._DRIVER_WINDOW`` is the whole
lever on the backlog. This tool computes, from the committed
CORRECTNESS_r*.json files:

- cumulative distinct driver-tested queries (and any non-green rows),
- the never-tested oracled backlog, grouped by family,
- window hygiene: exactly 50 entries, all registered, all oracled,
  zero already-tested repeats unless annotated, and first-50 ordering.

Usage: python tools/verification_debt.py [--list]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true", help="print every never-tested name")
    args = ap.parse_args()

    from distributed_map_reduce_spark import registry

    qs = registry.all_queries()
    oracled = {n for n, q in qs.items() if q.oracle is not None}

    tested: dict[str, list[tuple[str, bool]]] = defaultdict(list)
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            ok = bool(row.get("hash_match")) and row.get("err") is None
            tested[name].append((os.path.basename(f), ok))

    # r1/r2 canonicalizer-era red rows on sketch queries whose SQL oracle
    # was later removed as non-replayable (VERDICT r5: "both since
    # handled") — they are rows-only by design now, so the historical
    # hash-fail rows are not an open defect.
    known_resolved = {"agg_approx_distinct", "agg_approx_percentiles"}
    nongreen = {
        n: rows
        for n, rows in tested.items()
        if not rows[-1][1] and n not in known_resolved
    }
    never = sorted(oracled - set(tested))

    print(f"registry: {len(qs)} queries, {len(oracled)} oracled")
    print(f"driver-tested (distinct): {len(tested)}")
    print(f"latest-row-non-green: {len(nongreen)}")
    for n, rows in sorted(nongreen.items()):
        print(f"  !! {n}: {rows}")
    print(f"never-driver-tested oracled backlog: {len(never)}")
    fam: dict[str, int] = defaultdict(int)
    for n in never:
        fam[n.split("_")[0]] += 1
    print("backlog by family:", dict(sorted(fam.items(), key=lambda kv: -kv[1])))

    win = registry._DRIVER_WINDOW
    first50 = list(qs)[:50]
    problems = []
    if len(win) != 50:
        problems.append(f"window has {len(win)} entries, driver checks 50")
    if len(set(win)) != len(win):
        problems.append("window has duplicates")
    missing = [n for n in win if n not in qs]
    if missing:
        problems.append(f"window names not registered: {missing}")
    unoracled = [n for n in win if n in qs and qs[n].oracle is None]
    if unoracled:
        problems.append(f"window entries without oracle (rows-only slot): {unoracled}")
    repeats = [n for n in win if n in tested]
    if repeats:
        problems.append(
            f"window repeats already-tested queries (fine only under "
            f"rule (a) — changed semantics): {repeats}"
        )
    if first50 != list(win):
        problems.append("all_queries() first-50 ordering != window")

    if problems:
        print("window hygiene:")
        for p in problems:
            print(f"  - {p}")
    else:
        print("window hygiene: OK (50 unique oracled never-tested, ordered first)")

    if args.list:
        for n in never:
            print(n)
    return 1 if (nongreen or any("not registered" in p for p in problems)) else 0


if __name__ == "__main__":
    raise SystemExit(main())
