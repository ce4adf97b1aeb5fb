"""Deterministic sf1 generator: 10x the driver's sf0.1 tables by key-offset
replication (VERDICT r03 #8 — "generate sf1 once and run the 22
headliners; the 100 TB design claims should show sublinear degradation").

The driver's testdata is read-only and its generator isn't shipped, so
sf1 is derived from sf0.1 itself: each fact/dim table is replicated
REPLICAS times with every key column offset by k*stride (stride = max
key + 1, computed from the data), preserving referential integrity —
replica k's lineitems join replica k's orders/parts/suppliers, exactly
like adding nine more disjoint sf0.1 tenants. region/nation stay fixed
(they are fixed-size in TPC-H at every sf). Two de-degeneracy tweaks keep
scaled query behavior honest rather than pathological:

- documents: replica k>0 appends a ' r<k>' token, so each replica keeps
  the original corpus's internal dup/near-dup structure instead of
  creating 10-way exact-dup groups whose LSH candidate pairs would grow
  quadratically in the replication factor;
- embeddings: replica k>0 gets a tiny deterministic per-dim perturbation
  (k * 3e-4 * ((i % 7) - 3)), so ANN buckets grow in population, not in
  exact-duplicate mass.

Everything is plain DuckDB SQL — no RNG, byte-identical on re-run.
Output: ./testdata_sf1/*.parquet (gitignored; ~10x sf0.1 on disk).

Usage: python tools/gen_sf1.py [--src /root/testdata/sf0.1] [--dst testdata_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPLICAS = 10

# table -> {column: stride_source_table.column} ; stride = max(col)+1 of the
# OWNING table so foreign keys shift in lockstep with their dimension.
KEYED = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(REPO, "testdata_sf1"))
    ap.add_argument(
        "--replicas",
        type=int,
        default=REPLICAS,
        help="key-offset copies of --src (10 -> sf1, 100 -> sf10)",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to generate (r10: the sf100 probe "
        "needs only documents,embeddings — the full fixture would not "
        "fit the box's free disk)",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    for t in list(KEYED) + COPY_ONLY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
        )

    strides: dict[tuple[str, str], int] = {}
    for t, keys in KEYED.items():
        for _, (src_t, src_c) in keys.items():
            if (src_t, src_c) not in strides:
                strides[(src_t, src_c)] = (
                    con.execute(f"SELECT max({src_c}) + 1 FROM {src_t}").fetchone()[0]
                )

    for t in COPY_ONLY:
        if only is not None and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        if only is not None and t not in only:
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE {t}").fetchall()]
        exprs = []
        for c in cols:
            if c in keys:
                src = strides[keys[c]]
                exprs.append(f"{c} + k * {src} AS {c}")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN k = 0 THEN text ELSE text || ' r' || k END AS text"
                )
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN k = 0 THEN n_chars "
                    "ELSE n_chars + 2 + len(CAST(k AS VARCHAR)) END AS n_chars"
                )
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    "CASE WHEN k = 0 THEN embedding ELSE "
                    "list_transform(list_zip(embedding, range(1, len(embedding) + 1)),"
                    " p -> CAST(p[1] + k * 0.0003 * ((p[2] % 7) - 3) AS FLOAT)) "
                    "END AS embedding"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.execute(
            f"""
            COPY (
              SELECT {sel}
              FROM {t} CROSS JOIN (SELECT unnest(range({args.replicas})) AS k)
            ) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
