"""Two-phase global-order primitives — the 100 TB form of the
unpartitioned ``Window.orderBy`` (rank / row_number / running agg).

A bare global ORDER BY window collapses its frame into ONE task
(Spark's "No Partition Defined for Window" warning). Fine on the
deliberately-reduced frames elsewhere in this repo (day-grain,
vocab-grain, decile-grain — each annotated ``frame: bounded``); fatal
on a fact- or entity-sized frame. This module is the shared rewrite
every data-sized site uses (VERDICT r7 #4), generalizing
``window_cumsum_scalable``'s proven shape:

  1. bucket rows by a key derived DETERMINISTICALLY from the order key
     itself (monotone non-decreasing along the order — never
     ``spark_partition_id()`` after ``repartitionByRange``, whose
     sampled boundaries may differ between plan subtrees, ADVICE r03);
  2. per-bucket window (partitioned — parallel, no collapse);
  3. per-bucket totals (a bucket-cardinality frame) become prefix
     offsets via one tiny cumulative window;
  4. broadcast the offsets back and combine.

Bucket boundaries cancel out of prefix algebra, so the result is
IDENTICAL to the one-task window for any bucket expression — bucket
width is purely a parallelism knob (pick it so one bucket's rows fit a
task; a few hundred buckets at test scale). All arithmetic stays in
the source types (bigint/decimal stay exact; running sums of integers
never reorder a floating accumulation), so rewritten queries are
bit-identical to their old plans — proven by the unchanged DuckDB
oracles hash-matching.

Reference scope note: the reference engine has no window functions at
all (SURVEY §2.3); this module exists for the extension surface's
rank/ntile/cumsum family.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def two_phase_ordered(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[Column | str],
    *,
    rn: str | None = None,
    cum_sums: Mapping[str, str] | None = None,
    prev_sums: Mapping[str, str] | None = None,
    prev_maxes: Mapping[str, str] | None = None,
) -> DataFrame:
    """Attach global-order columns without a single-task window.

    ``bucket`` MUST be monotone non-decreasing along ``order_cols``
    (derive it from the leading order key; negate for descending
    orders). Emits, per requested output:

    - ``rn``: global ``row_number()`` (1-based) over the total order;
    - ``cum_sums[src] = out``: inclusive running sum of ``src``;
    - ``prev_sums[src] = out``: exclusive (UNBOUNDED PRECEDING .. -1)
      running sum, 0 for the first row;
    - ``prev_maxes[src] = out``: exclusive running max, NULL for rows
      with no predecessor (matching the window form's semantics).
    """
    cum_sums = dict(cum_sums or {})
    prev_sums = dict(prev_sums or {})
    prev_maxes = dict(prev_maxes or {})
    b = df.withColumn("_tpb", bucket)

    aggs = [F.count(F.lit(1)).alias("_tp_cnt")]
    for i, src in enumerate([*cum_sums, *prev_sums]):
        aggs.append(F.sum(src).alias(f"_tp_s{i}"))
    for i, src in enumerate(prev_maxes):
        aggs.append(F.max(src).alias(f"_tp_m{i}"))
    totals = b.groupBy("_tpb").agg(*aggs)

    # bucket-cardinality frame: tiny by construction
    woff = W.orderBy("_tpb").rowsBetween(W.unboundedPreceding, -1)
    off_cols = [F.coalesce(F.sum("_tp_cnt").over(woff), F.lit(0)).alias("_tp_off_cnt")]
    for i in range(len(cum_sums) + len(prev_sums)):
        off_cols.append(F.sum(f"_tp_s{i}").over(woff).alias(f"_tp_off_s{i}"))
    for i in range(len(prev_maxes)):
        off_cols.append(F.max(f"_tp_m{i}").over(woff).alias(f"_tp_off_m{i}"))
    offsets = totals.select("_tpb", *off_cols)

    wloc = W.partitionBy("_tpb").orderBy(*order_cols)
    wrun = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    wprev = wloc.rowsBetween(W.unboundedPreceding, -1)

    out = b.join(F.broadcast(offsets), "_tpb")
    if rn is not None:
        out = out.withColumn(
            rn, F.row_number().over(wloc) + F.col("_tp_off_cnt")
        )
    srcs = [*cum_sums.items(), *prev_sums.items()]
    for i, (src, name) in enumerate(srcs):
        local = F.sum(src).over(wrun if i < len(cum_sums) else wprev)
        if i >= len(cum_sums):
            local = F.coalesce(local, F.lit(0))
        out = out.withColumn(
            name, local + F.coalesce(F.col(f"_tp_off_s{i}"), F.lit(0))
        )
    for i, (src, name) in enumerate(prev_maxes.items()):
        local = F.max(src).over(wprev)
        off = F.col(f"_tp_off_m{i}")
        out = out.withColumn(
            name,
            F.when(local.isNull(), off)
            .when(off.isNull(), local)
            .otherwise(F.greatest(local, off)),
        )
    drop = ["_tpb", "_tp_off_cnt"]
    drop += [f"_tp_off_s{i}" for i in range(len(srcs))]
    drop += [f"_tp_off_m{i}" for i in range(len(prev_maxes))]
    return out.drop(*drop)


def tie_rank2(
    hist: DataFrame,
    value_col: str,
    weight_col: str,
    bucket: Column,
    out: str = "rank2",
) -> DataFrame:
    """Exact tie-averaged global ranks from a VALUE-GRAIN histogram,
    as doubled integers: rank2 = 2*avg_rank = 2*cum_lt(v) + t_v + 1
    (cum_lt = rows strictly below v, t_v = multiplicity). Integer all
    the way, so per-group rank sums fold exactly in any order —
    rank sums built from rank2/2 are bit-identical to the one-task
    ``rank() + (ties-1)/2`` form (half-integers are exact in doubles
    and their sums stay below 2^53 for any realistic n).
    """
    with_lt = two_phase_ordered(
        hist, bucket, [value_col], prev_sums={weight_col: "_tp_cum_lt"}
    )
    return with_lt.withColumn(
        out,
        (
            F.lit(2) * F.col("_tp_cum_lt").cast("bigint")
            + F.col(weight_col).cast("bigint")
            + F.lit(1)
        ).cast("bigint"),
    ).drop("_tp_cum_lt")


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """Exact twin of ``F.ntile(k)`` from a global row_number ``rn``
    (1-based) and the total row count ``n``: the first ``n % k`` tiles
    get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — Spark's (and
    DuckDB's) ntile fill rule, reproduced with pure integer arithmetic
    so the two-phase rank composes into a scalable ntile."""
    def idiv(a: Column, b: Column) -> Column:
        # exact integer floor-division for non-negative operands:
        # a - a%b is an exact multiple of b, so the double division is
        # exact (no truncation-of-a-rounded-quotient hazard)
        return ((a - a % b) / b).cast("bigint")

    base = idiv(n, F.lit(k))
    rem = (n % k).cast("bigint")
    big_span = (base + 1) * rem  # rows covered by the ceil-sized tiles
    return (
        F.when(base == 0, rn)
        .when(rn <= big_span, idiv(rn - 1, base + 1) + 1)
        .otherwise(rem + idiv(rn - big_span - 1, base) + 1)
    ).cast("int")
