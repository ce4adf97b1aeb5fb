"""Deduplication suite for a training-data pipeline: exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Design for 100 TB (the published playbook — Broder'97 minwise hashing,
Charikar'02 SimHash, the GPT-3/C4 dedup recipes):

- **Exact**: one hash-aggregate on a text fingerprint. No full-text
  shuffle: group on `md5(normalized_text)`, carry only ids.
- **MinHash+LSH**: shingle → k independent min-hashes → band the
  signature → candidates share a (band_id, band_key) bucket → verify
  exact Jaccard only on candidates. Each stage is a narrow projection or
  one keyed exchange; the quadratic all-pairs never materializes.
- **SimHash**: 32-bit fingerprint from token-hash bit votes; near-dups
  have small Hamming distance; blocking on a signature prefix keeps the
  pair space linear (rotations/multi-table extend recall at scale).
- **n-gram Jaccard**: the exact verifier, blocked on (lang, length
  bucket) — |A∩B|/|A∪B| ≥ τ implies a length ratio ≥ τ, so same-bucket
  blocking is near-lossless for high τ.
- **Embedding cosine**: IVF-style blocking (here the `label` column;
  in production the LSH bucket from operators.similarity) + exact cosine
  within blocks.

Hashes are engine-portable by construction: one md5 per shingle reduced
to an int mod 2^31−1, then k universal-hash functions (a·h+b mod p) with
literal constants — so the DuckDB oracle replays the identical
algorithm bit-for-bit. Recall on planted near-duplicates is proven in
tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from ..registry import register
from ..sources import load_table

N_HASHES = 12
N_BANDS = 4  # => rows per band r = 3
SHINGLE_K = 3
MINHASH_TAU = 0.5
# dedup_prefix_filter_join broadcast budget, in DISTINCT SETS: below this
# the probe side (S·(K+1) rows of three longs) and both mask relations
# (S rows of W≈1–3 packed longs) broadcast. The deserialized hash-
# relation footprint is ~500 B/set across the three relations (UnsafeRow
# + open-addressing overhead dominates the 24–50 B of payload), so the
# threshold pins the broadcast tier to ~200 MB — a production executor's
# comfortable broadcast headroom. The cliff is MEASURED: the r9 sf30
# probe (S = 1.16M distinct sets → ~600 MB of broadcast builds) died
# with UNABLE_TO_ACQUIRE_MEMORY as the pinned relations starved unified
# execution memory; 400k keeps 3× margin under it. Past the threshold
# the same algebra runs as keyed shuffle_hash joins. The switch is
# measured from the materialized set table (one count on checkpointed
# rows), so the plan adapts to the corpus like AQE does, not to the
# scale factor label.
PARTITIONED_SETSIM_SETS = 400_000
# Partitioned-tier intra-bucket chunk width, in SETS: a (gid, g60)
# bucket is an indivisible self-join key, so one populous bucket (the
# g60=0 "no tokens in this group" class grows with the corpus) is a
# quadratic pair-producer that AQE's skew split cannot touch — skew
# detection sizes the INPUT partition, which for a 200k-set bucket is a
# few MB, while the pair fan-out behind it is 2·10¹⁰ rows (measured: 4
# straggler tasks pinned the r10 sf30 probe past its 1 h budget with 32
# cores idle). Buckets wider than this split into B = ⌈pop/CHUNK⌉
# hash-chunks per side; each side replicates B× tagged with the other
# side's chunk id, the join key widens to (gid, g60, ca, cb), and every
# pair meets exactly once in exactly one of the B² cells. Per-cell work
# is bounded by CHUNK² verifies and per-cell shuffle read by ~2·CHUNK
# rows, so AQE's parallelism-first coalescing packs cells evenly across
# cores — bytes become an honest proxy for pair work, which is the
# property the unchunked bucket lacked. Replication cost is pop²/CHUNK
# rows ≪ the pop² pair stream it spreads. Cold buckets (pop ≤ CHUNK)
# get B = 1: zero replication, plan identical to the pre-chunk tier.
PARTITIONED_SETSIM_CHUNK = 4_096
NGRAM_TAU = 0.6


def spark_partitions(df: DataFrame) -> int:
    """Target width for CPU-bound narrow stages: the session's default
    parallelism (not the file count, which for small local parquet is 1)."""
    return df.sparkSession.sparkContext.defaultParallelism


# ---------------------------------------------------------------------------
# Building blocks (importable; tests exercise them on planted fixtures)
# ---------------------------------------------------------------------------
def tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles from an already-materialized token array.
    ``toks`` MUST be a plain column reference in hot paths: the k
    element_at calls inside the lambda re-evaluate whatever expression
    ``toks`` is per element, so an inlined split() turns O(n) into
    O(n·k·|text|). 1-based `element_at` mirrors DuckDB. Inputs shorter
    than k produce an EMPTY shingle set — the guard is explicit because
    Spark's sequence(1, 0) DESCENDS ([1, 0]) and element_at(toks, 0)
    throws."""
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Convenience form for small inputs/tests; hot paths project
    tokens_col into its own column first (see minhash_lsh_pairs)."""
    return shingles_from_tokens(tokens_col(text), k)


# Universal-hash MinHash: ONE md5 per shingle gives a base integer; the
# k hash functions are (a_s * base + b_s) mod P — integer ops, not k md5
# passes. P = 2^31-1 keeps a*base inside int64 on every engine. The
# (a_s, b_s) constants are fixed literals so DuckDB replays bit-for-bit.
MINHASH_P = 2147483647
HASH_A = [(1103515245 * (s + 1) + 12345) % MINHASH_P for s in range(N_HASHES)]
HASH_B = [(s * 2654435761) % MINHASH_P for s in range(N_HASHES)]


def jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) ROWS — the fully-relational base of the
    MinHash pipeline (``array_distinct`` on 48-element string arrays costs
    ~2 ms/row; ``dropDuplicates`` is a vectorized exchange)."""
    # Spread the md5-heavy scan across cores: a single small local parquet
    # file otherwise plans as one input partition (a real cluster scan is
    # already wide).
    toks = docs.repartition(spark_partitions(docs)).select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    )
    k = SHINGLE_K
    # sequence(1, 0) descends in Spark — short docs need an explicit
    # empty index array (same guard as shingles_from_tokens)
    idx = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("toks", i + j) for j in range(k)])
    )
    return toks.select("doc_id", F.explode(shingle).alias("s")).dropDuplicates(["doc_id", "s"])


def shingle_hash_rows_raw(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """RAW (doc_id, h) rows — one 60-bit md5 prefix per exploded word
    shingle, duplicates NOT yet removed (a doc repeating a shingle emits
    it twice). Consumers that reduce per doc anyway (signature mins are
    duplicate-insensitive; ``collect_set`` dedups inside the same
    aggregation) take this form and skip the (doc_id, h) dedup exchange
    entirely (r11, guide §2.4); the relational join-count verify needs
    distinct ROWS and goes through :func:`shingle_hash_rows`."""
    toks = docs.repartition(spark_partitions(docs)).select(
        F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("toks")
    )
    k = SHINGLE_K
    idx = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at("toks", i + j) for j in range(k)])
    )
    return toks.select("doc_id", F.explode(shingle).alias("s")).select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )


def shingle_hash_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (doc_id, h) rows, h = the 60-bit md5 prefix of the word
    shingle — the hot-path twin of :func:`shingle_rows` (r9). MinHash
    banding needs only h % P and exact-Jaccard verification already
    intersects these SAME 60-bit prefixes (see :func:`verify_jaccard`),
    so hashing once at the explode and deduplicating on (doc_id, h)
    lets banding, both verify joins, and the size aggregate all reuse
    ONE integer-keyed exchange — the string form paid a second md5 pass
    plus a second full (doc_id, h) dedup exchange inside verify.
    Output-identical to the string pipeline: the per-doc distinct-h set
    is what every downstream consumer reduces over either way (min for
    signatures, count for sizes, equi-join for intersections)."""
    return shingle_hash_rows_raw(docs, id_col, text_col).dropDuplicates(
        ["doc_id", "h"]
    )


def banded_keys(sh_rows: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) LSH bucket rows: one hash-aggregate with
    k vectorized ``min`` columns (universal hashing over the per-shingle
    md5 int); band keys concatenate signature columns. Accepts either
    string shingle rows (doc_id, s) or pre-hashed rows (doc_id, h) from
    :func:`shingle_hash_rows` — the signature min is over the same
    integer multiset either way."""
    b_col = (
        (F.col("h") % MINHASH_P)
        if "h" in sh_rows.columns
        else (F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint") % MINHASH_P)
    )
    base = sh_rows.select("doc_id", b_col.alias("b"))
    sig = base.groupBy("doc_id").agg(
        *[
            F.min((F.lit(HASH_A[s]) * F.col("b") + F.lit(HASH_B[s])) % MINHASH_P).alias(f"h{s}")
            for s in range(N_HASHES)
        ]
    )
    r = N_HASHES // N_BANDS
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)])
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_id", "band_key"),
    )


def band_candidates(sh_rows: DataFrame) -> DataFrame:
    """MinHash-band candidate pairs (doc_a < doc_b), ids only: candidates
    share a (band_id, band_key) bucket. This is THE candidate generator
    for every exact PAIR verifier in this module — bucket-bounded, never
    block-quadratic in candidate generation, but PAIR-quadratic inside a
    bucket by construction (a 100-clone family yields C(100,2) bucket
    pairs). Cluster-level consumers use :func:`star_candidates`."""
    banded = banded_keys(sh_rows)
    return (
        banded.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(banded.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
              ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


LSH_BUCKET_CAP = 16  # band_candidates_capped: drop buckets larger than this


def band_candidates_capped(sh_rows: DataFrame, cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Pair candidates from SIZE-CAPPED LSH buckets: buckets with more
    than ``cap`` members are dropped entirely before the pair join, so
    candidate volume is bounded by Σ C(min(n, cap), 2) ≤ buckets·C(cap,2)
    — LINEAR in the corpus, whatever the clone structure. This is the
    executable form of the module's degree-cap triage for pair-exact
    graph consumers (graph.py edge-feed policy): an over-cap bucket is a
    template/boilerplate family whose pairwise structure is C(n,2) BY
    CONSTRUCTION — the capped variant surrenders exactly those hubs
    (they are what `dedup_minhash_clusters` handles linearly via star
    edges) and keeps every pair among ordinary documents. Bucket sizing
    is one unordered window over the banded rows — the same single
    exchange `star_candidates` pays for its hub min."""
    from pyspark.sql import Window

    banded = banded_keys(sh_rows)
    bn = F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key"))
    kept = banded.withColumn("bn", bn).filter(F.col("bn") <= cap)
    return (
        kept.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            kept.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            ["band_id", "band_key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _per_doc_minhash(sh_raw: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k-1}, hs, n): the 12 signature mins, the doc's
    distinct shingle-hash array, and its size from ONE doc-keyed
    aggregation, pinned behind an explicit repartition("doc_id") so the
    band explode and both array-verify join sides reuse a single
    materialization (exchange reuse only happens at Exchange nodes).
    Shared by the LINEAR-candidate generators (star, capped) — see
    :func:`minhash_star_pairs` for why the pair-quadratic generator must
    NOT use the array verify.

    r11 (guide §2.4 — remove shuffles outright): takes RAW hash rows
    (:func:`shingle_hash_rows_raw`) and dedups INSIDE this aggregation —
    ``min`` is duplicate-insensitive, ``collect_set`` IS the per-doc
    distinct set, and ``n = size(hs)`` — so the upstream (doc_id, h)
    dropDuplicates exchange (a second full shuffle of the shingle table)
    disappears. Same signature mins → same band keys → same candidates;
    same distinct array (order irrelevant to array_intersect) → same
    verified pairs; digest-verified at sf0.01/sf0.1."""
    b = F.col("h") % MINHASH_P
    return (
        sh_raw.groupBy("doc_id")
        .agg(
            *[
                F.min((F.lit(HASH_A[s]) * b + F.lit(HASH_B[s])) % MINHASH_P).alias(f"h{s}")
                for s in range(N_HASHES)
            ],
            F.collect_set("h").alias("hs"),
        )
        .withColumn("n", F.size("hs").cast("bigint"))
        .repartition("doc_id")
    )


def _banded_from_per_doc(per_doc: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) from the per-doc signature columns —
    the same band keys :func:`banded_keys` derives, read off the shared
    per-doc materialization instead of a second signature aggregate."""
    r = N_HASHES // N_BANDS
    return per_doc.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", *[F.col(f"h{bb * r + j}") for j in range(r)])
                    for bb in range(N_BANDS)
                ]
            )
        ).alias("band_id", "band_key"),
    )


def _verify_jaccard_arrays(cand: DataFrame, per_doc: DataFrame, tau: float) -> DataFrame:
    """Exact-Jaccard verification for LINEAR candidate sets: attach each
    side's distinct-hash array with an edge-sized join and compute
    |A∩B| as size(array_intersect(..)) in the projection. Equal to the
    relational join-count (both arrays are distinct by construction);
    digest-verified against it at sf0.01/sf0.1/sf1/sf10. ONLY safe when
    the candidate set is linear in the corpus (star / capped feeds) —
    pair-quadratic candidates would carry arrays across the second
    join's exchange (the module's NOTHING-PAIR-SIZED rule)."""
    arr_a = per_doc.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("n_a")
    )
    arr_b = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("n_b")
    )
    # shuffle_hash keeps the plan shape scale-invariant (r9 sf30 lesson:
    # AQE's compressed-bytes estimate can flip a corpus-sized side into
    # a broadcast build that OOMs the driver).
    joined = (
        cand.hint("shuffle_hash")
        .join(arr_a, "doc_a")
        .hint("shuffle_hash")
        .join(arr_b, "doc_b")
    )
    n_inter = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        joined.withColumn("n_inter", n_inter)
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs_capped(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = MINHASH_TAU,
    cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Verified near-dup pairs from size-capped LSH buckets — the
    scale-bounded twin of :func:`minhash_lsh_pairs` (r10, VERDICT r9
    missing #3): same shingle/sign/band/verify algebra, but mega-buckets
    are dropped before the pair join, so the output (and every shuffle)
    stays linear on clone-heavy corpora where the uncapped pair list
    grows as clones².

    r10 OPTIMIZATION: because the cap bounds candidates at
    Σ C(min(n, cap), 2) — linear — this generator qualifies for the same
    array verify as the star path (see :func:`minhash_star_pairs`): one
    per-doc aggregation feeds band keys, bucket sizing, and both verify
    sides; the shingle table crosses one exchange instead of three.
    Output-identical (same band keys → same kept buckets → same pairs;
    distinct-array intersection == the join count), digest-verified at
    sf0.01/sf0.1/sf1. r11: feeds from RAW hash rows — the per-doc
    aggregation dedups (see :func:`_per_doc_minhash`), one exchange
    fewer."""
    from pyspark.sql import Window

    per_doc = _per_doc_minhash(shingle_hash_rows_raw(docs, id_col, text_col))
    banded = _banded_from_per_doc(per_doc)
    bn = F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_key"))
    kept = banded.withColumn("bn", bn).filter(F.col("bn") <= cap)
    cand = (
        kept.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
        .join(
            kept.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key"),
            ["band_id", "band_key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard_arrays(cand, per_doc, tau)


def star_candidates(sh_rows: DataFrame) -> DataFrame:
    """LINEAR-output LSH candidates: per (band_id, band_key) bucket emit a
    STAR from the bucket's min doc_id instead of all C(n,2) pairs —
    Σ(n−1) edges connect exactly the same buckets, so connected
    components over (verified) star edges replace the pair-quadratic
    bucket join for cluster-level dedup (VERDICT r7 #1: 27.2M pairs →
    ~0.5M edges on the sf10 clone-family fixture). Hub resolution is one
    UNORDERED window min per bucket (whole-partition frame — no sort):
    one exchange of the banded rows, where the r8 agg+join-back form
    paid two exchanges plus a join stage for the same answer."""
    from pyspark.sql import Window

    banded = banded_keys(sh_rows)
    hub = F.min("doc_id").over(Window.partitionBy("band_id", "band_key"))
    return (
        banded.withColumn("hub", hub)
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = MINHASH_TAU,
) -> DataFrame:
    """shingle → sign → band → bucket-join → verify. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ tau.

    Fully relational shape — no wide array columns anywhere:

    1. :func:`shingle_rows` explodes to distinct (doc_id, shingle) rows,
    2. :func:`band_candidates` signs + bands them; candidates are ids-only,
    3. verify = join-count: |A∩B| from an equi-join on shingle,
       |A∪B| = |A|+|B|−|A∩B| — never materializes a pair of arrays.

    At 100 TB every stage is a narrow project or one keyed exchange with
    map-side combine; the checkpointed row tables are what a production
    pipeline writes out as the LSH index."""
    # sh_rows is consumed by the signature agg, both verify joins, and
    # the size agg. No persist/checkpoint barrier: all four consumers
    # share the dropDuplicates exchange, which Spark dedupes to one
    # physical computation (ReusedExchange) — and unlike persist/
    # localCheckpoint, nothing accumulates driver-side across calls
    # (persist taxes every later CacheManager lookup; checkpoint blocks
    # pile up until a cleaner storm stalls some later job).
    sh_h = shingle_hash_rows(docs, id_col, text_col)
    return verify_jaccard(band_candidates(sh_h), sh_h, tau)


def verify_jaccard(cand: DataFrame, sh_rows: DataFrame, tau: float) -> DataFrame:
    """Exact-Jaccard verification of an ids-only candidate set against
    the (doc_id, shingle) row table: |A∩B| from an equi-join on shingle,
    |A∪B| = |A|+|B|−|A∩B| — never materializes a pair of arrays.

    The join runs on a 60-bit md5 prefix of the shingle instead of the
    ~50-byte shingle string (r8: the verify join was the hottest shuffle
    of the sf10 dedup headliner — hashed keys cut its width ~4×). The
    DuckDB twin (_verified_sql) intersects the SAME md5-prefix lists, so
    a 60-bit collision — ~3e-4 expected per 26M-shingle fixture —
    changes both engines identically and the hash-equality gate holds
    unconditionally; at driver scale (57k shingles) collision odds are
    ~1e-9 and outputs are bit-identical to the string-keyed form.

    Accepts pre-hashed (doc_id, h) rows from :func:`shingle_hash_rows`
    as-is (already distinct — no second dedup exchange); string rows
    get hashed + deduplicated here."""
    sh_h = (
        sh_rows
        if "h" in sh_rows.columns
        else sh_rows.select(
            "doc_id",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint").alias("h"),
        ).dropDuplicates(["doc_id", "h"])
    )
    sizes = sh_h.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # shuffle_hash hints on BOTH verify joins (r9, caught by the sf30
    # probe): every join side here is corpus-sized by construction
    # (candidates ~ O(docs); the shingle-hash table ~ O(docs·shingles);
    # the first join's output ~ O(candidates · shingles/doc), ~95M rows
    # at sf30), so broadcast is never the right strategy past toy scale
    # — but AQE sizes broadcast builds by COMPRESSED shuffle bytes and
    # at sf30 flipped a sub-64MB-compressed side into a 1 GiB+
    # deserialized build that blew driver/executor memory (hinting only
    # the second join re-OOMed: the first join's broadcast still
    # anchors the over-eager plan). Pinning both keeps the plan shape
    # scale-invariant; the sf0.1 cost is ~1s of small shuffles on the
    # headliner — the price of a plan that survives every decade.
    inter = (
        cand.hint("shuffle_hash")
        .join(sh_h.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .hint("shuffle_hash")
        .join(sh_h.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    verified = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
    )
    return verified.filter(F.col("jaccard") >= tau).select("doc_a", "doc_b", "jaccard")


def minhash_star_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = MINHASH_TAU,
) -> DataFrame:
    """shingle → sign → band → bucket STAR → verify: the linear-output
    edge generator for cluster-level dedup. Returns verified
    (doc_a=hub, doc_b, jaccard) with jaccard ≥ tau; Σ_buckets (n−1)
    edges instead of Σ C(n,2) pairs. Recall note: two docs sharing a
    bucket connect only if both their hub edges verify — a bucket pair
    whose members each clear τ against the hub stays connected, but a
    (b,c) pair in a bucket whose hub a matches neither is surrendered
    (the full-pair generator would keep it). On clone-family corpora the
    hub is itself a family member, so family recall is unchanged.

    r10 OPTIMIZATION (guide §2.3/§2.4 — shuffle fewer bytes, remove
    shuffles): because star edges are LINEAR in the corpus, verification
    switches from the row-relational join-count (which shuffled the full
    (doc_id, h) table twice — once per pair side — then paid an
    aggregation exchange and two more size joins) to per-doc hash ARRAYS:
    ONE groupBy(doc_id) emits the 12 signature mins, the doc's distinct-h
    array, and its size together; candidates attach the two arrays with
    two edge-sized joins and compute |A∩B| as
    ``size(array_intersect(hs_a, hs_b))`` in the projection. Both sides
    of ``array_intersect`` are distinct by construction (dropDuplicates
    upstream), so its distinct-intersection semantics equal the join
    count — measured digest-identical at sf0.01/sf0.1/sf1. Plan effect at
    sf0.1: 8 exchanges → 4; the 260k-row shingle table crosses ONE
    exchange (the signature agg it always paid) instead of three; the
    pair-side shuffles carry only the 258 candidate edges. This stays
    scale-safe precisely because the star feed bounds pairs at Σ(n−1):
    the pair-quadratic generator `minhash_lsh_pairs` keeps the
    relational verify, whose fanned intermediate never carries arrays
    across an exchange (the module's NOTHING-PAIR-SIZED rule).

    r11 (guide §2.4): the (doc_id, h) dropDuplicates exchange is gone
    too — the per-doc aggregation consumes RAW hash rows and dedups via
    collect_set (see :func:`_per_doc_minhash`), so the shingle table now
    crosses NO standalone dedup exchange before the signature agg."""
    from pyspark.sql import Window

    per_doc = _per_doc_minhash(shingle_hash_rows_raw(docs, id_col, text_col))
    banded = _banded_from_per_doc(per_doc)
    hub = F.min("doc_id").over(Window.partitionBy("band_id", "band_key"))
    cand = (
        banded.withColumn("hub", hub)
        .filter(F.col("doc_id") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard_arrays(cand, per_doc, tau)


def simhash_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document, the scale-shaped way: explode tokens,
    hash each token to one 32-bit int (md5 first 8 hex chars), then a
    single groupBy with 32 vectorized bit-vote sums — map-side partial
    aggregation, one exchange on doc id, no nested array expressions.
    Fingerprint bit j = sign of sum over tokens of (2·bit_j(hash) − 1)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("w")
    )
    h = tok.select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("v")
    )
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum((F.shiftright(F.col("v"), j).bitwiseAND(F.lit(1))) * 2 - 1).alias(f"v{j}")
            for j in range(32)
        ]
    )
    bits = [
        F.when(F.col(f"v{j}") >= 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        for j in range(32)
    ]
    sh = bits[0]
    for b in bits[1:]:
        sh = sh + b
    return votes.select("doc_id", sh.alias("simhash"))


def _simhash_sql(source: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """The identical SimHash in DuckDB SQL (same explode/group shape)."""
    vote_cols = ",\n         ".join(
        f"sum((((v >> {j}) & 1) * 2 - 1)) AS v{j}" for j in range(32)
    )
    bit_sum = " + ".join(
        f"(CASE WHEN v{j} >= 0 THEN {2**j}::BIGINT ELSE 0::BIGINT END)" for j in range(32)
    )
    return f"""
  tok AS (SELECT {id_col} AS doc_id,
                 unnest(list_filter(string_split(lower({text_col}), ' '), w -> w <> '')) AS w
          FROM {source}),
  h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS v FROM tok),
  votes AS (SELECT doc_id, {vote_cols} FROM h GROUP BY doc_id),
  s AS (SELECT doc_id, ({bit_sum}) AS simhash FROM votes)"""


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    bench=True,
    tags=("dedup",),
    oracle="""
WITH fp AS (
  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents
), canon AS (
  SELECT fingerprint, min(doc_id) AS keep_doc, count(*) AS n_copies
  FROM fp GROUP BY fingerprint
)
SELECT keep_doc, n_copies FROM canon
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-aggregate on a normalized-text fingerprint; the
    exchange carries (hash, id) — never the text itself."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (
        docs.select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc", "n_copies")
    )


# Shared WITH-clause body: shingle → sign → band rows (through `banded`).
# Extended below into the pair-candidate form (_MINHASH_CAND_SQL) and the
# linear star-edge form (_MINHASH_STAR_SQL), mirroring shingle_rows /
# band_candidates / star_candidates exactly.
_MINHASH_BAND_SQL = f"""toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks WHERE len(t) >= {SHINGLE_K}
), ints AS (
  SELECT doc_id, shingles,
         list_transform(shingles,
                        x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % {MINHASH_P}) AS b
  FROM sh
), sig AS (
  SELECT doc_id, shingles,
         list_transform([{", ".join(f"[{a}, {b}]" for a, b in zip(HASH_A, HASH_B))}],
                        ab -> list_aggregate(list_transform(b, x -> (ab[1] * x + ab[2]) % {MINHASH_P}), 'min')) AS mh
  FROM ints
), banded AS (
  SELECT doc_id, shingles, unnest(range(0, {N_BANDS})) AS band_id,
         unnest(list_transform(range(0, {N_BANDS}),
                bb -> mh[bb*3+1] || '|' || mh[bb*3+2] || '|' || mh[bb*3+3])) AS band_key
  FROM sig
)"""

_MINHASH_CAND_SQL = f"""{_MINHASH_BAND_SQL}, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)"""

# Capped-bucket candidates: mirror of band_candidates_capped — bucket
# sizes from the same banded rows, over-cap buckets dropped before the
# pair join (the scale-bounded pair feed; see minhash_lsh_pairs_capped).
_MINHASH_CAND_CAPPED_SQL = f"""{_MINHASH_BAND_SQL}, bsz AS (
  SELECT band_id, band_key, count(*) AS bn
  FROM banded GROUP BY band_id, band_key
), kept AS (
  SELECT b.doc_id, b.band_id, b.band_key
  FROM banded b JOIN bsz ON b.band_id = bsz.band_id AND b.band_key = bsz.band_key
  WHERE bsz.bn <= {LSH_BUCKET_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.band_id = b.band_id AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)"""

# Star-edge candidates: one hub (min doc_id) per bucket, (hub, other)
# edges only — Σ(n−1) rows per bucket instead of C(n,2).
_MINHASH_STAR_SQL = f"""{_MINHASH_BAND_SQL}, hubs AS (
  SELECT band_id, band_key, min(doc_id) AS hub
  FROM banded GROUP BY band_id, band_key
), cand AS (
  SELECT DISTINCT h.hub AS doc_a, b.doc_id AS doc_b
  FROM banded b JOIN hubs h ON h.band_id = b.band_id AND h.band_key = b.band_key
  WHERE b.doc_id <> h.hub
)"""


def _verified_sql(cand_sql: str, tau: float = MINHASH_TAU) -> str:
    # verify on 60-bit md5 shingle prefixes, mirroring verify_jaccard:
    # both engines hash with the same md5, so collisions (if any) are
    # shared and the differential gate holds unconditionally
    return f"""
WITH {cand_sql}, shh AS (
  SELECT doc_id,
         list_distinct(list_transform(shingles,
             x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS hs
  FROM sh
), verified AS (
  SELECT doc_a, doc_b,
         round(len(list_intersect(sa.hs, sb.hs)) * 1.0
               / len(list_distinct(list_concat(sa.hs, sb.hs))), 4) AS jaccard
  FROM cand
  JOIN shh sa ON sa.doc_id = cand.doc_a
  JOIN shh sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {tau}
"""


_MINHASH_STAR_ORACLE = _verified_sql(_MINHASH_STAR_SQL)

_MINHASH_ORACLE = _verified_sql(_MINHASH_CAND_SQL)

_MINHASH_CAPPED_ORACLE = _verified_sql(_MINHASH_CAND_CAPPED_SQL)



@register("dedup_minhash_lsh", tags=("dedup",), oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join→
    verify); the DuckDB oracle replays the identical portable hashes.

    Jaccard semantics note (ADVICE r8): the emitted `jaccard` — here and
    in every graph/pipeline consumer that embeds this pair derivation —
    is computed over 60-bit-hash-distinct shingles (:func:`verify_jaccard`),
    so under a hash collision the value (and a near-tau pass/fail) can
    differ from string-exact Jaccard; both engines hash identically, so
    the differential gate holds unconditionally.

    CALIBRATION-SCALE ONLY (demoted from the bench set in r8, VERDICT r7
    #1): the pair LIST is output-quadratic on clone-heavy corpora (27.2M
    pairs, 371.9s at sf10) — useful for threshold calibration on a
    bounded sample, never the corpus-wide pass. The headline dedup query
    is [[dedup_minhash_clusters]] (star edges → connected components →
    keeper), whose output is one row per clustered doc."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash",
    tags=("dedup",),
    oracle=f"""
WITH {_simhash_sql()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM s a JOIN s b
  ON (a.simhash >> 24) = (b.simhash >> 24) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit fingerprints, block on the top
    8-bit prefix, keep Hamming distance ≤ 6 (rotations add recall at
    scale; tested on planted dups in tests/test_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    s = simhash_df(docs)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(
            b,
            (F.shiftright(F.col("sh_a"), 24) == F.shiftright(F.col("sh_b"), 24))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .filter(hamming <= 6)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )


@register(
    "dedup_ngram_jaccard",
    tags=("dedup",),
    oracle=f"""
WITH {_MINHASH_CAND_SQL}, d AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS words
  FROM documents
)
SELECT cand.doc_a, cand.doc_b,
       round(len(list_intersect(a.words, b.words)) * 1.0
             / len(list_distinct(list_concat(a.words, b.words))), 4) AS jaccard
FROM cand
JOIN d a ON a.doc_id = cand.doc_a
JOIN d b ON b.doc_id = cand.doc_b
WHERE len(list_intersect(a.words, b.words)) * 1.0
      / len(list_distinct(list_concat(a.words, b.words))) >= {NGRAM_TAU}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard as a VERIFY stage over MinHash-band
    candidate pairs. Round 1 blocked on (lang, len-bucket), whose
    dominant-language x common-length block is quadratic at 100 TB
    (VERDICT r01); the band bucket bounds the candidate count by
    construction, and recall is tunable via N_BANDS/N_HASHES."""
    docs = load_table(spark, sf_dir, "documents")
    cand = band_candidates(shingle_rows(docs))
    d = docs.select("doc_id", F.array_distinct(tokens_col(F.col("text"))).alias("words"))
    jac = jaccard(F.col("w_a"), F.col("w_b"))
    return (
        cand.join(d.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("w_a")), "doc_a")
        .join(d.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("w_b")), "doc_b")
        .filter(jac >= NGRAM_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _embedding_cosine_oracle() -> str:
    from .similarity import _adaptive_sig_sql

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     {_adaptive_sig_sql('e')},
     b AS (SELECT e.vec_id, e.v, s.bucket FROM e JOIN sigs s USING (vec_id))
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b2.v), 6) AS cos_sim
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= 0.3
"""


@register(
    "dedup_embedding_cosine",
    tags=("dedup", "similarity"),
    oracle=_embedding_cosine_oracle(),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact cosine ≥ 0.3 verified only within
    random-hyperplane LSH buckets (operators.similarity
    .adaptive_bucketed). Round 1 blocked on the data's `label` column,
    which is unbounded at 100 TB (VERDICT r01); round 6 made the plane
    count DATA-ADAPTIVE (max(8, ceil(log2(N/64))), mirrored in the
    oracle) so the expected bucket population — and with it per-bucket
    pair work — stays ~constant as the corpus grows instead of the
    static 2^8-way bucket's linear growth. Same candidate generator the
    ANN probe path uses, so the index is built once and shared."""
    from ..functions.vectors import dot, norm
    from .similarity import adaptive_bucketed

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    # Norms once per ROW (N folds), never per pair: cosine(a,b) inline
    # would re-fold dot(a,a)/dot(b,b) on every candidate — 3 aggregate()
    # evaluations per pair instead of 1, measured 11.5s -> ~4s at sf1.
    # sqrt(dot(v,v)) per row is the identical float expression, so the
    # pair-side value is bit-unchanged.
    b = adaptive_bucketed(e).withColumn("nrm", norm(F.col("v")))
    a = b.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"), "bucket",
    )
    bb = b.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"), "bucket",
    )
    sim = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    return (
        a.join(bb, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= 0.3)
        .select("vec_a", "vec_b", "cos_sim")
    )


CONTAIN_MAXDF = 20  # inverted-index df cap: shingles in more docs are noise


def containment_candidates(sh_rows: DataFrame, maxdf: int = CONTAIN_MAXDF) -> DataFrame:
    """Candidate pairs sharing at least one RARE shingle (2 ≤ df ≤ maxdf).

    MinHash bands are Jaccard-tuned: a short doc embedded in a long one
    has Jaccard ≈ |A|/|B| → band-collision probability ~J^r ≈ 0, so the
    band generator structurally misses the containment class (proven by
    tests/test_operators_ext.py::test_containment_catches_subdocument).
    The df-capped inverted index is the standard prefix-filter substitute:
    each shingle with df=d yields ≤ d(d-1)/2 pairs, so the cap bounds the
    per-shingle fan-out and boilerplate shingles (high df) never join.
    """
    df_tab = sh_rows.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") >= 2) & (F.col("df") <= maxdf)
    )
    rare = sh_rows.join(df_tab.select("s"), "s")
    return (
        rare.select(F.col("doc_id").alias("doc_a"), "s")
        .join(rare.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


_CONTAIN_CAND_SQL = f"""toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
  FROM documents
), shr AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks WHERE len(t) >= {SHINGLE_K}
), dfs AS (
  SELECT s FROM shr GROUP BY s HAVING count(*) BETWEEN 2 AND {CONTAIN_MAXDF}
), rare AS (
  SELECT shr.doc_id, shr.s FROM shr JOIN dfs USING (s)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b USING (s) WHERE a.doc_id < b.doc_id
)"""


@register(
    "dedup_containment",
    tags=("dedup",),
    oracle=f"""
WITH {_CONTAIN_CAND_SQL}, d AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS words
  FROM documents
)
SELECT cand.doc_a, cand.doc_b,
       round(len(list_intersect(a.words, b.words)) * 1.0
             / least(len(a.words), len(b.words)), 4) AS containment
FROM cand
JOIN d a ON a.doc_id = cand.doc_a
JOIN d b ON b.doc_id = cand.doc_b
WHERE len(list_intersect(a.words, b.words)) * 1.0
      / least(len(a.words), len(b.words)) >= 0.8
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup: |A∩B| / min(|A|,|B|) ≥ 0.8 over rare-shingle
    inverted-index candidates — catches the sub-document class (a short
    doc quoted inside a long one scores ~1 here but far below any Jaccard
    threshold), which MinHash banding misses by construction.

    Shape at 100 TB: one df aggregate on shingle, a df-capped self-join
    (fan-out ≤ maxdf per shingle — never corpus-quadratic), ids-only
    candidates, then word sets join in by id for the exact verify.
    """
    docs = load_table(spark, sf_dir, "documents")
    cand = containment_candidates(shingle_rows(docs))
    d = docs.select("doc_id", F.array_distinct(tokens_col(F.col("text"))).alias("words"))
    # r10 (guide §1.2 per-task work): the containment expression is
    # evaluated ONCE per pair via withColumn — the old filter+select
    # form repeated the O(|A|+|B|) array_intersect in two operators and
    # codegen subexpression elimination does not reliably span the
    # filter/project boundary. Digest-identical at sf0.1 (1,056,367
    # rows). The pair volume itself is output-bound on clone-heavy
    # corpora (94% of candidates pass τ here) — the honest cost is the
    # verify, not the plan.
    return (
        cand.join(d.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("w_a")), "doc_a")
        .join(d.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("w_b")), "doc_b")
        .withColumn(
            "c",
            F.size(F.array_intersect(F.col("w_a"), F.col("w_b")))
            / F.least(F.size("w_a"), F.size("w_b")),
        )
        .filter(F.col("c") >= 0.8)
        .select("doc_a", "doc_b", F.round(F.col("c"), 4).alias("containment"))
    )


@register(
    "dedup_minhash_estimate_audit",
    tags=("dedup", "sketch"),
    oracle=f"""
WITH {_MINHASH_CAND_SQL}
SELECT cand.doc_a, cand.doc_b,
       round(len(list_filter(range(1, {N_HASHES + 1}),
                             i -> sa.mh[i] = sb.mh[i])) * 1.0 / {N_HASHES}, 4)
           AS est_jaccard,
       round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4)
           AS exact_jaccard,
       round(abs(len(list_filter(range(1, {N_HASHES + 1}),
                                 i -> sa.mh[i] = sb.mh[i])) * 1.0 / {N_HASHES}
                 - len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                   / len(list_distinct(list_concat(sa.shingles, sb.shingles)))), 4)
           AS abs_err
FROM cand
JOIN sig sa ON sa.doc_id = cand.doc_a
JOIN sig sb ON sb.doc_id = cand.doc_b
""",
)
def dedup_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every band candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of agreeing signature components, the
    Broder'97 unbiased estimator) next to the EXACT shingle Jaccard and
    their absolute error — the calibration report that justifies
    N_HASHES/N_BANDS before a 100 TB dedup run commits to thresholds.

    Signatures and exact sets both join in by doc id on the ids-only
    candidate list; cost is candidate-bounded like every verify stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh_rows = shingle_rows(docs)
    cand = band_candidates(sh_rows)
    base = sh_rows.select(
        "doc_id",
        "s",
        (F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint") % MINHASH_P).alias("b"),
    )
    sig = base.groupBy("doc_id").agg(
        F.collect_set("s").alias("shingles"),
        *[
            F.min((F.lit(HASH_A[s]) * F.col("b") + F.lit(HASH_B[s])) % MINHASH_P).alias(f"h{s}")
            for s in range(N_HASHES)
        ],
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"h{s}").alias(f"a{s}") for s in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"h{s}").alias(f"b{s}") for s in range(N_HASHES)],
    )
    agree = sum(
        (F.col(f"a{s}") == F.col(f"b{s}")).cast("int") for s in range(N_HASHES)
    ) / float(N_HASHES)
    exact = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree, 4).alias("est_jaccard"),
            F.round(exact, 4).alias("exact_jaccard"),
            F.round(F.abs(agree - exact), 4).alias("abs_err"),
        )
    )


@register(
    "dedup_prefix_filter_join",
    tags=("dedup", "join"),
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS w
  FROM documents
), dsets AS (
  SELECT doc_id, list_sort(list(DISTINCT w)) AS ws FROM tok GROUP BY doc_id
), dm AS (
  SELECT doc_id, md5(array_to_string(ws, chr(31))) AS set_id, ws FROM dsets
), sets0 AS (
  SELECT set_id, min(ws) AS ws, CAST(count(*) AS BIGINT) AS cnt,
         min(doc_id) AS min1
  FROM dm GROUP BY set_id
), min2s AS (
  SELECT d.set_id, min(d.doc_id) AS min2
  FROM dm d JOIN sets0 s USING (set_id)
  WHERE d.doc_id <> s.min1 GROUP BY d.set_id
), sets AS (
  SELECT s.set_id, s.ws, s.cnt, s.min1, m.min2
  FROM sets0 s LEFT JOIN min2s m USING (set_id)
), stok AS (
  SELECT set_id, unnest(ws) AS w FROM sets
), sfreq AS (
  SELECT w, count(*) AS df FROM stok GROUP BY w
), tid_map AS (
  SELECT w, CAST(row_number() OVER (ORDER BY df, w) AS BIGINT) AS tid FROM sfreq
), stok_t AS (
  SELECT s.set_id, t.tid FROM stok s JOIN tid_map t USING (w)
), lens AS MATERIALIZED (
  SELECT set_id, CAST(count(*) AS BIGINT) AS n FROM stok_t GROUP BY set_id
), kk AS (
  SELECT CAST((2 * max(n)) // 19 AS BIGINT) AS k FROM lens
), dims AS (
  SELECT CAST((max(tid) + 61) // 62 AS BIGINT) AS w FROM stok_t
), words AS (
  SELECT set_id, (tid - 1) // 62 AS wj,
         CAST(sum(CAST(1 AS BIGINT) << CAST((tid - 1) % 62 AS INT)) AS BIGINT) AS word
  FROM stok_t GROUP BY set_id, (tid - 1) // 62
), masks AS MATERIALIZED (
  -- MASK-CHUNK VERIFY (r8 sf10-viability): each distinct set packs into
  -- ceil(vocab/62) 62-bit words (tids are distinct per set, so the sum
  -- of powers IS the OR); |A intersect B| = sum of popcounts of ANDed
  -- words. Candidates are unchanged - only the verify representation
  -- shrinks, from two sorted 32-int lists per candidate row to W~1-3
  -- words, so the verify cost per pair drops ~50x on both engines. W is
  -- data-derived (mirrored in the Spark twin), so open vocabularies
  -- degrade gracefully rather than breaking exactness.
  SELECT g.set_id, list(coalesce(w.word, 0) ORDER BY g.wj) AS mw
  FROM (SELECT set_id, unnest(range((SELECT w FROM dims))) AS wj FROM lens) g
  LEFT JOIN words w ON w.set_id = g.set_id AND w.wj = g.wj
  GROUP BY g.set_id
), pat0 AS (
  SELECT set_id, tid % ((SELECT k FROM kk) + 1) AS gid,
         md5(array_to_string(list_sort(list(tid)), ',')) AS gpat
  FROM stok_t GROUP BY set_id, gid
), grid AS (
  SELECT set_id, gid
  FROM (SELECT set_id FROM sets)
  CROSS JOIN (SELECT unnest(range((SELECT k FROM kk) + 1)) AS gid)
), pat AS MATERIALIZED (
  SELECT grid.set_id, grid.gid, coalesce(pat0.gpat, '') AS gpat
  FROM grid LEFT JOIN pat0
    ON pat0.set_id = grid.set_id AND pat0.gid = grid.gid
), cand AS MATERIALIZED (
  -- NARROW-FIRST (r8 sf1-gate fix): dedupe the (sa, sb) candidate pairs
  -- while each row is two md5 strings, BEFORE any payload joins. The
  -- sf1 fixture generates ~83M bucket-join rows (top (gid,gpat) buckets
  -- hold ~5.6k sets each); carrying both 32-int token lists through that
  -- join + DISTINCT spilled >80 GB of DuckDB temp and aborted the gate.
  -- Candidates dedupe to 77M narrow rows, the integer length filter cuts
  -- to 50M, and only those reach the mask-chunk verify. AS MATERIALIZED
  -- pins the staged execution (inlined, DuckDB re-planned the monolith
  -- back into a payload-carrying join that spilled the same way).
  SELECT DISTINCT a.set_id AS sa, b.set_id AS sb
  FROM pat a
  JOIN pat b ON a.gid = b.gid AND a.gpat = b.gpat AND a.set_id < b.set_id
), spairs AS MATERIALIZED (
  SELECT sa, sb, jacc FROM (
    SELECT c.sa, c.sb,
           CAST(list_sum(list_transform(list_zip(x.mw, y.mw),
                                        p -> bit_count(p[1] & p[2])))
                AS BIGINT) AS c,
           c.na, c.nb,
           round(CAST(list_sum(list_transform(list_zip(x.mw, y.mw),
                                              p -> bit_count(p[1] & p[2])))
                      AS BIGINT) * 1.0
                 / (c.na + c.nb
                    - CAST(list_sum(list_transform(list_zip(x.mw, y.mw),
                                                   p -> bit_count(p[1] & p[2])))
                           AS BIGINT)),
                 6) AS jacc
    FROM (
      SELECT cd.sa, cd.sb, lx.n AS na, ly.n AS nb FROM cand cd
      JOIN lens lx ON lx.set_id = cd.sa
      JOIN lens ly ON ly.set_id = cd.sb
      WHERE 19 * least(lx.n, ly.n) >= 9 * (lx.n + ly.n)
    ) c
    JOIN masks x ON x.set_id = c.sa
    JOIN masks y ON y.set_id = c.sb
  ) WHERE c * 10 >= 9 * (na + nb - c)
), sym AS (
  SELECT sa AS s, sb AS t, jacc FROM spairs
  UNION ALL
  SELECT sb AS s, sa AS t, jacc FROM spairs
), cross_deg AS (
  SELECT sym.s, sum(st.cnt) AS cross_deg
  FROM sym JOIN sets st ON st.set_id = sym.t GROUP BY sym.s
), cross_best AS (
  SELECT s, jacc AS cj, other_doc FROM (
    SELECT sym.s, sym.jacc, st.min1 AS other_doc,
           row_number() OVER (PARTITION BY sym.s
                              ORDER BY sym.jacc DESC, st.min1) AS rn
    FROM sym JOIN sets st ON st.set_id = sym.t
  ) WHERE rn = 1
), per_doc AS (
  SELECT d.doc_id,
         CAST(st.cnt - 1 + coalesce(cd.cross_deg, 0) AS BIGINT) AS n_near_dups,
         st.cnt, st.min1, st.min2, cb.cj, cb.other_doc
  FROM dm d
  JOIN sets st USING (set_id)
  LEFT JOIN cross_deg cd ON cd.s = d.set_id
  LEFT JOIN cross_best cb ON cb.s = d.set_id
), cands AS (
  SELECT doc_id, n_near_dups, 1.0 AS jacc,
         CASE WHEN doc_id = min1 THEN min2 ELSE min1 END AS other
  FROM per_doc WHERE cnt >= 2
  UNION ALL
  SELECT doc_id, n_near_dups, cj AS jacc, other_doc AS other
  FROM per_doc WHERE cj IS NOT NULL
), best AS (
  SELECT doc_id, n_near_dups, other, jacc,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jacc DESC, other) AS rn
  FROM cands
)
SELECT doc_id, n_near_dups, other AS best_match, jacc AS best_jaccard
FROM best WHERE rn = 1
""",
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact τ=0.9 set-similarity join, FACTORED THROUGH DISTINCT TOKEN
    SETS with PartEnum-style pigeonhole candidates (Arasu, Ganti &
    Kaushik, VLDB'06; r8 rewrite closing VERDICT r7 #4's sf1
    exclusion): Jaccard depends only on a document's distinct-token
    SET, so the join runs over the S distinct sets — not the D
    documents — and the per-document report expands arithmetically.

    Pipeline: (1) canonical set key per doc (md5 of the sorted distinct
    tokens, chr(31)-joined — identical bytes on both engines); (2)
    pigeonhole candidates: J(A,B) ≥ 0.9 forces |A△B| ≤
    (|A|+|B|)·(1−τ)/(1+τ) = (|A|+|B|)/19 ≤ K := (2·max_set_size) div
    19 — all exact integer arithmetic — so partitioning the token-id
    space into K+1 round-robin groups (ids ranked rarest-first)
    guarantees every qualifying pair agrees EXACTLY on at least one
    group; candidates join on (group, md5(group-token-ids)), with
    explicit empty-group rows so both-empty groups still match; (3)
    an exact integer length filter (19·min(na,nb) ≥ 9·(na+nb)) and the
    streaming exact verify 19·|A∩B| ≥ 9·(na+nb) — the candidate stream
    flows probe→verify→filter in one stage against a broadcast
    bitmask-chunk lookup (see the mask-chunk note in the body:
    ceil(vocab/62) packed words per set, intersect = popcount of AND,
    data-derived width mirrored in SQL), nothing pair-sized is ever shuffled,
    dedup happens after the τ filter on true pairs only; (4) per-doc
    expansion WITHOUT materializing doc pairs: a doc in set s has
    degree (cnt_s − 1) + Σ_{t: J(s,t)≥τ} cnt_t (same-set twins always
    qualify at J = 1.0, and identical sets are the ONLY J = 1.0 pairs),
    and its best match is the larger of the same-set candidate
    (J = 1.0, smallest other id) and the best cross-set candidate
    (max J, then smallest member id), ranked by the same
    (jaccard DESC, other ASC) rule the pair-level form used — so the
    output is ROW-IDENTICAL to the original doc-pair implementation
    (old-vs-new oracle outputs proven row-identical at sf0.01/0.1).

    Why not the classic PPJoin prefix filter: rare-first prefixes are
    the right candidate generator on SPARSE open vocabularies, but on
    this corpus's ~30-word closed vocabulary the prefix degenerates —
    measured 8.4e8 prefix candidates over 39k sets at sf1 (the old
    doc-pair form was worse still: ~3.3e9, the one sf1-gate exclusion
    since r5). The pigeonhole bound exploits what closed vocabularies
    actually give you — tiny symmetric differences (K=3 here) — and
    degrades gracefully on open vocabularies (K grows with set size,
    groups stay df-balanced). Every downstream frame is keyed by
    set_id or doc_id; no window exceeds set size or 2 rows/doc.

    Two physical tiers keyed on the MEASURED distinct-set count S
    (r10, VERDICT r9 #3): below PARTITIONED_SETSIM_SETS the probe side
    and both mask relations broadcast and the candidate stream flows
    probe→verify→filter in one stage (the S ≪ D premise); past it —
    the r9 sf30 probe OOMed here at S≈4.5M slots
    (UNABLE_TO_ACQUIRE_MEMORY) — the same candidate/verify algebra
    runs as keyed shuffle_hash joins on (gid, g60) and set id, so the
    third decade completes without any broadcast of a corpus-sized
    relation. Output is row-identical across tiers; only the join
    strategy adapts, the way AQE would if it could see the fan-out."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
            )
        ).alias("w"),
    )
    dsets = tok.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("w")).alias("ws")
    )
    dm = dsets.select(
        "doc_id", F.md5(F.concat_ws("\x1f", "ws")).alias("set_id"), "ws"
    )
    sets0 = dm.groupBy("set_id").agg(
        F.min("ws").alias("ws"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min("doc_id").alias("min1"),
    )
    min2s = (
        dm.select("doc_id", "set_id")
        .join(sets0.select("set_id", "min1"), "set_id")
        .where(F.col("doc_id") != F.col("min1"))
        .groupBy("set_id")
        .agg(F.min("doc_id").alias("min2"))
    )
    sets_ = sets0.join(min2s, "set_id", "left").withColumn(
        "sid",
        F.row_number()
        # frame: bounded (distinct-set grain — S ≪ D by the set-factoring
        # frame: premise, the same premise that broadcasts the mask lookup)
        .over(Window.orderBy("set_id"))
        .cast("bigint"),
    )
    # Materialize the distinct-set table once (r10): it feeds the token
    # ranking, the grid, the per-doc expansion, AND the broadcast-vs-
    # partitioned strategy decision below — the count that drives the
    # decision would otherwise re-run the whole tokenize→distinct
    # pipeline, and each downstream reference re-reads materialized rows.
    sets_ = sets_.localCheckpoint(eager=True)
    n_sets = sets_.count()
    stok = sets_.select("sid", F.explode("ws").alias("w"))
    sfreq = stok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    tid_map = sfreq.select(
        "w",
        F.row_number()
        .over(Window.orderBy("df", "w"))  # frame: bounded (vocab-grain)
        .cast("bigint")
        .alias("tid"),
    )
    stok_t = stok.join(tid_map, "w").select("sid", "tid")
    ssize = stok_t.groupBy("sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    kdf = ssize.agg(F.expr("CAST((2 * max(n)) DIV 19 AS BIGINT)").alias("k"))
    # MASK-CHUNK VERIFY (r8 sf10-viability): pack each distinct set into
    # ceil(vocab/62) 62-bit words (tids are distinct per set, so the sum
    # of powers IS the bitwise OR); |A∩B| = Σ popcount(word_a & word_b).
    # Candidates are unchanged — only the verify representation shrinks,
    # from two sorted 32-int arrays per candidate row (~512 B) to W≈1–3
    # longs, so the per-pair verify cost and the join-row width both drop
    # ~50×. W is data-derived and mirrored in the DuckDB oracle (the
    # ann_lsh_adaptive_planes pattern), so open vocabularies degrade
    # gracefully (wider mask arrays) rather than breaking exactness.
    wdf = stok_t.agg(
        F.expr("CAST((max(tid) + 61) DIV 62 AS BIGINT)").alias("wn")
    )
    words = stok_t.groupBy(
        "sid", F.expr("CAST((tid - 1) DIV 62 AS BIGINT)").alias("wj")
    ).agg(
        F.expr(
            "CAST(sum(shiftleft(CAST(1 AS BIGINT), CAST((tid - 1) % 62 AS INT))) AS BIGINT)"
        ).alias("word")
    )
    masks = (
        words.groupBy("sid")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("wj", "word"))).alias("m")
        )
        .crossJoin(F.broadcast(wdf))
        .select(
            "sid",
            F.expr(
                "transform(sequence(CAST(0 AS BIGINT), wn - 1),"
                " j -> coalesce(element_at(m, j), CAST(0 AS BIGINT)))"
            ).alias("mw"),
        )
    )
    # INT BUCKET KEYS (r8): the group pattern joins on a 60-bit integer
    # prefix of the md5 instead of the 32-char string (and set ids are
    # dense bigints), so a candidate row is three longs instead of two
    # md5 strings + one. A 60-bit collision (or a real prefix equal to
    # the empty-group marker 0) can only MERGE buckets, i.e. ADD
    # candidates that the exact popcount verify then rejects — the
    # verified pair set is provably unchanged, so the md5-string oracle
    # stays a faithful twin without mirroring the key encoding.
    pat0 = (
        stok_t.crossJoin(F.broadcast(kdf))
        .groupBy("sid", (F.col("tid") % (F.col("k") + 1)).alias("gid"))
        .agg(
            F.expr(
                "CAST(conv(substring(md5(concat_ws(',',"
                " sort_array(collect_list(tid)))), 1, 15), 16, 10) AS BIGINT)"
            ).alias("g60")
        )
    )
    grid = (
        sets_.select("sid")
        .crossJoin(F.broadcast(kdf))
        .select("sid", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("k"))).alias("gid"))
    )
    pat = grid.join(pat0, ["sid", "gid"], "left").select(
        "sid", "gid", F.coalesce("g60", F.lit(0).cast("bigint")).alias("g60")
    )
    sl = masks.join(ssize, "sid").select("sid", "mw", "n")
    sla = sl.select(
        F.col("sid").alias("sa"), F.col("mw").alias("mw_a"), F.col("n").alias("na")
    )
    slb = sl.select(
        F.col("sid").alias("sb"), F.col("mw").alias("mw_b"), F.col("n").alias("nb")
    )
    b = pat.select(F.col("sid").alias("sb"), "gid", "g60")
    if n_sets <= PARTITIONED_SETSIM_SETS:
        # Broadcast tier (the documented S ≪ D premise): the mask lookup
        # and the probe side are broadcast, so the candidate stream flows
        # probe→verify→filter in ONE stage with nothing pair-sized ever
        # shuffled or spilled.
        # Probe-side fan-out guard (the r7 bootstrap-parallelism class):
        # pat is only S*(K+1) narrow rows, so AQE coalesces it to ~1
        # partition — blind to the candidate JOIN's output fan-out — and
        # the whole probe→verify stream would run on one task (measured
        # 326s at sf1). Round-robin repartition to core count keeps the
        # row SET identical and spreads pair production.
        a = pat.repartition(spark.sparkContext.defaultParallelism).select(
            F.col("sid").alias("sa"), "gid", "g60"
        )
        cand = a.join(F.broadcast(b), ["gid", "g60"]).filter(F.col("sa") < F.col("sb"))
        verified0 = cand.join(F.broadcast(sla), "sa").join(F.broadcast(slb), "sb")
    else:
        # Partitioned tier (r10, VERDICT r9 #3): past the broadcast
        # budget (S·(K+1) probe rows + 2 S-row mask relations no longer
        # fit executor memory — the r9 sf30 OOM), the SAME candidate/
        # verify algebra runs as keyed shuffle joins. The one invariant
        # that MUST survive the tier switch is that NOTHING PAIR-SIZED
        # ever crosses a shuffle boundary: the first cut of this tier
        # joined candidates to their masks after the pair join and the
        # sf30 probe wrote 63 GB of pair-stream shuffle before filling
        # the disk. So the masks travel WITH the probe rows instead —
        # one input-sized shuffle_hash join (S·(K+1) rows widened by
        # W≈1–3 longs + n) — and the (gid, g60) self-join then produces
        # pairs, popcount-verifies, and τ-filters INSIDE one stage,
        # exactly the probe→verify→filter pipelining the broadcast tier
        # gets for free. shuffle_hash pinned everywhere (corpus-sized
        # sides; never a compressed-bytes broadcast flip), and the
        # checkpoint keeps the enrich join from running once per
        # self-join side. Hot buckets are hash-chunked B = ⌈pop/CHUNK⌉
        # ways per side (see PARTITIONED_SETSIM_CHUNK: AQE skew split
        # sizes inputs and cannot see the pair fan-out, so without this
        # the g60=0 buckets serialize the stage's tail onto a handful of
        # straggler tasks); each pair meets exactly once in one of the
        # B² (ca, cb) cells, so the verified pair set — and the query's
        # output — is unchanged by the chunk grid.
        bpop = pat.groupBy("gid", "g60").agg(
            F.count(F.lit(1)).cast("bigint").alias("bpop")
        )
        enriched = (
            pat.hint("shuffle_hash")
            .join(sl.hint("shuffle_hash"), "sid")
            .hint("shuffle_hash")
            .join(bpop.hint("shuffle_hash"), ["gid", "g60"])
            .withColumn(
                "nch",
                F.expr(
                    "CAST((bpop + {c} - 1) DIV {c} AS BIGINT)".format(
                        c=PARTITIONED_SETSIM_CHUNK
                    )
                ),
            )
            .withColumn("ch", F.pmod(F.xxhash64("sid"), F.col("nch")))
            .localCheckpoint(eager=True)
        )
        chunk_ids = F.sequence(F.lit(0).cast("bigint"), F.col("nch") - 1)
        ea = enriched.select(
            F.col("sid").alias("sa"), "gid", "g60",
            F.col("mw").alias("mw_a"), F.col("n").alias("na"),
            F.col("ch").alias("ca"),
            F.explode(chunk_ids).alias("cb"),
        )
        eb = enriched.select(
            F.col("sid").alias("sb"), "gid", "g60",
            F.col("mw").alias("mw_b"), F.col("n").alias("nb"),
            F.explode(chunk_ids).alias("ca"),
            F.col("ch").alias("cb"),
        )
        verified0 = (
            ea.hint("shuffle_hash")
            .join(eb.hint("shuffle_hash"), ["gid", "g60", "ca", "cb"])
            .filter(F.col("sa") < F.col("sb"))
        )
    c = F.aggregate(
        F.zip_with(
            "mw_a", "mw_b", lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    spairs = (
        verified0
        .filter(19 * F.least("na", "nb") >= 9 * (F.col("na") + F.col("nb")))
        .withColumn("c", c)
        .filter(F.col("c") * 10 >= 9 * (F.col("na") + F.col("nb") - F.col("c")))
        .select(
            "sa",
            "sb",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6
            ).alias("jacc"),
        )
        .distinct()
    )
    sym = spairs.select(F.col("sa").alias("s"), F.col("sb").alias("t"), "jacc").unionByName(
        spairs.select(F.col("sb").alias("s"), F.col("sa").alias("t"), "jacc")
    )
    symx = sym.join(
        sets_.select(F.col("sid").alias("t"), F.col("cnt").alias("cnt_t"),
                     F.col("min1").alias("min1_t")),
        "t",
    )
    cross_deg = symx.groupBy("s").agg(F.sum("cnt_t").alias("cross_deg"))
    cross_best = (
        symx.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("s").orderBy(F.col("jacc").desc(), "min1_t")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("s", F.col("jacc").alias("cj"), F.col("min1_t").alias("other_doc"))
    )
    per_doc = (
        dm.select("doc_id", "set_id")
        .join(sets_.select("set_id", "sid", "cnt", "min1", "min2"), "set_id")
        .join(cross_deg.withColumnRenamed("s", "sid"), "sid", "left")
        .join(cross_best.withColumnRenamed("s", "sid"), "sid", "left")
        .select(
            "doc_id",
            (
                F.col("cnt") - 1 + F.coalesce(F.col("cross_deg"), F.lit(0))
            ).cast("bigint").alias("n_near_dups"),
            "cnt", "min1", "min2", "cj", "other_doc",
        )
    )
    cands = per_doc.filter(F.col("cnt") >= 2).select(
        "doc_id",
        "n_near_dups",
        F.lit(1.0).alias("jacc"),
        F.when(F.col("doc_id") == F.col("min1"), F.col("min2"))
        .otherwise(F.col("min1"))
        .alias("other"),
    ).unionByName(
        per_doc.filter(F.col("cj").isNotNull()).select(
            "doc_id",
            "n_near_dups",
            F.col("cj").alias("jacc"),
            F.col("other_doc").alias("other"),
        )
    )
    best = cands.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("jacc").desc(), "other")
        ),
    )
    return best.filter(F.col("rn") == 1).select(
        "doc_id",
        "n_near_dups",
        F.col("other").alias("best_match"),
        F.col("jacc").alias("best_jaccard"),
    )


SPAN_K = 8  # word n-gram width for duplicated-span measurement


@register(
    "dedup_duplicate_ngram_spans",
    tags=("dedup", "text", "quality"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {SPAN_K - 2}),
                i -> CAST('0x' || substr(md5(array_to_string(t[i:i+{SPAN_K - 1}], ' ')), 1, 15) AS BIGINT))) AS g
  FROM toks WHERE len(t) >= {SPAN_K}
), df AS (
  SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY g
), marked AS (
  SELECT grams.doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
  FROM grams JOIN df ON grams.g = df.g
  GROUP BY grams.doc_id
)
SELECT doc_id, n_spans, dup_spans,
       round(dup_spans * 1.0 / n_spans, 6) AS dup_fraction,
       CASE WHEN dup_spans * 1.0 / n_spans >= 0.5 THEN 1 ELSE 0 END AS flag_heavy_dup
FROM marked
""",
)
def dedup_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", adapted from suffix-array
    substrings to word 8-gram spans, the form Gopher/RefinedWeb use):
    for each document, the fraction of its 8-gram POSITIONS whose gram
    also appears in another document. Unlike the distinct-shingle
    families above (dedup_ngram_jaccard measures set overlap), this
    keeps every position, so a doc that repeats one boilerplate
    paragraph ten times is scored 10x — the quantity the filtering
    threshold (flag at >= 50% duplicated span coverage) acts on.

    Scale: grams shuffle as 60-bit md5 ints, never as text (constant
    8-byte keys regardless of gram width), one groupBy for df, one
    gram->df join that re-uses the grams exchange, one per-doc agg.
    No all-pairs structure anywhere; output is one row per document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    base = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= SPAN_K)
    idx = F.sequence(F.lit(1), F.size("t") - (SPAN_K - 1))
    gram = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", *[F.element_at("t", i + j) for j in range(SPAN_K)]
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    grams = base.select("doc_id", F.explode(gram).alias("g"))
    df_ = grams.groupBy("g").agg(F.countDistinct("doc_id").alias("n_docs"))
    marked = (
        grams.join(df_, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_spans"),
        )
    )
    frac = F.col("dup_spans") / F.col("n_spans")
    return marked.select(
        "doc_id",
        "n_spans",
        "dup_spans",
        F.round(frac, 6).alias("dup_fraction"),
        F.when(frac >= 0.5, 1).otherwise(0).alias("flag_heavy_dup"),
    )


@register(
    "dedup_mllib_minhash_join",
    tags=("dedup", "similarity", "mllib"),
    # No SQL oracle: MLlib's MinHashLSH hash family is seeded inside the
    # JVM model — deterministic for Spark but not replayable in DuckDB.
    # Correctness is pinned instead by tests/test_round4_ops.py: perfect
    # recall of the exact-Jaccard >= 0.5 pairs (LSH can only add false
    # candidates before the distance filter, never lose true ones at
    # this threshold/row budget) and agreement of the reported distance
    # with exact Jaccard.
)
def dedup_mllib_minhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `pyspark.ml` route to near-dup joins (SURVEY §7.4 names
    `MinHashLSH`/`approxSimilarityJoin` explicitly): shingle sets →
    HashingTF sparse vectors → MinHashLSH model → approxSimilarityJoin
    at Jaccard distance <= 0.5. This is the library twin of the
    hand-built banded pipeline (`dedup_minhash_lsh`) — same
    candidates-then-verify algebra, with the banding/OR-amplification
    hidden inside the fitted model. Kept alongside the custom form
    because the custom one is oracle-checkable and tunable (bands/rows
    are explicit); the MLlib form is what a user migrating Spark code
    brings with them.

    Scale posture: LIBRARY-DEMO, deliberately input-capped (VERDICT r5
    #3). MLlib's approxSimilarityJoin materializes whole rows as
    structs through an internal explode-by-table shuffle and runs
    per-candidate keyDistance on 2^18-dim sparse vectors; even
    column-pruned to (doc_id, features) it measured 619s at sf1 vs
    8.6s for the hand-built banded twin (`dedup_minhash_lsh`) on the
    SAME 250k output pairs. The custom pipeline IS the scale path, so
    this registration — kept for drop-in `pyspark.ml` API parity —
    runs on a fixed 2000-document slab (deterministic doc_id
    order, the `source_binaryfile_manifest` posture), which bounds its
    cost at every SF. Fixtures up to sf0.01 (500 docs) are under the
    cap, so the recall/distance test (tests/test_round4_ops.py) pins
    the full corpus there.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    MLLIB_SLAB = 2000  # fixed input slab: library-demo posture
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Surface the cap in the output schema (ADVICE r6 #2): every pair row
    # carries how many docs the slab actually held vs the corpus total,
    # so downstream consumers can't mistake capped output for
    # full-corpus coverage. One count job on a 2-column projection.
    corpus_docs = corpus.count()
    slab_docs = min(corpus_docs, MLLIB_SLAB)
    docs = corpus.orderBy("doc_id").limit(MLLIB_SLAB)
    shingled = docs.select(
        "doc_id", shingles_col(F.col("text")).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(shingled).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
            F.lit(slab_docs).cast("bigint").alias("slab_docs"),
            F.lit(corpus_docs).cast("bigint").alias("corpus_docs"),
        )
    )


@register(
    "er_blocking_audit",
    tags=("dedup", "er", "quality"),
    oracle="""
WITH d AS (
  SELECT doc_id, lang, n_chars // 8 AS bucket, md5(text) AS h
  FROM documents
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d
), truth AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CASE WHEN a.lang = b.lang AND a.bucket = b.bucket THEN 1 ELSE 0 END
           AS captured
  FROM d a JOIN d b ON a.h = b.h AND a.doc_id < b.doc_id
), cand AS (
  SELECT CAST(count(*) AS BIGINT) AS cand_pairs
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS truth_pairs,
         CAST(coalesce(sum(captured), 0) AS BIGINT) AS captured_pairs
  FROM truth
)
SELECT n.n_docs,
       n.n_docs * (n.n_docs - 1) // 2 AS all_pairs,
       cand.cand_pairs,
       round(1e0 - cand.cand_pairs * 1e0 / (n.n_docs * (n.n_docs - 1) // 2), 6)
         AS reduction_ratio,
       t.truth_pairs,
       t.captured_pairs,
       CASE WHEN t.truth_pairs = 0 THEN 1e0
            ELSE round(t.captured_pairs * 1e0 / t.truth_pairs, 6)
       END AS pair_completeness
FROM n CROSS JOIN cand CROSS JOIN t
""",
)
def er_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking-quality audit (Christen 2012's two
    canonical metrics): REDUCTION RATIO (what fraction of the quadratic
    pair space the (lang, length-bucket) blocking scheme prunes) and
    PAIR COMPLETENESS (what fraction of ground-truth duplicate pairs —
    exact text twins by md5 — land in the same block and remain
    findable). The scheme-design complement to [[er_record_linkage]]
    (which scores pairs a blocking already admitted) and the audit that
    justifies [[dedup_edit_distance_block]]'s block keys: a blocking
    with high reduction but low completeness silently loses duplicates,
    and this query is the only way to see it. Every count is an exact
    integer; the two ratios round at 6dp.

    Scale: the truth join is on the md5 hash key (duplicate groups are
    tiny); the candidate-pair COUNT aggregates per block as
    sum(k*(k-1)/2) group sizes — no pair materialization is needed for
    the count, and the audit never touches text beyond one md5 per
    row."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 8).cast("bigint").alias("bucket"),
        F.md5("text").alias("h"),
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    a, b = d.alias("a"), d.alias("b")
    truth = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.when(
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bucket") == F.col("b.bucket")),
            1,
        )
        .otherwise(0)
        .alias("captured")
    )
    cand = (
        d.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(
            F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("bigint").alias("cand_pairs")
        )
    )
    t = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("truth_pairs"),
        # coalesce: a corpus with NO exact twins must report 0, not NULL
        # (the ADVICE-r4 missing-arm class), and completeness is then
        # vacuously 1.0 rather than a divide-by-zero (DuckDB errors on /0)
        F.coalesce(F.sum("captured"), F.lit(0)).cast("bigint").alias(
            "captured_pairs"
        ),
    )
    all_pairs = (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("bigint")
    return (
        n.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(t))
        .select(
            "n_docs",
            all_pairs.alias("all_pairs"),
            "cand_pairs",
            F.round(1.0 - F.col("cand_pairs") * 1.0 / all_pairs, 6).alias(
                "reduction_ratio"
            ),
            "truth_pairs",
            "captured_pairs",
            F.when(F.col("truth_pairs") == 0, F.lit(1.0))
            .otherwise(
                F.round(F.col("captured_pairs") * 1.0 / F.col("truth_pairs"), 6)
            )
            .alias("pair_completeness"),
        )
    )


@register(
    "dedup_lsh_parameter_plan",
    tags=("dedup", "similarity", "maintenance"),
    oracle="""
WITH grid AS (
  SELECT b.b, r.r, b.b * r.r AS k
  FROM (SELECT unnest([4, 8, 16, 32]) AS b) b
  CROSS JOIN (SELECT unnest([2, 4, 8]) AS r) r
), curves AS (
  SELECT b, r, k,
         round(1e0 - pow(1e0 - pow(5e-1, r), b), 6) AS p_at_50,
         round(1e0 - pow(1e0 - pow(8e-1, r), b), 6) AS p_at_80,
         round(1e0 - pow(1e0 - pow(9e-1, r), b), 6) AS p_at_90,
         round(pow(1e0 / b, 1e0 / r), 6) AS s_threshold
  FROM grid
)
SELECT b, r, k, p_at_50, p_at_80, p_at_90, s_threshold,
       CAST(row_number() OVER (
         ORDER BY p_at_50 + (1e0 - p_at_90), b, r) AS BIGINT) AS plan_rank
FROM curves
""",
)
def dedup_lsh_parameter_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planning table: for every (bands b, rows r)
    candidate, the S-curve collision probability P(s) = 1 - (1 - s^r)^b
    at Jaccard 0.5/0.8/0.9 plus the threshold approximation
    (1/b)^(1/r), ranked by the planning loss FP-proxy + FN-proxy =
    P(0.5) + (1 - P(0.9)) — the tuning sheet you compute BEFORE running
    [[dedup_minhash_lsh]], because b and r are baked into the signature
    layout and re-banding 100 TB of signatures is a full rewrite. The
    argmin ranks on the rounded curve values with (b, r) tie-breaks;
    pow() ulps die in the 6dp round before ranking feeds them.
    (Leskovec-Rajaraman-Ullman, Mining of Massive Datasets ch.3 — the
    public S-curve analysis.)

    Scale: a 12-row constant table — the POINT is that this runs on the
    driver-side grid instead of re-hashing any data; sf_dir is read
    only to keep the query signature uniform."""
    grid = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(v) for v in (4, 8, 16, 32)])).alias("b")
        )
        .select("b", F.explode(F.array(*[F.lit(v) for v in (2, 4, 8)])).alias("r"))
    )
    load_table(spark, sf_dir, "documents")  # signature uniformity; not scanned

    def p_at(s: float):
        return F.round(
            1.0 - F.pow(1.0 - F.pow(F.lit(s), F.col("r")), F.col("b")), 6
        )

    curves = grid.select(
        "b",
        "r",
        (F.col("b") * F.col("r")).alias("k"),
        p_at(0.5).alias("p_at_50"),
        p_at(0.8).alias("p_at_80"),
        p_at(0.9).alias("p_at_90"),
        F.round(F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 6).alias("s_threshold"),
    )
    from pyspark.sql import Window

    return curves.select(
        "*",
        F.row_number()
        .over(
            Window.orderBy(  # frame: bounded (parameter-grid rows)
                F.col("p_at_50") + (1.0 - F.col("p_at_90")), F.col("b"), F.col("r")
            )
        )
        .cast("bigint")
        .alias("plan_rank"),
    )


@register(
    "dedup_edit_distance_block",
    tags=("dedup", "text"),
    oracle="""
WITH d AS (
  SELECT doc_id, lang, n_chars // 8 AS bucket,
         lower(substr(text, 1, 40)) AS pfx
  FROM documents
), ranked AS (
  SELECT doc_id, lang, bucket, pfx,
         CAST(row_number() OVER (PARTITION BY lang, bucket
                                 ORDER BY pfx, doc_id) AS BIGINT) AS rn
  FROM d
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       a.lang,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS prefix_edit_distance,
       CASE WHEN levenshtein(a.pfx, b.pfx) = 0 THEN 1 ELSE 0 END
         AS exact_prefix
FROM ranked a JOIN ranked b
  ON a.lang = b.lang AND a.bucket = b.bucket
 AND b.rn - a.rn BETWEEN 1 AND 3
WHERE levenshtein(a.pfx, b.pfx) <= 25
""",
)
def dedup_edit_distance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood edit-distance near-duplicate pairing
    (Hernandez-Stolfo 1995): block on (language, 8-char length bucket),
    SORT each block by the 40-char lowercase prefix, and compare each
    row only to its next 3 neighbors in that order — exact integer
    Levenshtein on the admitted pairs, keeping those within distance
    25. The character-level fuzzy matcher that catches typo/OCR
    variants [[dedup_ngram_jaccard]]'s token sets miss; identical
    prefixes sort adjacent, so true duplicate pairs are always admitted
    (clusters wider than the window chain transitively —
    [[dedup_cc_clusters]] closes them).

    SCALE LESSON (caught by the sf1 isolated bench, pinned here): the
    first version joined all pairs WITHIN each block, and because the
    (lang, bucket) key space is bounded, block occupancy grows linearly
    with the corpus and pair count QUADRATICALLY — 2.1s at sf0.1 became
    157s at sf1 (75x for 10x data). The sorted-neighborhood window
    caps candidates at 3n by construction: the explode to (rn+1..rn+3)
    target ranks makes the whole pairing one EQUI-join on
    (lang, bucket, rn), linear at any SF. Same fix class as the
    banded-LSH design in [[dedup_minhash_lsh]].

    Levenshtein is an exact integer DP both engines implement
    identically (40-char cap bounds it at 1600 cells) — the output is
    bit-deterministic with no rounding at all."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 8).cast("bigint").alias("bucket"),
        F.lower(F.substring("text", 1, 40)).alias("pfx"),
    )
    ranked = d.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("lang", "bucket").orderBy("pfx", "doc_id"))
        .cast("bigint")
        .alias("rn"),
    )
    probes = ranked.select(
        F.col("lang"),
        F.col("bucket"),
        F.col("doc_id").alias("a_id"),
        F.col("pfx").alias("a_pfx"),
        F.col("rn").alias("a_rn"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("w"),
    ).select(
        "lang", "bucket", "a_id", "a_pfx", (F.col("a_rn") + F.col("w")).alias("rn")
    )
    dist = F.levenshtein(F.col("a_pfx"), F.col("pfx"))
    return (
        probes.join(ranked, ["lang", "bucket", "rn"])
        .filter(dist <= 25)
        .select(
            F.least(F.col("a_id"), F.col("doc_id")).alias("doc_a"),
            F.greatest(F.col("a_id"), F.col("doc_id")).alias("doc_b"),
            "lang",
            dist.cast("bigint").alias("prefix_edit_distance"),
            F.when(dist == 0, 1).otherwise(0).alias("exact_prefix"),
        )
    )


def _soundex_spark(col):
    """Simplified American Soundex (no h/w-collapse rule), built from
    translate + per-digit run-collapse so the SAME chain runs on DuckDB
    (whose RE2 regexes have no backreferences to collapse runs with)."""
    word = F.lower(F.regexp_replace(col, "[^A-Za-z]", ""))
    digits = F.translate(
        word, "abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"
    )
    for dgt in "0123456":
        digits = F.regexp_replace(digits, dgt + "{2,}", dgt)
    # Effectively-unbounded tail (INT_MAX length: substring has no
    # two-arg Column form), matching the oracle's unbounded
    # substr(digits, 2) — the previous length-100 cap could diverge
    # cross-engine on pathological tokens (ADVICE r5).
    rest = F.regexp_replace(F.substring(digits, 2, 2147483647), "0", "")
    return F.when(F.length(word) == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.upper(F.substring(word, 1, 1)), F.rpad(F.substring(rest, 1, 3), 3, "0"))
    )


def _soundex_sql(expr: str) -> str:
    """DuckDB twin of :func:`_soundex_spark` (identical chain)."""
    word = f"lower(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    digits = f"translate({word}, 'abcdefghijklmnopqrstuvwxyz', '01230120022455012623010202')"
    for dgt in "0123456":
        digits = f"regexp_replace({digits}, '{dgt}{{2,}}', '{dgt}', 'g')"
    rest = f"regexp_replace(substr({digits}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN length({word}) = 0 THEN NULL "
        f"ELSE upper(substr({word}, 1, 1)) || rpad(substr({rest}, 1, 3), 3, '0') END"
    )


@register(
    "er_soundex_blocking",
    tags=("er", "dedup", "text"),
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),
                                     w -> w <> '')) AS w
  FROM documents
), noisy AS (
  SELECT w FROM vocab
  UNION
  SELECT substr(w, 1, 1) || translate(substr(w, 2), 'eiou', 'aaaa') AS w
  FROM vocab
  WHERE substr(w, 1, 1) NOT IN ('a', 'e', 'i', 'o', 'u')
    AND substr(w, 1, 1) || translate(substr(w, 2), 'eiou', 'aaaa') <> w
), coded AS (
  SELECT w, {_soundex_sql('w')} AS sdx FROM noisy
)
SELECT sdx AS soundex_code,
       CAST(count(*) AS BIGINT) AS block_size,
       string_agg(w, ',' ORDER BY w) AS members
FROM coded
GROUP BY sdx
HAVING count(*) > 1
""",
)
def er_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: group a noisy name
    directory by (simplified) SOUNDEX code — the classic record-linkage
    blocking key that survives misspellings the (lang, length-bucket)
    scheme of [[er_blocking_audit]] misses, because sound-alike variants
    keep the same code while edit distance sees them as far apart.
    The fixtures carry no dirty names, so — the
    [[pipeline_url_canonical_dedup]] fixture discipline — the directory
    is the corpus vocabulary plus one deterministic vowel-corruption
    per eligible word (vowels after the first letter -> 'a', only for
    consonant-initial words): soundex maps every vowel to the same
    separator class, so each corruption PROVABLY lands in its
    original's block, giving the pass real collisions to find rather
    than a vacuously empty answer. Soundex is hand-rolled IDENTICALLY
    on both engines (translate to digit classes, collapse per-digit
    runs without regex backreferences — RE2 has none — strip vowels,
    first letter + 3 digits): Spark's built-in `soundex()` implements
    the h/w-collapse variant DuckDB lacks, and a one-sided builtin
    could silently disagree at exactly the words that matter. Emitted:
    every code whose block holds >1 distinct token — the candidate
    sets a phonetic ER pass would verify-join, members carried as a
    deterministic sorted CSV string.

    Scale: one distinct on the vocabulary (map-side combined), one
    hash agg on the code — block sizes are vocabulary-bounded, and the
    expensive verify join downstream is per-block like every blocking
    scheme here ([[dedup_edit_distance_block]]'s sorted-neighborhood
    discipline applies if blocks ever grow)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    vocab = docs.select(F.explode(t).alias("w")).distinct()
    corrupted = F.concat(
        F.substring("w", 1, 1), F.translate(F.expr("substring(w, 2)"), "eiou", "aaaa")
    )
    noisy = vocab.unionByName(
        vocab.where(
            ~F.substring("w", 1, 1).isin("a", "e", "i", "o", "u")
            & (corrupted != F.col("w"))
        ).select(corrupted.alias("w"))
    ).distinct()
    coded = noisy.select("w", _soundex_spark(F.col("w")).alias("soundex_code"))
    return (
        coded.groupBy("soundex_code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("block_size"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias("members"),
        )
        .where(F.col("block_size") > 1)
    )


@register(
    "dedup_source_overlap_matrix",
    tags=("dedup", "pipeline"),
    oracle="""
WITH toks AS (
  SELECT source, list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT source,
         md5(unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS h
  FROM toks WHERE len(t) >= 3
), per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS shared_shingles
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.src_a, s.src_b, s.shared_shingles,
       pa.n_shingles AS n_a, pb.n_shingles AS n_b,
       round(s.shared_shingles * 1e0
             / (pa.n_shingles + pb.n_shingles - s.shared_shingles), 6) AS jaccard,
       round(s.shared_shingles * 1e0
             / least(pa.n_shingles, pb.n_shingles), 6) AS containment
FROM shared s
JOIN per_src pa ON pa.source = s.src_a
JOIN per_src pb ON pb.source = s.src_b
""",
)
def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix — the sheet read BEFORE
    committing mixture weights ([[pipeline_mixture_weights]]) or
    deduplicating across corpora: for every source pair, the count of
    shared distinct 3-gram shingles plus Jaccard and containment
    (shared / min side — the asymmetric number that catches a small
    source swallowed whole by a large one, which Jaccard dilutes).
    This is [[privacy_contamination_check]]'s machinery pointed
    INWARD at the corpus's own sources instead of at an eval set.

    Scale: documents never pair — the join grain is the DISTINCT
    (source, shingle-md5) frame, so a shingle shared by k of the S
    sources expands to k(k-1)/2 <= S(S-1)/2 pair rows and the output
    is bounded by S^2 regardless of corpus size. The exchange carries
    16-byte hashes, never shingle text. At 100 TB the one watch-item
    is ubiquitous shingles (stop-phrase grams hitting all S sources):
    with fixed S the fanout cap is S-bounded, and a df-cap filter
    (drop grams in > X% of DOCUMENTS, as [[privacy_decontamination]]
    applies) composes in front of the pair join unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    toks = docs.select("source", t.alias("t")).where(F.size("t") >= 3)
    grams = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        F.col("t")[i],
                        F.col("t")[i + 1],
                        F.col("t")[i + 2],
                    )
                ),
            )
        ).alias("h"),
    ).distinct()
    per_src = grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )
    pa = per_src.select(
        F.col("source").alias("src_a"), F.col("n_shingles").alias("n_a")
    )
    pb = per_src.select(
        F.col("source").alias("src_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        shared.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_shingles",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_shingles")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("shared_shingles") * 1.0 / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )
