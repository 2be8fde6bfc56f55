"""Deduplication operators over document tables — the four standard tiers.

Scale notes (the point of each design):

- **exact**: one hash-groupBy; map-side combine makes duplicates nearly
  free. Normalization is whitespace+case canonicalization.
- **n-gram Jaccard**: exact pairwise similarity via an inverted-index
  self-join on shingles — NOT an O(n²) cross join. Shuffle width is
  Σ df(shingle)²; pass ``max_df`` to drop stop-shingles at scale (with a
  recall caveat, documented below).
- **MinHash + LSH**: the 100 TB path. Per-doc signatures (k min-hashes,
  all computed in one groupBy with k ``min`` aggregates — map-side
  combined), banded into buckets; only same-bucket docs meet in the join.
  Candidates are verified with exact Jaccard so precision is 1.0 and
  recall is the LSH S-curve.
- **SimHash**: 64-bit near-dup fingerprint; Hamming-ball pairs found by
  splitting the fingerprint into bands (pigeonhole: distance ≤ k ⇒ some
  band of k+1 equal).

All hashing is ``xxhash64`` / affine rehashes — deterministic across
runs, executors, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from patuha_etl_dlt_spark.functions.text import normalize_text

# 31-bit Mersenne prime: affine rehash products stay < 2^62, so the modular
# arithmetic never overflows a long (Spark 4 runs ANSI mode — overflow throws)
MERSENNE_P = (1 << 31) - 1


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of exact duplicates after normalization: one row per distinct
    normalized text with its canonical (min) id and member count."""
    return (
        df.select(F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select("canonical_id", "n_docs", F.md5("norm").alias("fingerprint"))
    )


def shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Per-doc DISTINCT word n-gram shingles as ONE array column:
    (id, garr). Entirely narrow — tokenize, sliding window and
    per-row ``array_distinct`` all happen in the scan stage, so the
    distinct set per doc costs NO shuffle (the former
    ``explode().distinct()`` formulation paid a full (id, shingle)
    exchange just to dedup within rows, and every consumer re-ran the
    tokenizer because the distinct was a separate subtree).

    Docs with fewer than ``n`` tokens yield an empty array; an unguarded
    ``sequence(0, size-n)`` would descend ([0,-1]) and index past the
    token array, crashing the job under ANSI mode.

    The token array is projected ONCE before the gram lambda: referencing
    ``split(regexp_replace(...))`` directly inside the lambda re-evaluates
    the regex for every ``element_at`` (~n·|tokens| times per row —
    measured 15s → <1s on 5k docs for this one change)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    toks = F.col("_toks")
    idxs = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idxs,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return base.select("id", F.array_distinct(grams).alias("garr"))


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle) — the exploded
    view of ``shingle_arrays`` (same values; dedup now happens per row via
    ``array_distinct`` instead of a shuffle-wide ``distinct()``)."""
    return shingle_arrays(df, id_col, text_col, n).select(
        "id", F.explode("garr").alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity pairs (id_a < id_b, jaccard ≥
    threshold) via inverted-index join; optional **prefix filtering**
    (the PPJoin/AllPairs family — Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection", WWW'08).

    Prefix filtering keeps the result exact while shrinking the join:
    with shingles sorted by ascending global document frequency, two sets
    with jaccard ≥ t MUST share a shingle within each other's first
    ``⌊(1-t)·|s|⌋ + 1`` shingles — so only those prefixes are indexed for
    the candidate join, and candidates are verified with a full
    intersection. Wins on diverse corpora at high thresholds (prefixes
    are short and selective); measured *slower* on this repo's synthetic
    word-soup docs at t=0.5 (prefix ≈ half the set, nearly every pair a
    candidate), hence default off — at real web scale prefer
    ``minhash_lsh_pairs``, whose cost is output-bound, not pair-bound.

    ``max_df``: additionally drop shingles in > max_df docs from the index
    — NOT exact (may lose pairs); leave None for oracle-checked mode.
    """
    arr = shingle_arrays(df, id_col, text_col, n)
    # doc set size rides along as a per-row scalar — the former separate
    # ``sizes`` aggregation (one more exchange + one more tokenize of the
    # whole corpus, then TWO joins to re-attach it) is gone
    sh = arr.select(
        "id", F.size("garr").alias("sz"), F.explode("garr").alias("shingle")
    )

    index = sh
    if max_df is not None:
        rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") <= max_df
        )
        index = sh.join(rare.select("shingle"), "shingle", "semi")

    if prefix_filter:
        freq = index.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        ranked = (
            index.join(freq, "shingle")
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(F.col("df_"), F.col("shingle"))
                ),
            )
            .filter(
                F.col("_rk")
                <= F.floor((1.0 - threshold) * F.col("sz")).cast("long") + 1
            )
            .select("id", "shingle")
        )
        a = ranked.select(F.col("id").alias("id_a"), "shingle")
        b = ranked.select(F.col("id").alias("id_b"), "shingle")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # verify candidates with the full intersection (exact); the sets
        # come straight from the per-row gram arrays — no collect_set
        # aggregation pass
        sets = arr.select("id", F.sort_array("garr").alias("s"))
        out = (
            cand.join(sets.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
            .join(sets.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
            .withColumn("common", F.size(F.array_intersect("s_a", "s_b")))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("common")
                    / (F.size("s_a") + F.size("s_b") - F.col("common")),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return out

    a = index.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "shingle")
    b = index.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "shingle")
    # size-compatibility prefilter (exact-safe): jaccard ≤ min(sz)/max(sz)
    # because common ≤ min and union ≥ max — pairs whose size ratio cannot
    # reach the threshold are dropped BEFORE the pair-count shuffle. The
    # 1e-4 slack covers the round(·,4) applied to the final jaccard, so no
    # boundary pair can be lost.
    size_ok = F.least(F.col("sz_a"), F.col("sz_b")) >= (
        (threshold - 1e-4) * F.greatest(F.col("sz_a"), F.col("sz_b"))
    )
    # shuffle_hash: both sides are the same ~|corpus|·|set| exploded index;
    # a per-partition hash build beats sorting both sides, and it stops the
    # planner broadcasting a multi-million-row index (the old plan built a
    # BroadcastExchange over the whole distinct shingle table)
    #
    # The pair-count shuffle carries ONLY (id_a, id_b): the Σdf² join
    # output reduces to ~|co-occurring pairs| groups (114M at the sf1.0
    # corpus — this exchange IS the cost center), so halving its row
    # width beats carrying the sizes through; they are re-attached to the
    # (much smaller) post-threshold survivors from the one-row-per-doc
    # sizes table, which the planner auto-broadcasts when it fits.
    common = (
        a.join(b.hint("shuffle_hash"), "shingle")
        .filter((F.col("id_a") < F.col("id_b")) & size_ok)
        .select("id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = arr.select("id", F.size("garr").alias("sz"))  # narrow, one row/doc
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_exprs(base, k: int, seed: int = 1):
    """k affine rehashes of the base hash over the Mersenne prime 2^31-1
    (deterministic; a_i nonzero ⇒ bijection mod p)."""
    exprs = []
    base_mod = base % F.lit(MERSENNE_P)
    for i in range(k):
        a = (2 * (seed * 1_000_003 + i * 7919) + 1) % MERSENNE_P or 1
        b = (seed * 998_244_353 + i * 104_729) % MERSENNE_P
        h = (F.lit(a).cast("long") * base_mod + F.lit(b)) % F.lit(MERSENNE_P)
        exprs.append(h)
    return exprs


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, sig array<long>) — k min-hashes per doc in ONE aggregation
    over the exploded per-doc shingle arrays (no ``distinct()`` exchange:
    dedup happened per row in ``shingle_arrays``; docs with no shingles
    explode to nothing and yield no row).

    Plan choice note: a per-row formulation (k × ``array_min(transform)``
    over the gram array, zero shuffles) was measured 2× SLOWER than this
    aggregate — higher-order functions are interpreted, while the k
    ``min`` aggregates run in whole-stage codegen with map-side partial
    aggregation, and the exchange they pay carries only ~|docs| × k
    partial minima."""
    sh = word_shingles(df, id_col, text_col, shingle_n)
    base = F.abs(F.xxhash64("shingle"))
    hs = _minhash_exprs(base, n_hashes)
    aggs = [F.min(h).alias(f"h{i}") for i, h in enumerate(hs)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH; optionally
    verified with exact Jaccard (precision 1.0). rows = bands per signature;
    two docs collide if any band matches entirely."""
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    band_arr = F.array(
        *[
            F.xxhash64(F.lit(bi), *[F.element_at("sig", bi * r + j + 1) for j in range(r)])
            for bi in range(bands)
        ]
    )
    banded = sig.select("id", F.posexplode(band_arr).alias("band_idx", "band_hash"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_idx", "band_hash"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # Verify ONLY the LSH candidate pairs: join candidates to per-doc shingle
    # sets and compute the exact intersection on those pairs alone. Cost is
    # output-bound (O(|candidates|)), never pair-bound — the whole point of
    # LSH at 100 TB. The sets come straight from the per-row gram arrays
    # (no collect_set aggregation — that was a second full-corpus exchange
    # re-assembling exactly the array the explode had just taken apart).
    sets = shingle_arrays(df, id_col, text_col, shingle_n).select(
        "id", F.col("garr").alias("s")
    )
    return (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
        .withColumn("common", F.size(F.array_intersect("s_a", "s_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.size("s_a") + F.size("s_b") - F.col("common")), 4
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# token-hash choices for simhash: xxhash64 (default — full 64 bits, fastest)
# or md5_60 (the low 60 bits of md5, via conv(hex,16,10)) — slightly slower
# but expressible in ANY SQL engine with md5(), which is what lets the
# DuckDB oracle verify the whole simhash pipeline value-for-value. Bits
# 60-63 of an md5_60 simhash are always 0 (their per-bit sums are -n).
_TOKEN_HASHES = {
    "xxhash64": lambda c: F.xxhash64(c),
    "md5_60": lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
}


def simhash64(df: DataFrame, id_col: str, text_col: str, token_hash: str = "xxhash64") -> DataFrame:
    """(id, simhash long): sign of the per-bit sum of token hashes.
    64 conditional sums in one groupBy — map-side combined, no UDF."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"))
        .withColumn("h", _TOKEN_HASHES[token_hash](F.col("tok")))
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    bit = F.lit(0).cast("long")
    for j in range(64):
        bit = bit + F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long") * (1 << j) if j < 63 else F.lit(-(1 << 63))).otherwise(0)
    return sums.select("id", bit.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of their simhash.
    Pigeonhole banding: split 64 bits into (max_hamming+1) bands; distance
    ≤ k ⇒ at least one band identical — join only within equal bands.
    Banding is recall-exact (pure pigeonhole), so an all-pairs Hamming
    join is a valid oracle for the whole pipeline."""
    nb = max_hamming + 1
    width = 64 // nb
    sh = simhash64(df, id_col, text_col, token_hash)
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1 if (i + 1) * width <= 64 else -1)
            )
            for i in range(nb)
        ]
    )
    banded = sh.select("id", "simhash", F.posexplode(bands).alias("bi", "bh"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["bi", "bh"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
