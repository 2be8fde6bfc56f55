"""Similarity search over embedding columns (`array<float>`).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The dot product is a native ``zip_with``+``aggregate`` fold (JVM-side,
  no Python). Queries are broadcast (they are the small side by
  construction); the corpus streams — so the plan is a broadcast
  nested-loop + per-query top-k window, which scales linearly in corpus
  size and parallelizes perfectly.
- ``lsh_cosine_topk``: the scale path — random-hyperplane (sign) LSH
  buckets computed with a deterministic projection matrix; only
  same-bucket (or Hamming-≤1 probe) candidates are scored. Recall < 1 by
  design; rows-only checked.

At 100 TB you would additionally pre-partition the corpus by bucket and
store it sorted (an IVF layout); the bucketing column here is exactly
that partition key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ac = F.transform(F.col(a), lambda x: x.cast("double"))
    bc = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(ac, bc) / (_norm(ac) * _norm(bc)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, rank,
    cosine). Deterministic: ties broken by neighbor id."""
    # norms are computed ONCE per row (not per candidate pair) — same
    # float op sequence as inlining them, so results are bit-identical,
    # but the per-pair work drops from 3 to 1 vector folds
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_bits: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold).

    ``n_bits=None``: exact all-pairs — a self-join on a constant (block
    nested loop). Only for corpora that fit a broadcast (the oracle-checked
    mode). ``n_bits=k``: sign-LSH bucketing first — only same-bucket pairs
    are scored (the 100 TB path; recall follows the LSH collision curve
    ``(1 - θ/π)^k``), then exact cosine verification so precision is 1.0.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    v = v.withColumn("n_", _norm(F.col("v")))  # norm once per row
    if n_bits:
        dim = _resolve_dim(df, vec_col, dim)
        planes = _hyperplanes(dim, n_bits)
        v = v.withColumn("bucket", lsh_bucket(F.col("v"), planes))
        a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n_").alias("na"), "bucket")
        b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n_").alias("nb"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n_").alias("na"))
        b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n_").alias("nb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.round(F.col("cosine"), 6) >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )


def _resolve_dim(df: DataFrame, vec_col: str, dim) -> int:
    """LSH needs the embedding width to mint hyperplanes. Pass it
    explicitly (``dim=64``) — it is fixed per corpus and known to the
    caller. ``dim="infer"`` opts into reading it from the first row (ONE
    driver-side action — never the silent default: a hidden ``.first()``
    in a lazily-composed plan runs the whole upstream plan once per
    build, which is how driver actions sneak into hot paths)."""
    if isinstance(dim, int):
        return dim
    if dim == "infer":
        row = df.select(vec_col).first()
        if row is None or row[0] is None:
            raise ValueError(f"cannot infer dim: {vec_col!r} has no rows")
        return len(row[0])
    raise ValueError("dim is required for LSH (an int, or explicitly dim='infer')")


def _hyperplanes(dim: int, n_bits: int, seed: int = 13) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).round(6).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id from a deterministic hyperplane set — JVM-side,
    still whole-stage-codegen'd, but expressed as ONE fold over an
    array-of-planes literal rather than an unrolled expression per bit:
    the generated code then contains a single shared dot-product loop
    instead of n_bits copies of a dim-element fold, cutting codegen
    compile time ~8× (the dominant cost of a cold LSH query). The fold
    order per plane is unchanged, so bucket ids are bit-identical to the
    unrolled form (and to the DuckDB oracle arithmetic)."""
    planes_arr = F.array(*[F.array(*[F.lit(float(p)) for p in plane]) for plane in planes])
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(len(planes))])
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(
            planes_arr,
            weights,
            lambda p, w: F.when(_dot(vd, p) > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 8,
    dim: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's LSH
    bucket (or any 1-bit-flip probe bucket when ``multiprobe``)."""
    dim = _resolve_dim(corpus, vec_col, dim)
    planes = _hyperplanes(dim, n_bits)
    cvd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        cvd.alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        cvd.alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("qbucket"),
    ).withColumn("qn", _norm(F.col("qv")))
    if multiprobe:
        probes = F.array(F.col("qbucket"), *[
            F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("long") for i in range(n_bits)
        ])
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))
    scored = (
        c.join(F.broadcast(q.select("query_id", "qv", "qn", "bucket")), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
