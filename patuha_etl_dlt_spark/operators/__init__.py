"""Distributed operators for large-scale training-data pipelines:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding),
similarity search (brute-force + LSH ANN), multimodal column plumbing."""

from patuha_etl_dlt_spark.operators.dedup import (  # noqa: F401
    exact_duplicate_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from patuha_etl_dlt_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    lsh_cosine_topk,
)
