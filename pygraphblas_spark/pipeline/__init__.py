"""Training-data pipeline operators over the ``documents`` /
``embeddings`` tables — the operations a 100 TB pretraining-data pipeline
runs alongside the graph engine: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search (brute-force, LSH-bucketed and
IVF cosine), text analysis (language-ID, quality, tokens, fingerprints), and
multimodal column plumbing.

Everything is built from JVM-side column expressions (codegen) except the
clearly-marked Arrow kernels; no per-row Python anywhere.
"""

from pygraphblas_spark.pipeline.text import (
    add_fingerprint,
    add_winnowing_fingerprints,
    add_language_id,
    add_quality,
    add_token_counts,
)
from pygraphblas_spark.pipeline.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from pygraphblas_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    lsh_bucketed_topk,
)

__all__ = [
    "add_fingerprint",
    "add_winnowing_fingerprints",
    "add_language_id",
    "add_quality",
    "add_token_counts",
    "embedding_near_duplicates",
    "exact_duplicates",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "cosine_topk_bruteforce",
    "ivf_topk",
    "lsh_bucketed_topk",
]
