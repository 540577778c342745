"""Relational operators, keyed-load strategies, and training-data ops
(dedup, text analysis, similarity search, multimodal plumbing)."""

from etl_framework_spark.operators.dedup import (  # noqa: F401
    cosine_expr,
    embedding_near_dup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles_expr,
    simhash64,
    simhash_near_pairs,
)
from etl_framework_spark.operators.load_strategies import (  # noqa: F401
    LoadStrategy,
    load,
)
from etl_framework_spark.operators.similarity import (  # noqa: F401
    ivf_build,
    ivf_read,
    ivf_write,
    knn_brute,
    knn_ivf,
)
from etl_framework_spark.operators.text import (  # noqa: F401
    fingerprint,
    fingerprint_overlap_pairs,
    language_id,
    quality_features,
    token_count,
)
from etl_framework_spark.operators.asof import asof_join  # noqa: F401
