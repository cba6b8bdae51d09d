from .dedup import (  # noqa: F401
    dedup_corpus,
    embedding_near_duplicates,
    exact_dedup,
    minhash_near_duplicates,
    near_duplicate_clusters,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from .decontam import ngram_contamination  # noqa: F401
from .spans import containment_pairs, repeated_spans  # noqa: F401
from .pii import pii_rates, pii_stats, redact_pii  # noqa: F401
from .pipeline import clean_corpus  # noqa: F401
from .hashing import rolling_fingerprint, sha256_udf, verify_content_sha256  # noqa: F401
from .similarity import brute_force_knn, ivf_knn, lsh_knn, mutual_knn_graph  # noqa: F401
from .hll import approx_distinct, hll_registers  # noqa: F401
from .text import (  # noqa: F401
    bigram_coherence,
    language_id,
    regex_token_count,
    repetition_stats,
    text_quality,
    tfidf_top_terms,
    token_stats,
)
from .sampling import (  # noqa: F401
    hash_sample,
    hash_split,
    sample_hash,
    stratified_sample,
)
from .olap import association_rules, revenue_rollup  # noqa: F401
