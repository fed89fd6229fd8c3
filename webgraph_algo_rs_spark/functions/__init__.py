from webgraph_algo_rs_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from webgraph_algo_rs_spark.functions.text import (  # noqa: F401
    token_counts,
    quality_scores,
    language_id,
    fingerprints,
)
from webgraph_algo_rs_spark.functions.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from webgraph_algo_rs_spark.functions.multimodal import (  # noqa: F401
    decode_builtin,
    extract_media_features,
    media_metadata,
    probe_gated_features,
    probe_media,
    resize_media,
    transcode_media,
)
