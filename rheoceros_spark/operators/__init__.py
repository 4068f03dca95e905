from rheoceros_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    embedding_dedup,
    embedding_dup_pairs,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_sigs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
    simhash_pairs,
    simhash_sigs,
)
from rheoceros_spark.operators.multimodal import (  # noqa: F401
    attach_media,
    extract_features,
    sample_frames,
)
from rheoceros_spark.operators.similarity import (  # noqa: F401
    ann_lsh_topk,
    cosine_topk,
    hyperplane_buckets,
)
from rheoceros_spark.operators.text_analysis import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
