from rheoceros_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    embedding_dedup,
    embedding_dup_pairs,
    embedding_dup_pairs_blocked,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_sigs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
    simhash_pairs,
    simhash_sigs,
    substring_dup_spans,
)
from rheoceros_spark.operators.multimodal import (  # noqa: F401
    attach_media,
    audio_features,
    decode_wav,
    extract_features,
    resize_images,
    sample_frames,
    sample_frames_ppm,
    scan_ppm_stream,
)
from rheoceros_spark.operators.scale import (  # noqa: F401
    bucketed_join,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from rheoceros_spark.operators.similarity import (  # noqa: F401
    ann_lsh_topk,
    cosine_topk,
    hyperplane_buckets,
    ivf_assign,
    ivf_centroids,
    ivf_append,
    ivf_topk,
    pq_codebook,
    pq_encode,
    pq_topk,
)
from rheoceros_spark.operators.text_analysis import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    repetition_metrics,
    bm25_topk,
    token_count,
    unigram_nll,
)
from rheoceros_spark.operators.curation import (  # noqa: F401
    contamination_ngrams,
    dsir_weights,
    dup_clusters,
    dup_clusters_star,
    filter_funnel,
    gumbel_topk_resample,
    hash_sample,
    pack_sequences,
    pii_redact,
    semantic_contamination,
    shuffle_shards,
    source_mixture_weights,
    stratified_hash_sample,
    vocab_top_tokens,
)
from rheoceros_spark.operators.dedup import (  # noqa: F401
    build_minhash_index,
    dedup_against_index,
)
from rheoceros_spark.operators.sketches import (  # noqa: F401
    cms_estimate,
    cms_sketch,
    cms_top_tokens,
    hll_cube_sketches,
    hll_rollup_estimate,
    histogram_quantiles,
    kmv_distinct,
)
