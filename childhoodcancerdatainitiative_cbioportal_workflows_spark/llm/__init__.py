from .dedup import (  # noqa: F401
    decontaminate,
    dedup_components,
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup_pairs,
    minhash_dedup_pairs_md5,
    minhash_dedup_pairs_universal,
    minhash_universal_coeffs,
    simhash,
    simhash_bits_md5,
    simhash_dedup_pairs,
    simhash_dedup_pairs_md5,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    containment_pairs,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    incremental_dedup,
    boilerplate_ngrams,
    exact_substring_spans,
    soft_dedup_weights,
    release_plan_caches,
)
from .clustering import (  # noqa: F401
    assign_clusters,
    cluster_profile,
    semantic_dup_pairs,
)
from .relevance import (  # noqa: F401
    bm25_topk,
    phrase_search,
    tfidf_features,
    unigram_logprob_profile,
)
from .sampling import (  # noqa: F401
    bigram_counts,
    cooccurrence_counts,
    build_vocab,
    chunk_documents,
    dataset_split,
    encode_tokens,
    hash_bucket,
    hash_sample,
    pack_sequences,
    stratified_hash_sample,
    temperature_sample,
    collocations,
    curriculum_buckets,
    curriculum_buckets_approx,
    weighted_hash_sample,
    weighted_sample_k,
)
from .similarity import (  # noqa: F401
    ann_recall,
    cosine_topk,
    ivf_flat_topk,
    ivf_flat_topk_trained,
    lsh_ann_topk,
    train_ivf_centroids,
)
from .multimodal import (  # noqa: F401
    FRAME_SCHEMA,
    MULTIMODAL_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    resize_images,
    sample_frames,
)
from .quantize import (  # noqa: F401
    dequantize_vec,
    max_abs,
    quantize_embeddings,
    quantize_vec,
)
from .bpe import EOW, segment_words, train_bpe_merges  # noqa: F401
from .projection import projection_matrix, projection_sql, random_projection  # noqa: F401
from .fusion import rrf_fuse  # noqa: F401
