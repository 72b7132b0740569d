from nginx_log_spark.functions.asof import (  # noqa: F401
    asof_join,
    asof_join_bucketed,
)
from nginx_log_spark.functions.dedup import (  # noqa: F401
    dedup_keep,
    dedup_keep_components,
    exact_dedup,
    incremental_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_components,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    repetition_stats,
    simhash16,
    simhash64,
    simhash_neardup_pairs,
    split_contamination,
    verify_pairs_jaccard,
)
from nginx_log_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    embedding_neardup_pairs,
    hashed_tf,
    ivf_ann_topk,
    ivf_ann_topk_indexed,
    ivf_assign,
    ivf_kmeans_refine,
    lsh_ann_topk,
    lsh_ann_topk_multiprobe,
    lsh_ann_topk_prebucketed,
    multiprobe_buckets,
    seed_centroids,
    semantic_dedup,
    tfidf_cosine_topk,
    write_bucketed_embeddings,
    write_ivf_index,
)
from nginx_log_spark.functions.packing import (  # noqa: F401
    batch_stats,
    chunk_stats,
    chunk_windows,
    deterministic_shuffle,
    length_bucket_batches,
    pack_chunks,
    pack_offsets,
)
from nginx_log_spark.functions.sampling import (  # noqa: F401
    dsir_select,
    hash_sample,
    hash_uniform,
    mixture_resample,
    sample_oracle_pred,
    score_weighted_sample,
    source_quota_cap,
    stratified_sample,
    temperature_resample,
    top_fraction_per_stratum,
    train_val_split,
)
from nginx_log_spark.functions.approx import (  # noqa: F401
    approx_distinct_by,
    approx_quantiles_by,
    distinct_sketches,
    estimate_distinct,
)
from nginx_log_spark.functions.tokenstats import (  # noqa: F401
    doc_entropy_histogram,
    token_entropy_e6,
)
from nginx_log_spark.functions.classifier import (  # noqa: F401
    nb_fit,
    nb_score,
    portable_bucket,
)
from nginx_log_spark.functions.bpe import (  # noqa: F401
    apply_bpe,
    encode_word,
    learn_bpe,
    learn_bpe_distributed,
)
from nginx_log_spark.functions.textstats import (  # noqa: F401
    bigram_logprob_score,
    doc_fingerprint,
    lang_id_col,
    paragraph_dup_stats,
    remove_duplicate_spans,
    pii_columns,
    quality_columns,
    quality_route,
    redact_pii,
    token_count_cols,
    trigram_backoff_score,
    unigram_logprob_score,
    winnow_fingerprints,
)
