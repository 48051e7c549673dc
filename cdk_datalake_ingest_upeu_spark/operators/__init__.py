from cdk_datalake_ingest_upeu_spark.operators.stage_writer import (  # noqa: F401
    StageTable,
    dedup_latest,
    merge_upsert,
)
from cdk_datalake_ingest_upeu_spark.operators.clustering import (  # noqa: F401
    kmeans_assign,
    kmeans_fit,
)
from cdk_datalake_ingest_upeu_spark.operators.dedup import (  # noqa: F401
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    fingerprint_index,
    incremental_exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
    updated_fingerprint_index,
)
from cdk_datalake_ingest_upeu_spark.operators.diff import snapshot_diff  # noqa: F401
from cdk_datalake_ingest_upeu_spark.operators.profile import (  # noqa: F401
    dataset_checksum,
    profile_table,
)
from cdk_datalake_ingest_upeu_spark.operators.sketches import (  # noqa: F401
    daily_sketches,
    rollup_sketches,
)
from cdk_datalake_ingest_upeu_spark.operators.scd import (  # noqa: F401
    scd2_history,
    scd2_point_in_time_join,
    scd2_upsert,
)
from cdk_datalake_ingest_upeu_spark.operators.joins import (  # noqa: F401
    asof_join,
    interval_join,
    salted_join,
)
from cdk_datalake_ingest_upeu_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_index_build,
    ivf_index_probe,
)
from cdk_datalake_ingest_upeu_spark.operators.text import (  # noqa: F401
    add_text_features,
    chunk_documents,
    contamination_stats,
    redact_pii,
)
from cdk_datalake_ingest_upeu_spark.operators.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from cdk_datalake_ingest_upeu_spark.operators.dedup import (  # noqa: F401
    estimated_jaccard,
    ngram_containment_pairs,
    incremental_minhash_dedup,
    minhash_band_table,
    minhash_signature_table,
)
from cdk_datalake_ingest_upeu_spark.operators.quantization import (  # noqa: F401
    dequantize,
    quantization_error,
    quantization_report,
    quantize_vec,
)
from cdk_datalake_ingest_upeu_spark.operators.sampling import (  # noqa: F401
    cap_per_group,
    exact_quantile_bounds,
    hash_bucket,
    hash_sample,
    quantile_bucket,
    stratified_hash_sample,
    weighted_hash_sample,
    with_split,
)
from cdk_datalake_ingest_upeu_spark.operators.scratch import (  # noqa: F401
    finalize,
    release_scratch,
    scratch_persist,
)
from cdk_datalake_ingest_upeu_spark.operators.text import (  # noqa: F401
    bm25_topk,
    bpe_merge_candidates,
    build_vocab,
    encode_tokens,
    unigram_logprob_features,
    unigram_token_logprobs,
)
from cdk_datalake_ingest_upeu_spark.operators.text import (  # noqa: F401
    bpe_encode,
    edit_distance_pairs,
    train_bpe,
)
from cdk_datalake_ingest_upeu_spark.operators.clustering import (  # noqa: F401
    pca_fit,
    pca_project,
)
from cdk_datalake_ingest_upeu_spark.operators.dedup import (  # noqa: F401
    semantic_neardup_pairs,
)
from cdk_datalake_ingest_upeu_spark.operators.expectations import (  # noqa: F401
    Expectation,
    ExpectationFailure,
    check_expectations,
    expectations_report,
)
from cdk_datalake_ingest_upeu_spark.operators.rollup import (  # noqa: F401
    additive_merge,
    rollup_partial,
)
from cdk_datalake_ingest_upeu_spark.operators.multimodal import (  # noqa: F401
    resize_images,
)
from cdk_datalake_ingest_upeu_spark.operators.bloom import (  # noqa: F401
    BloomFilter,
    bloom_build,
    bloom_load,
    bloom_merge,
    bloom_semi_join,
)
from cdk_datalake_ingest_upeu_spark.operators.indexing import (  # noqa: F401
    assign_global_ids,
    with_shard,
)
from cdk_datalake_ingest_upeu_spark.operators.sketches import (  # noqa: F401
    cms_daily,
    cms_estimate,
)
