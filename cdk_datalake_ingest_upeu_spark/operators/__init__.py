from cdk_datalake_ingest_upeu_spark.operators.stage_writer import (  # noqa: F401
    StageTable,
    dedup_latest,
    merge_upsert,
)
from cdk_datalake_ingest_upeu_spark.operators.dedup import (  # noqa: F401
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from cdk_datalake_ingest_upeu_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from cdk_datalake_ingest_upeu_spark.operators.text import add_text_features  # noqa: F401
