"""Physical-plan regression guards.

Correctness gates catch wrong ANSWERS; nothing else catches a wrong
PLAN — a refactor that sneaks a row-at-a-time Python UDF into a hot
path, or an extra corpus-sized exchange into a query, ships green and
only shows up as a 100x cliff at scale (it happened: round 2's
interpreted HOF cosine, round 4's countDistinct expand in the unigram
rollup — both found by hand-auditing ``executedPlan``). This suite
pins the audited shapes:

- NO query in the budget table may contain ``BatchEvalPython``
  (row-at-a-time Python). Arrow paths (``ArrowEvalPython``,
  ``MapInPandas``) are allowed where listed.
- The number of shuffle exchanges (hash/range/single partition) must
  not EXCEED the audited budget. Budgets are the measured post-AQE
  counts at the time each query's plan was tuned — going under is
  fine; going over means a new exchange crept in and must be either
  justified (raise the budget in the same commit that explains it) or
  removed.
"""

from __future__ import annotations

import re

import pytest

from cdk_datalake_ingest_upeu_spark.workloads import QUERIES

SF = "/root/testdata/sf0.001"

# (query, max_shuffle_exchanges, arrow_allowed)
BUDGETS = [
    ("q1_pricing_summary", 2, False),
    ("events_hourly_rollup", 2, False),
    ("events_funnel", 2, False),           # de-arrayed r4: windows, no collect_list
    ("events_sessionization", 2, False),
    ("text_features", 0, False),           # pure scan-side codegen
    ("text_langid", 0, False),
    ("dedup_exact_corpus", 2, False),
    ("corpus_quality_filter", 2, False),
    ("text_pii_redaction", 2, False),
    ("sample_hash_deterministic", 1, False),  # scan-side md5 filter + 1-row agg
    ("text_chunk_windows", 1, False),
    ("corpus_mixture_sample", 5, False),
    ("text_quality_classifier", 2, False),
    ("events_transition_bigrams", 3, False),
    ("events_value_histogram", 2, False),
    ("copurchase_part_pairs", 3, False),
    ("topk_ngrams", 1, False),
    ("corpus_unigram_logprob", 6, False),  # 1 corpus-sized; rest vocab/doc-grain
    ("text_bm25_topk", 5, False),          # 0 corpus-sized after the dl fix
    ("bpe_merge_pairs", 2, False),
    ("embedding_norm_outliers", 0, False),  # two TakeOrdered, no exchange at all
]


def _executed_plan(df) -> str:
    df.count()  # force execution so AQE's final plan is what we read
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name,max_shuffles,arrow_ok", BUDGETS)
def test_plan_shape(spark, name, max_shuffles, arrow_ok):
    plan = _executed_plan(QUERIES[name](spark, SF))
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan — use built-in "
        "functions or an Arrow-batched pandas_udf"
    )
    if not arrow_ok:
        for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, (
                f"{name}: unexpected Python boundary {marker} — this "
                "query is budgeted as JVM-only"
            )
    shuffles = len(re.findall(r"Exchange (hash|range|Single)", plan))
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffle exchanges > audited budget "
        f"{max_shuffles} — a new exchange crept in; justify it (raise "
        "the budget with an explanation) or remove it\n" + plan[:2000]
    )
