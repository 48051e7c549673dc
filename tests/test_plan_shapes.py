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
    ("q2_min_cost_supplier", 2, False),    # ps rollup + partkey window; dims broadcast
    ("q12_priority_shipping", 3, False),   # AQE broadcasts orders at this SF (2); +1 if SMJ

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
    ("copurchase_part_pairs", 2, False),   # basket rewrite: one shuffle + pair agg
    ("topk_ngrams", 1, False),
    ("corpus_unigram_logprob", 6, False),  # 1 corpus-sized; rest vocab/doc-grain
    ("text_bm25_topk", 5, False),          # 0 corpus-sized after the dl fix
    ("bpe_merge_pairs", 2, False),
    ("embedding_norm_outliers", 0, False),  # two TakeOrdered, no exchange at all
    ("expectations_report_events", 4, False),  # one-pass rules; unique's distinct + FK anti-join
    ("incremental_rollup_maintenance", 1, False),  # returned plan reads the final artifact + sorts
    ("sample_weighted_quality", 0, False),  # scan-side A-ES rank key, TakeOrdered
    ("scd2_point_in_time_enrich", 2, False),  # keyed join both sides; interval is residual
    ("events_gapfill_hourly", 0, False),  # post-finalize plan: checkpointed grid read + sort
    ("vocab_typo_pairs", 6, False),  # all vocab-scale: distinct words, variant join, pair distinct
    ("events_unpivot_daily", 3, False),  # pivot agg + Expand melt + sort; no extra corpus shuffle
    ("dedup_paragraph_corpus", 3, False),  # chunk window + doc regroup + sort
    ("dedup_incremental_paragraph", 4, False),  # + index anti-join side; window reuses join partitioning
    ("corpus_filter_attrition", 1, False),  # 1-row agg; funnel unpivots map-side
    ("events_grouping_sets", 2, False),  # one scan, map-side Expand for the sets
    ("set_ops_customer_activity", 2, False),  # INTERSECT/EXCEPT as semi/anti joins
    ("bloom_semi_join_lineitems", 4, False),  # key distinct + final agg + sort; bloom probe is scan-side
    ("global_ids_documents", 0, False),   # finalized: checkpoint scan; range exchange paid once upstream
    ("cms_event_type_totals", 0, False),  # driver-assembled KB result; sketches aggregated upstream
    ("dedup_ngram_containment", 0, False),  # finalized: checkpoint scan; index join paid upstream
    ("corpus_checksum", 1, False),  # map-side partial sum -> single-partition final agg
    ("corpus_bigram_logprob", 11, False),  # 1 corpus-sized (stream -> (source,bigram) grain); rest vocab/doc-grain + n_docs branch + sort
    ("embedding_dim_stats", 2, False),  # dim groupBy (64 partials/partition) + output sort
    ("stage_bloom_indexed_write_lookup", 1, False),  # returned plan: pruned-file scan + broadcast semi-join + 1-row agg
    ("dedup_exact_keep_best", 2, False),  # fingerprint window shuffle + output sort
    ("corpus_forget_documents", 0, False),  # 1-row summary; forget filter is a broadcast anti-join at the scan (sig/band purges counted upstream)
    ("corpus_boilerplate_strip", 5, False),  # distinct + docfreq groupBy on (source,chunk), gdocs branch, reassembly groupBy, sort
    ("incremental_boilerplate_strip", 7, False),  # + index merge groupBys (index-grain rows); batch-only explode/reassembly
    ("export_length_bucketed_shards", 3, False),  # (bucket,shard) writer repartition + manifest distinct-shard expand + sort
    ("stage_forget_roundtrip", 0, False),  # 1-row summary; CDC delete + index rebuild are upstream write jobs
    ("corpus_gopher_quality", 2, False),  # one codegen scan + 20-group rollup + sort
    ("corpus_c4_line_filter", 1, False),  # pure codegen per-doc pass + output sort
    ("corpus_substring_span_dedup", 4, False),  # digest groupBy + cover regroup + corpus join + sort (AQE may fuse to 3)
    ("incremental_substring_span_dedup", 6, False),  # + index semi-join (batch-distinct side) and dup union; all digest-grain
    ("corpus_filter_dedup_funnel", 5, False),  # span-dedup shuffles on survivors + funnel join + source rollup (AQE may fuse to 4)
    ("span_dedup_window_sweep", 12, False),  # 3 windows x (digest groupBy + cover distinct/regroup + base join); all digest-grain, no token travels
    ("decontaminate_semantic_benchmark", 1, True),  # one Arrow pass, benchmark in closure; the only exchange is the output sort
    ("quality_threshold_sweep", 3, False),  # codegen score scan + threshold fan groupBy + sort
    ("mixture_temperature_allocation", 3, False),  # source groupBy + single-partition window total + sort
    ("hybrid_rrf_retrieval", 9, True),  # bm25 tf/df groupBys + rank windows + KB-scale fusion joins; cosine is the Arrow scorer
    ("ccnet_perplexity_buckets", 6, False),  # token/vocab groupBys + doc regroup + (lang,q4) histogram + rollup; no per-lang ntile window
    ("streaming_span_dedup", 1, False),  # returned plan: drained epoch-output read + sort; dedup shuffles ran inside foreachBatch
    ("stage_time_travel_read", 3, False),  # three 1-row aggs over per-version manifest scans; commits are upstream write jobs
    ("stage_version_vacuum", 0, False),  # driver-assembled 1-row summary; commit/vacuum IO upstream
    ("stage_change_feed_versions", 6, False),  # 4 exceptAll shuffles over symmetric-difference files only + rollup + sort
    ("stage_compact_small_files", 0, False),  # driver-assembled 1-row summary; compact/feed IO upstream
    ("stage_restore_version", 3, False),  # three 1-row aggs over per-version manifest scans; restore itself is zero-IO
    ("stage_schema_evolution_versions", 2, False),  # channel rollup over the evolved manifest scan + sort; commits upstream
    ("streaming_versioned_ingest", 2, False),  # two 1-row aggs over per-version manifest scans; stream commits upstream
    ("dsir_target_domain_selection", 0, False),  # finalized rollup; upstream: bucket agg + doc-grain agg + join, 2 corpus passes
    ("dsir_incremental_scoring", 0, False),  # finalized rollup; upstream: stored-index read + one batch pass + KB index-merge contract
    ("streaming_dsir_scoring", 0, False),  # finalized drained epochs; per-batch token pass + broadcast lam ran inside foreachBatch
    ("topk_bigram_pmi", 7, False),  # one bigram-count shuffle + marginal rollups/joins (vocab can outgrow broadcast at corpus scale); TakeOrdered top-k
    ("source_token_kl", 0, False),  # finalized rollup; upstream: one (group,bucket) shuffle + broadcast densify
    ("events_mad_outliers", 0, False),  # driver-assembled 1-row report; one histogram shuffle upstream, walks driver-side
    ("events_interarrival_robust", 0, False),  # driver-assembled 1-row report; lag window + histogram shuffle upstream
    ("events_daily_trend_theilsen", 0, False),  # driver-assembled 1-row report; day rollup + KB pair self-join upstream
    ("events_last_touch_attribution", 3, False),  # one user window + touch rollup + sort
    ("corpus_zipf_slope", 1, False),  # one token-count shuffle; TakeOrdered top-100; rank window over 100 rows by construction
    ("quarantine_replay_roundtrip", 0, False),  # finalized per-type rollup; replay==direct exceptAll contract ran upstream
    ("events_daily_ewma", 0, False),  # finalized day-grain result; one corpus rollup + bounded day-lag self-join upstream
    ("incremental_novelty_rate", 0, False),  # finalized per-source rollup; one batch window pass + digest-keyed join upstream
    ("events_type_mad_profile", 0, False),  # driver-assembled per-group report; one (group,value) histogram shuffle upstream
    ("events_ab_distribution_test", 0, False),  # driver-assembled 1-row report; one (group,value) histogram shuffle upstream
    ("documents_chisq_lang_source", 8, False),  # one corpus (a,b) rollup; margins/grid/terms all KB category-grain
    ("events_cumulative_distinct_users", 4, False),  # user first-touch + day rollup + day-grain window (single task by design) + sort
    ("graph_pagerank_event_transitions", 1, False),  # returned plan: KB rank-table sort; the corpus-scale edge aggregation is consumed upstream
    ("graph_reach_event_transitions", 1, False),  # returned plan: KB hop-table sort; edge aggregation consumed upstream
    ("stage_versioned_delete", 3, False),  # three 1-row aggs over per-version manifest scans; COW delete + feeds are upstream jobs
    ("stage_tagged_reads", 0, False),  # driver-assembled 1-row summary; tag/vacuum IO upstream
    ("stage_check_constraints", 0, False),  # driver-assembled 1-row summary; constraint probes are bounded upstream counts
    ("dsir_bigram_selection", 0, False),  # finalized rollup; upstream: two linear token maps + two <=4096-row models + one doc-grain join
    ("asof_join_tolerance", 2, False),  # ONE key shuffle for the union+window carry + output sort; tolerance is row-local, zero extra exchanges
    ("stage_stats_pruned_delete", 1, False),  # returned plan: 1-row agg over the final snapshot; pruning/COW jobs upstream
    ("stage_zorder_stats_pruning", 1, False),  # returned plan: 1-row agg; clustering rewrite + both deletes upstream
    ("stage_merge_resolve_last", 3, False),  # rollup + distinct-count expand + output sort; resolve window runs upstream on the batch
    ("dedup_banding_sweep", 0, False),  # finalized driver-assembled 3-row report; banding aggregations upstream
    ("referential_integrity_audit", 0, False),  # finalized driver-assembled 5-row report; one anti-join per relation upstream
    ("events_hll_accuracy", 3, False),  # exact-distinct expand + partial/final agg + output sort; HLL rides the same agg
    ("events_skew_diagnostics", 2, False),  # one per-key count shuffle + 1-row rollup
    ("embedding_matryoshka_quality", 0, False),  # finalized 3-row report; posexplode + per-vector rollup upstream
    ("ann_rebalance", 0, False),  # driver-assembled 1-row report; hot-cell recount/reassign/probe jobs upstream (Arrow UDFs confined there)
    ("corpus_ngram_decontaminate", 5, False),  # gram stream + bench semi-join are 0-shuffle (broadcast at the scan); all 5 exchanges are doc-/source-grain: contaminated-id distinct, two 20-row rollups, their join, output sort
    ("stage_incremental_commit_log", 0, False),  # driver-assembled 1-row report; commits/reads/vacuum are upstream jobs
    ("stage_deletion_vectors", 0, False),  # driver-assembled 1-row report; DV delete/read/feed/compact are upstream jobs
    ("mixture_token_budget", 2, False),  # one per-source token rollup + output sort; mixture math is 20-row literals
    ("corpus_token_fertility", 2, False),  # one per-lang rollup + output sort; scan-side token counts
    ("streaming_dv_takedown", 0, False),  # driver-assembled 1-row report; stream/DV/consolidation jobs upstream
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


@pytest.mark.parametrize(
    "name,table,expect_cols,expect_pushed",
    [
        # q6: 4 columns of 16, range filters pushed to the parquet reader
        ("q6_forecast_revenue", "lineitem",
         ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
         ["GreaterThan", "LessThan"]),
        # rollup: 3 columns of 6, nothing else read
        ("events_hourly_rollup", "events", ["ts", "event_type", "value"], []),
        # features: 2 columns of 5 — a scan reading `lang`/`source`/
        # `n_chars` for a text-feature projection would be wrong
        ("text_features", "documents", ["doc_id", "text"], []),
        # dim stats: ONLY the embedding array — id/label/meta unread
        ("embedding_dim_stats", "embeddings", ["embedding"], []),
        # keep-best dedup: fingerprint + ordering + output columns only
        ("dedup_exact_keep_best", "documents", ["doc_id", "source", "text"], []),
        # bigram LM: the pair stream reads source+text; n_chars/lang unread
        ("corpus_bigram_logprob", "documents", ["source", "text"], []),
    ],
)
def test_scan_pruning_and_pushdown(spark, name, table, expect_cols, expect_pushed):
    """Column pruning and predicate pushdown must reach the parquet
    scan: the FileScan must read EXACTLY the needed columns, and
    pushable range predicates must appear in PushedFilters. A scan
    reading all columns for a narrow projection multiplies scan bytes
    at 100 TB by the table's width."""
    df = QUERIES[name](spark, SF)
    # formatted mode prints full (untruncated) Output/PushedFilters blocks
    jvm = spark.sparkContext._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    blocks = re.split(r"\n\n", plan)
    scan_block = None
    for b in blocks:
        if "Scan parquet" in b and f"{table}.parquet" in b:
            scan_block = b
            break
    assert scan_block is not None, f"{name}: no parquet scan of {table} found"
    out = re.search(r"Output \[\d+\]: \[([^\]]*)\]", scan_block).group(1)
    got_cols = sorted(c.strip().split("#")[0] for c in out.split(",") if c.strip())
    assert got_cols == sorted(expect_cols), (
        f"{name}: scan reads {got_cols}, expected exactly {sorted(expect_cols)}"
    )
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan_block)
    pushed_txt = pushed.group(1) if pushed else ""
    for marker in expect_pushed:
        assert marker in pushed_txt, (
            f"{name}: expected a {marker} filter pushed to the scan; "
            f"PushedFilters=[{pushed_txt[:200]}]"
        )


@pytest.mark.parametrize(
    "name,min_bhj",
    [
        # every dim join (region/nation/customer/supplier) must broadcast;
        # a SortMergeJoin against a KB-scale dim shuffles the fact for nothing
        ("q5_region_revenue", 4),
        ("q10_returned_items", 3),
    ],
)
def test_dim_joins_broadcast(spark, name, min_bhj):
    plan = _executed_plan(QUERIES[name](spark, SF))
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    assert bhj >= min_bhj, f"{name}: only {bhj} broadcast joins (expected >= {min_bhj})"
    assert smj == 0, (
        f"{name}: {smj} SortMergeJoin(s) against dimension tables — the "
        "dim side fits in a broadcast; a sort-merge shuffles the fact "
        "table for nothing"
    )


def test_no_rebound_sql_constants():
    """A module-level `_FOO_SQL =` assigned twice silently rebinds the
    first oracle to the second query's SQL (it happened: a second
    `_CHANGE_FEED_SQL` hijacked stage_change_feed_apply's oracle and
    only the full local sweep caught it). Pin: every top-level SQL
    constant is assigned exactly once."""
    import collections
    import re

    import cdk_datalake_ingest_upeu_spark.workloads as w

    src = open(w.__file__).read()
    # `_FOO_SQL = None` forward declarations don't rebind anything
    names = re.findall(r"^(_[A-Z0-9_]+SQL) = (?!None\b)", src, re.M)
    dupes = [n for n, c in collections.Counter(names).items() if c > 1]
    assert not dupes, f"rebound SQL constants: {dupes}"


def test_chisq_scans_base_table_once(spark):
    """chi_square_independence persists the contingency rollup, so the
    base table is scanned exactly once (materialized when N is read
    inside the operator); the margins, grid join, and term sum must all
    read the in-memory rollup — the returned plan contains NO parquet
    scan of the base table (r7 finding: four full corpus scans)."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        chi_square_independence,
    )
    from cdk_datalake_ingest_upeu_spark.operators.scratch import (
        release_scratch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    try:
        out = chi_square_independence(docs, "lang", "source")
        plan = _executed_plan(out)
        assert "InMemoryTableScan" in plan, plan[:1500]
        # margins + grid all read the cache: three InMemoryTableScans
        assert plan.count("InMemoryTableScan") >= 3, plan[:1500]
        # every FileScan in the text is embedded in an InMemoryRelation
        # print (each prints its cached plan twice: AQE initial+final);
        # a LIVE re-scan of the base table would exceed that count.
        assert plan.count("FileScan parquet") <= 2 * plan.count(
            "InMemoryRelation"
        ), (
            "grid/margins re-scan the base table instead of the "
            "persisted rollup:\n" + plan[:1500]
        )
    finally:
        release_scratch()
