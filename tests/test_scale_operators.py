"""Tests for the training-data-pipeline operators: dedup families,
similarity search, text analysis, multimodal plumbing."""

import pytest

from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
    extract_image_features,
    sample_video_frames,
)
from cdk_datalake_ingest_upeu_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from cdk_datalake_ingest_upeu_spark.operators.text import add_text_features

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = BASE.replace("today", "tonight")  # one-token change
FAR = "completely different content about spark query engines and shuffles"


def docs_df(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, NEAR),  # near dup of 1
        (4, FAR),
        (5, "  THE  quick brown fox jumps over the lazy dog near the old river bank today "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalizes(spark):
    out = exact_dedup(docs_df(spark))
    ids = sorted(r.doc_id for r in out.collect())
    # 2 and 5 (case/whitespace variant) collapse into 1
    assert ids == [1, 3, 4]


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs_df(spark), threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 5) in pairs
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert all(not (a == 4 or b == 4) for a, b in pairs)


def test_minhash_dedup_keeps_min_id(spark):
    out = sorted(r.doc_id for r in minhash_dedup(docs_df(spark), threshold=0.5).collect())
    assert out == [1, 4]


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs_df(spark), threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # BASE has 15 tokens -> 13 distinct 3-gram shingles; NEAR changes the
    # last token, altering only the final shingle -> 12 shared, union 14
    expected = round(12 / 14, 6)
    assert abs(pairs[(1, 3)] - expected) < 1e-6


def test_ngram_jaccard_hot_shingle_capped(spark):
    """A shingle shared by 1k docs must not create a 1k² candidate bucket.
    With the df cap active, results on pairs sharing rare shingles are
    IDENTICAL to the uncapped run (the planted near-dup pair survives
    with its exact value), and the hot-only crowd yields no pairs."""
    common = "lorem ipsum dolor sit amet"  # every doc: hot shingles
    rows = [(i, f"{common} u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(1000)]
    # planted near-dup pair with many rare shared shingles
    tail = " ".join(f"tok{j}" for j in range(30))
    rows += [(2000, f"alpha {tail}"), (2001, f"beta {tail}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=50).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=None).collect()
    }
    assert (2000, 2001) in capped
    assert capped == exact


def test_minhash_mega_bucket_star_linked(spark):
    """A cluster of near-identical docs larger than max_band_bucket must
    still dedup to its min id (star-linking), with candidate fan-out
    linear in the cluster size instead of quadratic."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import minhash_dedup as md

    text = "identical boilerplate page repeated across the whole mirror set " * 3
    rows = [(i, text) for i in range(100, 300)] + [(1, "totally unrelated single document")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.7, max_band_bucket=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # star pairs only: every member links to min id 100, fan-out O(m) not O(m²)
    assert got == {(100, i) for i in range(101, 300)}
    kept = sorted(r.doc_id for r in md(docs, threshold=0.7, max_band_bucket=16).collect())
    assert kept == [1, 100]


def test_simhash_identical_and_near(spark):
    sigs = {r.doc_id: r.simhash for r in simhash64(docs_df(spark)).collect()}
    assert sigs[1] == sigs[2] == sigs[5]
    pairs = simhash_pairs(docs_df(spark), max_hamming=16).collect()
    keys = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in keys
    hams = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert hams[(1, 2)] == 0


def emb_df(spark, n=60, dim=8):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    vecs[1] = vecs[0] * 1.5  # same direction as 0 -> cosine 1
    vecs[2] = vecs[0] + rng.standard_normal(dim).astype("float32") * 0.05
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dup(spark):
    emb = emb_df(spark)
    pairs = {(r.id_a, r.id_b): r.cosine for r in
             embedding_near_dup_pairs(emb, dim=8, threshold=0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.999999
    assert (0, 2) in pairs


def test_ann_bruteforce_exact_and_deterministic(spark):
    emb = emb_df(spark)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk_bruteforce(emb, q, k=3).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    # query 0's best neighbors: itself and the colinear vec 1 (cosine 1.0)
    top0 = sorted(by_query[0])
    assert top0[0][1] == 0 and top0[0][2] == 1.0
    assert top0[1][1] == 1 and top0[1][2] == 1.0


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = emb_df(spark, n=100)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = cosine_topk_lsh(emb, q, k=5, dim=8, n_planes=16, bands=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_text_features_shapes(spark):
    out = add_text_features(docs_df(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_tokens_ws == 15
    assert by_id[1].fingerprint == by_id[2].fingerprint == by_id[5].fingerprint
    assert by_id[1].lang_pred == "en"
    assert 0.0 <= by_id[1].quality_score <= 1.0
    assert by_id[1].stopword_ratio == pytest.approx(3 / 15)  # 'the' x3 of 15


def test_multimodal_frame_sampling(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"x" * 300)), (2, bytearray(b"y" * 10))],
        "doc_id long, payload binary",
    )
    frames = sample_video_frames(media, every_n_bytes=64, max_frames=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(len(r.frame_bytes))
    assert by_doc[1] == [64, 64, 64, 64]  # 300 // 64 = 4 frames
    assert by_doc[2] == [10]  # short payload -> 1 truncated frame


def test_multimodal_feature_extraction_stub(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in extract_image_features(media).collect()}
    assert out[1].n_bytes == 3
    assert len(out[1].feature) == 8
    assert out[1].feature[0] == 3.0  # stub: first feature = byte length
    assert out[2].n_bytes == 0


def test_unknown_media_type_raises(spark):
    media = spark.createDataFrame([(1, bytearray(b"a"))], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError):
        extract_image_features(media, media_type="audio")


def test_ann_ivf_recall_vs_bruteforce(spark):
    from cdk_datalake_ingest_upeu_spark.operators.similarity import cosine_topk_ivf

    emb = emb_df(spark, n=100)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = cosine_topk_ivf(emb, q, k=5, n_clusters=8, n_probe=3).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_hash_sample_deterministic_and_proportional(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
        with_split,
    )

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 0.1, seed="s").collect()}
    b = {r.k for r in hash_sample(df.repartition(7), "k", 0.1, seed="s").collect()}
    assert a == b  # layout-independent
    assert 800 <= len(a) <= 1200  # ~10%
    # different seed -> different (mostly disjoint) sample
    c = {r.k for r in hash_sample(df, "k", 0.1, seed="t").collect()}
    assert len(a & c) < len(a) * 0.3
    # nested fractions: a 5% sample is a subset of the 10% sample
    d = {r.k for r in hash_sample(df, "k", 0.05, seed="s").collect()}
    assert d <= a

    lab = df.withColumn("lab", (F.col("k") % 2 == 0).cast("string"))
    strat = stratified_hash_sample(lab, "lab", {"true": 1.0}, "k", default_fraction=0.1)
    got = {r.lab: r.cnt for r in strat.groupBy("lab").agg(F.count("*").alias("cnt")).collect()}
    assert got["true"] == 5000 and 350 <= got["false"] <= 650

    split = with_split(df, "k", test_fraction=0.1, validation_fraction=0.1)
    counts = {r.split: r.cnt for r in split.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 10_000
    assert 800 <= counts["test"] <= 1200 and 800 <= counts["validation"] <= 1200


def test_pack_documents_invariants(spark):
    """Every doc packed exactly once; no multi-doc pack exceeds the
    budget; oversize docs isolated; assignment is layout-independent."""
    from cdk_datalake_ingest_upeu_spark.operators.packing import pack_documents

    rows = [(i, 1 + (i * 37) % 300) for i in range(500)] + [(9001, 900)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    packed = pack_documents(
        docs, token_budget=512, tokens_col="n_tokens", id_col="doc_id", n_groups=8
    )
    rows_out = packed.collect()
    assert sorted(r.doc_id for r in rows_out) == sorted(r[0] for r in rows)
    sums = {}
    counts = {}
    for r in rows_out:
        sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_tokens
        counts[r.pack_id] = counts.get(r.pack_id, 0) + 1
    for pid, s in sums.items():
        assert s <= 512 or counts[pid] == 1
    over = [r for r in rows_out if r.doc_id == 9001][0]
    assert over.oversize and counts[over.pack_id] == 1
    # determinism across physical layouts
    again = pack_documents(
        docs.repartition(13), token_budget=512, tokens_col="n_tokens",
        id_col="doc_id", n_groups=8,
    )
    assert {(r.doc_id, r.pack_id) for r in again.collect()} == {
        (r.doc_id, r.pack_id) for r in rows_out
    }


def test_repetition_ratio_planted(spark):
    """A document that repeats a phrase scores high; unique prose scores
    0; short/empty docs are 0 (no grams)."""
    from cdk_datalake_ingest_upeu_spark.operators.text import add_repetition_features

    loop = " ".join(["buy cheap pills now"] * 10)  # heavy 3-gram repetition
    rows = [(1, BASE), (2, loop), (3, ""), (4, "one two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.repetition_3gram
        for r in add_repetition_features(df, n=3).collect()
    }
    assert got[1] == 0.0  # BASE repeats 'the' but no 3-gram
    assert got[2] > 0.8  # 40 tokens, only a handful of distinct grams
    assert got[3] == 0.0 and got[4] == 0.0


def test_contamination_stats_planted(spark):
    """A corpus doc equal to a benchmark doc is ~100% contaminated; a
    half-overlapping doc is partial; disjoint text is 0."""
    from cdk_datalake_ingest_upeu_spark.operators.text import contamination_stats

    bench = spark.createDataFrame([(100, BASE)], "doc_id long, text string")
    half = BASE + " entirely novel continuation that the benchmark never saw at all"
    corpus = spark.createDataFrame(
        [(1, BASE), (2, half), (3, FAR)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contamination)
        for r in contamination_stats(corpus, bench, n=5).collect()
    }
    assert got[1][2] == 1.0
    assert 0.0 < got[2][2] < 1.0
    assert got[3] == (got[3][0], 0, 0.0)


def test_simhash_dedup_keeps_min_id(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import simhash_dedup

    kept = sorted(r.doc_id for r in simhash_dedup(docs_df(spark), max_hamming=3).collect())
    # 1/2/5 are identical after normalization; 3 is a near-dup of 1
    assert kept == [1, 4]


def test_streaming_dedup_drops_cross_batch_redelivery(spark, tmp_path):
    """A key re-delivered in a LATER micro-batch (within the watermark
    horizon) must be dropped; fresh keys pass through."""
    import os

    from cdk_datalake_ingest_upeu_spark.streaming.stateful import run_streaming_dedup

    base = 1_700_000_000
    batches = [
        [(1, base, 1.0), (2, base + 10, 2.0)],
        [(1, base, 1.0), (3, base + 1200, 3.0)],  # event 1 re-delivered
        [(2, base + 10, 2.0), (4, base + 2400, 4.0)],  # event 2 re-delivered
    ]
    src = os.path.join(tmp_path, "src")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(e, float(ts), v) for e, ts, v in rows],
            "event_id long, ts double, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        p = os.path.join(src, f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))

    out = os.path.join(tmp_path, "out")
    schema = spark.read.parquet(os.path.join(src, "b0")).schema
    q = run_streaming_dedup(
        spark,
        os.path.join(src, "b*"),
        schema,
        out,
        checkpoint_dir=os.path.join(tmp_path, "ckpt"),
        key_cols=["event_id"],
        watermark="6 hours",
        query_name="sdedup_test",
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]


def test_stateful_sessionization_carries_state(spark, tmp_path):
    """State must carry across micro-batches: one user whose events span
    three file drops, gaps chosen so sessions split across batches."""
    import os

    from cdk_datalake_ingest_upeu_spark.operators.stage_writer import StageTable
    from cdk_datalake_ingest_upeu_spark.streaming.stateful import (
        run_stateful_sessionization,
    )

    base = 1_700_000_000
    # user 1: batch0 two events 10s apart (1 session); batch1 event +2h
    # (new session); batch2 event +10s (same session) => 2 sessions, 4 events
    # user 2: one event per batch, 2h apart => 3 sessions, 3 events
    batches = [
        [(1, base, 101), (1, base + 10, 102), (2, base, 201)],
        [(1, base + 7300, 103), (2, base + 7200, 202)],
        [(1, base + 7310, 104), (2, base + 14400, 203)],
    ]
    src = os.path.join(tmp_path, "src")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(u, float(ts), e) for u, ts, e in rows],
            "user_id long, ts double, event_id long",
        )
        p = os.path.join(src, f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (base + i, base + i))

    stage = StageTable(spark, os.path.join(tmp_path, "totals"))
    schema = spark.read.parquet(os.path.join(src, "b0")).schema
    q = run_stateful_sessionization(
        spark,
        os.path.join(src, "b*"),
        schema,
        lambda b, _i: stage.merge(b, ["user_id"]),
        checkpoint_dir=os.path.join(tmp_path, "ckpt"),
        query_name="sess_test",
    )
    q.processAllAvailable()
    q.stop()
    got = {r.user_id: (r.n_sessions, r.n_events) for r in stage.read().collect()}
    assert got == {1: (2, 4), 2: (3, 3)}


def test_watermarked_rollup_drops_late_events(spark, tmp_path):
    """Late data arriving AFTER its window's state was evicted must be
    discarded. (Spark's guarantee is one-directional: a late row whose
    window state is still live may be merged; once the watermark evicts
    the window, later arrivals are dropped — so the eviction batch comes
    before the late row here.)"""
    import datetime as dt
    import os

    from cdk_datalake_ingest_upeu_spark.streaming.stateful import (
        run_watermarked_rollup,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    batches = [
        # batch0: two events in hour 0
        [(t0, "click", 1.0), (t0 + dt.timedelta(minutes=5), "click", 1.0)],
        # batch1: advances max event time to 6:30 -> watermark becomes 5:30
        [(t0 + dt.timedelta(hours=6), "click", 1.0)],
        # batch2: runs WITH watermark 5:30 -> hour-0 window evicted+emitted
        [(t0 + dt.timedelta(hours=7), "click", 1.0)],
        # batch3: a LATE hour-0 event (state already evicted -> dropped)
        # plus the far-future sentinel that finalizes everything
        [
            (t0 + dt.timedelta(minutes=10), "click", 100.0),
            (t0 + dt.timedelta(days=30), "__sentinel__", 0.0),
        ],
    ]
    src = os.path.join(tmp_path, "src")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        p = os.path.join(src, f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (1_700_000_000 + i, 1_700_000_000 + i))

    out = os.path.join(tmp_path, "out")
    q = run_watermarked_rollup(
        spark,
        os.path.join(src, "b*"),
        spark.read.parquet(os.path.join(src, "b0")).schema,
        out,
        checkpoint_dir=os.path.join(tmp_path, "ckpt"),
        watermark="1 hour",
        query_name="wm_late_test",
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
        if r.event_type != "__sentinel__"
    }
    hour0 = (t0.replace(minute=0), "click")
    # late 100.0-value event NOT included: hour-0 bucket keeps 2 events, sum 2.0
    assert rows[hour0] == (2, 2.0), rows
    assert (t0.replace(minute=0) + dt.timedelta(hours=6), "click") in rows
    assert (t0.replace(minute=0) + dt.timedelta(hours=7), "click") in rows
    # the dropped late row must not re-open a duplicate hour-0 window
    all_rows = spark.read.parquet(out).collect()
    hour0_rows = [
        r for r in all_rows
        if r.bucket_start == t0.replace(minute=0) and r.event_type == "click"
    ]
    assert len(hour0_rows) == 1


def test_salted_join_equals_plain_join_and_spreads_hot_key(spark):
    from cdk_datalake_ingest_upeu_spark.operators.joins import salted_join, skew_stats

    # 10k rows of hot key 1, a few of others
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame([(i, f"dim{i}") for i in range(50)], "k long, name string")

    plain = spark.createDataFrame(
        sorted((r.k, r.v, r.name) for r in left.join(right, "k").collect()),
        "k long, v long, name string",
    )
    salted = spark.createDataFrame(
        sorted((r.k, r.v, r.name) for r in salted_join(left, right, "k", buckets=8).collect()),
        "k long, v long, name string",
    )
    assert plain.collect() == salted.collect()

    # left join with an unmatched key keeps nulls
    left2 = left.union(spark.createDataFrame([(999, -1)], "k long, v long"))
    lj = {(r.k, r.v): r.name for r in salted_join(left2, right, "k", how="left").collect()}
    assert lj[(999, -1)] is None

    stats = skew_stats(left, "k", top=1).collect()[0]
    # 9000 hot rows + 20 ids in [9000,10000) with id % 50 == 1
    assert stats.k == 1 and stats.n_rows == 9_020 and stats.share > 0.85

    # the hot key's rows spread over multiple salt buckets internally:
    # count distinct shuffle keys produced for k=1
    from cdk_datalake_ingest_upeu_spark.operators import joins as J

    salted_keys = (
        left.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
        )
        .filter(F.col("k") == 1)
        .select("s")
        .distinct()
        .count()
    )
    assert salted_keys == 8


def test_asof_join_directions_and_exact_time(spark):
    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 2.0), (2, 60, 3.0)], "k long, rt long, v double"
    )
    back = {r.tag: r.v for r in asof_join(
        left, right, on="k", left_time="t", right_time="rt").collect()}
    # exact-time match counts (t=100 sees rt=100); t=200 sees rt=150; no
    # purchase at-or-before t=50 -> null
    assert back == {"a": 1.0, "b": 2.0, "c": None}

    fwd = {r.tag: r.v for r in asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        direction="forward").collect()}
    # t=100 sees rt=100 (equal counts); t=200 has nothing later -> null;
    # t=50 sees rt=60
    assert fwd == {"a": 1.0, "b": None, "c": 3.0}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", left_time="t", right_time="rt", direction="nearest")


def test_asof_join_payload_collision_uniquified(spark):
    """A right payload column named like a left column must come out
    suffixed, not silently collide; a double collision raises."""
    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 50, "R")], "k long, rt long, v string")
    out = asof_join(left, right, on="k", left_time="t", right_time="rt")
    assert set(out.columns) == {"k", "t", "v", "v_right"}
    row = out.collect()[0]
    assert row.v == "L" and row.v_right == "R"

    import pytest as _pytest

    clash = spark.createDataFrame(
        [(1, 50, "R", "X")], "k long, rt long, v string, v_right string"
    )
    with _pytest.raises(ValueError, match="collides"):
        asof_join(left, clash, on="k", left_time="t", right_time="rt")


def test_winnow_fingerprints_detect_shifted_overlap(spark):
    """Winnowing property: identical docs -> identical fingerprint sets;
    a doc embedded in extra surrounding text still SHARES most
    fingerprints (position-robust, unlike positional hashing)."""
    from cdk_datalake_ingest_upeu_spark.operators.text import with_winnow_fingerprints

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, core),
            (2, core),
            (3, "intro words first then " + core + " and trailing words after"),
            (4, "totally unrelated content with different vocabulary entirely here"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: set(r.fingerprints)
        for r in with_winnow_fingerprints(docs).collect()
    }
    assert fps[1] == fps[2] and len(fps[1]) > 0
    overlap = len(fps[1] & fps[3]) / len(fps[1])
    assert overlap >= 0.5, f"shifted overlap too low: {overlap}"
    assert not (fps[1] & fps[4])
    assert fps[5] == set()


def test_partition_by_bytes_sizes_by_payload(spark):
    from cdk_datalake_ingest_upeu_spark.operators.multimodal import partition_by_bytes

    media = spark.createDataFrame(
        [(i, bytearray(b"x" * 1_000_000)) for i in range(12)],
        "doc_id long, payload binary",
    )
    # 12e6 bytes of payload at 4 MiB target -> int(12e6/4Mi)+1 = 3 partitions
    out = partition_by_bytes(media, target_mb=4)
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 12
    # empty table -> 1 partition, no crash
    empty = media.limit(0)
    assert partition_by_bytes(empty, target_mb=4).rdd.getNumPartitions() == 1


def test_embedding_dedup_keeps_min_id(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import embedding_dedup

    emb = emb_df(spark)  # vec 1 colinear with 0; vec 2 near 0
    kept = sorted(r.vec_id for r in embedding_dedup(emb, dim=8, threshold=0.95).collect())
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert len(kept) == emb.count() - 2


def test_interval_join_bounds_and_self_derivation(spark):
    """Inclusive bounds; both sides derived from ONE relation (the
    ambiguous-lineage case); collision on non-key names raises."""
    import datetime as dt

    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.joins import interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "L", 100),
        (1, t0 - dt.timedelta(minutes=60), "R", 1),   # exactly -1h: included
        (1, t0 - dt.timedelta(minutes=61), "R", 2),   # outside
        (1, t0, "R", 3),                              # exactly 0: included
        (1, t0 + dt.timedelta(seconds=1), "R", 4),    # future: excluded
        (2, t0 - dt.timedelta(minutes=5), "R", 5),    # other key
    ]
    base = spark.createDataFrame(rows, "k int, t timestamp, side string, v int")
    left = base.filter(F.col("side") == "L").select("k", F.col("t").alias("lt"))
    right = base.filter(F.col("side") == "R").select(
        "k", F.col("t").alias("rt"), "v"
    )
    got = interval_join(left, right, "k", "lt", "rt", lower="-1 hours").collect()
    assert sorted(r.v for r in got) == [1, 3]

    outer = interval_join(
        left, right, "k", "lt", "rt", lower="-1 hours", how="full_outer"
    )
    assert {r.k for r in outer.collect()} == {1, 2}  # key survives both sides

    with _pytest.raises(ValueError, match="disjoint"):
        interval_join(
            left.withColumnRenamed("lt", "v"), right, "k", "v", "rt"
        )


def test_redact_pii_kinds_and_no_double_count(spark):
    from cdk_datalake_ingest_upeu_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.user+x@test.org or call +1 (555) 010-2233 from 10.0.0.7"),
        (2, "ssn 123-45-6789 plain prose"),
        (3, "no identifiers here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    r1 = got[1]
    assert (r1.n_pii_email, r1.n_pii_phone, r1.n_pii_ipv4, r1.n_pii_ssn) == (1, 1, 1, 0)
    assert "[PII:email]" in r1.text and "[PII:phone]" in r1.text and "[PII:ipv4]" in r1.text
    assert "@" not in r1.text and "555" not in r1.text
    r2 = got[2]
    # the SSN must be claimed by the ssn pattern, not later eaten as a phone
    assert r2.n_pii_ssn == 1 and r2.n_pii_phone == 0
    assert got[3].text == "no identifiers here"
    assert (got[3].n_pii_email, got[3].n_pii_phone) == (0, 0)


def test_streaming_topk_fold_matches_across_batch_splits():
    """The merge-and-cut fold gives the same top-k whether rows arrive
    in one batch or split across two (state carry is associative)."""
    import pandas as _pd

    from cdk_datalake_ingest_upeu_spark.streaming.stateful import _topk_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    rows = [(5.0, 1), (9.0, 2), (9.0, 3), (1.0, 4), (7.0, 5)]

    def run(batches):
        st, upd = FakeState(), _topk_update(3)
        out = None
        for b in batches:
            pdf = _pd.DataFrame(b, columns=["value", "event_id"])
            out = list(upd((7,), [pdf], st))[-1]
        return (out["topk_sum"][0], out["n_topk"][0], st._v)

    one = run([rows])
    split = run([rows[:2], rows[2:]])
    assert one == split
    assert one[0] == 25.0 and one[1] == 3
    assert one[2][1] == [2, 3, 5]  # tie on 9.0 broken by lower id


def test_tws_api_surface_present():
    """pyspark 4 ships transformWithStateInPandas; whether it can RUN
    depends on the protobuf runtime (gated, like the Delta jars)."""
    from cdk_datalake_ingest_upeu_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        TopKProcessor,
    )

    assert HAS_TRANSFORM_WITH_STATE
    assert callable(getattr(TopKProcessor(3), "handleInputRows"))


def test_kmeans_recovers_planted_clusters(spark):
    """4 well-separated direction clusters -> 4 pure k-means clusters,
    monotone inertia, and deterministic refit."""
    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    rng = _np.random.default_rng(7)
    dirs = _np.eye(4, 16) * 10.0
    rows = []
    for i in range(400):
        g = i % 4
        v = dirs[g] + rng.normal(0, 0.3, 16)
        rows.append((i, [float(x) for x in v], g))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    C, hist = kmeans_fit(df, k=4, iters=4)
    assert hist == sorted(hist, reverse=True)  # inertia non-increasing
    got = kmeans_assign(df, C).groupBy("cluster", "label").count().collect()
    # purity: each cluster maps to exactly one planted label
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r.cluster, set()).add(r.label)
    assert len(by_cluster) == 4
    assert all(len(v) == 1 for v in by_cluster.values())
    C2, hist2 = kmeans_fit(df, k=4, iters=4)
    assert _np.allclose(C, C2) and hist == hist2


def test_connected_components_chains_stars_singletons(spark):
    """A 4-chain, a star, and an isolated pair each collapse to their
    minimum id — including the chain case single-pass min-id misses."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
            (10, 11), (10, 12), (10, 13),    # star at 10
            (20, 21),                        # pair
        ],
        "id_a long, id_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert {k for k, v in got.items() if v == 1} == {1, 2, 3, 4}
    assert {k for k, v in got.items() if v == 10} == {10, 11, 12, 13}
    assert {k for k, v in got.items() if v == 20} == {20, 21}


def test_connected_components_raises_instead_of_splitting(spark):
    """Neighbor-min propagation is O(diameter): a chain longer than
    max_iters must RAISE, not silently return split components."""
    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=1)
    # and a sufficient budget settles the same chain exactly
    got = {r.node: r.component for r in connected_components(chain, max_iters=6).collect()}
    assert set(got.values()) == {0}


def test_snapshot_diff_statuses(spark):
    from cdk_datalake_ingest_upeu_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 33.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r.k: r.status for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "deleted", 2: "unchanged", 3: "updated", 4: "inserted"}


def test_snapshot_diff_edge_cases(spark):
    """Key-only snapshots raise a clear error; null keys match
    null-safely instead of reporting deleted+inserted."""
    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.diff import snapshot_diff

    key_only = spark.createDataFrame([(1,), (2,)], "k long")
    with pytest.raises(ValueError, match="no comparable payload"):
        snapshot_diff(key_only, key_only, "k")

    old = spark.createDataFrame([(None, 1.0), (7, 2.0)], "k long, v double")
    new = spark.createDataFrame([(None, 1.0), (7, 9.0)], "k long, v double")
    got = {r.k: r.status for r in snapshot_diff(old, new, "k").collect()}
    assert got == {None: "unchanged", 7: "updated"}


def test_incremental_dedup_against_index(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        fingerprint_index,
        incremental_exact_dedup,
        updated_fingerprint_index,
    )

    hist = spark.createDataFrame(
        [(0, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (11, "ALPHA   beta"),   # dup of history (normalized) -> dropped
            (13, "epsilon zeta"),   # new -> kept
            (15, "epsilon  ZETA"),  # in-batch dup of 13 -> dropped
            (17, "eta theta"),      # new -> kept
        ],
        "doc_id long, text string",
    )
    idx = fingerprint_index(hist)
    out = incremental_exact_dedup(batch, idx)
    assert sorted(r.doc_id for r in out.collect()) == [13, 17]

    idx2 = updated_fingerprint_index(idx, out)
    assert idx2.count() == 4
    # re-running the same batch against the updated index drops everything
    assert incremental_exact_dedup(batch, idx2).count() == 0


def test_chunk_documents_coverage_and_overlap(spark):
    from cdk_datalake_ingest_upeu_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_size=64, overlap=16)
    rows = {
        (r.doc_id, r.chunk_id): r for r in out.collect()
    }
    # doc 1: starts 0, 48, 96 — last chunk reaches token 150
    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == [0, 1, 2]
    assert rows[(1, 0)].chunk_start == 0 and rows[(1, 0)].n_chunk_tokens == 64
    assert rows[(1, 2)].chunk_start == 96 and rows[(1, 2)].n_chunk_tokens == 54
    # consecutive chunks overlap by exactly 16 tokens
    c0 = rows[(1, 0)].chunk_text.split(" ")
    c1 = rows[(1, 1)].chunk_text.split(" ")
    assert c0[-16:] == c1[:16]
    # full coverage, order preserved
    merged = c0 + c1[16:] + rows[(1, 2)].chunk_text.split(" ")[16:]
    assert merged == words.split(" ")
    # short doc -> one whole chunk; empty doc -> one empty chunk
    assert rows[(2, 0)].n_chunk_tokens == 2
    assert rows[(3, 0)].n_chunk_tokens == 0 and rows[(3, 0)].chunk_text == ""
    # no Python, no shuffle: map-only plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_profile_table_exact_and_approx(spark):
    from cdk_datalake_ingest_upeu_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", 2.5), (4, None, 2.5)],
        "k long, s string, v double",
    )
    exact = {r.column_name: r for r in profile_table(df).collect()}
    assert exact["k"].n_rows == 4 and exact["k"].n_nulls == 0
    assert exact["k"].n_distinct == 4
    assert exact["k"].min_value == "1" and exact["k"].max_value == "4"
    assert exact["s"].n_nulls == 1 and exact["s"].n_distinct == 2
    assert exact["v"].n_nulls == 1 and exact["v"].n_distinct == 2
    # no Expand in any per-column branch (the point of the union plan)
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan

    approx = {r.column_name: r for r in profile_table(df, exact=False).collect()}
    assert approx.keys() == exact.keys()
    for c in exact:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_value == exact[c].min_value
        # tiny cardinalities are exact under HLL too
        assert approx[c].n_distinct == exact[c].n_distinct


def test_sketch_rollup_accuracy_and_merge_consistency(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sketches import (
        daily_sketches,
        rollup_sketches,
    )

    from cdk_datalake_ingest_upeu_spark.workloads import _t

    ev = _t(spark, "/root/testdata/sf0.001", "events")
    daily = daily_sketches(ev, "user_id", "value").cache()
    weekly = rollup_sketches(daily, F.date_trunc("week", "day"))

    exact = (
        ev.withColumn("week", F.date_trunc("week", "ts"))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count_distinct("user_id").alias("d_exact"),
            F.expr("percentile(value, 0.5)").alias("p50_exact"),
            F.expr("percentile(value, 0.95)").alias("p95_exact"),
        )
    )
    j = weekly.join(exact, weekly.grain == exact.week).collect()
    assert len(j) > 0
    # KLL guarantees RANK error (<~2% at default k, 99% confidence), not
    # VALUE error — on a heavy-tailed week the p95 VALUE can sit several
    # percent off while the rank is well within bound, and sketch-merge
    # order makes the value run-to-run unstable.  Assert the estimate's
    # empirical rank in the exact data instead, with the 1/n rank
    # granularity of a small week added to the sketch bound.
    import bisect

    vals_by_week = {
        r.week: sorted(r.vals)
        for r in ev.withColumn("week", F.date_trunc("week", "ts"))
        .groupBy("week")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    for r in j:
        assert r.n_rows == r.n_exact  # row counts merge exactly
        assert abs(r.est_distinct - r.d_exact) / r.d_exact < 0.05
        vals = vals_by_week[r.week]
        eps = 0.03 + 1.0 / len(vals)
        for q, est in ((0.50, r.p50), (0.95, r.p95)):
            rank = bisect.bisect_right(vals, est) / len(vals)
            assert abs(rank - q) <= eps, (r.week, q, est, rank)

    # merge consistency: union-of-daily == one sketch over everything
    total = rollup_sketches(daily, F.lit(1)).collect()[0]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d")
    ).collect()[0]
    assert total.est_distinct == direct.d
    daily.unpersist()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed+sorted on the join key => SortMergeJoin with
    NO Exchange (and no per-task Sort of the streamed side) — the
    shuffle-once-at-landing layout contract."""
    from cdk_datalake_ingest_upeu_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bkt_l", bucket_cols="k", n_buckets=4,
                   external_path=str(tmp_path / "l"))
    write_bucketed(right, "t_bkt_r", bucket_cols="k", n_buckets=4,
                   external_path=str(tmp_path / "r"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "t_bkt_l", "t_bkt_r", on="k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # un-bucketed side is rejected, not silently re-shuffled
        spark.range(5).write.mode("overwrite").option(
            "path", str(tmp_path / "plain")
        ).saveAsTable("t_plain")
        with pytest.raises(ValueError, match="not bucketed"):
            bucketed_join(spark, "t_bkt_l", "t_plain", on="k")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("t_bkt_l", "t_bkt_r", "t_plain"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_session_window_gap_semantics(spark):
    """Spark's session window is INCLUSIVE at the boundary: a gap
    exactly equal to the duration still extends the session; only a
    strictly larger gap splits. Pinned so the DuckDB oracle's
    strict-> condition stays faithful to Spark's."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=29, seconds=59)),  # same session
        (1, t0 + dt.timedelta(minutes=59, seconds=59)),  # still chained
        (1, t0 + dt.timedelta(minutes=89, seconds=59)),  # chained again
        (2, t0),
        (2, t0 + dt.timedelta(minutes=30)),              # boundary => extends
        (2, t0 + dt.timedelta(minutes=60, seconds=1)),   # > gap => splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .collect()
    )
    per_user = {}
    for r in got:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert sorted(per_user[1]) == [4]      # one chained session of 4
    assert sorted(per_user[2]) == [1, 2]   # inclusive boundary, strict split


def test_quantization_error_known_vector(spark):
    """A hand-checkable vector: scale = max|v|/127; worst error bounded
    by scale/2; an all-zero vector quantizes exactly (no NaN)."""
    from cdk_datalake_ingest_upeu_spark.operators.quantization import (
        quantization_report,
    )

    rows = [
        (1, [127.0, -63.5, 0.0, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.n_vecs: r for r in [quantization_report(df, "embedding").collect()[0]]}
    r = got[2]
    assert r.n_vecs == 2
    # scale of v1 = 1.0; zero vector contributes scale 0 and zero error
    assert abs(r.avg_scale - 0.5) < 1e-9
    assert r.worst_abs_err <= 0.5 + 1e-9  # bounded by scale/2
    assert r.avg_rmse == r.avg_rmse  # not NaN


def test_mixture_sample_budget_and_smoothing(spark, sf_dir):
    """Temperature mixing: realized tokens land near the 30% budget,
    and smaller sources keep a HIGHER fraction than larger ones
    (the point of tau < 1)."""
    from cdk_datalake_ingest_upeu_spark.workloads import corpus_mixture_sample, _t

    out = {r.source: r for r in corpus_mixture_sample(spark, sf_dir).collect()}
    docs = _t(spark, sf_dir, "documents")
    total_tokens = (
        docs.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    kept = sum(r.n_tokens for r in out.values())
    assert 0.2 * total_tokens <= kept <= 0.45 * total_tokens
    # every fraction in (0, 1]; if fractions differ, they must not all
    # equal the global rate (smoothing reweights)
    fracs = [r.frac for r in out.values()]
    assert all(0 < f <= 1.0 for f in fracs)


def test_incremental_minhash_dedup(spark):
    """Batch near-dups of HISTORY drop via signature-only verification;
    batch-internal near-dups collapse to min id; novel docs survive."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_table,
        minhash_signature_table,
    )

    hist = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (11, NEAR),                # near-dup of history doc 0 -> dropped
            (13, FAR),                 # novel -> kept
            (15, FAR + " extra tail"), # in-batch near-dup of 13 -> dropped
            (17, "entirely novel text about watermark state and session gaps"),
        ],
        "doc_id long, text string",
    )
    hist_sigs = minhash_signature_table(hist)
    hist_bands = minhash_band_table(hist_sigs)
    out = incremental_minhash_dedup(
        batch, hist_sigs, hist_bands, threshold=0.5
    )
    assert sorted(r.doc_id for r in out.collect()) == [13, 17]
    # re-probing the surviving batch against an index updated with its
    # own signatures drops everything (closure property)
    surv_sigs = minhash_signature_table(out)
    sigs2 = hist_sigs.unionByName(surv_sigs)
    bands2 = hist_bands.unionByName(minhash_band_table(surv_sigs))
    again = incremental_minhash_dedup(batch, sigs2, bands2, threshold=0.5)
    assert again.count() == 0


def test_token_encoding_order_preserving(spark):
    """encode_tokens keeps token ORDER through the explode/join/regroup
    round-trip, ranks vocab by (df desc, token), and maps OOV to 0."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        build_vocab,
        encode_tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "b a b c"),
            (2, "a b rare"),
            (3, "a zz"),
        ],
        "doc_id long, text string",
    )
    vocab = {r.token: r.token_id for r in build_vocab(docs, size=2).collect()}
    # df: a=3, b=2, c=1, rare=1, zz=1 -> top-2 = a(1), b(2)
    assert vocab == {"a": 1, "b": 2}
    enc = {r.doc_id: r.token_ids for r in encode_tokens(docs, build_vocab(docs, size=2)).collect()}
    assert enc[1] == [2, 1, 2, 0]   # b a b c -> order preserved, c -> unk
    assert enc[2] == [1, 2, 0]
    assert enc[3] == [1, 0]


def test_group_split_keeps_dups_together(spark):
    """Fingerprint-keyed split: exact dups (including whitespace/case
    variants) always share a split; id-keyed splits don't guarantee it."""
    from cdk_datalake_ingest_upeu_spark.operators.sampling import group_split
    from cdk_datalake_ingest_upeu_spark.operators.text import fingerprint

    rows = [(i, BASE if i % 3 == 0 else f"unique doc {i}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tagged = group_split(
        docs, fingerprint(F.col("text")), test_fraction=0.3, seed="t"
    )
    dup_splits = {
        r.split for r in tagged.filter(F.col("doc_id") % 3 == 0).collect()
    }
    assert len(dup_splits) == 1  # all 100 copies of BASE in ONE split
    # both splits are populated overall
    assert tagged.select("split").distinct().count() == 2


def test_ann_on_quantized_vectors_keeps_recall(spark):
    """Operational claim behind int8 storage: top-k neighbors computed
    on DEQUANTIZED vectors match full-precision top-k with high recall
    — the error report's numbers translate to retrieval quality."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    emb = emb_df(spark, n=120)

    @pandas_udf("array<float>")
    def roundtrip(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        scale = np.abs(M).max(axis=1) / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)[:, None]
        q = np.floor(M / safe + 0.5)
        return pd.Series(list((q * safe).astype(np.float32)))

    quant = emb.select("vec_id", roundtrip(F.col("embedding")).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(quant, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"int8 round-trip degraded top-k recall to {recall}"


def test_audio_energy_windows_exact(spark):
    """Windowed RMS over known byte payloads: exact values, ceil window
    count, one silent window for an empty payload."""
    import math

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        extract_audio_features,
    )

    rows = [
        (1, bytearray([10] * 4)),          # one window, rms = 10
        (2, bytearray([3] * 4 + [4] * 4)), # two windows at window=4: rms 3, 4
        (3, bytearray(b"")),               # empty -> one silent window
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in extract_audio_features(df, window_bytes=4).collect()
    }
    assert got[1].n_windows == 1 and math.isclose(got[1].energy[0], 10.0)
    assert got[2].n_windows == 2
    assert math.isclose(got[2].energy[0], 3.0) and math.isclose(got[2].energy[1], 4.0)
    assert got[3].n_windows == 1 and got[3].energy == [0.0] and got[3].n_bytes == 0


def test_quantize_dequantize_roundtrip(spark):
    from cdk_datalake_ingest_upeu_spark.operators.quantization import (
        dequantize,
        quantize_vec,
    )

    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5, 127.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = (
        df.select(
            "vec_id",
            "embedding",
            quantize_vec(F.col("embedding")).alias("qe"),
        )
        .select("vec_id", "embedding", "qe.scale", "qe.codes",
                dequantize(F.col("qe")).alias("deq"))
        .orderBy("vec_id")
        .collect()
    )
    r0, r1 = out
    assert all(-127 <= c <= 127 for c in r0.codes)
    assert r0.scale == 1.0  # max|v| = 127
    # reconstruction error bounded by scale/2 per element
    assert all(
        abs(orig - rec) <= r0.scale / 2 + 1e-9
        for orig, rec in zip(r0.embedding, r0.deq)
    )
    # all-zero vector: scale 0, codes 0, exact reconstruction
    assert r1.scale == 0.0 and all(c == 0 for c in r1.codes)
    assert all(v == 0.0 for v in r1.deq)


def test_cosine_null_and_ragged_vectors_yield_null(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import cosine

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], [1.0, 0.0]),
            (1, None, [1.0, 0.0]),
            (2, [1.0, 0.0, 0.0], [1.0, 0.0]),  # ragged pair
        ],
        "i long, a array<double>, b array<double>",
    )
    rows = {r.i: r.c for r in df.select("i", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert rows[0] == pytest.approx(1.0)
    assert rows[1] is None and rows[2] is None


def test_zorder_bounds_errors(spark):
    from cdk_datalake_ingest_upeu_spark.sources.files import zorder_value

    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="no bounds"):
        zorder_value(empty, ["x", "y"])
    strings = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(ValueError, match="non-numeric"):
        zorder_value(strings, ["x", "y"])


def test_exact_quantile_bounds_and_bucket(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        exact_quantile_bounds,
        quantile_bucket,
    )

    # 12 rows over 4 distinct values: quartile targets at ranks 3/6/9
    vals = [0.1] * 3 + [0.2] * 3 + [0.3] * 3 + [0.4] * 3
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, q double")
    bounds, total = exact_quantile_bounds(df, "q", 4)
    assert total == 12
    assert bounds == [0.1, 0.2, 0.3]  # smallest value reaching cum >= 3/6/9
    out = {
        r.q: r.b
        for r in df.select("q", quantile_bucket(F.col("q"), bounds).alias("b"))
        .distinct()
        .collect()
    }
    assert out == {0.1: 0, 0.2: 1, 0.3: 2, 0.4: 3}
    # skewed: one value holds most mass -> it absorbs several quartiles
    skew = spark.createDataFrame(
        [(i, 0.5) for i in range(10)] + [(10, 0.9), (11, 1.0)], "id long, q double"
    )
    b2, t2 = exact_quantile_bounds(skew, "q", 4)
    assert t2 == 12 and b2 == [0.5, 0.5, 0.5]


def test_funnel_plan_has_no_arrays(spark):
    """events_funnel must never buffer per-user timestamp arrays through
    the shuffle (the r3 OOM-row scale killer): window MINs only."""
    from cdk_datalake_ingest_upeu_spark.workloads import events_funnel

    df = events_funnel(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert plan.count("Exchange") <= 2  # user_id window + final global agg


def test_cap_per_group_deterministic_and_capped(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small") for i in range(60)], "id long, g string"
    )
    out = cap_per_group(df, "g", "id", cap=10, seed="t")
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 10, "small": 10}
    # deterministic: same kept set on re-run
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in cap_per_group(df, "g", "id", cap=10, seed="t").collect())
    assert ids1 == ids2
    # different seed -> (almost surely) different draw from the big group
    ids3 = sorted(r.id for r in cap_per_group(df, "g", "id", cap=10, seed="u").collect())
    assert ids1 != ids3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap must be"):
        cap_per_group(df, "g", "id", cap=0)


def test_pca_recovers_planted_low_rank(spark):
    """Rank-2 planted data (plus tiny isotropic noise): the top-2
    eigenvalues dominate, explained-variance ratios sum near 1, the
    projected-variance agrees with the eigenvalues, and the fit is
    deterministic across refits."""
    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.clustering import (
        pca_fit,
        pca_project,
    )

    rng = _np.random.default_rng(11)
    d = 16
    a, b = _np.zeros(d), _np.zeros(d)
    a[0] = 3.0
    b[1] = 1.5
    rows = []
    for i in range(600):
        v = rng.normal() * a + rng.normal() * b + rng.normal(0, 0.01, d)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comps, evals, evr, mean = pca_fit(df, k=4)
    assert evr[0] > evr[1] > evr[2]
    assert float(evr[0] + evr[1]) > 0.99
    # axis recovery: top component aligned with the planted direction
    assert abs(comps[0][0]) > 0.99
    assert abs(comps[1][1]) > 0.99
    # projection variance equals the eigenvalue (same data, same moments)
    from pyspark.sql import functions as F

    proj = pca_project(df, comps, mean)
    pv = proj.agg(
        F.var_samp(F.col("pca")[0]).alias("v0"),
        F.var_samp(F.col("pca")[1]).alias("v1"),
    ).collect()[0]
    assert abs(pv["v0"] - float(evals[0])) / float(evals[0]) < 1e-6
    assert abs(pv["v1"] - float(evals[1])) / float(evals[1]) < 1e-6
    comps2, evals2, _, _ = pca_fit(df, k=4)
    assert _np.allclose(comps, comps2) and _np.allclose(evals, evals2)


def test_semantic_neardup_finds_planted_copies(spark):
    """Planted near-copies (tiny deterministic perturbation) are found
    with exactly their planted partner; far-apart random vectors are
    not paired at threshold 0.99."""
    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        semantic_neardup_pairs,
    )

    rng = _np.random.default_rng(3)
    rows = []
    for i in range(120):
        v = rng.normal(0, 1, 16)
        rows.append((i, [float(x) for x in v]))
        if i < 6:  # plant a barely-perturbed copy
            w = v * (1.0 + 0.001 * ((_np.arange(16) % 5) - 2))
            rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic_neardup_pairs(df, k=4, threshold=0.99, iters=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, 1000 + i) for i in range(6)}
    assert planted <= got
    # nothing else at 0.99 on 16-dim standard normals (cos ~ N(0, 1/16))
    assert got == planted


def test_unigram_logprob_exact_small_corpus(spark):
    """Hand-checked 3-doc corpus: logprobs are ln(count/total) rounded
    to 9 dp at token grain; per-doc mean is the exact decimal sum over
    a single division."""
    import math

    from cdk_datalake_ingest_upeu_spark.operators.text import (
        unigram_logprob_features,
    )

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "b c")],
        "doc_id long, text string",
    )
    # counts: a=3, b=3, c=1, total=7
    got = {r.doc_id: r for r in unigram_logprob_features(df).collect()}
    lp = {t: round(math.log(c / 7), 9) for t, c in {"a": 3, "b": 3, "c": 1}.items()}
    assert got[1].n_tokens == 3
    assert abs(got[1].avg_logprob - (2 * lp["a"] + lp["b"]) / 3) < 1e-12
    assert abs(got[3].avg_logprob - (lp["b"] + lp["c"]) / 2) < 1e-12


def test_bm25_ranks_term_dense_docs_first(spark):
    """A doc saturated with the query term outranks a diluted one; docs
    without any query term never appear; k respected."""
    from cdk_datalake_ingest_upeu_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark row row row row row row row"),
            (3, "row scan table"),
            (4, "join join spark"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(df, ["spark", "join"], k=3).collect()
    assert [r.doc_id for r in got][0] in (1, 4)  # term-dense docs lead
    assert {r.doc_id for r in got} <= {1, 2, 4}
    assert len(got) == 3
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bpe_merge_candidates_weighted_counts(spark):
    """Pair counts are word-frequency weighted: 'aa' appearing in a
    word used 3x counts 3; single-char words are excluded."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [(1, "aab aab aab x"), (2, "ab x y")],
        "doc_id long, text string",
    )
    got = {r.pair: r.freq for r in bpe_merge_candidates(df).collect()}
    # 'aab' x3 contributes aa:3, ab:3; 'ab' x1 contributes ab:1
    assert got["aa"] == 3
    assert got["ab"] == 4
    assert "x" not in got and "y" not in got


def test_expectations_single_pass_and_severity(spark):
    """All rule kinds evaluated correctly in one pass; check_expectations
    raises on error-severity violations, tolerates warn-severity, and
    rejects malformed rule sets."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.expectations import (
        Expectation,
        ExpectationFailure,
        check_expectations,
        expectations_report,
    )

    df = spark.createDataFrame(
        [
            (1, "click", 10.0, "{}"),
            (2, "view", 600.0, "{}"),     # between violation
            (2, "zap", None, "x"),        # dup id, bad type, bad regex
            (None, "click", 5.0, None),   # null id; NULL type/props don't violate
        ],
        "id long, typ string, value double, props string",
    )
    rules = [
        Expectation("id_not_null", "id", "not_null"),
        Expectation("id_unique", "id", "unique"),
        Expectation("typ_ok", "typ", "accepted_values", {"values": ["click", "view"]}),
        Expectation("value_range", "value", "between", {"lo": 0.0, "hi": 500.0}, severity="warn"),
        Expectation("props_shape", "props", "matches_regex", {"pattern": r"^\{"}),
    ]
    got = {r.rule: (r.n_violations, r.passed) for r in expectations_report(df, rules).collect()}
    assert got == {
        "id_not_null": (1, False),
        "id_unique": (1, False),     # 3 non-null ids, 2 distinct
        "typ_ok": (1, False),
        "value_range": (1, False),
        "props_shape": (1, False),
    }
    with _pytest.raises(ExpectationFailure) as ei:
        check_expectations(df, rules)
    failed = dict(ei.value.failures)
    assert "value_range" not in failed  # warn severity never aborts
    assert set(failed) == {"id_not_null", "id_unique", "typ_ok", "props_shape"}

    # clean table + warn-only violation -> returns the report
    ok = check_expectations(
        df.filter("id = 1"),
        [Expectation("v", "value", "between", {"lo": 0.0, "hi": 5.0}, severity="warn")],
    ).collect()
    assert len(ok) == 1 and ok[0].n_violations == 1 and not ok[0].passed

    with _pytest.raises(ValueError):
        expectations_report(df, [])
    with _pytest.raises(ValueError):
        expectations_report(df, [rules[0], rules[0]])
    with _pytest.raises(ValueError):
        expectations_report(df, [Expectation("x", "id", "nope")])


def test_expectations_foreign_key_orphans(spark):
    """FK rule counts orphan keys via anti-join; NULLs are not
    violations; a clean FK passes."""
    from cdk_datalake_ingest_upeu_spark.operators.expectations import (
        Expectation,
        expectations_report,
    )

    fact = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, 99), (5, None)],
        "id long, dim_id long",
    )
    dim = spark.createDataFrame([(10,), (11,), (12,)], "k long")
    got = {
        r.rule: (r.n_violations, r.passed)
        for r in expectations_report(
            fact,
            [
                Expectation("fk", "dim_id", "foreign_key", {"ref": dim, "ref_col": "k"}),
                Expectation("dim_not_null", "dim_id", "not_null", severity="warn"),
            ],
        ).collect()
    }
    assert got == {"fk": (2, False), "dim_not_null": (1, False)}
    clean = expectations_report(
        fact.filter("dim_id < 50"),
        [Expectation("fk", "dim_id", "foreign_key", {"ref": dim, "ref_col": "k"})],
    ).collect()
    assert clean[0].n_violations == 0 and clean[0].passed


def test_stream_quarantine_routing(spark, tmp_path):
    """Rows violating any per-row rule land in quarantine tagged with
    the failed rule names (in rule order); clean rows in good; nothing
    lost; table-grain rules are rejected up front."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.expectations import (
        Expectation,
    )
    from cdk_datalake_ingest_upeu_spark.streaming.incremental import (
        stream_quarantine_ingest,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", 10.0),
            (2, "bad", 10.0),      # rule 1
            (3, "ok", 999.0),      # rule 2
            (4, "bad", 999.0),     # both
            (5, None, None),       # NULLs violate nothing here
        ],
        "id long, typ string, value double",
    )
    src = str(tmp_path / "in")
    df.write.parquet(src)
    rules = [
        Expectation("typ_ok", "typ", "accepted_values", {"values": ["ok"]}),
        Expectation("val_ok", "value", "between", {"lo": 0.0, "hi": 100.0}),
    ]
    q = stream_quarantine_ingest(
        spark, src, df.schema, rules,
        good_dir=str(tmp_path / "good"),
        quarantine_dir=str(tmp_path / "bad"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="quarantine_test",
    )
    q.processAllAvailable()
    q.stop()
    good = {r.id for r in spark.read.parquet(str(tmp_path / "good")).collect()}
    bad = {
        r.id: r.failed_rules
        for r in spark.read.parquet(str(tmp_path / "bad")).collect()
    }
    assert good == {1, 5}
    assert bad == {2: "typ_ok", 3: "val_ok", 4: "typ_ok,val_ok"}

    with _pytest.raises(ValueError):
        stream_quarantine_ingest(
            spark, src, df.schema,
            [Expectation("u", "id", "unique")],
            good_dir=str(tmp_path / "g2"),
            quarantine_dir=str(tmp_path / "b2"),
            checkpoint_dir=str(tmp_path / "c2"),
        )


def test_bpe_train_and_encode_classic_corpus(spark):
    """The low/lower/lowest corpus: merges follow greedy pair frequency
    with deterministic tie-breaks, training stops when no pair repeats,
    and encoding applies merges in rank order per distinct word."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        bpe_encode,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lowest")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, num_merges=10)
    # (l,o) x5 -> (lo,w) x5 -> (low,e) x2, then every pair is unique
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e")]
    got = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    assert got[1].bpe_tokens == ["low", "low", "low"]
    assert got[2].bpe_tokens == ["lowe", "r", "lowe", "s", "t"]
    assert got[2].n_bpe_tokens == 5


def test_pca_null_and_ragged_guards(spark):
    """NULL vectors are skipped (not a stack crash); ragged lengths and
    all-NULL inputs raise clear errors."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.clustering import pca_fit

    good = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    comps, evals, evr, mean = pca_fit(good, k=2)
    assert len(evals) == 2  # fit succeeded on the 3 non-NULL rows

    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="no non-NULL"):
        pca_fit(allnull, k=2)

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    with _pytest.raises(Exception, match="ragged"):
        pca_fit(ragged, k=2)


def test_additive_merge_semantics(spark):
    """Counts/sums add, mins/maxes fold, unseen groups insert from
    either side, first load passes through, and schema drift or a
    non-reaggregatable column raises."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.rollup import (
        additive_merge,
        rollup_partial,
    )

    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 2.0), ("c", 7.0)], "k string, v double"
    )
    kw = dict(
        sum_cols={"v": "CAST(v AS DECIMAL(10,2))"},
        min_cols={"v": "v"},
        max_cols={"v": "v"},
    )
    p1 = rollup_partial(b1, ["k"], **kw)
    assert additive_merge(None, p1, ["k"]) is p1  # first load
    merged = additive_merge(p1, rollup_partial(b2, ["k"], **kw), ["k"])
    got = {r.k: r for r in merged.collect()}
    assert got["a"].n_rows == 3 and float(got["a"].sum_v) == 6.0
    assert got["a"].min_v == 1.0 and got["a"].max_v == 3.0  # 2.0 inside range
    assert got["b"].n_rows == 1  # only in stored side
    assert got["c"].n_rows == 1 and float(got["c"].sum_v) == 7.0  # new group
    # merging equals one-shot aggregation over the union
    oneshot = {
        r.k: r for r in rollup_partial(b1.unionAll(b2), ["k"], **kw).collect()
    }
    for k in ("a", "b", "c"):
        assert got[k].n_rows == oneshot[k].n_rows
        assert got[k].sum_v == oneshot[k].sum_v
        assert got[k].min_v == oneshot[k].min_v
        assert got[k].max_v == oneshot[k].max_v

    with _pytest.raises(ValueError, match="drift"):
        additive_merge(p1.drop("min_v"), p1, ["k"])
    bad = p1.withColumnRenamed("sum_v", "avg_v")
    with _pytest.raises(ValueError, match="re-aggregatable"):
        additive_merge(bad, bad, ["k"])


def test_stream_rollup_double_buffer(spark, tmp_path):
    """Streaming rollup maintenance: multiple micro-batches merge to
    the same state as a one-shot aggregate; the LATEST marker points at
    a complete generation; empty batches don't corrupt the buffer."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.rollup import rollup_partial
    from cdk_datalake_ingest_upeu_spark.streaming.incremental import (
        stream_rollup_maintenance,
        stream_rollup_maintenance_reader,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0), ("c", 5.0)],
        "k string, v double",
    )
    src = str(tmp_path / "in")
    df.repartition(3).write.parquet(src)

    def partial_fn(batch):
        return rollup_partial(
            batch, ["k"], sum_cols={"v": "CAST(v AS DECIMAL(10,2))"},
            min_cols={"v": "v"}, max_cols={"v": "v"},
        )

    rollup_dir = str(tmp_path / "rollup")
    q = stream_rollup_maintenance(
        spark, src, df.schema, keys=["k"], rollup_dir=rollup_dir,
        checkpoint_dir=str(tmp_path / "ckpt"), partial_fn=partial_fn,
        max_files_per_trigger=1, query_name="rollup_test",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.k: r
        for r in spark.read.parquet(
            stream_rollup_maintenance_reader(rollup_dir)
        ).collect()
    }
    assert got["a"].n_rows == 3 and float(got["a"].sum_v) == 7.0
    assert got["a"].min_v == 1.0 and got["a"].max_v == 4.0
    assert got["b"].n_rows == 1 and got["c"].n_rows == 1


def test_ivf_stored_index_probe_recall_and_pruning(spark, tmp_path):
    """A stored IVF index probed from disk: recall vs brute force stays
    above the floor, results equal the one-shot cosine_topk_ivf, and
    the probe's index scan carries partition filters (the pruned-cells
    read is the point of storing the inverted file)."""
    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        ivf_index_build,
        ivf_index_probe,
    )

    rng = _np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(800)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id < 5").select(
        corpus.vec_id.alias("query_id"), corpus.embedding.alias("query_vec")
    )
    C, index = ivf_index_build(corpus, n_clusters=8, sample_size=800)
    path = str(tmp_path / "ivf")
    index.write.partitionBy("cluster_id").parquet(path)
    stored = spark.read.parquet(path)

    probed = ivf_index_probe(stored, C, queries, k=5, n_probe=3)
    oneshot = cosine_topk_ivf(
        corpus, queries, k=5, n_clusters=8, n_probe=3, sample_size=800
    )
    a = {(r.query_id, r.rank): r.neighbor_id for r in probed.collect()}
    b = {(r.query_id, r.rank): r.neighbor_id for r in oneshot.collect()}
    assert a == b  # stored-index probe == one-shot composition

    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_bruteforce(corpus, queries, k=5).collect()
    }
    hits = sum(1 for key, nid in a.items() if exact.get(key[0:1] + (key[1],)) == nid or nid in
               {v for kk, v in exact.items() if kk[0] == key[0]})
    assert hits / len(a) >= 0.6  # recall floor at n_probe=3/8 cells

    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cluster_id" in plan.split(
        "PartitionFilters"
    )[1][:200], "probe scan is not partition-pruned on cluster_id"


def test_ivf_index_append_steady_state(spark, tmp_path):
    """Steady-state IVF maintenance: a new batch appends through the
    STORED centroids without retraining. Pins (a) appended vectors are
    retrievable from the updated index (self-retrieval at rank 1 with
    n_probe=1 — the appended row landed in its own nearest cell), (b)
    the history parquet files are untouched (append adds files, never
    rewrites), (c) append assignment matches what the builder's own
    assignment rule gives for identical vectors."""
    import os as _os

    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_probe,
    )

    rng = _np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(600)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    history = corpus.filter("vec_id < 500")
    batch = corpus.filter("vec_id >= 500")
    C, index = ivf_index_build(history, n_clusters=8, sample_size=600)
    path = str(tmp_path / "ivf")
    index.write.partitionBy("cluster_id").parquet(path)
    before = {
        _os.path.join(dp, f)
        for dp, _, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }

    appended = ivf_index_append(C, batch)
    appended.write.mode("append").partitionBy("cluster_id").parquet(path)
    after = {
        _os.path.join(dp, f)
        for dp, _, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }
    assert before < after  # append only: every history file survives

    stored = spark.read.parquet(path)
    assert stored.count() == corpus.count()

    # a duplicated vector must land in the same cell as its history twin
    dup = history.filter("vec_id = 7").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    twin_cell = ivf_index_append(C, dup).collect()[0].cluster_id
    history_cell = {
        r.cluster_id for r in stored.filter("vec_id = 7").collect()
    }
    assert twin_cell in history_cell

    # appended vectors are findable: self-retrieval at rank 1, n_probe=1
    queries = batch.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    probed = ivf_index_probe(stored, C, queries, k=1, n_probe=1)
    for r in probed.collect():
        assert r.neighbor_id == r.query_id and r.rank == 1


def test_gopher_quality_flags_rules(spark):
    """Each published Gopher rule trips on a doc built to violate
    exactly that rule, and a well-formed doc passes all of them."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        gopher_quality_flags,
    )

    good = (
        "the quick brown fox and the lazy dog have agreed to meet with "
        "all of their friends so that everyone can be happy together "
    ) * 3  # 66 words, mean len ~4, all alpha, stopwords present
    rows = [
        (0, good),
        (1, "short doc with the and of to be that have with words"),  # < 50 words
        (2, " ".join(["aa"] * 60)),  # mean word len < 3, no stopwords
        (3, good + " " + " ".join(["#"] * 20)),  # symbol ratio > 0.1
        (4, ""),  # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[0].gopher_keep
    assert not got[1].pass_word_count and not got[1].gopher_keep
    assert not got[2].pass_mean_word_len and not got[2].pass_stopwords
    assert not got[3].pass_symbol_ratio
    assert got[4].n_words == 0 and not got[4].gopher_keep


def test_c4_clean_lines_rules(spark):
    """C4 line filter: terminal punctuation AND >= 3 words keeps a
    line; page kept needs enough surviving lines and no banned
    substring."""
    from cdk_datalake_ingest_upeu_spark.operators.text import c4_clean_lines

    page = "\n".join(
        [
            "this line ends with a period.",
            "so does this other line here.",
            "and a third good sentence too!",
            "no terminal punctuation on this line",
            "too short.",
        ]
    )
    rows = [
        (0, page),
        (1, page + "\nlorem ipsum dolor."),
        (2, "single unpunctuated line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_clean_lines(df, min_kept_lines=3).collect()}
    assert got[0].n_lines == 5 and got[0].n_kept_lines == 3 and got[0].c4_keep
    assert got[0].text_clean.count("\n") == 2
    assert not got[1].c4_keep  # banned substring kills the page
    assert got[2].n_kept_lines == 0 and not got[2].c4_keep


def test_ivf_rebalance_splits_only_hot_cells(spark, tmp_path):
    """IVF maintenance after drift: only cells over the overload factor
    are split; cold cells' parquet files AND assignments survive the
    dynamic-partition-overwrite untouched; reassigned rows stay within
    their old cell's sub-centroids; the max cell fraction drops; a
    balanced index is a no-op (reassigned is None)."""
    import os as _os

    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_rebalance,
    )

    rng = _np.random.default_rng(23)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(600)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C, index = ivf_index_build(corpus, n_clusters=8, sample_size=600)
    path = str(tmp_path / "ivf")
    index.repartition("cluster_id").write.partitionBy("cluster_id").parquet(
        path
    )
    stored = spark.read.parquet(path)
    counts = {
        r.cluster_id: r.n
        for r in stored.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    hot = max(sorted(counts), key=lambda c: counts[c])
    # drift: pile 3 more copies of the hot cell's members into it
    members = stored.filter(F.col("cluster_id") == hot).select(
        "vec_id", "embedding"
    )
    for bump in (10_000, 20_000, 30_000):
        batch = members.select(
            (F.col("vec_id") + bump).alias("vec_id"), "embedding"
        )
        ivf_index_append(C, batch).repartition("cluster_id").write.mode(
            "append"
        ).partitionBy("cluster_id").parquet(path)
    drifted = spark.read.parquet(path)
    n_total = drifted.count()
    cold_assign = {
        r.vec_id: r.cluster_id
        for r in drifted.filter(F.col("cluster_id") != hot).collect()
    }
    newC, reassigned, report = ivf_rebalance(
        drifted, C, overload_factor=2.0, split_k=2, sample_size=512
    )
    assert report["cells_split"] >= 1 and hot in report["cells"]
    assert report["rows_reassigned"] == sum(
        n for c, n in {
            r.cluster_id: r.n
            for r in drifted.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }.items() if c in report["cells"]
    )
    assert (
        report["max_cell_fraction_after"]
        < report["max_cell_fraction_before"]
    )
    # reassignment stays within each split cell's own sub-ids
    reassigned = reassigned.localCheckpoint()
    split_ids = set(report["cells"]) | set(range(8, len(newC)))
    got_cells = {
        r.cluster_id for r in reassigned.select("cluster_id").distinct().collect()
    }
    assert got_cells <= split_ids
    cold_before = {
        _os.path.join(dp, f)
        for dp, _, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet") and f"cluster_id={hot}" not in dp
        and not any(f"cluster_id={c}" in dp for c in report["cells"])
    }
    reassigned.repartition("cluster_id").write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(path)
    cold_after = {
        _os.path.join(dp, f)
        for dp, _, fs in _os.walk(path)
        for f in fs
        if f.endswith(".parquet")
        and not any(f"cluster_id={c}" in dp for c in split_ids)
    }
    assert cold_before == cold_after  # cold partitions never rewritten
    rebal = spark.read.parquet(path)
    assert rebal.count() == n_total  # no rows lost or duplicated
    got_cold = {
        r.vec_id: r.cluster_id
        for r in rebal.filter(~F.col("cluster_id").isin(sorted(split_ids)))
        .collect()
    }
    assert got_cold == {
        k: v for k, v in cold_assign.items() if v not in report["cells"]
    }
    # a balanced index: nothing to split, no rewrite handed back
    C2, re2, rep2 = ivf_rebalance(rebal, newC, overload_factor=10.0)
    assert re2 is None and rep2["cells_split"] == 0
    assert (C2 == newC).all()


def test_substring_span_dedup_removes_shared_spans(spark):
    """A >= window-length span shared by two docs is removed from BOTH
    (occurrence count >= 2 corpus-wide), a within-doc repeat is caught,
    unique text survives verbatim, and short/empty docs pass through."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        substring_span_dedup,
    )

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    rows = [
        (0, shared + " tail unique to zero"),
        (1, "head only in one " + shared),
        (2, shared + " middle words " + shared),  # within-doc repeat
        (3, "completely unique text with no repeated spans anywhere at all"),
        (4, "tiny"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r for r in substring_span_dedup(df, window_tokens=8).collect()
    }
    assert 5 not in got  # empty doc has no tokens
    assert got[0].n_tokens_removed == 8 and got[0].text_dedup == "tail unique to zero"
    assert got[1].n_tokens_removed == 8 and got[1].text_dedup == "head only in one"
    assert got[2].n_tokens_removed > 8  # both copies of the span removed
    assert got[3].n_tokens_removed == 0
    assert got[3].text_dedup == rows[3][1]
    assert got[4].n_tokens_removed == 0 and got[4].text_dedup == "tiny"


def test_substring_span_dedup_incremental_vs_index(spark, tmp_path):
    """Incremental mode: a batch span present in the stored history
    index is removed (the history copy stays — landed shards are
    immutable), a batch-internal repeat is removed, and fresh batch
    text survives untouched; history docs never appear in the output."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        substring_span_dedup,
        substring_span_index,
    )

    shared = "one two three four five six seven eight"
    hist = spark.createDataFrame(
        [(0, shared + " landed history tail")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "spanidx")
    substring_span_index(hist, window_tokens=8).write.parquet(path)
    stored = spark.read.parquet(path)

    batch = spark.createDataFrame(
        [
            (10, shared + " fresh suffix"),  # span hits the index
            (11, "brand new words that never appeared before anywhere at all"),
            (12, shared + " gap tokens " + shared),  # batch-internal repeat
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in substring_span_dedup(
            batch, window_tokens=8, seen=stored
        ).collect()
    }
    assert set(got) == {10, 11, 12}
    assert got[10].n_tokens_removed == 8 and got[10].text_dedup == "fresh suffix"
    assert got[11].n_tokens_removed == 0
    assert got[12].n_tokens_removed > 8


def test_substring_span_dedup_pathological_doc(spark):
    """One 50k-token document that is ~90% duplicated spans — the exact
    shape span dedup targets. The r6 row-local cover filter
    (``filter(__tk, (t, i) -> array_contains(__cov, i+1))``) was
    O(n_tokens x n_covered) per document: ~2.3e9 comparisons inside ONE
    row evaluation here. The linear (id, pos) anti-join form must chew
    through it in seconds, and a fully-covered sibling document must
    still appear in the output (the left-join marker, not an anti-join
    on doc rows)."""
    import time

    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        substring_span_dedup,
    )

    # 45k tokens of an 8-token phrase repeated (every window duplicated)
    # + 5k unique-token tail: ~90% of positions covered
    phrase = "alpha bravo charlie delta echo foxtrot golf hotel "
    big = phrase * (45_000 // 8) + " ".join(f"u{i}" for i in range(5_000))
    rows = [
        (0, big),
        (1, phrase * 4),  # fully covered: every token in a dup span
        (2, "entirely novel words " + " ".join(f"v{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.monotonic()
    got = {
        r.doc_id: r for r in substring_span_dedup(df, window_tokens=8).collect()
    }
    elapsed = time.monotonic() - t0
    assert set(got) == {0, 1, 2}
    assert got[0].n_tokens == 50_000 and got[0].n_tokens_removed == 45_000
    assert got[0].text_dedup == " ".join(f"u{i}" for i in range(5_000))
    assert got[1].n_tokens_removed == got[1].n_tokens  # fully covered
    assert got[1].text_dedup == ""
    assert got[2].n_tokens_removed == 0
    # generous wall bound: the quadratic form needs minutes here, the
    # linear form single-digit seconds even on a cold loaded VM
    assert elapsed < 60, f"span dedup took {elapsed:.1f}s on 50k tokens"


def test_c4_clean_lines_banned_brace(spark):
    """The C4 page-level curly-brace rule (code/markup indicator) kills
    a page whose lines all pass the line filters."""
    from cdk_datalake_ingest_upeu_spark.operators.text import c4_clean_lines

    page = "\n".join(["a perfectly fine prose sentence here."] * 4)
    df = spark.createDataFrame(
        [(0, page), (1, page + "\nvar x = {1};")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in c4_clean_lines(df, min_kept_lines=3).collect()}
    assert got[0].c4_keep
    assert not got[1].c4_keep


def test_substring_span_dedup_disjoint_corpus_untouched(spark):
    """A corpus with no repeated window anywhere passes through
    verbatim — n_tokens_removed == 0 and text_dedup == text for every
    doc (the operator must never mangle unique content)."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        substring_span_dedup,
    )

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_span_dedup(df, window_tokens=8).collect()
    assert len(out) == 40
    texts = dict(rows)
    for r in out:
        assert r.n_tokens_removed == 0
        assert r.text_dedup == texts[r.doc_id]


def test_semdedup_keeps_low_density_representative(spark):
    """SemDeDup resolves each semantic-duplicate group to ONE survivor
    and the survivor is the member FARTHEST from its centroid (the
    paper's low-density choice): planted near-identical pairs where one
    member is nudged toward the cluster mean must keep the outlying
    twin."""
    import numpy as _np

    from cdk_datalake_ingest_upeu_spark.operators.dedup import semdedup

    rng = _np.random.default_rng(9)
    rows = []
    for i in range(120):
        v = rng.normal(0, 1, 16)
        v /= _np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    # three planted pairs: the twin (id+1000) is the SAME direction with
    # a tiny rotation AWAY from everything — noise makes it the farther
    # member only by chance, so instead plant asymmetry explicitly:
    # member A = 0.9*v + 0.1*mean-ish pull (closer to centroid),
    # member B = v (farther). Keep policy must choose B.
    mean = _np.mean(
        _np.stack([_np.array(r[1]) for r in rows]), axis=0
    )
    planted = []
    for j in range(3):
        v = _np.array(rows[j][1])
        a = 0.97 * v + 0.03 * mean
        a /= _np.linalg.norm(a)
        planted.append((2000 + j, [float(x) for x in a]))
    rows = [r for r in rows if r[0] > 2] + planted + [
        (3000 + j, rows[j][1]) for j in range(3)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept, pairs = semdedup(df, k=4, threshold=0.99, iters=3)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got_pairs == {(2000 + j, 3000 + j) for j in range(3)}
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    for j in range(3):
        # exactly one survivor per pair, and it is the farther-out twin
        assert (2000 + j in kept_ids) != (3000 + j in kept_ids)
        assert 3000 + j in kept_ids, "pulled-toward-centroid twin survived"


def test_semdedup_pair_work_guard(spark):
    """The n^2/k cost bound rests on a balanced clustering; a
    degenerate fit (here: every embedding the same direction -> one
    giant cluster) must ERROR before the pair join runs, not silently
    reinstate corpus-level all-pairs. A balanced corpus with the same
    factor passes."""
    import numpy as _np

    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.dedup import semdedup

    # degenerate: 200 copies of one direction (tiny scale jitter keeps
    # vectors distinct but cosine-identical -> a single cluster)
    same = [(i, [1.0 + 1e-9 * i, 0.0, 0.0, 0.0]) for i in range(200)]
    df_bad = spark.createDataFrame(same, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="pair-work bound violated"):
        semdedup(df_bad, k=8, threshold=0.99, iters=2, max_pair_work_factor=4.0)

    # balanced: random directions spread across clusters
    rng = _np.random.default_rng(3)
    rows = []
    for i in range(200):
        v = rng.normal(0, 1, 16)
        v /= _np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df_ok = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept, _pairs = semdedup(
        df_ok, k=8, threshold=0.99, iters=2, max_pair_work_factor=4.0
    )
    assert kept.count() == 200  # no dups planted; guard stayed quiet


def test_stream_rollup_epoch_replay_is_noop(spark, tmp_path):
    """Re-delivering an already-applied epoch (the at-least-once retry
    where the failure fell after the marker promote) must not
    double-count: the handler skips epochs <= the marker's applied id."""
    from cdk_datalake_ingest_upeu_spark.operators.rollup import rollup_partial
    from cdk_datalake_ingest_upeu_spark.streaming.incremental import (
        stream_rollup_maintenance,
        stream_rollup_maintenance_reader,
    )

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    src = str(tmp_path / "in")
    df.write.parquet(src)

    def partial_fn(batch):
        return rollup_partial(batch, ["k"], sum_cols={"v": "CAST(v AS DECIMAL(10,2))"})

    rollup_dir = str(tmp_path / "rollup")
    q = stream_rollup_maintenance(
        spark, src, df.schema, keys=["k"], rollup_dir=rollup_dir,
        checkpoint_dir=str(tmp_path / "ckpt"), partial_fn=partial_fn,
        query_name="rollup_replay_test",
    )
    q.processAllAvailable()
    q.stop()
    # restart against the SAME checkpoint and source: no new files, and
    # any re-delivered epoch must be skipped by the applied-id guard
    q2 = stream_rollup_maintenance(
        spark, src, df.schema, keys=["k"], rollup_dir=rollup_dir,
        checkpoint_dir=str(tmp_path / "ckpt"), partial_fn=partial_fn,
        query_name="rollup_replay_test2",
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(stream_rollup_maintenance_reader(rollup_dir)).collect()
    assert len(got) == 1 and got[0].n_rows == 2 and float(got[0].sum_v) == 3.0


def test_weighted_hash_sample_bias_and_determinism(spark):
    """Heavily-weighted rows are selected far more often (A-ES bias),
    the draw is deterministic for a fixed seed, and n/validation guards
    hold."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        weighted_hash_sample,
    )

    # 20 heavy rows (w=50) among 480 light rows (w=1)
    df = spark.createDataFrame(
        [(i, 50.0 if i < 20 else 1.0) for i in range(500)],
        "id long, w double",
    )
    picked = {
        r.id for r in weighted_hash_sample(df, "id", F.col("w"), 50).collect()
    }
    assert len(picked) == 50
    heavy_hits = sum(1 for i in picked if i < 20)
    # E[heavy] ~ 17/20 under A-ES here; uniform sampling would give 2.
    assert heavy_hits >= 10
    again = {
        r.id for r in weighted_hash_sample(df, "id", F.col("w"), 50).collect()
    }
    assert picked == again  # deterministic
    other = {
        r.id
        for r in weighted_hash_sample(df, "id", F.col("w"), 50, seed="x").collect()
    }
    assert other != picked  # seed actually varies the draw
    with _pytest.raises(ValueError):
        weighted_hash_sample(df, "id", F.col("w"), 0)


def test_edit_distance_pairs_blocking_is_complete(spark):
    """Deletion blocking finds EVERY pair at distance <= 1 (substitute /
    insert / delete), rejects distance-2 pairs that share a deletion
    variant, and caps pathological long tokens."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "cat bat"),        # substitution
            (2, "cart cat"),       # insertion
            (3, "ca cat"),         # deletion
            (4, "ab ba"),          # distance 2 but shares variants
            (5, "x" * 30 + " " + "x" * 29),  # over max_len: excluded
            (6, "unrelated words"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.word_a, r.word_b): r.dist
        for r in edit_distance_pairs(df, max_len=24).collect()
    }
    assert got[("bat", "cat")] == 1
    assert got[("cart", "cat")] == 1
    assert got[("ca", "cat")] == 1
    assert ("ab", "ba") not in got          # distance 2 rejected
    assert all("x" * 29 not in p for pair in got for p in pair)  # capped


def test_resize_images_nearest_neighbor_exact(spark):
    """The stub resample is exact nearest-neighbor on the byte grid:
    identity at same size, correct corner selection when downscaling,
    block expansion when upscaling; empty payloads produce zeroed
    output; metadata dims are honored when present."""
    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        resize_images,
    )

    rows = [
        (1, bytes([1, 2, 3, 4]), 2, 2),   # 2x2 image
        (2, b"", None, None),              # empty
        (3, bytes(range(16)), 4, 4),       # 4x4 image
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, w int, h int"
    )
    got = {
        r.doc_id: r
        for r in resize_images(
            df, 2, 2, width_col="w", height_col="h"
        ).collect()
    }
    assert bytes(got[1].payload) == bytes([1, 2, 3, 4])  # identity
    assert bytes(got[2].payload) == bytes(4) and got[2].n_bytes_in == 0
    # 4x4 -> 2x2 nearest-neighbor picks (0,0),(0,2),(2,0),(2,2)
    assert bytes(got[3].payload) == bytes([0, 2, 8, 10])
    assert all(r.width == 2 and r.height == 2 and r.n_bytes_out == 4
               for r in got.values())


def test_paragraph_dedup_first_occurrence_wins(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import paragraph_dedup

    w1 = " ".join(f"a{i}" for i in range(20))   # window shared by docs 1 and 2
    w2 = " ".join(f"b{i}" for i in range(20))
    w3 = " ".join(f"c{i}" for i in range(20))
    rows = [
        (1, f"{w1} {w2}"),          # both windows first occurrences
        (2, f"{w1} {w3}"),          # w1 already seen in doc 1 -> dropped
        (3, f"{w3} {w3}"),          # intra-doc repeat AND seen in doc 2
        (4, "short tail"),          # sub-window doc: one 2-token unit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, "doc_id", "text", window_tokens=20).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_dedup"] == f"{w1} {w2}"
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_dedup"] == w3          # w1 deduped away
    assert out[3]["n_chunks"] == 2 and out[3]["n_kept"] == 0
    assert out[3]["text_dedup"] == ""          # everything seen earlier
    assert out[4]["n_chunks"] == 1 and out[4]["n_kept"] == 1


def test_paragraph_dedup_incremental_index_wins(spark):
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        paragraph_chunks,
        paragraph_dedup,
    )

    w1 = " ".join(f"a{i}" for i in range(20))
    w2 = " ".join(f"b{i}" for i in range(20))
    history = spark.createDataFrame([(1, w1)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, f"{w1} {w2}"), (11, w2)], "doc_id long, text string"
    )
    idx = paragraph_chunks(history).select("chunk")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(batch, seen=idx, window_tokens=20).collect()
    }
    # w1 is in the index -> dropped from doc 10; w2 first occurs in doc 10
    assert out[10]["n_kept"] == 1 and out[10]["text_dedup"] == w2
    assert out[11]["n_kept"] == 0 and out[11]["text_dedup"] == ""


def test_connected_components_string_labels(spark):
    """Non-numeric node ids: the decimal checksum convergence test would
    NULL out (NULL == NULL on round one -> silent split components);
    string labels must take the join-based changed-count path and still
    settle chains exactly."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert {k for k, v in got.items() if v == "b"} == {"b", "c", "d", "e"}
    assert {k for k, v in got.items() if v == "x"} == {"x", "y"}


def test_bigram_token_logprobs_hand_check(spark):
    """Add-k bigram LM on a 2-doc corpus: lp(w1,w2) = ln((c12+k)/(c1+kV))
    with c1 counting w1 as bigram HEAD and V the distinct-tail vocab."""
    import math
    from decimal import Decimal

    from cdk_datalake_ingest_upeu_spark.operators.text import (
        bigram_token_logprobs,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = bigram_token_logprobs(docs, k=0.5).collect()
    # bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,b) (b,c); doc3 none
    assert len(rows) == 5
    assert not any(r.doc_id == 3 for r in rows)
    # counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; heads: a->3, b->2; V = tails {a,b,c} = 3
    exp_ab = round(Decimal(repr(math.log((3 + 0.5) / (3 + 0.5 * 3)))), 9)
    got_ab = {str(r.lp) for r in rows if r.w1 == "a" and r.w2 == "b"}
    assert got_ab == {str(exp_ab)}
    exp_ba = round(Decimal(repr(math.log((1 + 0.5) / (2 + 0.5 * 3)))), 9)
    got_ba = {str(r.lp) for r in rows if r.w1 == "b" and r.w2 == "a"}
    assert got_ba == {str(exp_ba)}


def test_bigram_group_logprob_equals_stream_mean(spark):
    """The (group, w1, w2, cnt)-grain rollup must equal the bigram-stream
    mean bit-for-bit: sum(lp*cnt) rides exact decimal (a long cnt would
    overflow precision 38 and silently drop the 9th lp digit)."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        bigram_group_logprob,
        bigram_token_logprobs,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "a", "w x y z w x y z"),
            (2, "a", "w x q"),
            (3, "b", "y z y z y z"),
            (4, "b", "lone"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.n_bigrams, r.avg_logprob)
        for r in bigram_group_logprob(docs, "source").collect()
    }
    stream = (
        bigram_token_logprobs(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("m"),
        )
    )
    want = {r.source: (r.n, r.m) for r in stream.collect()}
    assert got == want
    assert set(got) == {"a", "b"}  # doc 4 has <2 tokens -> contributes nothing


def test_exact_dedup_keep_order_picks_best(spark):
    """keep_order canonical selection: the longest copy survives, not
    the lowest id; default stays min-id."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [
            (1, "hello  world"),     # normalizes equal to 2/3
            (2, "HELLO WORLD  "),
            (3, "hello world and more padding"),  # different content
            (4, "hello   WORLD extra"),           # different content
        ],
        "doc_id long, text string",
    )
    default = {r.doc_id for r in exact_dedup(docs).collect()}
    assert default == {1, 3, 4}
    best = {
        r.doc_id
        for r in exact_dedup(
            docs, keep_order=[F.length("text").desc(), F.col("doc_id").asc()]
        ).collect()
    }
    assert best == {2, 3, 4}  # "HELLO WORLD  " (13 chars) beats "hello  world" (12)


def test_forget_exact_content_propagates_to_duplicates(spark):
    """Forgetting doc 1 must also forget doc 5 (same normalized text) and
    leave everything else; the forgotten-id set drives index purges."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        forget_exact_content,
    )

    docs = spark.createDataFrame(
        [
            (1, "remove me  please"),
            (2, "keep me"),
            (5, "REMOVE ME please"),   # exact dup of 1 after normalization
            (7, "also kept"),
        ],
        "doc_id long, text string",
    )
    req = spark.createDataFrame([(1,)], "doc_id long")
    kept, forgotten = forget_exact_content(docs, req)
    assert {r.doc_id for r in forgotten.collect()} == {1, 5}
    assert {r.doc_id for r in kept.collect()} == {2, 7}
    assert kept.columns == docs.columns  # helper column stripped


def test_boilerplate_strip_drops_all_occurrences(spark):
    """A unit over the per-group frequency floor vanishes from EVERY doc
    (unlike paragraph_dedup, which keeps the first); rare units stay."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        boilerplate_strip,
    )

    boiler = "cookie notice applies here"
    docs = spark.createDataFrame(
        [
            (1, "s", f"{boiler} unique one"),
            (2, "s", f"{boiler} unique two"),
            (3, "s", f"{boiler} unique three"),
            (4, "s", "entirely original text"),
            (5, "t", f"{boiler} other group"),  # below floor in group t
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in boilerplate_strip(
            docs, window_tokens=4, min_docs=2, max_doc_frac=0.05
        ).collect()
    }
    # group s: the 4-token boiler unit appears in 3 of 4 docs -> dropped everywhere
    for d in (1, 2, 3):
        assert out[d].n_kept == out[d].n_chunks - 1
        assert boiler not in out[d].text_clean
    assert out[4].text_clean == "entirely original text"
    # group t: 1 occurrence < min_docs -> kept
    assert boiler in out[5].text_clean


def test_boilerplate_index_merge_equals_from_scratch(spark):
    """Additive index merge over disjoint batches must reproduce the
    from-scratch corpus index exactly (the steady-state contract)."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        boilerplate_index,
        merge_boilerplate_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "s", "shared cookie banner text plus one"),
            (2, "s", "shared cookie banner text plus two"),
            (3, "t", "unrelated prose lives here today"),
            (4, "s", "another doc entirely"),
        ],
        "doc_id long, source string, text string",
    )
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    mf, mg = merge_boilerplate_index(
        *boilerplate_index(a, window_tokens=5),
        *boilerplate_index(b, window_tokens=5),
    )
    ff, fg = boilerplate_index(docs, window_tokens=5)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(mf.collect()) == key(ff.collect())
    assert key(mg.collect()) == key(fg.collect())


def test_forget_exact_content_partitions_and_closure(spark):
    """On a collision-heavy random (seeded) corpus: kept/forgotten
    PARTITION the ids, and the forgotten set is exactly the closure of
    the request under content equality."""
    import random

    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        forget_exact_content,
    )

    rng = random.Random(7)
    texts = [f"text number {rng.randint(0, 30)}" for _ in range(120)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    req_ids = [0, 5, 17]
    req = spark.createDataFrame([(i,) for i in req_ids], "doc_id long")
    kept, forgotten = forget_exact_content(docs, req)
    kept_ids = {r.doc_id for r in kept.collect()}
    forg_ids = {r.doc_id for r in forgotten.collect()}
    assert kept_ids | forg_ids == set(range(120))
    assert not (kept_ids & forg_ids)
    del_texts = {texts[i] for i in req_ids}
    assert forg_ids == {i for i, t in enumerate(texts) if t in del_texts}


def test_rrf_fuse_single_list_membership(spark):
    """RRF fusion: a doc retrieved by only one list still fuses (other
    rank reported as 0 with zero contribution), shared docs outrank
    single-list docs at comparable ranks, and k cuts the fused list."""
    from cdk_datalake_ingest_upeu_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank long"
    )
    got = {r.doc_id: r for r in rrf_fuse([lex, sem], k=10).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2].rank_0 == 2 and got[2].rank_1 == 1
    assert got[4].rank_0 == 0 and got[4].rank_1 == 2  # lex never saw it
    # doc 2 appears in both lists: fused score strictly above any
    # single-list doc
    assert got[2].rrf_q6 > max(got[1].rrf_q6, got[3].rrf_q6, got[4].rrf_q6)
    # exact micro-unit contributions: floor(1e6/(60+r)+0.5)
    assert got[1].rrf_q6 == round(1e6 / 61)
    assert got[2].rrf_q6 == round(1e6 / 62) + round(1e6 / 61)
    top2 = rrf_fuse([lex, sem], k=2).collect()
    assert [r.doc_id for r in top2] == [2, 1]


def test_span_window_stats_containment(spark):
    """Window sweep: smaller windows remove a superset of larger ones
    (every duplicated 2w-window's w-sub-windows are duplicated), and
    the covers_next_window flag pins it per step."""
    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        span_dedup_window_stats,
    )

    long_dup = " ".join(f"w{i}" for i in range(16))
    short_dup = "a b c d"  # 4-token repeat: invisible at window 8/16
    rows = [
        (0, long_dup + " unique tail zero"),
        (1, "head one " + long_dup),
        (2, short_dup + " filler mid " + short_dup),
        (3, "totally novel text with no repeats at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.window_tokens: r
        for r in span_dedup_window_stats(df, windows=(4, 8, 16)).collect()
    }
    assert set(got) == {4, 8, 16}
    assert all(got[w].n_docs == 4 for w in got)
    # containment: removal monotone non-increasing in window size
    assert (
        got[4].tokens_removed
        >= got[8].tokens_removed
        >= got[16].tokens_removed
    )
    assert all(got[w].covers_next_window for w in got)
    # the 4-token repeat is caught ONLY at window 4
    assert got[4].n_docs_touched == 3
    assert got[8].n_docs_touched == 2 and got[16].n_docs_touched == 2
    assert got[16].tokens_removed == 32  # both copies of the 16-token span


def test_semantic_decontaminate_planted(spark):
    """Planted benchmark copy flags its corpus source; orthogonal
    vectors stay clean; quantized cosines are exact integers."""
    from cdk_datalake_ingest_upeu_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.6, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    bench = [[0.0, 0.0, 0.6, 0.8]]  # exact copy of vec 2
    got = {
        r.vec_id: r
        for r in semantic_decontaminate(
            corpus, bench, threshold=0.999
        ).collect()
    }
    assert got[2].contaminated and got[2].max_bench_cosine_q6 == 1_000_000
    assert not got[0].contaminated and not got[1].contaminated
    assert got[0].max_bench_cosine_q6 == 0


def test_dsir_selects_target_like_documents(spark):
    """Pool docs written in the target's vocabulary must outscore pool
    docs written in a disjoint vocabulary, and land in the selection."""
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_importance_select,
    )

    rows = (
        # target domain: "alpha beta" vocabulary
        [(i, "alpha beta alpha beta", True) for i in range(10)]
        # pool: five target-like, fifteen off-domain
        + [(100 + i, "alpha beta alpha", False) for i in range(5)]
        + [(200 + i, "zz yy xx ww", False) for i in range(15)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, flag boolean")
    got = dsir_importance_select(
        docs, F.col("flag"), fraction=0.25
    ).collect()
    sel = {r.doc_id for r in got if r.selected}
    scores = {r.doc_id: r.score_q4 for r in got}
    assert sel == {100, 101, 102, 103, 104}
    assert min(scores[i] for i in sel) > max(
        scores[i] for i in scores if i not in sel
    )


def test_dsir_boundary_ties_all_kept(spark):
    """Identical docs share a score; the quantile threshold keeps the
    whole tie group even past the nominal fraction."""
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_importance_select,
    )

    rows = [(0, "alpha", True)] + [(i, "alpha", False) for i in range(1, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, flag boolean")
    got = dsir_importance_select(docs, F.col("flag"), fraction=0.25).collect()
    assert all(r.selected for r in got) and len(got) == 8


def test_dsir_excludes_empty_text_and_validates_fraction(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_importance_select,
    )

    docs = spark.createDataFrame(
        [(0, "alpha", True), (1, "  ", False), (2, "alpha", False)],
        "doc_id long, text string, flag boolean",
    )
    got = dsir_importance_select(docs, F.col("flag"), fraction=1.0).collect()
    assert {r.doc_id for r in got} == {2}
    with pytest.raises(ValueError):
        dsir_importance_select(docs, F.col("flag"), fraction=0.0)


def test_dsir_deterministic_across_runs(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_importance_select,
    )

    rows = [(i, f"tok{i % 7} alpha tok{i % 3}", i % 5 == 0) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, flag boolean")
    a = sorted(
        (r.doc_id, r.score_q4, r.selected)
        for r in dsir_importance_select(docs, F.col("flag")).collect()
    )
    b = sorted(
        (r.doc_id, r.score_q4, r.selected)
        for r in dsir_importance_select(docs, F.col("flag")).collect()
    )
    assert a == b


def test_dsir_refresh_index_equals_rebuild(spark):
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_count_index,
        dsir_refresh_index,
    )

    hist = spark.createDataFrame(
        [(0, "alpha beta", True), (1, "beta gamma", False)],
        "doc_id long, text string, flag boolean",
    )
    batch = spark.createDataFrame(
        [(2, "gamma delta epsilon", False)],
        "doc_id long, text string, flag boolean",
    )
    refreshed = dsir_refresh_index(
        dsir_count_index(hist, F.col("flag")),
        dsir_count_index(batch, F.lit(False)),
    )
    rebuild = dsir_count_index(hist.unionByName(batch), F.col("flag"))
    a = sorted(map(tuple, refreshed.collect()))
    b = sorted(map(tuple, rebuild.collect()))
    assert a == b and sum(r[1] + r[2] for r in a) == 7


def test_dsir_frozen_model_scores_unseen_tokens_at_floor(spark):
    """A batch token whose bucket has no fit-time counts must score at
    the smoothed floor ln(1/1 * norm), not silently drop from n_tok."""
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_count_index,
        dsir_lam_table,
        dsir_score_batch,
    )

    fit = spark.createDataFrame(
        [(0, "alpha", True), (1, "beta", False)],
        "doc_id long, text string, flag boolean",
    )
    lam = dsir_lam_table(dsir_count_index(fit, F.col("flag")))
    batch = spark.createDataFrame(
        [(9, "totally-unseen-token", False)], "doc_id long, text string, flag boolean"
    )
    got = dsir_score_batch(batch, lam).collect()
    assert len(got) == 1 and got[0].n_tok == 1
    # norm = (Tr+B)/(Tt+B) = 4097/4097 = 1 -> lam = ln(1) = 0 ->
    # offset mean = 50e9 div 1e5 = 500000
    assert got[0].score_q4 == 500000


def test_stream_dsir_scores_invariant_to_batching(spark, tmp_path):
    """Frozen model => drained per-doc scores equal single-batch
    scoring, no matter how the stream was chopped."""
    import os

    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        dsir_count_index,
        dsir_lam_table,
        dsir_score_batch,
    )
    from cdk_datalake_ingest_upeu_spark.streaming.incremental import (
        stream_dsir_scoring,
    )

    fit = spark.createDataFrame(
        [(0, "alpha beta", True), (1, "beta gamma beta", False)],
        "doc_id long, text string, flag boolean",
    )
    model = str(tmp_path / "model")
    dsir_count_index(fit, F.col("flag")).write.parquet(model)
    arrivals = spark.createDataFrame(
        [(10, "alpha alpha"), (11, "gamma unseen"), (12, "beta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    for i in range(3):
        d = os.path.join(src, f"b{i}")
        arrivals.filter(F.col("doc_id") == 10 + i).coalesce(1).write.parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (1_700_000_000 + i,) * 2)
    q = stream_dsir_scoring(
        spark,
        os.path.join(src, "b*"),
        arrivals.schema,
        model_path=model,
        threshold_q4=500_000,
        out_dir=str(tmp_path / "out"),
        index_dir=str(tmp_path / "idx"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="dsir_test_stream",
    )
    q.processAllAvailable()
    q.stop()
    drained = {
        r.doc_id: (r.n_tok, r.score_q4, r.accepted)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    lam = dsir_lam_table(spark.read.parquet(model))
    single = {
        r.doc_id: (r.n_tok, r.score_q4, r.score_q4 >= 500_000)
        for r in dsir_score_batch(arrivals, lam).collect()
    }
    assert drained == single and len(drained) == 3


def test_bigram_pmi_surfaces_collocation(spark):
    """A pair that ALWAYS co-occurs outranks pairs assembled by chance,
    and the support floor cuts hapax pairs despite maximal PMI."""
    from cdk_datalake_ingest_upeu_spark.operators.text import bigram_pmi_topk

    rows = (
        [(i, "new york " + "the cat the dog the fish".strip()) for i in range(6)]
        + [(100, "rare pair")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bigram_pmi_topk(docs, min_count=5, k=3).collect()
    assert (got[0].w1, got[0].w2) == ("new", "york")
    assert all((r.w1, r.w2) != ("rare", "pair") for r in got)
    assert got[0].c12 == 6


def test_hashed_kl_zero_for_corpus_identical_group(spark):
    """Two groups with IDENTICAL token distributions: both sit at the
    same small KL (smoothing noise only), and a divergent group is
    strictly larger."""
    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        hashed_distribution_kl,
    )

    rows = (
        [(i, "alpha beta gamma", "s1") for i in range(10)]
        + [(100 + i, "alpha beta gamma", "s2") for i in range(10)]
        + [(200 + i, "zz yy xx ww vv", "s3") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r.kl_q9 for r in hashed_distribution_kl(docs, "source").collect()}
    assert got["s1"] == got["s2"]
    assert got["s3"] > got["s1"]


def test_robust_outlier_stats_planted(spark):
    """Median/MAD on a planted distribution: 7 inliers around 10.0 and
    one wild point — the z-score would move with the outlier, the
    median/MAD report must not."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        robust_outlier_stats,
    )

    vals = [9.8, 9.9, 10.0, 10.0, 10.1, 10.2, 10.3, 500.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    r = robust_outlier_stats(df, "value").first()
    assert r.n == 8
    assert r.median == 10.0  # lower median of 8 values = 4th = 10.0
    # deviations (cents): 20,10,0,0,10,20,30,49000 -> lower median = 10
    assert r.mad == 0.1
    assert r.n_outliers == 1  # only 500.0 exceeds 3*MAD
    assert r.outlier_frac_q6 == 125000


def test_robust_outlier_stats_nan_null_excluded(spark):
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        robust_outlier_stats,
    )

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (1.0,), (1.0,)], "value double"
    )
    r = robust_outlier_stats(df, "value").first()
    assert (r.n, r.median, r.n_outliers) == (3, 1.0, 0)


def test_robust_outlier_stats_empty(spark):
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        robust_outlier_stats,
    )

    df = spark.createDataFrame([], "value double")
    r = robust_outlier_stats(df, "value").first()
    assert (r.n, r.median, r.mad, r.n_outliers) == (0, None, None, 0)


def test_theil_sen_ignores_spike_day(spark):
    """A clean +10/day trend with one 100x spike day: OLS would bend,
    the Theil-Sen median slope must stay 10."""
    import datetime as dt

    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        theil_sen_daily_trend,
    )

    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(10):
        n = 10000 if day == 5 else 100 + 10 * day
        rows += [(base + dt.timedelta(days=day, seconds=i),) for i in range(n)]
    df = spark.createDataFrame(rows, "ts timestamp")
    r = theil_sen_daily_trend(df, "ts").first()
    assert r.n_days == 10 and r.n_pairs == 45
    assert r.slope_per_day_q6 == 10_000_000  # 10 rows/day at 1e6 scale
    assert (str(r.first_day), str(r.last_day)) == ("2024-01-01", "2024-01-10")


def test_theil_sen_single_day_no_pairs(spark):
    import datetime as dt

    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        theil_sen_daily_trend,
    )

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, i),) for i in range(5)], "ts timestamp"
    )
    r = theil_sen_daily_trend(df, "ts").first()
    assert (r.n_days, r.n_pairs, r.slope_per_day_q6) == (1, 0, None)


def test_zipf_slope_near_minus_one_on_planted_zipf(spark):
    """Tokens with exact 1/r frequencies must fit slope ~ -1; a uniform
    corpus must fit slope ~ 0."""
    from cdk_datalake_ingest_upeu_spark.operators.text import zipf_slope_topk

    zipf_rows, uni_rows = [], []
    for r in range(1, 21):
        zipf_rows += [(f"doc{r}_{i}", f"tok{r:02d}") for i in range(1200 // r)]
        uni_rows += [(f"u{r}_{i}", f"tok{r:02d}") for i in range(50)]
    zipf = spark.createDataFrame(zipf_rows, "doc_id string, text string")
    uni = spark.createDataFrame(uni_rows, "doc_id string, text string")
    rz = zipf_slope_topk(zipf, k=20).first()
    ru = zipf_slope_topk(uni, k=20).first()
    assert rz.n_tokens_ranked == 20 and rz.top_token == "tok01"
    assert -1_100_000 < rz.slope_q6 < -900_000
    assert ru.slope_q6 == 0


def test_grouped_robust_stats_null_group_and_planted(spark):
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        grouped_robust_stats,
    )

    rows = (
        [("a", 10.0)] * 5 + [("a", 500.0)]
        + [(None, 1.0), (None, 1.0), (None, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: r for r in grouped_robust_stats(df, "g", "value").collect()}
    assert got["a"].median == 10.0 and got["a"].mad == 0.0
    assert got["a"].n_outliers == 1  # 500 vs a zero-MAD tight group
    assert got[None].n == 3 and got[None].median == 1.0


def test_two_sample_rank_stats_exact_small_case(spark):
    """Hand-computable case: A = [1, 2, 2], B = [2, 3].
    Pairs: (1<2),(1<3); (2=2 tie, 2<3) x2 -> U_A = 0.5+0.5 = 1.0 -> 2U=2.
    F_A = [1/3, 1, 1], F_B = [0, 1/2, 1] at v=1,2,3 -> KS = 1/2."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        two_sample_rank_stats,
    )

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    r = two_sample_rank_stats(df, "g", "value", "a", "b").first()
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.u2_a == 2
    assert r.ks_ppm == 500_000


def test_two_sample_rank_stats_identical_distributions(spark):
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        two_sample_rank_stats,
    )

    rows = [("a", float(v)) for v in (1, 2, 3)] + [
        ("b", float(v)) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    r = two_sample_rank_stats(df, "g", "value", "a", "b").first()
    assert r.ks_ppm == 0
    assert r.u2_a == 9  # 2U = n_a*n_b for identical distributions


def test_chi_square_independence_planted(spark):
    """Perfectly independent 2x2 grid -> chisq 0; perfectly coupled
    columns -> chisq ~ n * (cells - ... ) > 0. NULL categories count."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        chi_square_independence,
    )

    indep = spark.createDataFrame(
        [("x", "p")] * 4 + [("x", "q")] * 4 + [("y", "p")] * 4 + [("y", "q")] * 4,
        "a string, b string",
    )
    r = chi_square_independence(indep, "a", "b").first()
    assert (r.n, r.n_cells, r.dof, r.chisq_q6) == (16, 4, 1, 0)
    coupled = spark.createDataFrame(
        [("x", "p")] * 8 + [(None, "q")] * 8, "a string, b string"
    )
    r2 = chi_square_independence(coupled, "a", "b").first()
    assert r2.n_cells == 4 and r2.chisq_q6 == 16_000_000  # chisq == n


def test_chi_square_empty_input_returns_empty_frame(spark):
    """n=0 has no statistic: the empty-schema frame comes back instead
    of a TypeError on int(None)."""
    from cdk_datalake_ingest_upeu_spark.operators.profile import (
        chi_square_independence,
    )

    empty = spark.createDataFrame([], "a string, b string")
    out = chi_square_independence(empty, "a", "b")
    assert out.columns == ["n", "n_cells", "dof", "chisq_q6"]
    assert out.count() == 0


def test_semantic_decontaminate_zero_norm_scores_zero(spark):
    """A zero vector on either side scores cosine 0 deterministically —
    NaN would floor to an undefined int64 (INT64_MIN on most platforms)."""
    from cdk_datalake_ingest_upeu_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [("z", [0.0, 0.0]), ("u", [1.0, 0.0])],
        "doc_id string, emb array<double>",
    )
    rows = {
        r["doc_id"]: (r["max_bench_cosine_q6"], r["contaminated"])
        for r in semantic_decontaminate(
            corpus, [[1.0, 0.0], [0.0, 0.0]], corpus_id="doc_id",
            corpus_vec="emb", threshold=0.9,
        ).collect()
    }
    assert rows["z"] == (0, False)        # zero corpus vec: all cosines 0
    assert rows["u"] == (1_000_000, True)  # unit match ignores the zero bench


def test_dsir_bigram_stream_features(spark):
    """ngram_max=2 emits unigrams plus space-joined bigrams (2n-1
    features for an n-token doc); a single-token doc emits just its
    unigram; ngram_max outside {1,2} raises."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        _dsir_token_stream,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo")], "doc_id long, text string"
    )
    uni = _dsir_token_stream(
        docs, ["doc_id"], text_col="text", buckets=64, seed="s"
    )
    assert uni.count() == 4  # a b c solo
    bi = _dsir_token_stream(
        docs, ["doc_id"], text_col="text", buckets=64, seed="s", ngram_max=2
    )
    toks = sorted(
        (r["doc_id"], r["__tok"]) for r in bi.select("doc_id", "__tok").collect()
    )
    assert toks == [
        (1, "a"), (1, "a b"), (1, "b"), (1, "b c"), (1, "c"), (2, "solo")
    ]
    with _pytest.raises(ValueError, match="ngram_max"):
        _dsir_token_stream(
            docs, ["doc_id"], text_col="text", buckets=64, seed="s",
            ngram_max=3,
        )


def test_asof_join_tolerance_bounds_the_match(spark):
    """A backward match older than left_time - tolerance is discarded
    (NULL payload), an in-window match survives, and exact-time still
    matches — pandas merge_asof tolerance semantics."""
    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u", "near", "2024-01-01 10:00:00"),
         ("u", "far", "2024-01-01 18:00:00"),
         ("u", "exact", "2024-01-01 09:00:00")],
        "k string, tag string, lt string",
    ).withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:00:00", 7.0)], "k string, rt string, v double"
    ).withColumn("rt", F.col("rt").cast("timestamp"))
    got = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_time="lt", right_time="rt",
            tolerance="2 hours",
        ).collect()
    }
    assert got == {"near": 7.0, "far": None, "exact": 7.0}


def test_minhash_banding_sweep_nesting_and_guard(spark):
    """Aligned finer banding yields a candidate SUPERSET of coarser
    (agreement on a 16-lane band implies agreement on its two 8-lane
    halves); exact duplicates surface at every banding; an oversized
    bucket raises instead of going quadratic."""
    import pytest as _pytest

    from cdk_datalake_ingest_upeu_spark.operators.dedup import (
        BandBucketTooLargeError,
        band_candidate_pairs,
        minhash_band_table,
        minhash_banding_sweep,
        minhash_signature_table,
    )

    base = [
        (f"d{i}", f"unique document number {i} " + " ".join(
            f"tok{i}_{j}" for j in range(30)))
        for i in range(40)
    ]
    dups = [(f"dup_d{i}", base[i][1]) for i in range(10)]  # exact copies
    docs = spark.createDataFrame(base + dups, "doc_id string, text string")
    sigs = minhash_signature_table(docs)
    cfgs = minhash_banding_sweep(sigs, bands_list=(2, 4, 8))
    assert [c["bands"] for c in cfgs] == [2, 4, 8]
    assert all(c["superset_of_coarser"] for c in cfgs)
    ns = [c["n_candidates"] for c in cfgs]
    assert ns[0] <= ns[1] <= ns[2]
    # every exact-dup pair is a candidate at EVERY banding
    for c in cfgs:
        got = {(r["id_a"], r["id_b"]) for r in c["pairs"].collect()}
        for i in range(10):
            a, b = sorted((f"d{i}", f"dup_d{i}"))
            assert (a, b) in got, (c["bands"], i)
    # guard: many identical docs collide in one bucket per band
    blob = [(f"s{i}", "same text " * 20) for i in range(12)]
    bt = minhash_band_table(
        minhash_signature_table(
            spark.createDataFrame(blob, "doc_id string, text string")
        ),
        bands=8,
    )
    with _pytest.raises(BandBucketTooLargeError):
        band_candidate_pairs(bt, max_band_bucket=8)


def test_ppm_decoder_real_format_roundtrip(spark):
    """decode_ppm is a REAL P6 parser: header with comments decodes to
    exact dimensions and per-channel sums; malformed payloads raise;
    the registry path ('image/ppm') runs it through the same Arrow
    mapInPandas plumbing as every other decoder."""
    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        decode_ppm,
    )

    raster = bytes(range(2 * 2 * 3))  # 2x2 RGB, bytes 0..11
    ppm = b"P6\n# a comment\n2 2\n255\n" + raster
    m = decode_ppm(ppm)
    assert (m["width"], m["height"], m["maxval"]) == (2, 2, 255)
    assert m["sum_r"] == 0 + 3 + 6 + 9
    assert m["sum_g"] == 1 + 4 + 7 + 10
    assert m["sum_b"] == 2 + 5 + 8 + 11
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 2\n255\n" + raster)
    with _pytest.raises(ValueError, match="raster"):
        decode_ppm(b"P6\n2 2\n255\n" + raster[:-1])
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
    media = spark.createDataFrame(
        [(1, ppm)], "doc_id long, payload binary"
    )
    row = extract_image_features(media, media_type="image/ppm").first()
    assert row["feature"][:3] == [2.0, 2.0, 255.0]
    assert row["feature"][6] == float(sum(raster))


def test_wav_decoder_real_format_roundtrip(spark):
    """decode_wav parses a genuine RIFF/WAVE container (stdlib wave):
    the exact PCM-16 samples round-trip (sum + peak), non-16-bit
    refuses, and the 'audio/wav' registry entry drives the standard
    mapInPandas feature path."""
    import io
    import struct
    import wave as wavmod

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        decode_wav,
    )

    samples = [0, 100, -200, 300, -400, 32767, -32768, 5]

    def _wav_bytes(rate=8000, sampwidth=2):
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            w.writeframes(
                struct.pack(f"<{len(samples)}h", *samples)
                if sampwidth == 2
                else bytes(len(samples))
            )
        return buf.getvalue()

    m = decode_wav(_wav_bytes())
    assert m["n_frames"] == len(samples)
    assert m["framerate"] == 8000 and m["n_channels"] == 1
    assert m["sample_sum"] == sum(samples)
    assert m["peak"] == 32768
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PCM-16"):
        decode_wav(_wav_bytes(sampwidth=1))
    media = spark.createDataFrame(
        [(7, _wav_bytes(rate=16000))], "doc_id long, payload binary"
    )
    row = extract_image_features(media, media_type="audio/wav").first()
    assert row["feature"] == [
        float(len(samples)), 16000.0, 1.0, float(sum(samples)), 32768.0,
    ]


def test_resize_ppm_box_filter_exact():
    """resize_ppm is a REAL P6 resampler: separable rows-then-columns
    box filter with integer floor averaging — every output pixel is
    hand-checkable. A 4x2 image downscaled to 2x1 must average each
    2x2 block with per-axis floor; upscale axes go nearest-neighbor;
    the output is itself a valid P6 the real decoder round-trips."""
    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm,
    )

    # 4x2, channel-constant pixels so the math is readable: pixel (y,x)
    # has RGB = (base, base+1, base+2) with base = 10*(y*4+x)
    raster = bytes(
        b
        for y in range(2)
        for x in range(4)
        for b in (
            10 * (y * 4 + x),
            10 * (y * 4 + x) + 1,
            10 * (y * 4 + x) + 2,
        )
    )
    src = b"P6\n4 2\n255\n" + raster
    out = resize_ppm(src, 4, 2, 2, 1)
    assert out.startswith(b"P6\n2 1\n255\n")
    body = out[len(b"P6\n2 1\n255\n"):]
    # rows first: floor((row0+row1)/2) per (x,c); then columns:
    # floor over x-pairs. base grid: row0 = 0,10,20,30; row1 =
    # 40,50,60,70 -> row stage: 20,30,40,50 -> col stage: 25, 45
    assert list(body) == [25, 26, 27, 45, 46, 47]
    # round-trips through the real decoder
    m = decode_ppm(out)
    assert (m["width"], m["height"]) == (2, 1)
    assert m["sum_r"] == 25 + 45
    # upscale axis goes nearest-neighbor: 2x1 -> 4x1 replicates
    up = resize_ppm(out, 2, 1, 4, 1)
    assert list(up[len(b"P6\n4 1\n255\n"):]) == [
        25, 26, 27, 25, 26, 27, 45, 46, 47, 45, 46, 47
    ]
    # metadata args are ignored: the header is authoritative
    assert resize_ppm(src, 999, 999, 2, 1) == out
    # non-PPM payloads refuse instead of producing garbage
    with pytest.raises(ValueError):
        resize_ppm(b"JFIF...", 4, 2, 2, 1)
    # non-even bucket bounds: 3 -> 2 columns buckets are [0,1) and
    # [1,3) — counts 1 and 2, floor averaging over each
    src3 = b"P6\n3 1\n255\n" + bytes(
        [0, 0, 0, 30, 30, 30, 60, 60, 60]
    )
    o3 = resize_ppm(src3, 3, 1, 2, 1)
    assert list(o3[len(b"P6\n2 1\n255\n"):]) == [0, 0, 0, 45, 45, 45]


def test_resize_images_real_ppm_codec(spark):
    """The resize PLUMBING drives the real codec end-to-end: P6
    payloads through byte-budget partitioning + Arrow mapInPandas with
    codec='image/ppm_resize', output geometry and byte counts exact;
    an unregistered codec name raises rather than silently stubbing."""
    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        resize_images,
    )

    raster = bytes(i % 256 for i in range(3 * 12 * 6))
    rows = [(1, b"P6\n12 6\n255\n" + raster)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = resize_images(df, 6, 3, codec="image/ppm_resize").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["width"], r["height"]) == (6, 3)
    assert r["n_bytes_in"] == 12 + 216 and r["n_bytes_out"] == 11 + 54
    assert r["payload"].startswith(b"P6\n6 3\n255\n")
    with pytest.raises(NotImplementedError, match="no resize codec"):
        resize_images(df, 6, 3, codec="image/jpeg_resize")


def test_resize_partitioning_honors_byte_budget(spark):
    """Review r14: resize_images passed its BYTE budget into
    partition_by_bytes' MEGABYTE parameter, collapsing any real media
    table into one partition. With the unit conversion fixed, a ~4 MB
    table under a 1 MiB budget must spread across multiple partitions."""
    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        resize_images,
    )

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        partition_by_bytes,
    )

    raster = bytes(i % 256 for i in range(3 * 12 * 6))
    payload = b"P6\n12 6\n255\n" + raster
    pad = bytes(64 * 1024)  # widen rows so bytes, not rows, dominate
    wide = spark.createDataFrame(
        [(i, payload + pad) for i in range(64)],
        "doc_id long, payload binary",
    )

    n = partition_by_bytes(wide, "payload", 1).rdd.getNumPartitions()
    assert n >= 4  # ~4 MiB at 1 MB/partition
    # and the resize plumbing passes its budget through in the same unit
    out = resize_images(
        wide.limit(4), 6, 3, codec="image/ppm_resize",
        target_partition_bytes=1024 * 1024,
    )
    # payloads with trailing pad bytes are NOT valid P6 -> must raise
    import pytest

    with pytest.raises(Exception):
        out.collect()


def test_codec_registry_arity_validated_driver_side(spark):
    """Review r14: the registry mixes 1-arg decoders and 5-arg resize
    codecs; using the wrong kind for an API must fail driver-side with
    a clear TypeError, not as an executor PythonException mid-job."""
    import pytest

    from cdk_datalake_ingest_upeu_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, b"P6\n1 1\n255\n\x00\x00\x00")], "doc_id long, payload binary"
    )
    with pytest.raises(TypeError, match="1-argument"):
        extract_image_features(df, media_type="image/ppm_resize")
    with pytest.raises(TypeError, match="5-argument"):
        resize_images(df, 2, 2, codec="image/ppm")
