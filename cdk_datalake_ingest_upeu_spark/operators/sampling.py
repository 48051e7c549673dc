"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be REPRODUCIBLE: the same row lands in the same
split on every run, on any cluster size, with no RNG state to ship.
Everything here derives from a hash of the row's stable key — the
standard technique for train/validation/test splits and fractional
corpus sampling in large-scale dataset construction (and the reason
``df.sample``'s per-partition RNG is not used: its output changes with
partitioning).

All expressions are ``pyspark.sql.functions`` built-ins (md5 + string
ops, whole-stage codegen): a sample is a FILTER pushed to the scan — no
shuffle, no UDF, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.operators.scratch import scratch_persist

# 1e6 buckets give ppm-resolution fractions; md5's first 8 hex chars
# (32 bits) are uniform far beyond that
_BUCKETS = 1_000_000


def hash_bucket(key: Column, *, seed: str = "", buckets: int = _BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from a row key: first 32 bits of
    md5(key || seed). Identical across engines that agree on md5 hex
    (the DuckDB oracle computes the same bucket with
    ``('0x' || substr(md5(...), 1, 8))::BIGINT``)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, seed: str = ""
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col), seed=seed) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    label_col: str,
    fractions: dict[str, float],
    key_col: str,
    *,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-label deterministic sampling (class rebalancing: e.g. keep 5%
    of English, 100% of low-resource languages). Labels absent from
    ``fractions`` get ``default_fraction``."""
    bucket = hash_bucket(F.col(key_col), seed=seed)
    threshold = F.lit(int(default_fraction * _BUCKETS))
    for label, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {label!r} must be in [0,1], got {frac}")
        threshold = F.when(
            F.col(label_col) == label, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def with_split(
    df: DataFrame,
    key_col: str,
    *,
    test_fraction: float = 0.1,
    validation_fraction: float = 0.0,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append a train/validation/test split column — the same row is in
    the same split forever (append-only corpora never leak test rows
    into training as the corpus grows)."""
    return group_split(
        df,
        F.col(key_col),
        test_fraction=test_fraction,
        validation_fraction=validation_fraction,
        seed=seed,
        out_col=out_col,
    )


def group_split(
    df: DataFrame,
    group_key: Column,
    *,
    test_fraction: float = 0.1,
    validation_fraction: float = 0.0,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Split keyed on an arbitrary LEAKAGE-GROUP expression: every row
    sharing ``group_key`` lands in the same split. Keying on a doc id
    silently leaks — a near/exact duplicate of a test document trains
    the model on its own eval set. Key on the dedup-cluster canonical
    instead: the exact-dup fingerprint (``md5`` of normalized text), or
    the near-dup component id from ``connected_components``. Still a
    pure scan-side expression — no shuffle, no split table to store."""
    if test_fraction + validation_fraction > 1.0:
        raise ValueError("test_fraction + validation_fraction must be <= 1")
    bucket = hash_bucket(group_key, seed=seed)
    test_hi = int(test_fraction * _BUCKETS)
    val_hi = test_hi + int(validation_fraction * _BUCKETS)
    return df.withColumn(
        out_col,
        F.when(bucket < test_hi, F.lit("test"))
        .when(bucket < val_hi, F.lit("validation"))
        .otherwise(F.lit("train")),
    )


def exact_quantile_bounds(
    df: DataFrame, col: str, n_buckets: int
) -> tuple[list[float], int]:
    """Exact rank-quantile boundaries for a LOW-CARDINALITY column.

    A global ``ntile`` needs a total sort — at 100 TB that is one
    WindowExec partition holding the corpus. When the column has few
    distinct values (e.g. a quality score rounded to 4 dp: <= 10k
    values), exact quantiles cost ONE small groupBy: the value
    histogram shuffles only (value, count) pairs, and the cumulative
    walk happens on the driver over O(distinct-values) rows. Boundary i
    is the smallest value whose cumulative count reaches
    ``ceil(total * i / n_buckets)``.

    Returns (boundaries ascending, total row count).
    """
    import math

    hist = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(col)
        .collect()
    )
    total = sum(r["__c"] for r in hist)
    targets = [
        math.ceil(total * i / n_buckets) for i in range(1, n_buckets)
    ]
    bounds: list[float] = []
    cum, idx = 0, 0
    for r in hist:
        cum += r["__c"]
        while idx < len(targets) and cum >= targets[idx]:
            bounds.append(r[col])
            idx += 1
    return bounds, total


def quantile_bucket(col: Column, bounds: list[float]) -> Column:
    """Bucket index in [0, len(bounds)] from :func:`exact_quantile_bounds`
    boundaries — bucket = #{b : value > b}, a pure codegen comparison
    chain broadcast in the plan (no join, no sort)."""
    out = F.lit(0)
    for b in bounds:
        out = out + (col > F.lit(b)).cast("int")
    return out


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    *,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-group row cap — the domain-cap rule of corpus
    construction (no single source may dominate the mixture).

    Rows within a group are ranked by their hash bucket (a stable
    pseudo-random order — NOT insertion or id order, which would bias
    the kept set toward early crawls), ties broken by key; the first
    ``cap`` survive. One shuffle on ``group_col``. At corpus scale the
    group key is the registrable domain — high cardinality, so window
    partitions stay balanced; a handful of mega-domains is exactly the
    case the cap exists to clip.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), seed=seed), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    n: int,
    *,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of size ``n``
    (Efraimidis-Spirakis A-ES, Inf. Process. Lett. 2006): each row
    draws u = hash-uniform(0,1) from its key and ranks by u^(1/w) —
    the top-n ranks ARE a weighted sample. The training-data use: a
    quality- or token-count-weighted corpus draw that is reproducible
    across runs and cluster layouts, because the "randomness" is the
    row's own key hash.

    Scale shape: the rank key is a scan-side expression and top-n plans
    as TakeOrdered (per-partition heap of n, no global sort). Weights
    must be > 0; ties (identical keys) break on the key hash text.
    DuckDB twin of the rank key::

        pow(((('0x' || substr(md5(key || seed), 1, 8))::BIGINT + 0.5)
             / 4294967296.0), 1.0 / w)
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed))), 1, 8),
        16,
        10,
    ).cast("long")
    # +0.5 keeps u strictly inside (0,1): u=0 would collapse every
    # weight to rank 0 and u=1 to rank 1
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    rank = F.pow(u, F.lit(1.0) / weight)
    return (
        df.withColumn("__wr", rank)
        .orderBy(F.col("__wr").desc(), F.col(key_col))
        .limit(n)
        .drop("__wr")
    )


def temperature_mixture_allocation(
    df: DataFrame,
    source_col: str,
    token_col,
    *,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs_milli: int = 4000,
) -> DataFrame:
    """Temperature-smoothed training-mixture allocation (the data
    recipe step in Gopher/LLaMA-class runs): each source's share of a
    fixed token budget is proportional to ``tokens_i ** alpha`` —
    alpha=1 reproduces natural proportions, alpha->0 flattens toward
    uniform, the standard knob that keeps giant crawl sources from
    drowning small high-quality ones. Each source's repetition factor
    (epochs, in milli-units) is capped at ``max_epochs_milli`` — a
    small source is not repeated past usefulness just because the
    smoothing handed it budget.

    Returns per source: doc/token counts, the integer-quantized weight,
    allocated tokens, epochs_milli (after cap) and the capped flag.

    Engine-portable by construction (the output is value-hashed
    against a DuckDB twin): weights quantize to micro-unit INTEGERS
    before the normalizing sum (a double sum over sources is
    summation-order noise; an integer sum is exact in any order), and
    alpha=0.5 routes through ``sqrt`` — IEEE-754-exact everywhere,
    where ``pow(x, 0.5)`` carries no such guarantee (other alphas run
    fine but their last-ulp text is engine-specific; keep them away
    from hash gates).

    Scale shape: one groupBy on source (the only data-sized shuffle);
    everything after runs on k source rows — the window total and the
    arithmetic are KB-scale.
    """
    per_src = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("tokens"),
    )
    t_dbl = F.col("tokens").cast("double")
    w = F.sqrt(t_dbl) if alpha == 0.5 else F.pow(t_dbl, F.lit(alpha))
    per_src = per_src.withColumn(
        "weight_q6", F.floor(w * 1e6 + F.lit(0.5)).cast("long")
    )
    total_w = F.sum("weight_q6").over(Window.partitionBy())
    alloc = F.floor(
        F.lit(float(budget_tokens))
        * (F.col("weight_q6").cast("double") / total_w.cast("double"))
    ).cast("long")
    per_src = per_src.withColumn("allocated_tokens", alloc)
    # a zero-token source gets zero epochs explicitly: 0/0 is NaN and
    # its floor/least behavior is exactly the kind of engine-specific
    # edge the hash gate exists to catch
    epochs = F.when(F.col("tokens") <= 0, F.lit(0)).otherwise(
        F.floor(
            F.col("allocated_tokens").cast("double")
            / F.col("tokens").cast("double")
            * 1000.0
            + F.lit(0.5)
        )
    ).cast("long")
    per_src = (
        per_src.withColumn("__e", epochs)
        .withColumn(
            "epochs_milli", F.least(F.col("__e"), F.lit(max_epochs_milli))
        )
        .withColumn("capped", F.col("__e") > F.lit(max_epochs_milli))
        .withColumn(
            "effective_tokens",
            F.expr("tokens * epochs_milli div 1000").cast("long"),
        )
        .drop("__e")
    )
    return per_src.select(
        source_col,
        "n_docs",
        "tokens",
        "weight_q6",
        "allocated_tokens",
        "epochs_milli",
        "capped",
        "effective_tokens",
    ).orderBy(source_col)


def dsir_importance_select(
    docs: DataFrame,
    is_target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    seed: str = "dsir",
    fraction: float = 0.25,
    ngram_max: int = 1,
) -> DataFrame:
    """Data Selection via Importance Resampling over hashed unigrams —
    DSIR (Xie et al., NeurIPS 2023): score every pool document by how
    much more likely its tokens are under the TARGET domain's hashed
    n-gram bag-of-words model than under the raw pool's, then keep the
    top ``fraction`` — the standard recipe for steering a crawl-scale
    corpus toward a small high-quality domain without training a
    classifier.

    Per hashed bucket b (md5 of the token, mod ``buckets``), the
    add-one-smoothed log likelihood ratio::

        lam(b) = ln( ((tc_b + 1) / (rc_b + 1)) * ((Tr + B) / (Tt + B)) )

    (tc/rc = target/raw token counts in b; Tt/Tr totals) — a document's
    importance weight is the sum of lam over its tokens, exactly the
    paper's log importance weight under the two multinomials. Selection
    uses the PER-TOKEN MEAN (sum / n_tok) so length doesn't dominate,
    thresholded at the pool's top-``fraction`` quantile.

    Engine-portable by construction (hash-gate conventions,
    ``functions/stable.py``): each lam is rounded to DECIMAL(18,9)
    nanolog units and carried as an exact BIGINT (the established
    ln-at-9dp pattern — ccnet buckets / BM25); per-doc sums are exact
    integer sums; the mean uses integer division made safe by a +50
    log-unit offset that keeps every value positive (truncation ==
    floor, identical in Spark ``div`` and DuckDB ``//``); the selection
    threshold is an exact rank-quantile found by a descending
    cumulative walk over the bounded (score_q4, count) histogram — the
    ccnet_perplexity_buckets technique, no per-doc global window.
    Boundary ties are all kept (selection may slightly exceed
    ``fraction``, CCNet's own convention).

    Scale shape: token explode is a linear map; bucket counts shuffle
    to <= ``buckets`` rows; the lam table broadcasts onto the token
    stream; one groupBy on the doc id builds the weights (the only
    corpus-sized shuffle) plus one join back to the doc row; the
    histogram collect is bounded by the score domain (~1e6 distinct
    q4 levels worst-case, KB in practice), never the corpus.

    Returns the scored POOL (non-target) documents with every input
    column plus ``n_tok``, ``score_q4`` (offset mean nanolog ratio at
    1e-4 log-unit grain) and ``selected``. Documents with no tokens
    (empty/whitespace text) carry no evidence and are excluded.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    base = docs.withColumn("__t", is_target).filter(
        F.trim(F.col(text_col)) != ""
    )
    index = dsir_count_index(
        base, F.col("__t"), text_col=text_col, buckets=buckets, seed=seed,
        ngram_max=ngram_max,
    )
    lam = dsir_lam_table(index, buckets=buckets)
    # doc-grain (id, n_tok, score_q4) — persisted because both the
    # histogram job and the returned plan scan it; orders of magnitude
    # smaller than the token stream it reduces
    perdoc = scratch_persist(
        dsir_score_batch(
            base.filter(~F.col("__t")),
            lam,
            id_col=id_col,
            text_col=text_col,
            buckets=buckets,
            seed=seed,
            ngram_max=ngram_max,
        )
    )
    thr = dsir_top_fraction_threshold(perdoc, fraction)
    pool = base.filter(~F.col("__t")).drop("__t").join(perdoc, id_col)
    if thr is None:
        return pool.withColumn("selected", F.lit(False))
    return pool.withColumn("selected", F.col("score_q4") >= F.lit(thr))


def _dsir_token_stream(
    docs: DataFrame,
    keep_cols: list,
    *,
    text_col: str,
    buckets: int,
    seed: str,
    ngram_max: int = 1,
) -> DataFrame:
    """(keep_cols..., __b) — one row per hashed feature, bucketed by
    the md5 hash. Pure codegen map; no shuffle.

    ``ngram_max=1`` emits whitespace unigrams; ``ngram_max=2`` emits
    unigrams PLUS space-joined bigrams — the feature set the DSIR paper
    actually hashes (Xie et al. 2023 use unigrams+bigrams into the same
    bucket space). A bigram string can never collide textually with a
    unigram (tokens are split on whitespace, so no unigram contains a
    space); both feature kinds share the bucket domain, exactly the
    paper's hashing."""
    if ngram_max not in (1, 2):
        raise ValueError(f"ngram_max must be 1 or 2, got {ngram_max}")
    # The token array must be a REAL projection column before any
    # array-consuming construction: Catalyst does not common-subexpression
    # -eliminate an outer expression embedded in a higher-order lambda, so
    # building bigrams directly off the split(...) *expression* re-split
    # the document once per produced element — O(n_tok × doc_len) per row.
    # Off a materialized column, slice+zip_with touch the array only, and
    # CollapseProject keeps the two projections separate because __arr is
    # non-cheap and multiply-referenced.
    prepared = docs.select(
        *keep_cols,
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__arr"),
    )
    arr = F.col("__arr")
    feats = arr
    if ngram_max == 2:
        # pairs (1,2)..(n-1,n): zip the array against itself shifted by
        # one; n<2 yields zero-length slices, hence no bigrams — same
        # semantics as the former size()>=2 guard without a branch.
        pair_len = F.greatest(F.size(arr) - 1, F.lit(0))
        bigrams = F.zip_with(
            F.slice(arr, 1, pair_len),
            F.slice(arr, 2, pair_len),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        feats = F.concat(arr, bigrams)
    return prepared.select(
        *keep_cols,
        F.explode(feats).alias("__tok"),
    ).withColumn(
        "__b", hash_bucket(F.col("__tok"), seed=seed, buckets=buckets)
    )


def dsir_count_index(
    docs: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    buckets: int = 4096,
    seed: str = "dsir",
    ngram_max: int = 1,
) -> DataFrame:
    """The DSIR model state: per hashed bucket, target and raw token
    counts ``(__b, __tc, __rc)`` — <= ``buckets`` rows regardless of
    corpus size, so it persists/stores as a KB-scale table. Counts are
    ADDITIVE, which is what makes the model maintainable incrementally:
    :func:`dsir_refresh_index` folds a new batch in without ever
    re-reading history (same discipline as the minhash sig+band and
    span-digest indexes). Returned persisted (scratch registry)."""
    toks = _dsir_token_stream(
        docs.withColumn("__it", is_target).filter(
            F.trim(F.col(text_col)) != ""
        ),
        ["__it"],
        text_col=text_col,
        buckets=buckets,
        seed=seed,
        ngram_max=ngram_max,
    )
    return scratch_persist(
        toks.groupBy("__b").agg(
            F.sum(F.col("__it").cast("long")).alias("__tc"),
            F.sum((~F.col("__it")).cast("long")).alias("__rc"),
        )
    )


def dsir_refresh_index(index: DataFrame, batch_index: DataFrame) -> DataFrame:
    """Fold a new batch's count index into a stored one — additive
    merge on the bucket id, <= ``buckets`` result rows. The refreshed
    index is IDENTICAL to rebuilding from scratch over
    history ∪ batch (counts are sums; sums are associative) — the
    contract ``dsir_incremental_scoring`` hash-checks."""
    return (
        index.unionByName(batch_index)
        .groupBy("__b")
        .agg(F.sum("__tc").alias("__tc"), F.sum("__rc").alias("__rc"))
    )


def dsir_lam_table(
    index: DataFrame, *, buckets: int = 4096
) -> DataFrame:
    """Per-bucket smoothed log likelihood ratio ``lam9`` (nanolog
    BIGINT) from a count index. Totals are two bounded scalars; the
    (Tr+B)/(Tt+B) normalizer is inlined as the two exact integer-valued
    doubles an oracle recomputes from its own counts — same IEEE
    division, and the ln is rounded to DECIMAL(18,9) before scaling
    (the repo's ln-at-9dp portability pattern). Every operand is cast
    to DOUBLE at the leaves: inside a Spark ``expr`` string a literal
    like ``1.0`` parses as a DECIMAL and drags the whole ratio into
    scale-truncated decimal arithmetic (observed: scale-6 ratios, ~2e-7
    lam error vs DuckDB's double path) — explicit casts pin both
    engines to the identical IEEE double ops. The table is COMPLETE
    over all ``buckets`` rows (absent counts coalesce to 0), so a
    frozen model scores tokens unseen at fit time at the smoothed
    floor instead of silently dropping them — the incremental-scoring
    case; in same-corpus scoring the extra rows never join."""
    tot = index.agg(
        F.sum("__tc").alias("tt"), F.sum("__rc").alias("tr")
    ).first()
    tt, tr = int(tot["tt"] or 0), int(tot["tr"] or 0)
    # the normalizer division runs HERE in python — float(int) + float
    # division are the same IEEE ops DuckDB applies to its own counts
    norm = float(tr + buckets) / float(tt + buckets)
    domain = index.sparkSession.range(buckets).select(
        F.col("id").alias("__b")
    )
    return (
        domain.join(index, "__b", "left")
        .withColumn(
            "__lam9",
            F.expr(
                f"CAST(CAST(ln(((CAST(coalesce(__tc, 0) AS DOUBLE) + 1.0)"
                f" / (CAST(coalesce(__rc, 0) AS DOUBLE) + 1.0))"
                f" * CAST({norm!r} AS DOUBLE))"
                f" AS DECIMAL(18,9)) * 1000000000 AS BIGINT)"
            ),
        )
        .select("__b", "__lam9")
    )


def dsir_score_batch(
    batch: DataFrame,
    lam: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    seed: str = "dsir",
    ngram_max: int = 1,
) -> DataFrame:
    """Score a document batch against a (frozen) lam table: one token
    pass, broadcast join, one groupBy on the doc id — cost is the
    batch, never the corpus that fit the model. Returns (id, n_tok,
    score_q4); score_q4 is the offset per-token-mean nanolog ratio at
    1e-4 log-unit grain. The +50e9 nanolog offset keeps every value
    positive (|lam| <= ln((Tt+B)(Tr+B)) < 50 log units for any corpus
    under e^50 tokens), so integer truncation equals floor in both
    engines. Tokenless documents carry no evidence and are excluded."""
    toks = _dsir_token_stream(
        batch.filter(F.trim(F.col(text_col)) != ""),
        [id_col],
        text_col=text_col,
        buckets=buckets,
        seed=seed,
        ngram_max=ngram_max,
    )
    return (
        toks.join(F.broadcast(lam), "__b")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("__lam9").alias("__s"))
        .withColumn(
            "score_q4",
            F.expr("((__s + n_tok * 50000000000) div n_tok) div 100000"),
        )
        .select(id_col, "n_tok", "score_q4")
    )


def dsir_top_fraction_threshold(
    scores: DataFrame, fraction: float, *, score_col: str = "score_q4"
) -> int | None:
    """Exact top-``fraction`` rank-quantile threshold via a descending
    cumulative walk over the bounded (score, count) histogram — the
    ccnet_perplexity_buckets technique; no per-doc global window. The
    histogram collect is bounded by the score domain (~1e6 distinct q4
    levels worst-case, KB in practice), never the corpus. Returns None
    on an empty relation. Keep scores >= thr: boundary ties are all
    kept (selection may slightly exceed ``fraction``, CCNet's own
    convention)."""
    import math

    hist = sorted(
        (
            (int(r[score_col]), int(r["c"]))
            for r in scores.groupBy(score_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ),
        reverse=True,
    )
    total = sum(c for _, c in hist)
    if total == 0:
        return None
    k = math.ceil(total * fraction)
    cum = 0
    for q4, c in hist:
        cum += c
        if cum >= k:
            return q4
    return hist[-1][0]


def hashed_distribution_kl(
    df: DataFrame,
    group_col: str,
    *,
    text_col: str = "text",
    buckets: int = 4096,
    seed: str = "dsir",
) -> DataFrame:
    """Per-group KL divergence of the hashed-unigram token distribution
    from the corpus-wide one — the mixture-drift observability metric a
    pipeline operator watches per source/shard/epoch: a source whose
    KL jumps is writing text unlike the rest of the corpus (encoding
    bug, language shift, spam flood). Distributions live over the same
    fixed md5-bucket space as DSIR, which makes KL exact over a DENSE,
    bounded symbol set (groups x ``buckets`` rows) instead of an
    unbounded vocabulary::

        kl(g) = sum_b  p_g(b) * ln( p_g(b) / p_c(b) )

    with add-one smoothing on both sides. Each term is rounded to
    DECIMAL(18,9) (ln-at-9dp pattern) and carried as a nanokl BIGINT;
    the per-group sum of 4096 integers is exact in any order. The
    ~1e-6 absolute quantization error is identical in every engine —
    the value is hash-portable, which is the contract here.

    Scale shape: one token pass, one (group, bucket) shuffle bounded
    by groups x ``buckets``, densified against ``spark.range(buckets)``
    (broadcast); corpus marginals are a KB rollup of the same table.
    Returns (group_col, n_tokens, kl_q9).
    """
    toks = _dsir_token_stream(
        df.filter(F.trim(F.col(text_col)) != ""),
        [group_col],
        text_col=text_col,
        buckets=buckets,
        seed=seed,
    )
    gb = scratch_persist(
        toks.groupBy(group_col, "__b").agg(
            F.count(F.lit(1)).alias("__c")
        )
    )
    totals = gb.groupBy(group_col).agg(F.sum("__c").alias("__ns"))
    corpus = gb.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    n = int(gb.agg(F.sum("__c")).first()[0] or 0)
    domain = df.sparkSession.range(buckets).select(F.col("id").alias("__b"))
    # NULL is a legitimate group key: join null-safely so its rows
    # densify like any other group's
    gb2 = gb.select(
        F.col(group_col).alias("__g2"),
        F.col("__b").alias("__b2"),
        "__c",
    )
    dense = (
        totals.crossJoin(F.broadcast(domain))
        .join(
            gb2,
            F.col(group_col).eqNullSafe(F.col("__g2"))
            & (F.col("__b") == F.col("__b2")),
            "left",
        )
        .join(F.broadcast(corpus.withColumnRenamed("__b", "__b3")),
              F.col("__b") == F.col("__b3"), "left")
        .withColumn("__csb", F.coalesce(F.col("__c"), F.lit(0)))
        .withColumn("__cbb", F.coalesce(F.col("__cb"), F.lit(0)))
    )
    # every operand double-cast at the leaves: a bare 4096.0 in a Spark
    # expr string is a DECIMAL literal and truncates the ratios (see
    # dsir_lam_table's note)
    ps = f"((CAST(__csb AS DOUBLE) + 1.0) / (CAST(__ns AS DOUBLE) + {float(buckets)!r}))"
    pc = f"((CAST(__cbb AS DOUBLE) + 1.0) / (CAST({n} AS DOUBLE) + {float(buckets)!r}))"
    term = (
        f"CAST(CAST(CAST(({ps} * ln({ps} / {pc}))"
        f" AS DECIMAL(18,9)) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
    )
    return (
        dense.withColumn("__t9", F.expr(term))
        .groupBy(group_col)
        .agg(
            F.max("__ns").alias("n_tokens"),
            F.sum("__t9").alias("kl_q9"),
        )
    )
