"""Text-analysis operators for large-scale training-data pipelines.

The feature/fingerprint/shingle operators are pure
``pyspark.sql.functions`` column expressions — no Python UDFs — so
they run inside whole-stage codegen and scale linearly with input
splits (a 100 TB ``documents`` table is one embarrassingly-parallel
scan; no shuffle is introduced by those functions). The sole Python
boundary in this module is :func:`bpe_encode`'s Arrow-batched
segmenter, which runs over the DISTINCT-WORD relation (vocab-sized),
never the corpus.

Beyond-reference surface mandated by the build brief: language ID
(stopword-overlap heuristic), quality scoring (length / punctuation /
digit / stopword ratios), token counting (whitespace + BPE-ish regex)
and document fingerprinting (normalized-text digest).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df

# Top whitespace-tokenized stopwords per language, used for both the
# quality score and the language-ID heuristic. Deliberately small and
# hard-coded: deterministic, broadcast-free, codegen-able via isin().
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["de", "la", "que", "el", "en", "los", "del", "las", "por", "un"],
    "fr": ["le", "de", "la", "et", "les", "des", "en", "du", "que", "une"],
    "de": ["der", "die", "und", "das", "von", "den", "mit", "des", "auf", "ist"],
}

# A BPE-ish word/number/punct splitter: words (with leading apostrophes),
# numbers, and single non-space symbols — approximating byte-pair
# pre-tokenization rules used by GPT-style tokenizers.
BPE_TOKEN_RE = r"'?[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens; '' -> empty array (split quirk guarded)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish tokens via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-space chars / total chars (0 for empty)."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    digits = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits / n)


def _isin_fn(words: list[str]):
    """Single-arg lambda factory: F.filter treats 2-param callables as
    (element, index), so the word list must be closed over, not defaulted."""
    return lambda t: t.isin(words)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, _isin_fn(STOPWORDS[lang])))
    total = F.size(toks)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits / total)


def mean_word_length(text: Column) -> Column:
    toks = ws_tokens(text)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total_chars / F.size(toks))


def quality_score(text: Column, lang: str = "en") -> Column:
    """Heuristic [0,1] quality score: long-enough, word-like, low
    punctuation/digit noise, some stopwords (natural prose indicator)."""
    n_tok = token_count_ws(text)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_len = mean_word_length(text)
    wordlen_term = F.when((word_len >= 3) & (word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    digit_term = F.lit(1.0) - F.least(digit_ratio(text) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text, lang) * 4, F.lit(1.0))
    return F.round(
        (length_term + wordlen_term + punct_term + digit_term + stop_term) / 5.0, 4
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = ws_tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, _isin_fn(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax stopword-overlap language; 'unknown' when nothing matches.
    Ties break in fixed en > es > fr > de order for determinism."""
    scores = lang_scores(text)
    best_score = F.greatest(*scores.values())
    out = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):  # later when() wins -> earlier lang wins ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(out)
    return out


def normalized_text(text: Column) -> Column:
    """Canonical form for dedup/fingerprinting: lowercase, collapse all
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalized_text(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), the dedup unit for MinHash /
    Jaccard. Documents shorter than n words yield their full token join.

    Built as zip_with over n shifted slices of the token array rather
    than transform-over-sequence: expressions referenced inside a
    higher-order-function lambda are re-evaluated per ELEMENT, so a
    lambda touching the tokenization expr re-tokenizes the document for
    every gram; the zip_with lambdas only touch their element vars."""
    return F.array_distinct(word_grams(text, n))


def gram_hashes(text: Column, n: int = 3) -> Column:
    """POSITIONAL word n-gram 64-bit hashes — :func:`word_grams` without
    ever building the gram STRINGS: tokens are hashed once
    (``transform`` evaluates its input array once per row), then
    consecutive token hashes are folded with ``xxhash64`` over shifted
    slices — long math, no per-gram string concat/alloc. Used by hash-
    space dedup (MinHash), where only gram identity matters."""
    toks = ws_tokens(normalized_text(text))
    th = F.transform(toks, lambda t: F.xxhash64(t))
    k = F.size(th)
    m = F.greatest(k - (n - 1), F.lit(0))
    grams = F.slice(th, 1, m)
    for i in range(1, n):
        grams = F.zip_with(grams, F.slice(th, i + 1, m), lambda a, b: F.xxhash64(a, b))
    whole = F.aggregate(th, F.lit(0).cast("long"), lambda acc, x: F.xxhash64(acc, x))
    return F.when(
        k < n,
        F.when(k == 0, F.array().cast("array<long>")).otherwise(F.array(whole)),
    ).otherwise(grams)


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram hash set — :func:`shingles` in hash space
    (64-bit collisions are negligible for set semantics)."""
    return F.array_distinct(gram_hashes(text, n))


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: append the standard text-analysis feature columns."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe(t).alias("n_tokens_bpe"),
        punct_ratio(t).alias("punct_ratio"),
        digit_ratio(t).alias("digit_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality_score"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def word_grams(text: Column, n: int = 3) -> Column:
    """POSITIONAL word n-grams (duplicates kept, order preserved) — the
    winnowing unit. Same zip_with construction as :func:`shingles`
    (which is the distinct set of these)."""
    toks = ws_tokens(normalized_text(text))
    k = F.size(toks)
    m = F.greatest(k - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, i + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(
        k < n,
        F.when(k == 0, F.array().cast("array<string>")).otherwise(
            F.array(F.concat_ws(" ", toks))
        ),
    ).otherwise(grams)


def add_repetition_features(
    df: DataFrame, text_col: str = "text", *, n: int = 3
) -> DataFrame:
    """Within-document repetition: ``1 - distinct/total`` positional word
    n-grams (the Gopher-family quality signal — templated or looping text
    repeats its own n-grams). 0.0 for documents with no grams.

    Staged projection: the gram array is materialized ONCE per row, then
    both sizes read the attribute column (referencing the gram expression
    twice would evaluate the whole tokenize+zip pipeline twice)."""
    staged = df.withColumn("__rep_grams", word_grams(F.col(text_col), n))
    total = F.size(F.col("__rep_grams"))
    distinct = F.size(F.array_distinct(F.col("__rep_grams")))
    return staged.withColumn(
        f"repetition_{n}gram",
        F.when(total == 0, F.lit(0.0)).otherwise(
            F.round(1.0 - distinct / total, 4)
        ),
    ).drop("__rep_grams")


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 5,
    hashed: bool = False,
) -> DataFrame:
    """Benchmark decontamination: per-document fraction of distinct word
    n-grams that also appear in a benchmark/eval set. Training documents
    with high overlap leak the benchmark and inflate eval scores; the
    standard guard is an n-gram overlap scan of the full corpus.

    100 TB shape: the benchmark side is tiny (eval sets are thousands of
    docs) — its distinct gram set is BROADCAST with a hit flag, so the
    corpus side is ONE scan (the shingle pipeline evaluates once per
    row), a broadcast left-outer probe per gram, and a per-doc
    count/sum that partially aggregates map-side — the shuffle carries
    one (doc_id, n_grams, n_hits) row per doc per partition, not grams.
    Docs with zero grams (empty text) produce no explode rows and are
    absent from the result. Returns (id, n_grams, n_hits,
    contamination).

    Gram identity lives in 64-bit hash space (:func:`shingle_hashes`):
    no gram strings are ever built, the broadcast is 8 bytes per bench
    gram, and the join key is a long (collisions are negligible for
    overlap counting).

    ``hashed=True`` declares ``text_col`` to ALREADY hold gram-hash
    arrays: when corpus and benchmark are slices of one relation, the
    caller stages the shingle pass once and persists it instead of
    paying it per side (measured 3.1s -> 1.1s at sf0.1)."""
    gram_arr = (
        F.col(text_col) if hashed else shingle_hashes(F.col(text_col), n)
    )
    bench_grams = (
        benchmark.select(F.explode(gram_arr).alias("gram"))
        .distinct()
        .withColumn("__bhit", F.lit(1))
    )
    doc_grams = corpus.select(F.col(id_col), F.explode(gram_arr).alias("gram"))
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__bhit"), F.lit(0))).alias("n_hits"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_hits") / F.col("n_grams"), 4)
        )
    )


PII_PATTERNS: dict[str, str] = {
    # redaction order matters: specific → general, so an email's local
    # part is never half-eaten by the phone pattern first. Patterns are
    # RE2-safe (no backrefs/lookaround) so the same strings drive both
    # Spark (java.util.regex) and DuckDB (RE2) identically.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d().\- ]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Scrub personally-identifiable strings from a text column before
    it enters a training corpus: each pattern kind is counted and then
    replaced with a typed placeholder (``[PII:email]`` …), sequentially
    in ``patterns`` order. Counts are taken on the text as it stands
    BEFORE that kind's replacement, so overlapping kinds never double
    count (an IP inside an already-redacted email is gone by the time
    the ipv4 pass runs).

    100 TB shape: pure codegen — a chain of ``regexp_count`` /
    ``regexp_replace`` projections, zero shuffle, zero Python. Adds
    ``n_pii_<kind>`` counters and writes the scrubbed text to
    ``out_col`` (default: in place)."""
    pats = patterns or PII_PATTERNS
    out_name = out_col or text_col
    cur = F.col(text_col)
    result = df
    counters = []
    for kind, pat in pats.items():
        cname = f"n_pii_{kind}"
        counters.append(cname)
        result = result.withColumn(cname, F.regexp_count(cur, F.lit(pat)))
        # stage the replacement as a real column so each regex pass runs
        # once (chained F.regexp_replace expressions nest otherwise)
        result = result.withColumn(
            f"__red_{kind}", F.regexp_replace(cur, pat, f"[PII:{kind}]")
        )
        cur = F.col(f"__red_{kind}")
    result = result.withColumn(out_name, cur)
    return result.drop(*[f"__red_{k}" for k in pats])


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap —
    the context-window packing precursor for LLM training corpora.

    Windows start every ``chunk_size - overlap`` tokens; a start is
    emitted while it still contributes at least one new token, so the
    final chunk always reaches the document's end and a short document
    yields exactly one chunk. Output: one row per chunk with
    ``chunk_id`` (0-based), ``chunk_start`` (token offset),
    ``n_chunk_tokens`` and the chunk text.

    Scale shape: pure JVM expressions (split once per document in its
    own projection, then explode over a ``sequence`` of starts +
    ``slice``) — no Python, no shuffle; chunking 100 TB is a map-only
    pass that parallelizes with the scan."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    base = df.select(
        F.col(id_col),
        ws_tokens(normalized_text(F.col(text_col))).alias("__tk"),
    ).withColumn("__n", F.size("__tk"))
    # explode AFTER the tokens column is materialized in the row so the
    # split runs once per document, not once per chunk
    starts = base.withColumn(
        "chunk_start",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("__n") - F.lit(overlap + 1), F.lit(0)),
                F.lit(step),
            )
        ),
    )
    return starts.select(
        id_col,
        (F.col("chunk_start") / F.lit(step)).cast("int").alias("chunk_id"),
        "chunk_start",
        F.least(
            F.lit(chunk_size), F.col("__n") - F.col("chunk_start")
        ).cast("int").alias("n_chunk_tokens"),
        F.array_join(
            F.slice("__tk", F.col("chunk_start") + F.lit(1), F.lit(chunk_size)),
            " ",
        ).alias("chunk_text"),
    )


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 3,
    w: int = 4,
    out_col: str = "fingerprints",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (MOSS/rolling-hash family): hash
    the positional k-grams, then keep the MIN hash of every w-hash
    window; the distinct set of window-minima is the fingerprint set.
    Guarantees a shared fingerprint for any match of length >= w+k-1
    tokens, at ~2/(w+1) selection density.

    ``hash_fn``: ``"xxhash64"`` (default — fastest, JVM-native) or
    ``"md5"`` (top 60 bits of the standardized MD5 as a BIGINT — a few
    times costlier per gram, but reproducible by ANY engine, which is
    what makes the fingerprint set checkable against a SQL oracle and
    portable across storage systems).

    Built as staged projections so each lambda only touches an ATTRIBUTE
    column (expressions inside HOF lambdas re-evaluate per element)."""
    if hash_fn == "xxhash64":
        gram_hash = lambda g: F.xxhash64(g)  # noqa: E731
    elif hash_fn == "md5":
        gram_hash = lambda g: F.conv(  # noqa: E731
            F.substring(F.md5(g), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}: use 'xxhash64' or 'md5'")
    hashed = df.withColumn(
        "__wg_hashes",
        F.transform(word_grams(F.col(text_col), k), gram_hash),
    )
    n_h = F.size(F.col("__wg_hashes"))
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(n_h - (w - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("__wg_hashes"), i, w)),
    )
    return hashed.withColumn(
        out_col,
        F.when(n_h == 0, F.array().cast("array<long>")).otherwise(F.array_distinct(mins)),
    ).drop("__wg_hashes")


# ---------------------------------------------------------------------------
# vocab-based token-id encoding (the step before sequence packing)
# ---------------------------------------------------------------------------

def build_vocab(
    df, text_col: str = "text", *, size: int = 1000, min_df: int = 1
):
    """Top-``size`` tokens by DOCUMENT frequency (ties broken by token
    for determinism), assigned ids 1..size by (df desc, token) rank; id
    0 is reserved for <unk>. One explode + one aggregation; the result
    is K rows — always the broadcast side downstream."""
    from pyspark.sql import Window, functions as F

    toks = df.select(
        F.col(text_col).alias("__t"), F.monotonically_increasing_id().alias("__d")
    ).select("__d", F.explode(ws_tokens(F.lower(F.col("__t")))).alias("token"))
    dfreq = (
        toks.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    w = Window.orderBy(F.col("df").desc(), F.col("token").asc())
    return (
        dfreq.withColumn("token_id", F.row_number().over(w))
        .filter(F.col("token_id") <= size)
        .select("token", "token_id", "df")
    )


def encode_tokens(
    df,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    unk_id: int = 0,
):
    """Encode each document as an array of vocab ids (order-preserving;
    out-of-vocab tokens become ``unk_id``).

    Shape: posexplode keeps token position through the broadcast vocab
    join, and collect_list reassembles under a per-doc sort — the
    exchange carries (doc, pos, int) triples, never strings, and the
    vocab never leaves the broadcast side. At 100 TB the alternative —
    a map literal in a UDF — ships the vocab into every Python worker;
    this stays JVM-side."""
    from pyspark.sql import functions as F

    pos = df.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.lower(F.col(text_col)))).alias("pos", "token"),
    )
    joined = pos.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    ids = joined.select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(unk_id)).alias("tid"),
    )
    return (
        ids.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "tid"))
            ).alias("__ps")
        )
        .select(
            id_col,
            F.transform(F.col("__ps"), lambda s: s["tid"]).alias("token_ids"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus language-model statistics (unigram LM, BM25, BPE merge mining)

def unigram_token_logprobs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token-grain unigram log-probabilities: one exploded-token pass
    plus a vocab-sized count table (always KB-MB — the BROADCAST side)
    that flows back onto the token stream. Each log-probability is
    rounded to ``decimal(18,9)`` at TOKEN grain, so any downstream sum
    is exact and order-independent; callers must divide exactly once
    (decimal -> double) and never re-round a computed double back to
    decimal (shortest-repr vs exact-binary rounding diverges between
    engines at the boundary).

    Returns ``(id_col, tok, lp)``.
    """
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))  # 1 row
    lp = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "tok",
            F.log(F.col("cnt") / F.col("total")).cast("decimal(18,9)").alias("lp"),
        )
    )
    return toks.join(F.broadcast(lp), "tok").select(id_col, "tok", "lp")


def unigram_logprob_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram language-model score: the mean log-probability
    of the document's tokens under the corpus's own unigram distribution
    — the classic cheap perplexity proxy for quality filtering (low
    score = rare-token soup / noise; cf. the CCNet-style LM filters
    used in public training-data pipelines). One shuffle keyed by the
    document id over :func:`unigram_token_logprobs`.

    Returns ``(id_col, n_tokens, avg_logprob)``.
    """
    return (
        unigram_token_logprobs(df, text_col, id_col)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
        )
    )


def bigram_token_logprobs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: float = 0.5,
) -> DataFrame:
    """Bigram-grain conditional log-probabilities under the corpus's own
    add-k-smoothed bigram LM — one step up from the unigram proxy
    (:func:`unigram_token_logprobs`): it scores word ORDER, so shuffled
    or boilerplate-repetitive text separates from fluent text that the
    unigram model scores identically (the CCNet-style LM quality
    filter, one order higher).

    ``lp(w1, w2) = ln((c(w1,w2) + k) / (c(w1·) + k·V))`` where ``c(w1·)``
    counts w1 as a bigram HEAD and ``V`` is the distinct-bigram-tail
    vocabulary size. Each lp is rounded to ``decimal(18,9)`` at bigram
    grain so downstream sums are exact and order-independent (same
    discipline as the unigram operator — never re-round a computed
    double back to decimal).

    Scale shape: one exploded pass builds the position-aligned bigram
    stream (``posexplode`` + self-join on adjacent positions is
    avoided — ``slice``/``zip_with`` pairs tokens in-row, no shuffle);
    the bigram count table shuffles once on the bigram key and flows
    back onto the stream through a shuffle join (the bigram vocab can
    outgrow a broadcast at corpus scale, unlike the unigram table).

    Returns ``(id_col, w1, w2, lp)``.
    """
    toks = df.select(
        F.col(id_col), ws_tokens(F.lower(F.col(text_col))).alias("tk")
    ).filter(F.size("tk") >= 2)
    # in-row adjacent pairing: zip tk[0:n-1] with tk[1:n] — no shuffle
    pairs = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg_counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    head_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = bg_counts.select(F.countDistinct("w2").alias("v"))  # 1 row
    lp = (
        bg_counts.join(head_counts, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") + F.lit(k))
                / (F.col("c1") + F.lit(k) * F.col("v"))
            )
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    return pairs.join(lp, ["w1", "w2"]).select(id_col, "w1", "w2", "lp")


def bigram_group_logprob(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    k: float = 0.5,
) -> DataFrame:
    """Mean bigram log-probability per GROUP (source / shard / language)
    under the same add-k model as :func:`bigram_token_logprobs`, with
    the corpus-scale plan shape: the bigram stream is aggregated to
    ``(group, w1, w2, cnt)`` grain FIRST — the only corpus-sized
    exchange — and every later join/aggregate runs at (groups x
    bigram-vocab) grain or smaller. Joining the lp table back onto the
    raw bigram stream instead (the per-doc operator's shape) would
    re-shuffle the full corpus twice more. ``sum(lp * cnt)`` stays in
    exact decimal, so the grouped rollup equals the stream-grain mean
    bit-for-bit.

    Returns ``(group_col, n_bigrams, avg_logprob)``.
    """
    toks = df.select(
        F.col(group_col), ws_tokens(F.lower(F.col(text_col))).alias("tk")
    ).filter(F.size("tk") >= 2)
    pairs = toks.select(
        group_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select(group_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    cg = pairs.groupBy(group_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bg_counts = cg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    head_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = bg_counts.select(F.countDistinct("w2").alias("v"))  # 1 row
    lp = (
        bg_counts.join(head_counts, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c12") + F.lit(k))
                / (F.col("c1") + F.lit(k) * F.col("v"))
            )
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    return (
        cg.join(lp, ["w1", "w2"])
        .groupBy(group_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            # cnt rides decimal(12,0), NOT long: decimal(18,9) * long
            # promotes long to decimal(20,0) and the product precision
            # (18+20+1=39) overflows Spark's 38 cap, silently dropping
            # the 9th lp digit; (18,9)x(12,0) -> (31,9) stays exact
            (
                F.sum(F.col("lp") * F.col("cnt").cast("decimal(12,0)"))
                .cast("double")
                / F.sum("cnt")
            ).alias("avg_logprob"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 retrieval: top-k documents for a bag of query terms
    (Robertson-Sparck Jones idf, the standard Okapi formula) — the
    lexical-retrieval baseline every RAG / decontamination pipeline
    needs next to the ANN family (operators/similarity.py).

    Scale shape: corpus statistics (N, avgdl, per-term df) reduce to a
    handful of rows and broadcast back; the candidate set is only the
    documents containing >= 1 query term (an early filter on the
    exploded tokens, pushed before any join); the one real shuffle
    groups (doc, term) term frequencies. Per-term score contributions
    are ``decimal(18,9)``-rounded before the per-doc sum so the total
    is order-independent. Ties break by ``id_col`` for a deterministic
    result set.

    Returns the top-k ``(id_col, score)`` by descending score.
    """
    # document length is a map-side array size — exploding and
    # re-grouping the full token stream would shuffle the corpus on
    # doc id for a number the scan already knows (caught by plan audit:
    # this was the only corpus-sized exchange in the query)
    dl = df.select(
        F.col(id_col),
        F.size(ws_tokens(F.lower(F.col(text_col)))).alias("dl"),
    ).filter(F.col("dl") > 0)
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),  # sum(long)/count: exact, order-free
    )
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    tf = (
        toks.filter(F.col("tok").isin(list(query_terms)))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("dft") + F.lit(0.5))
                / (F.col("dft") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "contrib",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(18,9)"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("contrib").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", *, top_n: int = 20
) -> DataFrame:
    """First-iteration BPE merge mining: corpus-weighted adjacent
    character-pair frequencies within whitespace-pretokenized words —
    the statistic a byte-pair-encoding tokenizer trainer greedily
    merges on (Sennrich et al. 2016).

    Scale shape: the corpus collapses to a DISTINCT-WORD count table
    first (vocab-sized, regardless of corpus bytes), and the character
    pairs explode from that small relation — so a 100 TB corpus does
    one token shuffle to build word counts and then KB-scale work,
    instead of exploding character pairs from every occurrence. Pure
    integer counts: hash-stable by construction.

    Returns the top-``top_n`` ``(pair, freq)`` by descending frequency.
    """
    words = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        "wc",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(top_n)
    )


def train_bpe(
    df: DataFrame, text_col: str = "text", *, num_merges: int = 50
) -> list[tuple[str, str]]:
    """Train byte-pair-encoding merges (Sennrich et al. 2016) on the
    corpus's word-count table.

    The DISTRIBUTED step is the reduction of the corpus to distinct
    word counts — one shuffle, after which the statistics are
    vocab-sized (~10M rows max for web-scale corpora, MBs) regardless
    of corpus bytes. The merge loop itself then runs driver-local over
    those counts, exactly like every production BPE trainer (they all
    train on the aggregated word-count table, not the raw stream) and
    like this repo's other driver-reduce steps (k-means partials, PCA
    moments). Returns the ordered merge list.
    """
    rows = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .collect()
    )
    # segmentations: word -> (list of symbols, count)
    segs = {r["word"]: (list(r["word"]), int(r["wc"])) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, (parts, wc) in segs.items():
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wc
        if not counts:
            break
        # deterministic: max count, ties by pair text
        (a, b), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break
        merges.append((a, b))
        ab = a + b
        for word, (parts, wc) in segs.items():
            if a not in parts:
                continue
            out = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            segs[word] = (out, wc)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document with a trained merge list.

    Scale shape: the merge loop runs ONCE PER DISTINCT WORD — the
    corpus collapses to its vocabulary (one shuffle), an Arrow-batched
    UDF segments that vocab-sized relation, and the word->segments map
    broadcasts back onto the token stream where per-doc arrays
    reassemble under the posexplode/regroup pattern of
    :func:`encode_tokens`. The merge list ships in the task closure
    (KBs). Returns (id_col, bpe_tokens array<string>, n_bpe_tokens).
    """
    from pyspark.sql.functions import pandas_udf

    merge_list = list(merges)

    @pandas_udf("array<string>")
    def segment(words: pd.Series) -> pd.Series:
        ranks = {p: i for i, p in enumerate(merge_list)}

        def seg(w):
            parts = list(w)
            while len(parts) > 1:
                best_i, best_rank = -1, len(ranks)
                for i in range(len(parts) - 1):
                    r = ranks.get((parts[i], parts[i + 1]))
                    if r is not None and r < best_rank:
                        best_i, best_rank = i, r
                if best_i < 0:
                    break
                parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
            return parts

        return words.map(seg)

    pos = df.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    vocab = pos.select("word").distinct().withColumn("segs", segment(F.col("word")))
    joined = pos.join(F.broadcast(vocab), "word")
    return (
        joined.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "segs"))).alias("__ps"))
        .select(
            id_col,
            F.flatten(
                F.transform(F.col("__ps"), lambda s: s["segs"])
            ).alias("bpe_tokens"),
        )
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )


def edit_distance_pairs(
    df: DataFrame, text_col: str = "text", *, max_len: int = 24
) -> DataFrame:
    """Typo-pairs over the corpus vocabulary: all DISTINCT word pairs at
    Levenshtein distance <= 1, found by deletion-neighborhood blocking
    (the SymSpell recipe, public domain: two words are within one edit
    iff they share a single-deletion variant — substitution deletes the
    same position on both sides, insert/delete makes one word a variant
    of the other). The all-pairs formulation is O(V^2) levenshtein
    calls; blocking is O(V * len) variant rows and an equi-join, with
    the exact distance check only on candidates.

    Scale shape: everything runs at VOCAB scale — the corpus collapses
    to distinct words first (one shuffle), variants explode from that
    small relation, and the blocking join keys on the variant string.
    ``max_len`` caps pathological tokens (URLs, DNA strings) whose
    variant fan-out is unbounded. Returns (word_a, word_b, dist) with
    word_a < word_b.
    """
    words = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .distinct()
        .filter(F.length("word") <= max_len)
    )
    variants = words.select(
        "word",
        F.explode(
            F.array_union(
                F.array(F.col("word")),
                F.expr(
                    "transform(sequence(1, length(word)), i -> "
                    "concat(substring(word, 1, i - 1), "
                    "substring(word, i + 1, length(word))))"
                ),
            )
        ).alias("variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    return (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b"))
        .distinct()
        .withColumn("dist", F.levenshtein("word_a", "word_b"))
        .filter(F.col("dist") <= 1)
    )


# Required stop words for the Gopher quality rule ("must contain at
# least 2 of ..."); the published list from the Gopher paper's quality
# heuristics (Rae et al. 2021, appendix A — public knowledge).
GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, appendix A):
    per-document pass/fail flags for each published heuristic plus the
    conjunction ``gopher_keep``. Defaults are the paper's thresholds.

    Pure codegen column expressions over one scan — no UDF, no shuffle
    (the 100 TB shape is the same embarrassingly-parallel pass as
    ``add_text_features``). All emitted columns are BOOLEAN/BIGINT so
    downstream engine-boundary hashing never sees a float (the ratios
    exist only inside comparisons). Beyond-reference surface (the
    reference has no corpus-quality filtering; its transform registry
    is column-typed casts, light_transform.py)."""
    text = F.col(text_col)
    toks = ws_tokens(text)
    n_words = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    # lines: literal newline split; a no-newline doc is one line
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•▪●]|[0-9]+[.)])\s"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    hash_count = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    ellipsis_count = F.size(F.regexp_extract_all(text, F.lit(r"(\.\.\.|…)"), 0))
    stop_hits = sum(
        (
            F.array_contains(toks, w).cast("int")
            for w in GOPHER_REQUIRED_STOPWORDS
        ),
        F.lit(0),
    )
    pass_word_count = (n_words >= min_words) & (n_words <= max_words)
    pass_mean_word_len = F.when(n_words == 0, F.lit(False)).otherwise(
        (total_chars >= F.lit(min_mean_word_len) * n_words)
        & (total_chars <= F.lit(max_mean_word_len) * n_words)
    )
    pass_symbol_ratio = F.when(n_words == 0, F.lit(False)).otherwise(
        (hash_count + ellipsis_count) <= F.lit(max_symbol_word_ratio) * n_words
    )
    pass_bullet = bullet_lines < F.lit(max_bullet_line_frac) * n_lines
    pass_ellipsis_lines = ellipsis_lines < F.lit(max_ellipsis_line_frac) * n_lines
    pass_alpha = F.when(n_words == 0, F.lit(False)).otherwise(
        alpha_words >= F.lit(min_alpha_word_frac) * n_words
    )
    pass_stopwords = stop_hits >= min_required_stopwords
    flags = {
        "n_words": n_words.cast("long"),
        "pass_word_count": pass_word_count,
        "pass_mean_word_len": pass_mean_word_len,
        "pass_symbol_ratio": pass_symbol_ratio,
        "pass_bullet_lines": pass_bullet,
        "pass_ellipsis_lines": pass_ellipsis_lines,
        "pass_alpha_words": pass_alpha,
        "pass_stopwords": pass_stopwords,
    }
    out = df
    for name, col in flags.items():
        out = out.withColumn(name, col)
    keep = F.lit(True)
    for name in flags:
        if name.startswith("pass_"):
            keep = keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_line_words: int = 3,
    min_kept_lines: int = 5,
    banned_substrings: tuple = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020, section 2.2): keep
    only lines that end in terminal punctuation AND have at least
    ``min_line_words`` words; drop the whole page when fewer than
    ``min_kept_lines`` lines survive or a banned substring appears
    ("lorem ipsum", a curly brace). Adds ``n_lines``,
    ``n_kept_lines`` (BIGINT), ``c4_keep`` (BOOLEAN) and
    ``text_clean`` (the surviving lines rejoined with newlines).

    Same scale shape as :func:`gopher_quality_flags`: one codegen-only
    pass, no UDF, no shuffle — line arrays live per-row and are
    document-bounded."""
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike("[.!?\"]$")
        & (F.size(ws_tokens(ln)) >= min_line_words),
    )
    banned = F.lit(False)
    for s in banned_substrings:
        banned = banned | F.lower(text).contains(s.lower())
    return (
        df.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn(
            "c4_keep", (F.size(kept) >= min_kept_lines) & ~banned
        )
        .withColumn("text_clean", F.array_join(kept, "\n"))
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    *,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    language, split documents into head/middle/tail thirds by LM score
    — head = lowest perplexity (here the corpus-unigram proxy of
    :func:`unigram_logprob_features`, the same cheap stand-in the
    quality-filter family uses). The published pipeline keeps head+
    middle as its quality cut; this operator returns the per-bucket
    accounting (docs, tokens, score range) a user sizes that decision
    with.

    Scale shape — deliberately NOT a per-language ``ntile``: a global
    rank window puts an entire language in ONE task at 100 TB. Instead
    scores quantize to 1e-4 resolution, the (lang, score) HISTOGRAM
    (bounded: langs x <=~20k distinct quantized values) shuffles to the
    driver, exact rank-quantile thresholds come from a cumulative walk
    over it, and bucket assignment returns to the data as a pure
    codegen comparison chain — the CCNet recipe itself (thresholds
    learned once, applied map-side). Ties share a bucket
    deterministically; bucket 0 is the head.

    Returns (lang, bucket, n_docs, n_tokens, min_p_q4, max_p_q4)
    ordered by (lang, bucket), where p_q4 = -floor(avg_logprob*1e4+0.5)
    rises with perplexity.
    """
    import math

    scored = (
        unigram_logprob_features(df, text_col, id_col)
        .join(df.select(F.col(id_col), F.col(lang_col)), id_col)
        .withColumn(
            "p_q4",
            (-F.floor(F.col("avg_logprob") * 1e4 + F.lit(0.5))).cast("long"),
        )
    )
    hist = (
        scored.groupBy(lang_col, "p_q4")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(lang_col, "p_q4")
        .collect()
    )
    by_lang: dict = {}
    for r in hist:
        by_lang.setdefault(r[lang_col], []).append((r["p_q4"], r["__c"]))
    bounds_by_lang: dict = {}
    for lang, rows in by_lang.items():
        total = sum(c for _, c in rows)
        targets = [
            math.ceil(total * i / n_buckets) for i in range(1, n_buckets)
        ]
        bounds, cum, idx = [], 0, 0
        for p, c in rows:
            cum += c
            while idx < len(targets) and cum >= targets[idx]:
                bounds.append(p)
                idx += 1
        bounds_by_lang[lang] = bounds
    bucket = F.lit(0)
    # eqNullSafe: a NULL language is its own group (the hostile-NULLs
    # drop shape), and must route to ITS thresholds, not fall through
    for lang, bounds in sorted(
        bounds_by_lang.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
    ):
        expr = F.lit(0)
        for b in bounds:
            expr = expr + (F.col("p_q4") > F.lit(int(b))).cast("int")
        key = F.lit(lang) if lang is not None else F.lit(None).cast("string")
        bucket = F.when(F.col(lang_col).eqNullSafe(key), expr).otherwise(bucket)
    return (
        scored.withColumn("bucket", bucket.cast("long"))
        .groupBy(lang_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("p_q4").alias("min_p_q4"),
            F.max("p_q4").alias("max_p_q4"),
        )
        .orderBy(lang_col, "bucket")
    )


def bigram_pmi_topk(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    classic corpus-analysis surfacing of multi-word expressions
    ("new york", "machine learning") that co-occur far above chance::

        pmi(w1, w2) = ln( (c12 / Nb) / ((c1h / Nb) * (c2t / Nb)) )
                    = ln( c12 * Nb / (c1h * c2t) )

    with c1h / c2t the HEAD / TAIL marginals of the bigram-slot table
    (both derived from one bigram count, no second corpus pass) and a
    ``min_count`` support floor — PMI's known low-frequency pathology
    (a hapax pair has maximal PMI) is cut before ranking, the standard
    practice. PMI is quantized to nanolog BIGINT via the ln-at-9dp
    pattern, so the ranking and values are engine-portable; the
    (pmi, w1, w2) sort is a total order.

    Scale shape: in-row adjacent pairing (slice + arrays_zip, no
    shuffle), ONE shuffle to the bigram count table, marginals as
    KB-scale rollups of that table, Nb collected as a bounded scalar,
    and the top-k plans as TakeOrdered (per-partition heaps, no global
    sort).
    """
    toks = df.select(
        ws_tokens(F.lower(F.col(text_col))).alias("tk")
    ).filter(F.size("tk") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    heads = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    tails = bg.groupBy("w2").agg(F.sum("c12").alias("c2"))
    nb = int(bg.agg(F.sum("c12")).first()[0] or 0)
    if nb == 0:
        return _rows_df(df.sparkSession, 
            [], "w1 string, w2 string, c12 long, pmi_q9 long"
        )
    return (
        bg.filter(F.col("c12") >= min_count)
        .join(heads, "w1")
        .join(tails, "w2")
        .withColumn(
            # operands double-cast at the leaves: a bare 1.0 in a Spark
            # expr string is a DECIMAL literal and truncates the ratio
            # (see sampling.dsir_lam_table's note)
            "pmi_q9",
            F.expr(
                f"CAST(CAST(CAST(ln((CAST(c12 AS DOUBLE)"
                f" * CAST({nb} AS DOUBLE))"
                f" / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))"
                f" AS DECIMAL(18,9))"
                f" AS DECIMAL(28,9)) * 1000000000 AS BIGINT)"
            ),
        )
        .select("w1", "w2", "c12", "pmi_q9")
        .orderBy(F.col("pmi_q9").desc(), "w1", "w2")
        .limit(k)
    )


def zipf_slope_topk(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 100,
) -> DataFrame:
    """Zipf's-law fit over the top-``k`` token frequencies: the least-
    squares slope of ln(count) on ln(rank) — a healthy natural-language
    corpus sits near -1; a corpus of templated/generated text or one
    wrecked by dedup bugs drifts off it, which makes the slope a cheap
    whole-corpus health check.

    Engine-portable fit: ranks come from the (count desc, token) total
    order; each ln quantizes to DECIMAL(18,4) ten-thousandths (the
    ln-at-fixed-dp pattern — 4dp keeps every product and the k-scaled
    regression sums inside BIGINT: |ln| <= 35 -> q4 <= 3.5e5, k*Sxy <=
    ~1e15), the closed-form slope numerator/denominator are exact
    integer sums, and only the final division runs in double, canonized
    at 1e-6. Operands are double-cast at the leaves (Spark expr decimal
    literal trap).

    Scale shape: one token-count shuffle; top-k plans as TakeOrdered;
    the rank window runs over k rows BY CONSTRUCTION (bounded, single
    task is the right plan). Returns (n_tokens_ranked, top_token,
    top_count, slope_q6).
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(k)
    )
    ranked = top.withColumn(
        "r",
        F.row_number().over(W.orderBy(F.col("cnt").desc(), "tok")),
    )
    q = (
        ranked.withColumn(
            "x",
            F.expr(
                "CAST(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(18,4))"
                " * 10000 AS BIGINT)"
            ),
        )
        .withColumn(
            "y",
            F.expr(
                "CAST(CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,4))"
                " * 10000 AS BIGINT)"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            # rank-1 row = (max cnt, MIN token on ties) — min over the
            # (-cnt, tok) struct matches the row_number order exactly
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("negcnt"),
                    F.col("tok").alias("tok"),
                    F.col("cnt").alias("cnt"),
                )
            ).alias("top1"),
        )
    )
    return q.select(
        F.col("n").alias("n_tokens_ranked"),
        F.col("top1.tok").alias("top_token"),
        F.col("top1.cnt").alias("top_count"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE"
            " CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)"
            " AS BIGINT) END"
        ).alias("slope_q6"),
    )
