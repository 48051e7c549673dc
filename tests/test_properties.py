"""Property-based tests (hypothesis) for the parity-riskiest pieces:
magic-date arithmetic, the expression parser's root-level splitting, and
Spark-vs-driver DateMagic agreement over a bulk serial range."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from cdk_datalake_ingest_upeu_spark.functions.dates import (
    MAGIC_OFFSET,
    date_to_magic,
    magic_to_date,
)
from cdk_datalake_ingest_upeu_spark.functions.parser import ExpressionParser


@given(st.dates(min_value=dt.date(1850, 1, 1), max_value=dt.date(2149, 12, 31)))
def test_magic_date_roundtrip(d):
    assert magic_to_date(date_to_magic(d)) == d


@given(st.integers(min_value=MAGIC_OFFSET - 18262, max_value=MAGIC_OFFSET + 91311))
def test_magic_serial_roundtrip_and_monotone(serial):
    d = magic_to_date(serial)
    assert date_to_magic(d) == serial
    assert magic_to_date(serial + 1) == d + dt.timedelta(days=1)


_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
# no leading/trailing whitespace: the splitter strips params (reference
# sanitization), so whitespace-padded literals can't round-trip exactly —
# and never occur in shipped configs
_LITERAL = st.from_regex(
    r"\$?[A-Za-z0-9_.\-]([A-Za-z0-9 _.\-]{0,8}[A-Za-z0-9_.\-])?", fullmatch=True
)


def _expr_strategy():
    """Random nested fn_transform-style call trees rendered to strings."""
    leaf = st.one_of(_IDENT, _LITERAL)

    def call(children):
        return st.tuples(_IDENT, st.lists(children, min_size=1, max_size=4)).map(
            lambda t: f"fn_{t[0]}({','.join(t[1])})"
        )

    return st.recursive(leaf, call, max_leaves=8)


@given(st.lists(_expr_strategy(), min_size=1, max_size=5))
def test_split_params_inverts_join(params):
    """Joining param strings with ',' then splitting must round-trip, for
    any nesting depth (no quotes involved)."""
    joined = ",".join(params)
    assert ExpressionParser.split_params(joined) == params


@given(_expr_strategy())
def test_parse_call_shape(expr):
    parsed = ExpressionParser().parse(expr)
    assert parsed is not None
    if expr.startswith("fn_") and expr.endswith(")"):
        assert parsed.kind == "call"
        assert expr.startswith(parsed.name + "(")
    else:
        assert parsed.kind == "column"
        assert parsed.name == expr


@settings(deadline=None, max_examples=10)
@given(st.data())
def test_quoted_commas_do_not_split(data):
    inner = data.draw(st.from_regex(r"[a-z, ()]{0,15}", fullmatch=True))
    quoted = f'"{inner}"'
    params = ["a", quoted, "b"]
    assert ExpressionParser.split_params(",".join(params)) == params


def test_spark_datemagic_agrees_with_driver_bulk(spark):
    """One Spark job: fn_transform_DateMagic over 4000 serials spanning
    1900..2109 must equal the driver-side magic_to_date for every row."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.config.models import ColumnSpec
    from cdk_datalake_ingest_upeu_spark.functions.engine import TransformationEngine

    serials = list(range(MAGIC_OFFSET, MAGIC_OFFSET + 76700, 19))  # ~210 years
    src = spark.createDataFrame([(s,) for s in serials], "serial int").withColumn(
        "serial_str", F.col("serial").cast("string")
    )
    cols = [
        ColumnSpec("serial", 1, "int", "serial"),
        ColumnSpec("fecha", 2, "date", "fn_transform_DateMagic(serial_str,yyyy-MM-dd,to_null)"),
    ]
    out = TransformationEngine().apply(src, cols).df
    got = {r.serial: r.fecha for r in out.collect()}
    for s in serials:
        assert got[s] == magic_to_date(s), f"serial {s}: {got[s]} != {magic_to_date(s)}"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=500),    # seconds offset
            st.booleans(),                              # left/right side
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_interval_join_equals_bruteforce(spark, rows):
    """interval_join == filter over the full per-key product for random
    event layouts (inclusive [-60s, 0] bounds)."""
    import datetime as dt_

    from cdk_datalake_ingest_upeu_spark.operators.joins import interval_join

    t0 = dt_.datetime(2024, 1, 1)
    left_rows, right_rows = [], []
    for i, (k, off, is_left) in enumerate(rows):
        (left_rows if is_left else right_rows).append(
            (k, t0 + dt_.timedelta(seconds=off), i)
        )
    if not left_rows or not right_rows:
        return
    left = spark.createDataFrame(left_rows, "k int, lt timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k int, rt timestamp, rid long")
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "k", "lt", "rt", lower="-60 seconds", upper="0 seconds"
        ).collect()
    }
    expect = {
        (lid, rid)
        for (lk, lt, lid) in left_rows
        for (rk, rt, rid) in right_rows
        if lk == rk and lt - dt_.timedelta(seconds=60) <= rt <= lt
    }
    assert got == expect


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=80
    ),
    k=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=25, deadline=None)
def test_exact_quantile_bounds_rank_property(spark, vals, k):
    """Boundary i must be the SMALLEST value whose cumulative count
    reaches ceil(total * i / k) — checked against a brute-force rank
    walk on arbitrary multisets (ties, skew, tiny inputs)."""
    import math

    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        exact_quantile_bounds,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, q double"
    )
    bounds, total = exact_quantile_bounds(df, "q", k)
    assert total == len(vals)
    ordered = sorted(vals)
    for i, b in enumerate(bounds, start=1):
        target = math.ceil(total * i / k)
        below = sum(1 for v in ordered if v <= b)
        strictly_below = sum(1 for v in ordered if v < b)
        assert below >= target          # b reaches the rank target
        assert strictly_below < target  # and is the smallest such value


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.decimals(
                min_value=-1000, max_value=1000, places=2, allow_nan=False
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_additive_merge_equals_oneshot_any_partition(spark, rows, n_batches):
    """PROPERTY: merging the partials of ANY partition of a dataset, in
    order, equals the one-shot aggregate — the algebraic-aggregate
    invariant incremental rollup maintenance rests on."""
    from cdk_datalake_ingest_upeu_spark.operators.rollup import (
        additive_merge,
        rollup_partial,
    )

    data = [(k, float(v)) for k, v in rows]
    df = spark.createDataFrame(data, "k string, v double")
    kw = dict(
        sum_cols={"v": "CAST(v AS DECIMAL(12,2))"},
        min_cols={"v": "v"},
        max_cols={"v": "v"},
    )
    oneshot = {r.k: r for r in rollup_partial(df, ["k"], **kw).collect()}

    merged = None
    for i in range(n_batches):
        batch = df.filter(f"pmod(hash(k, v), {n_batches}) = {i}")
        if not batch.take(1):
            continue
        merged = additive_merge(merged, rollup_partial(batch, ["k"], **kw), ["k"])
    got = {r.k: r for r in merged.collect()}
    assert set(got) == set(oneshot)
    for k in got:
        assert got[k].n_rows == oneshot[k].n_rows
        assert got[k].sum_v == oneshot[k].sum_v
        assert got[k].min_v == oneshot[k].min_v
        assert got[k].max_v == oneshot[k].max_v


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.from_regex(r"[a-z]{1,8}", fullmatch=True), min_size=1, max_size=15
    ),
    st.integers(min_value=0, max_value=12),
)
def test_bpe_encoding_is_lossless(spark, words, num_merges):
    """PROPERTY: BPE segmentation is lossless — concatenating a word's
    segments reproduces the word exactly, for merges trained on any
    corpus at any merge budget."""
    from cdk_datalake_ingest_upeu_spark.operators.text import (
        bpe_encode,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = train_bpe(df, num_merges=num_merges)
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    for i, w in enumerate(words):
        assert "".join(got[i]) == w
        assert len(got[i]) >= 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.one_of(st.none(), st.sampled_from(["ok", "warn", "bad"])),
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-100, max_value=100, allow_nan=False, width=32
                ),
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_expectations_counts_match_python_ground_truth(spark, rows):
    """PROPERTY: every rule kind's violation count equals a plain-Python
    recount over the same rows — NULL semantics included (NULL never
    violates accepted_values/between; it does violate not_null; unique
    counts only non-NULL duplicates)."""
    from cdk_datalake_ingest_upeu_spark.operators.expectations import (
        Expectation,
        expectations_report,
    )

    data = [(i, a, b, float(c) if c is not None else None)
            for i, (a, b, c) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, a long, b string, c double")
    rules = [
        Expectation("a_not_null", "a", "not_null"),
        Expectation("a_unique", "a", "unique"),
        Expectation("b_ok", "b", "accepted_values", {"values": ["ok", "warn"]}),
        Expectation("c_range", "c", "between", {"lo": -10.0, "hi": 10.0}),
    ]
    got = {r.rule: r.n_violations for r in expectations_report(df, rules).collect()}

    a_vals = [a for _, a, _, _ in data]
    non_null_a = [a for a in a_vals if a is not None]
    expect = {
        "a_not_null": sum(1 for a in a_vals if a is None),
        "a_unique": len(non_null_a) - len(set(non_null_a)),
        "b_ok": sum(1 for _, _, b, _ in data if b is not None and b not in ("ok", "warn")),
        "c_range": sum(
            1 for _, _, _, c in data if c is not None and (c < -10.0 or c > 10.0)
        ),
    }
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=96),   # hour offset
            st.sampled_from(["a", "b"]),
            st.floats(min_value=0, max_value=99, allow_nan=False, width=16),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_gapfill_is_dense_and_total_preserving(spark, rows):
    """PROPERTY of the gap-fill shape: the filled grid is DENSE (every
    hour in [min,max] x every type), zero rows appear exactly where the
    rollup had no bucket, and totals are preserved."""
    import datetime as _dt

    from pyspark.sql import functions as F

    base = _dt.datetime(2024, 3, 1)
    data = [
        (base + _dt.timedelta(hours=h), t, float(v)) for h, t, v in rows
    ]
    df = spark.createDataFrame(data, "ts timestamp, event_type string, value double")
    hourly = df.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hourly.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h")
    )
    types = df.select("event_type").distinct()
    grid = spine.crossJoin(types)
    filled = grid.join(hourly, ["h", "event_type"], "left").select(
        "h", "event_type", F.coalesce("n", F.lit(0)).alias("n")
    )
    got = filled.collect()
    hours = sorted({h for h, _, _ in ((r.h, r.event_type, r.n) for r in got)})
    n_types = types.count()
    span = int((max(hours) - min(hours)).total_seconds() // 3600) + 1
    assert len(got) == span * n_types          # dense grid
    assert sum(r.n for r in got) == len(data)  # totals preserved
    assert all(r.n >= 0 for r in got)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=12),
    st.lists(st.integers(min_value=-5, max_value=60), min_size=1, max_size=15),
)
def test_pit_join_total_and_unique(spark, version_starts, fact_times):
    """PROPERTY: against any SCD2 history (distinct starts, contiguous
    intervals), a PIT join returns EXACTLY one row per fact, and the
    matched version is the floor of the fact's ts among starts."""
    from cdk_datalake_ingest_upeu_spark.operators.scd import (
        scd2_point_in_time_join,
    )

    starts = sorted(set(version_starts))
    hist_rows = []
    for i, s in enumerate(starts):
        nxt = starts[i + 1] if i + 1 < len(starts) else None
        hist_rows.append((1, f"v{i}", s, nxt))
    hist = spark.createDataFrame(
        hist_rows, "k long, ver string, valid_from long, valid_to long"
    )
    facts = spark.createDataFrame(
        [(i, 1, t) for i, t in enumerate(fact_times)],
        "fact_id long, k long, ts long",
    )
    got = {r.fact_id: r.ver for r in scd2_point_in_time_join(facts, hist, "k", "ts").collect()}
    assert len(got) == len(fact_times)  # exactly one row per fact
    for i, t in enumerate(fact_times):
        eligible = [j for j, s in enumerate(starts) if s <= t]
        expect = f"v{eligible[-1]}" if eligible else None
        assert got[i] == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from([0.5, 1.0, 2.0, 3.5, 10.0, 50.0]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_matches_exact_aes_formula(spark, rows, n):
    """PROPERTY: the selected set equals a Python recompute of the A-ES
    rank u^(1/w) from the same md5-derived uniform — the Spark
    expression implements the formula exactly, not just directionally."""
    import hashlib

    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.sampling import (
        weighted_hash_sample,
    )

    data = [(k, float(w)) for k, w in rows]
    df = spark.createDataFrame(data, "id long, w double")
    got = {
        r.id for r in weighted_hash_sample(df, "id", F.col("w"), n).collect()
    }

    def rank(k, w):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        return u ** (1.0 / w)

    expect = {
        k for k, _ in sorted(data, key=lambda t: (-rank(*t), t[0]))[: min(n, len(data))]
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    members=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
        max_size=60, unique=True,
    ),
    probes=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
        max_size=60, unique=True,
    ),
)
def test_bloom_filter_no_false_negatives_property(spark, members, probes):
    """For ANY key set: every member passes might_contain (the Bloom
    guarantee has no exceptions), and a merge of two disjoint builds
    behaves like a build over the union."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
    )

    mdf = spark.createDataFrame([(m,) for m in members], "k long")
    bf = bloom_build(mdf, "k", n_bits=1 << 10, n_hashes=3)
    assert mdf.filter(bf.might_contain(F.col("k"))).count() == len(members)

    half = len(members) // 2 or 1
    a = bloom_build(
        spark.createDataFrame([(m,) for m in members[:half]], "k long"),
        "k", n_bits=1 << 10, n_hashes=3,
    )
    b = bloom_build(
        spark.createDataFrame([(m,) for m in members[half:]] or [(members[0],)], "k long"),
        "k", n_bits=1 << 10, n_hashes=3,
    )
    merged = bloom_merge(a, b)
    assert mdf.filter(merged.might_contain(F.col("k"))).count() == len(members)


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1,
        max_size=80, unique=True,
    ),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_global_ids_rank_property(spark, keys, n_parts):
    """assign_global_ids equals rank-in-sorted-order for ANY unique key
    set and partition count."""
    from pyspark.sql import functions as F

    from cdk_datalake_ingest_upeu_spark.operators.indexing import (
        assign_global_ids,
    )
    from cdk_datalake_ingest_upeu_spark.operators.scratch import release_scratch

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    try:
        got = {
            r.k: r.global_id
            for r in assign_global_ids(df, "k", num_partitions=n_parts).collect()
        }
    finally:
        release_scratch()
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


# --- stats-pruning soundness (versioned-table data skipping) -------------

_PRUNE_OPS = ["=", "==", "<", "<=", ">", ">=", "<>", "!="]


def _tri_eval(op, val, lit):
    """SQL tri-valued comparison: None (NULL) -> unknown (False for
    'row matches'); mixed types never occur (strategy keeps columns
    typed)."""
    if val is None:
        return False
    if isinstance(val, float) and val != val:  # NaN: Spark treats NaN
        # as greater than any non-NaN value in comparisons
        if isinstance(lit, float) and lit != lit:
            return op in ("=", "==", "<=", ">=")
        return {
            "=": False, "==": False, "<>": True, "!=": True,
            "<": False, "<=": False, ">": True, ">=": True,
        }[op]
    if op in ("=", "=="):
        return val == lit
    if op in ("<>", "!="):
        return val != lit
    if op == "<":
        return val < lit
    if op == "<=":
        return val <= lit
    if op == ">":
        return val > lit
    return val >= lit


@given(
    data=st.data(),
    n_files=st.integers(min_value=1, max_value=4),
    n_conj=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=300, deadline=None)
def test_prune_candidate_files_never_skips_a_matching_file(
    data, n_files, n_conj
):
    """SOUNDNESS property: for any generated per-file contents, the
    stats built with the production rules (NaN->unknown bound, string
    min truncated to a prefix / max dropped when long), and any
    condition in the supported fragment, a file containing a row where
    the conjunction is TRUE must survive pruning. (Completeness — that
    pruning removes anything — is NOT required; an over-conservative
    pruner is merely slow, an under-conservative one corrupts DELETE.)"""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        prune_candidate_files,
    )

    int_vals = st.one_of(st.none(), st.integers(-50, 50))
    dbl_vals = st.one_of(
        st.none(),
        st.floats(
            min_value=-50, max_value=50, allow_nan=False,
            allow_infinity=False,
        ),
        st.just(float("nan")),
    )
    str_vals = st.one_of(
        st.none(), st.from_regex(r"[a-c]{0,80}", fullmatch=True)
    )
    cols = {"k": int_vals, "d": dbl_vals, "s": str_vals}
    cap = 64
    files, stats = [], {}
    contents = {}
    for fi in range(n_files):
        name = f"f{fi}"
        files.append(name)
        rows = data.draw(
            st.lists(
                st.fixed_dictionaries(
                    {c: strat for c, strat in cols.items()}
                ),
                min_size=0,
                max_size=6,
            )
        )
        contents[name] = rows
        st_f = {}
        for c in cols:
            vals = [r[c] for r in rows if r[c] is not None]
            nonnan = [
                v for v in vals
                if not (isinstance(v, float) and v != v)
            ]
            has_nan = len(nonnan) != len(vals)
            lo = min(nonnan) if nonnan else None
            # production rule: any NaN makes max() NaN -> unknown bound
            hi = None if has_nan else (max(nonnan) if nonnan else None)
            if c == "s":
                if lo is not None and len(lo) > cap:
                    lo = lo[:cap]
                if hi is not None and len(hi) > cap:
                    hi = None
            st_f[c] = [lo, hi]
        stats[name] = st_f
    conjs = []
    for _ in range(n_conj):
        c = data.draw(st.sampled_from(list(cols)))
        op = data.draw(st.sampled_from(_PRUNE_OPS))
        if c == "k":
            lit = data.draw(st.integers(-50, 50))
            lit_txt = str(lit)
        elif c == "d":
            lit = data.draw(
                st.floats(
                    min_value=-50, max_value=50, allow_nan=False,
                    allow_infinity=False,
                )
            )
            lit_txt = repr(lit)
        else:
            lit = data.draw(st.from_regex(r"[a-c]{0,80}", fullmatch=True))
            lit_txt = f"'{lit}'"
        conjs.append((c, op, lit, f"{c} {op} {lit_txt}"))
    condition = " AND ".join(txt for _, _, _, txt in conjs)
    candidates = set(
        prune_candidate_files(
            files, stats, condition, stat_cols=set(cols)
        )
    )
    for name, rows in contents.items():
        has_match = any(
            all(_tri_eval(op, r[c], lit) for c, op, lit, _ in conjs)
            for r in rows
        )
        if has_match:
            assert name in candidates, (
                name, condition, stats[name], rows
            )


@given(
    left=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 120)),
        min_size=1,
        max_size=10,
    ),
    right=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 120),
            st.integers(-5, 5),
        ),
        min_size=0,
        max_size=10,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 10]),
)
@settings(max_examples=10, deadline=None)
def test_asof_join_equals_bruteforce(spark, left, right, direction, tol):
    """asof_join (both directions, with and without tolerance) equals
    the per-row brute force: the single nearest right row at-or-before
    (backward) / at-or-after (forward) per key, discarded when outside
    the tolerance window — pandas merge_asof semantics. Right times are
    deduped per key (ties make the match ambiguous by definition)."""
    import datetime as _dt

    from cdk_datalake_ingest_upeu_spark.operators.joins import asof_join

    epoch = _dt.datetime(2024, 1, 1)
    seen = set()
    r_rows = []
    for k, rt, p in right:
        if (k, rt) not in seen:
            seen.add((k, rt))
            r_rows.append((k, epoch + _dt.timedelta(seconds=rt), p))
    l_df = spark.createDataFrame(
        [(k, epoch + _dt.timedelta(seconds=t)) for k, t in left],
        "id string, t timestamp",
    )
    r_df = spark.createDataFrame(
        r_rows or [("zzz", epoch, 0)], "id string, rt timestamp, p int"
    )
    if not r_rows:
        r_df = r_df.limit(0)
    out = asof_join(
        l_df, r_df, on="id", left_time="t", right_time="rt",
        direction=direction,
        tolerance=None if tol is None else f"{tol} seconds",
    )
    got = sorted(
        (r["id"], r["t"].second + r["t"].minute * 60, r["p"])
        for r in out.collect()
    )
    r_secs = [
        (k, int((rt - epoch).total_seconds()), p) for (k, rt, p) in r_rows
    ]
    expect = []
    for k, t in left:
        if direction == "backward":
            cands = [(rt, p) for (rk, rt, p) in r_secs
                     if rk == k and rt <= t]
            match = max(cands) if cands else None
            ok = match is not None and (tol is None or match[0] >= t - tol)
        else:
            cands = [(rt, p) for (rk, rt, p) in r_secs
                     if rk == k and rt >= t]
            match = min(cands) if cands else None
            ok = match is not None and (tol is None or match[0] <= t + tol)
        expect.append((k, t, match[1] if ok else None))
    assert got == sorted(expect)


# ---------------------------------------------------------------------------
# round-10: delta-encoded commit-log resolution vs a pure-Python replay
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_commit_log_resolution_equals_full_replay(tmp_path_factory, data):
    """Snapshot resolution (checkpoint anchor + delta suffix) must be
    EXTENSIONALLY identical to replaying every record from genesis —
    for random add/remove/dv sequences, random checkpoint intervals,
    and after a vacuum with random retention + tags. Pure bookkeeping:
    no Spark session, no data files — the log protocol alone."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        VersionedStageTable,
        VersionNotFoundError,
    )

    tmp = tmp_path_factory.mktemp("logprop")
    interval = data.draw(st.integers(min_value=1, max_value=5))
    t = VersionedStageTable(
        None, str(tmp / "t"), checkpoint_interval=interval
    )
    # the model: files + dv per version, replayed in plain Python
    model_files: list[set] = []
    model_dv: list[dict] = []
    cur: set = set()
    cur_dv: dict = {}
    n_steps = data.draw(st.integers(min_value=3, max_value=12))
    next_file = 0
    schema = '{"type":"struct","fields":[]}'
    for step in range(n_steps):
        op = data.draw(
            st.sampled_from(["add", "remove", "replace", "dv", "reset_dv"])
        )
        add: list = []
        remove: list = []
        dv: dict = {}
        if op == "add" or not cur:
            add = [f"data/f{next_file}", f"data/f{next_file + 1}"]
            next_file += 2
        elif op == "remove":
            remove = [sorted(cur)[0]]
        elif op == "replace":
            remove = sorted(cur)[: data.draw(
                st.integers(min_value=1, max_value=len(cur))
            )]
            add = [f"data/f{next_file}"]
            next_file += 1
        elif op == "dv":
            target = sorted(cur)[0]
            dv = {target: [f"data/s{step}"]}
        else:  # reset_dv on a masked file (restore's mechanism)
            masked = sorted(f for f in cur if cur_dv.get(f))
            if masked:
                target = masked[0]
                add = [target]
                remove = [target]
                dv = {target: [f"data/s{step}r"]} if data.draw(
                    st.booleans()
                ) else {}
        t._commit(
            f"op{step}", add=add, remove=remove, schema_json=schema,
            dv=dv or None,
        )
        for f in remove:
            cur.discard(f)
            cur_dv.pop(f, None)
        cur.update(add)
        for f, sidecars in dv.items():
            lst = cur_dv.setdefault(f, [])
            for s in sidecars:
                if s not in lst:
                    lst.append(s)
        model_files.append(set(cur))
        model_dv.append({f: list(v) for f, v in cur_dv.items() if v})
    # every version resolves to exactly the model state
    for v in range(n_steps):
        m = t._manifest(v)
        assert set(m["files"]) == model_files[v], v
        got_dv = {
            f: sorted(s) for f, s in (m.get("dv") or {}).items()
        }
        want_dv = {
            f: sorted(s)
            for f, s in model_dv[v].items()
            if f in model_files[v]
        }
        assert got_dv == want_dv, v
    # vacuum with random retention + a random tag: every survivor
    # still resolves to its model state, dropped versions refuse
    tag_v = data.draw(st.integers(min_value=0, max_value=n_steps - 1))
    t.tag("anchor", tag_v)
    retain = data.draw(st.integers(min_value=1, max_value=n_steps))
    t.vacuum(retain_last=retain, data_grace_seconds=0.0)
    keep = set(range(n_steps))
    keep = set(sorted(keep)[-retain:]) | {tag_v}
    for v in range(n_steps):
        if v in keep:
            m = t._manifest(v)
            assert set(m["files"]) == model_files[v], ("post-vacuum", v)
        else:
            try:
                t._manifest(v)
                raise AssertionError(f"dropped version {v} still resolves")
            except VersionNotFoundError:
                pass
    # the log keeps working after the re-anchor: one more commit
    t._commit("tail", add=["data/tail"], schema_json=schema)
    assert "data/tail" in t._manifest(n_steps)["files"]


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-2**31, 2**31 - 1)),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        codec="utf-8", exclude_categories=("Cs",)
                    ),
                    max_size=100,
                ),
            ),
            st.one_of(
                st.none(),
                st.floats(allow_infinity=False, width=64),
            ),
        ),
        min_size=0,
        max_size=12,
    )
)
def test_footer_stats_bounds_are_true_bounds(spark, tmp_path_factory, rows):
    """Property: the manifest bounds _collect_stats commits (footer
    path for int/string, Spark scan for doubles) are TRUE bounds of the
    file's live values under the documented rules — int/string lo <=
    every value, hi >= every value (string min may be a 64-char prefix,
    oversized string max degrades to None), double hi is None whenever
    NaN is present (never a fake bound), all-NULL columns stay
    unknown."""
    import math as _math

    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        VersionedStageTable,
    )

    tmp = tmp_path_factory.mktemp("fsprop")
    t = VersionedStageTable(None, str(tmp / "t"))
    t.spark = spark
    df = spark.createDataFrame(rows, "k int, s string, d double").coalesce(1)
    t.overwrite(df)
    m = t._manifest(0)
    stats = m.get("stats") or {}
    if not rows:
        # zero-row file: empty dict = provably-empty convention
        assert all(s == {} for s in stats.values())
        return
    assert set(stats) == set(m["files"])
    st_all = {}
    for s in stats.values():
        st_all.update(s)
    ks = [r[0] for r in rows if r[0] is not None]
    ss = [r[1] for r in rows if r[1] is not None]
    ds = [r[2] for r in rows if r[2] is not None]
    lo, hi = st_all["k"]
    if ks:
        assert (lo is None or lo <= min(ks)) and (
            hi is None or hi >= max(ks)
        )
        # footers are exact for ints
        assert lo == min(ks) and hi == max(ks)
    else:
        assert lo is None and hi is None
    lo, hi = st_all["s"]
    if ss:
        true_min, true_max = min(ss), max(ss)
        assert lo is None or (lo <= true_min and len(lo) <= 64)
        assert hi is None or hi >= true_max
    else:
        assert lo is None and hi is None
    lo, hi = st_all["d"]
    finite = [d for d in ds if not _math.isnan(d)]
    has_nan = any(_math.isnan(d) for d in ds)
    if has_nan:
        assert hi is None  # NaN-greatest: an upper bound would be fake
    elif finite:
        assert hi == max(finite)
    if finite and not any(_math.isnan(d) for d in ds):
        assert lo == min(finite)


@settings(max_examples=12, deadline=None)
@given(
    positions=st.lists(
        st.tuples(
            st.sampled_from(["fa.parquet", "fb.parquet"]),
            st.integers(min_value=0, max_value=600_000),
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_dv_rle_encode_decode_roundtrip(spark, tmp_path_factory, positions):
    """Run-length DV encoding is lossless for ANY (file, position) set:
    decode(encode(S)) == S exactly, runs never overlap within a file,
    and no run exceeds the decode cap (positions above _DV_RUN_CAP
    force split runs)."""
    from cdk_datalake_ingest_upeu_spark.operators.versioned import (
        VersionedStageTable,
    )

    t = VersionedStageTable(
        spark, str(tmp_path_factory.mktemp("rle") / "vt")
    )
    df = spark.createDataFrame(
        positions, "file_name string, row_index long"
    )
    runs = t._encode_dv_runs(df).collect()
    # decode via the same seam the read path uses
    import pyspark.sql.functions as F

    decoded = sorted(
        (r["file_name"], r["row_index"])
        for r in t._encode_dv_runs(df)
        .select(
            "file_name",
            F.explode(
                F.sequence(
                    F.col("start"), F.col("start") + F.col("n") - F.lit(1)
                )
            ).alias("row_index"),
        )
        .collect()
    )
    assert decoded == sorted(positions)
    cap = VersionedStageTable._DV_RUN_CAP
    by_file: dict[str, list] = {}
    for r in runs:
        assert 1 <= r["n"] <= cap
        by_file.setdefault(r["file_name"], []).append(
            (r["start"], r["n"])
        )
    for rs in by_file.values():
        rs.sort()
        for (s1, n1), (s2, _n2) in zip(rs, rs[1:]):
            assert s1 + n1 <= s2  # disjoint, ordered
