"""Column-level table profiling — the ingest-side data-quality probe.

The reference samples each extracted table's bounds via scalar probes
(MIN/MAX watermark queries, COUNT gates — extract_data_spark.py's
bounds query and the DynamoDB run-log counts); a lake also needs the
per-column profile of what actually landed: null rates, cardinalities,
value ranges. Two plans, picked by ``exact``:

- ``exact=True``: one aggregate branch PER COLUMN, unioned. Exact
  distinct counts without the Catalyst ``Expand`` multiplier a single
  multi-``count_distinct`` aggregate would plan (Expand replicates
  every input row once per DISTINCT aggregate — ×n_cols row volume at
  100 TB). Each branch's scan reads exactly one column (columnar
  pruning), so total I/O ≈ one full-width scan and the branches run as
  independent stages of one job.
- ``exact=False``: ONE pass with ``approx_count_distinct`` (HLL) per
  column — no Expand, single scan, cardinalities within ``rsd``; the
  right default at 100 TB when exact distinct counts aren't worth a
  per-column pass.

Values are reported as strings so heterogeneous columns stack into one
result relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdk_datalake_ingest_upeu_spark.functions.stable import fp_canon
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df

_PROFILE_COLS = [
    "column_name",
    "n_rows",
    "n_nulls",
    "n_distinct",
    "min_value",
    "max_value",
]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: name, row/null/distinct counts and
    min/max rendered as strings. See module docstring for the two
    physical plans."""
    cols = cols or df.columns
    if exact:
        parts = [
            df.select(F.col(c).alias("__v"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__v").isNull().cast("long")).alias("n_nulls"),
                F.count_distinct("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            )
            .select(F.lit(c).alias("column_name"), *_PROFILE_COLS[1:])
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.approx_count_distinct(c, rsd).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__rows_{c}").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("p")).select(
        *[F.col(f"p.{f}").alias(f) for f in _PROFILE_COLS]
    )


def profile_drift(old_profile: DataFrame, new_profile: DataFrame) -> DataFrame:
    """Per-column drift between two :func:`profile_table` outputs — the
    data-quality monitor a lake runs between landing generations (the
    reference's run-log severity checks only count transform failures;
    this catches silent upstream shifts: a column going nullable, a
    cardinality collapse, bounds walking).

    Inputs are KB-scale (one row per column) regardless of the
    underlying table size — the heavy scans already happened once per
    generation inside ``profile_table`` — so the join is trivially
    broadcast and the full-outer keeps columns that appeared or
    vanished visible."""
    o = old_profile.select(
        "column_name",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("n_nulls_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("min_old"),
        F.col("max_value").alias("max_old"),
    )
    n = new_profile.select(
        "column_name",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("n_nulls_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("min_new"),
        F.col("max_value").alias("max_new"),
    )
    j = o.join(n, "column_name", "full_outer")
    return j.select(
        "column_name",
        "n_rows_old",
        "n_rows_new",
        F.round(F.col("n_nulls_old") / F.col("n_rows_old"), 6).alias("null_rate_old"),
        F.round(F.col("n_nulls_new") / F.col("n_rows_new"), 6).alias("null_rate_new"),
        "n_distinct_old",
        "n_distinct_new",
        (
            ~F.col("min_old").eqNullSafe(F.col("min_new"))
            | ~F.col("max_old").eqNullSafe(F.col("max_new"))
        ).alias("bounds_changed"),
    ).orderBy("column_name")


def _canon_text(df: DataFrame, c: str):
    """Engine-stable text of one column (NULL stays NULL for the caller's
    sentinel). Enforced canonicalization — not a docstring caveat:

    - numeric (any width, int or float): value canonicalized at 1e-6
      resolution via ``floor(x*1e6 + 0.5)`` — three IEEE-754 double ops,
      bit-identical in every engine — then rendered as an integer.
      Double TEXT is NOT portable (Java prints ``1.0E7``/``NaN`` where
      DuckDB prints ``10000000.0``/``nan`` — the r5 `corpus_checksum`
      driver-red); ints route through the same double path so a drop
      that re-types int64 -> double hashes identically. Exact above
      2^53/1e6 ≈ 9e9 is not promised — identical on both engines either
      way, since both run the same double ops. NaN/±Inf get fixed
      sentinels.
    - timestamp/date: rendered via an explicit pattern (micros), never
      engine default text (nanos/adjusted drops alternate per round).
    - everything else: plain string cast (UTF-8 md5 is portable).
    """
    t = dict(df.dtypes)[c]
    col = F.col(c)
    if t in ("double", "float") or t.startswith("decimal") or t in (
        "tinyint", "smallint", "int", "bigint"
    ):
        d = col.cast("double")
        y = d * 1e6 + F.lit(0.5)
        sat = 9007199254740992.0  # 2^53: past the mantissa, saturate —
        # double->int conversion stops being engine-portable there
        return (
            F.when(F.isnan(d), F.lit("nan"))
            .when(y >= sat, F.lit("9007199254740992"))
            .when(y <= -sat, F.lit("-9007199254740992"))
            .otherwise(F.floor(y).cast("bigint").cast("string"))
        )
    if t.startswith("timestamp"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if t == "date":
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def canon_oracle_expr(c: str, dtype: str) -> str:
    """The DuckDB twin of :func:`_canon_text` for one column — keep the
    two in lockstep (tests/test_profile.py pins them equal per type)."""
    if dtype == "numeric":
        d = f"CAST({c} AS DOUBLE)"
        y = f"{d} * 1000000.0 + 0.5"
        return (
            f"CASE WHEN isnan({d}) THEN 'nan' "
            f"WHEN {y} >= 9007199254740992.0 THEN '9007199254740992' "
            f"WHEN {y} <= -9007199254740992.0 THEN '-9007199254740992' "
            f"ELSE CAST(CAST(floor({y}) AS BIGINT) AS VARCHAR) END"
        )
    if dtype == "timestamp":
        return f"strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"
    if dtype == "date":
        return f"strftime({c}, '%Y-%m-%d')"
    return f"CAST({c} AS VARCHAR)"


def dataset_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum of a row multiset: one row of
    (n_rows, checksum, then per-column ``checksum_<c>`` / ``nulls_<c>``).

    Verifies two pipeline runs produced IDENTICAL data without sorting,
    shuffling, or moving anything: each row hashes to the first 48 bits
    of a portable md5 over its canonicalized columns, and the hashes SUM
    (decimal(38,0), overflow-safe past 1e12 rows x 48-bit values). Sum
    is commutative, so the checksum is independent of row order and
    partitioning, and the whole operator is a map-side partial aggregate
    — zero exchange of data rows at any scale.

    Canonicalization is ENFORCED per type (see :func:`_canon_text`):
    numerics at 1e-6 resolution through IEEE-identical double ops,
    timestamps through explicit patterns — no output text depends on
    engine float/timestamp formatting. NULL uses a sentinel (concat_ws
    silently drops NULLs — ('a', NULL) must not collide with ('a',)),
    columns join with an \\x1f separator.

    Besides the row checksum, each column gets its own canon-text
    checksum and null count, so when two runs DO diverge the report
    names the column instead of one opaque sum (KB-wide single row —
    still a pure map-side aggregate).

    The checksum columns leave the operator as decimal-digit STRINGs,
    never as wide decimals: DECIMAL(p>18,0) is exact inside both
    engines but lossy AT THE BOUNDARY — a DuckDB DECIMAL(38,0) fetched
    through a dataframe becomes float64 (``6.97576082990215e+16``)
    while Spark's stays exact, so any harness that hashes fetched text
    sees a mismatch even when the values are identical (the r5/r6
    ``corpus_checksum`` driver-red; same class as DuckDB HUGEINT).
    Digit text is engine-stable by construction — Decimal(38,0)
    rendering has no exponent/locale path in either engine. (Hex would
    be equally stable but Spark's ``hex()`` takes only 64-bit ints, and
    the sum legitimately exceeds 2^63 past ~65e3 rows x 48 bits.)
    """
    use_cols = cols or df.columns
    canon = {c: _canon_text(df, c) for c in use_cols}
    null_sentinel = F.lit("\x00null")

    def h48(text_col):
        # internal accumulator stays decimal(38,0): overflow-safe past
        # 1e12 rows x 48-bit values; only the TEXT leaves the operator
        return F.conv(F.substring(F.md5(text_col), 1, 12), 16, 10).cast(
            "decimal(38,0)"
        )

    row_text = F.concat_ws(
        "\x1f", *[F.coalesce(canon[c], null_sentinel) for c in use_cols]
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h48(row_text)).cast("string").alias("checksum"),
    ]
    for c in use_cols:
        aggs.append(
            F.sum(h48(F.coalesce(canon[c], null_sentinel)))
            .cast("string")
            .alias(f"checksum_{c}")
        )
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"nulls_{c}")
        )
    return df.agg(*aggs)


def score_attrition(
    df: DataFrame,
    score_col: str,
    thresholds: list[int],
    *,
    token_col: str | None = None,
    source_col: str | None = None,
) -> DataFrame:
    """Attrition curve for a quality/classifier score: for each
    threshold, how much data survives ``score >= t``? The calibration
    step between training a filter and running it on 100 TB — you pick
    the threshold off THIS table (docs/tokens/source survival vs
    cut), not by re-running the corpus filter per guess.

    ``score_col`` must be integer-quantized (micro-units etc.) so the
    ``>=`` compare has no float-text ambiguity; ``thresholds`` are in
    the same units. One scan: each row fans out to the threshold list
    map-side (|thresholds| copies of 3 small columns, not of the
    document), and one KB-scale groupBy aggregates the curve. Returns
    (threshold, n_docs, n_kept, tokens_kept?, sources_kept?) ordered
    by threshold.
    """
    fan = df.withColumn(
        "threshold",
        F.explode(F.array(*[F.lit(int(t)).cast("long") for t in thresholds])),
    ).withColumn("__kept", F.col(score_col) >= F.col("threshold"))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("__kept").cast("long")).alias("n_kept"),
    ]
    if token_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("__kept"), F.col(token_col))), F.lit(0)
            )
            .cast("long")
            .alias("tokens_kept")
        )
    if source_col is not None:
        aggs.append(
            F.countDistinct(
                F.when(F.col("__kept"), F.col(source_col))
            ).alias("sources_kept")
        )
    return fan.groupBy("threshold").agg(*aggs).orderBy("threshold")


def robust_outlier_stats(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 100,
    k_mad: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier report — the anomaly gate that, unlike
    a z-score, a burst of outliers cannot drag toward itself (median
    and MAD have a 50% breakdown point; mean/stddev have 0%).

    Everything derives from ONE value histogram over the fixed-point
    canon (``functions/stable.fp_canon``): the histogram shuffles
    (value, count) pairs only, then the driver walks it three times —
    lower median (smallest canon value whose cumulative count reaches
    ceil(n/2)), MAD (the same walk over the |v - median| histogram,
    which is a driver-side TRANSFORM of the first histogram, no second
    corpus pass), and the outlier count (|v - median| > k * MAD, pure
    integer comparison). NaN/NULL values are excluded (canon maps NaN
    to NULL, the engine-portable convention).

    Scale shape: one groupBy on the canon value; the driver walk is
    O(distinct canon values) — bounded by the value RANGE at the canon
    scale for real-valued telemetry (a 2-dp metric in [0, 500] is
    <= 50k rows regardless of corpus size). Returns a 1-row frame:
    (n, median, mad, n_outliers, outlier_frac_q6).
    """
    import math

    spark = df.sparkSession
    hist = sorted(
        (int(r["__v"]), int(r["__c"]))
        for r in df.select(fp_canon(value_col, scale).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    n = sum(c for _, c in hist)
    if n == 0:
        return _rows_df(spark, 
            [(0, None, None, 0, 0)],
            "n long, median double, mad double, n_outliers long, "
            "outlier_frac_q6 long",
        )

    def _lower_median(h: list[tuple[int, int]], total: int) -> int:
        target = math.ceil(total / 2)
        cum = 0
        for v, c in h:
            cum += c
            if cum >= target:
                return v
        return h[-1][0]

    med = _lower_median(hist, n)
    dev: dict[int, int] = {}
    for v, c in hist:
        d = abs(v - med)
        dev[d] = dev.get(d, 0) + c
    mad = _lower_median(sorted(dev.items()), n)
    n_out = sum(c for d, c in dev.items() if d > k_mad * mad)
    frac_q6 = (n_out * 1_000_000) // n
    return _rows_df(spark, 
        [(n, med / float(scale), mad / float(scale), n_out, frac_q6)],
        "n long, median double, mad double, n_outliers long, "
        "outlier_frac_q6 long",
    )


def theil_sen_daily_trend(
    df: DataFrame,
    ts_col: str,
    *,
    slope_scale: int = 10**6,
) -> DataFrame:
    """Theil-Sen robust trend of the daily row count — the median of
    all pairwise day-to-day slopes (breakdown point ~29%), the standard
    robust alternative to least squares for "is traffic drifting"
    monitoring where single spike days wreck an OLS fit.

    Scale shape: the corpus reduces to the DAY-grain count table first
    (one shuffle, rows bounded by the calendar); the pairwise slope set
    is then days^2/2 — KB for years of data — built with a day-table
    self-join and walked driver-side for the exact lower median. Each
    slope quantizes via the fixed-point canon (floor(x*scale + 0.5),
    identical IEEE ops in every engine) so the median is
    hash-portable. Returns one row: (n_days, n_pairs,
    slope_per_day_q6, first_day, last_day).
    """
    import math

    spark = df.sparkSession
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("a.__d") < F.col("b.__d"))
        .select(
            fp_canon(
                (F.col("b.__c") - F.col("a.__c")).cast("double")
                / F.datediff(F.col("b.__d"), F.col("a.__d")).cast("double"),
                slope_scale,
            ).alias("__s")
        )
        .groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    hist = sorted((int(r["__s"]), int(r["__c"])) for r in slopes.collect())
    n_pairs = sum(c for _, c in hist)
    bounds = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        F.min("__d").alias("d0"),
        F.max("__d").alias("d1"),
    ).first()
    if n_pairs == 0:
        return _rows_df(spark, 
            [(int(bounds["nd"]), 0, None, bounds["d0"], bounds["d1"])],
            "n_days long, n_pairs long, slope_per_day_q6 long, "
            "first_day date, last_day date",
        )
    target = math.ceil(n_pairs / 2)
    cum, med = 0, hist[-1][0]
    for v, c in hist:
        cum += c
        if cum >= target:
            med = v
            break
    return _rows_df(spark, 
        [(int(bounds["nd"]), n_pairs, med, bounds["d0"], bounds["d1"])],
        "n_days long, n_pairs long, slope_per_day_q6 long, "
        "first_day date, last_day date",
    )


def grouped_robust_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    scale: int = 100,
    k_mad: int = 3,
) -> DataFrame:
    """Per-group :func:`robust_outlier_stats` — one (group, canon-value)
    histogram shuffle, then the median/MAD/outlier walks run driver-side
    PER GROUP over that bounded histogram (groups x value-range rows;
    the ccnet grouped-threshold technique — never a per-group ntile
    window over the corpus). NULL is a legitimate group key. Returns one
    row per group: (group_col, n, median, mad, n_outliers,
    outlier_frac_q6)."""
    import math

    spark = df.sparkSession
    rows = (
        df.select(
            F.col(group_col).alias("__g"),
            fp_canon(value_col, scale).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["__g"], []).append((int(r["__v"]), int(r["__c"])))

    def _lower_median(h, total):
        target = math.ceil(total / 2)
        cum = 0
        for v, c in h:
            cum += c
            if cum >= target:
                return v
        return h[-1][0]

    out = []
    for g, h in groups.items():
        h.sort()
        n = sum(c for _, c in h)
        med = _lower_median(h, n)
        dev: dict = {}
        for v, c in h:
            d = abs(v - med)
            dev[d] = dev.get(d, 0) + c
        mad = _lower_median(sorted(dev.items()), n)
        n_out = sum(c for d, c in dev.items() if d > k_mad * mad)
        out.append(
            (g, n, med / float(scale), mad / float(scale), n_out,
             (n_out * 1_000_000) // n)
        )
    gtype = dict(df.dtypes)[group_col]
    return _rows_df(spark, 
        sorted(out, key=lambda t: (t[0] is None, t[0])),
        f"{group_col} {gtype}, n long, median double, mad double, "
        "n_outliers long, outlier_frac_q6 long",
    )


def two_sample_rank_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 100,
) -> DataFrame:
    """Exact two-sample distribution comparison — Mann-Whitney U and the
    Kolmogorov-Smirnov statistic — computed from the two groups' value
    HISTOGRAMS, the way an A/B test runs at 100 TB: no global sort, no
    rank window over the corpus, just one (group, canon-value) rollup
    and a driver walk over the bounded merged support.

    Both statistics are exact integers: ``u2_a`` is 2*U_A (doubling
    absorbs the half-credit for ties — U itself may end in .5), and
    ``ks_ppm`` is floor(1e6 * max|F_A - F_B|) computed as integer
    cross-products (|cumA*nB - cumB*nA|, exact in BIGINT), so the
    whole report is hash-portable with no floating comparison anywhere.
    NaN/NULL values are excluded by the canon. Returns one row:
    (n_a, n_b, u2_a, ks_ppm).
    """
    spark = df.sparkSession
    hists: dict = {0: {}, 1: {}}
    rows = (
        df.select(
            F.when(F.col(group_col) == group_a, F.lit(0))
            .when(F.col(group_col) == group_b, F.lit(1))
            .alias("__g"),
            fp_canon(value_col, scale).alias("__v"),
        )
        .filter(F.col("__g").isNotNull() & F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    for r in rows:
        hists[int(r["__g"])][int(r["__v"])] = int(r["__c"])
    ha, hb = hists[0], hists[1]
    na, nb = sum(ha.values()), sum(hb.values())
    support = sorted(set(ha) | set(hb))
    cum_a = cum_b = 0
    u2 = 0
    ks_num = 0  # max |cumA*nB - cumB*nA|
    for v in support:
        ca, cb = ha.get(v, 0), hb.get(v, 0)
        # A-values at v beat everything in B strictly below, tie at v
        u2 += 2 * ca * cum_b + ca * cb
        cum_a += ca
        cum_b += cb
        ks_num = max(ks_num, abs(cum_a * nb - cum_b * na))
    ks_ppm = (ks_num * 1_000_000) // (na * nb) if na and nb else None
    return _rows_df(spark, 
        [(na, nb, u2, ks_ppm)],
        "n_a long, n_b long, u2_a long, ks_ppm long",
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square independence statistic for two categorical
    columns — the contingency check a lake runs when a suspicious
    coupling appears (is language independent of source, event type of
    region?). Fully distributed: ONE (a, b) rollup (the corpus cost),
    margins as KB rollups of it, null-safe joins (NULL is a category),
    and per-cell terms ``(o*N - r*c)^2 / (N*r*c)`` computed in double
    with a fixed op order — identical IEEE results in every engine —
    then canon-quantized to micro-units and summed exactly. Returns one
    row: (n, n_cells, dof, chisq_q6). dof counts observed-margin cells
    ((R-1)*(C-1)); absent combinations contribute their expected mass
    through the margins, the standard sparse-contingency convention.

    The contingency rollup is persisted so the base table is scanned
    exactly once — ``cells`` feeds both margins, N, and the grid join,
    which without the persist would re-run the corpus groupBy four
    times. An empty input returns the empty frame at the same schema
    (no statistic exists for n=0) instead of failing on ``n=None``."""
    from cdk_datalake_ingest_upeu_spark.operators.scratch import (
        scratch_persist,
    )

    out_schema = "n long, n_cells long, dof int, chisq_q6 long"
    cells = scratch_persist(
        df.groupBy(
            F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
        ).agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__r"))
    cb = cells.groupBy("__b").agg(F.sum("__o").alias("__c"))
    n = cells.agg(F.sum("__o")).first()[0]
    if n is None:
        return _rows_df(df.sparkSession, [], out_schema)
    # dense grid: every (observed a, observed b) pair, absent cells o=0.
    # Both margins are category-grain (KB); broadcast the column margin
    # so the grid is a broadcast nested-loop, never a shuffle.
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(
            F.broadcast(
                cells.select(
                    F.col("__a").alias("__a2"),
                    F.col("__b").alias("__b2"),
                    "__o",
                )
            ),
            F.col("__a").eqNullSafe(F.col("__a2"))
            & F.col("__b").eqNullSafe(F.col("__b2")),
            "left",
        )
        .select(
            "__r",
            "__c",
            F.coalesce(F.col("__o"), F.lit(0)).alias("__o"),
        )
    )
    term = (
        f"CAST(floor((CAST(__o AS DOUBLE) * CAST({int(n)} AS DOUBLE)"
        f" - CAST(__r AS DOUBLE) * CAST(__c AS DOUBLE))"
        f" * (CAST(__o AS DOUBLE) * CAST({int(n)} AS DOUBLE)"
        f" - CAST(__r AS DOUBLE) * CAST(__c AS DOUBLE))"
        f" / (CAST({int(n)} AS DOUBLE) * CAST(__r AS DOUBLE)"
        f" * CAST(__c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
    )
    r_cnt, c_cnt = ra.count(), cb.count()
    return (
        grid.withColumn("__t", F.expr(term))
        .agg(
            F.lit(int(n)).cast("long").alias("n"),
            F.count(F.lit(1)).alias("n_cells"),
            F.lit(int((r_cnt - 1) * (c_cnt - 1))).cast("int").alias("dof"),
            F.sum("__t").alias("chisq_q6"),
        )
    )
