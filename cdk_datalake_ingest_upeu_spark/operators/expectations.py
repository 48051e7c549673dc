"""Declarative table-level data-quality expectations, one scan per table.

The reference enforces data quality at TRANSFORM grain: a failed cast
becomes NULL and a severity threshold aborts the load when too many rows
break (light_transform.py:1471-1509 — re-expressed in
functions/engine.py as ``TransformationEngine.apply`` +
``TransformSeverityError``). What it cannot express is the TABLE-grain
contract a warehouse actually publishes: "event_id is never null and
unique, event_type is one of these five, value sits in [0, 1000]".
This module is that surface (the dbt-tests / Great Expectations slot),
built so the whole rule set costs ONE aggregation pass:

- per-row rules (not_null, accepted_values, between, matches_regex)
  compile to ``sum(when(violation, 1))`` columns inside a single
  ``agg`` — the scan computes every rule at once, map-side combined;
- uniqueness rules ride the SAME aggregation as
  ``count(*) - count(distinct col)`` (Spark plans the distincts as one
  Expand — still a single pass over the data);
- the report is one row per rule, KB-scale, and
  :func:`check_expectations` raises :class:`ExpectationFailure` when
  an ``error``-severity rule has violations, mirroring the transform
  engine's severity semantics at table grain.

At 100 TB: the expectation pass is exactly one full scan with a
10-ish-row result — strictly cheaper than the write it gates, and the
natural place to run it is on the staged DataFrame right before the
sink (compose with ``StageTable`` the same way the reference runs its
severity gate before the Delta write).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df


class ExpectationFailure(Exception):
    """Raised when an error-severity expectation has violations."""

    def __init__(self, failures: list[tuple[str, int]]):
        self.failures = failures
        super().__init__(
            "expectations failed: "
            + ", ".join(f"{name} ({n} violations)" for name, n in failures)
        )


@dataclass(frozen=True)
class Expectation:
    """One declarative rule.

    kind: not_null | unique | accepted_values | between | matches_regex
    | foreign_key
    params: accepted_values -> {"values": [...]}; between -> {"lo": x,
    "hi": y} (inclusive); matches_regex -> {"pattern": "..."};
    foreign_key -> {"ref": DataFrame, "ref_col": str} (NULLs are not
    violations — pair with not_null to ban them).
    severity: "error" aborts in check_expectations; "warn" only reports.
    """

    name: str
    column: str
    kind: str
    params: dict = field(default_factory=dict)
    severity: str = "error"


def _violation_expr(rule: Expectation) -> Column:
    """Per-row boolean: True where the row VIOLATES the rule."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        # NULL is not a membership violation — pair with not_null to ban it
        return (~c.isin(list(rule.params["values"]))) & c.isNotNull()
    if rule.kind == "between":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return ((c < F.lit(lo)) | (c > F.lit(hi))) & c.isNotNull()
    if rule.kind == "matches_regex":
        return (~c.rlike(rule.params["pattern"])) & c.isNotNull()
    raise ValueError(f"unknown expectation kind: {rule.kind!r}")


def _rule_struct(r: Expectation, count_col: Column) -> Column:
    return F.struct(
        F.lit(r.name).alias("rule"),
        F.lit(r.column).alias("column"),
        F.lit(r.kind).alias("kind"),
        F.lit(r.severity).alias("severity"),
        F.coalesce(count_col, F.lit(0)).alias("n_violations"),
    )


def expectations_report(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule over ONE aggregation pass per relation.

    Single-table rules (not_null / unique / accepted_values / between /
    matches_regex) share one scan. Each ``foreign_key`` rule is a
    LEFT ANTI join against its reference relation — at warehouse scale
    the dimension is the broadcast side, so the fact still crosses no
    exchange; its violation count unions into the same report.

    Returns one row per rule: (rule, column, kind, severity,
    n_violations, passed), ordered by rule name.
    """
    if not rules:
        raise ValueError("expectations_report: empty rule list")
    seen = set()
    for r in rules:
        if r.name in seen:
            raise ValueError(f"duplicate expectation name: {r.name!r}")
        seen.add(r.name)

    scan_rules = [r for r in rules if r.kind != "foreign_key"]
    fk_rules = [r for r in rules if r.kind == "foreign_key"]

    parts = []
    if scan_rules:
        aggs = []
        for r in scan_rules:
            if r.kind == "unique":
                aggs.append(
                    (F.count(r.column) - F.countDistinct(r.column)).alias(r.name)
                )
            else:
                aggs.append(F.sum(_violation_expr(r).cast("long")).alias(r.name))
        counts = df.agg(*aggs)
        rows = F.array(*[_rule_struct(r, F.col(r.name)) for r in scan_rules])
        parts.append(counts.select(F.explode(rows).alias("r")).select("r.*"))

    for r in fk_rules:
        ref = r.params["ref"]
        ref_col = r.params.get("ref_col", r.column)
        orphans = (
            df.select(F.col(r.column).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                ref.select(F.col(ref_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias(r.name))
        )
        parts.append(orphans.select(_rule_struct(r, F.col(r.name)).alias("r")).select("r.*"))

    report = parts[0]
    for p in parts[1:]:
        report = report.unionAll(p)
    return report.withColumn("passed", F.col("n_violations") == 0).orderBy("rule")


def check_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Run the report; raise :class:`ExpectationFailure` if any
    ``error``-severity rule has violations (the table-grain twin of
    ``TransformSeverityError``). Returns the report on success —
    including any warn-severity violations, which do not abort."""
    report = expectations_report(df, rules)
    rows = report.collect()  # one row per rule: KB-scale by construction
    failures = [
        (r["rule"], r["n_violations"])
        for r in rows
        if r["severity"] == "error" and r["n_violations"] > 0
    ]
    if failures:
        raise ExpectationFailure(failures)
    out = _rows_df(df.sparkSession, rows, report.schema)
    return out.orderBy("rule")
