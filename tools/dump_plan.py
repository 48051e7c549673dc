"""Dump .explain("formatted") for catalog queries to files.

Usage: python tools/dump_plan.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each named query (sf0.001 by
default — the plan SHAPE is scale-independent; wrappers that execute
side jobs run them at the cheap scale). Run from the repo whose code
should produce the plans (cwd wins module resolution).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from cdk_datalake_ingest_upeu_spark import get_spark  # noqa: E402
from cdk_datalake_ingest_upeu_spark.workloads import QUERIES  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plan")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
