"""Isolated single-query timing for DRIFT A/B runs.

Usage: python tools/ab_single.py <query> [runs=4] [sf_dir]

Runs the named catalog query ``runs`` times (first run is warmup) in ONE
SparkSession at sf0.1 and prints per-run seconds plus best-of-(runs-1).
Run it from the repo whose code you want to measure (cwd's package wins
via sys.path), with nothing else on the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from cdk_datalake_ingest_upeu_spark import get_spark  # noqa: E402
from cdk_datalake_ingest_upeu_spark.workloads import QUERIES  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark()
    fn = QUERIES[name]
    times = []
    for i in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        times.append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "runs": times,
        "best_after_warmup": min(times[1:]) if len(times) > 1 else times[0],
        "cwd": os.getcwd(),
    }))


if __name__ == "__main__":
    main()
