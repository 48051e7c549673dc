"""Time a query subset under ONE session config (warmup pass +
best-of-2 per query) and print the per-query bests and subset total.

Usage:
  python tools/conf_ab.py '<json: {"conf.key": "value", ...}>' <query ...>

One run measures one variant only (a session config needs its own
JVM). To A/B, run it twice in the same sitting — once with '{}' for
the stock baseline and once with the overrides — and compare the
printed totals; running the two legs from different checkouts A/Bs
code instead of config.
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
    overrides = json.loads(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("conf_ab", extra_conf=overrides or None)
    # warmup at the smoke scale
    for n in names:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    best: dict[str, float] = {}
    for _ in range(2):
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).count()
            t = time.perf_counter() - t0
            if n not in best or t < best[n]:
                best[n] = t
    print(json.dumps({
        "overrides": overrides,
        "total": round(sum(best.values()), 3),
        "best": {k: round(v, 3) for k, v in best.items()},
    }))


if __name__ == "__main__":
    main()
