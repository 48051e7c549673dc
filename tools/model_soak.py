"""Soak driver for the two-writer full-vocabulary model test: runs
``tests.test_concurrency.run_vocab_sequence`` over many random seeds
(the r12 verdict's ">=200 sequences" evidence for the schema-op
vocabulary) and writes one JSON summary.

Usage: python tools/model_soak.py [n_seeds=200] [steps=12] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from cdk_datalake_ingest_upeu_spark import get_spark  # noqa: E402
from test_concurrency import run_vocab_sequence  # noqa: E402


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/model_soak.json"
    spark = get_spark("model-soak", master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="model_soak_")
    failures = []
    t0 = time.monotonic()
    for seed in range(n_seeds):
        path = os.path.join(root, f"vt{seed}")
        try:
            run_vocab_sequence(spark, path, seed, steps=steps)
        except Exception:
            failures.append({"seed": seed, "trace": traceback.format_exc()})
            print(f"FAIL seed={seed}", flush=True)
        finally:
            shutil.rmtree(path, ignore_errors=True)
        if (seed + 1) % 10 == 0:
            print(
                f"{seed + 1}/{n_seeds} done, {len(failures)} failed, "
                f"{time.monotonic() - t0:.0f}s",
                flush=True,
            )
    report = {
        "n_seeds": n_seeds,
        "steps": steps,
        "failures": failures,
        "n_failed": len(failures),
        "elapsed_sec": round(time.monotonic() - t0, 1),
    }
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "failures"}))
    shutil.rmtree(root, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
