"""Measure near-dup dedup quality on a planted-duplicate corpus.

Builds N synthetic documents (seeded), plants near-duplicates with known
token-edit rates, then reports recall/precision against the planted
ground truth plus wall time, for MinHash+LSH (default) or SimHash.

Usage: python tools/minhash_quality.py [n_docs] [dup_rate] [minhash|simhash]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdk_datalake_ingest_upeu_spark import get_spark  # noqa: E402
from cdk_datalake_ingest_upeu_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    simhash_pairs,
)

WORDS = [f"w{i:03d}" for i in range(600)]


def build_corpus(n_docs: int, dup_rate: float, seed: int = 11):
    rng = random.Random(seed)
    rows, truth = [], set()
    doc_id = 0
    while doc_id < n_docs:
        base = " ".join(rng.choices(WORDS, k=rng.randint(40, 80)))
        rows.append((doc_id, base))
        base_id = doc_id
        doc_id += 1
        if rng.random() < dup_rate and doc_id < n_docs:
            # near-dup: swap ~5% of tokens; each swapped token alters up
            # to 3 shingles, so expected Jaccard ~0.7
            toks = base.split()
            for _ in range(max(1, len(toks) // 20)):
                toks[rng.randrange(len(toks))] = rng.choice(WORDS)
            rows.append((doc_id, " ".join(toks)))
            truth.add((base_id, doc_id))
            doc_id += 1
    return rows, truth


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dup_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    op = sys.argv[3] if len(sys.argv) > 3 else "minhash"
    spark = get_spark("dedup-quality")
    rows, truth = build_corpus(n_docs, dup_rate)
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    docs.count()  # materialize input before timing

    start = time.perf_counter()
    if op == "minhash":
        # 16 bands of 2 rows: candidate recall ~1.0 at Jaccard 0.7 (the
        # narrow bands admit more candidates, all killed or kept by the
        # exact-Jaccard verification, so precision stays exact)
        out = minhash_lsh_pairs(docs, threshold=0.6, bands=16)
    elif op == "simhash":
        # precision here is vs PLANTED pairs only; simhash legitimately
        # reports unplanted pairs that fall inside the hamming radius
        out = simhash_pairs(docs, max_hamming=12)
    else:
        raise SystemExit(f"unknown op {op!r}: use minhash|simhash")
    found = {(r.id_a, r.id_b) for r in out.collect()}
    elapsed = time.perf_counter() - start

    tp = len(found & truth)
    recall = tp / len(truth) if truth else 1.0
    precision = tp / len(found) if found else 1.0
    print(
        f"op={op} docs={n_docs} planted_pairs={len(truth)} found={len(found)} "
        f"recall={recall:.4f} precision_vs_planted={precision:.4f} "
        f"wall_s={elapsed:.1f} docs_per_s={n_docs / elapsed:.0f}"
    )


if __name__ == "__main__":
    main()
