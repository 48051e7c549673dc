"""Persistable distributed Bloom filter — broadcastable key-set summary.

Spark's own runtime row-level filtering (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) injects Bloom filters into shuffle joins
automatically, but that filter is rebuilt per query and cannot be
persisted. The reference re-reads its full extract to decide which rows
already landed (SURVEY §2.9 watermark probes); at 100 TB the standard
replacement is a key-set summary built ONCE from the authoritative side
and shipped to every later batch: a Bloom filter over the key column.

Everything here is DataFrame algebra — no UDF, no driver-side hashing
of data rows:

- **build**: each key sets ``n_hashes`` bits, bucket_i =
  ``pmod(xxhash64(key, seed_i), n_bits)``. One ``explode`` +
  ``groupBy(bucket div 64)`` with a ``bit_or`` of single-bit masks:
  map-side partial ``bit_or`` means the shuffle carries at most
  ``n_bits/64`` words per map task. The driver collects the sparse
  word list (≤ ``n_bits/64`` longs) and densifies it.
- **probe (literal mode)**: the word array ships as a plan literal;
  the membership test is ``getbit(element_at(words, bucket div 64),
  bucket mod 64)`` AND-ed over the hash seeds — pure whole-stage
  codegen on the scan side, BEFORE any exchange.
- **probe (join mode)**: for filters too big to inline (≳2^24 bits),
  the words live in a tiny (word_idx, word) DataFrame and each hash
  becomes one broadcast hash join on ``word_idx`` — row identity is
  preserved (no explode/regroup), and the broadcast is the words
  relation, never the keys themselves.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default k=5,
m/n=16 gives ~0.05%. A filter over 1e8 keys at m/n=16 is 200 MB of
words — that is the ceiling for literal mode (use join mode); beyond
~1e9 keys prefer the bucketed anti-join in operators/dedup.py, because
the summary itself stops being broadcastable.

The exact path (``bloom_semi_join(..., exact=True)``) removes false
positives with a real semi-join AFTER the bloom prefilter, so the
filter only prunes shuffle input — results stay exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from cdk_datalake_ingest_upeu_spark.functions.localrel import rows_df as _rows_df

# xxhash64 seeds: odd constants derived from the golden ratio, the same
# public trick Spark's own BloomFilterImpl uses to derive k hashes
_SEED_BASE = 0x9E3779B9


def _seeds(n_hashes: int) -> list[int]:
    return [(_SEED_BASE * (i + 1)) & 0x7FFFFFFF for i in range(n_hashes)]


def _buckets(key: Column, n_bits: int, seeds: list[int]) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(n_bits)) for s in seeds
    ]


@dataclass
class BloomFilter:
    """Dense word array + parameters; built by :func:`bloom_build` or
    loaded by :func:`bloom_load`."""

    words: list[int]
    n_bits: int
    seeds: list[int]

    def might_contain(self, key: Column) -> Column:
        """Membership test as a single codegen boolean expression (the
        word array rides along as a plan literal — fine up to ~2^24
        bits; use :meth:`prefilter_join` beyond that)."""
        # force long elements: small word values would otherwise infer
        # array<int>, and getbit on int caps bit positions at 32
        words_lit = F.lit(self.words).cast("array<long>")
        cond = None
        for b in _buckets(key, self.n_bits, self.seeds):
            word = F.element_at(
                words_lit, F.floor(b / F.lit(64)).cast("int") + F.lit(1)
            )
            hit = F.getbit(word, (b % 64).cast("int")) == F.lit(1)
            cond = hit if cond is None else (cond & hit)
        return cond

    def words_df(self, spark: SparkSession) -> DataFrame:
        """Sparse (word_idx, word) relation for join-mode probing —
        zero words omitted."""
        rows = [(i, w) for i, w in enumerate(self.words) if w != 0]
        return _rows_df(spark, rows, "word_idx int, word long")

    def prefilter_join(
        self,
        probe: DataFrame,
        key: Column,
        spark: SparkSession,
        *,
        negate: bool = False,
    ) -> DataFrame:
        """Join-mode probe for filters too large to inline as a plan
        literal: one broadcast hash join per hash function on
        ``word_idx`` (keeps row identity — no explode/regroup), then a
        codegen bit test. A probe row survives only if every hash's
        word exists AND has the bit set; ``negate=True`` keeps the
        complement (rows definitely NOT in the filter — the novel-row
        side of a dedup)."""
        words = self.words_df(spark)
        out = probe
        conds = []
        for i, b in enumerate(_buckets(key, self.n_bits, self.seeds)):
            w_idx, w_col = f"__bf_idx{i}", f"__bf_w{i}"
            side = F.broadcast(
                words.select(
                    F.col("word_idx").alias(w_idx), F.col("word").alias(w_col)
                )
            )
            out = out.withColumn(
                w_idx, F.floor(b / F.lit(64)).cast("int")
            ).join(side, on=w_idx, how="left")
            conds.append(
                F.col(w_col).isNotNull()
                & (F.getbit(F.col(w_col), (b % 64).cast("int")) == F.lit(1))
            )
        keep = conds[0]
        for c in conds[1:]:
            keep = keep & c
        if negate:
            keep = ~keep
        drop = [c for i in range(len(self.seeds)) for c in (f"__bf_idx{i}", f"__bf_w{i}")]
        return out.filter(keep).drop(*drop)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """One-row persistable form (write as parquet next to the data
        it summarizes; reload with :func:`bloom_load`)."""
        return _rows_df(spark, 
            [(self.n_bits, self.seeds, self.words)],
            "n_bits long, seeds array<long>, words array<long>",
        )


def bloom_build(
    df: DataFrame,
    key: Column | str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> BloomFilter:
    """Aggregate ``df``'s key column into a Bloom filter.

    One explode (×n_hashes) + one groupBy on the word index with
    map-side partial ``bit_or``: the shuffle carries at most
    ``n_bits/64`` rows per map task regardless of input size, and the
    driver collect is the dense word array (8 bytes per 64 bits).
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    key_col = F.col(key) if isinstance(key, str) else key
    seeds = _seeds(n_hashes)
    n_words = n_bits // 64
    agg = (
        df.select(F.explode(F.array(*_buckets(key_col, n_bits, seeds))).alias("bucket"))
        .select(
            F.floor(F.col("bucket") / F.lit(64)).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bucket % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in agg:
        words[r.word_idx] = r.word
    return BloomFilter(words=words, n_bits=n_bits, seeds=seeds)


def bloom_merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """OR two filters built with identical parameters — the incremental
    maintenance op: yesterday's persisted filter ∪ today's batch filter,
    without ever re-reading yesterday's keys. Python's | on signed
    64-bit values is two's-complement-correct, so words with bit 63 set
    (negative longs) merge exactly."""
    if a.n_bits != b.n_bits or a.seeds != b.seeds:
        raise ValueError(
            "bloom_merge requires identical n_bits and seeds: "
            f"{a.n_bits}/{a.seeds} vs {b.n_bits}/{b.seeds}"
        )
    return BloomFilter(
        words=[x | y for x, y in zip(a.words, b.words)],
        n_bits=a.n_bits,
        seeds=list(a.seeds),
    )


def bloom_load(df: DataFrame) -> BloomFilter:
    """Rehydrate a filter persisted with :meth:`BloomFilter.to_df`."""
    row = df.collect()[0]
    return BloomFilter(
        words=list(row.words), n_bits=int(row.n_bits), seeds=list(row.seeds)
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_key: str,
    build_key: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """``probe WHERE probe_key IN (SELECT build_key FROM build)``, with
    the bloom prefilter evaluated scan-side on the probe BEFORE the
    semi-join's exchange — the shuffle moves only rows that (probably)
    match. With ``exact=False`` the result may keep false positives
    (~0.05% at default sizing) but costs no shuffle at all.

    At 100 TB this is the explicit, persistable version of Spark's
    runtime bloom-join filtering: build once from the authoritative
    side, prune every later probe batch at the scan.
    """
    build_key = build_key or probe_key
    bf = bloom_build(build, build_key, n_bits=n_bits, n_hashes=n_hashes)
    pre = probe.filter(bf.might_contain(F.col(probe_key)))
    if not exact:
        return pre
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pre.join(keys, on=probe_key, how="leftsemi")
