"""Partitioned bloom filter over the URL-seen set.

The reference's seen set is an O(1) in-memory array scan
(map_reduce.rb:40-42). At 10^10 URLs the exact set lives in the ``seen``
table and membership is an anti-join (a shuffle); this bloom filter is the
prefilter that lets definite-misses skip that shuffle. Bloom errs only
toward false *positives*, and positives still go through the exact
anti-join — so the filter changes cost, never results (F-3 exactness).

Build path (all public API, Arrow-batched):
  seen.select(xxhash64(key)) → mapInPandas: each partition sets its bits
  into a local numpy bitmap and emits it → driver ORs the (few, small)
  bitmaps → broadcast. At cluster scale the OR is a treeAggregate-shaped
  reduction; with ~128 MiB bitmaps and 1000 executors that is one
  broadcast round-trip per crawl round, amortized over millions of
  candidate URLs.

k hash probes are derived from the single 64-bit xxhash via double
hashing (h1 + i*h2), the standard Kirsch–Mitzenmacher construction.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _probe_positions(h: np.ndarray, n_bits: int, k: int) -> Iterator[np.ndarray]:
    h = h.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd => full-period
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


class Bloom:
    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits  # uint8 bitmap, n_bits/8 bytes
        self.n_bits = n_bits
        self.k = k

    def might_contain(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        for pos in _probe_positions(h, self.n_bits, self.k):
            bit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
            out &= bit.astype(bool)
        return out

    def fill_ratio(self) -> float:
        """Fraction of set bits — the saturation gauge."""
        return float(_POPCOUNT[self.bits].sum()) / self.n_bits

    def est_fpp(self) -> float:
        """Measured false-positive probability: fill^k (exact for the
        realized bitmap, no independence assumption on n needed)."""
        return self.fill_ratio() ** self.k


def auto_bits(n: int, k: int) -> int:
    """Power-of-two bit count sized so FPP ≈ 2^-k at ``n`` entries
    (m = n·k/ln2, the textbook optimum for a fixed k)."""
    import math

    target = max(n, 1) * k / math.log(2)
    return 1 << max(14, math.ceil(math.log2(target)))


def design_capacity(n_bits: int, k: int) -> int:
    """Entry count a bitmap of ``n_bits`` supports at FPP ≈ 2^-k —
    past this the filter should be rebuilt larger (a bloom cannot grow)."""
    import math

    return int(n_bits * math.log(2) / k)


def build_bloom(hashes: DataFrame, n_bits: int = 1 << 22, k: int = 5) -> Bloom:
    """``hashes``: single LongType column 'h' (xxhash64 of the seen key)."""
    n_bytes = n_bits // 8

    def partition_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            for pos in _probe_positions(h, n_bits, k):
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = hashes.mapInPandas(partition_bitmap, "bitmap binary").collect()
    bits = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return Bloom(bits, n_bits, k)


def broadcast_filter(spark: SparkSession, filt):
    """Broadcast a seen filter once per generation; the caller owns the
    handle and must ``destroy()`` it when the filter is superseded (a
    fresh broadcast per round with no destroy accumulates on executors)."""
    return spark.sparkContext.broadcast(filt)


def might_contain_bc(bc, hash_col: Column) -> Column:
    """Vectorized membership test over an EXISTING filter broadcast.
    Works for any filter exposing
    ``might_contain(np.ndarray[uint64]) -> np.ndarray[bool]`` —
    Bloom here, frontier.cuckoo.CuckooFilter / ShardedCuckoo."""

    @F.pandas_udf("boolean")
    def _test(h: pd.Series) -> pd.Series:
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(bc.value.might_contain(hv))

    return _test(hash_col)


def might_contain_col(spark: SparkSession, filt, hash_col: Column) -> Column:
    """One-shot convenience wrapper (tests): broadcast + test. Long-lived
    callers (the crawler round loop) use broadcast_filter/might_contain_bc
    so the broadcast lifecycle is explicit."""
    return might_contain_bc(broadcast_filter(spark, filt), hash_col)


def seen_hash_col(uri: Column, depth: Column) -> Column:
    """Canonical 64-bit hash of the (uri, depth) seen key (F-3)."""
    return F.xxhash64(uri, depth)
