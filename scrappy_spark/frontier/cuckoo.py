"""Cuckoo filter — the deletable URL-seen prefilter variant.

Why a cuckoo next to the bloom (bloom.py): observe-mode re-crawls
(streaming/observe.py) EXPIRE seen entries when the recency window lapses
(repository.rb:6-12 semantics) — a bloom cannot delete, so its FPP only
grows across re-crawl generations; a cuckoo filter supports deletion with
bounded FPP. Same exactness contract as the bloom: the filter only
short-circuits definite misses; positives still anti-join the seen table
(F-3), so crawl results never depend on filter behavior.

Standard construction (Fan et al., CoNLL'14 public design): 4-slot
buckets, 16-bit fingerprints, partial-key cuckoo hashing
(alt_bucket = bucket XOR hash(fingerprint)), bounded eviction loop.
Numpy-vectorized membership for Arrow batches.

Scale note: one filter shard per hash prefix lives on each executor at
cluster scale (the driver-side single table here is the sandbox
instance); maintenance input is each round's seen DELTA (small), not the
full set.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 16, seed: int = 42):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._rng = np.random.RandomState(seed)  # eviction slot choice

    # -- hashing ----------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        """16-bit fingerprint, never 0 (0 marks an empty slot)."""
        fp = ((h >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _b1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _b2(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key: alt = b XOR hash(fp); multiply-shift over uint64
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) >> np.uint64(32)
        return (b1 ^ (fph & np.uint64(self.n_buckets - 1)).astype(np.int64))

    # -- ops ---------------------------------------------------------------
    def insert_many(self, hashes: np.ndarray) -> int:
        """Insert 64-bit hashes; returns how many were inserted (drops on
        table-full after the eviction budget — callers treat a drop as
        'filter saturated': it only costs extra anti-join probes, never
        correctness, because lookups for dropped items return negative and
        negatives are... NOTE: a false NEGATIVE would break the
        prefilter contract, so on ANY failed insert the filter marks
        itself saturated and might_contain returns all-True from then on
        (degrades to the plain anti-join path)."""
        h = hashes.astype(np.uint64)
        inserted = 0
        for i in range(len(h)):
            if not self._insert_one(h[i]):
                self.saturated = True
                return inserted
            inserted += 1
        return inserted

    saturated = False

    def _insert_one(self, h: np.uint64) -> bool:
        fp = int(self._fp(np.array([h], dtype=np.uint64))[0])
        b = int(self._b1(np.array([h], dtype=np.uint64))[0])
        alt = int(
            self._b2(np.array([b]), np.array([fp], dtype=np.uint16))[0]
        )
        for bucket in (b, alt):
            row = self.table[bucket]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        bucket = b if self._rng.rand() < 0.5 else alt
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = self._rng.randint(_SLOTS)
            cur, self.table[bucket][slot] = self.table[bucket][slot], cur
            bucket = int(
                self._b2(np.array([bucket]), np.array([cur], dtype=np.uint16))[0]
            )
            row = self.table[bucket]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove fingerprints (recency expiry). Returns #removed."""
        h = hashes.astype(np.uint64)
        fps = self._fp(h)
        b1s = self._b1(h)
        b2s = self._b2(b1s, fps)
        removed = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            for bucket in (int(b1), int(b2)):
                row = self.table[bucket]
                hit = np.where(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership over a batch of 64-bit hashes."""
        if self.saturated:
            return np.ones(len(hashes), dtype=bool)
        h = hashes.astype(np.uint64)
        fps = self._fp(h)
        b1s = self._b1(h)
        b2s = self._b2(b1s, fps)
        in1 = (self.table[b1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2s] == fps[:, None]).any(axis=1)
        return in1 | in2
