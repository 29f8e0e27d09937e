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

Sharding (``ShardedCuckoo`` + ``build_sharded``): the filter is split
into power-of-two shards by ``h mod n_shards``; the full build runs as a
distributed job (repartition by shard, each task builds its shards'
tables and emits only the compact table bytes), so the driver never
collects raw seen hashes — it assembles fingerprint tables whose total
size is the filter itself (16 bits/entry), not the 64-bit hash stream.
Per-round deltas build a small sharded delta the same way and merge via
``insert_pairs`` (partial-key cuckoo insertion needs only (bucket, fp),
never the original hash). A shard that overflows marks ITSELF saturated
(all-True for its hash range only); other shards keep prefiltering.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4  # slots per bucket — public: capacity math in crawler.py uses it
_SLOTS = SLOTS
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
        return self._insert_from(b, fp)

    def _insert_from(self, b: int, fp: int) -> bool:
        """Insert from a (bucket, fingerprint) pair — partial-key cuckoo
        hashing never needs the original hash, which is what makes merging
        one filter's entries into another possible."""
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

    def entries(self) -> tuple[np.ndarray, np.ndarray]:
        """Occupied (bucket, fingerprint) pairs — the merge currency."""
        buckets, slots = np.nonzero(self.table)
        return buckets, self.table[buckets, slots]

    def insert_pairs(self, buckets: np.ndarray, fps: np.ndarray) -> None:
        """Merge another (same-sized) filter's entries into this one.
        A failed insert marks the filter saturated (all-True for its hash
        range — safe, never a false negative) but the remaining pairs are
        STILL inserted (ADVICE r2): entries that do fit keep the table
        closer to complete, shrinking rebuild pressure if the saturation
        flag is later cleared by a larger rebuild."""
        for b, fp in zip(buckets, fps):
            if not self._insert_from(int(b), int(fp)):
                self.saturated = True


def _rot_out_shard_bits(h: np.ndarray, n_shards: int) -> np.ndarray:
    """Rotate the shard-selector bits out of the hash before it enters a
    shard's filter. Without this, every hash in shard s has low bits == s,
    so the in-shard primary bucket (_b1 = low bits) could only reach
    1/n_shards of the table — saturating it at a fraction of capacity."""
    bits = n_shards.bit_length() - 1
    if bits == 0:
        return h
    b = np.uint64(bits)
    return (h >> b) | (h << (np.uint64(64) - b))


class ShardedCuckoo:
    """Power-of-two shards by ``h mod n_shards``. Membership dispatches
    each batch to its shard vectorized; saturation is per-shard. Hashes
    are rotated by the shard bits before touching a shard's table (see
    _rot_out_shard_bits) — build, probe, and delete all agree."""

    def __init__(self, n_shards: int = 16, buckets_per_shard: int = 1 << 12):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
        self.n_shards = n_shards
        self.buckets_per_shard = buckets_per_shard
        self.shards = [
            CuckooFilter(buckets_per_shard, seed=42 + s) for s in range(n_shards)
        ]

    @property
    def count(self) -> int:
        return sum(s.count for s in self.shards)

    @property
    def saturated_shards(self) -> int:
        return sum(1 for s in self.shards if s.saturated)

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        sid = (h % np.uint64(self.n_shards)).astype(np.int64)
        hr = _rot_out_shard_bits(h, self.n_shards)
        out = np.empty(len(h), dtype=bool)
        for s in np.unique(sid):
            m = sid == s
            out[m] = self.shards[int(s)].might_contain(hr[m])
        return out

    def insert_many(self, hashes: np.ndarray) -> None:
        """Driver-side insert (tests / tiny deltas); the distributed path
        is build_sharded + merge."""
        h = hashes.astype(np.uint64)
        sid = (h % np.uint64(self.n_shards)).astype(np.int64)
        hr = _rot_out_shard_bits(h, self.n_shards)
        for s in np.unique(sid):
            self.shards[int(s)].insert_many(hr[sid == s])

    def delete_many(self, hashes: np.ndarray) -> int:
        h = hashes.astype(np.uint64)
        sid = (h % np.uint64(self.n_shards)).astype(np.int64)
        hr = _rot_out_shard_bits(h, self.n_shards)
        removed = 0
        for s in np.unique(sid):
            removed += self.shards[int(s)].delete_many(hr[sid == s])
        return removed

    def merge(self, delta: "ShardedCuckoo") -> None:
        """Fold a delta filter (same geometry) in, shard by shard, via
        (bucket, fp) pairs — no raw hashes cross the driver."""
        assert delta.n_shards == self.n_shards
        assert delta.buckets_per_shard == self.buckets_per_shard
        for mine, theirs in zip(self.shards, delta.shards):
            if theirs.saturated:
                mine.saturated = True
            b, fp = theirs.entries()
            if len(b):
                mine.insert_pairs(b, fp)


def build_sharded(
    hashes_df, n_shards: int = 16, buckets_per_shard: int = 1 << 12
) -> ShardedCuckoo:
    """Distributed build: repartition the hash column by shard id, each
    task builds the cuckoo tables for the shards it owns, the driver
    assembles the (compact) table bytes. Input: DataFrame with a single
    LongType column ``h``. No raw-hash collect — the only driver traffic
    is n_shards rows of table bytes (16 bits per entry)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def build_parts(batches):
        groups: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            sid = (h % np.uint64(n_shards)).astype(np.int64)
            hr = _rot_out_shard_bits(h, n_shards)
            for s in np.unique(sid):
                groups.setdefault(int(s), []).append(hr[sid == s])
        for s, arrs in groups.items():
            f = CuckooFilter(buckets_per_shard, seed=42 + s)
            f.insert_many(np.concatenate(arrs))
            yield pd.DataFrame(
                {
                    "shard": [s],
                    "tbl": [f.table.tobytes()],
                    "cnt": [f.count],
                    "sat": [bool(f.saturated)],
                }
            )

    rows = (
        hashes_df.repartition(n_shards, F.pmod(F.col("h"), F.lit(n_shards)))
        .mapInPandas(build_parts, "shard int, tbl binary, cnt long, sat boolean")
        .collect()
    )
    out = ShardedCuckoo(n_shards, buckets_per_shard)
    for r in rows:
        f = out.shards[r["shard"]]
        f.table = (
            np.frombuffer(r["tbl"], dtype=np.uint16).reshape(-1, _SLOTS).copy()
        )
        f.count = int(r["cnt"])
        f.saturated = bool(r["sat"])
    return out
