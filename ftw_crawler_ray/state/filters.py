"""URL-seen membership filters: Bloom and Cuckoo, both serializable.

north_rule T6: each frontier shard owns a URL-seen filter that
round-trips byte-exactly through Parquet checkpoints so a resumed
crawl reproduces the same final URL-seen set (SURVEY.md §2.7, §7.4.6).

The cuckoo filter (Fan et al., CoNEXT 2014 — public algorithm) gives
~0.03% false positives at 12-bit fingerprints / 4-way buckets and
supports deletion; at 10^10 urls sharded over 4096 shards each shard
filter holds ~2.4M keys ≈ 4 MiB. A false positive silently drops a
URL, so crawls that must *prove* set-equality against an oracle can
wrap it in ExactSeenSet (hash-set fallback; memory-bounded only by
the shard's key count).
"""

from __future__ import annotations

import hashlib

import numpy as np

_FP_BITS = 12
_FP_MASK = (1 << _FP_BITS) - 1
_SLOTS = 4
_MAX_KICKS = 500


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


class CuckooFilter:
    """4-way, 12-bit-fingerprint cuckoo filter over numpy uint16."""

    def __init__(self, capacity: int, seed: int = 42):
        # ~95% load factor headroom; power-of-two bucket count
        n_buckets = 1
        while n_buckets * _SLOTS * 0.95 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    # fingerprint 0 means "empty slot"; remap to 1
    def _fp_index(self, key: str):
        h = _h64(key.encode("utf-8"))
        fp = (h & _FP_MASK) or 1
        i1 = (h >> 16) % self.n_buckets
        i2 = (i1 ^ _h64(fp.to_bytes(2, "big"))) % self.n_buckets
        return fp, i1, i2

    def __contains__(self, key: str) -> bool:
        fp, i1, i2 = self._fp_index(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def add(self, key: str) -> bool:
        """Insert; returns False when the filter is over-full (caller
        should grow/split the shard)."""
        fp, i1, i2 = self._fp_index(key)
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i][empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self.table[i][slot] = self.table[i][slot], fp
            i = (i ^ _h64(int(fp).to_bytes(2, "big"))) % self.n_buckets
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i][empty[0]] = fp
                self.count += 1
                return True
        return False

    def add_if_unseen(self, key: str) -> bool:
        """True ⇔ key was new (the frontier dedup primitive)."""
        if key in self:
            return False
        if not self.add(key):
            raise MemoryError("cuckoo filter over capacity")
        return True

    # -- checkpoint serialization (byte-exact round-trip) -------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.n_buckets, self.count, self.seed], dtype=np.int64)
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        header = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets = int(header[0])
        obj.count = int(header[1])
        obj.seed = int(header[2])
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16)
            .reshape(obj.n_buckets, _SLOTS)
            .copy()
        )
        obj._rng = np.random.default_rng(obj.seed)
        return obj


class BloomFilter:
    """k-hash Bloom filter over a numpy bit array (no deletes;
    smaller than cuckoo at equal FP rate for write-once sets)."""

    def __init__(self, capacity: int, fp_rate: float = 0.001):
        n_bits = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = (n_bits + 63) // 64 * 64
        self.k = max(1, int(self.n_bits / max(1, capacity) * np.log(2)))
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, key: str) -> np.ndarray:
        h1 = _h64(key.encode("utf-8"))
        h2 = _h64(b"\x01" + key.encode("utf-8")) | 1
        return (h1 + np.arange(self.k, dtype=np.uint64) * h2) % self.n_bits

    def add(self, key: str) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def __contains__(self, key: str) -> bool:
        pos = self._positions(key)
        return bool(((self.bits[pos // 8] >> (pos % 8)) & 1).all())

    def to_bytes(self) -> bytes:
        return (
            np.array([self.n_bits, self.k], dtype=np.int64).tobytes()
            + self.bits.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        header = np.frombuffer(data[:16], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_bits = int(header[0])
        obj.k = int(header[1])
        obj.bits = np.frombuffer(data[16:], dtype=np.uint8).copy()
        return obj


class ExactSeenSet:
    """Exact hash-set URL-seen (oracle mode): serialized as sorted
    newline-joined utf-8 — deterministic bytes for checkpoints."""

    def __init__(self):
        self._set: set[str] = set()

    def add_if_unseen(self, key: str) -> bool:
        if key in self._set:
            return False
        self._set.add(key)
        return True

    def __contains__(self, key: str) -> bool:
        return key in self._set

    @property
    def count(self) -> int:
        return len(self._set)

    def to_bytes(self) -> bytes:
        return "\n".join(sorted(self._set)).encode("utf-8")

    @classmethod
    def from_bytes(cls, data: bytes) -> "ExactSeenSet":
        obj = cls()
        if data:
            obj._set = set(data.decode("utf-8").split("\n"))
        return obj
