"""Stable hashing utilities.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), so nothing
here may use it: every hash must be identical across driver, workers, and
reruns.  All hashes are blake2b-based (stdlib, fast, keyed).
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash_u64(key: str, *, salt: bytes = b"") -> int:
    """Deterministic 64-bit hash of a string (process-independent)."""
    h = hashlib.blake2b(key.encode("utf-8"), digest_size=8, key=salt[:64] if salt else b"")
    return int.from_bytes(h.digest(), "little")


def stable_hash_bytes_u64(data: bytes, *, salt: bytes = b"") -> int:
    h = hashlib.blake2b(data, digest_size=8, key=salt[:64] if salt else b"")
    return int.from_bytes(h.digest(), "little")


def partition_of(key: str, num_partitions: int) -> int:
    """Deterministic partition assignment — the resume/lineage unit."""
    return stable_hash_u64(key) % num_partitions


def content_hash_hex(text: str) -> str:
    """Hex digest used as the exact-dedup key (md5 to match the SQL oracle)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# --- vectorized multiply-shift hashing for minhash/simhash --------------------

_MERSENNE = (1 << 61) - 1


def hash_u64_array(values: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized universal hash of a uint64 array for a given seed.

    Splitmix64-style mix with a seed-derived odd multiplier; adequate
    statistical quality for minhash permutations, fully deterministic.
    """
    mult = (0x9E3779B97F4A7C15 * (seed * 2 + 1)) & 0xFFFFFFFFFFFFFFFF  # wraparound in python int
    x = values.astype(np.uint64) + np.uint64(mult)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-grams (whitespace tokens), deduplicated — the
    token-level counterpart of char shingles for n-gram Jaccard dedup."""
    toks = text.split()
    if len(toks) < n:
        base = " ".join(toks) if toks else "\x00"
        return np.array([stable_hash_u64(base)], dtype=np.uint64)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    vals = np.array([stable_hash_u64(g) for g in grams], dtype=np.uint64)
    return np.unique(vals)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-gram (character shingle) hashes as uint64, deduplicated.

    Character shingles over the raw text; blake2b per shingle would be slow,
    so shingles are hashed with a polynomial rolling scheme over codepoints in
    uint64 (wraparound arithmetic), then mixed.  Deterministic.
    """
    if len(text) < k:
        base = text if text else "\x00"
        return np.array([stable_hash_u64(base)], dtype=np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = cps.size - k + 1
    p = np.uint64(1099511628211)
    acc = np.zeros(n, dtype=np.uint64)
    for off in range(k):  # k is small (<=8); loop over offsets, vector over rows
        acc = acc * p + cps[off : off + n]
    return np.unique(hash_u64_array(acc, seed=0xC0FFEE))
