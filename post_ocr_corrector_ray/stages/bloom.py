"""Distributed Bloom-filter build + membership prefilter.

The runtime-filter pattern for big/big semi joins at scale (what Spark calls
a "runtime bloom filter pushdown"): scan the KEY side once, OR together tiny
fixed-size bitmaps, broadcast the merged filter (``ray.put``), and use it to
prefilter the PROBE side *before* the exact shuffle semi-join — so the
exchange only moves rows that can possibly match (plus a bounded
false-positive fraction).  The filter itself is a few hundred KiB regardless
of input size; the OR-merge is associative, so the reduction is a two-level
tree (per-batch bitmap → per-block OR → driver OR of one bitmap per block)
and the driver never sees per-row data.

Hashing is splitmix64 (public-domain finalizer constants) evaluated
vectorized in numpy uint64 arithmetic; the k probe positions derive from one
128-bit draw via the Kirsch–Mitzenmacher double-hashing construction
(h1 + i*h2), so membership tests cost two hash evaluations per key total.

No reference analog (the reference joins in-memory); this is engine surface
for the 100 TB deployment shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_GOLD1 = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        x = (x + _GOLD1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _M1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _M2).astype(np.uint64)
        return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing h1 + i*h2 (mod m)."""
    u = keys.astype(np.uint64)
    h1 = _splitmix64(u)
    h2 = _splitmix64(u ^ _GOLD1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)


def _bitmap_from_keys(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Packed uint64 bitmap (m_bits/64 words) with all probe bits set."""
    pos = _probe_positions(keys, m_bits, k).ravel()
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & np.int64(63)).astype(np.uint64))
    return words


def build_bloom(ds: ray.data.Dataset, col: str, *,
                m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Scan ``ds[col]`` (int64 keys) and return the merged Bloom bitmap.

    Per-batch bitmaps are OR-merged inside each block task first, so the
    driver receives ONE ``m_bits/64``-word row per block (tree reduce); at
    the default m_bits=2^20 that is 128 KiB per block and a single
    ``np.bitwise_or.reduce`` at the root.
    """
    assert m_bits % 64 == 0

    def block_bitmap(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        words = _bitmap_from_keys(keys, m_bits, k)
        return pa.table({"bits": pa.array([words.tobytes()], pa.binary())})

    parts = ds.map_batches(block_bitmap, batch_format="pyarrow",
                           batch_size=64 * 1024).take_all()
    if not parts:
        return np.zeros(m_bits // 64, dtype=np.uint64)
    stack = np.stack([np.frombuffer(p["bits"], dtype=np.uint64) for p in parts])
    return np.bitwise_or.reduce(stack, axis=0)


def bloom_prefilter(ds: ray.data.Dataset, col: str, bits_ref: "ray.ObjectRef", *,
                    m_bits: int = 1 << 20, k: int = 4,
                    invert: bool = False) -> ray.data.Dataset:
    """Keep only rows whose ``col`` MAY be in the filter (no false negatives).

    With ``invert=True`` keep the rows that are DEFINITELY NOT in the filter —
    the anti-join routing side: those rows need no exchange at all, because a
    Bloom miss is exact.  (The ``invert=False`` survivors of an anti join
    still need the exact join to weed out false positives.)

    ``bits_ref`` is a ``ray.put`` of the ``build_bloom`` output — fetched
    zero-copy once per task from the object store, never re-shipped per
    batch.
    """

    def keep(batch: pa.Table) -> pa.Table:
        words = ray.get(bits_ref)
        keys = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _probe_positions(keys, m_bits, k)
        bit = (words[pos >> 6] >> (pos & np.int64(63)).astype(np.uint64)) & np.uint64(1)
        hit = bit.all(axis=1)
        return batch.filter(pa.array(~hit if invert else hit))

    return ds.map_batches(keep, batch_format="pyarrow")
