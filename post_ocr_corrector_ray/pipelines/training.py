"""Training-data feed — the Ray-Data analog of the reference's
``CorrectorDataset`` + ``DataLoader`` chain (corrector_dataset.py:16-51 split
filter + pair access; neural_corrector.py:216-226 DataLoader with
``collate_sequences``; data_functions.py:57-60 pad-to-widest with INT_EMPTY).

Torch-free by container constraint: collated batches are NumPy/Arrow rows that
map 1:1 onto ``torch.from_numpy`` / ``iter_torch_batches`` at a real training
site.  Differences from the reference, by design:

- **Deterministic shuffle.** ``DataLoader(shuffle=True)`` draws from a global
  RNG; a distributed feed can't.  Epoch shuffling here orders rows by a seeded
  hash of the example key (``shuffle_key = hash(key, epoch)``) — a
  deterministic permutation that changes every epoch and is identical for any
  block layout / worker count (pytest-pinned).
- **Exact-size batches.** Batch membership is computed from the GLOBAL rank of
  the shuffle key (two-pass: per-range counts → driver prefix sums → in-range
  local rank), so batch ``i`` contains exactly rows ``[i·B, (i+1)·B)`` of the
  permutation — byte-stable across parallelism, unlike block-aligned batching.

Scale posture: the count pass moves P small integers; the rank/collate pass is
one coarse range-shuffle (keys are uniform hashes → ranges are balanced); each
collated batch row is the padded id matrices flattened to int32 lists.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .. import INT_EMPTY
from ..functions.alphabet import Vocab
from ..functions.hashing import hash_u64_array, polyhash_u64_array

_RANGE_PARTS = 64


@lru_cache(maxsize=8)
def _vocab(alphabet: str) -> Vocab:
    return Vocab(alphabet)


def _shuffle_key(batch: pa.Table, key_col: str, epoch: int, seed: int) -> np.ndarray:
    base = polyhash_u64_array(batch.column(key_col).cast(pa.string()))
    return hash_u64_array(base, seed=seed * 1000003 + epoch)


def epoch_feed(corpus: ray.data.Dataset, *, alphabet: str,
               split: str | None = "train", batch_size: int = 8,
               epoch: int = 0, seed: int = 17, key_col: str = "url",
               messy_col: str = "messy", clean_col: str = "clean",
               ) -> ray.data.Dataset:
    """One epoch of collated (messy, clean) training batches as a Dataset.

    Each output ROW is one training batch:
    ``(batch_id, size, width_x, width_y, x: list<int32>, y: list<int32>)``
    with ``x``/``y`` the seq-padded id matrices (INT_EMPTY padding, row-major
    ``size × width``) — exactly ``collate_sequences`` of the reference (which
    is seq-first; transpose at the consumer).
    """
    if split is not None:
        corpus = corpus.filter(expr=f"split == '{split}'")

    def keyed(batch: pa.Table) -> pa.Table:
        k = _shuffle_key(batch, key_col, epoch, seed)
        return pa.table({
            "skey": pa.array(k, pa.uint64()),
            "rng": pa.array((k >> np.uint64(58)).astype(np.int64)),  # 64 ranges
            "ukey": batch.column(key_col).cast(pa.string()),  # hash-tie breaker
            messy_col: batch.column(messy_col),
            clean_col: batch.column(clean_col)})

    # exact batching needs TWO passes over the keyed projection (count, then
    # rank); materialize it once into the object store so the upstream corpus
    # pipeline (read + extraction + noise) is not re-executed for pass 2 —
    # blocks live/spill in the object store, never on the driver
    keyed_ds = corpus.map_batches(keyed, batch_format="pyarrow").materialize()

    # pass 1: rows per key range → prefix offsets (tiny driver reduce)
    def count_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch.column("rng").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"rng": pa.array(vals, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    totals = np.zeros(_RANGE_PARTS, dtype=np.int64)
    for row in keyed_ds.map_batches(count_partial, batch_format="pyarrow").take_all():
        totals[row["rng"]] += row["n"]
    prefix = np.concatenate(([0], np.cumsum(totals)))

    # pass 2: rank within range + global prefix → exact batch membership
    def rank_and_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rng, g in df.groupby("rng", sort=True):
            g = g.sort_values(["skey", "ukey"], kind="mergesort")
            rank = prefix[int(rng)] + np.arange(len(g))
            out.append(pd.DataFrame({
                "batch_id": (rank // batch_size).astype("int64"),
                "rank": rank,
                messy_col: g[messy_col].to_numpy(),
                clean_col: g[clean_col].to_numpy()}))
        if not out:
            return pd.DataFrame({"batch_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64"),
                                 messy_col: pd.Series([], dtype="object"),
                                 clean_col: pd.Series([], dtype="object")})
        return pd.concat(out, ignore_index=True)

    from ..stages.shuffle import grouped_apply

    ranked = grouped_apply(keyed_ds, ["rng"], rank_and_batch)

    def collate(df: pd.DataFrame) -> pd.DataFrame:
        v = _vocab(alphabet)
        rows = []
        for bid, g in df.groupby("batch_id", sort=True):
            g = g.sort_values("rank")
            xs = [v.encode(t or "") for t in g[messy_col]]
            ys = [v.encode(t or "") for t in g[clean_col]]
            wx = max((len(a) for a in xs), default=0)
            wy = max((len(a) for a in ys), default=0)
            x = np.full((len(xs), wx), INT_EMPTY, dtype=np.int32)
            y = np.full((len(ys), wy), INT_EMPTY, dtype=np.int32)
            for i, a in enumerate(xs):
                x[i, : len(a)] = a
            for i, a in enumerate(ys):
                y[i, : len(a)] = a
            # int32-LE bytes, not lists: hashable/sortable for the driver's
            # canonical row compare, zero-copy back via np.frombuffer
            rows.append({"batch_id": int(bid), "size": len(xs),
                         "width_x": wx, "width_y": wy,
                         "x": np.ascontiguousarray(x.astype("<i4")).tobytes(),
                         "y": np.ascontiguousarray(y.astype("<i4")).tobytes()})
        if not rows:
            return pd.DataFrame({"batch_id": pd.Series([], dtype="int64"),
                                 "size": pd.Series([], dtype="int64"),
                                 "width_x": pd.Series([], dtype="int64"),
                                 "width_y": pd.Series([], dtype="int64"),
                                 "x": pd.Series([], dtype="object"),
                                 "y": pd.Series([], dtype="object")})
        return pd.DataFrame(rows)

    return grouped_apply(ranked, ["batch_id"], collate)


def iter_epoch(corpus: ray.data.Dataset, *, alphabet: str, n_epochs: int = 1,
               **kwargs):
    """Multi-epoch trainer-facing generator: yields
    ``(epoch, batch_id, x(size,width_x), y(size,width_y))`` NumPy int32
    matrices in batch order — the DataLoader loop shape, re-shuffled per
    epoch.  Streams via ``iter_batches``; nothing is materialized."""
    for epoch in range(n_epochs):
        ds = epoch_feed(corpus, alphabet=alphabet, epoch=epoch, **kwargs)
        for rows in ds.sort("batch_id").iter_batches(batch_size=64,
                                                     batch_format="pyarrow"):
            for r in rows.to_pylist():
                x = np.frombuffer(r["x"], dtype="<i4").reshape(r["size"], r["width_x"])
                y = np.frombuffer(r["y"], dtype="<i4").reshape(r["size"], r["width_y"])
                yield epoch, r["batch_id"], x, y


def documents_corpus(sf_dir: str, *, good_chars: str = "abcdefghijklmnopqrstuvwxyz ",
                     ) -> ray.data.Dataset:
    """(url, clean, messy, split) corpus derived from the documents test table
    (keyed noise + reference split semantics — doc_id % 10)."""
    from ..functions.noise import mutilate_keyed
    from .corpus import pick_split

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        clean = [(t or "").strip() for t in texts]
        messy = [mutilate_keyed(str(i), c, good_chars)
                 for i, c in zip(ids, clean)]
        splits = [pick_split(int(i) % 10) for i in ids]
        return pa.table({"url": pa.array([str(i) for i in ids], pa.string()),
                         "clean": pa.array(clean, pa.string()),
                         "messy": pa.array(messy, pa.string()),
                         "split": pa.array(splits, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def training_feed(sf_dir: str, *, batch_size: int = 8, epoch: int = 0,
                  ) -> ray.data.Dataset:
    """queries() entry: epoch-0 collated train-split feed over documents."""
    from ..functions.alphabet import build_alphabet

    corpus = documents_corpus(sf_dir)
    alphabet = build_alphabet(set("abcdefghijklmnopqrstuvwxyz .,!?;:ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789'\"-"))
    return epoch_feed(corpus, alphabet=alphabet, batch_size=batch_size,
                      epoch=epoch)
