"""Sequence packing for LLM training: assign documents to fixed-token-budget
training packs in deterministic corpus order (the "concat-and-chunk" packing
rule every large-model data loader applies before batching).

Rule: documents are laid end-to-end in ``key_col`` order; a document whose
exclusive running-word-total is ``s`` belongs to pack ``s // budget``.  Packs
can overshoot the budget by at most one document (standard greedy fill —
the bin boundary splits *between* documents, never inside one).

The core primitive is a **distributed exclusive prefix sum without a global
sort** (the scan analog of stages/quantiles.py::global_rank):

1. key-domain probe — per-batch (min, max) partials, tiny driver merge;
2. fixed-width range buckets over the key domain; per-batch per-bucket value
   sums pre-aggregated, merged on the driver (≤ ``num_partitions`` rows) into
   exclusive bucket base offsets, broadcast once via ``ray.put``;
3. ONE bucket-keyed exchange; inside each bucket rows sort by key and a local
   cumsum + the bucket's base offset yields the exact global prefix.

Scale posture: three passes over a (key, value) projection that is ~16
bytes/row — at 100 TB the projection would be checkpointed to Parquet after
pass 0 and the two scans would read that, not the corpus.  Driver memory is
O(num_partitions); the exchange moves the projection once.  Skew: the
DEFAULT bucket edges sit at sampled key QUANTILES (per-batch equi-spaced key
samples → driver sort → one edge per 1/P quantile), so every bucket holds
~1/P of the rows whatever the key distribution; ``bucket_edges="width"``
keeps the equal-width variant (marginally cheaper probe — fine for uniform
id-like keys).  Exactness never depends on the edges: any monotone
key→bucket map yields the same prefix sums (pinned by the skewed-key test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import DEFAULT_PARTITIONS, grouped_apply


def _sample_keys(batch_keys: np.ndarray, per_batch: int = 64) -> np.ndarray:
    """Equi-spaced sample of a batch's SORTED keys — ≤ per_batch values that
    track the batch's key distribution (including both extremes)."""
    if len(batch_keys) <= per_batch:
        return np.sort(batch_keys)
    srt = np.sort(batch_keys)
    idx = np.linspace(0, len(srt) - 1, per_batch).astype(np.int64)
    return srt[idx]


def prefix_sum_by_key(ds: ray.data.Dataset, key_col: str, val_col: str, *,
                      out_col: str = "prefix_excl",
                      num_partitions: int = DEFAULT_PARTITIONS,
                      bucket_edges: str = "quantile") -> ray.data.Dataset:
    """Exact exclusive prefix sum of ``val_col`` over rows ordered by
    ``key_col`` (keys must be distinct integers).  Output: (key_col, val_col,
    out_col).

    ``bucket_edges="quantile"`` (default): bucket edges at sampled key
    quantiles — balanced bucket loads under ANY key distribution.
    ``"width"``: equal-width ranges over [min, max] (the uniform-key
    shortcut).  The result is identical either way; only load balance of the
    pass-3 exchange differs.
    """
    import ray

    if bucket_edges not in ("quantile", "width"):
        raise ValueError(f"prefix_sum_by_key: unknown bucket_edges="
                         f"{bucket_edges!r}")
    proj = ds.map_batches(lambda t: t.select([key_col, val_col]),
                          batch_format="pyarrow")

    # pass 1: key-domain probe — (min, max) partials plus an equi-spaced
    # per-batch key sample for the quantile edges
    def probe(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"sample": pa.array([], pa.int64())})
        return pa.table({"sample": pa.array(
            _sample_keys(k.astype(np.int64)), pa.int64())})

    samples = []
    for b in proj.map_batches(probe, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        s = b.column("sample").to_numpy(zero_copy_only=False)
        if len(s):
            samples.append(s)
    if not samples:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64())}))
    sample = np.sort(np.concatenate(samples))
    lo, hi = int(sample[0]), int(sample[-1])
    if bucket_edges == "quantile":
        # one edge per 1/P quantile of the sampled keys; searchsorted maps
        # out-of-sample keys to the first/last bucket naturally
        qpos = np.linspace(0, len(sample) - 1,
                           num_partitions + 1)[1:-1].astype(np.int64)
        edges = np.unique(sample[qpos])

        def bucket_of(k: np.ndarray) -> np.ndarray:
            return np.searchsorted(edges, k, side="right").astype(np.int64)

        n_buckets = len(edges) + 1
    else:
        width = max((hi - lo + num_partitions) // num_partitions, 1)

        def bucket_of(k: np.ndarray) -> np.ndarray:
            return np.clip((k - lo) // width, 0, num_partitions - 1) \
                .astype(np.int64)

        n_buckets = num_partitions

    # pass 2: per-bucket sums → exclusive bucket bases
    def bucket_sums(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = bucket_of(k)
        sums = np.bincount(bk, weights=v, minlength=n_buckets).astype(np.int64)
        nz = np.nonzero(sums)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "s": pa.array(sums[nz], pa.int64())})

    totals = np.zeros(n_buckets, dtype=np.int64)
    for b in proj.map_batches(bucket_sums, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        # np.add.at, not fancy-index +=: one driver batch holds partials from
        # MANY map tasks, so the same bucket index repeats within it
        np.add.at(totals, b.column("bucket").to_numpy(zero_copy_only=False),
                  b.column("s").to_numpy(zero_copy_only=False))
    bases = np.concatenate(([0], np.cumsum(totals)[:-1]))
    bases_ref = ray.put(bases)

    # pass 3: bucket-keyed exchange, local sorted cumsum + base
    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_bucket", pa.array(bucket_of(k), pa.int64()))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)
        out = []
        for bk, g in df.groupby("_bucket"):
            g = g.sort_values(key_col, kind="mergesort")
            v = g[val_col].to_numpy(np.int64)
            excl = np.concatenate(([0], np.cumsum(v)[:-1])) + base[int(bk)]
            out.append(pd.DataFrame({key_col: g[key_col].to_numpy(np.int64),
                                     val_col: v, out_col: excl}))
        if not out:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 val_col: pd.Series([], dtype="int64"),
                                 out_col: pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    bucketed = proj.map_batches(add_bucket, batch_format="pyarrow")
    return grouped_apply(bucketed, ["_bucket"], scan,
                         num_partitions=num_partitions)


def pack_assignments(ds: ray.data.Dataset, key_col: str, val_col: str, *,
                     budget: int, pack_col: str = "pack_id",
                     num_partitions: int = DEFAULT_PARTITIONS
                     ) -> ray.data.Dataset:
    """(key, value, pack_id): pack_id = exclusive-prefix-sum // budget."""
    pre = prefix_sum_by_key(ds, key_col, val_col,
                            num_partitions=num_partitions)

    def assign(batch: pa.Table) -> pa.Table:
        p = batch.column("prefix_excl").to_numpy(zero_copy_only=False)
        return pa.table({key_col: batch.column(key_col),
                         val_col: batch.column(val_col),
                         pack_col: pa.array(p // budget, pa.int64())})

    return pre.map_batches(assign, batch_format="pyarrow")
