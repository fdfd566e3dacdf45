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
O(num_partitions); the exchange moves the projection once.  Skew: range
buckets are equal-width in key space, so a dense key region concentrates rows
— acceptable for id-like keys; a production variant would place bucket edges
at sampled key quantiles instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import DEFAULT_PARTITIONS, grouped_apply


def prefix_sum_by_key(ds: ray.data.Dataset, key_col: str, val_col: str, *,
                      out_col: str = "prefix_excl",
                      num_partitions: int = DEFAULT_PARTITIONS
                      ) -> ray.data.Dataset:
    """Exact exclusive prefix sum of ``val_col`` over rows ordered by
    ``key_col`` (keys must be distinct integers).  Output: (key_col, val_col,
    out_col)."""
    import ray

    proj = ds.map_batches(lambda t: t.select([key_col, val_col]),
                          batch_format="pyarrow")

    # pass 1: key domain
    def minmax(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64())})

    lo, hi = None, None
    for b in proj.map_batches(minmax, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for l, h in zip(b.column("lo").to_pylist(), b.column("hi").to_pylist()):
            lo = l if lo is None else min(lo, l)
            hi = h if hi is None else max(hi, h)
    if lo is None:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64())}))
    width = max((hi - lo + num_partitions) // num_partitions, 1)

    # pass 2: per-bucket sums → exclusive bucket bases
    def bucket_sums(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = (k - lo) // width
        sums = np.bincount(bk, weights=v, minlength=num_partitions).astype(np.int64)
        nz = np.nonzero(sums)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "s": pa.array(sums[nz], pa.int64())})

    totals = np.zeros(num_partitions, dtype=np.int64)
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
        return batch.append_column(
            "_bucket", pa.array((k - lo) // width, pa.int64()))

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
