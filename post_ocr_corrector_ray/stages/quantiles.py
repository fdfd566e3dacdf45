"""Exact distributed quantiles via a mergeable value-histogram.

Shape: per-batch ``value_counts`` partials (one row per distinct value per
batch) → coarse-partitioned exact sum per value (stages/shuffle.grouped_agg —
the shuffle moves (value, count) partials, never raw rows) → tiny driver
merge: sort the distinct values, cumulative-sum the counts, and read each
quantile off the cumulative histogram.

Exactness contract: the result is the *discrete* quantile (DuckDB
``quantile_disc`` semantics — the smallest value whose cumulative count
reaches ``ceil(q·n)``), computed exactly.  Driver memory is O(distinct
values), which is what makes this scale-safe for the integer/categorical
columns it targets (lengths, counts, scores in fixed grids); an unbounded
continuous domain needs a sketch (t-digest) and is out of scope here —
callers quantize first.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import DEFAULT_PARTITIONS, grouped_agg


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: list[float], *,
                    num_partitions: int = DEFAULT_PARTITIONS) -> pa.Table:
    """Exact discrete quantiles of ``ds[col]`` at each q in ``qs``.

    Returns a tiny arrow table (q: double, value: int64) — one row per
    requested quantile.  Nulls in ``col`` are ignored (SQL aggregate
    semantics)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_pandas().dropna()
        g = v.value_counts().rename_axis("value").reset_index(name="n")
        g["value"] = g["value"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["value"], {"n": ("n", "sum")},
                       num_partitions=num_partitions)
    # driver merge: O(distinct values) rows
    parts = [b for b in hist.iter_batches(batch_size=65536, batch_format="pandas")]
    merged = (pd.concat(parts).groupby("value", as_index=False)["n"].sum()
              .sort_values("value"))
    values = merged["value"].to_numpy(np.int64)
    cum = np.cumsum(merged["n"].to_numpy(np.int64))
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))          # 1-based, quantile_disc
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(int(values[idx]) if n else None)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_exact_quantiles(ds: ray.data.Dataset, col: str, group_col: str,
                            qs: list[float], *,
                            num_partitions: int = DEFAULT_PARTITIONS) -> pa.Table:
    """Per-group exact discrete quantiles: same mergeable histogram shape,
    keyed (group, value); driver merge is O(groups × distinct values).
    Returns (group, q, value) — one row per group per quantile."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(),
                           "value": batch.column(col).to_pandas()}).dropna()
        g = df.groupby([group_col, "value"], as_index=False).size() \
              .rename(columns={"size": "n"})
        g["value"] = g["value"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       [group_col, "value"], {"n": ("n", "sum")},
                       num_partitions=num_partitions)
    parts = [b for b in hist.iter_batches(batch_size=65536, batch_format="pandas")]
    merged = (pd.concat(parts).groupby([group_col, "value"], as_index=False)["n"]
              .sum().sort_values([group_col, "value"]))
    out_g, out_q, out_v = [], [], []
    for grp, sub in merged.groupby(group_col, sort=True):
        values = sub["value"].to_numpy(np.int64)
        cum = np.cumsum(sub["n"].to_numpy(np.int64))
        n = int(cum[-1])
        for q in qs:
            rank = max(1, math.ceil(q * n))
            out_g.append(grp)
            out_q.append(float(q))
            out_v.append(int(values[int(np.searchsorted(cum, rank))]))
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})
