"""Deterministic stratified sampling — the corpus-rebalancing op of a
training-data pipeline (downsample the majority language / source / bucket,
keep the rest).

Keep rule: a row survives iff ``u32(md5(str(id))[:8]) < threshold(stratum)``
with ``threshold = floor(frac × 2³²)``.  Content-keyed (the hash, not the row
position, decides), so the sample is independent of block layout, execution
order and cluster size, unbiased under sorted/clustered input, and has an
exact ANSI-SQL twin (DuckDB ``('0x' || substr(md5(id), 1, 8))::UBIGINT``) —
unlike ``ds.random_sample``, which draws per block.

md5 is a per-row stdlib call (no vectorized kernel exists); it is the same
cost class as the exact-dedup content hash and is embarrassingly parallel
across batches.  Embarrassingly parallel stage: no shuffle, prunes rows at
the scan edge before any expensive downstream work.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _thresholds(fracs: dict[str, float], default_frac: float):
    to_t = lambda f: np.uint64(min(int(f * float(2**32)), 2**32))
    return {k: to_t(f) for k, f in fracs.items()}, to_t(default_frac)


def stratified_sample(ds: ray.data.Dataset, *, fracs: dict[str, float],
                      default_frac: float = 1.0, strat_col: str,
                      id_col: str) -> ray.data.Dataset:
    """Keep each row with its stratum's probability, deterministically keyed
    by ``md5(str(id))``.  ``fracs`` maps stratum value → keep fraction;
    strata not listed use ``default_frac``."""
    tmap, tdef = _thresholds(fracs, default_frac)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strata = batch.column(strat_col).to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in ids), dtype=np.uint64, count=len(ids))
        th = np.fromiter((tmap.get(s, tdef) for s in strata),
                         dtype=np.uint64, count=len(strata))
        return batch.filter(pa.array(h < th))

    return ds.map_batches(f, batch_format="pyarrow")
