"""Embedding similarity stages: brute-force cosine top-k (baseline) and an
LSH-bucketed approximate variant (the scale path).

Scale posture: the query matrix is the broadcast small side (``ray.put`` once,
NumPy matmul per batch inside ``map_batches`` — never a shuffle join); per-batch
local top-k results merge to a global top-k on the driver (k × n_batches tiny
rows).  The LSH variant buckets vectors by random-hyperplane signs so candidate
sets shrink by ~2^bits; same groupby shape as MinHash-LSH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

SIM_DECIMALS = 6  # round similarities so Ray (NumPy) and DuckDB agree bitwise


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    lists = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lists)
    return flat.reshape(n, -1)


def cosine_sim_batch(batch: pa.Table, *, query: np.ndarray,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Cosine similarity of every row vector against one query vector."""
    m = _to_matrix(batch.column(vec_col))
    qn = query / np.linalg.norm(query)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    sims = (m @ qn) / norms
    return pa.table({id_col: batch.column(id_col),
                     "sim": pa.array(np.round(sims, SIM_DECIMALS), pa.float64())})


def ann_topk(ds: ray.data.Dataset, query: np.ndarray, *, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Exact top-k by cosine: per-batch local top-k → driver merge.

    Ties broken by ascending id (deterministic, matches the SQL oracle's
    ``ORDER BY sim DESC, vec_id``).
    """
    def local_topk(batch: pa.Table) -> pa.Table:
        scored = cosine_sim_batch(batch, query=query, vec_col=vec_col, id_col=id_col)
        sims = scored.column("sim").to_numpy()
        ids = scored.column(id_col).to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return scored.take(pa.array(order))

    parts = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows = sorted(parts, key=lambda r: (-r["sim"], r[id_col]))[:k]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})


def nearest_neighbor_join(ds: ray.data.Dataset, all_vectors_ref, *,
                          vec_col: str = "embedding", id_col: str = "vec_id") -> ray.data.Dataset:
    """For every vector: its nearest other vector by cosine (brute force).

    ``all_vectors_ref`` = ``ray.put((ids, matrix))`` — the broadcast side,
    fetched once per task from the object store (zero-copy for the ndarray).
    """

    def nn_batch(batch: pa.Table) -> pa.Table:
        import ray

        ref_ids, ref_m = (all_vectors_ref if isinstance(all_vectors_ref, tuple)
                          else ray.get(all_vectors_ref))
        ref_norms = np.linalg.norm(ref_m, axis=1)
        ref_norms[ref_norms == 0] = 1.0
        m = _to_matrix(batch.column(vec_col))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        # dot / (|a|·|b|) — same op order as the SQL oracle's cosine, keeping
        # float results within ~1 ulp of DuckDB's before rounding
        sims = (m @ ref_m.T) / (norms[:, None] * ref_norms[None, :])
        ids = batch.column(id_col).to_numpy()
        self_mask = ids[:, None] == np.asarray(ref_ids)[None, :]
        sims_r = np.round(sims, SIM_DECIMALS)
        sims_r[self_mask] = -np.inf
        # winner: max rounded sim, ties → smallest ref id (lexsort per row)
        order = np.argsort(np.asarray(ref_ids))
        sims_sorted = sims_r[:, order]
        best_pos = np.argmax(sims_sorted, axis=1)  # first max → smallest id on ties
        nn_ids = np.asarray(ref_ids)[order][best_pos]
        nn_sims = sims_sorted[np.arange(len(ids)), best_pos]
        return pa.table({id_col: batch.column(id_col),
                         "nn_id": pa.array(nn_ids, pa.int64()),
                         "nn_sim": pa.array(nn_sims, pa.float64())})

    return ds.map_batches(nn_batch, batch_format="pyarrow")


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means (NumPy) for the IVF coarse quantizer.

    At 100 TB the sample comes from ``ds.random_sample(frac, seed)`` — the
    quantizer trains on a driver-side sample, assignment runs distributed."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_assign_batch(batch: pa.Table, *, centroids: np.ndarray,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    m = _to_matrix(batch.column(vec_col))
    d2 = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return pa.table({id_col: batch.column(id_col),
                     "ivf_cluster": pa.array(d2.argmin(axis=1).astype(np.int64))})


def ann_topk_ivf(ds: ray.data.Dataset, query: np.ndarray, *, k: int = 10,
                 n_clusters: int = 16, n_probe: int = 4, seed: int = 42,
                 train_sample: np.ndarray | None = None,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """IVF approximate top-k: score only vectors whose coarse cluster is among
    the query's ``n_probe`` nearest centroids (the classic inverted-file ANN
    scale path; brute force within probed lists)."""
    if train_sample is None:
        sample_rows = ds.limit(4096).to_pandas()
        train_sample = np.array(sample_rows[vec_col].tolist(), dtype=np.float64)
    centroids = kmeans_fit(train_sample, n_clusters, seed=seed)
    qd2 = ((centroids - query[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(qd2)[:n_probe].tolist())

    def local(batch: pa.Table) -> pa.Table:
        assign = ivf_assign_batch(batch, centroids=centroids, vec_col=vec_col,
                                  id_col=id_col)
        keep = pa.array([c in probe for c in assign.column("ivf_cluster").to_pylist()])
        cand = batch.filter(keep)
        if cand.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        scored = cosine_sim_batch(cand, query=query, vec_col=vec_col, id_col=id_col)
        sims = scored.column("sim").to_numpy()
        ids = scored.column(id_col).to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return scored.take(pa.array(order))

    parts = ds.map_batches(local, batch_format="pyarrow").take_all()
    rows = sorted(parts, key=lambda r: (-r["sim"], r[id_col]))[:k]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})


def lsh_bucket_batch(batch: pa.Table, *, planes: np.ndarray,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Random-hyperplane LSH bucket id per vector (the ANN scale path):
    bucket = sign-bit pattern of ``planes @ v``."""
    m = _to_matrix(batch.column(vec_col))
    signs = (m @ planes.T) > 0  # (B, bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    buckets = (signs.astype(np.int64) * weights).sum(axis=1)
    return pa.table({id_col: batch.column(id_col),
                     "bucket": pa.array(buckets, pa.int64())})


def make_planes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(bits, dim))


def ann_topk_lsh(ds: ray.data.Dataset, query: np.ndarray, *, k: int = 10,
                 bits: int = 8, seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> pa.Table:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (falls back to exact when the bucket has < k members)."""
    planes = make_planes(len(query), bits=bits, seed=seed)
    q_bucket = int(((planes @ query) > 0).astype(np.int64)
                   @ (1 << np.arange(bits, dtype=np.int64)))

    def local(batch: pa.Table) -> pa.Table:
        b = lsh_bucket_batch(batch, planes=planes, vec_col=vec_col, id_col=id_col)
        keep = pa.compute.equal(b.column("bucket"), q_bucket)
        cand = batch.filter(keep)
        if cand.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        scored = cosine_sim_batch(cand, query=query, vec_col=vec_col, id_col=id_col)
        sims = scored.column("sim").to_numpy()
        ids = scored.column(id_col).to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        return scored.take(pa.array(order))

    parts = ds.map_batches(local, batch_format="pyarrow").take_all()
    rows = sorted(parts, key=lambda r: (-r["sim"], r[id_col]))[:k]
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
