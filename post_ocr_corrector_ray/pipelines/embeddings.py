"""Embedding-table pipelines: similarity search over ``embeddings``
(vec_id, embedding: list<float>, label)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..stages.embed import ann_topk, ann_topk_ivf, ann_topk_lsh, nearest_neighbor_join


def _emb(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """The query is a row of the table itself (so the SQL oracle can name it)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    return np.asarray(t.column("embedding")[ids.index(vec_id)].as_py(), dtype=np.float64)


def emb_ann_topk(sf_dir: str, k: int = 10) -> pa.Table:
    return ann_topk(_emb(sf_dir), _query_vector(sf_dir, 0), k=k)


def emb_ann_topk_lsh(sf_dir: str, k: int = 10) -> pa.Table:
    return ann_topk_lsh(_emb(sf_dir), _query_vector(sf_dir, 0), k=k, bits=4)


def emb_ann_topk_ivf(sf_dir: str, k: int = 10) -> pa.Table:
    return ann_topk_ivf(_emb(sf_dir), _query_vector(sf_dir, 0), k=k,
                        n_clusters=16, n_probe=4)


def emb_cosine_dups(sf_dir: str, threshold: float = 0.4) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (exact): every (a, b) with
    rounded cosine ≥ threshold, a < b.  Broadcast brute-force per batch — the
    all-pairs score is a matmul against the broadcast matrix, never a shuffle
    join; only qualifying pairs (tiny) leave each task."""
    import ray

    from ..stages.embed import SIM_DECIMALS, _to_matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    ref = ray.put((ids, m))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        ref_ids, ref_m = ray.get(ref)
        ref_norms = np.linalg.norm(ref_m, axis=1)
        ref_norms[ref_norms == 0] = 1.0
        bm = _to_matrix(batch.column("embedding"))
        bnorms = np.linalg.norm(bm, axis=1)
        bnorms[bnorms == 0] = 1.0
        sims = np.round((bm @ ref_m.T) / (bnorms[:, None] * ref_norms[None, :]),
                        SIM_DECIMALS)
        bids = batch.column("vec_id").to_numpy()
        keep = (sims >= threshold) & (bids[:, None] < ref_ids[None, :])
        ai, bj = np.nonzero(keep)
        return pa.table({"id_a": pa.array(bids[ai], pa.int64()),
                         "id_b": pa.array(np.asarray(ref_ids)[bj], pa.int64()),
                         "sim": pa.array(sims[ai, bj], pa.float64())})

    return _emb(sf_dir).map_batches(pairs_batch, batch_format="pyarrow")


def emb_nn_join(sf_dir: str) -> ray.data.Dataset:
    """Every vector's nearest other vector — broadcast brute-force."""
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    ref = ray.put((ids, m))
    return nearest_neighbor_join(_emb(sf_dir), ref)
