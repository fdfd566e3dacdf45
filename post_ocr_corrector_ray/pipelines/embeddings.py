"""Embedding-table pipelines: similarity search over ``embeddings``
(vec_id, embedding: list<float>, label)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..stages.embed import ann_topk, ann_topk_lsh, nearest_neighbor_join


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


def emb_nn_join(sf_dir: str) -> ray.data.Dataset:
    """Every vector's nearest other vector — broadcast brute-force."""
    import ray

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    ref = ray.put((ids, m))
    return nearest_neighbor_join(_emb(sf_dir), ref)
