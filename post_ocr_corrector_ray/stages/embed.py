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


def ann_topk_multi(ds: ray.data.Dataset, query_ids: np.ndarray,
                   queries: np.ndarray, *, k: int = 10,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> pa.Table:
    """BATCHED exact vector search — the shape a serving tier actually runs
    (queries arrive in batches, not one at a time): one corpus scan answers
    every query.  The Q×d query matrix is the broadcast small side
    (``ray.put`` once); each batch does a single (B×d)@(d×Q) matmul, emits
    per-query local top-k partials (k·Q rows per batch), and the driver
    merges per query — so corpus I/O is paid once for Q queries instead of
    Q times.  Ties → ascending id, matching the SQL twin's
    ``QUALIFY row_number() OVER (PARTITION BY query_id
    ORDER BY sim DESC, vec_id)``.  Returns (query_id, vec_id, sim, rank)."""
    import ray as _ray

    qm = np.asarray(queries, dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_ref = _ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = _ray.get(q_ref)
        m = _to_matrix(batch.column(vec_col))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((m @ qmat.T) / norms[:, None], SIM_DECIMALS)  # B×Q
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        out_q, out_id, out_s = [], [], []
        for j in range(sims.shape[1]):       # Q iterations, vectorized body
            order = np.lexsort((ids, -sims[:, j]))[:k]
            out_q.append(np.full(len(order), qids[j], np.int64))
            out_id.append(ids[order])
            out_s.append(sims[order, j])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64())})

    parts = [b for b in ds.map_batches(local_topk, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    if not parts:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    allp = pa.concat_tables(parts)
    qcol = allp.column("query_id").to_numpy(zero_copy_only=False)
    icol = allp.column(id_col).to_numpy(zero_copy_only=False)
    scol = allp.column("sim").to_numpy(zero_copy_only=False)
    out = {"query_id": [], id_col: [], "sim": [], "rank": []}
    for qid in np.unique(qcol):              # Q tiny driver merges
        sel = qcol == qid
        order = np.lexsort((icol[sel], -scol[sel]))[:k]
        out["query_id"].append(np.full(len(order), qid, np.int64))
        out[id_col].append(icol[sel][order])
        out["sim"].append(scol[sel][order])
        out["rank"].append(np.arange(1, len(order) + 1, dtype=np.int64))
    return pa.table({c: pa.array(np.concatenate(v)) for c, v in out.items()})


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


def deterministic_sample(ds: ray.data.Dataset, *, frac: float,
                         id_col: str = "vec_id", seed: int = 7) -> ray.data.Dataset:
    """Unbiased deterministic sample: keep rows whose seeded id-hash falls
    below ``frac`` of the hash range.

    Chosen over ``ds.random_sample`` deliberately: the result is independent
    of block layout / execution order (``random_sample`` draws per block), so
    quantizer training is reproducible across cluster sizes AND replicable
    outside Ray (the DuckDB oracle re-derives identical centroids).  Unbiased
    under sorted/clustered input because the hash, not the position, decides.
    """
    from ..functions.hashing import hash_u64_array

    if frac >= 1.0:
        return ds
    thresh = np.uint64(int(frac * float(2**64)))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = hash_u64_array(ids, seed=seed) < thresh
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def train_quantizer_sample(ds: ray.data.Dataset, *, target: int = 4096,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           seed: int = 7,
                           approx_count: int | None = None) -> np.ndarray:
    """Collect a small deterministic training sample for the IVF quantizer
    (sorted by id so the matrix is independent of execution order).

    ``approx_count``: pass the parquet-metadata row count when known — it only
    sets the sample FRACTION, so an estimate is fine and saves a count() pass.
    """
    n = approx_count if approx_count is not None else ds.count()
    frac = min(1.0, target / max(n, 1))
    rows = deterministic_sample(ds.select_columns([id_col, vec_col]),
                                frac=frac, id_col=id_col, seed=seed).take_all()
    rows.sort(key=lambda r: r[id_col])
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means (NumPy) for the IVF coarse quantizer.

    At 100 TB the sample comes from ``deterministic_sample`` (id-hash
    filtered) — the quantizer trains on a driver-side sample, assignment runs
    distributed."""
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
                 approx_count: int | None = None,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """IVF approximate top-k: score only vectors whose coarse cluster is among
    the query's ``n_probe`` nearest centroids (the classic inverted-file ANN
    scale path; brute force within probed lists).

    The query's CONTRACT (and its SQL oracle) is "exact top-k within the
    probed subset": the oracle re-derives the same centroids (deterministic
    id-hash sample + seeded Lloyd) and the same probe list, so the result
    hash-matches; true recall vs the unrestricted top-k is measured in pytest
    and governed by ``n_probe`` (raise it for recall, lower it for speed)."""
    if train_sample is None:
        train_sample = train_quantizer_sample(ds, vec_col=vec_col, id_col=id_col,
                                              approx_count=approx_count)
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


# --- distributed exact all-pairs (block cross-product) ------------------------


def _block_refs(ds: ray.data.Dataset, *, id_col: str, vec_col: str,
                num_blocks: int):
    """Partition (id, vec) into object-store-resident Arrow blocks and return
    their refs.  The driver holds only ObjectRefs — blocks live (and spill)
    in the object store; each cross-product task fetches exactly the two
    blocks it scores (zero-copy Arrow reads)."""
    mat = ds.select_columns([id_col, vec_col]).repartition(num_blocks).materialize()
    return mat.to_arrow_refs()


def _ids_matrix(tbl: pa.Table, id_col: str, vec_col: str):
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    m = _to_matrix(tbl.column(vec_col))
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return ids, m, norms


def cosine_pairs_blockwise(ds: ray.data.Dataset, *, threshold: float,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           num_blocks: int = 8) -> ray.data.Dataset:
    """EXACT cosine near-dup pairs without any driver-side materialization:
    B object-store blocks → B(B+1)/2 block-pair tasks, each a vectorized
    matmul emitting only qualifying (id_a < id_b) pairs.

    The exact all-pairs score is inherently O(n²) (so is its SQL oracle); this
    distributes it across the cluster with per-task memory = 2 blocks.  For
    approximate sub-quadratic candidates see ``ivf_candidate_pairs``."""
    import ray

    refs = _block_refs(ds, id_col=id_col, vec_col=vec_col, num_blocks=num_blocks)
    items = [{"bi": i, "bj": j}
             for i in range(len(refs)) for j in range(i, len(refs))]
    pair_ds = ray.data.from_items(items, override_num_blocks=len(items))

    def work(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ta = ray.get(refs[bi])
            tb = ta if bj == bi else ray.get(refs[bj])
            ids_a, ma, na = _ids_matrix(ta, id_col, vec_col)
            ids_b, mb, nb = (ids_a, ma, na) if bj == bi else _ids_matrix(tb, id_col, vec_col)
            sims = np.round((ma @ mb.T) / (na[:, None] * nb[None, :]), SIM_DECIMALS)
            keep = sims >= threshold
            if bj == bi:
                # diagonal block: upper triangle avoids (x,x) and mirrors
                keep &= ids_a[:, None] < ids_b[None, :]
            ai, bjx = np.nonzero(keep)
            pa_ids, pb_ids = ids_a[ai], ids_b[bjx]
            # blocks are NOT id-ordered (repartition layout), so a cross-block
            # pair may have its smaller id in either block — normalize to
            # (min, max); each unordered pair appears in exactly one block pair
            out_a.append(np.minimum(pa_ids, pb_ids))
            out_b.append(np.maximum(pa_ids, pb_ids))
            out_s.append(sims[ai, bjx])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                         "sim": pa.array(np.concatenate(out_s), pa.float64())})

    return pair_ds.map_batches(work, batch_format="pyarrow")


def nn_join_blockwise(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", num_blocks: int = 8) -> ray.data.Dataset:
    """EXACT nearest-neighbor join, distributed: block-pair tasks emit per-row
    partial bests (max rounded sim, ties → smallest neighbor id), then a
    coarse-partitioned reduce keeps the global best per id.  Shuffle volume is
    O(n · B) tiny partial rows, never vectors."""
    import pandas as pd

    import ray

    from .shuffle import grouped_apply

    refs = _block_refs(ds, id_col=id_col, vec_col=vec_col, num_blocks=num_blocks)
    items = [{"bi": i, "bj": j}
             for i in range(len(refs)) for j in range(i, len(refs))]
    pair_ds = ray.data.from_items(items, override_num_blocks=len(items))

    def _partial_best(ids_a, ma, na, ids_b, mb, nb, same: bool):
        sims = np.round((ma @ mb.T) / (na[:, None] * nb[None, :]), SIM_DECIMALS)
        if same:
            sims[ids_a[:, None] == ids_b[None, :]] = -np.inf
        order = np.argsort(ids_b)                      # ties → smallest id
        s = sims[:, order]
        pos = np.argmax(s, axis=1)
        return ids_a, ids_b[order][pos], s[np.arange(len(ids_a)), pos]

    def work(batch: pa.Table) -> pa.Table:
        vid, nid, nsim = [], [], []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ta = ray.get(refs[bi])
            tb = ta if bj == bi else ray.get(refs[bj])
            ids_a, ma, na = _ids_matrix(ta, id_col, vec_col)
            if bj == bi:
                if len(ids_a) < 2:
                    continue
                a, b, s = _partial_best(ids_a, ma, na, ids_a, ma, na, True)
                vid.append(a); nid.append(b); nsim.append(s)
            else:
                ids_b, mb, nb = _ids_matrix(tb, id_col, vec_col)
                a, b, s = _partial_best(ids_a, ma, na, ids_b, mb, nb, False)
                vid.append(a); nid.append(b); nsim.append(s)
                a, b, s = _partial_best(ids_b, mb, nb, ids_a, ma, na, False)
                vid.append(a); nid.append(b); nsim.append(s)
        if not vid:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "nn_id": pa.array([], pa.int64()),
                             "nn_sim": pa.array([], pa.float64())})
        return pa.table({id_col: pa.array(np.concatenate(vid), pa.int64()),
                         "nn_id": pa.array(np.concatenate(nid), pa.int64()),
                         "nn_sim": pa.array(np.concatenate(nsim), pa.float64())})

    partials = pair_ds.map_batches(work, batch_format="pyarrow")

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nn_id": pd.Series([], dtype="int64"),
                                 "nn_sim": pd.Series([], dtype="float64")})
        out = df.sort_values([id_col, "nn_sim", "nn_id"],
                             ascending=[True, False, True]) \
            .drop_duplicates(subset=[id_col])
        return out[[id_col, "nn_id", "nn_sim"]]

    return grouped_apply(partials, [id_col], best)


def knn_graph_blockwise(ds: ray.data.Dataset, *, k: int = 5,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        num_blocks: int = 8) -> ray.data.Dataset:
    """EXACT k-NN graph (every vector's ``k`` nearest others), distributed:
    block-pair tasks emit per-row LOCAL top-k candidates (ties → smallest
    neighbor id), then a coarse-partitioned reduce keeps the global top-k per
    id and assigns ``nn_rank`` (1-based, ordered by sim DESC, nn_id ASC).

    Exactness: each (row, candidate) pair is scored in exactly one block-pair
    task; a row's global top-k is a subset of the union of its per-task local
    top-ks, so the reduce sees every needed candidate.  Shuffle volume is
    O(n · B · k) small rows — ids and rounded sims, never vectors."""
    import pandas as pd

    import ray

    from .shuffle import grouped_apply

    refs = _block_refs(ds, id_col=id_col, vec_col=vec_col, num_blocks=num_blocks)
    items = [{"bi": i, "bj": j}
             for i in range(len(refs)) for j in range(i, len(refs))]
    pair_ds = ray.data.from_items(items, override_num_blocks=len(items))

    def _local_topk(ids_a, ma, na, ids_b, mb, nb, same: bool):
        sims = np.round((ma @ mb.T) / (na[:, None] * nb[None, :]), SIM_DECIMALS)
        if same:
            sims[ids_a[:, None] == ids_b[None, :]] = -np.inf
        order = np.argsort(ids_b)                  # ties → smallest neighbor id
        s = sims[:, order]
        ids_sorted = ids_b[order]
        kk = min(k, s.shape[1])
        top = np.argsort(-s, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(ids_a, kk)
        cols = ids_sorted[top.ravel()]
        vals = np.take_along_axis(s, top, axis=1).ravel()
        good = np.isfinite(vals)                   # drop the masked self slot
        return rows[good], cols[good], vals[good]

    def work(batch: pa.Table) -> pa.Table:
        vid, nid, nsim = [], [], []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ta = ray.get(refs[bi])
            ids_a, ma, na = _ids_matrix(ta, id_col, vec_col)
            if bj == bi:
                if len(ids_a) < 2:
                    continue
                for part in (_local_topk(ids_a, ma, na, ids_a, ma, na, True),):
                    vid.append(part[0]); nid.append(part[1]); nsim.append(part[2])
            else:
                tb = ray.get(refs[bj])
                ids_b, mb, nb = _ids_matrix(tb, id_col, vec_col)
                for part in (_local_topk(ids_a, ma, na, ids_b, mb, nb, False),
                             _local_topk(ids_b, mb, nb, ids_a, ma, na, False)):
                    vid.append(part[0]); nid.append(part[1]); nsim.append(part[2])
        if not vid:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "nn_id": pa.array([], pa.int64()),
                             "nn_sim": pa.array([], pa.float64())})
        return pa.table({id_col: pa.array(np.concatenate(vid), pa.int64()),
                         "nn_id": pa.array(np.concatenate(nid), pa.int64()),
                         "nn_sim": pa.array(np.concatenate(nsim), pa.float64())})

    partials = pair_ds.map_batches(work, batch_format="pyarrow")

    def best_k(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nn_rank": pd.Series([], dtype="int64"),
                                 "nn_id": pd.Series([], dtype="int64"),
                                 "nn_sim": pd.Series([], dtype="float64")})
        out = df.sort_values([id_col, "nn_sim", "nn_id"],
                             ascending=[True, False, True], kind="mergesort")
        rnk = out.groupby(id_col).cumcount().to_numpy() + 1
        out = out.assign(nn_rank=rnk.astype(np.int64))
        out = out[out["nn_rank"] <= k]
        return out[[id_col, "nn_rank", "nn_id", "nn_sim"]]

    return grouped_apply(partials, [id_col], best_k)


def _ivf_multi_assign(ds: ray.data.Dataset, *, centroids: np.ndarray,
                      n_assign: int, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> ray.data.Dataset:
    """Multi-assignment rows (cluster, id, sig): each vector is replicated to
    its ``n_assign`` nearest coarse clusters, the vector itself traveling as a
    compact little-endian float64 byte payload (``sig``) so downstream bucket
    stages score candidates without a second payload join."""

    def assign_multi(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(batch.column(vec_col))
        d2 = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        near = np.argsort(d2, axis=1)[:, :n_assign]          # (B, n_assign)
        sig = np.ascontiguousarray(m.astype("<f8")).view(np.uint8) \
            .reshape(len(ids), -1)
        return pa.table({
            "cluster": pa.array(near.ravel().astype(np.int64)),
            id_col: pa.array(np.repeat(ids, n_assign), pa.int64()),
            "sig": pa.array([sig[i].tobytes() for i in range(len(ids))
                             for _ in range(n_assign)], pa.binary())})

    return ds.map_batches(assign_multi, batch_format="pyarrow")


def knn_graph_bucketed(ds: ray.data.Dataset, *, k: int = 5,
                       n_clusters: int = 16, n_assign: int = 2,
                       seed: int = 42, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       train_sample: np.ndarray | None = None,
                       approx_count: int | None = None,
                       max_bucket: int = 1 << 14) -> ray.data.Dataset:
    """APPROXIMATE sub-quadratic k-NN graph — the 100-TB scale twin of
    ``knn_graph_blockwise``: candidates are generated only INSIDE each
    vector's ``n_assign`` nearest IVF clusters (never scan all pairs — the
    same pruning idea as the reference dictionary corrector's length-pruned
    NN scan, /root/reference/src/baselines/dictionary_corrector.py:86-98).

    Shape: multi-assign (vector travels as the ``sig`` carry bytes) → ONE
    cluster-keyed exchange → per-cluster vectorized all-pairs with per-row
    local top-k → ONE id-keyed reduce that dedups (a pair sharing two probed
    clusters is scored twice), takes the global top-k, and assigns
    ``nn_rank``.  Cost ≈ Σ cluster_size² instead of n²; recall vs the exact
    graph is governed by (n_clusters, n_assign) and pytest-pinned.

    The CONTRACT (and the SQL oracle) is "exact k-NN within the union of
    probed clusters": deterministic quantizer (id-hash sample + seeded Lloyd)
    → the oracle re-derives identical centroids and hash-verifies the whole
    machinery.  Oversized clusters (> max_bucket) are dropped deterministically
    (never triggers at oracle scale; at 100 TB raise n_clusters so clusters
    hold ~10³ vectors).  Output: (id, nn_rank, nn_id, nn_sim) — same schema
    as the exact twin."""
    import pandas as pd

    from .shuffle import grouped_apply

    if train_sample is None:
        train_sample = train_quantizer_sample(ds, vec_col=vec_col, id_col=id_col,
                                              approx_count=approx_count)
    centroids = kmeans_fit(train_sample, n_clusters, seed=seed)
    assigned = _ivf_multi_assign(ds, centroids=centroids, n_assign=n_assign,
                                 vec_col=vec_col, id_col=id_col)

    def cluster_local_topk(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("cluster", sort=False):
            n = len(grp)
            if n < 2 or n > max_bucket:
                continue
            ids = grp[id_col].to_numpy(np.int64)
            m = np.stack([np.frombuffer(b, dtype="<f8")
                          for b in grp["sig"]])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = np.round((m @ m.T) / (norms[:, None] * norms[None, :]),
                            SIM_DECIMALS)
            order = np.argsort(ids)                # ties → smallest nn_id
            s = sims[:, order]
            ids_sorted = ids[order]
            s[ids[:, None] == ids_sorted[None, :]] = -np.inf   # mask self
            kk = min(k, n - 1)
            top = np.argsort(-s, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(ids, kk)
            cols = ids_sorted[top.ravel()]
            vals = np.take_along_axis(s, top, axis=1).ravel()
            good = np.isfinite(vals)
            outs.append(pd.DataFrame({id_col: rows[good], "nn_id": cols[good],
                                      "nn_sim": vals[good]}))
        if not outs:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nn_id": pd.Series([], dtype="int64"),
                                 "nn_sim": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    partials = grouped_apply(assigned, ["cluster"], cluster_local_topk,
                             num_partitions=max(8, n_clusters // 2))

    def best_k(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nn_rank": pd.Series([], dtype="int64"),
                                 "nn_id": pd.Series([], dtype="int64"),
                                 "nn_sim": pd.Series([], dtype="float64")})
        out = df.drop_duplicates(subset=[id_col, "nn_id"]) \
            .sort_values([id_col, "nn_sim", "nn_id"],
                         ascending=[True, False, True], kind="mergesort")
        rnk = out.groupby(id_col).cumcount().to_numpy() + 1
        out = out.assign(nn_rank=rnk.astype(np.int64))
        out = out[out["nn_rank"] <= k]
        return out[[id_col, "nn_rank", "nn_id", "nn_sim"]]

    return grouped_apply(partials, [id_col], best_k)


def nn_join_bucketed(ds: ray.data.Dataset, *, n_clusters: int = 16,
                     n_assign: int = 2, seed: int = 42,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     train_sample: np.ndarray | None = None,
                     approx_count: int | None = None) -> ray.data.Dataset:
    """APPROXIMATE nearest-neighbor join — ``knn_graph_bucketed`` at k=1,
    projected to the exact twin's (id, nn_id, nn_sim) schema.  Vectors whose
    probed clusters contain no other vector emit no row (same contract as the
    SQL oracle's probed-subset candidate set)."""
    g = knn_graph_bucketed(ds, k=1, n_clusters=n_clusters, n_assign=n_assign,
                           seed=seed, vec_col=vec_col, id_col=id_col,
                           train_sample=train_sample, approx_count=approx_count)
    return g.map_batches(lambda t: t.select([id_col, "nn_id", "nn_sim"]),
                         batch_format="pyarrow")


def ivf_candidate_pairs(ds: ray.data.Dataset, *, threshold: float,
                        n_clusters: int = 16, n_assign: int = 2,
                        seed: int = 42, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        train_sample: np.ndarray | None = None,
                        approx_count: int | None = None) -> ray.data.Dataset:
    """APPROXIMATE sub-quadratic near-dup pairs: multi-assign each vector to
    its ``n_assign`` nearest IVF clusters, generate pairs inside each cluster
    bucket, verify with exact cosine via the distributed payload join.

    The scale path when O(n²) is unaffordable: cost ≈ Σ cluster_size² with
    n_clusters sized so clusters hold ~10³ vectors.  Recall vs the exact pair
    set is governed by ``n_assign`` (pairs split across cluster boundaries are
    missed; measured in tests/test_training_data_ops.py on the driver
    fixture).  Pair-count drops from oversized buckets are observable via
    ``bucket_stats`` on the assignment rows.

    Shuffle shape: the vector travels WITH its assignment rows as a compact
    float64-bytes carry column (n_assign ≈ 2 copies), so verification is one
    vectorized cosine over the emitted pairs — no extra payload-join shuffles
    (cheaper than the minhash-style signature join whenever the payload is
    small and the explode factor low)."""
    if train_sample is None:
        train_sample = train_quantizer_sample(ds, vec_col=vec_col, id_col=id_col,
                                              approx_count=approx_count)
    centroids = kmeans_fit(train_sample, n_clusters, seed=seed)

    from .dedup import _bucket_pairs_partitioned

    cand = _bucket_pairs_partitioned(
        _ivf_multi_assign(ds, centroids=centroids, n_assign=n_assign,
                          vec_col=vec_col, id_col=id_col),
        ["cluster"], id_col, carry_cols=["sig"], max_bucket=1 << 14)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ma = np.stack([np.frombuffer(b, dtype="<f8")
                       for b in batch.column("sig_a").to_pylist()])
        mb = np.stack([np.frombuffer(b, dtype="<f8")
                       for b in batch.column("sig_b").to_pylist()])
        na = np.linalg.norm(ma, axis=1); na[na == 0] = 1.0
        nb = np.linalg.norm(mb, axis=1); nb[nb == 0] = 1.0
        sims = np.round((ma * mb).sum(axis=1) / (na * nb), SIM_DECIMALS)
        out = pa.table({"id_a": batch.column("id_a"),
                        "id_b": batch.column("id_b"),
                        "sim": pa.array(sims, pa.float64())})
        return out.filter(pa.compute.greater_equal(out.column("sim"), threshold))

    return cand.map_batches(verify, batch_format="pyarrow")


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


def kmeans_lloyd_distributed(ds: ray.data.Dataset, *, n_clusters: int = 8,
                             n_iter: int = 3, seed: int = 42,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             approx_count: int | None = None,
                             scale: int = 10**6) -> pa.Table:
    """Distributed Lloyd k-means over the FULL dataset: every iteration is
    one streaming pass — centroids broadcast via ``ray.put``, each batch
    emits one (cluster, count, Σvec) partial row per non-empty cluster, and
    the driver folds the tiny per-block partials into the next centroids.
    The corpus itself never materializes; per-iteration driver traffic is
    O(blocks × k × dim).

    Determinism/parity discipline: vector sums accumulate as EXACT int64
    (coordinates scaled by ``scale`` and rounded — the synthetic embeddings
    are float32, ~7 significant digits), so the folded centroid doubles are
    independent of block order and bit-identical to the SQL oracle's
    BIGINT-sum expression.  Init matches ``kmeans_fit``'s seeded choice over
    the deterministic id-hash sample.  Empty clusters keep their previous
    centroid (and report n_members = 0 from the final assignment).

    Returns the long-format result: (cluster, n_members, dim, centroid).
    """
    import ray as _ray

    sample = train_quantizer_sample(ds, target=4096, vec_col=vec_col,
                                    id_col=id_col, seed=7,
                                    approx_count=approx_count)
    if sample.size == 0:
        raise ValueError("kmeans_lloyd_distributed: empty input dataset "
                         "(no vectors to sample the init from)")
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    cents = sample[np.sort(idx)].copy()
    k, dim = cents.shape
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(n_iter):
        ref = _ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            m = _to_matrix(batch.column(vec_col))
            c = _ray.get(ref)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            # floor(x+0.5), NOT np.round: np.round is half-to-even while SQL
            # round() is half-away — floor(+0.5) is computable identically on
            # both sides, making the int64 coordinates bit-equal by construction
            vi = np.floor(m * scale + 0.5).astype(np.int64)
            used = np.unique(a)
            sums = np.zeros((len(used), m.shape[1]), dtype=np.int64)
            n = np.zeros(len(used), dtype=np.int64)
            for j, cl in enumerate(used):          # ≤ k rows, vector math inside
                mask = a == cl
                sums[j] = vi[mask].sum(axis=0)
                n[j] = int(mask.sum())
            cols = {"cluster": pa.array(used.astype(np.int64), pa.int64()),
                    "n": pa.array(n, pa.int64())}
            for d in range(m.shape[1]):
                cols[f"s{d}"] = pa.array(sums[:, d], pa.int64())
            return pa.table(cols)

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for row in parts:
            cl = int(row["cluster"])
            counts[cl] += int(row["n"])
            for d in range(dim):
                sums[cl, d] += int(row[f"s{d}"])
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = (sums[nonempty]
                           / (float(scale) * counts[nonempty, None]))

    out_cl = np.repeat(np.arange(k, dtype=np.int64), dim)
    out_n = np.repeat(counts, dim)
    out_dim = np.tile(np.arange(dim, dtype=np.int64), k)
    return pa.table({"cluster": pa.array(out_cl, pa.int64()),
                     "n_members": pa.array(out_n, pa.int64()),
                     "dim": pa.array(out_dim, pa.int64()),
                     "centroid": pa.array(np.round(cents.ravel(), 6),
                                          pa.float64())})
