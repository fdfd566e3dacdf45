"""Product quantization (PQ) — the memory-compressed ANN scale path.

At 100 TB the raw float vectors (256 B+ each) dominate ANN memory; PQ
(Jégou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
2011 — the FAISS default) stores each vector as M one-byte codewords
(here 8 B for a 64-dim vector, 32× smaller) and scans with asymmetric
distance computation (ADC): a query builds one M×ksub lookup table of
subspace distances and every database vector's distance is M table adds.

Division of labor (the IVF discipline of stages/embed.py):
- **codebook training is driver-side on the deterministic sample**
  (``train_quantizer_sample`` — id-hash filtered, layout-independent;
  FAISS likewise trains codebooks on a sample) — one local Lloyd per
  subspace, no distributed iteration;
- **encode and ADC scan are distributed**: one streaming ``map_batches``
  pass each; the ADC top-k is combine-safe local partials → tiny driver
  merge, no shuffle.

Exactness/parity discipline (the ``kmeans_lloyd_distributed`` trick):
codebooks round to 6 dp and ALL distances compute in EXACT int64 on
10⁶-scaled coordinates (diff ≤ ~10⁷ → Σ of 8 squares ≤ ~10¹⁵ < 2⁶³), so
argmin assignments and ADC sums are bit-identical across block layouts,
summation orders, and the generated DuckDB twin (which re-derives codes
and distances from the inlined integer codebooks).  Ties break on the
lowest codeword index / vec_id on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .embed import _to_matrix, kmeans_fit, train_quantizer_sample

_SCALE = 10**6  # coordinate scale; distances live at SCALE² = 10¹²


def pq_train_local(sample: np.ndarray, *, m_subspaces: int = 8,
                   ksub: int = 16, n_iter: int = 10,
                   seed: int = 42) -> np.ndarray:
    """Codebooks (m_subspaces, ksub, dsub) from an in-memory sample — one
    deterministic Lloyd per subspace, rounded to 6 dp (the int64 distance
    contract).  Shared verbatim by the engine (``pq_train``) and the oracle
    generator (which re-derives the identical sample outside Ray), so the
    inlined SQL constants are the engine's codebooks by construction."""
    if sample.size == 0:
        raise ValueError("pq_train: empty sample")
    dim = sample.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"pq_train: dim {dim} not divisible by "
                         f"m_subspaces {m_subspaces}")
    dsub = dim // m_subspaces
    books = np.empty((m_subspaces, ksub, dsub), dtype=np.float64)
    for m in range(m_subspaces):
        sub = sample[:, m * dsub : (m + 1) * dsub]
        books[m] = kmeans_fit(sub, n_clusters=ksub, n_iter=n_iter,
                              seed=seed + m)
    return np.round(books, 6)


def pq_train(ds: ray.data.Dataset, *, m_subspaces: int = 8, ksub: int = 16,
             n_iter: int = 10, seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id",
             approx_count: int | None = None) -> np.ndarray:
    """``pq_train_local`` over the deterministic id-hash sample (layout- and
    cluster-size-independent; FAISS likewise trains PQ codebooks on a
    sample)."""
    sample = train_quantizer_sample(ds, target=4096, vec_col=vec_col,
                                    id_col=id_col, seed=7,
                                    approx_count=approx_count)
    return pq_train_local(sample, m_subspaces=m_subspaces, ksub=ksub,
                          n_iter=n_iter, seed=seed)


def _int_scale(x: np.ndarray) -> np.ndarray:
    """floor(x·SCALE + 0.5) — the engine/oracle shared int64 coordinate
    map (the kmeans-oracle discipline: float64 on both sides, floor+0.5
    instead of round so DuckDB and numpy agree on every value incl.
    negative halves)."""
    return np.floor(np.asarray(x, dtype=np.float64) * _SCALE + 0.5) \
        .astype(np.int64)


def _codebooks_int(codebooks: np.ndarray) -> np.ndarray:
    return _int_scale(codebooks)


def _encode_matrix(m: np.ndarray, cb_int: np.ndarray) -> np.ndarray:
    """(n, M) uint8 codes via exact-int64 argmin per subspace (ties → lowest
    codeword index, np.argmin's contract)."""
    n = m.shape[0]
    m_sub, ksub, dsub = cb_int.shape
    v_int = _int_scale(m)
    codes = np.empty((n, m_sub), dtype=np.uint8)
    for s in range(m_sub):
        diff = v_int[:, None, s * dsub : (s + 1) * dsub] - cb_int[s][None, :, :]
        d2 = (diff * diff).sum(axis=2)          # exact int64
        codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(ds: ray.data.Dataset, codebooks: np.ndarray, *,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """(vec_id, pq_code: binary[M]) — one streaming pass, codebooks
    broadcast once via ``ray.put`` and fetched per actor/task."""
    import ray as _ray

    ref = _ray.put(_codebooks_int(codebooks))

    def encode(batch: pa.Table) -> pa.Table:
        cb_int = _ray.get(ref)
        codes = _encode_matrix(_to_matrix(batch.column(vec_col)), cb_int)
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         "pq_code": _codes_to_binary(codes)})

    return ds.map_batches(encode, batch_format="pyarrow")


def _codes_to_binary(codes: np.ndarray) -> pa.Array:
    """(n, M) uint8 → FixedSizeBinary(M) column from ONE contiguous buffer —
    no per-row ``tobytes()`` (this is a scan-shaped stage on the 100-TB
    path; the spandedup buffer discipline)."""
    n, m_sub = codes.shape
    buf = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
    return pa.Array.from_buffers(pa.binary(m_sub), n, [None, buf])


def _binary_to_codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """FixedSizeBinary(M) (or uniform-width variable binary) column →
    (n, M) uint8 via ONE ``np.frombuffer`` over the data buffer — the
    vectorized inverse of ``_codes_to_binary``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.uint8)
    if pa.types.is_fixed_size_binary(col.type):
        m_sub = col.type.byte_width
        data = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        start = col.offset * m_sub
        return data[start : start + n * m_sub].reshape(n, m_sub)
    # variable-width binary fallback (externally produced codes)
    raw = col.to_pylist()
    m_sub = len(raw[0])
    return np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(n, m_sub)


def pq_store_save(codebooks: np.ndarray, store_dir: str, *,
                  meta: dict | None = None) -> None:
    """Freeze trained codebooks as a committed parquet artifact
    (``codebooks.parquet``: m, cw, d, value) + ``meta.json`` — the small-side
    state an append-only ingest reuses verbatim (the signature-store pattern
    of ``stages/dedup.py::minhash_duplicate_pairs_incremental``; reference
    analog: vocabulary built once then applied,
    dictionary_corrector.py:54-76).  Atomic: tmp file + ``os.replace``, so a
    concurrent reader never sees a torn store."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(store_dir, exist_ok=True)
    m_sub, ksub, dsub = codebooks.shape
    t = pa.table({
        "m": pa.array(np.repeat(np.arange(m_sub, dtype=np.int64),
                                ksub * dsub)),
        "cw": pa.array(np.tile(np.repeat(np.arange(ksub, dtype=np.int64),
                                         dsub), m_sub)),
        "d": pa.array(np.tile(np.arange(dsub, dtype=np.int64), m_sub * ksub)),
        "value": pa.array(codebooks.reshape(-1).astype(np.float64)),
    })
    tmp = os.path.join(store_dir, "codebooks.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(store_dir, "codebooks.parquet"))
    m = {"m_subspaces": int(m_sub), "ksub": int(ksub), "dsub": int(dsub),
         "scale": _SCALE, **(meta or {})}
    tmpm = os.path.join(store_dir, "meta.json.tmp")
    with open(tmpm, "w", encoding="utf-8") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmpm, os.path.join(store_dir, "meta.json"))


def pq_store_load(store_dir: str) -> np.ndarray:
    """Load frozen codebooks — exact float64 round-trip of
    ``pq_store_save`` (parquet doubles; pytest pins array equality)."""
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(store_dir, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    m_sub, ksub, dsub = meta["m_subspaces"], meta["ksub"], meta["dsub"]
    t = pq.read_table(os.path.join(store_dir, "codebooks.parquet"))
    # canonical (m, cw, d) order regardless of writer layout
    order = np.lexsort((t.column("d").to_numpy(), t.column("cw").to_numpy(),
                        t.column("m").to_numpy()))
    vals = t.column("value").to_numpy(zero_copy_only=False)[order]
    return vals.reshape(m_sub, ksub, dsub)


def pq_store_exists(store_dir: str) -> bool:
    import os

    return (os.path.exists(os.path.join(store_dir, "codebooks.parquet"))
            and os.path.exists(os.path.join(store_dir, "meta.json")))


def pq_encode_incremental(new_vecs: ray.data.Dataset, store_dir: str, *,
                          m_subspaces: int = 8, ksub: int = 16,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          approx_count: int | None = None
                          ) -> tuple[ray.data.Dataset, np.ndarray, bool]:
    """Append-only PQ ingest (r4 verdict #6): if ``store_dir`` holds frozen
    codebooks, encode this wave against them verbatim — NO training pass, so
    wave-2+ codes are byte-identical to what wave-1's codebooks produce
    (pytest-pinned).  Otherwise this IS wave 1: train on this wave's
    deterministic sample and freeze the store.  Returns
    (codes_dataset, codebooks, trained_this_call)."""
    if pq_store_exists(store_dir):
        books = pq_store_load(store_dir)
        trained = False
    else:
        books = pq_train(new_vecs, m_subspaces=m_subspaces, ksub=ksub,
                         vec_col=vec_col, id_col=id_col,
                         approx_count=approx_count)
        pq_store_save(books, store_dir)
        trained = True
    return pq_encode(new_vecs, books, vec_col=vec_col, id_col=id_col), \
        books, trained


def pq_adc_topk(ds: ray.data.Dataset, query: np.ndarray,
                codebooks: np.ndarray, *, k: int = 10,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> pa.Table:
    """ADC top-k: the query builds ONE integer (M, ksub) lookup table; each
    batch encodes its vectors (fused encode+scan — at steady state the codes
    would be a stored column and this stage reads 8 B/vector) and sums M
    table entries per vector; per-block local top-k partials stream to a
    tiny driver merge.  Returns (vec_id, adc_dist, rank) — adc_dist =
    exact-int64 sum / SCALE², rank 1..k by (adc, vec_id)."""
    import ray as _ray

    cb_int = _codebooks_int(codebooks)
    m_sub, ksub, dsub = cb_int.shape
    q_int = _int_scale(query)
    diff = q_int.reshape(m_sub, 1, dsub) - cb_int
    lut = (diff * diff).sum(axis=2)             # (M, ksub) exact int64
    lut_ref = _ray.put(lut)
    cb_ref = _ray.put(cb_int)

    def local_topk(batch: pa.Table) -> pa.Table:
        lut_i = _ray.get(lut_ref)
        codes = _encode_matrix(_to_matrix(batch.column(vec_col)),
                               _ray.get(cb_ref))
        adc = lut_i[np.arange(m_sub)[None, :], codes.astype(np.int64)] \
            .sum(axis=1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        order = np.lexsort((ids, adc))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "adc_int": pa.array(adc[order], pa.int64())})

    parts = []
    for b in ds.map_batches(local_topk, batch_format="pyarrow") \
               .iter_batches(batch_size=65536, batch_format="pyarrow"):
        parts.append(b)
    if parts:
        allp = pa.concat_tables(parts)
        ids = allp.column(id_col).to_numpy(zero_copy_only=False)
        adc = allp.column("adc_int").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, adc))[:k]
        ids, adc = ids[order], adc[order]
    else:
        ids = np.empty(0, np.int64)
        adc = np.empty(0, np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "adc_dist": pa.array(adc.astype(np.float64) / float(_SCALE) ** 2,
                             pa.float64()),
        "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64))})


def pq_adc_rerank_topk(ds: ray.data.Dataset, query: np.ndarray,
                       codebooks: np.ndarray, *, k: int = 10,
                       rerank: int = 200, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> pa.Table:
    """ADC candidate generation + EXACT re-rank — the standard compressed-
    index serving architecture (IVFADC + re-rank): pass 1 is the ``rerank``-
    candidate ADC scan (8 B/vector economics at scale), pass 2 fetches only
    the ≤ ``rerank`` raw vectors and re-ranks by exact squared L2.  On the
    synthetic near-random embeddings plain ADC recall@10 plateaus ~0.5
    (distance concentration — PQ's worst case); rerank=200 restores 0.9-1.0
    (pytest-pinned).  Exact-int64 distances both passes → the generated SQL
    twin is bit-identical.  Returns (vec_id, l2_dist, rank)."""
    cand = pq_adc_topk(ds, query, codebooks, k=rerank,
                       vec_col=vec_col, id_col=id_col)
    return _exact_rerank(ds, cand.column(id_col), query, k=k,
                         vec_col=vec_col, id_col=id_col)


def _exact_rerank(ds: ray.data.Dataset, cand_ids, query: np.ndarray, *,
                  k: int, vec_col: str, id_col: str) -> pa.Table:
    """Pass 2 of every compressed-index serving path (flat ADC or IVFADC):
    broadcast the ≤``rerank`` candidate id set once, fetch only those raw
    vectors, re-rank by exact int64 squared L2 with per-batch top-k partials
    and a tiny driver merge.  Returns (vec_id, l2_dist, rank)."""
    import ray as _ray

    ids_ref = _ray.put(cand_ids)
    q_int = _int_scale(query)

    def exact_local(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column(id_col), value_set=_ray.get(ids_ref))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "d2_int": pa.array([], pa.int64())})
        v_int = _int_scale(_to_matrix(batch.column(vec_col)))
        diff = v_int - q_int[None, :]
        d2 = (diff * diff).sum(axis=1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        order = np.lexsort((ids, d2))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "d2_int": pa.array(d2[order], pa.int64())})

    parts = [b for b in ds.map_batches(exact_local, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    if parts:
        allp = pa.concat_tables(parts)
        ids = allp.column(id_col).to_numpy(zero_copy_only=False)
        d2 = allp.column("d2_int").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d2))[:k]
        ids, d2 = ids[order], d2[order]
    else:
        ids = np.empty(0, np.int64)
        d2 = np.empty(0, np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "l2_dist": pa.array(d2.astype(np.float64) / float(_SCALE) ** 2,
                            pa.float64()),
        "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64))})


def pq_rerank_oracle_sql(codebooks: np.ndarray, query: np.ndarray, *,
                         k: int = 10, rerank: int = 200) -> str:
    """Generated DuckDB twin of ``pq_adc_rerank_topk``: ADC top-``rerank``
    candidates from the inlined integer codebooks/LUT, exact int64 squared
    L2 re-rank against the inlined integer query."""
    cb_int = _codebooks_int(codebooks)
    m_sub, ksub, dsub = cb_int.shape
    q_int = _int_scale(query)
    diff = q_int.reshape(m_sub, 1, dsub) - cb_int
    lut = (diff * diff).sum(axis=2)
    cb_rows, body, _ = _pq_cb_cte(cb_int)
    lut_rows = ",".join(f"({m},{cw},{int(lut[m, cw])})"
                        for m in range(m_sub) for cw in range(ksub))
    q_rows = ",".join(f"({d},{int(q_int[d])})" for d in range(len(q_int)))
    return f"""
        WITH cb(m, cw, d, c_int) AS (VALUES {cb_rows}),
        lut(m, cw, l_int) AS (VALUES {lut_rows}),
        qv(idx, q_int) AS (VALUES {q_rows}),{body},
        adc AS (SELECT a.vec_id, sum(l.l_int) AS adc_int
                FROM assign a JOIN lut l ON l.m = a.m AND l.cw = a.cw
                GROUP BY a.vec_id),
        cand AS (SELECT vec_id FROM adc
                 ORDER BY adc_int, vec_id LIMIT {rerank}),
        exact AS (SELECT c.vec_id,
                         sum((c.v_int - qv.q_int) * (c.v_int - qv.q_int))
                             AS d2_int
                  FROM coords c
                  JOIN qv USING (idx)
                  WHERE c.vec_id IN (SELECT vec_id FROM cand)
                  GROUP BY c.vec_id)
        SELECT vec_id,
               CAST(d2_int AS DOUBLE) / {float(_SCALE) ** 2:.1f} AS l2_dist,
               CAST(row_number() OVER (ORDER BY d2_int, vec_id) AS BIGINT)
                   AS rank
        FROM exact
        ORDER BY d2_int, vec_id
        LIMIT {k}"""


def pq_codes_long(codes_ds: ray.data.Dataset,
                  id_col: str = "vec_id") -> ray.data.Dataset:
    """Explode binary PQ codes to SQL-comparable long format
    (vec_id, m, codeword) — the oracle twin shape of ``pq_encode``."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        codes = _binary_to_codes(batch.column("pq_code"))
        m_sub = codes.shape[1]
        return pa.table({
            id_col: pa.array(np.repeat(ids, m_sub), pa.int64()),
            "m": pa.array(np.tile(np.arange(m_sub, dtype=np.int64),
                                  len(ids))),
            "codeword": pa.array(codes.reshape(-1).astype(np.int64))})

    return codes_ds.map_batches(explode, batch_format="pyarrow")


def _pq_cb_cte(cb_int: np.ndarray) -> tuple[str, str, int]:
    """(codebook VALUES rows, d2+assign CTE body, dsub) shared by the two
    generated oracles."""
    m_sub, ksub, dsub = cb_int.shape
    cb_rows = ",".join(
        f"({m},{cw},{d},{int(cb_int[m, cw, d])})"
        for m in range(m_sub) for cw in range(ksub) for d in range(dsub))
    body = f"""
        coords AS (SELECT vec_id,
                          generate_subscripts(v, 1) - 1 AS idx,
                          CAST(floor(unnest(v) * {_SCALE} + 0.5) AS BIGINT)
                              AS v_int
                   FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings)),
        d2 AS (SELECT c.vec_id, cb.m, cb.cw,
                      sum((c.v_int - cb.c_int) * (c.v_int - cb.c_int)) AS d2
               FROM coords c
               JOIN cb ON cb.m = c.idx // {dsub}
                      AND cb.d = c.idx % {dsub}
               GROUP BY c.vec_id, cb.m, cb.cw),
        assign AS (SELECT vec_id, m, cw FROM (
                      SELECT vec_id, m, cw,
                             row_number() OVER (PARTITION BY vec_id, m
                                                ORDER BY d2, cw) AS rn
                      FROM d2) WHERE rn = 1)"""
    return cb_rows, body, dsub


def pq_codes_oracle_sql(codebooks: np.ndarray, *, where: str = "") -> str:
    """Generated DuckDB twin of ``pq_codes_long``: (vec_id, m, codeword)
    re-derived by exact-int64 argmin over the inlined codebooks.  ``where``
    restricts the encoded population (the incremental-ingest twin encodes
    only the new wave: ``vec_id >= split``)."""
    cb_rows, body, _ = _pq_cb_cte(_codebooks_int(codebooks))
    tail = f" WHERE {where}" if where else ""
    return f"""
        WITH cb(m, cw, d, c_int) AS (VALUES {cb_rows}),{body}
        SELECT vec_id, m, CAST(cw AS BIGINT) AS codeword FROM assign{tail}"""


def pq_oracle_sql(codebooks: np.ndarray, query: np.ndarray, *,
                  k: int = 10) -> str:
    """Generated DuckDB twin of ``pq_adc_topk`` over the ``embeddings``
    view: codes re-derived by argmin over the INLINED integer codebooks,
    ADC summed from the inlined integer LUT — bit-identical to the engine
    by the shared exact-int64 contract (the emb_kmeans oracle discipline)."""
    cb_int = _codebooks_int(codebooks)
    m_sub, ksub, dsub = cb_int.shape
    q_int = _int_scale(query)
    diff = q_int.reshape(m_sub, 1, dsub) - cb_int
    lut = (diff * diff).sum(axis=2)
    cb_rows, body, _ = _pq_cb_cte(cb_int)
    lut_rows = ",".join(f"({m},{cw},{int(lut[m, cw])})"
                        for m in range(m_sub) for cw in range(ksub))
    return f"""
        WITH cb(m, cw, d, c_int) AS (VALUES {cb_rows}),
        lut(m, cw, l_int) AS (VALUES {lut_rows}),{body},
        adc AS (SELECT a.vec_id, sum(l.l_int) AS adc_int
                FROM assign a JOIN lut l ON l.m = a.m AND l.cw = a.cw
                GROUP BY a.vec_id)
        SELECT vec_id,
               CAST(adc_int AS DOUBLE) / {float(_SCALE) ** 2:.1f} AS adc_dist,
               CAST(row_number() OVER (ORDER BY adc_int, vec_id) AS BIGINT)
                   AS rank
        FROM adc
        ORDER BY adc_int, vec_id
        LIMIT {k}"""


# --- IVFADC: coarse inverted file + PQ over residuals -------------------------


def _assign_int(v_int: np.ndarray, cent_int: np.ndarray) -> np.ndarray:
    """Exact-int64 coarse assignment (ties → lowest centroid id): (n,) int64
    cluster ids for (n, dim) int-scaled vectors vs (k, dim) int-scaled
    centroids.  Shared by index build and the oracle generator's probe-list
    derivation so every layout/SQL twin agrees on borderline vectors."""
    d2 = ((v_int[:, None, :] - cent_int[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1).astype(np.int64)


def ivfadc_train_local(sample: np.ndarray, *, n_clusters: int = 16,
                       m_subspaces: int = 8, ksub: int = 16,
                       n_iter: int = 10,
                       seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, residual codebooks) — the full IVFADC training recipe
    (Jégou et al. §IV: coarse quantizer, then PQ trained on RESIDUALS
    x − q₁(x), which are far more codable than raw vectors).  One local
    Lloyd for the coarse level, one per subspace for the residual level,
    all deterministic; centroids round to 6 dp (the int64 assignment
    contract), residual codebooks round inside ``pq_train_local``.  Shared
    verbatim by the engine and the oracle generator."""
    from .embed import kmeans_fit

    centroids = np.round(kmeans_fit(sample, n_clusters, seed=seed), 6)
    assign = _assign_int(_int_scale(sample), _int_scale(centroids))
    resid = sample - centroids[assign]
    books = pq_train_local(resid, m_subspaces=m_subspaces, ksub=ksub,
                           n_iter=n_iter, seed=seed)
    return centroids, books


def ivfadc_train(ds: ray.data.Dataset, *, n_clusters: int = 16,
                 m_subspaces: int = 8, ksub: int = 16, n_iter: int = 10,
                 seed: int = 42, vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 approx_count: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """``ivfadc_train_local`` over the deterministic id-hash sample (the
    pq_train / FAISS sample-training discipline)."""
    sample = train_quantizer_sample(ds, target=4096, vec_col=vec_col,
                                    id_col=id_col, seed=7,
                                    approx_count=approx_count)
    return ivfadc_train_local(sample, n_clusters=n_clusters,
                              m_subspaces=m_subspaces, ksub=ksub,
                              n_iter=n_iter, seed=seed)


def _residual_luts(query: np.ndarray, centroids: np.ndarray,
                   cb_int: np.ndarray,
                   probe: np.ndarray) -> dict[int, np.ndarray]:
    """One integer (M, ksub) ADC lookup table per PROBED cluster, built from
    the query's residual against that cluster's centroid.  Residuals are
    float64 subtractions of repr-exact doubles, THEN int-scaled — the same
    op order the encode side uses, so LUT entries and code distances live in
    one exact-int64 algebra."""
    m_sub, ksub, dsub = cb_int.shape
    luts = {}
    for cid in probe.tolist():
        r_int = _int_scale(query - centroids[cid])
        diff = r_int.reshape(m_sub, 1, dsub) - cb_int
        luts[int(cid)] = (diff * diff).sum(axis=2)
    return luts


def ivfadc_topk(ds: ray.data.Dataset, query: np.ndarray,
                centroids: np.ndarray, codebooks: np.ndarray, *,
                k: int = 10, n_probe: int = 4,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> pa.Table:
    """IVFADC top-k — the full FAISS-style compressed serving index
    (inverted file + asymmetric distance over residual PQ codes): the query
    probes its ``n_probe`` nearest coarse cells (exact int64, ties → lowest
    id); every batch assigns its vectors, keeps only probed-cell residents,
    PQ-encodes their RESIDUALS and sums M per-cell LUT entries per vector
    (the steady-state variant that reads ONLY the stored 9-byte
    (cell, code) column and never touches floats is
    ``ivfadc_topk_from_index``, bit-identical by construction); combine-safe
    local top-k partials stream to a tiny driver merge.

    CONTRACT (and the generated SQL twin's): "exact ADC within the probed
    cells" — the oracle re-derives centroids, probe list, residual codes and
    LUT sums from inlined integer constants, bit-identically; true recall vs
    the uncompressed top-k is a pytest concern, governed by ``n_probe`` and
    restored by exact re-rank exactly as in ``pq_adc_rerank_topk``.
    Returns (vec_id, adc_dist, rank)."""
    import ray as _ray

    cent_int = _int_scale(centroids)
    cb_int = _codebooks_int(codebooks)
    m_sub = cb_int.shape[0]
    q_int = _int_scale(query)
    qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
    probe = np.lexsort((np.arange(len(cent_int)), qd2))[:n_probe] \
        .astype(np.int64)
    luts = _residual_luts(query, centroids, cb_int, probe)
    state_ref = _ray.put((cent_int, cb_int, centroids, luts))

    def local_topk(batch: pa.Table) -> pa.Table:
        cent_i, cb_i, cents, lut_map = _ray.get(state_ref)
        m = _to_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        assign = _assign_int(_int_scale(m), cent_i)
        keep = np.isin(assign, probe)
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc_int": pa.array([], pa.int64())})
        m, ids, assign = m[keep], ids[keep], assign[keep]
        adc = np.empty(len(ids), np.int64)
        for cid in np.unique(assign):        # ≤ n_probe iterations
            sel = assign == cid
            codes = _encode_matrix(m[sel] - cents[cid][None, :], cb_i)
            adc[sel] = lut_map[int(cid)][
                np.arange(m_sub)[None, :], codes.astype(np.int64)].sum(axis=1)
        order = np.lexsort((ids, adc))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "adc_int": pa.array(adc[order], pa.int64())})

    parts = [b for b in ds.map_batches(local_topk, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    if parts:
        allp = pa.concat_tables(parts)
        ids = allp.column(id_col).to_numpy(zero_copy_only=False)
        adc = allp.column("adc_int").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, adc))[:k]
        ids, adc = ids[order], adc[order]
    else:
        ids = np.empty(0, np.int64)
        adc = np.empty(0, np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "adc_dist": pa.array(adc.astype(np.float64) / float(_SCALE) ** 2,
                             pa.float64()),
        "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64))})


def ivfadc_index_build(ds: ray.data.Dataset, centroids: np.ndarray,
                       codebooks: np.ndarray, *,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       carry_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Materialize the steady-state IVFADC index: one scan assigns each
    vector to its coarse cell (exact int64 argmin, ties → lowest id) and
    PQ-encodes its RESIDUAL, emitting ``(vec_id, cell, pq_code)`` — 1 B cell
    + M B code per vector (9 B at the defaults), the column a 100-TB serving
    tier stores INSTEAD of raw floats.  ``carry_cols`` appends metadata
    columns (e.g. a label) verbatim so filtered search never has to join
    back to the raw table.  Codes are deterministic in
    (centroids, codebooks), so serving from this index is bit-identical to
    the scan-side ``ivfadc_topk`` (pytest-pinned).  Write with
    ``write_parquet`` partitioned by cell range for probe-side pruning."""
    import ray as _ray

    state_ref = _ray.put((_int_scale(centroids), _codebooks_int(codebooks),
                          centroids))

    def encode(batch: pa.Table) -> pa.Table:
        cent_i, cb_i, cents = _ray.get(state_ref)
        m = _to_matrix(batch.column(vec_col))
        assign = _assign_int(_int_scale(m), cent_i)
        codes = np.empty((len(assign), cb_i.shape[0]), np.uint8)
        for cid in np.unique(assign):
            sel = assign == cid
            codes[sel] = _encode_matrix(m[sel] - cents[cid][None, :], cb_i)
        cols = {
            id_col: batch.column(id_col),
            "cell": pa.array(assign, pa.int64()),
            "pq_code": _codes_to_binary(codes)}
        for c in carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def ivfadc_topk_from_index(index_ds: ray.data.Dataset, query: np.ndarray,
                           centroids: np.ndarray, codebooks: np.ndarray, *,
                           k: int = 10, n_probe: int = 4,
                           id_col: str = "vec_id",
                           keep: tuple[str, object] | None = None) -> pa.Table:
    """Serve an IVFADC query from the STORED index (``ivfadc_index_build``
    output) — pass 1 touches no raw vectors at all: filter rows whose
    ``cell`` is probed (an Arrow predicate a cell-partitioned parquet layout
    turns into partition pruning), decode the fixed-size binary codes with
    one ``np.frombuffer``, sum M LUT entries per row, stream combine-safe
    local top-k partials to a tiny driver merge.  Bit-identical to
    ``ivfadc_topk`` on the same (centroids, codebooks) by construction.

    ``keep=(col, value)`` is FILTERED vector search (the FAISS
    IDSelector / metadata-predicate shape): only index rows whose carried
    metadata column equals ``value`` compete.  The predicate composes with
    the probed-cell filter as one Arrow kernel — at 100 TB both prune
    row-groups before any LUT work; selective predicates should widen
    ``n_probe`` to keep candidate counts up (recall is governed the same
    way as unfiltered IVF, measured in pytest).
    Returns (vec_id, adc_dist, rank)."""
    import ray as _ray

    cent_int = _int_scale(centroids)
    cb_int = _codebooks_int(codebooks)
    m_sub = cb_int.shape[0]
    q_int = _int_scale(query)
    qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
    probe = np.lexsort((np.arange(len(cent_int)), qd2))[:n_probe] \
        .astype(np.int64)
    luts = _residual_luts(query, centroids, cb_int, probe)
    lut_ref = _ray.put(luts)

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lut_map = _ray.get(lut_ref)
        mask = pc.is_in(batch.column("cell"),
                        value_set=pa.array(probe, pa.int64()))
        if keep is not None:
            mask = pc.and_(mask, pc.equal(batch.column(keep[0]), keep[1]))
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc_int": pa.array([], pa.int64())})
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        cells = batch.column("cell").to_numpy(zero_copy_only=False) \
                     .astype(np.int64)
        codes = _binary_to_codes(batch.column("pq_code")).astype(np.int64)
        adc = np.empty(len(ids), np.int64)
        for cid in np.unique(cells):         # ≤ n_probe iterations
            sel = cells == cid
            adc[sel] = lut_map[int(cid)][
                np.arange(m_sub)[None, :], codes[sel]].sum(axis=1)
        order = np.lexsort((ids, adc))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "adc_int": pa.array(adc[order], pa.int64())})

    parts = [b for b in
             index_ds.map_batches(local_topk, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    if parts:
        allp = pa.concat_tables(parts)
        ids = allp.column(id_col).to_numpy(zero_copy_only=False)
        adc = allp.column("adc_int").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, adc))[:k]
        ids, adc = ids[order], adc[order]
    else:
        ids = np.empty(0, np.int64)
        adc = np.empty(0, np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "adc_dist": pa.array(adc.astype(np.float64) / float(_SCALE) ** 2,
                             pa.float64()),
        "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64))})


def ivfadc_index_commit(index_ds: ray.data.Dataset, index_dir: str, *,
                        num_partitions: int = 16,
                        input_fingerprint: str = ""):
    """Commit a built IVFADC index CELL-partitioned — the serving layout the
    ``ivfadc_index_build`` docstring promises: rows land in
    ``part=<polyhash(cell) % P>`` directories, so a query's ``n_probe``
    cells map to a known subset of partition FILES and
    ``ivfadc_topk_from_store`` never opens the rest (file-level pruning,
    not just row filtering).  ``num_partitions`` is recorded in the lineage
    (``stage_versions``) so readers recover the layout contract from the
    store itself.  Resumable/atomic via ``commit_by_key``."""
    from ..state.lineage import commit_by_key

    return commit_by_key(
        index_ds, index_dir, key_col="cell",
        num_partitions=num_partitions,
        input_fingerprint=input_fingerprint,
        stage_versions={"ivfadc": "c16-m8-k16-v1",
                        "num_partitions": num_partitions,
                        "partition_key": "cell"})


def ivfadc_topk_from_store(index_dir: str, query: np.ndarray,
                           centroids: np.ndarray, codebooks: np.ndarray, *,
                           k: int = 10, n_probe: int = 4,
                           id_col: str = "vec_id",
                           keep: tuple[str, object] | None = None
                           ) -> pa.Table:
    """Serve from a CELL-partitioned committed index store
    (``ivfadc_index_commit`` output): compute the probe list, map each
    probed cell to its partition id with the store's own recorded hash
    contract, and read ONLY those partitions' parquet files — at 100 TB
    the (1 - n_probe/n_cells) of the index that can't contain a candidate
    is never opened.  The pruned read feeds ``ivfadc_topk_from_index``, so
    results stay bit-identical to the unpruned path (pytest-pinned)."""
    from ..functions.hashing import partition_of_array
    from ..state import lineage as lin

    recs = lin.read_lineage(index_dir)
    if not recs:
        raise FileNotFoundError(f"no committed partitions under {index_dir}")
    n_parts = {r["stage_versions"].get("num_partitions") for r in recs}
    if len(n_parts) != 1 or None in n_parts:
        raise ValueError(f"{index_dir} lineage does not record a single "
                         f"num_partitions: {n_parts}")
    P = int(n_parts.pop())

    cent_int = _int_scale(centroids)
    q_int = _int_scale(query)
    qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
    probe = np.lexsort((np.arange(len(cent_int)), qd2))[:n_probe]
    want_parts = set(partition_of_array(
        pa.array([str(int(c)) for c in probe], pa.string()), P).tolist())
    committed = lin.committed_partitions(index_dir)
    paths = [f"{lin.partition_dir(index_dir, p)}/data.parquet"
             for p in sorted(want_parts & committed)]
    if not paths:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "adc_dist": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64())})
    pruned = ray.data.read_parquet(paths)
    return ivfadc_topk_from_index(pruned, query, centroids, codebooks,
                                  k=k, n_probe=n_probe, id_col=id_col,
                                  keep=keep)


def ivfadc_store_save(centroids: np.ndarray, codebooks: np.ndarray,
                      store_dir: str, *, meta: dict | None = None) -> None:
    """Freeze a trained IVFADC quantizer (coarse centroids + residual
    codebooks) as a committed artifact: ``pq_store_save``'s codebook layout
    plus ``centroids.parquet`` (cid, d, value), both atomic."""
    import os

    import pyarrow.parquet as _pq

    n_clusters, dim = centroids.shape
    pq_store_save(codebooks, store_dir,
                  meta={"n_clusters": int(n_clusters), "dim": int(dim),
                        "kind": "ivfadc", **(meta or {})})
    t = pa.table({
        "cid": pa.array(np.repeat(np.arange(n_clusters, dtype=np.int64),
                                  dim)),
        "d": pa.array(np.tile(np.arange(dim, dtype=np.int64), n_clusters)),
        "value": pa.array(centroids.reshape(-1).astype(np.float64)),
    })
    tmp = os.path.join(store_dir, "centroids.parquet.tmp")
    _pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(store_dir, "centroids.parquet"))


def ivfadc_store_load(store_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Exact float64 round-trip of ``ivfadc_store_save`` →
    (centroids, codebooks)."""
    import json
    import os

    import pyarrow.parquet as _pq

    with open(os.path.join(store_dir, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    t = _pq.read_table(os.path.join(store_dir, "centroids.parquet"))
    order = np.lexsort((t.column("d").to_numpy(),
                        t.column("cid").to_numpy()))
    cents = t.column("value").to_numpy(zero_copy_only=False)[order] \
        .reshape(meta["n_clusters"], meta["dim"])
    return cents, pq_store_load(store_dir)


def ivfadc_store_exists(store_dir: str) -> bool:
    import os

    return (pq_store_exists(store_dir)
            and os.path.exists(os.path.join(store_dir, "centroids.parquet")))


def ivfadc_index_incremental(new_vecs: ray.data.Dataset, store_dir: str, *,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             approx_count: int | None = None
                             ) -> tuple[ray.data.Dataset, np.ndarray,
                                        np.ndarray, bool]:
    """Append-only IVFADC ingest (the ``pq_encode_incremental`` discipline
    over the full serving index): wave 1 trains coarse + residual quantizers
    on its deterministic sample and freezes the store; wave 2+ loads the
    FROZEN quantizers and only encodes — new (vec_id, cell, pq_code) rows
    are byte-identical to what wave-1's quantizers produce (pytest-pinned),
    so the stored index is append-only and queries never see a codebook
    fork.  Returns (index_dataset, centroids, codebooks, trained)."""
    if ivfadc_store_exists(store_dir):
        cents, books = ivfadc_store_load(store_dir)
        trained = False
    else:
        cents, books = ivfadc_train(new_vecs, vec_col=vec_col,
                                    id_col=id_col,
                                    approx_count=approx_count)
        ivfadc_store_save(cents, books, store_dir)
        trained = True
    return ivfadc_index_build(new_vecs, cents, books, vec_col=vec_col,
                              id_col=id_col), cents, books, trained


def ivfadc_rerank_topk(ds: ray.data.Dataset, query: np.ndarray,
                       centroids: np.ndarray, codebooks: np.ndarray, *,
                       k: int = 10, n_probe: int = 4, rerank: int = 200,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> pa.Table:
    """The complete FAISS serving architecture (IVFADC + exact re-rank):
    pass 1 probes ``n_probe`` coarse cells and scans residual PQ codes
    (``ivfadc_topk`` with k=``rerank``), pass 2 fetches only the ≤``rerank``
    raw candidate vectors and re-ranks by exact int64 squared L2
    (``_exact_rerank``, shared with the flat-ADC path).  Within the probed
    cells this RESTORES exact search — pytest pins that the result equals
    the brute-force top-k restricted to probed-cell residents — while the
    quantization economics (8 B/vector scan + ≤``rerank`` raw fetches)
    survive at 100 TB.  Returns (vec_id, l2_dist, rank)."""
    cand = ivfadc_topk(ds, query, centroids, codebooks, k=rerank,
                       n_probe=n_probe, vec_col=vec_col, id_col=id_col)
    return _exact_rerank(ds, cand.column(id_col), query, k=k,
                         vec_col=vec_col, id_col=id_col)


def _ivfadc_adc_ctes(centroids: np.ndarray, codebooks: np.ndarray,
                     query: np.ndarray, *, n_probe: int,
                     where: str | None = None) -> str:
    """The shared WITH-body of the IVFADC oracle twins, ending at the
    ``adc(vec_id, adc_int)`` CTE: coarse assignment by exact int64 argmin
    over inlined int-scaled centroids, residuals against repr-exact double
    centroids (identical IEEE subtract/scale/floor), PQ assignment by exact
    int64 argmin over the inlined residual codebooks, ADC from one inlined
    integer LUT per probed cell.  ``where`` restricts the competing
    population (filtered search) — assignment is per-vector, so filtering
    the population before assignment equals filtering results after."""
    cent_int = _int_scale(centroids)
    cb_int = _codebooks_int(codebooks)
    m_sub, ksub, dsub = cb_int.shape
    n_clusters, dim = centroids.shape
    q_int = _int_scale(query)
    qd2 = ((q_int[None, :] - cent_int) ** 2).sum(axis=1)
    probe = np.lexsort((np.arange(n_clusters), qd2))[:n_probe]
    luts = _residual_luts(query, centroids, cb_int, probe.astype(np.int64))
    cent_i_rows = ",".join(
        f"({c},{d},{int(cent_int[c, d])})"
        for c in range(n_clusters) for d in range(dim))
    cent_f_rows = ",".join(
        f"({c},{d},{repr(float(centroids[c, d]))})"
        for c in range(n_clusters) for d in range(dim))
    cb_rows = ",".join(
        f"({m},{cw},{d},{int(cb_int[m, cw, d])})"
        for m in range(m_sub) for cw in range(ksub) for d in range(dsub))
    lut_rows = ",".join(
        f"({cid},{m},{cw},{int(luts[int(cid)][m, cw])})"
        for cid in probe for m in range(m_sub) for cw in range(ksub))
    probed = ",".join(f"({int(c)})" for c in probe)
    return f"""cent_i(cid, d, v_int) AS (VALUES {cent_i_rows}),
        cent_f(cid, d, c_val) AS (VALUES {cent_f_rows}),
        cb(m, cw, d, c_int) AS (VALUES {cb_rows}),
        luts(cid, m, cw, l_int) AS (VALUES {lut_rows}),
        probed(cid) AS (VALUES {probed}),
        coords AS (SELECT vec_id,
                          generate_subscripts(v, 1) - 1 AS idx,
                          unnest(v) AS x
                   FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings
                         {f"WHERE {where}" if where else ""})),
        vassign AS (SELECT vec_id, cid FROM (
            SELECT c.vec_id, ci.cid,
                   row_number() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY sum((CAST(floor(c.x * {_SCALE} + 0.5)
                                          AS BIGINT) - ci.v_int)
                                    * (CAST(floor(c.x * {_SCALE} + 0.5)
                                            AS BIGINT) - ci.v_int)),
                                ci.cid) AS rn
            FROM coords c JOIN cent_i ci ON ci.d = c.idx
            GROUP BY c.vec_id, ci.cid) WHERE rn = 1),
        resid AS (SELECT c.vec_id, a.cid, c.idx,
                         CAST(floor((c.x - f.c_val) * {_SCALE} + 0.5)
                              AS BIGINT) AS r_int
                  FROM coords c
                  JOIN vassign a ON a.vec_id = c.vec_id
                  JOIN cent_f f ON f.cid = a.cid AND f.d = c.idx
                  WHERE a.cid IN (SELECT cid FROM probed)),
        pq_assign AS (SELECT vec_id, cid, m, cw FROM (
            SELECT r.vec_id, r.cid, cb.m, cb.cw,
                   row_number() OVER (
                       PARTITION BY r.vec_id, cb.m
                       ORDER BY sum((r.r_int - cb.c_int)
                                    * (r.r_int - cb.c_int)), cb.cw) AS rn
            FROM resid r
            JOIN cb ON cb.m = r.idx // {dsub} AND cb.d = r.idx % {dsub}
            GROUP BY r.vec_id, r.cid, cb.m, cb.cw) WHERE rn = 1),
        adc AS (SELECT p.vec_id, sum(l.l_int) AS adc_int
                FROM pq_assign p
                JOIN luts l ON l.cid = p.cid AND l.m = p.m AND l.cw = p.cw
                GROUP BY p.vec_id)"""


def ivfadc_oracle_sql(centroids: np.ndarray, codebooks: np.ndarray,
                      query: np.ndarray, *, k: int = 10,
                      n_probe: int = 4, where: str | None = None) -> str:
    """Generated DuckDB twin of ``ivfadc_topk`` (see ``_ivfadc_adc_ctes``
    for the shared exact-int64 WITH-body).  ``where`` makes it the twin of
    the FILTERED from-index serving path (``ivfadc_topk_from_index`` with
    ``keep=``)."""
    body = _ivfadc_adc_ctes(centroids, codebooks, query, n_probe=n_probe,
                            where=where)
    return f"""
        WITH {body}
        SELECT vec_id,
               CAST(adc_int AS DOUBLE) / {float(_SCALE) ** 2:.1f} AS adc_dist,
               CAST(row_number() OVER (ORDER BY adc_int, vec_id) AS BIGINT)
                   AS rank
        FROM adc
        ORDER BY adc_int, vec_id
        LIMIT {k}"""


def ivfadc_rerank_oracle_sql(centroids: np.ndarray, codebooks: np.ndarray,
                             query: np.ndarray, *, k: int = 10,
                             n_probe: int = 4, rerank: int = 200) -> str:
    """Generated DuckDB twin of ``ivfadc_rerank_topk``: the shared IVFADC
    WITH-body yields ADC candidates, the top-``rerank`` of them are
    re-ranked by exact int64 squared L2 against the inlined integer query
    (identical algebra to ``pq_rerank_oracle_sql``'s second pass)."""
    body = _ivfadc_adc_ctes(centroids, codebooks, query, n_probe=n_probe)
    q_int = _int_scale(query)
    q_rows = ",".join(f"({d},{int(q_int[d])})" for d in range(len(q_int)))
    return f"""
        WITH {body},
        qv(idx, q_int) AS (VALUES {q_rows}),
        cand AS (SELECT vec_id FROM adc
                 ORDER BY adc_int, vec_id LIMIT {rerank}),
        exact AS (SELECT c.vec_id,
                         sum((CAST(floor(c.x * {_SCALE} + 0.5) AS BIGINT)
                              - qv.q_int)
                             * (CAST(floor(c.x * {_SCALE} + 0.5) AS BIGINT)
                                - qv.q_int)) AS d2_int
                  FROM coords c
                  JOIN qv ON qv.idx = c.idx
                  WHERE c.vec_id IN (SELECT vec_id FROM cand)
                  GROUP BY c.vec_id)
        SELECT vec_id,
               CAST(d2_int AS DOUBLE) / {float(_SCALE) ** 2:.1f} AS l2_dist,
               CAST(row_number() OVER (ORDER BY d2_int, vec_id) AS BIGINT)
                   AS rank
        FROM exact
        ORDER BY d2_int, vec_id
        LIMIT {k}"""
