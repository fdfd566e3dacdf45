"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine extensions for training-data pipelines (the reference's only dedup is
the distinct-char aggregate, SURVEY.md §2.7).  Scale posture:

- **exact**: content-hash column added vectorized in ``map_batches``; ONE
  hash-shuffle ``groupby(hash)`` keeps the min-id row per group.  At 100 TB the
  shuffle moves (hash, id) projections, not payloads, when ``keep="ids"``.
- **MinHash+LSH**: shingle→minhash signatures per batch (NumPy, no shuffle),
  exploded to (band_id, band_hash, id) rows — b×rows small ints — then ONE
  ``groupby(band)`` produces candidate groups; candidates are verified with
  exact Jaccard inside the group task.  No all-pairs anywhere.
- **SimHash**: 64-bit signatures per batch; near-dup candidates via banded
  16-bit chunks (same LSH groupby shape).
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_u64_array, shingle_hashes


def add_md5_column(batch: pa.Table, *, text_col: str = "text",
                   out_col: str = "content_md5") -> pa.Table:
    vals = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def exact_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id row per distinct text (md5 key, matching the SQL oracle
    ``GROUP BY md5(text) … min(id)``).  Uses coarse hash partitions so key
    cardinality (≈ row count) never becomes Ray-level group count."""
    from .shuffle import grouped_apply

    hashed = ds.map_batches(add_md5_column, batch_format="pyarrow",
                            fn_kwargs=dict(text_col=text_col))

    def keep_first(df):
        out = df.sort_values(id_col).drop_duplicates(subset=["content_md5"])
        return out.drop(columns=["content_md5"])

    return grouped_apply(hashed, ["content_md5"], keep_first)


# --- MinHash + LSH ------------------------------------------------------------


def minhash_signature(text: str, n_hashes: int, k_shingle: int) -> np.ndarray:
    sh = shingle_hashes(text, k=k_shingle)
    sig = np.empty(n_hashes, dtype=np.uint64)
    for h in range(n_hashes):
        sig[h] = hash_u64_array(sh, seed=h).min()
    return sig


def minhash_bands_batch(batch: pa.Table, *, text_col: str = "text",
                        id_col: str = "doc_id", n_hashes: int = 64,
                        bands: int = 16, k_shingle: int = 5) -> pa.Table:
    """Explode each row into `bands` (band_id, band_hash, id) rows."""
    rows_per_band = n_hashes // bands
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, t in zip(ids, texts):
        sig = minhash_signature(t or "", n_hashes, k_shingle)
        for b in range(bands):
            seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bh = int(hash_u64_array(seg, seed=1000 + b).sum()) & 0x7FFFFFFFFFFFFFFF
            out_band.append(b)
            out_hash.append(bh)
            out_id.append(i)
    return pa.table({"band_id": pa.array(out_band, pa.int32()),
                     "band_hash": pa.array(out_hash, pa.int64()),
                     id_col: pa.array(out_id, pa.int64())})


def _jaccard(a: str, b: str, k: int) -> float:
    sa = set(shingle_hashes(a, k=k).tolist())
    sb = set(shingle_hashes(b, k=k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def word_ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact Jaccard over word n-grams (token-level near-dup measure)."""
    from ..functions.hashing import word_ngram_hashes

    sa = set(word_ngram_hashes(a, n=n).tolist())
    sb = set(word_ngram_hashes(b, n=n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", n_gram: int = 3,
                        n_hashes: int = 64, bands: int = 16,
                        jaccard_threshold: float = 0.3,
                        texts_ref=None) -> ray.data.Dataset:
    """Word-n-gram Jaccard near-dup pairs: MinHash-LSH candidate generation
    over word n-gram hashes, verified with exact token-level Jaccard."""
    from ..functions.hashing import word_ngram_hashes

    rows_per_band = n_hashes // bands

    def bands_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, t in zip(ids, texts):
            grams = word_ngram_hashes(t or "", n=n_gram)
            sig = np.empty(n_hashes, dtype=np.uint64)
            for h in range(n_hashes):
                sig[h] = hash_u64_array(grams, seed=h).min()
            for b in range(bands):
                seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out_band.append(b)
                out_hash.append(int(hash_u64_array(seg, seed=2000 + b).sum())
                                & 0x7FFFFFFFFFFFFFFF)
                out_id.append(i)
        return pa.table({"band_id": pa.array(out_band, pa.int32()),
                         "band_hash": pa.array(out_hash, pa.int64()),
                         id_col: pa.array(out_id, pa.int64())})

    cand = _bucket_pairs_partitioned(
        ds.map_batches(bands_batch, batch_format="pyarrow"),
        ["band_id", "band_hash"], id_col)
    if texts_ref is None:
        return cand
    cand = cand.repartition(32)

    class VerifyNgram:
        def __init__(self):
            import ray

            self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [word_ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), n_gram)
                  for a, b in zip(batch.column("id_a").to_pylist(),
                                  batch.column("id_b").to_pylist())]
            out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
            return out.filter(pc.greater_equal(out.column("jaccard"), jaccard_threshold))

    return cand.map_batches(VerifyNgram, batch_format="pyarrow", concurrency=(2, 8))


MAX_BUCKET = 64          # LSH buckets larger than this are boilerplate collisions
_PAIR_PARTITIONS = 64    # coarse partitions for vectorized bucket-joins


def _bucket_pairs_partitioned(rows_ds: ray.data.Dataset, key_cols: list[str],
                              id_col: str, carry_cols: list[str] | None = None,
                              ) -> ray.data.Dataset:
    """(key → member ids) → candidate (id_a, id_b) pairs, scalably.

    A naive ``groupby(key).map_groups`` makes one Python call per bucket —
    with millions of size-1 buckets that serializes the pipeline.  Instead the
    rows are grouped by a COARSE partition of the key space (``key_hash % P``)
    so each ``map_groups`` call handles thousands of buckets at once with one
    vectorized pandas self-merge; oversized buckets (> MAX_BUCKET, hash
    collisions on boilerplate) are dropped deterministically.  Cross-band
    duplicate pairs are removed by a vectorized ``groupby.count`` (sort-based,
    no per-group Python), never ``map_groups``.
    """
    import pandas as pd

    carry = carry_cols or []

    def add_pbucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for kc in key_cols:
            h = hash_u64_array(
                h + batch.column(kc).to_numpy(zero_copy_only=False).astype(np.uint64),
                seed=11)
        return batch.append_column("pbucket",
                                   pa.array((h % _PAIR_PARTITIONS).astype(np.int64)))

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(key_cols)[id_col].transform("size")
        df = df[(sizes > 1) & (sizes <= MAX_BUCKET)]
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 **{c: pd.Series([], dtype=df[c].dtype if c in df else "object")
                                    for c in carry}})
        cols = key_cols + [id_col] + carry
        m = df[cols].merge(df[cols], on=key_cols, suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = pd.DataFrame({"id_a": m[f"{id_col}_a"].to_numpy(),
                            "id_b": m[f"{id_col}_b"].to_numpy()})
        for c in carry:
            out[c + "_a"] = m[c + "_a"].to_numpy()
            out[c + "_b"] = m[c + "_b"].to_numpy()
        return out

    cand = rows_ds.map_batches(add_pbucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(pairs_in_partition, batch_format="pandas")
    # cross-band duplicate pairs: exact distinct via coarse hash partitions
    # (Ray's native groupby costs ~ms per group — ruinous at pair cardinality)
    from .shuffle import distinct_rows

    return distinct_rows(cand, ["id_a", "id_b"])


def minhash_duplicate_pairs(ds: ray.data.Dataset, *, text_col: str = "text",
                            id_col: str = "doc_id", n_hashes: int = 64,
                            bands: int = 16, k_shingle: int = 5,
                            jaccard_threshold: float = 0.8,
                            texts_ref=None) -> ray.data.Dataset:
    """Candidate pairs from LSH buckets, verified by exact shingle Jaccard.

    ``texts_ref``: ``ray.put`` of an id→text dict used for verification inside
    the verify stage (the broadcast small side at test scale; at 100 TB one
    would verify by re-reading the pair's rows from the id-partitioned store).
    Emits (id_a, id_b, jaccard) with id_a < id_b, deduplicated across bands.
    """
    bands_ds = ds.map_batches(
        minhash_bands_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col, n_hashes=n_hashes,
                       bands=bands, k_shingle=k_shingle))
    cand = _bucket_pairs_partitioned(bands_ds, ["band_id", "band_hash"], id_col)
    if texts_ref is None:
        return cand
    # candidate set can be large (background-similarity collisions): split it
    # into blocks so the verify actor pool actually parallelizes
    cand = cand.repartition(32)

    class Verify:
        def __init__(self):
            import ray

            self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [
                _jaccard(self.texts.get(a, ""), self.texts.get(b, ""), k_shingle)
                for a, b in zip(batch.column("id_a").to_pylist(),
                                batch.column("id_b").to_pylist())
            ]
            out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
            return out.filter(pc.greater_equal(out.column("jaccard"),
                                               jaccard_threshold))

    return cand.map_batches(Verify, batch_format="pyarrow", concurrency=(2, 8))


# --- SimHash ------------------------------------------------------------------


def simhash64(text: str, k_shingle: int = 5) -> int:
    sh = shingle_hashes(text or "", k=k_shingle)
    if sh.size == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    word = 0
    for b in range(64):
        if votes[b] > 0:
            word |= 1 << b
    return word & 0x7FFFFFFFFFFFFFFF  # keep int64-positive for Arrow


def simhash_batch(batch: pa.Table, *, text_col: str = "text",
                  id_col: str = "doc_id", k_shingle: int = 5) -> pa.Table:
    vals = [simhash64(t, k_shingle) for t in batch.column(text_col).to_pylist()]
    return pa.table({id_col: batch.column(id_col),
                     "simhash": pa.array(vals, pa.int64())})


def simhash_candidates(ds: ray.data.Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id", k_shingle: int = 5,
                       max_hamming: int = 3, n_chunks: int = 4) -> ray.data.Dataset:
    """Near-dup candidates: equal simhash chunk (64/n_chunks bits) → bucket →
    verify Hamming distance ≤ max_hamming within bucket.  Pigeonhole recall
    guarantee: every pair with hamming < n_chunks shares ≥ one chunk; raise
    ``n_chunks`` (8 → 8-bit chunks) for higher recall at more candidates."""
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow",
                          fn_kwargs=dict(text_col=text_col, id_col=id_col,
                                         k_shingle=k_shingle))
    chunk_bits = 64 // n_chunks
    chunk_mask = (1 << chunk_bits) - 1

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False)
        n = len(ids)
        chunk_ids = np.repeat(np.arange(n_chunks, dtype=np.int64), n)
        tiled_ids = np.tile(ids, n_chunks)
        tiled_sh = np.tile(sh, n_chunks)
        chunk_vals = (tiled_sh >> (chunk_bits * chunk_ids)) & chunk_mask
        return pa.table({"chunk_id": pa.array(chunk_ids, pa.int64()),
                         "chunk_val": pa.array(chunk_vals, pa.int64()),
                         id_col: pa.array(tiled_ids, pa.int64()),
                         "simhash": pa.array(tiled_sh, pa.int64())})

    cand = _bucket_pairs_partitioned(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["chunk_id", "chunk_val"], id_col, carry_cols=["simhash"])

    def hamming_filter(batch: pa.Table) -> pa.Table:
        a = batch.column("simhash_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("simhash_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        x = a ^ b
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        out = pa.table({"id_a": batch.column("id_a"), "id_b": batch.column("id_b"),
                        "hamming": pa.array(ham, pa.int64())})
        return out.filter(pc.less_equal(out.column("hamming"), max_hamming))

    return cand.map_batches(hamming_filter, batch_format="pyarrow")
