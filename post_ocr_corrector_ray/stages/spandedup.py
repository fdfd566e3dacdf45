"""Cross-document exact span deduplication (C4 / "Deduplicating Training Data
Makes Language Models Better", Lee et al. 2022 — published-heuristic family):
remove every word-``k``-gram span that occurs in MORE THAN ONE document,
keeping the single copy in the lowest ``doc_id`` ("keeper"), and reconstruct
each document's text from its surviving words.

Shape (two exchanges, both coarse-hash-partitioned — stages/shuffle.py keeps
the Ray group count fixed at ``num_partitions`` regardless of gram/doc
cardinality):

1. **occurrence extraction** — ``map_batches``: (doc_id, pos, gram) for every
   k-gram occurrence, built with Arrow kernels (shifted-slice
   ``binary_join_element_wise``), no Python loop.  Docs shorter than ``k``
   words emit nothing (they cannot contain a span and pass through unchanged).
2. **gram-partitioned removal detection** — ONE exchange keyed on the gram
   string; inside each partition a vectorized pandas groupby finds grams with
   ≥2 distinct docs and their keeper (min doc_id), and emits removal records
   ``(doc_id, pos)`` for every occurrence outside the keeper doc.  Removals
   are a small fraction of occurrences (only duplicated spans survive).
3. **doc-partitioned reconstruction** — ONE exchange co-partitioning the
   original docs with their removal records on ``doc_id`` (the tagged-union
   shape of stages/joins.py); per partition, covered word positions are
   computed with a vectorized interval-overlay (+1/-1 delta array + cumsum)
   and surviving words are re-joined with Arrow ``binary_join``.

Scale notes: the occurrence exchange ships each word ``k`` times (the
inherent cost of exact span dedup; Lee et al.'s suffix-array variant trades
this for a global sort).  The DEFAULT exchange key is a 128-bit gram hash
(two independent seeded 64-bit lanes — ``hash_grams=True``): removal
detection only needs gram EQUALITY, and 16 bytes/gram cuts exchange bytes
~4-5× vs the raw string (collision odds ~n²/2¹²⁹ — negligible at any corpus
size).  ``hash_grams=False`` keeps the string key, which is exactly
SQL-expressible (the DuckDB twin in __ray_entry__ hash-matches the full
output, clean text included); both paths produce identical output
(pytest-pinned), so the twin's oracle also verifies the hashed default.
Skew: a boilerplate gram appearing in millions of docs lands in one
partition — bounded by emitting removal records (3 ints/occurrence), not
text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .shuffle import DEFAULT_PARTITIONS, grouped_apply
from .textstats import _split_words

_SIDE = "_side"


# two independent 16-byte hash keys → two independent 64-bit lanes = the
# 128-bit gram identity (pd.util.hash_pandas_object is deterministic across
# processes for a fixed hash_key)
_GRAM_HASH_KEY_LO = "spandedup-lane-0"
_GRAM_HASH_KEY_HI = "spandedup-lane-1"


def gram_occurrences_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           hash_grams: bool = False) -> pa.Table:
    """Every word-k-gram occurrence in the batch → (doc_id, pos, gram) — or,
    with ``hash_grams=True``, (doc_id, pos, g_lo, g_hi): the 128-bit hashed
    key that cuts exchange bytes ~4-5× (the scale default of span_dedup).

    ``pos`` is the 0-based word index of the gram's first word.  Unlike the
    contamination grams (corpusprep.word_grams_per_row), occurrences are NOT
    deduplicated — position identity is the point — and short docs emit
    nothing.
    """
    texts = batch.column(text_col).combine_chunks()
    flat, counts = _split_words(texts)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    L = len(flat)
    if L < k:
        if hash_grams:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "g_lo": pa.array([], pa.int64()),
                             "g_hi": pa.array([], pa.int64())})
        return pa.table({id_col: pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "gram": pa.array([], pa.string())})
    parts = [flat.slice(j, L - k + 1) for j in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    valid = row_idx[: L - k + 1] == row_idx[k - 1:]
    grams = joined.filter(pa.array(valid))
    grow = row_idx[: L - k + 1][valid]
    # word offset of each gram within its own document
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    pos = (np.nonzero(valid)[0] - offsets[grow]).astype(np.int64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if hash_grams:
        s = grams.to_pandas()
        lo = pd.util.hash_pandas_object(
            s, index=False, hash_key=_GRAM_HASH_KEY_LO).to_numpy().view(np.int64)
        hi = pd.util.hash_pandas_object(
            s, index=False, hash_key=_GRAM_HASH_KEY_HI).to_numpy().view(np.int64)
        return pa.table({id_col: pa.array(ids[grow], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "g_lo": pa.array(lo, pa.int64()),
                         "g_hi": pa.array(hi, pa.int64())})
    return pa.table({id_col: pa.array(ids[grow], pa.int64()),
                     "pos": pa.array(pos, pa.int64()),
                     "gram": grams})


def _removals(df: pd.DataFrame, id_col: str,
              gram_cols: list[str]) -> pd.DataFrame:
    """Per gram-partition: occurrences of cross-doc-duplicated grams outside
    the keeper (min doc_id) doc → (doc_id, pos) removal records."""
    if df.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64")})
    stats = df.groupby(gram_cols)[id_col].agg(nd="nunique", keeper="min")
    dup = stats[stats["nd"] >= 2]
    m = df.merge(dup, left_on=gram_cols, right_index=True, how="inner")
    m = m[m[id_col] != m["keeper"]]
    return pd.DataFrame({id_col: m[id_col].astype("int64").to_numpy(),
                         "pos": m["pos"].astype("int64").to_numpy()})


def _rebuild(df: pd.DataFrame, id_col: str, k: int) -> pd.DataFrame:
    """Per doc-partition: overlay removal intervals [pos, pos+k) onto each
    doc's word sequence, drop covered words, re-join the survivors."""
    docs = df[df[_SIDE] == 0]
    if docs.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "clean_text": pd.Series([], dtype="object"),
                             "n_words": pd.Series([], dtype="int64"),
                             "n_removed": pd.Series([], dtype="int64")})
    docs = docs.sort_values(id_col, kind="mergesort")
    rem = df[df[_SIDE] == 1]
    texts = pa.array(docs["text"].to_numpy(dtype=object), pa.string())
    flat, counts = _split_words(texts)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    total = int(offsets[-1])
    ids = docs[id_col].astype("int64").to_numpy()

    covered = np.zeros(total, dtype=bool)
    if not rem.empty and total:
        rrow = np.searchsorted(ids, rem[id_col].astype("int64").to_numpy())
        rpos = rem["pos"].astype("int64").to_numpy()
        starts = offsets[rrow] + rpos
        ends = np.minimum(starts + k, offsets[rrow + 1])
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        covered = np.cumsum(delta[:-1]) > 0

    keep = ~covered
    kept_flat = flat.filter(pa.array(keep))
    kept_counts = (np.add.reduceat(np.concatenate((keep.astype(np.int64), [0])),
                                   offsets[:-1])
                   if total else np.zeros(len(counts), dtype=np.int64))
    kept_counts[counts == 0] = 0
    kept_offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(kept_offsets), kept_flat)
    clean = pc.binary_join(la, " ").to_pandas()
    return pd.DataFrame({id_col: ids,
                         "clean_text": clean.to_numpy(dtype=object),
                         "n_words": counts,
                         "n_removed": (counts - kept_counts).astype(np.int64)})


def span_dedup(docs: ray.data.Dataset, *, text_col: str = "text",
               id_col: str = "doc_id", k: int = 8,
               hash_grams: bool = True,
               num_partitions: int = DEFAULT_PARTITIONS) -> ray.data.Dataset:
    """Cross-document exact span dedup over ``docs`` (must have ``id_col``,
    ``text_col``) → (doc_id, clean_text, n_words, n_removed), one row per
    input document (unchanged docs included, clean_text == normalized join of
    their words).  ``hash_grams=True`` (default) keys the removal exchange on
    the 128-bit gram hash — ~4-5× fewer exchange bytes, identical output
    (pytest-pinned vs the string key; collisions negligible)."""
    gram_cols = ["g_lo", "g_hi"] if hash_grams else ["gram"]
    occ = docs.map_batches(gram_occurrences_batch, batch_format="pyarrow",
                           fn_kwargs=dict(text_col=text_col, id_col=id_col,
                                          k=k, hash_grams=hash_grams))
    rem = grouped_apply(occ, gram_cols,
                        lambda df: _removals(df, id_col, gram_cols),
                        num_partitions=num_partitions)

    # tagged union of (docs: side 0) and (removals: side 1) → ONE doc_id
    # exchange; pos is null-padded on the doc side (float64 through pandas)
    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            _SIDE: pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            id_col: batch.column(id_col).cast(pa.int64()),
            "text": batch.column(text_col).cast(pa.string()),
            "pos": pa.nulls(n, pa.float64()),
        })

    def tag_rem(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            _SIDE: pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            id_col: batch.column(id_col).cast(pa.int64()),
            "text": pa.nulls(n, pa.string()),
            "pos": batch.column("pos").cast(pa.float64()),
        })

    both = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        rem.map_batches(tag_rem, batch_format="pyarrow"))
    return grouped_apply(both, [id_col],
                         lambda df: _rebuild(df, id_col, k),
                         num_partitions=num_partitions)
