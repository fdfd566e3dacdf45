"""Training-corpus preparation operators beyond the reference repo:

- **repetition statistics** (Gopher-style published heuristics: duplicate-word
  fraction, top-word fraction, duplicate-2-gram fraction) — a pure per-row
  vectorized map, no shuffle;
- **benchmark decontamination** — flag documents sharing word n-grams with a
  held-out benchmark set.  The benchmark gram set is SMALL by definition
  (curated eval suites), so this is the broadcast-membership shape:
  ``ray.put`` the distinct gram array once, ``pc.is_in`` per batch;
- **unigram familiarity scoring** — mean train-split frequency of a
  document's tokens + OOV count; the train vocabulary is the broadcast small
  side (the dictionary-corrector pattern, model/dictionary.py);
- **temperature sampling weights** — per-group counts^alpha normalized, the
  aggregate → tiny driver merge → broadcast map shape used for corpus
  mixing/rebalancing in LLM training pipelines.

Every operator here has an exact DuckDB oracle in __ray_entry__ (integer
ratios are int/int → IEEE-double divisions, bit-identical on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _split_words


def _per_row_distinct_and_top(row_idx: np.ndarray, codes: np.ndarray,
                              n_values: int, n_rows: int
                              ) -> tuple[np.ndarray, np.ndarray]:
    """(distinct keys per row, max key multiplicity per row) for the
    multiset of (row, code) pairs — one np.unique, no per-row loop."""
    distinct = np.zeros(n_rows, dtype=np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    if codes.size == 0:
        return distinct, top
    combined = row_idx.astype(np.int64) * np.int64(n_values) \
        + codes.astype(np.int64)
    uniq, cnts = np.unique(combined, return_counts=True)
    rows_of = (uniq // np.int64(n_values)).astype(np.int64)
    distinct = np.bincount(rows_of, minlength=n_rows).astype(np.int64)
    starts = np.searchsorted(rows_of, np.arange(n_rows))
    ends = np.searchsorted(rows_of, np.arange(n_rows) + 1)
    ne = ends > starts
    if ne.any():
        # rows_of is sorted, so each nonempty row's run ends where the next
        # nonempty row's run starts; reduceat over those starts is exact
        top[ne] = np.maximum.reduceat(cnts, starts[ne])
    return distinct, top


def _encode_words(flat: pa.Array) -> tuple[np.ndarray, int]:
    """Dictionary-encode a flat string array → (int codes, dict size)."""
    if len(flat) == 0:
        return np.zeros(0, dtype=np.int64), 1
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, max(len(enc.dictionary), 1)


def repetition_stats_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Per-document repetition statistics (Rae et al. 2021 "Gopher" rules,
    word-level): duplicate-word fraction, top-word fraction, duplicate
    word-2-gram fraction.  Fully vectorized: one dictionary encode + one
    np.unique per statistic; all ratios are int/int double divisions with an
    exact SQL twin."""
    texts = batch.column(text_col).combine_chunks()
    flat, counts = _split_words(texts)
    n = len(counts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    codes, V = _encode_words(flat)

    distinct_w, top_w = _per_row_distinct_and_top(row_idx, codes, V, n)

    # adjacent word 2-grams within a row
    n2 = np.maximum(counts - 1, 0)
    distinct_2 = np.zeros(n, dtype=np.int64)
    if codes.size >= 2:
        same_row = row_idx[:-1] == row_idx[1:]
        gk = codes[:-1] * np.int64(V) + codes[1:]
        gk = gk[same_row]
        grow = row_idx[:-1][same_row]
        if gk.size:
            gvals, ginv = np.unique(gk, return_inverse=True)
            distinct_2, _ = _per_row_distinct_and_top(
                grow, ginv.astype(np.int64), max(len(gvals), 1), n)

    with np.errstate(divide="ignore", invalid="ignore"):
        dup_word = np.where(counts > 0,
                            (counts - distinct_w) / np.maximum(counts, 1), 0.0)
        top_word = np.where(counts > 0, top_w / np.maximum(counts, 1), 0.0)
        dup_2g = np.where(n2 > 0, (n2 - distinct_2) / np.maximum(n2, 1), 0.0)

    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(counts, pa.int64()),
        "dup_word_frac": pa.array(dup_word, pa.float64()),
        "top_word_frac": pa.array(top_word, pa.float64()),
        "n_2grams": pa.array(n2, pa.int64()),
        "dup_2gram_frac": pa.array(dup_2g, pa.float64()),
    })


def word_grams_per_row(texts: pa.Array, n_gram: int
                       ) -> tuple[pa.Array, np.ndarray]:
    """DISTINCT word n-grams per row → (flat gram strings, row index).

    Convention (shared with the SQL twins and stages/dedup.py's n-gram
    Jaccard): a document with fewer than ``n_gram`` words contributes ONE
    gram — its whole whitespace-joined text (empty string for empty docs).
    Gram strings are built with Arrow kernels (binary_join_element_wise over
    shifted slices), not a Python loop.
    """
    flat, counts = _split_words(texts)
    nrows = len(counts)
    row_idx = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    L = len(flat)

    grams: list[pa.Array] = []
    rows: list[np.ndarray] = []
    if L >= n_gram:
        parts = [flat.slice(k, L - n_gram + 1) for k in range(n_gram)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = row_idx[: L - n_gram + 1] == row_idx[n_gram - 1:]
        grams.append(joined.filter(pa.array(valid)))
        rows.append(row_idx[: L - n_gram + 1][valid])

    short = counts < n_gram
    if short.any():
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets), flat)
        whole = pc.binary_join(la, " ")
        grams.append(whole.filter(pa.array(short)))
        rows.append(np.nonzero(short)[0].astype(np.int64))

    if not grams:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)
    gram_arr = pa.concat_arrays(
        [pa.chunked_array([g]).combine_chunks()
         if isinstance(g, pa.ChunkedArray) else g for g in grams])
    grow = np.concatenate(rows) if rows else np.zeros(0, dtype=np.int64)
    if len(gram_arr) == 0:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)

    # reduce to DISTINCT (row, gram) pairs with ONE dictionary encode
    enc = gram_arr.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    G = max(len(enc.dictionary), 1)
    combined = grow * np.int64(G) + codes
    u = np.unique(combined)
    urow = (u // np.int64(G)).astype(np.int64)
    ucode = (u % np.int64(G)).astype(np.int64)
    return enc.dictionary.take(pa.array(ucode)), urow


def distinct_grams_batch(batch: pa.Table, *, text_col: str = "text",
                         n_gram: int = 5) -> pa.Table:
    """Batch-level distinct gram partial (the benchmark-side extraction)."""
    gram_arr, _ = word_grams_per_row(batch.column(text_col).combine_chunks(),
                                     n_gram)
    u = pc.unique(gram_arr)
    return pa.table({"gram": u})


class ContaminationStage:
    """Per-document benchmark-overlap scoring against a broadcast gram set.

    ``bench_ref`` is ``ray.put`` of a sorted Arrow string array of the
    benchmark's distinct word n-grams — fetched ONCE per actor in
    ``__init__``, membership-tested per batch with ``pc.is_in`` over each
    batch's *distinct* grams only.
    """

    def __init__(self, bench_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", n_gram: int = 5) -> None:
        import ray

        self._bench: pa.Array = ray.get(bench_ref)
        self._text_col = text_col
        self._id_col = id_col
        self._n = n_gram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_col).combine_chunks()
        nrows = len(texts)
        gram_arr, grow = word_grams_per_row(texts, self._n)
        n_grams = np.bincount(grow, minlength=nrows).astype(np.int64)
        hits = pc.is_in(gram_arr, value_set=self._bench) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_hit = (np.bincount(grow, weights=hits, minlength=nrows)
                 .astype(np.int64) if hits.size
                 else np.zeros(nrows, dtype=np.int64))
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(n_grams > 0, n_hit / np.maximum(n_grams, 1), 0.0)
        return pa.table({
            self._id_col: batch.column(self._id_col),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
            "hit_frac": pa.array(frac, pa.float64()),
        })


class FamiliarityStage:
    """Unigram-LM familiarity: per-document mean train-split token frequency
    and OOV occurrence count.  ``vocab_ref`` is ``ray.put`` of
    ``(token pa.Array, frequency int64 np.ndarray)`` — the broadcast small
    side, fetched once per actor; lookups are one ``pc.index_in`` per batch.
    Integer sums / integer counts → exact double division (SQL twin)."""

    def __init__(self, vocab_ref, *, text_col: str = "text",
                 id_col: str = "doc_id") -> None:
        import ray

        tokens, freqs = ray.get(vocab_ref)
        self._tokens: pa.Array = tokens
        self._freqs: np.ndarray = freqs
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_col).combine_chunks()
        flat, counts = _split_words(texts)
        n = len(counts)
        idx = pc.index_in(flat, value_set=self._tokens).fill_null(-1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        fvals = np.where(idx >= 0, self._freqs[np.maximum(idx, 0)], 0) \
            .astype(np.int64)
        oov = (idx < 0).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        if fvals.size:
            sum_f = np.add.reduceat(np.concatenate((fvals, [0])), offsets[:-1])
            sum_o = np.add.reduceat(np.concatenate((oov, [0])), offsets[:-1])
        else:
            sum_f = np.zeros(n, dtype=np.int64)
            sum_o = np.zeros(n, dtype=np.int64)
        empty = counts == 0
        sum_f[empty] = 0
        sum_o[empty] = 0
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_f = np.where(counts > 0, sum_f / np.maximum(counts, 1), 0.0)
        return pa.table({
            self._id_col: batch.column(self._id_col),
            "n_tokens": pa.array(counts, pa.int64()),
            "n_oov": pa.array(sum_o, pa.int64()),
            "mean_train_freq": pa.array(mean_f, pa.float64()),
        })


def contamination_joined(docs, *, bench_remainders: tuple[int, ...] = (0,),
                         text_col: str = "text", id_col: str = "doc_id",
                         n_gram: int = 5, num_partitions: int = 64):
    """Scale twin of the broadcast ``ContaminationStage``: benchmark-overlap
    scoring as ONE gram-keyed exchange — for when the "benchmark" side is NOT
    a small curated set (e.g. decontaminating split A against split B of the
    same 100 TB corpus, where broadcasting split B's grams would OOM every
    actor).

    Both sides' distinct per-doc grams flow through the same exchange tagged
    by side (``doc_id % 10 ∈ bench_remainders`` → bench); inside each gram
    partition a vectorized isin marks eval-gram hits, and a second doc-keyed
    pre-aggregated exchange sums (n_grams, n_hit) per document.  No driver
    materialization anywhere; identical output contract (and SQL oracle) to
    the broadcast path.
    """
    import numpy as np
    import pandas as pd

    from .shuffle import grouped_agg

    def grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        gram_arr, grow = word_grams_per_row(texts, n_gram)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[grow]
        is_bench = np.isin(ids % 10, bench_remainders)
        return pa.table({"gram": gram_arr,
                         id_col: pa.array(ids, pa.int64()),
                         "is_bench": pa.array(is_bench, pa.bool_())})

    from .shuffle import grouped_apply

    occ = docs.map_batches(grams, batch_format="pyarrow")

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[~df["is_bench"]]
        if ev.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="int64")})
        bench = df.loc[df["is_bench"], "gram"].unique()
        hit = ev["gram"].isin(bench).to_numpy()
        # pre-aggregate per doc INSIDE the gram partition: the second
        # exchange moves one (doc, n, h) partial per doc per partition,
        # not one row per gram
        g = ev.assign(n=1, h=hit.astype(np.int64)) \
            .groupby(id_col, as_index=False)[["n", "h"]].sum()
        return g.astype({id_col: "int64", "n": "int64", "h": "int64"})

    per_gram = grouped_apply(occ, ["gram"], hits,
                             num_partitions=num_partitions)
    agg = grouped_agg(per_gram, [id_col],
                      {"n_grams": ("n", "sum"), "n_hit": ("h", "sum")},
                      num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_grams").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = batch.column("n_hit").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(n > 0, h / np.maximum(n, 1), 0.0)
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         "n_grams": pa.array(n, pa.int64()),
                         "n_hit": pa.array(h, pa.int64()),
                         "hit_frac": pa.array(frac, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def temperature_weights(group_counts: dict[str, int], alpha: float = 0.5
                        ) -> dict[str, float]:
    """Per-GROUP sampling weight w_g = count_g^alpha / Σ count^alpha, summed
    in sorted-group order (deterministic); the per-DOC weight is w_g/count_g.
    The canonical multi-corpus temperature-mixing rule (alpha=0.5 ≈ the
    multilingual rebalancing exponent of published LLM data recipes)."""
    groups = sorted(group_counts)
    base = np.array([float(group_counts[g]) for g in groups])
    # np.sqrt (not x**0.5) when alpha=0.5: bit-identical to SQL sqrt()
    pows = np.sqrt(base) if alpha == 0.5 else base ** alpha
    total = float(pows.sum())
    return {g: float(p / total) for g, p in zip(groups, pows)}


def ngram_novelty(docs, *, text_col: str = "text", id_col: str = "doc_id",
                  n_gram: int = 5, num_partitions: int = 64):
    """Per-document n-gram novelty: the fraction of a document's DISTINCT
    word n-grams whose global first occurrence (owner = min doc_id over all
    documents containing the gram) is the document itself — the
    "contribution" metric data-curation pipelines use to rank documents by
    how much previously-unseen text they add to the corpus (the dual of
    ``contamination_joined``'s overlap scoring; same short-doc convention:
    < ``n_gram`` words → one whole-text gram).

    ONE gram-keyed exchange computes each gram's owner AND pre-aggregates
    per-doc (seen, owned) partials inside the partition; a second doc-keyed
    exchange sums the tiny partials.  No broadcast, no driver
    materialization — both sides of the ownership question are the corpus
    itself, so this is the unbroadcastable-by-construction shape.
    Returns (doc_id, n_grams, n_novel, novelty).
    """
    import pandas as pd

    from .shuffle import grouped_agg, grouped_apply

    def grams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        gram_arr, grow = word_grams_per_row(texts, n_gram)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[grow]
        return pa.table({"gram": gram_arr,
                         id_col: pa.array(ids, pa.int64())})

    occ = docs.map_batches(grams, batch_format="pyarrow")

    def own(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "k": pd.Series([], dtype="int64")})
        owner = df.groupby("gram")[id_col].transform("min").to_numpy()
        novel = (df[id_col].to_numpy() == owner).astype(np.int64)
        g = df.assign(n=1, k=novel) \
            .groupby(id_col, as_index=False)[["n", "k"]].sum()
        return g.astype({id_col: "int64", "n": "int64", "k": "int64"})

    per_gram = grouped_apply(occ, ["gram"], own,
                             num_partitions=num_partitions)
    agg = grouped_agg(per_gram, [id_col],
                      {"n_grams": ("n", "sum"), "n_novel": ("k", "sum")},
                      num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_grams").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = batch.column("n_novel").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_grams": pa.array(n, pa.int64()),
            "n_novel": pa.array(k, pa.int64()),
            # one IEEE division of exact integers — bit-equal to the SQL
            # twin's  n_novel * 1.0 / n_grams
            "novelty": pa.array(k * 1.0 / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
