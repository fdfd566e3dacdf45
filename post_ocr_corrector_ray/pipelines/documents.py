"""Document-table pipelines: reference text semantics + training-data ops
applied to the ``documents`` test table (doc_id, text, lang, source, n_chars).

Each function takes ``sf_dir`` and returns a Dataset / Arrow table; SQL
oracles (where expressible) live in __ray_entry__.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.edit_distance import levenshtein
from ..functions.noise import mutilate_keyed
from ..functions.text import normalize_whitespace_vec
from ..sources.markup import markup_to_sentences_batch
from ..stages import dedup as dd
from ..stages import textstats as ts
from .corpus import pick_split, token_counts
from .evaluate import add_cer_column


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_normalize_ws(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        norm = [normalize_whitespace_vec(t or "")
                for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "norm_text": pa.array(norm, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_all_chars(sf_dir: str) -> pa.Table:
    """Global distinct-char aggregate (A1) → one row per char."""
    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized distinct chars: one utf-32 decode + np.unique per batch
        joined = "".join(t for t in batch.column("text").to_pylist() if t)
        cps = np.unique(np.frombuffer(joined.encode("utf-32-le"), dtype="<u4"))
        chars = "".join(chr(int(c)) for c in cps)
        return pa.table({"chars": pa.array([chars], pa.string())})

    merged: set[str] = set()
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.update(row["chars"])
    return pa.table({"ch": pa.array(sorted(merged), pa.string())})


def doc_token_counts(sf_dir: str) -> ray.data.Dataset:
    # data-size-adaptive exchange: the token shuffle widens with the corpus
    # (parquet byte size known for free), never a fixed 64 at 100 TB
    from ..stages.shuffle import partitions_for

    p = partitions_for(size_bytes=os.path.getsize(f"{sf_dir}/documents.parquet"))
    return token_counts(_docs(sf_dir, ["text"]), text_col="text", split=None,
                        num_partitions=p)


_BPE_MERGES_CACHE: dict = {}


def _bpe_merges(sf_dir: str, n_merges: int = 30):
    """One BPE training pass per table, memoized (the _PQ_BOOKS_CACHE
    discipline): the word census is the corpus-sized exchange
    (``doc_token_counts``), merge learning runs on its aggregated output —
    deterministic in sf_dir, so the memo changes nothing observable."""
    key = (sf_dir, n_merges)
    got = _BPE_MERGES_CACHE.get(key)
    if got is None:
        from ..stages.bpe import bpe_learn

        got = bpe_learn(doc_token_counts(sf_dir), n_merges)
        _BPE_MERGES_CACHE[key] = got
    return got


def doc_bpe_merges(sf_dir: str, n_merges: int = 30):
    """BPE tokenizer TRAINING (stages/bpe.py; Sennrich et al. 2016):
    vocabulary induction from the corpus's own word census.  The only
    corpus-sized pass is the word-frequency exchange; merge learning is a
    deterministic driver-side pass over the aggregated (token, frequency)
    table — the PQ-codebook discipline applied to tokenizers.  Returns the
    merge table (rank, left, right, pair_count); training is iterative and
    not SQL-expressible, so correctness is pytest-pinned (golden Sennrich
    example + independent naive recount) while the APPLICATION twin below
    is oracle-backed."""
    return _bpe_merges(sf_dir, n_merges)


def doc_bpe_token_counts(sf_dir: str, n_merges: int = 30) -> ray.data.Dataset:
    """Distributed application of the learned BPE merges: per document,
    whitespace-word and BPE-token counts (stages/bpe.py::bpe_token_counts —
    merges broadcast once, per-batch distinct-word memoized encode).  The
    generated DuckDB twin re-applies the SAME learned merges (inlined
    constants, independently re-derived by a local non-Ray recount) through
    a recursive CTE that merges one leftmost lowest-rank pair per step —
    provably equivalent to the engine's all-occurrences merge (see
    stages/bpe.py module docstring)."""
    from ..stages.bpe import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]),
                            _bpe_merges(sf_dir, n_merges))


def doc_dictionary_join(sf_dir: str, min_frequency: int = 2,
                        metric: str = "lev") -> ray.data.Dataset:
    """Dictionary correction with the vocabulary as a DATASET — the
    partitioned token-lookup twin of the broadcast DictionaryCorrector
    (stages/dictjoin.py): tokens ⋈ vocab membership join, sharded
    nearest-word scan over distinct OOV tokens, positional rebuild.  Here
    the corpus corrects against its OWN ≥ ``min_frequency`` token census
    (singleton tokens snap to their nearest frequent word — corpus
    spell-normalization).  ``metric="lev"`` is the SQL-shared metric (the
    oracle's levenshtein); byte-identity of ``metric="osa"`` vs the
    broadcast corrector is pytest-pinned.  Returns (doc_id, corrected)."""
    from ..stages.dictjoin import dictionary_correct_joined

    docs = _docs(sf_dir, ["doc_id", "text"])
    vocab = doc_token_counts(sf_dir)
    return dictionary_correct_joined(docs, vocab, id_col="doc_id",
                                     text_col="text",
                                     min_frequency=min_frequency,
                                     metric=metric)


def doc_split_assignment(sf_dir: str) -> ray.data.Dataset:
    """80/10/10 split keyed on the stable row id (doc_id % 10 — the direct
    analog of the reference's line-number modulo, make_split_csv.py:23-32)."""
    ds = _docs(sf_dir, ["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        rem = ids % 10
        splits = np.where(rem == 9, "validation", np.where(rem == 0, "test", "train"))
        assert pick_split(9) == "validation"  # keep mapping pinned to reference fn
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": pa.array(splits.tolist(), pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_lev_reverse(sf_dir: str) -> ray.data.Dataset:
    """Levenshtein(text, reverse(text)) — exercises the plain-lev kernel with
    an exact SQL twin (DuckDB ``levenshtein``)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        vals = [levenshtein(t or "", (t or "")[::-1])
                for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lev_rev": pa.array(vals, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: min doc_id per md5(text) (SQL-twin groupby), via coarse
    hash partitions (content-hash cardinality ≈ row count)."""
    from ..stages.shuffle import grouped_agg

    ds = _docs(sf_dir, ["doc_id", "text"])
    hashed = ds.map_batches(dd.add_md5_column, batch_format="pyarrow") \
        .map_batches(lambda b: b.select(["doc_id", "content_md5"]),
                     batch_format="pyarrow")
    return grouped_agg(hashed, ["content_md5"], {"doc_id": ("doc_id", "min")})


def doc_token_stats(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.token_stats_batch, batch_format="pyarrow")


def doc_quality(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.quality_score_batch, batch_format="pyarrow")


def doc_langid(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.langid_batch, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """MD5 content + min-k-gram-md5 fingerprint (exact SQL twin)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.fingerprint_batch, batch_format="pyarrow")


def doc_fingerprint_rolling(sf_dir: str) -> ray.data.Dataset:
    """uint64 rolling-hash fingerprint (vectorized scale variant, no SQL twin)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.fingerprint_rolling_batch, batch_format="pyarrow")


def doc_winnowing(sf_dir: str) -> ray.data.Dataset:
    """MOSS winnowing fingerprints (Schleimer et al., SIGMOD 2003), md5
    variant: one fingerprint per window of w=4 consecutive k=8-char-gram
    digests — the min, rightmost on ties.  Exact SQL twin (window join +
    ROW_NUMBER).  Scale sibling: doc_winnowing_fast."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.winnowing_batch, batch_format="pyarrow")


def doc_winnowing_fast(sf_dir: str) -> ray.data.Dataset:
    """uint64 rolling-hash winnowing — the vectorized 100-TB default (no SQL
    twin; coverage guarantee + determinism pytest-pinned)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.winnowing_fast_batch, batch_format="pyarrow")


def doc_winnowing_dups(sf_dir: str) -> ray.data.Dataset:
    """MOSS near-dup pairs: exact Jaccard ≥ 0.5 over winnowing fingerprint
    sets (fp-keyed pair exchange + pair-keyed count sum + co-partitioned
    size joins — stages/dedup.py::winnowing_jaccard_pairs).  Exact SQL
    twin; the 4th candidate-generation family next to MinHash bands,
    SimHash bands and IVF buckets."""
    return dd.winnowing_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]))


def doc_token_count_bpe(sf_dir: str) -> ray.data.Dataset:
    """BPE-ish + whitespace token counts (training-budget pass; SQL twin)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.bpe_token_count_batch, batch_format="pyarrow")


def doc_scrub_pii(sf_dir: str) -> ray.data.Dataset:
    """Email/number scrubbing with typed placeholders (SQL twin)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ts.scrub_pii_batch, batch_format="pyarrow")


def doc_simhash(sf_dir: str) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        dd.simhash_batch, batch_format="pyarrow")


def doc_simhash_candidates(sf_dir: str) -> ray.data.Dataset:
    return dd.simhash_candidates(_docs(sf_dir, ["doc_id", "text"]),
                                 max_hamming=8, n_chunks=8)


def doc_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate pairs verified by shingle Jaccard ≥ 0.5.

    Calibration: random same-vocabulary pairs sit at jaccard ≈ 0.17
    (p99 = 0.26) for k=5 char shingles.  The b=16/r=4 banding has its S-curve
    threshold at (1/16)^(1/4) ≈ 0.5 — background pairs become candidates at
    ~1.3% while genuinely overlapping documents pass; a b=32/r=2 profile
    admits ~60% of ALL pairs and melts at scale.

    Verification is fully distributed (signature join, stages/dedup.py) — no
    driver-side corpus dict.  With verify-exact semantics and the corpus's
    bimodal similarity (near-dups ≥ 0.9, background ≤ 0.31), LSH recall at
    the 0.5 threshold is 1 − (1 − 0.9⁴)¹⁶ ≈ 1 − 4e-8, so the result equals
    the exact-Jaccard SQL oracle (pinned in CORRECTNESS)."""
    return dd.minhash_duplicate_pairs(
        _docs(sf_dir, ["doc_id", "text"]), n_hashes=64, bands=16, k_shingle=5,
        jaccard_threshold=0.5)


def doc_length_extremes(sf_dir: str) -> pa.Table:
    """Global max/min text length (the reference's longest-sentence stat,
    to_plain_text.py:41,45 — A6) as a per-batch partial → tiny final reduce."""
    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch.column("text")).cast(pa.int64())
        return pa.table({"mx": pa.array([pc.max(lens).as_py() or 0], pa.int64()),
                         "mn": pa.array([pc.min(lens).as_py() or 0], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({"longest": pa.array([max(p["mx"] for p in parts)], pa.int64()),
                     "shortest": pa.array([min(p["mn"] for p in parts)], pa.int64())})


def doc_prefix_sample(sf_dir: str, n: int = 100) -> ray.data.Dataset:
    """Deterministic prefix sample by id (the reference's 100-row probe,
    corrector_dataset.py:74-79 — O4) with per-row char counts."""
    ds = _docs(sf_dir, ["doc_id", "text"]).sort("doc_id").limit(n)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """Word-3-gram Jaccard near-dup pairs (token-level dedup variant);
    distributed signature-join verification, exact-Jaccard SQL oracle."""
    return dd.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), n_gram=3,
                                  jaccard_threshold=0.3)


def doc_minhash_bucket_stats(sf_dir: str) -> pa.Table:
    """LSH bucket census for the minhash banding — makes the MAX_BUCKET
    oversized-bucket drop in candidate generation observable (no silent
    caps): bucket counts, dropped buckets, dropped candidate pairs."""
    bands_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        dd.minhash_bands_batch, batch_format="pyarrow",
        fn_kwargs=dict(n_hashes=64, bands=16, k_shingle=5))
    return dd.bucket_stats(bands_ds, ["band_id", "band_hash"])


def doc_mutilate(sf_dir: str, good_chars: str = "abcdefghijklmnopqrstuvwxyz ") -> ray.data.Dataset:
    """Keyed noise per doc (reference mutilate semantics, RNG keyed by doc_id)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        out = [mutilate_keyed(str(i), (t or "").strip(), good_chars)
               for i, t in zip(batch.column("doc_id").to_pylist(),
                               batch.column("text").to_pylist())]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "messy": pa.array(out, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def doc_null_corrector_cer(sf_dir: str) -> pa.Table:
    """Null-corrector eval control (reference null_corrector.py:16-42): mean
    banded CER of keyed-noise messy text vs the clean original, + the exact
    perfect fraction.  Single-row result."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def noisy(batch: pa.Table) -> pa.Table:
        messy = [mutilate_keyed(str(i), (t or "").strip(), "abcdefghijklmnopqrstuvwxyz ")
                 for i, t in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist())]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "clean": batch.column("text"),
                         "messy": pa.array(messy, pa.string())})

    scored = ds.map_batches(noisy, batch_format="pyarrow").map_batches(
        add_cer_column, batch_format="pyarrow",
        fn_kwargs=dict(out_col="messy", correct_col="clean", banded=True,
                       skip_empty_correct=True))

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("cer").drop_null()
        return pa.table({"n": pa.array([len(col)], pa.int64()),
                         "total": pa.array([pc.sum(col).as_py() or 0.0], pa.float64()),
                         "perfect": pa.array(
                             [pc.sum(pc.equal(col, 0.0).cast(pa.int64())).as_py() or 0],
                             pa.int64())})

    parts = scored.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    total = sum(p["total"] for p in parts)
    perfect = sum(p["perfect"] for p in parts)
    return pa.table({"n": pa.array([n], pa.int64()),
                     "mean_cer": pa.array([total / n if n else 0.0], pa.float64()),
                     "percent_perfect": pa.array([perfect / n if n else 0.0], pa.float64())})


def doc_markup_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """S1/M1/M2 parity: render each doc as srWaC-style vertical markup
    (4-field token lines inside <s>…</s>), parse it back with the markup state
    machine, detokenize → must equal the single-space-joined tokens."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def render(batch: pa.Table) -> pa.Table:
        blobs = []
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            lines = ["<s>"]
            for w in toks:
                lines.append(f"{w}\t{w.upper()}\tX\t0")  # surface + 3 dummy fields
            lines.append("</s>")
            blobs.append("\n".join(lines))
        return pa.table({"path": pc.cast(batch.column("doc_id"), pa.string()),
                         "markup": pa.array(blobs, pa.string())})

    parsed = ds.map_batches(render, batch_format="pyarrow").map_batches(
        markup_to_sentences_batch, batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch.column("path"), pa.int64()),
                         "sentence": batch.column("sentence")})

    return parsed.map_batches(project, batch_format="pyarrow")


def doc_length_quantiles(sf_dir: str) -> pa.Table:
    """Exact discrete quantiles of document length (n_chars): mergeable
    value-histogram partials → coarse-partitioned sum → tiny driver cumsum
    (stages/quantiles.py).  DuckDB ``quantile_disc`` oracle."""
    from ..stages.quantiles import exact_quantiles

    return exact_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars",
                           [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def doc_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Corpus rebalancing: deterministically downsample the majority language
    (en → 25%), keep the rest — md5-id-keyed so the sample is layout- and
    cluster-size-independent with an exact SQL twin (stages/sampling.py)."""
    from ..stages.sampling import stratified_sample

    return stratified_sample(_docs(sf_dir, ["doc_id", "lang"]),
                             fracs={"en": 0.25}, default_frac=1.0,
                             strat_col="lang", id_col="doc_id")


def doc_length_quantiles_by_lang(sf_dir: str) -> pa.Table:
    """Per-language exact length quantiles (grouped mergeable histogram)."""
    from ..stages.quantiles import grouped_exact_quantiles

    return grouped_exact_quantiles(_docs(sf_dir, ["lang", "n_chars"]),
                                   "n_chars", "lang", [0.25, 0.5, 0.75])


def _near_dup_pairs(sf_dir: str) -> ray.data.Dataset:
    """The calibrated MinHash-LSH verified pair set (doc_minhash_pairs) used
    as the edge list for clustering — exact-Jaccard-equal at the 0.5
    threshold (recall analysis in doc_minhash_pairs docstring)."""
    return dd.minhash_duplicate_pairs(
        _docs(sf_dir, ["doc_id", "text"]), n_hashes=64, bands=16, k_shingle=5,
        jaccard_threshold=0.5)


def doc_dup_components(sf_dir: str) -> ray.data.Dataset:
    """Near-dup clusters: verified pair edges contracted to (node, component)
    by alternating large-star/small-star rounds (stages/components.py);
    component = min doc_id.  DuckDB recursive-CTE oracle."""
    from ..stages.components import connected_components

    return connected_components(_near_dup_pairs(sf_dir))


def doc_dedup_near(sf_dir: str) -> ray.data.Dataset:
    """End-to-end near-duplicate dedup: keep the min-id representative of
    each cluster plus all unclustered docs — pairs → connected components →
    co-partitioned anti join (never collected on the driver)."""
    from ..stages.components import near_dedup

    return near_dedup(_docs(sf_dir, ["doc_id"]), _near_dup_pairs(sf_dir))


def doc_dedup_keep_best(sf_dir: str) -> ray.data.Dataset:
    """Near-duplicate dedup keeping each cluster's HIGHEST-QUALITY member
    (quality DESC, doc_id ASC on ties) — the curation variant of
    doc_dedup_near: real web pipelines keep the best page of a dup cluster,
    not the lowest id.  Pairs → components → co-partitioned score join →
    component-keyed winner exchange → anti join; the score table is joined,
    never broadcast."""
    from ..stages.components import near_dedup_by_score

    scores = doc_quality(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "quality"]), batch_format="pyarrow")
    return near_dedup_by_score(_docs(sf_dir, ["doc_id"]),
                               _near_dup_pairs(sf_dir), scores)


def doc_ngram_novelty(sf_dir: str) -> ray.data.Dataset:
    """Per-doc novelty: fraction of its distinct word-5-grams first seen (by
    min doc_id) in this document — the corpus-contribution curation metric.
    One gram-keyed ownership exchange + one doc-keyed partial sum
    (stages/corpusprep.py::ngram_novelty); exact SQL twin."""
    from ..stages import corpusprep as cp

    return cp.ngram_novelty(_docs(sf_dir, ["doc_id", "text"]))


def doc_simhash_md5(sf_dir: str) -> ray.data.Dataset:
    """SimHash with md5 shingle hashes — the SQL-oracle twin of doc_simhash,
    hash-verifying the bit-majority machinery (stages/dedup.py)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        dd.simhash_md5_batch, batch_format="pyarrow")


def doc_top_tokens(sf_dir: str, k: int = 50) -> pa.Table:
    """Global heavy hitters: exact token frequencies (pre-aggregated partials
    → coarse-hash exchange) then per-block local top-k so only ≤ blocks × k
    tiny rows reach the driver merge (the distributed-top-k pattern of
    top_customers).  Deterministic tiebreak (frequency DESC, token ASC)."""
    import pandas as pd

    counts = token_counts(_docs(sf_dir, ["text"]), text_col="text", split=None)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["frequency", "token"],
                              ascending=[False, True]).head(k)

    parts = counts.map_batches(local_topk, batch_format="pandas").take_all()
    if not parts:  # every block empty: sort_values would KeyError on []
        return pa.table({"token": pa.array([], pa.string()),
                         "frequency": pa.array([], pa.int64())})
    top = pd.DataFrame(parts).sort_values(
        ["frequency", "token"], ascending=[False, True]).head(k)
    return pa.table({"token": pa.array(top["token"], pa.string()),
                     "frequency": pa.array(top["frequency"], pa.int64())})


def doc_token_distinct(sf_dir: str) -> pa.Table:
    """Exact global distinct-token count: the token exchange's output row
    count (no extra pass).  The HLL sketch below is its shuffle-free scale
    twin."""
    counts = token_counts(_docs(sf_dir, ["text"]), text_col="text", split=None)
    return pa.table({"n_tokens": pa.array([counts.count()], pa.int64())})


def doc_token_distinct_hll(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate distinct tokens via mergeable HyperLogLog registers
    (stages/sketches.py): per-block register arrays → driver max-merge; NO
    shuffle, fixed 2^p bytes per block.  Accuracy vs the exact twin is
    pytest-pinned (~1.6% at p=12)."""
    from ..stages.sketches import hll_distinct

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            batch.column("text").combine_chunks()))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"token": toks})

    tokens = _docs(sf_dir, ["text"]).map_batches(explode,
                                                 batch_format="pyarrow")
    return hll_distinct(tokens, "token", p=p)


def doc_percentile_filter(sf_dir: str, q: float = 0.25) -> ray.data.Dataset:
    """Two-pass corpus filter: exact length quantile (mergeable histogram →
    tiny driver threshold) broadcast into a row-filter-pushdown re-read —
    drop the shortest q of the corpus.  The aggregate→broadcast→filter shape
    every quality-threshold pipeline uses at scale."""
    from ..stages.quantiles import exact_quantiles

    t = exact_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars", [q])
    threshold = int(t.column("value")[0].as_py())
    return _docs(sf_dir, ["doc_id", "n_chars"]) \
        .filter(expr=f"n_chars >= {threshold}")


def doc_simhash_candidates_md5(sf_dir: str) -> ray.data.Dataset:
    """SimHash banding + hamming verify over the md5 signature kernel — the
    SQL-oracle twin of doc_simhash_candidates, hash-verifying the chunk
    bucketing and vectorized hamming machinery end-to-end."""
    return dd.simhash_candidates(_docs(sf_dir, ["doc_id", "text"]),
                                 max_hamming=8, n_chunks=8,
                                 sig_batch_fn=dd.simhash_md5_batch)


def _filter_by_split_remainder(ds: ray.data.Dataset,
                               keep_remainders: tuple[int, ...]
                               ) -> ray.data.Dataset:
    """Vectorized doc_id%10 split filter (reference split mapping: 9→val,
    0→test, else train — pipelines/corpus.py::pick_split)."""

    def f(batch: pa.Table) -> pa.Table:
        rem = batch.column("doc_id").to_numpy() % 10
        return batch.filter(pa.array(np.isin(rem, keep_remainders)))

    return ds.map_batches(f, batch_format="pyarrow")


def doc_repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style word-level repetition statistics per document
    (stages/corpusprep.py) — pure vectorized map, exact SQL twin."""
    from ..stages import corpusprep as cp

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        cp.repetition_stats_batch, batch_format="pyarrow")


def doc_repetition_filter(sf_dir: str) -> ray.data.Dataset:
    """Repetition-based quality filter: keep documents under the duplicate-
    2-gram and top-word-fraction ceilings (thresholds sit at ≈p75/p85 of the
    synthetic corpus so the filter genuinely splits it)."""
    stats = doc_repetition_stats(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.less_equal(batch.column("dup_2gram_frac"), 0.05),
                       pc.less_equal(batch.column("top_word_frac"), 0.12))
        return batch.filter(mask).select(["doc_id"])

    return stats.map_batches(keep, batch_format="pyarrow")


def doc_contamination(sf_dir: str, n_gram: int = 5) -> ray.data.Dataset:
    """Benchmark decontamination: score every non-test document's word-5-gram
    overlap against the test split's distinct grams.

    Scale shape: the benchmark side is SMALL by definition (a curated eval
    suite), so its distinct grams are collected once and broadcast via
    ``ray.put`` (read per actor in ``ContaminationStage.__init__``) — a
    broadcast membership join, not a shuffle.  The corpus side streams."""
    import ray

    from ..stages import corpusprep as cp

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench_parts = _filter_by_split_remainder(docs, (0,)).map_batches(
        cp.distinct_grams_batch, batch_format="pyarrow",
        fn_kwargs=dict(n_gram=n_gram))
    uniq: set[str] = set()
    for b in bench_parts.iter_batches(batch_format="pyarrow"):
        uniq.update(b.column("gram").to_pylist())
    bench_ref = ray.put(pa.array(sorted(uniq), pa.string()))
    scored = _filter_by_split_remainder(docs, (1, 2, 3, 4, 5, 6, 7, 8, 9))
    return scored.map_batches(
        cp.ContaminationStage, batch_format="pyarrow",
        fn_constructor_kwargs=dict(bench_ref=bench_ref, n_gram=n_gram),
        batch_size=256, concurrency=(1, 4), num_cpus=1)


def doc_contamination_joined(sf_dir: str, n_gram: int = 5) -> ray.data.Dataset:
    """Distributed (gram-keyed exchange) contamination scoring — the scale
    twin of doc_contamination for when the benchmark side is too big to
    broadcast.  Same semantics, same SQL oracle, no driver materialization."""
    from ..stages import corpusprep as cp

    return cp.contamination_joined(_docs(sf_dir, ["doc_id", "text"]),
                                   n_gram=n_gram)


def doc_token_familiarity(sf_dir: str) -> ray.data.Dataset:
    """Unigram-LM familiarity scoring: mean train-split token frequency +
    OOV count per document.  The train vocabulary is built with the
    pre-aggregated token exchange (pipelines/corpus.py::token_counts) and
    broadcast once (the dictionary-corrector small-side pattern)."""
    import ray

    from ..stages import corpusprep as cp

    docs = _docs(sf_dir, ["doc_id", "text"])
    train = _filter_by_split_remainder(docs, (1, 2, 3, 4, 5, 6, 7, 8))
    counts = token_counts(train, text_col="text", split=None)
    toks: list[str] = []
    freqs: list[int] = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        toks.extend(b.column("token").to_pylist())
        freqs.extend(b.column("frequency").to_pylist())
    order = np.argsort(np.array(toks, dtype=object))
    vocab_ref = ray.put((pa.array(np.array(toks, dtype=object)[order], type=pa.string()),
                         np.array(freqs, dtype=np.int64)[order]))
    return docs.map_batches(
        cp.FamiliarityStage, batch_format="pyarrow",
        fn_constructor_kwargs=dict(vocab_ref=vocab_ref),
        batch_size=256, concurrency=(1, 4), num_cpus=1)


def doc_lang_weights(sf_dir: str, alpha: float = 0.5) -> ray.data.Dataset:
    """Temperature sampling weights for corpus mixing: per-language counts →
    w_lang = cnt^alpha / Σ cnt^alpha → per-doc weight w_lang / cnt, rounded
    to 6 dp (the SQL twin rounds identically).  Counts are per-batch partials
    merged on the driver (≤ #languages rows); the weight map is a tiny
    broadcast into a vectorized map — no shuffle anywhere."""
    from ..stages.corpusprep import temperature_weights

    docs = _docs(sf_dir, ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("lang").value_counts()
        return pa.table({"lang": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    merged: dict[str, int] = {}
    for b in docs.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for lang, cnt in zip(b.column("lang").to_pylist(),
                             b.column("n").to_pylist()):
            merged[lang] = merged.get(lang, 0) + cnt
    w = temperature_weights(merged, alpha=alpha)
    langs = sorted(merged)
    weight_arr = np.round(np.array([w[lang] / merged[lang] for lang in langs]),
                          6)
    lang_vals = pa.array(langs, pa.string())

    def apply(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("lang"), value_set=lang_vals) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "doc_weight": pa.array(weight_arr[idx], pa.float64())})

    return docs.map_batches(apply, batch_format="pyarrow")


def doc_span_dedup(sf_dir: str, k: int = 8) -> ray.data.Dataset:
    """Cross-document exact span dedup (stages/spandedup.py): remove every
    word-k-gram occurring in ≥2 documents except the copy in the lowest
    doc_id, and rebuild each document from its surviving words.  Two coarse
    exchanges (gram-keyed removal detection, doc-keyed reconstruction); exact
    DuckDB twin hash-matches clean_text itself.  String gram keys — the
    SQL-expressible twin of the hashed default below."""
    from ..stages.spandedup import span_dedup

    return span_dedup(_docs(sf_dir, ["doc_id", "text"]), k=k, hash_grams=False)


def doc_span_dedup_hashed(sf_dir: str, k: int = 8) -> ray.data.Dataset:
    """The scale default of ``doc_span_dedup``: the removal exchange is keyed
    on the 128-bit gram hash (16 bytes/occurrence instead of the ~50-byte
    string — measured ~4× fewer exchange bytes).  Output is identical to the
    string twin (collisions ~n²/2¹²⁹), so the SAME DuckDB oracle
    hash-verifies this path too."""
    from ..stages.spandedup import span_dedup

    return span_dedup(_docs(sf_dir, ["doc_id", "text"]), k=k, hash_grams=True)


def doc_pack_assignments(sf_dir: str, budget: int = 512) -> ray.data.Dataset:
    """Sequence packing (stages/packing.py): documents laid end-to-end in
    doc_id order are assigned to fixed-word-budget training packs via the
    distributed exclusive prefix sum — SQL twin is a window SUM."""
    from ..stages.packing import pack_assignments
    from ..stages.textstats import _split_words

    def wc(batch: pa.Table) -> pa.Table:
        _, counts = _split_words(batch.column("text").combine_chunks())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_words": pa.array(counts, pa.int64())})

    stats = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        wc, batch_format="pyarrow")
    return pack_assignments(stats, "doc_id", "n_words", budget=budget)


def doc_corpus_prep(sf_dir: str, *, contamination_max: float = 0.2,
                    pack_budget: int = 512) -> ray.data.Dataset:
    """End-to-end training-corpus preparation — the composed RefinedWeb-style
    flow as ONE lazy Ray pipeline, emitting the final training manifest
    (doc_id, n_words, pack_id):

    1. repetition quality filter (Gopher ceilings — doc_repetition_filter);
    2. exact dedup winners (min doc_id per md5 — doc_dedup_exact);
    3. near-dup survivors (LSH pairs → connected components → anti join —
       doc_dedup_near);
    4. benchmark decontamination (hit_frac ≤ ``contamination_max``; the test
       split itself is excluded by construction — doc_contamination);
    5. sequence packing of the survivors in doc_id order (stages/packing.py).

    Every keep-set is a Dataset of doc_ids; survivors are computed with
    co-partitioned SEMI joins (stages/joins.py — only the key crosses each
    exchange), never collected on the driver.  The composed DuckDB twin
    hash-matches the full manifest."""
    from ..stages.joins import hash_join
    from ..stages.packing import pack_assignments
    from ..stages.textstats import _split_words

    def wc(batch: pa.Table) -> pa.Table:
        _, counts = _split_words(batch.column("text").combine_chunks())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_words": pa.array(counts, pa.int64())})

    surv = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        wc, batch_format="pyarrow")

    def ids_only(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(lambda t: t.select(["doc_id"]),
                              batch_format="pyarrow")

    def not_contaminated(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch.column("hit_frac"),
                                          contamination_max)) \
            .select(["doc_id"])

    keeps = [
        doc_repetition_filter(sf_dir),
        ids_only(doc_dedup_exact(sf_dir)),
        doc_dedup_near(sf_dir),
        doc_contamination(sf_dir).map_batches(not_contaminated,
                                              batch_format="pyarrow"),
    ]
    # each keep-set and each semi-join result is pinned (materialize +
    # coalesce, components._pin): the four keep pipelines each end in
    # grouped exchanges, and chaining them lazily into ONE plan multiplies
    # per-block exchange task overheads (the incremental-ingest lesson in
    # BASELINE.md) — measured 258 s → ~60 s at sf0.1/32cpus.  Keep-sets are
    # doc_id-only rows; the object store holds (and can spill) them.  The
    # four keep pipelines are independent, so they materialize concurrently
    # from driver threads (each owns its own Ray Data execution) instead of
    # serializing four cluster-wide passes.
    from concurrent.futures import ThreadPoolExecutor

    from ..stages.components import _pin

    with ThreadPoolExecutor(max_workers=len(keeps)) as ex:
        pinned = list(ex.map(lambda k: _pin(k, 16), keeps))
    for k in pinned:
        surv = _pin(hash_join(surv, k, on="doc_id", how="semi"), 16)
    return pack_assignments(surv, "doc_id", "n_words", budget=pack_budget,
                            pack_col="pack_id")


def doc_rank_by_length(sf_dir: str) -> ray.data.Dataset:
    """Global ROW_NUMBER over the corpus ordered by (n_chars, doc_id) —
    histogram base offsets + ONE value-keyed exchange, no global sort
    (stages/quantiles.py::global_rank)."""
    from ..stages.quantiles import global_rank

    return global_rank(_docs(sf_dir, ["doc_id", "n_chars"]),
                       "n_chars", "doc_id")


_SHUFFLE_SEED = 0x51AFF  # doc_shuffle_order's fast-path hash seed


def doc_shuffle_order(sf_dir: str, *,
                      hash_fn: str = "fast") -> ray.data.Dataset:
    """Deterministic global training shuffle: every document's position in a
    pseudorandom permutation, computed as ROW_NUMBER over hash(doc_id) with NO
    global sort — the 16-bit hash prefix is the bounded histogram domain for
    global_rank's base offsets, and the remaining hash bits break ties inside
    a prefix bucket.  The standard "shuffle once, shard deterministically"
    step of an LLM training data pipeline; the hash is reproducible across
    runs/machines/block layouts (unlike seeded RNG state tied to layout).

    ``hash_fn="fast"`` (DEFAULT): one vectorized splitmix64 mix of the int64
    id column — no per-row Python on the scan.  ``hash_fn="md5"``: the
    SQL-oracle twin (md5 is the only hash DuckDB shares; hex-lexicographic ==
    numeric on the prefix, so engine and SQL agree) — per-row hashlib on a
    short string, kept ONLY for driver verification."""
    from ..stages.quantiles import global_rank

    if hash_fn == "fast":
        from ..functions.hashing import hash_u64_array

        def h(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
                       .astype(np.uint64)
            hv = hash_u64_array(ids, seed=_SHUFFLE_SEED)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "h16": pa.array((hv >> np.uint64(48)).astype(np.int64)),
                "h_rest": pa.array(
                    (hv & np.uint64((1 << 48) - 1)).astype(np.int64)),
            })

        tie = ["h_rest"]
    elif hash_fn == "md5":
        import hashlib

        def h(batch: pa.Table) -> pa.Table:
            hx = [hashlib.md5(str(i).encode()).hexdigest()
                  for i in batch.column("doc_id").to_pylist()]
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "h16": pa.array([int(x[:4], 16) for x in hx], pa.int64()),
                "hash_hex": pa.array(hx, pa.string()),
            })

        tie = ["hash_hex"]
    else:
        raise ValueError(f"doc_shuffle_order: unknown hash_fn={hash_fn!r}")

    ranked = global_rank(
        _docs(sf_dir, ["doc_id"]).map_batches(h, batch_format="pyarrow"),
        "h16", "doc_id", tie_cols=tie, rank_col="shuffle_rank")
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "shuffle_rank"]), batch_format="pyarrow")


def doc_chunk_windows(sf_dir: str, win: int = 64,
                      stride: int = 32) -> ray.data.Dataset:
    """Fixed-word-window document chunking with overlap (the training
    context-window shape: each doc → ceil(n_words/stride) windows of up to
    ``win`` words starting every ``stride`` words; the tail window is
    partial).  Pure flat-map — no shuffle; empty docs emit nothing.

    Vectorized end-to-end: one Arrow whitespace split per batch, window word
    indices built with repeat/cumsum arithmetic, chunk texts re-joined with
    ``binary_join`` over a take-gathered flat word array (windows overlap, so
    the flat array cannot be list-wrapped in place)."""
    from ..stages.textstats import _split_words

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_idx": pa.array([], pa.int64()),
                          "chunk_start": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string()),
                          "chunk_n_words": pa.array([], pa.int64())})
        texts = batch.column("text").combine_chunks()
        flat, counts = _split_words(texts)
        n_chunks = -(-counts // stride)            # ceil; 0 words → 0 chunks
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        doc_off = np.concatenate(([0], np.cumsum(counts)))[:-1]
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
        chunk_off = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        cidx = np.arange(total, dtype=np.int64) - np.repeat(chunk_off, n_chunks)
        start = cidx * stride
        length = np.minimum(win, counts[rows] - start)
        # gather every window's word indices into one flat take
        lens_off = np.concatenate(([0], np.cumsum(length)))[:-1]
        abs_start = doc_off[rows] + start
        idx = (np.arange(int(length.sum()), dtype=np.int64)
               - np.repeat(lens_off, length) + np.repeat(abs_start, length))
        words = flat.take(pa.array(idx))
        offsets = np.concatenate(([0], np.cumsum(length))).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), words), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[rows], pa.int64()),
                         "chunk_idx": pa.array(cidx, pa.int64()),
                         "chunk_start": pa.array(start, pa.int64()),
                         "chunk_text": joined,
                         "chunk_n_words": pa.array(length, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def doc_idf(sf_dir: str) -> ray.data.Dataset:
    """Per-token document frequency + inverse document frequency over the
    corpus (the rare-token signal quality filters weight by).

    Shape: per-batch DISTINCT (doc, token) pairs collapse to partial
    df counts (a doc never spans batches, so partials sum exactly), ONE
    coarse-hash token exchange sums them, idf = round(ln(N/df), 6) with N
    read from parquet metadata (no data pass)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ..stages.shuffle import grouped_agg
    from ..stages.textstats import _split_words

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _docs(sf_dir, ["text"])

    def partial_df(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        flat, counts = _split_words(texts)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        d = pd.DataFrame({"row": rows,
                          "token": flat.to_numpy(zero_copy_only=False)})
        cnt = d.drop_duplicates()["token"].value_counts().sort_index()
        return pa.table({"token": pa.array(cnt.index.to_numpy(dtype=object),
                                           pa.string()),
                         "df": pa.array(cnt.to_numpy(), pa.int64())})

    summed = grouped_agg(ds.map_batches(partial_df, batch_format="pyarrow"),
                         ["token"], {"df": ("df", "sum")})

    def add_idf(batch: pa.Table) -> pa.Table:
        df = batch.column("df").to_numpy().astype(np.float64)
        idf = np.round(np.log(float(n_docs) / df), 6)
        return batch.append_column("idf", pa.array(idf, pa.float64()))

    return summed.map_batches(add_idf, batch_format="pyarrow")


def _doc_token_pairs(batch: pa.Table, *, counted: bool) -> pa.Table:
    """(doc_id, token[, tf]) rows for the batch — distinct pairs when
    ``counted`` is False, with per-doc term frequency when True.  One Arrow
    whitespace split + one vectorized pandas groupby per batch."""
    import pandas as pd

    from ..stages.textstats import _split_words

    texts = batch.column("text").combine_chunks()
    flat, counts = _split_words(texts)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rows = np.repeat(ids, counts)
    d = pd.DataFrame({"doc_id": rows,
                      "token": flat.to_numpy(zero_copy_only=False)})
    if counted:
        g = d.groupby(["doc_id", "token"], as_index=False, sort=True).size()
        return pa.table({"doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                         "token": pa.array(g["token"].to_numpy(dtype=object),
                                           pa.string()),
                         "tf": pa.array(g["size"].to_numpy(), pa.int64())})
    u = d.drop_duplicates().sort_values(["doc_id", "token"])
    return pa.table({"doc_id": pa.array(u["doc_id"].to_numpy(), pa.int64()),
                     "token": pa.array(u["token"].to_numpy(dtype=object),
                                       pa.string())})


def doc_tfidf_top_terms(sf_dir: str, top: int = 3) -> ray.data.Dataset:
    """Each document's ``top`` highest-tf·idf terms (ties → token ASC) — the
    classic keyword-extraction shape, composed from engine primitives: per-doc
    term frequencies (map_batches), the corpus idf table (doc_idf), a
    co-partitioned fact-fact hash join on token (stages/joins.py — both sides
    are token-cardinality, neither fits a broadcast), and a grouped per-doc
    top-k.  tfidf = round(tf · idf, 6) with idf pre-rounded, mirroring the
    SQL twin exactly."""
    import pandas as pd

    from ..stages.joins import hash_join
    from ..stages.shuffle import grouped_apply

    from ..stages.components import _pin

    tf = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _doc_token_pairs(b, counted=True), batch_format="pyarrow")
    # idf is token-cardinality (small next to tf) and ends in a grouped
    # exchange — pin it so the join exchange doesn't chain onto a deep plan
    idf = _pin(doc_idf(sf_dir).map_batches(
        lambda t: t.select(["token", "idf"]), batch_format="pyarrow"), 16)
    joined = hash_join(tf, idf, on="token", how="inner")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "term_rank": pd.Series([], dtype="int64"),
                                 "token": pd.Series([], dtype="object"),
                                 "tf": pd.Series([], dtype="int64"),
                                 "tfidf": pd.Series([], dtype="float64")})
        df = df.assign(tfidf=np.round(df["tf"].to_numpy() * df["idf"].to_numpy(), 6))
        df = df.sort_values(["doc_id", "tfidf", "token"],
                            ascending=[True, False, True], kind="mergesort")
        rnk = df.groupby("doc_id").cumcount().to_numpy() + 1
        df = df.assign(term_rank=rnk.astype(np.int64))
        df = df[df["term_rank"] <= top]
        return df[["doc_id", "term_rank", "token", "tf", "tfidf"]]

    return grouped_apply(joined, ["doc_id"], topk)


def doc_inverted_index(sf_dir: str) -> ray.data.Dataset:
    """Token → sorted posting list (comma-joined doc_ids) + document
    frequency — the search-index build shape.  Distinct (doc, token) pairs
    per batch, ONE coarse token exchange, per-partition sort + groupby join.
    The posting string is the op's output (the exchange inherently moves
    every pair once); at 100 TB postings would be chunked per token range and
    written columnar instead of strings."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    pairs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _doc_token_pairs(b, counted=False), batch_format="pyarrow")

    def build(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype="object")})
        df = df.drop_duplicates().sort_values(["token", "doc_id"])
        g = df.groupby("token", sort=True)
        out = g.agg(df_=("doc_id", "size"),
                    postings=("doc_id", lambda s: ",".join(map(str, s))))
        return pd.DataFrame({"token": out.index.to_numpy(dtype=object),
                             "df": out["df_"].to_numpy().astype(np.int64),
                             "postings": out["postings"].to_numpy(dtype=object)})

    return grouped_apply(pairs, ["token"], build)


def doc_source_cap(sf_dir: str, cap: int = 20) -> ray.data.Dataset:
    """Per-domain document cap (the C4/RefinedWeb "max N pages per host"
    composition rule): keep each source's ``cap`` lowest doc_ids.

    Grouped top-k shape (stages/shuffle.py::grouped_apply): ONE coarse
    hash-partitioned exchange on source, vectorized sort + cumcount inside
    each partition, ≤ cap rows per source survive — source cardinality never
    becomes Ray group count, and the deterministic rank order (doc_id ASC)
    matches the ROW_NUMBER oracle exactly."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    docs = _docs(sf_dir, ["doc_id", "source"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        rnk = df.groupby("source").cumcount().to_numpy() + 1
        out = df.assign(source_rank=rnk.astype(np.int64))
        return out[out["source_rank"] <= cap]

    return grouped_apply(docs, ["source"], topk)


def doc_length_ntile(sf_dir: str, n: int = 8) -> ray.data.Dataset:
    """NTILE(n) OVER (ORDER BY n_chars, doc_id): equal-height length buckets
    for stratified curriculum/sharding, WITHOUT a global sort — reuses the
    histogram-offset global ROW_NUMBER (stages/quantiles.py::global_rank)
    plus the exact SQL NTILE size rule applied vectorized per partition:
    with t rows and q, r = divmod(t, n), the first r buckets hold q+1 rows
    and the rest hold q (rank→bucket is closed-form, so no second pass).

    The row total comes from parquet metadata (O(1) driver-side), never a
    dataset count pass."""
    import pyarrow.parquet as pq

    from ..stages.quantiles import global_rank

    total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    q, r = divmod(total, n)
    ranked = global_rank(_docs(sf_dir, ["doc_id", "n_chars"]),
                         "n_chars", "doc_id")

    def bucketize(batch: pa.Table) -> pa.Table:
        rank = batch.column("rank").to_numpy().astype(np.int64)
        qq = max(q, 1)  # total < n → every bucket has ≤1 row, first branch wins
        bucket = np.where(
            rank <= r * (q + 1),
            (rank - 1) // (q + 1),
            r + (rank - 1 - r * (q + 1)) // qq) + 1
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": batch.column("n_chars"),
                         "bucket": pa.array(bucket, pa.int64())})

    return ranked.map_batches(bucketize, batch_format="pyarrow")


def doc_quality_tiers(sf_dir: str, n: int = 3) -> ray.data.Dataset:
    """Per-language quality tiers — NTILE(n) OVER (PARTITION BY lang ORDER BY
    quality, doc_id) over the composite quality score: the CCNet head/middle/
    tail corpus bucketing (Wenzek et al. 2020, with the repo's C4/Gopher
    composite from stages/textstats.py::quality_score_batch standing in for
    the LM-perplexity score this container can't train).

    Implementation (histogram-offset rank, no global or per-language sort —
    a language is a giant key at 100 TB) lives in stages/tiers.py::
    quality_tiers, shared with the flagship extraction-output tiering
    (flagship_tiered); this wrapper binds it to the documents table."""
    from ..stages.tiers import quality_tiers

    return quality_tiers(_docs(sf_dir, ["doc_id", "text", "lang"]),
                         id_col="doc_id", n=n)


def doc_bigram_pmi(sf_dir: str, min_count: int = 5) -> ray.data.Dataset:
    """Pointwise mutual information of adjacent word pairs (collocation
    mining — the phrase-detection shape from word2vec preprocessing), exact
    and fully distributed: bigram and unigram counts each pre-combine per
    batch and cross ONE coarse token-keyed exchange; the corpus totals are
    tiny sums over the two pinned count tables; marginals attach via two
    co-partitioned fact-fact hash joins (token cardinality on both sides —
    no broadcast); pmi evaluates vectorized per batch from broadcast scalar
    totals.  pmi = round(ln((c_xy/B) / ((c_x/T)·(c_y/T))), 6) with T = total
    tokens, B = total bigrams.
    """
    import pandas as pd

    from ..stages.components import _pin
    from ..stages.joins import hash_join
    from ..stages.shuffle import grouped_agg
    from ..stages.textstats import _split_words

    docs = _docs(sf_dir, ["text"])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        flat, counts = _split_words(texts)
        toks = flat.to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(toks) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_xy": pa.array([], pa.int64())})
        same = rows[1:] == rows[:-1]  # adjacency never crosses documents
        d = pd.DataFrame({"w1": toks[:-1][same], "w2": toks[1:][same]})
        g = d.groupby(["w1", "w2"], as_index=False).size() \
             .rename(columns={"size": "c_xy"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def unigram_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        flat, _ = _split_words(texts)
        cnt = pd.Series(flat.to_numpy(zero_copy_only=False)) \
            .value_counts().sort_index()
        return pa.table({"token": pa.array(cnt.index.to_numpy(dtype=object),
                                           pa.string()),
                         "c": pa.array(cnt.to_numpy(), pa.int64())})

    bc = _pin(grouped_agg(docs.map_batches(bigram_partial, batch_format="pyarrow"),
                          ["w1", "w2"], {"c_xy": ("c_xy", "sum")}), 16)
    uc = _pin(grouped_agg(docs.map_batches(unigram_partial, batch_format="pyarrow"),
                          ["token"], {"c": ("c", "sum")}), 16)
    t_uni = float(uc.sum("c"))
    t_bi = float(bc.sum("c_xy"))

    # Arrow-kernel filter (filter(expr=…) can't type pandas object blocks
    # coming out of the pinned grouped exchange)
    import pyarrow.compute as pc

    bc_f = bc.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c_xy"), min_count)),
        batch_format="pyarrow")
    u1 = uc.map_batches(lambda t: t.rename_columns(["w1", "c1"]),
                        batch_format="pyarrow")
    u2 = uc.map_batches(lambda t: t.rename_columns(["w2", "c2"]),
                        batch_format="pyarrow")
    j = hash_join(hash_join(bc_f, u1, on="w1"), u2, on="w2")

    def add_pmi(batch: pa.Table) -> pa.Table:
        c_xy = batch.column("c_xy").to_numpy().astype(np.float64)
        c1 = batch.column("c1").to_numpy().astype(np.float64)
        c2 = batch.column("c2").to_numpy().astype(np.float64)
        pmi = np.round(np.log((c_xy / t_bi)
                              / ((c1 / t_uni) * (c2 / t_uni))), 6)
        return pa.table({"w1": batch.column("w1"), "w2": batch.column("w2"),
                         "c_xy": batch.column("c_xy"),
                         "pmi": pa.array(pmi, pa.float64())})

    return j.map_batches(add_pmi, batch_format="pyarrow")


def doc_length_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """PERCENT_RANK() OVER (ORDER BY n_chars, doc_id) — the normalized-rank
    window over the whole corpus WITHOUT a global sort: histogram-offset
    global ROW_NUMBER (stages/quantiles.py::global_rank, one value-keyed
    exchange) and the closed-form (rank-1)/(N-1) applied vectorized per
    block; N comes from parquet metadata.  The full ordering is unique
    (doc_id tiebreak), so RANK ≡ ROW_NUMBER on both sides."""
    import pyarrow.parquet as pq

    from ..stages.quantiles import global_rank

    total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ranked = global_rank(_docs(sf_dir, ["doc_id", "n_chars"]),
                         "n_chars", "doc_id")

    def add_pr(batch: pa.Table) -> pa.Table:
        rank = batch.column("rank").to_numpy().astype(np.float64)
        pr = (rank - 1.0) / float(total - 1)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chars": batch.column("n_chars"),
                         "pr": pa.array(pr, pa.float64())})

    return ranked.map_batches(add_pr, batch_format="pyarrow")


def doc_heavy_hitters(sf_dir: str, k: int = 256) -> pa.Table:
    """Misra–Gries heavy-hitter tokens (shuffle-free approximate twin of
    doc_top_tokens, as hll is to exact distinct): ≤ k-entry counter summary
    per block, tiny driver merge.  Guarantee pinned in pytest: every token
    with true frequency > N/k is present with estimate within N/k."""
    import pandas as pd  # noqa: F401  (sketch returns a DataFrame)

    from ..stages.sketches import mg_heavy_hitters
    from ..stages.textstats import _split_words

    def tokens_of(batch: pa.Table):
        flat, _ = _split_words(batch.column("text").combine_chunks())
        return flat.to_numpy(zero_copy_only=False)

    out = mg_heavy_hitters(_docs(sf_dir, ["text"]), tokens_of, k=k)
    return pa.Table.from_pandas(out, preserve_index=False)


def doc_token_entropy(sf_dir: str) -> ray.data.Dataset:
    """Shannon entropy of each document's token distribution (the repetition
    /diversity quality signal next to doc_repetition_stats) — entirely
    batch-local, NO shuffle: one Arrow whitespace split, one vectorized
    (row, token) groupby, and a per-row -Σ p·ln p via np.add.reduceat.
    Zero-token documents are omitted (mirrors the SQL twin, where they never
    enter the unnest).  round-6 output absorbs summation-order ulps."""
    import pandas as pd

    from ..stages.textstats import _split_words

    ds = _docs(sf_dir, ["doc_id", "text"])

    def entropy(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        flat, counts = _split_words(texts)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = np.repeat(ids, counts)
        if len(rows) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64())})
        d = pd.DataFrame({"doc_id": rows,
                          "token": flat.to_numpy(zero_copy_only=False)})
        g = d.groupby(["doc_id", "token"], sort=True, as_index=False).size()
        doc = g["doc_id"].to_numpy()
        c = g["size"].to_numpy(np.float64)
        # row totals per doc (g is sorted by doc_id)
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        totals = np.add.reduceat(c, starts)
        n = np.repeat(totals, np.diff(np.r_[starts, len(c)]))
        p = c / n
        terms = p * np.log(p)
        h = -np.add.reduceat(terms, starts)
        return pa.table({"doc_id": pa.array(doc[starts], pa.int64()),
                         "entropy": pa.array(np.round(h, 6), pa.float64())})

    return ds.map_batches(entropy, batch_format="pyarrow")


_MIX_SEED = 0x311C5  # doc_mix_materialize's fast-path hash seed


def doc_mix_materialize(sf_dir: str, alpha: float = 0.5, *,
                        hash_fn: str = "fast") -> ray.data.Dataset:
    """MATERIALIZED temperature mix: each document is emitted ``r`` times,
    where r = per-doc weight (doc_lang_weights' round-6 discipline) × corpus
    size — upsampled rare languages repeat ⌊r⌋ or ⌈r⌉ times, downsampled
    common ones keep a ⌊r⌋=0 + Bernoulli(frac) residual.  The residual coin
    is a DETERMINISTIC 48-bit hash of the doc id (reproducible across runs,
    block layouts and cluster sizes — never seeded RNG), compared against a
    per-group threshold.  ``hash_fn="fast"`` (DEFAULT) draws the coin from
    one vectorized splitmix64 mix of the id column; ``hash_fn="md5"`` is the
    SQL-oracle twin (the twin compares the same md5 prefix against the same
    threshold rendered in hex) — per-row hashlib, kept ONLY for driver
    verification.  Flat-map shape: no shuffle, output ~N rows regardless of
    the mix."""
    import hashlib

    from ..functions.hashing import hash_u64_array
    from ..stages.corpusprep import temperature_weights

    if hash_fn not in ("fast", "md5"):
        raise ValueError(f"doc_mix_materialize: unknown hash_fn={hash_fn!r}")

    docs = _docs(sf_dir, ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("lang").value_counts()
        return pa.table({"lang": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    merged: dict[str, int] = {}
    for b in docs.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for lang, cnt in zip(b.column("lang").to_pylist(),
                             b.column("n").to_pylist()):
            merged[lang] = merged.get(lang, 0) + cnt
    n_total = sum(merged.values())
    w = temperature_weights(merged, alpha=alpha)
    langs = sorted(merged)
    # r from the 6-dp per-doc weight (bit-reproducible in SQL); threshold is
    # the 48-bit integer floor(frac(r) * 16^12)
    r = np.array([round(w[lang] / merged[lang], 6) for lang in langs]) * n_total
    base_arr = np.floor(r).astype(np.int64)
    thr_arr = np.floor((r - base_arr) * float(16**12)).astype(np.int64)
    lang_vals = pa.array(langs, pa.string())

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = pc.index_in(batch.column("lang"), value_set=lang_vals) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if hash_fn == "fast":
            pref = (hash_u64_array(ids.astype(np.uint64), seed=_MIX_SEED)
                    >> np.uint64(16)).astype(np.int64)
        else:
            pref = np.array(
                [int(hashlib.md5(f"{i}:mix".encode()).hexdigest()[:12], 16)
                 for i in ids], dtype=np.int64)
        n = base_arr[idx] + (pref < thr_arr[idx])
        rep = np.repeat(np.arange(len(ids)), n)
        ends = np.cumsum(n)
        copy_id = np.arange(int(ends[-1]) if len(ends) else 0) \
            - np.repeat(ends - n, n) + 1
        return pa.table({
            "doc_id": pa.array(ids[rep], pa.int64()),
            "lang": batch.column("lang").take(pa.array(rep)),
            "copy_id": pa.array(copy_id, pa.int64())})

    return docs.map_batches(expand, batch_format="pyarrow")


_WSAMPLE_SEED = 0x35A17  # doc_weighted_sample's fast-path hash seed


def doc_weighted_sample(sf_dir: str, k: int = 32, *,
                        hash_fn: str = "fast") -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each doc draws u ∈ (0,1) from a DETERMINISTIC 48-bit hash of its id and
    competes with key u^(1/w) (w = n_chars) — the k largest keys are an
    exact weighted sample.  Top-k is combine-safe, so per-block local top-k
    partials → tiny driver merge; no shuffle, reproducible across layouts
    and cluster sizes.  ``hash_fn="fast"`` (DEFAULT) draws u from one
    vectorized splitmix64 mix of the id column; ``hash_fn="md5"`` is the
    SQL-oracle twin (the twin computes the identical md5 key expression;
    selection ties would need keys within 1 ulp of each other — the hash
    makes that astronomically unlikely) — per-row hashlib, kept ONLY for
    driver verification."""
    import hashlib

    from ..functions.hashing import hash_u64_array

    if hash_fn not in ("fast", "md5"):
        raise ValueError(f"doc_weighted_sample: unknown hash_fn={hash_fn!r}")
    docs = _docs(sf_dir, ["doc_id", "n_chars"])

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False) \
                 .astype(np.float64)
        if hash_fn == "fast":
            u = (hash_u64_array(ids.astype(np.uint64), seed=_WSAMPLE_SEED)
                 >> np.uint64(16)).astype(np.float64) / float(1 << 48)
        else:
            u = np.array(
                [int(hashlib.md5(f"{i}:ws".encode()).hexdigest()[:12], 16)
                 for i in ids], dtype=np.float64) / float(16**12)
        key = u ** (1.0 / np.maximum(w, 1.0))
        order = np.argsort(-key, kind="stable")[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "n_chars": pa.array(
                             batch.column("n_chars").take(pa.array(order))),
                         "key": pa.array(key[order], pa.float64())})

    parts = docs.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = parts.sort_values(["key", "doc_id"],
                            ascending=[False, True]).head(k)
    return pa.table({"doc_id": pa.array(top["doc_id"].astype("int64")),
                     "n_chars": pa.array(top["n_chars"].astype("int64"))})
