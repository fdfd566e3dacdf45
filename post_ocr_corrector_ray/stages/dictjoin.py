"""Partitioned token-lookup dictionary correction — the unbroadcastable-vocab
twin of the broadcast ``DictionaryCorrector`` actor pool (stages/correct.py).

The broadcast path ``ray.put``s the whole pruned vocabulary once and every
actor scans it locally (reference dictionary_corrector.py:48-106 semantics).
At O(10⁸⁺) distinct tokens the vocabulary stops fitting a single object — this
operator keeps the SAME output (pytest-pinned byte-identity) with the
vocabulary as a DATASET:

1. **tokenize** — ``map_batches``: (id, pos, token) per word occurrence,
   Arrow ``utf8_split_whitespace`` (textstats._split_words; no per-row
   Python), plus one ``pos = -1`` sentinel row per document so empty docs
   survive the rebuild.
2. **membership join** — ONE co-partitioned ``hash_join`` tokens ⋈ vocab on
   the token string ("semi"/"anti" split): in-vocab occurrences pass through
   unchanged; OOV occurrences continue.
3. **distinct OOV tokens** — dedup BEFORE any scoring (the memoization of the
   broadcast path, as dataflow): scoring cost scales with distinct unknown
   words, not occurrences.
4. **sharded nearest-word scan** — the vocabulary is hash-sharded into
   ``vocab_shards`` pieces; each distinct OOV token is replicated once per
   shard (tagged union co-partitioned on the shard id), and each partition
   scores its resident queries against its resident vocab rows with the same
   length-bucketed batched DP the broadcast corrector uses
   (functions/edit_distance.py::edit_distance_batch), emitting one local-best
   candidate per (query, partition).  Exchange volume: |vocab| + |distinct
   OOV| × shards tiny rows — never a query×vocab cross product.
5. **global min-reduce** — one token-keyed ``grouped_apply`` picks each
   query's winner by the TOTAL ORDER the broadcast scan induces:
   ``(score, -freq, |len(cand)-len(query)|, len(cand), cand)`` (bucket visit
   order (|Δlen|, len) + within-bucket lexicographic tiebreak, associative
   across shards — byte-identity holds at any shard count).
6. **rebuild** — corrections join back to OOV occurrences (left join +
   coalesce: an EMPTY vocabulary passes raw tokens through, the broadcast
   path's documented deviation), union with in-vocab rows, ONE id-keyed
   exchange re-joins each document's tokens in ``pos`` order.

``metric="osa"`` (default) is the reference's OSA distance — byte-identical
to ``DictionaryCorrector.correct_sentence``.  ``metric="lev"`` drops the
transposition transition: plain Levenshtein is the only metric DuckDB shares
(its ``damerau_levenshtein`` is the unrestricted variant, not OSA), so the
SQL-oracle twin (__ray_entry__::doc_dictionary_join) runs this variant; the
osa/lev split is the simhash/span-dedup twin discipline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.edit_distance import edit_distance_batch
from .shuffle import distinct_rows, grouped_apply, partitions_for
from .textstats import _split_words


def tokenize_occurrences(ds: ray.data.Dataset, *, id_col: str,
                         text_col: str) -> ray.data.Dataset:
    """(id, pos, token) per word occurrence + one (id, -1, "") sentinel per
    document (so zero-token documents still rebuild to "").  The id column
    keeps its ORIGINAL Arrow type (r5: string urls are first-class doc keys —
    the north_rule's byte-identity contract is per url, so the flagship
    needs no synthetic int key); only float ids are unsupported (the join
    engine's int-through-float64 restore would be ambiguous)."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        flat, counts = _split_words(texts)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = (np.arange(len(flat), dtype=np.int64) - offsets[row_idx])
        sent_tok = pa.array([""] * len(ids), pa.string())
        return pa.table({
            id_col: pa.concat_arrays([ids.take(pa.array(row_idx)), ids]),
            "pos": pa.array(np.concatenate(
                [pos, np.full(len(ids), -1, np.int64)]), pa.int64()),
            "token": pa.concat_arrays(
                [flat.cast(pa.string()), sent_tok])})

    return ds.map_batches(explode, batch_format="pyarrow")


def _scan_partition(df: pd.DataFrame, *, transpositions: bool) -> pd.DataFrame:
    """Local-best candidates for the partition's queries over the partition's
    vocab rows: length buckets nearest-first with the |Δlen| > best early
    exit (the broadcast corrector's prune), each bucket one batched DP."""
    vocab = df[df["_vside"] == 0]
    queries = df[df["_vside"] == 1]["token"].drop_duplicates()
    if vocab.empty or queries.empty:
        return pd.DataFrame({"token": pd.Series([], dtype="string"),
                             "cand": pd.Series([], dtype="string"),
                             "score": pd.Series([], dtype="int64"),
                             "freq": pd.Series([], dtype="int64")})
    buckets: dict[int, tuple[list[str], np.ndarray]] = {}
    vocab = vocab.assign(_len=vocab["token"].str.len()) \
                 .sort_values("token")
    for ln, grp in vocab.groupby("_len", sort=True):
        buckets[int(ln)] = (grp["token"].tolist(),
                            grp["frequency"].to_numpy(np.int64))
    out_q, out_c, out_s, out_f = [], [], [], []
    for raw in queries:
        qlen = len(raw)
        best_tok, best_score, best_freq = None, np.int64(1 << 40), np.int64(-1)
        for ln in sorted(buckets, key=lambda L: (abs(L - qlen), L)):
            if best_tok is not None and abs(ln - qlen) > best_score:
                break
            toks, freqs = buckets[ln]
            scores = edit_distance_batch(raw, toks,
                                         transpositions=transpositions)
            i = int(np.lexsort((np.arange(len(toks)), -freqs, scores))[0])
            s, f = scores[i], freqs[i]
            if s < best_score or (s == best_score and f > best_freq):
                best_tok, best_score, best_freq = toks[i], s, f
        if best_tok is not None:
            out_q.append(raw)
            out_c.append(best_tok)
            out_s.append(int(best_score))
            out_f.append(int(best_freq))
    return pd.DataFrame({"token": out_q, "cand": out_c,
                         "score": pd.array(out_s, dtype="int64"),
                         "freq": pd.array(out_f, dtype="int64")})


def _reduce_best(df: pd.DataFrame) -> pd.DataFrame:
    """Associative global winner per query token: min by the broadcast scan's
    total order (score, -freq, |Δlen|, len(cand), cand)."""
    qlen = df["token"].str.len().to_numpy(np.int64)
    clen = df["cand"].str.len().to_numpy(np.int64)
    keyed = df.assign(_dl=np.abs(clen - qlen), _cl=clen, _nf=-df["freq"])
    keyed = keyed.sort_values(["token", "score", "_nf", "_dl", "_cl", "cand"])
    best = keyed.drop_duplicates(subset=["token"], keep="first")
    return best[["token", "cand"]]


def dictionary_correct_joined(corpus: ray.data.Dataset,
                              vocab: ray.data.Dataset, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              min_frequency: int = 2,
                              vocab_shards: int = 8,
                              metric: str = "osa",
                              num_partitions: int | None = None
                              ) -> ray.data.Dataset:
    """Correct ``corpus[text_col]`` against a (token, frequency) DATASET
    vocabulary — see module docstring.  Returns (id_col, corrected)."""
    import pyarrow.compute as pc

    from ..functions.hashing import polyhash_u64_array
    from .joins import hash_join

    from .components import _pin

    if metric not in ("osa", "lev"):
        raise ValueError(f"dictionary_correct_joined: unknown metric={metric!r}")
    transpositions = metric == "osa"
    p = (partitions_for() if num_partitions is None else int(num_partitions))

    # vocab is consumed twice (membership marker + shard scan) — pin the
    # pruned table so the frequency filter doesn't re-run per consumer
    vocab = _pin(vocab.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("frequency"),
                                            min_frequency)),
        batch_format="pyarrow"), p)

    # tokenize ONCE, pin: Ray datasets re-execute their upstream per
    # consumer, and the token table feeds the membership join, the OOV
    # rebuild join and the sentinel passthrough
    toks = _pin(tokenize_occurrences(corpus, id_col=id_col,
                                     text_col=text_col), p)
    sentinels = toks.filter(expr="pos == -1")
    words = toks.filter(expr="pos >= 0")

    # membership as ONE co-partitioned exchange (left join against a 1-byte
    # marker), pinned — the semi/anti pair would ship the occurrence table
    # through two full exchanges
    marker = vocab.map_batches(
        lambda t: pa.table({"token": t.column("token"),
                            "_inv": pa.array(
                                np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    marked = _pin(hash_join(words, marker, on="token", how="left",
                            num_partitions=p), p)

    # an EMPTY vocab makes the left join degenerate (right columns omitted —
    # stages/joins.py guard): no _inv column means every word is OOV
    def _is_in(batch: pa.Table) -> pa.Table:
        if "_inv" not in batch.column_names:
            return batch.slice(0, 0)
        return batch.filter(pc.is_valid(batch.column("_inv")))

    def _is_oov(batch: pa.Table) -> pa.Table:
        if "_inv" not in batch.column_names:
            return batch
        return batch.filter(pc.is_null(batch.column("_inv")))

    in_vocab = marked.map_batches(_is_in, batch_format="pyarrow")
    oov = marked.map_batches(_is_oov, batch_format="pyarrow")

    oov_tokens = distinct_rows(oov.map_batches(
        lambda t: t.select(["token"]), batch_format="pyarrow"),
        ["token"], num_partitions=p)

    # tagged union co-partitioned on the vocab shard id: vocab row → its own
    # shard; each distinct OOV token → one copy per shard
    def tag_vocab(batch: pa.Table) -> pa.Table:
        col = batch.column("token")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        shard = (polyhash_u64_array(col) % np.uint64(vocab_shards)) \
            .astype(np.int64)
        return pa.table({"shard": pa.array(shard, pa.int64()),
                         "_vside": pa.array(
                             np.zeros(batch.num_rows, np.int64)),
                         "token": batch.column("token"),
                         "frequency": batch.column("frequency")
                                           .cast(pa.int64())})

    def replicate_oov(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rep = np.repeat(np.arange(n, dtype=np.int64), vocab_shards)
        shard = np.tile(np.arange(vocab_shards, dtype=np.int64), n)
        return pa.table({"shard": pa.array(shard, pa.int64()),
                         "_vside": pa.array(np.ones(n * vocab_shards,
                                                    np.int64)),
                         "token": batch.column("token").take(pa.array(rep)),
                         "frequency": pa.array(
                             np.zeros(n * vocab_shards, np.int64))})

    oov_tokens = _pin(oov_tokens, min(p, vocab_shards))
    if oov_tokens.count() == 0:
        # nothing unknown (or nothing tokenized): skip the scan exchanges
        corrected_oov = oov.map_batches(
            lambda t: pa.table({id_col: t.column(id_col).cast(pa.int64()),
                                "pos": t.column("pos").cast(pa.int64()),
                                "token": t.column("token"),
                                "cand": pa.nulls(t.num_rows, pa.string())}),
            batch_format="pyarrow")
    else:
        tagged = vocab.map_batches(tag_vocab, batch_format="pyarrow") \
            .union(oov_tokens.map_batches(replicate_oov,
                                          batch_format="pyarrow"))
        local_best = grouped_apply(
            tagged, ["shard"],
            lambda df: _scan_partition(df, transpositions=transpositions),
            num_partitions=min(p, vocab_shards))
        corrections = grouped_apply(local_best, ["token"], _reduce_best,
                                    num_partitions=p)

        # rebuild: left join + coalesce (empty vocab → raw token
        # passthrough, the broadcast path's documented deviation)
        corrected_oov = hash_join(oov, corrections, on="token", how="left",
                                  num_partitions=p)

    def _restore_id(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
        # int ids come back float64 from the join engine's side-unique-int
        # pinning (exact below 2**53); string ids pass through untouched
        return col.cast(pa.int64()) if pa.types.is_floating(col.type) else col

    def coalesce(batch: pa.Table) -> pa.Table:
        cand = batch.column("cand") if "cand" in batch.column_names \
            else pa.nulls(batch.num_rows, pa.string())
        out = pc.coalesce(cand, batch.column("token"))
        return pa.table({id_col: _restore_id(batch.column(id_col)),
                         "pos": batch.column("pos").cast(pa.int64()),
                         "ctok": out})

    def passthrough(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: _restore_id(batch.column(id_col)),
                         "pos": batch.column("pos").cast(pa.int64()),
                         "ctok": batch.column("token")})

    rows = corrected_oov.map_batches(coalesce, batch_format="pyarrow") \
        .union(in_vocab.map_batches(passthrough, batch_format="pyarrow"),
               sentinels.map_batches(passthrough, batch_format="pyarrow"))

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"])
        real = df[df["pos"] >= 0]
        joined = real.groupby(id_col)["ctok"].agg(" ".join)
        all_ids = df[id_col].drop_duplicates()
        out = pd.DataFrame({id_col: all_ids.to_numpy()})  # any id dtype
        out["corrected"] = out[id_col].map(joined).fillna("")
        return out

    return grouped_apply(rows, [id_col], rebuild, num_partitions=p)
