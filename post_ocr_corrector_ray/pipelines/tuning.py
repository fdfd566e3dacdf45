"""Dictionary-corrector min_frequency sweep — the reference's torch-free
tuning loop (dictionary_corrector.py:200-246) as a distributed pipeline.

Reference chain: build vocabulary from the train split once; estimate the
sweep grid from the global max frequency (``max/1000`` top-1000 heuristic,
:211-214 — ``model.dictionary.min_frequency_sweep_options``); for each
min_frequency, correct the validation split and score mean normalized edit
distance + percent perfect (:226-232); keep the best by mean distance; score
it once on the test split (:239-246).

Engine shape: ONE distributed vocabulary build (coarse-partitioned token
groupby), the vocab broadcast once via ``ray.put``; each sweep option is a
streaming pass over the validation split through a ``DictionaryCorrectorStage``
actor pool (prune happens inside the corrector via its ``min_frequency``) —
the sweep never materializes the corpus.  The torch/ASHA neural-hyperparameter
search (tune_hyperparameters.py) stays out of scope (no torch in container);
this closes the tuning surface a dictionary-baseline user actually runs.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..model.dictionary import min_frequency_sweep_options
from ..stages.correct import DictionaryCorrectorStage
from .corpus import max_token_frequency, token_counts
from .evaluate import evaluate


def dictionary_min_frequency_sweep(
        corpus: ray.data.Dataset, *, clean_col: str = "clean",
        messy_col: str = "messy", train_split: str = "train",
        val_split: str = "validation", test_split: str = "test",
        concurrency: int | tuple[int, int] = 4) -> pa.Table:
    """Returns one row per sweep option (split='validation') plus the final
    test-split row for the winner: (min_frequency, split, mean_cer,
    percent_perfect, n, is_best)."""
    import ray

    # ONE distributed (token, frequency) aggregate, materialized (small —
    # vocabulary-sized) and consumed twice: the sweep grid comes from the
    # distributed partial-max (A4 path, never collects the vocab) and the
    # broadcast correction dict streams out of the same result
    counts = token_counts(corpus, text_col=clean_col,
                          split=train_split).materialize()
    options = min_frequency_sweep_options(max_token_frequency(counts))
    # prune the collected vocab at the sweep's SMALLEST option inside the
    # count pipeline: every sweep point corrects with min_frequency >=
    # min(options), so sub-threshold tokens can never influence any pass —
    # the broadcast ships the ≥min(options) core, not the raw token census
    # (at web scale the census is O(1e8+) while the core stays
    # vocabulary-sized).  If even that outgrew the broadcast budget, the
    # scale twin is a partitioned token-lookup join (tokens ⋈ vocab via
    # stages/joins.py::hash_join) instead of a driver dict.
    floor = min(options) if options else 1
    pruned = counts if floor <= 1 else counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t.column("frequency"),
                                                    floor)),
        batch_format="pyarrow")
    vocab: dict[str, int] = {}
    for batch in pruned.iter_batches(batch_size=65536, batch_format="pyarrow"):
        vocab.update(zip(batch.column("token").to_pylist(),
                         (int(f) for f in batch.column("frequency").to_pylist())))
    vocab_ref = ray.put(vocab)

    # Autoscaling pools (min 1 actor): sweep passes run concurrently below,
    # and N fixed-size pools of ``concurrency`` actors each can reserve every
    # cluster CPU and starve the feeding task stages (measured deadlock at
    # num_cpus=4 with 2 passes) — with min=1 each pass always progresses and
    # pools grow only into free CPUs.
    pool = concurrency if isinstance(concurrency, tuple) else (1, concurrency)

    def _score(split: str, min_frequency: int):
        ds = corpus.filter(expr=f"split == '{split}'")
        corrected = ds.map_batches(
            DictionaryCorrectorStage, batch_format="pyarrow", batch_size=128,
            fn_constructor_kwargs=dict(vocab_ref=vocab_ref,
                                       min_frequency=min_frequency,
                                       text_col=messy_col,
                                       out_col="corrected_text"),
            concurrency=pool, num_cpus=1)
        return evaluate(corrected, out_col="corrected_text",
                        correct_col=clean_col)

    # Sweep points are independent streaming evaluations over the same split;
    # run them concurrently from driver threads (each owns its own Ray Data
    # execution) instead of serializing passes that each use only
    # ``concurrency`` actors of the cluster.  Selection stays deterministic:
    # results are indexed by option order, winner = strict-< first-wins.
    from concurrent.futures import ThreadPoolExecutor

    if options:
        with ThreadPoolExecutor(max_workers=min(8, len(options))) as ex:
            scored = list(ex.map(lambda mf: _score(val_split, mf), options))
    else:
        scored = []
    rows = []
    best_i, best_cer = -1, None
    for i, (mf, res) in enumerate(zip(options, scored)):
        rows.append({"min_frequency": mf, "split": val_split,
                     "mean_cer": res.mean_cer,
                     "percent_perfect": res.percent_perfect, "n": res.n,
                     "is_best": False})
        if best_cer is None or res.mean_cer < best_cer:  # strict <, first wins
            best_i, best_cer = i, res.mean_cer
    if best_i >= 0:
        rows[best_i]["is_best"] = True
        test = _score(test_split, options[best_i])
        rows.append({"min_frequency": options[best_i], "split": test_split,
                     "mean_cer": test.mean_cer,
                     "percent_perfect": test.percent_perfect, "n": test.n,
                     "is_best": True})
    return pa.Table.from_pylist(rows) if rows else pa.table({
        "min_frequency": pa.array([], pa.int64()),
        "split": pa.array([], pa.string()),
        "mean_cer": pa.array([], pa.float64()),
        "percent_perfect": pa.array([], pa.float64()),
        "n": pa.array([], pa.int64()),
        "is_best": pa.array([], pa.bool_())})


def doc_dictionary_sweep(sf_dir: str) -> pa.Table:
    """queries() entry: the sweep over the documents-derived corpus."""
    from .training import documents_corpus

    return dictionary_min_frequency_sweep(documents_corpus(sf_dir))
