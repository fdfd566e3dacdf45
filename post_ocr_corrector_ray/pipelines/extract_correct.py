"""Flagship pipeline: pages → extract → correct → partitioned committed output.

Stage graph (all lazy, streaming with backpressure)::

    read_parquet(pages)                        # column-pruned scan
      → filter committed partitions            # resume: cheap, before any work
      → map_batches(extract_batch)             # stateless tasks; drops `html`
      → map_batches(CorrectorStage, ...)       # actor pool, state per actor
      → map_batches(add_partition_column)
      → groupby("part").map_groups(commit)     # the ONE shuffle: url-hash exchange
                                               # → atomic per-partition commit

Skew note (SURVEY.md §7.4.4): correction cost scales superlinearly with
document length.  The actor pool pulls small batches dynamically, so giant
documents delay only their own batch; ``correct_batch_size`` should stay small
(16-64 docs) so a straggler batch holds few innocent rows.  At 100 TB the same
graph holds: the only all-to-all exchange is the final url-hash partitioning,
sized by ``num_partitions``, and it moves extracted text (small), never raw
HTML (projected away at extraction).
"""

from __future__ import annotations

import time
from typing import Literal

import pyarrow as pa

import ray.data

from ..stages.correct import (
    DictionaryCorrectorStage,
    NeuralCorrectorStage,
    NullCorrectorStage,
    OUT_COL,
    TEXT_COL,
)
from ..stages.extract import add_partition_column, extract_batch, make_committed_filter
from ..state import lineage as lin

CorrectorKind = Literal["null", "neural", "dictionary"]


def read_pages(sf_path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet scan of a pages table."""
    return ray.data.read_parquet(sf_path, columns=columns)


def extract_pipeline(pages: ray.data.Dataset) -> ray.data.Dataset:
    return pages.map_batches(extract_batch, batch_format="pyarrow")


def correct_stage(ds: ray.data.Dataset, *, corrector: CorrectorKind,
                  alphabet: str | None = None, model_path: str | None = None,
                  seed: int = 42, hparams: dict | None = None,
                  vocab_ref=None, min_frequency: int = 2,
                  concurrency: int | tuple[int, int] = 4,
                  batch_size: int = 32) -> ray.data.Dataset:
    if corrector == "null":
        # stateless identity — plain task stage, no actor pool needed
        return ds.map_batches(NullCorrectorStage(), batch_format="pyarrow")
    if corrector == "neural":
        assert alphabet is not None
        return ds.map_batches(
            NeuralCorrectorStage,
            fn_constructor_kwargs=dict(alphabet=alphabet, model_path=model_path,
                                       seed=seed, hparams=hparams),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1,
        )
    if corrector == "dictionary":
        return ds.map_batches(
            DictionaryCorrectorStage,
            fn_constructor_kwargs=dict(vocab_ref=vocab_ref, min_frequency=min_frequency),
            batch_format="pyarrow", batch_size=max(batch_size, 128),
            concurrency=concurrency, num_cpus=1,
        )
    raise ValueError(f"unknown corrector: {corrector}")


def extract_correct(pages: ray.data.Dataset, *, corrector: CorrectorKind = "null",
                    out_dir: str | None = None, num_partitions: int = 32,
                    resume: bool = True, input_fingerprint: str = "",
                    **correct_kwargs) -> ray.data.Dataset:
    """Full pipeline.  With ``out_dir`` set, executes and commits partitioned
    output (returns the tiny per-partition summary dataset); without, returns
    the lazy corrected dataset for the caller to consume."""
    ds = pages
    committed: frozenset[int] = frozenset()
    if out_dir is not None and resume:
        committed = lin.committed_partitions(out_dir)
        if committed:
            ds = ds.map_batches(make_committed_filter(committed, num_partitions),
                                batch_format="pyarrow")
    ds = extract_pipeline(ds)
    ds = correct_stage(ds, corrector=corrector, **correct_kwargs)
    if out_dir is None:
        return ds
    ds = ds.map_batches(add_partition_column, batch_format="pyarrow",
                        fn_kwargs=dict(num_partitions=num_partitions))
    stage_versions = {"extract": "1", "correct": f"{corrector}/1"}

    def _commit(group: pa.Table) -> pa.Table:
        part_id = int(group.column("part")[0].as_py())
        t0 = time.time()
        body = group.drop_columns(["part"])
        n_empty = sum(1 for t in body.column(OUT_COL).to_pylist() if not t)
        rec = lin.commit_partition(
            body, out_dir, part_id,
            input_fingerprint=input_fingerprint, stage_versions=stage_versions,
            metrics={"n_empty_outputs": n_empty,
                     "total_out_chars": sum(len(t or "") for t in body.column(OUT_COL).to_pylist()),
                     "commit_seconds": round(time.time() - t0, 4)},
        )
        return pa.Table.from_pylist([{"part": part_id, "n_rows": rec["n_rows"]}])

    return ds.groupby("part").map_groups(_commit, batch_format="pyarrow")


__all__ = ["read_pages", "extract_pipeline", "correct_stage", "extract_correct",
           "TEXT_COL", "OUT_COL"]
