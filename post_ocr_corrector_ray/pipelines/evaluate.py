"""Evaluation pipeline: CER + percent-perfect aggregates (A5/F1-F3).

Reference call-site semantics preserved per variant:
- ``eval.py:49-60``: skip rows with empty reference text; shortcut score 0 when
  output == reference; otherwise ``normalized_edit_distance(..., banded=False)``;
  mean over scored rows; percent-perfect = fraction of zero scores.
- ``null_corrector.py:16-42`` / ``dictionary_corrector.py:108-155``: banded
  default, no empty-skip (an empty reference raises there too — our synthetic
  eval inputs never have empty references on those paths).

Scale posture: per-row CER is computed inside ``map_batches`` (vectorized
banded DP per row, O(band·n)); the global mean/count reduce over per-batch
partial sums — no shuffle, a tiny streaming aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray.data

from ..functions.edit_distance import edit_distance, edit_distance_banded


@dataclass(frozen=True)
class EvalResult:
    mean_cer: float
    percent_perfect: float
    n: int


def add_cer_column(batch: pa.Table, *, out_col: str, correct_col: str,
                   banded: bool = True, skip_empty_correct: bool = False,
                   cer_col: str = "cer") -> pa.Table:
    """Per-row CER column; rows with empty reference get CER null (skipped)."""
    outs = batch.column(out_col).to_pylist()
    refs = batch.column(correct_col).to_pylist()
    dist_fn = edit_distance_banded if banded else edit_distance
    cers: list[float | None] = []
    for o, r in zip(outs, refs):
        o = o or ""
        r = r or ""
        if len(r) == 0:
            cers.append(None if skip_empty_correct else 0.0 if o == "" else float(len(o)))
            # unguarded reference would raise ZeroDivisionError; for pipeline
            # robustness an empty reference scores 0 when output empty, else
            # distance/1-normalized-as-length (documented engine behavior)
            continue
        if o == r:
            cers.append(0.0)
        else:
            cers.append(dist_fn(o, r) / len(r))
    return batch.append_column(cer_col, pa.array(cers, pa.float64()))


def evaluate(ds: ray.data.Dataset, *, out_col: str = "corrected_text",
             correct_col: str = "clean", banded: bool = False,
             skip_empty_correct: bool = True) -> EvalResult:
    """Streaming mean CER + percent perfect (reference eval.py:64-68)."""
    scored = ds.map_batches(
        add_cer_column, batch_format="pyarrow",
        fn_kwargs=dict(out_col=out_col, correct_col=correct_col, banded=banded,
                       skip_empty_correct=skip_empty_correct),
    )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("cer")
        valid = col.drop_null()
        n = len(valid)
        total = pa.compute.sum(valid).as_py() or 0.0
        perfect = pa.compute.sum(pa.compute.equal(valid, 0.0).cast(pa.int64())).as_py() or 0
        return pa.Table.from_pylist([{"n": n, "total": total, "perfect": perfect}])

    parts = scored.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    if n == 0:
        return EvalResult(0.0, 0.0, 0)
    total = sum(p["total"] for p in parts)
    perfect = sum(p["perfect"] for p in parts)
    return EvalResult(mean_cer=total / n, percent_perfect=perfect / n, n=n)
