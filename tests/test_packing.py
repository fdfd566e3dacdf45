"""Distributed exclusive prefix sum + sequence packing (stages/packing.py)
vs NumPy cumsum ground truth, across block layouts and key distributions.
SQL-oracle parity runs in tests/test_shuffle_and_oracle_parity.py."""

import numpy as np
import pyarrow as pa
import pytest

from post_ocr_corrector_ray.stages.packing import (pack_assignments,
                                                   prefix_sum_by_key)


def _ds(keys, vals, blocks=4):
    import ray.data

    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    return ray.data.from_arrow(t).repartition(blocks)


def _truth(keys, vals):
    order = np.argsort(keys, kind="stable")
    sv = np.asarray(vals)[order]
    excl = np.concatenate(([0], np.cumsum(sv)[:-1]))
    return dict(zip(np.asarray(keys)[order].tolist(), excl.tolist()))


@pytest.mark.usefixtures("ray_session")
class TestPrefixSum:
    def test_matches_cumsum_shuffled_keys(self):
        rng = np.random.default_rng(3)
        keys = rng.permutation(200)
        vals = rng.integers(0, 100, size=200)
        out = prefix_sum_by_key(_ds(keys, vals), "k", "v",
                                num_partitions=8).to_pandas()
        got = dict(zip(out["k"], out["prefix_excl"]))
        assert got == _truth(keys, vals)

    def test_sparse_skewed_keys(self):
        # huge gaps → most range buckets empty, one dense region
        keys = [0, 1, 2, 3, 10_000_000, 10_000_001, 99_999_999]
        vals = [5, 0, 7, 1, 100, 2, 9]
        out = prefix_sum_by_key(_ds(keys, vals, blocks=3), "k", "v",
                                num_partitions=16).to_pandas()
        got = dict(zip(out["k"], out["prefix_excl"]))
        assert got == _truth(keys, vals)

    def test_single_row_and_empty(self):
        out = prefix_sum_by_key(_ds([42], [7], blocks=1), "k", "v").to_pandas()
        assert out.to_dict("records") == [
            {"k": 42, "v": 7, "prefix_excl": 0}]
        empty = prefix_sum_by_key(_ds([], [], blocks=1), "k", "v").to_pandas()
        assert len(empty) == 0


@pytest.mark.usefixtures("ray_session")
class TestPacking:
    def test_budget_boundaries(self):
        # docs of 60 words each, budget 100: packs [0,0],[1],[1,2? ...] —
        # pack_id = floor(excl/100): 0,0,1,1,2,3 for excl 0,60,120,180,240,300
        keys = list(range(6))
        vals = [60] * 6
        out = pack_assignments(_ds(keys, vals, blocks=2), "k", "v",
                               budget=100).to_pandas().sort_values("k")
        assert out["pack_id"].tolist() == [0, 0, 1, 1, 2, 3]

    def test_never_splits_a_doc_and_covers_all(self):
        rng = np.random.default_rng(11)
        keys = rng.permutation(100)
        vals = rng.integers(1, 80, size=100)
        out = pack_assignments(_ds(keys, vals), "k", "v",
                               budget=128).to_pandas()
        truth = _truth(keys, vals)
        want = {k: truth[k] // 128 for k in truth}
        assert dict(zip(out["k"], out["pack_id"])) == want
        # pack ids are contiguous from 0
        ids = sorted(out["pack_id"].unique())
        assert ids == list(range(len(ids)))
