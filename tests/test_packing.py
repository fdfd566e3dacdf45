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


@pytest.mark.usefixtures("ray_session")
class TestQuantileEdges:
    def _skewed(self, n=4000):
        # 90% of keys packed into a dense region: equal-width edges put ~all
        # rows in one bucket; quantile edges must spread them
        rng = np.random.default_rng(3)
        dense = np.arange(0, int(n * 0.9))
        sparse = rng.choice(np.arange(10**9, 2 * 10**9), size=n - len(dense),
                            replace=False)
        keys = np.concatenate([dense, sparse])
        vals = rng.integers(1, 50, size=n)
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "v": pa.array(vals, pa.int64())})

    def _spec(self, tbl):
        import pandas as pd

        df = tbl.to_pandas().sort_values("k")
        return dict(zip(df["k"], np.concatenate(([0], np.cumsum(df["v"])[:-1]))))

    def test_quantile_and_width_agree_with_spec(self):
        import ray.data

        from post_ocr_corrector_ray.stages.packing import prefix_sum_by_key

        tbl = self._skewed()
        want = self._spec(tbl)
        for edges in ("quantile", "width"):
            got = prefix_sum_by_key(ray.data.from_arrow(tbl), "k", "v",
                                    num_partitions=16, bucket_edges=edges) \
                .to_pandas()
            assert dict(zip(got["k"], got["prefix_excl"])) == want, edges

    def test_quantile_edges_balance_skewed_buckets(self):
        """The load-balance property itself: under the 90%-dense key
        distribution, quantile edges keep the largest bucket near 1/P of the
        rows, while equal-width edges funnel the dense region into one."""
        import ray.data

        from post_ocr_corrector_ray.stages import packing as pk

        tbl = self._skewed()
        ds = ray.data.from_arrow(tbl)
        proj = ds.map_batches(lambda t: t.select(["k", "v"]),
                              batch_format="pyarrow")
        samples = []
        for b in proj.iter_batches(batch_format="pyarrow"):
            samples.append(pk._sample_keys(
                b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)))
        sample = np.sort(np.concatenate(samples))
        P = 16
        qpos = np.linspace(0, len(sample) - 1, P + 1)[1:-1].astype(np.int64)
        edges = np.unique(sample[qpos])
        keys = tbl.column("k").to_numpy(zero_copy_only=False)
        qcounts = np.bincount(np.searchsorted(edges, keys, side="right"),
                              minlength=len(edges) + 1)
        lo, hi = int(keys.min()), int(keys.max())
        width = max((hi - lo + P) // P, 1)
        wcounts = np.bincount(np.clip((keys - lo) // width, 0, P - 1),
                              minlength=P)
        n = len(keys)
        assert wcounts.max() >= 0.85 * n          # width: dense region funnels
        assert qcounts.max() <= 2.5 * n / P       # quantile: balanced
