"""HyperLogLog distinct-count sketch (stages/sketches.py)."""

import numpy as np
import pyarrow as pa

from post_ocr_corrector_ray.stages.sketches import (
    _hll_estimate,
    _hll_registers,
    hll_distinct,
)


def _naive_registers(hashes, p):
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for h in hashes:
        h = int(h)
        idx = h >> (64 - p)
        rest = ((h << p) | ((1 << p) - 1)) & ((1 << 64) - 1)
        rank = 1
        for b in range(63, -1, -1):
            if rest & (1 << b):
                break
            rank += 1
        regs[idx] = max(regs[idx], rank)
    return regs


def test_registers_match_naive():
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 2 ** 64, size=500, dtype=np.uint64)
    for p in (4, 12):
        np.testing.assert_array_equal(_hll_registers(hashes, p),
                                      _naive_registers(hashes, p))


def test_register_merge_is_max():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 2 ** 64, size=300, dtype=np.uint64)
    b = rng.integers(0, 2 ** 64, size=300, dtype=np.uint64)
    merged = np.maximum(_hll_registers(a, 10), _hll_registers(b, 10))
    np.testing.assert_array_equal(
        merged, _hll_registers(np.concatenate([a, b]), 10))


def test_estimate_accuracy_bound():
    # true uniform-hash model: error ≤ 5σ where σ = 1.04/sqrt(m)
    rng = np.random.default_rng(5)
    for n in (100, 5_000, 200_000):
        hashes = rng.integers(0, 2 ** 64, size=n, dtype=np.uint64)
        est = _hll_estimate(_hll_registers(hashes, 12))
        assert abs(est - n) / n < 5 * 1.04 / np.sqrt(4096), (n, est)


def test_hll_distinct_vs_exact_on_strings(ray_session):
    import ray.data

    vals = [f"token-{i % 7000}" for i in range(30_000)]
    ds = ray.data.from_arrow(pa.table({"token": pa.array(vals, pa.string())}))
    out = hll_distinct(ds, "token", p=12)
    est = out.column("estimate")[0].as_py()
    assert abs(est - 7000) / 7000 < 0.05, est


def test_hll_distinct_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"token": pa.array([], pa.string())}))
    est = hll_distinct(ds, "token", p=8).column("estimate")[0].as_py()
    assert est == 0.0


def test_mg_empty_summary_still_counts_stream(ray_session):
    """A block whose Misra-Gries summary empties out after the decrement
    (> k distinct tokens, all equal counts) must still contribute its token
    count to n_total — the N/k guarantee bound depends on N being exact."""
    import ray.data

    from post_ocr_corrector_ray.stages.sketches import mg_heavy_hitters

    n = 3000
    toks = pa.table({"text": pa.array([f"tok{i:05d}" for i in range(n)],
                                      pa.string())})

    def col_fn(batch):
        return batch.column("text").to_pylist()

    out = mg_heavy_hitters(ray.data.from_arrow(toks), col_fn, k=16)
    assert out.attrs["n_total"] == n
    # no sentinel rows leak into the result
    assert out["token"].notna().all()


def test_rolling_dau_hll_tracks_exact(ray_session):
    """Per-hour HLL rolling DAU stays within ~5% of the exact
    window-replication twin on the driver fixture (p=12 → σ≈1.6%)."""
    from post_ocr_corrector_ray.pipelines.relational import (
        events_rolling_active_users,
        events_rolling_active_users_hll,
    )

    sf = "/root/testdata/sf0.01"
    exact = events_rolling_active_users(sf).to_pandas().set_index("hour")
    est = events_rolling_active_users_hll(sf).to_pandas().set_index("hour")
    assert sorted(exact.index) == sorted(est.index)
    rel = (est["active_users"] - exact["active_users"]).abs() \
        / exact["active_users"].clip(lower=1)
    assert rel.max() < 0.05, rel.max()


def test_per_type_hll_within_error_bound(ray_session):
    from post_ocr_corrector_ray.pipelines.relational import (
        events_distinct_users_per_type, events_distinct_users_per_type_hll)

    sf = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r["n_users"]
             for r in events_distinct_users_per_type(sf).to_pylist()}
    est = {r["event_type"]: r["n_users_est"]
           for r in events_distinct_users_per_type_hll(sf).to_pylist()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        rel = 1.04 / (2 ** 12) ** 0.5          # ~1.6% standard error
        assert abs(est[t] - n) <= max(5 * rel * n, 3), (t, est[t], n)
