"""High-cardinality grouped operations via coarse hash partitioning.

Ray Data's ``groupby().aggregate()`` / ``map_groups()`` pays per-GROUP Python
overhead (~ms); measured on this Ray 2.49 install, a 2-column aggregate over
40k groups takes ~100 s.  Fine for low-cardinality keys (our relational
demos), catastrophic for web-scale keys (tokens, content hashes, url buckets,
candidate pairs).

The pattern here keeps the number of Ray-level groups FIXED at
``num_partitions`` regardless of key cardinality: a deterministic row hash of
the key columns assigns each row to one of P coarse partitions, Ray groups by
that single small-int key (P groups → P Python calls), and the real per-key
work happens INSIDE each partition with vectorized pandas.  All-key-equal rows
land in the same partition, so any per-key computation is exact.

Row hashing uses ``pd.util.hash_pandas_object`` (fixed default hash key —
deterministic across processes and machines, unlike builtin ``hash``).
"""

from __future__ import annotations

import logging
import re
from typing import Callable

import numpy as np
import pandas as pd
import ray.data

DEFAULT_PARTITIONS = 64   # fixed fallback (no Ray session / explicit pins)

_TARGET_PARTITION_BYTES = 256 << 20   # ~256 MB of input per reduce partition
_TARGET_PARTITION_ROWS = 1 << 21      # ~2M rows per reduce partition


def partitions_for(size_bytes: int | None = None, rows: int | None = None, *,
                   floor: int = 8, cap: int = 8192) -> int:
    """Adaptive exchange width: the number of coarse reduce partitions an
    exchange should use.

    Two adaptive components, take the max:
    - CLUSTER-scaled: ~2 partitions per CPU (good reduce-task granularity;
      equals the legacy fixed 64 on the 32-CPU bench box) so small inputs
      still use the whole machine.
    - DATA-scaled: enough partitions that each holds ~256 MB / ~2M rows of
      input — the component that matters at 100 TB, where a fixed 64-wide
      exchange would put ~1.5 TB in each reduce task.  Callers that know
      their input size (parquet metadata, ``os.path.getsize``) pass it;
      ``connected_components`` adapts DOWN for toy graphs the same way.

    Exactness never depends on P (all-key-equal rows land together at any
    width — pinned by the partition-count-invariance tests), so the value is
    a pure performance knob.
    """
    import math

    p = floor
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            p = max(p, min(2 * cpus, 256))
        else:
            p = max(p, DEFAULT_PARTITIONS)
    except Exception:
        p = max(p, DEFAULT_PARTITIONS)
    if size_bytes:
        p = max(p, math.ceil(size_bytes / _TARGET_PARTITION_BYTES))
    if rows:
        p = max(p, math.ceil(rows / _TARGET_PARTITION_ROWS))
    return int(min(p, cap))


def _resolve_partitions(num_partitions: int | None) -> int:
    return partitions_for() if num_partitions is None else int(num_partitions)


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drop the streaming executor's schema-divergence warning ONLY when the
    *new* schema is empty.

    Ray's ``map_groups`` yields nothing for the empty blocks a tiny sorted
    exchange produces, so the executor sees a schema-less RefBundle and warns
    (`streaming_executor_state.py` exempts an empty OLD schema but not an
    empty NEW one).  Every grouped UDF in this package returns typed empty
    frames; the remaining noise is Ray-internal and key-partition-count
    dependent, so it is filtered at the logger.  Real drift — two NON-empty
    schemas disagreeing — still warns.
    """

    _EMPTY_NEW = re.compile(
        r"new schema: (PandasBlockSchema\(names=\[\], types=\[\]\)|None)\.")

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "produced a RefBundle with a different schema" not in msg:
            return True
        return self._EMPTY_NEW.search(msg) is None


class _EmptyBlockSizeEstimateFilter(logging.Filter):
    """Drop pandas_block's size-estimation warning for ZERO-LENGTH object
    columns only.

    Ray's ``PandasBlockAccessor.size_bytes`` estimates object-column width
    with ``np.vectorize``, which raises on size-0 input — so every empty
    string-typed block a selective exchange produces (e.g. the bloom-routed
    anti join, where most key partitions are empty) logs a spurious
    warning.  Genuine estimation failures on non-empty columns still warn.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("Error calculating size for column" in msg
                    and "size 0 inputs" in msg)


def _install_empty_schema_filter() -> None:
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaDivergenceFilter) for f in lg.filters):
        lg.addFilter(_EmptySchemaDivergenceFilter())
    pb = logging.getLogger("ray.data._internal.pandas_block")
    if not any(isinstance(f, _EmptyBlockSizeEstimateFilter) for f in pb.filters):
        pb.addFilter(_EmptyBlockSizeEstimateFilter())


_install_empty_schema_filter()


def add_key_partition(df: pd.DataFrame, key_cols: list[str],
                      num_partitions: int = DEFAULT_PARTITIONS,
                      col: str = "_kp") -> pd.DataFrame:
    h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
    df = df.copy()
    df[col] = (h % np.uint64(num_partitions)).astype(np.int64)
    return df


def grouped_apply(ds: ray.data.Dataset, key_cols: list[str],
                  fn: Callable[[pd.DataFrame], pd.DataFrame], *,
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Apply ``fn`` (vectorized pandas, sees every row of each key it
    receives) once per coarse partition.  ``fn`` must itself group by
    ``key_cols`` internally; it is called with all rows whose key hashes into
    one partition.  ``num_partitions=None`` → adaptive (``partitions_for``:
    cluster-scaled here; pass an explicit data-scaled width when input bytes
    are known)."""
    num_partitions = _resolve_partitions(num_partitions)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return add_key_partition(df, key_cols, num_partitions)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        # closures are cloudpickled by value, so WORKER processes never
        # import this module — install the log filters here (idempotent) or
        # empty partitions spam the worker log via pandas_block size
        # estimation
        _install_empty_schema_filter()
        return fn(df.drop(columns=["_kp"]))

    return ds.map_batches(bucketize, batch_format="pandas") \
        .groupby("_kp").map_groups(run, batch_format="pandas")


def grouped_agg(ds: ray.data.Dataset, key_cols: list[str],
                agg_spec: dict[str, tuple[str, str]], *,
                num_partitions: int | None = None) -> ray.data.Dataset:
    """Exact high-cardinality groupby-aggregate.

    ``agg_spec``: output_col → (input_col, pandas agg name), e.g.
    ``{"frequency": ("frequency", "sum")}``.  Combine-safe aggs only
    (sum/min/max/count — callers pre-aggregate per batch first, making the
    shuffle move partials, not raw rows).
    """

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_cols, as_index=False, sort=True).agg(
            **{out: (src, how) for out, (src, how) in agg_spec.items()})
        return g

    return grouped_apply(ds, key_cols, agg, num_partitions=num_partitions)


def distinct_rows(ds: ray.data.Dataset, key_cols: list[str], *,
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Exact distinct over arbitrary-cardinality keys (first row per key after
    a deterministic sort by all columns)."""

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(list(df.columns)).drop_duplicates(subset=key_cols)

    return grouped_apply(ds, key_cols, dedup, num_partitions=num_partitions)
